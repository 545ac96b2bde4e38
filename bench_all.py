#!/usr/bin/env python3
"""Per-band + end-to-end benchmarks for every BASELINE-tracked config.

BASELINE.md:35-37 tracks: depth_midas single image; depth_anything video;
flow_raft + flow_gmflow (HSV encoding); mask_mmdet + rgba compositing;
depth_patchfusion tiled; depth_marigold diffusion — plus the e2e north star
(depth + flow + mask > 60 fps 1080p on a v5e-8; per-chip share 7.5 fps).

Usage:
    python bench_all.py                 # all configs, one JSON line each
    python bench_all.py --only mask     # one config
    python bench_all.py --list
Each config runs in a fresh subprocess (own HBM arena); results aggregate to
BENCHMARKS.json. Weights are random-init (no checkpoints in this image) —
identical compute graphs to the real ones.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR_PER_CHIP = 7.5  # 60 fps / v5e-8 for the depth+flow+mask e2e bands


def _device_bench(step, args_dev, iters, items_per_iter):
    """On-device scan-chained timing with a forced scalar fetch.

    block_until_ready through the tunneled axon runtime returns BEFORE
    remote execution finishes (measured: 20 dispatched flash kernels
    "block" in 0.3 ms), so host-loop timings undercount; and a bare repeat
    of identical calls can pipeline. Here the step runs `iters` times
    inside ONE jitted lax.scan with a data dependency threaded through
    EVERY input leaf, completion is forced by fetching a scalar, and the
    constant dispatch+fetch round trip is removed by differencing a
    length-1 run (slope method).

    The per-iteration epsilon MUST touch every leaf: when only one leaf is
    perturbed, XLA's loop-invariant code motion hoists everything that does
    not depend on it OUT of the scan — for depth_anything the first tree
    leaf (dpt/output_conv1 bias, dicts flatten key-sorted) enters the graph
    after the entire ViT, and the "per-step" time collapsed to the last two
    convs (measured 14 ms vs the real ~190 ms). eps is dynamic (derived
    from the step output) so the adds are not foldable, making every
    iteration structurally distinct even though the values round to
    identity.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tuple(args_dev))

    def chained(n):
        @jax.jit
        def run(leaves):
            def body(carry, _):
                out = step(*jax.tree_util.tree_unflatten(treedef, carry))
                leaf = jax.tree_util.tree_leaves(out)[0]
                eps = jnp.mean(leaf.astype(jnp.float32)) * 1e-24
                carry = [l + eps.astype(l.dtype) for l in carry]
                return carry, None
            c, _ = jax.lax.scan(body, list(leaves), None, length=n)
            return jnp.sum(c[0].astype(jnp.float32).ravel()[:1])
        return run

    run1, runN = chained(1), chained(1 + iters)
    float(run1(leaves))                 # compile
    float(runN(leaves))                 # compile
    t0 = time.perf_counter()
    float(run1(leaves))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(runN(leaves))
    tN = time.perf_counter() - t0
    return items_per_iter * iters / (tN - t1)


def bench_depth_anything():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.models import depth_anything as da
    from prisma_tpu.weights.store import cast_params

    batch = int(os.environ.get("PRISMA_BENCH_BATCH", "8"))
    params = jax.device_put(cast_params(
        da.init_params(jax.random.key(0), "vitl"), jnp.bfloat16))

    @jax.jit
    def step(params, frames):
        return da.infer_video_batch(params, frames, encoder="vitl",
                                    compute_dtype=jnp.bfloat16)

    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, size=(batch, 1080, 1920, 3)).astype(np.uint8))
    fps = _device_bench(step, (params, frames), 5, batch)
    return {"metric": "depth_anything_vitl_1080p_fps_per_chip", "value": fps,
            "unit": "frames/s/chip", "vs_baseline": fps / NORTH_STAR_PER_CHIP}


def bench_depth_midas():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.models import midas as jmidas
    from prisma_tpu.weights.store import cast_params

    params = jax.device_put(cast_params(
        jmidas.init_params(jax.random.key(0)), jnp.bfloat16))

    @jax.jit
    def step(params, frames):
        return jmidas.infer(params, frames, compute_dtype=jnp.bfloat16)

    # single-image config: batch 1, 1080p input, 384 upper-bound budget
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, size=(1, 1080, 1920, 3)).astype(np.uint8))
    fps = _device_bench(step, (params, frames), 10, 1)
    return {"metric": "depth_midas_dpt_large_1080p_image_fps", "value": fps,
            "unit": "frames/s/chip", "vs_baseline": None}


def bench_flow_raft():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.models import raft as jraft
    from prisma_tpu.weights.store import cast_params

    params = jax.device_put(cast_params(
        jraft.init_params(jax.random.key(1)), jnp.bfloat16))
    h, w = 810, 1440  # 1080p x 0.75 (reference flow_raft.py:100,183)
    pairs = int(os.environ.get("PRISMA_BENCH_RAFT_PAIRS", "2"))
    impl = os.environ.get("PRISMA_BENCH_RAFT_IMPL", "volume_onehot")

    @jax.jit
    def step(params, i1, i2):
        fwd, bwd = jraft.infer_pairs(params, i1.astype(jnp.bfloat16),
                                     i2.astype(jnp.bfloat16), iters=20,
                                     corr_impl=impl)
        return fwd, bwd

    rng = np.random.default_rng(0)
    i1 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    i2 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    fps = _device_bench(step, (params, i1, i2), 3, pairs)
    return {"metric": "flow_raft_810x1440_bidir_pair_fps", "value": fps,
            "unit": "pairs/s/chip", "vs_baseline": fps / NORTH_STAR_PER_CHIP,
            "note": "volume_onehot corr lookup; CLOSED after rounds 3-5 "
                    "(docs/raft_roofline.md): lookup at 83% of its HBM "
                    "roofline, GRU at its ~2 ms/iter traffic floor, every "
                    "remaining paradigm measured worse; exact-semantics "
                    "ceiling ~4.8 pair-fps on one v5e"}


def bench_flow_gmflow():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.models import gmflow as jgm
    from prisma_tpu.weights.store import cast_params

    params = jax.device_put(cast_params(
        jgm.init_params(jax.random.key(2)), jnp.bfloat16))
    h, w = 810, 1440
    pairs = int(os.environ.get("PRISMA_BENCH_GMFLOW_PAIRS", "4"))
    matching = os.environ.get("PRISMA_BENCH_GMFLOW_MATCH", "blockwise")
    cfg = jgm.GMFlowConfig(matching=matching)

    @jax.jit
    def step(params, i1, i2):
        return jgm.infer_pairs(params, i1.astype(jnp.bfloat16),
                               i2.astype(jnp.bfloat16), cfg)

    rng = np.random.default_rng(0)
    i1 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    i2 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    fps = _device_bench(step, (params, i1, i2), 3, pairs)
    return {"metric": f"flow_gmflow_810x1440_bidir_pair_fps_{matching}",
            "value": fps, "unit": "pairs/s/chip",
            "vs_baseline": fps / NORTH_STAR_PER_CHIP}


def bench_flow_gmflow_refine():
    """gmflow_with_refine (--num_scales 2): the 2-scale trident/local-corr
    refinement path at the band shape (VERDICT r3 item 7) — doubles as the
    stress test for the 1/4-resolution local-correlation graph."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.models import gmflow as jgm
    from prisma_tpu.weights.store import cast_params

    cfg = jgm.refine_config()
    params = jax.device_put(cast_params(
        jgm.init_params(jax.random.key(2), cfg), jnp.bfloat16))
    h, w = 810, 1440
    pairs = int(os.environ.get("PRISMA_BENCH_GMFLOW_PAIRS", "4"))

    @jax.jit
    def step(params, i1, i2):
        return jgm.infer_pairs(params, i1.astype(jnp.bfloat16),
                               i2.astype(jnp.bfloat16), cfg)

    rng = np.random.default_rng(0)
    i1 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    i2 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    fps = _device_bench(step, (params, i1, i2), 3, pairs)
    return {"metric": "flow_gmflow_refine_810x1440_bidir_pair_fps",
            "value": fps, "unit": "pairs/s/chip",
            "vs_baseline": fps / NORTH_STAR_PER_CHIP,
            "note": "2-scale refinement (--num_scales 2); the tracked "
                    "BASELINE config is the 1-scale gmflow. Round-5: 5.7 -> "
                    "7.9 pair-fps (flash single-block 1170-token windows, "
                    "banded-MXU local corr, one window split per layer, "
                    "paired-column warp gather 19.9 vs 32.1 ms); remaining "
                    "budget is the scale-1 transformer at the flash "
                    "kernel's VPU floor — ceiling ~8.2"}


def bench_mask():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.bands import mask_band
    from prisma_tpu.models import solov2
    from prisma_tpu.weights.store import cast_params

    batch = int(os.environ.get("PRISMA_BENCH_MASK_BATCH", "4"))
    cfg = solov2.SOLOv2Config()
    params = solov2.init_params(jax.random.key(3), cfg)
    step = mask_band._make_step(params, (1080, 1920), cfg,
                                mask_band.CONFIDENCE_THRESHOLD, sdf=True,
                                dtype=jnp.bfloat16)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, size=(batch, 1080, 1920, 3)).astype(np.uint8))
    fps = _device_bench(lambda f: step(f), (frames,), 5, batch)
    return {"metric": "mask_solov2_sdf_1080p_fps_per_chip", "value": fps,
            "unit": "frames/s/chip", "vs_baseline": fps / NORTH_STAR_PER_CHIP}


def bench_patchfusion():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.models import patchfusion as pf

    params = pf.init_params(jax.random.key(6), beit_depth=24)
    from prisma_tpu.weights.store import cast_params
    params = jax.device_put(cast_params(params, jnp.bfloat16))
    # u8 input like the production band path: pf.infer normalizes on device
    # (4x less H2D per frame than host-converted f32 — see patchfusion.infer)
    img = np.random.default_rng(0).integers(
        0, 256, (1080, 1920, 3)).astype(np.uint8)

    # measure through the BAND frame loop (depth_patchfusion_band
    # _infer_frames): frames stay device-resident (as_numpy=False), so frame
    # k+1's passes dispatch while frame k computes — the production video
    # pipeline. One fetch at the end forces completion.
    from prisma_tpu.bands.depth_patchfusion_band import _infer_frames

    def run(n):
        frames = np.broadcast_to(img, (n,) + img.shape)
        out = _infer_frames(params, frames, mode="p49", model_hw=(384, 512),
                            dtype=jnp.bfloat16)
        float(jnp.sum(out.ravel()[:1]))

    run(1)  # compile
    iters = 3
    t0 = time.perf_counter()
    run(iters)
    dt = (time.perf_counter() - t0) / iters
    return {"metric": "depth_patchfusion_p49_1080p_s_per_frame", "value": dt,
            "unit": "s/frame", "vs_baseline": None,
            "note": "band frame loop, frames pipelined device-resident "
                    "(round-5: per-frame fetch + per-frame blur upload "
                    "removed); round-4: roi_align as separable MXU matmuls "
                    "with the coarse upsample folded into the roi weights, "
                    "each pass ONE jit — was 4.58 (r4), 6.39 (r3), 38.8 (r2)"}


def bench_marigold():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.models import marigold as jmar
    from prisma_tpu.models import sd2
    from prisma_tpu.weights.store import cast_params

    ucfg = sd2.UNetConfig()
    params = jax.device_put(cast_params(
        jmar.init_params(jax.random.key(7), ucfg), jnp.bfloat16))
    frame = np.random.default_rng(0).integers(0, 255, (1080, 1920, 3)).astype(np.uint8)

    jmar.infer(params, frame, denoising_steps=10, ensemble_size=10,
               processing_res=768, unet_cfg=ucfg, compute_dtype=jnp.bfloat16)
    # median of 3: the single-frame wall time swings ~2x with host load on
    # this 1-core box (each frame is a handful of dispatches + one fetch)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jmar.infer(params, frame, denoising_steps=10, ensemble_size=10,
                   processing_res=768, unet_cfg=ucfg,
                   compute_dtype=jnp.bfloat16)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    return {"metric": "depth_marigold_10x10_768_s_per_frame", "value": dt,
            "unit": "s/frame", "vs_baseline": None,
            "note": "median of 3 frames; device-resident ensemble epilogue "
                    "(preds->BFGS->resize with one final fetch)"}


def bench_3band():
    """The north-star gauge, MEASURED not composed: the three band steps
    (SOLOv2+SDF mask, depth_anything vitl, GMFlow flow) coexisting in ONE
    process on one chip, interleaved per batch over device-resident frames —
    captures HBM pressure and scheduling interplay that separate per-band
    benches cannot. No host IO in the loop (the codec pipeline overlaps that
    on threads in production; the tunneled chip's transfer costs are not
    representative of local-chip IO)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.bands import mask_band
    from prisma_tpu.models import depth_anything as da
    from prisma_tpu.models import gmflow as jgm
    from prisma_tpu.models import solov2
    from prisma_tpu.ops import encode as enc
    from prisma_tpu.ops.resize import resize2d
    from prisma_tpu.weights.store import cast_params

    batch = int(os.environ.get("PRISMA_BENCH_BATCH", "8"))
    rng = np.random.default_rng(0)

    # mask step (same construction as the band driver)
    s2_cfg = solov2.SOLOv2Config()
    s2_params = solov2.init_params(jax.random.key(3), s2_cfg)
    mask_step = mask_band._make_step(s2_params, (1080, 1920), s2_cfg,
                                     mask_band.CONFIDENCE_THRESHOLD, sdf=True,
                                     dtype=jnp.bfloat16)

    # depth step
    da_params = jax.device_put(cast_params(
        da.init_params(jax.random.key(0), "vitl"), jnp.bfloat16))

    @jax.jit
    def depth_step(params, frames):
        return da.infer_video_batch(params, frames, encoder="vitl",
                                    compute_dtype=jnp.bfloat16)

    # flow step (band semantics: 0.75x cubic downscale + bidir + HSV)
    gm_params = jax.device_put(cast_params(
        jgm.init_params(jax.random.key(2)), jnp.bfloat16))
    gm_cfg = jgm.GMFlowConfig()

    @jax.jit
    def flow_step(params, frames_u8):
        frames = frames_u8.astype(jnp.float32)
        ds = resize2d(frames, (810, 1440), method="cubic").astype(jnp.bfloat16)
        fwd, bwd = jgm.infer_pairs(params, ds[:-1], ds[1:], gm_cfg)
        fwd_rgb, fwd_max = jax.vmap(enc.process_flow)(fwd.astype(jnp.float32))
        return fwd_rgb, fwd_max, bwd.astype(jnp.float32)

    frames = jax.device_put(rng.integers(
        0, 255, size=(batch, 1080, 1920, 3)).astype(np.uint8))
    window = jax.device_put(rng.integers(
        0, 255, size=(batch + 1, 1080, 1920, 3)).astype(np.uint8))

    def round_all():
        m = mask_step(frames)
        d = depth_step(da_params, frames)
        f = flow_step(gm_params, window)
        return m, d, f

    def force(out):
        # block_until_ready through the tunneled runtime returns before
        # remote execution finishes; fetching a scalar from each step's
        # output is the only reliable completion barrier
        for leaf in (jax.tree_util.tree_leaves(out[0])[0],
                     jax.tree_util.tree_leaves(out[1])[0],
                     jax.tree_util.tree_leaves(out[2])[0]):
            float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))

    force(round_all())
    rounds = int(os.environ.get("PRISMA_BENCH_3BAND_ROUNDS", "4"))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = round_all()
    force(out)
    dt = time.perf_counter() - t0
    fps = batch * rounds / dt
    return {"metric": "measured_3band_fps_per_chip", "value": fps,
            "unit": "frames/s/chip", "vs_baseline": fps / NORTH_STAR_PER_CHIP,
            "note": f"mask+depth+flow interleaved in one process, batch "
                    f"{batch}, device-resident frames"}


def bench_e2e():
    """The north-star gauge: decode -> depth + flow + mask -> encode on a real
    synthetic 1080p clip through the PRODUCTION fused single-decode pipeline
    (bands/multiband.run_fused — what `process.py` runs by default when the
    three bands are requested). Native codec IO, prefetch, async encode."""
    import shutil
    import tempfile

    import numpy as np
    from prisma_tpu.bands import multiband
    from prisma_tpu.io.video import VideoWriter
    from prisma_tpu.runtime.config import RuntimeConfig

    nframes = int(os.environ.get("PRISMA_BENCH_E2E_FRAMES", "48"))
    batch = int(os.environ.get("PRISMA_BENCH_BATCH", "8"))
    work = tempfile.mkdtemp(prefix="prisma_bench_")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)

    def make_clip(sub, n):
        os.makedirs(os.path.join(work, sub))
        path = os.path.join(work, sub, "clip.mp4")
        wr = VideoWriter(1920, 1080, 24.0, filename=path)
        for i in range(n):
            wr.write(np.roll(base, i * 7, axis=1))
        wr.close()
        return path

    clip = make_clip("main", nframes)
    warm = make_clip("warm", batch + 1)  # same step shapes as the main run

    runtime = RuntimeConfig(random_weights=True, batch_size=batch)

    def run_fused(src):
        t0 = time.perf_counter()
        multiband.run_fused(src, runtime, mask_on=True, mask_sdf=True,
                            depth_band="depth_anything",
                            depth_build={"encoder": "vitl"},
                            flow_band="flow_gmflow")
        return time.perf_counter() - t0

    # warm-up pass compiles every band step (and populates the persistent XLA
    # cache); the timed pass then measures the decode->device->encode pipeline
    # the way a long production video sees it: compile amortized away.
    run_fused(warm)
    dt = run_fused(clip)
    shutil.rmtree(work, ignore_errors=True)

    fps = nframes / dt
    return {"metric": "e2e_depth_flow_mask_1080p_fps_per_chip", "value": fps,
            "unit": "frames/s/chip", "vs_baseline": fps / NORTH_STAR_PER_CHIP,
            "note": "fused single-decode 3-band pipeline (multiband.run_fused"
                    ", the process.py default); through the TUNNELED chip "
                    "this is H2D/D2H-transfer-bound, not representative of "
                    "local-chip IO",
            "detail": {"frames": nframes, "includes_compile": False}}


def bench_host_io():
    """Host-side half of the 3-band north star (VERDICT r3 item 3): can the
    native codec decode one 1080p rgba stream and encode the three band mp4s
    fast enough to feed the measured 11.17 device fps? Measures, on this
    host's CPUs: (a) decode-only fps, (b) single-stream 1080p x264 encode
    fps, (c) the full decode + 3x encode pipeline (VideoWriter's async worker
    threads, the production structure). Reports (c) as the metric and the
    cores-needed arithmetic in the note — this container exposes ONE core,
    so the per-core rates are the honest result and the note scales them.
    No TPU required."""
    import shutil
    import tempfile

    import numpy as np
    from prisma_tpu.io.video import VideoReader, VideoWriter

    nframes = int(os.environ.get("PRISMA_BENCH_HOSTIO_FRAMES", "48"))
    work = tempfile.mkdtemp(prefix="prisma_hostio_")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
    # band-output-like frames: smooth heatmap-ish content (what depth/flow
    # mp4s actually contain), not raw noise — x264 cost is content-dependent
    yy, xx = np.mgrid[0:1080, 0:1920]
    smooth = np.stack([(xx * 255 // 1920), (yy * 255 // 1080),
                       ((xx + yy) * 255 // 3000)], -1).astype(np.uint8)

    src = os.path.join(work, "rgba.mp4")
    wr = VideoWriter(1920, 1080, 24.0, filename=src)
    for i in range(nframes):
        wr.write(np.roll(base, i * 7, axis=1))
    wr.close()

    ncpu = os.cpu_count() or 1

    # (a) decode only
    rd = VideoReader(src)
    t0 = time.perf_counter()
    n = sum(1 for _ in rd)
    dec_fps = n / (time.perf_counter() - t0)
    rd.close()

    frames = [np.roll(smooth, i * 13, axis=1) for i in range(nframes)]
    enc_fps = {}
    pipe_fps = {}
    # "" = x264 default "medium" (the reference writer's settings); "veryfast"
    # is the production throughput lever (PRISMA_X264_PRESET / VideoWriter
    # preset=): at crf 15 it measures the same decoded fidelity on band-like
    # content with SMALLER files, ~3x faster.
    for preset in ("", "veryfast"):
        tag = preset or "medium"
        # (b) single-stream encode of band-like frames
        wr = VideoWriter(1920, 1080, 24.0, preset=preset,
                         filename=os.path.join(work, f"enc_{tag}.mp4"))
        t0 = time.perf_counter()
        for f in frames:
            wr.write(f)
        wr.close()
        enc_fps[tag] = nframes / (time.perf_counter() - t0)

        # (c) decode + 3x encode, async writer threads (production structure)
        writers = [VideoWriter(1920, 1080, 24.0, preset=preset,
                               filename=os.path.join(work, f"band{k}_{tag}.mp4"))
                   for k in range(3)]
        rd = VideoReader(src)
        t0 = time.perf_counter()
        n = 0
        for frame in rd:
            for k, w in enumerate(writers):
                w.write(frames[n % nframes] if k else frame)
            n += 1
        for w in writers:
            w.close()
        pipe_fps[tag] = n / (time.perf_counter() - t0)
        rd.close()

    # (d) segment-pool scaling curve: SegmentedVideoWriter with `workers`
    # concurrent x264 instances per stream (io/video.py). On a 1-core host
    # the curve is flat by construction; on N cores it is the lever that
    # multiplies (b)/(c) toward the device rate.
    from prisma_tpu.io.video import SegmentedVideoWriter
    pool_fps = {}
    for workers in (1, 2, 4):
        wr = SegmentedVideoWriter(
            1920, 1080, 24.0, segment_frames=12, preset="veryfast",
            workers=workers,
            filename=os.path.join(work, f"pool{workers}.mp4"))
        t0 = time.perf_counter()
        for f in frames:
            wr.write(f)
        wr.close()
        pool_fps[workers] = nframes / (time.perf_counter() - t0)
    shutil.rmtree(work, ignore_errors=True)

    best = pipe_fps["veryfast"]
    need = 11.17 / best  # cores-equivalents to feed the measured device rate
    curve = " / ".join(f"{w}w {v:.1f}" for w, v in pool_fps.items())
    return {"metric": "host_io_3band_fps", "value": best,
            "unit": "frames/s", "vs_baseline": best / NORTH_STAR_PER_CHIP,
            "note": f"decode {dec_fps:.1f} fps; 1-stream encode "
                    f"{enc_fps['medium']:.1f} fps medium-preset / "
                    f"{enc_fps['veryfast']:.1f} veryfast; decode+3x-encode "
                    f"{pipe_fps['medium']:.1f} medium / {best:.1f} veryfast "
                    f"on {ncpu} host core(s); segment-pool encode fps "
                    f"(veryfast, per stream): {curve} — needs cores to "
                    f"scale; oversubscribing workers on too few cores "
                    f"DEGRADES (hence the auto default of cores//2); "
                    f"feeding 11.17 device fps needs "
                    f"~{need:.1f}x this host's cores at veryfast "
                    f"(fidelity-equivalent at crf 15, smaller files)"}


BENCHES = {
    "depth_anything": bench_depth_anything,
    "depth_midas": bench_depth_midas,
    "flow_raft": bench_flow_raft,
    "flow_gmflow": bench_flow_gmflow,
    "flow_gmflow_refine": bench_flow_gmflow_refine,
    "mask": bench_mask,
    "patchfusion": bench_patchfusion,
    "marigold": bench_marigold,
    "3band": bench_3band,
    "e2e": bench_e2e,
    "host_io": bench_host_io,
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--only", help="run a single config in-process")
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--configs", nargs="*", default=list(BENCHES))
    args = parser.parse_args(argv)

    if args.list:
        print("\n".join(BENCHES))
        return

    if args.only:
        result = BENCHES[args.only]()
        result["value"] = round(result["value"], 3)
        if result.get("vs_baseline") is not None:
            result["vs_baseline"] = round(result["vs_baseline"], 3)
        print(json.dumps(result))
        return

    # run each config in a fresh subprocess: isolated HBM arena + compile cache
    results = []
    for name in args.configs:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name],
            capture_output=True, text=True,
            timeout=int(os.environ.get("PRISMA_BENCH_TIMEOUT", "3600")))
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and line:
            result = json.loads(line[-1])
            results.append(result)
            print(json.dumps(result))
        else:
            print(json.dumps({"metric": name, "error":
                              (proc.stderr or proc.stdout)[-400:]}))
    # merge into any existing BENCHMARKS.json so partial --configs reruns
    # update their entries without dropping the rest
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCHMARKS.json")
    merged = {}
    if os.path.exists(path):
        try:
            merged = {r["metric"]: r for r in json.load(open(path))
                      if "error" not in r}
        except Exception:
            merged = {}
    for r in results:
        merged[r["metric"]] = r
    with open(path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)


if __name__ == "__main__":
    main()
