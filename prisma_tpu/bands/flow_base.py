"""Shared flow-band driver loop (flow_raft / flow_gmflow).

Reference contract (`bands/flow_raft.py`, `bands/flow_gmflow.py` — identical
driver shape): 0.75x INTER_CUBIC downscale, per consecutive pair fwd (+bwd)
flow, HSV mp4 (re-upscaled by the encoder), max-disp CSV, optional consistency
mask videos, optional .flo subpaths, zero-flow last frame, metadata bands.

The model-specific part is a jitted step factory: frames [T+1, h', w', 3] f32
-> dict of per-pair device outputs.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.io.video import VideoReader, VideoWriter
from prisma_tpu.io.writers import write_csv, write_flo, write_flow_png16
from prisma_tpu.ops import encode as enc
from prisma_tpu.ops.flow import compute_fwdbwd_mask_batch
from prisma_tpu.ops.resize import resize2d
from prisma_tpu.runtime.config import RuntimeConfig


def make_flow_step(params, infer_pairs: Callable, ds_hw, need_masks: bool,
                   need_flow: bool, dtype=None, need_enc: bool = False):
    """Wrap a model's infer_pairs into the fused band step (resize + HSV +
    consistency epilogues).

    Multi-chip: params replicate and the frame window shards over the data
    mesh when it divides evenly; the consecutive-pair construction
    (ds[:-1], ds[1:]) becomes a halo exchange XLA lowers to a ppermute.
    """
    dh, dw = ds_hw
    from prisma_tpu.parallel import batch_sharding, data_mesh_or_none, \
        shard_params
    mesh = data_mesh_or_none()
    if mesh is not None:
        params = shard_params(params, mesh)
        sharding = batch_sharding(mesh)
        n_dev = mesh.devices.size
    else:
        params = jax.device_put(params)

    @jax.jit
    def step(params, frames_u8):
        frames = frames_u8.astype(jnp.float32)
        ds = resize2d(frames, (dh, dw), method="cubic")
        if dtype is not None:
            ds = ds.astype(dtype)
        img1, img2 = ds[:-1], ds[1:]
        fwd, bwd = infer_pairs(params, img1, img2)
        fwd = fwd.astype(jnp.float32)
        bwd = bwd.astype(jnp.float32)
        fwd_rgb, fwd_max = jax.vmap(enc.process_flow)(fwd)
        out = {"fwd_rgb": fwd_rgb, "max_disp": fwd_max}
        if need_masks or need_flow:
            out["fwd"] = fwd
            out["bwd"] = bwd
            bwd_rgb, _ = jax.vmap(enc.process_flow)(bwd)
            out["bwd_rgb"] = bwd_rgb
        if need_masks:
            fm, bm = compute_fwdbwd_mask_batch(fwd, bwd)
            out["fwd_mask"] = fm
            out["bwd_mask"] = bm
            if need_enc:
                # 16-bit packed flow+validity (--subpath_mask PNGs), encoded
                # on device inside the same fused step
                out["fwd_enc"] = jax.vmap(enc.encode_flow)(fwd, fm)
                out["bwd_enc"] = jax.vmap(enc.encode_flow)(bwd, bm)
        return out

    def call(frames):
        if mesh is not None:
            f = jnp.asarray(frames)
            if f.shape[0] % n_dev == 0:
                frames = jax.device_put(f, sharding)
        return step(params, frames)

    return call


def run_flow_band(band: str, input_path: str, params, infer_pairs: Callable,
                  output: str = "", subpath: str = "", backwards: bool = False,
                  mask: bool = False, scale: float = 0.75,
                  subpath_mask: str = "",
                  runtime: RuntimeConfig | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    io = resolve(band, input_path, output=output, force_extension="mp4",
                 runtime=runtime)
    if callable(params):
        # lazy weights: resolve (and its exists-and-not-forced FileExists
        # skip) happens before any checkpoint load / device work
        params = params()
    out_base = io.output.rsplit(".", 1)[0]

    flo_dir = ""
    if subpath:
        io.set_folder(subpath)
        flo_dir = os.path.join(io.output_folder, subpath)
        os.makedirs(flo_dir + "_fwd", exist_ok=True)
        if backwards:
            os.makedirs(flo_dir + "_bwd", exist_ok=True)

    # --subpath_mask: per-pair 16-bit packed flow+validity PNGs (reference
    # flow_raft.py:212-216 / common/flow.py:95-98)
    enc_dir = ""
    if subpath_mask:
        enc_dir = os.path.join(io.output_folder, subpath_mask)
        os.makedirs(enc_dir + "_fwd", exist_ok=True)
        if backwards:
            os.makedirs(enc_dir + "_bwd", exist_ok=True)

    reader = VideoReader(io.input)
    W, H, fps = reader.width, reader.height, reader.fps
    dh, dw = int(round(H * scale)), int(round(W * scale))

    # frame-index resume (SURVEY §5): every output video is segmented; the
    # resume point is the last segment boundary ALL of them completed, backed
    # by a max-disp ledger fsynced before each boundary (depth_base pattern)
    seg = getattr(runtime, "segment_frames", 0)
    video_paths = [io.output]
    if backwards:
        video_paths.append(out_base + "_bwd.mp4")
    if mask:
        video_paths.append(os.path.join(io.output_folder, band + "_mask.mp4"))
        if backwards:
            video_paths.append(out_base + "_mask_bwd.mp4")

    start = 0
    max_disps: list[float] = []
    ledger = None
    if seg:
        import shutil

        from prisma_tpu.io.video import SegmentedVideoWriter
        start = min(SegmentedVideoWriter.completed_frames(p, seg)
                    for p in video_paths)
        ledger_path = io.output + ".segments/values.csv"
        if start:
            rows = []
            if os.path.exists(ledger_path):
                rows = [r for r in open(ledger_path).read().splitlines() if r]
            if len(rows) < start:
                for p in video_paths:
                    shutil.rmtree(p + ".segments", ignore_errors=True)
                start = 0
            else:
                max_disps = [float(r) for r in rows[:start]]
        os.makedirs(os.path.dirname(ledger_path), exist_ok=True)
        with open(ledger_path, "w") as f:
            for v in max_disps:
                f.write(f"{v!r}\n")
        ledger = open(ledger_path, "a")

        def make_writer(path):
            return SegmentedVideoWriter(W, H, fps, filename=path,
                                        segment_frames=seg, start_frame=start)
    else:
        def make_writer(path):
            return VideoWriter(W, H, fps, filename=path)

    fwd_video = make_writer(io.output)
    bwd_video = make_writer(out_base + "_bwd.mp4") if backwards else None
    fwd_mask_video = bwd_mask_video = None
    if mask:
        fwd_mask_video = make_writer(os.path.join(io.output_folder,
                                                  band + "_mask.mp4"))
        if backwards:
            bwd_mask_video = make_writer(out_base + "_mask_bwd.mp4")

    # production dtype: bf16 params + bf16 model inputs (MXU path); the
    # HSV/consistency epilogues stay f32 (make_flow_step casts flows back)
    dtype = runtime.resolve_dtype()
    from prisma_tpu.weights.store import cast_params
    params = cast_params(params, dtype)
    need_flow = bool(flo_dir) or backwards
    need_masks = mask or bool(enc_dir)
    step = make_flow_step(params, infer_pairs, (dh, dw), need_masks, need_flow,
                          dtype=dtype, need_enc=bool(enc_dir))

    pairs_per_batch = max(1, runtime.batch_size - 1)
    idx = start
    reader.skip(start)

    def emit(out, n_pairs):
        nonlocal idx
        fwd_rgb = np.asarray(out["fwd_rgb"])
        md = np.asarray(out["max_disp"])
        for b in range(n_pairs):
            max_disps.append(float(md[b]))
            if ledger is not None:
                # ledger rows hit disk before the segment-closing write below
                ledger.write(f"{max_disps[-1]!r}\n")
                if (idx + 1) % seg == 0:
                    ledger.flush()
                    os.fsync(ledger.fileno())
            # per-frame .flo/.png artifacts hit disk BEFORE any mp4 frame
            # write: a segment-closing write marks the frame complete for
            # resume
            if flo_dir:
                write_flo(os.path.join(flo_dir + "_fwd", "%04d.flo" % idx),
                          np.asarray(out["fwd"][b]))
                if backwards:
                    write_flo(os.path.join(flo_dir + "_bwd", "%04d.flo" % idx),
                              np.asarray(out["bwd"][b]))
            if enc_dir:
                write_flow_png16(
                    os.path.join(enc_dir + "_fwd", "%04d.png" % idx),
                    np.asarray(out["fwd_enc"][b]))
                if backwards:
                    write_flow_png16(
                        os.path.join(enc_dir + "_bwd", "%04d.png" % idx),
                        np.asarray(out["bwd_enc"][b]))
            fwd_video.write(fwd_rgb[b])
            if mask:
                fm = np.asarray(out["fwd_mask"][b])
                fwd_mask_video.write(np.stack([np.where(fm, 255, 0)] * 3,
                                              -1).astype(np.uint8))
                if bwd_mask_video is not None:
                    bm = np.asarray(out["bwd_mask"][b])
                    bwd_mask_video.write(np.stack([np.where(bm, 255, 0)] * 3,
                                                  -1).astype(np.uint8))
            if backwards and bwd_video is not None:
                bwd_video.write(np.asarray(out["bwd_rgb"][b]))
            idx += 1

    window: list[np.ndarray] = []
    for frame in reader:
        window.append(frame)
        if len(window) == pairs_per_batch + 1:
            emit(step(np.stack(window)), pairs_per_batch)
            window = window[-1:]
    if len(window) > 1:
        n_pairs = len(window) - 1
        while len(window) < pairs_per_batch + 1:
            window.append(window[-1])
        emit(step(np.stack(window)), n_pairs)

    # zero-flow last frame (reference flow_raft.py:115-126)
    zero_flow = np.zeros((H, W, 2), np.float32)
    zrgb, zmax = enc.process_flow(zero_flow)
    fwd_video.write(np.asarray(zrgb))
    max_disps.append(float(zmax))
    if backwards and bwd_video is not None:
        bwd_video.write(np.asarray(zrgb))
    if mask:
        zm = np.zeros((H, W, 3), np.uint8)
        fwd_mask_video.write(zm)
        if bwd_mask_video is not None:
            bwd_mask_video.write(zm)
    if flo_dir:
        write_flo(os.path.join(flo_dir + "_fwd", "%04d.flo" % idx), zero_flow)
        if backwards:
            write_flo(os.path.join(flo_dir + "_bwd", "%04d.flo" % idx), zero_flow)
    if enc_dir:
        # reference quirk: the final zero-flow frame is encoded at ORIGINAL
        # resolution (flow_raft.py:117-126 builds zeros from the full-size
        # frame), while per-pair PNGs are at the downscaled size
        zenc = np.concatenate(
            [np.full((H, W, 2), 2 ** 15, np.uint16),
             np.zeros((H, W, 1), np.uint16)], axis=-1)
        write_flow_png16(os.path.join(enc_dir + "_fwd", "%04d.png" % idx), zenc)
        if backwards:
            write_flow_png16(os.path.join(enc_dir + "_bwd", "%04d.png" % idx),
                             zenc)

    if ledger is not None:
        ledger.close()
    for v in (fwd_video, bwd_video, fwd_mask_video, bwd_mask_video):
        if v is not None:
            v.close()
    reader.close()

    write_csv(out_base + ".csv", max_disps)

    if io.data is not None:
        io.data["bands"][band] = {
            "url": band + ".mp4",
            "values": {"dist": {"type": "float", "url": band + ".csv"}},
        }
        if subpath:
            io.data["bands"][band]["folder"] = subpath
        if backwards:
            io.data["bands"][band + "_bwd"] = {"url": band + "_bwd.mp4"}
            if subpath:
                io.data["bands"][band + "_bwd"]["folder"] = subpath + "_bwd"
        if mask:
            io.data["bands"][band + "_mask"] = {"url": band + "_mask.mp4"}
            if backwards:
                io.data["bands"][band + "_mask_bwd"] = {
                    "url": band + "_mask_bwd.mp4"}
    io.finish()
    return io
