"""Fused single-decode multi-band pipeline: mask + depth + flow in ONE pass.

The reference runs one subprocess per band, each re-decoding the source video
(reference process.py:60-73). Here the production default (video input with
mask, depth and flow all requested) decodes rgba.mp4 ONCE and drives the three
band steps per frame batch in one process: the three jitted programs coexist
on the chip (bench_all.bench_3band measured 11.17 fps/chip for exactly this
shape), host decode drops 3x, and each band's mp4s encode on their writers'
background threads while the device computes the next batch — SURVEY.md §7's
"one process, frames batched across time" architecture.

Each band's host epilogue is the SAME sink object its sequential driver uses
(depth_base.DepthVideoSink, flow_base.FlowVideoSink, mask_band.MaskVideoSink),
and the batch/window grouping matches the sequential drivers exactly, so the
fused outputs are byte-identical to running the bands one by one
(tests/test_multiband.py golden-compares both paths).

Frame-index resume: every output video is segmented as usual; the pipeline
resumes all bands at the MIN of their completed segment boundaries, so one
shared reader position serves every sink (bands ahead of the min simply
rewrite identical segments).
"""

from __future__ import annotations

import numpy as np

from prisma_tpu.bands.base import resolve
from prisma_tpu.io.video import VideoReader
from prisma_tpu.runtime.config import RuntimeConfig

# video depth bands whose step is a single fused jit (depth_base.make_step
# fused=True); tile/ensemble drivers (patchfusion, marigold) host-loop per
# frame and run sequentially instead
FUSED_DEPTH_BANDS = ("depth_anything", "depth_midas", "depth_zoedepth")


def _resolve_or_skip(band, input_path, runtime, subpath="",
                     force_extension="png"):
    from prisma_tpu.utils import meta
    try:
        io = resolve(band, input_path, output="", subpath=subpath,
                     force_extension=force_extension, runtime=runtime)
    except FileExistsError as e:
        print(f"#  {band}: skipping ({e}); pass --force to recompute")
        return None
    # persist the band entry resolve() registered (url via meta.get_target)
    # so the NEXT band's resolve loads it — the sequential drivers get this
    # ordering for free by reloading metadata.json between bands
    if io.data is not None:
        meta.write_metadata(io.meta_root, io.data)
    return io


def run_fused(input_path: str, runtime: RuntimeConfig | None = None, *,
              mask_on: bool = True, mask_sdf: bool = True,
              mask_confidence: float | None = None, mask_subpath: str = "",
              depth_band: str | None = "depth_anything",
              depth_build: dict | None = None, depth_subpath: str = "",
              depth_npy: bool = False,
              flow_band: str | None = "flow_gmflow",
              flow_build: dict | None = None, flow_backwards: bool = False,
              flow_mask: bool = False, flow_subpath: str = "",
              flow_subpath_mask: str = "", flow_scale: float = 0.75,
              ) -> dict[str, bool]:
    """Run the requested subset of {mask, depth, flow} over one decode.

    depth_build / flow_build: kwargs for the band module's build_infer /
    build_pairs (encoder=, metric=, img_size= / iterations=, corr_impl=,
    inference_size=, cfg=). Returns {band_name: ran} for the bands that
    actually computed (False = skipped as already present).
    """
    from prisma_tpu.bands import depth_base, flow_base, mask_band

    runtime = runtime or RuntimeConfig()
    ran: dict[str, bool] = {}

    # -- resolve everything first (exists-and-not-forced skips happen before
    #    any weight load or device work, like the sequential drivers)
    mask_io = depth_io = flow_io = None
    if mask_on:
        mask_io = _resolve_or_skip(mask_band.BAND, input_path, runtime,
                                   subpath=mask_subpath)
        ran["mask_mmdet"] = mask_io is not None
    if depth_band is not None:
        if depth_band not in FUSED_DEPTH_BANDS:
            raise ValueError(f"{depth_band} is not fusable "
                             f"(fused set: {FUSED_DEPTH_BANDS})")
        depth_io = _resolve_or_skip(depth_band, input_path, runtime,
                                    subpath=depth_subpath)
        ran[depth_band] = depth_io is not None
    if flow_band is not None:
        flow_io = _resolve_or_skip(flow_band, input_path, runtime,
                                   force_extension="mp4")
        ran[flow_band] = flow_io is not None

    ios = [io for io in (mask_io, depth_io, flow_io) if io is not None]
    if not ios:
        return ran
    active = [io.band for io in ios]
    print(f"\n#  {' + '.join(b.upper() for b in active)} "
          f"(fused single-decode)")

    # -- one metadata dict shared by every sink: each band's finish() updates
    #    the same object (sequential runs reload metadata.json between bands).
    #    The LAST resolved io saw every earlier band's entry (persisted above).
    shared = next((io.data for io in reversed(ios) if io.data is not None),
                  None)
    if shared is not None:
        for io in ios:
            io.data = shared

    reader = VideoReader(ios[0].input)
    W, H, fps = reader.width, reader.height, reader.fps
    B = runtime.batch_size
    win = max(1, B - 1) + 1  # flow window: pairs_per_batch consecutive pairs

    # -- global resume point: the min over the active bands' completed
    #    segments. Sinks may lower it further (inconsistent ledger); rebuild
    #    until all sinks agree so one reader position serves everyone.
    seg = getattr(runtime, "segment_frames", 0)
    global_start = 0
    if seg:
        from prisma_tpu.io.video import SegmentedVideoWriter
        done = []
        for io in ios:
            done.append(SegmentedVideoWriter.completed_frames(io.output, seg))
        global_start = min(done) if done else 0

    def build_sinks(start):
        sinks = {}
        if mask_io is not None:
            sinks["mask"] = mask_band.MaskVideoSink(mask_io, W, H, fps,
                                                    sdf=mask_sdf, start=start)
        if depth_io is not None:
            sinks["depth"] = depth_base.DepthVideoSink(
                depth_io, W, H, fps, flip=depth_flip, npy=depth_npy,
                start=start)
        if flow_io is not None:
            sinks["flow"] = flow_base.FlowVideoSink(
                flow_io, W, H, fps, backwards=flow_backwards, mask=flow_mask,
                subpath=flow_subpath, subpath_mask=flow_subpath_mask,
                start=start)
        return sinks

    def discard_sinks(sinks):
        for s in sinks.values():
            ledger = getattr(s, "ledger", None)
            if ledger is not None:
                ledger.close()

    # -- build the device steps (weights load only for bands that will run)
    mask_step = depth_step = flow_step = None
    depth_flip = False
    if mask_io is not None:
        from prisma_tpu.models import solov2
        from prisma_tpu.weights.store import load_solov2
        cfg = solov2.SOLOv2Config()
        conf = mask_band.CONFIDENCE_THRESHOLD if mask_confidence is None \
            else mask_confidence
        mask_step = mask_band._make_step(load_solov2(runtime, cfg), (H, W),
                                         cfg, conf, mask_sdf,
                                         dtype=runtime.resolve_dtype())
    if depth_io is not None:
        import importlib
        mod = importlib.import_module(f"prisma_tpu.bands.{depth_band}_band")
        params, infer, depth_flip = mod.build_infer(runtime,
                                                    **(depth_build or {}))
        need_depth = bool(depth_io.subpath) or depth_npy
        depth_step = depth_base.make_step(params, infer, depth_flip,
                                          need_depth)

    sinks = build_sinks(global_start if seg else None)
    while seg and min(s.start for s in sinks.values()) != global_start:
        global_start = min(s.start for s in sinks.values())
        discard_sinks(sinks)
        sinks = build_sinks(global_start)

    if flow_io is not None:
        import importlib
        mod = importlib.import_module(f"prisma_tpu.bands.{flow_band}_band")
        fparams, finfer = mod.build_pairs(runtime, **(flow_build or {}))
        if callable(fparams):
            fparams = fparams()
        flow_step = flow_base.build_flow_step(fparams, finfer, flow_scale,
                                              W, H, sinks["flow"], runtime)

    # -- the fused loop: dispatch all three steps for a batch (device work
    #    overlaps), then feed each band's sink (numpy fetch + encode queues)
    reader.skip(global_start)
    flow_buf: list[np.ndarray] = []
    for frames, valid in reader.batches(B, pad_to_full=True):
        mask_out = mask_step(frames) if mask_step is not None else None
        depth_out = depth_step(frames, idx0=sinks["depth"].idx) \
            if depth_step is not None else None
        flow_outs = []
        if flow_step is not None:
            flow_buf.extend(frames[:valid])
            while len(flow_buf) >= win:
                window = np.stack(flow_buf[:win])
                flow_buf = flow_buf[win - 1:]
                flow_outs.append(flow_step(window))
        if mask_out is not None:
            sinks["mask"].emit(mask_out, valid)
        if depth_out is not None:
            sinks["depth"].emit(depth_out, valid)
        for out in flow_outs:
            sinks["flow"].emit(out, win - 1)

    # flow tail: a short final window pads by repeating the last frame
    # (identical grouping to flow_base.run_flow_band)
    if flow_step is not None and len(flow_buf) > 1:
        n_pairs = len(flow_buf) - 1
        while len(flow_buf) < win:
            flow_buf.append(flow_buf[-1])
        sinks["flow"].emit(flow_step(np.stack(flow_buf)), n_pairs)

    if "mask" in sinks:
        sinks["mask"].close()
        mask_band.finish_meta(mask_io, mask_subpath)
    if "depth" in sinks:
        sinks["depth"].close()
    if "flow" in sinks:
        sinks["flow"].close()
    reader.close()
    return ran
