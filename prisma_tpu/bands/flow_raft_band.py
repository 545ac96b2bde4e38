"""flow_raft band driver: RAFT optical flow on TPU.

Reference contract (`bands/flow_raft.py`): per consecutive frame pair, fwd (and
optionally bwd) flow at 0.75 input scale, HSV-encoded into <band>.mp4 (the
encoder upscales back to frame size), max displacement per frame in <band>.csv,
optional consistency-mask videos, optional .flo files in <subpath>_fwd/_bwd;
the LAST frame is zero flow (flow_raft.py:115-126). Metadata values block gets
the csv url (flow_raft.py:143-152).

TPU design: frame pairs are batched (pairs axis), fwd+bwd ride one doubled
batch through the encoder/correlation (reference's own trick, batched further),
and the HSV + consistency-mask epilogues are fused into the jitted step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.io.video import VideoReader, VideoWriter
from prisma_tpu.io.writers import write_csv, write_flo
from prisma_tpu.models import raft as jraft
from prisma_tpu.ops import encode as enc
from prisma_tpu.ops.flow import compute_fwdbwd_mask_batch
from prisma_tpu.ops.resize import resize2d
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_raft

BAND = "flow_raft"
SCALE = 0.75
ITERATIONS = 20


def _make_step(params, ds_hw, need_masks: bool, need_flow: bool, iters: int,
               dtype):
    """Jitted step: frames [T+1, H, W, 3] u8 -> per-pair outputs at ds size."""
    dh, dw = ds_hw

    @jax.jit
    def step(params, frames_u8):
        frames = frames_u8.astype(jnp.float32)
        ds = resize2d(frames, (dh, dw), method="cubic")  # INTER_CUBIC x0.75
        img1, img2 = ds[:-1], ds[1:]
        fwd, bwd = jraft.infer_pairs(params, img1, img2, iters=iters)
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
        return out

    return lambda frames: step(params, frames)


def run(input_path: str, output: str = "", subpath: str = "",
        backwards: bool = False, mask: bool = False, iterations: int = ITERATIONS,
        scale: float = SCALE, runtime: RuntimeConfig | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, force_extension="mp4",
                 runtime=runtime)
    out_base = io.output.rsplit(".", 1)[0]

    # .flo subpath dirs (reference flow_raft.py:206-211)
    flo_dir = ""
    if subpath:
        io.set_folder(subpath)
        flo_dir = os.path.join(io.output_folder, subpath)
        os.makedirs(flo_dir + "_fwd", exist_ok=True)
        if backwards:
            os.makedirs(flo_dir + "_bwd", exist_ok=True)

    params = jax.device_put(load_raft(runtime))
    reader = VideoReader(io.input)
    W, H, fps = reader.width, reader.height, reader.fps
    # cv2.resize(None, fx, fy) output size = round(dim * f) (flow_raft.py:100)
    dh, dw = int(round(H * scale)), int(round(W * scale))

    fwd_video = VideoWriter(W, H, fps, filename=io.output)
    bwd_video = VideoWriter(W, H, fps, filename=out_base + "_bwd.mp4") \
        if backwards else None
    fwd_mask_video = bwd_mask_video = None
    output_mask = ""
    if mask:
        output_mask = os.path.join(io.output_folder, BAND + "_mask.mp4")
        fwd_mask_video = VideoWriter(W, H, fps, filename=output_mask)
        if backwards:
            bwd_mask_video = VideoWriter(W, H, fps,
                                         filename=out_base + "_mask_bwd.mp4")

    need_flow = bool(flo_dir) or backwards
    step = _make_step(params, (dh, dw), mask, need_flow, iterations,
                      runtime.resolve_dtype())

    # batch consecutive frames with 1-frame overlap so each batch covers
    # batch_size-1 pairs
    pairs_per_batch = max(1, runtime.batch_size - 1)
    max_disps: list[float] = []
    idx = 0

    def emit(out, n_pairs):
        nonlocal idx
        fwd_rgb = np.asarray(out["fwd_rgb"])
        md = np.asarray(out["max_disp"])
        for b in range(n_pairs):
            fwd_video.write(fwd_rgb[b])
            max_disps.append(float(md[b]))
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
            if flo_dir:
                write_flo(os.path.join(flo_dir + "_fwd", "%04d.flo" % idx),
                          np.asarray(out["fwd"][b]))
                if backwards:
                    write_flo(os.path.join(flo_dir + "_bwd", "%04d.flo" % idx),
                              np.asarray(out["bwd"][b]))
            idx += 1

    window: list[np.ndarray] = []
    for frame in reader:
        window.append(frame)
        if len(window) == pairs_per_batch + 1:
            emit(step(np.stack(window)), pairs_per_batch)
            window = window[-1:]
    if len(window) > 1:
        # pad the tail by repeating the last frame to keep shapes static
        n_pairs = len(window) - 1
        while len(window) < pairs_per_batch + 1:
            window.append(window[-1])
        emit(step(np.stack(window)), n_pairs)

    # last frame: zero flow (reference flow_raft.py:115-126)
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

    for v in (fwd_video, bwd_video, fwd_mask_video, bwd_mask_video):
        if v is not None:
            v.close()
    reader.close()

    write_csv(out_base + ".csv", max_disps)

    if io.data is not None:
        io.data["bands"][BAND] = {
            "url": BAND + ".mp4",
            "values": {"dist": {"type": "float", "url": BAND + ".csv"}},
        }
        if subpath:
            io.data["bands"][BAND]["folder"] = subpath
        if backwards:
            io.data["bands"][BAND + "_bwd"] = {"url": BAND + "_bwd.mp4"}
            if subpath:
                io.data["bands"][BAND + "_bwd"]["folder"] = subpath + "_bwd"
        if mask:
            io.data["bands"][BAND + "_mask"] = {"url": BAND + "_mask.mp4"}
            if backwards:
                io.data["bands"][BAND + "_mask_bwd"] = {
                    "url": BAND + "_mask_bwd.mp4"}
    io.finish()
    return io
