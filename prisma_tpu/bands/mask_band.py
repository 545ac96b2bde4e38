"""mask band driver: SOLOv2 instance segmentation -> white-on-black mask.

Reference contract (`bands/mask_mmdet.py`): run SOLOv2 per frame, keep only
person/animal classes above confidence 0.5, SUM the white (255) binary masks
into an RGB image (uint8 wraparound preserved), optionally pack a clamped SDF
into the GREEN channel (--sdf), write inverted (255 - mask) per-frame PNGs for
COLMAP masking, and register band "mask" with the kept class list in metadata
(mask_mmdet.py:84-102,131-161).

TPU design: frames ride the batch axis (vmapped SOLOv2 forward = batched
convs + batched static-K NMS), the batch is sharded over the data mesh, and
the SDF green channel is computed on device inside the same jitted step
(ops/sdf.py) — zero host compute in the loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.io.image import open_rgb, write_rgb_u8
from prisma_tpu.io.video import VideoReader, VideoWriter
from prisma_tpu.models import solov2
from prisma_tpu.ops.sdf import sdf_green_device
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_solov2

BAND = "mask"

# COCO indices of the reference's kept classes (mask_mmdet.py:30)
CLASSES = ["person", "bird", "cat", "dog", "horse", "sheep", "cow",
           "elephant", "bear", "zebra", "giraffe"]
CLASS_IDS = (0, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23)
CONFIDENCE_THRESHOLD = 0.5


def _make_step(params, ori_hw, cfg: solov2.SOLOv2Config, confidence: float,
               sdf: bool, dtype=None):
    class_ids = jnp.asarray(CLASS_IDS)
    if dtype is not None:
        from prisma_tpu.weights.store import cast_params
        params = cast_params(params, dtype)

    # multi-chip: replicate params, shard the frame batch over the data mesh
    from prisma_tpu.parallel import batch_sharding, data_mesh_or_none, \
        shard_params
    mesh = data_mesh_or_none()
    if mesh is not None:
        params = shard_params(params, mesh)
        sharding = batch_sharding(mesh)
        n_dev = mesh.devices.size
    else:
        params = jax.device_put(params)

    def one(params, frame_u8):
        img, img_hw = solov2.preprocess(frame_u8[None], dtype=dtype,
                                        scale=cfg.scale)
        out = solov2.forward(params, img, img_hw, ori_hw, cfg)
        keep = (out["valid"] & (out["scores"] > confidence)
                & jnp.any(out["labels"][:, None] == class_ids[None, :], axis=1))
        # reference sums 255-white masks in float then casts to uint8 (wraps)
        composite = jnp.sum(
            jnp.where(keep[:, None, None], out["masks"], False).astype(jnp.float32)
            * 255.0, axis=0)
        res = {"composite": composite}
        if sdf:
            res["green"] = sdf_green_device(composite != 0.0)
        return res

    @jax.jit
    def step(params, frames_u8):
        return jax.vmap(lambda f: one(params, f))(frames_u8)

    def call(frames):
        if mesh is not None:
            f = jnp.asarray(frames)
            if f.shape[0] % n_dev == 0:
                frames = jax.device_put(f, sharding)
        return step(params, frames)

    return call


def _composite_to_rgb(composite: np.ndarray) -> np.ndarray:
    m = composite.astype(np.float64)
    return np.stack([m, m, m], axis=-1)


def _write_frame(masks_f64, green, writer_or_path, inverted_path=""):
    """Host epilogue per frame: inverted PNG (pre-SDF, reference order), green
    channel injection, uint8 cast with the reference's wrap semantics."""
    if inverted_path:
        write_rgb_u8(inverted_path, (255.0 - masks_f64).astype(np.uint8))
    if green is not None:
        masks_f64[..., 1] = green.astype(np.float64) * 255.0
    frame = masks_f64.astype(np.uint8)
    if isinstance(writer_or_path, str):
        write_rgb_u8(writer_or_path, frame)
    else:
        writer_or_path.write(frame)


class MaskVideoSink:
    """Host epilogue of the mask video band: segmented mp4 writer with
    frame-index resume + inverted per-frame COLMAP PNGs.

    Shared verbatim by the sequential driver (run) and the fused
    single-decode multi-band pipeline (bands/multiband.py). Per-frame PNGs
    are idempotent so only the mp4 needs the segment machinery.
    """

    def __init__(self, io: BandIO, width: int, height: int, fps: float,
                 sdf: bool, start: int | None = None):
        self.io = io
        self.sdf = sdf
        runtime = io.runtime
        seg = getattr(runtime, "segment_frames", 0)
        self.start = 0
        preset = getattr(runtime, "x264_preset", None)
        if seg:
            from prisma_tpu.io.video import SegmentedVideoWriter
            self.start = SegmentedVideoWriter.completed_frames(io.output, seg)
            if start is not None:
                self.start = min(self.start, start)
            workers = runtime.resolve_encode_workers() \
                if hasattr(runtime, "resolve_encode_workers") else 1
            self.writer = SegmentedVideoWriter(
                width, height, fps, filename=io.output, segment_frames=seg,
                start_frame=self.start, preset=preset, workers=workers)
        else:
            self.writer = VideoWriter(width, height, fps, filename=io.output,
                                      preset=preset)
        self.idx = self.start

    def emit(self, out: dict, valid: int) -> None:
        comp = np.asarray(out["composite"])
        green = np.asarray(out["green"]) if self.sdf else None
        for b in range(valid):
            inv = os.path.join(self.io.subpath, f"{self.idx:05d}.png") \
                if self.io.subpath else ""
            _write_frame(_composite_to_rgb(comp[b]),
                         green[b] if self.sdf else None, self.writer, inv)
            self.idx += 1

    def close(self) -> None:
        self.writer.close()


def run(input_path: str, output: str = "", subpath: str = "",
        sdf: bool = True, confidence: float = CONFIDENCE_THRESHOLD,
        runtime: RuntimeConfig | None = None,
        cfg: solov2.SOLOv2Config | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    cfg = cfg or solov2.SOLOv2Config()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params = load_solov2(runtime, cfg)

    if io.is_video():
        reader = VideoReader(io.input)
        sink = MaskVideoSink(io, reader.width, reader.height, reader.fps,
                             sdf=sdf)
        reader.skip(sink.start)
        step = _make_step(params, (reader.height, reader.width), cfg,
                          confidence, sdf, dtype=runtime.resolve_dtype())
        for frames, valid in reader.batches(runtime.batch_size,
                                            pad_to_full=True):
            sink.emit(step(frames), valid)
        sink.close()
        reader.close()
    else:
        frame = open_rgb(io.input)
        step = _make_step(params, frame.shape[:2], cfg, confidence, sdf,
                          dtype=runtime.resolve_dtype())
        out = step(frame[None])
        green = np.asarray(out["green"])[0] if sdf else None
        _write_frame(_composite_to_rgb(np.asarray(out["composite"])[0]),
                     green, io.output)

    finish_meta(io, subpath)
    return io


def finish_meta(io: BandIO, subpath: str) -> None:
    """Register the mask band entry (url + kept class ids) in metadata."""
    if io.data is not None:
        entry = io.data["bands"].setdefault(BAND, {})
        entry["url"] = os.path.basename(io.output)
        entry["ids"] = CLASSES
        if subpath:
            entry["folder"] = subpath
    io.finish()


def main(argv=None):
    """Standalone band CLI (reference bands/mask_mmdet.py:150-198)."""
    from prisma_tpu.bands.cli import band_parser, run_guarded, \
        runtime_from_args

    parser = band_parser(BAND)
    parser.add_argument("--confidence", "-c", type=float,
                        default=CONFIDENCE_THRESHOLD,
                        help="confidence threshold")
    parser.add_argument("--sdf", "-s", action="store_true",
                        help="encode SDF on the GREEN channel")
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, sdf=args.sdf,
                confidence=args.confidence, runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
