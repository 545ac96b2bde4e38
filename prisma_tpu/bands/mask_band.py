"""mask band driver: SOLOv2 instance segmentation -> white-on-black mask.

Reference contract (`bands/mask_mmdet.py`): run SOLOv2 per frame, keep only
person/animal classes above confidence 0.5, SUM the white (255) binary masks
into an RGB image (uint8 wraparound preserved), optionally pack a clamped SDF
into the GREEN channel (--sdf), write inverted (255 - mask) per-frame PNGs for
COLMAP masking, and register band "mask" with the kept class list in metadata
(mask_mmdet.py:84-102,131-161).
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
from prisma_tpu.ops.sdf import mask_sdf_channel
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_solov2

BAND = "mask"

# COCO indices of the reference's kept classes (mask_mmdet.py:30)
CLASSES = ["person", "bird", "cat", "dog", "horse", "sheep", "cow",
           "elephant", "bear", "zebra", "giraffe"]
CLASS_IDS = (0, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23)
CONFIDENCE_THRESHOLD = 0.5


def _make_step(params, ori_hw, cfg: solov2.SOLOv2Config, confidence: float):
    class_ids = jnp.asarray(CLASS_IDS)

    @jax.jit
    def step(params, frame_u8):
        img, img_hw = solov2.preprocess(frame_u8)
        out = solov2.forward(params, img, img_hw, ori_hw, cfg)
        keep = (out["valid"] & (out["scores"] > confidence)
                & jnp.any(out["labels"][:, None] == class_ids[None, :], axis=1))
        # reference sums 255-white masks in float then casts to uint8 (wraps)
        composite = jnp.sum(
            jnp.where(keep[:, None, None], out["masks"], False).astype(jnp.float32)
            * 255.0, axis=0)
        return composite, keep

    return lambda frame: step(params, frame)


def _composite_to_rgb(composite: np.ndarray) -> np.ndarray:
    m = composite.astype(np.float64)
    return np.stack([m, m, m], axis=-1)


def run(input_path: str, output: str = "", subpath: str = "",
        sdf: bool = True, confidence: float = CONFIDENCE_THRESHOLD,
        runtime: RuntimeConfig | None = None,
        cfg: solov2.SOLOv2Config | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    cfg = cfg or solov2.SOLOv2Config()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params = jax.device_put(load_solov2(runtime, cfg))

    if io.is_video():
        reader = VideoReader(io.input)
        writer = VideoWriter(reader.width, reader.height, reader.fps,
                             filename=io.output)
        step = _make_step(params, (reader.height, reader.width), cfg, confidence)
        for i, frame in enumerate(reader):
            composite, _ = step(frame[None])
            masks = _composite_to_rgb(np.asarray(composite))
            if io.subpath:
                write_rgb_u8(os.path.join(io.subpath, f"{i:05d}.png"),
                             (255.0 - masks).astype(np.uint8))
            if sdf:
                masks[..., 1] = mask_sdf_channel(masks) * 255
            writer.write(masks.astype(np.uint8))
        writer.close()
        reader.close()
    else:
        frame = open_rgb(io.input)
        step = _make_step(params, frame.shape[:2], cfg, confidence)
        composite, _ = step(frame[None])
        masks = _composite_to_rgb(np.asarray(composite))
        if sdf:
            masks[..., 1] = mask_sdf_channel(masks) * 255
        write_rgb_u8(io.output, masks.astype(np.uint8))

    if io.data is not None:
        entry = io.data["bands"].setdefault(BAND, {})
        entry["url"] = os.path.basename(io.output)
        entry["ids"] = CLASSES
        if subpath:
            entry["folder"] = subpath
    io.finish()
    return io
