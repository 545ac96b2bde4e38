"""Generic depth-band driver: batched, double-buffered, device-fused epilogue.

Reference contract (bands/depth_anything.py:146-251, same for all depth bands):
- video: <band>.mp4 of per-frame-normalized heatmaps, <band>_min.csv /
  <band>_max.csv, optional per-frame range-encoded PNGs in the subpath folder,
  optional .npy per frame; metadata values entry with csv urls.
- image: <band>.png via write_depth(heatmap, range pixels), optional .npy/.ply,
  metadata values entry with min/max floats.

TPU design: frames arrive in batches from the background decoder thread, the
whole infer+normalize+heatmap chain is one jitted function (mapped over the
batch, sharded over the data mesh), and the x264 encode of returned frames
happens on the writer's background thread while the next batch computes.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from prisma_tpu.bands.base import BandIO
from prisma_tpu.io.image import open_rgb
from prisma_tpu.io.video import VideoReader, VideoWriter
from prisma_tpu.io.writers import write_csv, write_depth, write_pcl

# A video step: (frames_u8 [B, H, W, 3]) -> dict with
#   'heat' [B, H, W, 3] u8, 'min' [B], 'max' [B], and optionally 'depth' [B, H, W] f32
VideoStep = Callable[[np.ndarray], dict]
# An image infer: (frames_u8 [1, H, W, 3]) -> depth [1, H, W] f32
ImageInfer = Callable[[np.ndarray], np.ndarray]


def run_video(io: BandIO, step: VideoStep, flip: bool,
              npy: bool = False) -> None:
    from prisma_tpu.runtime.profiling import StageProfiler
    prof = StageProfiler()
    reader = VideoReader(io.input)
    writer = VideoWriter(reader.width, reader.height, reader.fps,
                         filename=io.output)
    need_depth = bool(io.subpath) or npy

    mins: list[float] = []
    maxs: list[float] = []
    idx = 0
    batch_size = io.runtime.batch_size
    prof.start_device_trace()
    for frames, valid in reader.batches(batch_size, pad_to_full=True):
        with prof.stage("device_step"):
            out = step(frames)
            heat = np.asarray(out["heat"])
        bmin = np.asarray(out["min"])
        bmax = np.asarray(out["max"])
        depth = np.asarray(out["depth"]) if need_depth else None
        for b in range(valid):
            writer.write(heat[b])
            mins.append(float(bmin[b]))
            maxs.append(float(bmax[b]))
            if depth is not None:
                if npy and io.subpath:
                    np.save(os.path.join(io.subpath, f"{idx:05d}.npy"), depth[b])
                if io.subpath:
                    write_depth(os.path.join(io.subpath, f"{idx:05d}.png"),
                                depth[b], normalize=True, flip=flip,
                                heatmap=True, encode_range=True)
            idx += 1
    writer.close()
    reader.close()
    prof.stop_device_trace()
    prof.report(items=idx)

    write_csv(os.path.join(io.output_folder, io.band + "_min.csv"), mins)
    write_csv(os.path.join(io.output_folder, io.band + "_max.csv"), maxs)
    io.set_values_url({
        "min": {"type": "float", "url": io.band + "_min.csv"},
        "max": {"type": "float", "url": io.band + "_max.csv"},
    })
    io.finish()


def run_image(io: BandIO, infer: ImageInfer, flip: bool,
              npy: bool = False, ply: bool = False) -> None:
    frame = open_rgb(io.input)
    depth = np.asarray(infer(frame[None]))[0].astype(np.float32)

    if io.data is not None:
        io.set_values_url({
            "min": {"value": float(depth.min()), "type": "float"},
            "max": {"value": float(depth.max()), "type": "float"},
        })
    if npy:
        np.save(os.path.join(io.output_folder, io.band + ".npy"), depth)
    if ply:
        write_pcl(os.path.join(io.output_folder, io.band + ".ply"), depth,
                  frame, flip=flip)
    write_depth(io.output, depth, normalize=True, heatmap=True,
                encode_range=True, flip=flip)
    io.finish()
