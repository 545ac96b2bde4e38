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

# A video step: (frames_u8 [B, H, W, 3], idx0=global index of frames[0]) ->
#   dict with 'heat' [B, H, W, 3] u8, 'min' [B], 'max' [B], and optionally
#   'depth' [B, H, W] f32. idx0 lets stochastic drivers (marigold) seed by
#   GLOBAL frame index so frame-index resume regroups batches without
#   changing any frame's latents.
VideoStep = Callable[[np.ndarray], dict]
# An image infer: (frames_u8 [1, H, W, 3]) -> depth [1, H, W] f32
ImageInfer = Callable[[np.ndarray], np.ndarray]


def make_step(params, infer: Callable, flip: bool, need_depth: bool,
              dtype=None, fused: bool = True) -> VideoStep:
    """Build the shared depth video step: infer + the fused normalize/flip/
    heatmap epilogue (reference write_depth semantics, bands/common/io.py).

    fused=True jits infer+epilogue as ONE XLA program with params replicated
    over the data mesh and the frame batch sharded along it (single-forward
    models: depth_anything, midas, zoed). fused=False keeps infer as-is —
    tile/ensemble drivers (patchfusion, marigold) loop on host and shard at
    the tile/member level — and jits only the epilogue.
    """
    import jax
    import jax.numpy as jnp

    from prisma_tpu.ops import encode as enc

    if dtype is not None:
        from prisma_tpu.weights.store import cast_params
        params = cast_params(params, dtype)

    def epilogue(depth):
        dmin = jnp.min(depth, axis=(1, 2))
        dmax = jnp.max(depth, axis=(1, 2))
        norm = (depth - dmin[:, None, None]) / (dmax - dmin)[:, None, None]
        if flip:
            norm = 1.0 - norm
        heat = jnp.floor(enc.heat_to_rgb(norm) * 255.0).astype(jnp.uint8)
        out = {"heat": heat, "min": dmin, "max": dmax}
        if need_depth:
            out["depth"] = depth
        return out

    if not fused:
        from prisma_tpu.parallel import data_mesh_or_none, shard_params
        mesh = data_mesh_or_none()
        params = shard_params(params, mesh) if mesh is not None \
            else jax.device_put(params)
        jep = jax.jit(epilogue)
        # non-fused infer contract: (params, frames, idx0) — tile/ensemble
        # drivers that seed per frame must use the global index
        return lambda frames, idx0=0: jep(infer(params, frames, idx0))

    # multi-chip: replicate params, shard the frame batch over the data mesh
    # (XLA inserts the ICI collectives for the per-frame min/max reductions)
    from prisma_tpu.parallel import batch_sharding, data_mesh_or_none, \
        shard_params
    shard_batch = None
    mesh = data_mesh_or_none()
    if mesh is not None:
        params = shard_params(params, mesh)
        sharding = batch_sharding(mesh)
        n_dev = mesh.devices.size

        def shard_batch(f):
            f = jnp.asarray(f)
            # shard only batches the mesh divides evenly; smaller/ragged
            # batches run replicated (single-program)
            if f.shape[0] % n_dev == 0:
                return jax.device_put(f, sharding)
            return f
    else:
        params = jax.device_put(params)

    @jax.jit
    def step(params, frames):
        return epilogue(infer(params, frames))

    if shard_batch is not None:
        return lambda frames, idx0=0: step(params, shard_batch(frames))
    return lambda frames, idx0=0: step(params, frames)


def _resume_state(output: str, segment_frames: int,
                  start_override: int | None = None):
    """-> (start_frame, mins, maxs, ledger_file) for frame-index resume.

    The resume index is the contiguous run of complete mp4 segments from a
    previous interrupted run; per-frame min/max come back from the ledger CSV
    kept next to the segments. A ledger shorter than the segments (lost
    buffered lines) restarts from scratch — correctness over savings.
    start_override caps the resume point (the fused multi-band pipeline
    resumes every band at the MIN of the bands' completed segments, so one
    shared reader position serves all sinks).
    """
    import shutil

    from prisma_tpu.io.video import SegmentedVideoWriter

    seg_dir = output + ".segments"
    ledger_path = os.path.join(seg_dir, "values.csv")
    start = SegmentedVideoWriter.completed_frames(output, segment_frames)
    if start_override is not None:
        start = min(start, start_override)
    mins: list[float] = []
    maxs: list[float] = []
    if start:
        rows = []
        if os.path.exists(ledger_path):
            with open(ledger_path) as f:
                rows = [line.split(",") for line in f.read().splitlines()
                        if line]
        if len(rows) < start:
            shutil.rmtree(seg_dir, ignore_errors=True)
            start = 0
        else:
            mins = [float(r[0]) for r in rows[:start]]
            maxs = [float(r[1]) for r in rows[:start]]
    os.makedirs(seg_dir, exist_ok=True)
    # truncate the ledger to the resume point, then append
    with open(ledger_path, "w") as f:
        for mn, mx in zip(mins, maxs):
            f.write(f"{mn!r},{mx!r}\n")
    return start, mins, maxs, open(ledger_path, "a")


class DepthVideoSink:
    """Host epilogue of a depth video band: segmented mp4 writer + fsynced
    min/max ledger + per-frame PNG/NPY artifacts + final CSVs/metadata.

    Shared verbatim by the sequential driver (run_video) and the fused
    single-decode multi-band pipeline (bands/multiband.py), so the two paths
    write byte-identical outputs by construction.
    """

    def __init__(self, io: BandIO, width: int, height: int, fps: float,
                 flip: bool, npy: bool, start: int | None = None):
        self.io = io
        self.flip = flip
        self.npy = npy
        self.seg = getattr(io.runtime, "segment_frames", 0)
        if self.seg:
            from prisma_tpu.io.video import SegmentedVideoWriter
            self.start, self.mins, self.maxs, self.ledger = \
                _resume_state(io.output, self.seg, start)
            self.writer = SegmentedVideoWriter(
                width, height, fps, filename=io.output,
                segment_frames=self.seg, start_frame=self.start,
                preset=getattr(io.runtime, "x264_preset", None),
                workers=io.runtime.resolve_encode_workers()
                if hasattr(io.runtime, "resolve_encode_workers") else 1)
        else:
            self.writer = VideoWriter(
                width, height, fps, filename=io.output,
                preset=getattr(io.runtime, "x264_preset", None))
            self.start, self.mins, self.maxs, self.ledger = 0, [], [], None
        self.idx = self.start

    def emit(self, out: dict, valid: int) -> None:
        """Consume one device-step output dict (host numpy conversion here)."""
        io, seg = self.io, self.seg
        heat = np.asarray(out["heat"])
        bmin = np.asarray(out["min"])
        bmax = np.asarray(out["max"])
        depth = np.asarray(out["depth"]) if "depth" in out else None
        for b in range(valid):
            idx = self.idx
            self.mins.append(float(bmin[b]))
            self.maxs.append(float(bmax[b]))
            if self.ledger is not None:
                # ledger rows hit disk BEFORE the segment-closing write below,
                # so a complete segment always has its values on resume
                self.ledger.write(f"{self.mins[-1]!r},{self.maxs[-1]!r}\n")
                if (idx + 1) % seg == 0:
                    self.ledger.flush()
                    os.fsync(self.ledger.fileno())
            # per-frame artifacts hit disk BEFORE the mp4 frame write: the
            # segment-closing write marks the frame complete for resume, so
            # everything belonging to the frame must already exist
            if depth is not None:
                if self.npy and io.subpath:
                    np.save(os.path.join(io.subpath, f"{idx:05d}.npy"),
                            depth[b])
                if io.subpath:
                    write_depth(os.path.join(io.subpath, f"{idx:05d}.png"),
                                depth[b], normalize=True, flip=self.flip,
                                heatmap=True, encode_range=True)
            self.writer.write(heat[b])
            self.idx += 1

    def close(self) -> None:
        io = self.io
        if self.ledger is not None:
            self.ledger.close()
        self.writer.close()
        write_csv(os.path.join(io.output_folder, io.band + "_min.csv"),
                  self.mins)
        write_csv(os.path.join(io.output_folder, io.band + "_max.csv"),
                  self.maxs)
        io.set_values_url({
            "min": {"type": "float", "url": io.band + "_min.csv"},
            "max": {"type": "float", "url": io.band + "_max.csv"},
        })
        io.finish()


def run_video(io: BandIO, step: VideoStep, flip: bool,
              npy: bool = False) -> None:
    from prisma_tpu.runtime.profiling import StageProfiler
    prof = StageProfiler()
    reader = VideoReader(io.input)
    sink = DepthVideoSink(io, reader.width, reader.height, reader.fps,
                          flip=flip, npy=npy)
    reader.skip(sink.start)

    batch_size = io.runtime.batch_size
    prof.start_device_trace()
    for frames, valid in reader.batches(batch_size, pad_to_full=True):
        with prof.stage("device_step"):
            out = step(frames, idx0=sink.idx)
            out = dict(out)
            out["heat"] = np.asarray(out["heat"])
        sink.emit(out, valid)
    n_done = sink.idx - sink.start
    sink.close()
    reader.close()
    prof.stop_device_trace()
    prof.report(items=n_done)


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
