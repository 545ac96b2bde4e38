"""depth_anything band driver: Depth-Anything on TPU (relative + metric).

Reference: `bands/depth_anything.py` — relative (DPT head, flip=True on write)
or metric (ZoeDepth head over DepthAnythingCore, no flip; process.py passes
--metric outdoor by default, process.py:53).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.models import depth_anything as da
from prisma_tpu.models import zoedepth as jzoe
from prisma_tpu.ops import encode as enc
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_depth_anything

BAND = "depth_anything"


def _make_step(params, infer, flip: bool, need_depth: bool, dtype=None):
    if dtype is not None:
        from prisma_tpu.weights.store import cast_params
        params = cast_params(params, dtype)
    # multi-chip: replicate params, shard the frame batch over the data mesh
    # (XLA inserts the ICI collectives for the per-frame min/max reductions)
    shard_batch = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        from prisma_tpu.parallel import batch_sharding, get_mesh, replicate
        mesh = get_mesh()
        params = jax.device_put(params, replicate(mesh))
        sharding = batch_sharding(mesh)

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
        depth = infer(params, frames)
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

    if shard_batch is not None:
        return lambda frames: step(params, shard_batch(frames))
    return lambda frames: step(params, frames)


def run(input_path: str, output: str = "", subpath: str = "",
        encoder: str = "vitl", metric: str = "none", npy: bool = False,
        ply: bool = False, runtime: RuntimeConfig | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    kind, params, enc_name = load_depth_anything(runtime, encoder=encoder,
                                                 metric=metric)
    flip = kind == "relative"
    dtype = runtime.resolve_dtype()

    if kind == "metric":
        infer = functools.partial(jzoe.metric_depth_anything_infer,
                                  encoder=enc_name, compute_dtype=dtype)
    else:
        infer = functools.partial(da.infer, encoder=enc_name,
                                  compute_dtype=dtype)

    if io.is_video():
        need_depth = bool(io.subpath) or npy
        step = _make_step(params, infer, flip, need_depth)
        depth_base.run_video(io, step, flip=flip, npy=npy)
    else:
        params_dev = jax.device_put(params)
        jinfer = jax.jit(infer)
        depth_base.run_image(io, lambda f: jinfer(params_dev, f), flip=flip,
                             npy=npy, ply=ply)
    return io
