"""depth_anything band driver: Depth-Anything (relative) on TPU.

Reference: bands/depth_anything.py. The metric (ZoeDepth-head) variant arrives
with the zoedepth model family; the relative path (flip=True) is complete.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.models import depth_anything as da
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_depth_anything

BAND = "depth_anything"


def _make_step(params, encoder: str, flip: bool, need_depth: bool, dtype):
    params = jax.device_put(params)

    @jax.jit
    def step(params, frames):
        depth = da.infer(params, frames, encoder, compute_dtype=dtype)
        dmin = jnp.min(depth, axis=(1, 2))
        dmax = jnp.max(depth, axis=(1, 2))
        norm = (depth - dmin[:, None, None]) / (dmax - dmin)[:, None, None]
        if flip:
            norm = 1.0 - norm
        from prisma_tpu.ops import encode as enc
        heat = jnp.floor(enc.heat_to_rgb(norm) * 255.0).astype(jnp.uint8)
        out = {"heat": heat, "min": dmin, "max": dmax}
        if need_depth:
            out["depth"] = depth
        return out

    return lambda frames: step(params, frames)


def run(input_path: str, output: str = "", subpath: str = "",
        encoder: str = "vitl", metric: str = "none", npy: bool = False,
        ply: bool = False, runtime: RuntimeConfig | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    if metric != "none":
        # metric (ZoeDepth-head) variant lands with the zoedepth family;
        # fall back to the relative model with its flip semantics until then
        print(f"[depth_anything] metric='{metric}' not yet available; "
              "using relative model")
        metric = "none"
    flip = metric == "none"
    params, enc_name = load_depth_anything(runtime, encoder=encoder, metric=metric)
    dtype = runtime.resolve_dtype()

    if io.is_video():
        need_depth = bool(io.subpath) or npy
        step = _make_step(params, enc_name, flip, need_depth, dtype)
        depth_base.run_video(io, step, flip=flip, npy=npy)
    else:
        params = jax.device_put(params)
        jinfer = jax.jit(functools.partial(da.infer, encoder=enc_name,
                                           compute_dtype=dtype))
        depth_base.run_image(io, lambda f: jinfer(params, f), flip=flip,
                             npy=npy, ply=ply)
    return io
