"""depth_midas band driver: MiDaS DPT-Large on TPU.

Reference: `bands/depth_midas.py` — hub default_transform prep, bicubic
align_corners=True resize-back, flip=True heatmap write (disparity).
model_version midas3 (DPT_Large) is the supported path; midas2 variants are
gated until a v2 checkpoint converter lands.
"""

from __future__ import annotations

import functools

import jax

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.bands.depth_anything_band import _make_step
from prisma_tpu.models import midas as jmidas
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_midas

BAND = "depth_midas"


def run(input_path: str, output: str = "", subpath: str = "",
        model_version: str = "midas3", npy: bool = False, ply: bool = False,
        runtime: RuntimeConfig | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params = load_midas(runtime, model_version)
    dtype = runtime.resolve_dtype()
    import os
    target = int(os.environ.get("PRISMA_MIDAS_TARGET", "384"))
    infer = functools.partial(jmidas.infer, compute_dtype=dtype, target=target)
    flip = True  # disparity: near is 1 after flip (depth_midas.py:106,147)

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
