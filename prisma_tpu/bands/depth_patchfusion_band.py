"""depth_patchfusion band driver: tiled high-res metric depth on TPU.

Reference: `bands/depth_patchfusion.py` — infer per image/frame with mode
p16/p49/rN (default r128 image, p49 video via process.py:230-231), metric
output (flip=False), same CSV/subpath/npy/ply contract as other depth bands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.models import patchfusion as pf
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import cast_params, load_patchfusion

BAND = "depth_patchfusion"


def _infer_frames(params, frames_u8, idx0=0, *, mode, model_hw, dtype,
                  tile_batch=None):
    """Host loop over frames (each frame runs the jitted tile passes).

    idx0 (global frame index, depth_base non-fused contract) is unused:
    PatchFusion is deterministic per frame. as_numpy=False keeps every
    frame's result device-resident so frame k+1's passes dispatch while
    frame k computes — no per-frame fetch round trip."""
    outs = []
    for f in np.asarray(frames_u8):
        # u8 straight to device; pf.infer normalizes there (4x less H2D)
        outs.append(pf.infer(params, f, mode=mode,
                             compute_dtype=dtype, model_hw=model_hw,
                             tile_batch=tile_batch, as_numpy=False))
    return jnp.stack(outs)


def run(input_path: str, output: str = "", subpath: str = "",
        mode: str = "r128", npy: bool = False, ply: bool = False,
        tile_batch: int | None = None,
        runtime: RuntimeConfig | None = None) -> BandIO:
    """tile_batch: tiles per fused device pass (None = pf.infer's default 8;
    the remote tunneled compiler 500s at 16 — local chips may take more)."""
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params, model_hw = load_patchfusion(runtime)
    dtype = runtime.resolve_dtype()
    # models cast the IMAGE to compute_dtype and expect params pre-cast;
    # without this the bf16 default crashed on a dtype-mismatched conv
    params = cast_params(params, dtype)
    infer = functools.partial(_infer_frames, mode=mode, model_hw=model_hw,
                              dtype=dtype, tile_batch=tile_batch)
    flip = False  # metric

    if io.is_video():
        need_depth = bool(io.subpath) or npy
        step = depth_base.make_step(params, infer, flip, need_depth,
                                    fused=False)
        depth_base.run_video(io, step, flip=flip, npy=npy)
    else:
        depth_base.run_image(io, lambda f: infer(params, f), flip=flip,
                             npy=npy, ply=ply)
    return io


def main(argv=None):
    """Standalone band CLI (reference bands/depth_patchfusion.py:230-255)."""
    from prisma_tpu.bands.cli import band_parser, run_guarded, \
        runtime_from_args

    import os

    parser = band_parser(BAND, npy_ply=True)
    parser.add_argument("--mode", type=str, default="r128",
                        help="p16, p49 or rN (N random tiles)")
    env_tb = os.environ.get("PRISMA_PF_TILE_BATCH")  # documented runtime knob
    parser.add_argument("--tile_batch", type=int,
                        default=int(env_tb) if env_tb else None,
                        help="tiles per fused device pass (default 8)")
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, mode=args.mode, npy=args.npy,
                ply=args.ply, tile_batch=args.tile_batch,
                runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
