"""depth_marigold band driver: diffusion depth on TPU.

Reference: `bands/depth_marigold.py` — 10 DDIM steps x 10 ensemble members at
768px, metric-agnostic output written with flip=False.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.models import marigold as jmar
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import cast_params, load_marigold

BAND = "depth_marigold"
DENOISE_STEPS = 10
ENSEMBLE_SIZE = 10
PROCESSING_RESOLUTION = 768


def _infer_frames(params, frames_u8, unet_cfg, steps, ensemble, res, dtype,
                  idx0=0):
    # seed by GLOBAL frame index (idx0 + in-batch offset): frame-index resume
    # regroups batches, and the seed must not depend on the grouping for the
    # byte-identical-resume guarantee to hold
    outs = []
    for i, f in enumerate(np.asarray(frames_u8)):
        outs.append(jmar.infer(params, f, denoising_steps=steps,
                               ensemble_size=ensemble, processing_res=res,
                               seed=idx0 + i, unet_cfg=unet_cfg,
                               compute_dtype=dtype))
    return jnp.asarray(np.stack(outs))


def run(input_path: str, output: str = "", subpath: str = "",
        denoise_steps: int = DENOISE_STEPS, ensemble_size: int = ENSEMBLE_SIZE,
        processing_res: int = PROCESSING_RESOLUTION, npy: bool = False,
        ply: bool = False, runtime: RuntimeConfig | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params, unet_cfg = load_marigold(runtime)
    dtype = runtime.resolve_dtype()
    params = cast_params(params, dtype)  # models expect pre-cast params
    res = int(processing_res)
    flip = False

    def infer(params_, frames, idx0=0):
        return _infer_frames(params_, frames, unet_cfg, denoise_steps,
                             ensemble_size, res, dtype, idx0=idx0)

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
    """Standalone band CLI (reference bands/depth_marigold.py:188-214)."""
    from prisma_tpu.bands.cli import band_parser, run_guarded, \
        runtime_from_args

    parser = band_parser(BAND, npy_ply=True)
    parser.add_argument("--denoise_steps", type=int, default=DENOISE_STEPS)
    parser.add_argument("--ensemble_size", type=int, default=ENSEMBLE_SIZE)
    parser.add_argument("--processing_res", type=int,
                        default=PROCESSING_RESOLUTION)
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, denoise_steps=args.denoise_steps,
                ensemble_size=args.ensemble_size,
                processing_res=args.processing_res, npy=args.npy,
                ply=args.ply, runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
