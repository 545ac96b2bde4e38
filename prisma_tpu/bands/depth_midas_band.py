"""depth_midas band driver: MiDaS on TPU (all four reference model_versions).

Reference: `bands/depth_midas.py:26-64` — midas2/midas2-small load MidasNet
v2.1, midas3/midas3-small load DPT_Large; -small variants use the hub
small_transform (256 target) instead of default_transform (384). All apply
ImageNet-normalized upper-bound /32 resize, bicubic align_corners=True
resize-back, and flip=True heatmap write (disparity).
"""

from __future__ import annotations

import functools

import jax

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve

from prisma_tpu.models import midas as jmidas
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import cast_params, load_midas

BAND = "depth_midas"


def build_infer(runtime: RuntimeConfig, model_version: str = "midas3",
                target: int | None = None):
    """-> (params, infer, flip), shared by run() and bands/multiband.py.

    target: upper-bound resize budget; None = the reference transform's
    default for the model_version (256 for -small variants, else 384)."""
    arch, params = load_midas(runtime, model_version)
    dtype = runtime.resolve_dtype()
    params = cast_params(params, dtype)  # models expect pre-cast params
    if target is None:
        target = 256 if model_version.endswith("-small") else 384
    infer_fn = jmidas.infer_v2 if arch == "v2" else jmidas.infer
    infer = functools.partial(infer_fn, compute_dtype=dtype, target=target)
    # disparity: near is 1 after flip (depth_midas.py:106,147)
    return params, infer, True


def run(input_path: str, output: str = "", subpath: str = "",
        model_version: str = "midas3", npy: bool = False, ply: bool = False,
        target: int | None = None,
        runtime: RuntimeConfig | None = None) -> BandIO:
    """target: see build_infer."""
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params, infer, flip = build_infer(runtime, model_version=model_version,
                                      target=target)

    if io.is_video():
        need_depth = bool(io.subpath) or npy
        step = depth_base.make_step(params, infer, flip, need_depth)
        depth_base.run_video(io, step, flip=flip, npy=npy)
    else:
        params_dev = jax.device_put(params)
        jinfer = jax.jit(infer)
        depth_base.run_image(io, lambda f: jinfer(params_dev, f), flip=flip,
                             npy=npy, ply=ply)
    return io


def main(argv=None):
    """Standalone band CLI (reference bands/depth_midas.py:170-218)."""
    from prisma_tpu.bands.cli import band_parser, run_guarded, \
        runtime_from_args

    parser = band_parser(BAND, npy_ply=True)
    parser.add_argument("--model", type=str, default="midas3",
                        choices=["midas2-small", "midas2", "midas3-small",
                                 "midas3"],
                        help="model_version (depth_midas.py:26)")
    parser.add_argument("--img_size", type=int, default=None,
                        help="upper-bound resize target (default 384, "
                             "256 for -small variants)")
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, model_version=args.model, npy=args.npy,
                ply=args.ply, target=args.img_size,
                runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
