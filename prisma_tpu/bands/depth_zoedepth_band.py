"""depth_zoedepth band driver: ZoeD_N metric depth on TPU.

Reference: `bands/depth_zoedepth.py` — model.infer_pil (pad + flip augmented),
metric output, NO flip on write (depth_zoedepth.py:56,100-171).
"""

from __future__ import annotations

import functools

import jax

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve

from prisma_tpu.models import zoed as jzoed
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import cast_params, load_zoed

BAND = "depth_zoedepth"


def build_infer(runtime: RuntimeConfig, img_size=None):
    """-> (params, infer, flip), shared by run() and bands/multiband.py.

    img_size: (h, w) BEiT input budget; None = the reference's
    jzoed.IMG_SIZE (384, 512). Smaller grids are for smoke/CI runs."""
    params = load_zoed(runtime)
    dtype = runtime.resolve_dtype()
    # models cast the IMAGE to compute_dtype and expect params pre-cast;
    # without this the bf16 default crashed on a dtype-mismatched conv
    params = cast_params(params, dtype)
    img_size = tuple(img_size) if img_size else jzoed.IMG_SIZE
    infer = functools.partial(jzoed.infer, compute_dtype=dtype,
                              img_size=img_size)
    return params, infer, False  # metric depth: no flip


def run(input_path: str, output: str = "", subpath: str = "",
        npy: bool = False, ply: bool = False, img_size=None,
        runtime: RuntimeConfig | None = None) -> BandIO:
    """img_size: see build_infer."""
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params, infer, flip = build_infer(runtime, img_size=img_size)

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
    """Standalone band CLI (reference bands/depth_zoedepth.py:170-200)."""
    from prisma_tpu.bands.cli import band_parser, run_guarded, \
        runtime_from_args

    parser = band_parser(BAND, npy_ply=True)
    parser.add_argument("--img_size", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="BEiT input budget (default 384 512)")
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, npy=args.npy, ply=args.ply,
                img_size=args.img_size, runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
