"""depth_anything band driver: Depth-Anything on TPU (relative + metric).

Reference: `bands/depth_anything.py` — relative (DPT head, flip=True on write)
or metric (ZoeDepth head over DepthAnythingCore, no flip; process.py passes
--metric outdoor by default, process.py:53).
"""

from __future__ import annotations

import functools

import jax

from prisma_tpu.bands import depth_base
from prisma_tpu.bands.base import BandIO, resolve
from prisma_tpu.models import depth_anything as da
from prisma_tpu.models import zoedepth as jzoe
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import cast_params, load_depth_anything

BAND = "depth_anything"


def build_infer(runtime: RuntimeConfig, encoder: str = "vitl",
                metric: str = "none", img_size=None):
    """-> (params, infer, flip): the model pieces of the band, shared by
    run() and the fused multi-band pipeline (bands/multiband.py).

    img_size: inference budget override — an int (relative model: the
    lower-bound resize target, default 518) or an (h, w) pair (metric model:
    the ZoeDepth core size, default (392, 518)). Multiples of 14."""
    kind, params, enc_name = load_depth_anything(runtime, encoder=encoder,
                                                 metric=metric)
    flip = kind == "relative"
    dtype = runtime.resolve_dtype()
    params = cast_params(params, dtype)  # models expect pre-cast params

    if kind == "metric":
        if img_size is None:
            size = (392, 518)
        elif hasattr(img_size, "__len__"):
            size = tuple(img_size) if len(img_size) > 1 \
                else (int(img_size[0]),) * 2
        else:
            size = (int(img_size),) * 2
        infer = functools.partial(jzoe.metric_depth_anything_infer,
                                  encoder=enc_name, compute_dtype=dtype,
                                  img_size=size)
    else:
        target = 518 if img_size is None else \
            int(img_size[0] if hasattr(img_size, "__len__") else img_size)
        infer = functools.partial(da.infer, encoder=enc_name,
                                  compute_dtype=dtype, target=target)
    return params, infer, flip


def run(input_path: str, output: str = "", subpath: str = "",
        encoder: str = "vitl", metric: str = "none", npy: bool = False,
        ply: bool = False, img_size=None,
        runtime: RuntimeConfig | None = None) -> BandIO:
    """img_size: see build_infer."""
    runtime = runtime or RuntimeConfig()
    io = resolve(BAND, input_path, output=output, subpath=subpath,
                 force_extension="png", runtime=runtime)
    params, infer, flip = build_infer(runtime, encoder=encoder, metric=metric,
                                      img_size=img_size)

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
    """Standalone band CLI (reference bands/depth_anything.py:254-292)."""
    from prisma_tpu.bands.cli import band_parser, run_guarded, \
        runtime_from_args

    parser = band_parser(BAND, npy_ply=True)
    parser.add_argument("--encoder", type=str, default="vitl",
                        choices=["vits", "vitb", "vitl"])
    parser.add_argument("--metric", type=str, default="none",
                        choices=["none", "indoor", "outdoor"],
                        help="use the metric (ZoeDepth-head) model")
    parser.add_argument("--img_size", type=int, nargs="+", default=None,
                        help="inference budget: one int (relative resize "
                             "target, default 518) or H W (metric core size, "
                             "default 392 518); multiples of 14")
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, encoder=args.encoder, metric=args.metric,
                npy=args.npy, ply=args.ply, img_size=args.img_size,
                runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
