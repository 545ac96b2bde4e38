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
    params = cast_params(params, dtype)  # models expect pre-cast params

    if kind == "metric":
        import os
        env = os.environ.get("PRISMA_ZOE_SIZE")  # test hook, e.g. "126,126"
        img_size = tuple(int(v) for v in env.split(",")) if env else (392, 518)
        infer = functools.partial(jzoe.metric_depth_anything_infer,
                                  encoder=enc_name, compute_dtype=dtype,
                                  img_size=img_size)
    else:
        import os
        target = int(os.environ.get("PRISMA_DA_TARGET", "518"))  # test hook
        infer = functools.partial(da.infer, encoder=enc_name,
                                  compute_dtype=dtype, target=target)

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
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, encoder=args.encoder, metric=args.metric,
                npy=args.npy, ply=args.ply, runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
