"""flow_raft band driver (reference `bands/flow_raft.py`): RAFT at 0.75 scale,
20 GRU iterations, fwd+bwd in one doubled batch; see bands/flow_base.py for
the shared output contract."""

from __future__ import annotations

import functools
import os

from prisma_tpu.bands.base import BandIO
from prisma_tpu.bands.flow_base import run_flow_band
from prisma_tpu.models import raft as jraft
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_raft

BAND = "flow_raft"
ITERATIONS = 20


def build_pairs(runtime: RuntimeConfig, iterations: int = ITERATIONS,
                corr_impl: str = "volume_onehot"):
    """-> (lazy_params, infer_pairs), shared by run() and bands/multiband.py.

    corr_impl "volume_onehot" (default): materialized bf16 pyramid +
    one-hot MXU-matmul window lookup — measured 4.7x faster than
    take_along_axis row gathers on the v5e (4.48 vs 0.95 pair-fps at
    810x1440x20it). "fused" selects the O(HW)-memory lookup for inputs whose
    materialized corr pyramid would not fit HBM (>>1080p)."""
    params = lambda: load_raft(runtime)  # noqa: E731 — loaded after resolve
    infer = functools.partial(jraft.infer_pairs, iters=iterations,
                              corr_impl=corr_impl)
    return params, infer


def run(input_path: str, output: str = "", subpath: str = "",
        backwards: bool = False, mask: bool = False, subpath_mask: str = "",
        iterations: int = ITERATIONS, scale: float = 0.75,
        corr_impl: str = "volume_onehot",
        runtime: RuntimeConfig | None = None) -> BandIO:
    """corr_impl: see build_pairs."""
    runtime = runtime or RuntimeConfig()
    params, infer = build_pairs(runtime, iterations=iterations,
                                corr_impl=corr_impl)
    return run_flow_band(BAND, input_path, params, infer, output=output,
                         subpath=subpath, backwards=backwards, mask=mask,
                         subpath_mask=subpath_mask, scale=scale,
                         runtime=runtime)


def main(argv=None):
    """Standalone band CLI (reference bands/flow_raft.py flag surface)."""
    from prisma_tpu.bands.cli import band_parser, run_guarded, \
        runtime_from_args

    parser = band_parser(BAND)
    parser.add_argument("--backwards", "-b", action="store_true")
    parser.add_argument("--mask", action="store_true",
                        help="compute consistency-mask videos as well")
    parser.add_argument("--subpath_mask", type=str, default="",
                        help="folder for 16-bit packed flow+validity PNGs")
    parser.add_argument("--iterations", type=int, default=ITERATIONS)
    parser.add_argument("--scale", type=float, default=0.75)
    parser.add_argument("--corr_impl", type=str,
                        default=os.environ.get("PRISMA_RAFT_CORR",
                                               "volume_onehot"),
                        choices=["volume_onehot", "volume_onehot_xf",
                                 "volume_onehot_packed", "volume", "fused",
                                 "volume_pallas", "volume_gk"],
                        help="correlation lookup variant (see run())")
    args = parser.parse_args(argv)
    run_guarded(BAND, run, args.input, output=args.output,
                subpath=args.subpath, backwards=args.backwards,
                mask=args.mask, subpath_mask=args.subpath_mask,
                iterations=args.iterations, scale=args.scale,
                corr_impl=args.corr_impl, runtime=runtime_from_args(args))


if __name__ == "__main__":
    main()
