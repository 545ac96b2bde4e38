"""Pre-convert every available torch checkpoint to a cached orbax tree.

Usage: python -m prisma_tpu.weights.convert_all [--models-dir models]
Skips checkpoints that are absent; each conversion is independent.
"""

from __future__ import annotations

import argparse

from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights import store


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models-dir", default=None)
    args = parser.parse_args(argv)
    runtime = RuntimeConfig()
    if args.models_dir:
        runtime.models_dir = args.models_dir

    # load_* populate the versioned orbax cache themselves (_cached_convert);
    # this tool just runs every conversion up front
    jobs = [
        ("depth_anything_vitl", lambda: store.load_depth_anything(
            runtime, "vitl")),
        ("depth_anything_metric_outdoor", lambda: store.load_depth_anything(
            runtime, "vitl", metric="outdoor")),
        ("depth_anything_metric_indoor", lambda: store.load_depth_anything(
            runtime, "vitl", metric="indoor")),
        ("raft", lambda: store.load_raft(runtime)),
        ("gmflow", lambda: store.load_gmflow(runtime)),
        ("solov2", lambda: store.load_solov2(runtime)),
        ("midas_dpt_large", lambda: store.load_midas(runtime, "midas3")),
        ("midas_v21", lambda: store.load_midas(runtime, "midas2")),
        ("zoed_n", lambda: store.load_zoed(runtime)),
        ("patchfusion", lambda: store.load_patchfusion(runtime)),
        ("marigold", lambda: store.load_marigold(runtime)),
    ]
    for name, load in jobs:
        try:
            load()
            print(f"[convert_all] cached {name}")
        except FileNotFoundError as e:
            print(f"[convert_all] skipped {name}: {e}")
        except Exception as e:
            print(f"[convert_all] FAILED {name}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
