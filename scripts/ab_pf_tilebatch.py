#!/usr/bin/env python3
"""A/B PatchFusion p49/1080p wall time at tile_batch 8 vs 16.

The 8 default exists because the one-jit 16-tile pass used to crash the
REMOTE (tunneled) TPU compiler (HTTP 500) on the round-2/3 graph. The
round-4 graph replaced the 13 gather roi_aligns with separable MXU matmuls
(ops/roi_align.py), so the compile unit shrank substantially — retry.
p49 at tile_batch=16 is one sub-batch per pass: 4 run_tiles dispatches
instead of 8, halving the per-dispatch tunnel RTTs that dominate the ~2 s
of host orchestration (scripts/profile_pf_stages.py). Run alone — one TPU
owner. Full-frame wall timing is fine here: calls are multi-hundred-ms.

MEASURED (round 4, v5e via tunnel): tile_batch=8 4.834 s/frame;
tile_batch=16 STILL fails with `remote_compile: HTTP 500:
tpu_compile_helper subprocess exit code 1` even on the matmul-roi graph —
the crash tracks the 16-tile batch dimension, not the roi_align gathers.
The 8 cap stays; on a LOCAL chip (no tunnel compile helper) tile_batch=16
remains worth retrying via PRISMA_PF_TILE_BATCH.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from prisma_tpu.models import patchfusion as pf
from prisma_tpu.weights.store import cast_params


def main():
    params = pf.init_params(jax.random.key(6), beit_depth=24)
    params = jax.device_put(cast_params(params, jnp.bfloat16))
    img = np.random.default_rng(0).uniform(0, 1, (1080, 1920, 3)).astype(np.float32)

    for tb in (8, 16):
        try:
            pf.infer(params, img, mode="p49", compute_dtype=jnp.bfloat16,
                     tile_batch=tb)  # warmup/compile
            t0 = time.perf_counter()
            iters = 2
            for _ in range(iters):
                out = pf.infer(params, img, mode="p49",
                               compute_dtype=jnp.bfloat16, tile_batch=tb)
            dt = (time.perf_counter() - t0) / iters
            print(f"tile_batch={tb}: {dt:.3f} s/frame  "
                  f"(out finite={np.isfinite(out).all()})", flush=True)
        except Exception as e:  # the historical failure mode is a compiler 500
            print(f"tile_batch={tb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
