#!/usr/bin/env python3
"""PatchFusion p49 per-stage profile at 1080p (VERDICT r3 item 5).

Stages: coarse pass (1x), per-sub-batch tile prep / fine+fusion run_tiles /
blur-masked accumulation (p49 = 4 passes of 16/12/12/9 tiles -> 8 sub-batches
at tile_batch=8). Instrumented by wrapping the lru-cached jit runners with a
scalar-fetch sync (block_until_ready lies through the tunnel for small calls;
run_tiles at ~0.5-1 s/call is host-timeable, prep/accum numbers carry ~30 ms
RTT each — read them as upper bounds). Also re-tries tile_batch=16 (the
round-3 remote-compiler crash) and reports the unperturbed end-to-end time.
Run alone — one TPU owner.
"""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import patchfusion as pf


def main():
    from prisma_tpu.weights.store import cast_params
    params = pf.init_params(jax.random.key(6), beit_depth=24)
    params = jax.device_put(cast_params(params, jnp.bfloat16))
    rng = np.random.default_rng(0)
    img = rng.random((1080, 1920, 3), np.float32)

    # unperturbed end-to-end (after compile warmup)
    t0 = time.perf_counter()
    pf.infer(params, img, mode="p49", compute_dtype=jnp.bfloat16)
    print(f"p49 1080p first call (compile): {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    out = pf.infer(params, img, mode="p49", compute_dtype=jnp.bfloat16)
    t_e2e = time.perf_counter() - t0
    print(f"p49 1080p steady-state: {t_e2e:.2f} s/frame")

    # instrumented run
    buckets = defaultdict(float)
    counts = defaultdict(int)

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))
            buckets[name] += time.perf_counter() - t0
            counts[name] += 1
            return out
        return wrap

    orig_tile_runner = pf._tile_runner.__wrapped__
    orig_pass_runner = pf._pass_runner.__wrapped__
    pf._tile_runner.cache_clear()
    pf._pass_runner.cache_clear()

    import functools

    @functools.lru_cache(maxsize=None)
    def tile_runner(compute_dtype, model_hw, precision):
        rc, rt = orig_tile_runner(compute_dtype, model_hw, precision)
        return timed("coarse", rc), timed("run_tiles", rt)

    @functools.lru_cache(maxsize=None)
    def pass_runner(crop, model_hw):
        prep, accum = orig_pass_runner(crop, model_hw)
        return timed("prep", prep), timed("accum", accum)

    pf._tile_runner = tile_runner
    pf._pass_runner = pass_runner
    try:
        pf.infer(params, img, mode="p49", compute_dtype=jnp.bfloat16)  # warm
        for k in list(buckets):
            buckets[k] = 0.0
            counts[k] = 0
        t0 = time.perf_counter()
        pf.infer(params, img, mode="p49", compute_dtype=jnp.bfloat16)
        t_inst = time.perf_counter() - t0
    finally:
        pf._tile_runner = functools.lru_cache(maxsize=None)(orig_tile_runner)
        pf._pass_runner = functools.lru_cache(maxsize=None)(orig_pass_runner)

    print(f"instrumented total: {t_inst:.2f} s (sync overhead "
          f"~{30e-3 * sum(counts.values()):.1f} s)")
    for name in ("coarse", "prep", "run_tiles", "accum"):
        print(f"  {name}: {buckets[name]:.2f} s over {counts[name]} call(s) "
              f"({buckets[name]/max(counts[name],1)*1e3:.0f} ms/call)")

    # tile_batch=16: one sub-batch per full pass (round-3: remote compiler
    # HTTP 500 at this size — retry with the current graph)
    try:
        t0 = time.perf_counter()
        pf.infer(params, img, mode="p49", compute_dtype=jnp.bfloat16,
                 tile_batch=16)
        print(f"p49 tile_batch=16 first call (compile): "
              f"{time.perf_counter()-t0:.1f} s")
        t0 = time.perf_counter()
        pf.infer(params, img, mode="p49", compute_dtype=jnp.bfloat16,
                 tile_batch=16)
        print(f"p49 tile_batch=16 steady-state: "
              f"{time.perf_counter()-t0:.2f} s/frame")
    except Exception as e:  # noqa: BLE001 — document the crash mode
        print(f"p49 tile_batch=16 FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
