#!/usr/bin/env python3
"""A/B: tile-graph cost vs sub-batch width B.

p49 runs pass sizes (16, 12, 12, 9) through tile_batch=8 sub-batches,
edge-padding to 64 tile slots for 49 real tiles (23% waste). If the
fine+fusion graph's ms/tile is ~flat in B, a per-pass plan (e.g. 8/6/6/3)
removes the padding. This measures ms/call and ms/tile for the full tile
graph (fine ZoeD + roi fusion + unet + bins) at B in {3..8}, scan-chained
through one jit per B (tunnel-proof; see CLAUDE.md). Run alone — one TPU
owner.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from prisma_tpu.models import patchfusion as pf
from prisma_tpu.weights.store import cast_params

MODEL_HW = pf.MODEL_HW
DT = jnp.bfloat16


def scan_time(fn, consume, *args, iters=6):
    def make(n):
        @jax.jit
        def run(args):
            def body(c, _):
                xs = list(args)
                xs[0] = xs[0] + (c * 1e-30).astype(xs[0].dtype)
                out = fn(*xs)
                return consume(out).astype(jnp.float32), ()
            c, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run
    r1, r2 = make(iters), make(2 * iters)
    float(r1(args)); float(r2(args))
    t0 = time.perf_counter(); float(r1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(args)); t2 = time.perf_counter() - t0
    return (t2 - t1) / iters


def main():
    params = jax.device_put(cast_params(
        pf.init_params(jax.random.key(6), beit_depth=24), DT))
    rng = np.random.default_rng(0)
    img_lr = jax.device_put(jnp.asarray(
        rng.random((1, *MODEL_HW, 3), np.float32), DT))
    cache = tuple(jax.device_put(jax.jit(pf.coarse_pass)(params, img_lr)))

    for B in (8, 6, 5, 4, 3):
        crops = jax.device_put(jnp.asarray(
            rng.random((B, *MODEL_HW, 3), np.float32), DT))
        bbox = jax.device_put(jnp.asarray(
            [[(i * 29) % 300, (i * 17) % 200,
              (i * 29) % 300 + 128.0, (i * 17) % 200 + 96.0]
             for i in range(B)], jnp.float32))
        areas = jax.device_put(jnp.asarray(
            rng.random((B, *MODEL_HW, 1), np.float32)))
        prior = jax.device_put(jnp.asarray(
            rng.random((B, *MODEL_HW, 1), np.float32)))

        t = scan_time(
            lambda crops, bbox, areas, prior, params, img_lr, cf, cd:
                pf.patchfusion_tiles(
                    params, crops, img_lr, bbox, areas, prior, (cf, cd))[0],
            lambda d: jnp.sum(d.astype(jnp.float32)),
            crops, bbox, areas, prior, params, img_lr, cache[0], cache[1])
        print(f"B={B}: {t*1e3:7.1f} ms/call  {t*1e3/B:6.1f} ms/tile",
              flush=True)


if __name__ == "__main__":
    main()
