#!/usr/bin/env python3
"""A/B the GMFlow transformer's window-attention impl (flash vs dense XLA) and
the matching/propagation impl (Pallas streamed vs lax.scan blockwise) at the
production 810x1440 shapes. Run alone (one TPU owner)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import gmflow as jgm
from prisma_tpu.weights.store import cast_params


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    pairs = int(os.environ.get("PAIRS", "4"))
    h, w = 816, 1440
    params = jax.device_put(cast_params(
        jgm.init_params(jax.random.key(2)), jnp.bfloat16))
    cfg = jgm.GMFlowConfig()
    rng = np.random.default_rng(0)
    B = pairs
    H1, W1 = h // 8, w // 8
    f0 = jax.device_put(rng.normal(size=(B, H1, W1, 128)).astype(jnp.bfloat16))
    f1 = jax.device_put(rng.normal(size=(B, H1, W1, 128)).astype(jnp.bfloat16))

    for impl in ("xla", "flash"):
        @jax.jit
        def tr(p, a, b, impl=impl):
            return jgm.transformer_forward(p["transformer"], a, b,
                                           cfg.attn_splits, None, impl)
        print(f"transformer attn_impl={impl}: "
              f"{timeit(tr, params, f0, f1)*1e3:.1f} ms")

    @jax.jit
    def match_scan(a, b):
        return jgm._attn_blockwise(
            a.reshape(B, -1, 128), b.reshape(B, -1, 128),
            jgm._coords_grid_flat(H1, W1), 1.0 / (128 ** 0.5), cfg.key_chunk,
            None)

    @jax.jit
    def match_flash(a, b):
        return jgm._global_attend(
            a.reshape(B, -1, 128), b.reshape(B, -1, 128),
            jgm._coords_grid_flat(H1, W1), 1.0 / (128 ** 0.5), cfg.key_chunk,
            None)

    print(f"matching scan (uni): {timeit(match_scan, f0, f1)*1e3:.1f} ms")
    print(f"matching flash (uni): {timeit(match_flash, f0, f1)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
