#!/usr/bin/env python3
"""Per-stage RAFT profile on the real chip: separates volume build, the
per-iteration lookup, and the per-iteration update block so the 4.48 pair-fps
number can be attributed (VERDICT round-2 item 2: lift flow_raft to >=1.0x or
prove the bound). Run alone — only one process may own the tunneled TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import raft as jraft
from prisma_tpu.weights.store import cast_params


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    h, w = 810, 1440
    pairs = 2
    params = jax.device_put(cast_params(
        jraft.init_params(jax.random.key(1)), jnp.bfloat16))
    rng = np.random.default_rng(0)
    i1 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    i2 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))

    def step(it):
        @jax.jit
        def f(params, a, b):
            return jraft.infer_pairs(params, a.astype(jnp.bfloat16),
                                     b.astype(jnp.bfloat16), iters=it,
                                     corr_impl="volume_onehot")
        return f

    for it in (1, 2, 20):
        t = timeit(step(it), params, i1, i2)
        print(f"full step iters={it}: {t*1e3:.1f} ms")

    # isolate the lookup: pyramid build + N lookups with changing coords,
    # consuming every channel (sum) so XLA cannot DCE taps/levels
    B = 2 * pairs
    hp, wp = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    H1, W1 = hp // 8, wp // 8
    fm1 = jax.device_put(rng.normal(size=(B, H1, W1, 256)).astype(jnp.bfloat16))
    fm2 = jax.device_put(rng.normal(size=(B, H1, W1, 256)).astype(jnp.bfloat16))

    @jax.jit
    def build(a, b):
        return tuple(jraft.build_corr_pyramid(a, b, 4))

    pyr = build(fm1, fm2)
    print("pyramid shapes:", [p.shape for p in pyr])
    tb = timeit(build, fm1, fm2)
    print(f"volume+pyramid build: {tb*1e3:.1f} ms")

    gx, gy = jnp.meshgrid(jnp.arange(W1, dtype=jnp.float32),
                          jnp.arange(H1, dtype=jnp.float32))
    coords0 = jnp.stack([gx, gy], axis=-1)[None].repeat(B, 0)  # [B,H1,W1,2]

    def lookup_n(n_it):
        @jax.jit
        def f(pyr, c0):
            def body(c, k):
                win = jraft.corr_lookup(pyr, c, 4, onehot=True)
                # consume EVERY channel and feed back into coords
                d = jnp.mean(win, axis=-1, keepdims=True)
                return c + jnp.concatenate([d, -d], -1) * 1e-3, jnp.sum(win)
            c, s = jax.lax.scan(body, c0, jnp.arange(n_it))
            return jnp.sum(s) + jnp.sum(c)
        return f

    for n_it in (1, 2, 20):
        t = timeit(lookup_n(n_it), pyr, coords0)
        print(f"lookup x{n_it} (scan, all channels consumed): {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
