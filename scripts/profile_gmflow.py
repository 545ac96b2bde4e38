#!/usr/bin/env python3
"""GMFlow transformer-internals profile at the bench shape (810x1440, 2
pairs bidir, bf16): attributes the ~95 ms transformer stage across attention
kernels, linears/FFN, and window split/merge data movement so the next
optimization targets the real cost. Run alone (one TPU owner).
"""
import functools
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
    cfg = jgm.GMFlowConfig()
    params = jax.device_put(cast_params(
        jgm.init_params(jax.random.key(0), cfg), jnp.bfloat16))
    rng = np.random.default_rng(0)
    pairs = 2
    H, W = 816, 1440            # after /16 padding of 810
    h8, w8 = H // 8, W // 8     # 102 x 180 = 18360 tokens
    B = 2 * pairs               # bidir doubles pairs to images
    C = cfg.feature_channels
    ns = cfg.attn_splits

    f0 = jax.device_put(rng.normal(size=(B, h8, w8, C)).astype(jnp.bfloat16))
    f1 = jax.device_put(rng.normal(size=(B, h8, w8, C)).astype(jnp.bfloat16))

    for impl in ("flash", "xla"):
        t = timeit(jax.jit(functools_partial_transformer(impl)),
                   params["transformer"], f0, f1)
        print(f"transformer_forward[{impl}]: {t*1e3:.1f} ms")

    # attention alone: one shifted + one unshifted window attention at the
    # exact shapes the 6 blocks use ([2B, L, C] doubled features)
    q = jax.device_put(rng.normal(size=(2 * B, h8 * w8, C)).astype(jnp.bfloat16))
    ids = jgm.shift_window_region_ids(h8, w8, ns)
    for name, m in (("unshifted", None), ("shifted", ids)):
        for impl in ("flash", "xla"):
            fn = jax.jit(functools.partial(
                jgm._window_attention, h=h8, w=w8, ns=ns, ids=m, impl=impl))
            t = timeit(fn, q, q, q)
            print(f"window_attention {name} [{impl}] x1: {t*1e3:.2f} ms "
                  f"(x12 = {t*12e3:.0f} ms)")

    # linears/FFN/layernorm only: attention replaced by identity
    real_attn = jgm._window_attention_core
    jgm._window_attention_core = lambda qw, kw, vw, *a, **kw2: vw
    try:
        t = timeit(jax.jit(functools_partial_transformer("xla")),
                   params["transformer"], f0, f1)
        print(f"transformer linears+ffn+ln only (attn=identity): {t*1e3:.1f} ms")
    finally:
        jgm._window_attention_core = real_attn

    # window split/merge + roll data movement alone
    @jax.jit
    def winmove(x):
        y = x.reshape(2 * B, h8, w8, C)
        y = jnp.roll(y, (-(h8 // ns // 2), -(w8 // ns // 2)), axis=(1, 2))
        y = jgm._split_windows(y, ns)
        y = jgm._merge_windows(y, ns)
        y = jnp.roll(y, (h8 // ns // 2, w8 // ns // 2), axis=(1, 2))
        return y.reshape(2 * B, h8 * w8, C)

    print(f"split+merge+2rolls x1: {timeit(winmove, q)*1e3:.2f} ms "
          f"(x~12 = {timeit(winmove, q)*12e3:.0f} ms)")

    # the other stages for context
    img0 = jax.device_put(rng.uniform(0, 255, (pairs, 810, 1440, 3))
                          .astype(jnp.bfloat16))
    img1 = jax.device_put(rng.uniform(0, 255, (pairs, 810, 1440, 3))
                          .astype(jnp.bfloat16))
    t = timeit(jax.jit(lambda p, a, b: jgm.infer_pairs(p, a, b, cfg)),
               params, img0, img1)
    print(f"infer_pairs full: {t*1e3:.0f} ms => {pairs/t:.1f} pair-fps "
          f"(at {pairs} pairs)")


def functools_partial_transformer(impl):
    def run(tp, f0, f1):
        return jgm.transformer_forward(tp, f0, f1, 2, None, impl)
    return run


if __name__ == "__main__":
    main()
