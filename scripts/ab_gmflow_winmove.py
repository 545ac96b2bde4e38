#!/usr/bin/env python3
"""Micro-A/B of GMFlow window split/merge data movement and flash-core block
sizes at the bench shape ([8, 102, 180, 128] bf16, ns=2 -> 4 windows of
51x90=4590 tokens). Run alone (one TPU owner).

Questions answered (feeds the transformer optimization):
1. Is the 5.46 ms split+merge+rolls cost the ROLL or the split transpose?
2. Does padding W 180->192 (aligned 96-column window halves) make the
   split/merge cheap?
3. Flash core block-size sweep at 4590 tokens.
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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    B, h, w, C = 8, 102, 180, 128
    ns = 2
    x = jax.device_put(rng.normal(size=(B, h, w, C)).astype(jnp.bfloat16))
    xf = x.reshape(B, h * w, C)

    # 1. decompose the 5.46 ms winmove
    @jax.jit
    def split_merge(x):
        y = jgm._split_windows(x, ns)
        return jgm._merge_windows(y.reshape(B * ns * ns, h // ns, w // ns, C),
                                  ns)

    @jax.jit
    def rolls_only(x):
        y = jnp.roll(x, (-(h // ns // 2), -(w // ns // 2)), axis=(1, 2))
        return jnp.roll(y, (h // ns // 2, w // ns // 2), axis=(1, 2))

    @jax.jit
    def copy_only(x):
        return x + jnp.bfloat16(1.0)

    print(f"copy (2 passes, {x.nbytes/1e6:.0f} MB): "
          f"{timeit(copy_only, x)*1e3:.2f} ms")
    print(f"split+merge (no roll): {timeit(split_merge, x)*1e3:.2f} ms")
    print(f"2 rolls only: {timeit(rolls_only, x)*1e3:.2f} ms")

    # 2. aligned variant: pad W to 192 so each window half is 96 cols
    wp = 192
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))

    @jax.jit
    def split_merge_padded(xp):
        y = jgm._split_windows(xp, ns)
        return jgm._merge_windows(
            y.reshape(B * ns * ns, h // ns, wp // ns, C), ns)

    print(f"split+merge padded W=192: {timeit(split_merge_padded, xp)*1e3:.2f} ms")

    # pad H to 112 too (56-row halves, 8-aligned)
    hp = 112
    xhp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

    @jax.jit
    def split_merge_padded2(xhp):
        y = jgm._split_windows(xhp, ns)
        return jgm._merge_windows(
            y.reshape(B * ns * ns, hp // ns, wp // ns, C), ns)

    print(f"split+merge padded H=112 W=192: "
          f"{timeit(split_merge_padded2, xhp)*1e3:.2f} ms")

    # 3. flash core block sweep at the window shape
    qw = jax.device_put(rng.normal(size=(B * ns * ns, (h // ns) * (w // ns),
                                         C)).astype(jnp.bfloat16))
    from prisma_tpu.ops.pallas.flash_attention import flash_attention
    for bq, bk in ((256, 256), (512, 512), (512, 1024), (1024, 512),
                   (1024, 1024), (2048, 512), (512, 2048)):
        fn = jax.jit(functools.partial(flash_attention, block_q=bq,
                                       block_k=bk))
        try:
            t = timeit(fn, qw, qw, qw)
            print(f"flash core 4590 tok bq={bq} bk={bk}: {t*1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"flash core bq={bq} bk={bk}: FAILED {type(e).__name__}")

    # shifted (ids) variants: one-hot-lane folding vs cost of plain
    ids = jgm.shift_window_region_ids(h, w, ns)
    idst = jnp.tile(jnp.asarray(ids, jnp.int32), (B, 1))
    for bq, bk in ((512, 512), (1024, 512)):
        fn = jax.jit(functools.partial(flash_attention, block_q=bq,
                                       block_k=bk))
        t = timeit(fn, qw, qw, qw, idst)
        print(f"flash core +ids bq={bq} bk={bk}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
