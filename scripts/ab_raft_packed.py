#!/usr/bin/env python3
"""A/B the packed tail-level RAFT lookup vs per-level onehot at the bench
shape, plus the full infer_pairs number. Run alone (one TPU owner)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from prisma_tpu.models import raft as jraft
from prisma_tpu.weights.store import cast_params


def timeit(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = jraft.RAFTConfig()
    params = jax.device_put(cast_params(
        jraft.init_params(jax.random.key(0)), jnp.bfloat16))
    rng = np.random.default_rng(0)
    B, H, W = 2, 810, 1440
    img1 = jax.device_put(rng.uniform(0, 255, (B, H, W, 3)).astype(jnp.bfloat16))
    img2 = jax.device_put(rng.uniform(0, 255, (B, H, W, 3)).astype(jnp.bfloat16))

    for impl in ("volume_onehot", "volume_onehot_packed"):
        t = timeit(jax.jit(lambda p, a, b, impl=impl: jraft.infer_pairs(
            p, a, b, corr_impl=impl)), params, img1, img2)
        print(f"infer_pairs[{impl}]: {t*1e3:.0f} ms => {B/t:.2f} pair-fps")

    # lookup-only scans
    i1, _ = jraft.pad_to_multiple(img1)
    i2, _ = jraft.pad_to_multiple(img2)
    a = jnp.concatenate([i1, i2], axis=0)
    b = jnp.concatenate([i2, i1], axis=0)

    @jax.jit
    def feats(p, a, b):
        n1 = 2.0 * (a / 255.0) - 1.0
        n2 = 2.0 * (b / 255.0) - 1.0
        both = jnp.concatenate([n1, n2], axis=0)
        fmaps = jraft.encoder_forward(p["fnet"], both, "instance")
        Bb = a.shape[0]
        return jraft.build_corr_pyramid(fmaps[:Bb], fmaps[Bb:],
                                        cfg.corr_levels)

    pyr = jax.device_put(feats(params, a, b))
    packed = jax.device_put(jraft.pack_pyramid_tail(pyr))
    Bb, H8, W8 = 2 * B, pyr[0].shape[1], pyr[0].shape[2]
    gx, gy = jnp.meshgrid(jnp.arange(W8, dtype=jnp.float32),
                          jnp.arange(H8, dtype=jnp.float32))
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (Bb, H8, W8, 2))

    def lookup_scan(onehot):
        @jax.jit
        def lookup_only(pyr, c0):
            def step(coords, _):
                corr = jraft.corr_lookup(pyr, coords, cfg.corr_radius,
                                         onehot=onehot)
                drift = jnp.mean(corr.astype(jnp.float32), -1, keepdims=True)
                return coords + jnp.concatenate([drift, -drift], -1) * 1e-3, \
                    None
            out, _ = jax.lax.scan(step, c0, None, length=cfg.iters)
            return out
        return lookup_only

    t = timeit(lookup_scan(True), pyr, coords0)
    print(f"20x corr_lookup(onehot): {t*1e3:.0f} ms ({t/cfg.iters*1e3:.1f} ms/iter)")
    t = timeit(lookup_scan("packed"), packed, coords0)
    print(f"20x corr_lookup(packed): {t*1e3:.0f} ms ({t/cfg.iters*1e3:.1f} ms/iter)")

    # tail-levels only, packed vs separate
    cx = coords0[..., 0].reshape(-1)
    cy = coords0[..., 1].reshape(-1)
    _, pk, dims = packed

    @jax.jit
    def tail_packed(pk, cx, cy):
        def step(c, _):
            w = jraft._window_onehot_lookup_packed(pk, dims, c[0], c[1],
                                                   cfg.corr_radius)
            d = jnp.mean(w.astype(jnp.float32), -1)
            return (c[0] + d * 1e-3, c[1] - d * 1e-3), None
        out, _ = jax.lax.scan(step, (cx, cy), None, length=cfg.iters)
        return out

    t = timeit(tail_packed, pk, cx, cy)
    print(f"20x tail packed only: {t*1e3:.0f} ms ({t/cfg.iters*1e3:.1f} ms/iter)")

    tail = pyr[1:]

    @jax.jit
    def tail_separate(tail, cx, cy):
        def step(c, _):
            outs = [jraft._window_onehot_lookup(v, c[0] / (2 ** (i + 1)),
                                                c[1] / (2 ** (i + 1)),
                                                cfg.corr_radius)
                    for i, v in enumerate(tail)]
            d = jnp.mean(jnp.concatenate(outs, -1).astype(jnp.float32), -1)
            return (c[0] + d * 1e-3, c[1] - d * 1e-3), None
        out, _ = jax.lax.scan(step, (cx, cy), None, length=cfg.iters)
        return out

    t = timeit(tail_separate, tail, cx, cy)
    print(f"20x tail separate only: {t*1e3:.0f} ms ({t/cfg.iters*1e3:.1f} ms/iter)")


if __name__ == "__main__":
    main()
