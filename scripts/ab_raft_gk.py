#!/usr/bin/env python3
"""A/B the Pallas gather-kernel RAFT lookup (corr_impl='volume_gk') vs
volume_onehot at the bench shape: lookup-only scans per variant + full
infer_pairs pair-fps. Run alone (one TPU owner)."""
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

    # -- lookup-only scans ---------------------------------------------------
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
        return (jraft.build_corr_pyramid(fmaps[:Bb], fmaps[Bb:],
                                         cfg.corr_levels),
                [v for v, _ in jraft.build_corr_pyramid_padded(
                    fmaps[:Bb], fmaps[Bb:], cfg.corr_levels)])

    pyr, pad_vols = jax.device_put(feats(params, a, b))
    # logical level dims (build_fmap_pyramid: trim odd row/col, then halve)
    dims, (h, w) = [], (pyr[0].shape[1], pyr[0].shape[2])
    for _ in pad_vols:
        dims.append((h, w))
        h, w = h // 2, w // 2
    pyr_pad = list(zip(pad_vols, dims))
    Bb, H8, W8 = 2 * B, pyr[0].shape[1], pyr[0].shape[2]
    gx, gy = jnp.meshgrid(jnp.arange(W8, dtype=jnp.float32),
                          jnp.arange(H8, dtype=jnp.float32))
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (Bb, H8, W8, 2))

    def scan_of(lookup_fn):
        # volumes go in as jit ARGUMENTS (pytree of arrays); any static dims
        # are rebuilt inside lookup_fn from `dims` (plain ints via closure) —
        # tuples of ints in the arg pytree would become tracers, and arrays
        # in a closure would become giant jaxpr constants
        @jax.jit
        def run(vols, c0):
            def step(coords, _):
                corr = lookup_fn(vols, coords)
                drift = jnp.mean(corr.astype(jnp.float32), -1, keepdims=True)
                return coords + jnp.concatenate([drift, -drift], -1) * 1e-3, \
                    None
            out, _ = jax.lax.scan(step, c0, None, length=cfg.iters)
            return out
        return run

    t = timeit(scan_of(lambda p, c: jraft.corr_lookup(p, c, cfg.corr_radius,
                                                      onehot=True)),
               pyr, coords0)
    print(f"20x corr_lookup(onehot): {t*1e3:.0f} ms "
          f"({t/cfg.iters*1e3:.1f} ms/iter)")
    try:
        t = timeit(scan_of(lambda vols, c: jraft.corr_lookup_gk(
            list(zip(vols, dims)), c, cfg.corr_radius)), pad_vols, coords0)
        print(f"20x corr_lookup(gather-kernel): {t*1e3:.0f} ms "
              f"({t/cfg.iters*1e3:.1f} ms/iter)")
    except Exception as e:  # noqa: BLE001
        print(f"gather-kernel FAILED: {type(e).__name__}: {str(e)[:400]}")
        return

    # per-level gk scans
    for li, (vol, hw) in enumerate(pyr_pad):
        from prisma_tpu.ops.pallas.raft_window import window_lookup_gather
        cx = (coords0[..., 0] / 2 ** li).reshape(-1)
        cy = (coords0[..., 1] / 2 ** li).reshape(-1)

        @jax.jit
        def level_scan(vol, cx, cy, hw=hw):
            def step(c, _):
                w = window_lookup_gather(vol, c[0], c[1], hw, r=4)
                d = jnp.mean(w.astype(jnp.float32), -1) * 1e-3
                return (c[0] + d, c[1] - d), None
            (ox, oy), _ = jax.lax.scan(step, (cx, cy), None,
                                       length=cfg.iters)
            return ox
        try:
            t = timeit(level_scan, vol, cx, cy)
            print(f"  L{li} {vol.shape}: {t/cfg.iters*1e3:.2f} ms/iter")
        except Exception as e:  # noqa: BLE001
            print(f"  L{li} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # -- end-to-end ----------------------------------------------------------
    for impl in ("volume_onehot", "volume_gk"):
        try:
            t = timeit(jax.jit(lambda p, a, b, impl=impl: jraft.infer_pairs(
                p, a, b, corr_impl=impl)), params, img1, img2)
            print(f"infer_pairs[{impl}]: {t*1e3:.0f} ms => {B/t:.2f} pair-fps")
        except Exception as e:  # noqa: BLE001
            print(f"infer_pairs[{impl}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
