#!/usr/bin/env python3
"""RAFT per-stage profile at the bench shape (810x1440, 2 fwd+bwd pairs,
20 iters, bf16, corr_impl=volume_onehot) — attributes the pair-fps number
across backbone/volume build, the 20-iter corr lookups, and the 20-iter
GRU/motion-encoder block so the VERDICT round-2 item 2 question (lookup
roofline vs GRU compute) is answered with measurements, not estimates.

Each isolated scan consumes EVERY output channel (sum) — XLA DCEs unused
taps/levels through a scan and a "0 ms" lookup just means nothing read it
(CLAUDE.md perf notes). Run alone (one TPU owner).
"""
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
    B = 2  # pairs; fwd+bwd doubles to 4 images through forward()
    H, W = 810, 1440
    img1 = jax.device_put(rng.uniform(0, 255, (B, H, W, 3)).astype(jnp.bfloat16))
    img2 = jax.device_put(rng.uniform(0, 255, (B, H, W, 3)).astype(jnp.bfloat16))

    t_full = timeit(jax.jit(lambda p, a, b: jraft.infer_pairs(
        p, a, b, corr_impl="volume_onehot")), params, img1, img2)
    print(f"infer_pairs full (volume_onehot): {t_full*1e3:.0f} ms "
          f"=> {B/t_full:.2f} pair-fps")

    # pieces at the padded/doubled shape forward() actually sees
    i1, _ = jraft.pad_to_multiple(img1)
    i2, _ = jraft.pad_to_multiple(img2)
    a = jnp.concatenate([i1, i2], axis=0)
    b = jnp.concatenate([i2, i1], axis=0)

    @jax.jit
    def feats_and_pyramid(p, a, b):
        n1 = 2.0 * (a / 255.0) - 1.0
        n2 = 2.0 * (b / 255.0) - 1.0
        both = jnp.concatenate([n1, n2], axis=0)
        fmaps = jraft.encoder_forward(p["fnet"], both, "instance")
        Bb = a.shape[0]
        pyr = jraft.build_corr_pyramid(fmaps[:Bb], fmaps[Bb:], cfg.corr_levels)
        cnet = jraft.encoder_forward(p["cnet"], n1, "affine")
        return pyr, cnet

    t_pre = timeit(feats_and_pyramid, params, a, b)
    print(f"backbone + volume pyramid + cnet: {t_pre*1e3:.0f} ms")

    pyr, cnet = feats_and_pyramid(params, a, b)
    pyr = jax.device_put(pyr)
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
                # consume every channel; drift coords so iterations differ
                drift = jnp.mean(corr.astype(jnp.float32), -1, keepdims=True)
                return coords + jnp.concatenate([drift, -drift], -1) * 1e-3, \
                    None
            out, _ = jax.lax.scan(step, c0, None, length=cfg.iters)
            return out
        return lookup_only

    for name, oh in (("onehot", True), ("onehot_xf", "xf"),
                     ("take_along", False)):
        t_lk = timeit(lookup_scan(oh), pyr, coords0)
        print(f"20x corr_lookup({name}) only: {t_lk*1e3:.0f} ms "
              f"({t_lk/cfg.iters*1e3:.1f} ms/iter)")

    # per-level onehot cost: time scans that look up ONE level each
    full_pyr = list(pyr)
    for li, vol in enumerate(full_pyr):
        @jax.jit
        def one_level(vol, c0, li=li):
            def step(coords, _):
                cx = coords[..., 0].reshape(-1) / (2 ** li)
                cy = coords[..., 1].reshape(-1) / (2 ** li)
                win = jraft._window_onehot_lookup(vol, cx, cy,
                                                  cfg.corr_radius)
                drift = jnp.mean(win.astype(jnp.float32), -1)
                drift = drift.reshape(coords.shape[:3] + (1,))
                return coords + jnp.concatenate([drift, -drift], -1) * 1e-3, \
                    None
            out, _ = jax.lax.scan(step, c0, None, length=cfg.iters)
            return out
        t_l = timeit(one_level, vol, coords0)
        print(f"  level {li} {tuple(vol.shape)}: {t_l/cfg.iters*1e3:.2f} ms/iter")

    dtype = jnp.bfloat16
    net0 = jnp.tanh(cnet[..., :cfg.hidden_dim])
    inp = jraft._relu(cnet[..., cfg.hidden_dim:])
    n_corr = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2

    @jax.jit
    def gru_only(p, net0, inp, c0):
        def step(carry, _):
            net, coords1 = carry
            # stand-in corr that depends on the carry (same shape/dtype as a
            # real lookup) so nothing folds out of the loop
            corr = jnp.broadcast_to(
                jnp.mean(net, -1, keepdims=True).astype(dtype),
                net.shape[:3] + (n_corr,))
            flow = (coords1 - c0).astype(dtype)
            motion = jraft._motion_encoder(p["update"]["encoder"], flow, corr)
            gru_in = jnp.concatenate([inp, motion], axis=-1)
            net = jraft._sep_conv_gru(p["update"]["gru"], net, gru_in)
            delta = jraft._flow_head(p["update"]["flow_head"], net)
            return (net, coords1 + delta.astype(jnp.float32)), None
        (net, c1), _ = jax.lax.scan(step, (net0, c0), None, length=cfg.iters)
        return c1

    t_gru = timeit(gru_only, params, net0, inp, coords0)
    print(f"20x motion+GRU+flow_head only: {t_gru*1e3:.0f} ms "
          f"({t_gru/cfg.iters*1e3:.1f} ms/iter)")

    @jax.jit
    def upsample_only(p, net0, c0):
        up_mask = jraft._mask_head(p["update"]["mask"], net0)
        return jraft.convex_upsample(c0, up_mask.astype(jnp.float32))

    print(f"mask head + convex upsample: {timeit(upsample_only, params, net0, coords0)*1e3:.0f} ms")

    # roofline context: physical (tile-padded) volume bytes per lookup
    phys = 0
    for v in pyr:
        n, h, w = v.shape
        phys += n * (-(-h // 8) * 8) * (-(-w // 128) * 128) * v.dtype.itemsize
    print(f"pyramid physical bytes (8,128-tiled): {phys/1e9:.2f} GB "
          f"-> @819GB/s floor {phys/819e9*1e3:.1f} ms/iter")


if __name__ == "__main__":
    main()
