#!/usr/bin/env python3
"""A/B the SepConvGRU update-block rewrite (VERDICT round-3 item 1).

Variants at the bench shape (810x1440, 2 fwd+bwd pairs, 20 iters, bf16):
  reference — concat(h, inp, motion) convs, z/r output-fused (round-3 state)
  fused     — context contraction hoisted out of the scan + concat-free
              split convs (_gru_fused_prepare / _sep_conv_gru_fused)

Times the isolated 20-iter update block (stand-in corr so only the GRU part
is measured) and the FULL infer_pairs, both >100 ms so host-loop timing is
trustworthy through the tunnel (CLAUDE.md). Run alone — one TPU owner.
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


def timeit(fn, *args, iters=5):
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

    # --- isolated update block (stand-in corr; consume the flow output) ----
    dtype = jnp.bfloat16
    Bb, H8, W8 = 2 * B, 104, 180
    net0 = jax.device_put(rng.standard_normal((Bb, H8, W8, cfg.hidden_dim))
                          .astype(dtype))
    inp = jax.device_put(rng.standard_normal((Bb, H8, W8, cfg.context_dim))
                         .astype(dtype))
    gx, gy = jnp.meshgrid(jnp.arange(W8, dtype=jnp.float32),
                          jnp.arange(H8, dtype=jnp.float32))
    c0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (Bb, H8, W8, 2))
    n_corr = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2

    def gru_scan(impl):
        @jax.jit
        def run(p, net0, inp, c0):
            if impl in ("fused", "fused_me3", "fused_bd"):
                prep = jraft._gru_fused_prepare(p["update"]["gru"], inp,
                                                cfg.hidden_dim)
            elif impl == "fused2":
                prep = jraft._gru_fused2_prepare(p["update"]["gru"], inp,
                                                 cfg.hidden_dim)

            def step(carry, _):
                net, coords1 = carry
                corr = jnp.broadcast_to(
                    jnp.mean(net, -1, keepdims=True).astype(dtype),
                    net.shape[:3] + (n_corr,))
                flow = (coords1 - c0).astype(dtype)
                me = {"fused2": jraft._motion_encoder_fused,
                      "fused_me3": jraft._motion_encoder_fused,
                      "fused_bd": jraft._motion_encoder_bd}.get(
                          impl, jraft._motion_encoder)
                motion = me(p["update"]["encoder"], flow, corr)
                if impl in ("fused", "fused_me3", "fused_bd"):
                    net = jraft._sep_conv_gru_fused(prep, net, motion)
                elif impl == "fused2":
                    net = jraft._sep_conv_gru_fused2(prep, net, motion)
                else:
                    gru_in = jnp.concatenate([inp, motion], axis=-1)
                    net = jraft._sep_conv_gru(p["update"]["gru"], net, gru_in)
                delta = jraft._flow_head(p["update"]["flow_head"], net)
                return (net, coords1 + delta.astype(jnp.float32)), None

            (net, c1), _ = jax.lax.scan(step, (net0, c0), None,
                                        length=cfg.iters)
            return c1
        return run

    for impl in ("reference", "fused", "fused_bd", "fused_me3", "fused2"):
        t = timeit(gru_scan(impl), params, net0, inp, c0)
        print(f"20x update block [{impl}]: {t*1e3:.0f} ms "
              f"({t/cfg.iters*1e3:.2f} ms/iter)")

    # --- full model ---------------------------------------------------------
    outs = {}
    for impl in ("reference", "fused", "fused_bd"):
        fn = jax.jit(lambda p, a, b, impl=impl: jraft.infer_pairs(
            p, a, b, corr_impl="volume_onehot", gru_impl=impl))
        t = timeit(fn, params, img1, img2)
        outs[impl] = np.asarray(fn(params, img1, img2)[0], np.float32)
        print(f"infer_pairs full [{impl}]: {t*1e3:.0f} ms "
              f"=> {B/t:.2f} pair-fps")
    d = np.abs(outs["reference"] - outs["fused"]).max()
    print(f"max |fwd flow diff| reference vs fused (bf16): {d:.4f}")
    d3 = np.abs(outs["fused"] - outs["fused_bd"]).max()
    print(f"max |fwd flow diff| fused vs fused_bd (bf16): {d3:.4f}")


if __name__ == "__main__":
    main()
