#!/usr/bin/env python3
"""GMFlow 2-scale REFINE profile at the bench shape (4 bidir pairs, 810x1440).

The refine config (reference gmflow.py:93-166, --num_scales 2) measured 5.71
pair-fps vs 29.4 for 1-scale: the added scale-1 pass runs at 1/4 resolution
with the batch doubled for bidir = 8x the scale-0 token*batch volume. This
splits that pass into its stages so the next optimization targets the real
cost. Timing via bench_all._device_bench (scan-chained; bare host loops
undercount through the tunneled runtime). Run alone (one TPU owner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import gmflow as gm
from prisma_tpu.ops import nn as pnn
from prisma_tpu.weights.store import cast_params


def ms(step, args, iters=5):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    pairs = 4
    cfg = gm.refine_config()
    params = jax.device_put(cast_params(
        gm.init_params(jax.random.key(2), cfg), jnp.bfloat16))
    rng = np.random.default_rng(0)
    h, w = 810, 1440

    i1 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    i2 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))

    def full(params, i1, i2):
        f, b = gm.infer_pairs(params, i1.astype(jnp.bfloat16),
                              i2.astype(jnp.bfloat16), cfg)
        return f
    t_full = ms(full, (params, i1, i2), iters=3)
    print(f"full 2-scale infer_pairs (4 pairs): {t_full:7.1f} ms "
          f"=> {pairs / t_full * 1e3:.2f} pair-fps")

    # backbone with the trident 1/4 branch (pad to /32 -> 832x1440)
    H, W = 832, 1440
    both = jax.device_put(rng.normal(size=(2 * pairs, H, W, 3))
                          .astype(np.float32).astype(jnp.bfloat16))

    def backbone(params, x):
        return gm.backbone_forward(params["backbone"], x, num_scales=2)[1]
    t_bb = ms(backbone, (params, both), iters=4)
    print(f"backbone 2-scale (8 imgs {H}x{W}):  {t_bb:7.1f} ms")

    attn_splits_l, corr_radius_l, prop_radius_l = cfg.scale_lists()
    # scale-1 features: 1/4 res, batch doubled for bidir
    fh, fw, C = H // 4, W // 4, cfg.feature_channels
    B = 2 * pairs
    f0 = jax.device_put(rng.normal(size=(B, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))
    f1 = jax.device_put(rng.normal(size=(B, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))
    flow = jax.device_put(rng.normal(size=(B, fh, fw, 2))
                          .astype(np.float32).astype(jnp.bfloat16))

    def warp(f1, flow):
        return gm._flow_warp(f1, flow)
    t_wp = ms(warp, (f1, flow))
    print(f"scale-1 _flow_warp (B={B}):         {t_wp:7.1f} ms")

    sp = attn_splits_l[1]

    def transformer(params, f0, f1):
        a0, a1 = gm.add_position(f0, f1, sp)
        return gm.transformer_forward(params["transformer"], a0, a1,
                                      sp, None, cfg.attn_impl)[0]
    t_tf = ms(transformer, (params, f0, f1), iters=3)
    print(f"scale-1 transformer (splits={sp}):    {t_tf:7.1f} ms")

    r = corr_radius_l[1]

    def localcorr(f0, f1):
        return gm.local_correlation_softmax(f0, f1, r).astype(jnp.float32)
    t_lc = ms(localcorr, (f0, f1))
    print(f"local corr softmax (r={r}):          {t_lc:7.1f} ms")

    pr = prop_radius_l[1]

    def localprop(params, f0, flow):
        return gm.flow_propagation_local(params["flow_attn"], f0, flow, pr)
    t_lp = ms(localprop, (params, f0, flow))
    print(f"local propagation (r={pr}):           {t_lp:7.1f} ms")

    def upsample(params, flow, f0):
        concat = jnp.concatenate([flow, f0], axis=-1)
        y = jax.nn.relu(pnn.conv2d(params["upsampler"]["conv1"], concat,
                                   padding=1))
        mask = pnn.conv2d(params["upsampler"]["conv2"], y)
        return gm.convex_upsample(flow, mask, cfg.upsample_factor)
    t_up = ms(upsample, (params, flow, f0))
    print(f"upsample head + convex x4:          {t_up:7.1f} ms")

    acc = t_bb + t_wp + t_tf + t_lc + t_lp + t_up
    print(f"sum of refine-path stages:          {acc:7.1f} ms  "
          f"(full {t_full:.1f}; scale-0 pass + pre/post = remainder)")


if __name__ == "__main__":
    main()
