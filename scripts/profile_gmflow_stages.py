#!/usr/bin/env python3
"""GMFlow per-stage profile at the bench shape (4 bidir pairs, 810x1440).

Splits the production step (bench_all.bench_flow_gmflow: pad to 816x1440,
backbone 1/8, 2x2-split swin transformer, blockwise global matching, global
propagation, convex upsample) so the next optimization targets the real cost.
Uses bench_all._device_bench (scan-chained on-device timing): bare host loops
undercount through the tunneled runtime. Run alone (one TPU owner).
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
    cfg = gm.GMFlowConfig()
    params = jax.device_put(cast_params(
        gm.init_params(jax.random.key(2)), jnp.bfloat16))
    rng = np.random.default_rng(0)
    h, w = 810, 1440

    i1 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    i2 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))

    def full(params, i1, i2):
        f, b = gm.infer_pairs(params, i1.astype(jnp.bfloat16),
                              i2.astype(jnp.bfloat16), cfg)
        return f
    t_full = ms(full, (params, i1, i2), iters=4)
    print(f"full infer_pairs (4 pairs): {t_full:7.1f} ms "
          f"=> {pairs / t_full * 1e3:.1f} pair-fps")

    # stage 1: backbone on the 8-image padded batch (both frames concat)
    H, W = 816, 1440
    both = jax.device_put(rng.normal(size=(2 * pairs, H, W, 3))
                          .astype(np.float32).astype(jnp.bfloat16))

    def backbone(params, x):
        return gm.backbone_forward(params["backbone"], x)
    t_bb = ms(backbone, (params, both))
    print(f"backbone (8 imgs 816x1440): {t_bb:7.1f} ms")

    # features at 1/8
    fh, fw, C = H // 8, W // 8, cfg.feature_channels
    f0 = jax.device_put(rng.normal(size=(pairs, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))
    f1 = jax.device_put(rng.normal(size=(pairs, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))

    # stage 2: position + 6-layer transformer
    def transformer(params, f0, f1):
        a0, a1 = gm.add_position(f0, f1, cfg.attn_splits)
        return gm.transformer_forward(params["transformer"], a0, a1,
                                      cfg.attn_splits, None, cfg.attn_impl)[0]
    t_tf = ms(transformer, (params, f0, f1))
    print(f"add_position + transformer: {t_tf:7.1f} ms")

    # stage 3: blockwise global matching (bidir)
    def matching(f0, f1):
        return gm.global_correlation_softmax_blockwise(
            f0, f1, True, cfg.key_chunk, None).astype(jnp.float32)
    t_mt = ms(matching, (f0, f1))
    print(f"global matching (bidir):    {t_mt:7.1f} ms")

    # stage 4: global propagation on the doubled batch
    f0d = jnp.concatenate([f0, f1], axis=0)
    flow = jax.device_put(rng.normal(size=(2 * pairs, fh, fw, 2))
                          .astype(np.float32).astype(jnp.bfloat16))

    def prop(params, f0d, flow):
        return gm.flow_propagation(params["flow_attn"], f0d, flow,
                                   cfg.key_chunk, None, blockwise=True)
    t_pr = ms(prop, (params, f0d, flow))
    print(f"global propagation:         {t_pr:7.1f} ms")

    # stage 5: upsampler head + convex upsample
    def upsample(params, flow, f0d):
        concat = jnp.concatenate([flow, f0d], axis=-1)
        y = jax.nn.relu(pnn.conv2d(params["upsampler"]["conv1"], concat,
                                   padding=1))
        mask = pnn.conv2d(params["upsampler"]["conv2"], y)
        return gm.convex_upsample(flow, mask, cfg.upsample_factor)
    t_up = ms(upsample, (params, flow, f0d))
    print(f"upsample head + convex x8:  {t_up:7.1f} ms")

    acc = t_bb + t_tf + t_mt + t_pr + t_up
    print(f"sum of stages:              {acc:7.1f} ms  (full {t_full:.1f}; "
          f"preproc/pad/unpad = remainder)")


if __name__ == "__main__":
    main()
