#!/usr/bin/env python3
"""Per-stage GMFlow profile at the production 810x1440 bidir config.

Attributes the step time to backbone / transformer / matching / propagation /
upsample so perf work aims at the real bound. Run alone (one TPU owner)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import gmflow as jgm
from prisma_tpu.ops import nn as pnn
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
    h, w = 816, 1440  # /16-padded production shape
    params = jax.device_put(cast_params(
        jgm.init_params(jax.random.key(2)), jnp.bfloat16))
    cfg = jgm.GMFlowConfig()
    rng = np.random.default_rng(0)
    i1 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))
    i2 = jax.device_put(rng.uniform(0, 255, (pairs, h, w, 3)).astype(np.float32))

    @jax.jit
    def full(params, a, b):
        return jgm.infer_pairs(params, a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16), cfg)

    t = timeit(full, params, i1, i2)
    print(f"full step ({pairs} pairs): {t*1e3:.1f} ms  "
          f"-> {pairs / t:.1f} pair-fps")

    B = pairs
    H1, W1 = h // 8, w // 8
    f0 = jax.device_put(rng.normal(size=(B, H1, W1, 128)).astype(jnp.bfloat16))
    f1 = jax.device_put(rng.normal(size=(B, H1, W1, 128)).astype(jnp.bfloat16))
    imgs = jax.device_put(
        rng.normal(size=(2 * B, h, w, 3)).astype(jnp.bfloat16))

    @jax.jit
    def bb(p, x):
        return jgm.backbone_forward(p["backbone"], x)

    print(f"backbone (2B={2*B} imgs): {timeit(bb, params, imgs)*1e3:.1f} ms")

    @jax.jit
    def tr(p, a, b):
        return jgm.transformer_forward(p["transformer"], a, b,
                                       cfg.attn_splits, None, cfg.attn_impl)

    print(f"transformer: {timeit(tr, params, f0, f1)*1e3:.1f} ms")

    @jax.jit
    def match(a, b):
        return jgm.global_correlation_softmax_blockwise(a, b, True,
                                                        cfg.key_chunk)

    print(f"matching (bidir): {timeit(match, f0, f1)*1e3:.1f} ms")

    flow = jax.device_put(
        rng.normal(size=(2 * B, H1, W1, 2)).astype(np.float32))
    pf = jnp.concatenate([f0, f1], axis=0)

    @jax.jit
    def prop(p, feat, fl):
        return jgm.flow_propagation(p["flow_attn"], feat, fl, cfg.key_chunk)

    print(f"propagation (2B): {timeit(prop, params, pf, flow)*1e3:.1f} ms")

    @jax.jit
    def ups(p, feat, fl):
        concat = jnp.concatenate([fl.astype(feat.dtype), feat], axis=-1)
        y = jax.nn.relu(pnn.conv2d(p["upsampler"]["conv1"], concat, padding=1))
        mask = pnn.conv2d(p["upsampler"]["conv2"], y)
        return jgm.convex_upsample(fl, mask)

    print(f"upsample (2B): {timeit(ups, params, pf, flow)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
