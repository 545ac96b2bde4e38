#!/usr/bin/env python3
"""Per-piece profile of the RAFT update block (motion encoder / fused GRU /
flow head) at the bench shape — each piece in its own 20-iter scan with a
carry data dependency and all channels consumed (CLAUDE.md timing rules).
Run alone — one TPU owner."""
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
    dtype = jnp.bfloat16
    Bb, H8, W8 = 4, 104, 180
    net0 = jax.device_put(rng.standard_normal((Bb, H8, W8, cfg.hidden_dim))
                          .astype(dtype))
    inp = jax.device_put(rng.standard_normal((Bb, H8, W8, cfg.context_dim))
                         .astype(dtype))
    mot0 = jax.device_put(rng.standard_normal((Bb, H8, W8, 128))
                          .astype(dtype))
    n_corr = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    corr0 = jax.device_put(rng.standard_normal((Bb, H8, W8, n_corr))
                           .astype(dtype))
    T = cfg.iters

    def scan20(body):
        @jax.jit
        def run(p, x0):
            def step(x, _):
                return body(p, x), None
            out, _ = jax.lax.scan(step, x0, None, length=T)
            return out
        return run

    # motion encoder only (carry-perturbed corr input, consume via mean fold)
    def me_body(p, x):
        corr = corr0 + jnp.mean(x, -1, keepdims=True)
        flow = x[..., :2]
        m = jraft._motion_encoder(p["update"]["encoder"], flow, corr)
        return x + jnp.mean(m, -1, keepdims=True) * 1e-3

    t = timeit(scan20(me_body), params, mot0)
    print(f"motion encoder: {t/T*1e3:.2f} ms/iter")

    # motion encoder pieces
    from prisma_tpu.ops import nn as pnn

    c256 = jax.device_put(rng.standard_normal((Bb, H8, W8, 256)).astype(dtype))

    def body_c1(p, x):
        y = pnn.conv2d(p["update"]["encoder"]["convc1"],
                       corr0 + jnp.mean(x, -1, keepdims=True).astype(dtype))
        return x + jnp.mean(y, -1, keepdims=True).astype(x.dtype) * 1e-3
    t = timeit(scan20(body_c1), params, mot0)
    print(f"  convc1 1x1 324->256 (incl corr add): {t/T*1e3:.2f} ms/iter")

    def body_c2(p, x):
        y = pnn.conv2d(p["update"]["encoder"]["convc2"], x, padding=1)
        return x + jnp.mean(y, -1, keepdims=True).astype(x.dtype) * 1e-3
    t = timeit(scan20(body_c2), params, c256)
    print(f"  convc2 3x3 256->192: {t/T*1e3:.2f} ms/iter")

    def body_f1(p, x):
        y = pnn.conv2d(p["update"]["encoder"]["convf1"], x[..., :2], padding=3)
        return x + jnp.mean(y, -1, keepdims=True).astype(x.dtype) * 1e-3
    t = timeit(scan20(body_f1), params, mot0)
    print(f"  convf1 7x7 2->128: {t/T*1e3:.2f} ms/iter")

    def body_f2(p, x):
        y = pnn.conv2d(p["update"]["encoder"]["convf2"], x, padding=1)
        return x + jnp.mean(y, -1, keepdims=True).astype(x.dtype) * 1e-3
    t = timeit(scan20(body_f2), params, jax.device_put(
        rng.standard_normal((Bb, H8, W8, 128)).astype(dtype)))
    print(f"  convf2 3x3 128->64: {t/T*1e3:.2f} ms/iter")

    def body_cv(p, x):
        y = pnn.conv2d(p["update"]["encoder"]["conv"], x, padding=1)
        return x + jnp.mean(y, -1, keepdims=True).astype(x.dtype) * 1e-3
    t = timeit(scan20(body_cv), params, c256)
    print(f"  conv 3x3 256->126: {t/T*1e3:.2f} ms/iter")

    # fused GRU only
    def gru_body(p, x):
        prep = jraft._gru_fused_prepare(p["update"]["gru"], inp,
                                        cfg.hidden_dim)
        h = jraft._sep_conv_gru_fused(prep, x, mot0 + jnp.mean(
            x, -1, keepdims=True))
        return h

    t = timeit(scan20(gru_body), params, net0)
    print(f"fused SepConvGRU: {t/T*1e3:.2f} ms/iter")

    # flow head only
    def fh_body(p, x):
        d = jraft._flow_head(p["update"]["flow_head"], x)
        return x + jnp.mean(d, -1, keepdims=True).astype(x.dtype)

    t = timeit(scan20(fh_body), params, net0)
    print(f"flow head: {t/T*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
