#!/usr/bin/env python3
"""A/B: in-scan RAFT update convs as conv_general_dilated vs shifted-slice
matmul taps (y = sum_k shift_k(x) @ W_k, f32 accumulation).

Motivation: the compiled while body shows ~18 layout copies/iter around the
13 convs ([4,102,180,C] relaid to [102,32,23,C] conv partitions), and the
measured per-conv cost (~0.3-0.8 ms) is 3-5x its FLOP/traffic floor. Plain
dots over the channel dim need no spatial relayout — if they win standalone,
reformulate the whole update block. Run alone — one TPU owner.
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

T = 20


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def scan20(body):
    @jax.jit
    def run(p, x0):
        def step(x, _):
            return body(p, x), None
        out, _ = jax.lax.scan(step, x0, None, length=T)
        return out
    return run


def tap_conv(w, b, x, pad_h, pad_w):
    """Conv as shifted-slice dots: w [kh, kw, cin, cout], x [B, H, W, cin]."""
    kh, kw, cin, cout = w.shape
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            part = jax.lax.dot_general(
                xp[:, dy:dy + H, dx:dx + W], w[dy, dx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = acc.astype(x.dtype)
    return y + b if b is not None else y


def tap_conv_unfold_w(w, b, x, pad_h, pad_w):
    """W-taps concatenated into channels (one dot per H-tap)."""
    kh, kw, cin, cout = w.shape
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    wide = jnp.concatenate([xp[:, :, dx:dx + W] for dx in range(kw)], -1)
    wmat = w.transpose(0, 1, 2, 3).reshape(kh, kw * cin, cout)
    acc = None
    for dy in range(kh):
        part = jax.lax.dot_general(
            wide[:, dy:dy + H], wmat[dy], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y = acc.astype(x.dtype)
    return y + b if b is not None else y


def main():
    cfg = jraft.RAFTConfig()
    params = jax.device_put(cast_params(
        jraft.init_params(jax.random.key(0)), jnp.bfloat16))
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    Bb, H8, W8 = 4, 102, 180
    mk = lambda c: jax.device_put(
        rng.standard_normal((Bb, H8, W8, c)).astype(dtype))
    c256 = mk(256)
    c128 = mk(128)

    enc = params["update"]["encoder"]
    gru = params["update"]["gru"]

    def consume(x, y):
        return x + jnp.mean(y, -1, keepdims=True).astype(x.dtype) * 1e-3

    from prisma_tpu.ops import nn as pnn

    # --- convc2 3x3 256->192 ---
    t = timeit(scan20(lambda p, x: consume(
        x, pnn.conv2d(enc["convc2"], x, padding=1))), params, c256)
    print(f"convc2 conv_general:   {t/T*1e3:.2f} ms/iter")
    t = timeit(scan20(lambda p, x: consume(
        x, tap_conv(enc["convc2"]["w"], enc["convc2"]["b"], x, 1, 1))),
        params, c256)
    print(f"convc2 tap-dot 9x:     {t/T*1e3:.2f} ms/iter")
    t = timeit(scan20(lambda p, x: consume(
        x, tap_conv_unfold_w(enc["convc2"]["w"], enc["convc2"]["b"],
                             x, 1, 1))), params, c256)
    print(f"convc2 unfoldW 3-dot:  {t/T*1e3:.2f} ms/iter")

    # --- GRU horizontal 1x5 128->384 (motion part) ---
    w15 = jnp.concatenate([gru[f"conv{g}1"]["w"][:, :, 256:] for g in "zrq"],
                          -1)  # [1,5,128,384]
    t = timeit(scan20(lambda p, x: consume(
        x, jax.lax.conv_general_dilated(
            x, w15, (1, 1), [(0, 0), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))), params, c128)
    print(f"gru 1x5 conv_general:  {t/T*1e3:.2f} ms/iter")
    t = timeit(scan20(lambda p, x: consume(
        x, tap_conv(w15, None, x, 0, 2))), params, c128)
    print(f"gru 1x5 tap-dot 5x:    {t/T*1e3:.2f} ms/iter")

    # --- GRU vertical 5x1 128->384 ---
    w51 = jnp.concatenate([gru[f"conv{g}2"]["w"][:, :, 256:] for g in "zrq"],
                          -1)  # [5,1,128,384]
    t = timeit(scan20(lambda p, x: consume(
        x, jax.lax.conv_general_dilated(
            x, w51, (1, 1), [(2, 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))), params, c128)
    print(f"gru 5x1 conv_general:  {t/T*1e3:.2f} ms/iter")
    t = timeit(scan20(lambda p, x: consume(
        x, tap_conv(w51, None, x, 2, 0))), params, c128)
    print(f"gru 5x1 tap-dot 5x:    {t/T*1e3:.2f} ms/iter")

    # --- convc1 1x1 324->256 (pure dot already) ---
    c324 = mk(324)
    t = timeit(scan20(lambda p, x: consume(
        x, pnn.conv2d(enc["convc1"], x))), params, c324)
    print(f"convc1 conv_general:   {t/T*1e3:.2f} ms/iter")
    t = timeit(scan20(lambda p, x: consume(
        x, tap_conv(enc["convc1"]["w"], enc["convc1"]["b"], x, 0, 0))),
        params, c324)
    print(f"convc1 tap-dot 1x:     {t/T*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
