#!/usr/bin/env python3
"""A/B: GMFlow refine _flow_warp (4 per-pixel row gathers) vs a paired-column
gather (lax.gather slice_sizes (1, 2, C): one descriptor fetches BOTH x taps
of a row — half the descriptors, 2C contiguous bytes each). The warp is
~35 ms of the 512 ms refine pass and gather-descriptor-bound.

NB the CLAUDE.md caveat: big block-row gather slices (1, 10, W) FAULT the
v5e runtime — this probes the small (1, 2, C) shape. Checks numeric
agreement first. Run alone (one TPU owner)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import gmflow as gm


def _flow_warp_pair(feature, flow):
    """Bilinear warp via two paired-column gathers (y0 and y1 rows)."""
    B, H, W, C = feature.shape
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    fx = flow[..., 0].astype(jnp.float32) + gx
    fy = flow[..., 1].astype(jnp.float32) + gy
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # pad BOTH x edges: the pair (x0, x0+1) with x0 == -1 must land on
    # (zero, col 0) — a right-only pad + CLIP would shift the pair
    fp = jnp.pad(feature, ((0, 0), (0, 0), (1, 1), (0, 0)))

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))

    def row_pair(f1, yi, xi):
        # f1 [H, W+1, C]; yi/xi [H, W] -> [H, W, 2, C] (cols xi, xi+1)
        starts = jnp.stack([yi.reshape(-1), xi.reshape(-1)], -1)
        out = jax.lax.gather(
            f1, starts, dnums, slice_sizes=(1, 2, f1.shape[-1]),
            mode=jax.lax.GatherScatterMode.CLIP)
        return out.reshape(H, W, 2, f1.shape[-1])

    out = jnp.zeros_like(feature)
    for dy, wy in ((0, (1 - ay)), (1, ay)):
        yi = y0i + dy
        pair = jax.vmap(row_pair)(fp, yi, x0i + 1)   # [B, H, W, 2, C]
        vx0 = ((x0i >= 0) & (x0i < W) & (yi >= 0) & (yi < H))[..., None]
        vx1 = ((x0i + 1 >= 0) & (x0i + 1 < W) & (yi >= 0)
               & (yi < H))[..., None]
        row = (pair[:, :, :, 0] * (1 - ax) * vx0
               + pair[:, :, :, 1] * ax * vx1)
        out = out + (row * wy).astype(feature.dtype)
    return out.astype(feature.dtype)


def ms(step, args, iters=6):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    rng = np.random.default_rng(0)
    B, H, W, C = 8, 208, 360, 128
    f = jax.device_put(rng.normal(size=(B, H, W, C))
                       .astype(np.float32).astype(jnp.bfloat16))
    flow = jax.device_put((rng.normal(size=(B, H, W, 2)) * 8)
                          .astype(np.float32).astype(jnp.bfloat16))

    a = np.asarray(gm._flow_warp(f, flow), np.float32)
    b = np.asarray(_flow_warp_pair(f, flow), np.float32)
    print(f"max |gather4 - pair| diff: {np.abs(a - b).max():.2e}")

    print(f"gather4 (_flow_warp):  {ms(gm._flow_warp, (f, flow)):6.2f} ms")
    print(f"paired-column gather:  {ms(_flow_warp_pair, (f, flow)):6.2f} ms")


if __name__ == "__main__":
    main()
