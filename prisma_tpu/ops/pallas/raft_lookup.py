"""Pallas TPU kernel for RAFT's bilinear correlation-window lookup.

Reference semantics: bands/raft/corr.py:30-43 + utils.py bilinear_sampler —
for every source pixel, sample a (2r+1)^2 window around its (continuous)
current match position in that pixel's [Hl, Wl] correlation image, bilinear
with zero padding.

Why a kernel: every tap is an integer offset from one shared continuous
center, so the window is 4 shifted slices of one (2r+2)^2 integer patch. XLA
formulations fetch that patch with per-ROW gather descriptors (2r+2 per pixel
per level, ~3M descriptors per GRU iteration at 1080p x0.75) and shuffle
GB-scale row blocks through HBM; the measured cost is ~100 ms per iteration
on v5e. Here each pixel's whole patch is ONE 2D-strided DMA
(vol[n, ys:ys+2r+2, xs:xs+2r+2] -> VMEM output block), issued in bulk and
waited in bulk. The kernel does nothing else — the bilinear blend runs
outside in XLA, where mixed-rank broadcasts are unrestricted (Mosaic rejects
non-32-bit minor-dim inserts and several shape casts).

The volume must be zero-padded by 2r+2 on all four image sides (done once,
outside the iteration loop) and the centers pre-clamped to +-(r+2) past the
image so every DMA start is in range; the clamp only activates where every
tap is already out of bounds, which the validity masks zero exactly.

STATUS: exact in interpret mode (tests) and on CPU, but BLOCKED on the v5e
by Mosaic DMA alignment: HBM slice starts/sizes on the sublane dim must be
multiples of 8 ("Failed to prove that a tile index in dimension 1 is
divisible by the tiling (8)") and lane-dim slices would need 128, which
forces full-width row fetches and erases the descriptor win. Revisit when
Mosaic supports unaligned 2D DMA slices; until then corr_impl='volume'
(models/raft.py) is the production path. Other pitfalls hit along the way,
for the next attempt: jnp.clip/jax.nn.relu/jax.nn.softmax are custom_jvp
closed_calls and KeyError JAX 0.9's lowering cache when a pallas_call sits
in the same scan (use primitive forms); Mosaic rejects minor-dim broadcasts
on bf16 and several rank-changing shape casts inside kernels (keep kernels
DMA-only, blend outside).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256  # pixels per grid step; rank-1 blocks must be multiples of 128


ROWS = 16  # DMA slice sublane dim must be 8-aligned (p=10 is not)


def _fetch_kernel(yb_ref, xb_ref, vol_ref, out_ref, sems, *, p: int,
                  blk: int):
    gid = pl.program_id(0)

    def dma(i):
        return pltpu.make_async_copy(
            vol_ref.at[gid * blk + i, pl.ds(yb_ref[i], ROWS),
                       pl.ds(xb_ref[i], p)],
            out_ref.at[i], sems.at[i])

    def issue(i, _):
        dma(i).start()
        return 0

    jax.lax.fori_loop(0, blk, issue, 0)

    def wait(i, _):
        dma(i).wait()
        return 0

    jax.lax.fori_loop(0, blk, wait, 0)


def window_lookup(padded_vol, cx, cy, hw, r: int = 4, interpret: bool = False):
    """padded_vol [N, H+2p, W+2p] (p = 2r+2 zero pad on every image side),
    cx/cy [N] continuous centers in UNPADDED coords, hw = (H, W) static.
    Returns [N, (2r+1)^2] with the x-offset on the SLOW window axis
    (reference channel-order quirk, corr.py:37-43).
    """
    H, W = hw
    N = padded_vol.shape[0]
    n = 2 * r + 1
    p = n + 1
    # minimum/maximum instead of jnp.clip: clip's closed_call jaxpr trips a
    # lowering-cache KeyError when this runs inside lax.scan with pallas_call
    cx = jnp.minimum(jnp.maximum(cx, -(r + 2.0)), W + r * 1.0)
    cy = jnp.minimum(jnp.maximum(cy, -(r + 2.0)), H + r * 1.0)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, None]
    fy = (cy - y0)[:, None, None]
    xb = x0.astype(jnp.int32) - r
    yb = y0.astype(jnp.int32) - r

    pad_n = (-N) % BLK
    yb_k = jnp.pad(yb, (0, pad_n)) if pad_n else yb
    xb_k = jnp.pad(xb, (0, pad_n)) if pad_n else xb
    # extra bottom rows so the 16-row (8-aligned) DMA slice stays in range
    vol_k = jnp.pad(padded_vol, ((0, pad_n), (0, ROWS - p), (0, 0)))
    npad = N + pad_n

    patch = pl.pallas_call(
        functools.partial(_fetch_kernel, p=p, blk=BLK),
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BLK, ROWS, p), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, ROWS, p), padded_vol.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((BLK,))],
        interpret=interpret,
    )(yb_k + p, xb_k + p, vol_k)[:N, :p]              # [N, p(y), p(x)]

    ks = jnp.arange(p, dtype=jnp.int32)
    yi = yb[:, None] + ks[None, :]
    xi = xb[:, None] + ks[None, :]
    vy = ((yi >= 0) & (yi < H)).astype(patch.dtype)
    vx = ((xi >= 0) & (xi < W)).astype(patch.dtype)
    pv = patch * vy[:, :, None] * vx[:, None, :]
    fx = fx.astype(patch.dtype)
    fy = fy.astype(patch.dtype)
    win = ((1 - fx) * (1 - fy) * pv[:, :n, :n]
           + fx * (1 - fy) * pv[:, :n, 1:]
           + (1 - fx) * fy * pv[:, 1:, :n]
           + fx * fy * pv[:, 1:, 1:])                 # [N, n(y), n(x)]
    return win.transpose(0, 2, 1).reshape(N, n * n)   # x on slow axis
