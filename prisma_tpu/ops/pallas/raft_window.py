"""Pallas TPU kernel: RAFT bilinear correlation-window lookup, gather-based.

Reference semantics: bands/raft/corr.py:30-43 + utils.py bilinear_sampler —
for every source pixel, bilinearly sample a (2r+1)^2 window around its
continuous match center in that pixel's private [Hl, Wl] correlation plane,
zero outside the plane, x-offset on the SLOW output axis.

Why a kernel (docs/raft_roofline.md): the XLA one-hot MXU formulation is at
83% of ITS HBM roofline, but that roofline includes ~2.4 GB/iter (level 0)
of one-hot operands and row-slab intermediates that exist only because XLA
materializes between einsums. Fusing the whole lookup keeps every
intermediate in VMEM; the HBM traffic drops to the volume bytes alone.

Unlike the one-DMA-per-patch attempt (raft_lookup.py, blocked on Mosaic DMA
alignment + a structural ~300k descriptors/iter floor), this kernel streams
the volume through VMEM in [BLK, Wp, Hp] blocks (H on the LANE axis) and
selects taps with `tpu.dynamic_gather` (jnp.take_along_axis in-kernel):

  1. y-select: one lane gather over H on the [BLK*Wp, Hp] view — output
     lane l < 2r+2 is tap row clip(yb+l) of its (pixel, w) column. H <= 128
     keeps this single-gather (the hot, volume-sized one).
  2. a [BLK, Wp, 16] -> [BLK, 16, Wp] minor-dim transpose (16 = padded 2r+2).
  3. x-select: lane gather over W on the small [BLK*16, Wp] slab; W may
     exceed one lane tile (e.g. 180 at 1080p x0.75), handled by two
     half-gathers + select (_gather_lanes).
  4. bilinear blend of the [BLK, p, p] integer patch with separable validity
     masks (out-of-bounds taps are exact zeros), f32 accumulation, output
     flattened y-slow (the caller transposes the 81 taps to the reference's
     x-slow order — an [N, 81] XLA pass, ~12 MB).

The volume layout is TRANSPOSED ([N, Wp, Hp], built W-major by
raft.build_corr_pyramid_padded directly from the pooled fmap — no volume
re-layout pass) with Wp a multiple of 8 (clean [BLK, Wp, Hp] -> [BLK*Wp, Hp]
tile merge) and Hp >= 16 (the tap-slab lane slice).

Mosaic constraints found by bisection on the v5e (scripts/probe_* history):
  - tpu.dynamic_gather lane extent must fit ONE lane tile (<= 128); larger
    extents crash the compiler subprocess (HTTP 500), hence _gather_lanes.
  - the gather operand must be 32-bit: bf16 gathers crash the same way, but
    a bf16 -> f32 astype FEEDING the gather is fine (and free vs HBM).
  - per CLAUDE.md: primitive min/max only (no jnp.clip), no in-kernel int
    div/mod, broadcasts built in 32-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_lanes(x, idx, extent: int):
    """take_along_axis(x, idx, axis=1) for lane extents beyond one tile.

    x [S, L], idx [S, L] pre-clipped to [0, extent). Returns
    [S, min(L, 128)] — output lane l is x[s, idx[s, l]]; only the first
    2r+2 tap lanes are consumed downstream. Mosaic's dynamic_gather
    requires idx.shape == operand.shape and a single 128-lane tile, so for
    128 < L <= 256 gather the two (overlapping) 128-lane halves with the
    front 128 columns of idx and select per element."""
    S, L = x.shape
    if extent <= 128:
        return jnp.take_along_axis(x, idx, axis=1)
    if L > 256:
        raise NotImplementedError(
            f"lane extent {L} > 256; chunk the gather further")
    s_hi = L - 128
    idx = idx[:, :128]
    lo = jnp.take_along_axis(x[:, :128],
                             jnp.minimum(idx, 127), axis=1)
    hi = jnp.take_along_axis(x[:, s_hi:],
                             jnp.maximum(idx - s_hi, 0), axis=1)
    return jnp.where(idx < 128, lo, hi)


def _window_kernel(vol_ref, xb_ref, yb_ref, fx_ref, fy_ref, out_ref, *,
                   h: int, w: int, r: int):
    """One block of BLK pixels; vol_ref [BLK, Wp, Hp] (Wp % 8 == 0)."""
    n = 2 * r + 1
    p = n + 1
    blk, wp, hp = vol_ref.shape                          # physical (padded)

    v = vol_ref[...]
    if v.dtype != jnp.float32:
        v = v.astype(jnp.float32)      # dynamic_gather operands must be 32-bit
    xb = xb_ref[...]                                     # [BLK, 1] i32
    yb = yb_ref[...]

    # -- 1. y-select: lane gather over H ------------------------------------
    li = lax.broadcasted_iota(jnp.int32, (blk, wp, hp), 2)
    idx = yb.reshape(blk, 1, 1) + jnp.minimum(li, p - 1)
    idx = jnp.minimum(jnp.maximum(idx, 0), h - 1)        # clip to LOGICAL h
    rows = _gather_lanes(v.reshape(blk * wp, hp),
                         idx.reshape(blk * wp, hp), hp)
    rows = rows.reshape(blk, wp, -1)[:, :, :16]          # [BLK, Wp, 16]

    # -- 2. swap the tap axis in front of W ---------------------------------
    rowsT = jnp.swapaxes(rows, 1, 2)                     # [BLK, 16, Wp]

    # -- 3. x-select: lane gather over W ------------------------------------
    li2 = lax.broadcasted_iota(jnp.int32, (blk, 16, wp), 2)
    idx2 = xb.reshape(blk, 1, 1) + jnp.minimum(li2, p - 1)
    idx2 = jnp.minimum(jnp.maximum(idx2, 0), w - 1)
    patch = _gather_lanes(rowsT.reshape(blk * 16, wp),
                          idx2.reshape(blk * 16, wp), wp)
    patch = patch.reshape(blk, 16, -1)[:, :p, :p]        # [BLK, p(y), p(x)]

    # -- 4. validity masks + bilinear blend (f32) ----------------------------
    yt = lax.broadcasted_iota(jnp.int32, (blk, p, p), 1)
    xt = lax.broadcasted_iota(jnp.int32, (blk, p, p), 2)
    xi = xb.reshape(blk, 1, 1) + xt
    yi = yb.reshape(blk, 1, 1) + yt
    valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
    pv = jnp.where(valid, patch, jnp.float32(0))

    fx = fx_ref[...].reshape(blk, 1, 1).astype(jnp.float32)
    fy = fy_ref[...].reshape(blk, 1, 1).astype(jnp.float32)
    win = ((1 - fx) * (1 - fy) * pv[:, :n, :n]
           + fx * (1 - fy) * pv[:, :n, 1:]
           + (1 - fx) * fy * pv[:, 1:, :n]
           + fx * fy * pv[:, 1:, 1:])                    # [BLK, n(y), n(x)]
    win = win.astype(out_ref.dtype)

    # y-slow flatten; the caller permutes to the reference's x-slow order
    for j in range(n):
        out_ref[:, pl.ds(j * n, n)] = win[:, j, :]


def window_lookup_gather(vol, cx, cy, hw, r: int = 4, blk: int = 32,
                         interpret: bool = False):
    """Bilinear (2r+1)^2 window lookup. vol [N, Wp, Hp] TRANSPOSED (W on the
    sublane axis), Wp % 8 == 0, Wp >= max(hw[1], 16), Hp >= max(hw[0], 16)
    (pad rows/cols are never selected); cx/cy [N] continuous centers in this
    level's coords; hw = (H, W) logical dims. Returns [N, (2r+1)^2],
    x-offset slow, zeros outside — same contract as
    raft._window_onehot_lookup."""
    N, wp, hp = vol.shape
    h, w = hw
    assert wp % 8 == 0 and wp >= max(w, 16) and hp >= max(h, 16)
    n = 2 * r + 1
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0).astype(jnp.float32).reshape(N, 1)
    fy = (cy - y0).astype(jnp.float32).reshape(N, 1)
    xb = (x0.astype(jnp.int32) - r).reshape(N, 1)
    yb = (y0.astype(jnp.int32) - r).reshape(N, 1)

    pad = (-N) % blk
    if pad:
        vol = jnp.pad(vol, ((0, pad), (0, 0), (0, 0)))
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
        yb = jnp.pad(yb, ((0, pad), (0, 0)))
        fx = jnp.pad(fx, ((0, pad), (0, 0)))
        fy = jnp.pad(fy, ((0, pad), (0, 0)))
    npad = N + pad

    kern = functools.partial(_window_kernel, h=h, w=w, r=r)
    out = pl.pallas_call(
        kern,
        grid=(npad // blk,),
        in_specs=[
            pl.BlockSpec((blk, wp, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, n * n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, n * n), vol.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(vol, xb, yb, fx, fy)
    # [N, 81] y-slow -> x-slow (reference channel order); ~12 MB XLA pass
    out = out[:N].reshape(N, n, n)
    return jnp.swapaxes(out, 1, 2).reshape(N, n * n)
