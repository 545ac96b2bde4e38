"""Pallas TPU kernel: RAFT bilinear correlation-window lookup, gather-based.

Reference semantics: bands/raft/corr.py:30-43 + utils.py bilinear_sampler —
for every source pixel, bilinearly sample a (2r+1)^2 window around its
continuous match center in that pixel's private [Hl, Wl] correlation plane,
zero outside the plane, x-offset on the SLOW output axis.

Why a kernel (docs/raft_roofline.md): the XLA one-hot MXU formulation is at
83% of ITS HBM roofline, but that roofline includes ~2.4 GB/iter (level 0)
of one-hot operands and row-slab intermediates that exist only because XLA
materializes between einsums. Fusing the whole lookup keeps every
intermediate in VMEM; the HBM traffic drops to the volume bytes alone
(~7 ms/iter across all four levels vs 13.3 measured for onehot).

Unlike the one-DMA-per-patch attempt (raft_lookup.py, blocked on Mosaic DMA
alignment + a structural ~300k descriptors/iter floor), this kernel streams
the volume through VMEM in [BLK, H, W] blocks and selects taps with
`tpu.dynamic_gather` (jnp.take_along_axis inside the kernel):

  1. x-select: one lane gather over W on the [BLK*H, W] view — every output
     lane l < 2r+2 is tap column clip(xb+l) of its row.
  2. a [BLK, H, 16] -> [BLK, 16, H] minor-dim transpose (16 = padded 2r+2).
  3. y-select: one lane gather over H (H pads to a multiple of 8 so the
     [BLK, 16, H] -> [BLK*16, H] view is a clean tile merge; H <= 128 keeps
     this gather within one lane tile).
  4. bilinear blend of the [BLK, p, p] integer patch with separable validity
     masks (out-of-bounds taps are exact zeros), f32 accumulation.

The volume must come with H already padded to a multiple of 8 — pad the
POOLED FMAP rows before the correlation matmul (zero features -> exact zero
corr rows) so the pad costs no extra HBM pass; see
raft.build_corr_pyramid(pad_rows_to=8).

Known-good per CLAUDE.md pitfalls: primitive min/max only (no jnp.clip —
custom_jvp closed_call breaks in-scan lowering caches), no in-kernel int
div/mod, broadcasts built in 32-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_kernel(vol_ref, xb_ref, yb_ref, fx_ref, fy_ref, out_ref, *,
                   h: int, w: int, r: int, gather_dtype):
    """One block of BLK pixels; vol_ref [BLK, Hp, W] (Hp % 8 == 0)."""
    n = 2 * r + 1
    p = n + 1
    blk, hp, wp = vol_ref.shape                          # physical (padded)

    v = vol_ref[...]
    if v.dtype != gather_dtype:
        v = v.astype(gather_dtype)
    xb = xb_ref[...]                                     # [BLK, 1] i32
    yb = yb_ref[...]

    # -- 1. x-select: lane gather over W ------------------------------------
    li = lax.broadcasted_iota(jnp.int32, (blk, hp, wp), 2)
    idx = xb.reshape(blk, 1, 1) + jnp.minimum(li, p - 1)
    idx = jnp.minimum(jnp.maximum(idx, 0), w - 1)        # clip to LOGICAL w
    cols = jnp.take_along_axis(v.reshape(blk * hp, wp),
                               idx.reshape(blk * hp, wp), axis=1)
    cols = cols.reshape(blk, hp, wp)[:, :, :16]          # [BLK, Hp, 16]

    # -- 2. swap the tap axis in front of H ---------------------------------
    colsT = jnp.swapaxes(cols, 1, 2)                     # [BLK, 16, Hp]

    # -- 3. y-select: lane gather over H (single lane tile) -----------------
    li2 = lax.broadcasted_iota(jnp.int32, (blk, 16, hp), 2)
    idx2 = yb.reshape(blk, 1, 1) + jnp.minimum(li2, p - 1)
    idx2 = jnp.minimum(jnp.maximum(idx2, 0), h - 1)
    patch = jnp.take_along_axis(colsT.reshape(blk * 16, hp),
                                idx2.reshape(blk * 16, hp), axis=1)
    patch = patch.reshape(blk, 16, hp)[:, :p, :p]        # [BLK, p(x), p(y)]
    patch = patch.astype(jnp.float32)

    # -- 4. validity masks + bilinear blend (f32) ----------------------------
    xt = lax.broadcasted_iota(jnp.int32, (blk, p, p), 1)
    yt = lax.broadcasted_iota(jnp.int32, (blk, p, p), 2)
    xi = xb.reshape(blk, 1, 1) + xt
    yi = yb.reshape(blk, 1, 1) + yt
    valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
    pv = jnp.where(valid, patch, jnp.float32(0))

    fx = fx_ref[...].reshape(blk, 1, 1).astype(jnp.float32)
    fy = fy_ref[...].reshape(blk, 1, 1).astype(jnp.float32)
    win = ((1 - fx) * (1 - fy) * pv[:, :n, :n]
           + fx * (1 - fy) * pv[:, 1:, :n]
           + (1 - fx) * fy * pv[:, :n, 1:]
           + fx * fy * pv[:, 1:, 1:])                    # [BLK, n(x), n(y)]
    win = win.astype(out_ref.dtype)

    # row-major [n(x), n(y)] == the reference's x-slow channel order;
    # 9 static lane-offset stores sidestep the 9->81 sublane/lane remerge
    for j in range(n):
        out_ref[:, pl.ds(j * n, n)] = win[:, j, :]


def window_lookup_gather(vol, cx, cy, hw, r: int = 4, blk: int = 32,
                         gather_dtype=None, interpret: bool = False):
    """Bilinear (2r+1)^2 window lookup. vol [N, Hp, Wp] with Hp % 8 == 0,
    Hp >= max(hw[0], 16) and Wp >= max(hw[1], 16) (pad rows/cols are never
    selected); cx/cy [N] continuous centers in this level's coords;
    hw = (H, W) logical dims. Returns [N, (2r+1)^2], x-offset slow, zeros
    outside — same contract as raft._window_onehot_lookup."""
    N, hp, wp = vol.shape
    h, w = hw
    assert hp % 8 == 0 and hp >= max(h, 16) and wp >= max(w, 16)
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

    kern = functools.partial(
        _window_kernel, h=h, w=w, r=r,
        gather_dtype=gather_dtype or vol.dtype)
    out = pl.pallas_call(
        kern,
        grid=(npad // blk,),
        in_specs=[
            pl.BlockSpec((blk, hp, wp), lambda i: (i, 0, 0),
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
    return out[:N]
