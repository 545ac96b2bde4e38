"""RAFT optical flow, TPU-native.

Parity target: the reference's vendored RAFT (`bands/raft/raft.py:24-146`,
`corr.py`, `update.py`, `extractor.py`): BasicEncoder features (instance norm)
and context (batch norm, eval), all-pairs correlation with a 4-level pyramid and
radius-4 bilinear window lookup, SepConvGRU iterative refinement, 9-tap convex
upsampling; fwd+bwd flow in one doubled batch (`flow_raft.py:105-107`).

TPU-first design choices:
- the refinement loop is a `lax.scan` (compiles once, not 20 unrolled copies);
- convex upsample + mask head run ONCE after the scan (test-mode output only
  depends on the final iteration — numerically identical, 20x less mask work);
- correlation offers two exact implementations: the materialized [HW, HW]
  volume (default — one MXU matmul, scalar window gathers; fastest on TPU at
  the pipeline's working sizes) and a FUSED lookup (alt_cuda_corr equivalent,
  SURVEY.md §2.9 #6: pooling/bilinear-sampling commute with the feature dot
  product, so windows are computed on the fly from a pooled fmap2 pyramid —
  O(HW) memory for beyond-volume resolutions);
- norms are folded: eval-mode BatchNorm becomes a per-channel affine baked at
  weight-conversion time; InstanceNorm (no affine in torch) is computed inline.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _relu(x):
    """jnp.maximum form: jax.nn.relu is a custom_jvp closed_call, and JAX
    0.9's lowering cache KeyErrors on closed_calls when a pallas_call sits
    in the same jaxpr (hit via corr_impl='volume_pallas')."""
    return jnp.maximum(x, 0)

from prisma_tpu.ops import nn as pnn
from prisma_tpu.ops.resize import resize2d


@dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 20


# ---------------------------------------------------------------------------
# Encoder (BasicEncoder: 7x7/2 stem + 3 residual stages -> 1/8, output conv)
# ---------------------------------------------------------------------------

def _instance_norm(x, eps=1e-5):
    """Single-pass f32-moment instance norm (same fix as GMFlow's backbone:
    jnp.var's two-pass form re-reads the full-res encoder activations, and
    bf16 partial sums lose the variance to cancellation at HW ~ 3e5)."""
    B, H, W, C = x.shape
    xf = x.reshape(B, H * W, C)
    m1 = jnp.mean(xf, axis=1, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(xf.astype(jnp.float32)), axis=1)
    scale = jax.lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + eps)
    return ((x - m1[:, None, None].astype(x.dtype))
            * scale[:, None, None].astype(x.dtype))


def _apply_norm(p, x, kind: str):
    if kind == "instance":
        return _instance_norm(x)
    if kind == "affine":  # folded eval-mode BatchNorm
        return x * p["scale"] + p["bias"]
    if kind == "none":
        return x
    raise ValueError(kind)


def _norm_relu(p, x, kind: str):
    """relu(norm(x)). (A fused Pallas instance-norm+relu was built and
    measured e2e-neutral here — the XLA norm is already at its HBM roofline,
    0.42 ms at [4, 408, 720, 64]; see ops/pallas/instance_norm.py.)"""
    return _relu(_apply_norm(p, x, kind))


def _resblock(p, x, kind: str, stride: int, precision=None):
    y = _norm_relu(p.get("norm1"), pnn.conv2d(p["conv1"], x,
                   stride=stride, padding=1, precision=precision), kind)
    y = _norm_relu(p.get("norm2"), pnn.conv2d(p["conv2"], y,
                   padding=1, precision=precision), kind)
    if stride != 1:
        x = _apply_norm(p.get("norm3"), pnn.conv2d(p["down"], x, stride=stride,
                        precision=precision), kind)
    return _relu(x + y)


def encoder_forward(p, x, kind: str, precision=None):
    """BasicEncoder: x [B, H, W, 3] in [-1, 1] -> [B, H/8, W/8, out]."""
    x = pnn.conv2d(p["conv1"], x, stride=2, padding=3, precision=precision)
    x = _norm_relu(p.get("norm1"), x, kind)
    for i, stride in enumerate([1, 1, 2, 1, 2, 1]):
        x = _resblock(p["blocks"][i], x, kind, stride, precision)
    return pnn.conv2d(p["conv2"], x, precision=precision)


# ---------------------------------------------------------------------------
# Correlation pyramid + window lookup
# ---------------------------------------------------------------------------

def build_corr_pyramid(fmap1, fmap2, num_levels: int, precision=None):
    """fmaps [B, H, W, C] -> list of [B*H*W, Hl, Wl] volumes (scaled by 1/sqrt(C)).

    The reference (corr.py:50-61) pools the [HW, HW] volume with avg_pool2d
    per level; pooling is linear so it commutes with the feature dot product,
    and each level is computed directly as fmap1 @ avgpool(fmap2) — four MXU
    matmuls (1.33x the level-0 FLOPs) instead of GB-scale f32 reduce-windows
    over the volume (~150 ms/call saved at 1080p x0.75 on v5e). The Python-
    float scale keeps the volumes in the fmap dtype (bf16 in production): a
    jnp.float32 scalar would promote the [HW, HW] volume to f32 and triple
    its HBM footprint.
    """
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C)
    scale = 1.0 / math.sqrt(C)
    pyramid = []
    for f2 in build_fmap_pyramid(fmap2, num_levels):
        h2, w2 = f2.shape[1], f2.shape[2]
        corr = jnp.einsum("bxc,byc->bxy", f1, f2.reshape(B, h2 * w2, C),
                          precision=precision) * scale
        pyramid.append(corr.reshape(B * H * W, h2, w2))
    return pyramid


def build_corr_pyramid_padded(fmap1, fmap2, num_levels: int, precision=None):
    """build_corr_pyramid in the gather-kernel's TRANSPOSED layout: each
    level is [N, Wp, Hp] (W on the sublane axis, H on lanes so the hot
    y-select is a single-lane-tile gather; ops/pallas/raft_window.py). The
    transposition and the Wp/Hp pads happen on the POOLED FMAP — a W-major
    flatten plus zero feature rows/cols (-> exact zero corr entries) — so
    they cost a few extra einsum rows instead of an HBM re-layout of the
    [HW, HW] volume. Returns [(vol [N, Wp, Hp], (Hl, Wl)), ...]."""
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C)
    scale = 1.0 / math.sqrt(C)
    pyramid = []
    for f2 in build_fmap_pyramid(fmap2, num_levels):
        h2, w2 = f2.shape[1], f2.shape[2]
        hp = max(16, h2)
        wp = max(16, -(-w2 // 8) * 8)
        if (hp, wp) != (h2, w2):
            f2 = jnp.pad(f2, ((0, 0), (0, hp - h2), (0, wp - w2), (0, 0)))
        f2t = f2.transpose(0, 2, 1, 3).reshape(B, wp * hp, C)  # W-major
        corr = jnp.einsum("bxc,byc->bxy", f1, f2t,
                          precision=precision) * scale
        pyramid.append((corr.reshape(B * H * W, wp, hp), (h2, w2)))
    return pyramid


def corr_lookup_gk(pyramid, coords, radius: int):
    """corr_lookup via the Pallas gather kernel (ops/pallas/raft_window.py).

    pyramid: [(vol [N, Hp, Wl], (Hl, Wl)), ...] from
    build_corr_pyramid_padded. Same output contract as corr_lookup."""
    from prisma_tpu.ops.pallas.raft_window import window_lookup_gather
    B, H1, W1, _ = coords.shape
    cx = coords[..., 0].reshape(B * H1 * W1)
    cy = coords[..., 1].reshape(B * H1 * W1)
    interp = jax.default_backend() == "cpu"
    out = [window_lookup_gather(vol, cx / (2 ** i), cy / (2 ** i), hw,
                                r=radius, interpret=interp)
           for i, (vol, hw) in enumerate(pyramid)]
    return jnp.concatenate(out, axis=-1).reshape(B, H1, W1, -1)


def _bilinear_gather(vol, x, y):
    """vol [N, H, W] or pre-flattened ([N*H*W], (N, H, W)); x/y [N, K] pixel
    coords -> [N, K], zero outside.

    The gather runs on a 1-D operand with global flat indices. A 1-D array has
    a single possible layout, so XLA cannot insert a layout-converting copy of
    the (GB-sized) corr volume next to the gather. With the natural 2-D form,
    the einsum-produced volume is carried through the lookup scan column-major
    and XLA transposes ALL of it every iteration (~0.5 s/iter at 1080p x0.75,
    measured on v5e) — the transpose happens at most once here, outside the
    loop, when the caller pre-flattens (see forward()).
    """
    if isinstance(vol, tuple):
        flat, (N, H, W) = vol
    else:
        N, H, W = vol.shape
        flat = vol.reshape(N * H * W)
    if N * H * W >= 2 ** 31:
        raise ValueError("corr volume too large for int32 flat indexing; "
                         "use corr_impl='fused'")
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    base = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None]

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = (base + jnp.minimum(jnp.maximum(yi, 0), H - 1) * W
               + jnp.minimum(jnp.maximum(xi, 0), W - 1))
        vals = flat[idx]
        return vals * w * valid

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (corner(x0i, y0i, (1 - fx) * (1 - fy))
            + corner(x0i + 1, y0i, fx * (1 - fy))
            + corner(x0i, y0i + 1, (1 - fx) * fy)
            + corner(x0i + 1, y0i + 1, fx * fy))


def build_fmap_pyramid(fmap2, num_levels: int):
    """Pooled fmap2 pyramid for the fused (memory-efficient) correlation.

    Exactness: avg-pooling and bilinear sampling are linear in fmap2, so
    corr-volume pooling/sampling commutes with the feature dot product:
    sample(avgpool(corr))[p, x] == dot(fmap1[p], sample(avgpool(fmap2))[x]).
    This is the TPU-native equivalent of the reference's alt_cuda_corr
    extension (corr.py:63-91, SURVEY.md §2.9 #6) — no [HW, HW] volume.
    """
    pyr = [fmap2]
    f = fmap2
    for _ in range(num_levels - 1):
        B, h, w, C = f.shape
        f = f[:, : h - h % 2, : w - w % 2]
        f = f.reshape(B, h // 2, 2, w // 2, 2, C).mean(axis=(2, 4))
        pyr.append(f)
    return pyr


def _bilinear_gather_feat(fmap, x, y):
    """fmap [B, H, W, C]; x/y [B, K] -> [B, K, C], zeros outside."""
    B, H, W, C = fmap.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = fmap.reshape(B, H * W, C)

    def corner(xi, yi, wgt):
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))[..., None]
        idx = (jnp.minimum(jnp.maximum(yi, 0), H - 1) * W
               + jnp.minimum(jnp.maximum(xi, 0), W - 1))
        vals = jnp.take_along_axis(flat, idx.astype(jnp.int32)[..., None],
                                   axis=1)
        return vals * wgt * valid

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (corner(x0i, y0i, (1 - fx) * (1 - fy))
            + corner(x0i + 1, y0i, fx * (1 - fy))
            + corner(x0i, y0i + 1, (1 - fx) * fy)
            + corner(x0i + 1, y0i + 1, fx * fy))


def corr_lookup_fused(fmap1, fmap2_pyramid, coords, radius: int,
                      precision=None, tap_chunk: int = 9):
    """Memory-efficient window lookup: per level, gather bilinear feature
    samples of pooled fmap2 and dot with fmap1 on the fly, processing the
    (2r+1)^2 window taps in chunks of `tap_chunk` (peak HBM stays
    O(B * HW * tap_chunk * C) instead of the [HW, HW] volume)."""
    B, H1, W1, C = fmap1.shape
    r = radius
    n = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ox = jnp.repeat(offs, n)   # reference window ordering (x on the slow axis)
    oy = jnp.tile(offs, n)
    n_taps = n * n
    assert n_taps % tap_chunk == 0
    ox = ox.reshape(-1, tap_chunk)
    oy = oy.reshape(-1, tap_chunk)
    cx = coords[..., 0].reshape(B, H1 * W1, 1)
    cy = coords[..., 1].reshape(B, H1 * W1, 1)
    f1 = fmap1.reshape(B, H1 * W1, C) / jnp.sqrt(jnp.float32(C))
    out = []
    for i, f2 in enumerate(fmap2_pyramid):
        cxi = cx / (2 ** i)
        cyi = cy / (2 ** i)

        def chunk_fn(offsets, f2=f2, cxi=cxi, cyi=cyi):
            ox_c, oy_c = offsets
            sx = (cxi + ox_c[None, None, :]).reshape(B, -1)
            sy = (cyi + oy_c[None, None, :]).reshape(B, -1)
            samples = _bilinear_gather_feat(f2, sx, sy)
            samples = samples.reshape(B, H1 * W1, tap_chunk, C)
            return jnp.einsum("bpc,bpkc->bpk", f1, samples,
                              precision=precision)

        chunks = jax.lax.map(chunk_fn, (ox, oy))  # [n_chunks, B, HW, chunk]
        lvl = jnp.moveaxis(chunks, 0, 2).reshape(B, H1 * W1, n_taps)
        out.append(lvl)
    return jnp.concatenate(out, axis=-1).reshape(B, H1, W1, -1)


def _window_patch_lookup(vol, cx, cy, r: int):
    """Bilinear (2r+1)^2 window lookup via one integer patch per pixel.

    vol [N, H, W]; cx/cy [N] continuous window centers. Because every window
    tap is an INTEGER offset from the same center, all taps share one
    fractional part — so the whole window is 4 shifted (2r+1)^2 slices of a
    single (2r+2)^2 integer patch. The patch is fetched with two
    take_along_axis calls: the first slices whole rows (contiguous in W,
    DMA-friendly), the second picks columns from the [N, 2r+2, W] row block.
    This replaces 4*(2r+1)^2 scattered single-element gathers per pixel with
    2r+2 row slices — the latency-bound random HBM access was what made the
    naive formulation ~0.5 s/iteration at 1080p x0.75 on v5e. (A single
    vmapped dynamic_slice per pixel was tried and is 5x SLOWER: XLA lowers
    the {1, 2r+2, 2r+2} slice gather to scattered element loads.)

    Out-of-bounds taps are exact zeros (grid_sample zero-padding semantics,
    reference corr.py bilinear_sampler), enforced by separable validity masks.
    Returns [N, (2r+1)^2] with the x-offset on the SLOW window axis
    (reference channel ordering quirk, corr.py:37-43).
    """
    N, H, W = vol.shape
    n = 2 * r + 1
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, None]
    fy = (cy - y0)[:, None, None]
    xb = x0.astype(jnp.int32) - r   # patch origin
    yb = y0.astype(jnp.int32) - r
    ks = jnp.arange(n + 1, dtype=jnp.int32)
    yi = yb[:, None] + ks[None, :]                    # [N, n+1]
    xi = xb[:, None] + ks[None, :]                    # [N, n+1]
    # (A single (1, n+1, W) block-row gather from an H-padded volume — one
    # descriptor per pixel — was tried and reproducibly faults the v5e
    # runtime; per-row slices below are the fastest working formulation.)
    rows = jnp.take_along_axis(
        vol, jnp.minimum(jnp.maximum(yi, 0), H - 1)[:, :, None], axis=1)                # [N, n+1, W]
    # Pick the x-window from the transposed row block so this gather also
    # reads whole minor-dim slices (one descriptor per (n, x) instead of a
    # latency-bound per-element pick along the strided W axis).
    rows_t = rows.transpose(0, 2, 1)                  # [N, W, n+1(y)]
    patch = jnp.take_along_axis(
        rows_t, jnp.minimum(jnp.maximum(xi, 0), W - 1)[:, :, None], axis=1)               # [N, n+1(x), n+1(y)]
    vy = ((yi >= 0) & (yi < H)).astype(patch.dtype)   # [N, n+1]
    vx = ((xi >= 0) & (xi < W)).astype(patch.dtype)
    pv = patch * vx[:, :, None] * vy[:, None, :]
    fx = fx.astype(patch.dtype)
    fy = fy.astype(patch.dtype)
    win = ((1 - fx) * (1 - fy) * pv[:, :n, :n]
           + fx * (1 - fy) * pv[:, 1:, :n]
           + (1 - fx) * fy * pv[:, :n, 1:]
           + fx * fy * pv[:, 1:, 1:])                 # [N, n(x), n(y)]
    return win.reshape(cx.shape[0], n * n)            # x already slow axis


def _window_onehot_lookup(vol, cx, cy, r: int, precision=None):
    """Bilinear window lookup as two one-hot MXU matmuls (no gathers).

    Same semantics as _window_patch_lookup. Instead of take_along_axis row
    gathers (descriptor-bound on TPU), the (2r+2) patch rows are selected by
    a [N, p, Hl] one-hot matmul against the volume and the x window by a
    second [N, p, Wl] one-hot contraction — the volume streams through the
    MXU sequentially at full HBM bandwidth. Out-of-bounds taps fall out as
    exact zeros (their one-hot rows are all-zero), matching grid_sample
    zero padding. Returns [N, (2r+1)^2], x-offset on the SLOW axis.
    """
    N, H, W = vol.shape
    n = 2 * r + 1
    p = n + 1
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, None]
    fy = (cy - y0)[:, None, None]
    xb = x0.astype(jnp.int32) - r
    yb = y0.astype(jnp.int32) - r
    ks = jnp.arange(p, dtype=jnp.int32)
    yi = yb[:, None] + ks[None, :]                    # [N, p]
    xi = xb[:, None] + ks[None, :]
    oh_y = (yi[:, :, None] == jnp.arange(H)[None, None, :]).astype(vol.dtype)
    rows = jnp.einsum("nkh,nhw->nkw", oh_y, vol, precision=precision)
    oh_x = (xi[:, :, None] == jnp.arange(W)[None, None, :]).astype(vol.dtype)
    patch = jnp.einsum("nyw,nxw->nxy", rows, oh_x, precision=precision)
    fx = fx.astype(patch.dtype)
    fy = fy.astype(patch.dtype)
    win = ((1 - fx) * (1 - fy) * patch[:, :n, :n]
           + fx * (1 - fy) * patch[:, 1:, :n]
           + (1 - fx) * fy * patch[:, :n, 1:]
           + fx * fy * patch[:, 1:, 1:])              # [N, n(x), n(y)]
    return win.reshape(cx.shape[0], n * n)


def _window_onehot_lookup_xf(vol, cx, cy, r: int, precision=None):
    """`_window_onehot_lookup` with the X contraction FIRST and the
    intermediate stored H-minor: the x-selected slab [N, p, Hl] keeps Hl on
    the 128-lane axis (less tile padding than the row-first form's
    [N, p, Wl] at Wl=180->256) and the second (y) one-hot then contracts the
    slab's lanes. Same semantics/quirks; exactness pinned by
    tests/test_raft_parity.py::test_onehot_xfirst_matches."""
    N, H, W = vol.shape
    n = 2 * r + 1
    p = n + 1
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, None]
    fy = (cy - y0)[:, None, None]
    xb = x0.astype(jnp.int32) - r
    yb = y0.astype(jnp.int32) - r
    ks = jnp.arange(p, dtype=jnp.int32)
    yi = yb[:, None] + ks[None, :]                    # [N, p]
    xi = xb[:, None] + ks[None, :]
    oh_x = (xi[:, :, None] == jnp.arange(W)[None, None, :]).astype(vol.dtype)
    cols = jnp.einsum("nxw,nhw->nxh", oh_x, vol, precision=precision)
    oh_y = (yi[:, :, None] == jnp.arange(H)[None, None, :]).astype(vol.dtype)
    patch = jnp.einsum("nxh,nyh->nxy", cols, oh_y, precision=precision)
    fx = fx.astype(patch.dtype)
    fy = fy.astype(patch.dtype)
    win = ((1 - fx) * (1 - fy) * patch[:, :n, :n]
           + fx * (1 - fy) * patch[:, 1:, :n]
           + (1 - fx) * fy * patch[:, :n, 1:]
           + fx * fy * patch[:, 1:, 1:])              # [N, n(x), n(y)]
    return win.reshape(cx.shape[0], n * n)


def pack_pyramid_tail(pyramid):
    """Pack pyramid levels 1..L-1 into ONE row-concatenated volume.

    Returns (level0, packed [N, sum(Hl), W1], dims [(Hl, Wl), ...]) where the
    tail levels' rows are stacked along H (level l's rows start at
    offset_l = sum of previous heights) and zero-padded to W1 on the right.
    Motivation (measured, scripts/profile_raft.py): the small levels'
    per-level one-hot lookups are dominated by their materialized
    intermediates — every [N, p, Hl]/[N, p, Wl] one-hot and row slab pads its
    lane dim to 128 regardless of Hl/Wl, so levels 2-3 cost ~4 ms/iter each
    for <1 ms of volume bytes. One concatenated contraction amortizes those
    fixed-size intermediates across all three levels.
    """
    tail = pyramid[1:]
    W1 = tail[0].shape[2]
    packed = jnp.concatenate(
        [jnp.pad(v, ((0, 0), (0, 0), (0, W1 - v.shape[2]))) for v in tail],
        axis=1)
    return pyramid[0], packed, [v.shape[1:] for v in tail]


def _window_onehot_lookup_packed(packed, dims, cx, cy, r: int,
                                 precision=None):
    """One-hot MXU window lookup over ALL tail levels in one einsum pair.

    packed/dims from pack_pyramid_tail; cx/cy [N] centers in LEVEL-0 coords
    (this routine applies the /2^level scaling itself, level l of `dims`
    being pyramid level l+1). Bit-identical to running
    _window_onehot_lookup per level: each one-hot row has exactly one
    nonzero, rows whose global index would spill into a neighboring level's
    band are masked to no-match, and W-padding columns hold exact zeros, so
    the f32 MXU accumulation sums the same single product plus zeros.
    Returns [N, L_tail * (2r+1)^2], x on the SLOW axis per level (reference
    channel-order quirk, corr.py:37-43).
    """
    N = packed.shape[0]
    Hsum, W1 = packed.shape[1], packed.shape[2]
    n = 2 * r + 1
    p = n + 1
    L = len(dims)
    ks = jnp.arange(p, dtype=jnp.int32)
    oh_y, oh_x, fxs, fys = [], [], [], []
    off = 0
    for li, (Hl, Wl) in enumerate(dims):
        cxl = cx / (2 ** (li + 1))
        cyl = cy / (2 ** (li + 1))
        x0 = jnp.floor(cxl)
        y0 = jnp.floor(cyl)
        fxs.append((cxl - x0)[:, None, None])
        fys.append((cyl - y0)[:, None, None])
        yi = (y0.astype(jnp.int32) - r)[:, None] + ks[None, :]   # [N, p]
        xi = (x0.astype(jnp.int32) - r)[:, None] + ks[None, :]
        # rows outside this level's band must NOT match a neighboring
        # level's rows: send them to -1 (matches nothing)
        gy = jnp.where((yi >= 0) & (yi < Hl), yi + off, -1)
        oh_y.append((gy[:, :, None]
                     == jnp.arange(Hsum)[None, None, :]).astype(packed.dtype))
        # x padding columns are exact zeros, so xi in [Wl, W1) is harmless
        oh_x.append((xi[:, :, None]
                     == jnp.arange(W1)[None, None, :]).astype(packed.dtype))
        off += Hl
    oh_y = jnp.concatenate(oh_y, axis=1)                 # [N, L*p, Hsum]
    oh_x = jnp.concatenate(oh_x, axis=1)                 # [N, L*p, W1]
    rows = jnp.einsum("nkh,nhw->nkw", oh_y, packed, precision=precision)
    # full cross-product of (x-sel, y-sel) blocks: only the L diagonal
    # blocks are used, but the [N, Lp, Lp] product pads its lanes to 128
    # anyway, making it cheaper than L separate [N, p, p] products
    full = jnp.einsum("nyw,nxw->nxy", rows, oh_x, precision=precision)
    out = []
    for li in range(L):
        patch = full[:, li * p:li * p + p, li * p:li * p + p]
        fx = fxs[li].astype(patch.dtype)
        fy = fys[li].astype(patch.dtype)
        win = ((1 - fx) * (1 - fy) * patch[:, :n, :n]
               + fx * (1 - fy) * patch[:, 1:, :n]
               + (1 - fx) * fy * patch[:, :n, 1:]
               + fx * fy * patch[:, 1:, 1:])             # [N, n(x), n(y)]
        out.append(win.reshape(N, n * n))
    return jnp.concatenate(out, axis=-1)


def corr_lookup_pallas(pyramid, coords, radius: int):
    """corr_lookup via the Pallas one-DMA-per-patch kernel.

    pyramid: (padded_vol [N, Hl+2p, Wl+2p], (Hl, Wl)) pairs, p = 2r+2.
    """
    from prisma_tpu.ops.pallas.raft_lookup import window_lookup
    B, H1, W1, _ = coords.shape
    cx = coords[..., 0].reshape(B * H1 * W1)
    cy = coords[..., 1].reshape(B * H1 * W1)
    interp = jax.default_backend() == "cpu"
    out = [window_lookup(vol, cx / (2 ** i), cy / (2 ** i), hw, r=radius,
                         interpret=interp)
           for i, (vol, hw) in enumerate(pyramid)]
    return jnp.concatenate(out, axis=-1).reshape(B, H1, W1, -1)


_ONEHOT_IMPLS = {True: _window_onehot_lookup, False: _window_patch_lookup,
                 "xf": _window_onehot_lookup_xf}


def corr_lookup(pyramid, coords, radius: int, onehot=False):
    """coords [B, H1, W1, 2] (x, y) -> [B, H1, W1, levels*(2r+1)^2].

    Window-channel ordering matches the reference quirk (corr.py:37-43): the
    meshgrid(dy, dx) stack feeds the sampler's (x, y) split, so the x-offset
    varies over the SLOW window axis. onehot: True (row-first one-hot MXU
    lookup), False (take_along_axis row gathers), "xf" (x-first one-hot,
    H-minor intermediate), or "packed" (row-first one-hot on level 0 + ONE
    einsum pair over the row-concatenated tail levels — bit-identical to
    True and the production default; see pack_pyramid_tail).
    """
    B, H1, W1, _ = coords.shape
    cx = coords[..., 0].reshape(B * H1 * W1)
    cy = coords[..., 1].reshape(B * H1 * W1)
    if onehot == "packed":
        vol0, packed, dims = (pyramid if isinstance(pyramid, tuple)
                              else pack_pyramid_tail(pyramid))
        out = [_window_onehot_lookup(vol0, cx, cy, radius),
               _window_onehot_lookup_packed(packed, dims, cx, cy, radius)]
        return jnp.concatenate(out, axis=-1).reshape(B, H1, W1, -1)
    out = []
    for i, vol in enumerate(pyramid):
        lookup = _ONEHOT_IMPLS[onehot]
        out.append(lookup(vol, cx / (2 ** i), cy / (2 ** i), radius))
    return jnp.concatenate(out, axis=-1).reshape(B, H1, W1, -1)


# ---------------------------------------------------------------------------
# Update block (motion encoder + SepConvGRU + flow head + upsample mask)
# ---------------------------------------------------------------------------

def _motion_encoder(p, flow, corr, precision=None):
    cor = _relu(pnn.conv2d(p["convc1"], corr, precision=precision))
    cor = _relu(pnn.conv2d(p["convc2"], cor, padding=1, precision=precision))
    flo = _relu(pnn.conv2d(p["convf1"], flow, padding=3, precision=precision))
    flo = _relu(pnn.conv2d(p["convf2"], flo, padding=1, precision=precision))
    out = _relu(pnn.conv2d(p["conv"], jnp.concatenate([cor, flo], -1),
                                 padding=1, precision=precision))
    return jnp.concatenate([out, flow], axis=-1)


def _conv_1x5(p, x, precision=None):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(0, 0), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return y + p["b"] if "b" in p else y


def _conv_5x1(p, x, precision=None):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(2, 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return y + p["b"] if "b" in p else y


def _sep_conv_gru(p, h, x, precision=None):
    """z and r share the same [h, x] input, so their convs run as ONE conv
    with concatenated output channels (bit-identical: each output channel is
    an independent dot product) — one pass over the 4x[102,180,384+] hx
    activation per gate pair instead of two. The weight concat is
    loop-invariant and hoisted out of the GRU scan by XLA."""
    C = h.shape[-1]
    for conv, suffix in ((_conv_1x5, "1"), (_conv_5x1, "2")):
        hx = jnp.concatenate([h, x], axis=-1)
        zr_p = {"w": jnp.concatenate([p["convz" + suffix]["w"],
                                      p["convr" + suffix]["w"]], axis=-1),
                "b": jnp.concatenate([p["convz" + suffix]["b"],
                                      p["convr" + suffix]["b"]], axis=-1)}
        zr = jax.nn.sigmoid(conv(zr_p, hx, precision))
        z, r = zr[..., :C], zr[..., C:]
        q = jnp.tanh(conv(p["convq" + suffix],
                          jnp.concatenate([r * h, x], -1), precision))
        h = (1 - z) * h + z * q
    return h


def _motion_encoder_fused(p, flow, corr, precision=None):
    """Motion encoder in THREE device ops — bit-identical outputs.

    Same math as _motion_encoder in fewer, wider device ops (measured on v5e:
    each in-scan conv carries ~0.3-0.8 ms of fixed cost regardless of FLOPs —
    profile_raft_update round-5: convc1 0.49, convf1 0.41, convc2 0.78,
    convf2 0.42, conv 0.55 ms/iter):
    - convc1 (1x1 324->256 on corr) and convf1 (7x7 over the 2-channel flow,
      as a 98-column im2col) contract over DISJOINT inputs, so they run as
      ONE block-diagonal matmul over [corr | flow_cols]: the zero blocks
      contribute exact zeros to the f32 accumulation and the [cor|flo]
      output channel layout is exactly what the next conv expects.
    - convc2 (3x3 256->192 on cor) and convf2 (3x3 128->64 on flo) share
      geometry, so they run as ONE block-diagonal 3x3 conv over the concat
      (update.py:16-26).
    """
    B, H, W, _ = flow.shape
    fp = jnp.pad(flow, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cols = jnp.concatenate([fp[:, i:i + H, j:j + W] for i in range(7)
                            for j in range(7)], axis=-1)
    wc1 = p["convc1"]["w"].reshape(-1, p["convc1"]["w"].shape[-1])  # 324x256
    wf1 = p["convf1"]["w"].reshape(-1, p["convf1"]["w"].shape[-1])  # 98x128
    w1 = jnp.concatenate([
        jnp.concatenate([wc1, jnp.zeros((wc1.shape[0], wf1.shape[1]),
                                        wc1.dtype)], axis=1),
        jnp.concatenate([jnp.zeros((wf1.shape[0], wc1.shape[1]),
                                   wf1.dtype), wf1], axis=1)], axis=0)
    b1 = jnp.concatenate([p["convc1"]["b"], p["convf1"]["b"]])
    z = jnp.concatenate([corr, cols], axis=-1)
    corflo = _relu(jnp.dot(z, w1, precision=precision) + b1)
    wc2, wf2 = p["convc2"]["w"], p["convf2"]["w"]
    cc, co = wc2.shape[2], wc2.shape[3]
    fc, fo = wf2.shape[2], wf2.shape[3]
    w_bd = jnp.concatenate([
        jnp.concatenate([wc2, jnp.zeros(wc2.shape[:2] + (cc, fo),
                                        wc2.dtype)], -1),
        jnp.concatenate([jnp.zeros(wf2.shape[:2] + (fc, co), wf2.dtype),
                         wf2], -1)], axis=2)
    b_bd = jnp.concatenate([p["convc2"]["b"], p["convf2"]["b"]])
    cf = _relu(pnn.conv2d({"w": w_bd, "b": b_bd}, corflo, padding=1,
                          precision=precision))
    out = _relu(pnn.conv2d(p["conv"], cf, padding=1, precision=precision))
    return jnp.concatenate([out, flow], axis=-1)


def _motion_encoder_bd(p, flow, corr, precision=None):
    """Motion encoder with ONLY the geometry-sharing convc2+convf2 fused as a
    block-diagonal 3x3 conv (4 device convs instead of 5) — convc1/convf1
    stay real convs: the im2col/concat forms (_motion_encoder_fused)
    measured 7.0 vs 4.0 ms/iter for the whole update block (ab_raft_gru
    round-5) because the 49-slice cols concat costs more than the conv it
    replaces. Bit-identical: zero off-blocks add exact zeros in f32."""
    cor = _relu(pnn.conv2d(p["convc1"], corr, precision=precision))
    flo = _relu(pnn.conv2d(p["convf1"], flow, padding=3, precision=precision))
    wc2, wf2 = p["convc2"]["w"], p["convf2"]["w"]
    cc, co = wc2.shape[2], wc2.shape[3]
    fc, fo = wf2.shape[2], wf2.shape[3]
    w_bd = jnp.concatenate([
        jnp.concatenate([wc2, jnp.zeros(wc2.shape[:2] + (cc, fo),
                                        wc2.dtype)], -1),
        jnp.concatenate([jnp.zeros(wf2.shape[:2] + (fc, co), wf2.dtype),
                         wf2], -1)], axis=2)
    b_bd = jnp.concatenate([p["convc2"]["b"], p["convf2"]["b"]])
    cf = _relu(pnn.conv2d({"w": w_bd, "b": b_bd},
                          jnp.concatenate([cor, flo], -1), padding=1,
                          precision=precision))
    out = _relu(pnn.conv2d(p["conv"], cf, padding=1, precision=precision))
    return jnp.concatenate([out, flow], axis=-1)


def _gru_fused_prepare(p, inp, hidden_dim: int, precision=None):
    """Split every SepConvGRU conv by input source; hoist the context part.

    The reference GRU conv input (update.py:33-56) is concat(h, inp, motion)
    where `inp` — the context-encoder features — is LOOP-INVARIANT across the
    20 refinement iterations, yet the reference re-contracts it every
    iteration. A conv over a channel-concat equals the sum of convs over the
    parts, so each gate conv splits into three independent contractions and
    the inp one (plus the bias) is computed ONCE here, outside the scan.
    In-loop work per direction drops from two 384-in-channel convs over a
    materialized [N, 384] concat to three concat-free convs over 128/256
    channels (motion->[z|r|q] x-parts, h->[z|r], r*h->q): 1/3 fewer MACs and
    no concat buffer round-trips. Numerics: partial sums round once more than
    the single-conv form (~1 ulp per add); on the f32 parity path only the
    accumulation order changes.
    """
    C = hidden_dim
    D = inp.shape[-1]
    prep = []
    for conv, suffix in ((_conv_1x5, "1"), (_conv_5x1, "2")):
        ws = [p[f"conv{g}{suffix}"]["w"] for g in "zrq"]
        bs = [p[f"conv{g}{suffix}"]["b"] for g in "zrq"]
        w_h_zr = jnp.concatenate([w[:, :, :C] for w in ws[:2]], axis=-1)
        w_h_q = ws[2][:, :, :C]
        w_mot = jnp.concatenate([w[:, :, C + D:] for w in ws], axis=-1)
        w_inp = jnp.concatenate([w[:, :, C:C + D] for w in ws], axis=-1)
        const = conv({"w": w_inp, "b": jnp.concatenate(bs)}, inp, precision)
        prep.append((conv, {"w": w_h_zr}, {"w": w_h_q}, {"w": w_mot}, const))
    return prep


def _sep_conv_gru_fused(prep, h, motion, precision=None):
    """Fused-form SepConvGRU step over `prep` from _gru_fused_prepare."""
    C = h.shape[-1]
    for conv, p_h_zr, p_h_q, p_mot, const in prep:
        x3 = conv(p_mot, motion, precision) + const   # [.., 3C] z|r|q x-parts
        zr = jax.nn.sigmoid(conv(p_h_zr, h, precision) + x3[..., :2 * C])
        z, r = zr[..., :C], zr[..., C:]
        q = jnp.tanh(conv(p_h_q, r * h, precision) + x3[..., 2 * C:])
        h = (1 - z) * h + z * q
    return h


def _gru_fused2_prepare(p, inp, hidden_dim: int, precision=None):
    """Like _gru_fused_prepare, but the h and motion contractions merge into
    ONE pass-A conv over concat(h, motion) -> [z|r|q_x] (the q output block
    carries exact-zero weights on the h rows). Two in-loop convs per
    direction instead of three: on v5e each in-scan conv costs ~0.3 ms fixed,
    which dominates the ~20% extra (zero-block) MACs."""
    C = hidden_dim
    D = inp.shape[-1]
    prep = []
    for conv, suffix in ((_conv_1x5, "1"), (_conv_5x1, "2")):
        wz, wr, wq = (p[f"conv{g}{suffix}"]["w"] for g in "zrq")
        bs = [p[f"conv{g}{suffix}"]["b"] for g in "zrq"]
        w_a = jnp.concatenate([
            jnp.concatenate([wz[:, :, :C], wr[:, :, :C],
                             jnp.zeros_like(wq[:, :, :C])], -1),
            jnp.concatenate([wz[:, :, C + D:], wr[:, :, C + D:],
                             wq[:, :, C + D:]], -1)], axis=2)
        w_inp = jnp.concatenate([w[:, :, C:C + D] for w in (wz, wr, wq)], -1)
        const = conv({"w": w_inp, "b": jnp.concatenate(bs)}, inp, precision)
        prep.append((conv, {"w": w_a}, {"w": wq[:, :, :C]}, const))
    return prep


def _sep_conv_gru_fused2(prep, h, motion, precision=None):
    """Pass-A-form SepConvGRU step over `prep` from _gru_fused2_prepare."""
    C = h.shape[-1]
    for conv, p_a, p_q_h, const in prep:
        hm = jnp.concatenate([h, motion], axis=-1)
        x3 = conv(p_a, hm, precision) + const         # [.., 3C] z|r|q_x
        zr = jax.nn.sigmoid(x3[..., :2 * C])
        z, r = zr[..., :C], zr[..., C:]
        q = jnp.tanh(conv(p_q_h, r * h, precision) + x3[..., 2 * C:])
        h = (1 - z) * h + z * q
    return h


def _flow_head(p, x, precision=None):
    y = _relu(pnn.conv2d(p["conv1"], x, padding=1, precision=precision))
    return pnn.conv2d(p["conv2"], y, padding=1, precision=precision)


def _mask_head(p, net, precision=None):
    y = _relu(pnn.conv2d(p["conv1"], net, padding=1, precision=precision))
    return 0.25 * pnn.conv2d(p["conv2"], y, precision=precision)


def convex_upsample(flow, mask, factor: int = 8):
    """flow [B, H, W, 2], mask [B, H, W, 9*factor^2] -> [B, fH, fW, 2].

    mask channel layout follows the torch view(N, 1, 9, f, f, H, W): channel
    c = (k*f + i)*f + j with k the 3x3 neighbor (row-major), (i, j) the
    subpixel. factor=8 for RAFT/GMFlow, 4 for GMFlow-with-refinement
    (gmflow/gmflow.py:75-90 upsample_flow).
    """
    B, H, W, _ = flow.shape
    f = factor
    m = mask.reshape(B, H, W, 9, f, f)
    # manual softmax: jax.nn.softmax is a custom_jvp closed_call (see _relu)
    m = jnp.exp(m - m.max(axis=3, keepdims=True))
    m = m / m.sum(axis=3, keepdims=True)
    fp = jnp.pad(float(f) * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neighbors = jnp.stack([fp[:, ky:ky + H, kx:kx + W] for ky in range(3)
                           for kx in range(3)], axis=3)  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkij,bhwkc->bhwijc", m, neighbors)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (b, h, i, w, j, c)
    return up.reshape(B, f * H, f * W, 2)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def forward(params, image1, image2, cfg: RAFTConfig = RAFTConfig(),
            iters: int | None = None, precision=None,
            corr_impl: str = "volume", gru_impl: str = "fused", fmaps=None):
    """image1/2: [B, H, W, 3] float in [0, 255], H and W multiples of 8.

    Returns (flow_lowres [B, H/8, W/8, 2], flow_up [B, H, W, 2]) — the
    reference's test_mode outputs (raft.py:143-144).

    corr_impl: 'volume' (materialized [HW, HW] pyramid — one MXU matmul +
    row gathers), 'volume_onehot' (same pyramid, lookup as one-hot MXU
    matmuls — no gather descriptors), or 'fused' (alt_cuda_corr-equivalent
    on-the-fly computation; exact, O(HW) memory, but per-tap feature gathers
    are slow on TPU — use when the volume OOMs).

    gru_impl: 'fused' (default — context contribution hoisted out of the
    scan, concat-free split convs; see _gru_fused_prepare), 'fused2'
    (wider-conv consolidation — measured SLOWER on v5e, kept as the negative
    A/B result) or 'reference' (the concat formulation, numerics oracle).

    fmaps: optional precomputed (fmap1, fmap2) feature maps, letting callers
    with duplicated images in the doubled fwd+bwd batch (infer_pairs) run the
    feature encoder once per unique image.
    """
    iters = cfg.iters if iters is None else iters
    img1 = 2.0 * (image1 / 255.0) - 1.0

    B = image1.shape[0]
    if fmaps is None:
        img2 = 2.0 * (image2 / 255.0) - 1.0
        both = jnp.concatenate([img1, img2], axis=0)
        fm = encoder_forward(params["fnet"], both, "instance", precision)
        fmap1, fmap2 = fm[:B], fm[B:]
    else:
        fmap1, fmap2 = fmaps
    if corr_impl == "fused":
        f2_pyramid = build_fmap_pyramid(fmap2, cfg.corr_levels)
    elif corr_impl == "volume_pallas":
        p = 2 * cfg.corr_radius + 2
        # zero-pad once, OUTSIDE the scan: each in-loop window fetch is then
        # a single in-range 2D-strided DMA (see ops/pallas/raft_lookup.py)
        pyramid = [(jnp.pad(v, ((0, 0), (p, p), (p, p))), v.shape[1:])
                   for v in build_corr_pyramid(fmap1, fmap2, cfg.corr_levels,
                                               precision)]
    elif corr_impl == "volume_gk":
        pyramid = build_corr_pyramid_padded(fmap1, fmap2, cfg.corr_levels,
                                            precision)
    else:
        pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels, precision)
        if corr_impl == "volume_onehot_packed":
            # concatenate the tail levels ONCE, outside the scan (the packed
            # volume is a loop invariant; packing in-loop would re-pad it
            # every iteration)
            pyramid = pack_pyramid_tail(pyramid)

    cnet = encoder_forward(params["cnet"], img1, "affine", precision)
    net = jnp.tanh(cnet[..., :cfg.hidden_dim])
    inp = _relu(cnet[..., cfg.hidden_dim:])
    if gru_impl in ("fused", "fused_me3", "fused_bd"):
        # loop-invariant context contraction, hoisted out of the scan
        gru_prep = _gru_fused_prepare(params["update"]["gru"], inp,
                                      cfg.hidden_dim, precision)
    elif gru_impl == "fused2":
        gru_prep = _gru_fused2_prepare(params["update"]["gru"], inp,
                                       cfg.hidden_dim, precision)

    H8, W8 = fmap1.shape[1], fmap1.shape[2]
    gx, gy = jnp.meshgrid(jnp.arange(W8, dtype=jnp.float32),
                          jnp.arange(H8, dtype=jnp.float32))
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (B, H8, W8, 2))
    dtype = fmap1.dtype

    def step(carry, _):
        net, coords1 = carry
        if corr_impl == "fused":
            corr = corr_lookup_fused(fmap1, f2_pyramid, coords1.astype(jnp.float32),
                                     cfg.corr_radius, precision)
        elif corr_impl == "volume_pallas":
            corr = corr_lookup_pallas(pyramid, coords1, cfg.corr_radius)
        elif corr_impl == "volume_gk":
            corr = corr_lookup_gk(pyramid, coords1, cfg.corr_radius)
        else:
            corr = corr_lookup(pyramid, coords1, cfg.corr_radius,
                               onehot={"volume_onehot": True,
                                       "volume_onehot_xf": "xf",
                                       "volume_onehot_packed": "packed"}.get(
                                           corr_impl, False))
        flow = coords1 - coords0
        me = {"fused2": _motion_encoder_fused,
              "fused_me3": _motion_encoder_fused,
              "fused_bd": _motion_encoder_bd}.get(gru_impl, _motion_encoder)
        motion = me(params["update"]["encoder"], flow.astype(dtype),
                    corr.astype(dtype), precision)
        if gru_impl in ("fused", "fused_me3", "fused_bd"):
            net = _sep_conv_gru_fused(gru_prep, net, motion, precision)
        elif gru_impl == "fused2":
            net = _sep_conv_gru_fused2(gru_prep, net, motion, precision)
        else:
            gru_in = jnp.concatenate([inp, motion], axis=-1)
            net = _sep_conv_gru(params["update"]["gru"], net, gru_in,
                                precision)
        delta = _flow_head(params["update"]["flow_head"], net, precision)
        return (net, coords1 + delta.astype(jnp.float32)), None

    coords0 = coords0.astype(jnp.float32)
    (net, coords1), _ = jax.lax.scan(step, (net, coords0), None, length=iters)

    flow_low = coords1 - coords0
    up_mask = _mask_head(params["update"]["mask"], net, precision)
    flow_up = convex_upsample(flow_low, up_mask.astype(jnp.float32))
    return flow_low, flow_up


def pad_to_multiple(x, multiple: int = 8):
    """Sintel-mode InputPadder (common/flow.py:43-61): centered replicate pad."""
    H, W = x.shape[1], x.shape[2]
    ph = (-H) % multiple
    pw = (-W) % multiple
    top, bottom = ph // 2, ph - ph // 2
    left, right = pw // 2, pw - pw // 2
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="edge")
    return x, (top, bottom, left, right)


def unpad(x, pads):
    top, bottom, left, right = pads
    return x[:, top:x.shape[1] - bottom, left:x.shape[2] - right]


def infer_pairs(params, image1, image2, cfg: RAFTConfig = RAFTConfig(),
                iters: int | None = None, precision=None,
                corr_impl: str = "volume", gru_impl: str = "fused"):
    """Driver-equivalent inference with padding: fwd+bwd in one doubled batch.

    image1/2: [B, H, W, 3] float 0-255 (already scaled by the driver's 0.75).
    Returns (fwd_flow, bwd_flow) at [B, H, W, 2].
    """
    i1, pads = pad_to_multiple(image1)
    i2, _ = pad_to_multiple(image2)
    a = jnp.concatenate([i1, i2], axis=0)
    b = jnp.concatenate([i2, i1], axis=0)
    # the doubled batch holds only 2B unique images — run the feature encoder
    # once per unique image and assemble the fwd/bwd fmaps by concatenation
    # (bit-identical: both the convs and the instance norm are per-sample)
    B = image1.shape[0]
    fm = encoder_forward(params["fnet"], 2.0 * (a / 255.0) - 1.0, "instance",
                         precision)
    e1, e2 = fm[:B], fm[B:]
    fmaps = (fm, jnp.concatenate([e2, e1], axis=0))
    _, flow_up = forward(params, a, b, cfg, iters, precision, corr_impl,
                         gru_impl, fmaps=fmaps)
    flow_up = unpad(flow_up, pads)
    B = image1.shape[0]
    return flow_up[:B], flow_up[B:]


# ---------------------------------------------------------------------------
# Random init (tests; real weights via weights/torch_convert.convert_raft)
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: RAFTConfig = RAFTConfig(),
                dtype=jnp.float32) -> dict:
    rngs = iter(jax.random.split(rng, 128))

    def conv(kh, kw, cin, cout, bias=True):
        p = {"w": (jax.random.normal(next(rngs), (kh, kw, cin, cout))
                   * ((kh * kw * cin) ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def affine(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def encoder(out_dim, kind):
        dims = [(64, 64, 1), (64, 64, 1), (64, 96, 2), (96, 96, 1),
                (96, 128, 2), (128, 128, 1)]
        blocks = []
        for cin, cout, stride in dims:
            b = {"conv1": conv(3, 3, cin, cout), "conv2": conv(3, 3, cout, cout)}
            if kind == "affine":
                b["norm1"] = affine(cout)
                b["norm2"] = affine(cout)
            if stride != 1:
                b["down"] = conv(1, 1, cin, cout)
                if kind == "affine":
                    b["norm3"] = affine(cout)
            blocks.append(b)
        enc = {"conv1": conv(7, 7, 3, 64), "blocks": blocks,
               "conv2": conv(1, 1, 128, out_dim)}
        if kind == "affine":
            enc["norm1"] = affine(64)
        return enc

    cor_planes = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    return {
        "fnet": encoder(256, "instance"),
        "cnet": encoder(cfg.hidden_dim + cfg.context_dim, "affine"),
        "update": {
            "encoder": {
                "convc1": conv(1, 1, cor_planes, 256),
                "convc2": conv(3, 3, 256, 192),
                "convf1": conv(7, 7, 2, 128),
                "convf2": conv(3, 3, 128, 64),
                "conv": conv(3, 3, 256, 126),
            },
            "gru": {f"conv{g}1": conv(1, 5, 256 + 128, 128)
                    for g in "zrq"} | {f"conv{g}2": conv(5, 1, 256 + 128, 128)
                                       for g in "zrq"},
            "flow_head": {"conv1": conv(3, 3, 128, 256),
                          "conv2": conv(3, 3, 256, 2)},
            "mask": {"conv1": conv(3, 3, 128, 256),
                     "conv2": conv(1, 1, 256, 576)},
        },
    }
