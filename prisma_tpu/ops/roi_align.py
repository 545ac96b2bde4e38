"""ROI Align (aligned=True), TPU-native.

Replaces torchvision's CUDA/C++ `roi_align` on PatchFusion's inference hot path
(SURVEY.md §2.9 #4; used at `patchfusion.py:416-432` and inside UNetv1). For
each ROI and output cell, samples a grid of bilinear taps and averages them —
implemented as one vectorized gather over all ROIs/cells/taps, which XLA lowers
to batched dynamic-slices.

torchvision semantics (aligned=True): roi coords are scaled by spatial_scale
then offset by -0.5; with sampling_ratio <= 0 the tap count per bin is
ceil(roi_size / out_size), which is data-dependent — here the tap count must be
static under jit, so callers pass `sampling_ratio` computed from their static
tile geometry (PatchFusion's tiles have fixed sizes per mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, box_indices,
              output_size: tuple[int, int], spatial_scale: float = 1.0,
              sampling_ratio: int = 2, aligned: bool = True,
              roi_chunk: int | None = None) -> jnp.ndarray:
    """features [B, H, W, C]; boxes [N, 4] as (x1, y1, x2, y2); box_indices [N].

    Returns [N, ph, pw, C].

    roi_chunk: process ROIs in groups of this size via lax.map — the separable
    gather materializes [N, ph*sr, W, C] row intermediates, which for large
    source maps (PatchFusion's 2160x3840 coarse depth) exceeds HBM when all
    ROIs go in one shot; chunking bounds the peak at [chunk, ph*sr, W, C].
    """
    if roi_chunk and boxes.shape[0] > roi_chunk:
        N = boxes.shape[0]
        pad = (-N) % roi_chunk
        b = jnp.pad(boxes.astype(jnp.float32), ((0, pad), (0, 0)))
        bi = jnp.pad(jnp.asarray(box_indices, jnp.int32), (0, pad))
        G = (N + pad) // roi_chunk
        out = jax.lax.map(
            lambda args: roi_align(features, args[0], args[1], output_size,
                                   spatial_scale, sampling_ratio, aligned),
            (b.reshape(G, roi_chunk, 4), bi.reshape(G, roi_chunk)))
        return out.reshape((G * roi_chunk,) + out.shape[2:])[:N]
    ph, pw = output_size
    sr = max(int(sampling_ratio), 1)
    offset = 0.5 if aligned else 0.0
    boxes = boxes.astype(jnp.float32) * spatial_scale - offset

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    # tap positions: for bin i, taps at y1 + (i + (t + 0.5) / sr) * bin
    ty = (jnp.arange(sr) + 0.5) / sr
    gy = y1[:, None, None] + (jnp.arange(ph)[None, :, None]
                              + ty[None, None, :]) * bin_h[:, None, None]
    gx = x1[:, None, None] + (jnp.arange(pw)[None, :, None]
                              + ty[None, None, :]) * bin_w[:, None, None]
    # [N, ph*sr] x [N, pw*sr] sample grid
    gy = gy.reshape(gy.shape[0], -1)
    gx = gx.reshape(gx.shape[0], -1)

    B, H, W, C = features.shape
    feats = features[jnp.asarray(box_indices, jnp.int32)]  # [N, H, W, C]

    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    fy = gy - y0
    fx = gx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def gather_rows(idx):
        valid = ((idx >= 0) & (idx < H)).astype(features.dtype)
        rows = jnp.take_along_axis(
            feats, jnp.clip(idx, 0, H - 1)[:, :, None, None], axis=1)
        return rows * valid[:, :, None, None]

    def gather_cols(rows, idx):
        valid = ((idx >= 0) & (idx < W)).astype(features.dtype)
        cols = jnp.take_along_axis(
            rows, jnp.clip(idx, 0, W - 1)[:, None, :, None], axis=2)
        return cols * valid[:, None, :, None]

    # separable bilinear: gather rows (y), blend; then columns (x), blend
    r0 = gather_rows(y0)
    r1 = gather_rows(y0 + 1)
    rows = r0 * (1 - fy)[:, :, None, None] + r1 * fy[:, :, None, None]
    c0 = gather_cols(rows, x0)
    c1 = gather_cols(rows, x0 + 1)
    vals = c0 * (1 - fx)[:, None, :, None] + c1 * fx[:, None, :, None]
    # vals [N, ph*sr, pw*sr, C] -> average each sr x sr tap block
    N = vals.shape[0]
    vals = vals.reshape(N, ph, sr, pw, sr, C).mean(axis=(2, 4))
    return vals


def _axis_weights(lo, bin_sz, out_sz: int, src_sz: int, sr: int):
    """Per-ROI averaged-bilinear weight matrix for one axis.

    lo/bin_sz [N] (already spatial-scaled and aligned-offset). Returns
    [N, out_sz, src_sz] f32 with W[n, i, s] = (1/sr) * sum over the bin's sr
    taps of that tap's bilinear weight on source index s — exactly the
    gather path's clip+zero semantics (out-of-range taps contribute 0)."""
    grid = jnp.arange(src_sz, dtype=jnp.float32)[None, None, :]
    acc = jnp.zeros((lo.shape[0], out_sz, src_sz), jnp.float32)
    idx = jnp.arange(out_sz, dtype=jnp.float32)[None, :]
    for t in range(sr):
        pos = lo[:, None] + (idx + (t + 0.5) / sr) * bin_sz[:, None]
        p0 = jnp.floor(pos)
        f = (pos - p0)[:, :, None]
        p0 = p0[:, :, None]
        acc = acc + jnp.where(grid == p0, 1.0 - f, 0.0) \
                  + jnp.where(grid == p0 + 1, f, 0.0)
    return acc / sr


def roi_align_mm(features: jnp.ndarray, boxes: jnp.ndarray, box_indices,
                 output_size: tuple[int, int], spatial_scale: float = 1.0,
                 sampling_ratio: int = 2, aligned: bool = True,
                 precision=None) -> jnp.ndarray:
    """roi_align as two MXU matmuls per ROI (axis-aligned boxes only — all
    of PatchFusion's).

    roi_align is linear in `features` and separable, so each ROI is
    out[n] = Wy[n] @ feat[n] @ Wx[n]^T with closed-form averaged-bilinear
    weight matrices. The gather form materializes the full tap grid
    ([N, ph*sr, pw*sr, C] — 400 MB per 8-tile sub-batch at PatchFusion's
    level-0 sr=32) and is descriptor-bound on TPU; this form streams the
    feature map through the MXU instead. Same clip+zero tap semantics;
    numerics differ from the gather path only by f32 summation order.
    """
    ph, pw = output_size
    sr = max(int(sampling_ratio), 1)
    offset = 0.5 if aligned else 0.0
    b = boxes.astype(jnp.float32) * spatial_scale - offset
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    B, H, W, C = features.shape
    wy = _axis_weights(y1, roi_h / ph, ph, H, sr)        # [N, ph, H] f32
    wx = _axis_weights(x1, roi_w / pw, pw, W, sr)        # [N, pw, W] f32
    if features.dtype != jnp.float32:
        wy = wy.astype(features.dtype)
        wx = wx.astype(features.dtype)
    if B == 1:
        rows = jnp.einsum("nph,hwc->npwc", wy, features[0],
                          precision=precision)
    else:
        feats = features[jnp.asarray(box_indices, jnp.int32)]
        rows = jnp.einsum("nph,nhwc->npwc", wy, feats, precision=precision)
    return jnp.einsum("npwc,nqw->npqc", rows, wx, precision=precision)


def roi_align_mm_resized(features: jnp.ndarray, boxes: jnp.ndarray,
                         box_indices, output_size: tuple[int, int],
                         src_hw: tuple[int, int], spatial_scale: float = 1.0,
                         sampling_ratio: int = 2, aligned: bool = True,
                         precision=None) -> jnp.ndarray:
    """roi_align over a bilinear align_corners-resized view of `features`
    (resized to src_hw) WITHOUT materializing the resized map: resize and
    averaged-bilinear ROI sampling are both linear along each axis, so the
    resize matrices fold into the per-ROI weight matrices,
    (Wy @ Rh) @ feat @ (Wx @ Rw)^T. Exactly PatchFusion's
    resize-coarse-depth-to-HR-then-roi quirk (patchfusion.py:384-433) at a
    tiny fraction of the HBM cost (the HR map alone is 132 MB f32 at
    2160x3840). boxes are in src_hw coordinates."""
    from prisma_tpu.ops.resize import _resize_weights
    ph, pw = output_size
    sr = max(int(sampling_ratio), 1)
    offset = 0.5 if aligned else 0.0
    b = boxes.astype(jnp.float32) * spatial_scale - offset
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    B, H, W, C = features.shape
    sh, sw = src_hw
    wy = _axis_weights(y1, roi_h / ph, ph, sh, sr)       # [N, ph, srcH]
    wx = _axis_weights(x1, roi_w / pw, pw, sw, sr)
    rh = jnp.asarray(_resize_weights(H, sh, "linear", True, None))
    rw = jnp.asarray(_resize_weights(W, sw, "linear", True, None))
    wy = jnp.einsum("nps,sh->nph", wy, rh, precision=precision)
    wx = jnp.einsum("nqs,sw->nqw", wx, rw, precision=precision)
    if features.dtype != jnp.float32:
        wy = wy.astype(features.dtype)
        wx = wx.astype(features.dtype)
    if B == 1:
        rows = jnp.einsum("nph,hwc->npwc", wy, features[0],
                          precision=precision)
    else:
        feats = features[jnp.asarray(box_indices, jnp.int32)]
        rows = jnp.einsum("nph,nhwc->npwc", wy, feats, precision=precision)
    return jnp.einsum("npwc,nqw->npqc", rows, wx, precision=precision)
