"""GMFlow optical flow, TPU-native (the reference's default flow band).

Parity target: the reference's vendored GMFlow (`bands/gmflow/gmflow.py`,
`transformer.py`, `matching.py`, `backbone.py`, `position.py`, config from
`flow_gmflow.py:236-245`): single-scale 1/8 CNN encoder (instance norm),
sine position embedding added inside 2x2 attention splits, 6 swin-style
self+cross transformer blocks (shifted windows on odd layers), global
correlation softmax matching (bidirectional via the transposed correlation),
global flow-propagation self-attention, and RAFT-style convex upsampling.
The 2-scale gmflow_with_refine variant (`refine_config()` / CLI
--num_scales 2) adds the trident-conv 1/4 branch, local correlation
matching (radius 4) over warped features, and local-window propagation
(reference gmflow.py:93-166, matching.py:39-83, trident_conv.py).

TPU-first notes:
- all attention/matching run as batched [L, C] matmuls on the MXU; the
  [B, HW, HW] global-matching softmax is the documented long-context hot spot
  (SURVEY.md §5) — at the 0.75-scaled 1080p default, HW = 180*102 and the
  dense matrix would be ~1.3 GB in f32. Production therefore streams it:
  `matching="blockwise"` (the default) runs matching AND propagation through
  `_attn_blockwise`, an online-softmax lax.scan over key chunks that never
  materializes [B, HW, HW]; `matching="dense"` keeps the materialized oracle
  for parity tests and small inputs;
- fwd+bwd flow share one correlation computation (transpose trick), then one
  doubled batch through propagation and upsampling, matching the reference.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.ops import nn as pnn
from prisma_tpu.models.raft import convex_upsample, pad_to_multiple, unpad

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# swin-window token count at which "auto" switches the windowed attention to
# the Pallas flash kernel. With 512-token blocks + bf16 MXU dots the kernel
# beats the dense path 2x at the 4590-token 1080p windows (1.53 vs 3.1 ms per
# attention call); below ~4k tokens the dense scores fit comfortably and XLA
# fusion wins on dispatch simplicity.
# windows at or above this many tokens run the Pallas flash kernel on TPU.
# Measured points: 4590-token scale-0 windows 1.53 vs 3.1 ms dense; REFINE
# scale-1 1170-token windows (single-block kernel, [1024, 1170, 128]) 9.97 vs
# 15.3 ms dense unshifted and 11.1 vs ~33 ms dense shifted
# (scripts/ab_refine_flash_blocks.py). Below ~1k tokens dense wins (the
# 256-block grid overhead exceeds the score-materialization cost).
_FLASH_MIN_WINDOW_TOKENS = 1024


@dataclass(frozen=True)
class GMFlowConfig:
    feature_channels: int = 128
    num_transformer_layers: int = 6
    attn_splits: int = 2
    ffn_dim_expansion: int = 4
    upsample_factor: int = 8
    # global matching / propagation softmax: "blockwise" streams key chunks
    # (O(HW*chunk) memory, any resolution); "dense" materializes [B, HW, HW]
    matching: str = "blockwise"
    key_chunk: int = 2048
    # swin window attention: "auto" = Pallas flash kernel on TPU for windows
    # >= _FLASH_MIN_WINDOW_TOKENS (4096) tokens — covers the 4590-token
    # 0.75x-1080p production windows, where the 512-block bf16 kernel runs 2x
    # the dense XLA path; dense XLA below. "flash"/"xla" force.
    attn_impl: str = "auto"
    # ---- 2-scale local-correlation refinement (gmflow_with_refine) --------
    # reference gmflow/gmflow.py:75-90 + matching.py:39-83: num_scales=2 adds
    # a 1/4-resolution pass (trident-conv backbone branch) with local window
    # matching (corr radius 4), warped feature1, local-window propagation
    # (radius 1) and x4 convex upsampling. The per-scale lists default to the
    # reference CLI configs ((2,)/(-1,)/(-1,) single-scale; (2, 8)/(-1, 4)/
    # (-1, 1) for refinement, flow_gmflow.py:243-245).
    num_scales: int = 1
    attn_splits_list: tuple | None = None
    corr_radius_list: tuple | None = None
    prop_radius_list: tuple | None = None
    padding_factor: int = 16

    def scale_lists(self):
        """Resolved (attn_splits, corr_radius, prop_radius) per scale."""
        if self.num_scales == 1:
            return ((self.attn_splits_list or (self.attn_splits,)),
                    (self.corr_radius_list or (-1,)),
                    (self.prop_radius_list or (-1,)))
        return ((self.attn_splits_list or (2, 8)),
                (self.corr_radius_list or (-1, 4)),
                (self.prop_radius_list or (-1, 1)))


def refine_config(**overrides) -> GMFlowConfig:
    """The reference gmflow_with_refine configuration (2-scale, x4 upsample,
    /32 padding)."""
    kw = dict(num_scales=2, upsample_factor=4, padding_factor=32)
    kw.update(overrides)
    return GMFlowConfig(**kw)


# ---------------------------------------------------------------------------
# CNN backbone (1/8, instance-norm residual stages)
# ---------------------------------------------------------------------------

def _instance_norm(x, eps=1e-5):
    """Instance norm with single-pass E[x^2]-E[x]^2 stats in f32 over flat HW.

    The mean/var formulation makes XLA chain two reductions with a broadcast
    between them (an extra full pass over the activation); one fused pass
    computing both moments measured 63.7 -> 53.3 ms on the whole 810x1440
    backbone (v5e, 4 images). f32 accumulators: bf16 partial sums lose the
    variance to cancellation at HW ~ 3e5."""
    B, H, W, C = x.shape
    xf = x.reshape(B, H * W, C)
    m1 = jnp.mean(xf, axis=1, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(xf.astype(jnp.float32)), axis=1)
    scale = jax.lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + eps)
    y = (xf - m1[:, None, :].astype(x.dtype)) * scale[:, None, :].astype(x.dtype)
    return y.reshape(B, H, W, C)


def _inorm_relu(x, relu: bool = True):
    """relu(instance_norm(x)). (A fused Pallas instance-norm+relu was built
    and measured e2e-neutral — the XLA norm is already at its HBM roofline;
    see ops/pallas/instance_norm.py.)"""
    y = _instance_norm(x)
    return jax.nn.relu(y) if relu else y


def _resblock(p, x, stride, precision=None):
    y = _inorm_relu(pnn.conv2d(p["conv1"], x, stride=stride, padding=1,
                               precision=precision))
    y = _inorm_relu(pnn.conv2d(p["conv2"], y, padding=1,
                               precision=precision))
    if "down" in p:
        x = _inorm_relu(pnn.conv2d(p["down"], x, stride=stride,
                                   precision=precision), relu=False)
    return jax.nn.relu(x + y)


# --- space-to-depth stage 1 (kept as a measured dead end) -------------------
# Hypothesis: the 64-channel stage-1 convs half-fill the MXU's 128-lane minor
# dimension (isolated conv microbench: 15 TFLOPS at 64ch vs 78 at 256ch), so
# run stage 1 in a 2x2 space-to-depth layout ([H/2, W/2, 64] -> [H/4, W/4,
# 256]) with the kernels EXACTLY relaid out (same multiply-adds, 4x nominal
# FLOPs). Channel order: (phase_y*2 + phase_x)*C + c.
# MEASURED OUTCOME (v5e, 8 images 816x1440, whole backbone, steady state):
# plain 32.0 ms vs s2d 84.6 ms — the relayout LOSES once the convs sit inside
# the fused backbone (XLA's layout assignment handles the narrow stage fine
# after the single-pass instance-norm rewrite removed the copy pathology; the
# 4x nominal FLOPs then dominate). Kept parity-tested for reference; do not
# re-enable without re-measuring the full graph.

def _s2d(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def _instance_norm_s2d(x, C, eps=1e-5):
    """Instance norm over the ORIGINAL (pre-s2d) channels: stats pool the 4
    phase blocks together — the identical value set as the plain layout."""
    B, H, W, PC = x.shape
    xf = x.reshape(B, H * W * 4, C)
    m1 = jnp.mean(xf, axis=1, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(xf.astype(jnp.float32)), axis=1)
    scale = jax.lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + eps)
    y = (xf - m1[:, None, :].astype(x.dtype)) * scale[:, None, :].astype(x.dtype)
    return y.reshape(B, H, W, PC)


def _s2d_kernel3(p):
    """3x3 stride-1 [ci -> co] kernel -> 3x3 [4ci -> 4co] s2d kernel.

    Output row 2i+py tap u lands on s2d row i + (py+u)//2, phase (py+u)%2 —
    each (py, u) maps to a unique slot, so this is a pure relayout."""
    w = p["w"]
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for py in (0, 1):
        for px in (0, 1):
            for u in (-1, 0, 1):
                ay, qy = (py + u) // 2 + 1, (py + u) % 2
                for v in (-1, 0, 1):
                    ax, qx = (px + v) // 2 + 1, (px + v) % 2
                    w2 = w2.at[ay, ax,
                               (qy * 2 + qx) * ci:(qy * 2 + qx + 1) * ci,
                               (py * 2 + px) * co:(py * 2 + px + 1) * co
                               ].set(w[u + 1, v + 1])
    out = {"w": w2}
    if "b" in p:
        out["b"] = jnp.tile(p["b"], 4)
    return out


def _s2d_exit_kernel3(p):
    """3x3 STRIDE-2 [ci -> co] kernel consumed from an s2d input: a 2x2
    [4ci -> co] stride-1 kernel with asymmetric (1, 0) padding (tap u=-1
    reaches s2d row i-1 phase 1; u=0/1 stay on row i)."""
    w = p["w"]
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for u in (-1, 0, 1):
        ay, qy = u // 2 + 1, u % 2
        for v in (-1, 0, 1):
            ax, qx = v // 2 + 1, v % 2
            w2 = w2.at[ay, ax,
                       (qy * 2 + qx) * ci:(qy * 2 + qx + 1) * ci, :
                       ].set(w[u + 1, v + 1])
    out = {"w": w2}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _s2d_down_kernel1(p, ci):
    """1x1 STRIDE-2 [ci -> co] kernel from an s2d input: selects the (0, 0)
    phase block."""
    w = p["w"]
    co = w.shape[3]
    w2 = jnp.zeros((1, 1, 4 * ci, co), w.dtype)
    w2 = w2.at[0, 0, :ci, :].set(w[0, 0])
    out = {"w": w2}
    if "b" in p:
        out["b"] = p["b"]
    return out


def backbone_forward(p, x, precision=None, impl: str = "auto",
                     num_scales: int = 1):
    """x [B, H, W, 3] normalized -> [B, H/8, W/8, C] (num_scales=1), or a
    [low-res 1/8, high-res 1/4] feature list (num_scales=2): layer3 runs at
    stride 1 and a weight-SHARED 3x3 trident conv produces both scales at
    strides (2, 1) (reference backbone.py:59-80 + trident_conv.py — the
    MultiScaleTridentConv is one kernel applied at per-branch strides).

    impl: "plain" (the production path) or "s2d" — the space-to-depth stage-1
    relayout, numerically equivalent (tests/test_gmflow_parity.py) but
    measured 2.6x SLOWER end-to-end on the v5e (see the dead-end note above);
    "auto" resolves to "plain".
    """
    if impl == "auto":
        impl = "plain"
    x = pnn.conv2d(p["conv1"], x, stride=2, padding=3, precision=precision)
    x = _inorm_relu(x)
    if num_scales > 1:
        assert num_scales == 2 and impl != "s2d"
        for i, stride in enumerate([1, 1, 2, 1, 1, 1]):  # layer3 stride 1
            x = _resblock(p["blocks"][i], x, stride, precision)
        x = pnn.conv2d(p["conv2"], x, precision=precision)   # [B, H/4, W/4, C]
        tw = p["trident"]
        hi = pnn.conv2d(tw, x, stride=1, padding=1, precision=precision)
        lo = pnn.conv2d(tw, x, stride=2, padding=1, precision=precision)
        return [lo, hi]  # resolution low -> high (gmflow.py:55-57 reversed)
    if impl != "s2d":
        for i, stride in enumerate([1, 1, 2, 1, 2, 1]):
            x = _resblock(p["blocks"][i], x, stride, precision)
        return pnn.conv2d(p["conv2"], x, precision=precision)

    hs = _s2d(x)  # [B, H/4, W/4, 256]
    for i in (0, 1):  # 64-channel stride-1 resblocks, s2d form
        bp = p["blocks"][i]
        y = jax.nn.relu(_instance_norm_s2d(
            pnn.conv2d(_s2d_kernel3(bp["conv1"]), hs, padding=1,
                       precision=precision), 64))
        y = jax.nn.relu(_instance_norm_s2d(
            pnn.conv2d(_s2d_kernel3(bp["conv2"]), y, padding=1,
                       precision=precision), 64))
        hs = jax.nn.relu(hs + y)

    # block 2 (64 -> 96, stride 2) exits the s2d layout
    bp = p["blocks"][2]
    k = _s2d_exit_kernel3(bp["conv1"])
    y = jax.lax.conv_general_dilated(
        hs, k["w"], (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    if "b" in k:
        y = y + k["b"]
    y = jax.nn.relu(_instance_norm(y))
    y = jax.nn.relu(_instance_norm(pnn.conv2d(bp["conv2"], y, padding=1,
                                              precision=precision)))
    xd = _instance_norm(pnn.conv2d(_s2d_down_kernel1(bp["down"], 64), hs,
                                   precision=precision))
    x = jax.nn.relu(xd + y)

    for i, stride in zip((3, 4, 5), (1, 2, 1)):
        x = _resblock(p["blocks"][i], x, stride, precision)
    return pnn.conv2d(p["conv2"], x, precision=precision)


# ---------------------------------------------------------------------------
# Position embedding (DETR sine, computed in-window)
# ---------------------------------------------------------------------------

def sine_pos_embed(h: int, w: int, num_pos_feats: int = 64,
                   temperature: float = 10000.0) -> np.ndarray:
    """[h, w, 2*num_pos_feats] numpy constant (y-channels then x-channels)."""
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = x_embed[:, :, None] / dim_t
    py = y_embed[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1)


def _split_windows(x, ns: int):
    """[B, H, W, C] -> [B*ns*ns, H/ns, W/ns, C] (row-major split order)."""
    B, H, W, C = x.shape
    x = x.reshape(B, ns, H // ns, ns, W // ns, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * ns * ns, H // ns, W // ns, C)


def _merge_windows(x, ns: int):
    Bk, h, w, C = x.shape
    B = Bk // (ns * ns)
    x = x.reshape(B, ns, ns, h, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, ns * h, ns * w, C)


def add_position(feature0, feature1, attn_splits: int):
    B, H, W, C = feature0.shape
    if attn_splits > 1:
        pos = jnp.asarray(sine_pos_embed(H // attn_splits, W // attn_splits,
                                         C // 2), feature0.dtype)
        f0 = _merge_windows(_split_windows(feature0, attn_splits) + pos, attn_splits)
        f1 = _merge_windows(_split_windows(feature1, attn_splits) + pos, attn_splits)
        return f0, f1
    pos = jnp.asarray(sine_pos_embed(H, W, C // 2), feature0.dtype)
    return feature0 + pos, feature1 + pos


# ---------------------------------------------------------------------------
# Transformer (swin-style single-head self/cross attention)
# ---------------------------------------------------------------------------

def shift_window_region_ids(h: int, w: int, ns: int) -> np.ndarray:
    """[ns*ns, win] int region labels for the shifted-window layers: tokens
    from different pre-shift regions must not attend to each other."""
    wh, ww = h // ns, w // ns
    sh, sw = wh // 2, ww // 2
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[hs, ws] = cnt
            cnt += 1
    return img.reshape(ns, wh, ns, ww).transpose(0, 2, 1, 3).reshape(-1, wh * ww)


@functools.lru_cache(maxsize=None)
def shift_window_region_bands(h: int, w: int, ns: int) -> np.ndarray:
    """[ns*ns, 2] int32 (bh, bw): each window's at-most-one in-window band
    boundary per axis (sentinel = window extent = no boundary), for the
    flash kernel's in-kernel region bias (region_bands/win_w). Of the swin
    region edges {dim-win, dim-shift}, only dim-shift can fall strictly
    inside a window (dim-win is a window start), so the per-window region
    id decomposes as separable >=-band tests — verified here against
    shift_window_region_ids.
    """
    wh, ww = h // ns, w // ns
    ids = shift_window_region_ids(h, w, ns).reshape(ns * ns, wh, ww)
    bands = np.zeros((ns * ns, 2), np.int32)
    for k in range(ns * ns):
        dh = np.nonzero(ids[k, :, 0] != ids[k, 0, 0])[0]
        dw = np.nonzero(ids[k, 0, :] != ids[k, 0, 0])[0]
        bh = int(dh[0]) if dh.size else wh
        bw = int(dw[0]) if dw.size else ww
        bands[k] = (bh, bw)
        hb = (np.arange(wh) >= bh).astype(np.int32)
        wb = (np.arange(ww) >= bw).astype(np.int32)
        sep = hb[:, None] * 2 + wb[None, :]
        same_sep = sep[:, :, None, None] == sep[None, None, :, :]
        same_ids = ids[k][:, :, None, None] == ids[k][None, None, :, :]
        if not np.array_equal(same_sep, same_ids):
            raise ValueError(f"window {k}: region ids are not separable "
                             f"single-boundary bands for ({h},{w},ns={ns})")
    return bands


def shift_window_attn_mask(h: int, w: int, ns: int) -> np.ndarray:
    """[ns*ns, win, win] additive mask (dense-attention path)."""
    win = shift_window_region_ids(h, w, ns)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(q, k, v, h, w, ns: int, ids, precision=None,
                      impl: str = "xla"):
    """Single-head attention in (optionally shifted) ns x ns windows.

    q/k/v: [B, L, C]; ids: [ns*ns, win] region labels or None (None => no
    shift). impl="flash" streams key blocks through VMEM (Pallas) instead of
    materializing the [B*ns*ns, win, win] scores in HBM — the win on the
    production 0.75x-1080p path is 4680 tokens, where the score matrices are
    the HBM bottleneck of the XLA path.
    """
    B, L, C = q.shape
    shifted = ids is not None
    qw = _win_split(q, h, w, ns, shifted)
    kw = _win_split(k, h, w, ns, shifted)
    vw = _win_split(v, h, w, ns, shifted)
    bands_ww = (shift_window_region_bands(h, w, ns), w // ns) if shifted \
        else None
    out = _window_attention_core(qw, kw, vw, B, ids, precision, impl,
                                 bands_ww)
    return _win_merge(out, B, h, w, ns, shifted)


def _win_split(x, h, w, ns: int, shifted: bool):
    """[B, L, C] -> [B*ns*ns, win, C] window tokens (shifted-window roll
    applied first when shifted)."""
    B, L, C = x.shape
    t = x.reshape(B, h, w, C)
    if shifted:
        t = jnp.roll(t, (-(h // ns // 2), -(w // ns // 2)), axis=(1, 2))
    return _split_windows(t, ns).reshape(B * ns * ns, -1, C)


def _win_merge(out, B, h, w, ns: int, shifted: bool):
    """Inverse of _win_split -> [B, h*w, C]."""
    C = out.shape[-1]
    out = _merge_windows(out.reshape(B * ns * ns, h // ns, w // ns, C), ns)
    if shifted:
        out = jnp.roll(out, (h // ns // 2, w // ns // 2), axis=(1, 2))
    return out.reshape(B, h * w, C)


def _window_attention_core(qw, kw, vw, B, ids, precision=None,
                           impl: str = "xla", bands_ww=None):
    """Attention over already-windowed tokens [B*ns*ns, win, C]; ids
    [ns*ns, win] region labels (shifted layers) or None. bands_ww: optional
    (bands [ns*ns, 2], win_w) from shift_window_region_bands — lets the
    flash kernel compute the region bias in-kernel from iota compares
    instead of +128 one-hot qk lanes (2x score-matmul saving at C=128)."""
    C = qw.shape[-1]
    if impl == "flash":
        from prisma_tpu.ops.pallas.flash_attention import flash_attention
        if ids is not None and bands_ww is not None:
            bands, ww = bands_ww
            return flash_attention(qw, kw, vw,
                                   region_bands=jnp.asarray(bands, jnp.int32),
                                   win_w=int(ww))
        idst = None
        if ids is not None:
            idst = jnp.tile(jnp.asarray(ids, jnp.int32), (B, 1))
        return flash_attention(qw, kw, vw, ids=idst)
    scores = jnp.einsum("bnc,bmc->bnm", qw, kw,
                        precision=precision) / (C ** 0.5)
    if ids is not None:
        # additive mask cast to the score dtype: an f32 mask would promote
        # the whole transformer to f32 under bf16 params
        diff = ids[:, None, :] - ids[:, :, None]
        mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
        scores = scores + jnp.tile(jnp.asarray(mask, scores.dtype),
                                   (B, 1, 1))
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", attn, vw, precision=precision)


def _full_attention(q, k, v, precision=None):
    C = q.shape[-1]
    scores = jnp.einsum("bnc,bmc->bnm", q, k, precision=precision) / (C ** 0.5)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", attn, v, precision=precision)


def _layer_norm(p, x, eps=1e-5):
    """Single-pass f32-moment layer norm (same treatment as the backbone's
    instance norm): E[x^2]-E[x]^2 in ONE read of the activation, moments in
    f32 so a bf16 production pass keeps accurate statistics, output cast back
    to the input dtype."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _fused_proj(p, parts):
    """q/k/v projections fused into one matmul over shared inputs
    (bit-identical: each output column is an independent dot; parity tests
    cover both layer kinds) — one pass over the activations instead of
    three, and a 3x-wider MXU tile."""
    f = {"w": jnp.concatenate([p[n]["w"] for n in parts], axis=1)}
    if "b" in p[parts[0]]:  # torch GMFlow projections are bias-free
        f["b"] = jnp.concatenate([p[n]["b"] for n in parts])
    return f


def _sublayer_windowed(p, sw, tw, B, ids, no_ffn, precision=None,
                       impl: str = "xla", bands_ww=None):
    """One attention sublayer over ALREADY-WINDOWED tokens
    [B*ns*ns, win, C] (tw is sw for self-attention). Every op is per-token,
    so running the residual/norm/ffn in window layout and merging once per
    LAYER (transformer_forward) is bit-identical to the flat form — it
    removes the redundant merge->split permutation between the self and
    cross sublayers (two full passes over the [2B, L, C] activation per
    layer at the refine shape)."""
    C = sw.shape[-1]
    if tw is sw:
        qkv = pnn.linear(_fused_proj(p, ("q", "k", "v")), sw,
                         precision=precision)
        q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    else:
        q = pnn.linear(p["q"], sw, precision=precision)
        kv = pnn.linear(_fused_proj(p, ("k", "v")), tw, precision=precision)
        k, v = kv[..., :C], kv[..., C:]
    out = _window_attention_core(q, k, v, B, ids, precision, impl, bands_ww)
    message = _layer_norm(p["norm1"], pnn.linear(p["merge"], out,
                                                 precision=precision))
    if not no_ffn:
        y = jnp.concatenate([sw, message], axis=-1)
        y = pnn.linear(p["mlp2"], pnn.gelu(pnn.linear(p["mlp1"], y,
                                                      precision=precision)),
                       precision=precision)
        message = _layer_norm(p["norm2"], y)
    return sw + message


def _transformer_layer(p, source, target, h, w, ns, ids, no_ffn,
                       precision=None, impl: str = "xla"):
    C = source.shape[-1]
    if ns > 1:
        # window tokens BEFORE projecting: the linear commutes with the
        # token permutation exactly, so the roll+split transpose chain runs
        # once per input tensor instead of once per projected q/k/v
        B = source.shape[0]
        shifted = ids is not None
        sw = _win_split(source, h, w, ns, shifted)
        tw = sw if source is target else _win_split(target, h, w, ns, shifted)
        bands_ww = (shift_window_region_bands(h, w, ns), w // ns) if shifted \
            else None
        out = _sublayer_windowed(p, sw, tw, B, ids, no_ffn, precision, impl,
                                 bands_ww)
        return _win_merge(out, B, h, w, ns, shifted)
    if source is target:
        qkv = pnn.linear(_fused_proj(p, ("q", "k", "v")), source,
                         precision=precision)
        q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    else:
        q = pnn.linear(p["q"], source, precision=precision)
        kv = pnn.linear(_fused_proj(p, ("k", "v")), target,
                        precision=precision)
        k, v = kv[..., :C], kv[..., C:]
    message = _full_attention(q, k, v, precision)
    message = _layer_norm(p["norm1"], pnn.linear(p["merge"], message,
                                                 precision=precision))
    if not no_ffn:
        y = jnp.concatenate([source, message], axis=-1)
        y = pnn.linear(p["mlp2"], pnn.gelu(pnn.linear(p["mlp1"], y,
                                                      precision=precision)),
                       precision=precision)
        message = _layer_norm(p["norm2"], y)
    return source + message


def transformer_forward(params, feature0, feature1, attn_splits: int,
                        precision=None, attn_impl: str = "auto"):
    """6 blocks of (windowed self-attn, cross-attn+ffn) over doubled batch.

    attn_impl: "auto" picks the Pallas flash kernel on TPU for windows of
    >= _FLASH_MIN_WINDOW_TOKENS (4096) tokens; the dense XLA path otherwise.
    """
    B, H, W, C = feature0.shape
    f0 = feature0.reshape(B, H * W, C)
    f1 = feature1.reshape(B, H * W, C)
    ids = shift_window_region_ids(H, W, attn_splits) if attn_splits > 1 \
        else None
    if attn_impl == "auto":
        win_tokens = (H // attn_splits) * (W // attn_splits)
        attn_impl = "flash" if (jax.default_backend() == "tpu"
                                and win_tokens >= _FLASH_MIN_WINDOW_TOKENS) \
            else "xla"

    concat0 = jnp.concatenate([f0, f1], axis=0)
    concat1 = jnp.concatenate([f1, f0], axis=0)
    ns = attn_splits
    for i, bp in enumerate(params["layers"]):
        shifted = i % 2 == 1
        m = ids if (shifted and ns > 1) else None
        if ns > 1:
            # self + cross share the window layout (same shift parity):
            # split once, run both sublayers windowed, merge once
            B2 = concat0.shape[0]
            bands_ww = (shift_window_region_bands(H, W, ns), W // ns) \
                if shifted else None
            sw = _win_split(concat0, H, W, ns, shifted)
            tw = _win_split(concat1, H, W, ns, shifted)
            sw = _sublayer_windowed(bp["self"], sw, sw, B2, m, True,
                                    precision, attn_impl, bands_ww)
            sw = _sublayer_windowed(bp["cross"], sw, tw, B2, m, False,
                                    precision, attn_impl, bands_ww)
            concat0 = _win_merge(sw, B2, H, W, ns, shifted)
        else:
            concat0 = _transformer_layer(bp["self"], concat0, concat0, H, W,
                                         ns, m, True, precision, attn_impl)
            concat0 = _transformer_layer(bp["cross"], concat0, concat1, H, W,
                                         ns, m, False, precision, attn_impl)
        half = concat0.shape[0] // 2
        concat1 = jnp.concatenate([concat0[half:], concat0[:half]], axis=0)
    half = concat0.shape[0] // 2
    return (concat0[:half].reshape(B, H, W, C),
            concat0[half:].reshape(B, H, W, C))


# ---------------------------------------------------------------------------
# Matching + flow propagation + upsample
# ---------------------------------------------------------------------------

def _attn_blockwise(q, k, v, scale: float, key_chunk: int = 2048,
                    precision=None):
    """softmax(q kᵀ · scale) @ v streamed over key chunks — the long-context
    strategy for the O((HW)²) global matching (SURVEY.md §5): never
    materializes [B, N, M]; carries (running max, running denominator, running
    numerator) in f32 through a lax.scan (flash-attention recurrence with the
    coordinate grid / flow as V).

    q [B, N, C]; k [B, M, C]; v [M, Dv] (shared) or [B, M, Dv].
    Returns [B, N, Dv] f32. Matches the materialized softmax to f32 accuracy.
    """
    B, N, C = q.shape
    M = k.shape[1]
    if v.ndim == 2:
        v = jnp.broadcast_to(v[None], (B,) + v.shape)
    Dv = v.shape[-1]
    key_chunk = min(key_chunk, M)
    pad = (-M) % key_chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    nc = (M + pad) // key_chunk
    kc = k.reshape(B, nc, key_chunk, C).transpose(1, 0, 2, 3)
    vc = v.reshape(B, nc, key_chunk, Dv).transpose(1, 0, 2, 3) \
        .astype(jnp.float32)
    validc = (jnp.arange(nc * key_chunk) < M).reshape(nc, key_chunk)

    def body(carry, inp):
        m, den, num = carry
        kcb, vcb, vmask = inp
        s = jnp.einsum("bnc,bmc->bnm", q, kcb,
                       precision=precision).astype(jnp.float32) * scale
        s = jnp.where(vmask[None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        den = den * alpha + jnp.sum(p, axis=-1)
        num = num * alpha[..., None] \
            + jnp.einsum("bnm,bmd->bnd", p, vcb, precision=precision)
        return (m_new, den, num), None

    init = (jnp.full((B, N), -jnp.inf, jnp.float32),
            jnp.zeros((B, N), jnp.float32),
            jnp.zeros((B, N, Dv), jnp.float32))
    (m, den, num), _ = jax.lax.scan(body, init, (kc, vc, validc))
    return num / den[..., None]


def _coords_grid_flat(H: int, W: int):
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    return jnp.stack([gx, gy], axis=-1).reshape(H * W, 2)


def _global_attend(q, k, v, scale: float, key_chunk: int, precision=None):
    """softmax(q kᵀ scale) @ v for the O((HW)²) global matching/propagation.

    On TPU with production precision, uses the Pallas streamed flash kernel
    (ops/pallas/flash_attention.py): the per-chunk [B, N, key_chunk] scores of
    the lax.scan formulation round-trip HBM between the matmul and the exp,
    which measured 28.9 ms (matching) + 30.8 ms (propagation) of the 188 ms
    4-pair step at 810x1440; the kernel keeps score tiles in VMEM.

    v carries pixel coordinates (matching) or flow (propagation) — values up
    to ~1800 that bf16 cannot hold (8-bit mantissa). Rather than an f32 p@v
    matmul (runs at a fraction of the bf16 MXU rate and measured as the
    kernel's dominant cost), v is split v = 128*hi + lo with hi = floor(v/128):
    hi is a small exact integer and lo < 128 carries at most a half-ulp (2^-9
    relative) — both exact for the integer matching grid — and the two halves
    ride the same 128-lane bf16 value block, recombined in f32 outside. The
    kernel accumulates the softmax denominator from the SAME quantized weights
    as the numerator, so peaked attention is exact independent of v's dtype.
    Elsewhere (CPU tests, explicit precision) falls back to the scan, which
    matches the dense softmax to f32 accuracy (and keeps q's dtype, so the
    interpret-mode test path is exact f32).
    """
    if jax.default_backend() == "tpu" and precision is None:
        from prisma_tpu.ops.pallas.flash_attention import \
            flash_attention_streamed
        B, N, C = q.shape
        if v.ndim == 2:
            v = jnp.broadcast_to(v[None], (B,) + v.shape)
        dv = v.shape[-1]
        v_hi = jnp.floor(v / 128.0)
        v_lo = v - v_hi * 128.0
        vp = jnp.concatenate([v_lo, v_hi], axis=-1).astype(q.dtype)
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 128 - 2 * dv)))
        out = flash_attention_streamed(q, k, vp, out_dtype=jnp.float32,
                                       scale=scale)
        return out[..., :dv] + 128.0 * out[..., dv:2 * dv]
    return _attn_blockwise(q, k, v, scale, key_chunk, precision)


def global_correlation_softmax(feature0, feature1, bidir: bool,
                               precision=None):
    """[B, H, W, C] x2 -> flow [B or 2B, H, W, 2] via expected coordinates.

    Materialized [B, HW, HW] variant (reference matching.py:10-36 semantics);
    kept as the parity oracle and for small inputs. Production uses
    global_correlation_softmax_blockwise.
    """
    B, H, W, C = feature0.shape
    f0 = feature0.reshape(B, H * W, C)
    f1 = feature1.reshape(B, H * W, C)
    corr = jnp.einsum("bnc,bmc->bnm", f0, f1, precision=precision) / (C ** 0.5)
    grid = _coords_grid_flat(H, W)
    if bidir:
        corr = jnp.concatenate([corr, corr.transpose(0, 2, 1)], axis=0)
    prob = jax.nn.softmax(corr, axis=-1)
    corresp = jnp.einsum("bnm,mc->bnc", prob, grid, precision=precision)
    flow = corresp.reshape(-1, H, W, 2) - grid.reshape(1, H, W, 2)
    return flow


def global_correlation_softmax_blockwise(feature0, feature1, bidir: bool,
                                         key_chunk: int = 2048,
                                         precision=None):
    """Blockwise-softmax global matching: O(HW · chunk) memory, any
    resolution. The backward direction recomputes the correlation with
    queries/keys swapped (= the reference's transposed-correlation softmax)."""
    B, H, W, C = feature0.shape
    f0 = feature0.reshape(B, H * W, C)
    f1 = feature1.reshape(B, H * W, C)
    grid = _coords_grid_flat(H, W)
    scale = 1.0 / (C ** 0.5)
    corresp = _global_attend(f0, f1, grid, scale, key_chunk, precision)
    if bidir:
        bwd = _global_attend(f1, f0, grid, scale, key_chunk, precision)
        corresp = jnp.concatenate([corresp, bwd], axis=0)
    flow = corresp.reshape(-1, H, W, 2) - grid.reshape(1, H, W, 2)
    return flow


def local_correlation_softmax(feature0, feature1, radius: int,
                              precision=None):
    """Windowed correlation softmax matching (reference matching.py:39-83):
    per pixel, correlate with the (2r+1)^2 integer-offset window of feature1
    (zeros outside), mask out-of-image taps to -1e9, softmax, and take the
    expected offset as flow.

    TPU-first: the window taps are (2r+1)^2 SHIFTED-SLICE elementwise dots
    (one fused multiply+C-reduction per tap, fully vectorizable) instead of
    the reference's grid_sample gather of a [B, HW, C, (2R+1)^2] tensor —
    integer offsets make the bilinear sample an exact slice.
    """
    B, H, W, C = feature0.shape
    r = radius
    n = 2 * r + 1
    scale = 1.0 / (C ** 0.5)
    f1p = jnp.pad(feature1, ((0, 0), (r, r), (r, r), (0, 0)))
    taps = []
    for dy in range(-r, r + 1):        # dy slow, dx fast (window_grid order)
        for dx in range(-r, r + 1):
            s = jax.lax.slice(f1p, (0, r + dy, r + dx, 0),
                              (B, r + dy + H, r + dx + W, C))
            taps.append(jnp.einsum("bhwc,bhwc->bhw", feature0, s,
                                   precision=precision) * scale)
    corr = jnp.stack(taps, axis=-1)    # [B, H, W, n*n]
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ox = jnp.tile(offs, n)             # dx fast
    oy = jnp.repeat(offs, n)           # dy slow
    valid = ((gx[None, :, :, None] + ox >= 0) & (gx[None, :, :, None] + ox < W)
             & (gy[None, :, :, None] + oy >= 0)
             & (gy[None, :, :, None] + oy < H))
    corr = jnp.where(valid, corr, jnp.asarray(-1e9, corr.dtype))
    prob = jax.nn.softmax(corr.astype(jnp.float32), axis=-1)
    flow = jnp.stack([jnp.sum(prob * ox, -1), jnp.sum(prob * oy, -1)], -1)
    return flow.astype(feature0.dtype)


def local_correlation_softmax_mm(feature0, feature1, radius: int,
                                 precision=None):
    """MXU form of local_correlation_softmax — same math, banded matmuls.

    Per row offset dy, the (2r+1) x-taps of every pixel live in a ±r band of
    the full row-correlation matrix  M = f0_row @ f1p_rowᵀ  [W, W+2r].
    Computing M on the MXU and extracting the band with a constant one-hot
    contraction replaces the taps form's (2r+1)² full passes over feature0
    (VPU elementwise dots, ~25 ms at the refine shape) with 2r+1 batched
    matmuls (~60 GFLOP total). Accumulations are MXU f32 instead of the VPU
    reduce — equivalent within bf16 ulps, not bit-identical; the parity path
    (explicit precision) keeps the taps form.
    """
    B, H, W, C = feature0.shape
    r = radius
    n = 2 * r + 1
    scale = 1.0 / (C ** 0.5)
    f1p = jnp.pad(feature1, ((0, 0), (r, r), (r, r), (0, 0)))
    # row chunking: a width-c query chunk only needs the (c + 2r)-wide band
    # of keys, so the [*, c, c+2r] score slab carries ~2.6x less HBM traffic
    # than the full [*, W, W+2r] row product at the refine shape
    chunk = next((c for c in (128, 120, 144, 96, 160) if W % c == 0), W)
    nc = W // chunk
    f0c = feature0.reshape(B, H, nc, chunk, C)
    # band one-hot: oh[w, j, dxi] = 1 iff j == w + dxi  (j indexes the
    # chunk's padded band, dxi = dx + r; dx fast, matching window_grid order)
    j = np.arange(chunk + 2 * r)
    oh = (j[None, :, None] == (np.arange(chunk)[:, None, None]
                               + np.arange(n)[None, None, :]))
    oh = jnp.asarray(oh, feature0.dtype)
    per_dy = []
    for dy in range(-r, r + 1):
        rows = jax.lax.slice(f1p, (0, r + dy, 0, 0),
                             (B, r + dy + H, W + 2 * r, C))
        rows_c = jnp.stack(
            [jax.lax.slice(rows, (0, 0, k * chunk, 0),
                           (B, H, k * chunk + chunk + 2 * r, C))
             for k in range(nc)], axis=2)      # [B, H, nc, chunk+2r, C]
        m = jnp.einsum("bhkwc,bhkjc->bhkwj", f0c, rows_c,
                       precision=precision)
        per_dy.append(jnp.einsum("bhkwj,wjd->bhkwd", m, oh,
                                 precision=precision).reshape(B, H, W, n))
    corr = jnp.concatenate(per_dy, axis=-1) * scale   # [B, H, W, n*n]
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ox = jnp.tile(offs, n)
    oy = jnp.repeat(offs, n)
    valid = ((gx[None, :, :, None] + ox >= 0) & (gx[None, :, :, None] + ox < W)
             & (gy[None, :, :, None] + oy >= 0)
             & (gy[None, :, :, None] + oy < H))
    corr = jnp.where(valid, corr, jnp.asarray(-1e9, corr.dtype))
    prob = jax.nn.softmax(corr.astype(jnp.float32), axis=-1)
    flow = jnp.stack([jnp.sum(prob * ox, -1), jnp.sum(prob * oy, -1)], -1)
    return flow.astype(feature0.dtype)


def _flow_warp(feature, flow):
    """Warp feature [B, H, W, C] by flow (bilinear, zeros outside; reference
    geometry.py flow_warp: grid_sample align_corners=True, padding zeros).

    Paired-column gather: one lax.gather descriptor fetches BOTH x taps of a
    row (slice_sizes (1, 2, C) — 2C contiguous bytes), halving the
    descriptor count vs four per-pixel gathers. Measured at the refine
    shape [8, 208, 360, 128]: 19.9 vs 32.1 ms (scripts/ab_warp_pair.py);
    f32 agreement to ~2e-7 with the 4-gather form. NB small (1, 2, C)
    slices run fine on the v5e — the runtime fault CLAUDE.md records is for
    big block-row slices like (1, 10, W)."""
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
        # f1 [H, W+2, C]; yi/xi [H, W] -> [H, W, 2, C] (cols xi, xi+1)
        starts = jnp.stack([yi.reshape(-1), xi.reshape(-1)], -1)
        got = jax.lax.gather(
            f1, starts, dnums, slice_sizes=(1, 2, f1.shape[-1]),
            mode=jax.lax.GatherScatterMode.CLIP)
        return got.reshape(H, W, 2, f1.shape[-1])

    out = None
    for dy, wy in ((0, (1 - ay)), (1, ay)):
        yi = y0i + dy
        pair = jax.vmap(row_pair)(fp, yi, x0i + 1)   # [B, H, W, 2, C]
        vx0 = ((x0i >= 0) & (x0i < W) & (yi >= 0) & (yi < H))[..., None]
        vx1 = ((x0i + 1 >= 0) & (x0i + 1 < W) & (yi >= 0)
               & (yi < H))[..., None]
        row = (pair[:, :, :, 0] * (1 - ax) * vx0
               + pair[:, :, :, 1] * ax * vx1)
        out = row * wy if out is None else out + row * wy
    # the f32 sample coords promote the bilinear blend; keep feature dtype
    # (bf16 production path) instead of leaking f32 into the transformer
    return out.astype(feature.dtype)


def flow_propagation_local(p, feature0, flow, radius: int = 1,
                           precision=None):
    """Local-window flow propagation (reference transformer.py:377-409
    forward_local_window_attn): queries q_proj(feature0), keys k_proj(feature0)
    — NOTE the local path projects keys from the RAW feature, unlike the
    global path's k_proj(q_proj(x)) quirk — scores over the (2r+1)^2
    zero-padded neighborhood (no validity masking: the reference unfold
    zero-pads, so border taps score 0 and still take softmax mass), values =
    zero-padded flow window.
    """
    B, H, W, C = feature0.shape
    r = radius
    n = 2 * r + 1
    scale = 1.0 / (C ** 0.5)
    q = pnn.linear(p["q"], feature0, precision=precision)
    k = pnn.linear(p["k"], feature0, precision=precision)
    kp = jnp.pad(k, ((0, 0), (r, r), (r, r), (0, 0)))
    fp = jnp.pad(flow, ((0, 0), (r, r), (r, r), (0, 0)))
    scores, vals = [], []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            ks = jax.lax.slice(kp, (0, r + dy, r + dx, 0),
                               (B, r + dy + H, r + dx + W, C))
            scores.append(jnp.einsum("bhwc,bhwc->bhw", q, ks,
                                     precision=precision) * scale)
            vals.append(jax.lax.slice(fp, (0, r + dy, r + dx, 0),
                                      (B, r + dy + H, r + dx + W, 2)))
    s = jnp.stack(scores, axis=-1)                       # [B, H, W, n*n]
    v = jnp.stack(vals, axis=-2)                         # [B, H, W, n*n, 2]
    prob = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    out = jnp.sum(prob[..., None] * v.astype(jnp.float32), axis=-2)
    return out.astype(flow.dtype)


def flow_propagation(p, feature0, flow, key_chunk: int = 2048,
                     precision=None, blockwise: bool = True):
    """Global self-attention with flow as value (reference quirk: the key
    projection is applied on top of the query projection, transformer.py:357-364).

    The [B, HW, HW] score matrix is as large as the matching one, so it uses
    the same blockwise streaming softmax by default.
    """
    B, H, W, C = feature0.shape
    q = pnn.linear(p["q"], feature0.reshape(B, H * W, C), precision=precision)
    k = pnn.linear(p["k"], q, precision=precision)
    v = flow.reshape(B, H * W, 2)
    scale = 1.0 / (C ** 0.5)
    if blockwise:
        out = _global_attend(q, k, v, scale, key_chunk, precision)
        return out.astype(flow.dtype).reshape(B, H, W, 2)
    scores = jnp.einsum("bnc,bmc->bnm", q, k, precision=precision) * scale
    prob = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", prob, v,
                      precision=precision).reshape(B, H, W, 2)


def forward(params, img0, img1, cfg: GMFlowConfig = GMFlowConfig(),
            pred_bidir: bool = True, precision=None):
    """img0/1 [B, H, W, 3] in [0, 255], H/W multiples of 8 (driver pads to
    cfg.padding_factor).

    Returns flow [B or 2B, H, W, 2] (fwd rows first, then bwd when bidir).
    num_scales=2 runs the refinement pass (reference gmflow.py:93-166): the
    1/4-scale features are batch-doubled for bidir, feature1 warped by the
    2x-upsampled scale-0 flow, matched with a local correlation window and
    propagated with local window attention, then x4 convex upsampled.
    """
    from prisma_tpu.ops.resize import resize2d

    # keep normalization in the input dtype: f32 constants would promote a
    # bf16 batch to f32 and crash the first conv (weights stay bf16)
    mean = jnp.asarray(IMAGENET_MEAN, img0.dtype)
    std = jnp.asarray(IMAGENET_STD, img0.dtype)
    n0 = (img0 / 255.0 - mean) / std
    n1 = (img1 / 255.0 - mean) / std

    B = img0.shape[0]
    feats = backbone_forward(params["backbone"],
                             jnp.concatenate([n0, n1], axis=0), precision,
                             num_scales=cfg.num_scales)
    if cfg.num_scales == 1:
        feats = [feats]
    feats0 = [f[:B] for f in feats]
    feats1 = [f[B:] for f in feats]

    attn_splits_l, corr_radius_l, prop_radius_l = cfg.scale_lists()
    blockwise = cfg.matching == "blockwise"
    flow = None
    for si in range(cfg.num_scales):
        feature0, feature1 = feats0[si], feats1[si]
        if pred_bidir and si > 0:
            # refinement scales carry fwd+bwd as a doubled batch
            feature0 = jnp.concatenate([feats0[si], feats1[si]], axis=0)
            feature1 = jnp.concatenate([feats1[si], feats0[si]], axis=0)
        if si > 0:
            h2, w2 = feature0.shape[1], feature0.shape[2]
            flow = resize2d(flow.astype(jnp.float32), (h2, w2),
                            method="linear", align_corners=True,
                            precision=precision) * 2.0
            flow = flow.astype(feature0.dtype)
        if flow is not None:
            feature1 = _flow_warp(feature1, flow)

        attn_splits = attn_splits_l[si]
        feature0, feature1 = add_position(feature0, feature1, attn_splits)
        feature0, feature1 = transformer_forward(
            params["transformer"], feature0, feature1, attn_splits,
            precision, cfg.attn_impl)

        if corr_radius_l[si] == -1:  # global matching
            if blockwise:
                flow_pred = global_correlation_softmax_blockwise(
                    feature0, feature1, pred_bidir and si == 0,
                    cfg.key_chunk, precision).astype(feature0.dtype)
            else:
                flow_pred = global_correlation_softmax(
                    feature0, feature1, pred_bidir and si == 0, precision)
        else:
            # production (precision=None): banded-MXU form, 20.7 vs 25.4 ms
            # at the refine shape; parity paths keep the taps form (exact
            # VPU-reduce accumulation the oracle comparison expects)
            corr_fn = local_correlation_softmax_mm if precision is None \
                else local_correlation_softmax
            flow_pred = corr_fn(feature0, feature1, corr_radius_l[si],
                                precision)
        flow = flow + flow_pred if flow is not None else flow_pred

        if pred_bidir and si == 0:
            feature0 = jnp.concatenate([feature0, feature1], axis=0)
        if prop_radius_l[si] == -1:
            flow = flow_propagation(params["flow_attn"], feature0, flow,
                                    cfg.key_chunk, precision,
                                    blockwise=blockwise)
        else:
            flow = flow_propagation_local(params["flow_attn"], feature0,
                                          flow, prop_radius_l[si], precision)

    concat = jnp.concatenate([flow.astype(feature0.dtype), feature0], axis=-1)
    y = jax.nn.relu(pnn.conv2d(params["upsampler"]["conv1"], concat, padding=1,
                               precision=precision))
    mask = pnn.conv2d(params["upsampler"]["conv2"], y, precision=precision)
    return convex_upsample(flow, mask, cfg.upsample_factor)


def infer_pairs(params, image1, image2, cfg: GMFlowConfig = GMFlowConfig(),
                precision=None, inference_size=None):
    """Bidirectional inference -> (fwd, bwd) [B, H, W, 2].

    inference_size=None (default): pad H/W to a multiple of cfg.padding_factor
    (16; 32 for refinement), infer, unpad
    (reference flow_gmflow.py:72-74). inference_size=(h, w): bilinear
    align_corners=True resize to (h, w), infer WITHOUT padding, resize the
    flow back and rescale its components by the size ratio (reference
    flow_gmflow.py:78-98 --inference_size)."""
    from prisma_tpu.ops.resize import resize2d

    B = image1.shape[0]
    if inference_size is not None:
        ih, iw = inference_size
        oh, ow = image1.shape[1], image1.shape[2]
        i1 = resize2d(image1, (ih, iw), method="linear", align_corners=True)
        i2 = resize2d(image2, (ih, iw), method="linear", align_corners=True)
        flow = forward(params, i1, i2, cfg, pred_bidir=True,
                       precision=precision)
        flow = resize2d(flow.astype(jnp.float32), (oh, ow), method="linear",
                        align_corners=True)
        flow = flow * jnp.asarray([ow / iw, oh / ih], flow.dtype)
        return flow[:B], flow[B:]
    i1, pads = pad_to_multiple(image1, cfg.padding_factor)
    i2, _ = pad_to_multiple(image2, cfg.padding_factor)
    flow = forward(params, i1, i2, cfg, pred_bidir=True, precision=precision)
    flow = unpad(flow, pads)
    return flow[:B], flow[B:]


# ---------------------------------------------------------------------------
# Random init (tests; real weights via weights/torch_convert.convert_gmflow)
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: GMFlowConfig = GMFlowConfig(),
                dtype=jnp.float32) -> dict:
    rngs = iter(jax.random.split(rng, 256))
    C = cfg.feature_channels

    def conv(kh, kw, cin, cout, bias=True):
        p = {"w": (jax.random.normal(next(rngs), (kh, kw, cin, cout))
                   * ((kh * kw * cin) ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def lin(din, dout, bias=True):
        p = {"w": (jax.random.normal(next(rngs), (din, dout))
                   * (din ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def ln(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def tlayer(no_ffn):
        p = {"q": lin(C, C, False), "k": lin(C, C, False), "v": lin(C, C, False),
             "merge": lin(C, C, False), "norm1": ln(C)}
        if not no_ffn:
            p["mlp1"] = lin(2 * C, 2 * C * cfg.ffn_dim_expansion, False)
            p["mlp2"] = lin(2 * C * cfg.ffn_dim_expansion, C, False)
            p["norm2"] = ln(C)
        return p

    dims = [(64, 64, 1), (64, 64, 1), (64, 96, 2), (96, 96, 1), (96, 128, 2),
            (128, 128, 1)]
    blocks = []
    for cin, cout, stride in dims:
        b = {"conv1": conv(3, 3, cin, cout, False),
             "conv2": conv(3, 3, cout, cout, False)}
        if stride != 1 or cin != cout:
            b["down"] = conv(1, 1, cin, cout)
        blocks.append(b)

    backbone = {"conv1": conv(7, 7, 3, 64, False), "blocks": blocks,
                "conv2": conv(1, 1, 128, C)}
    if cfg.num_scales > 1:
        backbone["trident"] = conv(3, 3, C, C, False)

    return {
        "backbone": backbone,
        "transformer": {"layers": [{"self": tlayer(True), "cross": tlayer(False)}
                                   for _ in range(cfg.num_transformer_layers)]},
        "flow_attn": {"q": lin(C, C), "k": lin(C, C)},
        "upsampler": {"conv1": conv(3, 3, 2 + C, 256),
                      "conv2": conv(1, 1, 256, cfg.upsample_factor ** 2 * 9)},
    }
