"""PatchFusion tiled high-resolution metric depth, TPU-native.

Parity targets (all in the reference tree):
- `zoedepth/models/zoedepth_custom/patchfusion.py:90-608` — frozen coarse+fine
  ZoeDepthCustom (BEiT-L DPT cores), 6-level feature hooks, torchvision
  roi_align crops of coarse features to the tile bbox, fusion convs, UNetv1
  guide fusion with G2L swin attention and area priors, then the ZoeDepth bins
  head over the UNet pyramid (rel_cond fixed to zeros);
- `zoedepth/models/layers/fusion_network.py` — UNetv1 (DoubleConv/Down/Upv1);
- `zoedepth/models/layers/swin_layers.py` — WindowAttention + G2LFusion;
- `bands/patchfusion/infer_user.py:246-424` — Gaussian blend masks,
  RunningAverageMap stitching, regular_tile / random_tile;
- `bands/depth_patchfusion.py:70-114` — resolution ladder, p16/p49/rN modes.

TPU redesign: the reference evaluates the 16/49 tiles in a serial Python loop
(infer_user.py:339-362); here every tile pass is ONE jitted batched call (tiles
on the batch axis, the coarse pass computed once and broadcast), and stitching
is an on-device scatter-add of masked tile maps.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import beit as jbeit
from prisma_tpu.models import midas as jmidas
from prisma_tpu.models import zoedepth as jzoe
from prisma_tpu.ops import nn as pnn
from prisma_tpu.ops.resize import resize2d
from prisma_tpu.ops.roi_align import roi_align_mm, roi_align_mm_resized

MODEL_HW = (384, 512)          # ZoeDepthCustom input (config img_size)
N_MIDAS_OUT = 32
BTLNCK = 256
PF_CONFIG = jzoe.ZoeDepthConfig()  # n_bins 64, softplus, inv/mean, min_temp .0212


def level_hw(model_hw=MODEL_HW):
    """Feature pyramid sizes: model/32 up to model (reference LEVEL list)."""
    mh, mw = model_hw
    return [(mh >> (5 - k), mw >> (5 - k)) for k in range(6)]


def hr_hw(model_hw=MODEL_HW):
    """The reference's fixed (2160, 3840) coarse upsample, scaled to geometry
    (2160 = 384 * 45/8, 3840 = 512 * 60/8 — patchfusion.py:384-433)."""
    return (model_hw[0] * 45 // 8, model_hw[1] * 60 // 8)


LEVEL_HW = level_hw()


# ---------------------------------------------------------------------------
# Swin window attention + G2LFusion
# ---------------------------------------------------------------------------

def _swin_rel_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def _window_partition(x, ws: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _window_reverse(w, ws: int, H: int, W: int):
    B = w.shape[0] // (H // ws * W // ws)
    x = w.reshape(B, H // ws, W // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def _swin_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    img = np.zeros((Hp, Wp), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32).transpose(0, 2, 1)


def _swin_block(p, x, H, W, num_heads, ws, shift, mask, precision=None):
    """x [B, H*W, C]; swin W-MSA/SW-MSA block (swin_layers.py:218-268)."""
    B, L, C = x.shape
    shortcut = x
    x = pnn.layer_norm(p["norm1"], x, eps=1e-5).reshape(B, H, W, C)
    pad_b = (-H) % ws
    pad_r = (-W) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = _window_partition(x, ws)  # [B*nW, ws*ws, C]

    qkv = pnn.linear(p["qkv"], xw, precision=precision)
    Bw, N, _ = xw.shape
    head = C // num_heads
    qkv = qkv.reshape(Bw, N, 3, num_heads, head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * (head ** -0.5), k,
                      precision=precision)
    rel = p["rel_pos_table"][jnp.asarray(_swin_rel_index(ws, ws))]
    attn = attn + rel.transpose(2, 0, 1)[None]
    if mask is not None:
        nW = mask.shape[0]
        # mask cast to the score dtype (f32 would promote the stack under bf16)
        attn = attn.reshape(Bw // nW, nW, num_heads, N, N) \
            + jnp.asarray(mask, attn.dtype)[None, :, None]
        attn = attn.reshape(Bw, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, precision=precision)
    out = pnn.linear(p["proj"], out.reshape(Bw, N, C), precision=precision)

    x = _window_reverse(out, ws, Hp, Wp)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :H, :W].reshape(B, L, C)
    x = shortcut + x
    y = pnn.mlp(p["mlp"], pnn.layer_norm(p["norm2"], x, eps=1e-5),
                precision=precision)
    return x + y


def g2l_fusion(p, x, area_prior, num_heads: int, depth: int, ws: int = 12,
               precision=None):
    """G2LFusion (swin_layers.py:363-431): whole-image swin attention with area
    prior embedding + absolute position embedding; x [B, H, W, C] NHWC."""
    B, H, W, C = x.shape
    prior = pnn.conv2d(p["embed_proj"], area_prior, precision=precision)
    x = x + prior
    t = x.reshape(B, H * W, C) + p["absolute_pos_embed"]
    shift = ws // 2
    Hp, Wp = H + (-H) % ws, W + (-W) % ws
    mask = _swin_attn_mask(Hp, Wp, ws, shift)
    for i, bp in enumerate(p["blocks"]):
        t = _swin_block(bp, t, H, W, num_heads, ws,
                        0 if i % 2 == 0 else shift,
                        None if i % 2 == 0 else mask, precision)
    t = pnn.layer_norm(p["norm"], t, eps=1e-5)
    return t.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# UNetv1
# ---------------------------------------------------------------------------

def _double_conv_bn(p, x, precision=None):
    """conv(bias-free)+foldedBN+relu x2 (fusion_network.py DoubleConv)."""
    y = jax.nn.relu(pnn.conv2d(p["conv1"], x, padding=1, precision=precision)
                    * p["bn1"]["scale"] + p["bn1"]["bias"])
    return jax.nn.relu(pnn.conv2d(p["conv2"], y, padding=1, precision=precision)
                       * p["bn2"]["scale"] + p["bn2"]["bias"])


def _double_conv(p, x, precision=None):
    y = jax.nn.relu(pnn.conv2d(p["conv1"], x, padding=1, precision=precision))
    return jax.nn.relu(pnn.conv2d(p["conv2"], y, padding=1, precision=precision))


def _max_pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def _up_v1(p, x1, x2, precision=None):
    x1 = resize2d(x1, (x1.shape[1] * 2, x1.shape[2] * 2), method="linear",
                  align_corners=True)
    return _double_conv(p, jnp.concatenate([x2, x1], axis=-1), precision)


G2L_SPECS = [  # (num_heads, depth) for g2l5..g2l0 (low res -> high res)
    (32, 4), (32, 4), (16, 3), (16, 3), (8, 2), (8, 2)]


def unet_v1(p, input_tensor, guide_cat, coarse_feat_whole, crop_area_resize,
            bbox, batch_idx, model_hw=MODEL_HW, precision=None):
    """UNetv1 forward (fusion_network.py:146-200), g2l + area prior enabled.

    input_tensor [N, 384, 512, 5]; guide_cat: 6 fused guides (level hi->lo as
    stored: index 0 = 12x16); coarse_feat_whole: 6 whole-image coarse features
    (batch 1); bbox [N, 4] in the 512x384 frame; batch_idx zeros (coarse batch).
    Returns [x6..x1] low->high.
    """
    x1 = _double_conv_bn(p["inc"], input_tensor, precision)
    downs = [x1]
    for i in range(5):
        downs.append(_double_conv_bn(p["down"][i], _max_pool2(downs[-1]),
                                     precision))
    x1, x2, x3, x4, x5, x6 = downs

    N = input_tensor.shape[0]

    def g2l_roi(level, out_hw):
        heads, depth = G2L_SPECS[level]
        # each tile embeds its own area prior into the (shared) whole-image
        # coarse feature, so the swin fusion runs per tile (reference runs one
        # tile per forward; here the tile axis is the batch axis)
        whole = jnp.broadcast_to(coarse_feat_whole[level],
                                 (N,) + coarse_feat_whole[level].shape[1:])
        g = g2l_fusion(p["g2l"][level], whole, crop_area_resize[level], heads,
                       depth, precision=precision)
        return roi_align_mm(g, bbox, jnp.arange(N, dtype=jnp.int32), out_hw,
                            spatial_scale=out_hw[0] / model_hw[0],
                            sampling_ratio=max(1, int(round(model_hw[0]
                                                            / out_hw[0]))),
                            precision=precision).astype(g.dtype)

    lv = level_hw(model_hw)
    # level ordering in the param lists: index 0 -> g2l5 spec (12x16) ... 5 -> g2l0
    x6 = _double_conv(p["conv"][0], jnp.concatenate(
        [x6, g2l_roi(0, lv[0])], axis=-1), precision)
    x5 = _up_v1(p["up"][0], jnp.concatenate([x6, guide_cat[0]], -1), x5, precision)
    x5 = _double_conv(p["conv"][1], jnp.concatenate(
        [x5, g2l_roi(1, lv[1])], axis=-1), precision)
    x4 = _up_v1(p["up"][1], jnp.concatenate([x5, guide_cat[1]], -1), x4, precision)
    x4 = _double_conv(p["conv"][2], jnp.concatenate(
        [x4, g2l_roi(2, lv[2])], axis=-1), precision)
    x3 = _up_v1(p["up"][2], jnp.concatenate([x4, guide_cat[2]], -1), x3, precision)
    x3 = _double_conv(p["conv"][3], jnp.concatenate(
        [x3, g2l_roi(3, lv[3])], axis=-1), precision)
    x2 = _up_v1(p["up"][3], jnp.concatenate([x3, guide_cat[3]], -1), x2, precision)
    x2 = _double_conv(p["conv"][4], jnp.concatenate(
        [x2, g2l_roi(4, lv[4])], axis=-1), precision)
    x1 = _up_v1(p["up"][4], jnp.concatenate([x2, guide_cat[4]], -1), x1, precision)
    x1 = _double_conv(p["conv"][5], jnp.concatenate(
        [x1, g2l_roi(5, lv[5])], axis=-1), precision)
    return [x6, x5, x4, x3, x2, x1]


# ---------------------------------------------------------------------------
# ZoeDepthCustom (baseline): BEiT core + bins head, exposing hook features
# ---------------------------------------------------------------------------

def zoedepth_custom_forward(params, x, cfg: jzoe.ZoeDepthConfig = PF_CONFIG,
                            precision=None):
    """x [B, 384, 512, 3] normalized -> (metric_depth [B, h, w], hooks dict).

    hooks: x_d0 [12x16, 256], x_blocks_feat_0..3 (24x32..192x256, 256),
    midas_final_feat (384x512, 32) — zoedepth_custom.py:158-244 semantics.
    """
    B = x.shape[0]
    feats = jbeit.get_intermediate_layers(params["core"]["beit"], x, precision=precision)
    rel_depth, core_feats = jmidas.decoder_forward(
        params["core"]["decoder"], feats,
        (B, x.shape[1] // 16, x.shape[2] // 16), precision, return_features=True)

    hooks = {}
    btlnck = pnn.conv2d(params["head"]["conv2"], core_feats["l4_rn"],
                        precision=precision)
    hooks["x_d0"] = btlnck
    hooks["midas_final_feat"] = core_feats["out_conv"]

    # bins math always in f32 (log-binomial/attractors underflow in bf16);
    # the exposed hooks stay in the compute dtype for the bf16 tile projections
    f32 = lambda t: t.astype(jnp.float32)  # noqa: E731
    hp = jax.tree.map(
        lambda l: l.astype(jnp.float32)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        else l, params["head"])
    b_prev, _ = jzoe.seed_bin_regressor(hp["seed_bin_regressor"], f32(btlnck),
                                        cfg, precision)
    prev_emb = jzoe._mlp2(hp["seed_projector"], f32(btlnck), None, precision)
    b_centers = None
    b_embedding = prev_emb
    for i, feat_name in enumerate(("r4", "r3", "r2", "r1")):
        feat = core_feats[feat_name]
        hooks[f"x_blocks_feat_{i}"] = feat
        b_embedding = jzoe._mlp2(hp["projectors"][i], f32(feat), None,
                                 precision)
        b_prev, b_centers = jzoe.attractor_layer(hp["attractors"][i],
                                                 b_embedding, b_prev, prev_emb,
                                                 cfg, precision)
        prev_emb = b_embedding

    last = f32(core_feats["out_conv"])
    rel_cond = resize2d(f32(rel_depth)[..., None], last.shape[1:3],
                        method="linear", align_corners=True)
    last = jnp.concatenate([last, rel_cond], axis=-1)
    b_embedding = resize2d(b_embedding, last.shape[1:3], method="linear",
                           align_corners=True)
    probs = jzoe.conditional_log_binomial(hp["conditional_log_binomial"], last,
                                          b_embedding, cfg, precision)
    b_centers = resize2d(b_centers, probs.shape[1:3], method="linear",
                         align_corners=True)
    depth = jnp.sum(probs * b_centers, axis=-1)
    return depth, hooks


# ---------------------------------------------------------------------------
# PatchFusion forward (one batched tile pass)
# ---------------------------------------------------------------------------

def _proj6(plist, hooks, precision=None):
    """coarse/fine_input_proj over the 6 hook levels (patchfusion.py:392-440):
    index order [x_d0 -> proj[5], blocks 0..3 -> proj[0..3], final -> proj[4]]."""
    return [
        pnn.conv2d(plist[5], hooks["x_d0"], padding=1, precision=precision),
        pnn.conv2d(plist[0], hooks["x_blocks_feat_0"], padding=1, precision=precision),
        pnn.conv2d(plist[1], hooks["x_blocks_feat_1"], padding=1, precision=precision),
        pnn.conv2d(plist[2], hooks["x_blocks_feat_2"], padding=1, precision=precision),
        pnn.conv2d(plist[3], hooks["x_blocks_feat_3"], padding=1, precision=precision),
        pnn.conv2d(plist[4], hooks["midas_final_feat"], padding=1, precision=precision),
    ]


def coarse_pass(params, img_lr, cfg: jzoe.ZoeDepthConfig = PF_CONFIG,
                model_hw=MODEL_HW, precision=None):
    """Whole-image coarse pass, shared by every tile batch: ZoeDepthCustom on
    the low-res image + the 6 coarse input projections + the HR depth map.
    Jitted separately from the tile pass so the per-image compile units stay
    small enough for the remote TPU compiler."""
    mean = jnp.asarray((0.485, 0.456, 0.406), img_lr.dtype)
    std = jnp.asarray((0.229, 0.224, 0.225), img_lr.dtype)
    coarse_depth, coarse_hooks = zoedepth_custom_forward(
        params["coarse"], (img_lr - mean) / std, cfg, precision)
    coarse_feats = _proj6(params["coarse_input_proj"], coarse_hooks,
                          precision)
    # the reference upsamples coarse depth to (2160, 3840) before the roi
    # (patchfusion.py:384-433); that resize is bilinear (linear), so it is
    # FOLDED into the roi weight matrices (roi_align_mm_resized) instead of
    # materializing the 132 MB HR map — exact to f32 summation order
    return coarse_feats, coarse_depth[..., None]


def patchfusion_tiles(params, crops, img_lr, bbox_roi, crop_areas,
                      iter_prior=None, coarse_cache=None,
                      cfg: jzoe.ZoeDepthConfig = PF_CONFIG,
                      model_hw=MODEL_HW, precision=None):
    """One tile pass, fully batched.

    crops [N, 384, 512, 3] in [0,1]; img_lr [1, 384, 512, 3] in [0,1];
    bbox_roi [N, 4] (x1,y1,x2,y2) in the 512x384 frame; crop_areas
    [N, 384, 512, 1]; iter_prior [N, 384, 512, 1] or None.
    Returns (tile depths [N, 384, 512], coarse_cache).
    """
    # normalize in the input dtype: f32 constants would promote a bf16 batch
    # to f32 all the way through the BEiT core
    mean = jnp.asarray((0.485, 0.456, 0.406), crops.dtype)
    std = jnp.asarray((0.229, 0.224, 0.225), crops.dtype)

    if coarse_cache is None:
        coarse_cache = coarse_pass(params, img_lr, cfg, model_hw, precision)
    coarse_feats, coarse_depth_lr = coarse_cache

    N = crops.shape[0]
    fine_depth, fine_hooks = zoedepth_custom_forward(
        params["fine"], (crops - mean) / std, cfg, precision)
    fine_feats = _proj6(params["fine_input_proj"], fine_hooks, precision)

    lv = level_hw(model_hw)
    hh, hw_ = hr_hw(model_hw)
    zeros_idx = jnp.zeros((N,), jnp.int32)
    # roi_align interpolates in f32; cast back so the bf16 fusion convs and
    # UNet below don't see mixed dtypes
    coarse_roi = [
        roi_align_mm(coarse_feats[i], bbox_roi, zeros_idx, lv[i],
                     spatial_scale=lv[i][0] / model_hw[0],
                     sampling_ratio=max(1, int(round(model_hw[0]
                                                     / lv[i][0]))),
                     precision=precision)
        .astype(coarse_feats[i].dtype)
        for i in range(6)
    ]
    bbox_hack = bbox_roi * jnp.asarray([hw_ / model_hw[1], hh / model_hw[0],
                                        hw_ / model_hw[1], hh / model_hw[0]])
    whole_depth_roi = roi_align_mm_resized(
        coarse_depth_lr, bbox_hack, zeros_idx, model_hw, (hh, hw_),
        spatial_scale=1.0, sampling_ratio=5,
        precision=precision).astype(crops.dtype)

    guide_cat = [
        pnn.conv2d(params["fusion_conv"][i],
                   jnp.concatenate([coarse_roi[i], fine_feats[i]], axis=-1),
                   padding=1, precision=precision)
        for i in range(6)
    ]

    prior = iter_prior if iter_prior is not None else fine_depth[..., None]
    input_tensor = jnp.concatenate([whole_depth_roi,
                                    prior.astype(crops.dtype), crops], axis=-1)

    crop_area_resize = [
        resize2d(crop_areas, hw2, method="linear",
                 align_corners=True).astype(crops.dtype)
        for hw2 in lv
    ]

    output = unet_v1(params["unet"], input_tensor, guide_cat, coarse_feats,
                     crop_area_resize, bbox_roi, zeros_idx, model_hw, precision)
    # output [x6..x1] low->high; bins head over the pyramid
    x = output[0]
    x_blocks = output[1:]

    # bins math in f32, same rationale as zoedepth_custom_forward above
    f32 = lambda t: t.astype(jnp.float32)  # noqa: E731
    hp = jax.tree.map(
        lambda l: l.astype(jnp.float32)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        else l, params["head"])
    b_prev, _ = jzoe.seed_bin_regressor(hp["seed_bin_regressor"], f32(x), cfg,
                                        precision)
    prev_emb = jzoe._mlp2(hp["seed_projector"], f32(x), None, precision)
    b_centers = None
    b_embedding = prev_emb
    for i in range(4):
        b_embedding = jzoe._mlp2(hp["projectors"][i], f32(x_blocks[i]), None,
                                 precision)
        b_prev, b_centers = jzoe.attractor_layer(hp["attractors"][i],
                                                 b_embedding, b_prev, prev_emb,
                                                 cfg, precision)
        prev_emb = b_embedding

    last = f32(x_blocks[-1])  # 32ch, 384x512
    rel_cond = jnp.zeros(last.shape[:3] + (1,), last.dtype)  # reference quirk
    last = jnp.concatenate([last, rel_cond], axis=-1)
    b_embedding = resize2d(b_embedding, last.shape[1:3], method="linear",
                           align_corners=True)
    probs = jzoe.conditional_log_binomial(hp["conditional_log_binomial"], last,
                                          b_embedding, cfg, precision)
    b_centers = resize2d(b_centers, probs.shape[1:3], method="linear",
                         align_corners=True)
    depth = jnp.sum(probs * b_centers, axis=-1)
    return depth, coarse_cache


# ---------------------------------------------------------------------------
# Tiling engine (host orchestration; each pass one jitted call)
# ---------------------------------------------------------------------------

def generate_blur_mask(size) -> np.ndarray:
    """Gaussian blend mask (infer_user.py:246-255)."""
    import cv2
    h, w = size
    mask = np.zeros((h, w), np.float32)
    sigma = int(h / 16)
    k = int(2 * np.ceil(2 * int(h / 16)) + 1)
    mask[int(0.1 * h):h - int(0.1 * h), int(0.1 * w):w - int(0.1 * w)] = 1
    mask = cv2.GaussianBlur(mask, (k, k), sigma)
    mask = (mask - mask.min()) / (mask.max() - mask.min())
    return mask.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _blur_mask_dev(crop):
    """Device-resident blur+eps constant — computed/uploaded once per crop
    size, not per frame (the per-frame GaussianBlur + 2 MB H2D was pure
    overhead on the video path)."""
    return jnp.asarray(generate_blur_mask(crop) + 1e-3)


def pick_resolution(h: int, w: int):
    """Resolution ladder (depth_patchfusion.py:80-88)."""
    if h <= 480 and w <= 640:
        return (480, 640)
    if h <= 1080 and w <= 1920:
        return (1080, 1920)
    return (2160, 3840)


def _tile_grid(resolution, crop, off_x, off_y):
    h, w = crop
    nx = (resolution[1] - off_x) // w
    ny = (resolution[0] - off_y) // h
    return [(y * h + off_y, x * w + off_x) for x in range(nx) for y in range(ny)]


@functools.lru_cache(maxsize=None)
def _pass_areas(tiles_key, resolution, crop, model_hw):
    """Per-pass crop-area maps + bboxes, computed host-side in closed form.

    The area map the reference builds (a box of ones over the tile, bilinearly
    resized to model_hw with align_corners) is separable: with resize weight
    matrices Wh [mh, Rh], Ww [mw, Rw], the resized indicator is the outer
    product of the per-axis weight ROW SUMS over the tile's extent. Computing
    it here (float64 cumsum, cast f32) replaces a [n, 2160, 3840] device
    resize + transfer per pass with a one-time [n, 384, 512] constant, cached
    per pass geometry (identical for every frame of a video)."""
    from prisma_tpu.ops.resize import _resize_weights
    ch, cw = crop
    mh, mw = model_hw
    Wh = _resize_weights(resolution[0], mh, "linear", True, None).astype(np.float64)
    Ww = _resize_weights(resolution[1], mw, "linear", True, None).astype(np.float64)
    Ah = np.concatenate([np.zeros((mh, 1)), np.cumsum(Wh, axis=1)], axis=1)
    Aw = np.concatenate([np.zeros((mw, 1)), np.cumsum(Ww, axis=1)], axis=1)
    areas, bboxes = [], []
    for (y, x) in tiles_key:
        wy = Ah[:, y + ch] - Ah[:, y]
        wx = Aw[:, x + cw] - Aw[:, x]
        areas.append(np.outer(wy, wx).astype(np.float32))
        bboxes.append([x / resolution[1] * mw, y / resolution[0] * mh,
                       (x + cw) / resolution[1] * mw,
                       (y + ch) / resolution[0] * mh])
    areas = jnp.asarray(np.stack(areas)[..., None])      # [n, mh, mw, 1]
    return areas, np.array(bboxes, np.float32)


@functools.lru_cache(maxsize=None)
def _pass_runner(crop, model_hw):
    """Jitted per-sub-batch prep (tile crop + prior extraction, batched
    resizes) and accumulation (depth resize + blur-masked scatter into the
    running average) — everything stays on device; the host only supplies
    int32 tile offsets. This replaced ~3 device round-trips PER TILE (the
    round-2 implementation resized each crop/area/prior individually through
    the tunnel) with 2 jit calls per sub-batch."""
    from jax import lax
    ch, cw = crop

    @functools.partial(jax.jit, static_argnames=("use_prior",))
    def prep(img_t, avg, cnt, offs, use_prior):
        crops = jax.vmap(
            lambda o: lax.dynamic_slice(img_t, (o[0], o[1], 0), (ch, cw, 3))
        )(offs)
        crops = resize2d(crops, model_hw, method="linear", align_corners=True)
        prior = None
        if use_prior:
            ratio = avg / cnt
            pr = jax.vmap(
                lambda o: lax.dynamic_slice(ratio, (o[0], o[1]), (ch, cw))
            )(offs)[..., None]
            prior = resize2d(pr, model_hw, method="linear", align_corners=True)
        return crops, prior

    @jax.jit
    def accum(avg, cnt, depths_model, offs, valid, blur):
        d = resize2d(depths_model[..., None], crop, method="linear",
                     align_corners=True)[..., 0]

        def body(carry, inp):
            avg, cnt = carry
            d_i, o, v = inp
            pa = lax.dynamic_slice(avg, (o[0], o[1]), (ch, cw))
            pc = lax.dynamic_slice(cnt, (o[0], o[1]), (ch, cw))
            avg = lax.dynamic_update_slice(avg, pa + d_i * blur * v,
                                           (o[0], o[1]))
            cnt = lax.dynamic_update_slice(cnt, pc + blur * v, (o[0], o[1]))
            return (avg, cnt), None

        (avg, cnt), _ = lax.scan(body, (avg, cnt), (d, offs, valid))
        return avg, cnt

    return prep, accum


# Measured full-tile-graph cost per sub-batch call on the v5e (bf16,
# model_hw 384x512; scripts/ab_pf_subbatch.py). Sub-linear in B — batch 8
# packs the 8-sublane dim — so the best width for a pass is NOT always the
# slot-minimizing one (n=15: 2x8 with one pad beats 3x5 exact).
_SUBBATCH_MS = {1: 58.0, 2: 85.0, 3: 112.0, 4: 140.9, 5: 174.8, 6: 207.8,
                7: 221.0, 8: 234.9}


def _plan_tile_batch(n_tiles: int, cap: int) -> int:
    """Sub-batch width for an n_tiles pass: minimize predicted pass cost
    ceil(n/T) * cost(T) over T <= cap, using the measured per-call table
    (p49's 16/12/12/9 passes plan to T=8/6/6/3 — 242 ms/frame less tile
    work than uniform T=8's 64 padded slots)."""
    # above the measured table extrapolate at the B6->B8 marginal rate
    # (13.4 ms/tile), so an explicit tile_batch=16 cap plans 16-wide calls
    cost = lambda t: _SUBBATCH_MS.get(t, 234.9 + 13.4 * (t - 8))
    return min(range(1, min(cap, n_tiles) + 1),
               key=lambda t: (-(-n_tiles // t) * cost(t), -t))


@functools.lru_cache(maxsize=None)
def _pass_geometry(tiles_key, resolution, crop, model_hw, tile_batch):
    """Stacked per-pass geometry as DEVICE constants: tile offsets, area
    maps, bboxes and validity, padded to [S, tile_batch, ...] sub-batches
    (edge-pad with the last tile). Cached per pass geometry, so a video pays
    the ~13 MB/pass H2D exactly once — the fused pass runner then needs no
    per-frame host->device constant traffic at all."""
    areas, bbox_np = _pass_areas(tiles_key, resolution, crop, model_hw)
    n = len(tiles_key)
    s = (n + tile_batch - 1) // tile_batch
    idx = np.minimum(np.arange(s * tile_batch), n - 1)
    valid = (np.arange(s * tile_batch) < n).astype(np.float32)
    offs = np.asarray(tiles_key, np.int32)[idx]
    areas_s = areas[idx].reshape(s, tile_batch, *areas.shape[1:])
    return (jnp.asarray(offs.reshape(s, tile_batch, 2)),
            areas_s,
            jnp.asarray(bbox_np[idx].reshape(s, tile_batch, 4)),
            jnp.asarray(valid.reshape(s, tile_batch)))


@functools.lru_cache(maxsize=None)
def _fused_pass_runner(crop, model_hw, compute_dtype, precision):
    """One jitted call per PASS: tile prep (crop + prior extraction), the
    fine+fusion graph, and blur-masked accumulation, with a lax.scan over the
    fixed-size sub-batches INSIDE the jit. The compile unit stays one
    sub-batch wide (the flat 16-tile graph crashes the remote TPU compiler —
    scripts/ab_pf_tilebatch.py), but a p49 frame drops from ~26 dispatches
    (prep+tiles+accum per sub-batch) to coarse + 4 pass calls, removing the
    per-dispatch tunnel RTTs that dominated the host-orchestration ~2 s
    (scripts/profile_pf_stages.py). Math and accumulation order are identical
    to the per-sub-batch path (prior frozen at pass start; sequential
    blur-masked scatter); outputs agree to f32 ulp level (XLA fuses the
    former jit-boundary ops differently inside the scan)."""
    from jax import lax
    ch, cw = crop

    @functools.partial(jax.jit, static_argnames=("use_prior",))
    def run_pass(params, img_t, img_lr, avg, cnt, cached_feats, cached_depth,
                 offs, areas, bbox, valid, blur, use_prior):
        # offs [S, T, 2] i32; areas [S, T, mh, mw, 1]; bbox [S, T, 4];
        # valid [S, T] — S sub-batches of T tiles (device constants)
        s, t = offs.shape[:2]
        flat = offs.reshape(s * t, 2)
        crops = jax.vmap(
            lambda o: lax.dynamic_slice(img_t, (o[0], o[1], 0), (ch, cw, 3))
        )(flat)
        crops = resize2d(crops, model_hw, method="linear",
                         align_corners=True).reshape(s, t, *model_hw, 3)
        if use_prior:
            # the running-average prior is FROZEN at the start of the pass
            # (reference semantics), so every sub-batch's prior comes from
            # the avg/cnt carried INTO the pass
            ratio = avg / cnt
            pr = jax.vmap(
                lambda o: lax.dynamic_slice(ratio, (o[0], o[1]), (ch, cw))
            )(flat)[..., None]
            prior = resize2d(pr, model_hw, method="linear",
                             align_corners=True).reshape(s, t, *model_hw, 1)
        else:
            prior = jnp.zeros((s, 1), jnp.float32)  # scan placeholder

        cache = (cached_feats, cached_depth)

        def body(carry, inp):
            avg, cnt = carry
            crops_s, prior_s, areas_s, bbox_s, offs_s, valid_s = inp
            d, _ = patchfusion_tiles(
                params, crops_s.astype(compute_dtype),
                img_lr.astype(compute_dtype), bbox_s, areas_s,
                prior_s if use_prior else None, cache,
                model_hw=model_hw, precision=precision)
            d = resize2d(d.astype(jnp.float32)[..., None], crop,
                         method="linear", align_corners=True)[..., 0]

            def acc(c2, tt):
                avg, cnt = c2
                d_i, o, v = tt
                pa = lax.dynamic_slice(avg, (o[0], o[1]), (ch, cw))
                pc = lax.dynamic_slice(cnt, (o[0], o[1]), (ch, cw))
                avg = lax.dynamic_update_slice(avg, pa + d_i * blur * v,
                                               (o[0], o[1]))
                cnt = lax.dynamic_update_slice(cnt, pc + blur * v,
                                               (o[0], o[1]))
                return (avg, cnt), None

            (avg, cnt), _ = lax.scan(acc, (avg, cnt), (d, offs_s, valid_s))
            return (avg, cnt), None

        (avg, cnt), _ = lax.scan(body, (avg, cnt),
                                 (crops, prior, areas, bbox, offs, valid))
        return avg, cnt

    return run_pass


@functools.lru_cache(maxsize=None)
def _tile_runner(compute_dtype, model_hw, precision):
    """Jitted coarse + tile passes, cached by static config so video drivers
    do not re-trace per frame. Two separate compile units: the whole-image
    coarse pass runs once per image; each fixed-size tile sub-batch then runs
    through the fine+fusion graph with the coarse results as inputs."""

    @jax.jit
    def run_coarse(params, img_lr):
        return coarse_pass(params, img_lr.astype(compute_dtype),
                           model_hw=model_hw, precision=precision)

    @jax.jit
    def run_tiles(params, crops, img_lr, bbox, areas, prior, cached_feats,
                  cached_depth):
        cache = None if cached_feats is None else (cached_feats, cached_depth)
        depths, cache = patchfusion_tiles(
            params, crops.astype(compute_dtype), img_lr.astype(compute_dtype),
            bbox, areas, prior, cache, model_hw=model_hw, precision=precision)
        return depths.astype(jnp.float32), cache

    return run_coarse, run_tiles


def infer(params, image_float, mode: str = "p16", precision=None,
          compute_dtype=jnp.float32, model_hw=MODEL_HW,
          tile_batch: int | None = None, fused: bool | None = None,
          as_numpy: bool = True):
    """Full PatchFusion inference on one image [H, W, 3] float in [0,1].

    Returns depth [H, W] float32 at the input resolution. On a multi-chip
    mesh each pass's tile batch is edge-padded to the mesh size and sharded
    over the `data` axis (SURVEY.md §2.10: tiles across chips); the coarse
    cache and params ride replicated.

    as_numpy=False returns the DEVICE array without blocking: the video band
    dispatches the next frame's passes while this frame still computes
    (every per-frame fetch through the tunnel otherwise serializes the
    pipeline on a full round trip).
    """
    from prisma_tpu.parallel import (data_mesh_or_none, replicate,
                                     shard_batch_padded)

    H, W = image_float.shape[:2]
    resolution = pick_resolution(H, W)
    crop = (resolution[0] // 4, resolution[1] // 4)

    # uint8 frames upload as-is (4x less H2D than host-converted f32 — the
    # tunnel makes this a large share of s/frame) and normalize on device;
    # identical f32 arithmetic either way.
    img_dev = jnp.asarray(image_float)
    if img_dev.dtype == jnp.uint8:
        img_dev = img_dev.astype(jnp.float32) / 255.0
    else:
        img_dev = img_dev.astype(jnp.float32)
    img_t = resize2d(img_dev[None],
                     resolution, method="cubic", align_corners=True)[0]
    img_lr = resize2d(img_t[None], model_hw, method="linear",
                      align_corners=True)

    blur = _blur_mask_dev(tuple(crop))
    mesh = data_mesh_or_none()
    run_coarse, run_tiles = _tile_runner(compute_dtype, tuple(model_hw),
                                         precision)
    prep, accum = _pass_runner(crop, tuple(model_hw))
    # tiles per fine-pass call: bounds both HBM peak and the size of the
    # compile unit. The default 8 exists because the one-jit 16-tile p49 pass
    # crashes the REMOTE (tunneled) TPU compiler; on a local chip pass
    # tile_batch=16 (or set PRISMA_PF_TILE_BATCH in the band) to fuse the
    # half-offset passes into one executable.
    if tile_batch is None:
        tile_batch = 8

    img_t_dev = img_t
    avg_map = jnp.zeros(resolution, jnp.float32)
    count_map = jnp.zeros(resolution, jnp.float32)
    cache = tuple(run_coarse(params, img_lr))
    # single chip: whole passes run as ONE jitted call each (sub-batch scan
    # inside; geometry lives on device across frames). The mesh path keeps
    # per-sub-batch dispatches so tile batches can shard over the data axis.
    # `fused` overrides the auto choice (escape hatch + parity testing).
    if fused is None:
        fused = mesh is None
    fused_pass = _fused_pass_runner(
        crop, tuple(model_hw), compute_dtype, precision) if fused else None

    passes = [(0, 0)]
    if mode != "p16":
        passes += [(crop[1] // 2, 0), (0, crop[0] // 2),
                   (crop[1] // 2, crop[0] // 2)]
    # rN: N extra random tiles after the half-offset passes (reference
    # depth_patchfusion.py:108-111 / infer_user.random_tile), processed in
    # batches with the running-average prior refreshed per batch
    n_random = int(mode[1:]) if mode.startswith("r") and mode[1:].isdigit() else 0
    rng_tiles = np.random.default_rng(2024)
    rand_passes = [None] * ((n_random + tile_batch - 1) // tile_batch) \
        if n_random else []

    for pass_i, pass_spec in enumerate(passes + rand_passes):
        if pass_spec is None:
            remaining = n_random - (pass_i - len(passes)) * tile_batch
            count = min(tile_batch, remaining)
            tiles = [(int(rng_tiles.integers(0, resolution[0] - crop[0] + 1)),
                      int(rng_tiles.integers(0, resolution[1] - crop[1] + 1)))
                     for _ in range(count)]
        else:
            off_x, off_y = pass_spec
            tiles = _tile_grid(resolution, crop, off_x, off_y)
        if fused_pass is not None:
            # per-pass width from the measured cost model: tile_batch is the
            # CAP (compile-unit bound), not the width — p49's 12/9-tile
            # passes run 6/3-wide instead of padding to 8-slot sub-batches
            offs_s, areas_s, bbox_s, valid_s = _pass_geometry(
                tuple(tiles), resolution, crop, tuple(model_hw),
                _plan_tile_batch(len(tiles), tile_batch))
            avg_map, count_map = fused_pass(
                params, img_t_dev, img_lr, avg_map, count_map,
                cache[0], cache[1], offs_s, areas_s, bbox_s, valid_s, blur,
                use_prior=pass_i > 0)
            continue

        areas_dev, bbox_np = _pass_areas(tuple(tiles), resolution, crop,
                                         tuple(model_hw))
        n_tiles = len(tiles)

        # fixed-size sub-batches (edge-pad the tail with the last tile). The
        # prior reads avg/count FROZEN at the start of the pass (reference
        # semantics: the running average updates between passes, not within),
        # so prep for every sub-batch before any accumulation.
        batches = []
        for s in range(0, n_tiles, tile_batch):
            idx = list(range(s, min(s + tile_batch, n_tiles)))
            valid = np.zeros((tile_batch,), np.float32)
            valid[:len(idx)] = 1.0
            while len(idx) < tile_batch:
                idx.append(idx[-1])
            offs = jnp.asarray([tiles[i] for i in idx], jnp.int32)
            crops_a, prior_a = prep(img_t_dev, avg_map, count_map, offs,
                                    pass_i > 0)
            areas_a = areas_dev[np.asarray(idx)]
            bbox_a = jnp.asarray(bbox_np[np.asarray(idx)])
            if mesh is not None:
                crops_a, _ = shard_batch_padded(crops_a, mesh)
                areas_a, _ = shard_batch_padded(areas_a, mesh)
                bbox_a, _ = shard_batch_padded(bbox_a, mesh)
                if prior_a is not None:
                    prior_a, _ = shard_batch_padded(prior_a, mesh)
            batches.append((crops_a, areas_a, bbox_a, prior_a, offs,
                            jnp.asarray(valid)))
        for crops_a, areas_a, bbox_a, prior_a, offs, valid in batches:
            d, _cache = run_tiles(params, crops_a, img_lr, bbox_a, areas_a,
                                  prior_a, cache[0], cache[1])
            # mesh padding may have grown the batch beyond tile_batch; the
            # tail rows are duplicates of the last tile and are dropped
            d = d[:offs.shape[0]]
            if mesh is not None:
                # `accum`'s scan is sequential over tiles, so it needs the
                # whole depth batch on every device. Gather it with an
                # explicit device_put reshard rather than letting GSPMD
                # compile an all-gather into the executable: back-to-back
                # SPMD executables with compiled collectives deadlock the
                # XLA:CPU in-process rendezvous (8-virtual-device test mesh),
                # and on real chips the copy is the same bytes over ICI.
                d = jax.device_put(d, replicate(mesh))
            avg_map, count_map = accum(avg_map, count_map, d, offs, valid,
                                       blur)

    depth = avg_map / count_map
    out = resize2d(depth[None, :, :, None], (H, W),
                   method="linear")[0, :, :, 0]
    return np.asarray(out) if as_numpy else out


# ---------------------------------------------------------------------------
# Random init (tests)
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, beit_depth: int = 24, model_hw=MODEL_HW,
                dtype=jnp.float32) -> dict:
    from prisma_tpu.models import zoed as jzoed
    rngs = iter(jax.random.split(rng, 2048))

    def conv(kh, kw, cin, cout, bias=True):
        p = {"w": (jax.random.normal(next(rngs), (kh, kw, cin, cout))
                   * ((kh * kw * cin) ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def dconv_bn(cin, cout, mid=None):
        mid = mid or cout
        return {"conv1": conv(3, 3, cin, mid, bias=False),
                "bn1": {"scale": jnp.ones((mid,), dtype),
                        "bias": jnp.zeros((mid,), dtype)},
                "conv2": conv(3, 3, mid, cout, bias=False),
                "bn2": {"scale": jnp.ones((cout,), dtype),
                        "bias": jnp.zeros((cout,), dtype)}}

    def dconv(cin, cout, mid=None):
        mid = mid or cin
        return {"conv1": conv(3, 3, cin, mid), "conv2": conv(3, 3, mid, cout)}

    def lin(din, dout):
        return {"w": (jax.random.normal(next(rngs), (din, dout))
                      * (din ** -0.5)).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    def g2l(dim, heads, depth, num_patches):
        blocks = []
        for _ in range(depth):
            blocks.append({
                "norm1": {"scale": jnp.ones((dim,), dtype),
                          "bias": jnp.zeros((dim,), dtype)},
                "qkv": lin(dim, 3 * dim),
                "proj": lin(dim, dim),
                "rel_pos_table": (jax.random.normal(next(rngs), (23 * 23, heads))
                                  * 0.02).astype(dtype),
                "norm2": {"scale": jnp.ones((dim,), dtype),
                          "bias": jnp.zeros((dim,), dtype)},
                "mlp": {"fc1": lin(dim, 4 * dim), "fc2": lin(4 * dim, dim)},
            })
        return {"embed_proj": conv(1, 1, 1, dim),
                "absolute_pos_embed": jnp.zeros((1, num_patches, dim), dtype),
                "blocks": blocks,
                "norm": {"scale": jnp.ones((dim,), dtype),
                         "bias": jnp.zeros((dim,), dtype)}}

    zoe = lambda: jzoed.init_params(next(rngs), depth=beit_depth, dtype=dtype)
    g2l_dims = [256, 256, 256, 256, 256, 32]  # g2l5..g2l0 input dims
    g2l_patches = [h * w for (h, w) in level_hw(model_hw)]
    return {
        "coarse": zoe(),
        "fine": zoe(),
        "coarse_input_proj": [conv(3, 3, BTLNCK if i != 4 else N_MIDAS_OUT,
                                   BTLNCK if i != 4 else N_MIDAS_OUT)
                              for i in range(6)],
        "fine_input_proj": [conv(3, 3, BTLNCK if i != 4 else N_MIDAS_OUT,
                                 BTLNCK if i != 4 else N_MIDAS_OUT)
                            for i in range(6)],
        "fusion_conv": [conv(3, 3, 2 * BTLNCK if i != 5 else 2 * N_MIDAS_OUT,
                             BTLNCK if i != 5 else N_MIDAS_OUT)
                        for i in range(6)],
        "unet": {
            "inc": dconv_bn(5, 32),
            "down": [dconv_bn(32, 256)] + [dconv_bn(256, 256) for _ in range(4)],
            "up": [dconv(256 + 256 + 256, 256, 384) for _ in range(4)]
                  + [dconv(256 + 32 + 256, 32, 272)],
            "conv": [dconv(512, 256, 256) for _ in range(5)] + [dconv(64, 32, 32)],
            "g2l": [g2l(g2l_dims[i], G2L_SPECS[i][0], G2L_SPECS[i][1],
                        g2l_patches[i]) for i in range(6)],
        },
        "head": jzoe.init_head_params(next(rngs), BTLNCK, dtype=dtype),
    }
