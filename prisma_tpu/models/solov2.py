"""SOLOv2 instance segmentation (ResNet-101 + FPN + dynamic-kernel head),
TPU-native with fully static shapes.

Parity target: the reference's vendored mmdet slice (SURVEY.md §2.9):
`models/dense_heads/solov2_head.py` (MaskFeatModule + SOLOV2Head + the
get_results inference path), `models/necks/fpn.py`,
`core/post_processing/matrix_nms.py`, with the solov2_r101_fpn_3x_coco config
(num_classes=80, feat_channels=512, strides [8,8,16,32,32], grids
[40,36,24,16,12], GN-32, mask stride 4; test_cfg: nms_pre=500, score_thr=0.1,
mask_thr=0.5, filter_thr=0.05, gaussian sigma=2, max_per_img=100).

TPU-first redesign of the dynamic-shape inference path (SURVEY.md §7 hard
part (c)): instead of boolean-filtering a variable number of candidates, the
head takes a fixed top-K (K = nms_pre) over all grid points x classes with
invalid slots masked to score 0; the dynamic 1x1 convolutions become ONE
[K, C] x [C, Hm*Wm] matmul on the MXU; matrix NMS runs at fixed [K, K]; the
final output is a fixed [max_per_img] instance slab with a validity mask.
Numerics match the reference wherever slots are valid.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.ops import nn as pnn
from prisma_tpu.ops.resize import resize2d
from prisma_tpu.models import resnet


@dataclass(frozen=True)
class SOLOv2Config:
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 512
    stacked_convs: int = 4
    strides: tuple = (8, 8, 16, 32, 32)
    num_grids: tuple = (40, 36, 24, 16, 12)
    mask_feat_channels: int = 128
    mask_out_channels: int = 256
    mask_stride: int = 4
    gn_groups: int = 32
    # test cfg
    nms_pre: int = 500
    score_thr: float = 0.1
    mask_thr: float = 0.5
    filter_thr: float = 0.05
    sigma: float = 2.0
    max_per_img: int = 100
    # keep-ratio resize budget (long_edge, short_edge) of the mmdet test
    # pipeline (coco_instance.py:16-30). None = test_scale's (1333, 800)
    # defaults; small budgets let dry runs compile the UNMODIFIED production
    # graph structure in seconds.
    scale: tuple | None = None


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def group_norm(p, x, groups: int, eps: float = 1e-5):
    # single-pass f32 moments: one read of the (1333, 800)-budget FPN
    # activations instead of jnp.var's second deviations pass
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups).astype(jnp.float32)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.maximum(
        jnp.mean(g * g, axis=(1, 2, 4), keepdims=True) - mu * mu, 0.0)
    g = ((g - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return g.reshape(B, H, W, C) * p["scale"] + p["bias"]


def conv_gn_relu(p, x, groups: int, precision=None):
    """mmcv ConvModule(conv -> GN -> ReLU), conv bias-free under norm."""
    return jax.nn.relu(group_norm(p["gn"], pnn.conv2d(p["conv"], x, padding=1,
                                                      precision=precision),
                                  groups))


def coord_feature(B: int, H: int, W: int, dtype=jnp.float32):
    """[-1, 1] linspace coordinate channels (x then y), mmdet generate_coordinate."""
    xs = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
    gx = jnp.broadcast_to(xs[None, :], (H, W))
    gy = jnp.broadcast_to(ys[:, None], (H, W))
    return jnp.broadcast_to(jnp.stack([gx, gy], axis=-1), (B, H, W, 2))


# ---------------------------------------------------------------------------
# FPN (lateral 1x1 + top-down nearest + 3x3 out convs + extra maxpool level)
# ---------------------------------------------------------------------------

def fpn_forward(params, feats, precision=None):
    laterals = [pnn.conv2d(p, f, precision=precision)
                for p, f in zip(params["lateral"], feats)]
    for i in range(len(laterals) - 1, 0, -1):
        up = laterals[i]
        B, H, W, C = up.shape
        up = jnp.broadcast_to(up[:, :, None, :, None, :],
                              (B, H, 2, W, 2, C)).reshape(B, H * 2, W * 2, C)
        th, tw = laterals[i - 1].shape[1:3]
        laterals[i - 1] = laterals[i - 1] + up[:, :th, :tw]
    outs = [pnn.conv2d(p, lat, padding=1, precision=precision)
            for p, lat in zip(params["out"], laterals)]
    # extra level: max_pool2d(kernel=1, stride=2) == stride-2 subsample
    outs.append(outs[-1][:, ::2, ::2, :])
    return outs


# ---------------------------------------------------------------------------
# Mask feature head + SOLOv2 head forward
# ---------------------------------------------------------------------------

def mask_feat_forward(params, feats, cfg: SOLOv2Config, precision=None):
    """FPN P2..P5 -> unified mask features [B, H/4, W/4, mask_out_channels]."""
    g = cfg.gn_groups
    target_hw = feats[0].shape[1:3]
    total = None
    for i, branch in enumerate(params["branches"]):
        x = feats[i]
        if i == len(params["branches"]) - 1:
            B, H, W, _ = x.shape
            x = jnp.concatenate([x, coord_feature(B, H, W, x.dtype)], axis=-1)
        for j, cp in enumerate(branch):
            x = conv_gn_relu(cp, x, g, precision)
            if i > 0:
                x = resize2d(x, (x.shape[1] * 2, x.shape[2] * 2),
                             method="linear", align_corners=False)
        x = x[:, :target_hw[0], :target_hw[1]]
        total = x if total is None else total + x
    # conv_pred is a 1x1 ConvModule (conv -> GN -> ReLU)
    y = pnn.conv2d(params["pred"]["conv"], total, precision=precision)
    return jax.nn.relu(group_norm(params["pred"]["gn"], y, g))


def head_forward(params, fpn_feats, cfg: SOLOv2Config, precision=None):
    """-> (kernel_preds [lvl][B, g, g, Ck], cls_preds [lvl][B, g, g, nc],
    mask_feats [B, Hm, Wm, Cm])."""
    mask_feats = mask_feat_forward(params["mask_feat"], fpn_feats, cfg, precision)

    # resize_feats: downsample first, upsample last (solo_head.py:133-151)
    feats = list(fpn_feats)
    feats[0] = resize2d(feats[0], feats[1].shape[1:3], method="linear",
                        align_corners=False)
    feats[-1] = resize2d(feats[-1], feats[-2].shape[1:3], method="linear",
                         align_corners=False)

    kernel_preds, cls_preds = [], []
    for lvl, x in enumerate(feats):
        B, H, W, C = x.shape
        g = cfg.num_grids[lvl]
        x = jnp.concatenate([x, coord_feature(B, H, W, x.dtype)], axis=-1)
        x = resize2d(x, (g, g), method="linear", align_corners=False)
        cate = x[..., :-2]
        kern = x
        for cp in params["kernel_convs"]:
            kern = conv_gn_relu(cp, kern, cfg.gn_groups, precision)
        kern = pnn.conv2d(params["conv_kernel"], kern, padding=1,
                          precision=precision)
        for cp in params["cls_convs"]:
            cate = conv_gn_relu(cp, cate, cfg.gn_groups, precision)
        cate = pnn.conv2d(params["conv_cls"], cate, padding=1,
                          precision=precision)
        kernel_preds.append(kern)
        cls_preds.append(cate)
    return kernel_preds, cls_preds, mask_feats


# ---------------------------------------------------------------------------
# Static-shape inference (get_results equivalent)
# ---------------------------------------------------------------------------

def _point_local_max(cls_scores):
    """2x2/s1/p1 max-pool local-max NMS on [B, g, g, nc] sigmoid scores
    (solov2_head.py:616-622: keep where score equals the max over the
    up-left-inclusive 2x2 window)."""
    p = jnp.pad(cls_scores, ((0, 0), (1, 0), (1, 0), (0, 0)),
                constant_values=-jnp.inf)
    local_max = jnp.maximum(jnp.maximum(p[:, 1:, 1:], p[:, :-1, 1:]),
                            jnp.maximum(p[:, 1:, :-1], p[:, :-1, :-1]))
    return cls_scores * (local_max == cls_scores)


def matrix_nms_static(masks_flat, labels, scores, areas, valid,
                      sigma: float, precision=None):
    """Gaussian matrix NMS over a fixed candidate slab.

    masks_flat [K, M] float binary, labels/scores/areas/valid [K].
    Entries must already be sorted by score descending (invalid last).
    Returns decayed scores [K].
    """
    inter = jnp.einsum("km,lm->kl", masks_flat, masks_flat,
                       precision=precision)
    union = areas[:, None] + areas[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    K = scores.shape[0]
    triu = jnp.triu(jnp.ones((K, K), bool), k=1)
    label_eq = (labels[:, None] == labels[None, :]) & triu
    both_valid = valid[:, None] & valid[None, :]
    iou = jnp.where(label_eq & both_valid, jnp.triu(iou, k=1), 0.0)
    # compensate[i] = max IoU of suppressor-row i with anything above it
    # (reference matrix_nms.py:80-91: per-column max, then indexed by row)
    compensate = jnp.max(iou, axis=0)
    decay = jnp.exp(-sigma * iou ** 2) / jnp.exp(-sigma * compensate[:, None] ** 2)
    decay = jnp.where(label_eq & both_valid, decay, jnp.inf)
    decay_coef = jnp.min(decay, axis=0)
    # the reference min runs over ALL rows; rows with compensate==0 contribute
    # exactly 1, so the effective decay is min(1, matching-row ratios)
    decay_coef = jnp.minimum(jnp.where(jnp.isfinite(decay_coef), decay_coef,
                                       1.0), 1.0)
    return scores * decay_coef


def get_results(kernel_preds, cls_preds, mask_feats, img_hw, ori_hw,
                cfg: SOLOv2Config = SOLOv2Config(), precision=None):
    """Single-image inference -> fixed-size instance slab.

    img_hw: (h, w) of the resized (pre-pad) image; ori_hw: original frame size.
    Returns dict with masks [max_per_img, oh, ow] bool, labels, scores, valid.
    """
    nc = cfg.num_classes
    # flatten all levels: scores [P, nc], kernels [P, Ck], per-point stride [P]
    scores = jnp.concatenate(
        [_point_local_max(jax.nn.sigmoid(c))[0].reshape(-1, nc)
         for c in cls_preds], axis=0)
    kernels = jnp.concatenate(
        [k[0].reshape(-1, k.shape[-1]) for k in kernel_preds], axis=0)
    strides = np.concatenate(
        [np.full(g * g, s, np.float32)
         for g, s in zip(cfg.num_grids, cfg.strides)])
    strides = jnp.asarray(strides)

    flat = scores.reshape(-1)  # [P * nc]
    flat = jnp.where(flat > cfg.score_thr, flat, 0.0)
    K = cfg.nms_pre
    top_scores, top_idx = jax.lax.top_k(flat, K)
    point_idx = top_idx // nc
    labels = top_idx % nc
    valid = top_scores > 0.0

    # dynamic 1x1 convs as one matmul on the MXU
    Hm, Wm, Cm = mask_feats.shape[1:4]
    sel_kernels = kernels[point_idx]  # [K, Cm]
    logits = jnp.einsum("kc,chw->khw", sel_kernels,
                        mask_feats[0].transpose(2, 0, 1), precision=precision)
    mask_preds = jax.nn.sigmoid(logits)
    masks = mask_preds > cfg.mask_thr
    areas = jnp.sum(masks, axis=(1, 2)).astype(jnp.float32)
    keep = areas > strides[point_idx]
    valid = valid & keep

    maskness = jnp.where(areas > 0,
                         jnp.sum(mask_preds * masks, axis=(1, 2)) / areas, 0.0)
    scores_k = jnp.where(valid, top_scores * maskness, 0.0)

    # sort desc (invalid have score 0 and sink to the end)
    order = jnp.argsort(-scores_k)
    scores_k = scores_k[order]
    labels = labels[order]
    masks = masks[order]
    mask_preds = mask_preds[order]
    areas = areas[order]
    valid = valid[order]

    scores_k = matrix_nms_static(masks.reshape(K, -1).astype(jnp.float32),
                                 labels, scores_k, areas, valid, cfg.sigma,
                                 precision)
    valid = valid & (scores_k >= cfg.filter_thr)
    scores_k = jnp.where(valid, scores_k, 0.0)

    # final top max_per_img
    n_out = cfg.max_per_img
    out_scores, out_idx = jax.lax.top_k(scores_k, n_out)
    out_labels = labels[out_idx]
    out_valid = valid[out_idx]
    out_preds = mask_preds[out_idx]

    # upsample: x mask_stride, crop to img_hw, resize to ori_hw, threshold
    up = resize2d(out_preds[..., None],
                  (Hm * cfg.mask_stride, Wm * cfg.mask_stride),
                  method="linear", align_corners=False)[..., 0]
    up = up[:, :img_hw[0], :img_hw[1]]
    up = resize2d(up[..., None], ori_hw, method="linear",
                  align_corners=False)[..., 0]
    out_masks = up > cfg.mask_thr

    return {"masks": out_masks, "labels": out_labels, "scores": out_scores,
            "valid": out_valid}


def forward(params, image, img_hw, ori_hw, cfg: SOLOv2Config = SOLOv2Config(),
            precision=None):
    """image [1, Hp, Wp, 3] normalized+padded -> instance slab (see get_results)."""
    c2, c3, c4, c5 = resnet.forward(params["backbone"], image, precision)
    fpn = fpn_forward(params["fpn"], [c2, c3, c4, c5], precision)
    kernel_preds, cls_preds, mask_feats = head_forward(params["head"], fpn,
                                                       cfg, precision)
    return get_results(kernel_preds, cls_preds, mask_feats, img_hw, ori_hw,
                       cfg, precision)


# ---------------------------------------------------------------------------
# Preprocessing (mmdet test pipeline) + random init
# ---------------------------------------------------------------------------

IMG_MEAN = (123.675, 116.28, 103.53)
IMG_STD = (58.395, 57.12, 57.375)


def test_scale(ori_h: int, ori_w: int, long_edge: int = 1333,
               short_edge: int = 800):
    """mmdet keep-ratio rescale: (new_h, new_w) = round(dim * factor)."""
    factor = min(long_edge / max(ori_h, ori_w), short_edge / min(ori_h, ori_w))
    return int(ori_h * factor + 0.5), int(ori_w * factor + 0.5)


def preprocess(frame_u8, precision=None, dtype=None, scale=None):
    """[1, H, W, 3] uint8 RGB -> (normalized padded image, (h, w) resized).

    dtype: model compute dtype — resize+normalize stay f32 for accuracy, then
    the image casts down (bf16 on the production path) to match the params.
    scale: (long_edge, short_edge) budget; None = the (1333, 800) test cfg.
    """
    H, W = frame_u8.shape[1:3]
    h, w = test_scale(H, W) if scale is None else test_scale(H, W, *scale)
    img = resize2d(frame_u8.astype(jnp.float32), (h, w), method="linear")
    img = (img - jnp.asarray(IMG_MEAN)) / jnp.asarray(IMG_STD)
    if dtype is not None:
        img = img.astype(dtype)
    ph = -h % 32
    pw = -w % 32
    img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return img, (h, w)


def init_params(rng: jax.Array, cfg: SOLOv2Config = SOLOv2Config(),
                dtype=jnp.float32) -> dict:
    rngs = iter(jax.random.split(rng, 512))

    def conv(kh, kw, cin, cout, bias=True):
        p = {"w": (jax.random.normal(next(rngs), (kh, kw, cin, cout))
                   * ((kh * kw * cin) ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def cgn(kh, kw, cin, cout):
        return {"conv": conv(kh, kw, cin, cout, bias=False), "gn": gn(cout)}

    fc = cfg.mask_feat_channels
    branches = []
    for i in range(4):
        if i == 0:
            branches.append([cgn(3, 3, cfg.in_channels, fc)])
        else:
            chain = []
            for j in range(i):
                cin = (cfg.in_channels + (2 if i == 3 else 0)) if j == 0 else fc
                chain.append(cgn(3, 3, cin, fc))
            branches.append(chain)

    ck = cfg.mask_out_channels
    return {
        "backbone": resnet.init_params(next(rngs), 101, dtype),
        "fpn": {
            "lateral": [conv(1, 1, c, 256) for c in (256, 512, 1024, 2048)],
            "out": [conv(3, 3, 256, 256) for _ in range(4)],
        },
        "head": {
            "mask_feat": {"branches": branches,
                          "pred": {"conv": conv(1, 1, fc, ck, bias=False),
                                   "gn": gn(ck)}},
            "kernel_convs": [cgn(3, 3, cfg.in_channels + 2 if i == 0
                                 else cfg.feat_channels, cfg.feat_channels)
                             for i in range(cfg.stacked_convs)],
            "cls_convs": [cgn(3, 3, cfg.in_channels if i == 0
                              else cfg.feat_channels, cfg.feat_channels)
                          for i in range(cfg.stacked_convs)],
            "conv_kernel": conv(3, 3, cfg.feat_channels, ck),
            "conv_cls": conv(3, 3, cfg.feat_channels, cfg.num_classes),
        },
    }
