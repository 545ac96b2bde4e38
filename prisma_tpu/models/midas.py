"""MiDaS v3 DPT-Large monocular depth, TPU-native.

Behavior target: the torch.hub `intel-isl/MiDaS` `DPT_Large` model used by the
depth_midas band (`bands/depth_midas.py:34-42`): timm ViT-L/16-384 backbone
with hooks at blocks (5, 11, 17, 23) and 'project' readout, DPT decoder with
out_channels (256, 512, 1024, 1024), scale-2 fusion blocks, and the monodepth
head (conv 256->128, x2 upsample, conv->32, relu, conv->1, relu) producing
inverse relative depth at input resolution. The hub code is not vendored in
the reference tree, so this is implemented from the published architecture;
the weight converter consumes the hub checkpoint's state_dict layout.

Driver semantics (depth_midas.py:50-64): the reference applies the hub
`default_transform` (upper_bound 384 multiple-of-32 INTER_CUBIC resize +
ImageNet normalization) even for DPT_Large, then resizes the prediction back
with bicubic align_corners=True.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from prisma_tpu.models import vit as pvit
from prisma_tpu.models.dpt import _fusion
from prisma_tpu.ops import nn as pnn
from prisma_tpu.ops.resize import dpt_input_size, resize2d

MIDAS_VIT_CONFIG = pvit.ViTConfig(embed_dim=1024, depth=24, num_heads=16,
                                  patch_size=16, base_img_size=384,
                                  layerscale=False)
HOOKS = (5, 11, 17, 23)
OUT_CHANNELS = (256, 512, 1024, 1024)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _readout_project(p, tokens, cls, precision=None):
    """'project' readout: cat(token, cls) -> Linear(2D, D) -> GELU."""
    B, N, D = tokens.shape
    cls_exp = jnp.broadcast_to(cls[:, None, :], (B, N, D))
    y = pnn.linear(p, jnp.concatenate([tokens, cls_exp], axis=-1),
                   precision=precision)
    return pnn.gelu(y)


def forward(params, x, precision=None, return_features: bool = False):
    """x [B, H, W, 3] normalized, H/W multiples of 32 -> disparity [B, H, W].

    return_features exposes the MidasCore hook set (out_conv/l4_rn/r4..r1,
    reference base_models/midas.py:297-318) for the ZoeDepth family.
    """
    cfg = MIDAS_VIT_CONFIG
    B, H, W, _ = x.shape
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    feats = pvit.get_intermediate_layers(params["vit"], x, cfg,
                                         indices=HOOKS, norm=False,
                                         pos_embed_method="linear",
                                         precision=precision)
    return decoder_forward(params, feats, (B, ph, pw), precision,
                           return_features)


def decoder_forward(params, feats, bpw, precision=None,
                    return_features: bool = False):
    """Shared MiDaS DPT decoder over hooked backbone features (ViT or BEiT)."""
    B, ph, pw = bpw
    maps = []
    for i, (tokens, cls) in enumerate(feats):
        y = _readout_project(params["readout"][i], tokens, cls, precision)
        y = y.reshape(B, ph, pw, -1)
        y = pnn.conv2d(params["projects"][i], y, precision=precision)
        if i == 0:
            y = pnn.conv_transpose_blocky(params["resize0"], y, precision)
        elif i == 1:
            y = pnn.conv_transpose_blocky(params["resize1"], y, precision)
        elif i == 3:
            y = pnn.conv2d(params["resize3"], y, stride=2, padding=1,
                           precision=precision)
        maps.append(y)

    l1, l2, l3, l4 = [pnn.conv2d(params["scratch"][i], m, padding=1,
                                 precision=precision)
                      for i, m in enumerate(maps)]
    r = params["refinenet"]
    path4 = _fusion(r[3], l4, precision=precision)            # x2 upsample
    path3 = _fusion(r[2], path4, l3, precision=precision)
    path2 = _fusion(r[1], path3, l2, precision=precision)
    path1 = _fusion(r[0], path2, l1, precision=precision)

    out = pnn.conv2d(params["head0"], path1, padding=1, precision=precision)
    out = resize2d(out, (out.shape[1] * 2, out.shape[2] * 2), method="linear",
                   align_corners=True)
    out_conv_act = jax.nn.relu(pnn.conv2d(params["head2"], out, padding=1,
                                          precision=precision))
    out = jax.nn.relu(pnn.conv2d(params["head4"], out_conv_act,
                                 precision=precision))
    if return_features:
        return out[..., 0], {"out_conv": out_conv_act, "l4_rn": l4,
                             "r4": path4, "r3": path3, "r2": path2,
                             "r1": path1}
    return out[..., 0]


def infer(params, frames_u8, precision=None, compute_dtype=jnp.float32,
          target: int = 384):
    """Driver-equivalent inference: uint8 [B, H, W, 3] -> disparity [B, H, W]
    (hub default_transform prep + bicubic ac=True resize-back)."""
    B, H, W, _ = frames_u8.shape
    w2, h2 = dpt_input_size(W, H, target=target, multiple=32,
                            method="upper_bound")
    img = frames_u8.astype(jnp.float32) / 255.0
    img = resize2d(img, (h2, w2), method="cubic")
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    img = ((img - mean) / std).astype(compute_dtype)
    pred = forward(params, img, precision).astype(jnp.float32)
    return resize2d(pred[..., None], (H, W), method="cubic",
                    align_corners=True)[..., 0]


def init_params(rng: jax.Array, dtype=jnp.float32) -> dict:
    from prisma_tpu.models import dpt as pdpt
    cfg = MIDAS_VIT_CONFIG
    k1, k2, k3 = jax.random.split(rng, 3)
    vit_params = pvit.init_params(k1, cfg, dtype)
    for b in vit_params["blocks"]:
        b.pop("ls1")
        b.pop("ls2")
    dpt_params = pdpt.init_params(k2, cfg.embed_dim, features=256,
                                  out_channels=OUT_CHANNELS, dtype=dtype)
    D = cfg.embed_dim
    keys = iter(jax.random.split(k3, 8))
    readout = [{"w": (jax.random.normal(next(keys), (2 * D, D))
                      * ((2 * D) ** -0.5)).astype(dtype),
                "b": jnp.zeros((D,), dtype)} for _ in range(4)]

    def conv(key, kh, kw, cin, cout):
        return {"w": (jax.random.normal(key, (kh, kw, cin, cout))
                      * ((kh * kw * cin) ** -0.5)).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    return {
        "vit": vit_params,
        "readout": readout,
        "projects": dpt_params["projects"],
        "resize0": dpt_params["resize0"],
        "resize1": dpt_params["resize1"],
        "resize3": dpt_params["resize3"],
        "scratch": dpt_params["scratch"],
        "refinenet": dpt_params["refinenet"],
        "head0": conv(next(keys), 3, 3, 256, 128),
        "head2": conv(next(keys), 3, 3, 128, 32),
        "head4": conv(next(keys), 1, 1, 32, 1),
    }


# ---------------------------------------------------------------------------
# MiDaS v2.1 (MidasNet): resnext101_32x8d_wsl + FeatureFusionBlock decoder
# ---------------------------------------------------------------------------
# Behavior target: torch.hub intel-isl/MiDaS 'MiDaS' used by the midas2 and
# midas2-small model_versions (reference bands/depth_midas.py:26-41; both
# load the SAME MidasNet, differing only in transform target 384 vs 256).
# The hub code is not vendored; implemented from the published architecture:
# ResNeXt101 backbone, 3x3 bias-free scratch convs to 256ch, 4 fusion blocks
# (ResidualConvUnit x2 + x2 bilinear align_corners=True upsample), monodepth
# head conv->128, x2 upsample (align_corners=False), conv->32, relu, conv->1,
# relu (non_negative=True).

from prisma_tpu.models import resnet as presnet


def _rcu_v2(p, x, precision=None):
    """ResidualConvUnit: relu-conv3x3-relu-conv3x3 + skip (biased convs)."""
    y = pnn.conv2d(p["conv1"], jax.nn.relu(x), padding=1, precision=precision)
    y = pnn.conv2d(p["conv2"], jax.nn.relu(y), padding=1, precision=precision)
    return x + y


def _fusion_v2(p, x, skip=None, precision=None):
    if skip is not None:
        x = x + _rcu_v2(p["rcu1"], skip, precision)
    x = _rcu_v2(p["rcu2"], x, precision)
    return resize2d(x, (x.shape[1] * 2, x.shape[2] * 2), method="linear",
                    align_corners=True)


def midas2_forward(params, x, precision=None):
    """x [B, H, W, 3] normalized, H/W multiples of 32 -> disparity [B, H, W]."""
    c1, c2, c3, c4 = presnet.forward(params["backbone"], x, precision,
                                     groups=32)
    l1, l2, l3, l4 = [pnn.conv2d(params["scratch"][i], c, padding=1,
                                 precision=precision)
                      for i, c in enumerate((c1, c2, c3, c4))]
    r = params["refinenet"]
    path4 = _fusion_v2(r[3], l4, precision=precision)
    path3 = _fusion_v2(r[2], path4, l3, precision)
    path2 = _fusion_v2(r[1], path3, l2, precision)
    path1 = _fusion_v2(r[0], path2, l1, precision)

    out = pnn.conv2d(params["head0"], path1, padding=1, precision=precision)
    out = resize2d(out, (out.shape[1] * 2, out.shape[2] * 2), method="linear",
                   align_corners=False)
    out = jax.nn.relu(pnn.conv2d(params["head2"], out, padding=1,
                                 precision=precision))
    out = jax.nn.relu(pnn.conv2d(params["head4"], out, precision=precision))
    return out[..., 0]


def infer_v2(params, frames_u8, precision=None, compute_dtype=jnp.float32,
             target: int = 384):
    """midas2 driver-equivalent inference (hub default/small_transform prep:
    upper_bound resize to target multiple-of-32 + ImageNet normalize; bicubic
    align_corners=True resize-back, depth_midas.py:58-64)."""
    B, H, W, _ = frames_u8.shape
    w2, h2 = dpt_input_size(W, H, target=target, multiple=32,
                            method="upper_bound")
    img = frames_u8.astype(jnp.float32) / 255.0
    img = resize2d(img, (h2, w2), method="cubic")
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    img = ((img - mean) / std).astype(compute_dtype)
    pred = midas2_forward(params, img, precision).astype(jnp.float32)
    return resize2d(pred[..., None], (H, W), method="cubic",
                    align_corners=True)[..., 0]


def init_params_v2(rng: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64))

    def conv(kh, kw, cin, cout, bias=True):
        p = {"w": (jax.random.normal(next(keys), (kh, kw, cin, cout))
                   * ((kh * kw * cin) ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def rcu(c):
        return {"conv1": conv(3, 3, c, c), "conv2": conv(3, 3, c, c)}

    return {
        "backbone": presnet.init_params(next(keys), 101, dtype, groups=32,
                                        width_per_group=8),
        "scratch": [conv(3, 3, c, 256, bias=False)
                    for c in (256, 512, 1024, 2048)],
        "refinenet": [{"rcu1": rcu(256), "rcu2": rcu(256)} for _ in range(4)],
        "head0": conv(3, 3, 256, 128),
        "head2": conv(3, 3, 128, 32),
        "head4": conv(1, 1, 32, 1),
    }
