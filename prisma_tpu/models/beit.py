"""BEiT-Large backbone (MiDaS DPT_BEiT_L_384 core), TPU-native.

Behavior target: the torch.hub MiDaS `DPT_BEiT_L_384` used by depth_zoedepth
(ZoeD_N, `bands/depth_zoedepth.py:31-35` -> `zoedepth/models/zoedepth/
config_zoedepth.json: midas_model_type DPT_BEiT_L_384`) and by PatchFusion's
coarse/fine ZoeDepthCustom cores. The hub code is not vendored in the
reference tree; implemented from the published timm BEiT + MiDaS backbone
adapter:

- patch-16 ViT-L without absolute position embeddings;
- per-block decomposed relative position bias: a learned table over the
  (2H-1)x(2W-1) relative-offset grid plus 3 cls entries, indexed by a
  precomputed relative-position index; MiDaS resizes the square pretraining
  table to rectangular windows with bilinear interpolation;
- attention with q/v biases only (k bias fixed at zero), LayerScale
  (gamma_1/gamma_2) on both residual branches;
- DPT decoder identical to DPT-Large ('project' readout, hooks 5/11/17/23).

ZoeDepth feeds fixed 384x512 inputs (img_size in config_zoedepth.json), so the
rel-pos interpolation resolves to one static table per model instance.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import vit as pvit
from prisma_tpu.ops import nn as pnn

BEIT_EMBED = 1024
BEIT_DEPTH = 24
BEIT_HEADS = 16
BEIT_PRETRAIN_WINDOW = (24, 24)  # 384/16
HOOKS = (5, 11, 17, 23)


def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """BEiT relative-position index for a (wh, ww) token window + cls.

    Returns [wh*ww + 1, wh*ww + 1] int indices into a table of size
    (2*wh - 1) * (2*ww - 1) + 3 (last 3: cls->token, token->cls, cls->cls).
    """
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    # timm beit convention: the 3 cls entries are the last table rows
    #   [0, 0:] = num_relative_distance - 3, [0:, 0] = ... - 2, [0, 0] = ... - 1
    idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel
    idx[0:, 0] = num_rel + 1
    idx[0, 0] = num_rel + 2
    return idx


def resize_rel_pos_table(table, old_window, new_window):
    """MiDaS beit adapter: bilinearly resample the (2h-1)x(2w-1) sub-table to a
    new window; the 3 cls entries pass through unchanged. jnp-traceable."""
    oh, ow = 2 * old_window[0] - 1, 2 * old_window[1] - 1
    nh, nw = 2 * new_window[0] - 1, 2 * new_window[1] - 1
    table = jnp.asarray(table)
    if (oh, ow) == (nh, nw):
        return table
    from prisma_tpu.ops.resize import resize2d
    sub = table[: oh * ow].reshape(oh, ow, -1)
    new_sub = resize2d(sub.astype(jnp.float32), (nh, nw), method="linear")
    return jnp.concatenate([new_sub.reshape(nh * nw, -1), table[oh * ow:]],
                           axis=0)


def _beit_attention(p, x, num_heads: int, rel_bias, precision=None):
    """BEiT attention: q/v biases (k zero), additive relative position bias."""
    B, N, D = x.shape
    head = D // num_heads
    qkv = jnp.dot(x, p["qkv_w"], precision=precision)  # [B, N, 3D], no bias
    qkv = qkv.reshape(B, N, 3, num_heads, head)
    q = qkv[:, :, 0] + p["q_bias"].reshape(num_heads, head)
    k = qkv[:, :, 1]
    v = qkv[:, :, 2] + p["v_bias"].reshape(num_heads, head)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * (head ** -0.5), k,
                      precision=precision)
    # cast at the joint: the interpolated bias table stays f32 for accuracy,
    # but adding it raw would promote the whole stack to f32 under bf16 params
    attn = attn + rel_bias[None].astype(attn.dtype)  # [heads, N, N]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, precision=precision)
    return pnn.linear(p["proj"], out.reshape(B, N, D), precision=precision)


def _beit_block(p, x, num_heads: int, rel_bias, precision=None):
    y = _beit_attention(p["attn"], pnn.layer_norm(p["norm1"], x), num_heads,
                        rel_bias, precision)
    x = x + p["gamma1"] * y
    y = pnn.mlp(p["mlp"], pnn.layer_norm(p["norm2"], x), precision=precision)
    return x + p["gamma2"] * y


def get_intermediate_layers(params, x, hooks=None, precision=None):
    """x [B, H, W, 3] normalized (H, W multiples of 16) -> hook outputs
    [(tokens, cls)] at blocks 5/11/17/23 (raw, no final norm). Shallow models
    (tests) default to their last 4 blocks."""
    B, H, W, _ = x.shape
    depth = len(params["blocks"])
    if hooks is None:
        hooks = HOOKS if depth >= 24 else tuple(range(depth - 4, depth))
    wh, ww = H // 16, W // 16
    tokens = pvit.patch_embed(params["patch_embed"], x, 16, precision)
    cls = jnp.broadcast_to(params["cls_token"],
                           (B, 1, params["cls_token"].shape[-1]))
    tokens = jnp.concatenate([cls.astype(tokens.dtype), tokens], axis=1)

    idx = relative_position_index(wh, ww)
    outputs = []
    for i, bp in enumerate(params["blocks"]):
        table = resize_rel_pos_table(bp["rel_pos_table"],
                                     BEIT_PRETRAIN_WINDOW, (wh, ww))
        rel_bias = table[jnp.asarray(idx)].transpose(2, 0, 1)  # [heads, N, N]
        heads = bp["rel_pos_table"].shape[-1]
        tokens = _beit_block(bp, tokens, heads, rel_bias, precision)
        if i in hooks:
            outputs.append((tokens[:, 1:], tokens[:, 0]))
    return outputs


def init_params(rng: jax.Array, depth: int = BEIT_DEPTH, embed: int = BEIT_EMBED,
                heads: int = BEIT_HEADS, dtype=jnp.float32) -> dict:
    rngs = iter(jax.random.split(rng, 8 * depth + 8))
    D = embed
    num_rel = (2 * 24 - 1) * (2 * 24 - 1) + 3

    def lin(key, din, dout):
        return {"w": (jax.random.normal(key, (din, dout)) * (din ** -0.5)).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    params = {
        "patch_embed": lin(next(rngs), 16 * 16 * 3, D),
        "cls_token": (jax.random.normal(next(rngs), (1, 1, D)) * 0.02).astype(dtype),
        "blocks": [],
    }
    for _ in range(depth):
        params["blocks"].append({
            "norm1": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "attn": {
                "qkv_w": (jax.random.normal(next(rngs), (D, 3 * D))
                          * (D ** -0.5)).astype(dtype),
                "q_bias": jnp.zeros((D,), dtype),
                "v_bias": jnp.zeros((D,), dtype),
                "proj": lin(next(rngs), D, D),
            },
            "rel_pos_table": (jax.random.normal(next(rngs), (num_rel, heads))
                              * 0.02).astype(dtype),
            "gamma1": jnp.full((D,), 0.1, dtype),
            "norm2": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "mlp": {"fc1": lin(next(rngs), D, 4 * D),
                    "fc2": lin(next(rngs), 4 * D, D)},
            "gamma2": jnp.full((D,), 0.1, dtype),
        })
    return params
