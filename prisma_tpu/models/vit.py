"""DINOv2-style Vision Transformer (patch-14), TPU-native.

Behavioral parity target: the reference's vendored DINOv2
(`bands/d_anything/torchhub/facebookresearch_dinov2_main/vision_transformer.py` and
`dinov2/layers/*`): cls token + bicubic-interpolated position embeddings (the
w0+0.1 scale-factor trick, vision_transformer.py:179-205), pre-norm blocks with
LayerScale, exact-GELU MLP, final LayerNorm, `get_intermediate_layers(n)` taking
the last n blocks (vision_transformer.py:239-252).

TPU-first design choices vs the torch original:
- patch embedding as reshape + one matmul (MXU) instead of a 14x14 conv;
- position-embedding interpolation as two dense resampling matmuls
  (`ops.resize`), traced statically per input shape;
- attention runs through `ops.nn.attention` (XLA-fused) or the Pallas flash
  kernel at production batch sizes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.ops import nn as pnn
from prisma_tpu.ops.resize import resize2d_nchw


@dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    mlp_ratio: int = 4
    base_img_size: int = 518  # pos-embed grid = base_img_size // patch_size
    layerscale: bool = True
    interpolate_offset: float = 0.1

    @property
    def pos_grid(self) -> int:
        return self.base_img_size // self.patch_size


VIT_CONFIGS = {
    "vits": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "vitb": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "vitl": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
}


def init_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    """Random-init parameter tree (tests / shape reference; real weights come
    from the torch checkpoint converter)."""
    keys = iter(jax.random.split(rng, 6 + 16 * cfg.depth))
    D = cfg.embed_dim
    P = cfg.patch_size
    N = cfg.pos_grid ** 2

    def lin(key, din, dout):
        return {"w": (jax.random.normal(key, (din, dout)) * (din ** -0.5)).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    params = {
        "patch_embed": lin(next(keys), P * P * 3, D),
        "cls_token": (jax.random.normal(next(keys), (1, 1, D)) * 1e-6).astype(dtype),
        "pos_embed": (jax.random.normal(next(keys), (1, N + 1, D)) * 0.02).astype(dtype),
        "blocks": [],
        "norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }
    for _ in range(cfg.depth):
        params["blocks"].append({
            "norm1": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "attn": {"qkv": lin(next(keys), D, 3 * D), "proj": lin(next(keys), D, D)},
            "ls1": jnp.ones((D,), dtype),
            "norm2": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "mlp": {"fc1": lin(next(keys), D, cfg.mlp_ratio * D),
                    "fc2": lin(next(keys), cfg.mlp_ratio * D, D)},
            "ls2": jnp.ones((D,), dtype),
        })
    return params


def patch_embed(params, x, patch: int, precision=None):
    """[B, H, W, 3] -> [B, (H/p)*(W/p), D] via reshape + matmul.

    Patch pixels are flattened in (kh, kw, c) order to match the torch conv
    weight layout after converter transpose.
    """
    B, H, W, C = x.shape
    ph, pw = H // patch, W // patch
    x = x.reshape(B, ph, patch, pw, patch, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, ph * pw, patch * patch * C)
    return pnn.linear(params, x, precision=precision)


def interpolated_pos_embed(pos_embed: jnp.ndarray, ph: int, pw: int,
                           cfg: ViTConfig, method: str = "cubic") -> jnp.ndarray:
    """Resample the patch pos-embed grid to (ph, pw); cls stays.

    method='cubic': DINOv2 scale-factor bicubic (w0+0.1 trick).
    method='linear': MiDaS _resize_pos_embed bilinear (align_corners=False).
    """
    g = cfg.pos_grid
    if ph == pw == g:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, g, g, -1).transpose(0, 3, 1, 2)
    if method == "cubic":
        off = cfg.interpolate_offset
        scale = ((ph + off) / g, (pw + off) / g)
        patch_pe = resize2d_nchw(patch_pe.astype(jnp.float32), (ph, pw),
                                 method="cubic", align_corners=False, scale=scale)
    else:
        patch_pe = resize2d_nchw(patch_pe.astype(jnp.float32), (ph, pw),
                                 method="linear", align_corners=False)
    patch_pe = patch_pe.transpose(0, 2, 3, 1).reshape(1, ph * pw, -1)
    return jnp.concatenate([cls_pe, patch_pe.astype(pos_embed.dtype)], axis=1)


def block_forward(p, x, num_heads: int, precision=None):
    y = pnn.attention(p["attn"], pnn.layer_norm(p["norm1"], x), num_heads,
                      precision=precision)
    x = x + (p["ls1"] * y if "ls1" in p else y)  # LayerScale optional (timm ViT)
    y = pnn.mlp(p["mlp"], pnn.layer_norm(p["norm2"], x), precision=precision)
    return x + (p["ls2"] * y if "ls2" in p else y)


def get_intermediate_layers(params: dict, x: jnp.ndarray, cfg: ViTConfig,
                            n: int = 4, indices=None, norm: bool = True,
                            pos_embed_method: str = "cubic", precision=None):
    """Run the ViT, returning [(patch_tokens, cls_token)] for selected blocks.

    Default (DINOv2 semantics): the last n blocks, each through the final
    LayerNorm. With explicit `indices` + norm=False this also serves timm-style
    forward hooks (MiDaS DPT: raw block outputs at fixed indices).
    pos_embed_method: 'cubic' (DINOv2 scale-factor bicubic) or 'linear'
    (MiDaS _resize_pos_embed bilinear).
    """
    B, H, W, _ = x.shape
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    tokens = patch_embed(params["patch_embed"], x, cfg.patch_size, precision)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls.astype(tokens.dtype), tokens], axis=1)
    tokens = tokens + interpolated_pos_embed(params["pos_embed"], ph, pw, cfg,
                                             method=pos_embed_method)

    take = set(indices) if indices is not None \
        else set(range(cfg.depth - n, cfg.depth))
    outputs = []
    for i, bp in enumerate(params["blocks"]):
        tokens = block_forward(bp, tokens, cfg.num_heads, precision)
        if i in take:
            out = pnn.layer_norm(params["norm"], tokens) if norm else tokens
            outputs.append((out[:, 1:], out[:, 0]))
    return outputs
