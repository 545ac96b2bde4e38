"""Depth-Anything (relative): DINOv2 ViT + DPT head, with the full pre/post chain.

Parity target: `bands/d_anything/dpt.py:139-166` (DPT_DINOv2.forward: last-4
intermediate layers -> DPTHead -> bilinear(align_corners=True) to model input
size -> relu) and the driver's pre/post (`bands/depth_anything.py:62-74,122-133`:
/255 -> keep-AR lower-bound 518 multiple-of-14 INTER_CUBIC resize -> ImageNet
normalize -> model -> bilinear(align_corners=False) back to the frame size).

The whole chain — resize, normalize, ViT, DPT, resize-back, plus the video
heatmap epilogue — is one jitted function over a batch of frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from prisma_tpu.models import dpt, vit
from prisma_tpu.ops import encode as enc
from prisma_tpu.ops.resize import dpt_input_size, resize2d

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init_params(rng: jax.Array, encoder: str = "vitl", dtype=jnp.float32) -> dict:
    cfg = vit.VIT_CONFIGS[encoder]
    k1, k2 = jax.random.split(rng)
    return {"vit": vit.init_params(k1, cfg, dtype),
            "dpt": dpt.init_params(k2, cfg.embed_dim, dtype=dtype)}


def forward(params: dict, x: jnp.ndarray, encoder: str = "vitl", precision=None):
    """Model forward on a prepared input [B, h', w', 3] -> depth [B, h', w']."""
    cfg = vit.VIT_CONFIGS[encoder]
    B, H, W, _ = x.shape
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    feats = vit.get_intermediate_layers(params["vit"], x, cfg, n=4,
                                        precision=precision)
    depth = dpt.dpt_head(params["dpt"], feats, ph, pw, precision=precision)
    depth = resize2d(depth[..., None], (H, W), method="linear",
                     align_corners=True)[..., 0]
    return jax.nn.relu(depth)


def infer(params: dict, frames_u8: jnp.ndarray, encoder: str = "vitl",
          precision=None, compute_dtype=jnp.float32,
          target: int = 518) -> jnp.ndarray:
    """Full driver-equivalent inference: uint8 frames [B, H, W, 3] -> depth [B, H, W].

    target: ViT input budget (lower_bound resize target, reference
    dpt.py:image2tensor 518); tests shrink it via the band's --img_size arg.
    """
    B, H, W, _ = frames_u8.shape
    w2, h2 = dpt_input_size(W, H, target=target)
    # pre/post resizes run in the compute dtype: on TPU the 1080p resampling
    # matmuls would otherwise dominate the step (f32 multi-pass MXU)
    img = frames_u8.astype(compute_dtype) / 255.0
    img = resize2d(img, (h2, w2), method="cubic", align_corners=False)
    mean = jnp.asarray(IMAGENET_MEAN, compute_dtype)
    std = jnp.asarray(IMAGENET_STD, compute_dtype)
    img = (img - mean) / std
    depth = forward(params, img, encoder, precision)
    depth = resize2d(depth[..., None], (H, W), method="linear",
                     align_corners=False)[..., 0]
    return depth.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("encoder", "flip",
                                             "compute_dtype", "target"))
def infer_video_batch(params: dict, frames_u8: jnp.ndarray, encoder: str = "vitl",
                      flip: bool = True, compute_dtype=jnp.float32,
                      target: int = 518):
    """Batched video step with fused heatmap epilogue.

    Returns (heat_rgb_u8 [B, H, W, 3], mins [B], maxs [B]) — the mp4 frame plus
    the per-frame CSV stats (reference depth_anything.py:214-221 semantics:
    per-frame min/max normalize, optional flip, heat_to_rgb, no edge desat).
    """
    depth = infer(params, frames_u8, encoder, compute_dtype=compute_dtype,
                  target=target)
    dmin = jnp.min(depth, axis=(1, 2))
    dmax = jnp.max(depth, axis=(1, 2))
    norm = (depth - dmin[:, None, None]) / (dmax - dmin)[:, None, None]
    if flip:
        norm = 1.0 - norm
    rgb = jnp.floor(enc.heat_to_rgb(norm) * 255.0).astype(jnp.uint8)
    return rgb, dmin, dmax
