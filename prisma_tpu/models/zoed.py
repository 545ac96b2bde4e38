"""ZoeD_N (depth_zoedepth band): ZoeDepth bins head over MiDaS DPT_BEiT_L_384.

Behavior target: torch.hub `isl-org/ZoeDepth` ZoeD_N as used by
`bands/depth_zoedepth.py:31-56` — MidasCore (BEiT-L DPT, hooks
out_conv/l4_rn/r4..r1) + the bins head from `models/zoedepth.py`, with
`infer_pil`'s pad+flip augmented inference (vendored spec at
`zoedepth/models/depth_model.py:57-128`):
- reflect-pad by (3*sqrt(h/2), 3*sqrt(w/2));
- prep: resize to img_size (384, 512) bilinear align_corners=True + ImageNet
  normalize (base_models/midas.py:173-187);
- metric head output resized back (bicubic, align_corners=False) to the padded
  size, cropped, and averaged with a horizontally-flipped pass.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from prisma_tpu.models import beit as jbeit
from prisma_tpu.models import midas as jmidas
from prisma_tpu.models import zoedepth as jzoe
from prisma_tpu.ops.resize import resize2d

IMG_SIZE = (384, 512)  # config_zoedepth.json img_size for the BEiT core
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

ZOED_N_CONFIG = jzoe.ZoeDepthConfig()  # softplus / inv / mean, n_bins 64


def core_forward(params, x, precision=None):
    """BEiT DPT core: normalized [B, H, W, 3] -> (rel_depth, hook features)."""
    B, H, W, _ = x.shape
    feats = jbeit.get_intermediate_layers(params["beit"], x, precision)
    return jmidas.decoder_forward(params["decoder"], feats,
                                  (B, H // 16, W // 16), precision,
                                  return_features=True)


def _metric_once(params, img01, cfg, img_size, precision, compute_dtype):
    """One padded-resolution pass: [B, Hp, Wp, 3] in [0,1] -> [B, Hp, Wp]."""
    B, Hp, Wp, _ = img01.shape
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = resize2d(img01, img_size, method="linear", align_corners=True)
    x = ((x - mean) / std).astype(compute_dtype)
    rel, feats = core_forward(params["core"], x, precision)
    depth = jzoe.bins_head(params["head"], rel.astype(jnp.float32),
                           {k: v.astype(jnp.float32) for k, v in feats.items()},
                           cfg, precision)
    if depth.shape[1:3] != (Hp, Wp):
        depth = resize2d(depth[..., None], (Hp, Wp), method="cubic")[..., 0]
    return depth


def infer(params, frames_u8, cfg=ZOED_N_CONFIG, img_size=IMG_SIZE,
          pad_input: bool = True, with_flip_aug: bool = True, precision=None,
          compute_dtype=jnp.float32):
    """infer_pil-equivalent: uint8 [B, H, W, 3] -> metric depth [B, H, W]."""
    B, H, W, _ = frames_u8.shape
    img = frames_u8.astype(jnp.float32) / 255.0
    if pad_input:
        pad_h = int(math.sqrt(H / 2) * 3)
        pad_w = int(math.sqrt(W / 2) * 3)
        img = jnp.pad(img, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                      mode="reflect")
    else:
        pad_h = pad_w = 0

    def run(x):
        return _metric_once(params, x, cfg, img_size, precision, compute_dtype)

    out = run(img)
    if with_flip_aug:
        out_flip = run(img[:, :, ::-1])
        out = (out + out_flip[:, :, ::-1]) / 2
    if pad_h > 0:
        out = out[:, pad_h:-pad_h]
    if pad_w > 0:
        out = out[:, :, pad_w:-pad_w]
    return out


def init_params(rng: jax.Array, depth: int = 24, dtype=jnp.float32) -> dict:
    """Random init (tests use a shallow BEiT via `depth`)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    beit_params = jbeit.init_params(k1, depth=depth, dtype=dtype)
    decoder = jmidas.init_params(k2, dtype)
    decoder.pop("vit")
    return {
        "core": {"beit": beit_params, "decoder": decoder},
        "head": jzoe.init_head_params(k3, 256, dtype=dtype),
    }
