"""DPT decoder head over ViT intermediate features.

Parity target: the reference DPTHead / FeatureFusionBlock / ResidualConvUnit
(`bands/d_anything/dpt.py:22-136`, `bands/d_anything/blocks.py`): four 1x1
projections to [256, 512, 1024, 1024], resize ladder (x4 convT, x2 convT,
identity, /2 conv), 3x3 scratch convs, four top-down refinenet fusions with
align_corners=True bilinear upsampling, then the two-stage output conv.

All convs run in NHWC; the x4/x2 transposed convolutions are non-overlapping
(kernel == stride) and lower to single einsum matmuls (`ops.nn.conv_transpose_blocky`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from prisma_tpu.ops import nn as pnn
from prisma_tpu.ops.resize import resize2d

DPT_OUT_CHANNELS = (256, 512, 1024, 1024)


def init_params(rng: jax.Array, in_dim: int, features: int = 256,
                out_channels=DPT_OUT_CHANNELS, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64))

    def conv(key, kh, kw, cin, cout, bias=True):
        p = {"w": (jax.random.normal(key, (kh, kw, cin, cout))
                   * ((kh * kw * cin) ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def rcu(key):
        k1, k2 = jax.random.split(key)
        return {"conv1": conv(k1, 3, 3, features, features),
                "conv2": conv(k2, 3, 3, features, features)}

    def fusion(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"rcu1": rcu(k1), "rcu2": rcu(k2),
                "out_conv": conv(k3, 1, 1, features, features)}

    return {
        "projects": [conv(next(keys), 1, 1, in_dim, oc) for oc in out_channels],
        "resize0": conv(next(keys), 4, 4, out_channels[0], out_channels[0]),
        "resize1": conv(next(keys), 2, 2, out_channels[1], out_channels[1]),
        "resize3": conv(next(keys), 3, 3, out_channels[3], out_channels[3]),
        "scratch": [conv(next(keys), 3, 3, oc, features, bias=False)
                    for oc in out_channels],
        "refinenet": [fusion(next(keys)) for _ in range(4)],
        "output_conv1": conv(next(keys), 3, 3, features, features // 2),
        "output_conv2_0": conv(next(keys), 3, 3, features // 2, 32),
        "output_conv2_2": conv(next(keys), 1, 1, 32, 1),
    }


def _rcu(p, x, precision=None):
    y = pnn.conv2d(p["conv1"], jax.nn.relu(x), padding=1, precision=precision)
    y = pnn.conv2d(p["conv2"], jax.nn.relu(y), padding=1, precision=precision)
    return x + y


def _fusion(p, x, skip=None, size=None, precision=None):
    if skip is not None:
        x = x + _rcu(p["rcu1"], skip, precision)
    x = _rcu(p["rcu2"], x, precision)
    if size is None:
        size = (x.shape[1] * 2, x.shape[2] * 2)
    x = resize2d(x, size, method="linear", align_corners=True)
    return pnn.conv2d(p["out_conv"], x, precision=precision)


def dpt_head(params: dict, features: list, ph: int, pw: int, precision=None,
             return_features: bool = False):
    """features: [(patch_tokens [B, N, D], cls)] x4, shallow->deep.

    Returns relative depth/disparity [B, 14*ph, 14*pw] (pre final resize).
    With return_features=True also returns the intermediates the ZoeDepth
    family hooks into (reference base_models/depth_anything.py:297-318):
    l4_rn, r4..r1 refinenet outputs, and the 32-channel out_conv activation.
    """
    maps = []
    for i, (tokens, _cls) in enumerate(features):
        B, N, D = tokens.shape
        x = tokens.reshape(B, ph, pw, D)
        x = pnn.conv2d(params["projects"][i], x, precision=precision)
        if i == 0:
            x = pnn.conv_transpose_blocky(params["resize0"], x, precision)
        elif i == 1:
            x = pnn.conv_transpose_blocky(params["resize1"], x, precision)
        elif i == 3:
            x = pnn.conv2d(params["resize3"], x, stride=2, padding=1, precision=precision)
        maps.append(x)

    l1, l2, l3, l4 = [pnn.conv2d(params["scratch"][i], m, padding=1, precision=precision)
                      for i, m in enumerate(maps)]
    r4, r3, r2, r1 = params["refinenet"][3], params["refinenet"][2], \
        params["refinenet"][1], params["refinenet"][0]
    path4 = _fusion(r4, l4, size=l3.shape[1:3], precision=precision)
    path3 = _fusion(r3, path4, l3, size=l2.shape[1:3], precision=precision)
    path2 = _fusion(r2, path3, l2, size=l1.shape[1:3], precision=precision)
    path1 = _fusion(r1, path2, l1, precision=precision)

    out = pnn.conv2d(params["output_conv1"], path1, padding=1, precision=precision)
    out = resize2d(out, (ph * 14, pw * 14), method="linear", align_corners=True)
    out = pnn.conv2d(params["output_conv2_0"], out, padding=1, precision=precision)
    out_conv_act = jax.nn.relu(out)
    out = pnn.conv2d(params["output_conv2_2"], out_conv_act, precision=precision)
    out = jax.nn.relu(out)
    if return_features:
        return out[..., 0], {"out_conv": out_conv_act, "l4_rn": l4,
                             "r4": path4, "r3": path3, "r2": path2, "r1": path1}
    return out[..., 0]
