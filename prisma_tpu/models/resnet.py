"""ResNet backbone (eval-mode, folded BatchNorm), TPU-native NHWC.

Parity target: mmdet's pytorch-style ResNet-101 as used by SOLOv2
(`bands/mmdet/models/backbones/resnet.py`, config SURVEY.md §2.9) — identical
to torchvision resnet101: 7x7/2 stem + BN + ReLU + 3x3/2 maxpool, bottleneck
stages [3, 4, 23, 3] with stride on the 3x3 conv, returning C2..C5.

BatchNorms are folded into per-channel affines at weight conversion; the
whole backbone is therefore conv + scale/bias + relu chains that XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from prisma_tpu.ops import nn as pnn

RESNET_STAGES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _affine(p, x):
    return x * p["scale"] + p["bias"]


def _bottleneck(p, x, stride: int, precision=None, groups: int = 1):
    y = jax.nn.relu(_affine(p["bn1"], pnn.conv2d(p["conv1"], x,
                                                 precision=precision)))
    y = jax.nn.relu(_affine(p["bn2"], pnn.conv2d(p["conv2"], y, stride=stride,
                                                 padding=1, precision=precision,
                                                 groups=groups)))
    y = _affine(p["bn3"], pnn.conv2d(p["conv3"], y, precision=precision))
    if "down" in p:
        x = _affine(p["down_bn"], pnn.conv2d(p["down"], x, stride=stride,
                                             precision=precision))
    return jax.nn.relu(x + y)


def _max_pool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def forward(params, x, precision=None, groups: int = 1):
    """x [B, H, W, 3] normalized -> (C2, C3, C4, C5) NHWC feature maps.

    groups > 1 selects the ResNeXt bottleneck (grouped 3x3) — e.g. 32 for
    the resnext101_32x8d_wsl backbone of MiDaS v2.1."""
    x = pnn.conv2d(params["stem"], x, stride=2, padding=3, precision=precision)
    x = jax.nn.relu(_affine(params["stem_bn"], x))
    x = _max_pool_3x3_s2(x)
    outs = []
    for si, stage in enumerate(params["stages"]):
        for bi, block in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _bottleneck(block, x, stride, precision, groups)
        outs.append(x)
    return tuple(outs)


def init_params(rng: jax.Array, depth: int = 101, dtype=jnp.float32,
                groups: int = 1, width_per_group: int = 64) -> dict:
    stages_cfg = RESNET_STAGES[depth]
    rngs = iter(jax.random.split(rng, 512))

    def conv(kh, kw, cin, cout):
        return {"w": (jax.random.normal(next(rngs), (kh, kw, cin, cout))
                      * ((kh * kw * cin) ** -0.5)).astype(dtype)}

    def aff(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    params = {"stem": conv(7, 7, 3, 64), "stem_bn": aff(64), "stages": []}
    cin = 64
    width = 64
    for si, nblocks in enumerate(stages_cfg):
        stage = []
        cout = width * 4
        inner = int(width * (width_per_group / 64.0)) * groups
        for bi in range(nblocks):
            block = {
                "conv1": conv(1, 1, cin, inner), "bn1": aff(inner),
                "conv2": conv(3, 3, inner // groups, inner), "bn2": aff(inner),
                "conv3": conv(1, 1, inner, cout), "bn3": aff(cout),
            }
            if bi == 0:
                block["down"] = conv(1, 1, cin, cout)
                block["down_bn"] = aff(cout)
            stage.append(block)
            cin = cout
        params["stages"].append(stage)
        width *= 2
    return params
