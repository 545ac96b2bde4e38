"""Stable Diffusion 2 UNet + VAE (Marigold backbone), TPU-native.

Behavior target: the diffusers UNet2DConditionModel / AutoencoderKL used by the
vendored Marigold pipeline (`bands/marigold/marigold_pipeline.py:82-98,327-366`,
checkpoint Bingxin/Marigold). diffusers is not installed in this image, so the
architecture is implemented from the published SD2 config (Marigold variant:
unet in_channels=8, out_channels=4, block_out_channels (320, 640, 1280, 1280),
2 layers/block, cross_attention_dim 1024, use_linear_projection, head_dim 64;
VAE 4-ch latents with (128, 256, 512, 512) channels); the weight converter
consumes the diffusers state_dict layout.

Everything is NHWC; attention over flattened spatial tokens; GroupNorm-32 and
SiLU throughout. The denoising loop in models/marigold.py runs this UNet under
lax.scan with the ensemble members on the batch axis.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.ops import nn as pnn


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    head_dim: int = 64
    norm_groups: int = 32


@dataclass(frozen=True)
class VAEConfig:
    block_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_groups: int = 32


def group_norm(p, x, groups: int = 32, eps: float = 1e-6):
    """Single-pass f32-moment group norm: both moments in ONE read of the
    activation (jnp.var's mean-then-deviations form re-reads the full-res
    VAE-decoder activations a second time; same fix as GMFlow's norms)."""
    B, H, W, C = x.shape
    g = x.reshape(B, H * W, groups, C // groups).astype(jnp.float32)
    mu = jnp.mean(g, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(g * g, axis=(1, 3), keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    g = g.reshape(B, H, W, C).astype(x.dtype)
    return g * p["scale"] + p["bias"]


def silu(x):
    return jax.nn.silu(x)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, shift: float = 1.0):
    """diffusers get_timestep_embedding (downscale_freq_shift=1)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / (half - shift))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


def resnet_block(p, x, temb, groups: int = 32, precision=None):
    h = silu(group_norm(p["norm1"], x, groups))
    h = pnn.conv2d(p["conv1"], h, padding=1, precision=precision)
    h = h + pnn.linear(p["time_emb"], silu(temb), precision=precision)[:, None, None, :]
    h = silu(group_norm(p["norm2"], h, groups))
    h = pnn.conv2d(p["conv2"], h, padding=1, precision=precision)
    if "shortcut" in p:
        x = pnn.conv2d(p["shortcut"], x, precision=precision)
    return x + h


def _attention(q, k, v, heads: int, precision=None):
    B, N, H, d = q.shape[0], q.shape[1], heads, q.shape[-1] // heads
    npad = -(-N // 256) * 256
    if (precision is None and N >= 1024 and N == k.shape[1]
            and npad * d <= 2_000_000  # full k/v per block must fit VMEM
            and jax.default_backend() == "tpu"):
        # long self-attention (768-res latents are ~5k tokens): Pallas flash
        # kernel, same auto rule as ops/nn.attention; cross-attention (77
        # context tokens) stays dense
        from prisma_tpu.ops.pallas.flash_attention import flash_attention
        fold = lambda t: t.reshape(B, -1, H, d).transpose(0, 2, 1, 3) \
            .reshape(B * H, -1, d)
        out = flash_attention(fold(q), fold(k), fold(v))
        return out.reshape(B, H, N, d).transpose(0, 2, 1, 3) \
            .reshape(B, N, H * d)
    return _attention_dense(q, k, v, heads, precision)


def _attention_dense(q, k, v, heads: int, precision=None):
    B, N, C = q.shape
    M = k.shape[1]
    d = C // heads
    q = q.reshape(B, N, heads, d)
    k = k.reshape(B, M, heads, d)
    v = v.reshape(B, M, heads, d)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d ** -0.5), k, precision=precision)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                      precision=precision).reshape(B, N, C)


def cross_attention(p, x, context, heads: int, precision=None):
    """diffusers Attention: to_q (no bias), to_k/to_v from context, to_out."""
    q = jnp.dot(x, p["q"]["w"], precision=precision)
    k = jnp.dot(context, p["k"]["w"], precision=precision)
    v = jnp.dot(context, p["v"]["w"], precision=precision)
    out = _attention(q, k, v, heads, precision)
    return pnn.linear(p["out"], out, precision=precision)


def geglu_ff(p, x, precision=None):
    y = pnn.linear(p["proj"], x, precision=precision)
    a, b = jnp.split(y, 2, axis=-1)
    return pnn.linear(p["out"], a * pnn.gelu(b), precision=precision)


def basic_transformer(p, x, context, heads: int, precision=None):
    h = pnn.layer_norm(p["norm1"], x, eps=1e-5)
    x = x + cross_attention(p["attn1"], h, h, heads, precision)
    h = pnn.layer_norm(p["norm2"], x, eps=1e-5)
    x = x + cross_attention(p["attn2"], h, context, heads, precision)
    h = pnn.layer_norm(p["norm3"], x, eps=1e-5)
    return x + geglu_ff(p["ff"], h, precision)


def spatial_transformer(p, x, context, heads: int, groups: int = 32,
                        precision=None):
    """Transformer2DModel with use_linear_projection (SD2)."""
    B, H, W, C = x.shape
    res = x
    x = group_norm(p["norm"], x, groups)
    x = x.reshape(B, H * W, C)
    x = pnn.linear(p["proj_in"], x, precision=precision)
    for bp in p["blocks"]:
        x = basic_transformer(bp, x, context, heads, precision)
    x = pnn.linear(p["proj_out"], x, precision=precision)
    return x.reshape(B, H, W, C) + res


def unet_forward(params, x, t, context, cfg: UNetConfig = UNetConfig(),
                 precision=None):
    """x [B, H, W, in_ch]; t [B]; context [B, L, 1024] -> [B, H, W, out_ch]."""
    temb = timestep_embedding(t, cfg.block_channels[0])
    temb = pnn.linear(params["time1"], temb.astype(x.dtype), precision=precision)
    temb = pnn.linear(params["time2"], silu(temb), precision=precision)

    h = pnn.conv2d(params["conv_in"], x, padding=1, precision=precision)
    skips = [h]
    # down blocks
    for bi, block in enumerate(params["down"]):
        heads = cfg.block_channels[bi] // cfg.head_dim
        for li in range(cfg.layers_per_block):
            h = resnet_block(block["resnets"][li], h, temb, cfg.norm_groups,
                             precision)
            if "attns" in block:
                h = spatial_transformer(block["attns"][li], h, context, heads,
                                        cfg.norm_groups, precision)
            skips.append(h)
        if "down" in block:
            h = pnn.conv2d(block["down"], h, stride=2, padding=1,
                           precision=precision)
            skips.append(h)

    # mid
    heads = cfg.block_channels[-1] // cfg.head_dim
    h = resnet_block(params["mid"]["res1"], h, temb, cfg.norm_groups, precision)
    h = spatial_transformer(params["mid"]["attn"], h, context, heads,
                            cfg.norm_groups, precision)
    h = resnet_block(params["mid"]["res2"], h, temb, cfg.norm_groups, precision)

    # up blocks
    for bi, block in enumerate(params["up"]):
        ch_i = len(cfg.block_channels) - 1 - bi
        heads = cfg.block_channels[ch_i] // cfg.head_dim
        for li in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            if h.shape[1:3] != skip.shape[1:3]:
                # safety net only: odd sizes are already handled below, where
                # the nearest-2x map is cropped BEFORE the upsampler conv
                h = h[:, :skip.shape[1], :skip.shape[2], :]
            h = jnp.concatenate([h, skip], axis=-1)
            h = resnet_block(block["resnets"][li], h, temb, cfg.norm_groups,
                             precision)
            if "attns" in block:
                h = spatial_transformer(block["attns"][li], h, context, heads,
                                        cfg.norm_groups, precision)
        if "up" in block:
            B, H, W, C = h.shape
            h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                 (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)
            # odd latent dims (e.g. 27 -> down 14 -> up 28): diffusers resizes
            # to the NEXT skip's size before the upsampler conv
            # (UNet2DConditionModel forward_upsample_size -> Upsample2D
            # interpolate(size)), so crop the nearest-2x map BEFORE the conv —
            # the boundary row must convolve over zero padding, not the
            # duplicated edge row. For size 2n-1 the crop selects exactly
            # torch's nearest-neighbor rows.
            if skips and h.shape[1:3] != skips[-1].shape[1:3]:
                h = h[:, :skips[-1].shape[1], :skips[-1].shape[2], :]
            h = pnn.conv2d(block["up"], h, padding=1, precision=precision)

    h = silu(group_norm(params["norm_out"], h, cfg.norm_groups))
    return pnn.conv2d(params["conv_out"], h, padding=1, precision=precision)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_resnet(p, x, groups: int = 32, precision=None):
    h = silu(group_norm(p["norm1"], x, groups))
    h = pnn.conv2d(p["conv1"], h, padding=1, precision=precision)
    h = silu(group_norm(p["norm2"], h, groups))
    h = pnn.conv2d(p["conv2"], h, padding=1, precision=precision)
    if "shortcut" in p:
        x = pnn.conv2d(p["shortcut"], x, precision=precision)
    return x + h


def _vae_attn(p, x, groups: int = 32, precision=None):
    B, H, W, C = x.shape
    h = group_norm(p["norm"], x, groups).reshape(B, H * W, C)
    q = pnn.linear(p["q"], h, precision=precision)
    k = pnn.linear(p["k"], h, precision=precision)
    v = pnn.linear(p["v"], h, precision=precision)
    out = _attention(q, k, v, 1, precision)
    out = pnn.linear(p["out"], out, precision=precision)
    return x + out.reshape(B, H, W, C)


def vae_encode(params, x, cfg: VAEConfig = VAEConfig(), precision=None):
    """x [B, H, W, 3] -> latent mean [B, H/8, W/8, 4] (pre-scaling).

    params: the encoder subtree ({"enc": ..., "dec": ...} splits the diffusers
    AutoencoderKL; quant/post_quant convs live with their side)."""
    params = params["enc"] if "enc" in params else params
    h = pnn.conv2d(params["conv_in"], x, padding=1, precision=precision)
    for bi, block in enumerate(params["down"]):
        for rp in block["resnets"]:
            h = _vae_resnet(rp, h, cfg.norm_groups, precision)
        if "down" in block:
            # diffusers VAE downsampler uses asymmetric (0,1,0,1) padding
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = jax.lax.conv_general_dilated(
                h, block["down"]["w"], (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision) + block["down"]["b"]
    h = _vae_resnet(params["mid"]["res1"], h, cfg.norm_groups, precision)
    h = _vae_attn(params["mid"]["attn"], h, cfg.norm_groups, precision)
    h = _vae_resnet(params["mid"]["res2"], h, cfg.norm_groups, precision)
    h = silu(group_norm(params["norm_out"], h, cfg.norm_groups))
    moments = pnn.conv2d(params["conv_out"], h, padding=1, precision=precision)
    moments = pnn.conv2d(params["quant"], moments, precision=precision)
    mean, _logvar = jnp.split(moments, 2, axis=-1)
    return mean


def vae_decode(params, z, cfg: VAEConfig = VAEConfig(), precision=None):
    """z [B, h, w, 4] (unscaled) -> [B, 8h, 8w, 3]."""
    params = params["dec"] if "dec" in params else params
    h = pnn.conv2d(params["post_quant"], z, precision=precision)
    h = pnn.conv2d(params["conv_in"], h, padding=1, precision=precision)
    h = _vae_resnet(params["mid"]["res1"], h, cfg.norm_groups, precision)
    h = _vae_attn(params["mid"]["attn"], h, cfg.norm_groups, precision)
    h = _vae_resnet(params["mid"]["res2"], h, cfg.norm_groups, precision)
    for block in params["up"]:
        for rp in block["resnets"]:
            h = _vae_resnet(rp, h, cfg.norm_groups, precision)
        if "up" in block:
            B, H, W, C = h.shape
            h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                 (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)
            h = pnn.conv2d(block["up"], h, padding=1, precision=precision)
    h = silu(group_norm(params["norm_out"], h, cfg.norm_groups))
    return pnn.conv2d(params["conv_out"], h, padding=1, precision=precision)
