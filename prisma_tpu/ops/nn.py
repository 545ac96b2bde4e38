"""Small neural-net primitives shared by all model families.

Pure functions over explicit parameter pytrees (nested dicts of arrays), in NHWC
layout. Matmul-heavy ops take a `precision` so parity tests can run in exact f32
("highest") while the production path uses the MXU's native bf16 ("default").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def linear(p, x, precision=None):
    """x @ W + b with W stored [in, out]."""
    y = jnp.dot(x, p["w"], precision=precision)
    if "b" in p:
        y = y + p["b"]
    return y


def layer_norm(p, x, eps: float = 1e-6):
    # stats in f32 for bf16 activations; single pass (E[x^2]-E[x]^2) so the
    # activation is read once, not re-read for the deviations
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    y = ((xf - mu) * lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["scale"] + p["bias"]


def gelu(x):
    """Exact (erf) gelu on the f32 parity path; tanh-approx on bf16.

    XLA:TPU lowers the exact erf to an f32 rational with a divide — measured
    3.61 ms vs 0.53 ms per GMFlow FFN instance at the production shape
    ([8, 18360, 1024]), ~18 ms of the 88 ms transformer. Gated on dtype
    because for bf16 activations the approximation is free: enumerating ALL
    finite bf16 inputs against the f64 ground truth, the bf16 tanh path's
    max error (9.28e-3) is no larger than the bf16 erf path's (9.82e-3) —
    input/output rounding dominates either way. f32 inputs (parity tests,
    precision='highest' oracles vs torch nn.GELU) keep the exact erf.
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def conv2d(p, x, stride: int = 1, padding: int = 0, precision=None,
           groups: int = 1):
    """NHWC conv with weights stored HWIO ([kh, kw, cin/groups, cout])."""
    y = lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        feature_group_count=groups)
    if "b" in p:
        y = y + p["b"]
    return y


def conv_transpose_blocky(p, x, precision=None):
    """ConvTranspose2d with kernel_size == stride and no padding.

    Non-overlapping: each input pixel emits a k x k block. Implemented as one
    einsum + reshape (a single MXU matmul) instead of a transposed convolution.
    Weights stored [k, k, in, out].
    """
    w = p["w"]
    k = w.shape[0]
    B, H, W, C = x.shape
    O = w.shape[-1]
    y = jnp.einsum("bhwc,klco->bhkwlo", x, w, precision=precision)
    y = y.reshape(B, H * k, W * k, O)
    if "b" in p:
        y = y + p["b"]
    return y


def attention(p, x, num_heads: int, precision=None):
    """Pre-softmax-scaled multi-head self-attention (DINOv2/timm convention).

    p: {qkv: {w [D, 3D], b}, proj: {w [D, D], b}}. x: [B, N, D].

    On TPU with the production precision (None = bf16 MXU) the Pallas flash
    kernel handles the softmax(QK^T)V core by default: measured 462 -> 376 ms
    for the ViT-L 1080p depth step (the [B, heads, N, N] score tensors never
    round-trip HBM). Parity paths (explicit precision) and other backends use
    the dense XLA form. PRISMA_FLASH_ATTENTION=0 forces dense everywhere.
    """
    import os
    B, N, D = x.shape
    qkv = linear(p["qkv"], x, precision=precision)  # [B, N, 3D]
    qkv = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, d]
    use_flash = (precision is None and N >= 1024
                 and jax.default_backend() == "tpu"
                 and os.environ.get("PRISMA_FLASH_ATTENTION", "1") != "0")
    if use_flash:
        from prisma_tpu.ops.pallas.flash_attention import flash_attention
        d = D // num_heads
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(B * num_heads, N, d)
        out = flash_attention(fold(q), fold(k), fold(v))
        out = out.reshape(B, num_heads, N, d).transpose(0, 2, 1, 3)
        return linear(p["proj"], out.reshape(B, N, D), precision=precision)
    scale = (D // num_heads) ** -0.5
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k, precision=precision)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, precision=precision)
    return linear(p["proj"], out.reshape(B, N, D), precision=precision)


def mlp(p, x, precision=None):
    return linear(p["fc2"], gelu(linear(p["fc1"], x, precision=precision)),
                  precision=precision)
