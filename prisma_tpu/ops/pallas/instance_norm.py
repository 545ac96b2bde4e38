"""Pallas TPU fused instance norm (+ optional ReLU) for NHWC activations.

RAFT/GMFlow encoders apply per-(sample, channel) instance norm to full-res
activations (e.g. [4, 408, 720, 64] — reference bands/raft/extractor.py's
nn.InstanceNorm2d). The XLA lowering of the single-pass f32-moment form
costs ~4 ms per application at that shape on the v5e (scripts/
profile_raft_backbone.py) — ~9x the 0.45 ms three-pass HBM roofline — and
fnet applies it 13 times, making the norm, not the convs, the backbone's
cost center (fnet 50 ms vs the affine-normed cnet at 16 ms, B=4).

Two kernels, three total HBM passes:
  1. stats: grid over (B, row-blocks) accumulating per-channel f32
     sum/sumsq into one [B, C] block per sample (same output block for every
     row step -> legal sequential accumulation under "arbitrary" semantics).
  2. apply: x * scale + shift (+ relu), scale/shift finalized in XLA from
     the sums ([B, C] math, trivial).

Exactness: moments accumulate in f32 over bf16 inputs exactly like the XLA
path (jnp.mean(dtype=f32) also upcasts per element before the tree
reduction); parity pinned in tests/test_instance_norm_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    x = x_ref[0].astype(jnp.float32)                     # [S_BLK, C]
    sum_ref[...] += jnp.sum(x, axis=0, keepdims=True)
    sq_ref[...] += jnp.sum(x * x, axis=0, keepdims=True)


def _apply_kernel(x_ref, mean_ref, scale_ref, o_ref, *, relu: bool):
    # (x - mean) * scale, matching raft._instance_norm's form so the f32
    # parity path agrees to rounding
    y = (x_ref[0].astype(jnp.float32) - mean_ref[...]) * scale_ref[...]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def instance_norm_relu(x, eps: float = 1e-5, relu: bool = False,
                       s_blk: int = 512, interpret: bool = False):
    """Fused instance norm over H, W of NHWC x, optional trailing ReLU."""
    B, H, W, C = x.shape
    S = H * W
    xf = x.reshape(B, S, C)
    pad = (-S) % s_blk
    if pad:
        # zero pad rows: correct the moment denominators below with S, and
        # zero rows add exact zeros to both accumulators
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
    sp = S + pad

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=(B, sp // s_blk),
        in_specs=[pl.BlockSpec((1, s_blk, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, C), lambda b, i: (b, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, C), lambda b, i: (b, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xf)

    m1 = sums / S
    var = jnp.maximum(sqs / S - m1 * m1, 0.0)
    scale = jax.lax.rsqrt(var + eps)                     # [B, C] f32

    out = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu),
        grid=(B, sp // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_blk, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, sp, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xf, m1, scale)
    if pad:
        out = out[:, :S]
    return out.reshape(B, H, W, C)
