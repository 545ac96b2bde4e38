"""Pallas TPU fused instance norm (+ optional ReLU) for NHWC activations.

STATUS: built, parity-tested, measured — NOT adopted. The hypothesis was
that instance norm made RAFT's fnet 3x its affine-normed cnet (50 vs 16 ms
at B=4, scripts/profile_raft_backbone.py); but the XLA norm measured alone
is already AT its HBM roofline (0.42 ms at [4, 408, 720, 64]), and swapping
this kernel in was e2e-neutral (50.7 vs 50.1 ms). The fnet/cnet delta is
layout-assignment copies AROUND the norm (the compiled fnet has 485 copy
ops: the reduce barrier forces conv-layout materializations the affine path
fuses away), which a custom norm cannot remove — XLA just moves the same
copies to the custom-call boundary. Kept as the measured negative result
with its parity tests; the encoders use the plain XLA form.

Two kernels, three total HBM passes:
  1. stats: grid over (B, row-blocks) accumulating per-channel f32
     sum/sumsq into one [B, 1, C] block per sample (same output block for
     every row step -> legal sequential accumulation under "arbitrary"
     semantics).
  2. apply: (x - mean) * scale (+ relu), finalized in XLA from the sums.

Exactness: moments accumulate in f32 over bf16 inputs exactly like the XLA
path; parity pinned in tests/test_instance_norm_kernel.py.
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
    sum_ref[0] += jnp.sum(x, axis=0, keepdims=True)
    sq_ref[0] += jnp.sum(x * x, axis=0, keepdims=True)


def _apply_kernel(x_ref, mean_ref, scale_ref, o_ref, *, relu: bool):
    # (x - mean) * scale, matching raft._instance_norm's form so the f32
    # parity path agrees to rounding
    y = (x_ref[0].astype(jnp.float32) - mean_ref[0]) * scale_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def instance_norm_relu(x, eps: float = 1e-5, relu: bool = False,
                       s_blk: int | None = None, interpret: bool = False):
    """Fused instance norm over H, W of NHWC x, optional trailing ReLU.

    s_blk: rows per grid step. Large blocks matter: per-grid-step overhead
    on the v5e is ~2 us, so 512-row blocks (2300 steps at RAFT's
    [4, 408, 720, 64]) cost more in stepping than the op's entire HBM
    roofline. Default sizes to ~4 MB f32 blocks."""
    B, H, W, C = x.shape
    S = H * W
    if s_blk is None:
        # ~4 MB f32 per block, capped at the (8-padded) row count
        s_blk = max(512, min(-(-S // 8) * 8, (1 << 20) // C // 8 * 8))
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
        out_specs=[pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xf)

    m1 = sums / S                                        # [B, 1, C] f32
    var = jnp.maximum(sqs / S - m1 * m1, 0.0)
    scale = jax.lax.rsqrt(var + eps)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu),
        grid=(B, sp // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
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
