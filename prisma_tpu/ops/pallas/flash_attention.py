"""Flash attention Pallas kernel for ViT/UNet sequence lengths.

TPU-native replacement for the reference's xformers memory-efficient attention
(SURVEY.md §2.9 #7: `dinov2/layers/attention.py:21,65-66`, Marigold's
enable_xformers): online-softmax attention computed block-by-block in VMEM, so
the [N, N] score matrix never materializes in HBM.

Targets the pipeline's shapes: N ~ 1.4k-2.5k tokens (518-1080p ViT grids),
head_dim 64-128, batch = frames x heads. Accumulation is f32 regardless of
input dtype. Falls back to the XLA path for shapes that don't tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, n_kv: int,
                  scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # [BQ, d]
    bq = q.shape[0]
    d = q.shape[1]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [BQ, BK]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _m, l = jax.lax.fori_loop(0, n_kv // block_k, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K, interpret: bool = False):
    """q/k/v [B, N, d] (B folds batch x heads) -> [B, N, d].

    N is padded internally to the block sizes; padded keys contribute
    exp(-inf-ish) mass via explicit masking of the padded queries only (padded
    KEYS are masked by padding K with -inf scores through a large negative
    bias on the padded rows of K itself being zeros — instead we pad K/V with
    zeros and rely on query-side truncation, so N must be padded on both sides
    consistently; see below).
    """
    B, N, d = q.shape
    scale = d ** -0.5

    nq = -(-N // block_q) * block_q
    nk = -(-N // block_k) * block_k
    if nq != N or nk != N:
        # pad keys with a token whose score is -inf: implemented by padding q
        # normally and masking via a huge negative key bias channel is overkill
        # for our shapes — simply fall back to XLA for ragged N.
        return _xla_attention(q, k, v, scale)

    kernel = functools.partial(_flash_kernel, block_k=block_k, n_kv=N,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, N // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
