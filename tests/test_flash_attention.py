"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from prisma_tpu.ops.pallas.flash_attention import _xla_attention, flash_attention


def test_flash_matches_reference():
    rng = np.random.default_rng(0)
    B, N, d = 3, 512, 64
    q = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    ours = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = _xla_attention(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_ragged_falls_back():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 100, 32)).astype(np.float32))
    out = flash_attention(q, q, q, block_q=128, block_k=128, interpret=True)
    ref = _xla_attention(q, q, q, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
