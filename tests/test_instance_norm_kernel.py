"""Interpret-mode parity of the fused instance-norm kernel vs the XLA form
used by the RAFT/GMFlow encoders."""

import jax.numpy as jnp
import numpy as np

from prisma_tpu.models.raft import _instance_norm
from prisma_tpu.ops.pallas.instance_norm import instance_norm_relu


def test_instance_norm_kernel_matches_xla():
    rng = np.random.default_rng(0)
    for shape in [(2, 24, 40, 64), (1, 13, 17, 128), (3, 9, 9, 32)]:
        x = jnp.asarray(rng.normal(1.5, 3.0, shape).astype(np.float32))
        a = np.asarray(_instance_norm(x))
        b = np.asarray(instance_norm_relu(x, s_blk=64, interpret=True))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_instance_norm_kernel_relu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 2.0, (2, 16, 24, 32)).astype(np.float32))
    a = np.maximum(np.asarray(_instance_norm(x)), 0.0)
    b = np.asarray(instance_norm_relu(x, relu=True, s_blk=64,
                                      interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_instance_norm_kernel_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 2.0, (2, 16, 24, 64)).astype(np.float32),
                    jnp.bfloat16)
    a = np.asarray(_instance_norm(x), np.float32)
    b = np.asarray(instance_norm_relu(x, s_blk=64, interpret=True),
                   np.float32)
    # bf16 output rounding differs by at most 1 ulp between the two forms
    np.testing.assert_allclose(a, b, atol=0.02, rtol=0.02)
