"""Interpret-mode parity of the Pallas window-lookup kernel vs the XLA path.

The kernel is TPU-blocked by Mosaic DMA alignment (see
ops/pallas/raft_lookup.py STATUS); these tests keep its semantics pinned so
it is ready when the alignment restriction lifts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from prisma_tpu.models.raft import _window_patch_lookup
from prisma_tpu.models import raft as jraft
from prisma_tpu.ops.pallas.raft_lookup import window_lookup


def test_window_lookup_matches_xla():
    rng = np.random.default_rng(0)
    N, H, W, r = 500, 13, 21, 4
    p = 2 * r + 2
    vol = rng.normal(0, 1, (N, H, W)).astype(np.float32)
    cx = rng.uniform(-8, W + 8, N).astype(np.float32)   # incl. out-of-bounds
    cy = rng.uniform(-8, H + 8, N).astype(np.float32)
    ref = np.asarray(_window_patch_lookup(
        jnp.asarray(vol), jnp.asarray(cx), jnp.asarray(cy), r))
    pv = jnp.pad(jnp.asarray(vol), ((0, 0), (p, p), (p, p)))
    got = np.asarray(window_lookup(pv, jnp.asarray(cx), jnp.asarray(cy),
                                   (H, W), r=r, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-6)


def test_forward_volume_pallas_matches_volume():
    params = jraft.init_params(jax.random.key(1))
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    a = jraft.forward(params, i1, i2, iters=3, precision="highest",
                      corr_impl="volume")[1]
    b = jraft.forward(params, i1, i2, iters=3, precision="highest",
                      corr_impl="volume_pallas")[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_window_lookup_gather_matches_onehot():
    """The gather-kernel lookup (ops/pallas/raft_window.py) == onehot, incl.
    out-of-bounds zero padding, row-padded volumes, and N % blk != 0."""
    from prisma_tpu.models.raft import _window_onehot_lookup
    from prisma_tpu.ops.pallas.raft_window import window_lookup_gather
    rng = np.random.default_rng(3)
    for (H, W) in [(13, 23), (51, 90), (17, 129), (102, 180)]:
        Hp = max(16, H)
        Wp = max(16, -(-W // 8) * 8)
        N = 70
        vol = rng.normal(size=(N, H, W)).astype(np.float32)
        volp = np.zeros((N, Wp, Hp), np.float32)
        volp[:, :W, :H] = vol.transpose(0, 2, 1)
        cx = rng.uniform(-8, W + 8, N).astype(np.float32)
        cy = rng.uniform(-8, H + 8, N).astype(np.float32)
        a = _window_onehot_lookup(jnp.asarray(vol), jnp.asarray(cx),
                                  jnp.asarray(cy), 4, precision="highest")
        b = window_lookup_gather(jnp.asarray(volp), jnp.asarray(cx),
                                 jnp.asarray(cy), (H, W), r=4,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_forward_volume_gk_matches_volume():
    params = jraft.init_params(jax.random.key(1))
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    a = jraft.forward(params, i1, i2, iters=3, precision="highest",
                      corr_impl="volume")[1]
    b = jraft.forward(params, i1, i2, iters=3, precision="highest",
                      corr_impl="volume_gk")[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
