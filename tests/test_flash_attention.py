"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np

import jax
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


def test_ragged_n_padded_and_masked():
    """N not a multiple of the block: padded keys must carry zero softmax
    mass and padded query rows are sliced off."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 100, 32)).astype(np.float32))
    out = flash_attention(q, q, q, block_q=128, block_k=128, interpret=True)
    ref = _xla_attention(q, q, q, 32 ** -0.5)
    assert out.shape == (2, 100, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_mismatched_blocks_rejected():
    """block_q must tile the padded N exactly: the grid uses integer
    division, so a non-divisor block silently leaves trailing query rows
    uncomputed (caught live at block_q=1024, block_k=2560 -> npad 2560,
    grid 2, rows 2048+ garbage). The kernel must refuse, not truncate."""
    import pytest
    q = jnp.zeros((1, 2443, 64), jnp.float32)
    with pytest.raises(AssertionError, match="do not tile"):
        flash_attention(q, q, q, block_q=1024, block_k=2560, interpret=True)


def test_vit_depth_shape_512_blocks():
    """The production ViT-L depth row length (N=2443, d=64) through the
    512-token default blocks it now selects (N >= 2048)."""
    rng = np.random.default_rng(3)
    B, N, d = 2, 2443, 64
    q = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    out = flash_attention(q, k, v, interpret=True)
    ref = _xla_attention(q, k, v, d ** -0.5)
    assert out.shape == (B, N, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_region_ids_mask():
    """The ids argument reproduces the shifted-window -100 additive bias."""
    rng = np.random.default_rng(2)
    B, N, d = 2, 300, 64
    q = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.int32))
    ours = flash_attention(q, k, v, ids=ids, block_q=128, block_k=128,
                           interpret=True)
    ref = _xla_attention(q, k, v, d ** -0.5, ids=ids)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_gmflow_window_attention_flash_matches_xla():
    """GMFlow's windowed attention: flash vs dense XLA path, with the
    shifted-window region mask engaged."""
    from prisma_tpu.models.gmflow import (_window_attention,
                                          shift_window_region_ids)
    rng = np.random.default_rng(3)
    B, h, w, C, ns = 2, 20, 24, 32, 2
    L = h * w
    q = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    ids = shift_window_region_ids(h, w, ns)

    import unittest.mock as mock
    from prisma_tpu.ops.pallas import flash_attention as fa
    real = fa.flash_attention

    def interp(qq, kk, vv, ids=None, **kw):
        kw.pop("block_q", None), kw.pop("block_k", None)
        return real(qq, kk, vv, ids=ids, block_q=128, block_k=128,
                    interpret=True, **kw)

    with mock.patch.object(fa, "flash_attention", interp):
        ours = _window_attention(q, k, v, h, w, ns, ids, impl="flash")
    ref = _window_attention(q, k, v, h, w, ns, ids, impl="xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_streamed_matches_softmax():
    """Streamed (grid-K) flash kernel vs explicit softmax: ragged N and M,
    asymmetric q/k lengths, f32 coordinate-style values, custom scale."""
    from prisma_tpu.ops.pallas.flash_attention import (_xla_attention,
                                                       flash_attention_streamed)
    rng = np.random.default_rng(7)
    B, N, M, d = 2, 300, 550, 32
    q = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, M, d)).astype(np.float32))
    v = jnp.asarray((rng.uniform(0, 1440, size=(B, M, 128))).astype(np.float32))
    scale = 1.0 / (d ** 0.5)
    ours = flash_attention_streamed(q, k, v, block_q=128, block_k=128,
                                    scale=scale, interpret=True)
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bnm,bmd->bnd", p, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5,
                               atol=2e-3)


def test_gmflow_global_attend_flash_matches_scan():
    """_global_attend's flash route (forced via interpret) vs the scan
    blockwise softmax on the matching shapes."""
    import unittest.mock as mock

    from prisma_tpu.models import gmflow as jgm
    from prisma_tpu.ops.pallas import flash_attention as fa

    rng = np.random.default_rng(11)
    B, N, C = 2, 210, 64
    q = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    grid = jgm._coords_grid_flat(14, 15)
    scale = 1.0 / (C ** 0.5)

    real = fa.flash_attention_streamed

    def interp(qq, kk, vv, **kw):
        kw.update(block_q=128, block_k=128, interpret=True)
        return real(qq, kk, vv, **kw)

    with mock.patch.object(fa, "flash_attention_streamed", interp), \
         mock.patch.object(jax, "default_backend", lambda: "tpu"):
        ours = jgm._global_attend(q, k, grid, scale, 2048, None)
    ref = jgm._attn_blockwise(q, k, grid, scale, 2048, None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                               atol=5e-3)

def test_region_bands_match_ids_path():
    """The in-kernel swin band bias (region_bands/win_w) equals the one-hot
    ids path and the dense mask on real shift-window geometry."""
    from prisma_tpu.models.gmflow import (shift_window_region_bands,
                                          shift_window_region_ids)
    rng = np.random.default_rng(5)
    h, w, ns = 20, 24, 2
    wh, ww = h // ns, w // ns
    win = wh * ww
    B = 3 * ns * ns  # batch 3, window axis faster (as _win_split lays out)
    d = 64
    q = jnp.asarray(rng.normal(size=(B, win, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, win, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, win, d)).astype(np.float32))
    ids = shift_window_region_ids(h, w, ns)
    bands = shift_window_region_bands(h, w, ns)
    idst = jnp.tile(jnp.asarray(ids, jnp.int32), (3, 1))
    via_ids = flash_attention(q, k, v, ids=idst, block_q=128, block_k=128,
                              interpret=True)
    via_bands = flash_attention(q, k, v,
                                region_bands=jnp.asarray(bands, jnp.int32),
                                win_w=ww, block_q=128, block_k=128,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(via_bands), np.asarray(via_ids),
                               atol=2e-5)
    ref = _xla_attention(q, k, v, d ** -0.5, ids=idst)
    np.testing.assert_allclose(np.asarray(via_bands), np.asarray(ref),
                               atol=2e-5)
