"""Multi-chip sharding of PatchFusion tiles and Marigold ensemble members
(SURVEY.md §2.10: "tiles (PatchFusion), ensemble members (Marigold)" across
chips). Runs on the 8-virtual-CPU-device mesh from conftest.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prisma_tpu.parallel import data_mesh_or_none, get_mesh, shard_batch_padded


def test_mesh_present():
    assert len(jax.devices()) == 8
    assert data_mesh_or_none() is not None


def test_shard_batch_padded_p49_tiles():
    """A 49-tile batch pads to 56 and lands 7 tiles per device."""
    mesh = get_mesh()
    batch = jnp.arange(49 * 4, dtype=jnp.float32).reshape(49, 4)
    sharded, orig = shard_batch_padded(batch, mesh)
    assert orig == 49
    assert sharded.shape == (56, 4)
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(7, 4)}
    assert len(sharded.addressable_shards) == 8
    # padded tail repeats the last tile; the real rows are untouched
    np.testing.assert_array_equal(np.asarray(sharded)[:49], np.asarray(batch))
    np.testing.assert_array_equal(np.asarray(sharded)[49:],
                                  np.broadcast_to(np.asarray(batch)[-1], (7, 4)))


def test_shard_batch_padded_ensemble_10():
    """A 10-member ensemble pads to 16 and lands 2 members per device."""
    mesh = get_mesh()
    batch = jnp.arange(10 * 3, dtype=jnp.float32).reshape(10, 3)
    sharded, orig = shard_batch_padded(batch, mesh)
    assert orig == 10
    assert sharded.shape == (16, 3)
    assert {s.data.shape for s in sharded.addressable_shards} == {(2, 3)}


@pytest.mark.slow
def test_patchfusion_sharded_matches_unsharded(monkeypatch):
    """Tiled tiny inference with tiles sharded over the mesh == single-device."""
    from prisma_tpu.models import patchfusion as pf

    model_hw = (64, 96)
    params = pf.init_params(jax.random.key(0), beit_depth=4, model_hw=model_hw)
    img = np.random.default_rng(0).uniform(0, 1, (100, 140, 3)).astype(np.float32)

    sharded = pf.infer(params, img, mode="p16", model_hw=model_hw)

    import prisma_tpu.parallel as par
    monkeypatch.setattr(par, "data_mesh_or_none", lambda: None)
    unsharded = pf.infer(params, img, mode="p16", model_hw=model_hw)

    assert sharded.shape == (100, 140)
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)


def test_marigold_ensemble_sharded_matches_unsharded(monkeypatch):
    """10-member tiny Marigold with members sharded over the mesh ==
    single-device (latents are pre-generated at the true ensemble size)."""
    from prisma_tpu.models import marigold as jmar
    from prisma_tpu.models import sd2

    unet_cfg = sd2.UNetConfig(block_channels=(32, 64), cross_attention_dim=64,
                              head_dim=16, norm_groups=8)
    vae_cfg = sd2.VAEConfig(block_channels=(32, 64), norm_groups=8)
    params = jmar.init_params(jax.random.key(0), unet_cfg, vae_cfg)
    frame = np.random.default_rng(0).integers(0, 255, (40, 56, 3)).astype(np.uint8)

    sharded = jmar.infer(params, frame, denoising_steps=2, ensemble_size=10,
                         processing_res=48, unet_cfg=unet_cfg)

    import prisma_tpu.parallel as par
    monkeypatch.setattr(par, "data_mesh_or_none", lambda: None)
    unsharded = jmar.infer(params, frame, denoising_steps=2, ensemble_size=10,
                           processing_res=48, unet_cfg=unet_cfg)

    assert sharded.shape == (40, 56)
    np.testing.assert_allclose(sharded, unsharded, atol=1e-4)
