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


def test_depth_step_sharded_matches_unsharded(monkeypatch):
    """The fused depth video step (infer + normalize/heatmap epilogue) with
    the frame batch sharded over the mesh == single-device, elementwise
    (VERDICT r4 item 3: equality, not shape, for every family)."""
    import functools

    from prisma_tpu.bands import depth_base
    from prisma_tpu.models import depth_anything as da

    params = da.init_params(jax.random.key(0), "vits")
    infer = functools.partial(da.infer, encoder="vits", target=126)
    frames = np.random.default_rng(0).integers(
        0, 255, (8, 48, 64, 3)).astype(np.uint8)

    step = depth_base.make_step(params, infer, flip=True, need_depth=True)
    sharded = step(frames)
    assert len(np.asarray(sharded["depth"]).shape) == 3

    import prisma_tpu.parallel as par
    monkeypatch.setattr(par, "data_mesh_or_none", lambda: None)
    unsharded = depth_base.make_step(params, infer, flip=True,
                                     need_depth=True)(frames)

    np.testing.assert_allclose(np.asarray(sharded["depth"]),
                               np.asarray(unsharded["depth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["min"]),
                               np.asarray(unsharded["min"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["max"]),
                               np.asarray(unsharded["max"]), atol=1e-5)
    # uint8 heatmaps may flip by 1 LSB where a float sits on a bin edge
    dheat = np.abs(np.asarray(sharded["heat"]).astype(np.int32)
                   - np.asarray(unsharded["heat"]).astype(np.int32))
    assert dheat.max() <= 1


def test_flow_step_sharded_matches_unsharded(monkeypatch):
    """The fused flow step (cubic downscale + GMFlow pairs + HSV/consistency/
    16-bit encodings) sharded over the mesh == single-device, elementwise.
    The consecutive-pair halo (ds[:-1], ds[1:]) crosses shard boundaries."""
    from prisma_tpu.bands.flow_base import make_flow_step
    from prisma_tpu.models import gmflow as jgm

    params = jgm.init_params(jax.random.key(2))
    window = np.random.default_rng(3).integers(
        0, 255, size=(8, 32, 48, 3)).astype(np.uint8)

    def build():
        return make_flow_step(params, jgm.infer_pairs, (24, 36),
                              need_masks=True, need_flow=True, need_enc=True)

    sharded = build()(window)

    import prisma_tpu.parallel as par
    monkeypatch.setattr(par, "data_mesh_or_none", lambda: None)
    unsharded = build()(window)

    # GSPMD changes reduction orders; the expected-offset flow amplifies
    # softmax ulps to ~2e-4 on O(10) flow values — 1e-3 is still far below
    # any structural error
    np.testing.assert_allclose(np.asarray(sharded["fwd"]),
                               np.asarray(unsharded["fwd"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sharded["bwd"]),
                               np.asarray(unsharded["bwd"]), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(sharded["fwd_mask"]),
                                  np.asarray(unsharded["fwd_mask"]))
    for key in ("fwd_rgb", "bwd_rgb", "fwd_enc", "bwd_enc"):
        d = np.abs(np.asarray(sharded[key]).astype(np.int64)
                   - np.asarray(unsharded[key]).astype(np.int64))
        assert d.max() <= 1, key


def test_mask_step_sharded_matches_unsharded(monkeypatch):
    """The batched SOLOv2 mask step (vmapped forward + static top-K NMS +
    device SDF) sharded over the mesh == single-device, elementwise."""
    from prisma_tpu.bands import mask_band
    from prisma_tpu.models import solov2

    cfg = solov2.SOLOv2Config(nms_pre=32, max_per_img=8, scale=(160, 96))
    params = solov2.init_params(jax.random.key(4), cfg)
    frames = np.random.default_rng(5).integers(
        0, 255, size=(8, 48, 64, 3)).astype(np.uint8)

    def build():
        return mask_band._make_step(params, (48, 64), cfg, confidence=0.1,
                                    sdf=True)

    sharded = build()(frames)

    import prisma_tpu.parallel as par
    monkeypatch.setattr(par, "data_mesh_or_none", lambda: None)
    unsharded = build()(frames)

    np.testing.assert_allclose(np.asarray(sharded["composite"]),
                               np.asarray(unsharded["composite"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["green"]),
                               np.asarray(unsharded["green"]), atol=1e-5)


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
