"""PatchFusion structural tests (tiny geometry) + tiling engine behavior."""

import numpy as np
import pytest

import jax

from prisma_tpu.models import patchfusion as pf


def test_tile_grid_counts():
    res = (480, 640)
    crop = (120, 160)
    assert len(pf._tile_grid(res, crop, 0, 0)) == 16
    assert len(pf._tile_grid(res, crop, crop[1] // 2, 0)) == 12
    assert len(pf._tile_grid(res, crop, 0, crop[0] // 2)) == 12
    assert len(pf._tile_grid(res, crop, crop[1] // 2, crop[0] // 2)) == 9
    # p49 = 16 + 12 + 12 + 9
    assert 16 + 12 + 12 + 9 == 49


def test_blur_mask_properties():
    m = pf.generate_blur_mask((120, 160))
    assert m.shape == (120, 160)
    assert m.min() == 0.0 and m.max() == 1.0
    assert m[60, 80] > 0.95  # center fully weighted


def test_resolution_ladder():
    assert pf.pick_resolution(480, 640) == (480, 640)
    assert pf.pick_resolution(720, 1280) == (1080, 1920)
    assert pf.pick_resolution(2000, 3000) == (2160, 3840)


@pytest.mark.slow
def test_patchfusion_infer_tiny():
    model_hw = (64, 96)
    params = pf.init_params(jax.random.key(0), beit_depth=4, model_hw=model_hw)
    img = np.random.default_rng(0).uniform(0, 1, (100, 140, 3)).astype(np.float32)
    depth = pf.infer(params, img, mode="p16", model_hw=model_hw)
    assert depth.shape == (100, 140)
    assert np.isfinite(depth).all()


@pytest.mark.slow
def test_patchfusion_infer_random_tiles():
    model_hw = (64, 96)
    params = pf.init_params(jax.random.key(0), beit_depth=4, model_hw=model_hw)
    img = np.random.default_rng(1).uniform(0, 1, (96, 128, 3)).astype(np.float32)
    depth = pf.infer(params, img, mode="r3", model_hw=model_hw)
    assert depth.shape == (96, 128)
    assert np.isfinite(depth).all()


@pytest.mark.slow
def test_patchfusion_fused_pass_matches_subbatch_path(monkeypatch):
    """The single-chip fused-pass path (one jit per pass, sub-batch scan
    inside) must match the per-sub-batch dispatch path: same prep math, same
    frozen-prior semantics, same sequential accumulation. XLA fuses the
    jit-boundary ops differently inside the scan, so agreement is f32
    ulp-level (measured max 3e-7 rel), not bit-exact."""
    from prisma_tpu import parallel

    model_hw = (64, 96)
    params = pf.init_params(jax.random.key(0), beit_depth=4,
                            model_hw=model_hw)
    img = np.random.default_rng(2).uniform(0, 1, (100, 140, 3)).astype(
        np.float32)
    # both paths on one device (mesh=None): isolates fused-vs-loop semantics
    # from mesh padding/collectives
    monkeypatch.setattr(parallel, "data_mesh_or_none", lambda: None)
    ref = pf.infer(params, img, mode="p49", model_hw=model_hw, tile_batch=2,
                   fused=False)
    got = pf.infer(params, img, mode="p49", model_hw=model_hw, tile_batch=2,
                   fused=True)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_patchfusion_infer_uint8_matches_float():
    # u8 frames normalize on device (band fast path); must equal the host
    # f32/255 path exactly (same f32 division, just on the other side of H2D)
    model_hw = (64, 96)
    params = pf.init_params(jax.random.key(0), beit_depth=4, model_hw=model_hw)
    img_u8 = np.random.default_rng(1).integers(0, 256, (100, 140, 3), dtype=np.uint8)
    ref = pf.infer(params, img_u8.astype(np.float32) / 255.0, mode="p16",
                   model_hw=model_hw)
    got = pf.infer(params, img_u8, mode="p16", model_hw=model_hw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
