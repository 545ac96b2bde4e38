"""ZoeD_N (BEiT core) structural tests; rel-pos index vs timm convention."""

import numpy as np
import pytest

import jax

from prisma_tpu.models import beit as jbeit
from prisma_tpu.models import zoed as jzoed


def test_relative_position_index_square():
    idx = jbeit.relative_position_index(3, 3)
    num_rel = 5 * 5
    assert idx.shape == (10, 10)
    assert idx[0, 0] == num_rel + 2
    assert (idx[0, 1:] == num_rel).all()
    assert (idx[1:, 0] == num_rel + 1).all()
    # token self-offset maps to the table center
    center = (2 * 3 - 1) * (3 - 1) + (3 - 1)
    assert (np.diag(idx)[1:] == center).all()
    # symmetry: index(i,j) and index(j,i) mirror through the center
    assert idx[1, 2] + idx[2, 1] == 2 * center


def test_rel_pos_table_resize_passthrough():
    table = np.random.default_rng(0).normal(size=((2 * 3 - 1) ** 2 + 3, 4))
    out = np.asarray(jbeit.resize_rel_pos_table(table, (3, 3), (3, 3)))
    np.testing.assert_allclose(out, table, atol=1e-6)
    out2 = jbeit.resize_rel_pos_table(table, (3, 3), (3, 5))
    out2 = np.asarray(out2)
    assert out2.shape == ((2 * 3 - 1) * (2 * 5 - 1) + 3, 4)
    np.testing.assert_allclose(out2[-3:], table[-3:], atol=1e-6)  # cls rows unchanged


def test_zoed_infer_shapes():
    params = jzoed.init_params(jax.random.key(0), depth=4)
    frames = np.random.default_rng(0).integers(0, 255, (1, 40, 56, 3)).astype(np.uint8)
    out = jzoed.infer(params, frames, img_size=(64, 96))
    assert np.asarray(out).shape == (1, 40, 56)
    assert np.isfinite(np.asarray(out)).all()


def test_zoed_band_image(tmp_path, monkeypatch):
    import cv2
    from prisma_tpu.bands import depth_zoedepth_band
    from prisma_tpu.runtime.config import RuntimeConfig
    monkeypatch.setenv("PRISMA_ZOED_DEPTH", "4")
    img_path = str(tmp_path / "photo.png")
    cv2.imwrite(img_path, np.random.default_rng(0).integers(
        0, 255, (40, 56, 3)).astype(np.uint8))
    io = depth_zoedepth_band.run(img_path, img_size=(64, 96),
                                 runtime=RuntimeConfig(
        random_weights=True, compute_dtype="float32"))
    assert cv2.imread(io.output).shape == (40, 56, 3)
