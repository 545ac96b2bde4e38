"""MiDaS DPT-Large structural tests (hub code not vendored -> no torch oracle;
architecture implemented from the published spec, converter tested by layout)."""

import numpy as np
import pytest

import jax

from prisma_tpu.models import midas as jmidas


def test_midas_forward_shapes():
    params = jmidas.init_params(jax.random.key(0))
    x = np.random.default_rng(0).normal(size=(1, 96, 128, 3)).astype(np.float32)
    out = jmidas.forward(params, x)
    assert out.shape == (1, 96, 128)
    assert float(np.asarray(out).min()) >= 0.0  # non_negative head


def test_midas_infer_resizes_back(monkeypatch):
    monkeypatch.setenv("PRISMA_MIDAS_TARGET", "96")
    params = jmidas.init_params(jax.random.key(0))
    frames = np.random.default_rng(1).integers(0, 255, (2, 50, 70, 3)).astype(np.uint8)
    out = jmidas.infer(params, frames, target=96)
    assert np.asarray(out).shape == (2, 50, 70)


def test_midas_band_image(tmp_path, monkeypatch):
    import cv2
    from prisma_tpu.bands import depth_midas_band
    from prisma_tpu.runtime.config import RuntimeConfig
    monkeypatch.setenv("PRISMA_MIDAS_TARGET", "96")
    img_path = str(tmp_path / "photo.png")
    cv2.imwrite(img_path, np.random.default_rng(0).integers(
        0, 255, (48, 72, 3)).astype(np.uint8))
    io = depth_midas_band.run(img_path, runtime=RuntimeConfig(
        random_weights=True, compute_dtype="float32"))
    assert cv2.imread(io.output).shape == (48, 72, 3)
