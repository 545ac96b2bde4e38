"""Marigold structural tests (tiny SD2 config) + DDIM/ensemble parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prisma_tpu.models import marigold as jmar
from prisma_tpu.models import sd2

TINY_UNET = sd2.UNetConfig(block_channels=(32, 64), cross_attention_dim=64,
                           head_dim=16, norm_groups=8)
TINY_VAE = sd2.VAEConfig(block_channels=(32, 64), norm_groups=8)


def test_ddim_timesteps():
    ts = jmar.ddim_timesteps(10)
    assert list(ts) == [901, 801, 701, 601, 501, 401, 301, 201, 101, 1]


def test_ddim_step_epsilon_consistency():
    """For perfect eps prediction, DDIM transports a clean sample exactly."""
    cfg = jmar.DDIMConfig(prediction_type="epsilon")
    alphas = jnp.asarray(jmar.ddim_alphas(cfg))
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)))
    eps = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4)))
    t, t_prev = 501, 401
    xt = jnp.sqrt(alphas[t]) * x0 + jnp.sqrt(1 - alphas[t]) * eps
    x_prev = jmar.ddim_step(eps, t, t_prev, xt, alphas, cfg)
    expected = jnp.sqrt(alphas[t_prev]) * x0 + jnp.sqrt(1 - alphas[t_prev]) * eps
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected),
                               atol=1e-6)


def test_ddim_step_v_prediction_consistency():
    cfg = jmar.DDIMConfig(prediction_type="v_prediction")
    alphas = jnp.asarray(jmar.ddim_alphas(cfg))
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)))
    eps = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4)))
    t, t_prev = 301, 201
    xt = jnp.sqrt(alphas[t]) * x0 + jnp.sqrt(1 - alphas[t]) * eps
    v = jnp.sqrt(alphas[t]) * eps - jnp.sqrt(1 - alphas[t]) * x0
    x_prev = jmar.ddim_step(v, t, t_prev, xt, alphas, cfg)
    expected = jnp.sqrt(alphas[t_prev]) * x0 + jnp.sqrt(1 - alphas[t_prev]) * eps
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected),
                               atol=1e-6)


def test_ensemble_parity_with_reference():
    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_ensemble", "/root/reference/bands/marigold/util/ensemble.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(2)
    base = rng.uniform(0, 1, size=(12, 16)).astype(np.float32)
    preds = np.stack([base * rng.uniform(0.7, 1.3) + rng.uniform(-0.2, 0.2)
                      for _ in range(4)])
    theirs, t_unc = mod.ensemble_depths(torch.from_numpy(preds.copy()))
    ours, o_unc = jmar.ensemble_depths(preds.copy())
    np.testing.assert_allclose(ours, theirs.numpy(), atol=5e-3)
    np.testing.assert_allclose(o_unc, t_unc.numpy(), atol=5e-3)


def test_ensemble_device_matches_host():
    """The production on-device BFGS ensembling lands within ~1e-2 of the
    host scipy replica after renormalization (different 2-iteration solver
    trajectories; see ensemble_depths_device docstring)."""
    rng = np.random.default_rng(5)
    base = rng.uniform(0, 1, size=(24, 32)).astype(np.float32)
    preds = np.stack([base * rng.uniform(0.7, 1.3) + rng.uniform(-0.2, 0.2)
                      + rng.normal(0, 0.005, size=base.shape).astype(np.float32)
                      for _ in range(6)]).astype(np.float32)
    host, h_unc = jmar.ensemble_depths(preds.copy())
    dev, d_unc = jmar.ensemble_depths_device(preds.copy())
    assert dev.shape == host.shape and d_unc.shape == h_unc.shape
    np.testing.assert_allclose(dev, host, atol=2e-2)
    np.testing.assert_allclose(d_unc, h_unc, atol=2e-2)


def test_unet_forward_shapes():
    params = jmar.init_params(jax.random.key(0), TINY_UNET, TINY_VAE)
    x = jnp.zeros((2, 16, 24, 8))
    t = jnp.asarray([501, 501])
    ctx = jnp.zeros((2, 2, 64))
    out = sd2.unet_forward(params["unet"], x, t, ctx, TINY_UNET)
    assert out.shape == (2, 16, 24, 4)


def test_vae_roundtrip_shapes():
    params = jmar.init_params(jax.random.key(0), TINY_UNET, TINY_VAE)
    x = jnp.zeros((1, 32, 48, 3))
    z = sd2.vae_encode(params["vae"], x, TINY_VAE)
    assert z.shape == (1, 16, 24, 4)  # one downsample in the tiny 2-block vae
    y = sd2.vae_decode(params["vae"], z, TINY_VAE)
    assert y.shape == (1, 32, 48, 3)


def test_marigold_infer_tiny():
    params = jmar.init_params(jax.random.key(0), TINY_UNET, TINY_VAE)
    frame = np.random.default_rng(0).integers(0, 255, (40, 56, 3)).astype(np.uint8)
    depth = jmar.infer(params, frame, denoising_steps=2, ensemble_size=2,
                       processing_res=48, unet_cfg=TINY_UNET)
    assert depth.shape == (40, 56)
    assert np.isfinite(depth).all()


def test_marigold_infer_single_chip_path(monkeypatch):
    """The device-resident single-chip epilogue (mesh=None: preds -> BFGS ->
    resize with no host round trips) must match the mesh/host-gather path."""
    from prisma_tpu import parallel

    params = jmar.init_params(jax.random.key(0), TINY_UNET, TINY_VAE)
    frame = np.random.default_rng(1).integers(0, 255, (40, 56, 3)).astype(np.uint8)
    ref = jmar.infer(params, frame, denoising_steps=2, ensemble_size=2,
                     processing_res=48, unet_cfg=TINY_UNET)
    monkeypatch.setattr(parallel, "data_mesh_or_none", lambda: None)
    got = jmar.infer(params, frame, denoising_steps=2, ensemble_size=2,
                     processing_res=48, unet_cfg=TINY_UNET)
    assert got.shape == ref.shape
    # same preds; the device BFGS vs device BFGS trajectories are identical,
    # only fetch points differ -> tight f32 agreement
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_marigold_band_image(tmp_path, monkeypatch):
    import cv2
    from prisma_tpu.bands import depth_marigold_band
    from prisma_tpu.runtime.config import RuntimeConfig
    monkeypatch.setenv("PRISMA_MARIGOLD_TINY", "1")
    img_path = str(tmp_path / "photo.png")
    cv2.imwrite(img_path, np.random.default_rng(0).integers(
        0, 255, (40, 56, 3)).astype(np.uint8))
    io = depth_marigold_band.run(
        img_path, denoise_steps=2, ensemble_size=2, processing_res=48,
        runtime=RuntimeConfig(random_weights=True, compute_dtype="float32"))
    assert cv2.imread(io.output).shape == (40, 56, 3)


def test_band_seed_is_global_frame_index():
    """Batch regrouping must not change per-frame latents (frame-index resume
    regroups batches; advisor round-2 medium finding): frame k inferred as
    part of any batch/offset grouping gives the identical depth map."""
    from prisma_tpu.bands import depth_marigold_band as band

    params = jmar.init_params(jax.random.key(0), TINY_UNET, TINY_VAE)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, size=(3, 40, 56, 3)).astype(np.uint8)
    kw = dict(unet_cfg=TINY_UNET, steps=2, ensemble=2, res=24,
              dtype=jnp.float32)
    all_at_once = np.asarray(band._infer_frames(params, frames, idx0=0, **kw))
    # resume-style regrouping: frame 0 alone, then frames 1-2 with idx0=1
    first = np.asarray(band._infer_frames(params, frames[:1], idx0=0, **kw))
    rest = np.asarray(band._infer_frames(params, frames[1:], idx0=1, **kw))
    np.testing.assert_array_equal(all_at_once[0], first[0])
    np.testing.assert_array_equal(all_at_once[1:], rest)
