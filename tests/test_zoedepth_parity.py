"""Metric Depth-Anything (ZoeDepth bins head over DINOv2 DPT core) parity vs
the reference's vendored zoedepth implementation (random weights)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from prisma_tpu.models import dpt as pdpt
from prisma_tpu.models import vit as pvit
from prisma_tpu.models import zoedepth as jzoe
from prisma_tpu.weights.torch_convert import (convert_checked,
                                              convert_metric_depth_anything)

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_zoedepth():
    cwd = os.getcwd()
    for p in (os.path.join(REF, "bands"), os.path.join(REF, "bands/patchfusion")):
        if p not in sys.path:
            sys.path.insert(0, p)
    # stub torchvision (absent in this image): only Normalize is imported
    if "torchvision" not in sys.modules:
        import types

        class _Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, x):
                return (x - self.mean.to(x)) / self.std.to(x)

        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Normalize = _Normalize
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    try:
        os.chdir(REF)
        torch.manual_seed(0)
        from zoedepth.models.base_models.depth_anything import DepthAnythingCore
        from zoedepth.models.base_models.dpt_dinov2.dpt import DPT_DINOv2
        from zoedepth.models.zoedepth.zoedepth_v1 import ZoeDepth

        midas = DPT_DINOv2(encoder="vits", features=64,
                           out_channels=[48, 96, 192, 384], use_clstoken=False)
        core = DepthAnythingCore(midas, trainable=False, fetch_features=True,
                                 keep_aspect_ratio=False, img_size=[126, 154])
        core.output_channels = [64] * 5  # tiny DPT (features=64) for the test
        model = ZoeDepth(core, n_bins=16, bin_centers_type="softplus",
                         bin_embedding_dim=128, min_depth=1e-3, max_depth=10,
                         n_attractors=[16, 8, 4, 1], attractor_alpha=1000,
                         attractor_gamma=2, attractor_kind="mean",
                         attractor_type="inv", min_temp=0.0212, max_temp=50.0,
                         train_midas=False, midas_lr_factor=1,
                         encoder_lr_factor=0, pos_enc_lr_factor=0)
        with torch.no_grad():
            for p in model.parameters():
                p.normal_(0, 0.05)
        model.eval()
        return model
    finally:
        os.chdir(cwd)


def test_metric_depth_anything_parity(ref_zoedepth):
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 255, size=(100, 140, 3)).astype(np.uint8)

    x = torch.from_numpy((frame / 255.0).transpose(2, 0, 1)[None]).float()
    with torch.no_grad():
        out = ref_zoedepth(x)
    theirs = out["metric_depth"][0, 0].numpy()  # at out_conv resolution

    params = convert_checked(convert_metric_depth_anything,
                             ref_zoedepth.state_dict(), depth=12)
    cfg = jzoe.ZoeDepthConfig(n_bins=16)

    # replicate the pipeline up to the bins-head output (before resize-back)
    img = frame[None].astype(np.float32) / 255.0
    from prisma_tpu.models import depth_anything as da
    from prisma_tpu.ops.resize import resize2d
    img = (img - np.array(da.IMAGENET_MEAN)) / np.array(da.IMAGENET_STD)
    img = np.asarray(resize2d(jnp.asarray(img, jnp.float32), (126, 154),
                              method="linear", align_corners=True))
    vcfg = pvit.VIT_CONFIGS["vits"]
    feats = pvit.get_intermediate_layers(params["core"]["vit"], img, vcfg, n=4,
                                         precision="highest")
    rel, core_feats = pdpt.dpt_head(params["core"]["dpt"], feats, 9, 11,
                                    precision="highest", return_features=True)
    ours = np.asarray(jzoe.bins_head(params["head"], rel, core_feats, cfg,
                                     precision="highest"))[0]

    assert ours.shape == theirs.shape
    scale = max(abs(theirs).max(), 1e-6)
    np.testing.assert_allclose(ours, theirs, atol=1e-3 * scale, rtol=1e-3)


def test_bins_head_layers_parity(ref_zoedepth):
    """Individual layer parity: seed regressor + attractor + log binomial."""
    sd = ref_zoedepth.state_dict()
    params = convert_metric_depth_anything(sd, depth=12)
    cfg = jzoe.ZoeDepthConfig(n_bins=16)
    rng = np.random.default_rng(10)

    x = rng.normal(size=(1, 4, 5, 64)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        bt = ref_zoedepth.seed_bin_regressor(xt)[1].permute(0, 2, 3, 1).numpy()
    _, ours_centers = jzoe.seed_bin_regressor(params["head"]["seed_bin_regressor"],
                                              x, cfg, precision="highest")
    np.testing.assert_allclose(np.asarray(ours_centers), bt, atol=1e-5)

    b_prev = rng.uniform(0.5, 5.0, size=(1, 4, 5, 16)).astype(np.float32)
    emb = rng.normal(size=(1, 4, 5, 128)).astype(np.float32)
    with torch.no_grad():
        bn_t, bc_t = ref_zoedepth.attractors[0](
            torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            torch.from_numpy(b_prev.transpose(0, 3, 1, 2)),
            prev_b_embedding=None, interpolate=False)
    bn, bc = jzoe.attractor_layer(params["head"]["attractors"][0], emb, b_prev,
                                  None, cfg, precision="highest")
    np.testing.assert_allclose(np.asarray(bn), bn_t.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)


def test_metric_band_e2e(tmp_path, monkeypatch):
    """depth_anything band in metric mode (random weights, tiny zoe size)."""
    import cv2
    from prisma_tpu.bands import depth_anything_band
    from prisma_tpu.runtime.config import RuntimeConfig

    img_path = str(tmp_path / "photo.png")
    rng = np.random.default_rng(0)
    cv2.imwrite(img_path, rng.integers(0, 255, (48, 72, 3)).astype(np.uint8))
    io = depth_anything_band.run(
        img_path, metric="outdoor", encoder="vits", img_size=(126, 126),
        runtime=RuntimeConfig(random_weights=True, compute_dtype="float32"))
    out = cv2.imread(io.output)
    assert out.shape == (48, 72, 3)
