"""Numeric parity: our JAX Depth-Anything vs the reference torch model
(random weights, converted through prisma_tpu.weights.torch_convert)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from prisma_tpu.models import depth_anything as da
from prisma_tpu.models import vit as pvit
from prisma_tpu.weights.torch_convert import (convert_checked,
                                              convert_depth_anything)

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_model():
    """Construct the reference DepthAnything (vits) with random weights."""
    cwd = os.getcwd()
    sys.path.insert(0, os.path.join(REF, "bands"))
    try:
        os.chdir(REF)
        torch.manual_seed(0)
        from d_anything.dpt import DPT_DINOv2
        model = DPT_DINOv2(encoder="vits", features=64,
                           out_channels=[48, 96, 192, 384], use_clstoken=False)
        model.eval()
        return model
    finally:
        os.chdir(cwd)


def test_depth_anything_parity_vits(ref_model):
    H, W = 126, 154  # multiple of 14, differs from 518 grid -> pos-embed interp
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, size=(1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        theirs = ref_model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    params = convert_checked(convert_depth_anything,
                             ref_model.state_dict(), depth=12)
    ours = np.asarray(da.forward(params, x, encoder="vits", precision="highest"))

    assert ours.shape == theirs.shape
    scale = max(np.abs(theirs).max(), 1e-6)
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale, rtol=2e-3)


def test_vit_intermediate_parity(ref_model):
    """ViT features alone, at the native 518 grid (no pos-embed interp)."""
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 56, 70, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_model.pretrained.get_intermediate_layers(
            torch.from_numpy(x).permute(0, 3, 1, 2), 4, return_class_token=True)

    from prisma_tpu.weights.torch_convert import convert_dino_vit, strip_prefix
    sd = strip_prefix(ref_model.state_dict(), "pretrained.")
    params = convert_dino_vit(sd, depth=12)
    cfg = pvit.VIT_CONFIGS["vits"]
    ours = pvit.get_intermediate_layers(params, x, cfg, n=4, precision="highest")

    for (o_tok, o_cls), (t_tok, t_cls) in zip(ours, ref_feats):
        np.testing.assert_allclose(np.asarray(o_tok), t_tok.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(o_cls), t_cls.numpy(), atol=1e-4)


def test_infer_matches_driver_pipeline(ref_model):
    """Full infer() (resize 518 lower-bound + normalize + resize back) vs the
    reference driver math (bands/depth_anything.py:122-133)."""
    import cv2
    import torch.nn.functional as F

    rng = np.random.default_rng(8)
    frame = rng.integers(0, 255, size=(90, 160, 3)).astype(np.uint8)

    # reference driver path
    image = frame / 255.0
    from prisma_tpu.ops.resize import dpt_input_size
    w2, h2 = dpt_input_size(160, 90)
    img_r = cv2.resize(image, (w2, h2), interpolation=cv2.INTER_CUBIC)
    img_n = (img_r - np.array(da.IMAGENET_MEAN)) / np.array(da.IMAGENET_STD)
    t = torch.from_numpy(img_n.transpose(2, 0, 1)[None]).float()
    with torch.no_grad():
        d = ref_model(t)
    theirs = F.interpolate(d[None], (90, 160), mode="bilinear",
                           align_corners=False)[0, 0].numpy()

    params = convert_checked(convert_depth_anything,
                             ref_model.state_dict(), depth=12)
    ours = np.asarray(da.infer(params, frame[None], encoder="vits",
                               precision="highest"))[0]
    scale = max(np.abs(theirs).max(), 1e-6)
    np.testing.assert_allclose(ours, theirs, atol=5e-4 * scale, rtol=5e-3)
