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


def test_midas_infer_resizes_back():
    params = jmidas.init_params(jax.random.key(0))
    frames = np.random.default_rng(1).integers(0, 255, (2, 50, 70, 3)).astype(np.uint8)
    out = jmidas.infer(params, frames, target=96)
    assert np.asarray(out).shape == (2, 50, 70)


def test_midas_band_image(tmp_path):
    import cv2
    from prisma_tpu.bands import depth_midas_band
    from prisma_tpu.runtime.config import RuntimeConfig
    img_path = str(tmp_path / "photo.png")
    cv2.imwrite(img_path, np.random.default_rng(0).integers(
        0, 255, (48, 72, 3)).astype(np.uint8))
    io = depth_midas_band.run(img_path, target=96, runtime=RuntimeConfig(
        random_weights=True, compute_dtype="float32"))
    assert cv2.imread(io.output).shape == (48, 72, 3)


# ---------------------------------------------------------------------------
# MiDaS v2.1 (MidasNet) — torch replica oracle (hub code not vendored; the
# replica below encodes the published midas/midas_net.py + blocks.py
# architecture, and the converter consumes its state_dict layout verbatim)
# ---------------------------------------------------------------------------

def _build_torch_midas2():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=32, base_width=8):
            super().__init__()
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    def make_layer(inplanes, planes, blocks, stride):
        down = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(inplanes, planes, stride, down)]
        for _ in range(1, blocks):
            layers.append(Bottleneck(planes * 4, planes))
        return nn.Sequential(*layers)

    class ResidualConvUnit(nn.Module):
        def __init__(self, features):
            super().__init__()
            self.conv1 = nn.Conv2d(features, features, 3, 1, 1, bias=True)
            self.conv2 = nn.Conv2d(features, features, 3, 1, 1, bias=True)
            self.relu = nn.ReLU(inplace=False)

        def forward(self, x):
            out = self.conv1(self.relu(x))
            out = self.conv2(self.relu(out))
            return out + x

    class FeatureFusionBlock(nn.Module):
        def __init__(self, features):
            super().__init__()
            self.resConfUnit1 = ResidualConvUnit(features)
            self.resConfUnit2 = ResidualConvUnit(features)

        def forward(self, *xs):
            import torch.nn.functional as F
            output = xs[0]
            if len(xs) == 2:
                output = output + self.resConfUnit1(xs[1])
            output = self.resConfUnit2(output)
            return F.interpolate(output, scale_factor=2, mode="bilinear",
                                 align_corners=True)

    class Interpolate(nn.Module):
        def __init__(self, scale_factor, mode):
            super().__init__()
            self.scale_factor, self.mode = scale_factor, mode

        def forward(self, x):
            import torch.nn.functional as F
            return F.interpolate(x, scale_factor=self.scale_factor,
                                 mode=self.mode, align_corners=False)

    class MidasNet(nn.Module):
        def __init__(self, features=256):
            super().__init__()
            conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            bn1 = nn.BatchNorm2d(64)
            self.pretrained = nn.Module()
            self.pretrained.layer1 = nn.Sequential(
                conv1, bn1, nn.ReLU(True), nn.MaxPool2d(3, 2, 1),
                make_layer(64, 64, 3, 1))
            self.pretrained.layer2 = make_layer(256, 128, 4, 2)
            self.pretrained.layer3 = make_layer(512, 256, 23, 2)
            self.pretrained.layer4 = make_layer(1024, 512, 3, 2)
            self.scratch = nn.Module()
            self.scratch.layer1_rn = nn.Conv2d(256, features, 3, 1, 1, bias=False)
            self.scratch.layer2_rn = nn.Conv2d(512, features, 3, 1, 1, bias=False)
            self.scratch.layer3_rn = nn.Conv2d(1024, features, 3, 1, 1, bias=False)
            self.scratch.layer4_rn = nn.Conv2d(2048, features, 3, 1, 1, bias=False)
            self.scratch.refinenet1 = FeatureFusionBlock(features)
            self.scratch.refinenet2 = FeatureFusionBlock(features)
            self.scratch.refinenet3 = FeatureFusionBlock(features)
            self.scratch.refinenet4 = FeatureFusionBlock(features)
            self.scratch.output_conv = nn.Sequential(
                nn.Conv2d(features, 128, 3, 1, 1),
                Interpolate(2, "bilinear"),
                nn.Conv2d(128, 32, 3, 1, 1),
                nn.ReLU(True),
                nn.Conv2d(32, 1, 1),
                nn.ReLU(True))

        def forward(self, x):
            import torch
            l1 = self.pretrained.layer1(x)
            l2 = self.pretrained.layer2(l1)
            l3 = self.pretrained.layer3(l2)
            l4 = self.pretrained.layer4(l3)
            r1 = self.scratch.layer1_rn(l1)
            r2 = self.scratch.layer2_rn(l2)
            r3 = self.scratch.layer3_rn(l3)
            r4 = self.scratch.layer4_rn(l4)
            p4 = self.scratch.refinenet4(r4)
            p3 = self.scratch.refinenet3(p4, r3)
            p2 = self.scratch.refinenet2(p3, r2)
            p1 = self.scratch.refinenet1(p2, r1)
            return torch.squeeze(self.scratch.output_conv(p1), dim=1)

    return MidasNet()


@pytest.mark.slow
def test_midas2_parity_with_torch_replica():
    torch = pytest.importorskip("torch")
    from prisma_tpu.weights.torch_convert import (convert_checked,
                                                  convert_midas2)

    torch.manual_seed(0)
    model = _build_torch_midas2()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)
    model.eval()

    x = np.random.default_rng(0).normal(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(x)).numpy()

    params = convert_checked(convert_midas2, model.state_dict())
    ours = np.asarray(jmidas.midas2_forward(
        params, x.transpose(0, 2, 3, 1), precision="highest"))
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_midas2_infer_shapes():
    params = jmidas.init_params_v2(jax.random.key(0))
    frames = np.random.default_rng(1).integers(0, 255, (1, 50, 70, 3)).astype(np.uint8)
    out = jmidas.infer_v2(params, frames, target=96)
    assert np.asarray(out).shape == (1, 50, 70)


def test_midas_band_all_versions(tmp_path):
    import cv2
    from prisma_tpu.bands import depth_midas_band
    from prisma_tpu.runtime.config import RuntimeConfig
    img_path = str(tmp_path / "photo.png")
    cv2.imwrite(img_path, np.random.default_rng(0).integers(
        0, 255, (48, 72, 3)).astype(np.uint8))
    for i, version in enumerate(["midas2-small", "midas2", "midas3-small",
                                 "midas3"]):
        out_path = str(tmp_path / f"depth_midas_v{i}.png")
        io = depth_midas_band.run(
            img_path, output=out_path, target=96, runtime=RuntimeConfig(
                random_weights=True, compute_dtype="float32"),
            model_version=version)
        assert cv2.imread(io.output).shape == (48, 72, 3)
