"""Resize parity vs torch.nn.functional.interpolate and cv2.resize."""

import numpy as np
import pytest

from prisma_tpu.ops.resize import dpt_input_size, resize2d, resize2d_nchw

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
import cv2  # noqa: E402

RNG = np.random.default_rng(7)


def _torch_resize(x_hwc, size, mode, align_corners):
    t = torch.from_numpy(x_hwc).permute(2, 0, 1)[None]
    y = F.interpolate(t, size=size, mode=mode, align_corners=align_corners)
    return y[0].permute(1, 2, 0).numpy()


@pytest.mark.parametrize("mode,ac", [("bilinear", False), ("bilinear", True),
                                     ("bicubic", False), ("bicubic", True)])
@pytest.mark.parametrize("shape", [((17, 23), (34, 46)), ((32, 32), (9, 13)),
                                   ((7, 9), (140, 90))])
def test_torch_interpolate_parity(mode, ac, shape):
    (h, w), (oh, ow) = shape
    x = RNG.normal(size=(h, w, 3)).astype(np.float32)
    method = {"bilinear": "linear", "bicubic": "cubic"}[mode]
    ours = np.asarray(resize2d(x, (oh, ow), method=method, align_corners=ac))
    theirs = _torch_resize(x, (oh, ow), mode, ac)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_scale_factor_semantics():
    """torch interpolate(scale_factor=s) maps coordinates with s, not out/in."""
    x = RNG.normal(size=(1, 4, 37, 37)).astype(np.float32)
    s = (5 + 0.1) / 37.0  # DINOv2 pos-embed trick: (w0 + 0.1) / sqrt(N)
    theirs = F.interpolate(torch.from_numpy(x), scale_factor=(s, s),
                           mode="bicubic").numpy()
    oh, ow = theirs.shape[-2:]
    ours = np.asarray(resize2d_nchw(x, (oh, ow), method="cubic",
                                    align_corners=False, scale=(s, s)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("interp,name", [(cv2.INTER_LINEAR, "linear"),
                                         (cv2.INTER_CUBIC, "cubic"),
                                         (cv2.INTER_AREA, "area")])
def test_cv2_parity(interp, name):
    x = RNG.uniform(0, 1, size=(30, 44, 3)).astype(np.float32)
    for oh, ow in [(61, 89), (15, 22)]:
        if name == "area" and oh > 30:
            continue  # cv2 INTER_AREA falls back to bilinear on upscale
        theirs = cv2.resize(x, (ow, oh), interpolation=interp)
        ours = np.asarray(resize2d(x, (oh, ow), method=name))
        np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_dpt_input_size():
    # lower_bound 518 multiple-of-14: 1920x1080 -> scale fits height
    w, h = dpt_input_size(1920, 1080)
    assert h == 518 and w % 14 == 0 and w >= 518
    assert w == round(1920 * (518 / 1080) / 14) * 14
    # square stays 518
    assert dpt_input_size(518, 518) == (518, 518)
    # smaller than target upscales
    w2, h2 = dpt_input_size(100, 200)
    assert min(w2, h2) >= 518


@pytest.mark.parametrize("mode,name", [("bilinear", "linear_aa"),
                                       ("bicubic", "cubic_aa")])
def test_torch_antialias_parity(mode, name):
    """PIL-style antialiased resize (torch interpolate antialias=True)."""
    import torch
    import torch.nn.functional as F
    x = RNG.uniform(0, 1, size=(1, 24, 36, 3)).astype(np.float32)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    for oh, ow in [(11, 17), (7, 9), (48, 72), (24, 36)]:
        theirs = F.interpolate(t, (oh, ow), mode=mode, antialias=True)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        ours = np.asarray(resize2d(x, (oh, ow), method=name))
        np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_pil_antialias_parity():
    from PIL import Image
    x = RNG.uniform(0, 255, size=(32, 48)).astype(np.float32)
    img = Image.fromarray(x, mode="F")
    for oh, ow, meth, name in [(13, 19, Image.BILINEAR, "linear_aa"),
                               (13, 19, Image.BICUBIC, "cubic_aa"),
                               (64, 96, Image.BILINEAR, "linear_aa")]:
        theirs = np.asarray(img.resize((ow, oh), meth))
        ours = np.asarray(resize2d(x[..., None], (oh, ow), method=name))[..., 0]
        np.testing.assert_allclose(ours, theirs, atol=2e-3)
