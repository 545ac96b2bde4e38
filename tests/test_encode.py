"""Golden tests: prisma_tpu.ops.encode vs the reference encoders (numeric oracle)."""

import numpy as np
import pytest

from prisma_tpu.ops import encode as enc
from tests.ref_loader import ref_encode

ref = ref_encode()
RNG = np.random.default_rng(0)


def test_hue_to_rgb_matches():
    hue = RNG.uniform(0, 1, size=(17, 23)).astype(np.float32)
    ours = np.asarray(enc.hue_to_rgb(hue))
    theirs = ref.hue_to_rgb(hue.astype(np.float64))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_heat_to_rgb_matches():
    heat = RNG.uniform(0, 1, size=(9, 11)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(enc.heat_to_rgb(heat)), ref.heat_to_rgb(heat.astype(np.float64)),
        atol=1e-6)


def test_heat_roundtrip():
    heat = np.linspace(0.001, 0.999, 64, dtype=np.float32).reshape(8, 8)
    rgb = np.asarray(enc.heat_to_rgb(heat))
    back = np.asarray(enc.rgb_to_heat(rgb))
    np.testing.assert_allclose(back, heat, atol=2e-3)


def test_rgb_to_heat_matches_reference():
    heat = RNG.uniform(0, 1, size=(16, 16))
    rgb = ref.heat_to_rgb(heat)
    ours = np.asarray(enc.rgb_to_heat(rgb.astype(np.float32)))
    theirs = ref.rgb_to_heat(rgb)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_saturation_matches():
    rgb = RNG.uniform(0, 1, size=(7, 5, 3)).astype(np.float32)
    sat = RNG.uniform(0, 1, size=(7, 5)).astype(np.float32)
    theirs = ref.saturation(rgb.astype(np.float64).copy(), sat.astype(np.float64))
    np.testing.assert_allclose(np.asarray(enc.saturation(rgb, sat)), theirs, atol=1e-6)


def test_sobel_edge_matches():
    depth = RNG.uniform(0, 1, size=(32, 48)).astype(np.float32)
    ours = np.asarray(enc.sobel_edge(depth))
    theirs = ref.float_to_edge(depth.astype(np.float64), ksize=1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_float_to_rgb_matches():
    vals = np.array([0.0, 0.1234, 3.25, 500.0, 999.9, 1000.0], dtype=np.float64)
    for v in vals:
        theirs = np.array(ref.float_to_rgb(v, 0.0, 1000.0))
        ours = np.asarray(enc.float_to_rgb(np.float32(v), 0.0, 1000.0))
        # f32 packing may differ by 1 LSB in the low channel vs float64
        np.testing.assert_allclose(ours, theirs, atol=1.01 / 255)


def test_process_flow_matches():
    flow = RNG.normal(0, 4, size=(24, 36, 2)).astype(np.float32)
    ours_rgb, ours_max = enc.process_flow(flow)
    theirs_rgb, theirs_max = ref.process_flow(flow.astype(np.float64))
    np.testing.assert_allclose(float(ours_max), theirs_max, rtol=1e-6)
    diff = np.abs(np.asarray(ours_rgb).astype(int) - theirs_rgb.astype(int))
    assert diff.max() <= 1  # floor-of-float32 vs floor-of-float64 at bin edges


def test_encode_flow_matches():
    flow = RNG.normal(0, 10, size=(16, 16, 2)).astype(np.float32)
    mask = RNG.uniform(size=(16, 16)) > 0.3
    ours = np.asarray(enc.encode_flow(flow, mask))
    # the reference receives float32 flow from torch at runtime, so compare at f32
    theirs = ref.encode_flow(flow.copy(), mask.copy())
    np.testing.assert_array_equal(ours, theirs)


def test_depth_to_heatmap_matches_write_depth_math():
    """Replicates write_depth(heatmap=True) math (io.py:138-166) and compares."""
    depth = (RNG.uniform(0.5, 9.0, size=(40, 64))).astype(np.float32)
    rgb_u8, dmin, dmax = enc.depth_to_heatmap(depth, normalize=True, flip=True,
                                              encode_range=True)
    rgb_u8 = np.asarray(rgb_u8)

    d = depth.astype(np.float64)
    ref_min, ref_max = d.min(), d.max()
    dn = (d - ref_min) / (ref_max - ref_min)
    dn = 1.0 - dn
    edge = ref.float_to_edge(dn, ksize=1)
    rgb = ref.heat_to_rgb(dn)
    rgb = ref.saturation(rgb, 1.0 - edge)
    rgb[0, 0] = ref.float_to_rgb(ref_min, 0.0, 1000.0)
    rgb[0, 1] = ref.float_to_rgb(ref_max, 0.0, 1000.0)
    expected = (rgb * 255).astype(np.uint8)

    assert float(dmin) == pytest.approx(ref_min, rel=1e-6)
    assert float(dmax) == pytest.approx(ref_max, rel=1e-6)
    diff = np.abs(rgb_u8.astype(int) - expected.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01  # stray off-by-ones only at float bin edges


def test_mask_to_rgb():
    m = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    ours = np.asarray(enc.mask_to_rgb(m))
    theirs = ref.mask_to_rgb(m)
    np.testing.assert_array_equal(ours, theirs)


def test_process_flow_zero_flow_nan_pins_to_reference():
    """The zero-flow last frame divides by max_distance == 0 exactly like the
    reference (encode.py:119-120); NaN -> uint8 casting is implementation-
    defined, so pin that XLA and numpy agree byte-for-byte (VERDICT weak #7)."""
    import warnings
    zero = np.zeros((6, 8, 2), np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # numpy 0/0 RuntimeWarning
        ref_rgb, ref_max = ref.process_flow(zero.copy())
    ours_rgb, ours_max = enc.process_flow(zero)
    assert float(ours_max) == float(ref_max) == 0.0
    np.testing.assert_array_equal(np.asarray(ours_rgb), ref_rgb)


def test_write_flow_png16_golden(tmp_path):
    """Byte-identical to the reference writer: cv2.imwrite of encode_flow
    (bands/common/flow.py:96)."""
    import cv2

    from prisma_tpu.io.writers import write_flow_png16

    flow = RNG.normal(0, 10, size=(16, 20, 2)).astype(np.float32)
    mask = RNG.uniform(size=(16, 20)) > 0.3
    ours_path = str(tmp_path / "ours.png")
    ref_path = str(tmp_path / "ref.png")
    write_flow_png16(ours_path, np.asarray(enc.encode_flow(flow, mask)))
    cv2.imwrite(ref_path, ref.encode_flow(flow.copy(), mask.copy()))
    assert open(ours_path, "rb").read() == open(ref_path, "rb").read()


def test_encode_data_into_img_matches(capsys):
    """Vectorized data-texture packer vs the reference (scalar + 3-vector +
    4-vector paths, incl. the reference's transposed scalar write quirk)."""
    scal = RNG.uniform(0, 5, size=(10,)).astype(np.float64)
    ours = enc.encode_data_into_img(scal, max_value=5.0, gain=0.9)
    theirs = ref.encode_data_into_img(scal.copy(), max_value=5.0, gain=0.9)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

    vec3 = RNG.uniform(-2, 2, size=(21, 3)).astype(np.float64)
    ours = enc.encode_data_into_img(vec3, min_value=-2.0, max_value=2.0)
    theirs = ref.encode_data_into_img(vec3.copy(), min_value=-2.0, max_value=2.0)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)

    vec4 = RNG.uniform(0, 1, size=(5, 4)).astype(np.float64)
    ours = enc.encode_data_into_img(vec4, min_value=0.0, max_value=1.0)
    theirs = ref.encode_data_into_img(vec4.copy(), min_value=0.0, max_value=1.0)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    capsys.readouterr()  # swallow the reference's debug prints


def test_rgb_to_hsv_and_encode_polar_match():
    rgb = RNG.uniform(0, 1, size=(9, 7, 3)).astype(np.float32)
    ours = np.asarray(enc.rgb_to_hsv(rgb))
    theirs = ref.rgb_to_hsv(rgb.astype(np.float64))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)

    a = RNG.uniform(0, 1, size=(6, 8)).astype(np.float32)
    rad = RNG.uniform(0, 1, size=(6, 8)).astype(np.float32)
    ours = np.asarray(enc.encode_polar(a, rad))
    theirs = ref.encode_polar(a.astype(np.float64), rad.astype(np.float64))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
