"""camera_colmap CSV export, concat, and viewer pure-helper tests."""

import os

import numpy as np

from prisma_tpu.bands import camera_colmap_band
from prisma_tpu.cli.view import decode_depth_band, extract_values, scale_camera
from prisma_tpu.io.colmap_model import Camera
from prisma_tpu.utils import meta
from tests.ref_loader import ref_colmap
from tests.test_writers_colmap import _write_fake_colmap_model


def test_convert_to_csv(tmp_path):
    ref = ref_colmap()
    folder = str(tmp_path)
    sparse = os.path.join(folder, "sparse")
    os.makedirs(sparse)
    _write_fake_colmap_model(tmp_path / "sparse", ref)
    images = os.path.join(folder, "images")
    os.makedirs(images)
    open(os.path.join(images, "000001.png"), "w").close()

    data = {"bands": {}}
    out = os.path.join(folder, "camera_pose.csv")
    camera_colmap_band.convert_to_csv(folder, out, data, expected_frames=1)

    lines = open(out).read().splitlines()
    assert lines[0].startswith("# f,ox,oy,R[0,0]")
    vals = np.array([float(v) for v in lines[1].split(",")])
    assert vals.shape == (15,)
    # camera params f, ox, oy = PINHOLE params[:3] = 600, 600, 320
    np.testing.assert_allclose(vals[:3], [600.0, 600.0, 320.0])
    # rotation block must be orthonormal
    R = vals[3:12].reshape(3, 3)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(vals[12:], [0.5, -1.0, 2.0])
    assert data["model"] == "PINHOLE"
    assert "field_of_view" in data


def test_concat_image(tmp_path):
    import cv2
    from prisma_tpu.cli.concat import concat_image
    folder = str(tmp_path)
    meta.create_metadata(folder)
    a = np.full((10, 12, 3), 50, np.uint8)
    b = np.full((10, 12, 3), 200, np.uint8)
    cv2.imwrite(os.path.join(folder, "rgba.png"), a)
    cv2.imwrite(os.path.join(folder, "depth.png"), b)
    data = {"bands": {"rgba": {"url": "rgba.png"}, "depth": {"url": "depth.png"}}}
    out = os.path.join(folder, "sheet.png")
    concat_image(folder, out, data, ["depth"], ["rgba"])
    img = cv2.imread(out)
    assert img.shape == (20, 12, 3)
    assert img[5, 5, 0] == 200 and img[15, 5, 0] == 50


def test_view_helpers(tmp_path):
    # extract_values: csv + scalar blocks
    folder = str(tmp_path)
    open(os.path.join(folder, "d_min.csv"), "w").write("1.5\n2.5\n")
    data = {"bands": {
        "depth_anything": {"values": {
            "min": {"type": "float", "url": "d_min.csv"},
            "max": {"type": "float", "value": 9.0},
        }}}}
    values = extract_values(folder, data)
    assert values["depth_anything_min"] == [1.5, 2.5]
    assert values["depth_anything_max"] == 9.0

    # depth decode round trip through the heatmap
    from prisma_tpu.ops import encode as enc
    heat = np.linspace(0.05, 0.95, 64, dtype=np.float32).reshape(8, 8)
    rgb = (np.asarray(enc.heat_to_rgb(heat)) * 255).astype(np.uint8)
    depth = decode_depth_band(rgb, 2.0, 12.0)
    np.testing.assert_allclose(depth, 2.0 + heat * 10.0, atol=0.15)

    # camera scaling
    cam = Camera(1, "PINHOLE", 640, 480, np.array([600.0, 600.0, 320.0, 240.0]))
    scaled, scale = scale_camera(cam, (320, 240))
    np.testing.assert_allclose(scale, [0.5, 0.5])
    np.testing.assert_allclose(scaled.params, [300, 300, 160, 120])


def test_weight_cache_roundtrip(tmp_path):
    import jax.numpy as jnp
    import numpy as np
    from prisma_tpu.runtime.config import RuntimeConfig
    from prisma_tpu.weights import store

    runtime = RuntimeConfig(models_dir=str(tmp_path))
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "nested": {"b": jnp.ones((4,), jnp.bfloat16)}}
    store.save_converted(runtime, "demo", params)
    back = store.load_converted(runtime, "demo")
    assert back is not None
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(params["a"]))
    assert back["nested"]["b"].dtype == jnp.bfloat16
    assert store.load_converted(runtime, "missing") is None
