"""Writers (flo/ply/depth png) and COLMAP model reader round-trips."""

import numpy as np

from prisma_tpu.io import writers
from prisma_tpu.io.colmap_model import (
    Camera, Image, Point3D, qvec2rotmat, read_model, rotmat2qvec)
from tests.ref_loader import ref_colmap

RNG = np.random.default_rng(1)


def test_flo_roundtrip(tmp_path):
    flow = RNG.normal(size=(12, 20, 2)).astype(np.float32)
    p = str(tmp_path / "t.flo")
    writers.write_flo(p, flow)
    back = writers.read_flo(p)
    np.testing.assert_array_equal(back, flow)
    raw = open(p, "rb").read()
    assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(202021.25)
    assert np.frombuffer(raw[4:12], np.int32).tolist() == [20, 12]


def test_ply_layout(tmp_path):
    pcl = RNG.normal(size=(10, 3)).astype(np.float32)
    rgb = RNG.integers(0, 255, size=(10, 3)).astype(np.uint8)
    p = str(tmp_path / "t.ply")
    writers.save_point_cloud(pcl, rgb, p)
    raw = open(p, "rb").read()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:header_end].decode()
    assert "format binary_little_endian 1.0" in header
    assert "element vertex 10" in header
    body = np.frombuffer(raw[header_end:],
                         dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    np.testing.assert_allclose(np.stack([body["x"], body["y"], body["z"]], -1), pcl)
    np.testing.assert_array_equal(
        np.stack([body["red"], body["green"], body["blue"]], -1), rgb)


def test_write_depth_16bit(tmp_path):
    import cv2
    depth = RNG.uniform(0, 5, size=(8, 8)).astype(np.float32)
    p = str(tmp_path / "d.png")
    writers.write_depth(p, depth, normalize=True, heatmap=False)
    img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert img.dtype == np.uint16
    d = depth.astype(np.float64)
    expected = ((d - d.min()) / (d.max() - d.min()) * 65535).astype(np.uint16)
    np.testing.assert_array_equal(img, expected)


def test_write_depth_heatmap_range_pixels(tmp_path):
    import cv2
    depth = RNG.uniform(1.0, 42.0, size=(16, 16)).astype(np.float32)
    p = str(tmp_path / "h.png")
    writers.write_depth(p, depth, normalize=True, flip=True, heatmap=True)
    img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    # decode range pixels: 24-bit packing of min/max over [0, 1000]
    def decode(px):
        lo, mid, hi = [float(v) for v in px]
        L = lo / 255 * 255 + mid / 255 * 255 * 256 + hi / 255 * 255 * 65536
        return L / (256 ** 3 - 1) * 1000.0
    dmin, dmax = float(depth.min()), float(depth.max())
    assert abs(decode(img[0, 0]) - dmin) < 1e-3
    assert abs(decode(img[0, 1]) - dmax) < 1e-3


def _write_fake_colmap_model(tmp_path, ref):
    """Write a tiny model with the reference's writer, read with ours."""
    cams = {1: ref.Camera(id=1, model="PINHOLE", width=640, height=480,
                          params=np.array([600.0, 600.0, 320.0, 240.0]))}
    q = np.array([0.9, 0.1, 0.2, 0.4])
    q = q / np.linalg.norm(q)
    imgs = {
        7: ref.BaseImage(id=7, qvec=q, tvec=np.array([0.5, -1.0, 2.0]), camera_id=1,
                         name="000001.png", xys=np.array([[1.5, 2.5], [3.0, 4.0]]),
                         point3D_ids=np.array([11, -1])),
    }
    pts = {
        11: ref.Point3D(id=11, xyz=np.array([0.1, 0.2, 0.3]),
                        rgb=np.array([10, 20, 30]), error=0.5,
                        image_ids=np.array([7]), point2D_idxs=np.array([0])),
    }
    ref.write_model(cams, imgs, pts, path=str(tmp_path), ext=".bin")
    return cams, imgs, pts


def test_colmap_binary_reader_matches_reference(tmp_path):
    ref = ref_colmap()
    cams, imgs, pts = _write_fake_colmap_model(tmp_path, ref)
    ours_cams, ours_imgs, ours_pts = read_model(str(tmp_path))

    c, oc = cams[1], ours_cams[1]
    assert (oc.model, oc.width, oc.height) == (c.model, c.width, c.height)
    np.testing.assert_allclose(oc.params, c.params)

    i, oi = imgs[7], ours_imgs[7]
    np.testing.assert_allclose(oi.qvec, i.qvec)
    np.testing.assert_allclose(oi.tvec, i.tvec)
    assert oi.name == i.name and oi.camera_id == i.camera_id
    np.testing.assert_allclose(oi.xys, i.xys)
    np.testing.assert_array_equal(oi.point3D_ids, i.point3D_ids)

    p, op = pts[11], ours_pts[11]
    np.testing.assert_allclose(op.xyz, p.xyz)
    np.testing.assert_array_equal(op.rgb, p.rgb)
    assert op.error == p.error

    # rotation matrix parity
    np.testing.assert_allclose(qvec2rotmat(oi.qvec), ref.qvec2rotmat(i.qvec))
    np.testing.assert_allclose(rotmat2qvec(qvec2rotmat(oi.qvec)), oi.qvec, atol=1e-9)


def test_colmap_text_reader_matches_reference(tmp_path):
    ref = ref_colmap()
    cams, imgs, pts = _write_fake_colmap_model(tmp_path, ref)
    ref.write_model(cams, imgs, pts, path=str(tmp_path), ext=".txt")
    import os
    for f in ("cameras.bin", "images.bin", "points3D.bin"):
        os.remove(str(tmp_path / f))
    ours_cams, ours_imgs, ours_pts = read_model(str(tmp_path))
    np.testing.assert_allclose(ours_imgs[7].qvec, imgs[7].qvec)
    np.testing.assert_allclose(ours_cams[1].params, cams[1].params)
    np.testing.assert_allclose(ours_pts[11].xyz, pts[11].xyz)


def test_point_cloud_geometry():
    depth = np.ones((8, 10), dtype=np.float32) * 2.0
    pcl = writers.create_point_cloud(depth, u0=5.0, v0=4.0, fx=1000.0, fy=1000.0)
    assert pcl.shape == (8, 10, 3)
    np.testing.assert_allclose(pcl[..., 2], -2.0)  # z = -depth
    np.testing.assert_allclose(pcl[4, 5], [0.0, 0.0, -2.0])  # principal point
