"""End-to-end CLI test: process.py on a tiny synthetic video and image,
asserting the reference folder layout + metadata schema (README.md:136-214)."""

import json
import os

import numpy as np
import pytest


# 9x9 ViT grid: fast compile (--depth_size is the process.py budget override)
SMALL = ["--depth_size", "126"]


def _make_video(path, frames=5, w=96, h=64):
    from prisma_tpu.io.video import VideoWriter
    wr = VideoWriter(w, h, 24.0, filename=path)
    for i in range(frames):
        yy, xx = np.mgrid[0:h, 0:w]
        f = np.stack([(xx * 2 + i * 10) % 256, (yy * 3) % 256,
                      (xx + yy + i * 5) % 256], -1).astype(np.uint8)
        wr.write(f)
    wr.close()


def test_process_video_e2e(tmp_path):
    from prisma_tpu.cli.process import main
    clip = str(tmp_path / "clip.mp4")
    _make_video(clip)
    folder = main(["-i", clip, "--random_weights", "--encoder", "vits",
                   "--batch", "2", "--dtype", "float32",
                   "--flow", "none", "--mask", "none"] + SMALL)

    files = sorted(os.listdir(folder))
    assert "rgba.mp4" in files
    assert "depth_anything.mp4" in files
    assert "depth_anything_min.csv" in files
    assert "depth_anything_max.csv" in files
    assert "metadata.json" in files
    assert sorted(os.listdir(os.path.join(folder, "images"))) == [
        f"{i:06d}.png" for i in range(5)]

    meta = json.load(open(os.path.join(folder, "metadata.json")))
    assert meta["width"] == 96 and meta["height"] == 64
    assert meta["frames"] == 5 and meta["fps"] == 24.0
    assert meta["bands"]["depth"] == meta["bands"]["depth_anything"]
    assert meta["bands"]["depth_anything"]["values"]["min"]["url"] == \
        "depth_anything_min.csv"
    assert meta["principal_point"] == [48.0, 32.0]

    mins = open(os.path.join(folder, "depth_anything_min.csv")).read().splitlines()
    assert len(mins) == 5

    from prisma_tpu.io.video import get_video_data
    assert get_video_data(os.path.join(folder, "depth_anything.mp4"))[:2] == (96, 64)


def test_process_image_e2e(tmp_path):
    import cv2
    from prisma_tpu.cli.process import main
    img_path = str(tmp_path / "photo.jpg")
    rng = np.random.default_rng(0)
    cv2.imwrite(img_path, rng.integers(0, 255, size=(48, 72, 3)).astype(np.uint8))

    folder = main(["-i", img_path, "--random_weights", "--encoder", "vits",
                   "--dtype", "float32", "-d", "depth_anything",
                   "--mask", "none", "--ply"] + SMALL)
    files = sorted(os.listdir(folder))
    assert "rgba.png" in files
    assert "depth_anything.png" in files
    assert "depth_anything.ply" in files
    meta = json.load(open(os.path.join(folder, "metadata.json")))
    assert meta["bands"]["depth_anything"]["values"]["min"]["type"] == "float"
    assert "value" in meta["bands"]["depth_anything"]["values"]["min"]
    img = cv2.imread(os.path.join(folder, "depth_anything.png"))
    assert img.shape == (48, 72, 3)


def test_depth_band_multichip_sharded(tmp_path):
    """The depth step runs sharded over the 8 virtual CPU devices."""
    import jax
    import numpy as np
    assert len(jax.devices()) == 8
    from prisma_tpu.bands import depth_base
    from prisma_tpu.runtime.config import RuntimeConfig
    from prisma_tpu.weights.store import load_depth_anything

    runtime = RuntimeConfig(random_weights=True, compute_dtype="float32",
                            batch_size=8)
    kind, params, enc = load_depth_anything(runtime, encoder="vits")
    import functools
    from prisma_tpu.models import depth_anything as da
    infer = functools.partial(da.infer, encoder=enc, target=126)
    step = depth_base.make_step(params, infer, True, False)
    frames = np.random.default_rng(0).integers(0, 255, (8, 48, 64, 3)).astype(np.uint8)
    out = step(frames)
    assert np.asarray(out["heat"]).shape == (8, 48, 64, 3)
    assert np.asarray(out["min"]).shape == (8,)


@pytest.mark.slow
def test_process_video_full_default_pipeline(tmp_path, monkeypatch):
    """The complete default video pipeline (mask + depth + flow) on random
    weights, asserting the full folder inventory of reference README.md:136-214
    (minus COLMAP, whose binary is absent here) — VERDICT item 10.
    """
    from prisma_tpu.cli.process import main
    # the orchestration is under test, not SOLOv2 numerics: shrink the mmdet
    # (1333, 800) test budget so the CPU mask pass stays fast
    from prisma_tpu.models import solov2
    real_scale = solov2.test_scale
    monkeypatch.setattr(
        solov2, "test_scale",
        lambda h, w, long_edge=160, short_edge=96: real_scale(
            h, w, long_edge, short_edge))
    clip = str(tmp_path / "clip.mp4")
    _make_video(clip, frames=3, w=96, h=64)
    folder = main(["-i", clip, "--random_weights", "--encoder", "vits",
                   "--batch", "2", "--dtype", "float32",
                   "--flow_backwards", "--flow_mask"] + SMALL)

    files = sorted(os.listdir(folder))
    for expected in ["rgba.mp4", "images",
                     "mask.mp4", "mask",
                     "depth_anything.mp4", "depth_anything_min.csv",
                     "depth_anything_max.csv",
                     "flow_gmflow.mp4", "flow_gmflow.csv",
                     "flow_gmflow_bwd.mp4", "flow_gmflow_mask.mp4",
                     "flow_gmflow_mask_bwd.mp4",
                     "metadata.json"]:
        assert expected in files, f"{expected} missing from {files}"

    # per-frame inverted pngs for rgba and mask subfolders
    assert sorted(os.listdir(os.path.join(folder, "images"))) == [
        f"{i:06d}.png" for i in range(3)]
    assert sorted(os.listdir(os.path.join(folder, "mask"))) == [
        f"{i:05d}.png" for i in range(3)]

    meta = json.load(open(os.path.join(folder, "metadata.json")))
    # default-band aliasing (reference process.py:242-287)
    assert meta["bands"]["depth"] == meta["bands"]["depth_anything"]
    assert meta["bands"]["flow"] == meta["bands"]["flow_gmflow"]
    assert meta["bands"]["flow_bwd"] == meta["bands"]["flow_gmflow_bwd"]
    assert meta["bands"]["mask"]["ids"][0] == "person"

    # videos decode with the right geometry and frame counts
    from prisma_tpu.io.video import get_video_data
    for name, nframes in [("rgba.mp4", 3), ("depth_anything.mp4", 3),
                          ("mask.mp4", 3), ("flow_gmflow.mp4", 3),
                          ("flow_gmflow_bwd.mp4", 3)]:
        w, h, _fps, n = get_video_data(os.path.join(folder, name))
        assert (w, h) == (96, 64), name
        assert n == nframes, name

    csv_rows = open(os.path.join(folder, "flow_gmflow.csv")).read().splitlines()
    assert len(csv_rows) == 3  # 2 pairs + zero-flow last frame
