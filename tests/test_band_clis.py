"""Standalone band CLIs (VERDICT r3 item 2): every band is runnable via
`python -m prisma_tpu.bands.<band>` with the reference's flag surface.

Coverage strategy: flag->run() plumbing is asserted for all bands with a
recorded `run` (no device work, so every flag combination stays cheap), and
representative bands run their REAL main() end to end on tiny synthetic
inputs (rgba, depth_anything image, flow_raft video) including the
skip-if-exists / --force semantics shared by all CLIs.
"""

import json
import os

import numpy as np
import pytest

from prisma_tpu.io.video import VideoWriter
from prisma_tpu.utils import meta


def _make_folder(tmp_path, frames=4, w=112, h=80):
    folder = str(tmp_path / "seq")
    os.makedirs(folder)
    m = meta.create_metadata(folder)
    wr = VideoWriter(w, h, 24.0, filename=os.path.join(folder, "rgba.mp4"))
    for i in range(frames):
        yy, xx = np.mgrid[0:h, 0:w]
        f = np.stack([(xx + i * 3) % 256, (yy * 2) % 256,
                      (xx * 2 + yy) % 256], -1).astype(np.uint8)
        wr.write(f)
    wr.close()
    meta.add_band(m, "rgba", url="rgba.mp4")
    meta.write_metadata(folder, m)
    return folder


# --------------------------------------------------------------------------
# flag -> run() plumbing for every band CLI (run recorded, no device work)
# --------------------------------------------------------------------------

CASES = [
    ("depth_midas_band", ["--model", "midas2-small", "-n"],
     {"model_version": "midas2-small", "npy": True, "ply": False}),
    ("depth_anything_band", ["--encoder", "vits", "--metric", "indoor", "-p"],
     {"encoder": "vits", "metric": "indoor", "ply": True}),
    ("depth_zoedepth_band", ["--npy"], {"npy": True}),
    ("depth_marigold_band",
     ["--denoise_steps", "3", "--ensemble_size", "2", "--processing_res",
      "256"],
     {"denoise_steps": 3, "ensemble_size": 2, "processing_res": 256}),
    ("depth_patchfusion_band", ["--mode", "p49"], {"mode": "p49"}),
    ("mask_band", ["--confidence", "0.25", "--sdf"],
     {"confidence": 0.25, "sdf": True}),
    ("flow_raft_band", ["--backwards", "--mask", "--iterations", "5",
                        "--scale", "0.5"],
     {"backwards": True, "mask": True, "iterations": 5, "scale": 0.5}),
    ("flow_gmflow_band", ["--inference_size", "320", "576"],
     {"inference_size": [320, 576]}),
]


@pytest.mark.parametrize("mod_name,extra,expect",
                         CASES, ids=[c[0] for c in CASES])
def test_cli_flag_plumbing(monkeypatch, mod_name, extra, expect):
    import importlib
    mod = importlib.import_module(f"prisma_tpu.bands.{mod_name}")
    calls = {}

    def fake_run(input_path, **kwargs):
        calls["input"] = input_path
        calls.update(kwargs)

    monkeypatch.setattr(mod, "run", fake_run)
    mod.main(["-i", "in.mp4", "-o", "out.mp4", "--subpath", "frames",
              "--batch", "3", "--dtype", "float32", "--random_weights",
              "--force"] + extra)
    assert calls["input"] == "in.mp4"
    assert calls["output"] == "out.mp4"
    assert calls["subpath"] == "frames"
    rt = calls["runtime"]
    assert rt.batch_size == 3
    assert rt.compute_dtype == "float32"
    assert rt.random_weights is True
    assert rt.overwrite is True  # --force
    for k, v in expect.items():
        assert calls[k] == v, (k, calls.get(k), v)


def test_cli_default_is_skip_not_overwrite(monkeypatch):
    """Without --force the runtime disables overwrite (skip-if-exists)."""
    from prisma_tpu.bands import depth_zoedepth_band as mod
    calls = {}
    monkeypatch.setattr(mod, "run",
                        lambda inp, **kw: calls.update(kw, input=inp))
    mod.main(["-i", "x.png"])
    assert calls["runtime"].overwrite is False


def test_camera_colmap_cli_plumbing(monkeypatch):
    from prisma_tpu.bands import camera_colmap_band as mod
    calls = {}

    def fake_run(input_path, **kwargs):
        calls["input"] = input_path
        calls.update(kwargs)
        return "csv"

    monkeypatch.setattr(mod, "run", fake_run)
    mod.main(["-i", "scene", "-r", "-u", "--subpath", "sparse2", "--force"])
    assert calls == {"input": "scene", "output": "", "subpath": "sparse2",
                     "refine": True, "undistort": True, "force": True}


# --------------------------------------------------------------------------
# real main() e2e on tiny inputs
# --------------------------------------------------------------------------

def test_rgba_cli_e2e(tmp_path):
    from prisma_tpu.bands import rgba as mod
    clip = str(tmp_path / "clip.mp4")
    wr = VideoWriter(64, 48, 24.0, filename=clip)
    for i in range(3):
        wr.write(np.full((48, 64, 3), i * 40, np.uint8))
    wr.close()
    mod.main(["-i", clip, "--subpath", "images"])
    out = str(tmp_path / "rgba.mp4")
    assert os.path.exists(out)
    assert len(os.listdir(str(tmp_path / "images"))) == 3


def test_depth_anything_cli_e2e_and_skip(tmp_path, capsys):
    import cv2
    from prisma_tpu.bands import depth_anything_band as mod
    img_path = str(tmp_path / "photo.png")
    cv2.imwrite(img_path, np.random.default_rng(0).integers(
        0, 255, (48, 64, 3)).astype(np.uint8))
    args = ["-i", img_path, "--encoder", "vits", "--dtype", "float32",
            "--random_weights", "--img_size", "126"]
    mod.main(args)
    out = str(tmp_path / "depth_anything.png")
    assert cv2.imread(out).shape == (48, 64, 3)

    # second run without --force: skipped, file untouched
    mtime = os.path.getmtime(out)
    mod.main(args)
    assert "skipping" in capsys.readouterr().out
    assert os.path.getmtime(out) == mtime

    # --force recomputes (same content, fresh write)
    mod.main(args + ["--force"])
    assert os.path.getmtime(out) >= mtime


@pytest.mark.parametrize("band,env,extra", [
    ("depth_anything_band", {},
     ["--encoder", "vits", "--img_size", "126"]),
    ("depth_patchfusion_band",
     {"PRISMA_PF_SIZE": "64,96", "PRISMA_PF_DEPTH": "4"},
     ["--mode", "p16"]),
    ("depth_marigold_band", {"PRISMA_MARIGOLD_TINY": "1"},
     ["--denoise_steps", "2", "--ensemble_size", "2",
      "--processing_res", "64"]),
])
def test_depth_band_default_bf16_e2e(tmp_path, monkeypatch, band, env,
                                     extra):
    """The DEFAULT dtype (bfloat16) must run end to end: models cast the
    image to compute_dtype and expect params pre-cast, so a band that skips
    cast_params crashes on its first mixed-dtype conv. All CI runs passed
    --dtype float32, which hid exactly this for every depth band."""
    import cv2
    import importlib
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    mod = importlib.import_module(f"prisma_tpu.bands.{band}")
    img_path = str(tmp_path / "photo.png")
    cv2.imwrite(img_path, np.random.default_rng(1).integers(
        0, 255, (48, 64, 3)).astype(np.uint8))
    mod.main(["-i", img_path, "--random_weights"] + extra)  # default dtype
    out = str(tmp_path / (band.replace("_band", "") + ".png"))
    assert cv2.imread(out).shape == (48, 64, 3)


def test_flow_raft_cli_e2e(tmp_path):
    from prisma_tpu.bands import flow_raft_band as mod
    folder = _make_folder(tmp_path, frames=3)
    mod.main(["-i", folder, "--iterations", "2", "--batch", "3",
              "--dtype", "float32", "--random_weights"])
    assert os.path.exists(os.path.join(folder, "flow_raft.mp4"))
    m = json.load(open(os.path.join(folder, "metadata.json")))
    assert m["bands"]["flow_raft"]["url"] == "flow_raft.mp4"
