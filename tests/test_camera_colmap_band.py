"""camera_colmap band: pin the subprocess chain with a fake `colmap` binary.

The image has no real COLMAP binary, so the feature_extractor -> matcher ->
mapper chain had never executed in CI. A PATH shim records every argv and the
fake mapper drops a pre-staged binary sparse model (written with the
reference's own model writer) into --output_path, letting the full
reconstruct -> csv-conversion path run end to end.
"""

import os
import stat
import sys

import numpy as np

from prisma_tpu.bands import camera_colmap_band
from tests.ref_loader import ref_colmap

FAKE_COLMAP = """#!{python}
import os, shutil, sys

with open(os.environ["COLMAP_ARGLOG"], "a") as f:
    f.write(" ".join(sys.argv[1:]) + chr(10))

if len(sys.argv) > 1 and sys.argv[1] == "mapper":
    out = sys.argv[sys.argv.index("--output_path") + 1]
    dst = os.path.join(out, "0")
    if not os.path.isdir(dst):
        shutil.copytree(os.environ["COLMAP_FAKE_MODEL"], dst)
"""


def _stage_model(path):
    """Binary sparse model via the reference writer: 2 registered images."""
    ref = ref_colmap()
    os.makedirs(path, exist_ok=True)
    cams = {1: ref.Camera(id=1, model="SIMPLE_PINHOLE", width=640, height=480,
                          params=np.array([600.0, 320.0, 240.0]))}
    q = np.array([1.0, 0.0, 0.0, 0.0])
    imgs = {}
    for i, name in enumerate(["00000.png", "00001.png"], start=1):
        imgs[i] = ref.BaseImage(
            id=i, qvec=q, tvec=np.array([0.1 * i, 0.0, 1.0]), camera_id=1,
            name=name, xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, int))
    pts = {1: ref.Point3D(id=1, xyz=np.array([0.0, 0.0, 2.0]),
                          rgb=np.array([9, 9, 9]), error=0.1,
                          image_ids=np.array([1]), point2D_idxs=np.array([0]))}
    ref.write_model(cams, imgs, pts, path=path, ext=".bin")


def test_colmap_subprocess_chain(tmp_path, monkeypatch):
    # fake binary on PATH
    bindir = tmp_path / "bin"
    bindir.mkdir()
    shim = bindir / "colmap"
    shim.write_text(FAKE_COLMAP.format(python=sys.executable))
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    arglog = tmp_path / "args.log"
    staged = tmp_path / "staged_model"
    _stage_model(str(staged))
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("COLMAP_ARGLOG", str(arglog))
    monkeypatch.setenv("COLMAP_FAKE_MODEL", str(staged))

    # PRISMA-shaped folder: images/ with the frame files + a mask/ folder
    folder = tmp_path / "scene"
    (folder / "images").mkdir(parents=True)
    (folder / "mask").mkdir()
    for name in ["00000.png", "00001.png"]:
        (folder / "images" / name).write_bytes(b"")

    csv_out = camera_colmap_band.run(str(folder))

    calls = arglog.read_text().splitlines()
    assert len(calls) == 3, calls
    extractor, matcher, mapper = calls
    assert extractor.startswith("feature_extractor")
    assert "--ImageReader.camera_model SIMPLE_PINHOLE" in extractor
    assert "--ImageReader.single_camera 1" in extractor
    assert f"--image_path {folder / 'images'}" in extractor
    assert f"--ImageReader.mask_path {folder / 'mask'}" in extractor
    assert f"--database_path {folder / 'colmap.db'}" in extractor
    assert matcher.startswith("sequential_matcher")
    assert "--SiftMatching.guided_matching=true" in matcher
    assert mapper.startswith("mapper")
    assert "--Mapper.multiple_models 0" in mapper
    assert "--Mapper.ba_global_function_tolerance=0.000001" in mapper
    assert f"--output_path {folder / 'sparse'}" in mapper

    # the fake mapper's model was converted to camera_pose.csv
    assert os.path.exists(csv_out)
    rows = np.loadtxt(csv_out, delimiter=",")
    assert rows.shape == (2, 15)
    np.testing.assert_allclose(rows[:, 0], 600.0)       # f
    np.testing.assert_allclose(rows[:, 1:3], [[320.0, 240.0]] * 2)  # ox, oy
    np.testing.assert_allclose(rows[0, 3:12], np.eye(3).reshape(-1))  # R
    np.testing.assert_allclose(rows[:, 12], [0.1, 0.2])  # t[0]


def test_colmap_skips_existing_sparse(tmp_path, monkeypatch):
    """Reference behavior: an existing sparse/ folder skips recomputation."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    shim = bindir / "colmap"
    shim.write_text(FAKE_COLMAP.format(python=sys.executable))
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    arglog = tmp_path / "args.log"
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("COLMAP_ARGLOG", str(arglog))

    folder = tmp_path / "scene"
    (folder / "images").mkdir(parents=True)
    for name in ["00000.png", "00001.png"]:
        (folder / "images" / name).write_bytes(b"")
    _stage_model(str(folder / "sparse" / "0"))

    csv_out = camera_colmap_band.run(str(folder))
    assert not arglog.exists(), "colmap must not run when sparse/ exists"
    assert os.path.exists(csv_out)


FAKE_COLMAP_FULL = FAKE_COLMAP + """
if len(sys.argv) > 1 and sys.argv[1] == "image_undistorter":
    out = sys.argv[sys.argv.index("--output_path") + 1]
    os.makedirs(os.path.join(out, "0"), exist_ok=True)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
"""


def test_colmap_argv_golden(tmp_path, monkeypatch):
    """Pin the EXACT subprocess command lists, refine+undistort included
    (VERDICT r3 item 9): the argvs encode tuned BA tolerances and flags a
    refactor must not silently drift before a real binary ever runs them."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    shim = bindir / "colmap"
    shim.write_text(FAKE_COLMAP_FULL.format(python=sys.executable))
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    arglog = tmp_path / "args.log"
    staged = tmp_path / "staged_model"
    _stage_model(str(staged))
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("COLMAP_ARGLOG", str(arglog))
    monkeypatch.setenv("COLMAP_FAKE_MODEL", str(staged))

    folder = tmp_path / "scene"
    (folder / "images").mkdir(parents=True)
    for name in ["00000.png", "00001.png"]:
        (folder / "images" / name).write_bytes(b"")

    camera_colmap_band.run_reconstruction(str(folder), refine=True,
                                          undistort=True)

    f = str(folder)
    golden = [
        f"feature_extractor --database_path {f}/colmap.db "
        f"--image_path {f}/images --ImageReader.camera_model SIMPLE_PINHOLE "
        f"--ImageReader.single_camera 1 --SiftExtraction.use_gpu 1 "
        f"--SiftExtraction.first_octave 0",
        f"sequential_matcher --database_path {f}/colmap.db "
        f"--SiftMatching.use_gpu 1 --SiftMatching.guided_matching=true",
        f"mapper --database_path {f}/colmap.db --image_path {f}/images "
        f"--output_path {f}/sparse --Mapper.multiple_models 0 "
        f"--Mapper.num_threads 16 --Mapper.init_min_tri_angle 4 "
        f"--Mapper.extract_colors 1 --Mapper.ba_local_max_refinements 1 "
        f"--Mapper.ba_global_max_refinements 1 "
        f"--Mapper.ba_global_function_tolerance=0.000001",
        f"bundle_adjuster --input_path {f}/sparse/0 "
        f"--output_path {f}/sparse/0 "
        f"--BundleAdjustment.refine_principal_point 1",
        f"image_undistorter --image_path {f}/images "
        f"--input_path {f}/sparse/0 --output_path {f}/undistorted "
        f"--output_type COLMAP",
        f"model_converter --input_path {f}/sparse/0 "
        f"--output_path {f}/sparse/0 --output_type TXT",
    ]
    assert arglog.read_text().splitlines() == golden
