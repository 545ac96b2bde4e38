"""metadata.json manifest parity vs the reference implementation."""

import json
import os

from prisma_tpu.utils import meta
from tests.ref_loader import ref_meta

rmeta = ref_meta()


def test_create_and_load(tmp_path):
    folder = str(tmp_path / "out")
    m = meta.create_metadata(folder)
    assert m == {"bands": {}}
    raw = open(os.path.join(folder, "metadata.json")).read()
    assert raw == json.dumps({"bands": {}}, indent=4)


def test_get_target_and_url_match_reference(tmp_path):
    folder = str(tmp_path / "seq")
    os.makedirs(folder)
    ours_meta = {"bands": {}}
    theirs_meta = {"bands": {}}
    path = os.path.join(folder, "rgba.mp4")

    ours = meta.get_target(path, ours_meta, band="depth_anything", target=folder)
    theirs = rmeta.get_target(path, theirs_meta, band="depth_anything", target=folder)
    assert ours == theirs
    assert ours_meta == theirs_meta

    # force_extension only applies to non-video inputs (or csv)
    img = os.path.join(folder, "rgba.png")
    assert (meta.get_target(img, None, "depth", force_extension="jpg")
            == rmeta.get_target(img, None, "depth", force_extension="jpg"))
    assert (meta.get_target(path, None, "depth", force_extension="jpg")
            == rmeta.get_target(path, None, "depth", force_extension="jpg"))
    assert (meta.get_target(path, None, "flow", force_extension="csv")
            == rmeta.get_target(path, None, "flow", force_extension="csv"))

    meta.write_metadata(folder, None)  # no-op without file
    m = meta.create_metadata(folder)
    meta.add_band(m, "rgba", url="rgba.mp4", folder="images")
    meta.write_metadata(folder, m)
    assert meta.get_url(folder, m, "rgba") == os.path.join(folder, "rgba.mp4")
    assert rmeta.get_url(folder, m, "rgba") == os.path.join(folder, "rgba.mp4")


def test_set_default_band(tmp_path):
    folder = str(tmp_path / "seq")
    m = meta.create_metadata(folder)
    meta.add_band(m, "depth_anything", url="depth_anything.mp4")
    meta.write_metadata(folder, m)
    meta.set_default_band(folder, "depth", "depth_anything")
    m2 = meta.load_metadata(folder)
    assert m2["bands"]["depth"] == m2["bands"]["depth_anything"]
    # missing default band: silent no-op
    meta.set_default_band(folder, "flow", "flow_raft")
    assert "flow" not in meta.load_metadata(folder)["bands"]


def test_is_video():
    assert meta.is_video("a.mp4") and not meta.is_video("a.png")
