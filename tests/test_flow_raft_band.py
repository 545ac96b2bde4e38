"""flow_raft band driver e2e on a tiny synthetic video (random weights)."""

import json
import os

import numpy as np

from prisma_tpu.bands import flow_raft_band
from prisma_tpu.io.video import VideoWriter, get_video_data
from prisma_tpu.io.writers import read_flo
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.utils import meta


def _make_folder(tmp_path, frames=5, w=112, h=80):
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


def test_flow_raft_band_e2e(tmp_path):
    folder = _make_folder(tmp_path)
    runtime = RuntimeConfig(batch_size=3, compute_dtype="float32",
                            random_weights=True)
    flow_raft_band.run(folder, subpath="flow_raft", backwards=True, mask=True,
                       iterations=2, runtime=runtime)

    files = sorted(os.listdir(folder))
    for expect in ("flow_raft.mp4", "flow_raft.csv", "flow_raft_bwd.mp4",
                   "flow_raft_mask.mp4", "flow_raft_mask_bwd.mp4"):
        assert expect in files, files

    # per-frame CSV: one max-disp per frame (incl. zero last frame)
    dists = open(os.path.join(folder, "flow_raft.csv")).read().splitlines()
    assert len(dists) == 5
    assert float(dists[-1]) == 0.0

    # flo files at the 0.75-scaled resolution
    flo = read_flo(os.path.join(folder, "flow_raft_fwd", "0000.flo"))
    assert flo.shape == (60, 84, 2)
    assert len(os.listdir(os.path.join(folder, "flow_raft_fwd"))) == 5
    assert len(os.listdir(os.path.join(folder, "flow_raft_bwd"))) == 5

    # videos upscale back to the frame size, one frame per input frame
    assert get_video_data(os.path.join(folder, "flow_raft.mp4")) [:2] == (112, 80)
    assert get_video_data(os.path.join(folder, "flow_raft.mp4"))[3] == 5

    m = json.load(open(os.path.join(folder, "metadata.json")))
    assert m["bands"]["flow_raft"]["values"]["dist"]["url"] == "flow_raft.csv"
    assert m["bands"]["flow_raft_bwd"]["url"] == "flow_raft_bwd.mp4"
    assert m["bands"]["flow_raft_mask"]["url"] == "flow_raft_mask.mp4"
