"""flow_gmflow band driver e2e on a tiny synthetic video (random weights)."""

import json
import os

from prisma_tpu.bands import flow_gmflow_band
from prisma_tpu.runtime.config import RuntimeConfig
from tests.test_flow_raft_band import _make_folder


def test_flow_gmflow_band_e2e(tmp_path):
    folder = _make_folder(tmp_path, frames=4, w=96, h=64)
    runtime = RuntimeConfig(batch_size=3, compute_dtype="float32",
                            random_weights=True)
    flow_gmflow_band.run(folder, backwards=False, mask=False, runtime=runtime)

    files = sorted(os.listdir(folder))
    assert "flow_gmflow.mp4" in files
    assert "flow_gmflow.csv" in files
    dists = open(os.path.join(folder, "flow_gmflow.csv")).read().splitlines()
    assert len(dists) == 4 and float(dists[-1]) == 0.0
    m = json.load(open(os.path.join(folder, "metadata.json")))
    assert m["bands"]["flow_gmflow"]["values"]["dist"]["url"] == "flow_gmflow.csv"
