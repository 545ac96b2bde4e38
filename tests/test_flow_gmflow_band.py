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


def test_flow_gmflow_subpath_mask_and_inference_size(tmp_path):
    """--subpath_mask 16-bit PNGs + --inference_size resize path, e2e."""
    import cv2
    import numpy as np

    folder = _make_folder(tmp_path, frames=3, w=96, h=64)
    runtime = RuntimeConfig(batch_size=3, compute_dtype="float32",
                            random_weights=True)
    flow_gmflow_band.run(folder, backwards=True, subpath_mask="flow_enc",
                         inference_size=(48, 80), runtime=runtime)

    fwd_dir = os.path.join(folder, "flow_enc_fwd")
    files = sorted(os.listdir(fwd_dir))
    assert files == ["0000.png", "0001.png", "0002.png"]
    img = cv2.imread(os.path.join(fwd_dir, files[0]), cv2.IMREAD_UNCHANGED)
    assert img.dtype == np.uint16 and img.shape == (48, 72, 3)  # 0.75 scale
    # final zero-flow PNG is FULL-size u=v=2^15, valid=0 (reference quirk:
    # flow_raft.py:117-126 builds the last frame's zeros at original size);
    # imwrite+imread both assume BGR, so the reversals cancel and the array
    # comes back in the original (u, v, valid) order
    last = cv2.imread(os.path.join(fwd_dir, files[-1]), cv2.IMREAD_UNCHANGED)
    assert last.shape == (64, 96, 3)
    assert (last[..., 0] == 2 ** 15).all() and (last[..., 1] == 2 ** 15).all()
    assert (last[..., 2] == 0).all()
    assert sorted(os.listdir(os.path.join(folder, "flow_enc_bwd"))) == files


def test_gmflow_inference_size_identity():
    """inference_size == input size: the align_corners resize is an identity,
    so the resize path must reproduce the padding path exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prisma_tpu.models import gmflow as jgm

    params = jgm.init_params(jax.random.key(0))
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)), jnp.float32)
    f1, b1 = jgm.infer_pairs(params, img1, img2, precision="highest")
    f2, b2 = jgm.infer_pairs(params, img1, img2, precision="highest",
                             inference_size=(32, 48))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)


def test_flow_gmflow_refine_band_e2e(tmp_path):
    """--num_scales 2 (gmflow_with_refine) through the band driver."""
    from prisma_tpu.models import gmflow as jgm

    folder = _make_folder(tmp_path, frames=3, w=96, h=64)
    runtime = RuntimeConfig(batch_size=3, compute_dtype="float32",
                            random_weights=True)
    flow_gmflow_band.run(folder, backwards=False, mask=False,
                         cfg=jgm.refine_config(), runtime=runtime)
    files = sorted(os.listdir(folder))
    assert "flow_gmflow.mp4" in files and "flow_gmflow.csv" in files
    dists = open(os.path.join(folder, "flow_gmflow.csv")).read().splitlines()
    assert len(dists) == 3 and float(dists[-1]) == 0.0


def test_flow_gmflow_refine_with_inference_size_and_mask_png(tmp_path):
    """--num_scales 2 combined with --inference_size and --subpath_mask:
    the refinement path must honor the resize contract (flow rescaled back)
    and the 16-bit flow PNG outputs."""
    import cv2

    folder = _make_folder(tmp_path, frames=3, w=96, h=64)
    runtime = RuntimeConfig(batch_size=3, compute_dtype="float32",
                            random_weights=True)
    flow_gmflow_band.run(folder, backwards=False, subpath_mask="enc",
                         inference_size=(64, 96), cfg=jgm.refine_config(),
                         runtime=runtime)
    files = sorted(os.listdir(os.path.join(folder, "enc_fwd")))
    assert files == ["0000.png", "0001.png", "0002.png"]
    img = cv2.imread(os.path.join(folder, "enc_fwd", files[0]),
                     cv2.IMREAD_UNCHANGED)
    # the driver's default 0.75 input scale (reference flow_gmflow.py) puts
    # outputs at the scaled size
    assert img.dtype.name == "uint16" and img.shape == (48, 72, 3)


from prisma_tpu.models import gmflow as jgm  # noqa: E402  (test helper)
