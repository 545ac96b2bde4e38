"""mask band driver e2e on a tiny image + video (random weights, small cfg)."""

import json
import os

import numpy as np
import pytest

from prisma_tpu.bands import mask_band
from prisma_tpu.models import solov2
from prisma_tpu.ops.sdf import mask_sdf_channel
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.utils import meta
from tests.test_flow_raft_band import _make_folder

SMALL_CFG = solov2.SOLOv2Config(nms_pre=32, max_per_img=8)


def test_sdf_channel():
    mask = np.zeros((160, 160, 3))
    mask[20:40, 20:40] = 255.0
    sdf = mask_sdf_channel(mask)
    assert sdf.shape == (160, 160)
    # the (sdf+127)/255 window saturates at +-64px; inside > boundary > outside
    boundary = 1.0 - ((0 + 127.0) / 255.0 - 0.25) * 2.0  # ~0.504
    assert sdf[30, 30] > boundary                  # inside
    assert boundary > sdf[30, 45] > 0.0            # a few px outside, decaying
    assert sdf[159, 159] == 0.0                    # far outside (>64px)
    # empty mask -> all zero
    assert (mask_sdf_channel(np.zeros((16, 16, 3))) == 0).all()


def test_mask_band_image(tmp_path):
    import cv2
    img_path = str(tmp_path / "photo.png")
    rng = np.random.default_rng(0)
    cv2.imwrite(img_path, rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8))
    runtime = RuntimeConfig(random_weights=True, compute_dtype="float32")
    io = mask_band.run(img_path, sdf=True, runtime=runtime, cfg=SMALL_CFG)
    out = cv2.imread(io.output)
    assert out.shape == (96, 128, 3)


def test_mask_band_video(tmp_path):
    folder = _make_folder(tmp_path, frames=2, w=128, h=96)
    runtime = RuntimeConfig(random_weights=True, compute_dtype="float32")
    mask_band.run(folder, subpath="mask", sdf=True, runtime=runtime,
                  cfg=SMALL_CFG)
    files = sorted(os.listdir(folder))
    assert "mask.mp4" in files
    assert sorted(os.listdir(os.path.join(folder, "mask"))) == \
        ["00000.png", "00001.png"]
    m = json.load(open(os.path.join(folder, "metadata.json")))
    assert m["bands"]["mask"]["url"] == "mask.mp4"
    assert m["bands"]["mask"]["ids"] == mask_band.CLASSES
    assert m["bands"]["mask"]["folder"] == "mask"
