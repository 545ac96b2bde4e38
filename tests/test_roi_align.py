"""ROI Align vs a direct numpy reference implementation (torchvision semantics)."""

import numpy as np

from prisma_tpu.ops.roi_align import roi_align


def ref_roi_align(feat, box, out_hw, scale, sr, aligned=True):
    """Slow scalar reference: feat [H, W, C], box (x1,y1,x2,y2)."""
    H, W, C = feat.shape
    ph, pw = out_hw
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = [v * scale - off for v in box]
    bin_w = (x2 - x1) / pw
    bin_h = (y2 - y1) / ph
    out = np.zeros((ph, pw, C))

    def bilinear(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        fy, fx = y - y0, x - x0
        acc = np.zeros(C)
        for (yy, wy) in ((y0, 1 - fy), (y0 + 1, fy)):
            for (xx, wx) in ((x0, 1 - fx), (x0 + 1, fx)):
                if 0 <= yy < H and 0 <= xx < W:
                    acc += feat[yy, xx] * wy * wx
        return acc

    for i in range(ph):
        for j in range(pw):
            acc = np.zeros(C)
            for ty in range(sr):
                for tx in range(sr):
                    y = y1 + (i + (ty + 0.5) / sr) * bin_h
                    x = x1 + (j + (tx + 0.5) / sr) * bin_w
                    acc += bilinear(y, x)
            out[i, j] = acc / (sr * sr)
    return out


def test_identity_full_roi():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(1, 6, 8, 3)).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 8.0, 6.0]], np.float32)
    out = roi_align(feat, boxes, np.array([0]), (6, 8), 1.0, sampling_ratio=1)
    np.testing.assert_allclose(np.asarray(out)[0], feat[0], atol=1e-5)


def test_matches_reference_random_rois():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(2, 12, 16, 4)).astype(np.float32)
    boxes = np.array([[2.0, 1.0, 14.0, 9.0],
                      [0.5, 0.5, 8.0, 11.5],
                      [4.0, 3.0, 12.0, 7.0]], np.float32)
    idx = np.array([0, 1, 0])
    out = np.asarray(roi_align(feat, boxes, idx, (4, 6), 0.5, sampling_ratio=2))
    for n in range(3):
        expected = ref_roi_align(feat[idx[n]], boxes[n], (4, 6), 0.5, 2)
        np.testing.assert_allclose(out[n], expected, atol=1e-5)


def test_roi_chunked_matches_unchunked():
    import numpy as np
    import jax.numpy as jnp
    from prisma_tpu.ops.roi_align import roi_align
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(2, 40, 56, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(2, 30, size=(7, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 10)
    idx = jnp.asarray(rng.integers(0, 2, size=(7,)).astype(np.int32))
    a = roi_align(feats, boxes, idx, (8, 8), sampling_ratio=2)
    b = roi_align(feats, boxes, idx, (8, 8), sampling_ratio=2, roi_chunk=3)
    # lax.map recompiles the body: XLA reassociation gives ~4e-6 drift
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
