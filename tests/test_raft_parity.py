"""RAFT numeric parity vs the reference torch implementation (random weights)."""

import argparse
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from prisma_tpu.models import raft as jraft
from prisma_tpu.weights.torch_convert import convert_checked, convert_raft

REF_BANDS = "/root/reference/bands"


@pytest.fixture(scope="module")
def ref_raft():
    if REF_BANDS not in sys.path:
        sys.path.insert(0, REF_BANDS)
    torch.manual_seed(0)
    from raft.raft import RAFT
    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False, dropout=0)
    model = RAFT(args)
    # default kaiming init explodes to NaN over the recurrent refinement with
    # random weights; re-init small for a numerically tame parity oracle
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.05)
    # give batch norms non-trivial running stats so folding is exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.3)
    model.eval()
    return model


def test_raft_forward_parity(ref_raft):
    H, W = 128, 160  # multiples of 8; level-3 corr stays >=2px (ref divides by W-1)
    rng = np.random.default_rng(11)
    img1 = rng.uniform(0, 255, size=(1, H, W, 3)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 8, size=img1.shape), 0, 255).astype(np.float32)

    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
    with torch.no_grad():
        flow_low_t, flow_up_t = ref_raft(t1, t2, iters=6, test_mode=True)

    params = convert_checked(convert_raft, ref_raft.state_dict())
    flow_low, flow_up = jraft.forward(params, img1, img2, iters=6,
                                      precision="highest")

    np.testing.assert_allclose(
        np.asarray(flow_low), flow_low_t.permute(0, 2, 3, 1).numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(flow_up), flow_up_t.permute(0, 2, 3, 1).numpy(), atol=2e-2)


def test_raft_pad_unpad_matches_inputpadder():
    from tests.ref_loader import load_ref_module
    # common.flow imports torch+cv2 fine
    sys.path.insert(0, REF_BANDS)
    import importlib
    spec = importlib.util.spec_from_file_location(
        "refcommon2", os.path.join(REF_BANDS, "common/__init__.py"),
        submodule_search_locations=[os.path.join(REF_BANDS, "common")])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["common"] = mod
    spec.loader.exec_module(mod)
    from common.flow import InputPadder

    x = np.random.default_rng(0).normal(size=(1, 3, 53, 70)).astype(np.float32)
    padder = InputPadder(x.shape)
    theirs = padder.pad(torch.from_numpy(x))[0].numpy()
    ours, pads = jraft.pad_to_multiple(
        np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs)
    back = jraft.unpad(ours, pads)
    np.testing.assert_allclose(np.asarray(back), np.transpose(x, (0, 2, 3, 1)))


def test_fwdbwd_mask_parity():
    """On-device consistency mask vs the reference numpy/cv2 implementation."""
    cv2 = pytest.importorskip("cv2")
    from prisma_tpu.ops.flow import compute_fwdbwd_mask

    rng = np.random.default_rng(3)
    fwd = rng.normal(0, 3, size=(40, 60, 2)).astype(np.float32)
    bwd = -fwd + rng.normal(0, 0.2, size=fwd.shape).astype(np.float32)

    def ref_warp(img, flow):
        h, w = flow.shape[:2]
        fn = flow.copy()
        fn[:, :, 0] += np.arange(w)
        fn[:, :, 1] += np.arange(h)[:, None]
        return cv2.remap(img, fn, None, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT)

    def ref_mask(fwd_flow, bwd_flow, a1=0.05, a2=0.5):
        bwd2fwd = ref_warp(bwd_flow, fwd_flow)
        err = np.linalg.norm(fwd_flow + bwd2fwd, axis=-1)
        m1 = err < a1 * (np.linalg.norm(fwd_flow, axis=-1)
                         + np.linalg.norm(bwd2fwd, axis=-1)) + a2
        fwd2bwd = ref_warp(fwd_flow, bwd_flow)
        err2 = np.linalg.norm(bwd_flow + fwd2bwd, axis=-1)
        m2 = err2 < a1 * (np.linalg.norm(bwd_flow, axis=-1)
                          + np.linalg.norm(fwd2bwd, axis=-1)) + a2
        return m1, m2

    ours_f, ours_b = compute_fwdbwd_mask(fwd, bwd)
    ref_f, ref_b = ref_mask(fwd, bwd)
    # cv2.remap uses fixed-point (5-bit) interpolation weights; allow rare
    # borderline disagreements
    assert (np.asarray(ours_f) != ref_f).mean() < 0.01
    assert (np.asarray(ours_b) != ref_b).mean() < 0.01


def test_fused_corr_matches_volume():
    """The alt_cuda_corr-equivalent fused lookup is numerically exact vs the
    materialized corr-volume pyramid."""
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    B, H, W, C = 2, 16, 24, 32
    f1 = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-2, 20, size=(B, H, W, 2)).astype(np.float32))
    pyr = jraft.build_corr_pyramid(f1, f2, 4, precision="highest")
    vol = np.asarray(jraft.corr_lookup(pyr, coords, 4))
    f2p = jraft.build_fmap_pyramid(f2, 4)
    fused = np.asarray(jraft.corr_lookup_fused(f1, f2p, coords, 4,
                                               precision="highest"))
    np.testing.assert_allclose(fused, vol, atol=2e-4)


def test_onehot_lookup_matches_gather_lookup():
    """volume_onehot (one-hot MXU matmul) == volume (take_along_axis),
    including out-of-bounds zero padding and the bilinear blend."""
    import jax.numpy as jnp
    from prisma_tpu.models.raft import (_window_onehot_lookup,
                                        _window_patch_lookup)
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.normal(size=(64, 17, 23)).astype(np.float32))
    cx = jnp.asarray(rng.uniform(-4, 27, 64).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-4, 21, 64).astype(np.float32))
    a = _window_patch_lookup(vol, cx, cy, 4)
    b = _window_onehot_lookup(vol, cx, cy, 4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_onehot_xfirst_matches():
    """The x-first one-hot window lookup is exactly the row-first one."""
    import jax
    import jax.numpy as jnp
    from prisma_tpu.models import raft as jraft

    rng = np.random.default_rng(11)
    N, H, W = 64, 14, 19
    vol = jnp.asarray(rng.normal(size=(N, H, W)).astype(np.float32))
    # centers incl. far out-of-bounds (zero-padding semantics)
    cx = jnp.asarray(rng.uniform(-8, W + 8, size=(N,)).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-8, H + 8, size=(N,)).astype(np.float32))
    a = jraft._window_onehot_lookup(vol, cx, cy, r=4, precision="highest")
    b = jraft._window_onehot_lookup_xf(vol, cx, cy, r=4, precision="highest")
    c = jraft._window_patch_lookup(vol, cx, cy, r=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

def test_onehot_packed_bit_identical():
    """The packed tail-level lookup is BIT-identical to per-level onehot:
    every one-hot row has exactly one nonzero, level-band spill rows are
    masked to no-match, and W-padding columns are exact zeros."""
    import jax.numpy as jnp
    from prisma_tpu.models import raft as jraft

    rng = np.random.default_rng(13)
    B, H, W = 2, 41, 57  # odd sizes so pooled levels are ragged
    f1 = jnp.asarray(rng.normal(size=(B, H, W, 32)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, H, W, 32)).astype(np.float32))
    pyr = jraft.build_corr_pyramid(f1, f2, 4, precision="highest")
    N = B * H * W
    cx = jnp.asarray(rng.uniform(-8, W + 8, size=(N,)).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-8, H + 8, size=(N,)).astype(np.float32))
    per_level = [jraft._window_onehot_lookup(vol, cx / (2 ** i),
                                             cy / (2 ** i), 4,
                                             precision="highest")
                 for i, vol in enumerate(pyr)]
    _, packed, dims = jraft.pack_pyramid_tail(pyr)
    tail = jraft._window_onehot_lookup_packed(packed, dims, cx, cy, 4,
                                              precision="highest")
    ref = np.asarray(jnp.concatenate(per_level[1:], axis=-1))
    np.testing.assert_array_equal(np.asarray(tail), ref)

    # full corr_lookup drop-in: packed == onehot over the whole pyramid
    coords = jnp.stack([cx, cy], -1).reshape(B, H, W, 2)
    a = jraft.corr_lookup(pyr, coords, 4, onehot=True)
    b = jraft.corr_lookup(pyr, coords, 4, onehot="packed")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gru_impl_variants_agree():
    """forward() with gru_impl reference / fused / fused_me3 agrees on f32:
    the fused forms only re-associate accumulations (split context/motion
    contractions; block-diagonal motion-encoder matmuls with exact-zero
    off-blocks)."""
    import jax
    import jax.numpy as jnp
    cfg = jraft.RAFTConfig()
    params = jraft.init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    outs = {}
    for impl in ("reference", "fused", "fused_me3"):
        _low, up = jraft.forward(params, i1, i2, cfg, iters=4,
                                 corr_impl="volume", gru_impl=impl)
        outs[impl] = np.asarray(up, np.float32)
    np.testing.assert_allclose(outs["fused"], outs["reference"], atol=1e-3)
    np.testing.assert_allclose(outs["fused_me3"], outs["reference"],
                               atol=1e-3)
