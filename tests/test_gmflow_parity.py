"""GMFlow numeric parity vs the reference torch implementation (random weights)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from prisma_tpu.models import gmflow as jgm
from prisma_tpu.weights.torch_convert import convert_checked, convert_gmflow

REF_BANDS = "/root/reference/bands"


@pytest.fixture(scope="module")
def ref_gmflow():
    if REF_BANDS not in sys.path:
        sys.path.insert(0, REF_BANDS)
    torch.manual_seed(0)
    from gmflow.gmflow import GMFlow
    model = GMFlow(num_scales=1, upsample_factor=8, feature_channels=128,
                   attention_type="swin", num_transformer_layers=6,
                   ffn_dim_expansion=4, num_head=1)
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(0.5)  # tame the default init for a stable oracle
    model.eval()
    return model


def _ref_forward(model, img0, img1, bidir):
    t0 = torch.from_numpy(img0.transpose(0, 3, 1, 2))
    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out = model(t0, t1, attn_splits_list=[2], corr_radius_list=[-1],
                    prop_radius_list=[-1], pred_bidir_flow=bidir)
    return out["flow_preds"][-1].permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("bidir", [False, True])
def test_gmflow_forward_parity(ref_gmflow, bidir):
    H, W = 64, 96
    rng = np.random.default_rng(2)
    img0 = rng.uniform(0, 255, size=(1, H, W, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 10, size=img0.shape), 0, 255).astype(np.float32)

    theirs = _ref_forward(ref_gmflow, img0, img1, bidir)
    params = convert_checked(convert_gmflow, ref_gmflow.state_dict())
    ours = np.asarray(jgm.forward(params, img0, img1, pred_bidir=bidir,
                                  precision="highest"))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-3)


def test_sine_pos_embed_matches_reference():
    if REF_BANDS not in sys.path:
        sys.path.insert(0, REF_BANDS)
    from gmflow.position import PositionEmbeddingSine
    pe = PositionEmbeddingSine(num_pos_feats=64)
    with torch.no_grad():
        theirs = pe(torch.zeros(1, 128, 10, 14)).permute(0, 2, 3, 1).numpy()[0]
    ours = jgm.sine_pos_embed(10, 14, 64)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_shift_window_mask_matches_reference():
    if REF_BANDS not in sys.path:
        sys.path.insert(0, REF_BANDS)
    from gmflow.transformer import generate_shift_window_attn_mask
    h, w, ns = 16, 24, 2
    theirs = generate_shift_window_attn_mask(
        (h, w), h // ns, w // ns, h // ns // 2, w // ns // 2,
        device=torch.device("cpu")).numpy()
    ours = jgm.shift_window_attn_mask(h, w, ns)
    np.testing.assert_array_equal(ours, theirs)


def test_blockwise_attn_matches_dense():
    """Streaming-softmax helper == materialized softmax, incl. ragged padding."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    B, N, M, C, Dv = 2, 50, 96, 16, 2
    q = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, M, C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, M, Dv)), jnp.float32)
    scale = 1.0 / (C ** 0.5)
    dense = np.asarray(
        jnp.einsum("bnm,bmd->bnd",
                   np.asarray(jnp.exp(q @ k.transpose(0, 2, 1) * scale)
                              / jnp.sum(jnp.exp(q @ k.transpose(0, 2, 1) * scale),
                                        -1, keepdims=True)), v))
    for chunk in (96, 40, 7, 2048):
        ours = np.asarray(jgm._attn_blockwise(q, k, v, scale, key_chunk=chunk))
        np.testing.assert_allclose(ours, dense, atol=1e-5)


@pytest.mark.parametrize("bidir", [False, True])
def test_blockwise_matching_matches_dense(bidir):
    """forward(matching=blockwise) == forward(matching=dense) to <=1e-3."""
    import jax
    H, W = 64, 96
    rng = np.random.default_rng(5)
    params = jgm.init_params(jax.random.key(0))
    img0 = rng.uniform(0, 255, size=(1, H, W, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 10, size=img0.shape), 0, 255).astype(np.float32)
    dense = np.asarray(jgm.forward(
        params, img0, img1, jgm.GMFlowConfig(matching="dense"),
        pred_bidir=bidir, precision="highest"))
    block = np.asarray(jgm.forward(
        params, img0, img1, jgm.GMFlowConfig(matching="blockwise", key_chunk=33),
        pred_bidir=bidir, precision="highest"))
    np.testing.assert_allclose(block, dense, atol=1e-3)


def test_backbone_s2d_matches_plain():
    """The space-to-depth stage-1 backbone is an exact kernel relayout."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from prisma_tpu.models import gmflow as jgm

    params = jgm.init_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 96, 3)),
                    jnp.float32)
    a = jgm.backbone_forward(params["backbone"], x, precision="highest",
                             impl="plain")
    b = jgm.backbone_forward(params["backbone"], x, precision="highest",
                             impl="s2d")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.fixture(scope="module")
def ref_gmflow_refine():
    """2-scale gmflow_with_refine architecture (reference flow_gmflow.py
    --num_scales 2 --upsample_factor 4 ... CLI surface)."""
    if REF_BANDS not in sys.path:
        sys.path.insert(0, REF_BANDS)
    torch.manual_seed(1)
    from gmflow.gmflow import GMFlow
    model = GMFlow(num_scales=2, upsample_factor=4, feature_channels=128,
                   attention_type="swin", num_transformer_layers=6,
                   ffn_dim_expansion=4, num_head=1)
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(0.5)
    model.eval()
    return model


@pytest.mark.parametrize("bidir", [False, True])
def test_gmflow_refine_forward_parity(ref_gmflow_refine, bidir):
    """2-scale refinement (local corr matching + local-window propagation +
    trident backbone + x4 convex upsample) vs the reference torch model."""
    H, W = 64, 96
    rng = np.random.default_rng(7)
    img0 = rng.uniform(0, 255, size=(1, H, W, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 10, size=img0.shape), 0, 255).astype(np.float32)

    t0 = torch.from_numpy(img0.transpose(0, 3, 1, 2))
    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out = ref_gmflow_refine(t0, t1, attn_splits_list=[2, 8],
                                corr_radius_list=[-1, 4],
                                prop_radius_list=[-1, 1],
                                pred_bidir_flow=bidir)
    theirs = out["flow_preds"][-1].permute(0, 2, 3, 1).numpy()

    params = convert_checked(convert_gmflow, ref_gmflow_refine.state_dict())
    cfg = jgm.refine_config(matching="dense")
    ours = np.asarray(jgm.forward(params, img0, img1, cfg, pred_bidir=bidir,
                                  precision="highest"))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-3)


@pytest.mark.parametrize("bidir", [False, True])
def test_gmflow_refine_blockwise_matches_dense(bidir):
    import jax
    H, W = 64, 96
    rng = np.random.default_rng(9)
    params = jgm.init_params(jax.random.key(3), jgm.refine_config())
    img0 = rng.uniform(0, 255, size=(1, H, W, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 10, size=img0.shape), 0, 255).astype(np.float32)
    dense = np.asarray(jgm.forward(
        params, img0, img1, jgm.refine_config(matching="dense"),
        pred_bidir=bidir, precision="highest"))
    block = np.asarray(jgm.forward(
        params, img0, img1, jgm.refine_config(matching="blockwise", key_chunk=41),
        pred_bidir=bidir, precision="highest"))
    np.testing.assert_allclose(block, dense, atol=1e-3)


def test_local_correlation_mm_matches_taps():
    """The banded-MXU local correlation (production path at precision=None)
    agrees with the taps form — same math, different accumulation order."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.normal(size=(2, 24, 36, 32)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(2, 24, 36, 32)).astype(np.float32))
    taps = np.asarray(jgm.local_correlation_softmax(f0, f1, 4))
    mm = np.asarray(jgm.local_correlation_softmax_mm(f0, f1, 4))
    np.testing.assert_allclose(mm, taps, atol=2e-5)
