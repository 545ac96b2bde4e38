"""SOLOv2 component parity (matrix NMS vs reference, ResNet vs torchvision)
and static-shape inference behavior."""

import importlib.util
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from prisma_tpu.models import resnet, solov2

torch = pytest.importorskip("torch")


def _load_ref_matrix_nms():
    spec = importlib.util.spec_from_file_location(
        "ref_matrix_nms",
        "/root/reference/bands/mmdet/core/post_processing/matrix_nms.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.mask_matrix_nms


def test_matrix_nms_parity():
    ref_nms = _load_ref_matrix_nms()
    rng = np.random.default_rng(4)
    n, h, w = 24, 32, 40
    masks = (rng.uniform(size=(n, h, w)) > 0.6)
    # make overlapping clusters
    masks[1] = masks[0]
    masks[2, :16] = masks[0, :16]
    labels = rng.integers(0, 3, size=n)
    scores = rng.uniform(0.2, 1.0, size=n).astype(np.float32)

    t_scores, t_labels, _, t_keep = ref_nms(
        torch.from_numpy(masks).float(), torch.from_numpy(labels),
        torch.from_numpy(scores), kernel="gaussian", sigma=2.0)

    # ours operates on a pre-sorted fixed slab
    order = np.argsort(-scores)
    K = n
    ours = solov2.matrix_nms_static(
        masks[order].reshape(K, -1).astype(np.float32),
        jnp.asarray(labels[order]), jnp.asarray(scores[order]),
        jnp.asarray(masks[order].sum((1, 2)).astype(np.float32)),
        jnp.ones(K, bool), sigma=2.0, precision="highest")
    # reference returns decayed scores sorted desc; ours in our sorted order
    np.testing.assert_allclose(np.sort(np.asarray(ours))[::-1],
                               np.sort(t_scores.numpy())[::-1], atol=1e-5)


def test_matrix_nms_filter_and_validity():
    # invalid slots must not decay or be decayed
    K = 8
    base = np.zeros((K, 100), np.float32)
    base[0, :50] = 1
    base[1, :50] = 1  # duplicate of 0, same label -> decayed hard
    base[2, 50:] = 1  # disjoint -> untouched
    labels = jnp.zeros(K, jnp.int32)
    scores = jnp.asarray([0.9, 0.8, 0.7] + [0.0] * 5)
    valid = jnp.asarray([True, True, True] + [False] * 5)
    areas = jnp.asarray(base.sum(1))
    out = np.asarray(solov2.matrix_nms_static(base, labels, scores, areas,
                                              valid, 2.0))
    assert out[0] == pytest.approx(0.9)
    assert out[1] < 0.2  # exp(-2) decay on IoU 1
    assert out[2] == pytest.approx(0.7)


def test_resnet101_matches_torchvision():
    tv = pytest.importorskip("torchvision")
    torch.manual_seed(0)
    model = tv.models.resnet101(weights=None)
    model.eval()
    # nontrivial BN stats
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.2)

    from prisma_tpu.weights.torch_convert import convert_resnet
    params = convert_resnet(model.state_dict(), "", 101)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = model.conv1(t)
        y = model.relu(model.bn1(y))
        y = model.maxpool(y)
        c2 = model.layer1(y)
        c3 = model.layer2(c2)
        c4 = model.layer3(c3)
        c5 = model.layer4(c4)

    ours = resnet.forward(params, x, precision="highest")
    for o, t_ in zip(ours, (c2, c3, c4, c5)):
        np.testing.assert_allclose(np.asarray(o),
                                   t_.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_solov2_full_forward_shapes():
    import jax
    cfg = solov2.SOLOv2Config(nms_pre=32, max_per_img=8)
    params = solov2.init_params(jax.random.key(0), cfg)
    frame = np.random.default_rng(0).integers(0, 255, (1, 96, 128, 3)).astype(np.uint8)
    img, (h, w) = solov2.preprocess(frame)
    out = solov2.forward(params, img, (h, w), (96, 128), cfg)
    assert out["masks"].shape == (8, 96, 128)
    assert out["labels"].shape == (8,)
    assert out["scores"].shape == (8,)
    assert out["valid"].shape == (8,)


def test_preprocess_scale():
    # 1080p -> keep-ratio (1333, 800): the long edge binds (1333/1920)
    h, w = solov2.test_scale(1080, 1920)
    assert (h, w) == (750, 1333)
    assert solov2.test_scale(800, 1333) == (800, 1333)
