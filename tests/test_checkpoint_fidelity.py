"""Real-checkpoint fidelity harness (VERDICT r3 item 4), gated on weights.

The image ships no pretrained checkpoints, so this module skips cleanly
today. The day `download_models.sh` has been run (models/ populated), it:

1. loads + converts every present checkpoint through the SAME store loaders
   the bands use, with a TrackedStateDict asserting every state_dict key was
   consumed (the random-weight parity suite proves layouts, but only a real
   file exposes dropped/misspelled keys — see torch_convert.TrackedStateDict);
2. runs a fixed-seed forward per model family and compares against a stored
   activation fingerprint under models/prisma_tpu_golden/ — generated on the
   FIRST run (so the first pass records, later passes regress-test converter
   and model changes against it).

Checkpoint inventory mirrors download_models.sh.
"""

import json
import os

import numpy as np
import pytest

MODELS_DIR = os.environ.get("PRISMA_TPU_MODELS", "models")
GOLDEN_DIR = os.path.join(MODELS_DIR, "prisma_tpu_golden")


def _runtime():
    from prisma_tpu.runtime.config import RuntimeConfig
    return RuntimeConfig(models_dir=MODELS_DIR, compute_dtype="float32",
                         weight_cache=False)


def _ckpt(name: str) -> str:
    return os.path.join(MODELS_DIR, name)


def _need(*names):
    missing = [n for n in names if not os.path.exists(_ckpt(n))]
    if missing:
        pytest.skip(f"checkpoint(s) not present: {missing} "
                    f"(run download_models.sh)")


def _check_consumed(load_fn, convert_module_fns):
    """Patch the named converters to their convert_checked form for one load."""
    import functools

    from prisma_tpu.weights import torch_convert as tc

    originals = {}
    for fn_name in convert_module_fns:
        originals[fn_name] = getattr(tc, fn_name)
        getattr(tc, fn_name)  # attribute must exist

    try:
        for fn_name, orig in originals.items():
            setattr(tc, fn_name,
                    functools.partial(tc.convert_checked, orig))
        return load_fn()
    finally:
        for fn_name, orig in originals.items():
            setattr(tc, fn_name, orig)


def _fingerprint(name: str, arr: np.ndarray, atol: float = 1e-3):
    """Compare (or record, on first run) a small activation fingerprint."""
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, name + ".json")
    arr = np.asarray(arr, np.float64)
    stats = {"mean": float(arr.mean()), "std": float(arr.std()),
             "sample": np.ravel(arr)[:: max(1, arr.size // 16)][:16].tolist()}
    if not os.path.exists(path):
        with open(path, "w") as f:
            json.dump(stats, f, indent=1)
        pytest.skip(f"golden fingerprint recorded: {path}")
    ref = json.load(open(path))
    np.testing.assert_allclose(stats["mean"], ref["mean"], atol=atol)
    np.testing.assert_allclose(stats["std"], ref["std"], atol=atol)
    np.testing.assert_allclose(stats["sample"], ref["sample"], atol=atol)


def _frames(h=70, w=94):
    rng = np.random.default_rng(1234)
    return rng.integers(0, 255, (1, h, w, 3)).astype(np.uint8)


def test_raft_checkpoint():
    _need("raft-sintel.pth")
    from prisma_tpu.models import raft as jraft
    from prisma_tpu.weights.store import load_raft
    params = _check_consumed(lambda: load_raft(_runtime()), ["convert_raft"])
    import jax.numpy as jnp
    f, b = jraft.infer_pairs(params, jnp.asarray(_frames(), jnp.float32),
                             jnp.asarray(_frames()[::-1], jnp.float32),
                             iters=4, precision="highest")
    _fingerprint("raft_sintel", np.asarray(f))


def test_gmflow_checkpoint():
    _need("gmflow_sintel-0c07dcb3.pth")
    from prisma_tpu.models import gmflow as jgm
    from prisma_tpu.weights.store import load_gmflow
    params = _check_consumed(lambda: load_gmflow(_runtime()),
                             ["convert_gmflow"])
    import jax.numpy as jnp
    fwd, _ = jgm.infer_pairs(params, jnp.asarray(_frames(64, 96), jnp.float32),
                             jnp.asarray(_frames(64, 96), jnp.float32))
    _fingerprint("gmflow_sintel", np.asarray(fwd))


def test_depth_anything_checkpoints():
    found = [e for e in ("vits", "vitb", "vitl")
             if os.path.exists(_ckpt(f"depth_anything_{e}14.pt"))]
    if not found:
        pytest.skip("no depth_anything checkpoints present")
    from prisma_tpu.models import depth_anything as da
    from prisma_tpu.weights.store import load_depth_anything
    for enc in found:
        _, params, _ = _check_consumed(
            lambda: load_depth_anything(_runtime(), encoder=enc),
            ["convert_depth_anything"])
        out = da.infer(params, _frames(70, 94), encoder=enc,
                       precision="highest", target=126)
        _fingerprint(f"depth_anything_{enc}", np.asarray(out))


def test_solov2_checkpoint():
    import glob
    if not glob.glob(_ckpt("solov2_r101_fpn_3x_coco*.pth")):
        pytest.skip("no solov2 checkpoint present")
    from prisma_tpu.weights.store import load_solov2
    params = _check_consumed(lambda: load_solov2(_runtime()),
                             ["convert_solov2"])
    leaves = [np.asarray(x).mean() for x in
              __import__("jax").tree_util.tree_leaves(params)]
    _fingerprint("solov2_r101_param_means", np.asarray(leaves))


def test_midas_dpt_checkpoint():
    _need("dpt_large_384.pt")
    from prisma_tpu.models import midas as jmidas
    from prisma_tpu.weights.store import load_midas
    arch, params = _check_consumed(
        lambda: load_midas(_runtime(), "midas3"), ["convert_midas_dpt"])
    out = jmidas.infer(params, _frames(64, 64), precision="highest",
                       target=96)
    _fingerprint("midas3_dpt_large", np.asarray(out))


def test_zoed_checkpoint():
    _need("ZoeD_M12_N.pt")
    from prisma_tpu.models import zoed as jzoed
    from prisma_tpu.weights.store import load_zoed
    params = _check_consumed(lambda: load_zoed(_runtime()), ["convert_zoed"])
    out = jzoed.infer(params, _frames(64, 96), img_size=(64, 96),
                      precision="highest")
    _fingerprint("zoed_m12_n", np.asarray(out))


def test_patchfusion_checkpoint():
    _need("patchfusion_u4k.pt")
    from prisma_tpu.models import patchfusion as pf
    from prisma_tpu.weights.store import load_patchfusion
    params, model_hw = _check_consumed(
        lambda: load_patchfusion(_runtime()), ["convert_patchfusion"])
    img = _frames(128, 160)[0].astype(np.float32) / 255.0
    out = pf.infer(params, img, mode="p16", model_hw=model_hw,
                   precision="highest")
    _fingerprint("patchfusion_u4k", np.asarray(out))


def test_metric_depth_anything_checkpoints():
    found = [m for m in ("indoor", "outdoor")
             if os.path.exists(_ckpt(f"depth_anything_metric_depth_{m}.pt"))]
    if not found:
        pytest.skip("no metric depth_anything checkpoints present")
    from prisma_tpu.models import zoedepth as jzoe
    from prisma_tpu.weights.store import load_depth_anything
    for m in found:
        _, params, enc = _check_consumed(
            lambda: load_depth_anything(_runtime(), metric=m),
            ["convert_metric_depth_anything"])
        out = jzoe.metric_depth_anything_infer(
            params, _frames(70, 94), encoder=enc, img_size=(126, 126),
            precision="highest")
        _fingerprint(f"metric_depth_anything_{m}", np.asarray(out))


def test_marigold_checkpoint():
    if not os.path.isdir(_ckpt("marigold")):
        pytest.skip("no marigold checkpoint present")
    # convert_marigold walks the diffusers snapshot dir itself; no state_dict
    # to track — the fingerprint over every param leaf is the fidelity check
    from prisma_tpu.weights.store import load_marigold
    params, _ = load_marigold(_runtime())
    import jax
    leaves = [np.asarray(x).mean() for x in jax.tree_util.tree_leaves(params)]
    _fingerprint("marigold_param_means", np.asarray(leaves))
