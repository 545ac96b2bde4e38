"""Checkpoint store: locate local converted/raw checkpoints and build params.

The reference fetches weights with download_models.sh + torch.hub/HF at run
time; this environment has no egress, so weights are resolved from a local
models/ directory (PRISMA_TPU_MODELS env var or runtime.models_dir):

  depth_anything_{vits,vitb,vitl}14.pt   torch state_dict (HF mixin layout)
  raft-sintel.pth, gmflow_sintel-*.pth   torch state_dicts
  ...

With runtime.random_weights=True (tests, smoke benches), models initialize
randomly instead — same shapes, no files needed.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from prisma_tpu.runtime.config import RuntimeConfig


def cast_params(params, dtype):
    """Cast floating-point leaves of a param tree (bf16 production path)."""
    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf
    return jax.tree.map(cast, params)


def _load_torch_state_dict(path: str) -> dict:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


# bump when torch_convert layouts change so stale cache entries invalidate
CONVERTER_VERSION = 1


def _source_tag(path: str) -> str:
    """mtime+size fingerprint of a checkpoint file (or dir of files)."""
    if os.path.isdir(path):
        import hashlib
        parts = []
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}{int(st.st_mtime)}{st.st_size}")
        return hashlib.md5("".join(parts).encode()).hexdigest()[:12]
    st = os.stat(path)
    return f"{int(st.st_mtime)}_{st.st_size}"


def _cached_convert(runtime: RuntimeConfig, name: str, src_path: str,
                    convert_fn):
    """Consult the orbax cache first (keyed by converter version + checkpoint
    fingerprint), else run the torch conversion and populate the cache —
    second process start spends seconds, not minutes, in weight loading."""
    if not getattr(runtime, "weight_cache", True):
        return convert_fn()
    tag = f"{name}_v{CONVERTER_VERSION}_{_source_tag(src_path)}"
    params = load_converted(runtime, tag)
    if params is not None:
        return params
    params = convert_fn()
    try:
        save_converted(runtime, tag, params)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[weights] cache save failed for {tag}: {e}")
    return params


def load_depth_anything(runtime: RuntimeConfig, encoder: str = "vitl",
                        metric: str = "none"):
    """-> (kind, params, encoder_name) with kind in {"relative", "metric"}.

    Relative: HF-mixin state_dict depth_anything_{enc}14.pt. Metric: ZoeDepth-
    over-DepthAnythingCore checkpoint depth_anything_metric_depth_{mode}.pt
    (reference depth_anything.py:38-39); always vitl."""
    from prisma_tpu.models import depth_anything as da
    from prisma_tpu.models import vit as pvit
    from prisma_tpu.models import zoedepth as jzoe
    from prisma_tpu.weights.torch_convert import (convert_depth_anything,
                                                  convert_metric_depth_anything)

    if metric != "none":
        if runtime.random_weights:
            # keep the requested encoder size for cheap smoke runs
            k1, k2 = jax.random.split(jax.random.key(0))
            features = {"vits": 64, "vitb": 128, "vitl": 256}[encoder]
            from prisma_tpu.models import dpt as pdpt
            from prisma_tpu.models import vit as pvit
            core = {"vit": pvit.init_params(k1, pvit.VIT_CONFIGS[encoder]),
                    "dpt": pdpt.init_params(k2, pvit.VIT_CONFIGS[encoder].embed_dim,
                                            features=features)}
            params = {"core": core,
                      "head": jzoe.init_head_params(k2, features)}
            return "metric", params, encoder
        encoder = "vitl"  # metric checkpoints are always ViT-L
        path = os.path.join(runtime.models_dir,
                            f"depth_anything_metric_depth_{metric}.pt")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"checkpoint {path} not found; place the metric checkpoint "
                "there or set runtime.random_weights=True")
        params = _cached_convert(
            runtime, f"depth_anything_metric_{metric}", path,
            lambda: convert_metric_depth_anything(_load_torch_state_dict(path),
                                                  depth=24))
        return "metric", params, encoder

    if runtime.random_weights:
        return "relative", da.init_params(jax.random.key(0), encoder), encoder

    path = os.path.join(runtime.models_dir, f"depth_anything_{encoder}14.pt")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path} not found; place the torch state_dict there or "
            "set runtime.random_weights=True for smoke runs")
    depth = pvit.VIT_CONFIGS[encoder].depth
    params = _cached_convert(
        runtime, f"depth_anything_{encoder}", path,
        lambda: convert_depth_anything(_load_torch_state_dict(path),
                                       depth=depth))
    return "relative", params, encoder


def load_raft(runtime: RuntimeConfig):
    """RAFT weights (reference: models/raft-sintel.pth, flow_raft.py:33)."""
    from prisma_tpu.models import raft as jraft
    from prisma_tpu.weights.torch_convert import convert_raft

    if runtime.random_weights:
        return jraft.init_params(jax.random.key(1))
    path = os.path.join(runtime.models_dir, "raft-sintel.pth")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path} not found; place raft-sintel.pth there or set "
            "runtime.random_weights=True for smoke runs")
    return _cached_convert(runtime, "raft_sintel", path,
                           lambda: convert_raft(_load_torch_state_dict(path)))


def load_gmflow(runtime: RuntimeConfig, cfg=None):
    """GMFlow weights (reference: models/gmflow_sintel-0c07dcb3.pth,
    flow_gmflow.py:35,60-63 — checkpoint wraps the state_dict under 'model').
    A cfg with num_scales=2 loads the gmflow_with_refine checkpoint instead."""
    from prisma_tpu.models import gmflow as jgm
    from prisma_tpu.weights.torch_convert import convert_gmflow

    refine = cfg is not None and cfg.num_scales > 1
    if runtime.random_weights:
        return jgm.init_params(jax.random.key(2), cfg or jgm.GMFlowConfig())
    name = ("gmflow_with_refine_sintel-3ed1cf48.pth" if refine
            else "gmflow_sintel-0c07dcb3.pth")
    path = os.path.join(runtime.models_dir, name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path} not found; place the gmflow checkpoint there "
            "or set runtime.random_weights=True for smoke runs")
    return _cached_convert(
        runtime, "gmflow_refine_sintel" if refine else "gmflow_sintel", path,
        lambda: convert_gmflow(_load_torch_state_dict(path)))


def load_solov2(runtime: RuntimeConfig, cfg=None):
    """SOLOv2 weights (reference: models/solov2_r101_fpn_3x_coco_*.pth,
    mask_mmdet.py:27-28 — mmdet checkpoint with 'state_dict')."""
    from prisma_tpu.models import solov2 as jsolo
    from prisma_tpu.weights.torch_convert import convert_solov2

    if runtime.random_weights:
        cfg = cfg or jsolo.SOLOv2Config()
        return jsolo.init_params(jax.random.key(3), cfg)
    import glob
    matches = sorted(glob.glob(os.path.join(
        runtime.models_dir, "solov2_r101_fpn_3x_coco*.pth")))
    if not matches:
        raise FileNotFoundError(
            f"no solov2_r101_fpn_3x_coco*.pth under {runtime.models_dir}; "
            "place the mmdet checkpoint there or set runtime.random_weights=True")
    return _cached_convert(
        runtime, "solov2_r101", matches[0],
        lambda: convert_solov2(_load_torch_state_dict(matches[0])))


def load_midas(runtime: RuntimeConfig, model_version: str = "midas3"):
    """-> (arch, params) for any reference model_version (depth_midas.py:26-41):
    midas2 / midas2-small -> MidasNet v2.1 (arch "v2"); midas3 / midas3-small
    -> DPT_Large (arch "dpt"). The -small variants differ only in transform
    target (256 vs 384), applied by the band."""
    from prisma_tpu.models import midas as jmidas
    from prisma_tpu.weights.torch_convert import (convert_midas2,
                                                  convert_midas_dpt)

    if model_version not in ("midas2-small", "midas2", "midas3-small",
                             "midas3"):
        raise ValueError(f"unknown midas model_version '{model_version}'")
    arch = "v2" if model_version.startswith("midas2") else "dpt"

    if runtime.random_weights:
        if arch == "v2":
            return arch, jmidas.init_params_v2(jax.random.key(4))
        return arch, jmidas.init_params(jax.random.key(4))

    if arch == "v2":
        for name in ("midas_v21_384.pt", "midas_v21-f6b98070.pt",
                     "model-f6b98070.pt"):
            path = os.path.join(runtime.models_dir, name)
            if os.path.exists(path):
                return arch, _cached_convert(
                    runtime, "midas_v21", path,
                    lambda p=path: convert_midas2(_load_torch_state_dict(p)))
        raise FileNotFoundError(
            f"no MiDaS v2.1 checkpoint under {runtime.models_dir}; place "
            "midas_v21_384.pt there or set runtime.random_weights=True")

    for name in ("dpt_large_384.pt", "dpt_large-midas-2f21e586.pt"):
        path = os.path.join(runtime.models_dir, name)
        if os.path.exists(path):
            return arch, _cached_convert(
                runtime, "midas_dpt_large", path,
                lambda p=path: convert_midas_dpt(_load_torch_state_dict(p)))
    raise FileNotFoundError(
        f"no MiDaS DPT_Large checkpoint under {runtime.models_dir}; place "
        "dpt_large_384.pt there or set runtime.random_weights=True")


def load_zoed(runtime: RuntimeConfig):
    """ZoeD_N weights (hub release ZoeD_M12_N.pt)."""
    from prisma_tpu.models import zoed as jzoed
    from prisma_tpu.weights.torch_convert import convert_zoed

    if runtime.random_weights:
        depth = int(os.environ.get("PRISMA_ZOED_DEPTH", "24"))
        return jzoed.init_params(jax.random.key(5), depth=depth)
    path = os.path.join(runtime.models_dir, "ZoeD_M12_N.pt")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path} not found; place ZoeD_M12_N.pt there or set "
            "runtime.random_weights=True for smoke runs")
    return _cached_convert(runtime, "zoed_n", path,
                           lambda: convert_zoed(_load_torch_state_dict(path)))


def load_patchfusion(runtime: RuntimeConfig):
    """PatchFusion weights (models/patchfusion_u4k.pt). -> (params, model_hw)."""
    from prisma_tpu.models import patchfusion as pf
    from prisma_tpu.weights.torch_convert import convert_patchfusion

    if runtime.random_weights:
        hw = tuple(int(v) for v in os.environ.get(
            "PRISMA_PF_SIZE", "384,512").split(","))
        depth = int(os.environ.get("PRISMA_PF_DEPTH", "24"))
        return pf.init_params(jax.random.key(6), beit_depth=depth,
                              model_hw=hw), hw
    path = os.path.join(runtime.models_dir, "patchfusion_u4k.pt")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path} not found; place patchfusion_u4k.pt there or "
            "set runtime.random_weights=True for smoke runs")
    params = _cached_convert(
        runtime, "patchfusion_u4k", path,
        lambda: convert_patchfusion(_load_torch_state_dict(path)))
    return params, (384, 512)


def load_marigold(runtime: RuntimeConfig):
    """Marigold weights (Bingxin/Marigold diffusers checkpoint). -> (params, unet_cfg)."""
    from prisma_tpu.models import marigold as jmar
    from prisma_tpu.models import sd2

    if runtime.random_weights:
        if os.environ.get("PRISMA_MARIGOLD_TINY", "0") == "1":
            ucfg = sd2.UNetConfig(block_channels=(32, 64), cross_attention_dim=64,
                                  head_dim=16, norm_groups=8)
            vcfg = sd2.VAEConfig(block_channels=(32, 64), norm_groups=8)
        else:
            ucfg = sd2.UNetConfig()
            vcfg = sd2.VAEConfig()
        return jmar.init_params(jax.random.key(7), ucfg, vcfg), ucfg
    from prisma_tpu.weights.torch_convert import convert_marigold
    mdir = os.path.join(runtime.models_dir, "marigold")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(
            f"{mdir} not found; place the Bingxin/Marigold diffusers snapshot "
            "(unet/vae/text_encoder torch weights) there or set "
            "runtime.random_weights=True")
    params = _cached_convert(runtime, "marigold", mdir,
                             lambda: convert_marigold(mdir))
    return params, sd2.UNetConfig()


# ---------------------------------------------------------------------------
# Converted-weight caching (orbax) — SURVEY.md §5 checkpoint/resume
# ---------------------------------------------------------------------------

def cache_dir(runtime: RuntimeConfig) -> str:
    return os.path.join(runtime.models_dir, "prisma_tpu_cache")


def save_converted(runtime: RuntimeConfig, name: str, params) -> None:
    """Persist a converted param tree with orbax so the torch conversion runs
    once per checkpoint."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(cache_dir(runtime), name))
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()


def load_converted(runtime: RuntimeConfig, name: str):
    """Load a cached converted tree, or None if absent."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(cache_dir(runtime), name))
    if not os.path.isdir(path):
        return None
    ckpt = ocp.StandardCheckpointer()
    try:
        return ckpt.restore(path)
    except Exception as e:
        print(f"[weights] cache restore failed for {name}: {e}")
        return None
