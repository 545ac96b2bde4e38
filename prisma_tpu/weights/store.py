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
        sd = _load_torch_state_dict(path)
        return "metric", convert_metric_depth_anything(sd, depth=24), encoder

    if runtime.random_weights:
        return "relative", da.init_params(jax.random.key(0), encoder), encoder

    path = os.path.join(runtime.models_dir, f"depth_anything_{encoder}14.pt")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path} not found; place the torch state_dict there or "
            "set runtime.random_weights=True for smoke runs")
    sd = _load_torch_state_dict(path)
    depth = pvit.VIT_CONFIGS[encoder].depth
    return "relative", convert_depth_anything(sd, depth=depth), encoder


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
    return convert_raft(_load_torch_state_dict(path))


def load_gmflow(runtime: RuntimeConfig):
    """GMFlow weights (reference: models/gmflow_sintel-0c07dcb3.pth,
    flow_gmflow.py:35,60-63 — checkpoint wraps the state_dict under 'model')."""
    from prisma_tpu.models import gmflow as jgm
    from prisma_tpu.weights.torch_convert import convert_gmflow

    if runtime.random_weights:
        return jgm.init_params(jax.random.key(2))
    path = os.path.join(runtime.models_dir, "gmflow_sintel-0c07dcb3.pth")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path} not found; place the gmflow checkpoint there "
            "or set runtime.random_weights=True for smoke runs")
    return convert_gmflow(_load_torch_state_dict(path))


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
    return convert_solov2(_load_torch_state_dict(matches[0]))


def load_midas(runtime: RuntimeConfig, model_version: str = "midas3"):
    """MiDaS DPT-Large weights (hub checkpoint dpt_large_384.pt)."""
    from prisma_tpu.models import midas as jmidas
    from prisma_tpu.weights.torch_convert import convert_midas_dpt

    if model_version != "midas3":
        print(f"[depth_midas] model_version '{model_version}' not yet "
              "available; using midas3 (DPT_Large)")
    if runtime.random_weights:
        return jmidas.init_params(jax.random.key(4))
    for name in ("dpt_large_384.pt", "dpt_large-midas-2f21e586.pt"):
        path = os.path.join(runtime.models_dir, name)
        if os.path.exists(path):
            return convert_midas_dpt(_load_torch_state_dict(path))
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
    return convert_zoed(_load_torch_state_dict(path))


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
    return convert_patchfusion(_load_torch_state_dict(path)), (384, 512)


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
    return convert_marigold(mdir), sd2.UNetConfig()


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
