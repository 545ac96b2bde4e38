"""Convert torch checkpoints to prisma_tpu parameter pytrees.

Handles the reference's checkpoint formats (SURVEY.md §7 hard part (d)):
torch hub, HF PyTorchModelHubMixin, raw state_dicts with `module.` DataParallel
prefixes. Input is a mapping of key -> array-like (torch tensors or numpy).

Layout conventions converted here:
- torch Linear [out, in]        -> ours [in, out]
- torch Conv2d [out, in, kh, kw] -> ours HWIO [kh, kw, in, out]
- torch ConvTranspose2d (k == stride) [in, out, kh, kw] -> ours [kh, kw, in, out]
- torch patch-embed conv        -> ours flat [kh*kw*in, out] (patchify order kh, kw, c)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


# torch buffers that carry no inference-time information: BN step counters,
# index/mask buffers the models recompute from geometry (BEiT/Swin), and
# DINOv2's mask_token (only read under masked-image-modeling `masks`,
# vision_transformer.py:216 — inference always passes masks=None).
DEFAULT_IGNORE = ("*num_batches_tracked", "*relative_position_index",
                  "*attn_mask", "*mask_token",
                  # LogBinomial's arange/K-1 buffers are pure functions of
                  # n_classes (dist_layers.py:46-48)
                  "*log_binomial_transform.k_idx",
                  "*log_binomial_transform.K_minus_1")


class TrackedStateDict(dict):
    """state_dict wrapper recording which keys a converter actually read.

    Structural parity tests feed random weights through the real reference
    torch modules, which proves layouts but is blind to a converter silently
    DROPPING a tensor (a key-name typo falls back to defaults only when the
    target tree tolerates it). Wrapping the state_dict and asserting every
    key was consumed closes that hole (VERDICT r3 item 4). `strip_prefix`
    children propagate consumption to their parent so nested converters keep
    the accounting exact. Membership tests (`k in sd`) do NOT consume —
    only actual reads do.
    """

    def __init__(self, data, parent=None, key_map=None):
        super().__init__(data)
        self.consumed = set()
        self._parent = parent
        self._key_map = key_map or {}

    def __getitem__(self, k):
        self.consume(k)
        return super().__getitem__(k)

    def consume(self, k):
        if super().__contains__(k) and k not in self.consumed:
            self.consumed.add(k)
            if self._parent is not None:
                self._parent.consume(self._key_map.get(k, k))

    def unconsumed(self, ignore=DEFAULT_IGNORE):
        import fnmatch
        return sorted(k for k in self if k not in self.consumed
                      and not any(fnmatch.fnmatch(k, p) for p in ignore))


def mark_consumed(sd: dict, *prefixes) -> None:
    """Mark alias keys as consumed (a torch module registered under two
    attribute names — e.g. RAFT's downsample Sequential sharing norm3,
    extractor.py:44-45 — emits the SAME tensors twice in the state_dict)."""
    if isinstance(sd, TrackedStateDict):
        for prefix in prefixes:
            for k in sd:
                if k.startswith(prefix):
                    sd.consume(k)


def convert_checked(convert_fn, sd: dict, *args, ignore=DEFAULT_IGNORE,
                    **kwargs):
    """Run a converter over a tracked state_dict and fail on leftover keys."""
    tracked = TrackedStateDict(sd)
    params = convert_fn(tracked, *args, **kwargs)
    left = tracked.unconsumed(ignore)
    if left:
        raise KeyError(
            f"{convert_fn.__name__} left {len(left)} state_dict key(s) "
            f"unconsumed: {left[:12]}{' ...' if len(left) > 12 else ''}")
    return params


def strip_prefix(sd: dict, prefix: str) -> dict:
    out = {}
    key_map = {}
    for k, v in sd.items():
        orig = k
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
            key_map[k[len(prefix):]] = orig
    if isinstance(sd, TrackedStateDict):
        return TrackedStateDict(out, parent=sd, key_map=key_map)
    return out


def _lin(sd, key, dtype):
    p = {"w": jnp.asarray(_np(sd[key + ".weight"]).T, dtype)}
    if key + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[key + ".bias"]), dtype)
    return p


def _conv(sd, key, dtype, bias=True):
    p = {"w": jnp.asarray(_np(sd[key + ".weight"]).transpose(2, 3, 1, 0), dtype)}
    if bias and key + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[key + ".bias"]), dtype)
    return p


def _convT(sd, key, dtype):
    # torch ConvTranspose2d weight [in, out, kh, kw] -> [kh, kw, in, out]
    p = {"w": jnp.asarray(_np(sd[key + ".weight"]).transpose(2, 3, 0, 1), dtype)}
    if key + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[key + ".bias"]), dtype)
    return p


def _norm(sd, key, dtype):
    return {"scale": jnp.asarray(_np(sd[key + ".weight"]), dtype),
            "bias": jnp.asarray(_np(sd[key + ".bias"]), dtype)}


def convert_dino_vit(sd: dict, depth: int, dtype=jnp.float32) -> dict:
    """DINOv2 ViT state_dict (keys: patch_embed.proj, cls_token, pos_embed,
    blocks.{i}.{norm1,attn.qkv,attn.proj,ls1,norm2,mlp.fc1,mlp.fc2,ls2}, norm)."""
    pe_w = _np(sd["patch_embed.proj.weight"])  # [D, 3, kh, kw]
    D = pe_w.shape[0]
    patch_flat = pe_w.transpose(2, 3, 1, 0).reshape(-1, D)  # (kh, kw, c) order
    params = {
        "patch_embed": {"w": jnp.asarray(patch_flat, dtype),
                        "b": jnp.asarray(_np(sd["patch_embed.proj.bias"]), dtype)},
        "cls_token": jnp.asarray(_np(sd["cls_token"]), dtype),
        "pos_embed": jnp.asarray(_np(sd["pos_embed"]), dtype),
        "norm": _norm(sd, "norm", dtype),
        "blocks": [],
    }
    for i in range(depth):
        b = f"blocks.{i}."
        params["blocks"].append({
            "norm1": _norm(sd, b + "norm1", dtype),
            "attn": {"qkv": _lin(sd, b + "attn.qkv", dtype),
                     "proj": _lin(sd, b + "attn.proj", dtype)},
            "ls1": jnp.asarray(_np(sd[b + "ls1.gamma"]), dtype),
            "norm2": _norm(sd, b + "norm2", dtype),
            "mlp": {"fc1": _lin(sd, b + "mlp.fc1", dtype),
                    "fc2": _lin(sd, b + "mlp.fc2", dtype)},
            "ls2": jnp.asarray(_np(sd[b + "ls2.gamma"]), dtype),
        })
    return params


def convert_dpt_head(sd: dict, dtype=jnp.float32) -> dict:
    """DPTHead state_dict (reference dpt.py:22-101 layout, use_clstoken=False)."""
    params = {
        "projects": [_conv(sd, f"projects.{i}", dtype) for i in range(4)],
        "resize0": _convT(sd, "resize_layers.0", dtype),
        "resize1": _convT(sd, "resize_layers.1", dtype),
        "resize3": _conv(sd, "resize_layers.3", dtype),
        "scratch": [_conv(sd, f"scratch.layer{i + 1}_rn", dtype) for i in range(4)],
        "refinenet": [],
        "output_conv1": _conv(sd, "scratch.output_conv1", dtype),
        "output_conv2_0": _conv(sd, "scratch.output_conv2.0", dtype),
        "output_conv2_2": _conv(sd, "scratch.output_conv2.2", dtype),
    }
    for i in range(1, 5):
        r = f"scratch.refinenet{i}."
        params["refinenet"].append({
            "rcu1": {"conv1": _conv(sd, r + "resConfUnit1.conv1", dtype),
                     "conv2": _conv(sd, r + "resConfUnit1.conv2", dtype)},
            "rcu2": {"conv1": _conv(sd, r + "resConfUnit2.conv1", dtype),
                     "conv2": _conv(sd, r + "resConfUnit2.conv2", dtype)},
            "out_conv": _conv(sd, r + "out_conv", dtype),
        })
    return params


def convert_depth_anything(sd: dict, depth: int, dtype=jnp.float32) -> dict:
    """Full DepthAnything checkpoint: `pretrained.*` ViT + `depth_head.*` DPT."""
    return {"vit": convert_dino_vit(strip_prefix(sd, "pretrained."), depth, dtype),
            "dpt": convert_dpt_head(strip_prefix(sd, "depth_head."), dtype)}


# ---------------------------------------------------------------------------
# RAFT
# ---------------------------------------------------------------------------

def _fold_bn(sd, key, dtype, eps=1e-5):
    """Eval-mode BatchNorm2d -> per-channel affine (scale, bias)."""
    w = _np(sd[key + ".weight"])
    b = _np(sd[key + ".bias"])
    rm = _np(sd[key + ".running_mean"])
    rv = _np(sd[key + ".running_var"])
    scale = w / np.sqrt(rv + eps)
    return {"scale": jnp.asarray(scale, dtype),
            "bias": jnp.asarray(b - rm * scale, dtype)}


def convert_raft(sd: dict, dtype=jnp.float32) -> dict:
    """RAFT checkpoint (module.-prefixed DataParallel state_dict,
    flow_raft.py:42-44) -> prisma_tpu.models.raft param tree."""
    sd = strip_prefix(sd, "")

    def encoder(prefix, kind):
        enc = {"conv1": _conv(sd, prefix + "conv1", dtype),
               "conv2": _conv(sd, prefix + "conv2", dtype),
               "blocks": []}
        if kind == "affine":
            enc["norm1"] = _fold_bn(sd, prefix + "norm1", dtype)
        layer_map = [("layer1.0", 1), ("layer1.1", 1), ("layer2.0", 2),
                     ("layer2.1", 1), ("layer3.0", 2), ("layer3.1", 1)]
        for name, stride in layer_map:
            k = f"{prefix}{name}."
            b = {"conv1": _conv(sd, k + "conv1", dtype),
                 "conv2": _conv(sd, k + "conv2", dtype)}
            if kind == "affine":
                b["norm1"] = _fold_bn(sd, k + "norm1", dtype)
                b["norm2"] = _fold_bn(sd, k + "norm2", dtype)
            if stride != 1:
                b["down"] = _conv(sd, k + "downsample.0", dtype)
                if kind == "affine":
                    b["norm3"] = _fold_bn(sd, k + "downsample.1", dtype)
                # downsample.1 IS norm3 (one module, two registrations —
                # extractor.py:44-45); the duplicate keys are aliases
                mark_consumed(sd, k + "norm3.")
            enc["blocks"].append(b)
        return enc

    u = "update_block."
    return {
        "fnet": encoder("fnet.", "instance"),
        "cnet": encoder("cnet.", "affine"),
        "update": {
            "encoder": {name: _conv(sd, u + "encoder." + name, dtype)
                        for name in ("convc1", "convc2", "convf1", "convf2",
                                     "conv")},
            "gru": {name: _conv(sd, u + "gru." + name, dtype)
                    for name in ("convz1", "convr1", "convq1",
                                 "convz2", "convr2", "convq2")},
            "flow_head": {"conv1": _conv(sd, u + "flow_head.conv1", dtype),
                          "conv2": _conv(sd, u + "flow_head.conv2", dtype)},
            "mask": {"conv1": _conv(sd, u + "mask.0", dtype),
                     "conv2": _conv(sd, u + "mask.2", dtype)},
        },
    }


# ---------------------------------------------------------------------------
# GMFlow
# ---------------------------------------------------------------------------

def convert_gmflow(sd: dict, num_layers: int = 6, dtype=jnp.float32) -> dict:
    """GMFlow checkpoint ('model' sub-dict handled upstream, flow_gmflow.py:60-63)
    -> prisma_tpu.models.gmflow param tree. InstanceNorms carry no params."""
    sd = strip_prefix(sd, "")

    def bb_block(name):
        k = f"backbone.{name}."
        b = {"conv1": _conv(sd, k + "conv1", dtype),
             "conv2": _conv(sd, k + "conv2", dtype)}
        if k + "downsample.0.weight" in sd:
            b["down"] = _conv(sd, k + "downsample.0", dtype)
        return b

    def tlayer(prefix, no_ffn):
        p = {"q": _lin(sd, prefix + "q_proj", dtype),
             "k": _lin(sd, prefix + "k_proj", dtype),
             "v": _lin(sd, prefix + "v_proj", dtype),
             "merge": _lin(sd, prefix + "merge", dtype),
             "norm1": _norm(sd, prefix + "norm1", dtype)}
        if not no_ffn:
            p["mlp1"] = _lin(sd, prefix + "mlp.0", dtype)
            p["mlp2"] = _lin(sd, prefix + "mlp.2", dtype)
            p["norm2"] = _norm(sd, prefix + "norm2", dtype)
        return p

    backbone = {
        "conv1": _conv(sd, "backbone.conv1", dtype),
        "blocks": [bb_block(n) for n in ("layer1.0", "layer1.1", "layer2.0",
                                         "layer2.1", "layer3.0", "layer3.1")],
        "conv2": _conv(sd, "backbone.conv2", dtype),
    }
    if "backbone.trident_conv.weight" in sd:
        # gmflow_with_refine (num_scales=2): weight-shared multi-stride conv
        backbone["trident"] = _conv(sd, "backbone.trident_conv", dtype)

    return {
        "backbone": backbone,
        "transformer": {"layers": [
            {"self": tlayer(f"transformer.layers.{i}.self_attn.", True),
             "cross": tlayer(f"transformer.layers.{i}.cross_attn_ffn.", False)}
            for i in range(num_layers)]},
        "flow_attn": {"q": _lin(sd, "feature_flow_attn.q_proj", dtype),
                      "k": _lin(sd, "feature_flow_attn.k_proj", dtype)},
        "upsampler": {"conv1": _conv(sd, "upsampler.0", dtype),
                      "conv2": _conv(sd, "upsampler.2", dtype)},
    }


# ---------------------------------------------------------------------------
# SOLOv2 (mmdet checkpoint layout)
# ---------------------------------------------------------------------------

def convert_resnet(sd: dict, prefix: str, depth: int, dtype=jnp.float32) -> dict:
    """torchvision/mmdet pytorch-style ResNet with folded BatchNorms."""
    stages = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[depth]
    params = {"stem": _conv(sd, prefix + "conv1", dtype),
              "stem_bn": _fold_bn(sd, prefix + "bn1", dtype),
              "stages": []}
    for si, nblocks in enumerate(stages):
        stage = []
        for bi in range(nblocks):
            k = f"{prefix}layer{si + 1}.{bi}."
            block = {"conv1": _conv(sd, k + "conv1", dtype),
                     "bn1": _fold_bn(sd, k + "bn1", dtype),
                     "conv2": _conv(sd, k + "conv2", dtype),
                     "bn2": _fold_bn(sd, k + "bn2", dtype),
                     "conv3": _conv(sd, k + "conv3", dtype),
                     "bn3": _fold_bn(sd, k + "bn3", dtype)}
            if k + "downsample.0.weight" in sd:
                block["down"] = _conv(sd, k + "downsample.0", dtype)
                block["down_bn"] = _fold_bn(sd, k + "downsample.1", dtype)
            stage.append(block)
        params["stages"].append(stage)
    return params


def _cgn(sd, key, dtype):
    """mmcv ConvModule with GN: {key}.conv + {key}.gn."""
    return {"conv": _conv(sd, key + ".conv", dtype),
            "gn": _norm(sd, key + ".gn", dtype)}


def convert_solov2(sd: dict, stacked_convs: int = 4, dtype=jnp.float32) -> dict:
    """mmdet SOLOv2 checkpoint (state_dict with backbone./neck./mask_head.
    prefixes) -> prisma_tpu.models.solov2 param tree."""
    sd = strip_prefix(sd, "")
    if any(k.startswith("state_dict") for k in sd):
        sd = sd["state_dict"]

    mh = "mask_head."
    branches = []
    for i in range(4):
        base = f"{mh}mask_feature_head.convs_all_levels.{i}."
        chain = []
        j = 0
        while f"{base}conv{j}.conv.weight" in sd:
            chain.append(_cgn(sd, f"{base}conv{j}", dtype))
            j += 1
        branches.append(chain)

    return {
        "backbone": convert_resnet(sd, "backbone.", 101, dtype),
        "fpn": {
            "lateral": [_conv(sd, f"neck.lateral_convs.{i}.conv", dtype)
                        for i in range(4)],
            "out": [_conv(sd, f"neck.fpn_convs.{i}.conv", dtype)
                    for i in range(4)],
        },
        "head": {
            "mask_feat": {
                "branches": branches,
                "pred": {"conv": _conv(sd, mh + "mask_feature_head.conv_pred.conv",
                                       dtype),
                         "gn": _norm(sd, mh + "mask_feature_head.conv_pred.gn",
                                     dtype)},
            },
            "kernel_convs": [_cgn(sd, f"{mh}kernel_convs.{i}", dtype)
                             for i in range(stacked_convs)],
            "cls_convs": [_cgn(sd, f"{mh}cls_convs.{i}", dtype)
                          for i in range(stacked_convs)],
            "conv_kernel": _conv(sd, mh + "conv_kernel", dtype),
            "conv_cls": _conv(sd, mh + "conv_cls", dtype),
        },
    }


# ---------------------------------------------------------------------------
# ZoeDepth (metric head; cores converted with the existing ViT/DPT converters)
# ---------------------------------------------------------------------------

def _mlp2p(sd, key, dtype):
    """layers' _net Sequential(conv1x1, act, conv1x1, act) -> {fc1, fc2}."""
    return {"fc1": _conv(sd, key + ".0", dtype), "fc2": _conv(sd, key + ".2", dtype)}


def convert_zoedepth_head(sd: dict, dtype=jnp.float32) -> dict:
    """ZoeDepth bins-head parameters (zoedepth_v1.py:109-125 layout)."""
    return {
        "conv2": _conv(sd, "conv2", dtype),
        "seed_bin_regressor": _mlp2p(sd, "seed_bin_regressor._net", dtype),
        "seed_projector": _mlp2p(sd, "seed_projector._net", dtype),
        "projectors": [_mlp2p(sd, f"projectors.{i}._net", dtype)
                       for i in range(4)],
        "attractors": [_mlp2p(sd, f"attractors.{i}._net", dtype)
                       for i in range(4)],
        "conditional_log_binomial": _mlp2p(sd, "conditional_log_binomial.mlp",
                                           dtype),
    }


def convert_metric_depth_anything(sd: dict, depth: int = 24,
                                  dtype=jnp.float32) -> dict:
    """Metric Depth-Anything checkpoint (ZoeDepth over DepthAnythingCore:
    core.core.pretrained + core.core.depth_head + bins head)."""
    sd = strip_prefix(sd, "")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    core = strip_prefix(sd, "core.core.")
    return {
        "core": {"vit": convert_dino_vit(strip_prefix(core, "pretrained."),
                                         depth, dtype),
                 "dpt": convert_dpt_head(strip_prefix(core, "depth_head."),
                                         dtype)},
        "head": convert_zoedepth_head(sd, dtype),
    }


# ---------------------------------------------------------------------------
# MiDaS DPT-Large (hub checkpoint layout: pretrained.model.* + pretrained.
# act_postprocess{1..4}.* + scratch.*)
# ---------------------------------------------------------------------------

def convert_midas_dpt(sd: dict, dtype=jnp.float32) -> dict:
    sd = strip_prefix(sd, "")

    vit_sd = strip_prefix(sd, "pretrained.model.")
    pe_w = _np(vit_sd["patch_embed.proj.weight"])
    D = pe_w.shape[0]
    vit = {
        "patch_embed": {"w": jnp.asarray(
            pe_w.transpose(2, 3, 1, 0).reshape(-1, D), dtype),
            "b": jnp.asarray(_np(vit_sd["patch_embed.proj.bias"]), dtype)},
        "cls_token": jnp.asarray(_np(vit_sd["cls_token"]), dtype),
        "pos_embed": jnp.asarray(_np(vit_sd["pos_embed"]), dtype),
        "norm": _norm(vit_sd, "norm", dtype),
        "blocks": [],
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in vit_sd:
        b = f"blocks.{i}."
        vit["blocks"].append({
            "norm1": _norm(vit_sd, b + "norm1", dtype),
            "attn": {"qkv": _lin(vit_sd, b + "attn.qkv", dtype),
                     "proj": _lin(vit_sd, b + "attn.proj", dtype)},
            "norm2": _norm(vit_sd, b + "norm2", dtype),
            "mlp": {"fc1": _lin(vit_sd, b + "mlp.fc1", dtype),
                    "fc2": _lin(vit_sd, b + "mlp.fc2", dtype)},
        })
        i += 1

    params = {
        "vit": vit,
        "readout": [_lin(sd, f"pretrained.act_postprocess{i}.0.project.0", dtype)
                    for i in range(1, 5)],
        "projects": [_conv(sd, f"pretrained.act_postprocess{i}.3", dtype)
                     for i in range(1, 5)],
        "resize0": _convT(sd, "pretrained.act_postprocess1.4", dtype),
        "resize1": _convT(sd, "pretrained.act_postprocess2.4", dtype),
        "resize3": _conv(sd, "pretrained.act_postprocess4.4", dtype),
        "scratch": [_conv(sd, f"scratch.layer{i}_rn", dtype)
                    for i in range(1, 5)],
        "refinenet": [],
        "head0": _conv(sd, "scratch.output_conv.0", dtype),
        "head2": _conv(sd, "scratch.output_conv.2", dtype),
        "head4": _conv(sd, "scratch.output_conv.4", dtype),
    }
    for i in range(1, 5):
        r = f"scratch.refinenet{i}."
        params["refinenet"].append({
            "rcu1": {"conv1": _conv(sd, r + "resConfUnit1.conv1", dtype),
                     "conv2": _conv(sd, r + "resConfUnit1.conv2", dtype)},
            "rcu2": {"conv1": _conv(sd, r + "resConfUnit2.conv1", dtype),
                     "conv2": _conv(sd, r + "resConfUnit2.conv2", dtype)},
            "out_conv": _conv(sd, r + "out_conv", dtype),
        })
    return params


# ---------------------------------------------------------------------------
# ZoeD_N (BEiT-L MidasCore + bins head)
# ---------------------------------------------------------------------------

def _convert_beit(vit_sd: dict, dtype=jnp.float32) -> dict:
    """timm BEiT state_dict (pretrained.model.*-stripped) -> beit param tree."""
    pe_w = _np(vit_sd["patch_embed.proj.weight"])
    D = pe_w.shape[0]
    params = {
        "patch_embed": {"w": jnp.asarray(
            pe_w.transpose(2, 3, 1, 0).reshape(-1, D), dtype),
            "b": jnp.asarray(_np(vit_sd["patch_embed.proj.bias"]), dtype)},
        "cls_token": jnp.asarray(_np(vit_sd["cls_token"]), dtype),
        "blocks": [],
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in vit_sd:
        b = f"blocks.{i}."
        params["blocks"].append({
            "norm1": _norm(vit_sd, b + "norm1", dtype),
            "attn": {
                "qkv_w": jnp.asarray(_np(vit_sd[b + "attn.qkv.weight"]).T, dtype),
                "q_bias": jnp.asarray(_np(vit_sd[b + "attn.q_bias"]), dtype),
                "v_bias": jnp.asarray(_np(vit_sd[b + "attn.v_bias"]), dtype),
                "proj": _lin(vit_sd, b + "attn.proj", dtype),
            },
            "rel_pos_table": jnp.asarray(
                _np(vit_sd[b + "attn.relative_position_bias_table"]), dtype),
            "gamma1": jnp.asarray(_np(vit_sd[b + "gamma_1"]), dtype),
            "norm2": _norm(vit_sd, b + "norm2", dtype),
            "mlp": {"fc1": _lin(vit_sd, b + "mlp.fc1", dtype),
                    "fc2": _lin(vit_sd, b + "mlp.fc2", dtype)},
            "gamma2": jnp.asarray(_np(vit_sd[b + "gamma_2"]), dtype),
        })
        i += 1
    return params


def _convert_midas_decoder(sd: dict, dtype=jnp.float32) -> dict:
    """MiDaS DPT decoder (readout/act_postprocess/scratch) without backbone."""
    params = {
        "readout": [_lin(sd, f"pretrained.act_postprocess{i}.0.project.0", dtype)
                    for i in range(1, 5)],
        "projects": [_conv(sd, f"pretrained.act_postprocess{i}.3", dtype)
                     for i in range(1, 5)],
        "resize0": _convT(sd, "pretrained.act_postprocess1.4", dtype),
        "resize1": _convT(sd, "pretrained.act_postprocess2.4", dtype),
        "resize3": _conv(sd, "pretrained.act_postprocess4.4", dtype),
        "scratch": [_conv(sd, f"scratch.layer{i}_rn", dtype)
                    for i in range(1, 5)],
        "refinenet": [],
        "head0": _conv(sd, "scratch.output_conv.0", dtype),
        "head2": _conv(sd, "scratch.output_conv.2", dtype),
        "head4": _conv(sd, "scratch.output_conv.4", dtype),
    }
    for i in range(1, 5):
        r = f"scratch.refinenet{i}."
        params["refinenet"].append({
            "rcu1": {"conv1": _conv(sd, r + "resConfUnit1.conv1", dtype),
                     "conv2": _conv(sd, r + "resConfUnit1.conv2", dtype)},
            "rcu2": {"conv1": _conv(sd, r + "resConfUnit2.conv1", dtype),
                     "conv2": _conv(sd, r + "resConfUnit2.conv2", dtype)},
            "out_conv": _conv(sd, r + "out_conv", dtype),
        })
    return params


def convert_zoed(sd: dict, dtype=jnp.float32) -> dict:
    """ZoeD_N checkpoint (ZoeD_M12_N.pt: 'model' dict with core.core.* MiDaS
    BEiT + bins head) -> prisma_tpu.models.zoed param tree."""
    sd = strip_prefix(sd, "")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    midas_sd = strip_prefix(sd, "core.core.")
    return {
        "core": {
            "beit": _convert_beit(strip_prefix(midas_sd, "pretrained.model."),
                                  dtype),
            "decoder": _convert_midas_decoder(midas_sd, dtype),
        },
        "head": convert_zoedepth_head(sd, dtype),
    }


# ---------------------------------------------------------------------------
# PatchFusion
# ---------------------------------------------------------------------------

def _convert_zoedepth_custom(sd: dict, dtype=jnp.float32) -> dict:
    """ZoeDepthCustom sub-model (core.core.* BEiT midas + bins head)."""
    midas_sd = strip_prefix(sd, "core.core.")
    return {
        "core": {
            "beit": _convert_beit(strip_prefix(midas_sd, "pretrained.model."),
                                  dtype),
            "decoder": _convert_midas_decoder(midas_sd, dtype),
        },
        "head": convert_zoedepth_head(sd, dtype),
    }


def _dconv_bn(sd, key, dtype):
    """fusion_network DoubleConv: Sequential(conv, BN, ReLU, conv, BN, ReLU)."""
    return {"conv1": _conv(sd, key + ".0", dtype),
            "bn1": _fold_bn(sd, key + ".1", dtype),
            "conv2": _conv(sd, key + ".3", dtype),
            "bn2": _fold_bn(sd, key + ".4", dtype)}


def _dconv_wobn(sd, key, dtype):
    """DoubleConvWOBN: Sequential(conv, ReLU, conv, ReLU)."""
    return {"conv1": _conv(sd, key + ".0", dtype),
            "conv2": _conv(sd, key + ".2", dtype)}


def _convert_g2l(sd: dict, prefix: str, dtype=jnp.float32) -> dict:
    blocks = []
    i = 0
    while f"{prefix}g2l_layer.blocks.{i}.norm1.weight" in sd:
        b = f"{prefix}g2l_layer.blocks.{i}."
        blocks.append({
            "norm1": _norm(sd, b + "norm1", dtype),
            "qkv": _lin(sd, b + "attn.qkv", dtype),
            "proj": _lin(sd, b + "attn.proj", dtype),
            "rel_pos_table": jnp.asarray(
                _np(sd[b + "attn.relative_position_bias_table"]), dtype),
            "norm2": _norm(sd, b + "norm2", dtype),
            "mlp": {"fc1": _lin(sd, b + "mlp.fc1", dtype),
                    "fc2": _lin(sd, b + "mlp.fc2", dtype)},
        })
        i += 1
    return {
        "embed_proj": _conv(sd, prefix + "embed_proj", dtype),
        "absolute_pos_embed": jnp.asarray(
            _np(sd[prefix + "absolute_pos_embed"]), dtype),
        "blocks": blocks,
        "norm": _norm(sd, prefix + "g2l_layer_norm", dtype),
    }


def convert_patchfusion(sd: dict, dtype=jnp.float32) -> dict:
    """PatchFusion checkpoint (patchfusion_u4k.pt) -> prisma_tpu param tree."""
    sd = strip_prefix(sd, "")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    fe = "fusion_extractor."
    return {
        "coarse": _convert_zoedepth_custom(strip_prefix(sd, "coarse_model."),
                                           dtype),
        "fine": _convert_zoedepth_custom(strip_prefix(sd, "fine_model."),
                                         dtype),
        "coarse_input_proj": [_conv(sd, f"coarse_input_proj.{i}", dtype)
                              for i in range(6)],
        "fine_input_proj": [_conv(sd, f"fine_input_proj.{i}", dtype)
                            for i in range(6)],
        "fusion_conv": [_conv(sd, f"fusion_conv_list.{i}", dtype)
                        for i in range(6)],
        "unet": {
            "inc": _dconv_bn(sd, fe + "inc.double_conv", dtype),
            "down": [_dconv_bn(sd, fe + f"down{i}.maxpool_conv.1.double_conv",
                               dtype) for i in range(1, 6)],
            "up": [_dconv_wobn(sd, fe + f"up{i}.conv.double_conv", dtype)
                   for i in range(1, 6)],
            # my conv[k] pairs with g2l level k (k=0 -> reference conv5/g2l5)
            "conv": [_dconv_wobn(sd, fe + f"conv{5 - k}.double_conv", dtype)
                     for k in range(6)],
            "g2l": [_convert_g2l(sd, fe + f"g2l{5 - k}.", dtype)
                    for k in range(6)],
        },
        "head": convert_zoedepth_head(sd, dtype),
    }


# ---------------------------------------------------------------------------
# Marigold (diffusers snapshot: unet/ vae/ text_encoder/)
# ---------------------------------------------------------------------------

def _res_block(sd, key, dtype, time_emb=True):
    p = {"norm1": _norm(sd, key + ".norm1", dtype),
         "conv1": _conv(sd, key + ".conv1", dtype),
         "norm2": _norm(sd, key + ".norm2", dtype),
         "conv2": _conv(sd, key + ".conv2", dtype)}
    if time_emb and key + ".time_emb_proj.weight" in sd:
        p["time_emb"] = _lin(sd, key + ".time_emb_proj", dtype)
    if key + ".conv_shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, key + ".conv_shortcut", dtype)
    return p


def _sd_xattn(sd, key, dtype):
    return {"q": _lin(sd, key + ".to_q", dtype),
            "k": _lin(sd, key + ".to_k", dtype),
            "v": _lin(sd, key + ".to_v", dtype),
            "out": _lin(sd, key + ".to_out.0", dtype)}


def _sd_spatial(sd, key, dtype):
    blocks = []
    i = 0
    while f"{key}.transformer_blocks.{i}.norm1.weight" in sd:
        t = f"{key}.transformer_blocks.{i}"
        blocks.append({
            "norm1": _norm(sd, t + ".norm1", dtype),
            "attn1": _sd_xattn(sd, t + ".attn1", dtype),
            "norm2": _norm(sd, t + ".norm2", dtype),
            "attn2": _sd_xattn(sd, t + ".attn2", dtype),
            "norm3": _norm(sd, t + ".norm3", dtype),
            "ff": {"proj": _lin(sd, t + ".ff.net.0.proj", dtype),
                   "out": _lin(sd, t + ".ff.net.2", dtype)},
        })
        i += 1
    return {"norm": _norm(sd, key + ".norm", dtype),
            "proj_in": _lin(sd, key + ".proj_in", dtype),
            "blocks": blocks,
            "proj_out": _lin(sd, key + ".proj_out", dtype)}


def convert_sd2_unet(sd: dict, dtype=jnp.float32) -> dict:
    sd = strip_prefix(sd, "")
    down = []
    bi = 0
    while f"down_blocks.{bi}.resnets.0.norm1.weight" in sd:
        b = f"down_blocks.{bi}"
        block = {"resnets": []}
        j = 0
        while f"{b}.resnets.{j}.norm1.weight" in sd:
            block["resnets"].append(_res_block(sd, f"{b}.resnets.{j}", dtype))
            j += 1
        if f"{b}.attentions.0.norm.weight" in sd:
            block["attns"] = []
            for k in range(j):
                block["attns"].append(_sd_spatial(sd, f"{b}.attentions.{k}",
                                                  dtype))
        if f"{b}.downsamplers.0.conv.weight" in sd:
            block["down"] = _conv(sd, f"{b}.downsamplers.0.conv", dtype)
        down.append(block)
        bi += 1

    up = []
    bi = 0
    while f"up_blocks.{bi}.resnets.0.norm1.weight" in sd:
        b = f"up_blocks.{bi}"
        block = {"resnets": []}
        j = 0
        while f"{b}.resnets.{j}.norm1.weight" in sd:
            block["resnets"].append(_res_block(sd, f"{b}.resnets.{j}", dtype))
            j += 1
        if f"{b}.attentions.0.norm.weight" in sd:
            block["attns"] = [_sd_spatial(sd, f"{b}.attentions.{k}", dtype)
                              for k in range(j)]
        if f"{b}.upsamplers.0.conv.weight" in sd:
            block["up"] = _conv(sd, f"{b}.upsamplers.0.conv", dtype)
        up.append(block)
        bi += 1

    return {
        "time1": _lin(sd, "time_embedding.linear_1", dtype),
        "time2": _lin(sd, "time_embedding.linear_2", dtype),
        "conv_in": _conv(sd, "conv_in", dtype),
        "down": down,
        "mid": {"res1": _res_block(sd, "mid_block.resnets.0", dtype),
                "attn": _sd_spatial(sd, "mid_block.attentions.0", dtype),
                "res2": _res_block(sd, "mid_block.resnets.1", dtype)},
        "up": up,
        "norm_out": _norm(sd, "conv_norm_out", dtype),
        "conv_out": _conv(sd, "conv_out", dtype),
    }


def _vae_attn_params(sd, key, dtype):
    # newer diffusers: to_q/to_k/to_v/to_out.0 + group_norm; older: q/k/v/
    # proj_attn + norm. Handle both.
    if key + ".to_q.weight" in sd:
        return {"norm": _norm(sd, key + ".group_norm", dtype),
                "q": _lin(sd, key + ".to_q", dtype),
                "k": _lin(sd, key + ".to_k", dtype),
                "v": _lin(sd, key + ".to_v", dtype),
                "out": _lin(sd, key + ".to_out.0", dtype)}
    def lin1x1(name):
        w = _np(sd[key + f".{name}.weight"])
        if w.ndim == 4:  # stored as 1x1 conv
            w = w[:, :, 0, 0]
        return {"w": jnp.asarray(w.T, dtype),
                "b": jnp.asarray(_np(sd[key + f".{name}.bias"]), dtype)}
    return {"norm": _norm(sd, key + ".norm", dtype) if key + ".norm.weight" in sd
            else _norm(sd, key + ".group_norm", dtype),
            "q": lin1x1("q" if key + ".q.weight" in sd else "query"),
            "k": lin1x1("k" if key + ".k.weight" in sd else "key"),
            "v": lin1x1("v" if key + ".v.weight" in sd else "value"),
            "out": lin1x1("proj_attn" if key + ".proj_attn.weight" in sd
                          else "proj_out")}


def convert_sd_vae(sd: dict, dtype=jnp.float32) -> dict:
    sd = strip_prefix(sd, "")

    def blocks(prefix, kind):
        out = []
        bi = 0
        while f"{prefix}.{bi}.resnets.0.norm1.weight" in sd:
            b = f"{prefix}.{bi}"
            block = {"resnets": []}
            j = 0
            while f"{b}.resnets.{j}.norm1.weight" in sd:
                block["resnets"].append(
                    _res_block(sd, f"{b}.resnets.{j}", dtype, time_emb=False))
                j += 1
            if f"{b}.downsamplers.0.conv.weight" in sd:
                block["down"] = _conv(sd, f"{b}.downsamplers.0.conv", dtype)
            if f"{b}.upsamplers.0.conv.weight" in sd:
                block["up"] = _conv(sd, f"{b}.upsamplers.0.conv", dtype)
            out.append(block)
            bi += 1
        return out

    return {
        "enc": {
            "conv_in": _conv(sd, "encoder.conv_in", dtype),
            "down": blocks("encoder.down_blocks", "down"),
            "mid": {"res1": _res_block(sd, "encoder.mid_block.resnets.0", dtype,
                                       time_emb=False),
                    "attn": _vae_attn_params(sd, "encoder.mid_block.attentions.0",
                                             dtype),
                    "res2": _res_block(sd, "encoder.mid_block.resnets.1", dtype,
                                       time_emb=False)},
            "norm_out": _norm(sd, "encoder.conv_norm_out", dtype),
            "conv_out": _conv(sd, "encoder.conv_out", dtype),
            "quant": _conv(sd, "quant_conv", dtype),
        },
        "dec": {
            "post_quant": _conv(sd, "post_quant_conv", dtype),
            "conv_in": _conv(sd, "decoder.conv_in", dtype),
            "mid": {"res1": _res_block(sd, "decoder.mid_block.resnets.0", dtype,
                                       time_emb=False),
                    "attn": _vae_attn_params(sd, "decoder.mid_block.attentions.0",
                                             dtype),
                    "res2": _res_block(sd, "decoder.mid_block.resnets.1", dtype,
                                       time_emb=False)},
            "up": blocks("decoder.up_blocks", "up"),
            "norm_out": _norm(sd, "decoder.conv_norm_out", dtype),
            "conv_out": _conv(sd, "decoder.conv_out", dtype),
        },
    }


def convert_clip_text(sd: dict, dtype=jnp.float32) -> dict:
    sd = strip_prefix(sd, "text_model.")
    blocks = []
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        b = f"encoder.layers.{i}."
        blocks.append({
            "norm1": _norm(sd, b + "layer_norm1", dtype),
            "q": _lin(sd, b + "self_attn.q_proj", dtype),
            "k": _lin(sd, b + "self_attn.k_proj", dtype),
            "v": _lin(sd, b + "self_attn.v_proj", dtype),
            "out": _lin(sd, b + "self_attn.out_proj", dtype),
            "norm2": _norm(sd, b + "layer_norm2", dtype),
            "fc1": _lin(sd, b + "mlp.fc1", dtype),
            "fc2": _lin(sd, b + "mlp.fc2", dtype),
        })
        i += 1
    return {
        "token_embed": jnp.asarray(
            _np(sd["embeddings.token_embedding.weight"]), dtype),
        "pos_embed": jnp.asarray(
            _np(sd["embeddings.position_embedding.weight"]), dtype),
        "blocks": blocks,
        "final_norm": _norm(sd, "final_layer_norm", dtype),
    }


def convert_marigold(snapshot_dir: str, dtype=jnp.float32) -> dict:
    """Bingxin/Marigold diffusers snapshot -> param tree (computes the empty-
    prompt embedding at convert time, so the text tower isn't kept at runtime)."""
    import glob
    import os as _os

    def load_component(sub):
        for pat in ("diffusion_pytorch_model.bin", "pytorch_model.bin",
                    "*.bin"):
            matches = glob.glob(_os.path.join(snapshot_dir, sub, pat))
            if matches:
                return _load_torch_state_dict_file(matches[0])
        raise FileNotFoundError(f"no torch weights under {snapshot_dir}/{sub}")

    unet = convert_sd2_unet(load_component("unet"), dtype)
    vae = convert_sd_vae(load_component("vae"), dtype)
    text = convert_clip_text(load_component("text_encoder"), dtype)
    from prisma_tpu.models import marigold as jmar
    empty = jmar.empty_text_embed(text)
    return {"unet": unet, "vae": vae,
            "empty_text_embed": jnp.asarray(empty, dtype)}


def _load_torch_state_dict_file(path: str) -> dict:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


def convert_midas2(sd: dict, dtype=jnp.float32) -> dict:
    """torch.hub intel-isl/MiDaS 'MiDaS' (MidasNet v2.1) checkpoint.

    Layout: pretrained.layer1 = Sequential(conv1, bn1, relu, maxpool,
    resnext.layer1) and pretrained.layer{2,3,4} = resnext.layer{2,3,4}
    (midas/blocks.py _make_resnet_backbone); scratch.layerX_rn bias-free 3x3s,
    scratch.refinenetX.resConfUnit{1,2}, scratch.output_conv Sequential.
    """
    sd = strip_prefix(sd, "")
    stages = (3, 4, 23, 3)
    backbone = {"stem": _conv(sd, "pretrained.layer1.0", dtype),
                "stem_bn": _fold_bn(sd, "pretrained.layer1.1", dtype),
                "stages": []}
    for si, nblocks in enumerate(stages):
        prefix = "pretrained.layer1.4." if si == 0 else f"pretrained.layer{si + 1}."
        stage = []
        for bi in range(nblocks):
            k = f"{prefix}{bi}."
            block = {"conv1": _conv(sd, k + "conv1", dtype),
                     "bn1": _fold_bn(sd, k + "bn1", dtype),
                     "conv2": _conv(sd, k + "conv2", dtype),
                     "bn2": _fold_bn(sd, k + "bn2", dtype),
                     "conv3": _conv(sd, k + "conv3", dtype),
                     "bn3": _fold_bn(sd, k + "bn3", dtype)}
            if k + "downsample.0.weight" in sd:
                block["down"] = _conv(sd, k + "downsample.0", dtype)
                block["down_bn"] = _fold_bn(sd, k + "downsample.1", dtype)
            stage.append(block)
        backbone["stages"].append(stage)

    def rcu(key):
        return {"conv1": _conv(sd, key + ".conv1", dtype),
                "conv2": _conv(sd, key + ".conv2", dtype)}

    return {
        "backbone": backbone,
        "scratch": [_conv(sd, f"scratch.layer{i + 1}_rn", dtype)
                    for i in range(4)],
        "refinenet": [{"rcu1": rcu(f"scratch.refinenet{i + 1}.resConfUnit1"),
                       "rcu2": rcu(f"scratch.refinenet{i + 1}.resConfUnit2")}
                      for i in range(4)],
        "head0": _conv(sd, "scratch.output_conv.0", dtype),
        "head2": _conv(sd, "scratch.output_conv.2", dtype),
        "head4": _conv(sd, "scratch.output_conv.4", dtype),
    }
