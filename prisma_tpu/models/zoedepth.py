"""ZoeDepth metric-depth head family, TPU-native.

Parity target: the reference's vendored ZoeDepth
(`bands/patchfusion/zoedepth/models/zoedepth/zoedepth_v1.py`, layers in
`models/layers/{localbins_layers,attractor,dist_layers}.py`, config
`config_zoedepth.json`): bottleneck conv -> seed bin regressor -> chain of
4 attractor layers refining bin centers over decoder features -> conditional
log-binomial probability over bins -> expected depth sum(p * c).

Used by: metric depth_anything (DepthAnythingCore = DINOv2 DPT with feature
hooks, `base_models/depth_anything.py`), depth_zoedepth (MiDaS BEiT core) and
PatchFusion. Everything here is 1x1 convs, elementwise math and bilinear
(align_corners=True) resizes — XLA fuses the whole head into the core's graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from prisma_tpu.ops import nn as pnn
from prisma_tpu.ops.resize import dpt_input_size, resize2d


@dataclass(frozen=True)
class ZoeDepthConfig:
    """Defaults = vendored config_zoedepth.json (softplus/inv/mean variant)."""
    n_bins: int = 64
    bin_embedding_dim: int = 128
    bin_centers_type: str = "softplus"   # or "normed"
    n_attractors: tuple = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = "mean"         # "mean" | "sum"
    attractor_type: str = "inv"          # "inv" | "exp"
    min_depth: float = 1e-3
    max_depth: float = 10.0
    min_temp: float = 0.0212
    max_temp: float = 50.0
    midas_out_channels: int = 32         # N_MIDAS_OUT


def _mlp2(p, x, act=None, precision=None):
    """Conv1x1 -> ReLU -> Conv1x1 -> (act) — the layers' shared _net shape."""
    y = jax.nn.relu(pnn.conv2d(p["fc1"], x, precision=precision))
    y = pnn.conv2d(p["fc2"], y, precision=precision)
    return act(y) if act is not None else y


def seed_bin_regressor(p, x, cfg: ZoeDepthConfig, precision=None):
    """-> (b_prev for the attractor chain, seed bin centers)."""
    if cfg.bin_centers_type == "softplus":
        centers = _mlp2(p, x, jax.nn.softplus, precision)
        return centers, centers
    # normed: relu + eps -> widths normalized -> cumulative edges -> centers
    B = jax.nn.relu(_mlp2(p, x, None, precision)) + 1e-3
    widths_normed = B / jnp.sum(B, axis=-1, keepdims=True)
    widths = (cfg.max_depth - cfg.min_depth) * widths_normed
    edges = jnp.cumsum(jnp.pad(widths, ((0, 0),) * 3 + ((1, 0),),
                               constant_values=cfg.min_depth), axis=-1)
    centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
    b_prev = (centers - cfg.min_depth) / (cfg.max_depth - cfg.min_depth)
    return b_prev, centers


def _attract(dx, cfg: ZoeDepthConfig):
    # Reference quirk (attractor.py:117-127): forward calls exp_/inv_attractor
    # WITHOUT the configured alpha/gamma, so the jit-script defaults
    # (alpha=300, gamma=2) always apply and config values are dead weight.
    alpha, gamma = 300.0, 2
    if cfg.attractor_type == "exp":
        return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx
    return dx / (1 + alpha * dx ** gamma)


def attractor_layer(p, x, b_prev, prev_b_embedding, cfg: ZoeDepthConfig,
                    precision=None):
    """One attractor refinement (NHWC; bins on the channel axis).

    Returns (b_new for the next layer, metric bin centers at this scale).
    """
    hw = x.shape[1:3]
    if prev_b_embedding is not None:
        prev_b_embedding = resize2d(prev_b_embedding, hw, method="linear",
                                    align_corners=True)
        x = x + prev_b_embedding

    b_prev = resize2d(b_prev, hw, method="linear", align_corners=True)

    if cfg.bin_centers_type == "softplus":
        A = _mlp2(p, x, jax.nn.softplus, precision)  # [B, H, W, n_attractors]
        dx = A[..., None, :] - b_prev[..., :, None]  # [B, H, W, bins, attr]
        delta = jnp.sum(_attract(dx, cfg), axis=-1)
        if cfg.attractor_kind == "mean":
            delta = delta / A.shape[-1]
        b_new = b_prev + delta
        return b_new, b_new
    # normed variant: 2x channels, linear-normalized attractor points
    A = jax.nn.relu(_mlp2(p, x, None, precision)) + 1e-3
    n_attr = A.shape[-1] // 2
    A = A.reshape(*A.shape[:-1], n_attr, 2)
    A_normed = A[..., 0]  # reference quirk: normalization computed but unused
    dx = A_normed[..., None, :] - b_prev[..., :, None]
    delta = jnp.sum(_attract(dx, cfg), axis=-1)
    if cfg.attractor_kind == "mean":
        delta = delta / n_attr
    b_new = b_prev + delta
    centers = (cfg.max_depth - cfg.min_depth) * b_new + cfg.min_depth
    centers = jnp.clip(jnp.sort(centers, axis=-1), cfg.min_depth, cfg.max_depth)
    return b_new, centers


def _log_binom(n, k, eps=1e-7):
    # The reference computes (n-k)*log(n-k+eps); with n == max(k) the +eps can
    # be reassociated away by XLA constant folding, yielding 0 * log(0) = NaN.
    # Clamp through jnp.maximum (an optimization barrier) — at n == k the term
    # is eps*log(eps) ~ -1.6e-6 vs the reference's exact 0.
    n = n + eps
    k = k + eps
    nk = jnp.maximum(n - k, eps)
    return n * jnp.log(n) - k * jnp.log(k) - nk * jnp.log(nk)


def conditional_log_binomial(p, x, cond, cfg: ZoeDepthConfig, precision=None):
    """[B, H, W, Cx] main + [B, H, W, Cc] condition -> probs [B, H, W, n_bins]."""
    pt = pnn.conv2d(p["fc1"], jnp.concatenate([x, cond], axis=-1),
                    precision=precision)
    pt = pnn.conv2d(p["fc2"], pnn.gelu(pt), precision=precision)
    pt = jax.nn.softplus(pt)
    prob = pt[..., :2] + 1e-4
    temp = pt[..., 2:] + 1e-4
    prob = prob[..., 0] / (prob[..., 0] + prob[..., 1])
    temp = temp[..., 0] / (temp[..., 0] + temp[..., 1])
    # ZoeDepth passes its own min_temp into ConditionalLogBinomial
    # (zoedepth_v1.py:123-125)
    temp = (cfg.max_temp - cfg.min_temp) * temp + cfg.min_temp

    K = cfg.n_bins
    k_idx = jnp.arange(K, dtype=x.dtype)
    prob = jnp.clip(prob, 1e-4, 1.0)[..., None]
    one_minus = jnp.clip(1 - prob, 1e-4, 1.0)
    y = (_log_binom(jnp.asarray(K - 1, x.dtype), k_idx)
         + k_idx * jnp.log(prob) + (K - 1 - k_idx) * jnp.log(one_minus))
    return jax.nn.softmax(y / temp[..., None], axis=-1)


def bins_head(params, rel_depth, core_feats, cfg: ZoeDepthConfig = ZoeDepthConfig(),
              precision=None):
    """ZoeDepth metric head over core features.

    core_feats: dict with out_conv [B,.,.,32], l4_rn, r4, r3, r2, r1 (NHWC).
    Returns metric depth [B, H', W'] at the out_conv resolution.

    The bins head ALWAYS runs in f32 (log-binomial/attractor math underflows
    in bf16); callers pass f32 features and the params are cast here so a
    bf16-cast checkpoint still works.
    """
    params = jax.tree.map(
        lambda l: l.astype(jnp.float32)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        else l, params)
    btlnck = pnn.conv2d(params["conv2"], core_feats["l4_rn"], precision=precision)
    b_prev, _seed_centers = seed_bin_regressor(params["seed_bin_regressor"],
                                               btlnck, cfg, precision)
    prev_b_embedding = _mlp2(params["seed_projector"], btlnck, None, precision)

    b_centers = None
    b_embedding = prev_b_embedding
    for proj, attr, feat_name in zip(params["projectors"], params["attractors"],
                                     ("r4", "r3", "r2", "r1")):
        b_embedding = _mlp2(proj, core_feats[feat_name], None, precision)
        b_prev, b_centers = attractor_layer(attr, b_embedding, b_prev,
                                            prev_b_embedding, cfg, precision)
        prev_b_embedding = b_embedding

    last = core_feats["out_conv"]
    rel_cond = resize2d(rel_depth[..., None], last.shape[1:3], method="linear",
                        align_corners=True)
    last = jnp.concatenate([last, rel_cond], axis=-1)
    b_embedding = resize2d(b_embedding, last.shape[1:3], method="linear",
                           align_corners=True)
    probs = conditional_log_binomial(params["conditional_log_binomial"], last,
                                     b_embedding, cfg, precision)
    b_centers = resize2d(b_centers, probs.shape[1:3], method="linear",
                         align_corners=True)
    return jnp.sum(probs * b_centers, axis=-1)


# ---------------------------------------------------------------------------
# Metric Depth-Anything (ZoeDepth over the DINOv2 DPT core)
# ---------------------------------------------------------------------------

def metric_depth_anything_infer(params, frames_u8, encoder: str = "vitl",
                                cfg: ZoeDepthConfig = ZoeDepthConfig(),
                                img_size=(392, 518), precision=None,
                                compute_dtype=jnp.float32):
    """Full metric pipeline (bands/depth_anything.py:106-119 + DepthAnythingCore):
    ToTensor -> ImageNet normalize -> resize to config img_size (keep_ar False,
    'minimal', multiple of 14) -> DPT core with feature hooks -> bins head ->
    PIL-style bicubic resize back. frames_u8 [B, H, W, 3] -> depth [B, H, W].
    """
    from prisma_tpu.models import depth_anything as da
    from prisma_tpu.models import dpt as pdpt
    from prisma_tpu.models import vit as pvit

    B, H, W, _ = frames_u8.shape
    h2, w2 = img_size
    img = frames_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(da.IMAGENET_MEAN)
    std = jnp.asarray(da.IMAGENET_STD)
    img = (img - mean) / std
    # PrepForMidas resize: bilinear align_corners=True (depth_anything.py:174);
    # normalize/resize order commutes (per-channel affine vs linear filter)
    img = resize2d(img, (h2, w2), method="linear",
                   align_corners=True).astype(compute_dtype)

    vcfg = pvit.VIT_CONFIGS[encoder]
    ph, pw = h2 // vcfg.patch_size, w2 // vcfg.patch_size
    feats = pvit.get_intermediate_layers(params["core"]["vit"], img, vcfg, n=4,
                                         precision=precision)
    rel_depth, core_feats = pdpt.dpt_head(params["core"]["dpt"], feats, ph, pw,
                                          precision=precision,
                                          return_features=True)
    depth = bins_head(params["head"], rel_depth.astype(jnp.float32),
                      {k: v.astype(jnp.float32) for k, v in core_feats.items()},
                      cfg, precision)
    # driver resizes back with PIL default resample = antialiased bicubic
    # (depth_anything.py:117-119)
    return resize2d(depth[..., None], (H, W), method="cubic_aa")[..., 0]


def init_head_params(rng, core_channels: int = 256,
                     cfg: ZoeDepthConfig = ZoeDepthConfig(), dtype=jnp.float32):
    """Random-init bins head (tests / smoke runs)."""
    rngs = iter(jax.random.split(rng, 32))

    def conv(cin, cout):
        return {"w": (jax.random.normal(next(rngs), (1, 1, cin, cout))
                      * (cin ** -0.5)).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    def mlp2(cin, mid, cout):
        return {"fc1": conv(cin, mid), "fc2": conv(mid, cout)}

    e = cfg.bin_embedding_dim
    return {
        "conv2": conv(core_channels, core_channels),
        "seed_bin_regressor": mlp2(core_channels, 256, cfg.n_bins),
        "seed_projector": mlp2(core_channels, 128, e),
        "projectors": [mlp2(core_channels, 128, e) for _ in range(4)],
        "attractors": [mlp2(e, 128, n) for n in cfg.n_attractors],
        "conditional_log_binomial": mlp2(
            cfg.midas_out_channels + 1 + e,
            (cfg.midas_out_channels + 1 + e) // 2, 4),
    }
