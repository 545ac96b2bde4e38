"""Marigold diffusion depth (SD2 UNet + VAE + DDIM + ensembling), TPU-native.

Parity target: the vendored pipeline (`bands/marigold/marigold_pipeline.py`):
- resize max edge to 768 (PIL), RGB in [0, 1] (vendored quirk: no [-1, 1]
  scaling), VAE-encode x 0.18215;
- per ensemble member: random depth latent, DDIM loop
  unet(cat[rgb_latent, depth_latent], t, empty-text embedding), 10 steps;
- VAE-decode, mean of 3 channels, clip [-1, 1] -> [0, 1];
- scale/shift ensembling via scipy BFGS (max_iter 2) + median + MAD
  (`marigold/util/ensemble.py:41-133`).

TPU design: ensemble members ride the batch axis through ONE jitted scan over
the DDIM steps (the reference loops steps and batches in Python); the
scale/shift ensembling runs as ONE jitted on-device BFGS solve
(`ensemble_depths_device`, jax.scipy.optimize) — the reference drives a
device closure from host scipy with numeric gradients (~70 full-map evals,
measured 6.6 s/frame of the 7.9 s round-2 total when replicated on host);
the host replica (`ensemble_depths`) is kept as the parity oracle.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import sd2
from prisma_tpu.ops import nn as pnn

RGB_LATENT_SCALE = 0.18215
DEPTH_LATENT_SCALE = 0.18215


# ---------------------------------------------------------------------------
# CLIP text encoder (OpenCLIP-H text tower, SD2 penultimate: 23 layers)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CLIPTextConfig:
    vocab: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 23
    max_len: int = 77
    bos: int = 49406
    eos: int = 49407


def clip_text_forward(params, token_ids, cfg: CLIPTextConfig = CLIPTextConfig(),
                      precision=None):
    """token_ids [B, L] -> hidden states [B, L, width] (final LN applied)."""
    B, L = token_ids.shape
    x = params["token_embed"][token_ids] + params["pos_embed"][:L]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, x.dtype), k=1)
    for bp in params["blocks"]:
        h = pnn.layer_norm(bp["norm1"], x, eps=1e-5)
        q = pnn.linear(bp["q"], h, precision=precision)
        k = pnn.linear(bp["k"], h, precision=precision)
        v = pnn.linear(bp["v"], h, precision=precision)
        d = cfg.width // cfg.heads
        q = q.reshape(B, L, cfg.heads, d)
        k = k.reshape(B, L, cfg.heads, d)
        v = v.reshape(B, L, cfg.heads, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d ** -0.5), k,
                          precision=precision) + mask
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                       precision=precision).reshape(B, L, cfg.width)
        x = x + pnn.linear(bp["out"], o, precision=precision)
        h = pnn.layer_norm(bp["norm2"], x, eps=1e-5)
        h = pnn.linear(bp["fc1"], h, precision=precision)
        h = h * jax.nn.sigmoid(1.702 * h)  # CLIP quick_gelu
        x = x + pnn.linear(bp["fc2"], h, precision=precision)
    return pnn.layer_norm(params["final_norm"], x, eps=1e-5)


def empty_text_embed(params, cfg: CLIPTextConfig = CLIPTextConfig()):
    """Embedding of the empty prompt, tokenized without padding: [BOS, EOS]."""
    ids = jnp.asarray([[cfg.bos, cfg.eos]], jnp.int32)
    return clip_text_forward(params, ids, cfg)


# ---------------------------------------------------------------------------
# DDIM scheduler (diffusers semantics, eta=0)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    steps_offset: int = 1
    prediction_type: str = "v_prediction"  # Marigold is SD2 (v-pred) derived


def ddim_alphas(cfg: DDIMConfig = DDIMConfig()) -> np.ndarray:
    betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                        cfg.num_train_timesteps) ** 2
    return np.cumprod(1.0 - betas)


def ddim_timesteps(num_steps: int, cfg: DDIMConfig = DDIMConfig()) -> np.ndarray:
    ratio = cfg.num_train_timesteps // num_steps
    return (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64) \
        + cfg.steps_offset


def ddim_step(model_out, t, t_prev, sample, alphas_cumprod,
              cfg: DDIMConfig = DDIMConfig()):
    """One deterministic DDIM step (scheduler.step with eta=0)."""
    a_t = alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0, alphas_cumprod[jnp.maximum(t_prev, 0)],
                      alphas_cumprod[0])
    sqrt_at = jnp.sqrt(a_t)
    sqrt_1mat = jnp.sqrt(1.0 - a_t)
    if cfg.prediction_type == "v_prediction":
        x0 = sqrt_at * sample - sqrt_1mat * model_out
        eps = sqrt_at * model_out + sqrt_1mat * sample
    else:  # epsilon
        x0 = (sample - sqrt_1mat * model_out) / sqrt_at
        eps = model_out
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

def resize_max_res_size(w: int, h: int, max_edge: int = 768):
    """PIL resize_max_res (marigold/util/image_util.py): scale by max edge,
    int() truncation of the new dims."""
    scale = min(max_edge / w, max_edge / h)
    return int(w * scale), int(h * scale)


def single_infer(params, rgb01, rng=None, num_steps: int = 10,
                 unet_cfg: sd2.UNetConfig = sd2.UNetConfig(),
                 ddim_cfg: DDIMConfig = DDIMConfig(), precision=None,
                 depth_latent=None):
    """rgb01 [B, H, W, 3] in [0,1] (H, W multiples of 8) -> depth [B, H, W] in [0,1].

    One jitted lax.scan over the DDIM steps; B is the ensemble batch.
    depth_latent [B, H/8, W/8, 4] may be pre-generated (so member values do
    not depend on mesh padding); otherwise it is drawn from rng.

    When rgb01 has batch 1 but depth_latent has batch B, the RGB latent is
    VAE-encoded ONCE and broadcast over the ensemble — every member sees the
    identical conditioning image, so encoding it per member (as the round-2
    pipeline did) was 10x redundant VAE-encoder compute per frame.
    """
    rgb_latent = sd2.vae_encode(params["vae"], rgb01,
                                precision=precision) * RGB_LATENT_SCALE
    if depth_latent is None:
        # per-member fold_in keys: member i draws the same latent whether or
        # not the batch was padded/sharded over a mesh
        B = rgb_latent.shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(B))
        depth_latent = jax.vmap(
            lambda k: jax.random.normal(k, rgb_latent.shape[1:], jnp.float32)
        )(keys).astype(rgb_latent.dtype)
    else:
        depth_latent = depth_latent.astype(rgb_latent.dtype)
        if rgb_latent.shape[0] == 1 and depth_latent.shape[0] > 1:
            rgb_latent = jnp.broadcast_to(
                rgb_latent, depth_latent.shape[:1] + rgb_latent.shape[1:])
    context = jnp.broadcast_to(params["empty_text_embed"],
                               (rgb_latent.shape[0],)
                               + params["empty_text_embed"].shape[1:])

    alphas = jnp.asarray(ddim_alphas(ddim_cfg), rgb_latent.dtype)
    ts = ddim_timesteps(num_steps, ddim_cfg)
    ts_prev = np.concatenate([ts[1:], [-1]])  # t - ratio; last -> final alpha
    ts = jnp.asarray(ts)
    ts_prev = jnp.asarray(ts_prev)

    def step(depth_latent, tt):
        t, t_prev = tt
        unet_in = jnp.concatenate([rgb_latent, depth_latent], axis=-1)
        tb = jnp.full((unet_in.shape[0],), t, jnp.int32)
        noise_pred = sd2.unet_forward(params["unet"], unet_in, tb, context,
                                      unet_cfg, precision)
        return ddim_step(noise_pred, t, t_prev, depth_latent, alphas,
                         ddim_cfg), None

    depth_latent, _ = jax.lax.scan(step, depth_latent, (ts, ts_prev))

    stacked = sd2.vae_decode(params["vae"], depth_latent / DEPTH_LATENT_SCALE,
                             precision=precision)
    depth = jnp.mean(stacked, axis=-1)
    depth = jnp.clip(depth, -1.0, 1.0)
    return (depth + 1.0) / 2.0


def ensemble_depths(depth_preds: np.ndarray, regularizer_strength: float = 0.02,
                    max_iter: int = 2, tol: float = 1e-3):
    """Scale/shift alignment + median reduction (reference ensemble.py:41-133)."""
    from scipy.optimize import minimize

    n = depth_preds.shape[0]
    flat = depth_preds.reshape(n, -1)
    _min = flat.min(axis=1)
    _max = flat.max(axis=1)
    s_init = 1.0 / (_max - _min)
    t_init = -s_init * _min
    x0 = np.concatenate([s_init, t_init]).astype(np.float32)

    def closure(x):
        s = x[:n].reshape(-1, 1, 1)
        t = x[n:].reshape(-1, 1, 1)
        transformed = depth_preds * s + t
        dists = []
        for i in range(n):
            for j in range(i + 1, n):
                dists.append(transformed[i] - transformed[j])
        sqrt_dist = np.sqrt(np.mean(np.square(np.stack(dists)))) if dists else 0.0
        pred = np.median(transformed, axis=0)
        near_err = np.sqrt((0 - pred.min()) ** 2)
        far_err = np.sqrt((1 - pred.max()) ** 2)
        return np.float32(sqrt_dist
                          + (near_err + far_err) * regularizer_strength)

    res = minimize(closure, x0, method="BFGS", tol=tol,
                   options={"maxiter": max_iter, "disp": False})
    s = res.x[:n].reshape(-1, 1, 1)
    t = res.x[n:].reshape(-1, 1, 1)
    transformed = depth_preds * s + t
    aligned = np.median(transformed, axis=0)
    mad = np.median(np.abs(transformed - aligned), axis=0)
    _mn, _mx = aligned.min(), aligned.max()
    aligned = (aligned - _mn) / (_mx - _mn)
    mad = mad / (_mx - _mn)
    return aligned, mad


def _ensemble_objective(x, preds, regularizer_strength):
    """Reference ensemble.py:78-101 closure: RMS of pairwise distances of the
    affine-transformed members + near/far regularizers on the median map.
    |.| instead of sqrt((.)^2): same value, finite gradient at 0 (the init
    scaling puts every member's min exactly at 0)."""
    n = preds.shape[0]
    s = x[:n, None, None]
    t = x[n:, None, None]
    transformed = preds * s + t
    ii, jj = np.triu_indices(n, k=1)
    dists = transformed[ii] - transformed[jj]
    sqrt_dist = jnp.sqrt(jnp.mean(jnp.square(dists)))
    pred = jnp.median(transformed, axis=0)
    near_err = jnp.abs(0.0 - pred.min())
    far_err = jnp.abs(1.0 - pred.max())
    return sqrt_dist + (near_err + far_err) * regularizer_strength


@functools.lru_cache(maxsize=None)
def _ensemble_solver(n, regularizer_strength, max_iter, tol):
    from jax.scipy.optimize import minimize

    def solve(preds):
        flat = preds.reshape(n, -1)
        _min = flat.min(axis=1)
        _max = flat.max(axis=1)
        s0 = 1.0 / (_max - _min)
        x0 = jnp.concatenate([s0, -s0 * _min])
        res = minimize(
            functools.partial(_ensemble_objective, preds=preds,
                              regularizer_strength=regularizer_strength),
            x0, method="BFGS", tol=tol, options={"maxiter": max_iter})
        s = res.x[:n, None, None]
        t = res.x[n:, None, None]
        transformed = preds * s + t
        aligned = jnp.median(transformed, axis=0)
        mad = jnp.median(jnp.abs(transformed - aligned), axis=0)
        mn, mx = aligned.min(), aligned.max()
        return (aligned - mn) / (mx - mn), mad / (mx - mn)

    return jax.jit(solve)


@functools.lru_cache(maxsize=None)
def _epilogue_fn(out_hw):
    """min/max rescale + antialiased-bicubic resize to the input resolution
    (marigold_pipeline.py:226-233), jitted so the aligned map never makes a
    host round trip before the one final fetch."""
    from prisma_tpu.ops.resize import resize2d

    def ep(aligned):
        mn, mx = aligned.min(), aligned.max()
        d = (aligned - mn) / (mx - mn)
        r = resize2d(d[None, :, :, None], out_hw,
                     method="cubic_aa")[0, :, :, 0]
        return mn + r * (mx - mn)

    return jax.jit(ep)


def ensemble_depths_device(depth_preds, regularizer_strength: float = 0.02,
                           max_iter: int = 2, tol: float = 1e-3):
    """On-device scale/shift ensembling — the production path.

    Same objective/reduction as `ensemble_depths` (reference
    ensemble.py:41-133) but solved as ONE jitted BFGS (analytic gradients via
    autodiff) instead of host scipy numeric-gradient BFGS driving ~70
    full-resolution closure evaluations. The two solvers take slightly
    different 2-iteration trajectories, so aligned maps agree only to ~1e-2
    after renormalization (tests/test_marigold.py pins the bound); the host
    version stays as the byte-parity oracle vs the reference.
    """
    n = int(depth_preds.shape[0])
    aligned, mad = _ensemble_solver(
        n, float(regularizer_strength), int(max_iter),
        float(tol))(jnp.asarray(depth_preds, jnp.float32))
    return np.asarray(aligned), np.asarray(mad)


@functools.lru_cache(maxsize=None)
def _infer_fn(num_steps, unet_cfg, precision):
    """Jitted DDIM-scan pipeline, cached by static config so video drivers do
    not re-trace per frame."""
    return jax.jit(functools.partial(single_infer, num_steps=num_steps,
                                     unet_cfg=unet_cfg, precision=precision))


def infer(params, frame_u8: np.ndarray, denoising_steps: int = 10,
          ensemble_size: int = 10, processing_res: int = 768, seed: int = 0,
          unet_cfg: sd2.UNetConfig = sd2.UNetConfig(),
          precision=None, compute_dtype=jnp.float32) -> np.ndarray:
    """Full pipeline on one frame [H, W, 3] uint8 -> depth [H, W] (relative,
    the pipeline's min..max-rescaled output).

    On a multi-chip mesh the ensemble members are edge-padded to the mesh
    size and sharded over the `data` axis (SURVEY.md §2.10: ensemble members
    across chips). Member latents are pre-generated at the true ensemble size
    so results are identical at any device count.
    """
    from prisma_tpu.ops.resize import resize2d
    from prisma_tpu.parallel import data_mesh_or_none, shard_batch_padded

    H, W = frame_u8.shape[:2]
    if processing_res > 0:
        w2, h2 = resize_max_res_size(W, H, processing_res)
    else:
        w2, h2 = W, H
    # the VAE needs /8 dims; the reference relies on PIL sizes already being
    # encodable (768-max edges) — we round down to the nearest multiple of 8
    w2, h2 = max(8, w2 - w2 % 8), max(8, h2 - h2 % 8)

    # upload u8 (4x less H2D than host-converted f32), normalize on device
    rgb = jnp.asarray(frame_u8).astype(jnp.float32)[None] / 255.0
    # reference resize_max_res uses PIL Image.resize default = antialiased
    # bicubic (marigold/util/image_util.py:98)
    rgb = resize2d(rgb, (h2, w2), method="cubic_aa").astype(compute_dtype)

    # member latents at the TRUE ensemble size (identical values at any
    # device count / padding), padded+sharded over the mesh; the rgb frame
    # stays batch-1 and is VAE-encoded once inside the jitted pipeline
    rng = jax.random.key(seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
        jnp.arange(ensemble_size))
    # latent spatial factor = one VAE downsample per level transition (tiny
    # test configs have fewer than the production 8x)
    ds = 2 ** (len(params["vae"]["enc"]["down"]) - 1)
    lat_ch = params["vae"]["dec"]["post_quant"]["w"].shape[2]
    depth_latent = jax.vmap(
        lambda k: jax.random.normal(k, (h2 // ds, w2 // ds, lat_ch),
                                    jnp.float32))(keys)

    mesh = data_mesh_or_none()
    if mesh is not None:
        depth_latent, _ = shard_batch_padded(depth_latent, mesh)

    run = _infer_fn(denoising_steps, unet_cfg, precision)
    if mesh is None:
        # single-chip: keep the whole epilogue device-resident — preds never
        # leave the device (the old path fetched all N maps, re-uploaded them
        # for the BFGS, fetched the aligned map and re-uploaded it for the
        # final resize: ~3 round trips of ~15 MB through the tunnel per frame)
        preds = run(params, rgb, None,
                    depth_latent=depth_latent)[:ensemble_size]
        preds = preds.astype(jnp.float32)
        if ensemble_size > 1:
            aligned, _mad = _ensemble_solver(
                ensemble_size, 0.02, 2, 1e-3)(preds)
        else:
            aligned = preds[0]
        return np.asarray(_epilogue_fn((H, W))(aligned), dtype=np.float32)

    # mesh path: gather the (padded) member batch to host before re-invoking
    # device code — back-to-back SPMD executables with compiled collectives
    # deadlock the XLA:CPU in-process rendezvous (see patchfusion.infer)
    preds = np.asarray(run(params, rgb, None, depth_latent=depth_latent),
                       dtype=np.float32)[:ensemble_size]

    if ensemble_size > 1:
        depth, _uncert = ensemble_depths_device(preds)
    else:
        depth = preds[0]
    mn, mx = depth.min(), depth.max()
    depth = (depth - mn) / (mx - mn)
    # pred_img.resize(input_size) default = PIL antialiased bicubic
    # (marigold_pipeline.py:230)
    depth = np.asarray(resize2d(jnp.asarray(depth)[None, :, :, None], (H, W),
                                method="cubic_aa"))[0, :, :, 0]
    return mn + depth * (mx - mn)


# ---------------------------------------------------------------------------
# Random init (tests use tiny configs)
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, unet_cfg: sd2.UNetConfig = sd2.UNetConfig(),
                vae_cfg: sd2.VAEConfig = sd2.VAEConfig(),
                text_width: int = None, dtype=jnp.float32) -> dict:
    rngs = iter(jax.random.split(rng, 4096))
    ctx = unet_cfg.cross_attention_dim

    def conv(kh, kw, cin, cout):
        return {"w": (jax.random.normal(next(rngs), (kh, kw, cin, cout))
                      * ((kh * kw * cin) ** -0.5)).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    def lin(din, dout, bias=True):
        p = {"w": (jax.random.normal(next(rngs), (din, dout))
                   * (din ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    temb_dim = unet_cfg.block_channels[0] * 4

    def resnet(cin, cout):
        p = {"norm1": gn(cin), "conv1": conv(3, 3, cin, cout),
             "time_emb": lin(temb_dim, cout), "norm2": gn(cout),
             "conv2": conv(3, 3, cout, cout)}
        if cin != cout:
            p["shortcut"] = conv(1, 1, cin, cout)
        return p

    def xattn(dim, kv_dim):
        return {"q": lin(dim, dim, False), "k": lin(kv_dim, dim, False),
                "v": lin(kv_dim, dim, False), "out": lin(dim, dim)}

    def tblock(dim):
        return {"norm1": gn(dim), "attn1": xattn(dim, dim),
                "norm2": gn(dim), "attn2": xattn(dim, ctx),
                "norm3": gn(dim),
                "ff": {"proj": lin(dim, 8 * dim), "out": lin(4 * dim, dim)}}

    def spatial(dim):
        return {"norm": gn(dim), "proj_in": lin(dim, dim),
                "blocks": [tblock(dim)], "proj_out": lin(dim, dim)}

    bc = unet_cfg.block_channels
    down = []
    skip_chs = [bc[0]]  # conv_in output
    cin = bc[0]
    for bi, ch in enumerate(bc):
        block = {"resnets": [], }
        if bi < len(bc) - 1:
            block["attns"] = []
        for li in range(unet_cfg.layers_per_block):
            block["resnets"].append(resnet(cin if li == 0 else ch, ch))
            if "attns" in block:
                block["attns"].append(spatial(ch))
            skip_chs.append(ch)
        if bi < len(bc) - 1:
            block["down"] = conv(3, 3, ch, ch)
            skip_chs.append(ch)
        cin = ch
        down.append(block)

    up = []
    rb = list(reversed(bc))
    prev_ch = bc[-1]  # mid output
    for bi, ch in enumerate(rb):
        block = {"resnets": []}
        if bi > 0:
            block["attns"] = []
        for li in range(unet_cfg.layers_per_block + 1):
            skip_ch = skip_chs.pop()
            in_ch = (prev_ch if li == 0 else ch) + skip_ch
            block["resnets"].append(resnet(in_ch, ch))
            if "attns" in block:
                block["attns"].append(spatial(ch))
        if bi < len(rb) - 1:
            block["up"] = conv(3, 3, ch, ch)
        prev_ch = ch
        up.append(block)

    unet = {
        "time1": lin(bc[0], temb_dim), "time2": lin(temb_dim, temb_dim),
        "conv_in": conv(3, 3, unet_cfg.in_channels, bc[0]),
        "down": down,
        "mid": {"res1": resnet(bc[-1], bc[-1]), "attn": spatial(bc[-1]),
                "res2": resnet(bc[-1], bc[-1])},
        "up": up,
        "norm_out": gn(bc[0]),
        "conv_out": conv(3, 3, bc[0], unet_cfg.out_channels),
    }

    def vres(cin, cout):
        p = {"norm1": gn(cin), "conv1": conv(3, 3, cin, cout),
             "norm2": gn(cout), "conv2": conv(3, 3, cout, cout)}
        if cin != cout:
            p["shortcut"] = conv(1, 1, cin, cout)
        return p

    vc = vae_cfg.block_channels
    enc_down = []
    cin = vc[0]
    for bi, ch in enumerate(vc):
        block = {"resnets": [vres(cin if li == 0 else ch, ch)
                             for li in range(vae_cfg.layers_per_block)]}
        if bi < len(vc) - 1:
            block["down"] = conv(3, 3, ch, ch)
        enc_down.append(block)
        cin = ch

    dec_up = []
    rvc = list(reversed(vc))
    for bi, ch in enumerate(rvc):
        prev = rvc[max(bi - 1, 0)]
        block = {"resnets": [vres(prev if li == 0 else ch, ch)
                             for li in range(vae_cfg.layers_per_block + 1)]}
        if bi < len(rvc) - 1:
            block["up"] = conv(3, 3, ch, ch)
        dec_up.append(block)

    def vattn(ch):
        return {"norm": gn(ch), "q": lin(ch, ch), "k": lin(ch, ch),
                "v": lin(ch, ch), "out": lin(ch, ch)}

    lat = vae_cfg.latent_channels
    vae = {
        "enc": {
            "conv_in": conv(3, 3, 3, vc[0]),
            "down": enc_down,
            "mid": {"res1": vres(vc[-1], vc[-1]), "attn": vattn(vc[-1]),
                    "res2": vres(vc[-1], vc[-1])},
            "norm_out": gn(vc[-1]),
            "conv_out": conv(3, 3, vc[-1], 2 * lat),
            "quant": conv(1, 1, 2 * lat, 2 * lat),
        },
        "dec": {
            "post_quant": conv(1, 1, lat, lat),
            "conv_in": conv(3, 3, lat, vc[-1]),
            "mid": {"res1": vres(vc[-1], vc[-1]), "attn": vattn(vc[-1]),
                    "res2": vres(vc[-1], vc[-1])},
            "up": dec_up,
            "norm_out": gn(vc[0]),
            "conv_out": conv(3, 3, vc[0], 3),
        },
    }
    return {"unet": unet, "vae": vae,
            "empty_text_embed": jnp.zeros((1, 2, ctx), dtype)}
