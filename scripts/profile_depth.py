#!/usr/bin/env python3
"""depth_anything per-stage profile at the bench shape (vitl, batch 8, 1080p).

Splits the fused video step (bench.py / bench_all.bench_depth_anything) into
preproc resize / ViT blocks / DPT head / resize-back+heatmap so the next
optimization targets the real cost. Uses bench_all._device_bench (scan-chained
on-device timing with slope de-biasing) because bare host loops undercount
through the tunneled runtime. Run alone (one TPU owner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import depth_anything as da
from prisma_tpu.models import dpt, vit
from prisma_tpu.ops import encode as enc
from prisma_tpu.ops.resize import dpt_input_size, resize2d
from prisma_tpu.weights.store import cast_params


def ms(step, args, iters=5):
    """items_per_iter=1 -> returns iters/sec for one step; report ms."""
    rate = _device_bench(step, args, iters, 1)
    return 1e3 / rate


def main():
    encoder = "vitl"
    batch = 8
    cfg = vit.VIT_CONFIGS[encoder]
    params = jax.device_put(cast_params(
        da.init_params(jax.random.key(0), encoder), jnp.bfloat16))
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(
        0, 255, size=(batch, 1080, 1920, 3)).astype(np.uint8))

    H, W = 1080, 1920
    w2, h2 = dpt_input_size(W, H, target=518)
    ph, pw = h2 // cfg.patch_size, w2 // cfg.patch_size
    print(f"model input {h2}x{w2}, patch grid {ph}x{pw} = {ph*pw} tokens")

    # full step (cross-check vs BENCHMARKS 376 ms)
    def full(params, frames):
        return da.infer_video_batch(params, frames, encoder=encoder,
                                    compute_dtype=jnp.bfloat16)
    t_full = ms(full, (params, frames))
    print(f"full step:        {t_full:7.1f} ms  ({batch/t_full*1e3:.1f} fps)")

    # stage 1: preproc (u8 -> cubic resize -> normalize)
    def pre(frames):
        img = frames.astype(jnp.bfloat16) / 255.0
        img = resize2d(img, (h2, w2), method="cubic", align_corners=False)
        mean = jnp.asarray(da.IMAGENET_MEAN, jnp.bfloat16)
        std = jnp.asarray(da.IMAGENET_STD, jnp.bfloat16)
        return (img - mean) / std
    t_pre = ms(pre, (frames.astype(jnp.float32),))  # float carry for chaining
    print(f"preproc resize:   {t_pre:7.1f} ms")

    img = jax.device_put(np.asarray(pre(frames), dtype=np.float32)
                         .astype(jnp.bfloat16))

    # stage 2: ViT trunk
    def trunk(img, params):
        feats = vit.get_intermediate_layers(params["vit"], img, cfg, n=4)
        return feats[0][0]
    t_vit = ms(trunk, (img, params))
    print(f"vit trunk (24L):  {t_vit:7.1f} ms")

    # stage 2b: ViT attention vs mlp split — attention replaced by identity
    real_attn = vit.pnn.attention
    vit.pnn.attention = lambda p, x, h, precision=None: x
    try:
        t_noattn = ms(trunk, (img, params))
    finally:
        vit.pnn.attention = real_attn
    print(f"  w/o attention:  {t_noattn:7.1f} ms  (attn = {t_vit-t_noattn:.1f})")

    # stage 3: DPT head
    feats = [(jax.device_put(rng.normal(size=(batch, ph * pw, cfg.embed_dim))
                             .astype(jnp.bfloat16)),
              jax.device_put(rng.normal(size=(batch, cfg.embed_dim))
                             .astype(jnp.bfloat16))) for _ in range(4)]

    def head(t0, params):
        fs = [(t0, feats[0][1])] + feats[1:]
        return dpt.dpt_head(params["dpt"], fs, ph, pw)
    t_dpt = ms(head, (feats[0][0], params))
    print(f"dpt head:         {t_dpt:7.1f} ms")

    # dpt internals: reassemble+scratch / refinenet ladder / output convs
    dp = params["dpt"]

    def reassemble(t0, params):
        fs = [(t0, feats[0][1])] + feats[1:]
        maps = []
        for i, (tokens, _cls) in enumerate(fs):
            x = tokens.reshape(batch, ph, pw, cfg.embed_dim)
            x = dpt.pnn.conv2d(params["dpt"]["projects"][i], x)
            if i == 0:
                x = dpt.pnn.conv_transpose_blocky(params["dpt"]["resize0"], x)
            elif i == 1:
                x = dpt.pnn.conv_transpose_blocky(params["dpt"]["resize1"], x)
            elif i == 3:
                x = dpt.pnn.conv2d(params["dpt"]["resize3"], x, stride=2,
                                   padding=1)
            maps.append(dpt.pnn.conv2d(params["dpt"]["scratch"][i], x,
                                       padding=1))
        return maps[0]
    t_re = ms(reassemble, (feats[0][0], params))
    print(f"  reassemble:     {t_re:7.1f} ms")

    l1s = (batch, ph * 4, pw * 4, 256)
    l1 = jax.device_put(rng.normal(size=l1s).astype(jnp.bfloat16))

    def refinenet1(l1, params):
        return dpt._fusion(params["dpt"]["refinenet"][0], l1, l1)
    t_r1 = ms(refinenet1, (l1, params))
    print(f"  refinenet1 (4x):{t_r1:7.1f} ms  (largest of 4 ladder stages)")

    p1 = jax.device_put(rng.normal(size=(batch, ph * 8, pw * 8, 256))
                        .astype(jnp.bfloat16))

    def outconvs(p1, params):
        out = dpt.pnn.conv2d(params["dpt"]["output_conv1"], p1, padding=1)
        out = resize2d(out, (ph * 14, pw * 14), method="linear",
                       align_corners=True)
        out = dpt.pnn.conv2d(params["dpt"]["output_conv2_0"], out, padding=1)
        out = dpt.pnn.conv2d(params["dpt"]["output_conv2_2"],
                             jax.nn.relu(out))
        return out
    t_oc = ms(outconvs, (p1, params))
    print(f"  output convs:   {t_oc:7.1f} ms  (conv1@8x + 14x resize + head)")

    # stage 4: model-res depth -> 1080p + heatmap epilogue
    depth = jax.device_put(rng.normal(size=(batch, ph * 14, pw * 14))
                           .astype(np.float32).astype(jnp.bfloat16))

    def post(depth):
        d = resize2d(depth[..., None], (H, W), method="linear",
                     align_corners=False)[..., 0].astype(jnp.float32)
        dmin = jnp.min(d, axis=(1, 2))
        dmax = jnp.max(d, axis=(1, 2))
        norm = 1.0 - (d - dmin[:, None, None]) / (dmax - dmin)[:, None, None]
        rgb = jnp.floor(enc.heat_to_rgb(norm) * 255.0).astype(jnp.uint8)
        return rgb.astype(jnp.float32)  # float leaf for the chain
    t_post = ms(post, (depth,))
    print(f"resize+heatmap:   {t_post:7.1f} ms")

    acc = t_pre + t_vit + t_dpt + t_post
    print(f"sum of stages:    {acc:7.1f} ms  (full {t_full:.1f})")


if __name__ == "__main__":
    main()
