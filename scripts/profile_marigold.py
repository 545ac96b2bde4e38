#!/usr/bin/env python3
"""Marigold per-stage profile at the production 10x10@768 config (VERDICT
round-2 item 6): splits VAE encode / UNet scan / VAE decode / host BFGS
ensembling so the s/frame number can be attributed. Run alone (one TPU owner).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import marigold as mg
from prisma_tpu.models import sd2
from prisma_tpu.weights.store import cast_params


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    params = jax.device_put(cast_params(
        mg.init_params(jax.random.key(0)), jnp.bfloat16))
    unet_cfg = sd2.UNetConfig()
    rng = np.random.default_rng(0)
    # production resize: 1080p -> max edge 768 => 768x432 (latent 96x54)
    h2, w2 = 432, 768
    ens = 10
    rgb = jax.device_put(rng.uniform(0, 1, (1, h2, w2, 3)).astype(jnp.bfloat16))
    lat = jax.device_put(rng.normal(size=(ens, h2 // 8, w2 // 8, 4))
                         .astype(np.float32))

    t_full = timeit(
        jax.jit(lambda p, r, l: mg.single_infer(p, r, num_steps=10,
                                                unet_cfg=unet_cfg,
                                                depth_latent=l)),
        params, rgb, lat)
    print(f"single_infer (10 steps x {ens}): {t_full*1e3:.0f} ms")

    @jax.jit
    def enc(p, r):
        return sd2.vae_encode(p["vae"], r)

    print(f"vae encode (B=1): {timeit(enc, params, rgb)*1e3:.1f} ms")

    latb = lat.astype(jnp.bfloat16)
    rgb_lat = jnp.broadcast_to(enc(params, rgb), latb.shape[:1] + latb.shape[1:])
    ctx = jnp.broadcast_to(params["empty_text_embed"],
                           (ens,) + params["empty_text_embed"].shape[1:])

    @jax.jit
    def unet1(p, rl, dl, c):
        x = jnp.concatenate([rl, dl], axis=-1)
        tb = jnp.full((x.shape[0],), 500, jnp.int32)
        return sd2.unet_forward(p["unet"], x, tb, c, unet_cfg)

    t_unet = timeit(unet1, params, rgb_lat, latb, ctx)
    print(f"unet eval (B={ens}): {t_unet*1e3:.1f} ms  x10 steps = "
          f"{t_unet*10*1e3:.0f} ms")

    @jax.jit
    def dec(p, l):
        return sd2.vae_decode(p["vae"], l / mg.DEPTH_LATENT_SCALE)

    print(f"vae decode (B={ens}): {timeit(dec, params, latb)*1e3:.1f} ms")

    preds = rng.uniform(0, 1, (ens, h2, w2)).astype(np.float32)
    t0 = time.perf_counter()
    mg.ensemble_depths(preds)
    print(f"host BFGS ensemble: {(time.perf_counter()-t0)*1e3:.0f} ms")

    mg.ensemble_depths_device(preds)  # warm (trace + compile)
    t0 = time.perf_counter()
    mg.ensemble_depths_device(preds)
    print(f"device BFGS ensemble: {(time.perf_counter()-t0)*1e3:.0f} ms")

    # the production path end-to-end (resize + infer + ensemble + resize back)
    frame = rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
    mg.infer(params, frame, denoising_steps=10, ensemble_size=ens,
             compute_dtype=jnp.bfloat16)  # warm
    t0 = time.perf_counter()
    mg.infer(params, frame, denoising_steps=10, ensemble_size=ens,
             compute_dtype=jnp.bfloat16)
    print(f"full infer() 1080p: {time.perf_counter()-t0:.2f} s")


if __name__ == "__main__":
    main()
