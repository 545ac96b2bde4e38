#!/usr/bin/env python3
"""VAE decode stage profile at the Marigold production shape (B=10 members,
432x768 output, latent 54x96): round-4 measured the whole decode at 466 ms —
this splits mid-block (incl. the 5184-token single-head attention) from the
up-block ladder so the next cut targets the real cost. Run alone (one TPU
owner)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import marigold as mg
from prisma_tpu.models import sd2
from prisma_tpu.weights.store import cast_params


def ms(step, args, iters=4):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    params = jax.device_put(cast_params(
        mg.init_params(jax.random.key(0)), jnp.bfloat16))
    vae = params["vae"]
    cfg = sd2.VAEConfig()
    rng = np.random.default_rng(0)
    B, lh, lw = 10, 54, 96
    z = jax.device_put(rng.normal(size=(B, lh, lw, 4))
                       .astype(np.float32).astype(jnp.bfloat16))

    def full(vae, z):
        return sd2.vae_decode(vae, z)
    print(f"vae_decode full (B={B}, {lh}x{lw} latent): "
          f"{ms(full, (vae, z), iters=3):7.1f} ms")

    ch0 = vae["dec"]["conv_in"]["w"].shape[-1]
    h0 = jax.device_put(rng.normal(size=(B, lh, lw, ch0))
                        .astype(np.float32).astype(jnp.bfloat16))

    def mid(vae, h):
        d = vae["dec"]
        h = sd2._vae_resnet(d["mid"]["res1"], h, cfg.norm_groups)
        h = sd2._vae_attn(d["mid"]["attn"], h, cfg.norm_groups)
        return sd2._vae_resnet(d["mid"]["res2"], h, cfg.norm_groups)
    print(f"mid block (2 resnets + attn):    {ms(mid, (vae, h0)):7.1f} ms")

    def mid_attn(vae, h):
        return sd2._vae_attn(vae["dec"]["mid"]["attn"], h, cfg.norm_groups)
    print(f"mid attention alone ({lh*lw} tok): {ms(mid_attn, (vae, h0)):7.1f} ms")

    # up ladder stage by stage
    h = h0
    for bi, block in enumerate(vae["dec"]["up"]):
        ch_in = block["resnets"][0]["conv1"]["w"].shape[2]
        hh, ww = h.shape[1], h.shape[2]
        hin = jax.device_put(rng.normal(size=(B, hh, ww, ch_in))
                             .astype(np.float32).astype(jnp.bfloat16))

        def up_stage(vae, hin, bi=bi):
            b = vae["dec"]["up"][bi]
            x = hin
            for rp in b["resnets"]:
                x = sd2._vae_resnet(rp, x, cfg.norm_groups)
            if "up" in b:
                BB, H, W, C = x.shape
                x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                     (BB, H, 2, W, 2, C)).reshape(
                                         BB, 2 * H, 2 * W, C)
                x = jax.lax.conv_general_dilated(
                    x, b["up"]["w"], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b["up"]["b"]
            return x
        out = up_stage(vae, hin)
        print(f"up[{bi}] in {hin.shape} -> {out.shape}: "
              f"{ms(up_stage, (vae, hin)):7.1f} ms")
        h = out

    def tail(vae, h):
        d = vae["dec"]
        y = sd2.silu(sd2.group_norm(d["norm_out"], h, cfg.norm_groups))
        import prisma_tpu.ops.nn as pnn
        return pnn.conv2d(d["conv_out"], y, padding=1)
    hf = jax.device_put(rng.normal(size=(B, lh * 8, lw * 8,
                                         h.shape[-1]))
                        .astype(np.float32).astype(jnp.bfloat16))
    print(f"norm_out + conv_out at full res: {ms(tail, (vae, hf)):7.1f} ms")


if __name__ == "__main__":
    main()
