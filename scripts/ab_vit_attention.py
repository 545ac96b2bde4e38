#!/usr/bin/env python3
"""A/B the ViT-L attention core at the depth bench shape (B=8, H=16 heads,
N=2443 tokens, d=64): Pallas flash block sizes, fold/unfold transpose cost,
dense bf16 XLA, and the full pnn.attention layer. The depth profile shows
attention = 220 ms of the 263 ms trunk (24 layers ~ 9 ms each) against a
~2-4 ms/layer roofline — find where it goes. Run alone (one TPU owner)."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.ops.pallas.flash_attention import flash_attention
from prisma_tpu.ops import nn as pnn


def ms(step, args, iters=10):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    B, H, N, d = 8, 16, 2443, 64
    D = H * d
    rng = np.random.default_rng(0)
    mk = lambda *s: jax.device_put(rng.normal(size=s).astype(jnp.bfloat16))
    qf = mk(B * H, N, d)
    kf = mk(B * H, N, d)
    vf = mk(B * H, N, d)

    for bq, bk in ((256, 256), (512, 512), (512, 256), (1024, 512),
                   (256, 2560)):
        f = functools.partial(flash_attention, block_q=bq, block_k=bk)
        try:
            print(f"flash[{bq},{bk}]:      {ms(f, (qf, kf, vf)):6.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"flash[{bq},{bk}]:      FAILED ({type(e).__name__})",
                  flush=True)

    # dense bf16 (per-head folded): scores materialize [128, 2443, 2443] bf16
    def dense(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q * (d ** -0.5), k)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", p, v)
    print(f"dense bf16 folded:   {ms(dense, (qf, kf, vf)):6.2f} ms")

    # fold/unfold transposes alone: [B, N, H, d] <-> [B*H, N, d]
    x4 = mk(B, N, H, d)
    def fold_unfold(x):
        y = x.transpose(0, 2, 1, 3).reshape(B * H, N, d)
        return y.reshape(B, H, N, d).transpose(0, 2, 1, 3)
    print(f"fold+unfold:         {ms(fold_unfold, (x4,)):6.2f} ms")

    # the full attention layer (qkv + core + proj) as the ViT runs it
    D_ = D
    keys = iter(jax.random.split(jax.random.key(0), 4))
    lin = lambda din, dout: {
        "w": jax.device_put((np.asarray(jax.random.normal(next(keys), (din, dout)))
                             * din ** -0.5).astype(jnp.bfloat16)),
        "b": jax.device_put(np.zeros(dout, np.float32).astype(jnp.bfloat16))}
    p = {"qkv": lin(D_, 3 * D_), "proj": lin(D_, D_)}
    x = mk(B, N, D_)
    print(f"pnn.attention full:  {ms(lambda x: pnn.attention(p, x, H), (x,)):6.2f} ms"
          f"  (x24 layers)")
    os.environ["PRISMA_FLASH_ATTENTION"] = "0"
    print(f"pnn.attention dense: {ms(lambda x: pnn.attention(p, x, H), (x,)):6.2f} ms")
    del os.environ["PRISMA_FLASH_ATTENTION"]

    # qkv+proj matmuls alone
    def lins(x):
        y = pnn.linear(p["qkv"], x)
        return pnn.linear(p["proj"], y[..., :D_])
    print(f"qkv+proj matmuls:    {ms(lins, (x,)):6.2f} ms")


if __name__ == "__main__":
    main()
