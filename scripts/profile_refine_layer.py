#!/usr/bin/env python3
"""Sub-piece profile of ONE scale-1 GMFlow transformer layer at the refine
bench shape ([8, 208, 360, 128], splits=8, 1170-token windows): where do
13.7 ms (unshifted) / 22.9 ms (shifted) go when the attention math is ~3 ms?
Run alone (one TPU owner)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import gmflow as gm
from prisma_tpu.ops import nn as pnn
from prisma_tpu.weights.store import cast_params


def ms(step, args, iters=6):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    cfg = gm.refine_config()
    params = jax.device_put(cast_params(
        gm.init_params(jax.random.key(2), cfg), jnp.bfloat16))
    lp = params["transformer"]["layers"][0]["self"]
    cp = params["transformer"]["layers"][0]["cross"]
    rng = np.random.default_rng(0)
    fh, fw, C, B, ns = 208, 360, 128, 8, 8
    L = fh * fw
    x = jax.device_put(rng.normal(size=(B, L, C))
                       .astype(np.float32).astype(jnp.bfloat16))
    xw = jax.device_put(rng.normal(size=(B * ns * ns, (fh // ns) * (fw // ns),
                                         C))
                        .astype(np.float32).astype(jnp.bfloat16))
    ids = gm.shift_window_region_ids(fh, fw, ns)

    def split_merge(x):
        w = gm._win_split(x, fh, fw, ns, False)
        return gm._win_merge(w, B, fh, fw, ns, False)
    print(f"win split+merge round trip:      {ms(split_merge, (x,)):6.2f} ms")

    def split_merge_shift(x):
        w = gm._win_split(x, fh, fw, ns, True)
        return gm._win_merge(w, B, fh, fw, ns, True)
    print(f"win split+merge (shifted roll):  "
          f"{ms(split_merge_shift, (x,)):6.2f} ms")

    def qkv(lp, xw):
        f = {"w": jnp.concatenate([lp[n]["w"] for n in ("q", "k", "v")],
                                  axis=1)}
        return pnn.linear(f, xw)
    print(f"fused qkv linear (windowed):     {ms(qkv, (lp, xw)):6.2f} ms")

    def attn_xla(xw):
        return gm._window_attention_core(xw, xw, xw, B, None, None, "xla")
    print(f"attention core [xla, unshift]:   {ms(attn_xla, (xw,)):6.2f} ms")

    def attn_xla_ids(xw):
        return gm._window_attention_core(xw, xw, xw, B, ids, None, "xla")
    print(f"attention core [xla, ids]:       {ms(attn_xla_ids, (xw,)):6.2f} ms")

    bands = (gm.shift_window_region_bands(fh, fw, ns), fw // ns)

    def attn_flash_bands(xw):
        return gm._window_attention_core(xw, xw, xw, B, ids, None, "flash",
                                         bands)
    print(f"attention core [flash, bands]:   "
          f"{ms(attn_flash_bands, (xw,)):6.2f} ms")

    def merge_norm(lp, xw):
        return gm._layer_norm(lp["norm1"], pnn.linear(lp["merge"], xw))
    print(f"merge proj + layer norm:         {ms(merge_norm, (lp, xw)):6.2f} ms")

    def ffn(cp, xw):
        y = jnp.concatenate([xw, xw], axis=-1)
        y = pnn.linear(cp["mlp2"], pnn.gelu(pnn.linear(cp["mlp1"], y)))
        return gm._layer_norm(cp["norm2"], y)
    print(f"ffn (concat+mlp+norm):           {ms(ffn, (cp, xw)):6.2f} ms")

    def add_pos(x):
        x4 = x.reshape(B, fh, fw, C)
        a0, _a1 = gm.add_position(x4, x4, ns)
        return a0
    print(f"add_position (both feats):       {ms(add_pos, (x,)):6.2f} ms")


if __name__ == "__main__":
    main()
