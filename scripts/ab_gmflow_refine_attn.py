#!/usr/bin/env python3
"""A/B: GMFlow REFINE scale-1 transformer with dense-XLA vs flash window
attention.

profile_gmflow_refine measured the scale-1 transformer at 474 ms of the
699 ms 2-scale pass (68%). Its windows are (832/4)/8 x (1440/4)/8 = 26x45 =
1170 tokens — below the 4096-token flash gate, so it runs the dense XLA path
today. This measures both impls on the full scale-1 transformer (6 layers,
self+cross, alternating shifted windows) at the bench shape. Run alone (one
TPU owner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import gmflow as gm
from prisma_tpu.weights.store import cast_params


def ms(step, args, iters=4):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    pairs = 4
    cfg = gm.refine_config()
    params = jax.device_put(cast_params(
        gm.init_params(jax.random.key(2), cfg), jnp.bfloat16))
    rng = np.random.default_rng(0)
    H, W = 832, 1440
    fh, fw, C = H // 4, W // 4, cfg.feature_channels
    B = 2 * pairs
    sp = cfg.scale_lists()[0][1]  # scale-1 attn splits (8)

    f0 = jax.device_put(rng.normal(size=(B, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))
    f1 = jax.device_put(rng.normal(size=(B, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))

    for impl in ("xla", "flash"):
        def tf(params, f0, f1, impl=impl):
            a0, a1 = gm.add_position(f0, f1, sp)
            return gm.transformer_forward(params["transformer"], a0, a1,
                                          sp, None, impl)[0]
        t = ms(tf, (params, f0, f1))
        print(f"scale-1 transformer [{impl:5s}] (B={B}, {fh}x{fw}, "
              f"splits={sp}, win={(fh // sp) * (fw // sp)} tok): {t:7.1f} ms")

    # single shifted + non-shifted self-attention layers, isolated
    ids = gm.shift_window_region_ids(fh, fw, sp)
    for impl in ("xla", "flash"):
        for shifted in (False, True):
            m = ids if shifted else None

            def layer(params, x, m=m, impl=impl):
                return gm._transformer_layer(params["transformer"]["layers"][0]
                                             ["self"], x, x, fh, fw, sp, m,
                                             True, None, impl)
            x = f0.reshape(B, fh * fw, C)
            t = ms(layer, (params, x))
            print(f"  self layer [{impl:5s}] shifted={int(shifted)}: "
                  f"{t:6.1f} ms")


if __name__ == "__main__":
    main()
