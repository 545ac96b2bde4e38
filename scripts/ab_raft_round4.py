#!/usr/bin/env python3
"""Round-4 RAFT cuts, measured at the bench shape: fused Pallas instance
norm in the encoders, x-first onehot lookup (H-minor slab, ~0.9 GB/iter less
slab traffic than row-first), and their e2e combination. Run alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from prisma_tpu.models import raft as jraft
from prisma_tpu.weights.store import cast_params


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    params = jax.device_put(cast_params(
        jraft.init_params(jax.random.key(0)), jnp.bfloat16))
    rng = np.random.default_rng(0)
    B, H, W = 2, 810, 1440
    img1 = jax.device_put(rng.uniform(0, 255, (B, H, W, 3)).astype(jnp.bfloat16))
    img2 = jax.device_put(rng.uniform(0, 255, (B, H, W, 3)).astype(jnp.bfloat16))

    # encoder alone (fused inorm vs measured 50.1 ms XLA at B=4)
    x4 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (4, 816, 1440, 3)), jnp.bfloat16))
    import scripts.profile_raft_backbone as bb
    t = bb.scan_time(lambda x: jraft.encoder_forward(params["fnet"], x,
                                                     "instance"),
                     jnp.sum, x4)
    print(f"fnet encoder (B=4, fused inorm): {t*1e3:.1f} ms  [was 50.1]")

    for impl in ("volume_onehot", "volume_onehot_xf"):
        t = timeit(jax.jit(lambda p, a, b, impl=impl: jraft.infer_pairs(
            p, a, b, corr_impl=impl)), params, img1, img2)
        print(f"infer_pairs[{impl}]: {t*1e3:.0f} ms => {B/t:.2f} pair-fps")


if __name__ == "__main__":
    main()
