#!/usr/bin/env python3
"""Benchmark: depth_anything (ViT-L/14) full video step on 1080p frames.

Measures frames/sec/chip for the fused device step (uint8 1080p frames ->
lower-bound-518 resize -> ViT-L -> DPT -> resize-back -> per-frame min/max +
heatmap encode), i.e. the entire per-frame compute the reference does serially
on GPU (bands/depth_anything.py:203-221) minus host video codec I/O.

Prints ONE JSON line. vs_baseline is measured fps-per-chip divided by the
BASELINE.json north-star share (>60 fps on a v5e-8 => 7.5 fps/chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prisma_tpu.models import depth_anything as da

    encoder = os.environ.get("PRISMA_BENCH_ENCODER", "vitl")
    batch = int(os.environ.get("PRISMA_BENCH_BATCH", "8"))
    from prisma_tpu.weights.store import cast_params
    params = da.init_params(jax.random.key(0), encoder)
    params = jax.device_put(cast_params(params, jnp.bfloat16))

    @jax.jit
    def step(params, frames):
        return da.infer_video_batch(params, frames, encoder=encoder,
                                    compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(batch, 1080, 1920, 3)).astype(np.uint8)
    # frames pre-placed on device: the band pipeline overlaps H2D with compute
    # (background decode thread), so the steady-state step starts device-side
    frames = jax.device_put(frames)

    def force(out):
        # block_until_ready through the tunneled axon runtime can return
        # before remote execution finishes; fetching a scalar is the only
        # reliable completion barrier
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))

    # warmup / compile
    force(step(params, frames))

    iters = int(os.environ.get("PRISMA_BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(params, frames)
    force(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    north_star_per_chip = 7.5  # 60 fps on v5e-8
    print(json.dumps({
        "metric": "depth_anything_vitl_1080p_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / north_star_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
