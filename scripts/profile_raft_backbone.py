#!/usr/bin/env python3
"""RAFT backbone (fnet/cnet/pyramid) per-stage profile at the bench shape.

The full-step budget (profile_raft.py) charges 89 ms to 'backbone + corr
pyramid + cnet' — ~10x the conv FLOP ideal (~660 GFLOP over 4 encoder
passes at 810x1440 -> ~2-6 ms on the v5e MXU). This isolates conv1, each
resblock stage, the norms, conv2, and the pyramid einsums to find where the
time actually goes. Scan-chained timing (CLAUDE.md). Run alone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from prisma_tpu.models import raft as jraft
from prisma_tpu.ops import nn as pnn
from prisma_tpu.weights.store import cast_params


def scan_time(fn, consume, *args, iters=10):
    """Thread a REAL dependency chain carry -> input -> output -> carry
    (a '* 0' perturbation is provably constant and XLA hoists the whole
    body out of the scan — the 444e160 lesson). The 1e-30-scaled carry is
    below bf16/f32 addition resolution, so values are unperturbed."""
    def make(n):
        @jax.jit
        def run(args):
            def body(c, _):
                x0 = args[0] + (c * 1e-30).astype(args[0].dtype)
                out = fn(x0, *args[1:])
                return consume(out).astype(jnp.float32), ()
            c, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run
    r1, r2 = make(iters), make(2 * iters)
    float(r1(args)); float(r2(args))
    t0 = time.perf_counter(); float(r1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(args)); t2 = time.perf_counter() - t0
    return (t2 - t1) / iters


def main():
    params = jax.device_put(cast_params(
        jraft.init_params(jax.random.key(0)), jnp.bfloat16))
    rng = np.random.default_rng(0)
    B, H, W = 2, 816, 1440   # padded to /8 like infer_pairs
    x4 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (2 * B, H, W, 3)), jnp.bfloat16))

    s = jnp.sum
    t = scan_time(lambda x: jraft.encoder_forward(params["fnet"], x,
                                                  "instance"), s, x4)
    print(f"fnet encoder (B=4): {t*1e3:.1f} ms")
    t = scan_time(lambda x: jraft.encoder_forward(params["cnet"], x,
                                                  "affine"), s, x4)
    print(f"cnet encoder (B=4): {t*1e3:.1f} ms")

    # stage-by-stage fnet
    p = params["fnet"]
    x = jax.jit(lambda x: jraft._relu(jraft._apply_norm(
        p.get("norm1"), pnn.conv2d(p["conv1"], x, stride=2, padding=3),
        "instance")))(x4)
    t = scan_time(lambda v: jraft._relu(jraft._apply_norm(
        p.get("norm1"), pnn.conv2d(p["conv1"], v, stride=2, padding=3),
        "instance")), s, x4)
    print(f"  conv1 7x7/2 + inorm + relu: {t*1e3:.1f} ms")
    for i, stride in enumerate([1, 1, 2, 1, 2, 1]):
        t = scan_time(lambda v, i=i, stride=stride: jraft._resblock(
            p["blocks"][i], v, "instance", stride), s, x)
        print(f"  resblock[{i}] stride {stride} {tuple(x.shape)}: "
              f"{t*1e3:.1f} ms")
        x = jax.jit(lambda v, i=i, stride=stride: jraft._resblock(
            p["blocks"][i], v, "instance", stride))(x)
    t = scan_time(lambda v: pnn.conv2d(p["conv2"], v), s, x)
    print(f"  conv2 1x1 {tuple(x.shape)}: {t*1e3:.1f} ms")

    # norm alone at the hot shape
    y = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (4, H // 2, W // 2, 64)), jnp.bfloat16))
    t = scan_time(lambda v: jraft._apply_norm(p["blocks"][0]["norm1"], v,
                                              "instance"), s, y)
    print(f"  instance norm alone [4,{H//2},{W//2},64]: {t*1e3:.1f} ms")
    t = scan_time(lambda v: pnn.conv2d(p["blocks"][0]["conv1"], v, padding=1),
                  s, y)
    print(f"  conv3x3 64->64 alone [4,{H//2},{W//2}]: {t*1e3:.1f} ms")

    # pyramid einsums
    fm = jax.jit(lambda x: jraft.encoder_forward(params["fnet"], x,
                                                 "instance"))(x4)
    f1, f2 = fm[:B], fm[B:]
    # full-sum consume (a subsampled consume lets XLA narrow the einsum);
    # the sum itself re-reads the ~4.9 GB pyramid, ~6 ms of the number below
    t = scan_time(lambda a, b: jraft.build_corr_pyramid(a, b, 4),
                  lambda pyr: sum(jnp.sum(v) for v in pyr), f1, f2)
    print(f"corr pyramid build (+~6ms consume): {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
