#!/usr/bin/env python3
"""Probe: in-kernel tpu.dynamic_gather (jnp.take_along_axis) viability on v5e.

Questions this answers before committing to a Pallas RAFT-lookup kernel
(docs/raft_roofline.md leaves ~6 ms/iter of slab round-trip traffic that only
a fused kernel can reclaim):
  1. does axis=1 (lane) take_along_axis lower inside a TPU kernel, for which
     dtypes (f32 / bf16 / i32 indices)?
  2. does the gather cost scale with the source lane extent (within-tile 128
     vs multi-tile 256+), i.e. is it a real lane crossbar or a select chain?
  3. does a minor-2 transpose of a small [*, W, 16] slab lower?
Run alone (one TPU owner). Usage: python scripts/probe_gather_kernel.py [cpu]
"""
import functools
import sys
import time

import numpy as np

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lane_gather_kernel(x_ref, off_ref, o_ref, *, taps: int):
    """o[s, l] = x[s, clip(off[s] + l, 0, H-1)] — one lane gather."""
    x = x_ref[...]
    S, H = x.shape
    li = lax.broadcasted_iota(jnp.int32, (S, H), 1)
    idx = off_ref[...].reshape(S, 1) + jnp.minimum(li, taps - 1)
    idx = jnp.minimum(jnp.maximum(idx, 0), H - 1)
    o_ref[...] = jnp.take_along_axis(x, idx, axis=1)


def run_lane_gather(x, off, taps, interpret=False):
    S, H = x.shape
    return pl.pallas_call(
        functools.partial(lane_gather_kernel, taps=taps),
        out_shape=jax.ShapeDtypeStruct((S, H), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, off)


def transpose_kernel(x_ref, o_ref):
    o_ref[...] = jnp.swapaxes(x_ref[...], 1, 2)


def run_transpose(x, interpret=False):
    B, W, T = x.shape
    return pl.pallas_call(
        transpose_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def ref_lane_gather(x, off, taps):
    S, H = x.shape
    li = np.minimum(np.arange(H), taps - 1)
    idx = np.clip(off[:, None] + li[None, :], 0, H - 1)
    return np.take_along_axis(np.asarray(x, np.float32), idx, axis=1)


def bench(fn, *args, iters=50):
    """Scan-chained timing (tunnel-proof): slope over two iteration counts."""
    def loop(n):
        def body(c, _):
            y = fn(c, *args[1:])
            # thread a data dependency through the carry
            return c + y[:1, :1].astype(c.dtype) * 0, y[0, 0]
        f = jax.jit(lambda x0: lax.scan(body, x0, None, length=n)[1][-1])
        out = f(args[0])
        out.block_until_ready()
        t0 = time.perf_counter()
        out = f(args[0])
        float(out)
        return time.perf_counter() - t0
    t1 = loop(iters)
    t2 = loop(2 * iters)
    return (t2 - t1) / iters


def main():
    interp = "cpu" in sys.argv[1:]
    rng = np.random.default_rng(0)

    print("== semantics (small) ==")
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.random((16, 128)), dtype)
        off = jnp.asarray(rng.integers(-4, 124, 16), jnp.int32)
        try:
            got = run_lane_gather(x, off, taps=10, interpret=interp)
            want = ref_lane_gather(x, np.asarray(off), 10)
            ok = np.allclose(np.asarray(got, np.float32), want, atol=1e-2)
            print(f"  lane gather {dtype.__name__}: ok={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"  lane gather {dtype.__name__}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")

    print("== multi-tile lane range (H=256) ==")
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.random((16, 256)), dtype)
        off = jnp.asarray(rng.integers(0, 246, 16), jnp.int32)
        try:
            got = run_lane_gather(x, off, taps=10, interpret=interp)
            want = ref_lane_gather(x, np.asarray(off), 10)
            ok = np.allclose(np.asarray(got, np.float32), want, atol=1e-2)
            print(f"  H=256 {dtype.__name__}: ok={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"  H=256 {dtype.__name__}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")

    print("== transpose [B, W, 16] -> [B, 16, W] ==")
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.random((8, 180, 16)), dtype)
        try:
            got = run_transpose(x, interpret=interp)
            ok = np.allclose(np.asarray(got, np.float32),
                             np.swapaxes(np.asarray(x, np.float32), 1, 2),
                             atol=1e-2)
            print(f"  transpose {dtype.__name__}: ok={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"  transpose {dtype.__name__}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")

    if interp:
        return

    print("== perf: gather throughput at RAFT L0 block shape ==")
    # [BLK*W, H] = [32*180, 102->128 lanes]; full L0 iter = 2295 such blocks
    for dtype in (jnp.float32, jnp.bfloat16):
        S = 32 * 180
        x = jnp.asarray(rng.random((S, 102)), dtype)
        off = jnp.asarray(rng.integers(0, 92, S), jnp.int32)
        try:
            t = bench(run_lane_gather, x, off, 10)
            gbs = x.size * x.dtype.itemsize / t / 1e9
            print(f"  [{S},102] {dtype.__name__}: {t*1e6:.0f} us/call "
                  f"({gbs:.0f} GB/s src) -> L0 iter ~= {t*2295*1e3:.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  perf {dtype.__name__}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
