#!/usr/bin/env python3
"""A/B: local_correlation_softmax taps (VPU elementwise dots) vs _mm (banded
MXU matmuls + one-hot band extraction) at the GMFlow refine scale-1 shape.
Checks numeric agreement first (CPU-exact paths differ only in accumulation
order), then times both on the TPU. Run alone (one TPU owner)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import gmflow as gm


def ms(step, args, iters=6):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    rng = np.random.default_rng(0)
    B, fh, fw, C, r = 8, 208, 360, 128, 4
    f0 = jax.device_put(rng.normal(size=(B, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))
    f1 = jax.device_put(rng.normal(size=(B, fh, fw, C))
                        .astype(np.float32).astype(jnp.bfloat16))

    a = np.asarray(gm.local_correlation_softmax(f0, f1, r)).astype(np.float32)
    b = np.asarray(gm.local_correlation_softmax_mm(f0, f1, r)) \
        .astype(np.float32)
    print(f"max |taps - mm| flow diff: {np.abs(a - b).max():.2e} "
          f"(bf16 inputs, f32 softmax)")

    def taps(f0, f1):
        return gm.local_correlation_softmax(f0, f1, r)
    print(f"taps form: {ms(taps, (f0, f1)):6.2f} ms")

    def mm(f0, f1):
        return gm.local_correlation_softmax_mm(f0, f1, r)
    print(f"mm form:   {ms(mm, (f0, f1)):6.2f} ms")


if __name__ == "__main__":
    main()
