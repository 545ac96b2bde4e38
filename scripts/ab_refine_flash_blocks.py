#!/usr/bin/env python3
"""Flash block-size sweep at the GMFlow refine scale-1 window shape
([1024 windows, 1170 tok, 128d] at the real 2B batch): the default 256
blocks give a 5x256-row grid = 5120 steps x ~2us fixed cost; one 1280-row
block per window should cut the kernel to its compute floor. Also times the
dense XLA core and the shifted (region_bands) variants. Run alone."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_all import _device_bench
from prisma_tpu.models import gmflow as gm
from prisma_tpu.ops.pallas.flash_attention import flash_attention


def ms(step, args, iters=6):
    return 1e3 / _device_bench(step, args, iters, 1)


def main():
    rng = np.random.default_rng(0)
    fh, fw, C, B2, ns = 208, 360, 128, 16, 8
    win = (fh // ns) * (fw // ns)          # 1170
    nw = B2 * ns * ns                      # 1024 windows
    q = jax.device_put(rng.normal(size=(nw, win, C))
                       .astype(np.float32).astype(jnp.bfloat16))
    print(f"windows [{nw}, {win}, {C}]")

    def dense(q):
        return gm._window_attention_core(q, q, q, B2, None, None, "xla")
    print(f"dense xla unshifted:            {ms(dense, (q,)):6.2f} ms")

    for bq, bk in ((256, 256), (640, 640), (1280, 1280), (640, 1280),
                   (256, 1280)):
        def fl(q, bq=bq, bk=bk):
            return flash_attention(q, q, q, block_q=bq, block_k=bk)
        print(f"flash blocks ({bq:4d},{bk:4d}):      {ms(fl, (q,)):6.2f} ms")

    # NB: the dense-ids (shifted) config at this batch crashes the REMOTE
    # compiler ("response body closed" on the [1024, 1170, 1170] mask-add
    # graph); its half-batch cost is on record in profile_refine_layer
    # (16.69 ms at 512 windows).
    bands = jnp.asarray(gm.shift_window_region_bands(fh, fw, ns), jnp.int32)

    for bq, bk in ((256, 256), (1280, 1280), (640, 1280)):
        def flb(q, bq=bq, bk=bk):
            return flash_attention(q, q, q, region_bands=bands,
                                   win_w=fw // ns, block_q=bq, block_k=bk)
        print(f"flash bands ({bq:4d},{bk:4d}):       {ms(flb, (q,)):6.2f} ms")


if __name__ == "__main__":
    main()
