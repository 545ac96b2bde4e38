#!/usr/bin/env python3
"""Dump the compiled TPU HLO of the RAFT update-block scan (no execution):
count per-iteration kernels and look for layout copies/transposes inside the
while body (CLAUDE.md: XLA will transpose loop invariants EVERY iteration).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from prisma_tpu.models import raft as jraft
from prisma_tpu.weights.store import cast_params


def main():
    cfg = jraft.RAFTConfig()
    params = cast_params(jraft.init_params(jax.random.key(0)), jnp.bfloat16)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    Bb, H8, W8 = 4, 102, 180
    net0 = rng.standard_normal((Bb, H8, W8, cfg.hidden_dim)).astype(dtype)
    inp = rng.standard_normal((Bb, H8, W8, cfg.context_dim)).astype(dtype)
    corr0 = rng.standard_normal(
        (Bb, H8, W8, cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2)
    ).astype(dtype)
    T = 20

    def run(p, net0, inp, corr0):
        prep = jraft._gru_fused_prepare(p["update"]["gru"], inp,
                                        cfg.hidden_dim)
        gx, gy = jnp.meshgrid(jnp.arange(W8, dtype=jnp.float32),
                              jnp.arange(H8, dtype=jnp.float32))
        coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (Bb, H8, W8, 2))

        def step(carry, _):
            net, coords1 = carry
            corr = corr0 + jnp.mean(net, -1, keepdims=True).astype(dtype)
            flow = coords1 - coords0
            motion = jraft._motion_encoder(p["update"]["encoder"],
                                           flow.astype(dtype), corr)
            net = jraft._sep_conv_gru_fused(prep, net, motion)
            delta = jraft._flow_head(p["update"]["flow_head"], net)
            return (net, coords1 + delta.astype(jnp.float32)), None

        (net, coords1), _ = jax.lax.scan(step, (net0, coords0), None,
                                         length=T)
        return net, coords1

    lowered = jax.jit(run).lower(params, net0, inp, corr0)
    txt = lowered.compile().as_text()
    out = "/tmp/raft_update_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt.splitlines())} lines")
    # crude summary of the while-body kernels
    in_body = False
    kinds = {}
    for line in txt.splitlines():
        if line.startswith("%region") or ("while" in line and "body" in line
                                          and "{" in line):
            in_body = "body" in line
        if not in_body:
            continue
        ls = line.strip()
        for k in ("fusion", "convolution", "copy", "transpose", "dot",
                  "custom-call", "bitcast"):
            if ls.startswith("%") or ls.startswith("ROOT"):
                rhs = ls.split("=", 1)[-1]
                if f" {k}(" in rhs or rhs.lstrip().startswith(
                        tuple(f"{t} {k}(" for t in ("bf16", "f32"))):
                    kinds[k] = kinds.get(k, 0) + 1
    print(kinds)


if __name__ == "__main__":
    main()
