"""Flash attention Pallas kernel for ViT/UNet/flow-transformer sequences.

TPU-native replacement for the reference's xformers memory-efficient attention
(SURVEY.md §2.9 #7: `dinov2/layers/attention.py:21,65-66`, Marigold's
enable_xformers): online-softmax attention computed block-by-block in VMEM, so
the [N, N] score matrix never materializes in HBM.

Targets the pipeline's long sequences — GMFlow's 2x2 window attention at the
0.75-scaled 1080p default is 4680 tokens/window, where the materialized
[B, N, N] scores are the HBM-bandwidth bottleneck of the XLA path. Ragged N is
handled by padding to the block size and masking padded KEY columns inside the
kernel (padded QUERY rows are computed and sliced off).

The optional `ids` argument reproduces GMFlow's shifted-window region bias
(`models/gmflow.py shift_window_region_ids`): tokens from different regions
attend with an additive -100. Rather than streaming an [N, N] mask (or int
rows, which Mosaic's (8, 128) tiling rejects as 1-wide blocks), the bias is
folded into the score MATMUL itself: a 128-lane one-hot region encoding is
appended to q (scaled) and k, so

    [q | lam*onehot(id_q)] . [k | onehot(id_k)]^T = q.k + lam*[id_q == id_k]

which equals the masked score up to a softmax-invariant constant (-100 on
every column vs +100 on same-region columns). The kernel stays bias-free and
perfectly (8, 128)-tiled.

Accumulation is f32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256

_NEG = -1e9  # score for padded keys
_REGION_PENALTY = 100.0  # |gmflow shift-window bias|; sign folded via +same
_ID_LANES = 128  # one-hot width (region ids must be < 128); one MXU lane tile
_LOG2E = 1.4426950408889634  # scores carried in the exp2 domain (see kernel)


def _mod_ramp(x, ww: int, maxv: int):
    """x % ww for 0 <= x < maxv via unrolled conditional subtracts — Mosaic
    lowers vector int rem catastrophically (measured +1.6 ms/call on a
    [512, 512] block) while compare/select rounds are ~free."""
    for _ in range(max(1, (maxv - 1) // ww)):
        x = x - jnp.where(x >= ww, ww, 0)
    return x


def _flash_kernel(*refs, block_k: int, n_kv: int, n_valid: int,
                  block_q: int = 0, win_w: int = 0, nwin: int = 0):
    # q/k/v stay in the input dtype for the MXU dots (bf16 x bf16 -> f32
    # accumulate runs at 2x the all-f32 rate); softmax state is f32.
    #
    # The kernel is VPU-bound at the production head dims (d=64 halves the
    # MXU contraction, so elementwise passes over the [BQ, BK] f32 score tile
    # set the floor), hence two structural cuts:
    #  - q arrives PRE-SCALED by d^-0.5 * log2(e) from the wrapper, so scores
    #    live in the exp2 domain: no per-tile scale multiply, and the softmax
    #    uses exp2 directly (exp lowers to exp2(x*log2e) — one multiply pass
    #    per element saved). The -100 region bias is likewise log2e-scaled.
    #  - the padded-key mask (iota compare + select, two more full-tile
    #    passes) runs ONLY on the tiles that straddle n_valid: the fori_loop
    #    covers the full tiles, a Python-unrolled tail handles the rest.
    if win_w:
        bands_ref, q_ref, k_ref, v_ref, o_ref = refs
        win = pl.program_id(0) % nwin
        bh = bands_ref[win, 0]
        bw = bands_ref[win, 1]
        qrow = pl.program_id(1) * block_q
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    q = q_ref[0]                                      # [BQ, dqk]
    bq = q.shape[0]
    dv = v_ref.shape[-1]

    if win_w:
        # swin shifted-window region bias computed IN-kernel from the
        # window's (at most one) h/w band boundary: token j sits at
        # (j // win_w, j % win_w) and tokens on opposite sides of a boundary
        # get the reference's additive -100 (gmflow/transformer.py:19-105
        # mask semantics). Vector int div/mod lower badly in Mosaic, so
        # the tests are div-free: j // ww >= bh <=> j >= bh*ww, and j % ww
        # comes from _mod_ramp (unrolled conditional subtracts) over the
        # block iota plus a SCALAR remainder of the block offset.
        qi = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        qs = jax.lax.rem(qrow, win_w)          # scalar remainder
        wq = _mod_ramp(qi + qs, win_w, block_q + win_w)
        # both band tests folded into ONE int code per token so the loop
        # body does a single [bq,1]x[1,bk] broadcast compare (the two-
        # compare + & form measured ~3x the bias cost)
        code_q = (2 * ((qrow + qi) >= bh * win_w).astype(jnp.int32)
                  + (wq >= bw).astype(jnp.int32))

    def make_body(masked):
        def body(i, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if win_w or masked:
                col = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_k), 1)
            if win_w:
                ks = jax.lax.rem(i * block_k, win_w)
                ki = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                wk = _mod_ramp(ki + ks, win_w, block_k + win_w)
                code_k = (2 * (col >= bh * win_w).astype(jnp.int32)
                          + (wk >= bw).astype(jnp.int32))
                s = jnp.where(code_q == code_k, s,
                              s - _REGION_PENALTY * _LOG2E)
            if masked:  # padded key columns on the n_valid-straddling tiles
                s = jnp.where(col < n_valid, s, _NEG)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32)
            return acc, m_new, l_new
        return body

    carry = (jnp.zeros((bq, dv), jnp.float32),
             jnp.full((bq, 1), _NEG, jnp.float32),
             jnp.zeros((bq, 1), jnp.float32))
    n_full = min(n_valid // block_k, n_kv // block_k)
    if n_full > 0:
        carry = jax.lax.fori_loop(0, n_full, make_body(False), carry)
    masked_body = make_body(True)
    for i in range(n_full, n_kv // block_k):
        carry = masked_body(i, carry)
    acc, _m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_axis1(x, n, fill=0):
    pad = n - x.shape[1]
    if pad == 0:
        return x
    widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "win_w",
                                    "interpret"))
def flash_attention(q, k, v, ids=None, region_bands=None, win_w: int = 0,
                    block_q: int | None = None,
                    block_k: int | None = None, interpret: bool = False):
    """q/k/v [B, N, d] (B folds batch x heads x windows) -> [B, N, d].

    N is padded to the block sizes internally: padded KEY columns score -1e9
    (zero softmax mass), padded QUERY rows are sliced off the output.

    block_q/block_k default by sequence length: 512 for N >= 2048, 256 below
    (less padding waste for short rows). Measured at the two production
    shapes: 4590-token GMFlow windows 1.53 ms (512) vs 3.1 ms (256) vs dense
    3.1 ms; 2443-token ViT-L depth rows 4.4-4.8 ms (512) vs 8.2 ms (256)
    vs dense-bf16 3.8 ms per 24-layer-step layer at [128, N, 64]
    (scripts/ab_vit_attention.py). Larger/full-K blocks measured the same
    within noise and risk the ~16 MB scoped-VMEM limit on the f32
    [block_q, block_k] score tile.

    Two ways to express GMFlow's shifted-window -100 region bias:

    ids: [B, N] int region labels (< 128) for ARBITRARY regions; tokens with
    different labels attend with the additive -100, folded into the score
    matmul via a one-hot channel block (see module docstring). Costs an
    extra 128 qk lanes — 2x the score matmul at d=128.

    region_bands + win_w: the swin-structured case — [nwin, 2] int32 per
    window (bh, bw), the window's at-most-one in-window band boundary per
    axis (sentinel >= window extent = none), win_w the window's token-row
    width. The kernel computes the bias from int32 iota compares (token j
    sits at (j // win_w, j % win_w)); qk stays at the model width — measured
    4.24 -> ~2.7 ms per shifted 4590-token attention. B must be a multiple
    of nwin with the window axis FASTER than batch (as _win_split lays out).
    """
    B, N, d = q.shape
    npad256 = -(-N // 256) * 256
    if block_q is None and block_k is None:
        # auto rule, measured per regime:
        # - short rows (npad <= 1536): ONE block covering the whole row —
        #   the ~2 us/grid-step fixed cost dominates small tiles (GMFlow
        #   refine 1170-token windows: 9.97 ms one-block vs 18.7 at 256 vs
        #   15.3 dense at [1024, 1170, 128]);
        # - mid rows (npad <= 3072, f32 score tile <= ~6.3 MB VMEM): full-K
        #   blocks — ONE softmax round instead of chunked running-max
        #   updates (ViT-L 2443 tokens [128, N, 64]: 2.93 ms vs 4.29 at
        #   (512, 512));
        # - long rows: 512 tiles (4590/5184-token shapes; full-K measured
        #   neutral there and the tile nears the scoped-VMEM limit).
        if npad256 <= 1536:
            block_q = block_k = npad256
        elif npad256 <= 3072:
            block_k = npad256
            block_q = 512 if npad256 % 512 == 0 else 256
        else:
            block_q = 512 if N >= 2048 else DEFAULT_BLOCK_Q
            block_k = 512 if N >= 2048 else DEFAULT_BLOCK_K
    elif block_q is None:
        block_q = 512 if N >= 2048 else DEFAULT_BLOCK_Q
    elif block_k is None:
        block_k = 512 if N >= 2048 else DEFAULT_BLOCK_K
    scale = d ** -0.5  # model-dim scale, regardless of appended id lanes

    if ids is not None:
        # one-hot(id) appended: q gets lam/scale so the global q pre-scale
        # below leaves a +lam bias on same-region pairs (softmax-equivalent
        # to the reference's -100 on different-region pairs)
        oh = jax.nn.one_hot(ids, _ID_LANES, dtype=q.dtype)  # [B, N, 128]
        q = jnp.concatenate([q, oh * (_REGION_PENALTY / scale)], axis=-1)
        k = jnp.concatenate([k, oh], axis=-1)
    # fold the softmax scale and the exp->exp2 base change into q ONCE (one
    # pass over q instead of a per-score-tile multiply; see _flash_kernel)
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)

    dqk = q.shape[-1]
    npad = -(-N // max(block_q, block_k)) * max(block_q, block_k)
    # npad must tile exactly by BOTH blocks: grid uses integer division, so a
    # non-divisor block_q would silently leave trailing query rows UNCOMPUTED
    # (e.g. block_q=1024, block_k=2560 -> npad 2560, grid 2: rows 2048+ are
    # garbage). Caught live in the round-3 block sweep — keep the assert.
    assert npad % block_q == 0 and npad % block_k == 0, \
        f"blocks ({block_q},{block_k}) do not tile padded N={npad}"
    qp = _pad_axis1(q, npad)
    kp = _pad_axis1(k, npad)
    vp = _pad_axis1(v, npad)

    args = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, block_q, dqk), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npad, dqk), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npad, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    extra = {}
    if region_bands is not None:
        assert ids is None and win_w > 0
        nwin = region_bands.shape[0]
        assert B % nwin == 0
        args.insert(0, jnp.asarray(region_bands, jnp.int32))
        in_specs.insert(0, pl.BlockSpec((nwin, 2), lambda b, i: (0, 0),
                                        memory_space=pltpu.SMEM))
        extra = dict(block_q=block_q, win_w=win_w, nwin=nwin)

    kernel = functools.partial(_flash_kernel, block_k=block_k, n_kv=npad,
                               n_valid=N, **extra)
    out = pl.pallas_call(
        kernel,
        grid=(B, npad // block_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npad, d), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :N]


def _flash_kernel_streamed(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                           *, nk_steps: int, block_k: int, n_valid: int,
                           scale: float):
    """Online-softmax step for ONE (q block, k block) grid cell; the k axis is
    the innermost (sequential) grid dimension and the softmax state lives in
    VMEM scratch across its steps — so K/V stream from HBM block-by-block
    instead of residing whole in VMEM (the non-streamed kernel needs the full
    [N, d] K and V per q block, which blows VMEM at GMFlow's 18k-token global
    matching: 18432 x 128 x (bf16 K + f32 V) ~ 14 MB before double buffering).
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                                      # [BQ, dqk]
    k = k_ref[0]                                      # [BK, dqk]
    v = v_ref[0]                                      # [BK, dv]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if n_valid < nk_steps * block_k:  # mask padded key columns
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG)
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[...] = m_new
    # the denominator accumulates the SAME quantized weights as the numerator
    # (pv, not p): a fully peaked softmax then returns its argmax row of v
    # bit-exactly whatever v's dtype — the dominant error term for
    # coordinate-valued v would otherwise be the p-vs-pv normalizer mismatch
    pv = p.astype(v.dtype)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(pv.astype(jnp.float32), axis=-1,
                                              keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        pv, v, preferred_element_type=jnp.float32)

    @pl.when(j == nk_steps - 1)
    def _emit():
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "out_dtype",
                                              "scale", "interpret"))
def flash_attention_streamed(q, k, v, block_q: int = 512, block_k: int = 512,
                             out_dtype=None, scale: float | None = None,
                             interpret: bool = False):
    """softmax(q kᵀ / sqrt(d)) @ v with K/V streamed over the grid — for
    sequences far beyond VMEM (GMFlow's global matching / flow propagation,
    18k tokens at 810x1440). q/k [B, N, d] and [B, M, d]; v [B, M, dv] may be
    a different dtype than q/k (f32 coordinate values with bf16 features: the
    softmax weights then multiply v in f32, keeping expected-coordinate
    precision). dv must be lane-tileable (pad to 128).

    Scores/softmax state are f32 regardless of input dtype; out_dtype defaults
    to v.dtype.
    """
    B, N, d = q.shape
    M = k.shape[1]
    dv = v.shape[-1]
    out_dtype = out_dtype or v.dtype
    if scale is None:
        scale = d ** -0.5
    npad = -(-N // block_q) * block_q
    mpad = -(-M // block_k) * block_k
    qp = _pad_axis1(q, npad)
    kp = _pad_axis1(k, mpad)
    vp = _pad_axis1(v, mpad)
    nk_steps = mpad // block_k

    kernel = functools.partial(_flash_kernel_streamed, nk_steps=nk_steps,
                               block_k=block_k, n_valid=M, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, npad // block_q, nk_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npad, dv), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, dv), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :N]


def _xla_attention(q, k, v, scale, ids=None):
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    if ids is not None:
        s = s + jnp.where(ids[:, :, None] == ids[:, None, :], 0.0,
                          -_REGION_PENALTY)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
