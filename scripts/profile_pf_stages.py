#!/usr/bin/env python3
"""PatchFusion sub-stage profile: what's inside run_tiles' 681 ms/sub-batch
and the 718 ms coarse pass (scripts/profile_patchfusion.py output).

Each candidate stage is timed as its OWN jitted scan (data dependency through
the carry, one scalar fetched — tunnel-proof, see CLAUDE.md). Shapes match
the p49/1080p production call: model_hw (384, 512), 8-tile sub-batches,
bf16 params. Run alone — one TPU owner.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from prisma_tpu.models import patchfusion as pf
from prisma_tpu.models import zoedepth as jzoe
from prisma_tpu.ops.roi_align import roi_align, roi_align_mm
from prisma_tpu.ops.resize import resize2d
from prisma_tpu.weights.store import cast_params

MODEL_HW = pf.MODEL_HW
DT = jnp.bfloat16


def scan_time(fn, consume, *args, iters=8):
    """Time fn(*args) repeated in ONE jitted scan; returns s/call.

    All args go through the jit boundary (closures over big pytrees get
    baked into the HLO as literals and blow the remote compiler's request
    limit), and a REAL dependency chain carry -> last arg -> output ->
    carry defeats loop-invariant hoisting (the 444e160 lesson); the
    1e-30-scaled carry is below bf16/f32 addition resolution."""
    def make(n):
        @jax.jit
        def run(args):
            def body(c, _):
                xs = list(args)
                xs[-1] = xs[-1] + (c * 1e-30).astype(xs[-1].dtype)
                out = fn(*xs)
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
    params = pf.init_params(jax.random.key(6), beit_depth=24)
    params = jax.device_put(cast_params(params, DT))
    rng = np.random.default_rng(0)
    N = 8
    crops = jax.device_put(jnp.asarray(
        rng.random((N, *MODEL_HW, 3), np.float32), DT))
    img_lr = jax.device_put(jnp.asarray(
        rng.random((1, *MODEL_HW, 3), np.float32), DT))
    bbox = jax.device_put(jnp.asarray(
        [[x, y, x + 128.0, y + 96.0] for x, y in
         [(0, 0), (128, 96), (256, 192), (384, 288 - 96), (64, 32),
          (192, 128), (320, 224), (0, 288)]], jnp.float32))
    zeros_idx = jnp.zeros((N,), jnp.int32)
    lv = pf.level_hw(MODEL_HW)
    hh, hw_ = pf.hr_hw(MODEL_HW)

    # coarse sub-stages -------------------------------------------------------
    mean = jnp.asarray((0.485, 0.456, 0.406), DT)
    std = jnp.asarray((0.229, 0.224, 0.225), DT)

    t = scan_time(lambda p, img: pf.zoedepth_custom_forward(
        p["coarse"], (img - mean) / std, pf.PF_CONFIG, None)[0],
        lambda d: jnp.sum(d), params, img_lr)
    print(f"coarse zoedepth_custom (B=1): {t*1e3:.0f} ms")

    coarse_feats, coarse_depth_hr = jax.jit(pf.coarse_pass)(params, img_lr)
    coarse_feats = jax.device_put(coarse_feats)
    coarse_depth_hr = jax.device_put(coarse_depth_hr)
    cd = jax.jit(lambda p, i: pf.zoedepth_custom_forward(
        p["coarse"], (i - mean) / std, pf.PF_CONFIG, None)[0])(params, img_lr)

    t = scan_time(lambda d: resize2d(d[..., None], (hh, hw_), method="linear",
                                     align_corners=True),
                  lambda o: jnp.sum(o[0, ::97, ::97, 0]), cd)
    print(f"coarse HR depth resize -> {hh}x{hw_}: {t*1e3:.0f} ms")

    # tile sub-stages ---------------------------------------------------------
    t = scan_time(lambda p, c: pf.zoedepth_custom_forward(
        p["fine"], (c - mean) / std, pf.PF_CONFIG, None)[0],
        lambda d: jnp.sum(d), params, crops)
    print(f"fine zoedepth_custom (B=8): {t*1e3:.0f} ms")

    def roi6(bbox, cf=None):
        coarse_feats_l = cf if cf is not None else coarse_feats
        outs = [roi_align(coarse_feats_l[i], bbox, zeros_idx, lv[i],
                          spatial_scale=lv[i][0] / MODEL_HW[0],
                          sampling_ratio=max(1, int(round(
                              MODEL_HW[0] / lv[i][0]))))
                for i in range(6)]
        return outs
    t = scan_time(lambda cf, b: roi6(b, cf),
                  lambda o: sum(jnp.sum(x.astype(jnp.float32)) for x in o),
                  coarse_feats, bbox)
    print(f"coarse_roi x6 roi_align gather (B=8): {t*1e3:.0f} ms")

    def roi6_mm(cf, bbox):
        return [roi_align_mm(cf[i], bbox, zeros_idx, lv[i],
                             spatial_scale=lv[i][0] / MODEL_HW[0],
                             sampling_ratio=max(1, int(round(
                                 MODEL_HW[0] / lv[i][0]))))
                for i in range(6)]
    t = scan_time(roi6_mm,
                  lambda o: sum(jnp.sum(x.astype(jnp.float32)) for x in o),
                  coarse_feats, bbox)
    print(f"coarse_roi x6 roi_align MATMUL (B=8): {t*1e3:.1f} ms")

    def wroi(bbox, chr_=None):
        if chr_ is None:
            chr_ = coarse_depth_hr
        bbox_hack = bbox * jnp.asarray([hw_ / MODEL_HW[1], hh / MODEL_HW[0],
                                        hw_ / MODEL_HW[1], hh / MODEL_HW[0]])
        return roi_align(chr_, bbox_hack, zeros_idx, MODEL_HW,
                         spatial_scale=1.0, sampling_ratio=5, roi_chunk=2)
    t = scan_time(lambda c, b: wroi(b, c), lambda o: jnp.sum(o),
                  coarse_depth_hr, bbox)
    print(f"whole_depth_roi roi_align gather (B=8): {t*1e3:.0f} ms")
    t = scan_time(lambda c, b: roi_align_mm(
                      c, b * jnp.asarray([hw_ / MODEL_HW[1], hh / MODEL_HW[0],
                                          hw_ / MODEL_HW[1], hh / MODEL_HW[0]]),
                      zeros_idx, MODEL_HW, spatial_scale=1.0,
                      sampling_ratio=5),
                  lambda o: jnp.sum(o), coarse_depth_hr, bbox)
    print(f"whole_depth_roi roi_align MATMUL (B=8): {t*1e3:.1f} ms")

    # unet + bins: run the full tile pass minus the parts above by timing the
    # whole thing and subtracting is noisy; instead time unet_v1 directly
    from prisma_tpu.ops import nn as pnn

    @jax.jit
    def make_guides(params, crops, bbox):
        fine_depth, fine_hooks = pf.zoedepth_custom_forward(
            params["fine"], (crops - mean) / std, pf.PF_CONFIG, None)
        fine_feats = pf._proj6(params["fine_input_proj"], fine_hooks)
        c_roi = [c.astype(DT) for c in roi6(bbox)]
        guide_cat = [
            pnn.conv2d(params["fusion_conv"][i],
                       jnp.concatenate([c_roi[i], fine_feats[i]], axis=-1),
                       padding=1)
            for i in range(6)]
        return fine_depth, guide_cat

    fine_depth, guide_cat = jax.device_put(make_guides(params, crops, bbox))
    wd = jax.jit(wroi)(bbox).astype(DT)
    input_tensor = jnp.concatenate([wd, fine_depth[..., None].astype(DT),
                                    crops], axis=-1)
    areas = jnp.ones((N, *MODEL_HW, 1), jnp.float32)
    crop_area_resize = [resize2d(areas, hw2, method="linear",
                                 align_corners=True).astype(DT) for hw2 in lv]

    t = scan_time(lambda p, gc, cf, it: pf.unet_v1(
                      p["unet"], it, gc, cf, crop_area_resize, bbox,
                      zeros_idx, MODEL_HW, None),
                  lambda o: sum(jnp.sum(x.astype(jnp.float32)) for x in o),
                  params, guide_cat, coarse_feats, input_tensor)
    print(f"unet_v1 incl. g2l+rois (B=8): {t*1e3:.0f} ms")

    # g2l fusion + its roi per level, isolated
    for level in range(6):
        heads, depth = pf.G2L_SPECS[level]
        out_hw = lv[level]

        def g2l_only(p, cf, area, level=level, heads=heads, depth=depth):
            whole = jnp.broadcast_to(cf[level], (N,) + cf[level].shape[1:])
            return pf.g2l_fusion(p["unet"]["g2l"][level], whole, area,
                                 heads, depth)
        t = scan_time(g2l_only, lambda o: jnp.sum(o.astype(jnp.float32)),
                      params, coarse_feats, crop_area_resize[level])
        g = jax.jit(g2l_only)(params, coarse_feats, crop_area_resize[level])

        def roi_only(g, bbox, out_hw=out_hw):
            return roi_align(g, bbox, jnp.arange(N, dtype=jnp.int32), out_hw,
                             spatial_scale=out_hw[0] / MODEL_HW[0],
                             sampling_ratio=max(1, int(round(
                                 MODEL_HW[0] / out_hw[0]))),
                             roi_chunk=4 if out_hw[0] >= 96 else None)
        t2 = scan_time(roi_only, lambda o: jnp.sum(o.astype(jnp.float32)),
                       g, bbox)
        print(f"  g2l level {level} {out_hw}: fusion {t*1e3:.1f} ms, "
              f"roi {t2*1e3:.1f} ms")


if __name__ == "__main__":
    main()
