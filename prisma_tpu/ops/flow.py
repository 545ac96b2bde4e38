"""Flow post-processing ops, on-device.

Parity targets in `bands/common/flow.py`:
- `warp_flow` (flow.py:19-26): cv2.remap INTER_LINEAR + BORDER_CONSTANT(0)
  backward warp of one flow field by another;
- `compute_fwdbwd_mask` (flow.py:28-40): forward-backward consistency with
  alpha_1=0.05, alpha_2=0.5.

The reference runs these per frame in numpy/cv2; here they are jitted and fuse
with the model epilogue, batched over the frame-pair axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_zero(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample img [H, W, C] at real pixel coords x/y [..], zeros outside."""
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = img.reshape(H * W, C)

    def corner(xi, yi, w):
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))[..., None]
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return flat[idx.astype(jnp.int32)] * w * valid

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (corner(x0i, y0i, (1 - fx) * (1 - fy))
            + corner(x0i + 1, y0i, fx * (1 - fy))
            + corner(x0i, y0i + 1, (1 - fx) * fy)
            + corner(x0i + 1, y0i + 1, fx * fy))


def warp_flow(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img [H, W, C] by flow [H, W, 2] (sample at p + flow(p))."""
    H, W = flow.shape[:2]
    gx = jnp.arange(W, dtype=flow.dtype)[None, :]
    gy = jnp.arange(H, dtype=flow.dtype)[:, None]
    return bilinear_sample_zero(img, flow[..., 0] + gx, flow[..., 1] + gy)


def compute_fwdbwd_mask(fwd_flow: jnp.ndarray, bwd_flow: jnp.ndarray,
                        alpha_1: float = 0.05, alpha_2: float = 0.5):
    """Forward-backward consistency masks for one pair ([H, W, 2] each)."""
    def norm(v):
        return jnp.sqrt(jnp.sum(v * v, axis=-1))

    bwd2fwd = warp_flow(bwd_flow, fwd_flow)
    fwd_err = norm(fwd_flow + bwd2fwd)
    fwd_mask = fwd_err < alpha_1 * (norm(fwd_flow) + norm(bwd2fwd)) + alpha_2

    fwd2bwd = warp_flow(fwd_flow, bwd_flow)
    bwd_err = norm(bwd_flow + fwd2bwd)
    bwd_mask = bwd_err < alpha_1 * (norm(bwd_flow) + norm(fwd2bwd)) + alpha_2
    return fwd_mask, bwd_mask


compute_fwdbwd_mask_batch = jax.vmap(compute_fwdbwd_mask)
