"""Signed distance field for the mask band's green channel — on device.

Parity target: the reference's snowy-based SDF (`bands/mask_mmdet.py:64-69`):
``sdf = generate_sdf(mask != 0); sdf = (sdf + 127) / 255; sdf = (sdf - 0.25) * 2;
1 - clip(sdf, 0, 1)`` — a signed Euclidean distance in pixels (positive outside
the mask, negative inside), window-clamped.

TPU implementation (no host round-trip, SURVEY.md §2.9 #10): the green-channel
mapping clamps to zero beyond +64.25 px and saturates below -63.25 px, so only
distances within a +-CAP window matter. Within that window the EDT is computed
EXACTLY (not jump-flooding-approximate) with the classic two-phase separable
decomposition:

1. vertical: exact 1-D distance-to-seed per column via min-plus relaxation
   with descending power-of-two shifts (any d <= 2^k+1 - 1 is a sum of distinct
   powers of two, so log2(CAP) passes are exact), values capped at CAP;
2. horizontal: D^2[y, x] = min_{|dx| <= CAP} (g[y, x+dx]^2 + dx^2), a windowed
   min-plus scan; every true distance <= CAP is exact, larger ones clamp to
   >= CAP which maps to the same green value.

The scipy host version is kept as the test oracle.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# All |signed distance| > 64.25 px clamp in the green mapping; 66 keeps every
# contributing distance exact (see module docstring).
CAP = 66
_POW2 = (64, 32, 16, 8, 4, 2, 1)


def _dist1d_vertical(seed: jnp.ndarray) -> jnp.ndarray:
    """seed [H, W] bool -> per-pixel vertical distance to the nearest seed in
    its column, exact up to CAP (capped there)."""
    d = jnp.where(seed, 0.0, float(CAP)).astype(jnp.float32)
    H = d.shape[0]
    for k in _POW2:
        if k >= H:
            continue
        up = jnp.concatenate([d[k:], jnp.full((k,) + d.shape[1:], float(CAP),
                                              jnp.float32)], axis=0)
        down = jnp.concatenate([jnp.full((k,) + d.shape[1:], float(CAP),
                                         jnp.float32), d[:-k]], axis=0)
        d = jnp.minimum(d, jnp.minimum(up, down) + float(k))
    return jnp.minimum(d, float(CAP))


def _edt_capped(seed: jnp.ndarray) -> jnp.ndarray:
    """Exact (within CAP) Euclidean distance transform: distance from every
    pixel to the nearest True pixel of `seed` [H, W]."""
    g = _dist1d_vertical(seed)
    g2 = g * g
    H, W = g2.shape
    big = float(CAP) * float(CAP)
    g2p = jnp.pad(g2, ((0, 0), (CAP, CAP)), constant_values=big)

    def body(carry, dx):
        sl = jax.lax.dynamic_slice_in_dim(g2p, CAP + dx, W, axis=1)
        return jnp.minimum(carry, sl + (dx * dx).astype(jnp.float32)), None

    init = jnp.full((H, W), big, jnp.float32)
    d2, _ = jax.lax.scan(body, init, jnp.arange(-CAP, CAP + 1))
    return jnp.sqrt(d2)


def signed_distance_device(mask: jnp.ndarray) -> jnp.ndarray:
    """Signed EDT in pixels on device (positive outside the mask, negative
    inside), exact within +-CAP and clamped beyond — identical green-channel
    output to the host scipy version. mask [H, W] bool."""
    outside = _edt_capped(mask)          # 0 on mask, distance elsewhere
    inside = _edt_capped(~mask)          # 0 off mask, depth inside
    return outside - inside


def sdf_green_device(mask: jnp.ndarray) -> jnp.ndarray:
    """Reference getSDF green channel (mask_mmdet.py:64-69) from a boolean
    mask [H, W]: [0, 1] float, 1 at/inside the mask, fading to 0 by ~64 px."""
    sdf = signed_distance_device(mask.astype(bool))
    sdf = (sdf + 127.0) / 255.0
    sdf = (sdf - 0.25) * 2.0
    return 1.0 - jnp.clip(sdf, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Host (scipy) version — test oracle only; production uses the device path.
# ---------------------------------------------------------------------------

def signed_distance(mask: np.ndarray) -> np.ndarray:
    """Signed EDT in pixels: positive outside mask, negative inside."""
    from scipy import ndimage
    mask = np.asarray(mask, bool)
    if not mask.any():
        return np.full(mask.shape, np.inf, np.float64)
    if mask.all():
        return np.full(mask.shape, -np.inf, np.float64)
    outside = ndimage.distance_transform_edt(~mask)
    inside = ndimage.distance_transform_edt(mask)
    return outside - inside


def mask_sdf_channel(mask_rgb: np.ndarray) -> np.ndarray:
    """Reference getSDF: white-on-black mask RGB -> green-channel SDF [H, W]
    in [0, 1] (1 at/inside the mask, fading to 0 by ~64px outside)."""
    lum = np.asarray(mask_rgb[..., :3], np.float64).mean(axis=-1)
    sdf = signed_distance(lum != 0.0)
    sdf = (sdf + 127.0) / 255.0
    sdf = (sdf - 0.25) * 2.0
    return 1.0 - np.clip(sdf, 0.0, 1.0)
