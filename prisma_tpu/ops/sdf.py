"""Signed distance field for the mask band's green channel.

Parity target: the reference's snowy-based SDF (`bands/mask_mmdet.py:64-69`):
``sdf = generate_sdf(mask != 0); sdf = (sdf + 127) / 255; sdf = (sdf - 0.25) * 2;
1 - clip(sdf, 0, 1)`` — a signed Euclidean distance in pixels (positive outside
the mask, negative inside), window-clamped.

Implementation: exact Euclidean distance transform via
scipy.ndimage.distance_transform_edt on host (snowy's numba kernel computes the
same exact EDT). The transform runs on the decoded mask after the device step;
a device-side jump-flooding variant is a planned optimization.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def signed_distance(mask: np.ndarray) -> np.ndarray:
    """Signed EDT in pixels: positive outside mask, negative inside."""
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
