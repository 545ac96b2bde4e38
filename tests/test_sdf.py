"""Device SDF (exact windowed EDT) vs the scipy host oracle.

Parity budget: the green channel quantizes to 1/255, so device f32 and host
f64 must agree exactly after the *255 uint8 truncation (VERDICT item 4).
"""

import numpy as np

import jax.numpy as jnp

from prisma_tpu.ops.sdf import (mask_sdf_channel, sdf_green_device,
                                signed_distance, signed_distance_device)


def _green_u8_host(mask_bool):
    rgb = np.stack([mask_bool * 255.0] * 3, axis=-1)
    return (mask_sdf_channel(rgb) * 255.0).astype(np.uint8)


def _green_u8_device(mask_bool):
    g = np.asarray(sdf_green_device(jnp.asarray(mask_bool)))
    return (g.astype(np.float64) * 255.0).astype(np.uint8)


def _check(mask_bool):
    np.testing.assert_array_equal(_green_u8_device(mask_bool),
                                  _green_u8_host(mask_bool))


def test_sdf_device_square():
    mask = np.zeros((160, 160), bool)
    mask[20:40, 20:40] = True
    _check(mask)


def test_sdf_device_random_blobs():
    rng = np.random.default_rng(0)
    for trial in range(4):
        mask = np.zeros((96, 128), bool)
        for _ in range(3):
            y, x = rng.integers(0, 80), rng.integers(0, 110)
            h, w = rng.integers(4, 30), rng.integers(4, 30)
            mask[y:y + h, x:x + w] = True
        _check(mask)


def test_sdf_device_speckle():
    rng = np.random.default_rng(1)
    mask = rng.random((64, 200)) > 0.95
    _check(mask)


def test_sdf_device_empty_and_full():
    _check(np.zeros((48, 48), bool))
    _check(np.ones((48, 48), bool))


def test_sdf_device_large_distances_clamp():
    """Distances far beyond the 64px window clamp identically to scipy inf."""
    mask = np.zeros((300, 300), bool)
    mask[0, 0] = True
    _check(mask)


def test_signed_distance_device_exact_within_window():
    mask = np.zeros((100, 100), bool)
    mask[40:60, 40:60] = True
    ours = np.asarray(signed_distance_device(jnp.asarray(mask)))
    ref = signed_distance(mask)
    sel = np.abs(ref) <= 60
    np.testing.assert_allclose(ours[sel], ref[sel], atol=1e-4)
