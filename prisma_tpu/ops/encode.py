"""Band-encoding ops, written in JAX so they fuse into model graphs as epilogues.

Behavioral contract comes from the reference implementation
(`/root/reference/bands/common/encode.py`, `/root/reference/bands/common/io.py`):

- ``hue_to_rgb`` / ``heat_to_rgb``: LYGIA-compatible hue ramp; depth heatmaps are
  ``hue_to_rgb((1 - heat) * 0.65)`` (encode.py:13-33).
- ``rgb_to_heat``: inverse via HSV hue, ``clip(1 - hue * 1.538461538, 0, 1)``
  (encode.py:36-64).
- ``sobel_edge``: |Sobel| of the uint8-quantized map with a ksize=1 (pure central
  difference) kernel and REFLECT_101 borders, normalized by its max (encode.py:81-95).
- ``depth_to_heatmap``: the write_depth(heatmap=True) pipeline (io.py:138-166) —
  normalize -> optional flip -> heatmap -> edge-desaturate -> optional min/max range
  pixels at (0,0)/(0,1) packed with ``float_to_rgb(v, 0, 1000)``.
- ``process_flow``: normalize by max displacement, angle -> hue, radius -> saturation
  (encode.py:113-126). ``encode_flow``: 16-bit packed flow + validity (encode.py:105-110).

Unlike the reference (numpy on host, per-frame), every function here is traced by XLA
and runs on TPU, typically fused onto the tail of a model's jitted forward pass and
mapped over a batch of frames.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp


def hue_to_rgb(hue: jax.Array) -> jax.Array:
    """Map hue in [0,1] to an RGB ramp. Channels stacked on a new trailing axis."""
    offs = jnp.asarray([0.0, 4.0, 2.0], dtype=hue.dtype)
    k = hue[..., None] * 6.0 + offs
    return jnp.clip(jnp.abs(jnp.mod(k, 6.0) - 3.0) - 1.0, 0.0, 1.0)


def heat_to_rgb(heat: jax.Array) -> jax.Array:
    """Depth heatmap encoding: blue = near (heat 0), red = far (heat 1)."""
    return hue_to_rgb((1.0 - heat) * 0.65)


def rgb_hue(rgb: jax.Array) -> jax.Array:
    """HSV hue in degrees [0, 360) from float RGB, matching the reference's
    argmax-channel formulation (first-max wins on ties)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxv = jnp.max(rgb, axis=-1)
    minv = jnp.min(rgb, axis=-1)
    maxc = jnp.argmax(rgb, axis=-1)
    minc = jnp.argmin(rgb, axis=-1)
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, rgb.dtype)
    span = maxv - minv + eps
    h0 = jnp.mod((g - b) * 60.0 / span, 360.0)
    h1 = (b - r) * 60.0 / span + 120.0
    h2 = (r - g) * 60.0 / span + 240.0
    hue = jnp.where(maxc == 0, h0, jnp.where(maxc == 1, h1, h2))
    return jnp.where(maxc == minc, 0.0, hue)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """Full HSV from float RGB (reference encode.py:36-59): H in degrees
    [0, 360), S = 1 - min/max, V = max."""
    maxv = jnp.max(rgb, axis=-1)
    minv = jnp.min(rgb, axis=-1)
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, rgb.dtype)
    s = jnp.where(maxv == 0, 0.0, 1.0 - minv / (maxv + eps))
    return jnp.stack([rgb_hue(rgb), s, maxv], axis=-1)


def encode_polar(a: jax.Array, rad: jax.Array) -> jax.Array:
    """Angle [0,1] -> hue, radius [0,1] -> saturation (reference
    encode.py:90-102; the HSV step of the flow visualization)."""
    return saturation(hue_to_rgb(a), rad)


def rgb_to_heat(rgb: jax.Array) -> jax.Array:
    """Decode a heatmap RGB back to heat in [0,1] (inverse of heat_to_rgb)."""
    hue = rgb_hue(rgb) / 360.0
    return jnp.clip(1.0 - hue * 1.538461538, 0.0, 1.0)


def saturation(rgb: jax.Array, sat: jax.Array) -> jax.Array:
    """Blend toward white by (1 - sat); sat broadcasts over the channel axis."""
    sat = jnp.asarray(sat)[..., None]
    return rgb * sat + (1.0 - sat)


def sobel_edge(channel: jax.Array) -> jax.Array:
    """|Sobel| edge magnitude of a [0,1] map, max-normalized to [0,1].

    Matches cv2.Sobel(ksize=1) on the uint8 quantization of the input: a pure
    [-1, 0, 1] central difference per axis with REFLECT_101 borders.
    """
    q = jnp.floor(channel * 255.0)  # uint8 quantization (values are in [0, 255])
    p = jnp.pad(q, 1, mode="reflect")
    gx = p[1:-1, 2:] - p[1:-1, :-2]
    gy = p[2:, 1:-1] - p[:-2, 1:-1]
    mag = jnp.sqrt(gx * gx + gy * gy)
    peak = jnp.max(mag)
    return jnp.where(peak > 0, mag / peak, jnp.zeros_like(mag))


def float_to_rgb(value: jax.Array, min_value=0.0, max_value=1.0, base: int = 256) -> jax.Array:
    """Pack a float into 3 channels of [0,1] with 24-bit fixed-point precision."""
    span = float(base) ** 3 - 1.0
    L = jnp.clip((value - min_value) / (max_value - min_value), 0.0, 1.0) * span
    lo = jnp.floor(jnp.mod(L, base))
    mid = jnp.mod(jnp.floor(L / base), base)
    hi = jnp.mod(jnp.floor(L / (base * base)), base)
    return jnp.stack([lo, mid, hi], axis=-1) / (base - 1.0)


def nearest_power_of_two(x: float) -> int:
    """Smallest power of two >= x (reference encode.py:129-131)."""
    return int(2 ** math.ceil(math.log(x) / math.log(2)))


def encode_data_into_img(data, min_value=0.0, max_value=1.0, base: int = 256,
                         gain: float = 1.0):
    """Pack an [N] or [N, 1|3|4] data array into a square power-of-two
    data-texture image (reference encode.py:149-231), vectorized.

    Scalar data packs each value into 24-bit RGB fixed point via
    `float_to_rgb(value*gain, 0, max_value)`; 3/4-vector data min/max
    normalizes per channel. Reference quirks preserved: scalar values land
    at img[x, y] (transposed) while vectors land at img[y, x], and the
    scalar path ignores min_value (packs against [0, max_value]).
    """
    data = np.asarray(data)
    n = data.shape[0]
    k = 1 if data.ndim == 1 else data.shape[1]
    size = nearest_power_of_two(math.sqrt(n)) if n > 1 else 1
    img = np.zeros((size, size, max(3, k)), np.float64)
    idx = np.arange(n)
    xs, ys = idx % size, idx // size
    if k == 1:
        # float64 numpy (not the jnp float_to_rgb): f32 rounding flips floor
        # boundaries by 1/255 vs the reference's float64 packing
        vals = data.reshape(-1).astype(np.float64) * gain
        span = float(base) ** 3 - 1.0
        L = np.clip(vals / float(max_value), 0.0, 1.0) * span
        img[xs, ys] = np.stack([np.floor(L % base),
                                np.floor(L / base) % base,
                                np.floor(L / (base * base)) % base],
                               axis=-1) / (base - 1.0)
    else:
        lo = np.broadcast_to(np.asarray(min_value, np.float64), (k,))
        hi = np.broadcast_to(np.asarray(max_value, np.float64), (k,))
        img[ys, xs] = (data - lo) / (hi - lo)
    return img


def depth_to_heatmap(
    depth: jax.Array,
    normalize: bool = True,
    flip: bool = False,
    encode_range: bool = True,
):
    """Full write_depth(heatmap=True) pipeline on-device.

    Args:
      depth: [H, W] float depth/disparity map.
    Returns:
      (rgb_u8 [H, W, 3] uint8, depth_min scalar, depth_max scalar)
    """
    depth = depth.astype(jnp.float32)
    depth_min = jnp.min(depth)
    depth_max = jnp.max(depth)
    if normalize:
        depth = (depth - depth_min) / (depth_max - depth_min)
    if flip:
        depth = 1.0 - depth
    edge = sobel_edge(depth)
    rgb = heat_to_rgb(depth)
    rgb = saturation(rgb, 1.0 - edge)
    if encode_range:
        rgb = rgb.at[0, 0].set(float_to_rgb(depth_min, 0.0, 1000.0))
        rgb = rgb.at[0, 1].set(float_to_rgb(depth_max, 0.0, 1000.0))
    rgb_u8 = jnp.floor(rgb * 255.0).astype(jnp.uint8)
    return rgb_u8, depth_min, depth_max


def process_flow(flow: jax.Array):
    """HSV-encode a flow field [H, W, 2] -> (rgb_u8 [H, W, 3], max_distance)."""
    flow = flow.astype(jnp.float32)
    dist = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    max_distance = jnp.max(dist)
    dx = flow[..., 0] / max_distance
    dy = flow[..., 1] / max_distance
    rad = jnp.sqrt(dx * dx + dy * dy)
    ang = (jnp.arctan2(dy, dx) / jnp.pi + 1.0) * 0.5
    rgb = saturation(hue_to_rgb(ang), rad)
    rgb_u8 = jnp.floor(rgb * 255.0).astype(jnp.uint8)
    return rgb_u8, max_distance


def encode_flow(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """Pack flow + validity mask into a 3-channel uint16 image.

    Flow is biased to 2**15 and scaled by 2**8; pixels that over/underflow the
    16-bit range are invalidated in the mask channel.
    """
    f = 2.0 ** 15 + flow.astype(jnp.float32) * (2.0 ** 8)
    valid = mask.astype(bool)
    valid &= jnp.max(f, axis=-1) < (2 ** 16 - 1)
    valid &= jnp.min(f, axis=-1) > 0
    return jnp.concatenate(
        [f.astype(jnp.uint16), valid[..., None].astype(jnp.uint16) * (2 ** 16 - 1)],
        axis=-1,
    )


def mask_to_rgb(mask: jax.Array) -> jax.Array:
    """Binary/uint mask -> white-on-black RGB uint8 (1 -> 255, else value)."""
    m = jnp.where(mask == 1, 255, mask).astype(jnp.uint8)
    return jnp.stack([m, m, m], axis=-1)
