"""Color-space conversions as vectorized JAX ops (VPU-friendly, fused by XLA).

Replaces the reference's delegation of scene scoring to the ffmpeg `scenecut`
filter (/root/reference/ml-service/src/services/model_manager.py:726-805) with
an on-device pipeline: uint8 RGB frames -> normalized HSV planes.
"""
from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """Vectorized RGB -> HSV. Input [..., 3] float in [0,1]; output [..., 3]
    with h, s, v all in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    # hue sector selection
    h_r = ((g - b) / safe_d) % 6.0
    h_g = (b - r) / safe_d + 2.0
    h_b = (r - g) / safe_d + 4.0
    h = jnp.where(mx == r, h_r, jnp.where(mx == g, h_g, h_b)) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def frames_to_hsv_planes(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB frames [B, H, W, 3] -> flattened HSV planes [B, H*W*3] float32.

    The flattened layout puts all of a frame's values on the lane dimension so
    downstream pairwise-diff kernels see well-tiled 2D arrays.
    """
    x = frames_u8.astype(jnp.float32) / 255.0
    hsv = rgb_to_hsv(x)
    b = hsv.shape[0]
    return hsv.reshape(b, -1)
