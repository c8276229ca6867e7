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


def to_i420(frames) -> "np.ndarray":
    """Host-side RGB -> planar I420, one call per batch (cv2). Every frame
    must have even H and W. Counterpart of i420_to_rgb: callers convert here,
    upload half the bytes, and the device converts back."""
    import cv2
    import numpy as np
    return np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in frames])


def i420_to_rgb(planes_u8: jnp.ndarray) -> jnp.ndarray:
    """Planar YUV 4:2:0 (I420) -> RGB float in [0,1], on device.

    Input [B, H*3/2, W] uint8: H rows of Y, then the U plane (H/2 x W/2) packed
    into H/4 rows, then V likewise (the layout cv2.COLOR_RGB2YUV_I420 emits and
    every H.264/HEVC/VP9 decoder natively produces). Shipping I420 instead of
    RGB halves host->device transfer — the scarce resource on PCIe and the
    dominant cost over a remote tunnel — and the codec already stored 4:2:0, so
    the subsampling loses nothing the source had. Uses the BT.601 video-range
    matrix (cv2's I420 convention); chroma upsamples nearest-neighbor.
    """
    b, h32, w = planes_u8.shape
    h = h32 * 2 // 3
    # slice planes at FLAT element offsets: the U plane occupies h*w/4
    # elements starting at h*w, which is h/4 rows only when h % 4 == 0 —
    # flat slicing handles every even geometry (e.g. 270-row 21:9 frames)
    flat = planes_u8.reshape(b, -1)
    y = flat[:, :h * w].reshape(b, h, w).astype(jnp.float32)
    u = flat[:, h * w:h * w + h * w // 4].reshape(b, h // 2, w // 2)
    v = flat[:, h * w + h * w // 4:].reshape(b, h // 2, w // 2)

    def up2(p):  # [B, H/2, W/2] -> [B, H, W] nearest
        p = jnp.broadcast_to(p[:, :, None, :, None],
                             (b, h // 2, 2, w // 2, 2))
        return p.reshape(b, h, w).astype(jnp.float32)

    uc = up2(u) - 128.0
    vc = up2(v) - 128.0
    ys = 1.164 * (y - 16.0)  # video-range Y (16..235), ITU-R BT.601
    r = ys + 1.596 * vc
    g = ys - 0.391 * uc - 0.813 * vc
    bl = ys + 2.018 * uc
    rgb = jnp.stack([r, g, bl], axis=-1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)


def i420_frames_to_hsv_planes(planes_u8: jnp.ndarray) -> jnp.ndarray:
    """I420 frames [B, H*3/2, W] uint8 -> flattened HSV planes [B, H*W*3]
    (the half-transfer variant of frames_to_hsv_planes)."""
    hsv = rgb_to_hsv(i420_to_rgb(planes_u8))
    return hsv.reshape(hsv.shape[0], -1)


def frames_to_hsv_planes(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB frames [B, H, W, 3] -> flattened HSV planes [B, H*W*3] float32.

    The flattened layout puts all of a frame's values on the lane dimension so
    downstream pairwise-diff kernels see well-tiled 2D arrays.
    """
    x = frames_u8.astype(jnp.float32) / 255.0
    hsv = rgb_to_hsv(x)
    b = hsv.shape[0]
    return hsv.reshape(b, -1)
