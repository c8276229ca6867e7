"""Fused on-device resize + normalize preprocessing.

The north-star design calls for "host-side ffmpeg decode feeds batched frame
tensors into fused JAX/Pallas resize+normalize preprocessing" (BASELINE.json).
Bilinear resize is expressed as two dense interpolation matmuls — rows then
columns — which XLA fuses with the uint8->float normalization into one MXU
program: out = Ry @ img @ Rx^T. This moves per-frame cv2.resize work off the
host CPU (the decode thread) onto the TPU, and the interpolation matrices are
cached per (in, out) geometry.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (align_corners=False,
    matching cv2.INTER_LINEAR / jax.image 'linear')."""
    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        w_hi = src - lo
        lo_c = min(max(lo, 0), n_in - 1)
        hi_c = min(max(lo + 1, 0), n_in - 1)
        m[o, lo_c] += 1.0 - w_hi
        m[o, hi_c] += w_hi
    return m


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(frames: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """frames [B, H, W, C] (any float/int dtype) -> [B, out_h, out_w, C] float32.

    Two matmuls: rows ([oh, H] @ [B, H, W*C]) then columns.
    """
    b, h, w, c = frames.shape
    x = frames.astype(jnp.float32)
    ry = jnp.asarray(_interp_matrix(h, out_h))   # [oh, H]
    rx = jnp.asarray(_interp_matrix(w, out_w))   # [ow, W]
    # rows: einsum over H
    x = jnp.einsum("oh,bhwc->bowc", ry, x, preferred_element_type=jnp.float32)
    # cols: einsum over W
    x = jnp.einsum("pw,bowc->bopc", rx, x, preferred_element_type=jnp.float32)
    return x


@partial(jax.jit, static_argnames=("out_h", "out_w", "pad_value"))
def letterbox_resize_normalize(frames_u8: jnp.ndarray, out_h: int, out_w: int,
                               pad_value: float = 114.0) -> jnp.ndarray:
    """Fused device letterbox: uint8 [B, H, W, 3] -> float [B, out_h, out_w, 3]
    in [0, 1], aspect preserved, gray padding. Scale/pad math matches
    eioku_tpu.ml.detection.letterbox_batch."""
    b, h, w, _ = frames_u8.shape
    scale = min(out_h / h, out_w / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    pad_y, pad_x = (out_h - nh) // 2, (out_w - nw) // 2
    resized = resize_bilinear(frames_u8, nh, nw)
    out = jnp.full((b, out_h, out_w, 3), pad_value, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (0, pad_y, pad_x, 0))
    return out / 255.0


def letterbox_geometry(h: int, w: int, size: int) -> tuple[float, int, int]:
    """(scale, pad_x, pad_y) used to map boxes back to source pixels."""
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return scale, (size - nw) // 2, (size - nh) // 2
