"""Pairwise frame-difference scoring — the scene-detection hot loop as a Pallas
TPU kernel.

Replaces the reference's ffmpeg `select='gt(scene,T)'` subprocess
(/root/reference/ml-service/src/services/model_manager.py:715-835) with a
ContentDetector-style metric computed on device: score[i] = mean |hsv[i+1] -
hsv[i]| over all pixels/channels, in [0,1].

The kernel reads two adjacent frame rows per grid step and reduces to one
scalar; with a chained prev-frame carry between batches the whole video is
scored with zero host round-trips inside a batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_ROWS = 8  # sublane tile for float32


def _diff_kernel(a_ref, b_ref, out_ref):
    """Grid step i: out[8i:8i+8] = rowwise sum |b - a| for an (8, D) row tile.

    Padding lanes/rows are zero in both inputs, so they cancel in the
    subtraction; the caller divides by the true element count and trims padded
    rows.
    """
    out_ref[:, :] = jnp.sum(jnp.abs(b_ref[:, :] - a_ref[:, :]), axis=1,
                            keepdims=True)


def _pallas_pair_diff(frames: jnp.ndarray, true_dim: int) -> jnp.ndarray:
    n, d = frames.shape
    m = n - 1  # number of adjacent pairs
    mp = _round_up(m, _ROWS)
    a = frames[:-1]
    b = frames[1:]
    if mp != m:
        a = jnp.pad(a, ((0, mp - m), (0, 0)))
        b = jnp.pad(b, ((0, mp - m), (0, 0)))
    sums = pl.pallas_call(
        _diff_kernel,
        grid=(mp // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(a, b)
    return sums[:m, 0] / float(true_dim)


def _jnp_pair_diff(frames: jnp.ndarray, true_dim: int) -> jnp.ndarray:
    return jnp.sum(jnp.abs(frames[1:] - frames[:-1]), axis=-1) / float(true_dim)


@partial(jax.jit, static_argnames=("use_pallas",))
def scene_scores(prev_plane: jnp.ndarray, planes: jnp.ndarray,
                 use_pallas: bool = True) -> jnp.ndarray:
    """Score each frame against its predecessor.

    prev_plane: [D] — last frame of the previous batch (zeros => first batch,
    producing score 0 for the first frame by convention of the caller mask).
    planes: [B, D] HSV planes.
    Returns [B] scores in [0,1]: score[i] = mean-abs-diff(frame i, frame i-1).
    """
    d = planes.shape[-1]
    dp = _round_up(d, LANE)
    chain = jnp.concatenate([prev_plane[None, :], planes], axis=0)
    if dp != d:
        chain = jnp.pad(chain, ((0, 0), (0, dp - d)))
    if use_pallas:
        return _pallas_pair_diff(chain, d)
    return _jnp_pair_diff(chain, d)
