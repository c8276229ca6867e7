"""Functional neural-net building blocks over param pytrees.

All models in this framework are pure functions over nested dicts of jnp arrays
(no module framework): explicit, jit/pjit-friendly, and trivially shardable with
jax.sharding. Conventions:
  - activations NHWC (TPU-native layout; conv weights HWIO)
  - params stored float32, compute in bfloat16 on TPU with float32 accumulation
    (preferred_element_type) — set by the caller via `cast_params`
  - batchnorm is inference-mode scale/shift (fused by XLA into the conv)

The reference delegates all of this to torch/CUDA via ultralytics etc.
(/root/reference/ml-service/src/services/model_manager.py); these blocks are the
TPU-native foundation those model families are rebuilt on.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# -- initializers ----------------------------------------------------------------


def _fan_in(shape: tuple[int, ...]) -> int:
    if len(shape) == 4:  # HWIO
        return shape[0] * shape[1] * shape[2]
    return shape[0]


def kaiming(key, shape, dtype=jnp.float32):
    bound = math.sqrt(2.0 / _fan_in(shape))
    return jax.random.normal(key, shape, dtype) * bound


def xavier(key, shape, dtype=jnp.float32):
    fan_in = _fan_in(shape)
    fan_out = shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class KeyGen:
    """Deterministic key splitter for param init."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


# -- primitive ops ----------------------------------------------------------------


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding="TORCH", groups: int = 1,
           dilation: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO weights; fp32 accumulation on MXU.

    Default padding "TORCH" = symmetric (k-1)//2 per spatial dim — the
    padding every converted torch checkpoint (ultralytics autopad k//2,
    torchvision/EasyOCR p=k//2) was trained with. XLA "SAME" is NOT
    equivalent for stride > 1: it pads asymmetrically ((0,1) for k3s2,
    (2,3) for k7s2), sampling a one-pixel-shifted grid that compounds
    through every downsampling layer.
    """
    if padding == "TORCH":
        ph = dilation * (w.shape[0] - 1) // 2
        pw = dilation * (w.shape[1] - 1) // 2
        padding = [(ph, ph), (pw, pw)]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # accumulate fp32, keep activations in the input dtype
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def batchnorm(x: jnp.ndarray, p: Params, eps: float = 1e-3) -> jnp.ndarray:
    """Inference-mode BN: y = (x - mean) * gamma / sqrt(var + eps) + beta.

    Pre-fold scale/shift once per call; XLA fuses the affine into the conv.
    """
    scale = (p["gamma"] / jnp.sqrt(p["var"] + eps)).astype(x.dtype)
    shift = (p["beta"] - p["mean"] * p["gamma"] / jnp.sqrt(p["var"] + eps)).astype(x.dtype)
    return x * scale + shift


def init_batchnorm(ch: int) -> Params:
    return {"gamma": jnp.ones(ch), "beta": jnp.zeros(ch),
            "mean": jnp.zeros(ch), "var": jnp.ones(ch)}


def linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    if "w_q" in p:  # int8-quantized params (ops/quant.py) — trace-time branch
        from eioku_tpu.ops.quant import linear_q

        return linear_q(x, p)
    out = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def init_linear(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    p = {"w": xavier(key, (d_in, d_out))}
    if bias:
        p["b"] = jnp.zeros(d_out)
    return p


def layernorm(x: jnp.ndarray, p: Params, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)  # stats at full precision even for bf16 acts
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["gamma"].astype(x.dtype) + p["beta"].astype(x.dtype)


def init_layernorm(dim: int) -> Params:
    return {"gamma": jnp.ones(dim), "beta": jnp.zeros(dim)}


def max_pool(x: jnp.ndarray, k: int, stride: int = 1,
             padding="TORCH") -> jnp.ndarray:
    """Default "TORCH" = symmetric (k-1)//2 (torch's p=k//2 for odd k, p=0
    for the k=2 VGG pools) — see conv2d on why XLA "SAME" mismatches."""
    if padding == "TORCH":
        p = (k - 1) // 2
        padding = [(0, 0), (p, p), (p, p), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, stride, stride, 1),
        padding=padding)


def avg_pool_global(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2))


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC (ultralytics' Upsample mode)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample, NHWC, half-pixel centers — torch
    F.interpolate(mode='bilinear', align_corners=False), CRAFT's mode."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


# -- attention ---------------------------------------------------------------------


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_heads: int,
        mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Multi-head attention over [B, S, D] inputs (already projected).

    Uses fp32 softmax accumulation; swap-in point for the Pallas flash-attention
    kernel (eioku_tpu.ops.flash_attention) for long sequences.
    """
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // n_heads
    q = q.reshape(b, sq, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, sk, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, sk, n_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, d)


# -- param utilities -----------------------------------------------------------------


def cast_params(params: Params, dtype) -> Params:
    return jax.tree.map(
        lambda a: a.astype(dtype) if isinstance(a, jnp.ndarray)
        and jnp.issubdtype(a.dtype, jnp.floating) else a, params)


def param_count(params: Params) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
