"""Flash attention (forward) as a Pallas TPU kernel.

Used by the Whisper encoder (1500-position sequences, SURVEY.md build plan 4d)
and available to any transformer in the framework. Online-softmax tiling: the
(seq, seq) score matrix is never materialized; running max/sum/output live in
VMEM scratch across KV tiles. Supports causal masking (with whole-tile skip
above the diagonal) and per-batch KV length masking for padded batches.

Numerics follow the production recipe: fp32 statistics and accumulation,
mask value -0.7*float32.max (not -inf), safe division for fully-masked rows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _flash_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, scale, causal, block_q, block_k,
                  kv_tiles):
    b = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b]
    in_range = kv_idx * block_k < length
    below_diag = True
    if causal:
        below_diag = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(in_range & below_diag)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)  # [bq, d]
        k = k_ref[0, 0].astype(jnp.float32)  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]

        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + kv_idx * block_k
        mask = col_ids < length
        if causal:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + q_idx * block_q
            mask = mask & (col_ids <= row_ids)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)        # [bq, 128] broadcast
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :block_k])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0].astype(jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("causal", "scale", "force_pallas"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    lengths: jnp.ndarray | None = None, causal: bool = False,
                    scale: float | None = None,
                    force_pallas: bool = False) -> jnp.ndarray:
    """q, k, v: [B, H, S, D]; padding to 128-multiples handled here.
    lengths: [B] valid KV lengths (None = all). Returns [B, H, Sq, D].
    On the CPU backend the numerically identical reference path is used unless
    force_pallas (interpret mode, for kernel tests)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    sq_p = -(-sq // BLOCK_Q) * BLOCK_Q
    skv_p = -(-skv // BLOCK_K) * BLOCK_K
    if lengths is None:
        lengths = jnp.full((b,), skv, jnp.int32)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    kv_tiles = skv_p // BLOCK_K

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu and not force_pallas:
        out = _reference_attention(q, k, v, lengths, causal, scale)
        return out[:, :, :sq]

    grid = (b, h, sq_p // BLOCK_Q, kv_tiles)
    out = pl.pallas_call(
        partial(_flash_kernel, scale=scale, causal=causal, block_q=BLOCK_Q,
                block_k=BLOCK_K, kv_tiles=kv_tiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, BLOCK_Q, d), lambda b, h, qi, ki, *prefetch: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, BLOCK_K, d), lambda b, h, qi, ki, *prefetch: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, BLOCK_K, d), lambda b, h, qi, ki, *prefetch: (b, h, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, BLOCK_Q, d),
                                   lambda b, h, qi, ki, *prefetch: (b, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_Q, 128), jnp.float32),  # m
                pltpu.VMEM((BLOCK_Q, 128), jnp.float32),  # l
                pltpu.VMEM((BLOCK_Q, d), jnp.float32),    # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=on_cpu,
    )(lengths.astype(jnp.int32), q, k, v)
    return out[:, :, :sq]


def _reference_attention(q, k, v, lengths, causal, scale):
    """Naive attention with identical masking semantics (test oracle + CPU path)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    skv = k.shape[2]
    col = jnp.arange(skv)
    mask = col[None, :] < lengths[:, None]  # [B, Skv]
    mask = mask[:, None, None, :]
    if causal:
        row = jnp.arange(q.shape[2])
        mask = mask & (col[None, None, None, :] <= row[None, None, :, None])
    s = jnp.where(mask, s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    # fully-masked rows (query padding) produce uniform weights; zero them
    any_valid = mask.any(axis=-1, keepdims=True)
    p = jnp.where(any_valid, p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
                      ).astype(q.dtype)
