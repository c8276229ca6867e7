"""Ring attention: context-parallel attention with communication/compute overlap.

For sequences too long for one chip's memory (e.g. hour-scale audio encoded as
one context instead of 30 s windows), KV shards rotate around the mesh ring via
ppermute while each chip computes attention on the shard in front of it,
maintaining online-softmax statistics; after N-1 rotations every query has seen
every key. Communication is point-to-point (neighbor-only, rides ICI) and
overlaps with the attention matmuls.

Runs under shard_map over the mesh axis that shards the KV sequence. The
statistics math mirrors ops/flash_attention.py's online softmax, applied across
chips instead of tiles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MASK_VALUE = -0.7 * 3.4e38


def _local_attention_stats(q, k, v, scale):
    """Partial attention of q against one KV shard.
    q [B,H,Sq,D], k/v [B,H,Skv,D] -> (o_unnorm [B,H,Sq,D], m [B,H,Sq,1],
    l [B,H,Sq,1])."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o, m, l


def _ring_body(q, k_shard, v_shard, axis_name: str, scale: float):
    n = jax.lax.psum(1, axis_name)

    def step(carry, _):
        o, m, l, k_blk, v_blk = carry
        o_new, m_new, l_new = _local_attention_stats(q, k_blk, v_blk, scale)
        m_next = jnp.maximum(m, m_new)
        alpha = jnp.exp(m - m_next)
        beta = jnp.exp(m_new - m_next)
        o = o * alpha + o_new * beta
        l = l * alpha + l_new * beta
        m = m_next
        # rotate KV to the next chip (overlaps with the next step's matmuls)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (o, m, l, k_blk, v_blk), None

    b, h, sq, d = q.shape
    init = (
        jnp.zeros((b, h, sq, d), jnp.float32),
        jnp.full((b, h, sq, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, sq, 1), jnp.float32),
        k_shard, v_shard,
    )
    (o, m, l, _, _), _ = jax.lax.scan(step, init, None, length=n)
    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis_name: str = "data",
                   scale: float | None = None) -> jnp.ndarray:
    """Full attention with the KV sequence sharded over `axis_name`.

    q, k, v: [B, H, S, D] global arrays (S divisible by the axis size).
    Queries are also sequence-sharded (each chip computes its query block
    against every KV block as it rotates past).
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        partial(_ring_body, axis_name=axis_name, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return jax.jit(fn)(q, k, v)
