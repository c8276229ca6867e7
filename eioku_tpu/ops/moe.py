"""Mixture-of-experts layer with expert parallelism (EP).

Completes the framework's sharding vocabulary (DP, Megatron TP, sequence-
parallel ring attention, pipeline parallelism) with the expert axis: E expert
FFNs whose weights shard over the mesh `model` axis, tokens routed top-1
(Switch style) with a fixed per-expert capacity so every shape is static.

TPU-first design: dispatch and combine are one-hot einsums (the GShard
formulation) rather than gather/scatter — the whole layer is three einsums
plus the expert FFN, everything maps onto the MXU, and XLA inserts the
all-to-all-equivalent collectives from the sharding annotations alone
(tokens P("data"), expert weights P("model")). No shard_map needed; the
layer composes with DP/TP inside any jitted program.

The reference has no mixture-of-experts anywhere (and no device parallelism
at all, SURVEY.md §2.4); this exists so the serving runtime covers the full
tp/pp/dp/sp/ep design space for future model families.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoeParams(NamedTuple):
    router: jax.Array   # [d, E]
    w1: jax.Array       # [E, d, ffn]
    b1: jax.Array       # [E, ffn]
    w2: jax.Array       # [E, ffn, d]
    b2: jax.Array       # [E, d]


def init_moe_params(d: int, ffn: int, n_experts: int, seed: int = 0,
                    dtype=jnp.float32) -> MoeParams:
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    scale1 = (2.0 / d) ** 0.5
    scale2 = (2.0 / ffn) ** 0.5
    return MoeParams(
        router=(jax.random.normal(k[0], (d, n_experts)) * 0.02).astype(dtype),
        w1=(jax.random.normal(k[1], (n_experts, d, ffn)) * scale1).astype(dtype),
        b1=jnp.zeros((n_experts, ffn), dtype),
        w2=(jax.random.normal(k[2], (n_experts, ffn, d)) * scale2).astype(dtype),
        b2=jnp.zeros((n_experts, d), dtype),
    )


def shard_moe_params(params: MoeParams, mesh: Mesh) -> MoeParams:
    """Expert parallelism: the leading expert axis shards over `model`
    (E % mesh.shape['model'] == 0 so each device holds E/S whole experts);
    the router replicates."""
    return MoeParams(
        router=jax.device_put(params.router, NamedSharding(mesh, P())),
        w1=jax.device_put(params.w1, NamedSharding(mesh, P("model"))),
        b1=jax.device_put(params.b1, NamedSharding(mesh, P("model"))),
        w2=jax.device_put(params.w2, NamedSharding(mesh, P("model"))),
        b2=jax.device_put(params.b2, NamedSharding(mesh, P("model"))),
    )


def moe_ffn(params: MoeParams, x: jax.Array,
            capacity_factor: float = 1.25) -> jax.Array:
    """Top-1 (Switch) MoE FFN over tokens x [n, d] -> [n, d].

    Tokens beyond an expert's capacity C = ceil(n/E * factor) are dropped
    (standard Switch behavior: their output is 0 — callers use this inside a
    residual connection, so a dropped token passes through unchanged).
    """
    n, d = x.shape
    n_experts = params.router.shape[1]
    capacity = int((n / n_experts) * capacity_factor + 0.999) or 1

    logits = x @ params.router                        # [n, E]
    gates = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(gates, axis=-1)               # [n]
    gate = jnp.take_along_axis(gates, expert[:, None], axis=1)[:, 0]  # [n]

    onehot = jax.nn.one_hot(expert, n_experts, dtype=x.dtype)  # [n, E]
    # position of each token within its expert's queue (exclusive cumsum)
    pos = (jnp.cumsum(onehot, axis=0) - onehot) * onehot       # [n, E]
    keep = (pos < capacity) * onehot                           # [n, E]
    pos_oh = jax.nn.one_hot(pos.sum(axis=1).astype(jnp.int32), capacity,
                            dtype=x.dtype)                     # [n, C]

    # dispatch[n, E, C]: token n goes to slot C of expert E (or nowhere)
    dispatch = keep[:, :, None] * pos_oh[:, None, :]
    combine = dispatch * gate[:, None, None]

    xs = jnp.einsum("nec,nd->ecd", dispatch, x)                # [E, C, d]
    h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", xs, params.w1)
                    + params.b1[:, None, :])
    ys = jnp.einsum("ecf,efd->ecd", h, params.w2) + params.b2[:, None, :]
    return jnp.einsum("nec,ecd->nd", combine, ys)              # [n, d]


def moe_ffn_reference(params: MoeParams, x: jax.Array) -> jax.Array:
    """Per-token loop-free reference (no capacity limit) for parity tests."""
    gates = jax.nn.softmax(x @ params.router, axis=-1)
    expert = jnp.argmax(gates, axis=-1)
    gate = jnp.take_along_axis(gates, expert[:, None], axis=1)[:, 0]
    w1 = params.w1[expert]                                     # [n, d, ffn]
    w2 = params.w2[expert]
    h = jax.nn.gelu(jnp.einsum("nd,ndf->nf", x, w1) + params.b1[expert])
    y = jnp.einsum("nf,nfd->nd", h, w2) + params.b2[expert]
    return y * gate[:, None]
