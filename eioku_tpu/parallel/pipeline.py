"""Pipeline parallelism: GPipe-style microbatch rotation over a mesh axis.

Completes the framework's sharding vocabulary (DP in parallel/inference.py,
Megatron TP in parallel/mesh.py, sequence parallelism in ops/ring_attention.py)
with layer-pipelined execution for checkpoints whose weights overflow one
chip's HBM: consecutive layer blocks live on consecutive devices of the
`model` axis, activations flow stage-to-stage via `lax.ppermute` inside a
`lax.scan` schedule, and the batch is cut into microbatches so every stage
stays busy once the pipeline fills (bubble = (S-1)/(S-1+M) of the schedule).

The reference has no device parallelism of any kind (SURVEY.md §2.4) — its
answer to a too-big model is "use a bigger GPU". Here the same checkpoint
spans chips with XLA inserting point-to-point ICI transfers.

Design notes (TPU-first):
- The whole schedule is ONE jitted program: a `lax.scan` over S+M-1 ticks,
  each tick running every stage's block on its local microbatch and one
  ppermute. No per-microbatch Python dispatch, no host round-trips.
- Stage blocks must be shape-uniform (same activation shape in/out), the
  natural fit for the transformer trunks this framework serves (whisper
  encoder/decoder layers, MiniLM layers). Embedding/head live outside the
  pipelined trunk.
- Params carry a leading [n_stages, ...] axis sharded over `model`, so each
  device holds only its own block's weights — the HBM win that motivates PP.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(per_stage_params: list) -> jax.Array:
    """Stack S per-stage pytrees into one pytree with leading [S, ...] leaves
    (the layout pipeline_apply shards over the `model` axis)."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_stage_params)


def _pipeline_local(stage_params, x_micro, stage_fn: Callable,
                    n_stages: int, axis: str, varying_axes: tuple):
    """Body run per-device inside shard_map: full GPipe schedule as lax.scan.

    stage_params: this stage's block params (leading stage axis stripped).
    x_micro: [M, mb, ...] microbatches — identical on every stage (replicated
    over the pipeline axis); stage 0 is the only one that ingests them.
    Returns [M, mb, ...] outputs — nonzero only on the last stage, which the
    caller reads via an axis slice (or a psum, since other stages emit 0).
    """
    stage = jax.lax.axis_index(axis)
    n_micro = x_micro.shape[0]
    mb_shape = x_micro.shape[1:]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        buf, outs = carry
        # stage 0 ingests microbatch t (clamped: past the ramp-down it just
        # recomputes the last microbatch, whose output is never stored)
        feed = x_micro[jnp.clip(t, 0, n_micro - 1)]
        inp = jnp.where(stage == 0, feed, buf)
        y = stage_fn(stage_params, inp)
        # the last stage finishes microbatch m = t - (S-1) at tick t
        m = t - (n_stages - 1)
        store = jnp.logical_and(stage == n_stages - 1,
                                jnp.logical_and(m >= 0, m < n_micro))
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(store, y, outs[jnp.clip(m, 0, n_micro - 1)]),
            jnp.clip(m, 0, n_micro - 1), 0)
        # rotate activations one stage forward (the wrap edge S-1 -> 0 carries
        # garbage that stage 0 immediately overwrites with its feed)
        buf = jax.lax.ppermute(y, axis, perm)
        return (buf, outs), None

    # shard_map's typed carries: a fresh constant is unvarying, but the tick
    # outputs vary over every mesh axis (ppermute over `axis`, data-sharded
    # feeds) — cast the initial carry to the same varying type
    def _vary(v):
        return jax.lax.pcast(v, varying_axes, to="varying") \
            if hasattr(jax.lax, "pcast") else jax.lax.pvary(v, varying_axes)

    buf0 = _vary(jnp.zeros(mb_shape, x_micro.dtype))
    outs0 = _vary(jnp.zeros((n_micro,) + mb_shape, x_micro.dtype))
    (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                jnp.arange(n_micro + n_stages - 1))
    # every stage but the last holds zeros; psum materializes the real outputs
    # everywhere without a gather (outputs replicated over the pipeline axis,
    # matching the replicated input layout)
    return jax.lax.psum(outs, axis)


def pipeline_apply(stacked_params, x: jax.Array, stage_fn: Callable,
                   mesh: Mesh, n_micro: int | None = None,
                   axis: str = "model") -> jax.Array:
    """Run x through S pipeline stages laid out over `axis` of the mesh.

    stacked_params: pytree with leading [S, ...] leaves (stack_stage_params),
      S = mesh.shape[axis]; sharded so each device keeps only its block.
    x: [batch, ...] activations; batch must divide into n_micro microbatches.
    stage_fn(params_block, microbatch) -> microbatch (shape-preserving).
    Composes with DP: when the mesh also has a `data` axis, the batch arrives
    sharded over it and each data replica runs its own pipeline.
    """
    n_stages = mesh.shape[axis]
    if n_micro is None:
        n_micro = max(2 * n_stages, 1)  # keep the fill/drain bubble modest
    data_axes = tuple(a for a in mesh.axis_names if a != axis)
    batch_spec = P(data_axes if data_axes else None)
    n_data = 1
    for a in data_axes:
        n_data *= mesh.shape[a]
    if x.shape[0] % (n_data * n_micro) != 0:
        raise ValueError(
            f"batch {x.shape[0]} must divide by data shards ({n_data}) x "
            f"microbatches ({n_micro})")

    def local(params, xb):
        # shard_map hands each device its [1, ...] slice of the stage axis;
        # strip it so stage_fn sees the bare block
        params = jax.tree_util.tree_map(lambda leaf: leaf[0], params)
        m = xb.shape[0] // n_micro
        micro = xb.reshape((n_micro, m) + xb.shape[1:])
        out = _pipeline_local(params, micro, stage_fn, n_stages, axis,
                              tuple(mesh.axis_names))
        return out.reshape(xb.shape)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), batch_spec), out_specs=batch_spec)
    return fn(stacked_params, x)


def shard_pipeline_params(stacked_params, mesh: Mesh, axis: str = "model"):
    """Place stacked [S, ...] params so each device holds one stage's block."""
    sharding = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, P(axis)), stacked_params)
    return jax.device_put(stacked_params, sharding)


def pipeline_transformer_layers(layer_params: list, x: jax.Array,
                                layer_fn: Callable, mesh: Mesh,
                                axis: str = "model",
                                n_micro: int | None = None) -> jax.Array:
    """Pipeline L stacked transformer layers over S stages (L % S == 0).

    layer_params: list of L per-layer pytrees (e.g. whisper encoder blocks);
    layer_fn(one_layer_params, x) -> x. Each stage scans its L/S local layers.
    """
    n_stages = mesh.shape[axis]
    n_layers = len(layer_params)
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    per = n_layers // n_stages
    # [S, per, ...] leaves: stage-major stacking
    stages = [stack_stage_params(layer_params[s * per:(s + 1) * per])
              for s in range(n_stages)]
    stacked = stack_stage_params(stages)

    def stage_fn(block, xb):
        def body(h, one_layer):
            return layer_fn(one_layer, h), None
        out, _ = jax.lax.scan(body, xb, block)
        return out

    return pipeline_apply(stacked, x, stage_fn, mesh, n_micro=n_micro,
                          axis=axis)
