"""FSDP (ZeRO-3-style fully-sharded data parallelism) over the data axis.

The reference has no training or device parallelism at all (SURVEY.md §2.4);
this completes the parallelism families next to tensor (mesh.py), pipeline
(pipeline.py), expert (ops/moe.py), and sequence (ops/ring_attention.py)
parallelism. TPU-idiomatic FSDP is declarative: every parameter AND optimizer
-state leaf is laid out with its largest divisible dimension sharded over the
"data" mesh axis, and XLA's SPMD partitioner inserts the all-gather on use
and reduce-scatter on gradients that hand-written ZeRO implementations do
manually — the collectives ride ICI, overlap with compute where the scheduler
finds room, and per-chip parameter+optimizer memory drops by the data-axis
size. The train step itself stays the pure function from parallel/train.py;
only shardings change.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape: tuple[int, ...], n_shards: int, axis: str = "data") -> P:
    """Shard the largest dimension divisible by the axis size; scalars and
    indivisible shapes replicate (their memory is negligible by definition —
    the big leaves are the divisible matmul weights)."""
    divisible = [d for d in range(len(shape)) if shape[d] % n_shards == 0
                 and shape[d] >= n_shards]
    if not divisible:
        return P()
    best = max(divisible, key=lambda d: shape[d])
    spec: list[str | None] = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def shard_tree_fsdp(tree, mesh: Mesh, axis: str = "data"):
    """Lay a parameter (or optimizer-state) pytree out FSDP-sharded."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(jnp.shape(x), n, axis))), tree)


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data"):
    """The NamedSharding pytree matching shard_tree_fsdp's layout (for jit
    out_shardings, so updated params/opt-state stay sharded instead of
    silently gathering onto every chip after step one)."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_spec(jnp.shape(x), n, axis)), tree)


def make_fsdp_train_step(cfg, mesh: Mesh, optimizer=None, axis: str = "data"):
    """FSDP variant of parallel/train.make_train_step: same loss, same
    optimizer, parameters + Adam moments resident sharded over `axis`.

    Returns (train_step, optimizer, prepare) where prepare(params) lays out
    params and a fresh optimizer state; train_step(params, opt_state, *batch)
    keeps both sharded across steps (out_shardings pin the layout).
    """
    import optax

    from eioku_tpu.parallel.train import info_nce_loss

    optimizer = optimizer or optax.adamw(1e-5)

    def prepare(params):
        params = shard_tree_fsdp(params, mesh, axis)
        opt_state = jax.jit(
            optimizer.init,
            out_shardings=fsdp_shardings(
                jax.eval_shape(optimizer.init, params), mesh, axis))(params)
        return params, opt_state

    def _step(params, opt_state, anchor_ids, anchor_mask, pos_ids, pos_mask):
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, anchor_ids, anchor_mask, pos_ids, pos_mask, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def jitted(params, opt_state):
        # shardings depend on the concrete trees; build the jit lazily on
        # first call and cache it on the closure
        return jax.jit(
            _step,
            donate_argnums=(0, 1),
            in_shardings=(jax.tree.map(lambda x: x.sharding, params),
                          jax.tree.map(lambda x: x.sharding, opt_state),
                          NamedSharding(mesh, P(axis)),
                          NamedSharding(mesh, P(axis)),
                          NamedSharding(mesh, P(axis)),
                          NamedSharding(mesh, P(axis))),
            out_shardings=(jax.tree.map(lambda x: x.sharding, params),
                           jax.tree.map(lambda x: x.sharding, opt_state),
                           NamedSharding(mesh, P())),
        )

    cache: dict = {}

    def train_step(params, opt_state, anchor_ids, anchor_mask, pos_ids,
                   pos_mask):
        if "fn" not in cache:
            cache["fn"] = jitted(params, opt_state)
        return cache["fn"](params, opt_state, anchor_ids, anchor_mask,
                           pos_ids, pos_mask)

    return train_step, optimizer, prepare


def max_leaf_shard_fraction(tree) -> float:
    """Diagnostic: largest per-device fraction of any weight-bearing leaf
    (1.0 = replicated, 1/n = fully sharded). Used by tests and the dryrun to
    prove memory actually shards."""
    worst = 0.0
    for leaf in jax.tree.leaves(tree):
        if leaf.size < 1024:  # scalars/bias tails may replicate
            continue
        shard = leaf.addressable_shards[0].data.size
        worst = max(worst, shard / leaf.size)
    return worst
