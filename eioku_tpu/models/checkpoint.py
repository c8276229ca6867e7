"""Native param-pytree checkpointing (npz with path-flattened keys).

Mid-training/fine-tuned weights need a save/restore format independent of the
external converter formats (ultralytics/HF/EasyOCR). Arrays are flattened with
'/'-joined tree paths; lists round-trip via integer path segments.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_params(params, path: str) -> None:
    flat = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[_path_str(p)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(template, path: str):
    """Load into the structure of `template` (shapes/dtypes validated)."""
    data = np.load(path)

    def fill(p, leaf):
        key = _path_str(p)
        if key not in data:
            raise KeyError(f"checkpoint missing {key!r}")
        arr = data[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {key}: checkpoint "
                             f"{arr.shape} vs model {leaf.shape}")
        return jnp.asarray(arr, dtype=leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, template)


# -- sharded (multi-chip) checkpointing ---------------------------------------
# The npz path above gathers to host — fine for single-chip fine-tunes, but an
# FSDP/TP-sharded train state (parallel/fsdp.py, parallel/mesh.py) would force
# a full gather through one host and lose the layout. Orbax writes each chip's
# shards in parallel (OCDBT) and restores into ANY target sharding, so a run
# checkpointed on one mesh resumes on another (SURVEY §5 checkpoint/resume).


def save_sharded(tree, path: str) -> None:
    """Save a (possibly sharded) pytree of jax.Arrays; per-shard parallel
    writes, atomic publish (orbax finalize). Blocks until durable."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_sharded(template, path: str):
    """Restore into `template`'s structure, shapes, dtypes AND shardings —
    the saved layout need not match (cross-mesh resume reshards on load).
    Template leaves may be jax.Arrays (donated ones work: only metadata is
    read) or jax.ShapeDtypeStruct."""
    import orbax.checkpoint as ocp

    def abstract(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        if isinstance(leaf, jax.Array) and hasattr(leaf, "sharding"):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                        sharding=leaf.sharding)
        leaf = jnp.asarray(leaf)
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype)

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path),
                         jax.tree.map(abstract, template))
