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
