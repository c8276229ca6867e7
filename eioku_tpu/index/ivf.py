"""IVF (inverted-file) approximate retrieval with on-device k-means.

The reference never shipped any vector index; the rebuild's north star names
"MiniLM embedding ... replaced by an on-TPU matmul + top-k similarity search
kernel" and the benchmark configs an IVF index (BASELINE.json). Design:
  - training: Lloyd's k-means entirely on device — assignment is a cosine
    matmul + argmax (MXU), centroid update a segment-sum; vectors are
    L2-normalized so cosine == dot
  - storage: vectors regrouped per cluster into a padded [k, max_size, d]
    block with a validity mask — fixed shapes, gather-free probing
  - search: score centroids (matmul), take top n_probe clusters, score only
    their padded blocks, global top-k over the probed candidates
Brute force remains exact and is used below ~4k vectors (where it's faster);
SemanticIndex switches automatically.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(vectors: jnp.ndarray, k: int, iters: int = 10,
           seed: int = 0) -> jnp.ndarray:
    """Spherical k-means on L2-normalized vectors [N, D] -> centroids [k, D]."""
    n, d = vectors.shape
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, n, (k,), replace=False)
    centroids = vectors[idx]

    def step(centroids, _):
        scores = jnp.dot(vectors, centroids.T,
                         preferred_element_type=jnp.float32)  # [N, k]
        assign = jnp.argmax(scores, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [N, k]
        sums = jnp.dot(one_hot.T, vectors.astype(jnp.float32))  # [k, D]
        counts = jnp.sum(one_hot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centroids)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        return (new / jnp.maximum(norm, 1e-9)).astype(vectors.dtype), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@partial(jax.jit, static_argnames=("n_probe", "top_k"))
def _ivf_search(centroids: jnp.ndarray, blocks: jnp.ndarray, mask: jnp.ndarray,
                slot_map: jnp.ndarray, query: jnp.ndarray, n_probe: int,
                top_k: int):
    """centroids [k, D]; blocks [k, m, D]; mask [k, m]; slot_map [k, m] (global
    slot per row, -1 padding); query [D]. Returns (scores, slots) top_k."""
    c_scores = jnp.dot(centroids, query, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(c_scores, n_probe)  # [n_probe]
    cand_blocks = blocks[probe]          # [n_probe, m, D]
    cand_mask = mask[probe]              # [n_probe, m]
    cand_slots = slot_map[probe]         # [n_probe, m]
    scores = jnp.einsum("pmd,d->pm", cand_blocks.astype(jnp.float32), query,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(cand_mask, scores, -jnp.inf)
    flat_scores = scores.reshape(-1)
    flat_slots = cand_slots.reshape(-1)
    k_eff = min(top_k, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k_eff)
    return top_scores, flat_slots[top_idx]


class IvfIndex:
    def __init__(self, centroids, blocks, mask, slot_map, n_vectors: int):
        self.centroids = centroids
        self.blocks = blocks
        self.mask = mask
        self.slot_map = slot_map
        self.n_vectors = n_vectors
        self.k = centroids.shape[0]

    @classmethod
    def build(cls, vectors: np.ndarray, k: int | None = None,
              iters: int = 10) -> "IvfIndex":
        """vectors [N, D] float (will be L2-normalized)."""
        n = vectors.shape[0]
        if k is None:
            k = max(int(np.sqrt(n)), 4)
        k = max(min(k, n), 1)  # k-means samples k seeds without replacement
        v = vectors.astype(np.float32)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.maximum(norms, 1e-9)
        centroids = np.asarray(kmeans(jnp.asarray(v), k=k, iters=iters))
        assign = np.argmax(v @ centroids.T, axis=1)
        counts = np.bincount(assign, minlength=k)
        m = max(int(counts.max()), 1)
        blocks = np.zeros((k, m, v.shape[1]), np.float32)
        mask = np.zeros((k, m), bool)
        slot_map = np.full((k, m), -1, np.int32)
        fill = np.zeros(k, np.int64)
        for slot, c in enumerate(assign):
            j = fill[c]
            blocks[c, j] = v[slot]
            mask[c, j] = True
            slot_map[c, j] = slot
            fill[c] += 1
        return cls(jnp.asarray(centroids), jnp.asarray(blocks),
                   jnp.asarray(mask), jnp.asarray(slot_map), n)

    def search(self, query: np.ndarray, top_k: int = 10,
               n_probe: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Returns (scores, global slots), padded entries have slot -1."""
        if n_probe is None:
            n_probe = max(self.k // 8, 1)
        n_probe = min(n_probe, self.k)
        q = np.asarray(query, np.float32)
        q = q / max(np.linalg.norm(q), 1e-9)
        scores, slots = _ivf_search(self.centroids, self.blocks, self.mask,
                                    self.slot_map, jnp.asarray(q),
                                    n_probe, top_k)
        return np.asarray(scores), np.asarray(slots)
