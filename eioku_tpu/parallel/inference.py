"""Data-parallel batched inference over the shared device mesh.

The TPU answer to the reference's intra-task parallelism gap (SURVEY.md P6: a
sequential frame loop on one GPU): frame batches are sharded over the mesh's
"data" axis, model params replicated, and XLA partitions the whole
forward+decode+NMS program across chips — no NCCL-style code, just shardings.
Scaling a video-indexing job from 1 to N chips is `make_mesh(N)` + these
helpers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from eioku_tpu.parallel.mesh import data_sharded, replicated


def pad_to_multiple(x: jnp.ndarray, multiple: int) -> tuple[jnp.ndarray, int]:
    b = x.shape[0]
    target = -(-b // multiple) * multiple
    if target != b:
        pad = [(0, target - b)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    return x, b


class DataParallelDetector:
    """YOLO detection with the frame batch sharded over the mesh data axis."""

    def __init__(self, params, cfg, mesh: Mesh):
        from eioku_tpu.models.yolo.postprocess import detect

        self.mesh = mesh
        self.cfg = cfg
        self.params = jax.device_put(params, replicated(mesh))
        self._detect = detect
        self._in_sharding = data_sharded(mesh)

    def __call__(self, frames, conf_threshold: float = 0.25,
                 iou_threshold: float = 0.45, top_k: int = 256) -> dict:
        n_data = self.mesh.shape["data"]
        frames = jnp.asarray(frames)
        frames, orig_b = pad_to_multiple(frames, n_data)
        frames = jax.device_put(frames, self._in_sharding)
        out = self._detect(self.params, frames, self.cfg,
                           conf_threshold=conf_threshold,
                           iou_threshold=iou_threshold, top_k=top_k)
        return {k: v[:orig_b] for k, v in out.items()}


class DataParallelEmbedder:
    """MiniLM embedding with the chunk batch sharded over the data axis."""

    def __init__(self, params, cfg, mesh: Mesh):
        from eioku_tpu.models.embed.minilm import minilm_embed

        self.mesh = mesh
        self.cfg = cfg
        self.params = jax.device_put(params, replicated(mesh))
        self._embed = minilm_embed
        self._in_sharding = data_sharded(mesh)

    def __call__(self, token_ids, attention_mask) -> jnp.ndarray:
        n_data = self.mesh.shape["data"]
        ids = jnp.asarray(token_ids)
        mask = jnp.asarray(attention_mask)
        ids, orig_b = pad_to_multiple(ids, n_data)
        mask, _ = pad_to_multiple(mask, n_data)
        # padded rows get an all-zero mask -> zero-length handled by the model
        ids = jax.device_put(ids, self._in_sharding)
        mask = jax.device_put(mask, self._in_sharding)
        return self._embed(self.params, ids, mask, self.cfg)[:orig_b]
