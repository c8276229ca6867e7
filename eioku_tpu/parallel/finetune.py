"""Embedder domain adaptation: fine-tune MiniLM on the library's own
transcripts.

Training pairs are self-supervised crops: two different character windows of
the same transcript chunk form an (anchor, positive) pair; in-batch InfoNCE
pushes windows of the same chunk together and different chunks apart. The
step runs sharded over the (data, model) mesh (parallel/train.py); the result
is saved as a native checkpoint that load_minilm picks up automatically, so
the semantic index serves the adapted weights on next restart.
"""
from __future__ import annotations

import logging
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eioku_tpu.models.checkpoint import save_params
from eioku_tpu.models.embed.minilm import load_minilm
from eioku_tpu.models.embed.tokenizer import WordPieceTokenizer
from eioku_tpu.parallel.mesh import data_sharded, make_mesh, shard_minilm_params
from eioku_tpu.parallel.train import make_train_step

log = logging.getLogger(__name__)


def crop_pair(text: str, rng: random.Random, min_frac: float = 0.5
              ) -> tuple[str, str]:
    words = text.split()
    if len(words) < 4:
        return text, text
    n = len(words)

    def crop():
        size = max(int(n * (min_frac + rng.random() * (1 - min_frac))), 2)
        start = rng.randint(0, n - size)
        return " ".join(words[start:start + size])

    return crop(), crop()


def finetune_embedder(ctx, steps: int = 100, batch_size: int = 16,
                      lr: float = 1e-5, seed: int = 0,
                      model_parallel: int = 1,
                      save_to: str | None = None) -> dict:
    """Fine-tune on all indexed transcript chunks; returns training stats."""
    rows = ctx.db.query("SELECT text FROM embedding_chunks")
    texts = [r["text"] for r in rows if len(r["text"].split()) >= 4]
    if len(texts) < batch_size:
        raise ValueError(
            f"need at least {batch_size} (mesh-rounded) indexed chunks to fine-tune, "
            f"have {len(texts)}")
    cache = ctx.config.model_cache_dir
    params, cfg, _ = load_minilm(cache)
    tokenizer = WordPieceTokenizer.from_cache_dir(cache, max_len=128)

    n_dev = len(jax.devices())
    mp = max(model_parallel, 1)
    if n_dev % mp != 0:
        mp = 1
    # every sharded weight dim must divide too (tok_emb rows 30522 = 2*3*5087,
    # head dims 12): mp beyond 2 would fail placement mid-run
    for dim in (cfg.vocab_size, cfg.n_heads, cfg.dim):
        if dim % mp != 0:
            log.warning("model_parallel=%d does not divide %d; running mp=1",
                        mp, dim)
            mp = 1
            break
    mesh = make_mesh(n_dev, model_parallel=mp)
    n_data = mesh.shape["data"]
    # the batch shards over the data axis: round up to a multiple of it
    batch_size = -(-batch_size // n_data) * n_data
    params = shard_minilm_params(params, mesh)
    step_fn, optimizer = make_train_step(cfg, optax.adamw(lr))
    opt_state = optimizer.init(params)

    rng = random.Random(seed)
    sharding = data_sharded(mesh)
    losses = []
    with mesh:
        for step in range(steps):
            batch = [crop_pair(rng.choice(texts), rng)
                     for _ in range(batch_size)]
            a_ids, a_mask = tokenizer.encode_batch([a for a, _ in batch])
            p_ids, p_mask = tokenizer.encode_batch([p for _, p in batch])
            put = lambda x: jax.device_put(jnp.asarray(x), sharding)
            params, opt_state, loss = step_fn(
                params, opt_state, put(a_ids), put(a_mask), put(p_ids),
                put(p_mask))
            losses.append(float(loss))
            if step % 20 == 0:
                log.info("finetune step", extra={"step": step,
                                                 "loss": round(losses[-1], 4)})
    out_path = save_to or (os.path.join(cache, "minilm-l6", "native.npz")
                           if cache else "minilm-native.npz")
    save_params(jax.device_get(params), out_path)
    return {"steps": steps, "first_loss": losses[0], "last_loss": losses[-1],
            "checkpoint": out_path, "chunks": len(texts),
            "mesh": dict(mesh.shape)}
