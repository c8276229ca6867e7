"""Sharded training step: contrastive fine-tuning of the sentence embedder.

The reference does no training (SURVEY.md non-goals), but a production semantic
index wants domain adaptation: fine-tune MiniLM on (transcript-chunk, query)
pairs with an in-batch InfoNCE loss. This module provides that step as a pure
function jitted over the shared (data, model) mesh — batch sharded over "data"
(DP gradients all-reduced by XLA), transformer weights tensor-parallel over
"model" (see parallel/mesh.py) — and is the multi-chip path exercised by
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from eioku_tpu.models.embed.minilm import MiniLMConfig, minilm_embed


def info_nce_loss(params, anchor_ids, anchor_mask, pos_ids, pos_mask,
                  cfg: MiniLMConfig, temperature: float = 0.05):
    """In-batch contrastive loss: anchors match their aligned positives."""
    a = minilm_embed(params, anchor_ids, anchor_mask, cfg)
    p = minilm_embed(params, pos_ids, pos_mask, cfg)
    logits = jnp.dot(a, p.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(logits.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(loss)


def make_train_step(cfg: MiniLMConfig, optimizer=None):
    optimizer = optimizer or optax.adamw(1e-5)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, anchor_ids, anchor_mask, pos_ids, pos_mask):
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, anchor_ids, anchor_mask, pos_ids, pos_mask, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer
