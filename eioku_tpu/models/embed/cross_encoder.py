"""Cross-encoder reranker (ms-marco-MiniLM-L-6-v2-compatible) in JAX.

Beyond-parity search-quality lever: the bi-encoder (minilm.py) retrieves
candidates from the IVF index; this model scores each (query, passage) PAIR
jointly — one BERT pass over `[CLS] query [SEP] passage [SEP]` with token-type
segments, CLS pooling (dense+tanh), and a 1-logit classifier head
(HuggingFace BertForSequenceClassification layout). Joint attention over the
pair is what a bi-encoder fundamentally cannot express, and on MS MARCO it is
worth ~10 nDCG points over cosine ranking. The reference has no reranking of
any kind (its search spec stops at retrieval,
.kiro/specs/semantic-video-search/requirements.md).

TPU shape: rerank batches are tiny (top-50 candidates, seq 256) — one fixed
[B, S] batch per query, bf16 trunk, so the whole rerank is a single device
dispatch appended to the search path.

The encoder trunk (layers, layernorm placement, gelu) is exactly MiniLM's —
init/forward are reused from minilm.py rather than duplicated.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.embed.minilm import (
    MiniLMConfig,
    _encoder_layer,
    convert_hf_state_dict,
    init_minilm_params,
)
from eioku_tpu.models.layers import KeyGen, Params, init_linear, layernorm, linear


@dataclass(frozen=True)
class CrossEncoderConfig(MiniLMConfig):
    """Same trunk dims as MiniLM-L6 (ms-marco-MiniLM-L-6-v2 IS that trunk)."""
    n_labels: int = 1


def init_cross_encoder_params(cfg: CrossEncoderConfig, seed: int = 0) -> Params:
    p = init_minilm_params(cfg, seed)
    kg = KeyGen(seed + 1)
    p["pooler"] = init_linear(kg(), cfg.dim, cfg.dim)
    p["classifier"] = init_linear(kg(), cfg.dim, cfg.n_labels)
    return p


@partial(jax.jit, static_argnames=("cfg",))
def cross_encoder_score(params: Params, token_ids: jnp.ndarray,
                        type_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                        cfg: CrossEncoderConfig) -> jnp.ndarray:
    """[B, S] pair encodings -> [B] relevance logits (higher = more relevant)."""
    b, s = token_ids.shape
    x = params["tok_emb"][token_ids] + params["pos_emb"][:s][None] \
        + params["type_emb"][type_ids]
    x = layernorm(x, params["emb_ln"], eps=1e-12)
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    attn_mask = attention_mask[:, None, None, :].astype(bool)
    lengths = jnp.sum(attention_mask, axis=-1).astype(jnp.int32)
    for layer in params["layers"]:
        x = _encoder_layer(x, layer, cfg.n_heads, attn_mask, lengths)
    cls = x[:, 0].astype(jnp.float32)  # CLS pooling, head at full precision
    pooled = jnp.tanh(linear(cls, params["pooler"]))
    return linear(pooled, params["classifier"])[:, 0]


def convert_hf_cross_encoder(sd: dict, cfg: CrossEncoderConfig) -> Params:
    """HuggingFace BertForSequenceClassification state dict ('bert.*' trunk +
    'bert.pooler.dense' + 'classifier') -> our param tree. Trunk conversion is
    minilm.convert_hf_state_dict (suffix-matched, so the 'bert.' prefix is
    transparent)."""
    p = convert_hf_state_dict(sd, cfg)

    def find(suffix: str) -> np.ndarray:
        for k, v in sd.items():
            if k.endswith(suffix):
                return np.asarray(v, dtype=np.float32)
        raise KeyError(suffix)

    p["pooler"] = {"w": jnp.asarray(find("pooler.dense.weight").T),
                   "b": jnp.asarray(find("pooler.dense.bias"))}
    p["classifier"] = {"w": jnp.asarray(find("classifier.weight").T),
                       "b": jnp.asarray(find("classifier.bias"))}
    return p


def load_cross_encoder(cache_dir: str | None,
                       cfg: CrossEncoderConfig | None = None, seed: int = 0
                       ) -> tuple[Params, CrossEncoderConfig, bool]:
    """Load `{cache_dir}/msmarco-minilm-l6/pytorch_model.bin` (the public
    cross-encoder/ms-marco-MiniLM-L-6-v2 checkpoint) when present; random init
    otherwise. Returns (params, cfg, pretrained?)."""
    import os
    cfg = cfg or CrossEncoderConfig()
    if cache_dir:
        for name in ("msmarco-minilm-l6/pytorch_model.bin",
                     "cross-encoder/pytorch_model.bin"):
            path = os.path.join(cache_dir, name)
            if os.path.isfile(path):
                import torch
                sd = torch.load(path, map_location="cpu", weights_only=True)
                sd = {k: v.numpy() for k, v in sd.items()}
                return convert_hf_cross_encoder(sd, cfg), cfg, True
        for name in ("msmarco-minilm-l6/weights.npz", "msmarco-minilm.npz"):
            path = os.path.join(cache_dir, name)
            if os.path.isfile(path):
                sd = dict(np.load(path))
                return convert_hf_cross_encoder(sd, cfg), cfg, True
    return init_cross_encoder_params(cfg, seed), cfg, False
