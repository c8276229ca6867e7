"""MiniLM-L6 sentence encoder in functional JAX.

The semantic-embedding model the reference spec'd but never shipped
(SURVEY.md section 0: no faiss/sentence-transformers exists in its code; the
rebuild's north star requires all-MiniLM-L6-v2-equivalent embedding + top-k
retrieval on TPU). Architecture: BERT encoder, 6 layers, d=384, 12 heads,
FFN 1536, post-LN, mean pooling over the attention mask, L2 normalization.
Weights port from a HuggingFace sentence-transformers state dict via
convert_hf_state_dict; random init otherwise.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import (
    KeyGen,
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
    mha,
    xavier,
)


@dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    max_position: int = 512
    dim: int = 384
    n_layers: int = 6
    n_heads: int = 12
    ffn_dim: int = 1536
    type_vocab_size: int = 2
    # encoder-layer activation dtype; "bfloat16" halves MXU/HBM cost on TPU
    # with ~1e-3 deviation on normalized embeddings (indexing path uses it;
    # float32 stays the default for checkpoint-parity validation)
    compute_dtype: str = "float32"


def init_minilm_params(cfg: MiniLMConfig, seed: int = 0) -> Params:
    kg = KeyGen(seed)
    p: Params = {
        "tok_emb": xavier(kg(), (cfg.vocab_size, cfg.dim)) * 0.05,
        "pos_emb": xavier(kg(), (cfg.max_position, cfg.dim)) * 0.05,
        "type_emb": xavier(kg(), (cfg.type_vocab_size, cfg.dim)) * 0.05,
        "emb_ln": init_layernorm(cfg.dim),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        p["layers"].append({
            "q": init_linear(kg(), cfg.dim, cfg.dim),
            "k": init_linear(kg(), cfg.dim, cfg.dim),
            "v": init_linear(kg(), cfg.dim, cfg.dim),
            "o": init_linear(kg(), cfg.dim, cfg.dim),
            "attn_ln": init_layernorm(cfg.dim),
            "ffn1": init_linear(kg(), cfg.dim, cfg.ffn_dim),
            "ffn2": init_linear(kg(), cfg.ffn_dim, cfg.dim),
            "ffn_ln": init_layernorm(cfg.dim),
        })
    return p


def _encoder_layer(x: jnp.ndarray, p: Params, n_heads: int,
                   mask: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    q, k, v = linear(x, p["q"]), linear(x, p["k"]), linear(x, p["v"])
    b, s, d = q.shape
    if s >= 512:
        # long sequences: Pallas flash kernel (padding is contiguous at the end,
        # so the key mask is exactly a per-batch length)
        from eioku_tpu.ops.flash_attention import flash_attention

        hd = d // n_heads
        to_heads = lambda t: t.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
        o = flash_attention(to_heads(q), to_heads(k), to_heads(v),
                            lengths=lengths)
        attn = linear(o.transpose(0, 2, 1, 3).reshape(b, s, d), p["o"])
    else:
        # short sequences: XLA's fused naive attention wins (measured: flash's
        # per-tile overhead at S=256, d_head=32 costs ~1.8x embed throughput)
        attn = linear(mha(q, k, v, n_heads, mask=mask), p["o"])
    x = layernorm(x + attn, p["attn_ln"], eps=1e-12)
    h = jax.nn.gelu(linear(x, p["ffn1"]), approximate=False)
    x = layernorm(x + linear(h, p["ffn2"]), p["ffn_ln"], eps=1e-12)
    return x


@partial(jax.jit, static_argnames=("cfg",))
def minilm_embed(params: Params, token_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray, cfg: MiniLMConfig) -> jnp.ndarray:
    """token_ids/mask [B, S] -> L2-normalized sentence embeddings [B, dim]."""
    b, s = token_ids.shape
    x = params["tok_emb"][token_ids] + params["pos_emb"][:s][None] \
        + params["type_emb"][0][None, None]
    x = layernorm(x, params["emb_ln"], eps=1e-12)
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    # [B, 1, 1, S] broadcastable key mask
    attn_mask = attention_mask[:, None, None, :].astype(bool)
    lengths = jnp.sum(attention_mask, axis=-1).astype(jnp.int32)
    for layer in params["layers"]:
        x = _encoder_layer(x, layer, cfg.n_heads, attn_mask, lengths)
    x = x.astype(jnp.float32)  # pool and normalize at full precision
    # mean pooling over valid tokens
    m = attention_mask[..., None].astype(x.dtype)
    pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-9)


# -- HF weight conversion ---------------------------------------------------------


def convert_hf_state_dict(sd: dict, cfg: MiniLMConfig) -> Params:
    """Convert a HuggingFace BERT-style state dict (all-MiniLM-L6-v2 naming:
    'embeddings.*', 'encoder.layer.N.*', optionally '0.auto_model.' or 'bert.'
    prefixed) into our param tree."""
    def find(suffix: str) -> np.ndarray:
        for k, v in sd.items():
            if k.endswith(suffix):
                return np.asarray(v, dtype=np.float32)
        raise KeyError(suffix)

    def lin(prefix: str) -> Params:
        return {"w": jnp.asarray(find(f"{prefix}.weight").T),
                "b": jnp.asarray(find(f"{prefix}.bias"))}

    def ln(prefix: str) -> Params:
        return {"gamma": jnp.asarray(find(f"{prefix}.weight")),
                "beta": jnp.asarray(find(f"{prefix}.bias"))}

    p: Params = {
        "tok_emb": jnp.asarray(find("embeddings.word_embeddings.weight")),
        "pos_emb": jnp.asarray(find("embeddings.position_embeddings.weight")),
        "type_emb": jnp.asarray(find("embeddings.token_type_embeddings.weight")),
        "emb_ln": ln("embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        base = f"encoder.layer.{i}"
        p["layers"].append({
            "q": lin(f"{base}.attention.self.query"),
            "k": lin(f"{base}.attention.self.key"),
            "v": lin(f"{base}.attention.self.value"),
            "o": lin(f"{base}.attention.output.dense"),
            "attn_ln": ln(f"{base}.attention.output.LayerNorm"),
            "ffn1": lin(f"{base}.intermediate.dense"),
            "ffn2": lin(f"{base}.output.dense"),
            "ffn_ln": ln(f"{base}.output.LayerNorm"),
        })
    return p


def load_minilm(cache_dir: str | None, cfg: MiniLMConfig | None = None,
                seed: int = 0) -> tuple[Params, MiniLMConfig, bool]:
    """Load from `{cache_dir}/minilm-l6/pytorch_model.bin` (or model.safetensors
    unpacked to .npz) when present; random init otherwise.
    Returns (params, cfg, pretrained?)."""
    import os
    cfg = cfg or MiniLMConfig()
    if cache_dir:
        # native checkpoints (e.g. from fine-tuning) take precedence
        for name in ("minilm-l6/native.npz", "minilm-native.npz"):
            path = os.path.join(cache_dir, name)
            if os.path.isfile(path):
                from eioku_tpu.models.checkpoint import load_params
                params = load_params(init_minilm_params(cfg, seed), path)
                return params, cfg, True
        for name in ("minilm-l6/pytorch_model.bin", "pytorch_model.bin"):
            path = os.path.join(cache_dir, name)
            if os.path.isfile(path):
                import torch
                sd = torch.load(path, map_location="cpu", weights_only=True)
                sd = {k: v.numpy() for k, v in sd.items()}
                return convert_hf_state_dict(sd, cfg), cfg, True
        for name in ("minilm-l6/weights.npz", "minilm.npz"):
            path = os.path.join(cache_dir, name)
            if os.path.isfile(path):
                sd = dict(np.load(path))
                return convert_hf_state_dict(sd, cfg), cfg, True
    return init_minilm_params(cfg, seed), cfg, False
