"""Whisper checkpoint converters (HuggingFace and OpenAI naming) -> param tree.

Needed for numerical parity with the reference's faster-whisper models
(SURVEY.md hard-part 4). Conv1d weights: torch [out, in, k] -> jax WIO
[k, in, out]; linear weights transposed.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eioku_tpu.models.layers import Params
from eioku_tpu.models.whisper.model import WhisperConfig


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def convert_whisper_state_dict(sd: dict, cfg: WhisperConfig) -> Params:
    """Accepts HF ("model.encoder.layers.N...") or OpenAI ("encoder.blocks.N...")
    naming."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    is_hf = any(k.startswith("encoder.layers.") for k in sd)

    def get(hf_key: str, oa_key: str) -> np.ndarray:
        if is_hf:
            return _np(sd[hf_key])
        return _np(sd[oa_key])

    def lin(hf: str, oa: str, bias: bool = True) -> Params:
        p = {"w": jnp.asarray(get(f"{hf}.weight", f"{oa}.weight").T)}
        if bias:
            p["b"] = jnp.asarray(get(f"{hf}.bias", f"{oa}.bias"))
        return p

    def ln(hf: str, oa: str) -> Params:
        return {"gamma": jnp.asarray(get(f"{hf}.weight", f"{oa}.weight")),
                "beta": jnp.asarray(get(f"{hf}.bias", f"{oa}.bias"))}

    def conv(hf: str, oa: str) -> Params:
        w = get(f"{hf}.weight", f"{oa}.weight")  # [out, in, k]
        return {"w": jnp.asarray(np.transpose(w, (2, 1, 0))),
                "b": jnp.asarray(get(f"{hf}.bias", f"{oa}.bias"))}

    def attn(hf: str, oa: str) -> Params:
        return {
            "q": lin(f"{hf}.q_proj", f"{oa}.query"),
            "k": lin(f"{hf}.k_proj", f"{oa}.key", bias=False),
            "v": lin(f"{hf}.v_proj", f"{oa}.value"),
            "o": lin(f"{hf}.out_proj", f"{oa}.out"),
        }

    enc_layers = []
    for i in range(cfg.n_enc_layers):
        hf, oa = f"encoder.layers.{i}", f"encoder.blocks.{i}"
        enc_layers.append({
            "ln1": ln(f"{hf}.self_attn_layer_norm", f"{oa}.attn_ln"),
            "attn": attn(f"{hf}.self_attn", f"{oa}.attn"),
            "ln2": ln(f"{hf}.final_layer_norm", f"{oa}.mlp_ln"),
            "mlp1": lin(f"{hf}.fc1", f"{oa}.mlp.0"),
            "mlp2": lin(f"{hf}.fc2", f"{oa}.mlp.2"),
        })
    dec_layers = []
    for i in range(cfg.n_dec_layers):
        hf, oa = f"decoder.layers.{i}", f"decoder.blocks.{i}"
        dec_layers.append({
            "ln1": ln(f"{hf}.self_attn_layer_norm", f"{oa}.attn_ln"),
            "attn": attn(f"{hf}.self_attn", f"{oa}.attn"),
            "ln_cross": ln(f"{hf}.encoder_attn_layer_norm", f"{oa}.cross_attn_ln"),
            "cross": attn(f"{hf}.encoder_attn", f"{oa}.cross_attn"),
            "ln2": ln(f"{hf}.final_layer_norm", f"{oa}.mlp_ln"),
            "mlp1": lin(f"{hf}.fc1", f"{oa}.mlp.0"),
            "mlp2": lin(f"{hf}.fc2", f"{oa}.mlp.2"),
        })
    return {
        "enc": {
            "conv1": conv("encoder.conv1", "encoder.conv1"),
            "conv2": conv("encoder.conv2", "encoder.conv2"),
            "layers": enc_layers,
            "ln_post": ln("encoder.layer_norm", "encoder.ln_post"),
        },
        "dec": {
            "tok_emb": jnp.asarray(get("decoder.embed_tokens.weight",
                                       "decoder.token_embedding.weight")),
            "pos_emb": jnp.asarray(get("decoder.embed_positions.weight",
                                       "decoder.positional_embedding")),
            "layers": dec_layers,
            "ln": ln("decoder.layer_norm", "decoder.ln"),
        },
    }


def load_whisper_checkpoint(path: str, cfg: WhisperConfig) -> Params:
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.get("model_state_dict", obj) if isinstance(obj, dict) else obj
        sd = {k: v.float().numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}
    return convert_whisper_state_dict(sd, cfg)
