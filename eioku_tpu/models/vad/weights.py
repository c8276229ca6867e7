"""Silero-VAD checkpoint conversion.

Maps the public Silero VAD v5 parameter layout (the jit/ONNX export's tensor
names, reverse-engineered shape-for-shape) onto model.py's pytree:

  _model.stft.forward_basis_buffer        [2*bins, 1, n_fft] -> stft_basis
  _model.encoder.{i}.reparam_conv.weight  [C_out, C_in, 3]   -> encoder[i].w
  _model.encoder.{i}.reparam_conv.bias    [C_out]            -> encoder[i].b
  _model.decoder.rnn.weight_ih/weight_hh/bias_ih/bias_hh     -> lstm.*
  _model.decoder.decoder.2.weight         [1, H, 1]          -> out.w
  _model.decoder.decoder.2.bias           [1]                -> out.b

Zero-egress environments have no checkpoint: load_vad falls back to None and
the caller keeps using the energy VAD (random VAD weights would gate speech
arbitrarily, unlike the other models where random weights still exercise the
pipeline shape).
"""
from __future__ import annotations

import logging
import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import Params
from eioku_tpu.models.vad.model import VadConfig

log = logging.getLogger(__name__)

CHECKPOINT_NAME = "silero_vad.ckpt"


def _strip(sd: dict) -> dict:
    return {k.removeprefix("_model."): np.asarray(v) for k, v in sd.items()}


def convert_silero_state_dict(sd: dict, cfg: VadConfig = VadConfig()) -> Params:
    """Torch state_dict (jit export key layout above) -> model.py pytree."""
    sd = _strip(sd)
    basis = sd["stft.forward_basis_buffer"]
    if basis.ndim == 3:  # [2*bins, 1, n_fft] conv layout
        basis = basis[:, 0, :]
    p: Params = {"stft_basis": jnp.asarray(basis, jnp.float32)}
    enc = []
    i = 0
    while f"encoder.{i}.reparam_conv.weight" in sd:
        w = sd[f"encoder.{i}.reparam_conv.weight"]  # [C_out, C_in, K] torch
        enc.append({"w": jnp.asarray(w.transpose(2, 1, 0), jnp.float32),
                    "b": jnp.asarray(sd[f"encoder.{i}.reparam_conv.bias"],
                                     jnp.float32)})
        i += 1
    if not enc:
        raise ValueError("no encoder convs found in state dict")
    p["encoder"] = enc
    p["lstm"] = {"w_ih": jnp.asarray(sd["decoder.rnn.weight_ih"], jnp.float32),
                 "w_hh": jnp.asarray(sd["decoder.rnn.weight_hh"], jnp.float32),
                 "b_ih": jnp.asarray(sd["decoder.rnn.bias_ih"], jnp.float32),
                 "b_hh": jnp.asarray(sd["decoder.rnn.bias_hh"], jnp.float32)}
    ow = sd["decoder.decoder.2.weight"]  # [1, H, 1] conv1d k=1
    p["out"] = {"w": jnp.asarray(ow[:, :, 0].T, jnp.float32),
                "b": jnp.asarray(sd["decoder.decoder.2.bias"], jnp.float32)}
    return p


def export_silero_state_dict(params: Params) -> dict:
    """Inverse of convert (round-trip testing without a real checkpoint)."""
    sd = {"_model.stft.forward_basis_buffer":
          np.asarray(params["stft_basis"])[:, None, :]}
    for i, layer in enumerate(params["encoder"]):
        sd[f"_model.encoder.{i}.reparam_conv.weight"] = \
            np.asarray(layer["w"]).transpose(2, 1, 0)
        sd[f"_model.encoder.{i}.reparam_conv.bias"] = np.asarray(layer["b"])
    for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
        sd[f"_model.decoder.rnn.{k}"] = \
            np.asarray(params["lstm"][k.replace("weight", "w").replace("bias", "b")])
    sd["_model.decoder.decoder.2.weight"] = \
        np.asarray(params["out"]["w"]).T[:, :, None]
    sd["_model.decoder.decoder.2.bias"] = np.asarray(params["out"]["b"])
    return sd


@lru_cache(maxsize=4)
def load_vad(cache_dir: str | None,
             cfg: VadConfig = VadConfig()) -> Params | None:
    """Returns converted params when {cache_dir}/silero_vad.ckpt exists and
    converts cleanly, else None (caller falls back to the energy VAD). A
    corrupt or layout-mismatched checkpoint must degrade to the energy VAD,
    not fail every transcription task. Cached: the checkpoint is immutable
    within a worker's lifetime (detection's _load_model pattern)."""
    if not cache_dir:
        return None
    path = os.path.join(cache_dir, CHECKPOINT_NAME)
    if not os.path.isfile(path):
        return None
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        log.info("loading silero VAD weights from %s", path)
        params = convert_silero_state_dict(sd, cfg)
        ok, p_sil, p_tone = sanity_check(params, cfg)
        if not ok:
            log.warning(
                "VAD checkpoint %s converted shape-cleanly but FAILED the "
                "behavioral sanity check (silence prob %.3f, speech-band "
                "tone prob %.3f): the export layout likely differs from the "
                "assumed graph; falling back to energy VAD", path, p_sil,
                p_tone)
            return None
        return params
    except Exception:
        log.warning("failed to load/convert VAD checkpoint %s; "
                    "falling back to energy VAD", path, exc_info=True)
        return None


def sanity_check(params: Params,
                 cfg: VadConfig = VadConfig()) -> tuple[bool, float, float]:
    """Behavioral gate on converted weights: a shape-clean conversion of a
    checkpoint whose real graph differs (strided convs, left-context frames,
    different padding) would produce arbitrary speech probabilities and
    silently gate transcription windows. Require the two properties every
    working VAD has — near-zero probability on digital silence, and clearly
    higher probability on a loud speech-band amplitude-modulated tone.
    Thresholds are deliberately loose (a tone is not speech; genuine Silero
    weights score it anywhere above the silence floor)."""
    import jax.numpy as jnp

    from eioku_tpu.models.vad.model import vad_probs

    n = cfg.chunk * 32  # ~1 s of audio, a whole number of VAD chunks
    silence = np.zeros((1, n), np.float32)
    t = np.arange(n, dtype=np.float32) / cfg.sr
    # 220 Hz carrier + harmonics, 3 Hz syllabic AM — speech-band energy
    tone = ((0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * np.sin(2 * np.pi * 660 * t))
            * (0.55 + 0.45 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    p_sil = float(np.asarray(vad_probs(params, jnp.asarray(silence), cfg)).mean())
    p_tone = float(np.asarray(vad_probs(params, jnp.asarray(tone[None]), cfg)).mean())
    ok = p_sil < 0.35 and p_tone > p_sil + 0.05
    return ok, p_sil, p_tone
