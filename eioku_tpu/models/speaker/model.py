"""ECAPA-TDNN speaker embedder in functional JAX.

Speaker diarization is a capability beyond the reference (its face pipeline
declares clustering but never built it — /root/reference/ml-service/src/
services/model_manager.py:390 sets cluster_id=None; the audio side has nothing).
This model produces fixed-length speaker embeddings from short audio windows;
`eioku_tpu/ml/diarize.py` clusters them into who-spoke-when turns.

Architecture follows ECAPA-TDNN (Desplanques et al. 2020) as shipped by
speechbrain/spkrec-ecapa-voxceleb: TDNN stem, three SE-Res2Net blocks with
dilations 2/3/4, multi-layer feature aggregation, attentive statistics pooling
with global context, and a linear projection to the embedding. All shapes are
static: windows arrive as fixed-length batches, so XLA compiles one program
for the whole diarization pass (TPU-first replacement for per-window Python
loops). Time-domain convs run as NWC conv1d on the MXU.

Zero-egress note: random init unless `ecapa_voxceleb.ckpt` (a torch state
dict, speechbrain naming) is present in MODEL_CACHE_DIR; the converter maps
speechbrain's wrapped module names.
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import (
    KeyGen,
    Params,
    batchnorm,
    init_batchnorm,
    kaiming,
)

log = logging.getLogger(__name__)

N_FFT = 400  # 25 ms window @ 16 kHz
HOP = 160    # 10 ms


@dataclass(frozen=True)
class EcapaConfig:
    n_mels: int = 80
    channels: int = 1024          # speechbrain voxceleb release uses 1024
    res2net_scale: int = 8
    se_channels: int = 128
    attention_channels: int = 128
    mfa_channels: int = 1536
    embed_dim: int = 192
    dilations: tuple[int, ...] = (2, 3, 4)
    compute_dtype: str = "float32"


def fbank(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """audio [B, T] float32 @16 kHz -> log-mel fbanks [B, frames, n_mels] with
    per-window mean normalization (speechbrain Fbank + InputNormalization)."""
    from eioku_tpu.models.whisper.mel import _dft_bases, mel_filterbank

    b, t = audio.shape
    n_frames = 1 + (t - N_FFT) // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = audio[:, idx]
    cos_b, sin_b = _dft_bases(N_FFT)
    re = jnp.einsum("btf,fk->btk", frames, jnp.asarray(cos_b),
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("btf,fk->btk", frames, jnp.asarray(sin_b),
                    preferred_element_type=jnp.float32)
    power = re * re + im * im
    fb = jnp.asarray(mel_filterbank(n_mels, N_FFT))
    mel = jnp.einsum("btk,mk->btm", power, fb,
                     preferred_element_type=jnp.float32)
    logmel = jnp.log(jnp.maximum(mel, 1e-10))
    return logmel - jnp.mean(logmel, axis=1, keepdims=True)


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           dilation: int = 1) -> jnp.ndarray:
    """NWC conv1d with WIO weights [K, C_in, C_out]; fp32 MXU accumulation."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding="SAME",
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _init_tdnn(kg: KeyGen, c_in: int, c_out: int, k: int) -> Params:
    return {"w": kaiming(kg(), (k, c_in, c_out)),
            "b": jnp.zeros((c_out,), jnp.float32),
            "bn": init_batchnorm(c_out)}


def _tdnn(x: jnp.ndarray, p: Params, dilation: int = 1) -> jnp.ndarray:
    """TDNNBlock: conv1d + ReLU + BatchNorm1d (speechbrain order)."""
    return batchnorm(jax.nn.relu(conv1d(x, p["w"], p["b"], dilation)),
                     p["bn"], eps=1e-5)


def init_ecapa_params(cfg: EcapaConfig = EcapaConfig(), seed: int = 0) -> Params:
    kg = KeyGen(seed)
    c, scale = cfg.channels, cfg.res2net_scale
    cs = c // scale

    def se_res2(dilation: int) -> Params:
        return {
            "tdnn1": _init_tdnn(kg, c, c, 1),
            "res2": [_init_tdnn(kg, cs, cs, 3) for _ in range(scale - 1)],
            "tdnn2": _init_tdnn(kg, c, c, 1),
            "se1": {"w": kaiming(kg(), (1, c, cfg.se_channels)),
                    "b": jnp.zeros((cfg.se_channels,), jnp.float32)},
            "se2": {"w": kaiming(kg(), (1, cfg.se_channels, c)),
                    "b": jnp.zeros((c,), jnp.float32)},
        }

    return {
        "stem": _init_tdnn(kg, cfg.n_mels, c, 5),
        "blocks": [se_res2(d) for d in cfg.dilations],
        "mfa": _init_tdnn(kg, c * len(cfg.dilations), cfg.mfa_channels, 1),
        "asp_tdnn": _init_tdnn(kg, cfg.mfa_channels * 3,
                               cfg.attention_channels, 1),
        "asp_conv": {"w": kaiming(kg(), (1, cfg.attention_channels,
                                         cfg.mfa_channels)),
                     "b": jnp.zeros((cfg.mfa_channels,), jnp.float32)},
        "asp_bn": init_batchnorm(cfg.mfa_channels * 2),
        "fc": {"w": kaiming(kg(), (1, cfg.mfa_channels * 2, cfg.embed_dim)),
               "b": jnp.zeros((cfg.embed_dim,), jnp.float32)},
    }


def _se_res2_block(x: jnp.ndarray, p: Params, dilation: int,
                   scale: int) -> jnp.ndarray:
    residual = x
    x = _tdnn(x, p["tdnn1"])
    # Res2Net: hierarchical residual splits along channels
    chunks = jnp.split(x, scale, axis=-1)
    ys = [chunks[0]]
    y = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn(inp, p["res2"][i - 1], dilation)
        ys.append(y)
    x = jnp.concatenate(ys, axis=-1)
    x = _tdnn(x, p["tdnn2"])
    # squeeze-excitation over the time-mean
    s = jnp.mean(x, axis=1, keepdims=True)
    s = jax.nn.relu(conv1d(s, p["se1"]["w"], p["se1"]["b"]))
    s = jax.nn.sigmoid(conv1d(s, p["se2"]["w"], p["se2"]["b"]))
    return x * s + residual


@partial(jax.jit, static_argnames=("cfg",))
def ecapa_embed(params: Params, audio: jnp.ndarray,
                cfg: EcapaConfig = EcapaConfig()) -> jnp.ndarray:
    """audio [B, T] float32 @16 kHz -> L2-normalized embeddings [B, embed_dim]."""
    dtype = jnp.dtype(cfg.compute_dtype)
    x = fbank(audio, cfg.n_mels).astype(dtype)  # [B, frames, mels]
    x = _tdnn(x, params["stem"])
    feats = []
    for p, d in zip(params["blocks"], cfg.dilations):
        x = _se_res2_block(x, p, d, cfg.res2net_scale)
        feats.append(x)
    x = _tdnn(jnp.concatenate(feats, axis=-1), params["mfa"])  # [B, T, mfa]

    # attentive statistics pooling with global context
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-10)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1)
    attn = jnp.tanh(_tdnn_noact(ctx, params["asp_tdnn"]))
    attn = conv1d(attn, params["asp_conv"]["w"], params["asp_conv"]["b"])
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1).astype(x.dtype)
    mu = jnp.sum(attn * x, axis=1)
    sg = jnp.sqrt(jnp.maximum(jnp.sum(attn * x * x, axis=1) - mu * mu, 1e-10))
    stats = jnp.concatenate([mu, sg], axis=-1)[:, None, :]  # [B, 1, 2*mfa]
    stats = batchnorm(stats, params["asp_bn"], eps=1e-5)
    emb = conv1d(stats, params["fc"]["w"], params["fc"]["b"])[:, 0, :]
    emb = emb.astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-10)


def _tdnn_noact(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """speechbrain's ASP attention TDNNBlock applies conv+ReLU+BN then tanh;
    keep conv+ReLU+BN here and tanh at the call site."""
    return batchnorm(jax.nn.relu(conv1d(x, p["w"], p["b"])), p["bn"], eps=1e-5)


# -- checkpoint conversion ---------------------------------------------------------


def convert_speechbrain_state_dict(sd: dict,
                                   cfg: EcapaConfig = EcapaConfig()) -> Params:
    """Map a speechbrain ECAPA-TDNN state dict (embedding_model.ckpt of
    speechbrain/spkrec-ecapa-voxceleb) to this layout. speechbrain wraps
    torch modules, so conv weights live under `...conv.conv.weight` and
    batchnorms under `...norm.norm.*`; torch conv1d weights are [C_out, C_in, K]
    -> transposed to [K, C_in, C_out]."""
    import torch

    def arr(t):
        return jnp.asarray(t.detach().cpu().float().numpy()) \
            if isinstance(t, torch.Tensor) else jnp.asarray(np.asarray(t))

    def find(*cands):
        for k in cands:
            if k in sd:
                return arr(sd[k])
        raise KeyError(f"none of {cands} in state dict")

    def cw(prefix):  # conv weight+bias, tolerant of single/double wrapping
        w = find(f"{prefix}.conv.conv.weight", f"{prefix}.conv.weight",
                 f"{prefix}.weight")
        b = find(f"{prefix}.conv.conv.bias", f"{prefix}.conv.bias",
                 f"{prefix}.bias")
        return jnp.transpose(w, (2, 1, 0)), b

    def bn(prefix):
        return {"gamma": find(f"{prefix}.norm.norm.weight", f"{prefix}.norm.weight",
                              f"{prefix}.weight"),
                "beta": find(f"{prefix}.norm.norm.bias", f"{prefix}.norm.bias",
                             f"{prefix}.bias"),
                "mean": find(f"{prefix}.norm.norm.running_mean",
                             f"{prefix}.norm.running_mean",
                             f"{prefix}.running_mean"),
                "var": find(f"{prefix}.norm.norm.running_var",
                            f"{prefix}.norm.running_var",
                            f"{prefix}.running_var")}

    def tdnn(prefix):
        w, b = cw(prefix)
        return {"w": w, "b": b, "bn": bn(prefix)}

    def se_res2(i):
        base = f"blocks.{i}"
        return {
            "tdnn1": tdnn(f"{base}.tdnn1"),
            "res2": [tdnn(f"{base}.res2net_block.blocks.{j}")
                     for j in range(cfg.res2net_scale - 1)],
            "tdnn2": tdnn(f"{base}.tdnn2"),
            "se1": dict(zip(("w", "b"), cw(f"{base}.se_block.conv1"))),
            "se2": dict(zip(("w", "b"), cw(f"{base}.se_block.conv2"))),
        }

    asp_w, asp_b = cw("asp.conv")
    fc_w, fc_b = cw("fc")
    return {
        "stem": tdnn("blocks.0"),
        "blocks": [se_res2(i) for i in range(1, 1 + len(cfg.dilations))],
        "mfa": tdnn("mfa"),
        "asp_tdnn": tdnn("asp.tdnn"),
        "asp_conv": {"w": asp_w, "b": asp_b},
        "asp_bn": bn("asp_bn"),
        "fc": {"w": fc_w, "b": fc_b},
    }


def load_ecapa(cache_dir: str | None, cfg: EcapaConfig = EcapaConfig(),
               seed: int = 0) -> Params:
    """Load ecapa_voxceleb.ckpt from the model cache when present, else
    random init (zero-egress default, same policy as every other model here)."""
    if cache_dir:
        path = os.path.join(cache_dir, "ecapa_voxceleb.ckpt")
        if os.path.isfile(path):
            import torch
            sd = torch.load(path, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            log.info("loading ECAPA weights from %s", path)
            return convert_speechbrain_state_dict(sd, cfg)
    log.warning("no ECAPA checkpoint found; using random init")
    return init_ecapa_params(cfg, seed=seed)
