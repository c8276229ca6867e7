"""Model-based voice activity detection (Silero-style), functional JAX.

The reference's engine enables faster-whisper's built-in Silero VAD filter
(/root/reference/ml-service/src/services/model_manager.py:437-444); this is
the TPU-native equivalent: a compact STFT -> conv encoder -> LSTM ->
per-chunk sigmoid network matching the public Silero VAD v5 graph closely
enough that its weights convert (weights.py). Zero-egress environments fall
back to the energy VAD in ml/audio_io.py — random VAD weights would gate
arbitrarily, so the model path only activates when a checkpoint is present.

Design notes (TPU): the whole file is static-shape jax — framing via reshape,
the DFT as one matmul against a fixed real/imag basis, the conv stack over
all frames at once, and the only sequential part (the LSTM across 32 ms
chunks) a lax.scan. One jit compile per audio length bucket.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import KeyGen, Params, kaiming

SAMPLE_RATE = 16000


@dataclass(frozen=True, eq=True)
class VadConfig:
    sr: int = 16000
    chunk: int = 512          # samples per VAD decision (32 ms @ 16 kHz)
    n_fft: int = 256
    hop: int = 128            # -> 4 STFT frames per chunk
    channels: tuple[int, ...] = (128, 64, 64, 128)
    hidden: int = 128         # LSTM cell width

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def frames_per_chunk(self) -> int:
        return self.chunk // self.hop


def dft_basis(n_fft: int) -> np.ndarray:
    """Real-DFT analysis basis [2*(n_fft//2+1), n_fft]: real rows then imag
    rows (the layout of Silero's stft forward_basis_buffer)."""
    bins = n_fft // 2 + 1
    n = np.arange(n_fft)
    k = np.arange(bins)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)]).astype(np.float32)


def init_vad_params(cfg: VadConfig = VadConfig(), seed: int = 0) -> Params:
    kg = KeyGen(seed)
    p: Params = {"stft_basis": jnp.asarray(dft_basis(cfg.n_fft))}
    c_in = cfg.n_bins
    enc = []
    for c_out in cfg.channels:
        enc.append({"w": kaiming(kg(), (3, c_in, c_out)),
                    "b": jnp.zeros(c_out)})
        c_in = c_out
    p["encoder"] = enc
    h, d = cfg.hidden, cfg.channels[-1]
    # torch LSTMCell layout: rows ordered (i, f, g, o)
    p["lstm"] = {"w_ih": kaiming(kg(), (4 * h, d)),
                 "w_hh": kaiming(kg(), (4 * h, h)),
                 "b_ih": jnp.zeros(4 * h), "b_hh": jnp.zeros(4 * h)}
    p["out"] = {"w": kaiming(kg(), (h, 1)), "b": jnp.zeros(1)}
    return p


def _conv1d_nlc(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x [B, L, C_in], w [K, C_in, C_out], symmetric (k-1)//2 padding."""
    pad = (w.shape[0] - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NLC", "LIO", "NLC"),
        preferred_element_type=jnp.float32)
    return out + b


def _stft_mag(audio: jnp.ndarray, cfg: VadConfig, basis: jnp.ndarray
              ) -> jnp.ndarray:
    """audio [B, S] (S a multiple of hop) -> magnitudes [B, T, n_bins]."""
    b, s = audio.shape
    # frame [B, T, n_fft] with stride hop: pad tail so every hop has a frame
    pad = cfg.n_fft - cfg.hop
    x = jnp.pad(audio, ((0, 0), (0, pad)))
    t = s // cfg.hop
    idx = jnp.arange(cfg.n_fft)[None, :] + cfg.hop * jnp.arange(t)[:, None]
    frames = x[:, idx]  # [B, T, n_fft]
    spec = jnp.einsum("btn,fn->btf", frames, basis,
                      preferred_element_type=jnp.float32)
    re, im = jnp.split(spec, 2, axis=-1)
    return jnp.sqrt(re * re + im * im + 1e-9)


def _lstm_cell(carry, x, p: Params):
    h, c = carry
    gates = x @ p["w_ih"].T + h @ p["w_hh"].T + p["b_ih"] + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (h, c), h


@partial(jax.jit, static_argnames="cfg")
def vad_probs(params: Params, audio: jnp.ndarray,
              cfg: VadConfig = VadConfig()) -> jnp.ndarray:
    """audio [B, S] float32 in [-1, 1] -> speech probability [B, n_chunks]
    (one per cfg.chunk samples; S is right-padded to a chunk multiple)."""
    if audio.ndim == 1:
        audio = audio[None]
    b, s = audio.shape
    n_chunks = -(-s // cfg.chunk)
    audio = jnp.pad(audio, ((0, 0), (0, n_chunks * cfg.chunk - s)))
    feats = _stft_mag(audio, cfg, params["stft_basis"])  # [B, T, bins]
    x = feats
    for layer in params["encoder"]:
        x = jax.nn.relu(_conv1d_nlc(x, layer["w"], layer["b"]))
    # group frames into chunks, average -> one feature vector per decision
    x = x.reshape(b, n_chunks, cfg.frames_per_chunk, x.shape[-1]).mean(axis=2)
    h0 = (jnp.zeros((b, cfg.hidden)), jnp.zeros((b, cfg.hidden)))
    _, hs = jax.lax.scan(lambda c, xt: _lstm_cell(c, xt, params["lstm"]),
                         h0, x.transpose(1, 0, 2))
    logits = hs.transpose(1, 0, 2) @ params["out"]["w"] + params["out"]["b"]
    return jax.nn.sigmoid(logits[..., 0])


BUCKET_SECONDS = 30  # pad audio up to a 30 s multiple: one compile per bucket


def vad_activity(params: Params, audio: np.ndarray, cfg: VadConfig = VadConfig(),
                 threshold: float = 0.5, frame_ms: int = 30) -> np.ndarray:
    """Boolean activity at frame_ms granularity over a 1-D waveform — the
    drop-in interface of ml.audio_io.energy_vad (which indexes activity by
    VAD_FRAME_MS frames).

    The waveform is zero-padded to the next BUCKET_SECONDS multiple before
    the jitted vad_probs call so distinct video durations share compiles
    (tunnel compiles cost 10-600 s). The LSTM is causal, but the conv
    encoder's symmetric padding gives each frame a ~4-frame lookahead, so the
    last few real chunks see the zero tail instead of silence-shaped STFT
    frames — a boundary effect of a few tens of ms that only matters for
    probabilities sitting exactly at `threshold`."""
    if len(audio) == 0:
        return np.zeros(0, bool)
    bucket = cfg.sr * BUCKET_SECONDS
    padded_len = -(-len(audio) // bucket) * bucket
    wav = np.zeros(padded_len, np.float32)
    wav[:len(audio)] = audio
    probs = np.asarray(vad_probs(params, jnp.asarray(wav)[None], cfg))[0]
    n_real_chunks = -(-len(audio) // cfg.chunk)
    active_chunks = probs[:n_real_chunks] >= threshold
    n_frames = len(audio) // int(cfg.sr * frame_ms / 1000)
    if n_frames == 0:
        return np.zeros(0, bool)
    frame = int(cfg.sr * frame_ms / 1000)
    starts = np.arange(n_frames) * frame
    chunk_idx = np.minimum(starts // cfg.chunk, len(active_chunks) - 1)
    return active_chunks[chunk_idx]
