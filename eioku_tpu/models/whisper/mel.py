"""Whisper log-mel spectrogram frontend, on device.

Replaces the audio frontend the reference gets from CTranslate2
(faster-whisper). Matches the public Whisper preprocessing: 16 kHz PCM, STFT
n_fft=400 hop=160 Hann, slaney-scale mel filterbank (80 bins; 128 for
large-v3), log10 with dynamic-range clamp to [max-8, max], then (x+4)/4.

The STFT runs as a framed matmul against precomputed DFT bases (MXU-friendly;
jnp.fft works on TPU but lowers poorly for small transforms) inside one jit.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 400
HOP = 160
SAMPLE_RATE = 16000


def hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (librosa default, used by Whisper's filterbank)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-normalized triangular filterbank [n_mels, n_fft//2 + 1]."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lower, center, upper = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lower) / max(center - lower, 1e-10)
        down = (upper - fft_freqs) / max(upper - center, 1e-10)
        fb[i] = np.maximum(0, np.minimum(up, down))
        # slaney normalization: constant energy per band
        fb[i] *= 2.0 / (upper - lower)
    return fb.astype(np.float32)


@lru_cache(maxsize=1)
def _dft_bases(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: [n_fft, n_freqs] cos/sin matrices."""
    n_freqs = n_fft // 2 + 1
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann, matches torch
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = -2.0 * np.pi * t * k / n_fft
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


@partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """audio [B, T] float32 (T multiple of HOP) -> log-mel [B, n_mels, T//HOP].

    Matches openai/whisper: reflect-pad n_fft//2, drop the last frame, clamp to
    8 dB dynamic range, scale (x+4)/4.
    """
    b, t = audio.shape
    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = t // HOP  # whisper drops the trailing frame
    # frame: [B, n_frames, n_fft]
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx]
    cos_b, sin_b = _dft_bases()
    re = jnp.einsum("btf,fk->btk", frames, jnp.asarray(cos_b),
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("btf,fk->btk", frames, jnp.asarray(sin_b),
                    preferred_element_type=jnp.float32)
    power = re * re + im * im  # [B, frames, freqs]
    fb = jnp.asarray(mel_filterbank(n_mels))  # [mels, freqs]
    mel = jnp.einsum("btk,mk->bmt", power, fb,
                     preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0
