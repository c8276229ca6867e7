"""Whisper encoder-decoder in functional JAX with KV-cache greedy decoding.

TPU-native rebuild of the transcription engine the reference gets from
faster-whisper/CTranslate2 (C++) (/root/reference/ml-service/src/services/
model_manager.py:409-467). Public Whisper architecture: mel -> 2x conv1d (gelu,
stride 2) -> sinusoidal positions -> pre-LN transformer encoder; decoder with
learned positions, causal self-attention, cross-attention, tied output
embedding. Variants tiny..large-v3 plus large-v3-turbo (4 decoder layers).

Decoding (SURVEY.md hard-part 2) avoids host<->device ping-pong per token: the
whole greedy loop is one lax.while_loop inside jit, with fixed-size KV caches
for self-attention and precomputed cross-attention K/V.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache, partial

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
    xavier,
)

# n_mels, d_model, n_heads, n_enc_layers, n_dec_layers, vocab
WHISPER_VARIANTS = {
    "tiny": (80, 384, 6, 4, 4, 51865),
    "base": (80, 512, 8, 6, 6, 51865),
    "small": (80, 768, 12, 12, 12, 51865),
    "medium": (80, 1024, 16, 24, 24, 51865),
    "large-v3": (128, 1280, 20, 32, 32, 51866),
    "large-v3-turbo": (128, 1280, 20, 32, 4, 51866),
}

N_AUDIO_CTX = 1500  # 30 s at 100 mel frames/s, conv-stride 2
N_TEXT_CTX = 448


@dataclass(frozen=True)
class WhisperConfig:
    variant: str = "tiny"
    # activation dtype inside encoder/decoder layers; "bfloat16" is the
    # production transcription setting (the reference's faster-whisper engine
    # likewise runs fp16 compute by default); float32 stays the default for
    # parity tests
    compute_dtype: str = "float32"

    @property
    def n_mels(self):
        return WHISPER_VARIANTS[self.variant][0]

    @property
    def dim(self):
        return WHISPER_VARIANTS[self.variant][1]

    @property
    def n_heads(self):
        return WHISPER_VARIANTS[self.variant][2]

    @property
    def n_enc_layers(self):
        return WHISPER_VARIANTS[self.variant][3]

    @property
    def n_dec_layers(self):
        return WHISPER_VARIANTS[self.variant][4]

    @property
    def vocab_size(self):
        return WHISPER_VARIANTS[self.variant][5]


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal position embedding."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32)


# -- init --------------------------------------------------------------------------


def _init_attn(kg: KeyGen, d: int) -> Params:
    return {
        "q": init_linear(kg(), d, d),
        "k": init_linear(kg(), d, d, bias=False),  # whisper: no k bias
        "v": init_linear(kg(), d, d),
        "o": init_linear(kg(), d, d),
    }


def _init_enc_layer(kg: KeyGen, d: int) -> Params:
    return {
        "ln1": init_layernorm(d), "attn": _init_attn(kg, d),
        "ln2": init_layernorm(d),
        "mlp1": init_linear(kg(), d, d * 4), "mlp2": init_linear(kg(), d * 4, d),
    }


def _init_dec_layer(kg: KeyGen, d: int) -> Params:
    p = _init_enc_layer(kg, d)
    p["cross"] = _init_attn(kg, d)
    p["ln_cross"] = init_layernorm(d)
    return p


def init_whisper_params(cfg: WhisperConfig, seed: int = 0) -> Params:
    kg = KeyGen(seed)
    d = cfg.dim
    return {
        "enc": {
            "conv1": {"w": xavier(kg(), (3, cfg.n_mels, d)), "b": jnp.zeros(d)},
            "conv2": {"w": xavier(kg(), (3, d, d)), "b": jnp.zeros(d)},
            "layers": [_init_enc_layer(kg, d) for _ in range(cfg.n_enc_layers)],
            "ln_post": init_layernorm(d),
        },
        "dec": {
            "tok_emb": xavier(kg(), (cfg.vocab_size, d)) * 0.02,
            "pos_emb": xavier(kg(), (N_TEXT_CTX, d)) * 0.02,
            "layers": [_init_dec_layer(kg, d) for _ in range(cfg.n_dec_layers)],
            "ln": init_layernorm(d),
        },
    }


# -- attention core -------------------------------------------------------------------


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def _attend(q, k, v, n_heads: int, mask=None) -> jnp.ndarray:
    hd = q.shape[-1] // n_heads
    scale = hd ** -0.25  # whisper scales q and k separately
    qh = _split_heads(q, n_heads) * scale
    kh = _split_heads(k, n_heads) * scale
    vh = _split_heads(v, n_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    return _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                                   preferred_element_type=jnp.float32
                                   ).astype(vh.dtype))


def _attend_grouped(q, k, v, n_heads: int) -> jnp.ndarray:
    """Cross-attention where G query rows share each key/value row.

    q [B*G, Sq, d]; k/v [B, Sk, d] -> [B*G, Sq, d]. Used by beam decoding so
    the beams of one window attend to a single copy of the encoder K/V
    instead of materializing beam_size repeats (which would multiply the
    largest decode tensor by the beam width)."""
    b = k.shape[0]
    g = q.shape[0] // b
    hd = q.shape[-1] // n_heads
    scale = hd ** -0.25
    qh = _split_heads(q, n_heads) * scale      # [BG, H, Sq, hd]
    kh = _split_heads(k, n_heads) * scale      # [B, H, Sk, hd]
    vh = _split_heads(v, n_heads)
    qh = qh.reshape(b, g, n_heads, q.shape[1], hd)
    scores = jnp.einsum("bghqd,bhkd->bghqk", qh, kh,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bghqk,bhkd->bghqd", w, vh,
                     preferred_element_type=jnp.float32).astype(vh.dtype)
    return _merge_heads(out.reshape(q.shape[0], n_heads, q.shape[1], hd))


def _self_attn(x, p: Params, n_heads: int, mask=None) -> jnp.ndarray:
    q, k, v = linear(x, p["q"]), linear(x, p["k"]), linear(x, p["v"])
    return linear(_attend(q, k, v, n_heads, mask), p["o"])


def _self_attn_flash(x, p: Params, n_heads: int) -> jnp.ndarray:
    """Encoder self-attention via the Pallas flash kernel (1500-position
    sequences; falls back to the identical-math reference path on CPU)."""
    from eioku_tpu.ops.flash_attention import flash_attention

    q, k, v = linear(x, p["q"]), linear(x, p["k"]), linear(x, p["v"])
    b, s, d = q.shape
    hd = d // n_heads
    to_heads = lambda t: t.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
    o = flash_attention(to_heads(q), to_heads(k), to_heads(v))
    return linear(o.transpose(0, 2, 1, 3).reshape(b, s, d), p["o"])


# -- encoder -------------------------------------------------------------------------


def _conv1d(x, w, b, stride: int = 1) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + b.astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def whisper_encode(params: Params, mel: jnp.ndarray,
                   cfg: WhisperConfig) -> jnp.ndarray:
    """mel [B, n_mels, 3000] -> encoder states [B, 1500, d]."""
    enc = params["enc"]
    x = mel.transpose(0, 2, 1).astype(jnp.dtype(cfg.compute_dtype))  # NWC
    x = jax.nn.gelu(_conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"]))
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2))
    x = x + jnp.asarray(sinusoids(x.shape[1], x.shape[2]))[None].astype(x.dtype)
    for layer in enc["layers"]:
        x = _enc_layer(layer, x, cfg.n_heads)
    return layernorm(x, enc["ln_post"], eps=1e-5)


def _enc_layer(layer: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """One encoder block (pre-LN self-attention + MLP residuals)."""
    x = x + _self_attn_flash(layernorm(x, layer["ln1"], eps=1e-5),
                             layer["attn"], n_heads)
    h = layernorm(x, layer["ln2"], eps=1e-5)
    return x + linear(jax.nn.gelu(linear(h, layer["mlp1"])), layer["mlp2"])


def shard_whisper_enc_specs(params: Params, axis: str = "model"):
    """Megatron-TP PartitionSpecs for the encoder: q/k/v/mlp1 split the
    output dim (column), o/mlp2 split the input dim (row), o/mlp2 biases and
    everything else (stem convs, layernorms) replicate. Used both to place
    params on a mesh and as whisper_encode_tp's shard_map in_specs."""
    from jax.sharding import PartitionSpec as P

    def spec(path, leaf) -> P:
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        joined = "/".join(str(k) for k in keys)
        if joined.endswith(("q/w", "k/w", "v/w", "mlp1/w")):
            return P(None, axis)
        if joined.endswith(("q/b", "v/b", "mlp1/b")):
            return P(axis)
        if joined.endswith(("o/w", "mlp2/w")):
            return P(axis, None)
        return P()  # o/b, mlp2/b (added once, post-psum), ln, convs

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(spec, params)


def whisper_encode_tp(params: Params, mel: jnp.ndarray, cfg: WhisperConfig,
                      mesh, axis: str = "model") -> jnp.ndarray:
    """Tensor-parallel whisper_encode: Megatron column/row splits with the
    flash-attention kernel running on each device's LOCAL heads inside
    shard_map (GSPMD can't partition the Pallas custom call itself, so the
    head dimension is split explicitly — one psum per residual branch, riding
    ICI). Latency lever for large checkpoints: weights AND attention FLOPs
    divide by the model-axis size. cfg.n_heads must divide by it; the batch
    shards over the mesh's other axes. Numerically identical to
    whisper_encode (parity-tested)."""
    tp = mesh.shape[axis]
    if cfg.n_heads % tp:
        raise ValueError(f"n_heads {cfg.n_heads} must divide tp size {tp}")
    return _encode_tp_fn(cfg, mesh, axis)(params["enc"], mel)


@lru_cache(maxsize=8)
def _encode_tp_fn(cfg: WhisperConfig, mesh, axis: str):
    """Build the jitted shard-mapped TP encoder ONCE per (cfg, mesh, axis):
    a fresh closure per call would never hit jit's trace cache, paying a full
    retrace/compile of the whole encoder on every batch."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from eioku_tpu.ops.flash_attention import flash_attention

    tp = mesh.shape[axis]
    heads_local = cfg.n_heads // tp
    data_axes = tuple(a for a in mesh.axis_names if a != axis)
    batch_spec = P(data_axes if data_axes else None)
    # spec tree needs only the param STRUCTURE; eval_shape avoids
    # materializing a throwaway full-size random init
    abstract = jax.eval_shape(lambda: init_whisper_params(cfg, seed=0))
    specs = shard_whisper_enc_specs({"enc": abstract["enc"]}, axis)["enc"]

    def local(enc_p, mel_l):
        x = mel_l.transpose(0, 2, 1).astype(jnp.dtype(cfg.compute_dtype))
        x = jax.nn.gelu(_conv1d(x, enc_p["conv1"]["w"], enc_p["conv1"]["b"]))
        x = jax.nn.gelu(_conv1d(x, enc_p["conv2"]["w"], enc_p["conv2"]["b"],
                                stride=2))
        x = x + jnp.asarray(sinusoids(x.shape[1], x.shape[2]))[None].astype(x.dtype)
        b, s, d = x.shape
        hd = d // cfg.n_heads
        for layer in enc_p["layers"]:
            h = layernorm(x, layer["ln1"], eps=1e-5)
            a = layer["attn"]
            # column-parallel q/k/v: local slices [d, d/tp] -> local heads
            q, k, v = linear(h, a["q"]), linear(h, a["k"]), linear(h, a["v"])
            to_heads = lambda t: t.reshape(b, s, heads_local, hd).transpose(
                0, 2, 1, 3)
            o = flash_attention(to_heads(q), to_heads(k), to_heads(v))
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d // tp)
            # row-parallel out-proj: partial sums -> one all-reduce; the
            # replicated bias is added once, after the psum
            part = jnp.dot(o, a["o"]["w"].astype(o.dtype),
                           preferred_element_type=jnp.float32).astype(o.dtype)
            x = x + jax.lax.psum(part, axis) + a["o"]["b"].astype(x.dtype)
            h = layernorm(x, layer["ln2"], eps=1e-5)
            g = jax.nn.gelu(linear(h, layer["mlp1"]))  # column: [.., 4d/tp]
            part = jnp.dot(g, layer["mlp2"]["w"].astype(g.dtype),
                           preferred_element_type=jnp.float32).astype(g.dtype)
            x = x + jax.lax.psum(part, axis) + layer["mlp2"]["b"].astype(x.dtype)
        return layernorm(x, enc_p["ln_post"], eps=1e-5)

    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(specs, batch_spec),
                             out_specs=batch_spec, check_rep=False))


def whisper_encode_pp(params: Params, mel: jnp.ndarray, cfg: WhisperConfig,
                      mesh, n_micro: int | None = None,
                      axis: str = "model") -> jnp.ndarray:
    """Pipeline-parallel whisper_encode: the encoder layer trunk spans the
    mesh's `axis` devices (GPipe microbatch rotation, parallel/pipeline.py),
    for checkpoints whose encoder overflows one chip's HBM or to shrink
    per-chip weight residency when serving many models. The conv stem,
    positional embedding, and final layernorm replicate (they are <1% of the
    weights); cfg.n_enc_layers must divide by mesh.shape[axis]. Numerically
    identical to whisper_encode (same _enc_layer blocks)."""
    from eioku_tpu.parallel.pipeline import pipeline_transformer_layers

    enc = params["enc"]
    x = mel.transpose(0, 2, 1).astype(jnp.dtype(cfg.compute_dtype))
    x = jax.nn.gelu(_conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"]))
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2))
    x = x + jnp.asarray(sinusoids(x.shape[1], x.shape[2]))[None].astype(x.dtype)
    x = pipeline_transformer_layers(
        enc["layers"], x,
        lambda layer, h: _enc_layer(layer, h, cfg.n_heads),
        mesh, axis=axis, n_micro=n_micro)
    return layernorm(x, enc["ln_post"], eps=1e-5)


# -- decoder (teacher-forced, used for tests and scoring) ------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def whisper_decode_full(params: Params, tokens: jnp.ndarray,
                        enc_out: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """tokens [B, S] -> logits [B, S, vocab] (full recompute, causal)."""
    dec = params["dec"]
    b, s = tokens.shape
    x = (dec["tok_emb"][tokens] + dec["pos_emb"][:s][None]).astype(
        jnp.dtype(cfg.compute_dtype))
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    for layer in dec["layers"]:
        x = x + _self_attn(layernorm(x, layer["ln1"], eps=1e-5), layer["attn"],
                           cfg.n_heads, mask=causal)
        h = layernorm(x, layer["ln_cross"], eps=1e-5)
        q = linear(h, layer["cross"]["q"])
        k = linear(enc_out, layer["cross"]["k"])
        v = linear(enc_out, layer["cross"]["v"])
        x = x + linear(_attend(q, k, v, cfg.n_heads), layer["cross"]["o"])
        h = layernorm(x, layer["ln2"], eps=1e-5)
        x = x + linear(jax.nn.gelu(linear(h, layer["mlp1"])), layer["mlp2"])
    x = layernorm(x, dec["ln"], eps=1e-5)
    return jnp.einsum("bsd,vd->bsv", x, dec["tok_emb"].astype(x.dtype),
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "layers_from"))
def cross_attention_alignment(params: Params, tokens: jnp.ndarray,
                              enc_out: jnp.ndarray, cfg: WhisperConfig,
                              frame_counts: jnp.ndarray | None = None,
                              layers_from: int | None = None) -> jnp.ndarray:
    """Teacher-forced decoder pass returning text->audio alignment energy.

    Re-runs the decoder on the already-decoded tokens and collects
    cross-attention weights from the upper decoder layers (the standard
    fallback set of alignment heads when a checkpoint ships no head dump),
    z-normalized per head over the audio axis and averaged.

    frame_counts [B] int32 restricts the alignment softmax and statistics to
    the real (non-padded) audio frames of each window — the standard decoders
    crop to the content frames before normalizing, and a 5 s window padded to
    30 s would otherwise skew every row's scale. Decoder activations still
    attend to the full window, exactly as they did during decoding.

    tokens [B, S]; enc_out [B, 1500, d] -> [B, S, 1500] float32. Word-level
    timestamps (align.py) run DTW over the negated result; the reference
    exposes this capability through faster-whisper's word_timestamps option.
    """
    dec = params["dec"]
    b, s = tokens.shape
    n_frames = enc_out.shape[1]
    start = cfg.n_dec_layers // 2 if layers_from is None else layers_from
    if frame_counts is None:
        frame_counts = jnp.full((b,), n_frames, jnp.int32)
    valid = (jnp.arange(n_frames)[None] < frame_counts[:, None])  # [B, F]
    vmask = valid[:, None, None, :]  # [B, 1, 1, F]
    cnt = jnp.maximum(frame_counts, 1).astype(jnp.float32)[:, None, None, None]
    x = (dec["tok_emb"][tokens] + dec["pos_emb"][:s][None]).astype(
        jnp.dtype(cfg.compute_dtype))
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    acc = jnp.zeros((b, s, n_frames), jnp.float32)
    n_sel = 0
    for li, layer in enumerate(dec["layers"]):
        x = x + _self_attn(layernorm(x, layer["ln1"], eps=1e-5), layer["attn"],
                           cfg.n_heads, mask=causal)
        h = layernorm(x, layer["ln_cross"], eps=1e-5)
        q = linear(h, layer["cross"]["q"])
        k = linear(enc_out, layer["cross"]["k"])
        v = linear(enc_out, layer["cross"]["v"])
        hd = q.shape[-1] // cfg.n_heads
        scale = hd ** -0.25
        qh = _split_heads(q, cfg.n_heads) * scale
        kh = _split_heads(k, cfg.n_heads) * scale
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(scores, axis=-1)  # [B, H, S, F] float32
        if li >= start:
            # alignment statistics over the content frames only
            wa = jax.nn.softmax(jnp.where(vmask, scores, -1e30), axis=-1)
            mu = jnp.sum(wa * vmask, axis=-1, keepdims=True) / cnt
            sd = jnp.sqrt(jnp.sum(jnp.where(vmask, (wa - mu) ** 2, 0.0),
                                  axis=-1, keepdims=True) / cnt) + 1e-9
            acc = acc + jnp.sum(jnp.where(vmask, (wa - mu) / sd, 0.0), axis=1)
            n_sel += cfg.n_heads
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype),
                                      _split_heads(v, cfg.n_heads),
                                      preferred_element_type=jnp.float32
                                      ).astype(v.dtype))
        x = x + linear(out, layer["cross"]["o"])
        h = layernorm(x, layer["ln2"], eps=1e-5)
        x = x + linear(jax.nn.gelu(linear(h, layer["mlp1"])), layer["mlp2"])
    return acc / max(n_sel, 1)


@partial(jax.jit, static_argnames=("cfg",))
def whisper_detect_language(params: Params, enc_out: jnp.ndarray,
                            cfg: WhisperConfig) -> jnp.ndarray:
    """Language id per batch item: argmax over the language-token logits after
    the SOT token (the standard Whisper detection recipe; reference relies on
    faster-whisper's equivalent, model_manager.py:437-444).
    Returns int32 [B] indices into tokenizer.LANGUAGES."""
    from eioku_tpu.models.whisper.tokenizer import WhisperTokens

    tk = WhisperTokens(cfg.vocab_size)
    sot = tk.sot
    lang_base = tk.lang_base
    n_langs = tk.n_langs
    b = enc_out.shape[0]
    tokens = jnp.full((b, 1), sot, jnp.int32)
    logits = whisper_decode_full(params, tokens, enc_out, cfg)[:, 0]
    lang_logits = jax.lax.dynamic_slice_in_dim(logits, lang_base, n_langs,
                                               axis=-1)
    return jnp.argmax(lang_logits, axis=-1).astype(jnp.int32)


# -- incremental decoder step (shared by greedy and beam decoding) ---------------------


def precompute_cross_kv(params: Params, enc_out: jnp.ndarray):
    """Cross-attention K/V per layer from encoder states: 2x [L, B, S_enc, d]."""
    dec = params["dec"]
    cross_k = jnp.stack([linear(enc_out, layer["cross"]["k"])
                         for layer in dec["layers"]])
    cross_v = jnp.stack([linear(enc_out, layer["cross"]["v"])
                         for layer in dec["layers"]])
    return cross_k, cross_v


def decoder_step(params: Params, cross_k, cross_v, tokens, self_k, self_v,
                 pos, cfg: WhisperConfig):
    """Run the decoder for the token at position `pos`, updating KV caches.

    tokens [B, max_len]; self_k/self_v [L, B, max_len, d]; pos traced scalar.
    cross_k/cross_v may carry fewer batch rows than tokens when several rows
    (beams) share one encoder state — each group of B/B_cross consecutive
    rows attends to one cross-KV row. Returns (logits [B, vocab] float32,
    self_k, self_v).
    """
    dec = params["dec"]
    b, max_len = tokens.shape
    d = cfg.dim
    tok = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))  # [B,1]
    x = (dec["tok_emb"][tok[:, 0]][:, None, :] +
         jax.lax.dynamic_slice(dec["pos_emb"], (pos, 0), (1, d))[None]).astype(
        jnp.dtype(cfg.compute_dtype))
    valid = (jnp.arange(max_len) <= pos)[None, None, None, :]  # key mask
    for li, layer in enumerate(dec["layers"]):
        h = layernorm(x, layer["ln1"], eps=1e-5)
        q = linear(h, layer["attn"]["q"])
        k_new = linear(h, layer["attn"]["k"])
        v_new = linear(h, layer["attn"]["v"])
        self_k = jax.lax.dynamic_update_slice(self_k, k_new[None],
                                              (li, 0, pos, 0))
        self_v = jax.lax.dynamic_update_slice(self_v, v_new[None],
                                              (li, 0, pos, 0))
        attn = _attend(q, self_k[li], self_v[li], cfg.n_heads, mask=valid)
        x = x + linear(attn, layer["attn"]["o"])
        h = layernorm(x, layer["ln_cross"], eps=1e-5)
        q = linear(h, layer["cross"]["q"])
        if cross_k.shape[1] == b:
            cross = _attend(q, cross_k[li], cross_v[li], cfg.n_heads)
        else:  # beams share encoder rows
            cross = _attend_grouped(q, cross_k[li], cross_v[li], cfg.n_heads)
        x = x + linear(cross, layer["cross"]["o"])
        h = layernorm(x, layer["ln2"], eps=1e-5)
        x = x + linear(jax.nn.gelu(linear(h, layer["mlp1"])), layer["mlp2"])
    x = layernorm(x, dec["ln"], eps=1e-5)
    logits = jnp.einsum("bd,vd->bv", x[:, 0], dec["tok_emb"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return logits, self_k, self_v


def shard_whisper_specs(params: Params, axis: str = "model"):
    """Megatron-TP PartitionSpecs for the FULL model (encoder specs from
    shard_whisper_enc_specs; decoder: attn+cross q/k/v column, o row,
    mlp1 column, mlp2 row, tok_emb split on the embedding dim — it is both
    the input table and the tied output projection — pos_emb and layernorms
    replicated)."""
    from jax.sharding import PartitionSpec as P

    import jax.tree_util as jtu

    def spec(path, leaf) -> P:
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        joined = "/".join(str(k) for k in keys)
        if joined == "dec/tok_emb":
            return P(None, axis)
        if joined == "dec/pos_emb":
            return P()
        if joined.endswith(("q/w", "k/w", "v/w", "mlp1/w")):
            return P(None, axis)
        if joined.endswith(("q/b", "v/b", "k/b", "mlp1/b")):
            return P(axis)
        if joined.endswith(("o/w", "mlp2/w")):
            return P(axis, None)
        return P()

    return jtu.tree_map_with_path(spec, params)


def decoder_step_tp(params: Params, cross_k, cross_v, tokens, self_k, self_v,
                    pos, cfg: WhisperConfig, axis: str = "model"):
    """decoder_step with Megatron-sharded weights, for use INSIDE shard_map:
    q/k/v/mlp1 are local column slices (KV caches carry d/tp features),
    o/mlp2 row-parallel with one psum per residual branch, and the tied
    tok_emb is split on the feature dim — the input lookup all-gathers its
    d/tp slice, the output projection psums partial vocab logits. Activations
    stay full-d replicated, so all beam/top-k logic downstream is identical
    on every device. Numerically equal to decoder_step (parity-tested)."""
    dec = params["dec"]
    b, max_len = tokens.shape
    d = cfg.dim
    heads_local = dec["layers"][0]["attn"]["q"]["w"].shape[1] \
        * cfg.n_heads // d  # = n_heads / tp, from the local column width
    tok = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))
    emb_local = dec["tok_emb"][tok[:, 0]][:, None, :]  # [B, 1, d/tp]
    emb = jax.lax.all_gather(emb_local, axis, axis=-1, tiled=True)  # [B,1,d]
    x = (emb + jax.lax.dynamic_slice(dec["pos_emb"], (pos, 0), (1, d))[None]
         ).astype(jnp.dtype(cfg.compute_dtype))
    valid = (jnp.arange(max_len) <= pos)[None, None, None, :]

    def row_parallel(h_local, p):  # partial matmul -> all-reduce -> + bias
        part = jnp.dot(h_local, p["w"].astype(h_local.dtype),
                       preferred_element_type=jnp.float32).astype(h_local.dtype)
        return jax.lax.psum(part, axis) + p["b"].astype(h_local.dtype)

    for li, layer in enumerate(dec["layers"]):
        h = layernorm(x, layer["ln1"], eps=1e-5)
        q = linear(h, layer["attn"]["q"])
        k_new = linear(h, layer["attn"]["k"])
        v_new = linear(h, layer["attn"]["v"])
        self_k = jax.lax.dynamic_update_slice(self_k, k_new[None],
                                              (li, 0, pos, 0))
        self_v = jax.lax.dynamic_update_slice(self_v, v_new[None],
                                              (li, 0, pos, 0))
        attn = _attend(q, self_k[li], self_v[li], heads_local, mask=valid)
        x = x + row_parallel(attn, layer["attn"]["o"])
        h = layernorm(x, layer["ln_cross"], eps=1e-5)
        q = linear(h, layer["cross"]["q"])
        if cross_k.shape[1] == b:
            cross = _attend(q, cross_k[li], cross_v[li], heads_local)
        else:  # beams share encoder rows
            cross = _attend_grouped(q, cross_k[li], cross_v[li], heads_local)
        x = x + row_parallel(cross, layer["cross"]["o"])
        h = layernorm(x, layer["ln2"], eps=1e-5)
        x = x + row_parallel(jax.nn.gelu(linear(h, layer["mlp1"])),
                             layer["mlp2"])
    x = layernorm(x, dec["ln"], eps=1e-5)
    # tied output projection: contract over this device's d/tp slice of x
    d_local = dec["tok_emb"].shape[1]
    idx = jax.lax.axis_index(axis)
    x_slice = jax.lax.dynamic_slice(x[:, 0], (0, idx * d_local), (b, d_local))
    logits = jax.lax.psum(
        jnp.einsum("bd,vd->bv", x_slice, dec["tok_emb"].astype(x.dtype),
                   preferred_element_type=jnp.float32), axis)
    return logits, self_k, self_v


# -- greedy decode with KV cache --------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "max_len", "suppress_specials"))
def whisper_greedy_decode(params: Params, enc_out: jnp.ndarray,
                          initial_tokens: jnp.ndarray, eot_id: int,
                          cfg: WhisperConfig, max_len: int = 224,
                          suppress_specials: bool = True) -> jnp.ndarray:
    """Greedy decode, all on device.

    enc_out [B, 1500, d]; initial_tokens [B, n_init] (SOT sequence).
    Returns tokens [B, max_len] (prompt + generated, padded with eot).

    suppress_specials masks control tokens (sot, language, task markers,
    sot_prev/sot_lm, no_speech, no_timestamps) from generation — the standard
    Whisper decoding constraint; eot and timestamp tokens stay allowed.
    """
    b = enc_out.shape[0]
    d = cfg.dim
    n_layers = cfg.n_dec_layers
    n_init = initial_tokens.shape[1]

    # precompute cross-attention K/V per layer: [L, B, S_enc, d]
    cross_k, cross_v = precompute_cross_kv(params, enc_out)

    tokens0 = jnp.full((b, max_len), eot_id, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, initial_tokens.astype(jnp.int32),
                                           (0, 0))
    # specials span (eot, timestamp_begin); eot itself stays allowed.
    # vocab layout: eot, sot, languages..., translate, transcribe, sot_lm,
    # sot_prev, no_speech, no_timestamps, then timestamps (tokenizer.py).
    # eot_id is traced (it may be -1 to disable eot stopping), so the mask is
    # built with array ops rather than Python branching.
    n_langs = 100 if cfg.vocab_size >= 51866 else 99
    ts_begin = eot_id + 1 + 1 + n_langs + 6  # == WhisperTokens.timestamp_begin
    vocab_ids = jnp.arange(cfg.vocab_size)
    suppress_mask = (suppress_specials & (eot_id >= 0)
                     & (vocab_ids > eot_id) & (vocab_ids < ts_begin))
    self_k0 = jnp.zeros((n_layers, b, max_len, d), enc_out.dtype)
    self_v0 = jnp.zeros((n_layers, b, max_len, d), enc_out.dtype)
    finished0 = jnp.zeros((b,), bool)

    def prompt_step(pos, carry):
        tokens, self_k, self_v = carry
        _, self_k, self_v = decoder_step(params, cross_k, cross_v, tokens,
                                         self_k, self_v, pos, cfg)
        return tokens, self_k, self_v

    # prefill the prompt (all but the last prompt token only fill caches)
    tokens, self_k, self_v = jax.lax.fori_loop(
        0, n_init - 1, prompt_step, (tokens0, self_k0, self_v0))

    def cond(state):
        pos, tokens, self_k, self_v, finished = state
        return (pos < max_len - 1) & ~jnp.all(finished)

    def body(state):
        pos, tokens, self_k, self_v, finished = state
        logits, self_k, self_v = decoder_step(params, cross_k, cross_v, tokens,
                                              self_k, self_v, pos, cfg)
        logits = jnp.where(suppress_mask[None, :], -jnp.inf, logits)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, eot_id, next_tok)
        finished = finished | (next_tok == eot_id)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None],
                                              (0, pos + 1))
        return pos + 1, tokens, self_k, self_v, finished

    _, tokens, _, _, _ = jax.lax.while_loop(
        cond, body, (n_init - 1, tokens, self_k, self_v, finished0))
    return tokens
