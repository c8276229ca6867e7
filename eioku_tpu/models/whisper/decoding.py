"""Whisper decoding with OpenAI-rule logit filters and on-device beam search.

Capability parity target: the reference transcribes through faster-whisper
(/root/reference/ml-service/src/services/model_manager.py:409-467), whose
CTranslate2 engine applies the standard Whisper decode constraints — special
and non-speech token suppression, blank suppression at the start, timestamp
pairing/monotonicity rules, a no-speech probability, and beam search (its
default beam_size is 5).

TPU redesign: the entire decode — filters, beam bookkeeping, KV-cache
reordering — is one jitted `lax.while_loop`, so decoding a batch of 30 s
windows is a single device program with no host round-trips per token. Beams
are folded into the batch dimension ([B windows, K beams] -> B*K rows) so the
MXU always sees one large matmul per step.

Finished beams are frozen in place (their only candidate is EOT at logprob 0)
rather than moved to a separate "finished" list — the standard fixed-shape
formulation for compiled beam search.

Timestamp rules implemented (mirroring the public Whisper reference decoder):
  - the no-timestamps token is suppressed when timestamps are requested;
  - timestamps come in pairs: after a segment-end timestamp the next token
    must be text; after a segment-start timestamp, text or a closing
    timestamp; the first generated token must be a timestamp;
  - timestamps are monotonically non-decreasing within a window;
  - the first timestamp is capped at `max_initial_ts_index` (1.0 s default);
  - if the total probability mass on timestamp tokens exceeds the most likely
    text token, a timestamp is forced.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.whisper.model import (
    WhisperConfig,
    decoder_step,
    precompute_cross_kv,
)
from eioku_tpu.models.whisper.tokenizer import WhisperTokens

# Token ids of sounds/symbols that never occur in speech (bracketed noise
# annotations, music symbols, etc.) in the multilingual Whisper vocabulary —
# the published `suppress_tokens` list every Whisper runtime applies by
# default (only ids below the special-token range; specials are masked
# separately from the vocab layout).
NON_SPEECH_TOKENS = (
    1, 2, 7, 8, 9, 10, 14, 25, 26, 27, 28, 29, 31, 58, 59, 60, 61, 62, 63,
    90, 91, 92, 93, 359, 503, 522, 542, 873, 893, 902, 918, 922, 931, 1350,
    1853, 1982, 2460, 2627, 3246, 3253, 3268, 3536, 3846, 3961, 4183, 4667,
    6585, 6647, 7273, 9061, 9383, 10428, 10929, 11938, 12033, 12331, 12562,
    13793, 14157, 14635, 15265, 15618, 16553, 16604, 18362, 18956, 20075,
    21675, 22520, 26130, 26161, 26435, 28279, 29464, 31650, 32302, 32470,
    36865, 42863, 47425, 49870, 50254,
)

BLANK_TOKEN = 220  # byte-BPE id of " "

_NEG = jnp.float32(-1e30)


def build_suppress_masks(tokens: WhisperTokens, timestamps: bool,
                         non_speech: bool = True):
    """Host-side construction of the two suppression masks.

    Returns (suppress_always [vocab] bool, suppress_begin [vocab] bool):
    `suppress_always` is applied at every generation step; `suppress_begin`
    additionally at the first generated position (blank + EOT, so a window
    never opens with silence or an immediate stop).
    """
    vocab = tokens.vocab_size
    always = np.zeros(vocab, bool)
    # sot, languages, translate/transcribe, sot_lm, sot_prev, no_speech
    always[tokens.sot:tokens.no_speech + 1] = True
    always[tokens.no_timestamps] = True
    if not timestamps:
        always[tokens.timestamp_begin:] = True
    if non_speech:
        always[list(NON_SPEECH_TOKENS)] = True
    begin = np.zeros(vocab, bool)
    begin[BLANK_TOKEN] = True
    begin[tokens.eot] = True
    return jnp.asarray(always), jnp.asarray(begin)


@partial(jax.jit, static_argnames=("cfg", "max_len", "beam_size",
                                   "timestamps", "max_initial_ts_index",
                                   "sample", "step_fn", "cross_kv_fn",
                                   "kv_dim"))
def whisper_decode_windows(params, enc_out: jnp.ndarray,
                           initial_tokens: jnp.ndarray,
                           suppress_always: jnp.ndarray,
                           suppress_begin: jnp.ndarray,
                           cfg: WhisperConfig, max_len: int = 224,
                           beam_size: int = 1, timestamps: bool = True,
                           max_initial_ts_index: int = 50,
                           sot_index: int = 0,
                           sample: bool = False,
                           temperature: float = 1.0,
                           key: jnp.ndarray | None = None,
                           step_fn=None, cross_kv_fn=None,
                           kv_dim: int | None = None):
    """Decode a batch of encoded 30 s windows with beam search + logit rules.

    enc_out [B, 1500, d]; initial_tokens [B, n_init] SOT sequences.
    sot_index: position of the SOT token in the prompt — 0 for plain
    prompts, 1+len(prev) when a sot_prev context precedes it (the silence
    gate must read the distribution emitted AFTER consuming SOT, as
    openai-whisper's probs_at_sot does).
    sample=True switches from beam search to `beam_size` independent
    sampling chains at `temperature` (faster-whisper's `best_of` semantics
    for its temperature-fallback ladder); `key` seeds the chains and must
    be provided. temperature is traced, so the whole fallback ladder reuses
    one compiled program. Ranking still picks the chain with the best
    average (unscaled) logprob.
    Returns (tokens [B, max_len] int32 — the best beam per window, prompt
    included and EOT-padded; avg_logprob [B] float32 over generated tokens
    incl. EOT; no_speech_prob [B] float32 from the SOT-position logits).
    """
    tk = WhisperTokens(cfg.vocab_size)  # single source of the vocab layout
    eot = tk.eot
    ts_begin = tk.timestamp_begin
    no_speech_id = tk.no_speech
    vocab = cfg.vocab_size
    b = enc_out.shape[0]
    k = beam_size
    bk = b * k
    # step_fn/cross_kv_fn/kv_dim: the tensor-parallel decode swaps in
    # decoder_step_tp with per-device d/tp KV caches (decode_windows_tp);
    # default = the single-device incremental step
    step_fn = step_fn or decoder_step
    cross_kv_fn = cross_kv_fn or precompute_cross_kv
    d = kv_dim or cfg.dim
    n_layers = cfg.n_dec_layers
    n_init = initial_tokens.shape[1]
    vocab_ids = jnp.arange(vocab)

    # [L, B, S, d] — beams fold into the token batch below, but cross-KV stays
    # un-repeated: decoder_step groups each window's k beams onto one row
    cross_k, cross_v = cross_kv_fn(params, enc_out)

    tokens0 = jnp.full((bk, max_len), eot, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(
        tokens0, jnp.repeat(initial_tokens.astype(jnp.int32), k, axis=0),
        (0, 0))
    self_k0 = jnp.zeros((n_layers, bk, max_len, d), enc_out.dtype)
    self_v0 = jnp.zeros((n_layers, bk, max_len, d), enc_out.dtype)

    def prompt_step(pos, carry):
        tokens, sk, sv, nsp = carry
        logits, sk, sv = step_fn(params, cross_k, cross_v, tokens,
                                 sk, sv, pos, cfg)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        nsp = jnp.where(pos == sot_index, probs[:, no_speech_id], nsp)
        return tokens, sk, sv, nsp

    tokens, self_k, self_v, no_speech = jax.lax.fori_loop(
        0, n_init - 1, prompt_step,
        (tokens0, self_k0, self_v0, jnp.zeros((bk,), jnp.float32)))

    if sample:
        # sampling chains are independent from the start: all live
        sum_lp0 = jnp.zeros((b, k), jnp.float32)
    else:
        # identical initial beams: only beam 0 may seed candidates
        sum_lp0 = jnp.tile(jnp.where(jnp.arange(k) == 0, 0.0, -1e9)[None],
                           (b, 1)).astype(jnp.float32)
    n_gen0 = jnp.zeros((b, k), jnp.int32)
    finished0 = jnp.zeros((b, k), bool)

    def apply_timestamp_rules(logits, tokens, pos):
        gen_cols = jnp.arange(max_len)
        gen_mask = (gen_cols >= n_init) & (gen_cols <= pos)  # sampled region
        is_ts = (tokens >= ts_begin) & gen_mask[None]
        # rules keep timestamps non-decreasing, so max == most recent
        last_ts = jnp.max(jnp.where(is_ts, tokens, -1), axis=-1)  # [BK]
        last_tok = jax.lax.dynamic_slice(tokens, (0, pos), (bk, 1))[:, 0]
        penult_tok = jax.lax.dynamic_slice(
            tokens, (0, jnp.maximum(pos - 1, 0)), (bk, 1))[:, 0]
        last_was_ts = (pos >= n_init) & (last_tok >= ts_begin)
        penult_was_ts = (pos - 1 < n_init) | (penult_tok >= ts_begin)
        is_ts_col = (vocab_ids >= ts_begin)[None]
        is_text_col = (vocab_ids < eot)[None]
        # segment-end timestamp (a closed pair): next token must be text
        logits = jnp.where((last_was_ts & penult_was_ts)[:, None] & is_ts_col,
                           _NEG, logits)
        # segment-start timestamp: next must close the pair (or EOT)
        logits = jnp.where((last_was_ts & ~penult_was_ts)[:, None]
                           & is_text_col, _NEG, logits)
        # monotonic: suppress [ts_begin, floor); an open pair may repeat the
        # same timestamp, a closed pair must advance past it
        floor = jnp.where(last_was_ts & ~penult_was_ts, last_ts, last_ts + 1)
        logits = jnp.where((last_ts >= 0)[:, None] & is_ts_col
                           & (vocab_ids[None] < floor[:, None]), _NEG, logits)
        # first generated token must be an early timestamp
        first = pos == n_init - 1
        logits = jnp.where(first & (vocab_ids < ts_begin)[None], _NEG, logits)
        logits = jnp.where(
            first & (vocab_ids > ts_begin + max_initial_ts_index)[None],
            _NEG, logits)
        # probability-mass rule: timestamps collectively more likely than any
        # single text token -> force a timestamp
        lp = jax.nn.log_softmax(logits, axis=-1)
        ts_mass = jax.scipy.special.logsumexp(lp[:, ts_begin:], axis=-1)
        max_text = jnp.max(lp[:, :ts_begin], axis=-1)
        logits = jnp.where((ts_mass > max_text)[:, None]
                           & (vocab_ids < ts_begin)[None], _NEG, logits)
        return logits

    eot_only = jnp.full((vocab,), _NEG).at[eot].set(0.0)

    def cond(state):
        pos, _tokens, _sk, _sv, _sum_lp, _n_gen, finished, _nsp = state
        return (pos < max_len - 1) & ~jnp.all(finished)

    def body(state):
        pos, tokens, sk, sv, sum_lp, n_gen, finished, nsp = state
        logits, sk, sv = step_fn(params, cross_k, cross_v, tokens,
                                 sk, sv, pos, cfg)
        logits = logits.astype(jnp.float32)
        logits = jnp.where(suppress_always[None], _NEG, logits)
        logits = jnp.where((pos == n_init - 1) & suppress_begin[None],
                           _NEG, logits)
        if timestamps:
            logits = apply_timestamp_rules(logits, tokens, pos)
        logprobs = jax.nn.log_softmax(logits, axis=-1)  # [BK, V]
        # frozen (finished) beams contribute exactly one candidate: EOT at 0
        logprobs = jnp.where(finished.reshape(bk)[:, None], eot_only[None],
                             logprobs)
        if sample:
            # independent sampling chains: no cross-chain candidate pooling,
            # no KV reordering; ranking accumulates the unscaled logprob
            step_key = jax.random.fold_in(key, pos)
            sampled = jax.random.categorical(
                step_key, logprobs / jnp.maximum(temperature, 1e-3),
                axis=-1)  # [BK]
            chosen_lp = jnp.take_along_axis(
                logprobs, sampled[:, None], axis=-1)[:, 0]
            new_tok = sampled.reshape(b, k).astype(jnp.int32)
            was_finished = finished
            sum_lp = sum_lp + jnp.where(was_finished, 0.0,
                                        chosen_lp.reshape(b, k))
        else:
            cand = (sum_lp.reshape(bk, 1) + logprobs).reshape(b, k * vocab)
            top_lp, top_idx = jax.lax.top_k(cand, k)  # [B, K]
            src_beam = top_idx // vocab
            new_tok = (top_idx % vocab).astype(jnp.int32)
            if k > 1:  # static: greedy (k=1) needs no beam reordering
                flat_src = (jnp.arange(b)[:, None] * k + src_beam).reshape(bk)
                tokens = jnp.take(tokens, flat_src, axis=0)
                sk = jnp.take(sk, flat_src, axis=1)
                sv = jnp.take(sv, flat_src, axis=1)
                nsp = jnp.take(nsp, flat_src, axis=0)
                n_gen = jnp.take_along_axis(n_gen, src_beam, axis=1)
                was_finished = jnp.take_along_axis(finished, src_beam, axis=1)
            else:
                was_finished = finished
            sum_lp = top_lp
        n_gen = n_gen + jnp.where(was_finished, 0, 1)
        finished = was_finished | (new_tok == eot)
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok.reshape(bk, 1), (0, pos + 1))
        return pos + 1, tokens, sk, sv, sum_lp, n_gen, finished, nsp

    _, tokens, _, _, sum_lp, n_gen, finished, no_speech = jax.lax.while_loop(
        cond, body,
        (n_init - 1, tokens, self_k, self_v, sum_lp0, n_gen0, finished0,
         no_speech))

    avg_lp = sum_lp / jnp.maximum(n_gen.astype(jnp.float32), 1.0)
    # beams that closed with EOT outrank ones cut off at max_len
    rank = jnp.where(finished, avg_lp, avg_lp - 1e4)
    best = jnp.argmax(rank, axis=1)  # [B]
    rows = jnp.arange(b)
    best_tokens = tokens.reshape(b, k, max_len)[rows, best]
    return (best_tokens, avg_lp[rows, best],
            no_speech.reshape(b, k)[:, 0])


def whisper_decode_windows_tp(params, enc_out: jnp.ndarray,
                              initial_tokens: jnp.ndarray,
                              suppress_always: jnp.ndarray,
                              suppress_begin: jnp.ndarray,
                              cfg: WhisperConfig, mesh, axis: str = "model",
                              key: jnp.ndarray | None = None,
                              temperature: float = 1.0, **kwargs):
    """Tensor-parallel whisper_decode_windows: the whole KV-cached beam loop
    runs inside shard_map with Megatron-sharded decoder weights
    (model.decoder_step_tp — per-device KV caches carry d/tp features, one
    psum per residual branch plus the tied-embedding logit reduction). The
    decode-latency lever for large checkpoints: per-step weight reads AND
    attention FLOPs divide by the model-axis size, while all beam/top-k
    logic operates on replicated post-psum logits so every device agrees.
    Accepts whisper_decode_windows' kwargs (beam_size, timestamps, ...);
    numerically identical to it (parity-tested)."""
    tp = mesh.shape[axis]
    if cfg.n_heads % tp:
        raise ValueError(f"n_heads {cfg.n_heads} must divide tp size {tp}")
    if key is None:
        key = jax.random.PRNGKey(0)  # unused unless sample=True
    fn = _decode_tp_fn(cfg, mesh, axis, tuple(sorted(kwargs.items())))
    # temperature rides as a TRACED scalar (not in the cache key): the
    # temperature-fallback ladder re-decodes at 5 temperatures and must hit
    # one compiled program, not five
    return fn(params, enc_out, initial_tokens, suppress_always,
              suppress_begin, key, jnp.float32(temperature))


@lru_cache(maxsize=8)
def _decode_tp_fn(cfg: WhisperConfig, mesh, axis: str,
                  frozen_kwargs: tuple):
    """Build the shard-mapped TP decode ONCE per (cfg, mesh, axis, options):
    fresh closures/partials per call would never hit jit's trace cache."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from eioku_tpu.models.layers import linear
    from eioku_tpu.models.whisper.model import (
        decoder_step_tp,
        init_whisper_params,
        shard_whisper_specs,
    )

    kwargs = dict(frozen_kwargs)
    tp = mesh.shape[axis]
    # spec tree from the abstract param structure (no materialization)
    specs = shard_whisper_specs(
        jax.eval_shape(lambda: init_whisper_params(cfg, seed=0)), axis)

    def step_tp(params_l, ck, cv, tokens, sk, sv, pos, cfg_):
        return decoder_step_tp(params_l, ck, cv, tokens, sk, sv, pos, cfg_,
                               axis=axis)

    def cross_kv_local(params_l, enc_l):
        dec = params_l["dec"]
        ck = jnp.stack([linear(enc_l, layer["cross"]["k"])
                        for layer in dec["layers"]])
        cv = jnp.stack([linear(enc_l, layer["cross"]["v"])
                        for layer in dec["layers"]])
        return ck, cv

    def local(params_l, enc_l, init_l, sup_a, sup_b, key_l, temp_l):
        return whisper_decode_windows(
            params_l, enc_l, init_l, sup_a, sup_b, cfg,
            step_fn=step_tp, cross_kv_fn=cross_kv_local,
            kv_dim=cfg.dim // tp, key=key_l, temperature=temp_l, **kwargs)

    return shard_map(local, mesh=mesh,
                     in_specs=(specs, P(), P(), P(), P(), P(), P()),
                     out_specs=(P(), P(), P()), check_rep=False)
