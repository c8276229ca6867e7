"""Speculative greedy decoding: a small draft model proposes, the big model
verifies blocks — same output as target-only greedy, fewer target passes.

The reference's engine decodes strictly token-by-token
(/root/reference/ml-service/src/services/model_manager.py:409-467 via
faster-whisper). On TPU the per-token cost of a large checkpoint is dominated
by reading its weights from HBM once per step; speculative decoding amortizes
that: a cheap draft (e.g. large-v3-turbo drafting for large-v3 — same
vocabulary layout) runs `gamma` greedy steps, then ONE target forward scores
all proposed positions at once (whisper_decode_full — a block matmul the MXU
likes far more than gamma skinny steps). Accepted-prefix + correction
semantics make the result EXACTLY the target's own greedy decode
(property-tested in tests/test_whisper.py), so this is a pure latency/
throughput optimization with an acceptance-rate knob to monitor.

Scope: greedy, timestamps off (the timestamped/beam paths keep the standard
KV-cached loop in decoding.py); suppress_always/suppress_begin are honored
identically to whisper_decode_windows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eioku_tpu.models.whisper.model import WhisperConfig, whisper_decode_full
from eioku_tpu.models.whisper.tokenizer import WhisperTokens

_NEG = -1e9


def _masked_argmax(logits: jnp.ndarray, suppress_always: jnp.ndarray,
                   suppress_begin: jnp.ndarray, at_begin: jnp.ndarray
                   ) -> jnp.ndarray:
    """Greedy pick with the same suppression whisper_decode_windows applies:
    suppress_always everywhere, suppress_begin only for the first generated
    position (at_begin: [B] bool)."""
    logits = jnp.where(suppress_always[None], _NEG, logits)
    logits = jnp.where(at_begin[:, None] & suppress_begin[None], _NEG, logits)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("t_cfg", "d_cfg", "max_len", "gamma"))
def speculative_greedy_decode(t_params, t_cfg: WhisperConfig,
                              d_params, d_cfg: WhisperConfig,
                              t_enc: jnp.ndarray, d_enc: jnp.ndarray,
                              initial_tokens: jnp.ndarray,
                              suppress_always: jnp.ndarray,
                              suppress_begin: jnp.ndarray,
                              max_len: int = 224, gamma: int = 4):
    """Decode [B] windows speculatively.

    t_enc/d_enc: each model's OWN encoder output for the same audio.
    initial_tokens: [B, n_init] shared SOT prompts (vocab layouts must match:
    large-v3 <-> large-v3-turbo do; v2-layout tiny does not draft for v3).
    Returns (tokens [B, max_len] EOT-padded, accept_rate scalar — fraction of
    drafted tokens the target kept, the knob to monitor in production).

    Every iteration runs `gamma` draft forwards + ONE target forward; both
    use full-recompute block attention (whisper_decode_full), trading
    O(L^2) FLOPs for zero KV-cache state — at whisper window lengths
    (<=224 tokens) the weight-read savings dominate on TPU.
    """
    tk = WhisperTokens(t_cfg.vocab_size)
    eot = tk.eot
    b, n_init = initial_tokens.shape
    cols = jnp.arange(max_len)

    tokens0 = jnp.full((b, max_len), eot, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, initial_tokens, (0, 0))
    length0 = jnp.full((b,), n_init, jnp.int32)  # next position to fill
    finished0 = jnp.zeros((b,), bool)

    def gather_at(logits_bsv: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """logits[row, pos[row], :] with pos clamped to the buffer."""
        pos = jnp.clip(pos, 0, max_len - 1)
        return jnp.take_along_axis(
            logits_bsv, pos[:, None, None], axis=1)[:, 0]

    def cond(state):
        _tokens, length, finished, _acc, _drf = state
        return jnp.any(~finished & (length < max_len))

    def body(state):
        tokens, length, finished, acc_total, drafted_total = state

        # -- draft phase: gamma greedy steps with the small model ------------
        drafted = tokens
        for g in range(gamma):
            d_logits = whisper_decode_full(d_params, drafted, d_enc, d_cfg)
            pos = length + g
            prev = jnp.clip(pos - 1, 0, max_len - 1)
            step = _masked_argmax(
                gather_at(d_logits.astype(jnp.float32), prev),
                suppress_always, suppress_begin, at_begin=(prev == n_init - 1))
            write = (cols[None] == pos[:, None]) & ~finished[:, None] \
                & (pos < max_len)[:, None]
            drafted = jnp.where(write, step[:, None], drafted)

        # -- verify phase: ONE target forward over the drafted block ---------
        t_logits = whisper_decode_full(
            t_params, drafted, t_enc, t_cfg).astype(jnp.float32)
        new_tokens, new_len = tokens, length
        still = ~finished  # rows still accepting draft tokens this round
        accepted = jnp.zeros((b,), jnp.int32)
        now_finished = finished
        for g in range(gamma + 1):  # the +1 slot is the free "bonus" token
            pos = length + g
            prev = jnp.clip(pos - 1, 0, max_len - 1)
            t_tok = _masked_argmax(
                gather_at(t_logits, prev), suppress_always, suppress_begin,
                at_begin=(prev == n_init - 1))
            d_tok = jnp.take_along_axis(
                drafted, jnp.clip(pos, 0, max_len - 1)[:, None], axis=1)[:, 0]
            in_range = pos < max_len
            write = still & in_range
            new_tokens = jnp.where(
                (cols[None] == pos[:, None]) & write[:, None],
                t_tok[:, None], new_tokens)
            new_len = jnp.where(write, pos + 1, new_len)
            now_finished = now_finished | (write & (t_tok == eot))
            if g < gamma:
                match = (t_tok == d_tok) & ~(t_tok == eot)
                accepted = accepted + jnp.where(write & match, 1, 0)
                # stop at the first mismatch/EOT: the target token written
                # this step already corrected it
                still = still & match & in_range
            else:
                still = jnp.zeros_like(still)

        acc_total = acc_total + jnp.sum(accepted)
        drafted_total = drafted_total + jnp.sum(
            jnp.where(~finished, gamma, 0))
        return (new_tokens, new_len, now_finished | (new_len >= max_len),
                acc_total, drafted_total)

    tokens, length, _fin, acc, drf = jax.lax.while_loop(
        cond, body, (tokens0, length0, finished0,
                     jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))
    # normalize the tail: everything past the first EOT (or past length)
    # becomes EOT padding, matching whisper_decode_windows' output shape
    gen_region = cols[None] >= n_init
    is_eot = (tokens == eot) & gen_region
    first_eot = jnp.where(jnp.any(is_eot, axis=1),
                          jnp.argmax(is_eot, axis=1), max_len)
    tokens = jnp.where(cols[None] > first_eot[:, None], eot, tokens)
    tokens = jnp.where(cols[None] >= length[:, None], eot, tokens)
    accept_rate = acc / jnp.maximum(drf, 1)
    return tokens, accept_rate


@partial(jax.jit, static_argnames=("cfg", "n_init"))
def score_sequences(t_params, cfg: WhisperConfig, t_enc: jnp.ndarray,
                    tokens: jnp.ndarray, n_init: int,
                    suppress_always: jnp.ndarray,
                    suppress_begin: jnp.ndarray | None = None):
    """Teacher-forced scores for decoded rows: (avg_logprob [B],
    no_speech_prob [B]) — the two silence-gate signals whisper_decode_windows
    accumulates incrementally, recovered here with one block forward so the
    speculative path feeds the same temperature-fallback/no-speech machinery
    (ml/transcribe.py). suppress_begin applies only at the first generated
    position, exactly as the incremental decoder masks it — without it the
    first token's logprob (and so avg_lp/confidence) would read lower here
    than the same decode scored incrementally."""
    tk = WhisperTokens(cfg.vocab_size)
    b, max_len = tokens.shape
    raw = whisper_decode_full(t_params, tokens, t_enc, cfg).astype(
        jnp.float32)
    # no-speech prob reads the RAW logits at the SOT position, exactly like
    # whisper_decode_windows' prompt_step — no_speech is itself in the
    # suppress_always set, so masking first would zero the signal
    probs_sot = jax.nn.softmax(raw[:, 0], axis=-1)
    logits = jnp.where(suppress_always[None, None], _NEG, raw)
    if suppress_begin is not None:
        at_begin = (jnp.arange(max_len) == n_init - 1)[None, :, None]
        logits = jnp.where(at_begin & suppress_begin[None, None], _NEG,
                           logits)
    lp = jax.nn.log_softmax(logits, axis=-1)
    # logits at col i predict token i+1: generated region starts at n_init
    tok_lp = jnp.take_along_axis(lp[:, :-1], tokens[:, 1:, None],
                                 axis=-1)[..., 0]  # [B, max_len-1]
    cols = jnp.arange(max_len - 1)
    gen = cols[None] >= (n_init - 1)
    is_eot = tokens[:, 1:] == tk.eot
    first_eot = jnp.where(jnp.any(is_eot & gen, axis=1),
                          jnp.argmax(is_eot & gen, axis=1), max_len - 2)
    counted = gen & (cols[None] <= first_eot[:, None])  # incl. the EOT
    avg_lp = jnp.sum(jnp.where(counted, tok_lp, 0.0), axis=1) / \
        jnp.maximum(jnp.sum(counted, axis=1), 1)
    return avg_lp, probs_sot[:, tk.no_speech]
