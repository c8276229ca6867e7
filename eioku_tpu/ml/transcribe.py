"""Transcription pipeline: audio -> 30 s windows -> batched encode -> on-device
greedy decode -> transcript segments.

Capability parity: /root/reference/ml-service/src/services/model_manager.py:409-467
(faster-whisper on the whole file, language or auto, vad_filter, segments ->
ms). TPU redesign: fixed 30 s windows are batched through one jitted encoder
call and one jitted whole-sequence greedy-decode loop (KV-cached,
lax.while_loop), so decoding N windows costs one device program regardless of
transcript length.

Checkpoints: `{cache_dir}/whisper-{variant}.npz|.pt|.bin`. Without one, falls
back to a random-weight `tiny` so the pipeline stays exercisable; text decoding
uses vocab.json when available (see tokenizer.py).
"""
from __future__ import annotations

import logging
import math
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.ml import audio_io
from eioku_tpu.utils import progress
from eioku_tpu.models.whisper.decoding import (
    build_suppress_masks,
    whisper_decode_windows,
)
from eioku_tpu.models.whisper.mel import log_mel_spectrogram
from eioku_tpu.models.whisper.model import (
    WhisperConfig,
    init_whisper_params,
    whisper_encode,
)
from eioku_tpu.models.whisper.tokenizer import WhisperTextDecoder, WhisperTokens
from eioku_tpu.models.whisper.weights import load_whisper_checkpoint

log = logging.getLogger(__name__)

WINDOW_S = 30.0
SAMPLES_PER_WINDOW = int(WINDOW_S * audio_io.SAMPLE_RATE)


@lru_cache(maxsize=2)
def _load_model(variant: str, cache_dir: str | None,
                compute_dtype: str = "float32",
                random_full_size: bool = False):
    """Load (or random-init) whisper weights, stored in compute_dtype — bf16
    storage halves HBM for the large variants (params dominate: ~3 GB for
    large-v3 in bf16 vs ~6 GB f32), matching the fp16 storage of the
    reference's engine."""
    import jax.numpy as _jnp

    from eioku_tpu.models.layers import cast_params

    cfg = WhisperConfig(variant, compute_dtype=compute_dtype)
    params = None
    pretrained = False
    if cache_dir:
        for ext in (".npz", ".pt", ".bin"):
            cand = os.path.join(cache_dir, f"whisper-{variant}{ext}")
            if os.path.isfile(cand):
                params = load_whisper_checkpoint(cand, cfg)
                log.info("loaded whisper checkpoint", extra={"path": cand})
                pretrained = True
                break
    if params is None:
        if variant != "tiny" and not random_full_size:
            # production default: random weights emit garbage either way, so
            # don't burn large-variant memory/compute on them. Benchmarks set
            # random_full_size to measure the REAL architecture cost.
            log.warning("no whisper checkpoint for %s; falling back to "
                        "random tiny", variant)
            cfg = WhisperConfig("tiny", compute_dtype=compute_dtype)
        params = init_whisper_params(cfg, seed=0)
    if compute_dtype != "float32":
        params = cast_params(params, _jnp.dtype(compute_dtype))
    return params, cfg, pretrained


@lru_cache(maxsize=2)
def _load_model_int8(variant: str, cache_dir: str | None,
                     random_full_size: bool = False):
    """int8-quantized serving tree, cached like _load_model — PTQ walks the
    whole tree through numpy (seconds of host CPU + a fresh H2D upload for
    the large variants), so it must run once per process, not per task."""
    from eioku_tpu.ops.quant import quantize_linears

    params, cfg, pretrained = _load_model(variant, cache_dir, "bfloat16",
                                          random_full_size)
    return quantize_linears(params), cfg, pretrained


def _normalize_variant(model: str) -> str:
    name = model.removeprefix("whisper-")
    return name if name in ("tiny", "base", "small", "medium", "large-v3",
                            "large-v3-turbo") else "large-v3"


def parse_timestamped_tokens(gen: list[int], tokens, text_decoder,
                             window_start_ms: int, window_end_ms: int
                             ) -> list[dict]:
    """Split a decoded token stream at Whisper timestamp tokens into segments.

    Timestamp tokens encode 0.02 s steps from the window start; text between a
    pair of timestamps becomes one segment (faster-whisper's segment shape,
    reference model_manager.py:437-460). Text outside any timestamp pair falls
    back to the window span.
    """
    segments: list[dict] = []
    seg_start_s: float | None = None
    buf: list[int] = []

    def flush(end_s: float | None) -> None:
        nonlocal buf, seg_start_s
        if not buf:
            seg_start_s = None
            return
        text = text_decoder.decode(buf)
        if text:
            s_ms = window_start_ms + int((seg_start_s or 0.0) * 1000)
            e_ms = window_start_ms + int(end_s * 1000) if end_s is not None \
                else window_end_ms
            e_ms = max(min(e_ms, window_end_ms), s_ms)
            segments.append({"text": text, "start_ms": s_ms, "end_ms": e_ms})
        buf = []
        seg_start_s = None

    for tok in gen:
        ts = tokens.timestamp_seconds(tok)
        if ts is not None:
            if buf:
                flush(ts)
            else:
                seg_start_s = ts
        elif not tokens.is_special(tok):
            buf.append(tok)
    flush(None)
    return segments


def decoded_text(row_ids: list[int], prompt_len: int, tokens,
                 text_decoder) -> str:
    """Plain text of one decoded row (prompt stripped, EOT-truncated)."""
    gen = row_ids[prompt_len:]
    if tokens.eot in gen:
        gen = gen[:gen.index(tokens.eot)]
    return text_decoder.decode([t for t in gen if not tokens.is_special(t)])


def needs_temperature_fallback(avg_lp: float, no_speech_prob: float,
                               text: str, logprob_threshold: float,
                               no_speech_threshold: float,
                               cr_threshold: float) -> bool:
    """faster-whisper's retry predicate. Confident silence (high no-speech
    prob AND weak transcript) is exempt: the original result is kept so the
    silence gate drops it — retrying silence at higher temperature would
    only manufacture hallucinated text."""
    if no_speech_prob > no_speech_threshold and avg_lp < logprob_threshold:
        return False
    if avg_lp < logprob_threshold:
        return True
    return compression_ratio(text) > cr_threshold


def compression_ratio(text: str) -> float:
    """zlib compressibility of the transcript — faster-whisper's repetition
    detector (ratio > 2.4 marks a degenerate/looping decode)."""
    import zlib

    raw = text.encode("utf-8")
    if not raw:
        return 0.0
    return len(raw) / len(zlib.compress(raw))


def run_transcription(video_path: str, config: dict,
                      model_cache_dir: str | None = None) -> list[dict]:
    audio_path = audio_io.find_audio_for_video(video_path)
    if audio_path is None:
        log.warning("no audio stream available for %s (no wav/mp3/ogg/flac "
                    "sidecar); emitting empty transcript", video_path)
        return []
    audio = audio_io.load_audio(audio_path)
    if len(audio) == 0:
        return []
    language = config.get("language")
    vad = bool(config.get("vad_filter", True))
    windows = audio_io.split_windows(audio, window_s=WINDOW_S, vad=vad,
                                     model_cache_dir=model_cache_dir)
    if not windows:
        return []

    variant = _normalize_variant(config.get("model", "large-v3"))
    # bf16 weights + activations mirror faster-whisper's fp16 default
    # (config {"compute_dtype": "float32"} overrides). "int8" /
    # "int8_bfloat16" (faster-whisper's compute_type names) loads bf16 and
    # post-training-quantizes every linear below. For the TURBO serving
    # variant int8 is the measured default: 5 alternating bf16/int8 pairs
    # on the live TPU put int8 at 162-164 audio-s/s vs bf16's 152.7-153.4
    # at the realistic beam-5/224-token budget (tools/whisper_int8_repeats,
    # 2026-08-21; docs/PERF.md) — the halved weight reads win in the
    # bandwidth-bound 4-layer decode loop. ~1e-3-scale logit deviation,
    # same PTQ scheme faster-whisper's int8 compute type applies.
    default_cd = "int8" if variant == "large-v3-turbo" else "bfloat16"
    cd_raw = str(config.get("compute_dtype", default_cd))
    want_int8 = cd_raw.lower().startswith("int8")
    params, cfg, pretrained = _load_model(
        variant, model_cache_dir,
        "bfloat16" if want_int8 else cd_raw,
        bool(config.get("random_full_size", False)))
    tokens = WhisperTokens(cfg.vocab_size)
    text_decoder = WhisperTextDecoder.from_cache_dir(model_cache_dir,
                                                     cfg.vocab_size)
    # segment-level timestamps need a real model; random weights use plain mode
    want_ts = config.get("timestamps", "auto")
    use_timestamps = pretrained if want_ts == "auto" else bool(want_ts)
    if language is None and pretrained:
        # auto-detect from the first voiced window (reference behavior:
        # language=NULL tasks auto-detect, video_discovery_service fan-out)
        from eioku_tpu.models.whisper.model import whisper_detect_language
        from eioku_tpu.models.whisper.tokenizer import LANGUAGES

        first_mel = log_mel_spectrogram(jnp.asarray(windows[0][1][None]),
                                        n_mels=cfg.n_mels)
        first_enc = whisper_encode(params, first_mel, cfg)
        lang_idx = int(whisper_detect_language(params, first_enc, cfg)[0])
        language = LANGUAGES[lang_idx]
        log.info("auto-detected language", extra={"language": language})
    # faster-whisper's task parameter: "translate" decodes English output
    # from any source language (config {"task": "translate"})
    task = str(config.get("task", "transcribe"))
    if task not in ("transcribe", "translate"):
        log.warning("unknown whisper task %r; transcribing", task)
        task = "transcribe"
    sot = tokens.sot_sequence(language or "en", timestamps=use_timestamps,
                              task=task)

    # custom-vocabulary / initial-prompt biasing (reference engine:
    # faster-whisper's initial_prompt + hotwords; spec requirement 5.6,
    # .kiro/specs/semantic-video-search/requirements.md): the terms ride as
    # sot_prev left context so the decoder prioritizes them. Capped at half
    # the 448-token decoder context minus the sot_prev slot, Whisper's rule.
    prompt_text = str(config.get("initial_prompt") or "")
    hot = config.get("hotwords") or config.get("custom_vocabulary")
    if hot:
        hot_text = ", ".join(hot) if isinstance(hot, (list, tuple)) else str(hot)
        prompt_text = (prompt_text + " " + hot_text).strip()
    prompt_ids: list[int] = []
    if prompt_text and pretrained:
        from eioku_tpu.models.whisper.tokenizer import WhisperTextEncoder

        prompt_ids = WhisperTextEncoder.from_cache_dir(
            model_cache_dir).encode(" " + prompt_text.strip())[-(448 // 2 - 1):]
        if not prompt_ids:
            log.warning("initial_prompt/custom_vocabulary set but no "
                        "vocab.json under the model cache; prompt disabled")
    init_seq = ([tokens.sot_prev] + prompt_ids if prompt_ids else []) + sot
    sot_index = len(init_seq) - len(sot)

    # speculative decoding (opt-in): a draft checkpoint proposes, this model
    # verifies — output is EXACTLY the greedy decode (models/whisper/
    # speculative.py). Eligible only for the plain-greedy configuration; the
    # beam/timestamp paths keep the KV-cached loop.
    spec_draft = None
    draft_model = config.get("draft_model")
    if draft_model and pretrained:
        # cheap config checks FIRST: loading a large draft checkpoint only
        # to discover the beam/timestamp config disqualifies it would pin
        # gigabytes of unused weights for the whole job
        cfg_ok = (int(config.get("beam_size", 5)) == 1
                  and not use_timestamps and not prompt_ids)
        eligible = False
        if cfg_ok:
            d_params, d_cfg, d_pre = _load_model(
                _normalize_variant(str(draft_model)), model_cache_dir,
                "bfloat16" if want_int8 else cd_raw)
            eligible = d_pre and d_cfg.vocab_size == cfg.vocab_size
        if eligible:
            spec_draft = (d_params, d_cfg)
        else:
            log.warning("draft_model set but speculative decoding needs a "
                        "pretrained same-vocab draft, beam_size=1, "
                        "timestamps off, and no initial prompt; using the "
                        "standard decode")

    # tensor-parallel serving (opt-in, config {"tensor_parallel": N}): shard
    # the encoder/decoder weights Megatron-style over an N-device model axis —
    # per-window latency divides by N for large checkpoints (weights AND
    # attention FLOPs split; one psum per residual branch rides ICI). Output
    # is token-for-token identical to the single-device decode (parity-tested,
    # tests/test_parallel.py::TestTensorParallelWhisperDecode).
    tp_mesh = None
    tp = int(config.get("tensor_parallel", 1))
    # previous-text conditioning runs the serial single-device decode
    # (_run_conditioned) — building a TP context for it would claim the mesh
    # in the logs while every window actually decodes on one device
    conditioned = (bool(config.get("condition_on_previous_text", False))
                   and pretrained)
    if tp > 1:
        if (len(jax.devices()) >= tp and cfg.n_heads % tp == 0
                and spec_draft is None and not conditioned):
            from eioku_tpu.parallel.mesh import make_mesh

            tp_mesh = make_mesh(tp, model_parallel=tp)
            # place the weights with their Megatron shardings ONCE: the
            # shard-mapped encode/decode in_specs would otherwise re-scatter
            # the full replicated tree (~3 GB bf16 for large-v3) across the
            # mesh on EVERY batched call — the redistribution would dominate
            # the per-window latency the N-way split exists to divide
            from jax.sharding import NamedSharding

            from eioku_tpu.models.whisper.model import shard_whisper_specs

            specs = shard_whisper_specs(params)
            params = jax.device_put(params, jax.tree.map(
                lambda s: NamedSharding(tp_mesh, s), specs))
            log.info("tensor-parallel transcription", extra={"tp": tp})
        else:
            log.warning("tensor_parallel=%d needs >=%d devices, "
                        "n_heads %% tp == 0, no draft_model, and "
                        "condition_on_previous_text off (serial decode); "
                        "falling back to single-device decode", tp, tp)

    if want_int8:
        if tp_mesh is None:
            # every attention/MLP linear (enc + dec) int8 — halved weight
            # storage/reads; measured within tunnel variance of bf16 for
            # throughput (docs/PERF.md), so this is a memory opt-in.
            # Convs, embeddings, and layernorms stay bf16
            # (ops/quant.py walks the tree by shape). Parity with the
            # reference engine's compute_type="int8" (faster-whisper). The
            # quantized tree is process-cached: PTQ must not re-run per task.
            params, _, _ = _load_model_int8(
                variant, model_cache_dir,
                bool(config.get("random_full_size", False)))
            log.info("int8-quantized whisper serving",
                     extra={"compute_type": cd_raw})
        else:
            log.warning("compute_dtype int8 is single-device; the "
                        "tensor_parallel path keeps bf16 weights")

    def _encode(mel_b: jnp.ndarray) -> jnp.ndarray:
        if tp_mesh is not None:
            from eioku_tpu.models.whisper.model import whisper_encode_tp

            return whisper_encode_tp(params, mel_b, cfg, tp_mesh)
        return whisper_encode(params, mel_b, cfg)

    def _decode(enc_b: jnp.ndarray, init_b: jnp.ndarray, **kw):
        if tp_mesh is not None:
            from eioku_tpu.models.whisper.decoding import (
                whisper_decode_windows_tp,
            )

            return whisper_decode_windows_tp(
                params, enc_b, init_b, suppress_always, suppress_begin, cfg,
                tp_mesh, **kw)
        return whisper_decode_windows(
            params, enc_b, init_b, suppress_always, suppress_begin, cfg, **kw)

    batch_size = int(config.get("batch_size", 8))
    max_tokens = int(config.get("max_tokens", 128))
    # faster-whisper decode defaults (the reference's engine): beam_size 5,
    # no_speech_threshold 0.6, logprob_threshold -1.0. Beam search only pays
    # off with real weights; random-init fallback decodes greedily.
    beam_size = int(config.get("beam_size", 5)) if pretrained else 1
    no_speech_threshold = float(config.get("no_speech_threshold", 0.6))
    logprob_threshold = float(config.get("logprob_threshold", -1.0))
    # faster-whisper's temperature-fallback ladder: a window whose best-beam
    # decode is low-confidence or degenerately repetitive is re-decoded with
    # sampling chains at increasing temperature (pretrained weights only)
    temperatures = tuple(config.get("temperatures",
                                    (0.2, 0.4, 0.6, 0.8, 1.0))) \
        if pretrained else ()
    cr_threshold = float(config.get("compression_ratio_threshold", 2.4))
    suppress_always, suppress_begin = build_suppress_masks(
        tokens, timestamps=use_timestamps,
        non_speech=bool(config.get("suppress_non_speech", True)))
    # word-level timings need a real checkpoint AND a real vocabulary to group
    # byte-BPE tokens into words (faster-whisper's word_timestamps option)
    want_words = (bool(config.get("word_timestamps", False)) and pretrained
                  and text_decoder.id_to_token is not None)
    total_ms = int(len(audio) / audio_io.SAMPLE_RATE * 1000)
    results: list[dict] = []

    def emit_window(row_ids: list[int], prompt_len: int, avg_lp_j: float,
                    no_speech_j: float, start_ms: int,
                    align_row: np.ndarray | None) -> list[int] | None:
        """Post-process one decoded window row into transcript results.

        Returns the generated text tokens (for previous-text conditioning),
        or None when the window was gated as silence/low-quality."""
        gen = row_ids[prompt_len:]
        if tokens.eot in gen:
            gen = gen[:gen.index(tokens.eot)]
        end_ms = min(start_ms + int(WINDOW_S * 1000), total_ms)
        if not pretrained:
            # random weights produce arbitrary ids; suppress text
            return None
        if no_speech_j > no_speech_threshold and avg_lp_j < logprob_threshold:
            # faster-whisper silence gate: confident no-speech AND a weak
            # transcript -> drop the window
            return None
        confidence = float(min(1.0, max(0.0, math.exp(avg_lp_j))))
        segs = []
        if use_timestamps:
            segs = parse_timestamped_tokens(gen, tokens, text_decoder,
                                            start_ms, end_ms)
        if not segs:
            text = text_decoder.decode(gen)
            if text:
                segs = [{"text": text, "start_ms": start_ms, "end_ms": end_ms}]
        words: list[dict] = []
        if align_row is not None and gen:
            from eioku_tpu.models.whisper.align import word_timestamps
            n_frames = max((end_ms - start_ms) // 20, 1)
            words = word_timestamps(
                align_row[prompt_len:prompt_len + len(gen)], gen, text_decoder,
                start_ms, n_frames)
        # each word goes to exactly one segment: the one containing its
        # midpoint (closest span when boundaries drift)
        seg_words_map: dict[int, list[dict]] = {s: [] for s in range(len(segs))}
        for w in words if segs else []:
            mid = (w["start_ms"] + w["end_ms"]) // 2
            best_s = min(range(len(segs)), key=lambda s: (
                0 if segs[s]["start_ms"] <= mid < segs[s]["end_ms"]
                else min(abs(mid - segs[s]["start_ms"]),
                         abs(mid - segs[s]["end_ms"]))))
            seg_words_map[best_s].append(w)
        for s, seg in enumerate(segs):
            results.append({
                "payload": {"text": seg["text"], "language": language,
                            "start_ms": seg["start_ms"],
                            "end_ms": seg["end_ms"],
                            "confidence": confidence,
                            "words": seg_words_map[s]},
                "span_start_ms": seg["start_ms"],
                "span_end_ms": seg["end_ms"],
            })
        return [t for t in gen if not tokens.is_special(t)]

    def frame_count(start_ms: int) -> int:
        return max((min(start_ms + int(WINDOW_S * 1000), total_ms)
                    - start_ms) // 20, 1)

    def alignment(out_rows: jnp.ndarray, enc, counts: np.ndarray):
        from eioku_tpu.models.whisper.model import cross_attention_alignment
        return np.asarray(cross_attention_alignment(
            params, out_rows, enc, cfg, jnp.asarray(counts)))

    # previous-text conditioning (faster-whisper's default) serializes
    # windows, so it is opt-in here: the batched path below keeps the MXU full
    # and is the TPU-native default
    if conditioned:
        _run_conditioned(windows, params, cfg, tokens, sot, suppress_always,
                         suppress_begin, max_tokens, beam_size, use_timestamps,
                         want_words, emit_window, frame_count, alignment,
                         text_decoder, temperatures,
                         (logprob_threshold, no_speech_threshold,
                          cr_threshold), initial_prev=prompt_ids)
        return results

    for i in range(0, len(windows), batch_size):
        chunk = windows[i:i + batch_size]
        pad = batch_size - len(chunk)
        wav = np.stack([c[1] for c in chunk] +
                       [np.zeros(SAMPLES_PER_WINDOW, np.float32)] * pad)
        mel = log_mel_spectrogram(jnp.asarray(wav), n_mels=cfg.n_mels)
        enc = _encode(mel)
        init = jnp.asarray([init_seq] * batch_size, jnp.int32)
        if spec_draft is not None:
            from eioku_tpu.models.whisper.speculative import (
                score_sequences,
                speculative_greedy_decode,
            )

            d_params, d_cfg = spec_draft
            d_enc = whisper_encode(d_params, mel, d_cfg)
            out, accept_rate = speculative_greedy_decode(
                params, cfg, d_params, d_cfg, enc, d_enc, init,
                suppress_always, suppress_begin,
                max_len=max_tokens + sot_index,
                gamma=int(config.get("speculative_gamma", 4)))
            avg_lp, no_speech = score_sequences(
                params, cfg, enc, out, len(init_seq), suppress_always,
                suppress_begin)
            log.info("speculative decode", extra={
                "accept_rate": round(float(accept_rate), 3)})
        else:
            out, avg_lp, no_speech = _decode(
                enc, init, max_len=max_tokens + sot_index,
                beam_size=beam_size, timestamps=use_timestamps,
                sot_index=sot_index)
        out_j = out
        out = np.array(out)  # writable: the fallback ladder adopts rows
        avg_lp = np.array(avg_lp)
        no_speech = np.asarray(no_speech)

        def _fallback_needed(j: int) -> bool:
            return needs_temperature_fallback(
                float(avg_lp[j]), float(no_speech[j]),
                decoded_text(out[j].tolist(), len(init_seq), tokens,
                             text_decoder),
                logprob_threshold, no_speech_threshold, cr_threshold)

        failed = [j for j in range(len(chunk)) if _fallback_needed(j)] \
            if temperatures else []
        any_fallback = bool(failed)
        for ti, temp in enumerate(temperatures):
            if not failed:
                break
            # re-decode the whole (same-shape) batch with sampling chains at
            # this temperature — one compiled program serves the full ladder —
            # and adopt the new rows for the failed windows only. The final
            # rung is adopted unconditionally (the silence gate still applies).
            key = jax.random.PRNGKey((i << 8) | ti)
            out_t, lp_t, _ = _decode(
                enc, init, max_len=max_tokens + sot_index,
                beam_size=beam_size, timestamps=use_timestamps,
                sot_index=sot_index, sample=True, temperature=temp, key=key)
            out_t, lp_t = np.asarray(out_t), np.asarray(lp_t)
            out[failed] = out_t[failed]
            avg_lp[failed] = lp_t[failed]
            failed = [j for j in failed if _fallback_needed(j)]
            log.info("temperature fallback", extra={
                "temperature": temp, "remaining": len(failed)})
        if any_fallback:
            out_j = jnp.asarray(out)  # alignment runs on the adopted rows
        align = None
        if want_words:
            # one teacher-forced pass over the already-decoded (fixed-shape)
            # rows captures text->audio attention for DTW word alignment;
            # frame counts keep normalization off the zero-padded tail
            counts = np.full(batch_size, 1500, np.int32)
            for j, (start_ms, _) in enumerate(chunk):
                counts[j] = frame_count(start_ms)
            align = alignment(out_j, enc, counts)
        for j, (start_ms, _) in enumerate(chunk):
            emit_window(out[j].tolist(), len(init_seq), float(avg_lp[j]),
                        float(no_speech[j]), start_ms,
                        align[j] if align is not None else None)
        progress.report((i + len(chunk)) / len(windows))
    return results


# previous-context prompt budgets: a handful of fixed lengths so the jitted
# decode compiles once per bucket instead of once per unique prompt length
_PROMPT_BUCKETS = (0, 16, 32, 64, 128)


def _run_conditioned(windows, params, cfg, tokens, sot, suppress_always,
                     suppress_begin, max_tokens, beam_size, use_timestamps,
                     want_words, emit_window, frame_count, alignment,
                     text_decoder, temperatures, thresholds,
                     initial_prev: list[int] | None = None) -> None:
    """Sequential decode with previous-text conditioning (sot_prev prompt).

    Mirrors faster-whisper's condition_on_previous_text: each window's prompt
    is [sot_prev] + tail of the previous text + the SOT sequence; context
    resets after a gated (silent/low-quality) window to stop hallucination
    loops, the same reset rule the reference's engine applies. initial_prev
    seeds the context with initial_prompt/custom-vocabulary tokens (exactly
    faster-whisper's initial_prompt placement: prev text of window 0).
    """
    logprob_threshold, no_speech_threshold, cr_threshold = thresholds
    prev: list[int] = list(initial_prev or [])
    for w_idx, (start_ms, wav) in enumerate(windows):
        bucket = max((b for b in _PROMPT_BUCKETS if b <= len(prev)), default=0)
        if bucket:
            ctx = prev[-bucket:]
        elif w_idx == 0 and prev:
            # an initial_prompt shorter than the smallest bucket must still
            # bias window 0 (spec req 5.6) — one exact-length compile instead
            # of silently dropping the custom vocabulary
            ctx = prev
        else:
            ctx = []
        prompt = ([tokens.sot_prev] + ctx if ctx else []) + sot
        mel = log_mel_spectrogram(jnp.asarray(wav[None]), n_mels=cfg.n_mels)
        enc = whisper_encode(params, mel, cfg)
        init = jnp.asarray([prompt], jnp.int32)
        out, avg_lp, no_speech = whisper_decode_windows(
            params, enc, init, suppress_always, suppress_begin, cfg,
            max_len=len(prompt) + max_tokens, beam_size=beam_size,
            timestamps=use_timestamps,
            sot_index=len(prompt) - len(sot))  # silence gate reads SOT's step
        # temperature-fallback ladder (same rules as the batched path;
        # conditioning makes repetition loops MORE likely, so this mode
        # needs it most). faster-whisper also drops the sot_prev prompt at
        # temperature > 0.5; the sampled re-decode here keeps the prompt,
        # whose influence the higher temperature already dilutes.
        for ti, temp in enumerate(temperatures):
            if not needs_temperature_fallback(
                    float(avg_lp[0]), float(no_speech[0]),
                    decoded_text(np.asarray(out)[0].tolist(), len(prompt),
                                 tokens, text_decoder),
                    logprob_threshold, no_speech_threshold, cr_threshold):
                break
            key = jax.random.PRNGKey((w_idx << 8) | ti)
            out, avg_lp, _ = whisper_decode_windows(
                params, enc, init, suppress_always, suppress_begin, cfg,
                max_len=len(prompt) + max_tokens, beam_size=beam_size,
                timestamps=use_timestamps,
                sot_index=len(prompt) - len(sot),
                sample=True, temperature=temp, key=key)
        align = None
        if want_words:
            align = alignment(out, enc,
                              np.asarray([frame_count(start_ms)], np.int32))
        gen_text = emit_window(np.asarray(out)[0].tolist(), len(prompt),
                               float(avg_lp[0]), float(no_speech[0]), start_ms,
                               align[0] if align is not None else None)
        if gen_text is None:
            prev = []  # reset context after a gated window
        else:
            prev = (prev + gen_text)[-max(_PROMPT_BUCKETS):]
        progress.report((w_idx + 1) / len(windows))
