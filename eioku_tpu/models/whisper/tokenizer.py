"""Whisper token vocabulary: special-token layout + GPT2-style byte-level BPE
decoding.

Transcription only needs *decoding* (ids -> text). When a standard vocab.json
is present under the model cache dir it is used; otherwise a deterministic
placeholder decoding keeps the pipeline functional (zero-egress environments
run with random weights, so token ids are arbitrary there anyway).

Special-token layout follows the public Whisper vocabularies:
  multilingual v2 (n_vocab 51865): eot 50257, sot 50258, 99 languages from
  50259, translate/transcribe follow, no_timestamps 50363
  large-v3 (n_vocab 51866): 100 languages, everything after shifted by one
"""
from __future__ import annotations

import json
import os
from functools import lru_cache

LANGUAGES = [
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
]


class WhisperTokens:
    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size
        self.eot = 50257
        self.sot = 50258
        self.lang_base = 50259
        self.n_langs = 100 if vocab_size >= 51866 else 99
        self.translate = self.lang_base + self.n_langs
        self.transcribe = self.translate + 1
        self.sot_lm = self.transcribe + 1
        self.sot_prev = self.sot_lm + 1
        self.no_speech = self.sot_prev + 1
        self.no_timestamps = self.no_speech + 1
        self.timestamp_begin = self.no_timestamps + 1  # <|0.00|>

    def lang_token(self, lang: str) -> int:
        try:
            return self.lang_base + LANGUAGES.index(lang)
        except ValueError:
            return self.lang_base  # default en

    def sot_sequence(self, lang: str | None = "en",
                     timestamps: bool = False) -> list[int]:
        seq = [self.sot, self.lang_token(lang or "en"), self.transcribe]
        if not timestamps:
            seq.append(self.no_timestamps)
        return seq

    def is_special(self, tok: int) -> bool:
        return tok >= self.eot

    def timestamp_seconds(self, tok: int) -> float | None:
        if tok >= self.timestamp_begin:
            return (tok - self.timestamp_begin) * 0.02
        return None


@lru_cache(maxsize=1)
def _byte_decoder() -> dict[str, int]:
    """GPT2 printable-char <-> byte mapping (inverse direction)."""
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


class WhisperTextDecoder:
    """ids -> text. Uses vocab.json when available, placeholder otherwise."""

    def __init__(self, vocab: dict[str, int] | None, tokens: WhisperTokens):
        self.tokens = tokens
        self.id_to_token = {v: k for k, v in vocab.items()} if vocab else None

    @classmethod
    def from_cache_dir(cls, cache_dir: str | None, vocab_size: int
                       ) -> "WhisperTextDecoder":
        tokens = WhisperTokens(vocab_size)
        if cache_dir:
            for cand in ("whisper/vocab.json", "vocab.json"):
                path = os.path.join(cache_dir, cand)
                if os.path.isfile(path):
                    with open(path, encoding="utf-8") as f:
                        return cls(json.load(f), tokens)
        return cls(None, tokens)

    def decode(self, ids: list[int]) -> str:
        text_ids = [i for i in ids if not self.tokens.is_special(i)]
        if not text_ids:
            return ""
        if self.id_to_token is None:
            # placeholder decoding: stable, clearly non-linguistic
            return " ".join(f"<{i}>" for i in text_ids)
        bd = _byte_decoder()
        raw = "".join(self.id_to_token.get(i, "") for i in text_ids)
        data = bytes(bd.get(ch, ord(" ") if ord(ch) < 256 else 32) for ch in raw)
        return data.decode("utf-8", errors="replace").strip()
