"""Cross-encoder reranking stage for /api/v1/search (?rerank=1).

Retrieval (bi-encoder cosine / bm25 / RRF fusion) over-fetches candidates;
this stage jointly scores each (query, candidate-text) pair with the
ms-marco cross-encoder (models/embed/cross_encoder.py) and reorders by that
score. Opt-in per request and gated on a real checkpoint: a random-init
cross-encoder would SHUFFLE results, which is strictly worse than the
retrieval order, so without `msmarco-minilm-l6/pytorch_model.bin` under
MODEL_CACHE_DIR the stage reports unavailable and the retrieval order stands.

TPU shape: candidates pad to fixed batch buckets (one compiled program per
bucket, not per candidate count), bf16 trunk, a single device dispatch per
query.
"""
from __future__ import annotations

import logging
import threading

import numpy as np

log = logging.getLogger(__name__)

_BUCKETS = (8, 16, 32, 64)
MAX_CANDIDATES = _BUCKETS[-1]


class Reranker:
    def __init__(self, model_cache_dir: str | None = None, max_len: int = 256):
        self.model_cache_dir = model_cache_dir
        self.max_len = max_len
        self._lock = threading.Lock()
        self._loaded = False
        self._model = None  # (params, cfg, tokenizer) when available

    def _ensure_model(self) -> bool:
        with self._lock:
            if self._loaded:
                return self._model is not None
            self._loaded = True
            self._model = None
            try:
                from eioku_tpu.models.embed.cross_encoder import (
                    load_cross_encoder,
                )
                from eioku_tpu.models.embed.tokenizer import WordPieceTokenizer

                params, cfg, pretrained = load_cross_encoder(
                    self.model_cache_dir)
                tok = WordPieceTokenizer.from_cache_dir(self.model_cache_dir,
                                                        max_len=self.max_len)
            except Exception:
                # a corrupt/truncated/wrong-shape checkpoint must degrade to
                # retrieval order (the module contract), never 500 a search
                log.exception("cross-encoder checkpoint failed to load; "
                              "rerank disabled")
                return False
            if not pretrained or tok.vocab is None:
                log.info("cross-encoder rerank unavailable (checkpoint=%s "
                         "vocab=%s); retrieval order stands",
                         pretrained, tok.vocab is not None)
                return False
            from dataclasses import replace
            self._model = (params, replace(cfg, compute_dtype="bfloat16"), tok)
            log.info("loaded cross-encoder reranker")
            return True

    @property
    def available(self) -> bool:
        return self._ensure_model()

    def rerank(self, query: str, results: list[dict],
               top_k: int) -> list[dict]:
        """Reorder `results` (dicts with a "text" field) by joint
        query-passage relevance; each rescored result gains "rerank_score".
        Only the first MAX_CANDIDATES are rescored — anything beyond keeps
        its retrieval position after them, so top_k > MAX_CANDIDATES never
        loses results."""
        if not results or not self._ensure_model():
            return results[:top_k]
        import jax.numpy as jnp

        from eioku_tpu.models.embed.cross_encoder import cross_encoder_score

        params, cfg, tok = self._model
        cands, tail = results[:MAX_CANDIDATES], results[MAX_CANDIDATES:]
        ids, types, mask = tok.encode_pairs(query,
                                            [r.get("text") or "" for r in cands])
        bucket = next(b for b in _BUCKETS if b >= len(cands))
        pad = bucket - len(cands)
        if pad:  # fixed batch buckets: one compiled program per bucket size
            z = np.zeros((pad, ids.shape[1]), np.int32)
            ids, types, mask = (np.concatenate([a, z]) for a in (ids, types, mask))
        scores = np.asarray(cross_encoder_score(
            params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask),
            cfg))[:len(cands)]
        order = np.argsort(-scores)
        ranked = [{**cands[i], "rerank_score": float(scores[i])} for i in order]
        return (ranked + tail)[:top_k]
