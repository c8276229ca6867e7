"""Search-parity harness: top-10 recall of this framework's retrieval vs the
reference embedding stack.

The rebuild target is top-10 recall >= 0.99 against reference ranking
(BASELINE.md). This harness is runnable wherever real checkpoints exist (the
build environment is zero-egress, so it degrades with a clear message):

  1. loads all-MiniLM-L6-v2 weights twice — through this framework's converter
     (eioku_tpu JAX path) and through HuggingFace transformers (the stack
     sentence-transformers wraps, i.e. what the reference spec'd)
  2. embeds a fixture corpus + queries with both
  3. compares top-10 neighbor sets per query -> recall

Usage:
  python tools/parity_harness.py --model-dir /path/to/minilm-l6 \
      [--corpus corpus.txt] [--queries queries.txt]

model-dir needs pytorch_model.bin + vocab.txt (+ config.json for transformers).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _default_corpus() -> tuple[list[str], list[str]]:
    corpus = [
        "a dog runs across the beach chasing a frisbee",
        "the chef slices onions for the soup",
        "quantum computers need error correction",
        "sunset over the mountain ridge with hikers",
        "the quarterly earnings call covered revenue growth",
        "a toddler laughs at the puppet show",
        "engineers debug the rocket telemetry stream",
        "rain falls on the empty city street at night",
        "the orchestra tunes before the symphony begins",
        "surfers wait for the next big wave",
    ] * 10  # 100 docs
    corpus = [f"{t} (doc {i})" for i, t in enumerate(corpus)]
    queries = ["dog playing on the beach", "cooking dinner",
               "space launch engineering", "music performance",
               "financial results"]
    return corpus, queries


def embed_ours(texts: list[str], model_dir: str) -> np.ndarray:
    from eioku_tpu.models.embed.minilm import load_minilm, minilm_embed
    from eioku_tpu.models.embed.tokenizer import WordPieceTokenizer
    import jax.numpy as jnp

    params, cfg, pretrained = load_minilm(model_dir)
    if not pretrained:
        raise SystemExit(f"no usable checkpoint under {model_dir!r} "
                         "(need pytorch_model.bin or weights.npz)")
    tok = WordPieceTokenizer.from_cache_dir(model_dir, max_len=128)
    if tok.vocab is None:
        raise SystemExit(f"no vocab.txt under {model_dir!r}")
    out = []
    for i in range(0, len(texts), 32):
        ids, mask = tok.encode_batch(texts[i:i + 32])
        out.append(np.asarray(minilm_embed(params, jnp.asarray(ids),
                                           jnp.asarray(mask), cfg)))
    return np.concatenate(out)


def embed_reference(texts: list[str], model_dir: str) -> np.ndarray:
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = AutoModel.from_pretrained(model_dir)
    model.eval()
    out = []
    with torch.no_grad():
        for i in range(0, len(texts), 32):
            batch = tok(texts[i:i + 32], padding="max_length", truncation=True,
                        max_length=128, return_tensors="pt")
            hidden = model(**batch).last_hidden_state
            mask = batch["attention_mask"].unsqueeze(-1).float()
            pooled = (hidden * mask).sum(1) / mask.sum(1)
            pooled = pooled / pooled.norm(dim=-1, keepdim=True)
            out.append(pooled.numpy())
    return np.concatenate(out)


def topk_sets(doc_emb: np.ndarray, query_emb: np.ndarray, k: int = 10
              ) -> list[set]:
    scores = query_emb @ doc_emb.T
    return [set(np.argsort(-s)[:k].tolist()) for s in scores]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--corpus", default=None, help="one document per line")
    ap.add_argument("--queries", default=None, help="one query per line")
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()

    if args.corpus:
        corpus = [line.strip() for line in open(args.corpus) if line.strip()]
        queries = [line.strip() for line in open(args.queries) if line.strip()]
    else:
        corpus, queries = _default_corpus()

    print(f"embedding {len(corpus)} docs + {len(queries)} queries both ways…")
    ours_docs = embed_ours(corpus, args.model_dir)
    ours_q = embed_ours(queries, args.model_dir)
    ref_docs = embed_reference(corpus, args.model_dir)
    ref_q = embed_reference(queries, args.model_dir)

    emb_err = float(np.abs(ours_docs - ref_docs).max())
    print(f"max |embedding| divergence: {emb_err:.2e}")

    ours_top = topk_sets(ours_docs, ours_q, args.top_k)
    ref_top = topk_sets(ref_docs, ref_q, args.top_k)
    recalls = [len(a & b) / args.top_k for a, b in zip(ours_top, ref_top)]
    recall = float(np.mean(recalls))
    print(f"top-{args.top_k} recall vs reference ranking: {recall:.4f} "
          f"(target >= 0.99)")
    return 0 if recall >= 0.99 else 1


if __name__ == "__main__":
    sys.exit(main())
