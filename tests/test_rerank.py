"""Cross-encoder reranker (models/embed/cross_encoder.py, index/rerank.py).

Beyond-parity search-quality stage: joint (query, passage) scoring reordering
the retrieval candidates. The reference has no reranking (its semantic-search
spec stops at retrieval, .kiro/specs/semantic-video-search/requirements.md).
"""
from __future__ import annotations

import numpy as np
import pytest


TINY = dict(vocab_size=197, max_position=64, dim=32, n_layers=2, n_heads=2,
            ffn_dim=64)


def _tiny_cfg():
    from eioku_tpu.models.embed.cross_encoder import CrossEncoderConfig
    return CrossEncoderConfig(**TINY)


class TestCrossEncoderModel:
    def test_hf_parity(self):
        """Logit parity with HuggingFace BertForSequenceClassification on a
        random tiny config: same trunk, pooler (dense+tanh on CLS), 1-logit
        classifier."""
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertForSequenceClassification

        from eioku_tpu.models.embed.cross_encoder import (
            convert_hf_cross_encoder,
            cross_encoder_score,
        )

        hf_cfg = BertConfig(
            vocab_size=TINY["vocab_size"], hidden_size=TINY["dim"],
            num_hidden_layers=TINY["n_layers"],
            num_attention_heads=TINY["n_heads"],
            intermediate_size=TINY["ffn_dim"],
            max_position_embeddings=TINY["max_position"],
            num_labels=1, hidden_act="gelu",
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
        torch.manual_seed(0)
        model = BertForSequenceClassification(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        cfg = _tiny_cfg()
        params = convert_hf_cross_encoder(sd, cfg)

        rng = np.random.default_rng(0)
        b, s = 3, 20
        ids = rng.integers(0, TINY["vocab_size"], (b, s)).astype(np.int32)
        types = np.zeros((b, s), np.int32)
        types[:, 10:] = 1
        mask = np.ones((b, s), np.int32)
        mask[1, 15:] = 0  # one padded row
        with torch.no_grad():
            want = model(input_ids=torch.tensor(ids, dtype=torch.long),
                         token_type_ids=torch.tensor(types, dtype=torch.long),
                         attention_mask=torch.tensor(mask, dtype=torch.long)
                         ).logits[:, 0].numpy()
        import jax.numpy as jnp
        got = np.asarray(cross_encoder_score(
            params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask),
            cfg))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_random_init_shapes(self):
        from eioku_tpu.models.embed.cross_encoder import (
            init_cross_encoder_params,
        )
        cfg = _tiny_cfg()
        p = init_cross_encoder_params(cfg)
        assert p["classifier"]["w"].shape == (TINY["dim"], 1)
        assert p["pooler"]["w"].shape == (TINY["dim"], TINY["dim"])


class TestPairEncoding:
    def _tok(self):
        from eioku_tpu.models.embed.tokenizer import WordPieceTokenizer
        vocab = {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
            + [chr(c) for c in range(ord("a"), ord("z") + 1)]
            + ["hello", "world", "video", "cat", "##s"])}
        return WordPieceTokenizer(vocab=vocab, max_len=16)

    def test_layout_and_types(self):
        tok = self._tok()
        ids, types, mask = tok.encode_pair("hello", "world cats")
        v = tok.vocab
        assert ids[:3] == [v["[CLS]"], v["hello"], v["[SEP]"]]
        assert ids[3:7] == [v["world"], v["cat"], v["##s"], v["[SEP]"]]
        # type 0 covers [CLS] query [SEP]; type 1 covers passage [SEP]
        assert types[:3] == [0, 0, 0]
        assert types[3:7] == [1, 1, 1, 1]
        assert mask[:7] == [1] * 7 and mask[7:] == [0] * 9
        assert ids[7:] == [v["[PAD]"]] * 9

    def test_long_passage_truncates_fixed_len(self):
        tok = self._tok()
        ids, types, mask = tok.encode_pair("hello", "world " * 50)
        assert len(ids) == len(types) == len(mask) == 16
        assert sum(mask) == 16  # full window
        assert ids[-1] == tok.sep_id  # final SEP survives truncation

    def test_query_cap_leaves_room_for_passage(self):
        tok = self._tok()
        ids, types, _ = tok.encode_pair("hello " * 40, "world", max_query=5)
        assert types.count(1) >= 2  # passage token + its SEP made it in


class TestReranker:
    def test_unavailable_without_checkpoint(self, tmp_path):
        from eioku_tpu.index.rerank import Reranker
        r = Reranker(model_cache_dir=str(tmp_path))
        assert r.available is False
        results = [{"text": "a", "score": 0.9}, {"text": "b", "score": 0.1}]
        assert r.rerank("q", results, top_k=2) == results  # order stands

    def test_rerank_orders_by_cross_encoder_score(self, tmp_path,
                                                  monkeypatch):
        """Full rerank path (pair encode -> bucketed batch -> score -> sort)
        with a tiny 'pretrained' model: scores are deterministic given params,
        so ordering by them must be reproduced exactly."""
        import jax.numpy as jnp

        from eioku_tpu.index import rerank as rr
        from eioku_tpu.models.embed import cross_encoder as ce

        cfg = _tiny_cfg()
        params = ce.init_cross_encoder_params(cfg, seed=3)
        monkeypatch.setattr(
            ce, "load_cross_encoder",
            lambda cache_dir, cfg_=None, seed=0: (params, cfg, True))
        vocab_txt = tmp_path / "vocab.txt"
        vocab_txt.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
            + [f"w{i}" for i in range(TINY["vocab_size"] - 4)]) + "\n")
        r = rr.Reranker(model_cache_dir=str(tmp_path), max_len=32)
        assert r.available is True
        texts = [f"w{i} w{i + 1} w{i + 2}" for i in range(5)]
        results = [{"text": t, "score": 1.0 - 0.1 * i}
                   for i, t in enumerate(texts)]
        out = r.rerank("w1 w2", results, top_k=3)
        assert len(out) == 3
        assert all("rerank_score" in o for o in out)
        # expected order: score every pair directly with the same model
        from eioku_tpu.models.embed.tokenizer import WordPieceTokenizer
        tok = WordPieceTokenizer.from_cache_dir(str(tmp_path), max_len=32)
        ids, types, mask = tok.encode_pairs("w1 w2", texts)
        want = np.asarray(ce.cross_encoder_score(
            params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask),
            cfg))
        want_order = [texts[i] for i in np.argsort(-want)[:3]]
        assert [o["text"] for o in out] == want_order

    def test_tail_beyond_max_candidates_survives(self, tmp_path, monkeypatch):
        """top_k past MAX_CANDIDATES must not lose results: only the head is
        rescored, the tail keeps retrieval order behind it."""
        from eioku_tpu.index import rerank as rr
        from eioku_tpu.models.embed import cross_encoder as ce

        cfg = _tiny_cfg()
        params = ce.init_cross_encoder_params(cfg, seed=3)
        monkeypatch.setattr(
            ce, "load_cross_encoder",
            lambda cache_dir, cfg_=None, seed=0: (params, cfg, True))
        (tmp_path / "vocab.txt").write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
            + [f"w{i}" for i in range(TINY["vocab_size"] - 4)]) + "\n")
        r = rr.Reranker(model_cache_dir=str(tmp_path), max_len=32)
        n = rr.MAX_CANDIDATES + 3
        results = [{"text": f"w{i % 20}", "i": i} for i in range(n)]
        out = r.rerank("w1", results, top_k=n)
        assert len(out) == n
        # tail entries kept verbatim, in order, after the rescored head
        assert [o["i"] for o in out[-3:]] == [n - 3, n - 2, n - 1]
        assert all("rerank_score" not in o for o in out[-3:])

    def test_corrupt_checkpoint_degrades(self, tmp_path):
        """A checkpoint that fails to load must disable rerank, not raise."""
        from eioku_tpu.index.rerank import Reranker
        d = tmp_path / "msmarco-minilm-l6"
        d.mkdir()
        (d / "pytorch_model.bin").write_bytes(b"not a torch file")
        r = Reranker(model_cache_dir=str(tmp_path))
        assert r.available is False
        results = [{"text": "a"}, {"text": "b"}]
        assert r.rerank("q", results, top_k=2) == results

    def test_search_endpoint_rerank_param(self, tmp_path):
        """?rerank=1 without a checkpoint: 200, retrieval order, reranked
        false — the opt-in degrades, never errors."""
        from eioku_tpu.api.app import build_context, create_app
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.db.connection import Database
        from eioku_tpu.web.testing import TestClient

        cfg = AppConfig(scan_paths=[], auto_discover=False,
                        model_cache_dir=str(tmp_path))
        db = Database(f"sqlite:///{tmp_path}/e.db")
        app = create_app(ctx=build_context(cfg, db=db),
                         start_reconciler=False)
        with TestClient(app) as c:
            r = c.get("/api/v1/search?q=cat&mode=keyword&rerank=1")
        db.close()
        assert r.status_code == 200
        body = r.json()
        assert body["reranked"] is False
