"""Semantic layer tests: tokenizer, MiniLM encoder, chunking, index + search."""
import numpy as np
import pytest

from eioku_tpu.api.app import build_context
from eioku_tpu.config.settings import AppConfig
from eioku_tpu.db.connection import Database
from eioku_tpu.domain.artifacts import ArtifactEnvelope, new_id
from eioku_tpu.index.semantic import chunk_segments
from eioku_tpu.models.embed.minilm import (
    MiniLMConfig,
    convert_hf_state_dict,
    init_minilm_params,
    minilm_embed,
)
from eioku_tpu.models.embed.tokenizer import WordPieceTokenizer, basic_tokenize


class TestTokenizer:
    def test_basic_tokenize(self):
        assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
        assert basic_tokenize("Café déjà-vu") == ["cafe", "deja", "-", "vu"]

    def test_wordpiece_with_vocab(self):
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
                 "un": 4, "##happy": 5, "dog": 6}
        tok = WordPieceTokenizer(vocab=vocab, max_len=8)
        ids, mask = tok.encode("unhappy dog zebra")
        assert ids[:5] == [2, 4, 5, 6, 1]  # CLS un ##happy dog UNK
        assert ids[5] == 3 and sum(mask) == 6

    def test_hash_fallback_deterministic(self):
        tok = WordPieceTokenizer(max_len=16)
        a, _ = tok.encode("red fox jumps")
        b, _ = tok.encode("red fox jumps")
        assert a == b
        c, _ = tok.encode("blue fox jumps")
        assert a != c

    def test_fixed_length(self):
        tok = WordPieceTokenizer(max_len=12)
        ids, mask = tok.encode(" ".join(["word"] * 100))
        assert len(ids) == 12 and len(mask) == 12


class TestMiniLM:
    def test_embed_shape_and_norm(self):
        import jax.numpy as jnp
        cfg = MiniLMConfig(n_layers=2)
        params = init_minilm_params(cfg, seed=0)
        tok = WordPieceTokenizer(max_len=32)
        ids, mask = tok.encode_batch(["hello world", "a longer sentence here"])
        emb = minilm_embed(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
        assert emb.shape == (2, 384)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1),
                                   1.0, atol=1e-5)

    def test_identical_text_identical_embedding(self):
        import jax.numpy as jnp
        cfg = MiniLMConfig(n_layers=2)
        params = init_minilm_params(cfg, seed=0)
        tok = WordPieceTokenizer(max_len=32)
        ids, mask = tok.encode_batch(["same text", "same text", "other text"])
        emb = np.asarray(minilm_embed(params, jnp.asarray(ids),
                                      jnp.asarray(mask), cfg))
        np.testing.assert_allclose(emb[0], emb[1], atol=1e-6)
        assert not np.allclose(emb[0], emb[2], atol=1e-3)

    def test_padding_does_not_change_embedding(self):
        import jax.numpy as jnp
        cfg = MiniLMConfig(n_layers=2)
        params = init_minilm_params(cfg, seed=0)
        t32 = WordPieceTokenizer(max_len=32)
        t64 = WordPieceTokenizer(max_len=64)
        i1, m1 = t32.encode_batch(["masked attention works"])
        i2, m2 = t64.encode_batch(["masked attention works"])
        e1 = np.asarray(minilm_embed(params, jnp.asarray(i1), jnp.asarray(m1), cfg))
        e2 = np.asarray(minilm_embed(params, jnp.asarray(i2), jnp.asarray(m2), cfg))
        np.testing.assert_allclose(e1, e2, atol=1e-4)

    def test_hf_converter_against_torch_reference(self):
        """Build the same tiny BERT in torch, convert, compare outputs."""
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        cfg = MiniLMConfig(vocab_size=200, max_position=32, dim=16, n_layers=1,
                           n_heads=2, ffn_dim=32)
        # build a torch-style state dict with random values
        g = torch.Generator().manual_seed(0)

        def t(*shape):
            return torch.randn(*shape, generator=g) * 0.1

        sd = {
            "embeddings.word_embeddings.weight": t(200, 16),
            "embeddings.position_embeddings.weight": t(32, 16),
            "embeddings.token_type_embeddings.weight": t(2, 16),
            "embeddings.LayerNorm.weight": torch.ones(16),
            "embeddings.LayerNorm.bias": torch.zeros(16),
        }
        base = "encoder.layer.0"
        for name, shape in [("attention.self.query", (16, 16)),
                            ("attention.self.key", (16, 16)),
                            ("attention.self.value", (16, 16)),
                            ("attention.output.dense", (16, 16)),
                            ("intermediate.dense", (32, 16)),
                            ("output.dense", (16, 32))]:
            sd[f"{base}.{name}.weight"] = t(*shape)
            sd[f"{base}.{name}.bias"] = t(shape[0])
        for ln in ["attention.output.LayerNorm", "output.LayerNorm"]:
            sd[f"{base}.{ln}.weight"] = torch.ones(16)
            sd[f"{base}.{ln}.bias"] = torch.zeros(16)

        params = convert_hf_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)

        # torch reference forward (mirror of our architecture)
        def torch_forward(ids, mask):
            import torch.nn.functional as F
            x = sd["embeddings.word_embeddings.weight"][ids] \
                + sd["embeddings.position_embeddings.weight"][:ids.shape[1]] \
                + sd["embeddings.token_type_embeddings.weight"][0]
            x = F.layer_norm(x, (16,), sd["embeddings.LayerNorm.weight"],
                             sd["embeddings.LayerNorm.bias"], eps=1e-12)
            q = x @ sd[f"{base}.attention.self.query.weight"].T + \
                sd[f"{base}.attention.self.query.bias"]
            k = x @ sd[f"{base}.attention.self.key.weight"].T + \
                sd[f"{base}.attention.self.key.bias"]
            v = x @ sd[f"{base}.attention.self.value.weight"].T + \
                sd[f"{base}.attention.self.value.bias"]
            b, s, d = q.shape
            q = q.view(b, s, 2, 8).transpose(1, 2)
            k = k.view(b, s, 2, 8).transpose(1, 2)
            v = v.view(b, s, 2, 8).transpose(1, 2)
            scores = (q @ k.transpose(-1, -2)) / (8 ** 0.5)
            scores = scores.masked_fill(~mask[:, None, None, :].bool(),
                                        float("-inf"))
            attn = torch.softmax(scores, dim=-1)
            o = (attn @ v).transpose(1, 2).reshape(b, s, d)
            o = o @ sd[f"{base}.attention.output.dense.weight"].T + \
                sd[f"{base}.attention.output.dense.bias"]
            x = F.layer_norm(x + o, (16,),
                             sd[f"{base}.attention.output.LayerNorm.weight"],
                             sd[f"{base}.attention.output.LayerNorm.bias"],
                             eps=1e-12)
            h = F.gelu(x @ sd[f"{base}.intermediate.dense.weight"].T
                       + sd[f"{base}.intermediate.dense.bias"])
            h = h @ sd[f"{base}.output.dense.weight"].T + \
                sd[f"{base}.output.dense.bias"]
            x = F.layer_norm(x + h, (16,), sd[f"{base}.output.LayerNorm.weight"],
                             sd[f"{base}.output.LayerNorm.bias"], eps=1e-12)
            pooled = (x * mask[..., None]).sum(1) / mask.sum(1, keepdim=True)
            return (pooled / pooled.norm(dim=-1, keepdim=True)).numpy()

        ids = np.array([[2, 5, 9, 3, 0, 0]], np.int32)
        mask = np.array([[1, 1, 1, 1, 0, 0]], np.int32)
        ours = np.asarray(minilm_embed(params, jnp.asarray(ids),
                                       jnp.asarray(mask), cfg))
        theirs = torch_forward(torch.tensor(ids, dtype=torch.long),
                               torch.tensor(mask, dtype=torch.float32))
        np.testing.assert_allclose(ours, theirs, atol=1e-3)


class TestChunking:
    def _segs(self):
        return [{"text": f"segment {i} text here", "start_ms": i * 1000,
                 "end_ms": (i + 1) * 1000} for i in range(10)]

    def test_chunks_cover_and_span(self):
        chunks = chunk_segments(self._segs(), chunk_chars=60, overlap_chars=20)
        assert len(chunks) >= 2
        assert chunks[0]["start_ms"] == 0
        assert chunks[-1]["end_ms"] == 10000
        all_text = " ".join(c["text"] for c in chunks)
        for i in range(10):
            assert f"segment {i}" in all_text

    def test_empty(self):
        assert chunk_segments([]) == []
        assert chunk_segments([{"text": "  ", "start_ms": 0, "end_ms": 1}]) == []

    def test_single_short_segment(self):
        chunks = chunk_segments([{"text": "short", "start_ms": 5, "end_ms": 9}])
        assert len(chunks) == 1 and chunks[0]["text"] == "short"


@pytest.fixture()
def sctx(tmp_path):
    config = AppConfig(scan_paths=[], auto_discover=False,
                       index_dir=str(tmp_path / "idx"))
    db = Database(f"sqlite:///{tmp_path}/sem.db")
    ctx = build_context(config, db=db)
    yield ctx
    db.close()


def seed_transcript(ctx, video_id, texts, run="r1"):
    envs = []
    for i, t in enumerate(texts):
        s = i * 3000
        envs.append(ArtifactEnvelope(
            artifact_id=new_id(), asset_id=video_id,
            artifact_type="transcript.segment", schema_version=1,
            span_start_ms=s, span_end_ms=s + 3000,
            payload_json={"text": t, "language": "en", "start_ms": s,
                          "end_ms": s + 3000},
            producer="p", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id=run))
    ctx.artifacts.batch_create(envs)


class TestSemanticIndex:
    def test_index_and_search_exact_match_ranks_first(self, sctx):
        from eioku_tpu.domain.models import Video
        v = Video(path="/v.mp4")
        sctx.videos.save(v)
        seed_transcript(sctx, v.id, [
            "the quick brown fox jumps over the lazy dog",
            "completely different topic about cooking pasta",
            "another unrelated segment about quantum physics",
        ])
        index = sctx.extra["semantic_index"]
        n = index.index_video(v.id, {"chunk_chars": 30, "overlap_chars": 0})
        assert n >= 3
        # query with the exact text of a chunk -> cosine 1.0 -> rank 1
        chunk_text = sctx.db.query_one(
            "SELECT text FROM embedding_chunks WHERE asset_id=?", (v.id,))["text"]
        results = index.search(chunk_text, top_k=3)
        assert results and results[0]["text"] == chunk_text
        assert results[0]["score"] == pytest.approx(1.0, abs=1e-3)
        assert results[0]["video_id"] == v.id

    def test_embedding_artifacts_created(self, sctx):
        from eioku_tpu.domain.models import Video
        v = Video(path="/v2.mp4")
        sctx.videos.save(v)
        seed_transcript(sctx, v.id, ["hello world " * 10])
        index = sctx.extra["semantic_index"]
        index.index_video(v.id, {})
        envs = sctx.artifacts.get_by_asset(v.id, artifact_type="embedding.chunk")
        assert envs and envs[0].payload_json["model"] == "minilm-l6"

    def test_reindex_replaces_slots(self, sctx):
        from eioku_tpu.domain.models import Video
        v = Video(path="/v3.mp4")
        sctx.videos.save(v)
        seed_transcript(sctx, v.id, ["first version of the transcript"])
        index = sctx.extra["semantic_index"]
        index.index_video(v.id, {})
        n1 = sctx.db.scalar(
            "SELECT COUNT(*) FROM embedding_chunks WHERE asset_id=?", (v.id,))
        index.index_video(v.id, {})
        n2 = sctx.db.scalar(
            "SELECT COUNT(*) FROM embedding_chunks WHERE asset_id=?", (v.id,))
        assert n1 == n2  # old slots replaced, not accumulated

    def test_search_filter_by_asset(self, sctx):
        from eioku_tpu.domain.models import Video
        va, vb = Video(path="/a.mp4"), Video(path="/b.mp4")
        sctx.videos.save(va)
        sctx.videos.save(vb)
        seed_transcript(sctx, va.id, ["alpha content one"])
        seed_transcript(sctx, vb.id, ["beta content two"])
        index = sctx.extra["semantic_index"]
        index.index_video(va.id, {})
        index.index_video(vb.id, {})
        results = index.search("content", top_k=5, asset_id=vb.id)
        assert results and all(r["video_id"] == vb.id for r in results)

    def test_search_endpoint_e2e(self, sctx):
        from eioku_tpu.api.app import create_app
        from eioku_tpu.web.testing import TestClient
        from eioku_tpu.domain.models import Video
        v = Video(path="/v4.mp4")
        sctx.videos.save(v)
        seed_transcript(sctx, v.id, ["searchable transcript content here"])
        sctx.extra["semantic_index"].index_video(v.id, {})
        app = create_app(ctx=sctx, start_reconciler=False, auto_discover=False)
        with TestClient(app) as client:
            r = client.get("/api/v1/search",
                           params={"q": "searchable transcript content here"})
            body = r.json()
            assert body["total"] >= 1
            assert body["results"][0]["jump_to"]["start_ms"] == 0

    def test_keyword_and_hybrid_modes(self, sctx):
        from eioku_tpu.api.app import create_app
        from eioku_tpu.domain.models import Video
        from eioku_tpu.web.testing import TestClient
        v = Video(path="/v5.mp4")
        sctx.videos.save(v)
        seed_transcript(sctx, v.id, ["the mission to saturn launched today",
                                     "cooking pasta with garlic and basil"])
        sctx.extra["semantic_index"].index_video(v.id, {})
        app = create_app(ctx=sctx, start_reconciler=False, auto_discover=False)
        with TestClient(app) as client:
            # keyword: bm25-ranked FTS across the library, no index required
            r = client.get("/api/v1/search", params={"q": "saturn", "mode": "keyword"})
            body = r.json()
            assert body["mode"] == "keyword" and body["total"] == 1
            top = body["results"][0]
            assert top["video_id"] == v.id and top["source"] == "transcript"
            assert "<b>saturn</b>" in top["text"]
            assert top["jump_to"]["start_ms"] == 0
            # hybrid: a moment found by both rankers fuses to the top
            r = client.get("/api/v1/search",
                           params={"q": "mission to saturn", "mode": "hybrid"})
            body = r.json()
            assert body["total"] >= 1
            assert body["results"][0]["video_id"] == v.id
            assert body["results"][0]["jump_to"]["start_ms"] == 0
            # scores are RRF sums: top result found by both lists > single-list
            assert body["results"][0]["score"] > 1.0 / 61
            # unknown mode rejected
            assert client.get("/api/v1/search",
                              params={"q": "x", "mode": "nope"}).status_code == 422

    def test_keyword_mode_without_semantic_index(self, tmp_path):
        from eioku_tpu.api.app import build_context, create_app
        from eioku_tpu.domain.models import Video
        from eioku_tpu.web.testing import TestClient
        config = AppConfig(scan_paths=[], auto_discover=False,
                           semantic_search=False)
        db = Database(f"sqlite:///{tmp_path}/kw.db")
        ctx = build_context(config, db=db)
        try:
            v = Video(path="/v6.mp4")
            ctx.videos.save(v)
            seed_transcript(ctx, v.id, ["keyword only deployment"])
            app = create_app(ctx=ctx, start_reconciler=False, auto_discover=False)
            with TestClient(app) as client:
                r = client.get("/api/v1/search",
                               params={"q": "deployment", "mode": "keyword"})
                assert r.status_code == 200 and r.json()["total"] == 1
                # semantic mode still reports unavailability
                assert client.get("/api/v1/search",
                                  params={"q": "x"}).status_code == 503
        finally:
            db.close()


class TestNativeWordPiece:
    def _vocab(self):
        # dense ids as in a real vocab.txt
        toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##happy", "dog",
                "play", "##ing", "the", "##s"]
        return {t: i for i, t in enumerate(toks)}

    def test_native_matches_python(self):
        from eioku_tpu.models.embed.native_tokenizer import NativeWordPiece
        vocab = self._vocab()
        tok = WordPieceTokenizer(vocab=vocab, max_len=32)
        if tok._native is None:
            pytest.skip("native tokenizer unavailable")
        py = WordPieceTokenizer(vocab=vocab, max_len=32)
        py._native = None
        texts = ["unhappy dogs playing", "the dog plays", "zebra unknown!",
                 "", "un un un", "playing " * 40]
        for t in texts:
            assert tok.encode(t) == py.encode(t), t

    def test_native_throughput_advantage(self):
        import time
        vocab = self._vocab()
        tok = WordPieceTokenizer(vocab=vocab, max_len=128)
        if tok._native is None:
            pytest.skip("native tokenizer unavailable")
        py = WordPieceTokenizer(vocab=vocab, max_len=128)
        py._native = None
        text = "unhappy dogs playing the dog plays " * 10
        n = 300
        t0 = time.perf_counter()
        for _ in range(n):
            tok.encode(text)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            py.encode(text)
        t_py = time.perf_counter() - t0
        # native must not be slower; typically it's several times faster
        assert t_native <= t_py * 1.2, (t_native, t_py)


class TestOcrIndexing:
    def test_ocr_text_indexed_with_source(self, sctx):
        from eioku_tpu.domain.models import Video
        v = Video(path="/ocr.mp4")
        sctx.videos.save(v)
        seed_transcript(sctx, v.id, ["spoken words about sailing boats"])
        ocr_env = ArtifactEnvelope(
            artifact_id=new_id(), asset_id=v.id, artifact_type="ocr.text",
            schema_version=1, span_start_ms=500, span_end_ms=533,
            payload_json={"text": "BREAKING NEWS banner text",
                          "polygon": [[0, 0], [10, 0], [10, 5]],
                          "languages": ["en"], "frame_index": 15},
            producer="p", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="ro")
        sctx.artifacts.create(ocr_env)
        index = sctx.extra["semantic_index"]
        n = index.index_video(v.id, {})
        assert n >= 2  # transcript chunk + ocr chunk
        sources = {r["source"] for r in sctx.db.query(
            "SELECT source FROM embedding_chunks WHERE asset_id=?", (v.id,))}
        assert sources == {"transcript", "ocr"}
        results = index.search("BREAKING NEWS banner text", top_k=2)
        assert results[0]["source"] == "ocr"
        assert results[0]["jump_to"]["start_ms"] == 500


class TestIndexRebuild:
    def test_rebuild_compacts_and_preserves_search(self, sctx):
        from eioku_tpu.domain.models import Video
        import os
        v = Video(path="/rb.mp4")
        sctx.videos.save(v)
        seed_transcript(sctx, v.id, ["rebuild target text one",
                                     "another searchable chunk"])
        index = sctx.extra["semantic_index"]
        index.index_video(v.id, {"chunk_chars": 20, "overlap_chars": 0})
        index.index_video(v.id, {"chunk_chars": 20, "overlap_chars": 0})  # stale slots
        size_before = os.path.getsize(index.vec_path)
        n = index.rebuild()
        assert n >= 1  # default chunking merges the short texts
        assert os.path.getsize(index.vec_path) < size_before  # compacted
        results = index.search("rebuild target text one", top_k=2)
        assert results and results[0]["video_id"] == v.id
