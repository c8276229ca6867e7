"""IVF index tests: k-means convergence, recall vs brute force, exactness at
full probing."""
import numpy as np
import pytest

import jax.numpy as jnp

from eioku_tpu.index.ivf import IvfIndex, kmeans


def clustered_vectors(n=2000, d=64, n_clusters=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    assign = rng.integers(0, n_clusters, n)
    v = centers[assign] + rng.standard_normal((n, d)).astype(np.float32) * 0.3
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def brute_topk(v, q, k):
    q = q / np.linalg.norm(q)
    scores = v @ q
    return set(np.argsort(-scores)[:k].tolist())


class TestKmeans:
    def test_centroids_normalized(self):
        v = jnp.asarray(clustered_vectors())
        c = np.asarray(kmeans(v, k=16, iters=5))
        np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-4)

    def test_assignment_improves(self):
        v = clustered_vectors()
        jv = jnp.asarray(v)
        c1 = np.asarray(kmeans(jv, k=16, iters=1))
        c10 = np.asarray(kmeans(jv, k=16, iters=10))
        sim1 = (v @ c1.T).max(axis=1).mean()
        sim10 = (v @ c10.T).max(axis=1).mean()
        assert sim10 >= sim1 - 1e-5


class TestIvfIndex:
    def test_exact_when_probing_all_clusters(self):
        v = clustered_vectors(n=1000)
        index = IvfIndex.build(v, k=8)
        rng = np.random.default_rng(1)
        q = rng.standard_normal(64).astype(np.float32)
        scores, slots = index.search(q, top_k=10, n_probe=8)
        assert set(slots.tolist()) == brute_topk(v, q, 10)

    def test_recall_with_partial_probe(self):
        v = clustered_vectors(n=4000, n_clusters=32)
        index = IvfIndex.build(v, k=32)
        rng = np.random.default_rng(2)
        recalls = []
        for _ in range(20):
            # query near a real vector -> well-defined neighborhood
            q = v[rng.integers(0, len(v))] + \
                rng.standard_normal(64).astype(np.float32) * 0.05
            _, slots = index.search(q, top_k=10, n_probe=8)
            truth = brute_topk(v, q, 10)
            recalls.append(len(set(slots.tolist()) & truth) / 10)
        assert np.mean(recalls) >= 0.9, np.mean(recalls)

    def test_slot_mapping_roundtrip(self):
        v = clustered_vectors(n=300)
        index = IvfIndex.build(v, k=4)
        q = v[42]
        scores, slots = index.search(q, top_k=1, n_probe=4)
        assert slots[0] == 42
        assert scores[0] == pytest.approx(1.0, abs=1e-4)

    def test_build_with_fewer_vectors_than_default_k(self):
        # regression: a 60 s clip embeds only 2 chunks; k-means must clamp k
        # to the corpus size instead of sampling 4 seeds from 2 vectors
        v = clustered_vectors(n=2)
        index = IvfIndex.build(v)
        assert index.k == 2
        scores, slots = index.search(v[0], top_k=1)
        assert slots[0] == 0
        assert scores[0] == pytest.approx(1.0, abs=1e-4)

    def test_semantic_index_switches_to_ivf(self, tmp_path, monkeypatch):
        from eioku_tpu.api.app import build_context
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.db.connection import Database

        config = AppConfig(scan_paths=[], auto_discover=False,
                           index_dir=str(tmp_path / "idx"))
        db = Database(f"sqlite:///{tmp_path}/ivf.db")
        ctx = build_context(config, db=db)
        index = ctx.extra["semantic_index"]
        monkeypatch.setattr(type(index), "IVF_THRESHOLD", 64)
        # seed 100 chunks directly through the vector/DB plumbing
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((100, index.dim)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        start = index._append_vectors(vecs)
        rows = [(start + i, f"a{i}", "vid", i * 100, i * 100 + 100,
                 f"chunk {i}", "transcript", "minilm-l6", "r1")
                for i in range(100)]
        db.executemany(
            "INSERT INTO embedding_chunks (slot, artifact_id, asset_id, start_ms,"
            " end_ms, text, source, model, run_id) VALUES (?,?,?,?,?,?,?,?,?)",
            rows)
        results = index.search("anything", top_k=5)
        assert len(results) == 5
        assert getattr(index, "_ivf_cache", None) is not None  # IVF path used
        db.close()
