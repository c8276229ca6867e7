"""Mesh/sharding tests on the virtual 8-device CPU mesh."""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eioku_tpu.parallel.mesh import make_mesh, shard_minilm_params


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, model_parallel=2)


class TestMesh:
    def test_shape(self, mesh8):
        assert dict(mesh8.shape) == {"data": 4, "model": 2}

    def test_invalid_model_parallel(self):
        with pytest.raises(ValueError):
            make_mesh(8, model_parallel=3)

    def test_minilm_tp_sharding(self, mesh8):
        from eioku_tpu.models.embed.minilm import MiniLMConfig, init_minilm_params
        cfg = MiniLMConfig(vocab_size=256, dim=64, n_layers=1, n_heads=4,
                           ffn_dim=128, max_position=32)
        params = shard_minilm_params(init_minilm_params(cfg, 0), mesh8)
        # column-parallel q: output dim split over "model"
        q_sharding = params["layers"][0]["q"]["w"].sharding
        assert q_sharding.spec == jax.sharding.PartitionSpec(None, "model")
        # row-parallel o: input dim split
        o_sharding = params["layers"][0]["o"]["w"].sharding
        assert o_sharding.spec == jax.sharding.PartitionSpec("model", None)
        # layernorm replicated
        ln = params["layers"][0]["attn_ln"]["gamma"].sharding
        assert ln.spec == jax.sharding.PartitionSpec()


class TestDataParallelInference:
    def test_dp_embedder_matches_single_device(self, mesh8):
        from eioku_tpu.models.embed.minilm import (
            MiniLMConfig,
            init_minilm_params,
            minilm_embed,
        )
        from eioku_tpu.parallel.inference import DataParallelEmbedder

        cfg = MiniLMConfig(vocab_size=128, dim=32, n_layers=1, n_heads=2,
                           ffn_dim=64, max_position=16)
        params = init_minilm_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, (6, 16), dtype=np.int32)  # 6 not mult of 4
        mask = np.ones((6, 16), np.int32)
        single = np.asarray(minilm_embed(params, jnp.asarray(ids),
                                         jnp.asarray(mask), cfg))
        dp = DataParallelEmbedder(params, cfg, mesh8)
        sharded = np.asarray(dp(ids, mask))
        assert sharded.shape == (6, 32)
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    @pytest.mark.slow  # ~30 s 8-device compile; dryrun_multichip covers it too
    def test_dp_detector_runs(self, mesh8):
        from eioku_tpu.models.yolo.model import YoloConfig, init_yolo_params
        from eioku_tpu.parallel.inference import DataParallelDetector

        cfg = YoloConfig("yolov8n", num_classes=4)
        params = init_yolo_params(cfg, seed=0)
        det = DataParallelDetector(params, cfg, mesh8)
        frames = np.zeros((5, 64, 64, 3), np.uint8)  # pads to 8
        out = det(frames, conf_threshold=0.0)
        assert out["boxes"].shape[0] == 5
        assert out["valid"].shape[0] == 5

    def test_train_step_on_mesh(self, mesh8):
        """The dryrun path: sharded contrastive training step converges a hair."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from eioku_tpu.models.embed.minilm import MiniLMConfig, init_minilm_params
        from eioku_tpu.parallel.train import make_train_step

        cfg = MiniLMConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                           ffn_dim=64, max_position=16)
        params = shard_minilm_params(init_minilm_params(cfg, 0), mesh8)
        step, opt = make_train_step(cfg, optax.sgd(0.001))
        opt_state = opt.init(params)
        rng = np.random.default_rng(0)
        sh = NamedSharding(mesh8, P("data"))
        ids = jax.device_put(jnp.asarray(
            rng.integers(0, 64, (8, 8), dtype=np.int32)), sh)
        mask = jax.device_put(jnp.ones((8, 8), jnp.int32), sh)
        with mesh8:
            params, opt_state, loss1 = step(params, opt_state, ids, mask, ids, mask)
            params, opt_state, loss2 = step(params, opt_state, ids, mask, ids, mask)
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        assert float(loss2) < float(loss1)  # anchors==positives: easy to improve


class TestFaceTracking:
    def test_stable_track(self):
        from eioku_tpu.ml.face_tracking import FaceTracker
        t = FaceTracker()
        box = {"x": 10, "y": 10, "width": 40, "height": 40}
        ids1 = t.assign([box])
        moved = {"x": 14, "y": 12, "width": 40, "height": 40}
        ids2 = t.assign([moved])
        assert ids1 == ids2 == ["face_0"]

    def test_two_faces_two_tracks(self):
        from eioku_tpu.ml.face_tracking import FaceTracker
        t = FaceTracker()
        a = {"x": 0, "y": 0, "width": 30, "height": 30}
        b = {"x": 200, "y": 0, "width": 30, "height": 30}
        assert t.assign([a, b]) == ["face_0", "face_1"]
        assert t.assign([b, a]) == ["face_1", "face_0"]  # order-independent

    def test_track_expires_after_gap(self):
        from eioku_tpu.ml.face_tracking import FaceTracker
        t = FaceTracker(max_gap_frames=1)
        box = {"x": 0, "y": 0, "width": 30, "height": 30}
        assert t.assign([box]) == ["face_0"]
        t.assign([])
        t.assign([])
        assert t.assign([box]) == ["face_1"]  # old track expired

    def test_track_expires_across_facefree_stretch(self):
        """Frames with no faces never call assign(); expiry must be measured
        in source-frame distance so distinct identities separated by minutes
        never merge into one track."""
        from eioku_tpu.ml.face_tracking import FaceTracker
        t = FaceTracker(max_gap_frames=3, frame_step=30)
        box = {"x": 0, "y": 0, "width": 30, "height": 30}
        assert t.assign([box], frame_index=100) == ["face_0"]
        # same screen position 4900 source frames later: new identity
        assert t.assign([box], frame_index=5000) == ["face_1"]
        # within the gap horizon (3 sampled steps x 30): same track
        assert t.assign([box], frame_index=5060) == ["face_1"]

    def test_cluster_assignment_measures_source_gap(self):
        from eioku_tpu.ml.detection import _assign_face_clusters
        box = {"x": 5, "y": 5, "width": 50, "height": 50}

        def det(frame):
            return {"payload": {"cluster_id": None, "confidence": 0.9,
                                "bounding_box": dict(box),
                                "frame_number": frame},
                    "span_start_ms": 0, "span_end_ms": 33}

        results = [det(0), det(30), det(5000)]  # 30-frame sampling, long gap
        _assign_face_clusters(results)
        ids = [r["payload"]["cluster_id"] for r in results]
        assert ids[0] == ids[1]
        assert ids[2] != ids[0]

    def test_cluster_assignment_in_results(self):
        from eioku_tpu.ml.detection import _assign_face_clusters
        box = {"x": 5, "y": 5, "width": 50, "height": 50}
        results = [
            {"payload": {"cluster_id": None, "confidence": 0.9,
                         "bounding_box": dict(box), "frame_number": 0},
             "span_start_ms": 0, "span_end_ms": 33},
            {"payload": {"cluster_id": None, "confidence": 0.9,
                         "bounding_box": dict(box), "frame_number": 30},
             "span_start_ms": 1000, "span_end_ms": 1033},
        ]
        _assign_face_clusters(results)
        assert results[0]["payload"]["cluster_id"] == \
            results[1]["payload"]["cluster_id"] == "face_0"


class TestTopics:
    def test_topics_written(self, tmp_path):
        from eioku_tpu.api.app import build_context
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.db.connection import Database
        from eioku_tpu.domain.models import Video
        import sys
        sys.path.insert(0, "tests")
        from test_semantic import seed_transcript

        config = AppConfig(scan_paths=[], auto_discover=False,
                           index_dir=str(tmp_path / "idx"))
        db = Database(f"sqlite:///{tmp_path}/topics.db")
        ctx = build_context(config, db=db)
        v = Video(path="/t.mp4")
        ctx.videos.save(v)
        seed_transcript(ctx, v.id, [
            "quantum computing and quantum error correction",
            "the quantum hardware requires cryogenic cooling systems",
        ])
        ctx.extra["semantic_index"].index_video(v.id, {"chunk_chars": 40})
        rows = db.query("SELECT label, score FROM topics WHERE asset_id=?"
                        " ORDER BY score DESC", (v.id,))
        labels = [r["label"] for r in rows]
        assert "quantum" in labels
        assert "the" not in labels  # stopwords filtered
        assert rows[0]["score"] == 1.0  # normalized
        db.close()


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from eioku_tpu.models.checkpoint import load_params, save_params
        from eioku_tpu.models.embed.minilm import MiniLMConfig, init_minilm_params

        cfg = MiniLMConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                           ffn_dim=64, max_position=16)
        params = init_minilm_params(cfg, seed=7)
        path = str(tmp_path / "ck" / "m.npz")
        save_params(params, path)
        loaded = load_params(init_minilm_params(cfg, seed=0), path)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path):
        from eioku_tpu.models.checkpoint import load_params, save_params
        from eioku_tpu.models.embed.minilm import MiniLMConfig, init_minilm_params

        small = MiniLMConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                             ffn_dim=64, max_position=16)
        big = MiniLMConfig(vocab_size=64, dim=64, n_layers=1, n_heads=2,
                           ffn_dim=128, max_position=16)
        path = str(tmp_path / "m.npz")
        save_params(init_minilm_params(small, 0), path)
        with pytest.raises(ValueError):
            load_params(init_minilm_params(big, 0), path)


class TestFinetune:
    def test_crop_pair(self):
        import random
        from eioku_tpu.parallel.finetune import crop_pair
        rng = random.Random(0)
        text = " ".join(f"w{i}" for i in range(20))
        a, b = crop_pair(text, rng)
        assert set(a.split()) <= set(text.split())
        assert len(a.split()) >= 2
        short = "one two"
        assert crop_pair(short, rng) == (short, short)

    @pytest.mark.slow
    def test_finetune_end_to_end(self, tmp_path, monkeypatch):
        """Fine-tune on indexed chunks, save, and verify load_minilm picks the
        native checkpoint up."""
        from eioku_tpu.api.app import build_context
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.db.connection import Database
        from eioku_tpu.domain.models import Video
        from eioku_tpu.models.embed.minilm import load_minilm
        from eioku_tpu.parallel.finetune import finetune_embedder
        import sys
        sys.path.insert(0, "tests")
        from test_semantic import seed_transcript

        cache = tmp_path / "cache"
        config = AppConfig(scan_paths=[], auto_discover=False,
                           index_dir=str(tmp_path / "idx"),
                           model_cache_dir=str(cache))
        db = Database(f"sqlite:///{tmp_path}/ft.db")
        ctx = build_context(config, db=db)
        v = Video(path="/v.mp4")
        ctx.videos.save(v)
        texts = [f"sentence number {i} about topic {i % 3} with more words here"
                 for i in range(12)]
        seed_transcript(ctx, v.id, texts)
        ctx.extra["semantic_index"].index_video(v.id, {"chunk_chars": 30,
                                                       "overlap_chars": 0})
        # patch a tiny model in so the test doesn't compile full MiniLM on CPU
        from eioku_tpu.models.embed.minilm import MiniLMConfig, init_minilm_params
        import eioku_tpu.parallel.finetune as ft
        tiny = MiniLMConfig(vocab_size=512, dim=32, n_layers=1, n_heads=2,
                            ffn_dim=64, max_position=128)
        monkeypatch.setattr(ft, "load_minilm",
                            lambda cache: (init_minilm_params(tiny, 0), tiny,
                                           False))
        stats = finetune_embedder(ctx, steps=3, batch_size=4, lr=1e-4)
        assert stats["steps"] == 3
        assert os.path.isfile(stats["checkpoint"])
        _, _, pretrained = load_minilm(str(cache), cfg=tiny)
        assert pretrained  # native checkpoint found
        db.close()


class TestRingAttention:
    def test_matches_reference_on_mesh(self, mesh8):
        """Context-parallel ring attention == single-device full attention."""
        from eioku_tpu.ops.flash_attention import _reference_attention
        from eioku_tpu.ops.ring_attention import ring_attention
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        b, h, s, d = 1, 2, 64, 16  # s divisible by the 4-wide data axis
        q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32) * 0.3)
        out = np.asarray(ring_attention(q, k, v, mesh8, axis_name="data"))
        ref = np.asarray(_reference_attention(
            q, k, v, jnp.full((b,), s, jnp.int32), False, d ** -0.5))
        np.testing.assert_allclose(out, ref, atol=2e-5)


class TestDistributedBootstrap:
    def test_noop_without_coordinator(self, monkeypatch):
        from eioku_tpu.parallel import mesh
        monkeypatch.delenv("EIOKU_COORDINATOR", raising=False)
        assert mesh.initialize_distributed() is False

    def test_rejects_bad_process_id(self):
        from eioku_tpu.parallel import mesh
        with pytest.raises(ValueError):
            mesh.initialize_distributed(coordinator="127.0.0.1:9999",
                                        num_processes=2, process_id=5)


class TestPipelineParallel:
    """GPipe-style microbatch pipelining (parallel/pipeline.py): parity with
    sequential layer application on the virtual mesh."""

    def _layer_fn(self, p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    def _layers(self, n, d, seed=0):
        rng = np.random.default_rng(seed)
        return [{"w": jnp.asarray(rng.standard_normal((d, d)) * 0.3,
                                  jnp.float32),
                 "b": jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)}
                for _ in range(n)]

    def test_pipeline_matches_sequential(self, mesh8):
        from eioku_tpu.parallel.pipeline import pipeline_transformer_layers
        d = 16
        layers = self._layers(4, d)
        rng = np.random.default_rng(1)
        # batch 16: sharded 4-way over data -> 4 per replica -> 2 microbatches
        x = jnp.asarray(rng.standard_normal((16, d)), jnp.float32)

        expected = x
        for p in layers:
            expected = self._layer_fn(p, expected)

        out = pipeline_transformer_layers(layers, x, self._layer_fn, mesh8,
                                          n_micro=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   atol=1e-5)

    def test_pipeline_more_microbatches(self, mesh8):
        from eioku_tpu.parallel.pipeline import pipeline_transformer_layers
        d = 8
        layers = self._layers(2, d, seed=2)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((32, d)), jnp.float32)
        expected = x
        for p in layers:
            expected = self._layer_fn(p, expected)
        out = pipeline_transformer_layers(layers, x, self._layer_fn, mesh8,
                                          n_micro=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   atol=1e-5)

    def test_rejects_indivisible_layers(self, mesh8):
        from eioku_tpu.parallel.pipeline import pipeline_transformer_layers
        layers = self._layers(3, 8)
        x = jnp.zeros((8, 8), jnp.float32)
        with pytest.raises(ValueError):
            pipeline_transformer_layers(layers, x, self._layer_fn, mesh8)

    def test_stage_params_actually_sharded(self, mesh8):
        """Each device must hold only its stage's block (the HBM win)."""
        from eioku_tpu.parallel.pipeline import (
            shard_pipeline_params,
            stack_stage_params,
        )
        layers = self._layers(2, 8)
        stacked = stack_stage_params(layers)
        placed = shard_pipeline_params(stacked, mesh8)
        shard = placed["w"].addressable_shards[0]
        assert shard.data.shape == (1, 8, 8)  # one stage block per device


class TestExpertParallelMoe:
    """Switch-style MoE (ops/moe.py): einsum dispatch parity with the
    per-token reference, and EP sharding over the model axis."""

    def test_moe_matches_reference_with_ample_capacity(self):
        from eioku_tpu.ops.moe import (
            init_moe_params,
            moe_ffn,
            moe_ffn_reference,
        )
        rng = np.random.default_rng(0)
        params = init_moe_params(d=16, ffn=32, n_experts=4, seed=0)
        x = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
        # capacity_factor high enough that nothing drops -> exact parity
        out = moe_ffn(params, x, capacity_factor=8.0)
        ref = moe_ffn_reference(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_moe_drops_overflow_tokens_to_zero(self):
        from eioku_tpu.ops.moe import MoeParams, init_moe_params, moe_ffn
        params = init_moe_params(d=8, ffn=16, n_experts=2, seed=1)
        # force every token to expert 0 via a biased router
        router = jnp.zeros((8, 2)).at[:, 0].set(10.0)
        params = MoeParams(router, *params[1:])
        x = jnp.ones((8, 8), jnp.float32)
        out = moe_ffn(params, x, capacity_factor=0.5)  # capacity 2 of 8
        nonzero = np.abs(np.asarray(out)).sum(axis=1) > 1e-6
        assert nonzero.sum() == 2  # first two tokens kept, rest dropped

    def test_moe_runs_sharded_with_parity(self, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from eioku_tpu.ops.moe import (
            init_moe_params,
            moe_ffn,
            shard_moe_params,
        )
        rng = np.random.default_rng(2)
        params = init_moe_params(d=16, ffn=32, n_experts=4, seed=2)
        x = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
        expected = moe_ffn(params, x, capacity_factor=8.0)

        sharded = shard_moe_params(params, mesh8)
        # each device holds E/S whole experts
        assert sharded.w1.addressable_shards[0].data.shape == (2, 16, 32)
        xd = jax.device_put(x, NamedSharding(mesh8, P("data")))
        fn = jax.jit(lambda p, v: moe_ffn(p, v, capacity_factor=8.0))
        out = fn(sharded, xd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)


class TestPipelineParallelWhisper:
    def test_whisper_encode_pp_matches_single_device(self, mesh8):
        """The PP encoder (layer trunk spanning the model axis) must be
        numerically identical to the monolithic whisper_encode."""
        from eioku_tpu.models.whisper.mel import log_mel_spectrogram
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
            whisper_encode,
            whisper_encode_pp,
        )
        cfg = WhisperConfig("tiny")  # 4 encoder layers -> 2 per stage
        params = init_whisper_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        # batch 8: 2 per data replica -> 2 microbatches of 1
        wav = jnp.asarray(rng.standard_normal((8, 4 * 16000)) * 0.1,
                          jnp.float32)
        mel = log_mel_spectrogram(wav, n_mels=cfg.n_mels)[:, :, :200]

        ref = whisper_encode(params, mel, cfg)
        out = whisper_encode_pp(params, mel, cfg, mesh8, n_micro=2)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-4, atol=1e-5)


class TestFsdp:
    def test_spec_picks_largest_divisible_dim(self):
        from jax.sharding import PartitionSpec as P

        from eioku_tpu.parallel.fsdp import fsdp_spec

        assert fsdp_spec((128, 64), 8) == P("data", None)
        assert fsdp_spec((32, 256), 8) == P(None, "data")
        assert fsdp_spec((7,), 8) == P()       # indivisible -> replicated
        assert fsdp_spec((), 8) == P()         # scalar

    def test_fsdp_train_matches_unsharded(self, mesh8):
        """Two FSDP steps over an all-data 8-way mesh must match the plain
        single-sharding train step numerically, while parameters and Adam
        moments actually live sharded (1/8 per chip for the big leaves)."""
        import optax

        from eioku_tpu.models.embed.minilm import (
            MiniLMConfig,
            init_minilm_params,
        )
        from eioku_tpu.parallel.fsdp import (
            make_fsdp_train_step,
            max_leaf_shard_fraction,
            shard_tree_fsdp,
        )
        from eioku_tpu.parallel.mesh import make_mesh
        from eioku_tpu.parallel.train import make_train_step

        mesh = make_mesh(8, model_parallel=1)  # all chips on the data axis
        cfg = MiniLMConfig(vocab_size=512, dim=64, n_layers=2, n_heads=4,
                           ffn_dim=128, max_position=64)
        params = init_minilm_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 512, (16, 32)).astype(np.int32)
        mask = np.ones((16, 32), np.int32)
        pos = rng.integers(0, 512, (16, 32)).astype(np.int32)

        opt = optax.adamw(1e-3)
        ref_step, _ = make_train_step(cfg, opt)
        ref_params = jax.tree.map(jnp.copy, params)
        ref_opt = opt.init(ref_params)

        fsdp_step, _, prepare = make_fsdp_train_step(cfg, mesh, optax.adamw(1e-3))
        sh_params, sh_opt = prepare(jax.tree.map(jnp.copy, params))
        assert max_leaf_shard_fraction(sh_params) <= 1 / 8 + 1e-6
        assert max_leaf_shard_fraction(sh_opt) <= 1 / 8 + 1e-6

        for step in range(2):
            ref_params, ref_opt, ref_loss = ref_step(
                ref_params, ref_opt, ids, mask, pos, mask)
            sh_params, sh_opt, loss = fsdp_step(
                sh_params, sh_opt, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(pos), jnp.asarray(mask))
            np.testing.assert_allclose(float(loss), float(ref_loss),
                                       rtol=2e-4, atol=2e-5)
        # params stay sharded across steps (out_shardings pin the layout)
        assert max_leaf_shard_fraction(sh_params) <= 1 / 8 + 1e-6
        for a, b in zip(jax.tree.leaves(sh_params), jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-3, atol=2e-4)

    def test_shard_tree_fsdp_layout(self, mesh8):
        from eioku_tpu.parallel.fsdp import shard_tree_fsdp
        from eioku_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=1)
        tree = {"w": jnp.ones((64, 16)), "b": jnp.ones((7,))}
        out = shard_tree_fsdp(tree, mesh)
        assert out["w"].addressable_shards[0].data.shape == (8, 16)
        assert out["b"].addressable_shards[0].data.shape == (7,)  # replicated


class TestShardedCheckpoint:
    def test_fsdp_state_roundtrip_and_reshard(self, mesh8, tmp_path):
        """An FSDP-sharded train state saved with orbax must restore (a) into
        the same layout and (b) into a DIFFERENT sharding (replicated) with
        identical values — cross-mesh resume."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from eioku_tpu.models.checkpoint import restore_sharded, save_sharded
        from eioku_tpu.models.embed.minilm import (
            MiniLMConfig,
            init_minilm_params,
        )
        from eioku_tpu.parallel.fsdp import (
            max_leaf_shard_fraction,
            shard_tree_fsdp,
        )
        from eioku_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=1)
        cfg = MiniLMConfig(vocab_size=256, dim=64, n_layers=1, n_heads=4,
                           ffn_dim=128, max_position=32)
        params = init_minilm_params(cfg, seed=3)
        sharded = shard_tree_fsdp(params, mesh)
        path = str(tmp_path / "ckpt")
        save_sharded(sharded, path)

        # (a) same-layout restore
        back = restore_sharded(sharded, path)
        assert max_leaf_shard_fraction(back) <= 1 / 8 + 1e-6
        for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # (b) resharded restore: replicated target
        repl = jax.tree.map(
            lambda x: jax.device_put(jnp.zeros_like(x),
                                     NamedSharding(mesh, P())), params)
        back2 = restore_sharded(repl, path)
        for a, b in zip(jax.tree.leaves(back2), jax.tree.leaves(params)):
            assert len({s.data.shape for s in a.addressable_shards}) == 1
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_matches_continuous_run(self, mesh8, tmp_path):
        """save -> restore -> one more step == two uninterrupted steps."""
        import optax

        from eioku_tpu.models.checkpoint import restore_sharded, save_sharded
        from eioku_tpu.models.embed.minilm import (
            MiniLMConfig,
            init_minilm_params,
        )
        from eioku_tpu.parallel.fsdp import make_fsdp_train_step
        from eioku_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=1)
        cfg = MiniLMConfig(vocab_size=256, dim=64, n_layers=1, n_heads=4,
                           ffn_dim=128, max_position=32)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, 256, (16, 16)), jnp.int32)
        pos = jnp.asarray(rng.integers(0, 256, (16, 16)), jnp.int32)
        mask = jnp.ones((16, 16), jnp.int32)

        step, _, prepare = make_fsdp_train_step(cfg, mesh, optax.adamw(1e-3))
        p, o = prepare(init_minilm_params(cfg, seed=5))
        p, o, _ = step(p, o, ids, mask, pos, mask)
        save_sharded({"params": p, "opt": o}, str(tmp_path / "mid"))
        # take the abstract template BEFORE the donating step deletes p/o —
        # on TPU, touching donated arrays afterwards raises
        template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding),
            {"params": p, "opt": o})
        p2, o2, loss_cont = step(p, o, ids, mask, pos, mask)

        state = restore_sharded(template, str(tmp_path / "mid"))
        p3, o3, loss_res = step(state["params"], state["opt"],
                                ids, mask, pos, mask)
        np.testing.assert_allclose(float(loss_res), float(loss_cont),
                                   rtol=1e-6, atol=1e-7)


class TestTensorParallelWhisper:
    def test_whisper_encode_tp_matches_single_device(self, mesh8):
        """TP encoder (Megatron column/row splits, flash attention on local
        heads inside shard_map) must match the monolithic whisper_encode."""
        from eioku_tpu.models.whisper.mel import log_mel_spectrogram
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
            whisper_encode,
            whisper_encode_tp,
        )
        from eioku_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=2)  # tiny: 6 heads -> 3 per shard
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((4, 4 * 16000)) * 0.1,
                          jnp.float32)
        mel = log_mel_spectrogram(wav, n_mels=cfg.n_mels)[:, :, :200]

        ref = whisper_encode(params, mel, cfg)
        out = whisper_encode_tp(params, mel, cfg, mesh)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-4, atol=1e-5)

    def test_head_divisibility_enforced(self, mesh8):
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
            whisper_encode_tp,
        )
        from eioku_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=4)  # tiny has 6 heads: 6 % 4 != 0
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        with pytest.raises(ValueError, match="divide"):
            whisper_encode_tp(params, jnp.zeros((4, cfg.n_mels, 200)), cfg,
                              mesh)


class TestTensorParallelWhisperDecode:
    @pytest.mark.parametrize("beam", [1, 2])
    def test_tp_decode_matches_single_device(self, mesh8, beam):
        """The full KV-cached decode loop under TP (decoder_step_tp inside
        shard_map) must reproduce the single-device decode exactly: same
        tokens, same avg_logprob, same no-speech probs."""
        from eioku_tpu.models.whisper.decoding import (
            build_suppress_masks,
            whisper_decode_windows,
            whisper_decode_windows_tp,
        )
        from eioku_tpu.models.whisper.mel import log_mel_spectrogram
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
            whisper_encode,
        )
        from eioku_tpu.models.whisper.tokenizer import WhisperTokens
        from eioku_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=2)
        cfg = WhisperConfig("tiny")  # 6 heads -> 3 per device
        params = init_whisper_params(cfg, seed=0)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 2 * 16000)) * 0.1,
                          jnp.float32)
        mel = log_mel_spectrogram(wav, n_mels=cfg.n_mels)[:, :, :200]
        enc = whisper_encode(params, mel, cfg)
        tokens = WhisperTokens(cfg.vocab_size)
        sot = jnp.asarray([tokens.sot_sequence("en")] * 2, jnp.int32)
        sup_a, sup_b = build_suppress_masks(tokens, timestamps=True)

        ref_out, ref_lp, ref_nsp = whisper_decode_windows(
            params, enc, sot, sup_a, sup_b, cfg, max_len=16, beam_size=beam)
        tp_out, tp_lp, tp_nsp = whisper_decode_windows_tp(
            params, enc, sot, sup_a, sup_b, cfg, mesh,
            max_len=16, beam_size=beam)
        np.testing.assert_array_equal(np.asarray(tp_out), np.asarray(ref_out))
        np.testing.assert_allclose(np.asarray(tp_lp), np.asarray(ref_lp),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tp_nsp), np.asarray(ref_nsp),
                                   rtol=1e-4, atol=1e-5)

    def test_run_transcription_tensor_parallel(self, tmp_path, caplog):
        """The serving path: config {"tensor_parallel": 2} routes
        run_transcription through the sharded encode + decode and produces
        the same transcript results as the single-device path."""
        import logging
        import wave

        from eioku_tpu.ml.transcribe import run_transcription

        sr = 16000
        t = np.arange(sr * 3) / sr
        x = (np.sin(2 * np.pi * 300 * t) * 0.4 * 32767).astype(np.int16)
        wav = tmp_path / "clip.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        base = {"model": "whisper-tiny", "max_tokens": 8, "batch_size": 1,
                "vad_filter": False}
        ref = run_transcription(str(wav), base)
        with caplog.at_level(logging.INFO, logger="eioku_tpu.ml.transcribe"):
            tp = run_transcription(str(wav), {**base, "tensor_parallel": 2})
        assert any("tensor-parallel" in r.message for r in caplog.records), \
            "TP path was not taken"
        # tokens/text/timestamps must match exactly; confidence derives from
        # psum-reduced logprobs, which the parity tests bound at 1e-4 — exact
        # float equality would be reduction-order luck
        assert len(tp) == len(ref)
        for a, b in zip(tp, ref):
            pa, pb = dict(a["payload"]), dict(b["payload"])
            ca, cb = pa.pop("confidence", None), pb.pop("confidence", None)
            assert pa == pb
            assert {k: v for k, v in a.items() if k != "payload"} == \
                   {k: v for k, v in b.items() if k != "payload"}
            if ca is not None and cb is not None:
                assert abs(ca - cb) < 1e-3
