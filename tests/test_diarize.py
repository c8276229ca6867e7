"""Speaker diarization: ECAPA embedder, clustering, turn building, engine task.

The reference has no diarization (its only speaker-adjacent field is face
cluster_id, which stays None — model_manager.py:390); this is a beyond-parity
capability, tested the same way as the other model pipelines: structural
correctness with random weights, exact logic tests for the pure host parts.
"""
import numpy as np
import pytest

from eioku_tpu.ml import diarize
from eioku_tpu.models.speaker import (
    EcapaConfig,
    convert_speechbrain_state_dict,
    ecapa_embed,
    fbank,
    init_ecapa_params,
)

TINY = EcapaConfig(channels=32, res2net_scale=4, se_channels=8,
                   attention_channels=8, mfa_channels=48, embed_dim=16)


def _tone(freq, seconds=1.5, sr=16000, amp=0.3):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestFbank:
    def test_shape_and_normalization(self):
        import jax.numpy as jnp
        audio = jnp.asarray(np.random.default_rng(0)
                            .standard_normal((2, 24000)).astype(np.float32))
        fb = fbank(audio, n_mels=80)
        n_frames = 1 + (24000 - 400) // 160
        assert fb.shape == (2, n_frames, 80)
        # per-window mean normalization: time-mean ~ 0 per mel bin
        assert float(np.abs(np.asarray(fb).mean(axis=1)).max()) < 1e-4


class TestEcapa:
    def test_embed_shape_norm_determinism(self):
        import jax.numpy as jnp
        params = init_ecapa_params(TINY, seed=0)
        audio = jnp.asarray(np.random.default_rng(1)
                            .standard_normal((3, 24000)).astype(np.float32))
        e1 = np.asarray(ecapa_embed(params, audio, TINY))
        e2 = np.asarray(ecapa_embed(params, audio, TINY))
        assert e1.shape == (3, 16)
        assert np.isfinite(e1).all()
        np.testing.assert_allclose(np.linalg.norm(e1, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(e1, e2)

    def test_distinct_inputs_distinct_embeddings(self):
        import jax.numpy as jnp
        params = init_ecapa_params(TINY, seed=0)
        a = jnp.asarray(np.stack([_tone(220), _tone(3000)]))
        e = np.asarray(ecapa_embed(params, a, TINY))
        assert float(np.dot(e[0], e[1])) < 0.999

    def test_speechbrain_converter_roundtrip(self):
        """A synthetic state dict in speechbrain naming converts to the same
        structure as init (shapes match pairwise)."""
        import torch

        cfg = TINY
        c, cs = cfg.channels, cfg.channels // cfg.res2net_scale
        sd = {}

        def tdnn(prefix, c_in, c_out, k):
            sd[f"{prefix}.conv.conv.weight"] = torch.randn(c_out, c_in, k)
            sd[f"{prefix}.conv.conv.bias"] = torch.randn(c_out)
            sd[f"{prefix}.norm.norm.weight"] = torch.randn(c_out)
            sd[f"{prefix}.norm.norm.bias"] = torch.randn(c_out)
            sd[f"{prefix}.norm.norm.running_mean"] = torch.randn(c_out)
            sd[f"{prefix}.norm.norm.running_var"] = torch.rand(c_out) + 0.5

        tdnn("blocks.0", cfg.n_mels, c, 5)
        for i in (1, 2, 3):
            tdnn(f"blocks.{i}.tdnn1", c, c, 1)
            for j in range(cfg.res2net_scale - 1):
                tdnn(f"blocks.{i}.res2net_block.blocks.{j}", cs, cs, 3)
            tdnn(f"blocks.{i}.tdnn2", c, c, 1)
            sd[f"blocks.{i}.se_block.conv1.conv.weight"] = \
                torch.randn(cfg.se_channels, c, 1)
            sd[f"blocks.{i}.se_block.conv1.conv.bias"] = torch.randn(cfg.se_channels)
            sd[f"blocks.{i}.se_block.conv2.conv.weight"] = \
                torch.randn(c, cfg.se_channels, 1)
            sd[f"blocks.{i}.se_block.conv2.conv.bias"] = torch.randn(c)
        tdnn("mfa", 3 * c, cfg.mfa_channels, 1)
        tdnn("asp.tdnn", 3 * cfg.mfa_channels, cfg.attention_channels, 1)
        sd["asp.conv.conv.weight"] = torch.randn(cfg.mfa_channels,
                                                 cfg.attention_channels, 1)
        sd["asp.conv.conv.bias"] = torch.randn(cfg.mfa_channels)
        sd["asp_bn.norm.norm.weight"] = torch.randn(2 * cfg.mfa_channels)
        sd["asp_bn.norm.norm.bias"] = torch.randn(2 * cfg.mfa_channels)
        sd["asp_bn.norm.norm.running_mean"] = torch.randn(2 * cfg.mfa_channels)
        sd["asp_bn.norm.norm.running_var"] = torch.rand(2 * cfg.mfa_channels) + 0.5
        sd["fc.conv.weight"] = torch.randn(cfg.embed_dim, 2 * cfg.mfa_channels, 1)
        sd["fc.conv.bias"] = torch.randn(cfg.embed_dim)

        converted = convert_speechbrain_state_dict(sd, cfg)
        reference = init_ecapa_params(cfg, seed=0)

        import jax
        conv_shapes = [x.shape for x in jax.tree_util.tree_leaves(converted)]
        ref_shapes = [x.shape for x in jax.tree_util.tree_leaves(reference)]
        assert conv_shapes == ref_shapes
        # and the converted params actually run
        import jax.numpy as jnp
        audio = jnp.asarray(np.zeros((1, 24000), np.float32))
        out = np.asarray(ecapa_embed(converted, audio, cfg))
        assert out.shape == (1, cfg.embed_dim) and np.isfinite(out).all()


class TestClustering:
    def test_recovers_separated_clusters(self):
        rng = np.random.default_rng(0)
        centers = np.eye(3, 16) * 5
        embs = np.concatenate([
            c + rng.normal(0, 0.05, (10, 16)) for c in centers])
        embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
        labels = diarize.cluster_embeddings(embs, distance_threshold=0.45)
        assert len(set(labels.tolist())) == 3
        # first-appearance ordering: window 0 -> speaker 0
        assert labels[0] == 0 and labels[10] == 1 and labels[20] == 2
        for g in range(3):
            assert len(set(labels[g * 10:(g + 1) * 10].tolist())) == 1

    def test_max_speakers_cap(self):
        rng = np.random.default_rng(1)
        embs = rng.normal(0, 1, (12, 8))
        embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
        labels = diarize.cluster_embeddings(embs, distance_threshold=0.001,
                                            max_speakers=2)
        assert len(set(labels.tolist())) <= 2

    def test_degenerate_sizes(self):
        assert diarize.cluster_embeddings(np.zeros((0, 4))).shape == (0,)
        assert diarize.cluster_embeddings(np.ones((1, 4))).tolist() == [0]


class TestWindowsAndTurns:
    def test_slice_windows_vad_drops_silence(self):
        sr = 16000
        audio = np.concatenate([_tone(440, 3.0), np.zeros(sr * 3, np.float32),
                                _tone(440, 3.0)])
        wins = diarize.slice_windows(audio, window_s=1.5, hop_s=0.75)
        starts = [s for s, _ in wins]
        assert 0 in starts and 6750 in starts
        # fully-silent middle windows dropped
        assert 3750 not in starts and 4500 not in starts
        for _, w in wins:
            assert len(w) == int(1.5 * sr)

    def test_short_audio_padded(self):
        wins = diarize.slice_windows(_tone(440, 0.5), window_s=1.5, hop_s=0.75)
        assert len(wins) == 1 and len(wins[0][1]) == 24000

    def test_turn_merging(self):
        sr = 16000
        win = np.zeros(int(1.5 * sr), np.float32)
        windows = [(0, win), (750, win), (1500, win),   # speaker 0
                   (3000, win), (3750, win)]            # speaker 1
        labels = np.array([0, 0, 0, 1, 1], np.int32)
        embs = np.zeros((5, 4), np.float32)
        embs[:3, 0] = 1.0
        embs[3:, 1] = 1.0
        turns = diarize.windows_to_turns(windows, labels, embs, window_s=1.5)
        assert [t["label"] for t in turns] == ["SPEAKER_00", "SPEAKER_01"]
        assert turns[0]["start_ms"] == 0 and turns[0]["end_ms"] == 3000
        assert turns[1]["start_ms"] == 3000 and turns[1]["end_ms"] == 5250
        assert all(0.0 <= t["confidence"] <= 1.0 for t in turns)

    def test_turn_end_clamped_to_duration(self):
        # short audio is zero-padded to the window; spans must not extend
        # past the real media duration
        win = np.zeros(24000, np.float32)
        turns = diarize.windows_to_turns(
            [(0, win)], np.array([0], np.int32), np.ones((1, 4), np.float32),
            window_s=1.5, duration_ms=300)
        assert turns[0]["end_ms"] == 300

    def test_gap_splits_turn(self):
        sr = 16000
        win = np.zeros(int(1.5 * sr), np.float32)
        windows = [(0, win), (10000, win)]
        labels = np.array([0, 0], np.int32)
        embs = np.ones((2, 4), np.float32)
        turns = diarize.windows_to_turns(windows, labels, embs, window_s=1.5,
                                         max_gap_ms=1000)
        assert len(turns) == 2 and all(t["label"] == "SPEAKER_00" for t in turns)


class TestEndToEnd:
    def test_engine_task_produces_schema_valid_turns(self, tmp_path):
        import wave

        from eioku_tpu.domain.schema_registry import (
            SchemaRegistry,
            register_all_schemas,
        )
        from eioku_tpu.ml.engine import InferenceEngine

        register_all_schemas()
        # alternating spectral content, with silence gaps between turns
        sr = 16000
        parts = []
        for i in range(2):
            parts += [_tone(300, 2.0), np.zeros(sr // 2, np.float32),
                      _tone(2500, 2.0), np.zeros(sr // 2, np.float32)]
        audio = np.concatenate(parts)
        (tmp_path / "talk.mp4").write_bytes(b"stub")  # video body unused
        with wave.open(str(tmp_path / "talk.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())

        engine = InferenceEngine(model_cache_dir=None)
        results = engine.run_task(
            "speaker_diarization", str(tmp_path / "talk.mp4"),
            {"channels": 32, "res2net_scale": 4, "se_channels": 8,
             "attention_channels": 8, "mfa_channels": 48, "embed_dim": 16,
             "compute_dtype": "float32"})
        assert results, "no speaker turns produced"
        for r in results:
            SchemaRegistry.validate("speaker.turn", 1, r["payload"])
            assert r["payload"]["label"].startswith("SPEAKER_")
            assert r["span_end_ms"] > r["span_start_ms"]

    def test_no_audio_returns_empty(self, tmp_path):
        from eioku_tpu.ml.diarize import run_diarization
        (tmp_path / "mute.mp4").write_bytes(b"x")
        assert run_diarization(str(tmp_path / "mute.mp4"), {}) == []

    def test_jump_navigation_by_speaker(self, tmp_path):
        from eioku_tpu.db.connection import Database
        from eioku_tpu.db.migrations import run_migrations
        from eioku_tpu.domain.artifacts import ArtifactEnvelope, new_id
        from eioku_tpu.domain.schema_registry import register_all_schemas
        from eioku_tpu.repositories import ArtifactRepository
        from eioku_tpu.repositories.selection_policy_manager import (
            SelectionPolicyManager,
        )
        from eioku_tpu.services.jump_service import JumpNavigationService

        register_all_schemas()
        db = Database(f"sqlite:///{tmp_path}/jump.db")
        run_migrations(db)
        arts = ArtifactRepository(db)
        turns = [("SPEAKER_00", 0, 3000), ("SPEAKER_01", 3000, 6000),
                 ("SPEAKER_00", 6000, 9000)]
        arts.batch_create([
            ArtifactEnvelope(
                artifact_id=new_id(), asset_id="v1", artifact_type="speaker.turn",
                schema_version=1, span_start_ms=s, span_end_ms=e,
                payload_json={"label": lab, "start_ms": s, "end_ms": e,
                              "confidence": 0.9},
                producer="p", producer_version="1", model_profile="balanced",
                config_hash="c", input_hash="i", run_id="r1")
            for lab, s, e in turns])
        jump = JumpNavigationService(arts, SelectionPolicyManager(db))
        hit = jump.jump("v1", "speaker", from_ms=1000, direction="next",
                        label="SPEAKER_00")
        assert hit["start_ms"] == 6000
        # prev = last artifact with span_end_ms < from_ms (reference:
        # jump_navigation_service.py:141-185)
        hit = jump.jump("v1", "speaker", from_ms=7000, direction="prev",
                        label="SPEAKER_01")
        assert hit["start_ms"] == 3000
        db.close()
