"""int8 post-training quantization (ops/quant.py).

The reference has no quantized serving path (torch fp16 throughout); this is
the beyond-parity TPU lever: int8 weights ride the MXU's double-rate path.
Correctness bar: per-layer dequantization error bounded by the quantization
step, and end-to-end MiniLM embeddings within ~1e-3 cosine of fp32 — tight
enough that top-k retrieval is unchanged.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from eioku_tpu.models.layers import init_linear, KeyGen, linear
from eioku_tpu.ops.quant import (
    linear_q,
    quantize_convs,
    quantize_linear,
    quantize_linears,
)


class TestQuantizeLinear:
    def test_dequantized_weights_close(self):
        p = init_linear(KeyGen(0)(), 64, 32)
        q = quantize_linear(p)
        assert q["w_q"].dtype == jnp.int8
        deq = np.asarray(q["w_q"], np.float32) * np.asarray(q["w_s"])
        w = np.asarray(p["w"])
        # error bounded by half a quantization step per column
        step = np.asarray(q["w_s"])
        assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-7)

    def test_linear_dispatches_on_wq(self):
        """layers.linear must route quantized dicts through the int8 path and
        stay close to the fp32 result."""
        rng = np.random.default_rng(0)
        p = init_linear(KeyGen(1)(), 96, 48)
        x = jnp.asarray(rng.standard_normal((4, 96)), jnp.float32)
        ref = np.asarray(linear(x, p))
        out = np.asarray(linear(x, quantize_linear(p)))
        # both operands are 8-bit: relative error ~1% of the output scale
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=0.02 * scale)
        # and linear_q directly agrees with the dispatched path
        np.testing.assert_array_equal(
            out, np.asarray(linear_q(x, quantize_linear(p))))

    def test_zero_column_weight_safe(self):
        p = {"w": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}
        q = quantize_linear(p)
        out = np.asarray(linear(jnp.ones((2, 8)), q))
        assert np.all(np.isfinite(out))
        np.testing.assert_array_equal(out, 0.0)

    def test_quantize_linears_tree_walk(self):
        """Only 2-D "w" dicts quantize; layernorms, biases-only dicts, bare
        arrays, and conv kernels (ndim != 2) pass through."""
        tree = {
            "lin": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))},
            "ln": {"gamma": jnp.ones((4,)), "beta": jnp.zeros((4,))},
            "emb": jnp.ones((10, 4)),
            "conv": {"w": jnp.ones((3, 3, 4, 4))},
            "nested": [{"w": jnp.ones((2, 2))}],
        }
        q = quantize_linears(tree)
        assert "w_q" in q["lin"] and "w" not in q["lin"]
        assert "gamma" in q["ln"]
        assert q["emb"].shape == (10, 4)
        assert "w" in q["conv"] and q["conv"]["w"].ndim == 4
        assert "w_q" in q["nested"][0]


class TestQuantizedMiniLM:
    def test_embeddings_cosine_parity(self):
        from eioku_tpu.models.embed.minilm import (
            MiniLMConfig,
            init_minilm_params,
            minilm_embed,
        )

        cfg = MiniLMConfig(vocab_size=512, max_position=64, dim=64,
                           n_layers=2, n_heads=4, ffn_dim=128)
        params = init_minilm_params(cfg, seed=0)
        qparams = {k: quantize_linears(v) if k == "layers" else v
                   for k, v in params.items()}
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 512, (8, 32), dtype=np.int32))
        mask = jnp.ones((8, 32), jnp.int32)
        ref = np.asarray(minilm_embed(params, ids, mask, cfg))
        out = np.asarray(minilm_embed(qparams, ids, mask, cfg))
        cos = np.sum(ref * out, axis=-1)  # both L2-normalized
        assert np.all(cos > 0.995), f"cosine parity broken: {cos}"
        # retrieval unchanged: nearest neighbor within the batch agrees
        sim_ref = ref @ ref.T - np.eye(len(ref))
        sim_q = out @ out.T - np.eye(len(out))
        np.testing.assert_array_equal(sim_ref.argmax(-1), sim_q.argmax(-1))

    def test_semantic_index_opt_in(self, tmp_path, monkeypatch):
        """EIOKU_EMBED_INT8=1 (or config embed_int8) quantizes the index's
        encoder; embed_texts still returns normalized vectors."""
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.db import Database, run_migrations
        from eioku_tpu.index.semantic import SemanticIndex

        class Ctx:
            config = AppConfig(index_dir=str(tmp_path / "idx"),
                               model_cache_dir=None, embed_int8=True)
            db = Database(f"sqlite:///{tmp_path}/x.db")

        run_migrations(Ctx.db)
        idx = SemanticIndex(Ctx, batch_size=2)
        vecs = idx.embed_texts(["hello world", "goodbye"])
        assert vecs.shape[1] == idx.dim
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0,
                                   atol=1e-3)
        # the quantized tree actually took effect
        assert "w_q" in idx._params["layers"][0]["q"]


class TestQuantizedYolo:
    def _models(self):
        from eioku_tpu.models.yolo.model import (
            YoloConfig,
            fold_batchnorm,
            init_yolo_params,
        )

        cfg = YoloConfig("yolov8n", num_classes=80)
        params = fold_batchnorm(init_yolo_params(cfg, seed=0))
        return cfg, params, quantize_convs(params)

    @pytest.mark.slow  # ~26 s: full-model int8 forward on the 1-core image
    def test_forward_parity(self):
        """int8 convs (per-output-channel weights, per-image activation
        scales) track the fp forward closely enough that detection survives:
        >0.995 correlation on both heads, bounded max error."""
        from eioku_tpu.models.yolo.model import yolo_forward

        cfg, params, qparams = self._models()
        # every conv quantized, incl. the concat-free neck cv1s and heads
        assert "w_q" in qparams["stem"]
        assert "w_q" in qparams["neck_c2f_td1"]["cv1"]
        assert "w_q" in qparams["head_box_0"]["2"]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        bf, cf = yolo_forward(params, x, cfg)
        bq, cq = yolo_forward(qparams, x, cfg)
        for a, b in ((bf, bq), (cf, cq)):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.995, f"int8 forward diverged: corr={corr}"
            assert np.abs(a - b).max() < 0.1 * np.abs(a).max()

    def test_detect_end_to_end(self):
        """The full serving program (forward + DFL decode + NMS) runs on the
        quantized tree and returns finite, validly-shaped detections."""
        from eioku_tpu.models.yolo.postprocess import detect

        cfg, _, qparams = self._models()
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.uint8)
        out = detect(qparams, imgs, cfg)
        boxes = np.asarray(out["boxes"], np.float32)
        assert np.all(np.isfinite(boxes))
        assert boxes.shape[-1] == 4


class TestQuantizedWhisper:
    def test_decoder_step_parity(self):
        """int8-quantized whisper params flow through the KV-cached decoder
        step with near-identical next-token distributions."""
        import jax

        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            decoder_step,
            init_whisper_params,
            precompute_cross_kv,
            whisper_encode,
        )
        from eioku_tpu.models.whisper.mel import log_mel_spectrogram

        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        qparams = quantize_linears(params)
        assert "w_q" in qparams["dec"]["layers"][0]["attn"]["q"]
        assert qparams["enc"]["conv1"]["w"].ndim == 3  # convs untouched
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
        mel = log_mel_spectrogram(wav, n_mels=cfg.n_mels)[:, :, :100]
        max_len, pos = 8, 0
        tokens = jnp.full((1, max_len), 50258, jnp.int32)

        def probs(p):
            enc = whisper_encode(p, mel, cfg)
            ck, cv = precompute_cross_kv(p, enc)
            sk = jnp.zeros((cfg.n_dec_layers, 1, max_len, cfg.dim),
                           enc.dtype)
            logits, _, _ = decoder_step(p, ck, cv, tokens, sk, sk, pos, cfg)
            return np.asarray(jax.nn.softmax(logits.astype(jnp.float32)))

        ref, out = probs(params), probs(qparams)
        assert np.abs(ref - out).max() < 0.05
        assert ref.argmax() == out.argmax()

    def test_run_transcription_int8(self, tmp_path, caplog):
        """config {"compute_dtype": "int8"} (faster-whisper's compute_type
        name) quantizes the serving model and the pipeline still runs."""
        import logging
        import wave

        from eioku_tpu.ml.transcribe import run_transcription

        sr = 16000
        t = np.arange(sr * 2) / sr
        x = (np.sin(2 * np.pi * 300 * t) * 0.4 * 32767).astype(np.int16)
        wav = tmp_path / "clip.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        with caplog.at_level(logging.INFO, logger="eioku_tpu.ml.transcribe"):
            out = run_transcription(str(wav), {
                "model": "whisper-tiny", "max_tokens": 8, "batch_size": 1,
                "vad_filter": False, "compute_dtype": "int8"})
        assert isinstance(out, list)
        assert any("int8-quantized whisper" in r.message
                   for r in caplog.records)

    def test_int8_draft_model_loads_bf16(self, tmp_path, monkeypatch):
        """compute_dtype "int8" must NOT leak into the draft checkpoint load
        (WhisperConfig would reject/no-op an int8 activation dtype): both
        loads see a real float dtype."""
        import wave

        from eioku_tpu.ml import transcribe
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
        )

        sr = 16000
        x = (np.sin(2 * np.pi * 250 * np.arange(sr) / sr) * 0.4
             * 32767).astype(np.int16)
        wav = tmp_path / "c.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        seen = []

        def fake_load(variant, cache_dir, compute_dtype="float32",
                      random_full_size=False):
            seen.append(compute_dtype)
            return params, cfg, True

        monkeypatch.setattr(transcribe, "_load_model", fake_load)
        transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "max_tokens": 8,
                       "batch_size": 1, "beam_size": 1, "language": "en",
                       "timestamps": False, "compute_dtype": "int8",
                       "draft_model": "tiny", "no_speech_threshold": 2.0,
                       "vad_filter": False})
        assert len(seen) >= 2  # target + draft
        assert all(d == "bfloat16" for d in seen), seen
