"""Whisper family tests: mel frontend, encoder/decoder shapes, KV-cache decode
parity against full recompute, converter round-trip, pipeline E2E."""
import numpy as np
import pytest

import jax.numpy as jnp

from eioku_tpu.ml import audio_io
from eioku_tpu.models.whisper.mel import (
    HOP,
    N_FFT,
    log_mel_spectrogram,
    mel_filterbank,
)
from eioku_tpu.models.whisper.model import (
    WhisperConfig,
    init_whisper_params,
    sinusoids,
    whisper_decode_full,
    whisper_encode,
    whisper_greedy_decode,
)
from eioku_tpu.models.whisper.tokenizer import WhisperTextDecoder, WhisperTokens
from eioku_tpu.models.whisper.weights import convert_whisper_state_dict

TINY = WhisperConfig("tiny")


def np_log_mel(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Independent numpy reference implementing the Whisper mel recipe."""
    pad = N_FFT // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = len(audio) // HOP
    window = np.hanning(N_FFT + 1)[:-1]
    frames = np.stack([x[i * HOP:i * HOP + N_FFT] * window
                       for i in range(n_frames)])
    spec = np.fft.rfft(frames, axis=-1)
    power = np.abs(spec) ** 2
    mel = power @ mel_filterbank(n_mels).T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T


class TestMel:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(0)
        audio = rng.standard_normal(16000).astype(np.float32) * 0.1
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio[None])))[0]
        ref = np_log_mel(audio)
        assert ours.shape == ref.shape == (80, 100)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_30s_window_shape(self):
        audio = jnp.zeros((2, 30 * 16000))
        mel = log_mel_spectrogram(audio, n_mels=128)
        assert mel.shape == (2, 128, 3000)

    def test_filterbank_rows_nonzero(self):
        fb = mel_filterbank(80)
        assert fb.shape == (80, 201)
        assert (fb.sum(axis=1) > 0).all()


class TestAudioIO:
    def _write_wav(self, path, sr=16000, seconds=2.0, freq=440.0):
        import wave
        t = np.arange(int(sr * seconds)) / sr
        x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        return str(path)

    def test_load_wav(self, tmp_path):
        p = self._write_wav(tmp_path / "a.wav")
        x = audio_io.load_wav(p)
        assert x.dtype == np.float32 and abs(len(x) - 32000) < 10
        assert np.abs(x).max() <= 1.0

    def test_resample(self, tmp_path):
        p = self._write_wav(tmp_path / "b.wav", sr=44100, seconds=1.0)
        x = audio_io.load_wav(p)
        assert abs(len(x) - 16000) < 50

    def test_sidecar_lookup(self, tmp_path):
        self._write_wav(tmp_path / "movie.wav")
        (tmp_path / "movie.mp4").write_bytes(b"x")
        assert audio_io.find_audio_for_video(
            str(tmp_path / "movie.mp4")).endswith("movie.wav")
        assert audio_io.find_audio_for_video(str(tmp_path / "other.mp4")) is None

    def test_compressed_decode(self):
        # SDL_mixer decode path (mp3/ogg sidecars); pygame ships fixtures
        import os
        base = os.path.join(os.path.dirname(os.path.abspath(np.__file__)),
                            "..", "pygame", "examples", "data")
        mp3 = os.path.abspath(os.path.join(base, "house_lo.mp3"))
        ogg = os.path.abspath(os.path.join(base, "house_lo.ogg"))
        if not os.path.isfile(mp3):
            pytest.skip("no pygame audio fixtures in this image")
        for p in (mp3, ogg):
            x = audio_io.load_audio(p)
            assert x.dtype == np.float32 and len(x) > 16000
            assert np.abs(x).max() <= 1.0
            assert audio_io.energy_vad(x).any()

    def test_sidecar_lookup_compressed(self, tmp_path):
        import os
        import shutil
        base = os.path.join(os.path.dirname(os.path.abspath(np.__file__)),
                            "..", "pygame", "examples", "data")
        mp3 = os.path.abspath(os.path.join(base, "house_lo.mp3"))
        if not os.path.isfile(mp3):
            pytest.skip("no pygame audio fixtures in this image")
        shutil.copy(mp3, tmp_path / "movie.mp3")
        (tmp_path / "movie.mp4").write_bytes(b"x")
        found = audio_io.find_audio_for_video(str(tmp_path / "movie.mp4"))
        assert found.endswith("movie.mp3")
        assert len(audio_io.load_audio(found)) > 16000

    def test_native_aac_roundtrip(self, tmp_path):
        """native/audio_decode.cpp: AAC encode -> decode recovers the tone."""
        if audio_io.native_decoder() is None:
            pytest.skip("native audio shim unavailable in this image")
        sr = 16000
        t = np.arange(sr * 2) / sr
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = str(tmp_path / "tone.m4a")
        audio_io.native_encode(p, x, sr)
        y = audio_io.load_audio(p)
        assert y.dtype == np.float32
        assert abs(len(y) - len(x)) < sr // 4  # encoder priming padding only
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        assert abs(np.argmax(spec) * sr / len(y) - 440.0) < 2.0

    def test_embedded_audio_track_in_video(self, tmp_path):
        """A video container with an embedded AAC track is its own audio
        source (the reference's ffmpeg-demux behavior, model_manager.py:437),
        preferred over any sidecar."""
        if audio_io.native_decoder() is None:
            pytest.skip("native audio shim unavailable in this image")
        sr = 16000
        x = (0.4 * np.sin(np.arange(sr) * 0.1)).astype(np.float32)
        video = str(tmp_path / "movie.mp4")
        audio_io.native_encode(video, x, sr)
        self._write_wav(tmp_path / "movie.wav")  # decoy sidecar
        assert audio_io.find_audio_for_video(video) == video
        y = audio_io.load_audio(video)
        assert len(y) > sr // 2 and np.abs(y).max() <= 1.0

    def test_h264_aac_media_file(self, tmp_path):
        """A reference-style input — one mp4 with H.264 video + AAC audio —
        decodes on both sides: cv2 reads the frames, the shim demuxes the
        audio track."""
        if audio_io.native_decoder() is None:
            pytest.skip("native audio shim unavailable in this image")
        import cv2
        sr = 16000
        tone = (0.4 * np.sin(2 * np.pi * 440 * np.arange(sr * 3) / sr)
                ).astype(np.float32)
        frames = np.zeros((30, 120, 160, 3), np.uint8)
        frames[15:] = 200
        p = str(tmp_path / "real.mp4")
        audio_io.native_media_encode(p, frames, fps=10.0, samples=tone, sr=sr)
        cap = cv2.VideoCapture(p)
        got = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            got.append(float(f.mean()))
        cap.release()
        assert len(got) >= 28  # some demuxers drop the final frame
        assert got[0] < 20 and got[-1] > 180  # content survived the codec
        assert audio_io.find_audio_for_video(p) == p
        y = audio_io.load_audio(p)
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        assert abs(np.argmax(spec) * sr / len(y) - 440.0) < 2.0

    def test_video_without_audio_uses_sidecar(self, tmp_path):
        """An mp4 with no audio stream still falls back to the sidecar."""
        if audio_io.native_decoder() is None:
            pytest.skip("native audio shim unavailable in this image")
        import cv2
        video = str(tmp_path / "movie.mp4")
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (64, 64))
        for _ in range(5):
            w.write(np.zeros((64, 64, 3), np.uint8))
        w.release()
        wav = self._write_wav(tmp_path / "movie.wav")
        assert audio_io.find_audio_for_video(video) == wav

    def test_m4a_sidecar_ignored_without_shim(self, tmp_path, monkeypatch):
        """Without the native shim, an .m4a sidecar must be skipped (not
        selected then failed): the task degrades to wav-or-nothing."""
        if audio_io.native_decoder() is not None:
            sr = 16000
            tone = (0.3 * np.sin(np.arange(sr) * 0.2)).astype(np.float32)
            audio_io.native_encode(str(tmp_path / "movie.m4a"), tone, sr)
        else:
            (tmp_path / "movie.m4a").write_bytes(b"fake")
        (tmp_path / "movie.mp4").write_bytes(b"x")
        monkeypatch.setattr(audio_io, "native_decoder", lambda: None)
        assert audio_io.find_audio_for_video(str(tmp_path / "movie.mp4")) is None
        wav = self._write_wav(tmp_path / "movie.wav")
        assert audio_io.find_audio_for_video(str(tmp_path / "movie.mp4")) == wav

    def test_vad_detects_silence(self):
        sr = 16000
        silent = np.zeros(sr, np.float32)
        loud = np.sin(np.arange(sr) / 10).astype(np.float32)
        assert not audio_io.energy_vad(silent).any()
        assert audio_io.energy_vad(loud).any()

    def test_split_windows_drops_silent(self):
        sr = 16000
        audio = np.concatenate([np.sin(np.arange(sr * 31) / 8).astype(np.float32),
                                np.zeros(sr * 31, np.float32)])
        wins = audio_io.split_windows(audio, window_s=30.0, vad=True)
        starts = [w[0] for w in wins]
        assert 0 in starts and 30000 in starts  # window 1 straddles sound
        assert 60000 not in starts  # fully silent window dropped
        assert all(len(w[1]) == sr * 30 for w in wins)


@pytest.fixture(scope="module")
def tiny_params():
    return init_whisper_params(TINY, seed=0)


class TestWhisperModel:
    def test_encoder_shape(self, tiny_params):
        mel = jnp.zeros((1, 80, 3000))
        out = whisper_encode(tiny_params, mel, TINY)
        assert out.shape == (1, 1500, 384)

    def test_decoder_full_shape(self, tiny_params):
        enc = jnp.zeros((1, 1500, 384))
        toks = jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32)
        logits = whisper_decode_full(tiny_params, toks, enc, TINY)
        assert logits.shape == (1, 4, TINY.vocab_size)

    def test_kv_cache_matches_full_recompute(self, tiny_params):
        """Greedy decode with the cached loop must equal argmax rollout of the
        full-recompute decoder — the canonical KV-cache correctness check."""
        rng = np.random.default_rng(1)
        enc = jnp.asarray(rng.standard_normal((1, 1500, 384)).astype(np.float32)
                          * 0.1)
        tokens = WhisperTokens(TINY.vocab_size)
        sot = tokens.sot_sequence("en")
        max_len = 12

        fast = np.asarray(whisper_greedy_decode(
            tiny_params, enc, jnp.asarray([sot], jnp.int32), tokens.eot, TINY,
            max_len=max_len, suppress_specials=False))[0]

        # slow rollout with whisper_decode_full
        cur = list(sot)
        for _ in range(max_len - len(sot)):
            logits = whisper_decode_full(
                tiny_params, jnp.asarray([cur], jnp.int32), enc, TINY)
            nxt = int(jnp.argmax(logits[0, -1]))
            cur.append(nxt)
            if nxt == tokens.eot:
                break
        slow = np.full(max_len, tokens.eot, np.int64)
        slow[:len(cur)] = cur
        np.testing.assert_array_equal(fast, slow)

    def test_suppression_blocks_special_tokens(self):
        rng = np.random.default_rng(5)
        params = init_whisper_params(TINY, seed=2)
        enc = jnp.asarray(rng.standard_normal((1, 1500, 384)).astype(np.float32)
                          * 0.1)
        tokens = WhisperTokens(TINY.vocab_size)
        sot = tokens.sot_sequence("en")
        out = np.asarray(whisper_greedy_decode(
            params, enc, jnp.asarray([sot], jnp.int32), tokens.eot, TINY,
            max_len=24))[0]
        gen = out[len(sot):]
        specials = (gen > tokens.eot) & (gen < tokens.timestamp_begin)
        assert not specials.any(), gen[specials]

    def test_sinusoids(self):
        s = sinusoids(10, 8)
        assert s.shape == (10, 8)
        np.testing.assert_allclose(s[0, :4], 0.0, atol=1e-7)
        np.testing.assert_allclose(s[0, 4:], 1.0, atol=1e-7)


class TestTokens:
    def test_v2_layout(self):
        t = WhisperTokens(51865)
        assert t.transcribe == 50359 and t.no_timestamps == 50363

    def test_v3_layout(self):
        t = WhisperTokens(51866)
        assert t.transcribe == 50360 and t.no_timestamps == 50364

    def test_sot_sequence(self):
        t = WhisperTokens(51865)
        assert t.sot_sequence("en") == [50258, 50259, 50359, 50363]
        ja = t.sot_sequence("ja")
        assert ja[1] == t.lang_token("ja") != t.lang_token("en")

    def test_sot_sequence_translate(self):
        # whisper's built-in X->en translation (faster-whisper task param,
        # serving config {"task": "translate"})
        t = WhisperTokens(51865)
        tr = t.sot_sequence("ja", task="translate")
        assert tr[2] == t.translate == 50358
        assert t.sot_sequence("ja")[2] == t.transcribe

    @pytest.mark.slow  # ~30 s on the 1-core image: full pipeline e2e
    def test_run_transcription_translate_task(self, tmp_path, monkeypatch):
        """config {"task": "translate"}: the decode prompt carries the
        translate token instead of transcribe (whole pipeline plumbing)."""
        import wave

        import numpy as np

        from eioku_tpu.ml import transcribe as tr
        sr = 16000
        t = np.arange(sr) / sr
        x = (np.sin(2 * np.pi * 300 * t) * 0.4 * 32767).astype(np.int16)
        wav = tmp_path / "c.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
            w.writeframes(x.tobytes())
        seen = {}
        orig = tr.WhisperTokens.sot_sequence

        def spy(self, lang="en", timestamps=False, task="transcribe"):
            seen["task"] = task
            return orig(self, lang, timestamps, task)

        monkeypatch.setattr(tr.WhisperTokens, "sot_sequence", spy)
        tr.run_transcription(str(wav), {"model": "whisper-tiny",
                                        "max_tokens": 4, "vad_filter": False,
                                        "task": "translate"})
        assert seen["task"] == "translate"

    def test_decoder_with_vocab(self):
        vocab = {"Hello": 1, "Ġworld": 2}  # GPT2 'Ġ' space marker
        t = WhisperTokens(51865)
        d = WhisperTextDecoder(vocab, t)
        assert d.decode([1, 2, t.eot]) == "Hello world"

    def test_decoder_placeholder(self):
        t = WhisperTokens(51865)
        d = WhisperTextDecoder(None, t)
        assert d.decode([5, 6]) == "<5> <6>"
        assert d.decode([t.eot]) == ""


class TestConverter:
    def test_hf_roundtrip_forward(self):
        """Random HF-named state dict -> converter -> forward runs and matches a
        manual parameter inspection."""
        cfg = WhisperConfig("tiny")
        rng = np.random.default_rng(0)
        d, mels, vocab = cfg.dim, cfg.n_mels, cfg.vocab_size

        def w(*s):
            return rng.standard_normal(s).astype(np.float32) * 0.02

        sd = {
            "encoder.conv1.weight": w(d, mels, 3),
            "encoder.conv1.bias": w(d),
            "encoder.conv2.weight": w(d, d, 3),
            "encoder.conv2.bias": w(d),
            "encoder.layer_norm.weight": np.ones(d, np.float32),
            "encoder.layer_norm.bias": np.zeros(d, np.float32),
            "decoder.embed_tokens.weight": w(vocab, d),
            "decoder.embed_positions.weight": w(448, d),
            "decoder.layer_norm.weight": np.ones(d, np.float32),
            "decoder.layer_norm.bias": np.zeros(d, np.float32),
        }
        for kind, n in (("encoder", cfg.n_enc_layers),
                        ("decoder", cfg.n_dec_layers)):
            for i in range(n):
                base = f"{kind}.layers.{i}"
                attns = ["self_attn"] + (["encoder_attn"] if kind == "decoder"
                                         else [])
                for a in attns:
                    for proj in ("q_proj", "v_proj", "out_proj"):
                        sd[f"{base}.{a}.{proj}.weight"] = w(d, d)
                        sd[f"{base}.{a}.{proj}.bias"] = w(d)
                    sd[f"{base}.{a}.k_proj.weight"] = w(d, d)
                for lnn in (["self_attn_layer_norm", "final_layer_norm"]
                            + (["encoder_attn_layer_norm"] if kind == "decoder"
                               else [])):
                    sd[f"{base}.{lnn}.weight"] = np.ones(d, np.float32)
                    sd[f"{base}.{lnn}.bias"] = np.zeros(d, np.float32)
                sd[f"{base}.fc1.weight"] = w(d * 4, d)
                sd[f"{base}.fc1.bias"] = w(d * 4)
                sd[f"{base}.fc2.weight"] = w(d, d * 4)
                sd[f"{base}.fc2.bias"] = w(d)
        params = convert_whisper_state_dict(sd, cfg)
        np.testing.assert_allclose(
            np.asarray(params["enc"]["conv1"]["w"]),
            np.transpose(sd["encoder.conv1.weight"], (2, 1, 0)))
        np.testing.assert_allclose(
            np.asarray(params["dec"]["layers"][0]["attn"]["q"]["w"]),
            sd["decoder.layers.0.self_attn.q_proj.weight"].T)
        mel = jnp.zeros((1, mels, 3000))
        out = whisper_encode(params, mel, cfg)
        assert out.shape == (1, 1500, d)


@pytest.mark.slow
class TestHFParity:
    def test_encoder_and_decoder_match_torch_whisper(self):
        """Numerical parity vs the HuggingFace torch Whisper implementation
        (random weights, tiny dims): converter + architecture fidelity in one
        check — the guarantee that real checkpoints transcribe identically
        (SURVEY.md hard-part 4)."""
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")

        hf_cfg = transformers.WhisperConfig(
            vocab_size=TINY.vocab_size, num_mel_bins=80, d_model=384,
            encoder_layers=4, decoder_layers=4, encoder_attention_heads=6,
            decoder_attention_heads=6, encoder_ffn_dim=1536,
            decoder_ffn_dim=1536, max_source_positions=1500,
            max_target_positions=448, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0)
        torch.manual_seed(0)
        model = transformers.WhisperModel(hf_cfg).eval()
        # pin the encoder positions to our sinusoid table so the comparison
        # is insensitive to the HF init path for the non-trainable embedding
        with torch.no_grad():
            model.encoder.embed_positions.weight.copy_(
                torch.from_numpy(np.asarray(sinusoids(1500, 384))))

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_whisper_state_dict(sd, TINY)

        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
        with torch.no_grad():
            hf_enc = model.encoder(torch.from_numpy(mel)).last_hidden_state
        ours_enc = whisper_encode(params, jnp.asarray(mel), TINY)
        np.testing.assert_allclose(np.asarray(ours_enc), hf_enc.numpy(),
                                   atol=2e-3, rtol=1e-3)

        toks = rng.integers(0, TINY.vocab_size, (1, 6)).astype(np.int64)
        with torch.no_grad():
            hf_hidden = model.decoder(
                input_ids=torch.from_numpy(toks),
                encoder_hidden_states=hf_enc).last_hidden_state
            # HF ties the LM head to the token embedding
            hf_logits = hf_hidden @ model.decoder.embed_tokens.weight.T
        ours_logits = whisper_decode_full(params, jnp.asarray(toks, jnp.int32),
                                          ours_enc, TINY)
        np.testing.assert_allclose(np.asarray(ours_logits), hf_logits.numpy(),
                                   atol=5e-3, rtol=1e-3)


class TestTranscribePipeline:
    def test_no_audio_returns_empty(self, tmp_path):
        from eioku_tpu.ml.transcribe import run_transcription
        video = tmp_path / "v.mp4"
        video.write_bytes(b"fake")
        assert run_transcription(str(video), {}) == []

    def test_pretrained_path_with_words(self, tmp_path, monkeypatch):
        """Force the pretrained+vocab path: full decode (beam, timestamps,
        silence gate) plus DTW word alignment runs through run_transcription.
        Weights are still random; assertions are structural."""
        import json
        import wave
        from eioku_tpu.ml import transcribe
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
        )
        sr = 16000
        t = np.arange(sr * 2) / sr
        x = (np.sin(2 * np.pi * 250 * t) * 0.4 * 32767).astype(np.int16)
        wav = tmp_path / "clip.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        # minimal vocab: a few word-start ("\u0120"-prefixed) pieces
        vocab = {f"\u0120w{i}": i for i in range(50257)}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        monkeypatch.setattr(transcribe, "_load_model",
                            lambda *a, **kw: (params, cfg, True))
        results = transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "max_tokens": 16,
                       "batch_size": 1, "beam_size": 2, "language": "en",
                       "word_timestamps": True,
                       "no_speech_threshold": 2.0},  # never gate on silence
            model_cache_dir=str(tmp_path))
        for r in results:
            p_ = r["payload"]
            assert 0.0 <= p_["confidence"] <= 1.0
            for wd in p_["words"]:
                assert p_["start_ms"] - 20 <= wd["start_ms"]
                assert wd["end_ms"] >= wd["start_ms"]

    @pytest.mark.slow
    def test_condition_on_previous_text(self, tmp_path, monkeypatch):
        """Sequential conditioned decode (sot_prev prompting, faster-whisper's
        default mode) runs end-to-end over multiple windows."""
        import wave
        from eioku_tpu.ml import transcribe
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
        )
        sr = 16000
        t = np.arange(sr * 61) / sr  # 3 windows
        x = (np.sin(2 * np.pi * 220 * t) * 0.4 * 32767).astype(np.int16)
        wav = tmp_path / "long.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        monkeypatch.setattr(transcribe, "_load_model",
                            lambda *a, **kw: (params, cfg, True))
        results = transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "max_tokens": 12,
                       "beam_size": 1, "language": "en", "timestamps": False,
                       "condition_on_previous_text": True,
                       "no_speech_threshold": 2.0})
        # three 30s windows, each emitting at most one plain segment
        spans = sorted({(r["span_start_ms"]) for r in results})
        assert spans and spans[0] == 0
        for r in results:
            assert 0.0 <= r["payload"]["confidence"] <= 1.0

    def test_compression_ratio_flags_repetition(self):
        from eioku_tpu.ml.transcribe import compression_ratio
        assert compression_ratio("the the the the the the the the the " * 8) \
            > 2.4
        assert compression_ratio("") == 0.0
        assert compression_ratio("a quick brown fox jumps over dogs") < 2.4

    def test_fallback_predicate_exempts_confident_silence(self):
        from eioku_tpu.ml.transcribe import needs_temperature_fallback
        kw = dict(logprob_threshold=-1.0, no_speech_threshold=0.6,
                  cr_threshold=2.4)
        # confident silence: weak transcript AND high no-speech -> keep the
        # result so the silence gate drops it (no hallucination retries)
        assert not needs_temperature_fallback(-1.5, 0.9, "x", **kw)
        # weak transcript with speech present -> retry
        assert needs_temperature_fallback(-1.5, 0.1, "x", **kw)
        # degenerate repetition -> retry even at good logprob
        assert needs_temperature_fallback(-0.2, 0.1, "la la " * 60, **kw)
        # healthy window -> no retry
        assert not needs_temperature_fallback(-0.2, 0.1, "hello world", **kw)

    def test_sampling_decode_deterministic_per_key(self, tiny_params):
        """sample=True runs beam_size independent chains; same key -> same
        tokens, and outputs keep the beam-path shapes/contract."""
        import jax
        from eioku_tpu.models.whisper.decoding import (
            build_suppress_masks,
            whisper_decode_windows,
        )
        from eioku_tpu.models.whisper.tokenizer import WhisperTokens
        params, cfg = tiny_params, TINY
        tokens = WhisperTokens(cfg.vocab_size)
        rng = np.random.default_rng(0)
        mel = log_mel_spectrogram(
            jnp.asarray(rng.standard_normal((1, 16000 * 30))
                        .astype(np.float32) * 0.1), n_mels=cfg.n_mels)
        enc = whisper_encode(params, mel, cfg)
        init = jnp.asarray([tokens.sot_sequence("en")], jnp.int32)
        sup_a, sup_b = build_suppress_masks(tokens, timestamps=True)
        key = jax.random.PRNGKey(7)
        out1, lp1, ns1 = whisper_decode_windows(
            params, enc, init, sup_a, sup_b, cfg, max_len=12, beam_size=2,
            sample=True, temperature=0.8, key=key)
        out2, _, _ = whisper_decode_windows(
            params, enc, init, sup_a, sup_b, cfg, max_len=12, beam_size=2,
            sample=True, temperature=0.8, key=key)
        assert out1.shape == (1, 12)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert np.isfinite(float(lp1[0]))
        assert 0.0 <= float(ns1[0]) <= 1.0

    def test_temperature_fallback_ladder(self, tmp_path, monkeypatch):
        """An impossible logprob threshold forces every window through the
        sampling ladder; the last rung's rows are adopted and emitted."""
        import wave
        from eioku_tpu.ml import transcribe
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
        )
        sr = 16000
        t = np.arange(sr * 2) / sr
        x = (np.sin(2 * np.pi * 260 * t) * 0.4 * 32767).astype(np.int16)
        wav = tmp_path / "clip.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        monkeypatch.setattr(transcribe, "_load_model",
                            lambda *a, **kw: (params, cfg, True))
        results = transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "max_tokens": 12,
                       "batch_size": 1, "beam_size": 2, "language": "en",
                       "timestamps": False,
                       "logprob_threshold": 0.0,  # every decode "fails"
                       "temperatures": (0.5, 1.0),
                       "no_speech_threshold": 2.0})
        assert isinstance(results, list)
        for r in results:
            assert 0.0 <= r["payload"]["confidence"] <= 1.0

    def test_wav_pipeline_runs(self, tmp_path):
        """Random tiny weights: pipeline must run and yield schema-valid,
        correctly-timed windows (text empty without a pretrained checkpoint)."""
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
        results = run_transcription(str(wav), {"model": "whisper-tiny",
                                               "max_tokens": 8,
                                               "batch_size": 1})
        assert isinstance(results, list)
        # random weights -> no text, segments suppressed
        for r in results:
            assert r["span_start_ms"] == 0


class TestTimestampParsing:
    def _setup(self):
        tokens = WhisperTokens(51865)
        vocab = {"Hello": 1, "Ġworld": 2, "Ġbye": 3}
        decoder = WhisperTextDecoder(vocab, tokens)
        return tokens, decoder

    def _ts(self, tokens, seconds):
        return tokens.timestamp_begin + int(seconds / 0.02)

    def test_two_segments(self):
        from eioku_tpu.ml.transcribe import parse_timestamped_tokens
        tokens, decoder = self._setup()
        gen = [self._ts(tokens, 0.0), 1, 2, self._ts(tokens, 2.0),
               self._ts(tokens, 2.0), 3, self._ts(tokens, 4.5)]
        segs = parse_timestamped_tokens(gen, tokens, decoder, 30000, 60000)
        assert len(segs) == 2
        assert segs[0] == {"text": "Hello world", "start_ms": 30000,
                           "end_ms": 32000}
        assert segs[1]["start_ms"] == 32000 and segs[1]["end_ms"] == 34500
        assert segs[1]["text"] == "bye"

    def test_unterminated_segment_falls_to_window_end(self):
        from eioku_tpu.ml.transcribe import parse_timestamped_tokens
        tokens, decoder = self._setup()
        gen = [self._ts(tokens, 1.0), 1]
        segs = parse_timestamped_tokens(gen, tokens, decoder, 0, 30000)
        assert segs == [{"text": "Hello", "start_ms": 1000, "end_ms": 30000}]

    def test_no_timestamps_in_stream(self):
        from eioku_tpu.ml.transcribe import parse_timestamped_tokens
        tokens, decoder = self._setup()
        segs = parse_timestamped_tokens([1, 2], tokens, decoder, 0, 30000)
        assert segs == [{"text": "Hello world", "start_ms": 0, "end_ms": 30000}]

    def test_end_clamped_to_window(self):
        from eioku_tpu.ml.transcribe import parse_timestamped_tokens
        tokens, decoder = self._setup()
        gen = [self._ts(tokens, 0.0), 1, self._ts(tokens, 29.0)]
        segs = parse_timestamped_tokens(gen, tokens, decoder, 0, 5000)
        assert segs[0]["end_ms"] == 5000


class TestLanguageDetection:
    def test_returns_valid_language_index(self, tiny_params):
        from eioku_tpu.models.whisper.model import whisper_detect_language
        from eioku_tpu.models.whisper.tokenizer import LANGUAGES
        rng = np.random.default_rng(3)
        enc = jnp.asarray(rng.standard_normal((2, 1500, 384)).astype(np.float32)
                          * 0.1)
        idx = np.asarray(whisper_detect_language(tiny_params, enc, TINY))
        assert idx.shape == (2,)
        n_langs = 100 if TINY.vocab_size >= 51866 else 99
        assert ((0 <= idx) & (idx < n_langs)).all()
        assert all(i < len(LANGUAGES) for i in idx)


class TestDecodeRulesAndBeam:
    """whisper_decode_windows: OpenAI-rule logit filters + on-device beam
    search (the reference's faster-whisper engine defaults to beam_size=5 and
    applies the same constraints — model_manager.py:409-467)."""

    @pytest.fixture(scope="class")
    def decoded(self, tiny_params):
        from eioku_tpu.models.whisper.decoding import (
            build_suppress_masks,
            whisper_decode_windows,
        )
        tokens = WhisperTokens(TINY.vocab_size)
        rng = np.random.default_rng(7)
        enc = jnp.asarray(rng.standard_normal((2, 1500, 384)).astype(np.float32)
                          * 0.1)
        sa, sb = build_suppress_masks(tokens, timestamps=True)
        init = jnp.asarray([tokens.sot_sequence("en", timestamps=True)] * 2,
                           jnp.int32)
        out, avg_lp, no_speech = whisper_decode_windows(
            tiny_params, enc, init, sa, sb, TINY, max_len=48, beam_size=3,
            timestamps=True)
        return (np.asarray(out), np.asarray(avg_lp), np.asarray(no_speech),
                tokens, init.shape[1])

    def test_shapes_and_ranges(self, decoded):
        out, avg_lp, no_speech, tokens, n_init = decoded
        assert out.shape == (2, 48)
        assert avg_lp.shape == (2,) and (avg_lp <= 0).all()
        assert ((0 <= no_speech) & (no_speech <= 1)).all()

    def _gen(self, row, tokens, n_init):
        gen = row[n_init:].tolist()
        return gen[:gen.index(tokens.eot)] if tokens.eot in gen else gen

    def test_first_token_is_early_timestamp(self, decoded):
        out, _, _, tokens, n_init = decoded
        for row in out:
            gen = self._gen(row, tokens, n_init)
            if gen:
                assert gen[0] >= tokens.timestamp_begin
                assert gen[0] <= tokens.timestamp_begin + 50  # <= 1.0 s

    def test_no_special_tokens_generated(self, decoded):
        out, _, _, tokens, n_init = decoded
        for row in out:
            for tok in self._gen(row, tokens, n_init):
                assert tok < tokens.sot or tok >= tokens.timestamp_begin

    def test_timestamps_monotonic_and_paired(self, decoded):
        out, _, _, tokens, n_init = decoded
        for row in out:
            gen = self._gen(row, tokens, n_init)
            ts = [t for t in gen if t >= tokens.timestamp_begin]
            assert ts == sorted(ts)
            # no three consecutive timestamps (pairs at segment boundaries)
            run = 0
            for t in gen:
                run = run + 1 if t >= tokens.timestamp_begin else 0
                assert run <= 2

    def test_greedy_mode_runs_without_timestamps(self, tiny_params):
        from eioku_tpu.models.whisper.decoding import (
            build_suppress_masks,
            whisper_decode_windows,
        )
        tokens = WhisperTokens(TINY.vocab_size)
        rng = np.random.default_rng(9)
        enc = jnp.asarray(rng.standard_normal((1, 1500, 384)).astype(np.float32)
                          * 0.1)
        sa, sb = build_suppress_masks(tokens, timestamps=False)
        init = jnp.asarray([tokens.sot_sequence("en", timestamps=False)],
                           jnp.int32)
        out, _, _ = whisper_decode_windows(
            tiny_params, enc, init, sa, sb, TINY, max_len=24, beam_size=1,
            timestamps=False)
        gen = self._gen(np.asarray(out)[0], tokens, init.shape[1])
        assert all(t < tokens.eot for t in gen)  # text only

    def test_beam_avg_logprob_not_worse_than_greedy(self, tiny_params):
        """Beam search optimizes sequence logprob, so its selected beam must
        score at least as well as the greedy rollout."""
        from eioku_tpu.models.whisper.decoding import (
            build_suppress_masks,
            whisper_decode_windows,
        )
        tokens = WhisperTokens(TINY.vocab_size)
        rng = np.random.default_rng(11)
        enc = jnp.asarray(rng.standard_normal((1, 1500, 384)).astype(np.float32)
                          * 0.1)
        sa, sb = build_suppress_masks(tokens, timestamps=False)
        init = jnp.asarray([tokens.sot_sequence("en", timestamps=False)],
                           jnp.int32)
        _, greedy_lp, _ = whisper_decode_windows(
            tiny_params, enc, init, sa, sb, TINY, max_len=20, beam_size=1,
            timestamps=False)
        _, beam_lp, _ = whisper_decode_windows(
            tiny_params, enc, init, sa, sb, TINY, max_len=20, beam_size=4,
            timestamps=False)
        assert float(beam_lp[0]) >= float(greedy_lp[0]) - 1e-3


class TestBfloat16Compute:
    def test_bf16_encoder_close_to_f32(self, tiny_params):
        from dataclasses import replace
        rng = np.random.default_rng(13)
        mel = jnp.asarray(rng.standard_normal((1, 80, 3000)).astype(np.float32))
        f32 = np.asarray(whisper_encode(tiny_params, mel, TINY),
                         np.float32)
        bf16 = np.asarray(whisper_encode(
            tiny_params, mel, replace(TINY, compute_dtype="bfloat16")),
            np.float32)
        # per-position cosine similarity stays high under bf16 activations
        num = (f32 * bf16).sum(-1)
        den = np.linalg.norm(f32, axis=-1) * np.linalg.norm(bf16, axis=-1)
        assert (num / (den + 1e-9)).min() > 0.99

    def test_bf16_decode_runs(self, tiny_params):
        from dataclasses import replace
        from eioku_tpu.models.whisper.decoding import (
            build_suppress_masks,
            whisper_decode_windows,
        )
        cfg = replace(TINY, compute_dtype="bfloat16")
        tokens = WhisperTokens(cfg.vocab_size)
        rng = np.random.default_rng(15)
        enc = whisper_encode(tiny_params, jnp.asarray(
            rng.standard_normal((1, 80, 3000)).astype(np.float32)), cfg)
        sa, sb = build_suppress_masks(tokens, timestamps=True)
        init = jnp.asarray([tokens.sot_sequence("en", timestamps=True)],
                           jnp.int32)
        out, avg_lp, nsp = whisper_decode_windows(
            tiny_params, enc, init, sa, sb, cfg, max_len=24, beam_size=2,
            timestamps=True)
        assert np.asarray(out).shape == (1, 24)
        assert float(avg_lp[0]) <= 0.0
        assert 0.0 <= float(nsp[0]) <= 1.0


class TestWordAlignment:
    """Word timestamps via cross-attention DTW (align.py + native/dtw.cpp).
    Reference capability: faster-whisper word_timestamps
    (model_manager.py:409-467 calls that engine)."""

    def _decoder_with_vocab(self):
        from eioku_tpu.models.whisper.tokenizer import (
            WhisperTextDecoder,
            WhisperTokens,
        )
        # synthetic byte-BPE vocab: "Ġ"-prefixed pieces start words
        vocab = {"Ġhe": 1, "llo": 2, "Ġwor": 3, "ld": 4, "Ġhi": 5}
        return WhisperTextDecoder(vocab, WhisperTokens(51865))

    def test_dtw_native_matches_python(self):
        from eioku_tpu.models.whisper import align
        from eioku_tpu.utils import native_build
        rng = np.random.default_rng(3)
        cost = rng.standard_normal((40, 200)).astype(np.float32)
        saved = native_build._cache.get("dtw")
        ti_n, fi_n = align.dtw_path(cost)
        # force the Python fallback
        native_build._cache["dtw"] = None
        try:
            ti_p, fi_p = align.dtw_path(cost)
        finally:
            if saved is not None:
                native_build._cache["dtw"] = saved
            else:
                native_build._cache.pop("dtw", None)
        np.testing.assert_array_equal(ti_n, ti_p)
        np.testing.assert_array_equal(fi_n, fi_p)

    def test_dtw_path_is_monotone_and_covers(self):
        from eioku_tpu.models.whisper.align import dtw_path
        rng = np.random.default_rng(4)
        cost = rng.standard_normal((10, 50)).astype(np.float32)
        ti, fi = dtw_path(cost)
        assert ti[0] == 0 and fi[0] == 0
        assert ti[-1] == 9 and fi[-1] == 49
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()

    def test_median_filter(self):
        from eioku_tpu.models.whisper.align import median_filter
        x = np.array([[0.0, 10.0, 0.0, 0.0, 0.0]])
        out = median_filter(x, width=3)
        assert out[0, 1] == 0.0  # spike removed
        np.testing.assert_array_equal(median_filter(x, width=1), x)

    def test_group_tokens_into_words(self):
        from eioku_tpu.models.whisper.align import group_tokens_into_words
        dec = self._decoder_with_vocab()
        words = group_tokens_into_words([1, 2, 3, 4], dec)
        assert [w for w, _ in words] == ["hello", "world"]
        assert words[0][1] == [0, 1] and words[1][1] == [2, 3]

    def test_word_timestamps_diagonal_alignment(self):
        from eioku_tpu.models.whisper.align import word_timestamps
        dec = self._decoder_with_vocab()
        toks = [1, 2, 3, 4]  # "hello world"
        s, f = len(toks), 100
        m = np.full((s, f), -1.0, np.float32)
        for i in range(s):  # strong diagonal band: token i ~ frames 25i..25i+24
            m[i, i * 25:(i + 1) * 25] = 1.0
        words = word_timestamps(m, toks, dec, window_start_ms=60000,
                                n_audio_frames=f, medfilt_width=1)
        assert [w["word"] for w in words] == ["hello", "world"]
        assert words[0]["start_ms"] == 60000
        assert words[0]["end_ms"] <= words[1]["start_ms"] + 20
        assert words[1]["end_ms"] <= 60000 + f * 20
        for w in words:
            assert w["end_ms"] >= w["start_ms"]

    def test_word_timestamps_skips_without_vocab(self):
        from eioku_tpu.models.whisper.align import word_timestamps
        from eioku_tpu.models.whisper.tokenizer import (
            WhisperTextDecoder,
            WhisperTokens,
        )
        dec = WhisperTextDecoder(None, WhisperTokens(51865))
        out = word_timestamps(np.ones((2, 10), np.float32), [1, 2], dec, 0, 10)
        assert out == []

    def test_cross_attention_alignment_shape(self, tiny_params):
        from eioku_tpu.models.whisper.model import cross_attention_alignment
        rng = np.random.default_rng(8)
        enc = jnp.asarray(rng.standard_normal((2, 1500, 384)).astype(np.float32)
                          * 0.1)
        toks = jnp.asarray(rng.integers(0, 5000, (2, 12)), jnp.int32)
        m = np.asarray(cross_attention_alignment(tiny_params, toks, enc, TINY))
        assert m.shape == (2, 12, 1500)
        assert np.isfinite(m).all()


class TestTextEncoder:
    """WhisperTextEncoder: text -> ids for initial_prompt / custom-vocabulary
    conditioning (reference engine: faster-whisper initial_prompt+hotwords)."""

    @staticmethod
    def _mini_bpe(tmp_path):
        import json
        # byte-level pieces for " hello": merges build Ġhello bottom-up
        vocab = {"Ġ": 0, "h": 1, "e": 2, "l": 3, "o": 4, "he": 5,
                 "ll": 6, "hell": 7, "hello": 8, "Ġhello": 9}
        merges = ["#version: 0.2", "h e", "l l", "he ll", "hell o",
                  "Ġ hello"]
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text("\n".join(merges) + "\n")
        return vocab

    def test_bpe_with_merges(self, tmp_path):
        from eioku_tpu.models.whisper.tokenizer import WhisperTextEncoder

        self._mini_bpe(tmp_path)
        enc = WhisperTextEncoder.from_cache_dir(str(tmp_path))
        assert enc.encode(" hello") == [9]
        assert enc.encode(" hello hello") == [9, 9]
        # partial merges: "hell" exists, trailing chars fall out separately
        assert enc.encode("hello") == [8]

    def test_matches_transformers_gpt2(self, tmp_path):
        """Exact parity with the HF slow GPT2 tokenizer on the same files."""
        pytest.importorskip("transformers")
        from transformers import GPT2Tokenizer

        from eioku_tpu.models.whisper.tokenizer import WhisperTextEncoder

        self._mini_bpe(tmp_path)
        ours = WhisperTextEncoder.from_cache_dir(str(tmp_path))
        hf = GPT2Tokenizer(str(tmp_path / "vocab.json"),
                           str(tmp_path / "merges.txt"))
        for text in (" hello", " hello hello", "hello", " hellohello"):
            assert ours.encode(text) == hf.encode(text), text

    def test_greedy_fallback_without_merges(self, tmp_path):
        import json

        from eioku_tpu.models.whisper.tokenizer import WhisperTextEncoder

        (tmp_path / "vocab.json").write_text(json.dumps(
            {"Ġhello": 9, "hel": 7, "lo": 6, "l": 3, "o": 4}))
        enc = WhisperTextEncoder.from_cache_dir(str(tmp_path))
        assert enc.encode(" hello") == [9]
        assert enc.encode("hello") == [7, 6]  # longest-match segmentation

    def test_no_vocab_returns_empty(self, tmp_path):
        from eioku_tpu.models.whisper.tokenizer import WhisperTextEncoder

        assert WhisperTextEncoder.from_cache_dir(str(tmp_path)).encode("x") == []
        assert WhisperTextEncoder.from_cache_dir(None).encode("x") == []


class TestCustomVocabularyPrompt:
    def test_prompt_rides_as_sot_prev_context(self, tmp_path, monkeypatch):
        """custom_vocabulary terms must reach the decoder as a [sot_prev]+ids
        prefix with sot_index pointing at the SOT sequence (spec req 5.6)."""
        import json
        import wave

        from eioku_tpu.ml import transcribe
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
        )
        from eioku_tpu.models.whisper.tokenizer import WhisperTokens

        sr = 16000
        t = np.arange(sr * 2) / sr
        x = (np.sin(2 * np.pi * 250 * t) * 0.4 * 32767).astype(np.int16)
        wav = tmp_path / "clip.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        vocab = {"Ġkubernetes": 101, "Ġeioku": 102, ",": 103}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        monkeypatch.setattr(transcribe, "_load_model",
                            lambda *a, **kw: (params, cfg, True))
        captured = {}
        real = transcribe.whisper_decode_windows

        def spy(params_, enc, init, *a, **kw):
            captured["init"] = np.asarray(init)[0].tolist()
            captured["sot_index"] = kw.get("sot_index", 0)
            return real(params_, enc, init, *a, **kw)

        monkeypatch.setattr(transcribe, "whisper_decode_windows", spy)
        transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "max_tokens": 8,
                       "batch_size": 1, "beam_size": 1, "language": "en",
                       "custom_vocabulary": ["kubernetes", "eioku"],
                       "no_speech_threshold": 2.0},
            model_cache_dir=str(tmp_path))
        tk = WhisperTokens(cfg.vocab_size)
        init = captured["init"]
        assert init[0] == tk.sot_prev
        assert 101 in init and 102 in init
        assert captured["sot_index"] == init.index(tk.sot)
        assert captured["sot_index"] >= 3  # sot_prev + 2+ prompt tokens

    def test_no_vocab_disables_prompt(self, tmp_path, monkeypatch):
        """Without vocab.json the prompt silently disables (placeholder
        decoding environments) instead of emitting junk ids."""
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
        monkeypatch.setattr(transcribe, "_load_model",
                            lambda *a, **kw: (params, cfg, True))
        out = transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "max_tokens": 8,
                       "batch_size": 1, "beam_size": 1, "language": "en",
                       "initial_prompt": "eioku",
                       "no_speech_threshold": 2.0},
            model_cache_dir=str(tmp_path))
        assert isinstance(out, list)  # ran the plain-prompt path


class TestMergesAndConditionedPrompt:
    def test_merges_with_hash_pieces(self, tmp_path):
        """Only the #version header is a comment; '#'-piece merges are real
        (hashtag tokens in the GPT2/Whisper vocab)."""
        import json

        from eioku_tpu.models.whisper.tokenizer import WhisperTextEncoder

        pytest.importorskip("transformers")
        from transformers import GPT2Tokenizer

        vocab = {"#": 0, "k": 1, "##": 2, "###": 3}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\n# #\n## #\n")
        enc = WhisperTextEncoder.from_cache_dir(str(tmp_path))
        assert enc.ranks is not None and len(enc.ranks) == 2  # '#' merges kept
        assert enc.encode("###") == [3]
        hf = GPT2Tokenizer(str(tmp_path / "vocab.json"),
                           str(tmp_path / "merges.txt"))
        for text in ("###", "##", "#k#"):
            assert enc.encode(text) == hf.encode(text), text

    @pytest.mark.slow
    def test_conditioned_mode_keeps_short_initial_prompt(self, tmp_path,
                                                         monkeypatch):
        """A custom vocabulary shorter than the smallest context bucket must
        still reach window 0's prompt in condition_on_previous_text mode."""
        import json
        import wave

        from eioku_tpu.ml import transcribe
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
        )
        from eioku_tpu.models.whisper.tokenizer import WhisperTokens

        sr = 16000
        x = (np.sin(2 * np.pi * 250 * np.arange(sr * 2) / sr) * 0.4
             * 32767).astype(np.int16)
        wav = tmp_path / "c.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        (tmp_path / "vocab.json").write_text(json.dumps(
            {"Ġkubernetes": 101, ",": 102}))
        cfg = WhisperConfig("tiny")
        params = init_whisper_params(cfg, seed=0)
        monkeypatch.setattr(transcribe, "_load_model",
                            lambda *a, **kw: (params, cfg, True))
        prompts = []
        real = transcribe.whisper_decode_windows

        def spy(params_, enc, init, *a, **kw):
            prompts.append(np.asarray(init)[0].tolist())
            return real(params_, enc, init, *a, **kw)

        monkeypatch.setattr(transcribe, "whisper_decode_windows", spy)
        transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "max_tokens": 8,
                       "batch_size": 1, "beam_size": 1, "language": "en",
                       "condition_on_previous_text": True,
                       "custom_vocabulary": ["kubernetes"],
                       "no_speech_threshold": 2.0},
            model_cache_dir=str(tmp_path))
        tk = WhisperTokens(cfg.vocab_size)
        assert prompts and prompts[0][0] == tk.sot_prev
        assert 101 in prompts[0]


class TestSpeculativeDecoding:
    """speculative_greedy_decode must produce EXACTLY the target model's own
    greedy decode — the draft only changes how fast we get there."""

    def _setup(self, t_seed, d_seed, batch=3, ctx=100):
        from eioku_tpu.models.whisper.mel import log_mel_spectrogram
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
            whisper_encode,
        )
        from eioku_tpu.models.whisper.tokenizer import WhisperTokens

        cfg = WhisperConfig("tiny")
        tp = init_whisper_params(cfg, seed=t_seed)
        dp = init_whisper_params(cfg, seed=d_seed)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((batch, 2 * 16000)) * 0.1,
                          jnp.float32)
        mel = log_mel_spectrogram(wav, n_mels=cfg.n_mels)[:, :, :2 * ctx]
        t_enc = whisper_encode(tp, mel, cfg)
        d_enc = whisper_encode(dp, mel, cfg)
        tokens = WhisperTokens(cfg.vocab_size)
        sot = jnp.asarray([tokens.sot_sequence("en", timestamps=False)] * batch,
                          jnp.int32)
        return cfg, tp, dp, t_enc, d_enc, sot, tokens

    def _reference_greedy(self, cfg, tp, t_enc, sot, sup_a, sup_b, max_len):
        from eioku_tpu.models.whisper.decoding import whisper_decode_windows

        out, _, _ = whisper_decode_windows(
            tp, t_enc, sot, sup_a, sup_b, cfg, max_len=max_len, beam_size=1,
            timestamps=False)
        return np.asarray(out)

    @pytest.mark.parametrize("d_seed", [0, 7])  # perfect + adversarial draft
    def test_exact_greedy_equivalence(self, d_seed):
        from eioku_tpu.models.whisper.decoding import build_suppress_masks
        from eioku_tpu.models.whisper.speculative import (
            speculative_greedy_decode,
        )

        cfg, tp, dp, t_enc, d_enc, sot, tokens = self._setup(0, d_seed)
        sup_a, sup_b = build_suppress_masks(tokens, timestamps=False)
        max_len = 24
        ref = self._reference_greedy(cfg, tp, t_enc, sot, sup_a, sup_b,
                                     max_len)
        out, rate = speculative_greedy_decode(
            tp, cfg, dp, cfg, t_enc, d_enc, sot, sup_a, sup_b,
            max_len=max_len, gamma=3)
        np.testing.assert_array_equal(np.asarray(out), ref)
        if d_seed == 0:  # draft == target: (almost) everything accepted
            assert float(rate) > 0.9

    def test_accept_rate_bounded(self):
        from eioku_tpu.models.whisper.decoding import build_suppress_masks
        from eioku_tpu.models.whisper.speculative import (
            speculative_greedy_decode,
        )

        cfg, tp, dp, t_enc, d_enc, sot, tokens = self._setup(0, 99)
        sup_a, sup_b = build_suppress_masks(tokens, timestamps=False)
        _, rate = speculative_greedy_decode(
            tp, cfg, dp, cfg, t_enc, d_enc, sot, sup_a, sup_b,
            max_len=16, gamma=4)
        assert 0.0 <= float(rate) <= 1.0


class TestSpeculativeInPipeline:
    def test_run_transcription_with_draft_model(self, tmp_path, monkeypatch):
        """draft_model config routes the batched path through speculative
        decoding (greedy, no timestamps) and still emits valid segments."""
        import json
        import wave

        from eioku_tpu.ml import transcribe
        from eioku_tpu.models.whisper.model import (
            WhisperConfig,
            init_whisper_params,
        )

        sr = 16000
        x = (np.sin(2 * np.pi * 250 * np.arange(sr * 2) / sr) * 0.4
             * 32767).astype(np.int16)
        wav = tmp_path / "c.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())
        vocab = {f"Ġw{i}": i for i in range(50257)}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        cfg = WhisperConfig("tiny")
        target = init_whisper_params(cfg, seed=0)
        draft = init_whisper_params(cfg, seed=1)

        def fake_load(variant, *a, **kw):
            return (draft if variant == "base" else target), cfg, True

        monkeypatch.setattr(transcribe, "_load_model", fake_load)
        called = {}
        import eioku_tpu.models.whisper.speculative as spec
        real = spec.speculative_greedy_decode

        def spy(*a, **kw):
            called["yes"] = True
            return real(*a, **kw)

        monkeypatch.setattr(spec, "speculative_greedy_decode", spy)
        results = transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "draft_model": "base",
                       "max_tokens": 12, "batch_size": 1, "beam_size": 1,
                       "timestamps": False, "language": "en",
                       "no_speech_threshold": 2.0,
                       "logprob_threshold": -1e9, "temperatures": []},
            model_cache_dir=str(tmp_path))
        assert called.get("yes")
        for r in results:
            p = r["payload"]
            assert p["text"] and p["end_ms"] >= p["start_ms"]

    def test_beam_config_falls_back_to_standard(self, tmp_path, monkeypatch):
        """draft_model with beam_size>1 must warn and use the beam path."""
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
        monkeypatch.setattr(transcribe, "_load_model",
                            lambda *a, **kw: (params, cfg, True))
        import eioku_tpu.models.whisper.speculative as spec

        def boom(*a, **kw):
            raise AssertionError("speculative path must not run")

        monkeypatch.setattr(spec, "speculative_greedy_decode", boom)
        out = transcribe.run_transcription(
            str(wav), {"model": "whisper-tiny", "draft_model": "base",
                       "max_tokens": 8, "batch_size": 1, "beam_size": 2,
                       "timestamps": False, "language": "en",
                       "no_speech_threshold": 2.0, "temperatures": []},
            model_cache_dir=str(tmp_path))
        assert isinstance(out, list)
