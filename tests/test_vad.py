"""Model-based VAD: shapes, converter round-trip + torch parity, and
band-discrimination with handcrafted weights.

Reference behavior being rebuilt: faster-whisper's Silero vad_filter
(/root/reference/ml-service/src/services/model_manager.py:437-444).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from eioku_tpu.models.vad.model import (
    VadConfig,
    dft_basis,
    init_vad_params,
    vad_activity,
    vad_probs,
)
from eioku_tpu.models.vad.weights import (
    convert_silero_state_dict,
    export_silero_state_dict,
)

CFG = VadConfig()


def _tone(freq: float, seconds: float, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(CFG.sr * seconds)) / CFG.sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestModel:
    def test_shapes_range_determinism(self):
        params = init_vad_params(CFG, seed=0)
        audio = jnp.asarray(np.random.default_rng(0)
                            .standard_normal((2, CFG.sr)).astype(np.float32))
        p1 = np.asarray(vad_probs(params, audio, CFG))
        p2 = np.asarray(vad_probs(params, audio, CFG))
        assert p1.shape == (2, CFG.sr // CFG.chunk + (CFG.sr % CFG.chunk > 0))
        assert (p1 >= 0).all() and (p1 <= 1).all()
        np.testing.assert_array_equal(p1, p2)

    def test_single_waveform_promoted(self):
        params = init_vad_params(CFG, seed=0)
        p = np.asarray(vad_probs(params, jnp.zeros(CFG.chunk * 3), CFG))
        assert p.shape == (1, 3)

    def test_activity_interface_matches_energy_vad_granularity(self):
        from eioku_tpu.ml.audio_io import VAD_FRAME_MS, energy_vad

        params = init_vad_params(CFG, seed=0)
        audio = _tone(300, 1.0)
        act = vad_activity(params, audio, CFG, frame_ms=VAD_FRAME_MS)
        ref = energy_vad(audio)
        assert act.shape == ref.shape and act.dtype == np.bool_

    def test_length_bucketing_shares_compiles(self):
        """Distinct durations inside one 30 s bucket must hit one jitted
        shape (tunnel compiles are 10-600 s each), and the zero-padded tail
        must not change the kept chunks."""
        params = init_vad_params(CFG, seed=0)
        a1 = vad_activity(params, _tone(300, 1.0), CFG)  # compile the bucket
        n0 = vad_probs._cache_size()
        vad_activity(params, _tone(300, 7.3), CFG)
        vad_activity(params, _tone(300, 29.0), CFG)
        assert vad_probs._cache_size() == n0  # same bucket: no new compiles
        # longer audio with the same prefix: prefix activity unchanged
        a2 = vad_activity(params, _tone(300, 12.0), CFG)
        np.testing.assert_array_equal(a2[:len(a1)], a1)


class TestConverter:
    def test_roundtrip(self):
        params = init_vad_params(CFG, seed=1)
        back = convert_silero_state_dict(export_silero_state_dict(params), CFG)
        audio = jnp.asarray(np.random.default_rng(1)
                            .standard_normal((1, CFG.chunk * 8))
                            .astype(np.float32))
        np.testing.assert_allclose(np.asarray(vad_probs(params, audio, CFG)),
                                   np.asarray(vad_probs(back, audio, CFG)),
                                   atol=1e-6)

    def test_torch_parity(self):
        """A torch replica of the Silero-style graph (torch conv1d + LSTMCell
        with the jit export's tensor names) produces the same probabilities
        after conversion — validates every transpose in the converter."""
        torch = pytest.importorskip("torch")

        bins = CFG.n_bins
        rng = np.random.default_rng(2)
        sd = {"_model.stft.forward_basis_buffer":
              torch.tensor(dft_basis(CFG.n_fft)[:, None, :])}
        c_in = bins
        for i, c_out in enumerate(CFG.channels):
            sd[f"_model.encoder.{i}.reparam_conv.weight"] = torch.tensor(
                rng.standard_normal((c_out, c_in, 3)).astype(np.float32) * 0.2)
            sd[f"_model.encoder.{i}.reparam_conv.bias"] = torch.tensor(
                rng.standard_normal(c_out).astype(np.float32) * 0.1)
            c_in = c_out
        h, d = CFG.hidden, CFG.channels[-1]
        for name, shape in (("weight_ih", (4 * h, d)), ("weight_hh", (4 * h, h)),
                            ("bias_ih", (4 * h,)), ("bias_hh", (4 * h,))):
            sd[f"_model.decoder.rnn.{name}"] = torch.tensor(
                rng.standard_normal(shape).astype(np.float32) * 0.2)
        sd["_model.decoder.decoder.2.weight"] = torch.tensor(
            rng.standard_normal((1, h, 1)).astype(np.float32))
        sd["_model.decoder.decoder.2.bias"] = torch.tensor(
            rng.standard_normal(1).astype(np.float32))

        audio_np = rng.standard_normal((1, CFG.chunk * 6)).astype(np.float32)

        # torch forward mirroring model.py
        def torch_forward(audio):
            x = torch.tensor(audio)
            b, s = x.shape
            basis = sd["_model.stft.forward_basis_buffer"][:, 0, :]
            pad = CFG.n_fft - CFG.hop
            xp = torch.nn.functional.pad(x, (0, pad))
            t = s // CFG.hop
            frames = torch.stack(
                [xp[:, i * CFG.hop:i * CFG.hop + CFG.n_fft] for i in range(t)],
                dim=1)
            spec = torch.einsum("btn,fn->btf", frames, basis)
            re, im = spec.split(bins, dim=-1)
            feats = torch.sqrt(re * re + im * im + 1e-9)
            y = feats.transpose(1, 2)  # NCL for torch conv1d
            for i in range(len(CFG.channels)):
                y = torch.nn.functional.conv1d(
                    y, sd[f"_model.encoder.{i}.reparam_conv.weight"],
                    sd[f"_model.encoder.{i}.reparam_conv.bias"], padding=1)
                y = torch.relu(y)
            y = y.transpose(1, 2)  # [B, T, C]
            n_chunks = s // CFG.chunk
            y = y.reshape(b, n_chunks, CFG.frames_per_chunk, y.shape[-1]).mean(2)
            cell = torch.nn.LSTMCell(d, h)
            cell.weight_ih.data = sd["_model.decoder.rnn.weight_ih"]
            cell.weight_hh.data = sd["_model.decoder.rnn.weight_hh"]
            cell.bias_ih.data = sd["_model.decoder.rnn.bias_ih"]
            cell.bias_hh.data = sd["_model.decoder.rnn.bias_hh"]
            hx = (torch.zeros(b, h), torch.zeros(b, h))
            outs = []
            for i in range(n_chunks):
                h_t, c_t = cell(y[:, i], hx)
                outs.append(h_t)
                hx = (h_t, c_t)
            hs = torch.stack(outs, dim=1)
            w = sd["_model.decoder.decoder.2.weight"][:, :, 0]
            logits = hs @ w.T + sd["_model.decoder.decoder.2.bias"]
            return torch.sigmoid(logits[..., 0])

        with torch.no_grad():
            expect = torch_forward(audio_np).numpy()
        params = convert_silero_state_dict(
            {k: v.numpy() for k, v in sd.items()}, CFG)
        got = np.asarray(vad_probs(params, jnp.asarray(audio_np), CFG))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


class TestDiscrimination:
    def _handcrafted(self):
        """Weights that implement a low-band energy detector through the full
        graph: encoder passes the sub-4 kHz bins, the LSTM input gate is
        saturated open, g reads low-band energy, and the head thresholds h."""
        params = init_vad_params(CFG, seed=0)
        zero = lambda a: jnp.zeros_like(a)
        enc = []
        c_in = CFG.n_bins
        for c_out in CFG.channels:
            w = np.zeros((3, c_in, c_out), np.float32)
            for j in range(min(c_in, c_out, 64)):
                w[1, j, j] = 1.0  # center-tap identity on the low channels
            enc.append({"w": jnp.asarray(w), "b": jnp.zeros(c_out)})
            c_in = c_out
        params["encoder"] = enc
        h, d = CFG.hidden, CFG.channels[-1]
        w_ih = np.zeros((4 * h, d), np.float32)
        w_ih[2 * h, :64] = 0.05  # g gate row 0 sums low-band magnitude
        b_ih = np.zeros(4 * h, np.float32)
        b_ih[0:h] = 10.0        # i ~ 1
        b_ih[h:2 * h] = -10.0   # f ~ 0
        b_ih[3 * h:] = 10.0     # o ~ 1
        params["lstm"] = {"w_ih": jnp.asarray(w_ih),
                          "w_hh": zero(params["lstm"]["w_hh"]),
                          "b_ih": jnp.asarray(b_ih),
                          "b_hh": zero(params["lstm"]["b_hh"])}
        w_out = np.zeros((h, 1), np.float32)
        w_out[0, 0] = 8.0
        params["out"] = {"w": jnp.asarray(w_out),
                         "b": jnp.asarray(np.full(1, -2.0, np.float32))}
        return params

    def test_low_band_speech_vs_high_hiss(self):
        params = self._handcrafted()
        speech = _tone(300, 1.0) * (0.6 + 0.4 * np.sin(
            2 * np.pi * 4 * np.arange(CFG.sr) / CFG.sr)).astype(np.float32)
        hiss = _tone(7000, 1.0)
        p_speech = float(np.asarray(
            vad_probs(params, jnp.asarray(speech)[None], CFG)).mean())
        p_hiss = float(np.asarray(
            vad_probs(params, jnp.asarray(hiss)[None], CFG)).mean())
        assert p_speech > p_hiss + 0.2, (p_speech, p_hiss)
        assert p_speech > 0.5 and p_hiss < 0.3

    def test_split_windows_uses_model_vad_when_checkpoint_cached(self, tmp_path):
        """With a silero checkpoint in the model cache, transcription
        windowing gates on the MODEL's verdict: a high-frequency hiss window
        (loud enough that the energy VAD keeps it) is dropped."""
        torch = pytest.importorskip("torch")

        from eioku_tpu.ml.audio_io import split_windows
        from eioku_tpu.models.vad.weights import CHECKPOINT_NAME

        sd = {k: torch.tensor(v) for k, v in
              export_silero_state_dict(self._handcrafted()).items()}
        torch.save(sd, str(tmp_path / CHECKPOINT_NAME))

        hiss = _tone(7000, 31.0)  # one full 30 s window of pure hiss
        with_energy = split_windows(hiss, vad=True)
        with_model = split_windows(hiss, vad=True,
                                   model_cache_dir=str(tmp_path))
        assert len(with_energy) >= 1  # loud hiss passes the energy gate
        assert len(with_model) == 0   # ...but not the model's speech gate

        speech = _tone(300, 31.0) * (0.6 + 0.4 * np.sin(
            2 * np.pi * 4 * np.arange(31 * CFG.sr) / CFG.sr)).astype(np.float32)
        assert len(split_windows(speech, vad=True,
                                 model_cache_dir=str(tmp_path))) >= 1
