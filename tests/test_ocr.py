"""OCR family tests: CRAFT shapes, box extraction, CRNN + CTC, converters,
pipeline E2E."""
import numpy as np
import pytest

import jax.numpy as jnp

from eioku_tpu.ml.ocr_task import extract_boxes, recognize_crops
from eioku_tpu.models.ocr.craft import craft_forward, init_craft_params
from eioku_tpu.models.ocr.crnn import (
    LATIN_CHARSET,
    charset_size,
    convert_easyocr_recognizer,
    crnn_forward,
    ctc_greedy_decode,
    init_crnn_params,
)


class TestCraft:
    @pytest.fixture(scope="class")
    def params(self):
        return init_craft_params(seed=0)

    def test_forward_shape(self, params):
        x = jnp.zeros((1, 96, 160, 3))
        out = craft_forward(params, x)
        assert out.shape == (1, 48, 80, 2)

    def test_param_count(self, params):
        from eioku_tpu.models.layers import param_count
        n = param_count(params)
        # public CRAFT is ~20.8M params
        assert 19e6 < n < 22e6, n


class TestBoxExtraction:
    def test_finds_separate_regions(self):
        region = np.zeros((48, 80), np.float32)
        affinity = np.zeros_like(region)
        region[10:14, 5:25] = 0.9
        region[30:34, 40:60] = 0.8
        boxes = extract_boxes(region, affinity)
        assert len(boxes) == 2
        assert (5, 10, 25, 14) in boxes

    def test_affinity_links_regions(self):
        region = np.zeros((48, 80), np.float32)
        affinity = np.zeros_like(region)
        region[10:14, 5:15] = 0.9
        region[10:14, 20:30] = 0.9
        affinity[10:14, 14:21] = 0.6  # link between the two words
        boxes = extract_boxes(region, affinity)
        assert len(boxes) == 1
        assert boxes[0] == (5, 10, 30, 14)

    def test_low_confidence_dropped(self):
        region = np.full((48, 80), 0.0, np.float32)
        region[10:20, 10:20] = 0.5  # above low_text, below text_threshold
        assert extract_boxes(region, np.zeros_like(region)) == []

    def test_tiny_blobs_dropped(self):
        region = np.zeros((48, 80), np.float32)
        region[5, 5] = 0.99
        assert extract_boxes(region, np.zeros_like(region)) == []


class TestCrnn:
    @pytest.fixture(scope="class")
    def params(self):
        return init_crnn_params(seed=0)

    def test_forward_shape(self, params):
        x = jnp.zeros((2, 32, 128, 1))
        logits = crnn_forward(params, x)
        assert logits.shape[0] == 2
        assert logits.shape[2] == charset_size()
        assert logits.shape[1] >= 128 // 4 - 2  # ~W/4 time steps

    def test_ctc_greedy_collapse(self):
        # sequence: blank, 'a', 'a', blank, 'b' -> "ab"
        n = charset_size()
        a = LATIN_CHARSET.index("a") + 1
        b = LATIN_CHARSET.index("b") + 1
        logits = np.full((1, 5, n), -10.0, np.float32)
        for t, cls in enumerate([0, a, a, 0, b]):
            logits[0, t, cls] = 10.0
        [(text, conf)] = ctc_greedy_decode(logits)
        assert text == "ab"
        assert conf > 0.9

    def test_ctc_all_blank(self):
        logits = np.full((1, 5, charset_size()), -10.0, np.float32)
        logits[:, :, 0] = 10.0
        [(text, conf)] = ctc_greedy_decode(logits)
        assert text == "" and conf == 0.0

    def test_recognize_crops_buckets(self, params):
        crops = [np.random.default_rng(0).integers(0, 255, (32, w), np.uint8)
                 for w in (20, 100, 500)]
        out = recognize_crops(params, crops)
        assert len(out) == 3
        assert all(isinstance(t, str) for t, _ in out)

    def test_easyocr_converter_structural(self):
        rng = np.random.default_rng(0)

        def w(*s):
            return rng.standard_normal(s).astype(np.float32) * 0.05

        n_cls = charset_size()
        sd = {}
        conv_plan = [("0", 64, 1, 3), ("3", 128, 64, 3), ("6", 256, 128, 3),
                     ("8", 256, 256, 3), ("11", 512, 256, 3),
                     ("14", 512, 512, 3), ("18", 512, 512, 2)]
        for idx, c_out, c_in, k in conv_plan:
            sd[f"FeatureExtraction.ConvNet.{idx}.weight"] = w(c_out, c_in, k, k)
            if idx not in ("11", "14"):
                sd[f"FeatureExtraction.ConvNet.{idx}.bias"] = w(c_out)
        for idx, ch in (("12", 512), ("15", 512)):
            sd[f"FeatureExtraction.ConvNet.{idx}.weight"] = np.ones(ch, np.float32)
            sd[f"FeatureExtraction.ConvNet.{idx}.bias"] = np.zeros(ch, np.float32)
            sd[f"FeatureExtraction.ConvNet.{idx}.running_mean"] = np.zeros(
                ch, np.float32)
            sd[f"FeatureExtraction.ConvNet.{idx}.running_var"] = np.ones(
                ch, np.float32)
        for li, d_in in ((0, 512), (1, 256)):
            for sfx in ("", "_reverse"):
                sd[f"SequenceModeling.{li}.rnn.weight_ih_l0{sfx}"] = w(1024, d_in)
                sd[f"SequenceModeling.{li}.rnn.weight_hh_l0{sfx}"] = w(1024, 256)
                sd[f"SequenceModeling.{li}.rnn.bias_ih_l0{sfx}"] = w(1024)
                sd[f"SequenceModeling.{li}.rnn.bias_hh_l0{sfx}"] = w(1024)
            sd[f"SequenceModeling.{li}.linear.weight"] = w(256, 512)
            sd[f"SequenceModeling.{li}.linear.bias"] = w(256)
        sd["Prediction.weight"] = w(n_cls, 256)
        sd["Prediction.bias"] = w(n_cls)
        params = convert_easyocr_recognizer(sd)
        np.testing.assert_allclose(
            np.asarray(params["lstm1_fw"]["wi"]),
            sd["SequenceModeling.0.rnn.weight_ih_l0"].T)
        logits = crnn_forward(params, jnp.zeros((1, 32, 64, 1)))
        assert logits.shape[-1] == n_cls

    def test_lstm_matches_torch(self):
        """Our lax.scan LSTM vs torch.nn.LSTM, same weights."""
        torch = pytest.importorskip("torch")
        from eioku_tpu.models.ocr.crnn import _lstm_scan

        torch.manual_seed(0)
        d_in, d_h, t, b = 8, 6, 5, 2
        ref = torch.nn.LSTM(d_in, d_h, batch_first=True)
        x = torch.randn(b, t, d_in)
        with torch.no_grad():
            out_t, _ = ref(x)
        p = {"wi": jnp.asarray(ref.weight_ih_l0.detach().numpy().T),
             "wh": jnp.asarray(ref.weight_hh_l0.detach().numpy().T),
             "bi": jnp.asarray(ref.bias_ih_l0.detach().numpy()),
             "bh": jnp.asarray(ref.bias_hh_l0.detach().numpy())}
        ours = np.asarray(_lstm_scan(jnp.asarray(x.numpy()), p))
        np.testing.assert_allclose(ours, out_t.numpy(), atol=1e-5)


class TestOcrPipelineE2E:
    def test_runs_on_video(self, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video
        from eioku_tpu.ml.ocr_task import run_ocr
        from eioku_tpu.domain.schema_registry import SchemaRegistry, register_all_schemas

        register_all_schemas()
        path = str(tmp_path / "o.mp4")
        write_video(path, [(6, (255, 255, 255))], fps=3, size=(128, 96))
        results = run_ocr(path, {"frame_interval_s": 1.0, "batch_size": 2})
        # random weights: results may be empty; payloads must validate if present
        for r in results[:10]:
            SchemaRegistry.validate("ocr.text", 1, r["payload"])
        assert isinstance(results, list)


class TestLanguageRecognizers:
    """Per-language recognizer selection (reference: easyocr.Reader per task
    language, model_manager.py:469-558)."""

    def test_language_to_model_mapping(self):
        from eioku_tpu.models.ocr.weights import recognizer_for_language
        assert recognizer_for_language("ja") == "japanese_g2"
        assert recognizer_for_language("ko") == "korean_g2"
        assert recognizer_for_language("ru") == "cyrillic_g2"
        assert recognizer_for_language("en") == "latin_g2"
        assert recognizer_for_language("fr") == "latin_g2"
        assert recognizer_for_language("xx") == "latin_g2"

    def test_charset_sidecar_one_char_per_line(self, tmp_path):
        from eioku_tpu.models.ocr.weights import _load_charset
        (tmp_path / "japanese_g2_chars.txt").write_text(
            "あ\nい\nう\n", encoding="utf-8")
        assert _load_charset(str(tmp_path), "japanese_g2") == "あいう"

    def test_charset_sidecar_single_string(self, tmp_path):
        from eioku_tpu.models.ocr.weights import _load_charset
        (tmp_path / "latin_g2_chars.txt").write_text("abc def\n",
                                                     encoding="utf-8")
        assert _load_charset(str(tmp_path), "latin_g2") == "abc def"

    def test_missing_non_latin_falls_back_to_latin(self, tmp_path):
        from eioku_tpu.models.ocr.crnn import LATIN_CHARSET
        from eioku_tpu.models.ocr.weights import load_ocr_checkpoints
        craft, crnn, charset, pretrained = load_ocr_checkpoints(
            str(tmp_path), "japanese_g2")
        assert charset == LATIN_CHARSET
        assert pretrained is False

    def test_ctc_decode_with_custom_charset(self):
        from eioku_tpu.models.ocr.crnn import ctc_greedy_decode
        charset = "あいう"
        logits = np.full((1, 4, 4), -10.0, np.float32)
        logits[0, 0, 1] = 10.0  # あ
        logits[0, 1, 0] = 10.0  # blank
        logits[0, 2, 3] = 10.0  # う
        logits[0, 3, 3] = 10.0  # repeat collapsed
        [(text, conf)] = ctc_greedy_decode(logits, charset)
        assert text == "あう"
        assert conf > 0.9


class TestRotatedQuads:
    """Rotated-text handling: minAreaRect quads + perspective rectification
    (EasyOCR's slanted-text path; reference model_manager.py:469-558)."""

    def test_axis_aligned_component_gives_rect_quad(self):
        from eioku_tpu.ml.ocr_task import extract_quads
        region = np.zeros((64, 64), np.float32)
        region[10:20, 10:40] = 0.9
        affinity = np.zeros_like(region)
        quads = extract_quads(region, affinity)
        assert len(quads) == 1
        (bbox, quad) = quads[0]
        assert bbox == (10, 10, 40, 20)
        xs = sorted(set(np.round(quad[:, 0]).astype(int)))
        assert xs[0] >= 9 and xs[-1] <= 40

    def test_rotated_component_quad_tracks_angle(self):
        from eioku_tpu.ml.ocr_task import extract_quads
        import cv2 as _cv2
        region = np.zeros((96, 96), np.float32)
        # a 60x10 bar rotated 20 degrees
        canvas = np.zeros((96, 96), np.uint8)
        rect = ((48, 48), (60, 10), 20.0)
        pts = _cv2.boxPoints(rect).astype(np.int32)
        _cv2.fillPoly(canvas, [pts], 1)
        region[canvas > 0] = 0.9
        quads = extract_quads(region, np.zeros_like(region))
        assert len(quads) == 1
        (_, quad) = quads[0]
        (_, (w, h), angle) = _cv2.minAreaRect(quad.astype(np.int32))
        long_side, short_side = max(w, h), min(w, h)
        assert 50 <= long_side <= 70 and short_side <= 16
        # the fitted angle matches the synthetic rotation modulo 90
        assert min(abs(angle - 20), abs(angle - 110), abs(angle + 70)) < 6

    def test_warp_quad_crop_rectifies(self):
        from eioku_tpu.ml.ocr_task import warp_quad_crop
        import cv2 as _cv2
        gray = np.zeros((96, 96), np.uint8)
        rect = ((48, 48), (60, 12), 25.0)
        pts = _cv2.boxPoints(rect).astype(np.int32)
        _cv2.fillPoly(gray, [pts], 255)
        quad = _cv2.boxPoints(rect)
        crop = warp_quad_crop(gray, quad)
        assert crop is not None
        h, w = crop.shape
        assert w > h  # long side is horizontal after rectification
        assert crop.mean() > 180  # mostly the filled bar

    def test_warp_skips_axis_aligned(self):
        from eioku_tpu.ml.ocr_task import warp_quad_crop
        gray = np.zeros((32, 64), np.uint8)
        quad = np.array([[5, 5], [50, 5], [50, 20], [5, 20]], np.float32)
        assert warp_quad_crop(gray, quad) is None
