"""YOLOv8 model family tests: shapes, decode, NMS, converter round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eioku_tpu.models.yolo.model import (
    YoloConfig,
    anchor_points,
    count_anchors,
    fold_batchnorm,
    init_yolo_params,
    yolo_forward,
)
from eioku_tpu.models.yolo.postprocess import (
    _iou_matrix,
    decode_boxes,
    detect,
    nms_fixed,
)
from eioku_tpu.models.yolo.weights import (
    convert_ultralytics_state_dict,
    export_ultralytics_state_dict,
)


@pytest.fixture(scope="module")
def nano():
    cfg = YoloConfig("yolov8n", num_classes=80)
    return cfg, init_yolo_params(cfg, seed=0)


class TestArchitecture:
    def test_forward_shapes(self, nano):
        cfg, params = nano
        x = jnp.zeros((2, 192, 320, 3), jnp.float32)
        box, cls = jax.jit(yolo_forward, static_argnames="cfg")(params, x, cfg)
        a = count_anchors(192, 320, cfg.strides)
        assert box.shape == (2, a, 64)
        assert cls.shape == (2, a, 80)

    def test_param_count_nano(self, nano):
        from eioku_tpu.models.layers import param_count
        cfg, params = nano
        n = param_count(params)
        # ultralytics yolov8n is ~3.2M params; ours should be in that ballpark
        assert 2.5e6 < n < 4.0e6, n

    def test_fold_batchnorm_parity(self, nano):
        # folded conv+bias must match conv->BN->SiLU to fp32 rounding; the
        # folded tree must carry no bn leaves (all affines absorbed)
        cfg, params = nano
        # non-trivial BN stats so the fold actually moves numbers
        rng = np.random.default_rng(3)

        def perturb(p):
            if isinstance(p, dict):
                out = {}
                for k, v in p.items():
                    if k == "bn":
                        n = v["gamma"].shape[0]
                        out[k] = {
                            "gamma": jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32),
                            "beta": jnp.asarray(rng.normal(0, 0.1, n), jnp.float32),
                            "mean": jnp.asarray(rng.normal(0, 0.1, n), jnp.float32),
                            "var": jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32),
                        }
                    else:
                        out[k] = perturb(v)
                return out
            if isinstance(p, list):
                return [perturb(v) for v in p]
            return p

        params = perturb(params)
        folded = fold_batchnorm(params)
        leaves = jax.tree_util.tree_leaves_with_path(folded)
        assert not any("bn" in str(path) for path, _ in leaves)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        b0, c0 = yolo_forward(params, x, cfg)
        b1, c1 = yolo_forward(folded, x, cfg)
        np.testing.assert_allclose(np.asarray(b0), np.asarray(b1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                                   rtol=1e-4, atol=1e-4)

    def test_face_variant_single_class(self):
        cfg = YoloConfig("yolov8n", num_classes=1)
        params = init_yolo_params(cfg, seed=1)
        x = jnp.zeros((1, 64, 64, 3))
        _, cls = yolo_forward(params, x, cfg)
        assert cls.shape[-1] == 1

    def test_anchor_points(self):
        pts, strides = anchor_points(64, 64, (8, 16, 32))
        assert pts.shape[0] == 8 * 8 + 4 * 4 + 2 * 2
        np.testing.assert_allclose(pts[0], [4.0, 4.0])  # center of first 8px cell
        assert float(strides[0]) == 8.0 and float(strides[-1]) == 32.0


class TestDecode:
    def test_dfl_decode_known_distribution(self):
        # one-hot at bin 2 on every side -> ltrb = 2 * stride
        a = 4
        reg_max = 16
        logits = np.full((1, a, 4, reg_max), -1e9, np.float32)
        logits[..., 2] = 0.0
        anchors = jnp.asarray([[100.0, 100.0]] * a)
        strides = jnp.asarray([8.0] * a)
        boxes = decode_boxes(jnp.asarray(logits.reshape(1, a, -1)), anchors,
                             strides, reg_max)
        np.testing.assert_allclose(np.asarray(boxes[0, 0]),
                                   [100 - 16, 100 - 16, 100 + 16, 100 + 16],
                                   atol=1e-3)


class TestNMS:
    def test_iou_matrix(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                            jnp.float32)
        iou = np.asarray(_iou_matrix(boxes))
        assert iou[0, 1] == pytest.approx(1.0)
        assert iou[0, 2] == pytest.approx(0.0)

    def test_suppresses_overlaps_same_class(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                            jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        classes = jnp.asarray([0, 0, 0])
        out = nms_fixed(boxes, scores, classes, iou_threshold=0.45, max_det=3)
        assert list(np.asarray(out["valid"])) == [True, True, False] or \
            list(np.asarray(out["scores"]) > 0) == [True, False, True]
        # kept: best box and the far box; the overlapping 0.8 suppressed
        kept_scores = np.asarray(out["scores"])[np.asarray(out["valid"])]
        np.testing.assert_allclose(sorted(kept_scores, reverse=True), [0.9, 0.7])

    def test_keeps_overlaps_different_class(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        classes = jnp.asarray([0, 1])
        out = nms_fixed(boxes, scores, classes, max_det=2)
        assert np.asarray(out["valid"]).sum() == 2

    def test_truncation_path_keeps_top_scored_kept_first(self):
        """k > max_det engages the kept-first argsort + truncate path (the
        k <= max_det fast path skips it): the max_det output slots must hold
        the top-scored KEPT boxes in score order, dropping suppressed ones
        rather than letting them occupy slots."""
        rng = np.random.default_rng(7)
        n, max_det = 32, 6
        xy = rng.uniform(0, 60, (n, 2))
        wh = rng.uniform(5, 30, (n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = np.sort(rng.uniform(0.1, 1.0, n).astype(np.float32))[::-1]
        classes = rng.integers(0, 2, n).astype(np.int32)
        full = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores.copy()),
                         jnp.asarray(classes), iou_threshold=0.45, max_det=n)
        kept_scores = np.asarray(full["scores"])[np.asarray(full["valid"])]
        want = sorted(kept_scores, reverse=True)[:max_det]
        trunc = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores.copy()),
                          jnp.asarray(classes), iou_threshold=0.45,
                          max_det=max_det)
        assert np.asarray(trunc["boxes"]).shape == (max_det, 4)
        got = np.asarray(trunc["scores"])[np.asarray(trunc["valid"])]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_cascade_not_suppressed_by_suppressed_box(self):
        # B overlaps A (suppressed); C overlaps B but not A -> C must survive
        boxes = jnp.asarray([[0, 0, 10, 10], [4, 0, 14, 10], [9, 0, 19, 10]],
                            jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        classes = jnp.asarray([0, 0, 0])
        out = nms_fixed(boxes, scores, classes, iou_threshold=0.3, max_det=3)
        kept = np.asarray(out["scores"])[np.asarray(out["valid"])]
        np.testing.assert_allclose(sorted(kept, reverse=True), [0.9, 0.7])

    def test_detect_end_to_end_shapes(self, nano):
        cfg, params = nano
        imgs = jnp.zeros((2, 64, 64, 3), jnp.uint8)
        out = detect(params, imgs, cfg, conf_threshold=0.0, top_k=64, max_det=10)
        assert out["boxes"].shape == (2, 10, 4)
        assert out["valid"].shape == (2, 10)


class TestWeightConverter:
    def test_roundtrip(self):
        cfg = YoloConfig("yolov8n", num_classes=80)
        params = init_yolo_params(cfg, seed=3)
        sd = export_ultralytics_state_dict(params, cfg)
        assert any(k.startswith("model.22.cv3") for k in sd)
        back = convert_ultralytics_state_dict(sd, cfg)
        flat_a = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_converted_forward_matches(self):
        cfg = YoloConfig("yolov8n", num_classes=80)
        params = init_yolo_params(cfg, seed=4)
        back = convert_ultralytics_state_dict(
            export_ultralytics_state_dict(params, cfg), cfg)
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                        jnp.float32)
        b1, c1 = yolo_forward(params, x, cfg)
        b2, c2 = yolo_forward(back, x, cfg)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


class TestDetectionPipeline:
    def test_letterbox_geometry(self):
        from eioku_tpu.ml.detection import letterbox_batch
        frames = np.random.default_rng(0).integers(
            0, 255, (2, 90, 160, 3), dtype=np.uint8)
        out, scale, (pad_x, pad_y) = letterbox_batch(frames, valid=2, size=640)
        assert out.shape == (2, 640, 640, 3)
        assert scale == pytest.approx(4.0)
        assert pad_x == 0 and pad_y == (640 - 360) // 2

    def test_object_detection_runs_e2e(self, tmp_path):
        # random weights -> results may be empty, but the pipeline must run and
        # produce schema-valid payloads when detections exist
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video
        from eioku_tpu.ml.detection import run_object_detection
        from eioku_tpu.domain.schema_registry import SchemaRegistry, register_all_schemas
        register_all_schemas()
        path = str(tmp_path / "v.mp4")
        write_video(path, [(12, (128, 90, 60))], fps=6, size=(96, 96))
        results = run_object_detection(
            path, {"confidence_threshold": 0.0, "frame_interval_s": 1.0,
                   "batch_size": 4})
        for r in results[:20]:
            SchemaRegistry.validate("object.detection", 1, r["payload"])
        assert isinstance(results, list)


class TestNmsFixpointExactness:
    def test_matches_sequential_greedy_on_random_boxes(self):
        """The fixpoint sweep must equal classic sequential greedy NMS."""
        from eioku_tpu.models.yolo.postprocess import nms_fixed

        def greedy_np(boxes, scores, classes, thr):
            keep = []
            suppressed = np.zeros(len(boxes), bool)
            for i in range(len(boxes)):
                if suppressed[i] or scores[i] <= 0:
                    continue
                keep.append(i)
                for j in range(i + 1, len(boxes)):
                    if classes[j] != classes[i] or suppressed[j]:
                        continue
                    ax = max(boxes[i][0], boxes[j][0])
                    ay = max(boxes[i][1], boxes[j][1])
                    bx = min(boxes[i][2], boxes[j][2])
                    by = min(boxes[i][3], boxes[j][3])
                    inter = max(bx - ax, 0) * max(by - ay, 0)
                    area_i = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
                    area_j = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
                    if inter / max(area_i + area_j - inter, 1e-9) > thr:
                        suppressed[j] = True
            return keep

        rng = np.random.default_rng(0)
        for trial in range(5):
            n = 64
            xy = rng.uniform(0, 80, (n, 2))
            wh = rng.uniform(5, 40, (n, 2))
            boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
            scores = np.sort(rng.uniform(0.1, 1.0, n).astype(np.float32))[::-1]
            classes = rng.integers(0, 3, n).astype(np.int32)
            out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores.copy()),
                            jnp.asarray(classes), iou_threshold=0.45,
                            max_det=n)
            got = sorted(int(i) for i, v in
                         zip(np.asarray(out["classes"]), np.asarray(out["valid"]))
                         if v and i >= 0)
            kept_idx = np.nonzero(np.asarray(out["valid"]))[0]
            got_boxes = np.asarray(out["boxes"])[kept_idx]
            exp = greedy_np(boxes, scores, classes, 0.45)
            exp_boxes = boxes[exp]
            assert len(got_boxes) == len(exp_boxes), trial
            np.testing.assert_allclose(np.sort(got_boxes, axis=0),
                                       np.sort(exp_boxes, axis=0), rtol=1e-5)
