"""Pallas batched NMS kernel (ops/nms.py): exactness against the XLA
reference formulation, backend dispatch, and the detect() large-pool path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eioku_tpu.models.yolo.postprocess import detect, nms_fixed
from eioku_tpu.ops.nms import _reference_keep, nms_keep_mask


def _workload(b, k, n_classes=3, seed=0, pad_from=None):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 80, (b, k, 2))
    wh = rng.uniform(5, 40, (b, k, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.1, 1.0, (b, k)).astype(np.float32),
                     axis=1)[:, ::-1].copy()
    if pad_from is not None:
        scores[:, pad_from:] = 0.0
    classes = rng.integers(0, n_classes, (b, k)).astype(np.int32)
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes)


class TestKernelExactness:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_interpret_kernel_matches_nms_fixed(self, seed):
        """The Pallas kernel (interpret mode on CPU) must reproduce
        nms_fixed's keep mask bit-for-bit — including padding tails."""
        boxes, scores, classes = _workload(3, 256, seed=seed, pad_from=200)
        keep = nms_keep_mask(boxes, scores, classes, 0.45, force_pallas=True)
        ref = jax.vmap(
            lambda b, s, c: nms_fixed(b, s, c, 0.45, 256)["valid"]
        )(boxes, scores, classes)
        assert bool((np.asarray(keep) == np.asarray(ref)).all())
        assert not np.asarray(keep)[:, 200:].any()  # padding never kept

    def test_cpu_dispatch_uses_reference_not_interpret(self):
        """On the CPU backend (production fallback) the keep mask comes from
        the XLA reference — same answer, no interpreter cost."""
        boxes, scores, classes = _workload(2, 256, seed=5)
        a = nms_keep_mask(boxes, scores, classes, 0.45)
        b = _reference_keep(boxes, scores, classes, 0.45)
        assert bool((np.asarray(a) == np.asarray(b)).all())

    def test_odd_k_falls_back(self):
        boxes, scores, classes = _workload(2, 100, seed=7)
        a = nms_keep_mask(boxes, scores, classes, 0.45)
        b = _reference_keep(boxes, scores, classes, 0.45)
        assert bool((np.asarray(a) == np.asarray(b)).all())


class TestDetectLargePoolPath:
    def test_large_top_k_matches_per_image_nms(self):
        """detect() with top_k > max_det routes through the batched keep
        path; its truncated output must equal nms_fixed's per-image
        truncation on the same candidates."""
        from eioku_tpu.models.yolo.model import (YoloConfig, fold_batchnorm,
                                                 init_yolo_params)

        cfg = YoloConfig("yolov8n", num_classes=80)
        params = fold_batchnorm(init_yolo_params(cfg, seed=0))
        imgs = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3),
                                              dtype=np.uint8))
        out = detect(params, imgs, cfg, conf_threshold=0.0, top_k=512,
                     max_det=10)
        assert out["boxes"].shape == (2, 10, 4)
        assert out["valid"].shape == (2, 10)
        # score-ordered kept-first: valid slots hold descending scores
        for i in range(2):
            s = np.asarray(out["scores"][i])[np.asarray(out["valid"][i])]
            assert (np.diff(s) <= 1e-6).all()
