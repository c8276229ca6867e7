"""Place classification pipeline: sampled frames -> ResNet18-Places365 top-k.

Capability parity: /root/reference/ml-service/src/services/model_manager.py:560-713
(1 s sampling interval, resize 224, ImageNet norm, softmax top-5). Batched on
device; note the reference emits one artifact per sampled frame and so do we.
"""
from __future__ import annotations

import logging
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.ml import video_io
from eioku_tpu.models.resnet.model import load_places365, preprocess, resnet18_forward
from eioku_tpu.utils import progress

log = logging.getLogger(__name__)


@lru_cache(maxsize=1)
def _model(cache_dir: str | None):
    params, labels, pretrained = load_places365(cache_dir)
    if not pretrained:
        log.warning("no places365 checkpoint; using random-init weights")
    return params, labels


def run_place_classification(video_path: str, config: dict,
                             model_cache_dir: str | None = None) -> list[dict]:
    interval = float(config.get("frame_interval_s", 1.0))
    batch_size = int(config.get("batch_size", 64))
    top_k = int(config.get("top_k", 5))
    params, labels = _model(model_cache_dir)
    info = video_io.probe(video_path)
    frame_ms = int(round(1000.0 / info.fps)) if info.fps else 33

    results: list[dict] = []
    decode_threads = int(config.get("decode_threads", 4))
    decode_procs = int(config.get("decode_procs", 0))
    for batch in video_io.prefetch(video_io.iter_frame_batches(
            video_path, batch_size=batch_size, frame_interval_s=interval,
            resize_hw=(224, 224), decode_threads=decode_threads,
            decode_procs=decode_procs,
            fast_level=int(config.get("decode_fast", 1)))):
        logits = resnet18_forward(params, preprocess(jnp.asarray(batch.frames)))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        scores, idx = jax.lax.top_k(probs, top_k)
        scores, idx = np.asarray(scores), np.asarray(idx)
        for i in range(batch.valid):
            t0 = int(batch.timestamps_ms[i])
            preds = [{"label": labels[int(idx[i, j])],
                      "confidence": float(scores[i, j])} for j in range(top_k)]
            results.append({
                "payload": {"predictions": preds,
                            "frame_number": int(batch.frame_indices[i])},
                "span_start_ms": t0, "span_end_ms": t0 + frame_ms,
            })
        if info.duration_ms > 0 and batch.valid:
            progress.report(batch.timestamps_ms[batch.valid - 1]
                            / info.duration_ms)
    return results
