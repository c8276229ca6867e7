"""Object + face detection pipelines over batched video frames.

Capability parity: /root/reference/ml-service/src/services/model_manager.py:215-407
(objects: yolov8n conf 0.5 interval 1 s; faces: yolov8n-face conf 0.7 interval
3 s, label "face", cluster_id None). TPU-native redesign (SURVEY.md P6): frames
are letterboxed on host into fixed 640x640 batches and the whole
forward+decode+NMS graph runs on device per batch; boxes are un-letterboxed back
to source pixel coordinates on host.

Checkpoints: looks for `{model}.pt` (ultralytics format) under model_cache_dir;
falls back to random-init weights with a warning (zero-egress environments),
keeping the pipeline exercisable end-to-end.
"""
from __future__ import annotations

import logging
import os
from functools import lru_cache

import cv2
import jax.numpy as jnp
import numpy as np

from eioku_tpu.ml import video_io
from eioku_tpu.models.yolo.classes import COCO_CLASSES
from eioku_tpu.utils import progress
from eioku_tpu.models.yolo.model import YoloConfig, fold_batchnorm, init_yolo_params
from eioku_tpu.models.yolo.postprocess import detect
from eioku_tpu.models.yolo.weights import load_yolo_checkpoint

log = logging.getLogger(__name__)

INPUT_SIZE = 640


def letterbox_batch(frames: np.ndarray, valid: int, size: int = INPUT_SIZE
                    ) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Resize a uint8 [B, H, W, 3] batch preserving aspect, pad to (size, size).
    Returns (batch, scale, (pad_x, pad_y)) for box un-mapping."""
    b, h, w, _ = frames.shape
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    pad_y, pad_x = (size - nh) // 2, (size - nw) // 2
    out = np.full((b, size, size, 3), 114, dtype=np.uint8)
    for i in range(valid):
        resized = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_LINEAR)
        out[i, pad_y:pad_y + nh, pad_x:pad_x + nw] = resized
    return out, scale, (pad_x, pad_y)


@lru_cache(maxsize=4)
def _load_model(model_name: str, num_classes: int, cache_dir: str | None,
                int8: bool = False):
    cfg = YoloConfig(variant=model_name.replace("-face", ""),
                     num_classes=num_classes)
    ckpt = None
    if cache_dir:
        cand = os.path.join(cache_dir, f"{model_name}.pt")
        if os.path.isfile(cand):
            ckpt = cand
    if ckpt:
        params = load_yolo_checkpoint(ckpt, cfg)
        log.info("loaded yolo checkpoint", extra={"model": model_name,
                                                  "path": ckpt})
    else:
        params = init_yolo_params(cfg, seed=0)
        log.warning("no checkpoint found; using random-init weights",
                    extra={"model": model_name, "cache_dir": cache_dir})
    params = fold_batchnorm(params)
    if int8:
        # opt-in int8 PTQ (config {"int8": true}): per-output-channel conv
        # weights + dynamic per-image activation scales (ops/quant.py;
        # TensorRT-granularity PTQ). Memory-savings opt-in — measured
        # SLOWER than bf16 on this backend at every conv width (PERF.md)
        from eioku_tpu.ops.quant import quantize_convs

        params = quantize_convs(params)
        log.info("int8-quantized detector", extra={"model": model_name})
    return params, cfg


@lru_cache(maxsize=4)
def _dp_detector(model_name: str, num_classes: int, cache_dir: str | None,
                 int8: bool = False):
    """DataParallelDetector over all devices (frame batch sharded on the mesh
    data axis; SURVEY.md P6's multi-chip answer)."""
    import jax

    from eioku_tpu.parallel.inference import DataParallelDetector
    from eioku_tpu.parallel.mesh import make_mesh

    params, cfg = _load_model(model_name, num_classes, cache_dir, int8)
    mesh = make_mesh(len(jax.devices()), model_parallel=1)
    return DataParallelDetector(params, cfg, mesh)


def _run_detection(video_path: str, config: dict, *, model_name: str,
                   num_classes: int, class_names: list[str],
                   default_conf: float, default_interval: float,
                   model_cache_dir: str | None,
                   payload_builder, batch_hook=None) -> list[dict]:
    conf = float(config.get("confidence_threshold", default_conf))
    interval = float(config.get("frame_interval_s", default_interval))
    batch_size = int(config.get("batch_size", 32))
    # pre-NMS candidate pool; default 256 trades dense-crowd recall for +8.6%
    # throughput (postprocess.detect docstring) — crowd-heavy deployments set
    # {"top_k": 512} in the task config to restore the wider pool
    top_k = int(config.get("top_k", 256))
    # "device" letterboxes+normalizes on TPU (fused matmul resize, ops/resize.py);
    # "host" uses cv2 in the decode thread. Host wins when the PCIe/host link is
    # the bottleneck for full-resolution frames, device when host CPU is.
    preprocess = config.get("preprocess", "host")
    int8 = bool(config.get("int8", False))
    params, cfg = _load_model(model_name, num_classes, model_cache_dir, int8)
    # multi-device: shard the frame batch over the mesh ("auto" = when >1
    # device is visible); single device uses the plain jitted path
    import jax as _jax
    dp_mode = config.get("data_parallel", "auto")
    use_dp = (len(_jax.devices()) > 1) if dp_mode == "auto" else bool(dp_mode)
    dp = _dp_detector(model_name, num_classes, model_cache_dir, int8) \
        if use_dp else None
    info = video_io.probe(video_path)
    frame_duration_ms = int(round(1000.0 / info.fps)) if info.fps else 33

    decode_threads = int(config.get("decode_threads", 4))
    decode_procs = int(config.get("decode_procs", 0))
    results: list[dict] = []
    for batch in video_io.prefetch(video_io.iter_frame_batches(
            video_path, batch_size=batch_size, frame_interval_s=interval,
            decode_threads=decode_threads, decode_procs=decode_procs,
            fast_level=int(config.get("decode_fast", 1)))):
        batch_start = len(results)
        if preprocess == "device":
            from eioku_tpu.ops.resize import (
                letterbox_geometry,
                letterbox_resize_normalize,
            )
            scale, pad_x, pad_y = letterbox_geometry(
                batch.frames.shape[1], batch.frames.shape[2], INPUT_SIZE)
            boxed = letterbox_resize_normalize(
                jnp.asarray(batch.frames), INPUT_SIZE, INPUT_SIZE)
        else:
            boxed, scale, (pad_x, pad_y) = letterbox_batch(batch.frames,
                                                           batch.valid)
        if dp is not None:
            out = dp(boxed, conf_threshold=conf, top_k=top_k)
        else:
            out = detect(params, boxed, cfg, conf_threshold=conf, top_k=top_k)
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        classes = np.asarray(out["classes"])
        valid = np.asarray(out["valid"])
        for i in range(batch.valid):
            t0 = int(batch.timestamps_ms[i])
            frame_no = int(batch.frame_indices[i])
            for j in np.nonzero(valid[i])[0]:
                x1, y1, x2, y2 = boxes[i, j]
                # un-letterbox to source pixels
                x1 = (x1 - pad_x) / scale
                x2 = (x2 - pad_x) / scale
                y1 = (y1 - pad_y) / scale
                y2 = (y2 - pad_y) / scale
                x1 = float(np.clip(x1, 0, info.width))
                x2 = float(np.clip(x2, 0, info.width))
                y1 = float(np.clip(y1, 0, info.height))
                y2 = float(np.clip(y2, 0, info.height))
                if x2 <= x1 or y2 <= y1:
                    continue
                payload = payload_builder(
                    class_names[int(classes[i, j])] if class_names else "face",
                    float(scores[i, j]),
                    {"x": x1, "y": y1, "width": x2 - x1, "height": y2 - y1},
                    frame_no)
                results.append({"payload": payload, "span_start_ms": t0,
                                "span_end_ms": t0 + frame_duration_ms})
        if batch_hook is not None:
            # while this batch's SOURCE frames are still in memory: lets the
            # face path crop identity patches without a second decode pass
            batch_hook(batch, results[batch_start:])
        if info.duration_ms > 0 and batch.valid:
            progress.report(batch.timestamps_ms[batch.valid - 1]
                            / info.duration_ms)
    return results


def run_object_detection(video_path: str, config: dict,
                         model_cache_dir: str | None = None) -> list[dict]:
    model = config.get("model", "yolov8n")
    return _run_detection(
        video_path, config, model_name=model, num_classes=len(COCO_CLASSES),
        class_names=COCO_CLASSES, default_conf=0.5, default_interval=1.0,
        model_cache_dir=model_cache_dir,
        payload_builder=lambda label, conf, box, frame: {
            "label": label, "confidence": conf, "bounding_box": box,
            "frame_number": frame})


def run_face_detection(video_path: str, config: dict,
                       model_cache_dir: str | None = None) -> list[dict]:
    model = config.get("model", "yolov8n-face")
    # {"embeddings": true}: ArcFace identity embeddings per face, cropped from
    # the decoded frames in the same pass (no second decode) — feeds the
    # cross-video People clustering (services/people.py)
    collector = _FaceCropCollector() if config.get("embeddings") else None
    results = _run_detection(
        video_path, config, model_name=model, num_classes=1,
        class_names=[], default_conf=0.7, default_interval=3.0,
        model_cache_dir=model_cache_dir,
        payload_builder=lambda label, conf, box, frame: {
            "cluster_id": None, "confidence": conf, "bounding_box": box,
            "frame_number": frame},
        batch_hook=collector.collect if collector else None)
    _assign_face_clusters(results)
    if collector:
        collector.attach_embeddings(model_cache_dir)
    return results


class _FaceCropCollector:
    """Crops face boxes from each decoded batch, then embeds all crops with
    the ArcFace model and writes payload.embedding (L2-normalized, so the
    People clustering works in plain cosine space)."""

    EMBED_BATCH = 64

    def __init__(self):
        self.crops: list[np.ndarray] = []
        self.payloads: list[dict] = []

    def collect(self, batch, batch_results: list[dict]) -> None:
        from eioku_tpu.models.face_embed.model import INPUT_SIZE
        local = {int(f): i for i, f in
                 enumerate(batch.frame_indices[:batch.valid])}
        for r in batch_results:
            p = r["payload"]
            i = local.get(p["frame_number"])
            if i is None:
                continue
            b = p["bounding_box"]
            x1, y1 = int(b["x"]), int(b["y"])
            x2 = int(b["x"] + b["width"]), int(b["y"] + b["height"])
            x2, y2 = x2[0], x2[1]
            crop = batch.frames[i, max(y1, 0):max(y2, 1), max(x1, 0):max(x2, 1)]
            if crop.size == 0:
                continue
            self.crops.append(cv2.resize(crop, (INPUT_SIZE, INPUT_SIZE),
                                         interpolation=cv2.INTER_LINEAR))
            self.payloads.append(p)

    def attach_embeddings(self, model_cache_dir: str | None) -> None:
        if not self.crops:
            return
        from eioku_tpu.models.face_embed.model import face_embed, preprocess
        params, _ = _load_face_embedder(model_cache_dir)
        crops = preprocess(np.stack(self.crops))
        vecs = []
        bs = self.EMBED_BATCH
        for i in range(0, len(crops), bs):
            chunk = crops[i:i + bs]
            pad = bs - len(chunk)  # fixed shape: one compiled program
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            vecs.append(np.asarray(face_embed(params, jnp.asarray(chunk)))
                        [:bs - pad if pad else bs])
        emb = np.concatenate(vecs).astype(np.float32)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
        for p, v in zip(self.payloads, emb):
            p["embedding"] = [round(float(x), 5) for x in v]


def attach_face_embeddings(video_path: str, results: list[dict],
                           frame_step: int,
                           model_cache_dir: str | None = None,
                           batch_size: int = 32) -> None:
    """Post-hoc variant of the {"embeddings": true} path for pipelines that
    no longer hold the decoded frames (the combined visual pass): re-decode
    on the EXACT sampling grid the faces came from and crop the boxes whose
    frame numbers match. frame_step is the caller's true source-frames-per-
    sample (e.g. the combined pass's faces.step, which snaps to its base
    grid) — re-deriving a grid from a seconds interval here would round
    differently and silently miss every face off the rederived grid."""
    if not results:
        return
    info = video_io.probe(video_path)
    fps = info.fps or 30.0
    by_frame: dict[int, list[dict]] = {}
    for r in results:
        by_frame.setdefault(r["payload"]["frame_number"], []).append(r)
    collector = _FaceCropCollector()
    matched_frames: set[int] = set()
    # iter_frame_batches recomputes step = round(fps * interval); feeding
    # frame_step/fps back through that is an exact round-trip
    for batch in video_io.iter_frame_batches(
            video_path, batch_size=batch_size,
            frame_interval_s=max(frame_step, 1) / fps):
        matched = [r for f in batch.frame_indices[:batch.valid]
                   for r in by_frame.get(int(f), [])]
        matched_frames.update(int(f) for f in batch.frame_indices[:batch.valid]
                              if int(f) in by_frame)
        if matched:
            collector.collect(batch, matched)
    missed = set(by_frame) - matched_frames
    if missed:
        log.warning("face embedding re-decode missed %d/%d face frames "
                    "(frame_step=%d mismatch?)", len(missed), len(by_frame),
                    frame_step)
    collector.attach_embeddings(model_cache_dir)


@lru_cache(maxsize=1)
def _load_face_embedder(model_cache_dir: str | None):
    from eioku_tpu.models.face_embed.model import load_face_embed
    params, pretrained = load_face_embed(model_cache_dir)
    if not pretrained:
        log.warning("no arcface_r18 checkpoint; face embeddings are "
                    "random-init (clustering quality will be poor)")
    return params, pretrained


def _assign_face_clusters(results: list[dict],
                          frame_step: int | None = None) -> None:
    """Cross-frame IoU tracking -> cluster ids (the capability the reference
    declared but never implemented; see ml/face_tracking.py).

    frame_step: source frames per sample; estimated from the detection frame
    numbers when not provided (frames with no faces never reach the tracker,
    so gaps must be measured in source-frame distance)."""
    from eioku_tpu.ml.face_tracking import FaceTracker

    frames = sorted({r["payload"]["frame_number"] for r in results})
    if frame_step is None:
        diffs = [b - a for a, b in zip(frames, frames[1:]) if b > a]
        frame_step = min(diffs) if diffs else 1
    tracker = FaceTracker(frame_step=max(frame_step, 1))
    by_frame: dict[int, list[dict]] = {}
    for r in results:
        by_frame.setdefault(r["payload"]["frame_number"], []).append(r)
    for frame in frames:
        group = by_frame[frame]
        ids = tracker.assign([r["payload"]["bounding_box"] for r in group],
                             frame_index=frame)
        for r, cid in zip(group, ids):
            r["payload"]["cluster_id"] = cid
