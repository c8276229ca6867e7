"""Inference engine: task-type dispatch into the TPU compute paths.

Capability parity with the reference's ModelManager
(/root/reference/ml-service/src/services/model_manager.py:9-867), redesigned
TPU-first: instead of one lazily-CUDA'd torch model per method with per-frame
Python loops, each task type maps to a pipeline of host decode -> fixed-shape
batched device compute -> host post-processing. Model families land
incrementally; unimplemented types raise ModelNotAvailable, which the task
handler records as a clean task failure.

Results are returned as a list of dicts:
  {"payload": <schema payload dict>, "span_start_ms": int, "span_end_ms": int}
"""
from __future__ import annotations

import logging
from typing import Any, Callable

import jax

log = logging.getLogger(__name__)


class ModelNotAvailable(RuntimeError):
    pass


_DEVICE_PROBE_FAILED_AT: float = 0.0
_DEVICE_PROBE_POOL = None  # ONE shared worker thread for every probe
_DEVICE_PROBE_FUTURE = None  # in-flight probe, reused until it resolves


def device_info(timeout_s: float = 10.0) -> dict:
    """TPU introspection (replaces the reference's nvidia GPU info,
    model_manager.py:168-213).

    jax.devices() blocks INDEFINITELY when the remote backend is down
    (measured multi-hour tunnel outages), which would hang an API worker per
    /device request — so the probe runs with a timeout on a SINGLE shared
    worker thread: a timed-out probe stays in flight and is re-awaited by the
    next call instead of stacking one permanently-blocked thread per request
    (jax.devices() holds xla_bridge._backend_lock while stuck, so a fresh
    thread per call can never be reaped). A failure is additionally memoized
    for 60 s so a dead tunnel answers instantly."""
    import concurrent.futures
    import time

    global _DEVICE_PROBE_FAILED_AT, _DEVICE_PROBE_POOL, _DEVICE_PROBE_FUTURE
    unavailable = {"backend": "unavailable", "device_count": 0, "devices": [],
                   "error": "device backend unreachable"}
    if time.monotonic() - _DEVICE_PROBE_FAILED_AT < 60.0:
        return unavailable

    def probe() -> dict:
        devices = jax.devices()
        return {
            "backend": jax.default_backend(),
            "device_count": len(devices),
            "devices": [{"id": d.id, "kind": d.device_kind,
                         "platform": d.platform} for d in devices],
        }

    if _DEVICE_PROBE_POOL is None:
        _DEVICE_PROBE_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="device-probe")
    if _DEVICE_PROBE_FUTURE is None or _DEVICE_PROBE_FUTURE.done():
        _DEVICE_PROBE_FUTURE = _DEVICE_PROBE_POOL.submit(probe)
    fut = _DEVICE_PROBE_FUTURE
    try:
        result = fut.result(timeout=timeout_s)
        _DEVICE_PROBE_FUTURE = None
        return result
    except concurrent.futures.TimeoutError:
        # leave the future in flight: the shared worker is still blocked in
        # jax.devices(); the next call past the memo window re-awaits it
        _DEVICE_PROBE_FAILED_AT = time.monotonic()
        return unavailable
    except RuntimeError:
        _DEVICE_PROBE_FUTURE = None
        _DEVICE_PROBE_FAILED_AT = time.monotonic()
        return unavailable


class InferenceEngine:
    def __init__(self, model_cache_dir: str | None = None,
                 model_profile: str = "balanced"):
        self.model_cache_dir = model_cache_dir
        self.model_profile = model_profile
        self._dispatch: dict[str, Callable[[str, dict], list[dict]]] = {
            "scene_detection": self._scene_detection,
            "metadata_extraction": self._metadata_extraction,
            "object_detection": self._object_detection,
            "face_detection": self._face_detection,
            "transcription": self._transcription,
            "ocr": self._ocr,
            "place_classification": self._place_classification,
            "semantic_indexing": self._semantic_indexing,
            "visual_analysis": self._visual_analysis,
            "speaker_diarization": self._speaker_diarization,
        }
        self.producer_name = "eioku-tpu-engine"
        self.producer_version = "0.1.0"

    def run_task(self, task_type: str, video_path: str,
                 config: dict[str, Any]) -> list[dict]:
        fn = self._dispatch.get(task_type)
        if fn is None:
            raise ModelNotAvailable(f"unknown task type {task_type!r}")
        return fn(video_path, config or {})

    # -- implemented pipelines ----------------------------------------------------

    def _scene_detection(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.scenes import detect_scenes
        scenes = detect_scenes(
            video_path,
            threshold=float(config.get("threshold", 0.1)),
            min_scene_len_s=float(config.get("min_scene_len_s", 0.5)),
            sample_fps=float(config.get("sample_fps", 4.0)),
            batch_size=int(config.get("batch_size", 64)),
            decode_threads=int(config.get("decode_threads", 4)),
            decode_procs=int(config.get("decode_procs", 0)),
            decode_fast=int(config.get("decode_fast", 1)),
        )
        return [
            {"payload": {"scene_index": s.scene_index, "start_ms": s.start_ms,
                         "end_ms": s.end_ms, "duration_ms": s.duration_ms,
                         "score": round(s.score, 4)},
             "span_start_ms": s.start_ms, "span_end_ms": s.end_ms}
            for s in scenes
        ]

    def _metadata_extraction(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.metadata import extract_metadata
        payload = extract_metadata(video_path)
        duration = payload.get("duration_ms") or 0
        return [{"payload": payload, "span_start_ms": 0, "span_end_ms": duration}]

    def _object_detection(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.detection import run_object_detection
        return run_object_detection(video_path, config,
                                    model_cache_dir=self.model_cache_dir)

    def _face_detection(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.detection import run_face_detection
        return run_face_detection(video_path, config,
                                  model_cache_dir=self.model_cache_dir)

    def _transcription(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.transcribe import run_transcription
        return run_transcription(video_path, config,
                                 model_cache_dir=self.model_cache_dir)

    def _ocr(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.ocr_task import run_ocr
        return run_ocr(video_path, config, model_cache_dir=self.model_cache_dir)

    def _place_classification(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.places import run_place_classification
        return run_place_classification(video_path, config,
                                        model_cache_dir=self.model_cache_dir)

    def _speaker_diarization(self, video_path: str, config: dict) -> list[dict]:
        from eioku_tpu.ml.diarize import run_diarization
        return run_diarization(video_path, config,
                               model_cache_dir=self.model_cache_dir)

    def _visual_analysis(self, video_path: str, config: dict) -> dict:
        """Combined one-decode-pass pipeline; returns {sub_task_type: results}
        (the task handler emits one run per sub type)."""
        from eioku_tpu.ml.combined import run_visual_analysis
        return run_visual_analysis(video_path, config,
                                   model_cache_dir=self.model_cache_dir)

    def _semantic_indexing(self, video_path: str, config: dict) -> list[dict]:
        # Semantic indexing consumes transcript artifacts, not the video file;
        # the task handler routes it separately (see workers/task_handler.py).
        raise ModelNotAvailable("semantic_indexing is handled by the task handler")
