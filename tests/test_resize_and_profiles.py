"""Device resize kernel + workload-profile priority tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eioku_tpu.ops.resize import (
    letterbox_geometry,
    letterbox_resize_normalize,
    resize_bilinear,
)


class TestResize:
    def test_matches_jax_image_linear(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 48, 80, 3), dtype=np.float32))
        ours = np.asarray(resize_bilinear(x, 96, 160))
        ref = np.asarray(jax.image.resize(x, (2, 96, 160, 3), "linear"))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_downscale_matches_cv2_linear(self):
        # downscale: 2-tap bilinear (cv2 INTER_LINEAR semantics), no antialias
        import cv2
        rng = np.random.default_rng(1)
        x = rng.random((96, 128, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x[None]), 48, 64))[0]
        ref = cv2.resize(x, (64, 48), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_identity(self):
        x = jnp.asarray(np.random.default_rng(2).random((1, 32, 32, 3),
                                                        dtype=np.float32))
        np.testing.assert_allclose(np.asarray(resize_bilinear(x, 32, 32)),
                                   np.asarray(x), atol=1e-5)

    def test_letterbox_geometry_matches_host(self):
        from eioku_tpu.ml.detection import letterbox_batch
        frames = np.random.default_rng(3).integers(
            0, 255, (2, 90, 160, 3), dtype=np.uint8)
        _, scale_h, (px_h, py_h) = letterbox_batch(frames, 2, size=640)
        scale_d, px_d, py_d = letterbox_geometry(90, 160, 640)
        assert scale_d == pytest.approx(scale_h)
        assert (px_d, py_d) == (px_h, py_h)

    def test_letterbox_device_close_to_host(self):
        from eioku_tpu.ml.detection import letterbox_batch
        # smooth gradient image: INTER_LINEAR (host) vs matmul bilinear agree
        g = np.linspace(0, 255, 160, dtype=np.float32)
        frame = np.broadcast_to(g[None, :, None], (90, 160, 3)).astype(np.uint8)
        frames = frame[None]
        host, _, _ = letterbox_batch(frames, 1, size=320)
        dev = np.asarray(letterbox_resize_normalize(jnp.asarray(frames),
                                                    320, 320)) * 255.0
        # compare interiors (borders differ by at most one interpolation cell)
        h = host[0, 60:260, 4:316].astype(np.float32)
        d = dev[0, 60:260, 4:316]
        assert np.abs(h - d).mean() < 2.0

    def test_detection_pipeline_device_preprocess(self, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video
        from eioku_tpu.ml.detection import run_object_detection

        path = str(tmp_path / "v.mp4")
        write_video(path, [(6, (128, 90, 60))], fps=3, size=(96, 96))
        results = run_object_detection(
            path, {"confidence_threshold": 0.0, "frame_interval_s": 1.0,
                   "batch_size": 4, "preprocess": "device"})
        assert isinstance(results, list)


class TestConfigLoader:
    def test_object_form_paths(self, tmp_path):
        # the reference's config format (config/eioku.json,
        # config_loader.py:60-71): entries are {"path":..., "recursive":...}
        import json
        from eioku_tpu.config.settings import load_config
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps({
            "paths": [{"path": str(tmp_path / "a"), "recursive": False},
                      str(tmp_path / "b")]}))
        cfg = load_config(str(cfg_path))
        assert cfg.scan_paths == [str(tmp_path / "a"), str(tmp_path / "b")]
        assert cfg.path_recursive[str(tmp_path / "a")] is False
        assert str(tmp_path / "b") not in cfg.path_recursive

    def test_tilde_expansion(self, tmp_path):
        import json
        import os
        from eioku_tpu.config.settings import load_config
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps({"paths": [{"path": "~/Videos"}]}))
        cfg = load_config(str(cfg_path))
        assert cfg.scan_paths == [os.path.expanduser("~/Videos")]

    def test_object_path_falls_back_to_global_recursive(self, tmp_path):
        # an object entry without its own "recursive" must honor the
        # file-level flag, same as a string entry
        import json
        from eioku_tpu.config.settings import load_config
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps({
            "recursive": False, "paths": [{"path": str(tmp_path / "a")}]}))
        cfg = load_config(str(cfg_path))
        assert str(tmp_path / "a") not in cfg.path_recursive
        assert cfg.path_recursive.get(str(tmp_path / "a"),
                                      cfg.recursive) is False


class TestReferenceConfigCompat:
    """A reference user's profile JSON must work unmodified: the reference
    spells several task_settings keys differently
    (/root/reference/config/content_creator.json,
    video_discovery_service.py:371-443). docs/MIGRATION.md documents the map."""

    def _load(self, tmp_path, task_settings):
        import json
        from eioku_tpu.config.settings import load_config
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"paths": [], "task_settings": task_settings}))
        return load_config(str(p))

    def test_reference_profile_spellings(self, tmp_path):
        # re-typed shape of the reference's content_creator.json
        cfg = self._load(tmp_path, {
            "max_concurrent_videos": 8,  # scalar entry: ignored, not a crash
            "object_detection": {"model_name": "yolov8s.pt",
                                 "sampling_interval_seconds": 3.0,
                                 "confidence_threshold": 0.5},
            "face_detection": {"model_name": "yolov8n-face.pt",
                               "sampling_interval_seconds": 3.0},
            "place_detection": {"sampling_interval_seconds": 3.0, "top_k": 3},
            "transcription": {"model_name": "large-v3-turbo",
                              "languages": ["en", "ja"], "vad_filter": True},
            "scene_detection": {"min_scene_length": 0.6},
        })
        od = cfg.settings_for("object_detection")
        assert od["model"] == "yolov8s"
        assert od["frame_interval_s"] == 3.0
        assert od["confidence_threshold"] == 0.5
        assert cfg.settings_for("face_detection")["model"] == "yolov8n-face"
        # task-type alias: place_detection -> place_classification
        pc = cfg.settings_for("place_classification")
        assert pc["frame_interval_s"] == 3.0 and pc["top_k"] == 3
        tr = cfg.settings_for("transcription")
        assert tr["model"] == "large-v3-turbo"  # accepted by _normalize_variant
        assert tr["languages"] == ["en", "ja"]
        assert cfg.settings_for("scene_detection")["min_scene_len_s"] == 0.6

    def test_native_spelling_wins_on_collision(self, tmp_path):
        cfg = self._load(tmp_path, {
            "object_detection": {"model_name": "yolov8s.pt",
                                 "model": "yolov8m",
                                 "sampling_interval_seconds": 9.0,
                                 "frame_interval_s": 2.0}})
        od = cfg.settings_for("object_detection")
        assert od["model"] == "yolov8m"
        assert od["frame_interval_s"] == 2.0

    def test_scene_threshold_ffmpeg_scale_rescaled(self, tmp_path):
        # reference default 0.7 is ffmpeg scene-cut scale; ours is an HSV
        # mean-abs-diff where the equivalent default is 0.1 — a literal 0.7
        # would detect nothing, so the loader rescales proportionally
        cfg = self._load(tmp_path, {"scene_detection": {"threshold": 0.7}})
        assert abs(cfg.settings_for("scene_detection")["threshold"] - 0.1) < 1e-6
        # values already on our scale pass through untouched
        cfg = self._load(tmp_path, {"scene_detection": {"threshold": 0.15}})
        assert cfg.settings_for("scene_detection")["threshold"] == 0.15

    def test_whisper_variant_accepts_reference_name(self):
        from eioku_tpu.ml.transcribe import _normalize_variant
        assert _normalize_variant("large-v3-turbo") == "large-v3-turbo"
        assert _normalize_variant("whisper-large-v3") == "large-v3"


class TestPeriodicDiscovery:
    def test_loop_picks_up_new_file(self, db, tmp_path):
        """config discover_interval_s: a file dropped into a watched folder
        after startup is discovered by the background loop without a manual
        POST /paths/discover."""
        import asyncio
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video

        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.domain.models import PathConfig
        from eioku_tpu.queue import JobProducer, MemoryJobQueue
        from eioku_tpu.repositories import (
            PathConfigRepository,
            TaskRepository,
            VideoRepository,
        )
        from eioku_tpu.services.discovery import (
            VideoDiscoveryService,
            discovery_loop,
        )

        config = AppConfig(scan_paths=[], discover_interval_s=0.05)
        videos = VideoRepository(db)
        paths = PathConfigRepository(db)
        paths.save(PathConfig(path=str(tmp_path)))
        svc = VideoDiscoveryService(config, videos, TaskRepository(db), paths,
                                    JobProducer(MemoryJobQueue()))
        svc.discover()
        assert videos.list(limit=10) == []

        async def run():
            stop = asyncio.Event()
            task = asyncio.create_task(
                discovery_loop(svc, config.discover_interval_s, stop))
            await asyncio.sleep(0.02)  # loop is sleeping; drop a file now
            write_video(str(tmp_path / "new.mp4"), [(4, (10, 10, 10))],
                        fps=2, size=(48, 48))
            for _ in range(100):
                await asyncio.sleep(0.05)
                if videos.list(limit=10):
                    break
            stop.set()
            await asyncio.wait_for(task, timeout=2)

        asyncio.run(run())
        found = videos.list(limit=10)
        assert len(found) == 1 and found[0].path.endswith("new.mp4")

    def test_config_loads_interval(self, tmp_path):
        import json

        from eioku_tpu.config.settings import load_config
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"paths": [], "discover_interval_s": 60}))
        assert load_config(str(p)).discover_interval_s == 60.0
        p.write_text(json.dumps({"paths": []}))
        assert load_config(str(p)).discover_interval_s is None
        # bad values disable with a warning instead of crashing/busy-looping
        p.write_text(json.dumps({"paths": [], "discover_interval_s": -300}))
        assert load_config(str(p)).discover_interval_s is None
        p.write_text(json.dumps({"paths": [], "discover_interval_s": "5m"}))
        assert load_config(str(p)).discover_interval_s is None

    def test_loop_runs_without_auto_discover(self, db, tmp_path):
        """auto_discover=false (skip the startup scan) must not disable the
        periodic loop — discover_interval_s is its own opt-in knob."""
        import asyncio

        from eioku_tpu.api.app import build_context, create_app
        from eioku_tpu.config.settings import AppConfig

        cfg = AppConfig(scan_paths=[], auto_discover=False,
                        discover_interval_s=9999, semantic_search=False)
        app = create_app(ctx=build_context(cfg, db=db),
                         start_reconciler=False)

        async def run():
            for fn in app.on_startup:
                await fn()
            names = {t.get_coro().__qualname__
                     for t in asyncio.all_tasks()
                     if t is not asyncio.current_task()}
            for fn in app.on_shutdown:
                await fn()
            return names

        names = asyncio.run(run())
        assert any("discovery_loop" in n or "periodic_loop" in n
                   for n in names), names


class TestWorkloadProfiles:
    def test_priorities(self):
        from eioku_tpu.config.settings import AppConfig
        c = AppConfig(workload_profile="search_first")
        assert c.priority_for("transcription", 5) == 2
        assert c.priority_for("object_detection", 5) == 7
        balanced = AppConfig()
        assert balanced.priority_for("transcription", 5) == 5

    def test_discovery_applies_profile(self, db, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.domain.models import PathConfig
        from eioku_tpu.queue import JobProducer, MemoryJobQueue
        from eioku_tpu.repositories import (
            PathConfigRepository,
            TaskRepository,
            VideoRepository,
        )
        from eioku_tpu.services.discovery import VideoDiscoveryService

        write_video(str(tmp_path / "v.mp4"), [(4, (10, 10, 10))], fps=2,
                    size=(48, 48))
        config = AppConfig(scan_paths=[], workload_profile="visual_first")
        videos, tasks = VideoRepository(db), TaskRepository(db)
        paths = PathConfigRepository(db)
        paths.save(PathConfig(path=str(tmp_path)))
        svc = VideoDiscoveryService(config, videos, tasks, paths,
                                    JobProducer(MemoryJobQueue()))
        svc.discover()
        by_type = {t.task_type: t.priority for t in tasks.find(limit=20)}
        assert by_type["scene_detection"] == 2
        assert by_type["transcription"] == 7
        # queue serves visual tasks first
        q = svc.producer.queue
        first = q.claim("w")
        assert first.args[1] == "metadata_extraction"
        second = q.claim("w")
        assert second.args[1] == "scene_detection"
