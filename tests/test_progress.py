"""Task progress reporting: ContextVar sink, throttling, persistence, SSE/API.

The reference exposes only status + timestamps on task rows
(/root/reference/backend/src/database/models.py:35-48); here ML pipelines
narrate fractional completion through eioku_tpu.utils.progress and the task
handler persists it, so /tasks, /tasks/stream, and the SPA Tasks tab show a
live fraction for long-running jobs.
"""
import asyncio

import cv2
import numpy as np
import pytest

from eioku_tpu.api.app import build_context
from eioku_tpu.config.settings import AppConfig
from eioku_tpu.db.connection import Database
from eioku_tpu.domain.models import PathConfig, Task, TaskStatus
from eioku_tpu.utils import progress


class TestReporter:
    def test_report_is_noop_without_sink(self):
        progress.report(0.5)  # must not raise

    def test_report_clamps_and_skips_nan(self):
        seen = []
        with progress.reporting(seen.append):
            progress.report(-3.0)
            progress.report(7.0)
            progress.report(float("nan"))
            progress.report(0.25)
        assert seen == [0.0, 1.0, 0.25]

    def test_sink_scoped_to_context(self):
        seen = []
        with progress.reporting(seen.append):
            progress.report(0.1)
        progress.report(0.9)  # outside the context: dropped
        assert seen == [0.1]

    def test_sink_errors_never_propagate(self):
        def bad(_frac):
            raise RuntimeError("sink exploded")
        with progress.reporting(bad):
            progress.report(0.5)  # must not raise

    def test_sink_crosses_to_thread(self):
        """asyncio.to_thread copies the context: reports from the worker
        thread reach a sink installed in the async caller (the exact shape
        of the task handler around engine.run_task)."""
        seen = []

        async def run():
            with progress.reporting(seen.append):
                await asyncio.to_thread(progress.report, 0.42)

        asyncio.run(run())
        assert seen == [0.42]


class TestThrottled:
    def test_min_delta_gates_writes(self):
        writes = []
        sink = progress.throttled(writes.append, min_interval_s=0.0,
                                  min_delta=0.1)
        for frac in (0.05, 0.08, 0.2, 0.25, 0.31):
            sink(frac)
        assert writes == [0.05, 0.2, 0.31]

    def test_min_interval_gates_writes(self):
        writes = []
        sink = progress.throttled(writes.append, min_interval_s=3600.0,
                                  min_delta=0.0)
        sink(0.1)
        sink(0.5)  # within the interval: dropped
        assert writes == [0.1]

    def test_terminal_write_always_lands(self):
        writes = []
        sink = progress.throttled(writes.append, min_interval_s=3600.0,
                                  min_delta=0.5)
        sink(0.1)
        sink(1.0)  # both gates closed, but terminal updates bypass them
        assert writes == [0.1, 1.0]

    def test_terminal_bypass_fires_only_once(self):
        """A pipeline whose clamped fraction hits 1.0 mid-run (metadata
        duration shorter than the stream) must not write per batch."""
        writes = []
        sink = progress.throttled(writes.append, min_interval_s=3600.0,
                                  min_delta=0.5)
        for _ in range(50):
            sink(1.0)
        assert writes == [1.0]


class TestDomainAndRepo:
    def test_transitions_manage_progress(self):
        t = Task(video_id="v", task_type="scene_detection")
        assert t.progress is None
        t.transition(TaskStatus.RUNNING)
        assert t.progress == 0.0
        t.transition(TaskStatus.COMPLETED)
        assert t.progress == 1.0
        t.transition(TaskStatus.PENDING)  # re-run resets
        assert t.progress is None

    def test_failed_keeps_last_progress(self):
        t = Task(video_id="v", task_type="scene_detection")
        t.transition(TaskStatus.RUNNING)
        t.progress = 0.7
        t.transition(TaskStatus.FAILED)
        assert t.progress == 0.7  # how far it got before dying

    def test_set_progress_only_touches_running_rows(self, tmp_path):
        db = Database(f"sqlite:///{tmp_path}/p.db")
        try:
            ctx = build_context(AppConfig(scan_paths=[], auto_discover=False),
                                db=db)
            from eioku_tpu.domain.models import Video
            v = Video(path=str(tmp_path / "v.mp4"))
            ctx.videos.save(v)
            t = Task(video_id=v.id, task_type="scene_detection")
            ctx.tasks.save(t)
            ctx.tasks.set_progress(t.id, 0.5)  # pending: ignored
            assert ctx.tasks.get(t.id).progress is None
            ctx.tasks.update_status(t.id, TaskStatus.RUNNING)
            ctx.tasks.set_progress(t.id, 0.5)
            assert ctx.tasks.get(t.id).progress == 0.5
            ctx.tasks.set_progress(t.id, 2.5)  # clamped
            assert ctx.tasks.get(t.id).progress == 1.0
            ctx.tasks.update_status(t.id, TaskStatus.COMPLETED)
            ctx.tasks.set_progress(t.id, 0.1)  # terminal: ignored
            assert ctx.tasks.get(t.id).progress == 1.0
        finally:
            db.close()

    def test_to_dict_carries_progress(self):
        t = Task(video_id="v", task_type="scene_detection")
        t.transition(TaskStatus.RUNNING)
        t.progress = 0.33
        assert t.to_dict()["progress"] == 0.33


def _write_video(path: str, n_frames: int = 20) -> None:
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    assert w.isOpened()
    for i in range(n_frames):
        frame = np.full((64, 64, 3), (i * 12) % 255, np.uint8)
        w.write(frame)
    w.release()


class TestEndToEnd:
    def test_engine_reports_persist_through_worker(self, tmp_path):
        """A report() from inside engine.run_task (worker thread) lands on the
        RUNNING task row, and completion finishes at 1.0."""
        from eioku_tpu.queue.worker import WorkerSettings
        from eioku_tpu.workers.main import build_worker

        video = str(tmp_path / "clip.mp4")
        _write_video(video)
        db = Database(f"sqlite:///{tmp_path}/e2e.db")
        ctx = build_context(
            AppConfig(scan_paths=[], auto_discover=False,
                      active_task_types=["scene_detection"]), db=db)
        mid_run: list[float | None] = []

        class ReportingEngine:
            producer_name = "stub-engine"
            producer_version = "0"
            model_profile = "balanced"

            def run_task(self, task_type, video_path, config):
                progress.report(0.37)
                running = ctx.tasks.find(status=TaskStatus.RUNNING, limit=1)
                mid_run.append(running[0].progress if running else None)
                return []

        try:
            ctx.paths.save(PathConfig(path=str(tmp_path)))
            ctx.discovery.discover()
            worker = build_worker(app_ctx=ctx, engine=ReportingEngine(),
                                  settings=WorkerSettings(max_jobs=1,
                                                          poll_delay_s=0.01))
            asyncio.run(worker.drain())
            task = ctx.tasks.find(limit=1)[0]
            assert task.status is TaskStatus.COMPLETED, task.error
            assert mid_run == [0.37]  # written mid-run, visible to readers
            assert task.progress == 1.0
            assert task.to_dict()["progress"] == 1.0
        finally:
            db.close()

    @pytest.mark.slow
    def test_real_scene_pipeline_reports(self, tmp_path):
        """The actual scene pipeline emits monotonically growing fractions."""
        from eioku_tpu.ml.scenes import detect_scenes

        video = str(tmp_path / "real.mp4")
        _write_video(video, n_frames=40)
        seen: list[float] = []
        with progress.reporting(seen.append):
            detect_scenes(video, batch_size=8, sample_fps=10.0)
        assert seen, "scene pipeline reported nothing"
        assert seen == sorted(seen)
        assert seen[-1] > 0.5
