"""Crash-recovery integration: SIGKILL a worker mid-task, then verify the
reconciler + lease machinery bring the task back to completion.

The reference's recovery story (SURVEY.md §3.5, §5) is the reconciler: RUNNING
tasks whose queue job vanished are reset to PENDING and re-enqueued
(backend/src/workers/reconciler.py:182-284). Here the equivalent flow is
lease expiry (queue) + Reconciler.run() (services), exercised against a real
killed OS process — coverage the reference itself never had.
"""
import json
import os
import signal
import sqlite3
import subprocess
import sys
import time

import pytest

from tests.test_ml_pipeline import write_video

pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast selection

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_worker_sigkill_then_reconcile_completes(tmp_path):
    vids = tmp_path / "vids"
    vids.mkdir()
    # long enough that scene detection is still running ~1 s in
    write_video(str(vids / "clip.mp4"),
                [(90, (200, 30, 30)), (90, (30, 200, 30)), (90, (30, 30, 200))],
                fps=12)
    db = f"sqlite:///{tmp_path}/e.db"
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "paths": [str(vids)], "database_url": db, "auto_discover": True,
        "active_task_types": ["scene_detection"], "semantic_search": False,
    }))

    from eioku_tpu.api.app import build_context
    from eioku_tpu.config.settings import load_config
    from eioku_tpu.domain.models import TaskStatus

    config = load_config(str(cfg_path))
    ctx = build_context(config)
    from eioku_tpu.domain.models import PathConfig
    ctx.paths.save(PathConfig(path=str(vids)))  # lifespan normally does this
    report = ctx.discovery.discover(enqueue=True)
    assert report.tasks_enqueued == 1

    env = dict(os.environ, JAX_PLATFORMS="cpu", EIOKU_FORCE_CPU="1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    worker = subprocess.Popen(
        [sys.executable, "-m", "eioku_tpu.workers.main", "--config",
         str(cfg_path), "--once"],
        env=env, cwd=REPO, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    try:
        # wait until the task is actually RUNNING, then kill -9 mid-flight
        deadline = time.time() + 480
        while time.time() < deadline:
            tasks = ctx.tasks.find(limit=10)
            if tasks and tasks[0].status is TaskStatus.RUNNING:
                break
            if worker.poll() is not None:
                pytest.fail("worker exited before the task started running")
            time.sleep(0.1)
        else:
            pytest.fail("task never reached RUNNING")
        os.kill(worker.pid, signal.SIGKILL)
        worker.wait(timeout=30)
    finally:
        if worker.poll() is None:
            worker.kill()

    # the task is stranded RUNNING with a live lease
    t = ctx.tasks.find(limit=1)[0]
    assert t.status is TaskStatus.RUNNING

    # backdate the lease (the real clock would take timeout_s to get there)
    db_file = str(tmp_path / "e.db")
    with sqlite3.connect(db_file) as conn:
        conn.execute("UPDATE jobs SET lease_expires_at='2000-01-01T00:00:00'"
                     " WHERE status='running'")
        conn.commit()

    report = ctx.reconciler.run()
    assert report.leases_requeued == 1
    t = ctx.tasks.find(limit=1)[0]
    assert t.status is TaskStatus.PENDING

    # a fresh worker completes the recovered task
    done = subprocess.run(
        [sys.executable, "-m", "eioku_tpu.workers.main", "--config",
         str(cfg_path), "--once"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=480)
    assert done.returncode == 0, done.stdout + done.stderr
    t = ctx.tasks.find(limit=1)[0]
    assert t.status is TaskStatus.COMPLETED
    arts = ctx.artifacts.get_by_asset(t.video_id, artifact_type="scene")
    assert arts, "recovered task produced no artifacts"


class TestCorruptionRecovery:
    """Spec req 7.4: detect corruption, attempt recovery, notify the user."""

    def _make_corrupt_db(self, tmp_path):
        from eioku_tpu.db.connection import Database
        from eioku_tpu.db.migrations import run_migrations
        from eioku_tpu.domain.artifacts import ArtifactEnvelope
        from eioku_tpu.domain.schema_registry import register_all_schemas
        from eioku_tpu.repositories.artifact_repository import (
            ArtifactRepository,
        )
        from eioku_tpu.services.projection_sync import ProjectionSyncService

        register_all_schemas()
        p = str(tmp_path / "e.db")
        db = Database(f"sqlite:///{p}")
        run_migrations(db)
        db.execute("INSERT INTO videos (id, path, created_at)"
                   " VALUES ('v1','/a.mp4','2026-08-18T00:00:00Z')")
        repo = ArtifactRepository(db, ProjectionSyncService(db).sync_artifact)
        repo.create(ArtifactEnvelope(
            artifact_id="a1", asset_id="v1",
            artifact_type="transcript.segment", schema_version=1,
            span_start_ms=0, span_end_ms=1000,
            payload_json={"text": "salvage me", "language": "en",
                          "start_ms": 0, "end_ms": 1000},
            producer="t", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="r1"))
        db.close()
        size = os.path.getsize(p)
        with open(p, "r+b") as f:
            f.seek(size // 2)
            f.write(b"\xde\xad\xbe\xef" * 256)
        return p

    def test_salvage_preserves_rows_and_backup(self, tmp_path):
        from eioku_tpu.db.connection import Database
        from eioku_tpu.db.recovery import check_and_recover

        p = self._make_corrupt_db(tmp_path)
        rep = check_and_recover(p)
        assert rep["ok"] is False and rep["recovered"] is True
        assert rep["tables"]["videos"]["copied"] == 1
        assert rep["tables"]["artifacts"]["copied"] == 1
        assert os.path.isfile(rep["corrupt_backup"])
        db = Database(f"sqlite:///{p}")
        assert db.scalar("SELECT COUNT(*) FROM videos") == 1
        # recovered file passes integrity
        assert db.scalar("PRAGMA quick_check(1)") == "ok"
        db.close()

    def test_startup_recovers_rebuilds_fts_and_degrades_health(self, tmp_path):
        """build_context over a corrupt db must come up serving, with FTS
        rebuilt from salvaged artifacts and /health reporting the event."""
        from eioku_tpu.api.app import build_context, create_app
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.web.testing import TestClient

        p = self._make_corrupt_db(tmp_path)
        ctx = build_context(AppConfig(scan_paths=[], auto_discover=False,
                                      database_url=f"sqlite:///{p}"))
        app = create_app(ctx=ctx, start_reconciler=False)
        with TestClient(app) as c:
            h = c.get("/health").json()
            assert h["status"] == "degraded"
            assert h["db_recovery"]["recovered"] is True
            # FTS was rebuilt from the salvaged artifacts table
            r = c.get("/api/v1/videos/v1/find?q=salvage").json()
            assert r["total"] == 1
        ctx.db.close()

    def test_healthy_db_reports_ok(self, tmp_path):
        from eioku_tpu.db.recovery import check_and_recover

        from eioku_tpu.db.connection import Database
        from eioku_tpu.db.migrations import run_migrations

        p = str(tmp_path / "ok.db")
        db = Database(f"sqlite:///{p}")
        run_migrations(db)
        db.close()
        rep = check_and_recover(p)
        assert rep == {"checked": True, "ok": True, "recovered": False,
                       "detail": "ok"}

    def test_salvage_survives_unreadable_schema_migrations(self, tmp_path):
        """Corruption on the early pages (schema_migrations unreadable) must
        still produce a bootable recovered db: the fresh migration rows stay,
        so the next run_migrations is a no-op instead of re-CREATE-ing
        tables (review-found startup brick)."""
        from eioku_tpu.api.app import build_context
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.db.recovery import check_and_recover

        p = self._make_corrupt_db(tmp_path)
        # additionally clobber the first pages after the sqlite header
        with open(p, "r+b") as f:
            f.seek(120)
            f.write(b"\xde\xad\xbe\xef" * 512)
        rep = check_and_recover(p)
        assert rep["ok"] is False
        if not rep["recovered"]:
            pytest.skip("file too damaged for salvage on this layout")
        # startup over the recovered file must not crash on re-migration
        ctx = build_context(AppConfig(scan_paths=[], auto_discover=False,
                                      database_url=f"sqlite:///{p}"))
        assert ctx.db.scalar("SELECT COUNT(*) FROM schema_migrations") >= 6
        ctx.db.close()
