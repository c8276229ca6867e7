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
