"""Real multi-process integration: API server and ML worker as separate OS
processes sharing one sqlite database (WAL), driven over HTTP.

This is the deployment topology (the reference ran 3 containers); everything
before this file tests in-process. Marked slow-ish (~30 s) but CPU-only.
"""
import json
import os
import subprocess
import sys
import time
import urllib.request

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast selection

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


@pytest.fixture()
def env(tmp_path):
    e = dict(os.environ)
    # EIOKU_FORCE_CPU applies the full backend-override recipe in the child:
    # the image's sitecustomize pins the TPU platform via jax.config, so the
    # env var alone is not enough (utils/device.py).
    e["JAX_PLATFORMS"] = "cpu"
    e["EIOKU_FORCE_CPU"] = "1"
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    return e


def test_api_and_worker_processes(tmp_path, env):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ml_pipeline import write_video

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(str(videos / "clip.mp4"),
                [(10, (200, 30, 30)), (10, (30, 200, 30))], fps=5, size=(96, 64))
    cfg = {
        "paths": [str(videos)],
        "database_url": f"sqlite:///{tmp_path}/mp.db",
        "auto_discover": True,
        "active_task_types": ["metadata_extraction", "scene_detection"],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    port = 8000 + (os.getpid() % 2000)
    api = subprocess.Popen(
        [sys.executable, "-m", "eioku_tpu.api.main", "--config", str(cfg_path),
         "--host", "127.0.0.1", "--port", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(300):
            try:
                if _get(base + "/health")["status"] == "ok":
                    break
            except Exception:
                time.sleep(0.3)
        else:
            pytest.fail("API server never came up")

        # discovery at startup created + enqueued tasks (poll: under load the
        # server can answer /health before startup discovery has committed)
        for _ in range(150):
            tasks = _get(base + "/api/v1/tasks")
            if tasks["total"] == 2:
                break
            time.sleep(0.3)
        assert tasks["total"] == 2

        worker = subprocess.run(
            [sys.executable, "-m", "eioku_tpu.workers.main", "--config",
             str(cfg_path), "--once"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=480)
        assert worker.returncode == 0, worker.stdout + worker.stderr

        tasks = _get(base + "/api/v1/tasks")["tasks"]
        assert {t["status"] for t in tasks} == {"completed"}, tasks
        vid = _get(base + "/api/v1/videos")["videos"][0]
        assert vid["duration_ms"] == 4000  # metadata task updated the row
        scenes = _get(base + f"/api/v1/videos/{vid['id']}/artifacts"
                      "?type=scene")
        assert scenes["total"] == 2
        jump = _get(base + f"/api/v1/videos/{vid['id']}/jump"
                    "?kind=scene&from_ms=500&direction=next")
        assert jump["found"] and abs(jump["jump_to"]["start_ms"] - 2000) <= 400
    finally:
        api.terminate()
        try:
            api.wait(timeout=10)
        except subprocess.TimeoutExpired:
            api.kill()
