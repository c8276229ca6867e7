"""API tests over the ASGI app via httpx (no sockets), with a real sqlite DB and
the in-process queue — mirroring the reference's TestClient + mocked-producer
strategy (/root/reference/backend/tests/test_api.py:14-60)."""

import httpx
import numpy as np
import pytest

from eioku_tpu.api.app import build_context, create_app
from eioku_tpu.config.settings import AppConfig
from eioku_tpu.db.connection import Database
from eioku_tpu.domain.artifacts import ArtifactEnvelope, new_id


@pytest.fixture()
def ctx(tmp_path):
    config = AppConfig(scan_paths=[], auto_discover=False)
    db = Database(f"sqlite:///{tmp_path}/api.db")
    c = build_context(config, db=db)
    yield c
    db.close()


@pytest.fixture()
def client(ctx):
    from eioku_tpu.web.testing import TestClient
    app = create_app(ctx=ctx, start_reconciler=False)
    with TestClient(app) as c:
        yield c


def seed_video(ctx, path="/tmp/nonexistent.mp4"):
    from eioku_tpu.domain.models import Video
    v = Video(path=path, file_hash="h", size_bytes=123)
    ctx.videos.save(v)
    return v


def seed_transcript(ctx, video_id, run="r1"):
    envs = [
        ArtifactEnvelope(
            artifact_id=new_id(), asset_id=video_id, artifact_type="transcript.segment",
            schema_version=1, span_start_ms=s, span_end_ms=s + 2000,
            payload_json={"text": t, "language": "en", "start_ms": s, "end_ms": s + 2000},
            producer="whisper-jax", producer_version="0.1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id=run)
        for s, t in [(0, "hello world"), (2000, "a red fox appears"),
                     (4000, "goodbye world")]
    ]
    ctx.artifacts.batch_create(envs)
    return envs


class TestRootAndHealth:
    def test_root_serves_spa(self, client):
        r = client.get("/")
        assert r.status_code == 200
        assert "text/html" in r.headers["content-type"]
        assert "Eioku" in r.text

    def test_static_assets(self, client):
        assert client.get("/static/app.js").status_code == 200
        assert client.get("/static/style.css").status_code == 200
        assert client.get("/static/../api/app.py").status_code in (404, 400)

    def test_tasks_stream_sse(self, client, ctx):
        """GET /tasks/stream: live task progress as Server-Sent Events (the
        SPA's Tasks tab subscribes instead of polling). Bounded read via
        max_events so the test completes."""
        from eioku_tpu.domain.models import Task
        v = seed_video(ctx)
        ctx.tasks.save(Task(video_id=v.id, task_type="transcription"))
        r = client.get("/api/v1/tasks/stream?max_events=1&interval=0.2")
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/event-stream")
        line = [ln for ln in r.text.splitlines() if ln.startswith("data: ")][0]
        import json as _json
        snap = _json.loads(line[len("data: "):])
        assert snap["counts"].get("pending") == 1
        assert snap["recent"][0]["task_type"] == "transcription"
        # the literal path still routes ahead of /tasks/{task_id}
        assert client.get("/api/v1/tasks/definitely-missing").status_code == 404

    def test_openapi_and_docs(self, client):
        """FastAPI-parity discovery surface: /openapi.json generated from the
        route table, /docs a self-contained reference page (no CDN assets —
        zero-egress deployments)."""
        spec = client.get("/openapi.json").json()
        assert spec["openapi"] == "3.1.0"
        ops = {f"{m.upper()} {p}" for p, ms in spec["paths"].items()
               for m in ms}
        for needed in ("GET /api/v1/videos", "GET /api/v1/search",
                       "POST /api/v1/tasks", "GET /health",
                       "GET /api/v1/videos/{video_id}/jump"):
            assert any(o.startswith(needed.split("{")[0]) and
                       (("{" not in needed) or "{" in o) for o in ops
                       if o.split()[0] == needed.split()[0]), needed
        # path params are declared
        jump = spec["paths"].get("/api/v1/videos/{video_id}/jump", {})
        params = jump.get("get", {}).get("parameters", [])
        assert any(p["name"] == "video_id" and p["in"] == "path"
                   for p in params)
        # static mounts are not API surface
        assert not any("{filepath}" in p for p in spec["paths"])
        r = client.get("/docs")
        assert r.status_code == 200
        assert "text/html" in r.headers["content-type"]
        assert "openapi.json" in r.text

    def test_api_root(self, client):
        r = client.get("/api/v1")
        assert r.status_code == 200 and r.json()["name"] == "eioku-tpu"

    def test_metrics_and_device(self, client):
        m = client.get("/api/v1/metrics")
        assert m.status_code == 200 and "queue" in m.json()
        d = client.get("/api/v1/device")
        assert d.status_code == 200 and d.json()["device_count"] >= 1

    def test_stats(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        r = client.get("/api/v1/stats")
        assert r.status_code == 200
        s = r.json()
        assert s["videos"]["total"] == 1
        assert s["videos"]["by_status"] == {"discovered": 1}
        assert s["artifacts"]["by_type"]["transcript.segment"] >= 1
        assert s["artifacts"]["total"] == s["artifacts"]["by_type"]["transcript.segment"]
        assert "chunks" in s["semantic_index"] and s["runs"] >= 0

    def test_metrics_prometheus_format(self, client):
        from eioku_tpu.utils.metrics import METRICS
        METRICS.inc("http_requests", path="/x")
        with METRICS.timer("request_seconds"):
            pass
        r = client.get("/api/v1/metrics?format=prometheus")
        assert r.status_code == 200
        assert "version=0.0.4" in r.headers["content-type"]
        text = r.text
        assert '# TYPE eioku_http_requests counter' in text
        assert 'eioku_http_requests{path="/x"}' in text
        assert "# TYPE eioku_request_seconds_seconds histogram" in text
        assert 'le="+Inf"' in text and "_count 1" in text
        # cumulative buckets: the +Inf bucket equals the count
        import re as _re
        inf = _re.search(
            r'eioku_request_seconds_seconds_bucket\{le="\+Inf"\} (\d+)', text)
        cnt = _re.search(r"eioku_request_seconds_seconds_count (\d+)", text)
        assert inf.group(1) == cnt.group(1)

    def test_prometheus_type_once_and_escaping(self, client):
        """The format forbids repeated TYPE lines per metric name, and label
        values with commas/quotes must render escaped, not crash."""
        from eioku_tpu.utils.metrics import METRICS
        METRICS.inc("tasks_done", task_type="a")
        METRICS.inc("tasks_done", task_type="b")
        METRICS.inc("paths_seen", path='/a,b"c')
        r = client.get("/api/v1/metrics?format=prometheus")
        assert r.status_code == 200
        text = r.text
        assert text.count("# TYPE eioku_tasks_done counter") == 1
        assert 'eioku_tasks_done{task_type="a"}' in text
        assert 'eioku_tasks_done{task_type="b"}' in text
        assert 'eioku_paths_seen{path="/a,b\\"c"}' in text

    def test_tasks_stream_bad_params(self, client):
        assert client.get(
            "/api/v1/tasks/stream?interval=abc").status_code == 422
        assert client.get(
            "/api/v1/tasks/stream?interval=inf").status_code == 422
        assert client.get(
            "/api/v1/tasks/stream?timeout=nan").status_code == 422
        # interval above timeout clamps instead of sleeping past the deadline
        r = client.get(
            "/api/v1/tasks/stream?timeout=0.3&interval=60&max_events=1")
        assert r.status_code == 200

    def test_health(self, client):
        assert client.get("/health").json()["status"] == "ok"

    def test_404(self, client):
        assert client.get("/nope").status_code == 404

    def test_405(self, client):
        r = client.delete("/health")
        assert r.status_code == 405 and "GET" in r.headers["allow"]


class TestVideos:
    def test_create_and_get(self, client):
        r = client.post("/api/v1/videos", json={"path": "/a.mp4"})
        assert r.status_code == 201
        vid = r.json()["id"]
        assert client.get(f"/api/v1/videos/{vid}").json()["path"] == "/a.mp4"
        # duplicate path -> 409
        assert client.post("/api/v1/videos", json={"path": "/a.mp4"}).status_code == 409

    def test_validation_error(self, client):
        assert client.post("/api/v1/videos", json={}).status_code == 422
        assert client.post("/api/v1/videos", content=b"not json",
                           headers={"content-type": "application/json"}).status_code == 400

    def test_list(self, client, ctx):
        seed_video(ctx, "/x1.mp4")
        seed_video(ctx, "/x2.mp4")
        body = client.get("/api/v1/videos").json()
        assert body["total"] == 2 and len(body["videos"]) == 2

    def test_missing_video_404(self, client):
        assert client.get("/api/v1/videos/nope").status_code == 404

    def test_upload(self, client, ctx, tmp_path):
        import os

        from eioku_tpu.domain.models import PathConfig

        # no library path configured yet -> 503
        r = client.put("/api/v1/videos/upload?filename=a.mp4", content=b"xx")
        assert r.status_code == 503
        lib = tmp_path / "lib"
        ctx.paths.save(PathConfig(path=str(lib)))
        # guardrails
        assert client.put("/api/v1/videos/upload?filename=../evil.mp4",
                          content=b"x").status_code == 422
        assert client.put("/api/v1/videos/upload?filename=a.exe",
                          content=b"x").status_code == 415
        assert client.put("/api/v1/videos/upload?filename=a.mp4",
                          content=b"").status_code == 422
        # happy path: file lands in the library dir, video + tasks created
        r = client.put("/api/v1/videos/upload?filename=clip.mp4",
                       content=b"\x00" * 4096)
        assert r.status_code == 201, r.text
        body = r.json()
        assert body["bytes"] == 4096
        assert body["video"]["path"] == str(lib / "clip.mp4")
        assert os.path.getsize(lib / "clip.mp4") == 4096
        assert body["tasks_created"] > 0
        assert ctx.videos.get(body["video"]["id"]) is not None
        # duplicate filename -> 409, no partial files left behind
        r = client.put("/api/v1/videos/upload?filename=clip.mp4",
                       content=b"y")
        assert r.status_code == 409
        assert [p for p in os.listdir(lib) if p.endswith(".part")] == []

    def test_transcript_with_speakers(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        ctx.artifacts.batch_create([ArtifactEnvelope(
            artifact_id=new_id(), asset_id=v.id, artifact_type="speaker.turn",
            schema_version=1, span_start_ms=0, span_end_ms=3000,
            payload_json={"label": "SPEAKER_00", "start_ms": 0, "end_ms": 3000,
                          "confidence": 0.9},
            producer="p", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="rs")])
        r = client.get(f"/api/v1/videos/{v.id}/artifacts"
                       "?type=transcript.segment&with_speakers=1")
        arts = r.json()["artifacts"]
        by_start = {a["span_start_ms"]: a["payload_json"].get("speaker")
                    for a in arts}
        assert by_start[0] == "SPEAKER_00"       # inside the turn
        assert by_start[2000] == "SPEAKER_00"    # overlaps 2000-3000
        assert by_start[4000] is None            # past the only turn
        # without the flag, payloads stay untouched
        r = client.get(f"/api/v1/videos/{v.id}/artifacts?type=transcript.segment")
        assert all("speaker" not in a["payload_json"]
                   for a in r.json()["artifacts"])

    def test_with_speakers_uses_latest_diarization_run(self, client, ctx):
        # turns come from the selection policy (default latest run), so the
        # transcript join agrees with the Speakers tab after a re-run
        import time
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)

        def turn(run, label, created_shift):
            return ArtifactEnvelope(
                artifact_id=new_id(), asset_id=v.id, artifact_type="speaker.turn",
                schema_version=1, span_start_ms=0, span_end_ms=3000,
                payload_json={"label": label, "start_ms": 0, "end_ms": 3000,
                              "confidence": 0.9},
                producer="p", producer_version="1", model_profile="balanced",
                config_hash="c", input_hash="i", run_id=run)
        ctx.artifacts.batch_create([turn("r_old", "SPEAKER_01", 0)])
        time.sleep(0.01)
        ctx.artifacts.batch_create([turn("r_new", "SPEAKER_00", 1)])
        r = client.get(f"/api/v1/videos/{v.id}/artifacts"
                       "?type=transcript.segment&with_speakers=1")
        speakers = {a["payload_json"]["speaker"] for a in r.json()["artifacts"]
                    if a["payload_json"].get("speaker")}
        assert speakers == {"SPEAKER_00"}

    def test_patch_status(self, client, ctx):
        # reference: video_controller.py:76-93
        v = seed_video(ctx)
        r = client.patch(f"/api/v1/videos/{v.id}", json={"status": "processed"})
        assert r.status_code == 200 and r.json()["status"] == "processed"
        assert ctx.videos.get(v.id).status.value == "processed"
        # no-op body returns current state; bad status rejected
        assert client.patch(f"/api/v1/videos/{v.id}", json={}).status_code == 200
        r = client.patch(f"/api/v1/videos/{v.id}", json={"status": "bogus"})
        assert r.status_code == 422

    def test_delete_cascades(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        r = client.delete(f"/api/v1/videos/{v.id}")
        assert r.status_code == 200
        assert client.get(f"/api/v1/videos/{v.id}/artifacts").status_code == 404


class TestStreaming:
    def test_stream_full_and_range(self, client, ctx, tmp_path):
        payload = bytes(range(256)) * 40
        f = tmp_path / "clip.mp4"
        f.write_bytes(payload)
        v = seed_video(ctx, str(f))
        r = client.get(f"/api/v1/videos/{v.id}/stream")
        assert r.status_code == 200 and r.content == payload
        assert r.headers["accept-ranges"] == "bytes"
        r = client.get(f"/api/v1/videos/{v.id}/stream", headers={"range": "bytes=0-99"})
        assert r.status_code == 206 and len(r.content) == 100
        assert r.headers["content-range"] == f"bytes 0-99/{len(payload)}"
        r = client.get(f"/api/v1/videos/{v.id}/stream", headers={"range": "bytes=-100"})
        assert r.status_code == 206 and r.content == payload[-100:]
        r = client.get(f"/api/v1/videos/{v.id}/stream",
                       headers={"range": f"bytes={len(payload) + 10}-"})
        assert r.status_code == 416
        # RFC 9110: inverted range is ignored -> 200 with the full body
        r = client.get(f"/api/v1/videos/{v.id}/stream",
                       headers={"range": "bytes=500-100"})
        assert r.status_code == 200 and r.content == payload

    def test_invalid_status_filters_return_422(self, client):
        assert client.get("/api/v1/videos?status=bogus").status_code == 422
        assert client.get("/api/v1/tasks?status=bogus").status_code == 422

    def test_stream_missing_file(self, client, ctx):
        v = seed_video(ctx, "/definitely/not/here.mp4")
        assert client.get(f"/api/v1/videos/{v.id}/stream").status_code == 404

    def test_thumbnail_generated_and_cached(self, client, ctx, tmp_path):
        import cv2
        import numpy as np

        f = tmp_path / "clip.mp4"
        w = cv2.VideoWriter(str(f), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (96, 64))
        for i in range(20):
            w.write(np.full((64, 96, 3), 40 + 8 * i, np.uint8))
        w.release()
        v = seed_video(ctx, str(f))
        r = client.get(f"/api/v1/videos/{v.id}/thumbnail")
        assert r.status_code == 200
        assert r.headers["content-type"] == "image/jpeg"
        assert r.content[:2] == b"\xff\xd8"  # JPEG SOI
        # second hit serves the cached file (identical bytes)
        r2 = client.get(f"/api/v1/videos/{v.id}/thumbnail")
        assert r2.status_code == 200 and r2.content == r.content

    def test_thumbnail_missing_file_404(self, client, ctx):
        v = seed_video(ctx, "/definitely/not/here.mp4")
        assert client.get(f"/api/v1/videos/{v.id}/thumbnail").status_code == 404


class TestArtifactsEndpoints:
    def test_artifacts_listing_and_filters(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        body = client.get(f"/api/v1/videos/{v.id}/artifacts",
                          params={"type": "transcript.segment"}).json()
        assert body["total"] == 3
        body = client.get(f"/api/v1/videos/{v.id}/artifacts",
                          params={"type": "transcript.segment",
                                  "start_ms": 2000, "end_ms": 2100}).json()
        assert body["total"] == 1  # [2000,2100) overlaps only the 2000-4000 segment

    def test_runs_and_profiles(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id, run="r1")
        seed_transcript(ctx, v.id, run="r2")
        runs = client.get(f"/api/v1/videos/{v.id}/runs").json()["runs"]
        assert {r["run_id"] for r in runs} == {"r1", "r2"}
        assert runs[0]["language"] == "en"
        profiles = client.get(f"/api/v1/videos/{v.id}/profiles").json()["profiles"]
        assert profiles[0]["model_profile"] == "balanced"

    def test_selection_endpoints(self, client, ctx):
        v = seed_video(ctx)
        r = client.get(f"/api/v1/videos/{v.id}/selection/transcript.segment")
        assert r.json()["mode"] == "latest"
        r = client.put(f"/api/v1/videos/{v.id}/selection/transcript.segment",
                       json={"mode": "pinned", "run_id": "r1"})
        assert r.status_code == 200
        r = client.get(f"/api/v1/videos/{v.id}/selection/transcript.segment")
        assert r.json() == {"mode": "pinned", "run_id": "r1", "model_profile": None}
        # invalid policy
        r = client.put(f"/api/v1/videos/{v.id}/selection/transcript.segment",
                       json={"mode": "pinned"})
        assert r.status_code == 422
        # clear resets to default
        r = client.delete(f"/api/v1/videos/{v.id}/selection/transcript.segment")
        assert r.json()["cleared"] is True
        r = client.get(f"/api/v1/videos/{v.id}/selection/transcript.segment")
        assert r.json()["mode"] == "latest"

    def test_selection_applied_to_artifacts(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id, run="r1")
        import time
        time.sleep(0.01)
        seed_transcript(ctx, v.id, run="r2")
        body = client.get(f"/api/v1/videos/{v.id}/artifacts",
                          params={"type": "transcript.segment"}).json()
        assert {a["run_id"] for a in body["artifacts"]} == {"r2"}  # default latest
        body = client.get(f"/api/v1/videos/{v.id}/artifacts",
                          params={"type": "transcript.segment", "run_id": "r1"}).json()
        assert {a["run_id"] for a in body["artifacts"]} == {"r1"}

    def test_find(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        body = client.get(f"/api/v1/videos/{v.id}/find",
                          params={"q": "fox", "from_ms": 0}).json()
        assert body["total"] == 1
        assert body["matches"][0]["jump_to"]["start_ms"] == 2000
        assert client.get(f"/api/v1/videos/{v.id}/find").status_code == 422

    def test_jump(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        body = client.get(f"/api/v1/videos/{v.id}/jump",
                          params={"kind": "transcript", "from_ms": 1000,
                                  "direction": "next"}).json()
        assert body["found"] and body["jump_to"]["start_ms"] == 2000
        body = client.get(f"/api/v1/videos/{v.id}/jump",
                          params={"kind": "transcript", "from_ms": 99999,
                                  "direction": "next"}).json()
        assert not body["found"]
        assert client.get(f"/api/v1/videos/{v.id}/jump").status_code == 422
        assert client.get(f"/api/v1/videos/{v.id}/jump",
                          params={"kind": "transcript",
                                  "direction": "sideways"}).status_code == 422


class TestPathsAndDiscovery:
    def test_add_list_delete(self, client):
        r = client.post("/api/v1/paths", json={"path": "/videos", "recursive": True})
        assert r.status_code == 201
        assert len(client.get("/api/v1/paths").json()["paths"]) == 1
        assert client.delete("/api/v1/paths", params={"path": "/videos"}).status_code == 200
        assert client.delete("/api/v1/paths", params={"path": "/gone"}).status_code == 404

    def test_discover_creates_tasks(self, client, ctx, tmp_path):
        import cv2
        vid_path = str(tmp_path / "t.mp4")
        w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
        for _ in range(5):
            w.write(np.zeros((32, 32, 3), np.uint8))
        w.release()
        client.post("/api/v1/paths", json={"path": str(tmp_path)})
        report = client.post("/api/v1/paths/discover").json()
        assert report["videos_new"] == 1
        assert report["tasks_created"] == 7  # 7 active types, single language each
        assert report["tasks_enqueued"] == 7
        tasks = client.get("/api/v1/tasks").json()
        assert tasks["total"] == 7
        # discovery is idempotent
        report = client.post("/api/v1/paths/discover").json()
        assert report["videos_new"] == 0 and report["tasks_created"] == 0

    def test_validate_removes_missing(self, client, ctx):
        seed_video(ctx, "/gone/file.mp4")
        report = client.post("/api/v1/paths/validate").json()
        assert report["videos_removed"] == 1


class TestTaskLifecycle:
    def _seed_task(self, ctx, status=None):
        from eioku_tpu.domain.models import Task, TaskStatus
        v = seed_video(ctx)
        t = Task(video_id=v.id, task_type="scene_detection")
        ctx.tasks.save(t)
        if status == "failed":
            ctx.tasks.update_status(t.id, TaskStatus.RUNNING)
            ctx.tasks.update_status(t.id, TaskStatus.FAILED, error="x")
        return t

    def test_enqueue(self, client, ctx):
        t = self._seed_task(ctx)
        r = client.post(f"/api/v1/tasks/{t.id}/enqueue")
        assert r.status_code == 200 and r.json()["enqueued"]
        # second enqueue dedups
        assert client.post(f"/api/v1/tasks/{t.id}/enqueue").json()["enqueued"] is False

    def test_cancel(self, client, ctx):
        t = self._seed_task(ctx)
        client.post(f"/api/v1/tasks/{t.id}/enqueue")
        r = client.post(f"/api/v1/tasks/{t.id}/cancel")
        assert r.json()["status"] == "cancelled"
        assert client.post(f"/api/v1/tasks/{t.id}/cancel").status_code == 409

    def test_retry(self, client, ctx):
        t = self._seed_task(ctx, status="failed")
        r = client.post(f"/api/v1/tasks/{t.id}/retry")
        assert r.json()["status"] == "pending"
        assert ctx.producer.job_exists(t.id)

    def test_retry_requires_terminal(self, client, ctx):
        t = self._seed_task(ctx)
        assert client.post(f"/api/v1/tasks/{t.id}/retry").status_code == 409

    def test_reconcile_endpoint(self, client, ctx):
        t = self._seed_task(ctx)
        report = client.post("/api/v1/tasks/reconcile").json()
        assert report["pending_reenqueued"] == 1

    def test_task_list_cap(self, client, ctx):
        r = client.get("/api/v1/tasks", params={"limit": 5000})
        assert r.status_code == 200  # capped internally at 100


class TestSearchGate:
    def test_search_empty_index_returns_no_results(self, client):
        r = client.get("/api/v1/search", params={"q": "fox"})
        assert r.status_code == 200 and r.json()["results"] == []
        assert client.get("/api/v1/search").status_code == 422

    def test_search_503_when_disabled(self, tmp_path):
        from eioku_tpu.web.testing import TestClient
        config = AppConfig(scan_paths=[], auto_discover=False,
                           semantic_search=False)
        db = Database(f"sqlite:///{tmp_path}/nosearch.db")
        app = create_app(ctx=build_context(config, db=db), start_reconciler=False)
        with TestClient(app) as c:
            assert c.get("/api/v1/search", params={"q": "x"}).status_code == 503
        db.close()


class TestRoutesListing:
    def test_routes_endpoint(self, client):
        routes = client.get("/api/v1/routes").json()["routes"]
        assert "GET /api/v1/videos/{video_id}/jump" in routes
        assert "POST /api/v1/tasks/{task_id}/retry" in routes
        assert len(routes) > 20


class TestVideoDeletionCleanup:
    def test_find_returns_nothing_after_delete(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        assert client.get(f"/api/v1/videos/{v.id}/find",
                          params={"q": "fox"}).json()["total"] == 1
        client.delete(f"/api/v1/videos/{v.id}")
        # orphaned FTS rows must be gone (find requires the video, so check DB)
        assert ctx.db.scalar(
            "SELECT COUNT(*) FROM transcript_fts_meta WHERE asset_id=?",
            (v.id,)) == 0


class TestSearchSuggestions:
    """Spec req 2.4: a query with no results must offer alternative terms."""

    def test_find_no_results_suggests_near_terms(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        r = client.get(f"/api/v1/videos/{v.id}/find?q=foxx")
        assert r.status_code == 200
        body = r.json()
        assert body["total"] == 0
        assert "fox" in body["suggestions"]

    def test_search_no_results_suggests(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        r = client.get("/api/v1/search?q=zzzqqq&mode=keyword")
        body = r.json()
        assert body["total"] == 0
        # nothing similar -> most frequent library terms as discovery hints
        assert body["suggestions"]

    def test_results_have_no_suggestions_key(self, client, ctx):
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        body = client.get(f"/api/v1/videos/{v.id}/find?q=fox").json()
        assert body["total"] > 0 and "suggestions" not in body


class TestGallerySortFilter:
    """Spec req 8.4: sorting and filtering by date, filename, or duration."""

    def _seed(self, ctx):
        from eioku_tpu.domain.models import Video
        for p, d in (("/lib/beta.mp4", 5000), ("/lib/alpha.mp4", 9000),
                     ("/lib/gamma.mov", 1000)):
            v = Video(path=p, file_hash="h", size_bytes=1)
            v.duration_ms = d
            ctx.videos.save(v)

    def test_sort_by_path(self, client, ctx):
        self._seed(ctx)
        r = client.get("/api/v1/videos?sort_by=path&order=asc")
        names = [v["path"] for v in r.json()["videos"]]
        assert names == sorted(names)

    def test_sort_by_duration_desc(self, client, ctx):
        self._seed(ctx)
        r = client.get("/api/v1/videos?sort_by=duration_ms&order=desc")
        durs = [v["duration_ms"] for v in r.json()["videos"]]
        assert durs == sorted(durs, reverse=True)

    def test_name_filter(self, client, ctx):
        self._seed(ctx)
        body = client.get("/api/v1/videos?q=alpha").json()
        vids = body["videos"]
        assert len(vids) == 1 and "alpha" in vids[0]["path"]
        assert body["total"] == 1  # total matches the filter, not table size

    def test_unknown_sort_rejected(self, client, ctx):
        assert client.get("/api/v1/videos?sort_by=evil").status_code == 422


class TestTimestampedThumbnail:
    """Spec req 3.2: search results show a preview of the matched scene —
    thumbnails can be requested at a specific timestamp."""

    def _clip(self, tmp_path):
        import cv2
        f = tmp_path / "tclip.mp4"
        w = cv2.VideoWriter(str(f), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (96, 64))
        for _ in range(10):  # 0..1 s: dark
            w.write(np.full((64, 96, 3), 10, np.uint8))
        for _ in range(10):  # 1..2 s: bright
            w.write(np.full((64, 96, 3), 230, np.uint8))
        w.release()
        return f

    def test_at_ms_picks_the_right_frame(self, client, ctx, tmp_path):
        v = seed_video(ctx, str(self._clip(tmp_path)))
        early = client.get(f"/api/v1/videos/{v.id}/thumbnail?at_ms=100")
        late = client.get(f"/api/v1/videos/{v.id}/thumbnail?at_ms=1500")
        assert early.status_code == late.status_code == 200
        assert early.content != late.content  # dark vs bright frame
        # per-second cache: same bucket serves identical bytes
        again = client.get(f"/api/v1/videos/{v.id}/thumbnail?at_ms=1900")
        assert again.content == late.content

    def test_past_end_falls_back(self, client, ctx, tmp_path):
        v = seed_video(ctx, str(self._clip(tmp_path)))
        r = client.get(f"/api/v1/videos/{v.id}/thumbnail?at_ms=99000")
        assert r.status_code == 200 and r.content[:2] == b"\xff\xd8"


class TestDiskSpaceWarning:
    """Spec req 7.5: warn before running out of disk space."""

    def test_health_reports_disk(self, client):
        h = client.get("/health").json()
        assert h["disk"]["checked"] is True
        assert h["disk"]["free_gb"] >= 0

    def test_low_disk_degrades_health(self, client, monkeypatch):
        import eioku_tpu.services.reconciler as rec

        monkeypatch.setattr(rec, "disk_space_status",
                            lambda *a, **kw: {"checked": True,
                                              "free_bytes": 1 << 20,
                                              "free_gb": 0.0, "free_pct": 0.1,
                                              "low": True})
        h = client.get("/health").json()
        assert h["status"] == "degraded"
        assert "storage volume low on space" in h["warnings"]

    def test_reconciler_counts_low_disk(self, ctx, monkeypatch):
        import eioku_tpu.services.reconciler as rec

        monkeypatch.setattr(rec, "disk_space_status",
                            lambda *a, **kw: {"checked": True, "low": True,
                                              "free_gb": 0.1})
        r = rec.Reconciler(ctx.tasks, ctx.videos, ctx.producer).run()
        assert r.low_disk_alerts == 1
