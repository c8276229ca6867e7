import pytest
import time

from eioku_tpu.db.migrations import current_version
from eioku_tpu.domain.artifacts import ArtifactEnvelope, Run, SelectionPolicy, new_id
from eioku_tpu.domain.models import PathConfig, Task, TaskStatus, Video, VideoStatus
from eioku_tpu.repositories import (
    ArtifactRepository,
    PathConfigRepository,
    RunRepository,
    SelectionPolicyManager,
    TaskRepository,
    VideoRepository,
)


def _obj_env(asset="a1", run="r1", label="dog", conf=0.9, start=0, profile="balanced",
             created=None):
    kw = {}
    if created is not None:
        kw["created_at"] = created
    return ArtifactEnvelope(
        artifact_id=new_id(), asset_id=asset, artifact_type="object.detection",
        schema_version=1, span_start_ms=start, span_end_ms=start + 33,
        payload_json={"label": label, "confidence": conf,
                      "bounding_box": {"x": 0, "y": 0, "width": 5, "height": 5},
                      "frame_number": start // 33},
        producer="p", producer_version="1", model_profile=profile,
        config_hash="c", input_hash="i", run_id=run, **kw)


def test_migrations_idempotent(db):
    assert current_version(db) >= 6
    from eioku_tpu.db.migrations import run_migrations
    assert run_migrations(db) == 0  # no-op second time


class TestVideoRepository:
    def test_crud(self, db):
        repo = VideoRepository(db)
        v = Video(path="/tmp/a.mp4", file_hash="h", size_bytes=10)
        repo.save(v)
        assert repo.get(v.id).path == "/tmp/a.mp4"
        assert repo.get_by_path("/tmp/a.mp4").id == v.id
        v.status = VideoStatus.PROCESSED
        repo.save(v)
        assert repo.get(v.id).status is VideoStatus.PROCESSED
        assert repo.count() == 1
        assert repo.delete(v.id)
        assert repo.get(v.id) is None

    def test_list_filter(self, db):
        repo = VideoRepository(db)
        for i in range(3):
            repo.save(Video(path=f"/v{i}.mp4"))
        assert len(repo.list()) == 3
        assert len(repo.list(status=VideoStatus.PROCESSED)) == 0


class TestTaskRepository:
    def test_crud_and_find(self, db):
        vrepo, trepo = VideoRepository(db), TaskRepository(db)
        v = vrepo.save(Video(path="/v.mp4"))
        t = Task(video_id=v.id, task_type="ocr", language="en")
        trepo.save(t)
        assert trepo.get(t.id).language == "en"
        assert trepo.exists(v.id, "ocr", "en")
        assert not trepo.exists(v.id, "ocr", "ja")
        assert len(trepo.find(video_id=v.id, task_type="ocr")) == 1
        assert trepo.count(TaskStatus.PENDING) == 1

    def test_atomic_claim(self, db):
        vrepo, trepo = VideoRepository(db), TaskRepository(db)
        v = vrepo.save(Video(path="/v.mp4"))
        t1 = trepo.save(Task(video_id=v.id, task_type="scene_detection", priority=5))
        t2 = trepo.save(Task(video_id=v.id, task_type="metadata_extraction", priority=1))
        claimed = trepo.atomic_claim_pending("w1")
        assert claimed.id == t2.id  # higher priority (1) first
        assert claimed.status is TaskStatus.RUNNING
        claimed2 = trepo.atomic_claim_pending("w1")
        assert claimed2.id == t1.id
        assert trepo.atomic_claim_pending("w1") is None

    def test_status_transition_validation(self, db):
        vrepo, trepo = VideoRepository(db), TaskRepository(db)
        v = vrepo.save(Video(path="/v.mp4"))
        t = trepo.save(Task(video_id=v.id, task_type="ocr"))
        trepo.update_status(t.id, TaskStatus.RUNNING)
        trepo.update_status(t.id, TaskStatus.FAILED, error="x")
        got = trepo.get(t.id)
        assert got.status is TaskStatus.FAILED and got.error == "x"


class TestArtifactRepository:
    def test_create_validates_schema(self, db):
        repo = ArtifactRepository(db)
        env = _obj_env()
        repo.create(env)
        assert repo.get(env.artifact_id).payload_json["label"] == "dog"

    def test_batch_create(self, db):
        repo = ArtifactRepository(db)
        envs = [_obj_env(start=i * 33) for i in range(50)]
        repo.batch_create(envs)
        got = repo.get_by_asset("a1", artifact_type="object.detection")
        assert len(got) == 50
        assert got[0].span_start_ms == 0  # ordered by span

    def test_batch_create_rolls_back_on_projection_failure(self, db):
        """All-or-nothing: a projection sync error mid-batch must leave NO
        artifacts behind (nested execute() calls join the outer transaction
        instead of committing it)."""
        calls = []

        def failing_sync(env):
            # route through the db like real projection handlers do
            db.execute("SELECT 1")
            calls.append(env.artifact_id)
            if len(calls) == 3:
                raise RuntimeError("projection exploded")

        repo = ArtifactRepository(db, projection_sync=failing_sync)
        envs = [_obj_env(start=i * 33) for i in range(5)]
        with pytest.raises(RuntimeError):
            repo.batch_create(envs)
        assert repo.get_by_asset("a1", artifact_type="object.detection") == []

    def test_time_and_payload_filters(self, db):
        repo = ArtifactRepository(db)
        repo.batch_create([
            _obj_env(start=0, label="dog"),
            _obj_env(start=1000, label="cat"),
            _obj_env(start=2000, label="dog"),
        ])
        assert len(repo.get_by_span("a1", 900, 1100)) == 1
        dogs = repo.get_by_asset("a1", artifact_type="object.detection",
                                 payload_filters={"label": "dog"})
        assert len(dogs) == 2

    def test_selection_latest(self, db):
        repo = ArtifactRepository(db)
        from datetime import datetime, timedelta, timezone
        t0 = datetime.now(timezone.utc)
        repo.batch_create([_obj_env(run="old", created=t0),
                           _obj_env(run="new", created=t0 + timedelta(seconds=1))])
        got = repo.get_by_asset("a1", artifact_type="object.detection",
                                selection=SelectionPolicy(mode="latest"))
        assert {e.run_id for e in got} == {"new"}

    def test_selection_pinned_and_profile(self, db):
        repo = ArtifactRepository(db)
        from datetime import datetime, timedelta, timezone
        t0 = datetime.now(timezone.utc)
        repo.batch_create([
            _obj_env(run="r_fast", profile="fast", created=t0),
            _obj_env(run="r_hq", profile="high_quality", created=t0 + timedelta(seconds=1)),
        ])
        pinned = repo.get_by_asset("a1", artifact_type="object.detection",
                                   selection=SelectionPolicy(mode="pinned", run_id="r_fast"))
        assert {e.run_id for e in pinned} == {"r_fast"}
        prof = repo.get_by_asset("a1", artifact_type="object.detection",
                                 selection=SelectionPolicy(mode="profile",
                                                           model_profile="fast"))
        assert {e.run_id for e in prof} == {"r_fast"}

    def test_selection_best_quality(self, db):
        repo = ArtifactRepository(db)
        from datetime import datetime, timedelta, timezone
        t0 = datetime.now(timezone.utc)
        repo.batch_create([
            _obj_env(run="r_fast", profile="fast", created=t0 + timedelta(seconds=5)),
            _obj_env(run="r_bal", profile="balanced", created=t0),
        ])
        got = repo.get_by_asset("a1", artifact_type="object.detection",
                                selection=SelectionPolicy(mode="best_quality"))
        assert {e.run_id for e in got} == {"r_bal"}  # balanced beats fast despite age

    def test_selection_latest_per_language(self, db):
        repo = ArtifactRepository(db)
        from datetime import datetime, timedelta, timezone
        t0 = datetime.now(timezone.utc)

        def seg(run, lang, created):
            return ArtifactEnvelope(
                artifact_id=new_id(), asset_id="a1", artifact_type="transcript.segment",
                schema_version=1, span_start_ms=0, span_end_ms=1000,
                payload_json={"text": "hi", "language": lang, "start_ms": 0, "end_ms": 1000},
                producer="p", producer_version="1", model_profile="balanced",
                config_hash="c", input_hash="i", run_id=run, created_at=created)

        repo.batch_create([
            seg("en_old", "en", t0),
            seg("en_new", "en", t0 + timedelta(seconds=2)),
            seg("ja_only", "ja", t0 + timedelta(seconds=1)),
        ])
        got = repo.get_by_asset("a1", artifact_type="transcript.segment",
                                selection=SelectionPolicy(mode="latest_per_language"))
        assert {e.run_id for e in got} == {"en_new", "ja_only"}

    def test_list_runs_profiles_types(self, db):
        repo = ArtifactRepository(db)
        repo.batch_create([_obj_env(run="r1"), _obj_env(run="r2", profile="fast")])
        runs = repo.list_runs("a1")
        assert len(runs) == 2
        profs = repo.list_profiles("a1")
        assert {p["model_profile"] for p in profs} == {"balanced", "fast"}
        assert repo.list_types_for_asset("a1") == ["object.detection"]


class TestRunAndPathRepos:
    def test_run_crud(self, db):
        repo = RunRepository(db)
        r = Run(run_id="r1", asset_id="a", task_type="ocr", producer="p",
                producer_version="1", model_profile="fast", config_hash="c",
                input_hash="i", config_json={"x": 1})
        repo.save(r)
        assert repo.get("r1").config_json == {"x": 1}
        assert len(repo.list_for_asset("a", "ocr")) == 1

    def test_path_config(self, db):
        repo = PathConfigRepository(db)
        repo.save(PathConfig(path="/videos", recursive=True))
        repo.save(PathConfig(path="/videos", recursive=False))  # upsert by path
        got = repo.get_by_path("/videos")
        assert got.recursive is False
        assert len(repo.list(enabled_only=True)) == 1
        assert repo.delete("/videos")


class TestSelectionPolicyManager:
    def test_default_and_set(self, db):
        mgr = SelectionPolicyManager(db)
        assert mgr.get_policy("a", "scene").mode == "latest"
        mgr.set_policy("a", "scene", SelectionPolicy(mode="pinned", run_id="r9"))
        got = mgr.get_policy("a", "scene")
        assert got.mode == "pinned" and got.run_id == "r9"
        mgr.set_policy("a", "scene", SelectionPolicy(mode="latest"))
        assert mgr.get_policy("a", "scene").mode == "latest"
        assert mgr.clear_policy("a", "scene")


class TestPerformanceFloors:
    """Wall-clock floors matching the reference's perf tests
    (/root/reference/backend/tests/test_performance.py:91-260)."""

    def test_insert_1000_under_10s(self, db):
        repo = ArtifactRepository(db)
        start = time.monotonic()
        for i in range(1000):
            repo.create(_obj_env(start=i * 33))
        assert time.monotonic() - start < 10.0

    def test_query_500_under_100ms(self, db):
        repo = ArtifactRepository(db)
        repo.batch_create([_obj_env(start=i * 33) for i in range(500)])
        start = time.monotonic()
        got = repo.get_by_asset("a1", artifact_type="object.detection")
        assert len(got) == 500
        assert time.monotonic() - start < 0.1

    def test_time_range_under_50ms(self, db):
        repo = ArtifactRepository(db)
        repo.batch_create([_obj_env(start=i * 33) for i in range(1000)])
        start = time.monotonic()
        got = repo.get_by_span("a1", 10000, 12000)
        assert got
        assert time.monotonic() - start < 0.05


class TestQueryPlans:
    """EXPLAIN QUERY PLAN inspection, mirroring the reference's perf tests
    (/root/reference/backend/tests/test_performance.py:91-260): the hot
    artifact queries must hit their covering indexes, not scan the table."""

    def _plan(self, db, sql, params):
        rows = db.query("EXPLAIN QUERY PLAN " + sql, params)
        return " | ".join(r["detail"] for r in rows)

    def test_asset_type_query_uses_index(self, db):
        repo = ArtifactRepository(db)
        repo.batch_create([_obj_env(start=i * 33) for i in range(50)])
        plan = self._plan(
            db, "SELECT * FROM artifacts WHERE asset_id=? AND artifact_type=?",
            ("a1", "object.detection"))
        # either covering index (both lead with asset_id, artifact_type) is fine
        assert "USING INDEX idx_artifacts" in plan, plan

    def test_span_query_uses_index(self, db):
        repo = ArtifactRepository(db)
        repo.batch_create([_obj_env(start=i * 33) for i in range(50)])
        plan = self._plan(
            db, "SELECT * FROM artifacts WHERE asset_id=? AND span_start_ms<?"
                " AND span_end_ms>?", ("a1", 2000, 1000))
        assert "USING INDEX idx_artifacts" in plan, plan

    def test_task_status_query_uses_index(self, db):
        plan = self._plan(db, "SELECT * FROM tasks WHERE status=?", ("pending",))
        assert "idx_tasks_status" in plan, plan
