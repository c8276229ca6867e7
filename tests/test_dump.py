"""Library backup/restore round-trip (services/dump.py, cli export-dump /
import-dump).

The reference has no backup story beyond copying the PostgreSQL volume; this
framework dumps the durable state (videos/tasks/runs/selections/artifacts) to
one portable JSONL file and rebuilds every derived table on restore — the same
"projections are rebuildable" contract as
/root/reference/backend/src/commands/resync_projections.py:14-73.
"""
import gzip
import json

import pytest

from eioku_tpu.api.app import build_context
from eioku_tpu.config.settings import AppConfig
from eioku_tpu.db.connection import Database
from eioku_tpu.domain.artifacts import ArtifactEnvelope, Run, SelectionPolicy, new_id
from eioku_tpu.domain.models import PathConfig, Task, TaskStatus, Video
from eioku_tpu.services.dump import export_dump, import_dump


def _ctx(tmp_path, name):
    db = Database(f"sqlite:///{tmp_path}/{name}.db")
    return build_context(AppConfig(scan_paths=[], auto_discover=False), db=db)


def _seed(ctx, tmp_path):
    v = Video(id="vid-1", path=str(tmp_path / "a.mp4"), file_hash="h1",
              duration_ms=60_000)
    ctx.videos.save(v)
    ctx.paths.save(PathConfig(path=str(tmp_path)))
    t = Task(id="task-1", video_id=v.id, task_type="transcription")
    t.transition(TaskStatus.RUNNING)
    t.transition(TaskStatus.COMPLETED)
    ctx.tasks.save(t)
    ctx.runs.save(Run(run_id="run-1", asset_id=v.id, task_type="transcription",
                      producer="p", producer_version="1",
                      model_profile="balanced", config_hash="c",
                      input_hash="i"))
    envs = [
        ArtifactEnvelope(
            artifact_id=new_id(), asset_id=v.id,
            artifact_type="transcript.segment", schema_version=1,
            span_start_ms=i * 1000, span_end_ms=(i + 1) * 1000,
            payload_json={"text": f"zebra stampede {i}", "language": "en",
                          "start_ms": i * 1000, "end_ms": (i + 1) * 1000},
            producer="p", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="run-1")
        for i in range(3)
    ] + [
        ArtifactEnvelope(
            artifact_id=new_id(), asset_id=v.id, artifact_type="scene",
            schema_version=1, span_start_ms=0, span_end_ms=60_000,
            payload_json={"scene_index": 0, "start_ms": 0, "end_ms": 60_000,
                          "duration_ms": 60_000},
            producer="p", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="run-1"),
        # derivable — excluded from dumps by default
        ArtifactEnvelope(
            artifact_id=new_id(), asset_id=v.id,
            artifact_type="embedding.chunk", schema_version=1,
            span_start_ms=0, span_end_ms=1000,
            payload_json={"text": "zebra", "source": "transcript",
                          "model": "minilm", "dim": 4, "index_slot": 0,
                          "norm": 1.0},
            producer="p", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="run-1"),
    ]
    ctx.artifacts.batch_create(envs)
    ctx.policies.set_policy(v.id, "transcript.segment",
                            SelectionPolicy(mode="pinned", run_id="run-1"))
    return v


class TestRoundTrip:
    def test_export_then_import_restores_everything(self, tmp_path):
        src = _ctx(tmp_path, "src")
        v = _seed(src, tmp_path)
        out = str(tmp_path / "lib.jsonl.gz")
        counts = export_dump(src, out)
        assert counts == {"videos": 1, "tasks": 1, "runs": 1, "artifacts": 4,
                          "selections": 1, "paths": 1}  # embedding.chunk excluded

        # gzip magic honored
        with gzip.open(out, "rt") as f:
            header = json.loads(f.readline())
        assert header["data"]["format"] == "eioku-tpu-dump"

        dst = _ctx(tmp_path, "dst")
        restored = import_dump(dst, out, reindex=False)
        assert restored["videos"] == 1
        assert restored["artifacts"] == 4
        assert restored["skipped_existing"] == 0

        rv = dst.videos.get(v.id)
        assert rv is not None and rv.duration_ms == 60_000
        envs = dst.artifacts.get_by_asset(v.id,
                                          artifact_type="transcript.segment")
        assert len(envs) == 3
        assert envs[0].payload_json["text"].startswith("zebra")
        # derived state rebuilt: FTS projection answers queries
        from eioku_tpu.services.find_service import FindWithinVideoService
        find = FindWithinVideoService(dst.db)
        matches = find.find(v.id, "stampede")
        assert matches, "restored transcript not searchable"
        # selection survived
        pol = dst.policies.get_policy(v.id, "transcript.segment")
        assert pol.mode == "pinned" and pol.run_id == "run-1"
        # embedding.chunk NOT carried over
        assert dst.artifacts.get_by_asset(
            v.id, artifact_type="embedding.chunk") == []

    def test_import_is_idempotent(self, tmp_path):
        src = _ctx(tmp_path, "src")
        _seed(src, tmp_path)
        out = str(tmp_path / "lib.jsonl.gz")
        export_dump(src, out)
        dst = _ctx(tmp_path, "dst")
        import_dump(dst, out, reindex=False)
        again = import_dump(dst, out, reindex=False)
        assert again["videos"] == 0 and again["artifacts"] == 0
        assert again["skipped_existing"] > 0
        assert dst.db.scalar("SELECT COUNT(*) FROM artifacts") == 4

    def test_reindex_enqueues_semantic_indexing(self, tmp_path):
        src = _ctx(tmp_path, "src")
        v = _seed(src, tmp_path)
        out = str(tmp_path / "lib.jsonl")  # plain (no .gz) path also works
        export_dump(src, out)
        dst = _ctx(tmp_path, "dst")
        counts = import_dump(dst, out, reindex=True)
        # one semantic (transcripts) + one visual (scenes) re-index
        assert counts["reindex_enqueued"] == 2
        for task_type in ("semantic_indexing", "visual_indexing"):
            tasks = dst.tasks.find(video_id=v.id, task_type=task_type)
            assert tasks and tasks[0].status is TaskStatus.PENDING, task_type

    def test_include_embeddings_flag(self, tmp_path):
        src = _ctx(tmp_path, "src")
        v = _seed(src, tmp_path)
        out = str(tmp_path / "full.jsonl.gz")
        counts = export_dump(src, out, include_embeddings=True)
        assert counts["artifacts"] == 5
        dst = _ctx(tmp_path, "dst")
        import_dump(dst, out, reindex=False)
        assert len(dst.artifacts.get_by_asset(
            v.id, artifact_type="embedding.chunk")) == 1

    def test_path_collision_skips_dependents_too(self, tmp_path):
        """A video skipped for a path collision must not leave orphan
        artifacts/runs/selections behind (they would project into search
        but 404 on /videos/{id})."""
        src = _ctx(tmp_path, "src")
        _seed(src, tmp_path)
        out = str(tmp_path / "lib.jsonl.gz")
        export_dump(src, out)
        dst = _ctx(tmp_path, "dst")
        # same path already discovered locally under a DIFFERENT id
        dst.videos.save(Video(id="local-id", path=str(tmp_path / "a.mp4"),
                              file_hash="h1"))
        counts = import_dump(dst, out, reindex=False)
        assert counts["videos"] == 0
        assert counts["artifacts"] == 0 and counts["runs"] == 0
        assert counts["selections"] == 0
        assert dst.db.scalar("SELECT COUNT(*) FROM artifacts") == 0
        assert dst.db.scalar(
            "SELECT COUNT(*) FROM transcript_fts_meta") == 0

    def test_rejects_empty_file(self, tmp_path):
        empty = tmp_path / "empty.jsonl"
        empty.write_text("")
        dst = _ctx(tmp_path, "dst")
        with pytest.raises(ValueError, match="empty"):
            import_dump(dst, str(empty), reindex=False)

    def test_rejects_foreign_files(self, tmp_path):
        bogus = tmp_path / "not_a_dump.jsonl"
        bogus.write_text('{"kind": "header", "data": {"format": "other"}}\n')
        dst = _ctx(tmp_path, "dst")
        with pytest.raises(ValueError, match="not an eioku-tpu-dump"):
            import_dump(dst, str(bogus), reindex=False)

    def test_rejects_newer_version(self, tmp_path):
        newer = tmp_path / "future.jsonl"
        newer.write_text(json.dumps(
            {"kind": "header",
             "data": {"format": "eioku-tpu-dump", "version": 99}}) + "\n")
        dst = _ctx(tmp_path, "dst")
        with pytest.raises(ValueError, match="newer"):
            import_dump(dst, str(newer), reindex=False)
