"""Importing a reference eioku database (services/import_eioku.py, CLI
import-eioku).

The fixture synthesizes the reference's SQLAlchemy schema
(/root/reference/backend/src/database/models.py: videos/artifacts/runs/
artifact_selections/path_configs with its column names and timestamp format)
in a scratch SQLite file, then imports it and checks the library is fully
usable: repos see the rows, projections are rebuilt (find/jump work), unknown
payload types survive, selections carry over, and re-import is a no-op.
"""
from __future__ import annotations

import json
import sqlite3

import pytest


def make_reference_db(path: str) -> None:
    conn = sqlite3.connect(path)
    conn.executescript("""
    CREATE TABLE videos (
        video_id TEXT PRIMARY KEY, file_path TEXT NOT NULL UNIQUE,
        filename TEXT NOT NULL, file_hash TEXT, duration REAL,
        file_size INTEGER, processed_at DATETIME, last_modified DATETIME,
        file_created_at DATETIME, status TEXT NOT NULL DEFAULT 'pending',
        created_at DATETIME, updated_at DATETIME);
    CREATE TABLE artifacts (
        artifact_id TEXT PRIMARY KEY, asset_id TEXT NOT NULL,
        artifact_type TEXT NOT NULL, schema_version INTEGER NOT NULL,
        span_start_ms INTEGER NOT NULL, span_end_ms INTEGER NOT NULL,
        payload_json JSON NOT NULL, producer TEXT NOT NULL,
        producer_version TEXT NOT NULL, model_profile TEXT NOT NULL,
        config_hash TEXT NOT NULL, input_hash TEXT NOT NULL,
        run_id TEXT NOT NULL, created_at DATETIME NOT NULL);
    CREATE TABLE runs (
        run_id TEXT PRIMARY KEY, asset_id TEXT NOT NULL,
        pipeline_profile TEXT NOT NULL, started_at DATETIME NOT NULL,
        finished_at DATETIME, status TEXT NOT NULL, error TEXT);
    CREATE TABLE artifact_selections (
        asset_id TEXT NOT NULL, artifact_type TEXT NOT NULL,
        selection_mode TEXT NOT NULL, preferred_profile TEXT,
        pinned_run_id TEXT, pinned_artifact_id TEXT, updated_at DATETIME,
        PRIMARY KEY (asset_id, artifact_type));
    CREATE TABLE path_configs (
        path_id TEXT PRIMARY KEY, path TEXT NOT NULL UNIQUE,
        recursive TEXT NOT NULL DEFAULT 'true', added_at DATETIME);
    """)
    # SQLAlchemy-style timestamps: 'YYYY-MM-DD HH:MM:SS.ffffff', no T/Z
    conn.execute(
        "INSERT INTO videos VALUES ('vid-1','/media/a.mp4','a.mp4',"
        "'deadbeef',62.5,1048576,'2026-01-02 03:04:05.000001',"
        "'2026-01-01 00:00:00',NULL,'completed',"
        "'2026-01-01 10:00:00.123456','2026-01-02 03:04:05')")
    conn.execute(
        "INSERT INTO videos VALUES ('vid-2','/media/b.mkv','b.mkv',"
        "NULL,NULL,2048,NULL,'2026-01-01 00:00:00',"
        "'2025-12-25 08:00:00','pending','2026-01-03 11:00:00',NULL)")
    arts = [
        ("a-1", "vid-1", "transcript.segment", 1, 0, 2000,
         json.dumps({"text": "hello imported world", "language": "en",
                     "start_ms": 0, "end_ms": 2000}),
         "whisper", "1.0", "balanced", "c1", "i1", "run-1",
         "2026-01-02 03:00:00"),
        ("a-2", "vid-1", "transcript.segment", 1, 2000, 4000,
         json.dumps({"text": "a red fox", "language": "en",
                     "start_ms": 2000, "end_ms": 4000}),
         "whisper", "1.0", "balanced", "c1", "i1", "run-1",
         "2026-01-02 03:00:01"),
        ("a-3", "vid-1", "scene", 1, 0, 4000,
         json.dumps({"scene_index": 0, "start_ms": 0, "end_ms": 4000,
                     "duration_ms": 4000}),
         "scenedet", "1.0", "balanced", "c2", "i1", "run-2",
         "2026-01-02 03:10:00"),
        # a type we don't register a schema for (reference-only)
        ("a-4", "vid-1", "ocr.detection", 1, 0, 0,
         json.dumps({"boxes": [[1, 2, 3, 4]], "frame_number": 0}),
         "easyocr", "1.0", "balanced", "c3", "i1", "run-3",
         "2026-01-02 03:20:00"),
        # schema drift: registered type, invalid payload (missing text)
        ("a-5", "vid-2", "transcript.segment", 1, 0, 1000,
         json.dumps({"language": "en"}),
         "whisper", "1.0", "fast", "c4", "i2", "run-4",
         "2026-01-03 12:00:00"),
    ]
    conn.executemany("INSERT INTO artifacts VALUES (%s)" %
                     ",".join("?" * 14), arts)
    conn.execute("INSERT INTO runs VALUES ('run-1','vid-1','balanced',"
                 "'2026-01-02 02:59:00','2026-01-02 03:01:00','completed',NULL)")
    conn.execute("INSERT INTO artifact_selections VALUES "
                 "('vid-1','transcript.segment','pinned',NULL,'run-1',NULL,"
                 "'2026-01-02 04:00:00')")
    # the reference's fallback mode, persisted verbatim by its manager —
    # spelled "latest" here
    conn.execute("INSERT INTO artifact_selections VALUES "
                 "('vid-1','scene','default',NULL,NULL,NULL,"
                 "'2026-01-02 04:00:00')")
    conn.execute("INSERT INTO path_configs VALUES "
                 "('p-1','/media','true','2026-01-01 00:00:00')")
    conn.commit()
    conn.close()


@pytest.fixture()
def ctx(tmp_path):
    from eioku_tpu.api.app import build_context
    from eioku_tpu.config.settings import AppConfig
    from eioku_tpu.db.connection import Database
    db = Database(f"sqlite:///{tmp_path}/ours.db")
    c = build_context(AppConfig(scan_paths=[], auto_discover=False,
                                semantic_search=False), db=db)
    yield c
    db.close()


@pytest.fixture()
def source(tmp_path):
    p = str(tmp_path / "eioku_reference.db")
    make_reference_db(p)
    return p


class TestImportEioku:
    def test_full_import(self, ctx, source):
        from eioku_tpu.services.import_eioku import import_reference_db
        counts = import_reference_db(ctx, source)
        assert counts["videos"] == 2
        assert counts["artifacts"] == 5
        assert counts["runs"] == 4
        assert counts["selections"] == 2
        assert counts["paths"] == 1
        assert counts["unvalidated"] == 2  # ocr.detection + drifted a-5
        assert counts["projected"] >= 3    # transcripts + scene resynced

        videos = {v.id: v for v in ctx.videos.list(limit=10)}
        assert videos["vid-1"].duration_ms == 62500
        assert videos["vid-1"].status.value == "processed"
        assert videos["vid-2"].status.value == "discovered"
        assert videos["vid-2"].file_created_at.year == 2025

        # provenance synthesized from the artifacts + source runs table
        runs = {r.run_id: r for r in ctx.runs.list_for_asset("vid-1")}
        assert runs["run-1"].task_type == "transcription"
        assert runs["run-2"].task_type == "scene_detection"
        assert runs["run-3"].task_type == "ocr"  # ocr.detection -> ocr task

        # unknown-type envelope survived without a projection
        got = ctx.artifacts.get("a-4")
        assert got.payload_json["boxes"] == [[1, 2, 3, 4]]

    def test_projections_usable_after_import(self, ctx, source):
        from eioku_tpu.services.import_eioku import import_reference_db
        import_reference_db(ctx, source)
        hits = ctx.find.find("vid-1", "fox")
        assert hits and hits[0]["jump_to"]["start_ms"] == 2000
        lib = ctx.find.search_library("imported")
        assert any(r["video_id"] == "vid-1" for r in lib)

    def test_selection_carried_over(self, ctx, source):
        from eioku_tpu.services.import_eioku import import_reference_db
        import_reference_db(ctx, source)
        pol = ctx.policies.get_policy("vid-1", "transcript.segment")
        assert pol.mode == "pinned" and pol.run_id == "run-1"
        # reference mode "default" maps onto our "latest"
        assert ctx.policies.get_policy("vid-1", "scene").mode == "latest"

    def test_video_path_collision_skipped(self, ctx, source):
        """A file this stack already discovered under its own id must not be
        re-imported under the reference's id (videos.path is UNIQUE)."""
        from eioku_tpu.domain.models import Video
        from eioku_tpu.services.import_eioku import import_reference_db
        ctx.videos.save(Video(path="/media/a.mp4", file_hash="ours"))
        counts = import_reference_db(ctx, source)
        assert counts["videos"] == 1  # only vid-2 imported
        paths = [v.path for v in ctx.videos.list(limit=10)]
        assert paths.count("/media/a.mp4") == 1

    def test_rerun_repairs_missing_runs(self, ctx, source):
        """Run rows are synthesized from every source artifact, so a re-run
        after a partial import (artifacts committed, runs not) repairs them."""
        from eioku_tpu.services.import_eioku import import_reference_db
        import_reference_db(ctx, source)
        ctx.db.execute("DELETE FROM runs")  # simulate the partial state
        counts = import_reference_db(ctx, source)
        assert counts["runs"] == 4
        assert {r.run_id for r in ctx.runs.list_for_asset("vid-1")} == \
            {"run-1", "run-2", "run-3"}

    def test_idempotent_reimport(self, ctx, source):
        from eioku_tpu.services.import_eioku import import_reference_db
        import_reference_db(ctx, source)
        counts = import_reference_db(ctx, source)
        assert counts["videos"] == 0
        assert counts["artifacts"] == 0
        assert counts["runs"] == 0
        assert counts["paths"] == 0
        assert counts["skipped_existing"] > 0
        assert len(ctx.videos.list(limit=10)) == 2

    def test_rejects_non_reference_db(self, ctx, tmp_path):
        from eioku_tpu.services.import_eioku import import_reference_db
        other = str(tmp_path / "random.db")
        sqlite3.connect(other).executescript(
            "CREATE TABLE t (x INTEGER);")
        with pytest.raises(ValueError, match="not a reference"):
            import_reference_db(ctx, other)

    def test_cli_command(self, tmp_path, source, monkeypatch):
        from eioku_tpu import cli
        import sys
        monkeypatch.setattr(sys, "argv", [
            "eioku", "--db", f"sqlite:///{tmp_path}/cli.db",
            "import-eioku", "--source", source])
        rc = cli.main()
        assert rc == 0
