"""PostgreSQL dialect surface (eioku_tpu/db/dialect.py + PostgresDatabase).

The reference deploys PostgreSQL 16 with dual-dialect SQL branches
(/root/reference/dev/docker-compose.yml:68; find_within_video_service.py:139-264;
projection_sync_service.py:72-119; artifact_repository.py:258-287). This image
ships no PG server or driver, so execution is tested against a fake DBAPI
driver that records every statement: that exercises the real translation,
transaction, and row plumbing, and proves the repositories/services emit the
PG-form SQL when db.dialect is PostgresDialect. The SQLite golden tests pin
the other branch to the exact strings the live suite executes.
"""
from __future__ import annotations

import sys
import types

import pytest

from eioku_tpu.db.dialect import (
    POSTGRES,
    SQLITE,
    PostgresDialect,
    SqliteDialect,
    translate_qmark,
)


class TestTranslateQmark:
    def test_basic(self):
        assert translate_qmark("SELECT * FROM t WHERE a=? AND b=?") == \
            "SELECT * FROM t WHERE a=%s AND b=%s"

    def test_question_mark_in_string_literal_untouched(self):
        sql = "SELECT '?' , x FROM t WHERE y=?"
        assert translate_qmark(sql) == "SELECT '?' , x FROM t WHERE y=%s"

    def test_escaped_quote_inside_literal(self):
        sql = "SELECT 'it''s a ?' FROM t WHERE y=?"
        assert translate_qmark(sql) == "SELECT 'it''s a ?' FROM t WHERE y=%s"

    def test_double_quoted_identifier(self):
        sql = 'SELECT "we?rd col" FROM t WHERE y=?'
        assert translate_qmark(sql) == 'SELECT "we?rd col" FROM t WHERE y=%s'

    def test_comments_untouched(self):
        sql = "SELECT x -- what?\n FROM t /* really? */ WHERE y=?"
        assert translate_qmark(sql) == \
            "SELECT x -- what?\n FROM t /* really? */ WHERE y=%s"


class TestSqliteGolden:
    """Pin the sqlite builders to the exact SQL the live suite executes."""

    d = SqliteDialect()

    def test_fts_schema(self):
        ddl = self.d.fts_schema("transcript_fts", "transcript_fts_meta",
                                "idx_tfts_meta_asset")
        assert "CREATE VIRTUAL TABLE transcript_fts USING fts5" in ddl
        assert "tokenize='porter unicode61'" in ddl
        assert "CREATE TABLE transcript_fts_meta" in ddl

    def test_upsert(self):
        sql = self.d.upsert("scene_ranges", ["artifact_id", "asset_id"],
                            ["artifact_id"])
        assert sql == ("INSERT INTO scene_ranges (artifact_id, asset_id)"
                       " VALUES (?,?)"
                       " ON CONFLICT(artifact_id) DO UPDATE SET"
                       " asset_id=excluded.asset_id")

    def test_json_builders_execute(self):
        """The sqlite expressions must actually run against JSON payloads."""
        import sqlite3

        c = sqlite3.connect(":memory:")
        c.execute("CREATE TABLE a (payload_json TEXT)")
        c.execute("INSERT INTO a VALUES ('{\"label\": \"cat\","
                  " \"languages\": [\"en\", \"ja\"]}')")
        fld = self.d.json_field("payload_json")
        assert c.execute(f"SELECT {fld} FROM a", ("label",)).fetchone()[0] == "cat"
        arr = self.d.json_array_contains("payload_json")
        assert c.execute(f"SELECT {arr} FROM a",
                         ("languages", "ja")).fetchone()[0] == 1
        path = self.d.json_path("payload_json")
        assert c.execute(f"SELECT {path} FROM a",
                         ("$.label",)).fetchone()[0] == "cat"

    def test_match_expr_and_score(self):
        assert self.d.fts_match_expr(["hello", "world"]) == '"hello" AND "world"'
        assert self.d.fts_score(-3.2) == pytest.approx(3.2)  # bm25 lower=better


class TestPostgresGolden:
    d = PostgresDialect()

    def test_fts_schema_tsvector_gin(self):
        ddl = self.d.fts_schema("transcript_fts", "transcript_fts_meta",
                                "idx_tfts_meta_asset")
        assert "tsvector GENERATED ALWAYS AS (to_tsvector('english', text)) STORED" in ddl
        assert "USING GIN (ts)" in ddl
        assert "CREATE TABLE transcript_fts_meta" in ddl
        assert "fts5" not in ddl
        assert ddl.count("(") == ddl.count(")")

    def test_fts_query_fragments(self):
        assert "to_tsquery('english', ?)" in self.d.fts_from("ocr_fts",
                                                             "ocr_fts_meta")
        assert self.d.fts_match_where("ocr_fts") == "f.ts @@ q"
        assert "ts_headline('english', f.text, q" in self.d.fts_snippet("ocr_fts")
        assert self.d.fts_order_by_rank("ocr_fts").endswith("DESC")
        assert self.d.fts_match_expr(["hello", "world"]) == "hello & world"
        assert self.d.fts_score(0.7) == pytest.approx(0.7)  # ts_rank higher=better
        assert self.d.ilike() == "ILIKE"

    def test_json_builders(self):
        assert self.d.json_field("payload_json") == "(payload_json::jsonb ->> ?)"
        assert "jsonb_path_query_first" in self.d.json_path("payload_json")
        assert "@> to_jsonb(?::text)" in self.d.json_array_contains("payload_json")
        assert self.d.json_field_literal("MIN(payload_json)", "language") == \
            "(MIN(payload_json)::jsonb ->> 'language')"

    def test_latest_per_language_distinct_on(self):
        clause = self.d.latest_run_per_language_clause()
        assert "DISTINCT ON" in clause and clause.count("?") == 2

    def test_running_seconds(self):
        assert "EXTRACT(EPOCH FROM" in self.d.running_seconds_expr()

    def test_upsert_identical_to_sqlite(self):
        args = ("runs", ["run_id", "asset_id"], ["run_id"])
        assert POSTGRES.upsert(*args) == SQLITE.upsert(*args)


# --------------------------------------------------------------------------
# Fake DBAPI driver: records statements, returns canned rows.


class _FakeCursor:
    def __init__(self, conn):
        self.conn = conn
        self.description = None
        self.rowcount = 0
        self._rows: list[tuple] = []

    def execute(self, sql, params=()):
        assert "?" not in _strip_literals(sql), f"untranslated qmark: {sql}"
        self.conn.statements.append((sql, tuple(params)))
        self._rows = list(self.conn.responses.pop(0)) if self.conn.responses else []
        if self._rows:
            self.description = [(f"c{i}",) for i in range(len(self._rows[0]))]
        up = sql.lstrip().upper()
        if up.startswith(("INSERT", "UPDATE", "DELETE")):
            self.rowcount = 1
        # schema_migrations probe: pretend the table is empty
        return self

    def executemany(self, sql, seq):
        for p in seq:
            self.execute(sql, p)

    def fetchone(self):
        return self._rows.pop(0) if self._rows else None

    def fetchall(self):
        rows, self._rows = self._rows, []
        return rows


def _strip_literals(sql: str) -> str:
    import re

    return re.sub(r"'(?:[^']|'')*'", "''", sql)


class _FakeConn:
    def __init__(self):
        self.statements: list[tuple[str, tuple]] = []
        self.responses: list[list[tuple]] = []  # queue of result sets
        self.commits = 0
        self.rollbacks = 0
        self.autocommit = None

    def cursor(self):
        return _FakeCursor(self)

    def commit(self):
        self.commits += 1

    def rollback(self):
        self.rollbacks += 1

    def close(self):
        pass


@pytest.fixture()
def pg_db(monkeypatch):
    """PostgresDatabase wired to the recording fake driver."""
    fake = types.ModuleType("psycopg2")
    conn = _FakeConn()
    fake.connect = lambda url: conn
    monkeypatch.setitem(sys.modules, "psycopg2", fake)
    from eioku_tpu.db.connection import connect

    db = connect("postgresql://u:p@host/eioku")
    return db, conn


class TestPostgresDatabase:
    def test_connect_factory_routes_by_scheme(self, tmp_path):
        from eioku_tpu.db.connection import Database, connect

        db = connect(f"sqlite:///{tmp_path}/x.db")
        assert isinstance(db, Database) and db.dialect.name == "sqlite"

    def test_missing_external_drivers_fall_back_to_pgwire(self, monkeypatch):
        """With neither psycopg2 nor pg8000 importable (this image), the
        first-party wire client is the driver — postgresql:// URLs execute
        instead of raising (tests/test_pgwire.py covers the protocol)."""
        monkeypatch.setitem(sys.modules, "psycopg2", None)
        monkeypatch.setitem(sys.modules, "pg8000", None)
        monkeypatch.setitem(sys.modules, "pg8000.dbapi", None)
        from eioku_tpu.db import pgwire
        from eioku_tpu.db.connection import _import_pg_driver

        assert _import_pg_driver() is pgwire

    def test_query_translates_and_wraps_rows(self, pg_db):
        db, conn = pg_db
        conn.responses.append([("v1", 2)])
        rows = db.query("SELECT a, b FROM t WHERE x=? AND y=?", ("p", 1))
        assert conn.statements[-1] == (
            "SELECT a, b FROM t WHERE x=%s AND y=%s", ("p", 1))
        assert rows[0][0] == "v1" and rows[0]["c1"] == 2
        assert dict(zip(rows[0].keys(), rows[0])) == {"c0": "v1", "c1": 2}

    def test_transaction_commit_and_rollback(self, pg_db):
        db, conn = pg_db
        with db.transaction() as c:
            c.execute("INSERT INTO t VALUES (?)", (1,))
        assert conn.commits == 1
        with pytest.raises(ValueError):
            with db.transaction() as c:
                c.execute("INSERT INTO t VALUES (?)", (2,))
                raise ValueError("boom")
        assert conn.rollbacks == 1

    def test_dialect_is_postgres(self, pg_db):
        db, _ = pg_db
        assert db.dialect.name == "postgresql"


class TestServicesEmitPostgresSql:
    """Drive the real services/repositories over the fake-driver PG database
    and assert the statements they emit are the PG dialect forms."""

    def test_migrations_create_tsvector_schema(self, pg_db):
        db, conn = pg_db
        from eioku_tpu.db.migrations import run_migrations

        run_migrations(db)
        all_sql = "\n".join(s for s, _ in conn.statements)
        assert "tsvector GENERATED ALWAYS AS" in all_sql
        assert "USING GIN (ts)" in all_sql
        assert "fts5" not in all_sql
        assert "strftime" not in all_sql  # portable schema_migrations DDL

    def test_find_service_uses_ts_queries(self, pg_db):
        db, conn = pg_db
        from eioku_tpu.services.find_service import FindWithinVideoService

        FindWithinVideoService(db).find("vid1", "hello world")
        sql = "\n".join(s for s, _ in conn.statements)
        assert "to_tsquery('english', %s)" in sql
        assert "f.ts @@ q" in sql
        assert "ts_headline('english', f.text, q" in sql
        assert "MATCH" not in sql and "snippet(" not in sql
        # the match param is the PG & form
        match_params = [p for s, p in conn.statements if "to_tsquery" in s]
        assert match_params and match_params[0][0] == "hello & world"

    def test_search_library_orders_by_ts_rank(self, pg_db):
        db, conn = pg_db
        from eioku_tpu.services.find_service import FindWithinVideoService

        FindWithinVideoService(db).search_library("cats")
        sql = "\n".join(s for s, _ in conn.statements)
        assert "ts_rank(f.ts, q) DESC" in sql

    def test_projection_sync_upserts_and_returning(self, pg_db):
        db, conn = pg_db
        from eioku_tpu.domain.artifacts import ArtifactEnvelope
        from eioku_tpu.services.projection_sync import ProjectionSyncService

        svc = ProjectionSyncService(db)
        env = ArtifactEnvelope(
            artifact_id="a1", asset_id="v1", artifact_type="scene",
            schema_version=1, span_start_ms=0, span_end_ms=1000,
            payload_json={"scene_index": 0, "start_ms": 0, "end_ms": 1000,
                          "duration_ms": 1000},
            producer="t", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="r1")
        svc.sync_artifact(env)
        sql = conn.statements[-1][0]
        assert sql.startswith("INSERT INTO scene_ranges")
        assert "ON CONFLICT(artifact_id) DO UPDATE SET" in sql

        tenv = ArtifactEnvelope(
            artifact_id="a2", asset_id="v1", artifact_type="transcript.segment",
            schema_version=1, span_start_ms=0, span_end_ms=1000,
            payload_json={"text": "hi", "language": "en", "start_ms": 0,
                          "end_ms": 1000, "confidence": 0.9},
            producer="t", producer_version="1", model_profile="balanced",
            config_hash="c", input_hash="i", run_id="r1")
        conn.responses = [[], [(7,)]]  # no old row; RETURNING rowid -> 7
        svc.sync_artifact(tenv)
        sql = "\n".join(s for s, _ in conn.statements)
        assert "VALUES (%s) RETURNING rowid" in sql
        meta = [p for s, p in conn.statements
                if s.startswith("INSERT INTO transcript_fts_meta")]
        assert meta and meta[0][0] == 7  # rowid came from RETURNING

    def test_artifact_repo_payload_filters_use_jsonb(self, pg_db):
        db, conn = pg_db
        from eioku_tpu.repositories.artifact_repository import ArtifactRepository

        repo = ArtifactRepository(db)
        repo.get_by_asset("v1", artifact_type="object.detection",
                          payload_filters={"label": "cat"})
        sql = conn.statements[-1][0]
        assert "(payload_json::jsonb ->> %s) = %s" in sql
        assert "@> to_jsonb(%s::text)" in sql
        assert "json_extract" not in sql

        repo.count_payload_values("v1", "object.detection", "$.label")
        sql = conn.statements[-1][0]
        assert "jsonb_path_query_first" in sql

    def test_latest_per_language_uses_distinct_on(self, pg_db):
        db, conn = pg_db
        from eioku_tpu.domain.artifacts import SelectionPolicy
        from eioku_tpu.repositories.artifact_repository import ArtifactRepository

        pol = SelectionPolicy(mode="latest_per_language")
        ArtifactRepository(db).get_by_asset(
            "v1", artifact_type="transcript.segment", selection=pol)
        sql = conn.statements[-1][0]
        assert "DISTINCT ON" in sql


class TestSqliteBranchStillLive:
    """The same service calls over sqlite must keep producing sqlite SQL —
    executed for real (the rest of the suite covers behavior; this pins the
    branch selection)."""

    def test_find_on_sqlite_executes(self, tmp_path):
        from eioku_tpu.db.connection import connect
        from eioku_tpu.db.migrations import run_migrations
        from eioku_tpu.services.find_service import FindWithinVideoService

        db = connect(f"sqlite:///{tmp_path}/x.db")
        run_migrations(db)
        db.execute("INSERT INTO transcript_fts (text) VALUES ('hello world')")
        db.execute(
            "INSERT INTO transcript_fts_meta (rowid, artifact_id, asset_id,"
            " start_ms, end_ms, language, run_id) VALUES (1,'a1','v1',0,1000,"
            "'en','r1')")
        out = FindWithinVideoService(db).find("v1", "hello")
        assert out and out[0]["jump_to"]["start_ms"] == 0
        assert "<b>" in out[0]["snippet"]


class TestVocabBuilders:
    def test_sqlite_fts5vocab(self):
        assert SQLITE.fts_vocab_setup("transcript_fts") == [
            "CREATE VIRTUAL TABLE IF NOT EXISTS transcript_fts_vocab"
            " USING fts5vocab('transcript_fts', 'row')"]
        assert SQLITE.fts_vocab_terms("transcript_fts") == \
            "SELECT term, doc FROM transcript_fts_vocab"

    def test_pg_ts_stat(self):
        assert POSTGRES.fts_vocab_setup("ocr_fts") == []
        assert POSTGRES.fts_vocab_terms("ocr_fts") == \
            "SELECT word, ndoc FROM ts_stat('SELECT ts FROM ocr_fts')"

    def test_suggestions_emit_ts_stat_on_pg(self, pg_db):
        db, conn = pg_db
        from eioku_tpu.services.find_service import FindWithinVideoService

        FindWithinVideoService(db).suggest_alternatives("foxx")
        sql = "\n".join(s for s, _ in conn.statements)
        assert "ts_stat('SELECT ts FROM transcript_fts')" in sql
