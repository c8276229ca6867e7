"""First-party sqlite3 engine.

Replaces the reference's SQLAlchemy engine + scoped sessions
(/root/reference/backend/src/database/connection.py:6-62). Design choices:
  - One connection per Database instance with an RLock serializing transactions.
    SQLite serializes writers anyway; WAL mode lets concurrent *processes*
    (API service + workers) share the same file, which is how the reference's
    PG pool is used in practice.
  - URL forms: "sqlite:///relative/path.db", "sqlite:////abs/path.db",
    "sqlite:///:memory:", or a bare filesystem path.
  - PostgreSQL URLs are gated: accepted by the parser, but raise a clear error
    unless a psycopg2 driver is importable (not present in this environment).
"""
from __future__ import annotations

import os
import sqlite3
import threading
from contextlib import contextmanager
from typing import Any, Iterator

DEFAULT_DATABASE_URL = "sqlite:///./data/eioku.db"


def _parse_sqlite_url(url: str) -> str:
    if url.startswith("sqlite:///"):
        return url[len("sqlite:///"):]
    if url.startswith("sqlite://"):
        return url[len("sqlite://"):] or ":memory:"
    return url


class Database:
    def __init__(self, url: str | None = None):
        url = url or os.environ.get("EIOKU_DATABASE_URL") or os.environ.get(
            "DATABASE_URL") or DEFAULT_DATABASE_URL
        if url.startswith(("postgresql://", "postgres://")):
            raise RuntimeError(
                "PostgreSQL driver is not available in this environment; "
                "use a sqlite:/// URL (WAL mode supports multi-process access)"
            )
        self.url = url
        self.path = _parse_sqlite_url(url)
        if self.path not in (":memory:", "") and not self.path.startswith("file:"):
            d = os.path.dirname(os.path.abspath(self.path))
            os.makedirs(d, exist_ok=True)
        self._lock = threading.RLock()
        self._txn_depth = 0
        # isolation_level=None: full manual transaction control. The module's
        # legacy auto-BEGIN starts DEFERRED transactions only before DML, so
        # read-check-then-write sequences would not be atomic across
        # processes; transaction() below issues BEGIN IMMEDIATE instead.
        self._conn = sqlite3.connect(
            self.path, check_same_thread=False, timeout=30.0,
            isolation_level=None, uri=self.path.startswith("file:"),
        )
        self._conn.row_factory = sqlite3.Row
        self._conn.execute("PRAGMA foreign_keys=ON")
        self._conn.execute("PRAGMA busy_timeout=10000")
        if self.path != ":memory:":
            self._conn.execute("PRAGMA journal_mode=WAL")
            self._conn.execute("PRAGMA synchronous=NORMAL")

    @contextmanager
    def transaction(self) -> Iterator[sqlite3.Connection]:
        """Serialized transaction scope; commits on success, rolls back on
        error. BEGIN IMMEDIATE takes the write lock up front so
        read-check-then-write sequences (job dedup, claim-once) are atomic
        against other processes. Re-entrant: nested scopes (and execute()
        calls inside a scope) join the outer transaction instead of
        committing it mid-flight."""
        with self._lock:
            outermost = self._txn_depth == 0
            if outermost:
                self._conn.execute("BEGIN IMMEDIATE")
            self._txn_depth += 1
            try:
                yield self._conn
            except BaseException:
                self._txn_depth -= 1
                if outermost:
                    self._conn.rollback()
                raise
            self._txn_depth -= 1
            if outermost:
                self._conn.commit()

    def execute(self, sql: str, params: tuple | dict = ()) -> sqlite3.Cursor:
        with self._lock:
            return self._conn.execute(sql, params)

    def executemany(self, sql: str, seq: list[tuple]) -> None:
        with self._lock:
            self._conn.executemany(sql, seq)

    def query(self, sql: str, params: tuple | dict = ()) -> list[sqlite3.Row]:
        with self._lock:
            return self._conn.execute(sql, params).fetchall()

    def query_one(self, sql: str, params: tuple | dict = ()) -> sqlite3.Row | None:
        with self._lock:
            return self._conn.execute(sql, params).fetchone()

    def scalar(self, sql: str, params: tuple | dict = ()) -> Any:
        row = self.query_one(sql, params)
        return None if row is None else row[0]

    def close(self) -> None:
        with self._lock:
            self._conn.close()


def execute_script(conn: sqlite3.Connection, script: str) -> None:
    """Run a multi-statement SQL script INSIDE the current transaction.

    sqlite3's executescript() implicitly COMMITs any pending transaction
    (even with isolation_level=None), which would break the per-migration
    atomicity: a failure mid-script would leave partial schema with no
    version row, wedging every subsequent startup on 'table already
    exists'. Statements are split with sqlite3.complete_statement so
    semicolons inside trigger bodies (FTS sync triggers) survive.
    """
    buf = ""
    for line in script.splitlines(keepends=True):
        buf += line
        if sqlite3.complete_statement(buf):
            stmt = buf.strip()
            if stmt:
                conn.execute(stmt)
            buf = ""
    if buf.strip():
        conn.execute(buf)



_global_db: Database | None = None
_global_lock = threading.Lock()


def get_database() -> Database:
    """Process-wide default database (lazily created from env)."""
    global _global_db
    with _global_lock:
        if _global_db is None:
            _global_db = Database()
        return _global_db


def set_database(db: Database | None) -> None:
    global _global_db
    with _global_lock:
        _global_db = db
