from eioku_tpu.db.connection import Database, get_database, set_database
from eioku_tpu.db.migrations import run_migrations

__all__ = ["Database", "get_database", "set_database", "run_migrations"]
