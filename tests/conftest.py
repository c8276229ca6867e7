import pytest

from eioku_tpu.db.connection import Database
from eioku_tpu.db.migrations import run_migrations
from eioku_tpu.domain.schema_registry import register_all_schemas

register_all_schemas()


@pytest.fixture()
def db():
    d = Database("sqlite:///:memory:")
    run_migrations(d)
    yield d
    d.close()
