from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import shutil

    from gmall_flink_200621_spark.session import get_spark

    # Process-unique warehouse: the suite's fixed-name catalog fixtures
    # (t_compact, t_cdc, t_ingest, ...) collide when pytest and a verify
    # harness share ./spark-warehouse (r08's only red was a stale
    # t_compact dir from a concurrent run → LOCATION_ALREADY_EXISTS).
    # A pid-suffixed warehouse makes every test table collision-free by
    # construction — registry stream-view tables created during the suite
    # land here too, so a concurrent verify's warehouse is never touched.
    # Removed on teardown; the pid suffix means even a crashed run's
    # leftovers can't collide with the next run.
    wh = os.path.abspath(f"spark-warehouse/pytest-{os.getpid()}")
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    shutil.rmtree(wh, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con
