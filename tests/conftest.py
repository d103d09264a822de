from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TZ", "UTC")


@pytest.fixture(scope="session")
def spark():
    from elb_pipeline.session import get_spark

    s = get_spark(
        app="elb_pipeline_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "2048"},
    )
    yield s
    s.stop()


# Overridable so the oracle-parity suite can be re-run at the driver's
# sf0.01 (ELB_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/test_entry_oracle.py).
SF_DIR = os.environ.get("ELB_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()
