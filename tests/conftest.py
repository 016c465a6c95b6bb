from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("shippai-etl-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same views the driver pre-registers."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{TEST_SF_DIR}/{name}.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


DRIVER_SF_DIR = os.environ.get("SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def duck_sf001():
    """DuckDB views at sf0.01 — the scale the EXTERNAL driver verifies
    at. Window queries run against this too (test_oracle_parity), so
    scale-boundary flakes (approx-sketch exactness, limit ties) surface
    locally instead of at the driver."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{DRIVER_SF_DIR}/{name}.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()
