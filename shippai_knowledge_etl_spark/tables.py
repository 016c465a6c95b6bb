"""Loaders for the driver's synthetic tables (TESTDATA.md).

All queries go through :func:`load` so scan-level concerns (schema,
column pruning, session timezone) are uniform. Parquet scans get
predicate pushdown and column pruning from Catalyst for free — callers
should ``.select(...)`` / ``.filter(...)`` as early as possible and let
the optimizer push them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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
)

# Dimension tables small enough to broadcast at any scale factor —
# region/nation are fixed-size; labels-style dims belong here too.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; session TZ pinned to UTC first so
    timestamp-derived values are independent of the caller's locale."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
