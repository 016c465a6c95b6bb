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
    timestamp-derived values are independent of the caller's locale.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read nanos as long and rebuild a microsecond
    timestamp with integer division — the same ns→µs truncation DuckDB
    applies, so oracle comparisons stay exact.
    """
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scale_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the scan produced fewer splits
    than the cluster has slots. Place this in front of compute-heavy
    stages (Python parse edges, shingling, per-row regex) whose cost is
    per-row work rather than I/O.

    On a real 100 TB layout the input has thousands of splits, the
    condition is false, and this is a no-op — no shuffle is added. The
    local testdata is one single-row-group parquet file per table, so a
    scan yields 1 split and every downstream map stage would otherwise
    run on 1 of 32 cores; AQE cannot fix scan-side underparallelism
    (it only coalesces/splits *post-shuffle* partitions).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions if min_partitions is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# events as the nanos-as-long reader sees it (streaming sources must
# declare a schema up front).
EVENTS_RAW_DDL = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """bigint nanos → microsecond TimestampType (truncating like
    DuckDB's ns→µs read); no-op if ts is already a timestamp."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming file source over the events parquet with the
    same ts normalization as the batch loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the file source wants a directory; glob-filter to the one table
    raw = (
        spark.readStream.schema(EVENTS_RAW_DDL)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events_ts(raw)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
