"""Stream-stream interval join (SURVEY.md §2.10 [EXT]).

The reference is batch-only; correlating two live feeds (here: each
click with the same user's purchases inside a bounded horizon) is the
canonical stream-stream join. Defined once over plain DataFrames so the
SAME function runs in batch mode (DuckDB-oracle-checkable) and in
Structured Streaming (both sides watermarked; the time-range predicate
is what lets Spark bound join state and evict rows older than
watermark + horizon — without it a stream-stream inner join is
rejected/unbounded).

Scale notes: shuffles both sides on user_id only; state per key is
bounded by (watermark delay + horizon) × event rate. Skewed users fall
under AQE skew handling in batch; in streaming the state store
partitions by the shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_pairs(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "10 minutes"
) -> DataFrame:
    """Inner interval join: purchase within [click_ts, click_ts+horizon]
    for the same user. Inputs need columns (event_id, user_id, ts) and
    may be batch or streaming DataFrames (watermark them upstream for
    streaming)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        "inner",
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_s"),
    )
