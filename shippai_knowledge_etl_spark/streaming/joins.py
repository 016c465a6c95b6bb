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


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, key: str, dim_key: str
) -> DataFrame:
    """Stream-static enrichment join — the third §2.10 join shape next
    to stream-stream (above) and batch lookup (J1). The static side is
    explicitly broadcast: Spark re-plans the static relation per
    micro-batch, and broadcasting keeps the stream side shuffle-free
    (no state store at all — unlike stream-stream, a stream-static
    inner join needs no watermark because the static side never
    grows). At 100 TB-of-stream the dimension rides in the task
    closure exactly like J1's lookup table."""
    return events.join(F.broadcast(dim), events[key] == dim[dim_key], "inner")


def enriched_nation_counts(
    events: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation event counts over the enriched stream: events →
    customer (user_id = c_custkey) → nation, both dims broadcast; the
    only stateful operator is the final streaming aggregate, keyed by
    the (tiny) nation dimension."""
    e = enrich_with_dim(
        events, customer.select("c_custkey", "c_nationkey"), "user_id", "c_custkey"
    )
    e = enrich_with_dim(
        e, nation.select("n_nationkey", "n_name"), "c_nationkey", "n_nationkey"
    )
    return e.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        # DECIMAL internally → exact under any partial-agg order; emit
        # double at the boundary (repo hash-gate discipline)
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2
        ).alias("total_value"),
    )
