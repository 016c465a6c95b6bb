"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only; its incremental-run seam (numbered
results_NNN manifests, per-record fault isolation, src/run.py:122-146)
maps to micro-batches + ``foreachBatch(batchId)`` + status-column
dead-lettering. Window aggregations are defined once and used in BOTH
batch demos (DuckDB-oracle-checkable) and streaming pipelines —
``F.window``/``F.session_window`` work identically in either mode.

Scale notes: watermark bounds state; windowed aggs shuffle on
(key, window) — at 1000 executors state is partitioned by key; the
dead-letter split costs nothing extra (same scan, two filters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import quality


def _epoch(col: Column) -> Column:
    return F.unix_timestamp(col)


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling event-time windows; window bounds exported as epoch
    seconds (engine-neutral, timezone-proof)."""
    w = F.window("ts", width)
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            _epoch(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    w = F.window("ts", width, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(_epoch(F.col("w.start")).alias("window_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based); ends are last-event+gap."""
    w = F.session_window("ts", gap)
    return (
        events.groupBy(w.alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            _epoch(F.col("w.start")).alias("session_start"),
            _epoch(F.col("w.end")).alias("session_end"),
            "n",
        )
    )


def with_watermark(events: DataFrame, delay: str = "15 minutes") -> DataFrame:
    return events.withWatermark("ts", delay)


def dead_letter_split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-record fault isolation as data (src/run.py:93-120): rows that
    fail validation go to a dead-letter stream; the run never aborts."""
    bad = (F.col("value").isNull()) | (F.col("value") < 0) | (
        F.col("event_type") == "error"
    )
    return events.filter(~bad), events.filter(bad)


def streaming_pipeline(
    spark, source_dir: str, checkpoint_dir: str, manifest_dir: str
):
    """File-source streaming analog of the reference's run loop:
    watermark → tumbling counts per type → foreachBatch manifest with
    the batchId as the run number (replacing the racy max+1 scan,
    src/run.py:135-141).

    Returns the StreamingQuery; callers trigger availableNow for tests
    or leave it continuous in production.
    """
    import json
    import os

    from shippai_knowledge_etl_spark.tables import stream_events

    good, _bad = dead_letter_split(stream_events(spark, source_dir))
    agg = tumbling_counts(with_watermark(good))

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        summary = (
            batch_df.agg(
                F.count(F.lit(1)).alias("n_windows"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("n_events"),
            )
            .collect()[0]
            .asDict()
        )
        os.makedirs(manifest_dir, exist_ok=True)
        path = os.path.join(manifest_dir, f"results_{batch_id:03d}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"batch_id": batch_id, **summary}, f, ensure_ascii=False)

    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(emit)
    )


def streaming_dedup(spark, source_dir: str, delay: str = "30 minutes") -> DataFrame:
    """dropDuplicatesWithinWatermark on (user_id, event_type): stateful
    streaming dedup whose state is bounded by the watermark (the
    unbounded-history batch analog is o3_first_occurrence_dedup)."""
    from shippai_knowledge_etl_spark.tables import stream_events

    return with_watermark(stream_events(spark, source_dir), delay).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def status_manifest(events: DataFrame) -> DataFrame:
    """The A1 manifest over a (micro-)batch of events, reusing the
    batch quality operators — same code both modes."""
    classified = events.withColumn(
        "status",
        F.when(F.col("event_type") == "error", quality.STATUS_ERROR)
        .when(F.col("value") < 0.1, quality.STATUS_EXCLUDED)
        .otherwise(quality.STATUS_SUCCESS),
    )
    return quality.status_summary(classified)
