"""[EXT] Streaming sketch state: running distinct counts (HLL) and a
seen-key filter (Bloom) maintained across micro-batches.

This is the incremental form of ``operators/sketches.py`` and the
reason those sketches are built MERGEABLE: a crawl frontier needs
"how many distinct users/URLs so far" and "is this key new" answered
per micro-batch without rescanning history. Each batch computes its
own fixed-size sketch (map-side partial aggregation does the per-
partition work), then ``foreachBatch`` max-merges (HLL) or OR-merges
(Bloom) it into a parquet state table whose size is CONSTANT in the
stream length — per-group registers for HLL, <=4096 words for Bloom.

Replay safety: state versions are written per batchId (the same
replace-the-racy-max+1 discipline as ``windows.streaming_pipeline``),
and the prior state for batch N is the highest version STRICTLY BELOW
N — so a replayed batch re-reads its true pre-batch state and
overwrites its own outputs with identical content (max / OR merges are
idempotent), instead of reading the half-committed version it wrote
before the crash (which would both self-overwrite-while-reading and,
for Bloom, suppress the replayed batch's first-seen keys forever).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import sketches


def _prior_state(
    spark: SparkSession, state_dir: str, prefix: str, before_batch: int
):
    """Read the highest state version with batch id < ``before_batch``
    (None if there is none) — NOT simply the newest file: after a crash
    mid-batch the newest file may be the replayed batch's own partial
    output (see module docstring)."""
    if not os.path.isdir(state_dir):
        return None
    versions = [
        v
        for v in os.listdir(state_dir)
        if v.startswith(prefix) and int(v[len(prefix):]) < before_batch
    ]
    if not versions:
        return None
    return spark.read.parquet(os.path.join(state_dir, max(versions)))


def streaming_hll_distinct(
    spark: SparkSession,
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Running distinct-``user_id`` per event_type across micro-batches
    of a streaming ``events`` DataFrame (any source with user_id +
    event_type columns — ``tables.stream_events`` or a test stream).

    Per batch: HLL register rows for the batch alone (a fixed-size
    artifact no matter how large the batch), max-merged with the prior
    state, written as ``state_dir/regs_{batchId:05d}``; the running
    estimates land in ``out_dir/estimates_{batchId:05d}.jsonl`` (one
    line per group — per-batch files, like the run manifests, so the
    estimate HISTORY survives and a replay overwrites only its own
    file). The estimate after N batches is EXACTLY the estimate of a
    one-shot build over their union (max-merge is associative and
    idempotent — ``tests/test_streaming_sketches.py`` pins this),
    which is what a restart-safe 100 TB frontier needs: no rescan,
    no drift."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        batch_regs = sketches.hll_register_rows(
            batch_df.select(
                "event_type", F.col("user_id").cast("string").alias("k")
            ),
            ["event_type"],
            "k",
        )
        prior = _prior_state(spark, state_dir, "regs_", batch_id)
        merged = (
            batch_regs.unionAll(prior) if prior is not None else batch_regs
        ).groupBy("event_type", "reg").agg(F.max("rank").alias("rank"))
        os.makedirs(state_dir, exist_ok=True)
        state_path = os.path.join(state_dir, f"regs_{batch_id:05d}")
        merged.write.mode("overwrite").parquet(state_path)
        rows = (
            sketches.hll_summary(
                spark.read.parquet(state_path), ["event_type"]
            )
            .orderBy("event_type")
            .collect()
        )
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"estimates_{batch_id:05d}.jsonl")
        with open(out_path, "w", encoding="utf-8") as f:
            for r in rows:
                est = sketches.hll_estimate(
                    r["hll_sum_scaled"], r["hll_zero_regs"]
                )
                f.write(
                    json.dumps(
                        {
                            "batch_id": batch_id,
                            "event_type": r["event_type"],
                            "distinct_users_est": round(est, 2),
                        }
                    )
                    + "\n"
                )

    return (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
    )


def streaming_new_keys(
    spark: SparkSession,
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Emit each (user_id, event_type) key the FIRST micro-batch it is
    ever seen, filtered by a Bloom state instead of an ever-growing
    exact key store — the crawl-frontier "is this URL new" primitive.

    Per batch: probe the batch's distinct keys against the PRE-batch
    filter (never-seen keys are emitted to ``out_dir/batch_{id}``,
    also deduped within the batch), then OR-merge the batch's cells
    into ``state_dir/bloom_{batchId:05d}``. Replays recompute the same
    fresh set from the same pre-batch state (see ``_prior_state``).
    One-sided semantics at scale: a key already inserted is NEVER
    re-emitted (no false negatives); a genuinely new key is missed
    only at the filter's false-positive rate (~1.2e-5 at 1k keys /
    2^16 bits) — the standard frontier trade: constant state, bounded
    misses, zero re-crawls."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        keys = batch_df.select(
            F.concat_ws(
                ":", F.col("user_id").cast("string"), F.col("event_type")
            ).alias("k")
        ).distinct()
        prior = _prior_state(spark, state_dir, "bloom_", batch_id)
        if prior is None:
            fresh = keys
            batch_bloom = sketches.bloom_build(keys, "k")
        else:
            probed = sketches.bloom_might_contain(prior, keys, "k")
            fresh = probed.filter(~F.col("might_contain")).select("k")
            batch_bloom = (
                sketches.bloom_build(keys, "k")
                .unionAll(prior)
                .groupBy("word")
                .agg(F.bit_or("bits").alias("bits"))
            )
        fresh.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_{batch_id:05d}")
        )
        os.makedirs(state_dir, exist_ok=True)
        batch_bloom.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"bloom_{batch_id:05d}")
        )

    return (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
    )
