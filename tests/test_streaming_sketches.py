"""Streaming sketch state: multi-batch HLL merge equals the one-shot
build; Bloom frontier emits each key at most once."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import sketches
from shippai_knowledge_etl_spark.streaming import sketches as SS
from shippai_knowledge_etl_spark.tables import load


@pytest.fixture()
def two_batch_stream(spark, sf_dir, tmp_path):
    """(streaming DataFrame, source path): events split into two
    parquet files + maxFilesPerTrigger=1 -> two genuine micro-batches,
    so the cross-batch state merge is actually exercised."""
    src = str(tmp_path / "events_src")
    ev = load(spark, sf_dir, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    n_files = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_files == 2, os.listdir(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    yield stream, src
    shutil.rmtree(src, ignore_errors=True)


def _run(q):
    sq = q.trigger(availableNow=True).start()
    assert sq.awaitTermination(300), "streaming query did not finish"


@pytest.mark.slow
def test_streaming_hll_matches_oneshot(spark, sf_dir, two_batch_stream, tmp_path):
    events, _src = two_batch_stream
    state = str(tmp_path / "hll_state")
    out = str(tmp_path / "hll_out")
    _run(
        SS.streaming_hll_distinct(
            spark, events, state, str(tmp_path / "ckpt_hll"), out
        )
    )
    versions = sorted(os.listdir(state))
    assert len(versions) == 2, versions  # two real micro-batches
    # per-batch estimate history survives (batch 1 must not erase batch 0)
    est_files = sorted(os.listdir(out))
    assert est_files == ["estimates_00000.jsonl", "estimates_00001.jsonl"]
    # replay safety: the prior state for batch 1 is batch 0's version,
    # never batch 1's own (half-written) one
    prior = SS._prior_state(spark, state, "regs_", 1)
    assert prior is not None
    assert SS._prior_state(spark, state, "regs_", 0) is None
    final = spark.read.parquet(os.path.join(state, versions[-1]))

    oneshot = sketches.hll_register_rows(
        load(spark, sf_dir, "events").select(
            "event_type", F.col("user_id").cast("string").alias("k")
        ),
        ["event_type"],
        "k",
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, oneshot.collect())
    )
    lines = [
        json.loads(l)
        for l in open(os.path.join(out, est_files[-1]))
    ]
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for rec in lines:
        e = exact[rec["event_type"]]
        assert abs(rec["distinct_users_est"] - e) / max(e, 1) < 0.3, rec


@pytest.mark.slow
def test_streaming_new_keys_emits_once(spark, two_batch_stream, tmp_path):
    events, src = two_batch_stream
    state = str(tmp_path / "bloom_state")
    out = str(tmp_path / "fresh")
    _run(
        SS.streaming_new_keys(
            spark, events, state, str(tmp_path / "ckpt_bf"), out
        )
    )
    batches = sorted(os.listdir(out))
    assert len(batches) == 2, batches
    emitted = spark.read.parquet(*[os.path.join(out, b) for b in batches])
    n_emitted = emitted.count()
    # never twice: emitted keys are globally distinct
    assert emitted.distinct().count() == n_emitted
    # no false negatives ever -> at most the true distinct count; FP can
    # only suppress, so with ~2k keys in 2^16 bits we see nearly all
    true_distinct = (
        spark.read.parquet(src)
        .select(
            F.concat_ws(
                ":", F.col("user_id").cast("string"), F.col("event_type")
            ).alias("k")
        )
        .distinct()
        .count()
    )
    assert n_emitted <= true_distinct
    assert n_emitted >= int(true_distinct * 0.98)
