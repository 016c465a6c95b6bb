"""Streaming incremental postings index: a 3-batch document stream
must leave an index + stats state from which BM25 answers EXACTLY as
the batch operator over the same corpus, and batch replay must not
duplicate postings."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import retrieval
from shippai_knowledge_etl_spark.streaming import index as SI
from shippai_knowledge_etl_spark.tables import load

TERMS = ("spark", "join", "window")


@pytest.mark.slow
def test_incremental_index_matches_batch_bm25(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "doc_stream")
    # three source files -> three micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"part{i}"))

    index_dir = str(tmp_path / "index")
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            SI.make_index_merger(index_dir, state_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"

    # multiple batch generations actually exist
    gens = [d for d in os.listdir(index_dir) if d.startswith("batch=")]
    assert len(gens) >= 2, gens

    got = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    want = retrieval.bm25_topk(docs, "doc_id", "text", TERMS, 10).collect()
    assert [(r["doc_id"], r["bm25"]) for r in got] == [
        (r["doc_id"], r["bm25"]) for r in want
    ]


@pytest.mark.slow
def test_index_merge_is_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-running a batch id overwrites its own generation: postings
    counts and stats are unchanged by the replay."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    index_dir = str(tmp_path / "index")
    state_dir = str(tmp_path / "state")
    merge = SI.make_index_merger(index_dir, state_dir)
    merge(docs, 0)
    first = SI.read_index(spark, index_dir).count()
    stats_first = SI._prior_stats(state_dir, 1 << 62)
    merge(docs, 0)  # replay
    assert SI.read_index(spark, index_dir).count() == first
    assert SI._prior_stats(state_dir, 1 << 62) == stats_first


@pytest.mark.slow
def test_index_query_prunes_term_buckets(spark, sf_dir, tmp_path):
    """The index-answered query must reach the scan with a
    term_bucket PartitionFilter (not read every bucket directory)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = str(tmp_path / "index")
    state_dir = str(tmp_path / "state")
    SI.make_index_merger(index_dir, state_dir)(docs, 0)
    df = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "term_bucket" in part[1][:300], plan[:1500]


@pytest.mark.slow
def test_index_query_without_state_raises_clearly(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="index state"):
        SI.bm25_from_index(
            spark, str(tmp_path / "idx"), str(tmp_path / "nope"), TERMS, 10
        )


@pytest.mark.slow
def test_compaction_preserves_answers_and_shrinks_generations(
    spark, sf_dir, tmp_path
):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = str(tmp_path / "index")
    state_dir = str(tmp_path / "state")
    merge = SI.make_index_merger(index_dir, state_dir)
    for i in range(3):
        merge(docs.filter(F.col("doc_id") % 3 == i), i)

    before = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    removed = SI.compact_index(spark, index_dir)
    assert removed == 3
    gens = [d for d in os.listdir(index_dir) if d.startswith("batch=")]
    assert gens == ["batch=-1"]
    after = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]
    # a later batch still lands on top of the compacted generation
    merge(docs.limit(0), 7)
    again = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in before]


@pytest.mark.slow
def test_recompaction_keeps_previously_compacted_postings(
    spark, sf_dir, tmp_path
):
    """compact → ingest more batches → compact AGAIN: the second
    compaction must carry the first compacted generation's postings
    into the rewrite (the regression was filtering batch=-1 out of
    ``live`` while still deleting its directory — every previously
    compacted posting vanished and BM25 scored against inflated
    stats over a truncated index)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = str(tmp_path / "index")
    state_dir = str(tmp_path / "state")
    merge = SI.make_index_merger(index_dir, state_dir)
    merge(docs.filter(F.col("doc_id") % 3 == 0), 0)
    merge(docs.filter(F.col("doc_id") % 3 == 1), 1)
    assert SI.compact_index(spark, index_dir) == 2
    rows_after_first = SI.read_index(spark, index_dir).count()

    # new batches arrive on top of the compacted generation
    merge(docs.filter(F.col("doc_id") % 3 == 2), 5)
    full = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    total_rows = SI.read_index(spark, index_dir).count()
    assert total_rows > rows_after_first

    assert SI.compact_index(spark, index_dir) == 1
    gens = [d for d in os.listdir(index_dir) if d.startswith("batch=")]
    assert gens == ["batch=-1"]
    # no posting lost: row count and answers identical to pre-compaction
    assert SI.read_index(spark, index_dir).count() == total_rows
    after = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in full]
    # compacting when ONLY the compacted generation exists is a no-op
    assert SI.compact_index(spark, index_dir) == 0
    assert SI.read_index(spark, index_dir).count() == total_rows


@pytest.mark.slow
def test_compaction_crash_between_swap_renames_rolls_forward(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the compaction between its two swap renames (previous
    batch=-1 already moved to .old, tmp not yet promoted): the next
    compact_index call must roll forward — promote the complete tmp,
    drop .old, and finish removing the absorbed sources via the
    _MERGED_SOURCES manifest — restoring exactly the no-crash rows
    and answers. This pins the round-6 reader-visible crash window
    (rmtree(final) before os.replace left the compacted generation
    deleted with its replacement still dot-prefixed)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = str(tmp_path / "index")
    state_dir = str(tmp_path / "state")
    merge = SI.make_index_merger(index_dir, state_dir)
    merge(docs.filter(F.col("doc_id") % 3 == 0), 0)
    merge(docs.filter(F.col("doc_id") % 3 == 1), 1)
    assert SI.compact_index(spark, index_dir) == 2
    merge(docs.filter(F.col("doc_id") % 3 == 2), 5)
    want = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    total_rows = SI.read_index(spark, index_dir).count()

    final = os.path.join(index_dir, "batch=-1")
    real_replace = os.replace

    def crash_at_promote(src, dst):
        if dst == final:
            raise RuntimeError("simulated crash between swap renames")
        return real_replace(src, dst)

    with monkeypatch.context() as m:
        m.setattr(os, "replace", crash_at_promote)
        with pytest.raises(RuntimeError, match="simulated crash"):
            SI.compact_index(spark, index_dir)

    # the crash state: final gone, but BOTH complete copies survive
    # under deterministic dot names, and the source is untouched
    assert not os.path.isdir(final)
    assert os.path.isdir(os.path.join(index_dir, ".compact_-1"))
    assert os.path.isdir(os.path.join(index_dir, ".compact_-1.old"))
    assert os.path.isdir(os.path.join(index_dir, "batch=5"))

    # next call recovers first; nothing left to compact afterwards
    assert SI.compact_index(spark, index_dir) == 0
    gens = [d for d in os.listdir(index_dir) if d.startswith("batch=")]
    assert gens == ["batch=-1"]
    assert not os.path.isdir(os.path.join(index_dir, ".compact_-1"))
    assert not os.path.isdir(os.path.join(index_dir, ".compact_-1.old"))
    assert SI.read_index(spark, index_dir).count() == total_rows
    after = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in want]


@pytest.mark.slow
def test_compaction_crash_mid_source_removal_recovers_without_double_count(
    spark, sf_dir, tmp_path
):
    """Kill the compaction after the publish but before the absorbed
    source generations are removed: until recovery runs, readers see
    double rows (the documented maintenance-window instant) — the next
    compact_index call must delete exactly the generations named by
    the published _MERGED_SOURCES manifest before reading anything,
    so no posting is ever double-counted into a re-compaction."""
    import shutil

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = str(tmp_path / "index")
    state_dir = str(tmp_path / "state")
    merge = SI.make_index_merger(index_dir, state_dir)
    merge(docs.filter(F.col("doc_id") % 3 == 0), 0)
    merge(docs.filter(F.col("doc_id") % 3 == 1), 1)
    backup = str(tmp_path / "backup_batch1")
    shutil.copytree(os.path.join(index_dir, "batch=1"), backup)
    assert SI.compact_index(spark, index_dir) == 2
    want = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    clean_rows = SI.read_index(spark, index_dir).count()

    # fabricate the crash state: an absorbed source back on disk with
    # the manifest still naming it (marker removal is the LAST step)
    shutil.copytree(backup, os.path.join(index_dir, "batch=1"))
    with open(os.path.join(index_dir, "batch=-1", "_MERGED_SOURCES"), "w") as f:
        f.write("batch=1")
    assert SI.read_index(spark, index_dir).count() > clean_rows  # the hazard

    assert SI.compact_index(spark, index_dir) == 0
    assert not os.path.isdir(os.path.join(index_dir, "batch=1"))
    assert not os.path.isfile(
        os.path.join(index_dir, "batch=-1", "_MERGED_SOURCES")
    )
    assert SI.read_index(spark, index_dir).count() == clean_rows
    after = SI.bm25_from_index(spark, index_dir, state_dir, TERMS, 10).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in want]


@pytest.mark.slow
def test_sig_store_matches_batch_hamming(spark, sf_dir, tmp_path):
    """A 3-batch embedding stream leaves a signature store whose
    Hamming answers equal the batch operator over the same corpus."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    src = str(tmp_path / "emb_stream")
    for i in range(3):
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"part{i}"))

    sig_dir = str(tmp_path / "sigs")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part*"))
    )
    q = (
        stream.writeStream.foreachBatch(SI.make_sig_merger(sig_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt_sig"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    got = SI.hamming_from_sig_store(spark, sig_dir, 0, 10).collect()
    want = retrieval.hamming_topk(emb, "vec_id", "embedding", 0, 10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


@pytest.mark.slow
def test_incremental_near_dup_catches_cross_batch_copy(spark, sf_dir, tmp_path):
    """A batch-2 document that copies a batch-0 document must surface
    as a candidate pair against the stored band index, without
    re-shingling the historical corpus; two near-duplicates arriving
    inside the SAME micro-batch must also surface (via the self-probe
    — no later batch ever compares one generation against itself);
    replaying batch 2 emits the identical pairs."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # batch 0: base docs + an exact copy of doc 3 under a new id, so
    # the duplicate pair lives entirely inside one micro-batch
    intra_copy = docs.filter(F.col("doc_id") == 3).select(
        F.lit(800000).cast("long").alias("doc_id"), "text"
    )
    b0 = docs.filter(F.col("doc_id") < 200).unionByName(intra_copy)
    b1 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
    # batch 2: fresh docs + an exact copy of doc 7 under a new id
    copy = docs.filter(F.col("doc_id") == 7).select(
        F.lit(900000).cast("long").alias("doc_id"), "text"
    )
    b2 = docs.filter(F.col("doc_id") >= 400).unionByName(copy)

    band_dir = str(tmp_path / "bands")
    pairs_dir = str(tmp_path / "pairs")
    merge = SI.make_near_dup_merger(band_dir, pairs_dir)
    for i, b in enumerate((b0, b1, b2)):
        merge(b, i)

    # intra-batch pair caught in batch 0's own generation, oriented
    # new_id > old_id so the unordered pair appears exactly once
    p0 = [
        (r["new_id"], r["old_id"])
        for r in spark.read.parquet(os.path.join(pairs_dir, "batch=0")).collect()
    ]
    assert (800000, 3) in p0
    assert len(p0) == len(set(p0))
    assert all(n > o for n, o in p0)

    pairs = {
        (r["new_id"], r["old_id"])
        for r in spark.read.parquet(os.path.join(pairs_dir, "batch=2")).collect()
    }
    assert (900000, 7) in pairs

    first = sorted(pairs)
    merge(b2, 2)  # replay
    again = sorted(
        (r["new_id"], r["old_id"])
        for r in spark.read.parquet(os.path.join(pairs_dir, "batch=2")).collect()
    )
    assert again == first
