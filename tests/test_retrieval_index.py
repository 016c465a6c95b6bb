"""Inverted index AT REST: term-bucketed postings as a partitioned
parquet layout. The lexical-retrieval scale story end-to-end: build
the full postings once, lay them out partitioned by term bucket, and
probe a query vocabulary — the probe must prune at PLAN time
(PartitionFilters on the bucket directories, term equality pushed to
the scan) and return exactly the unpruned postings restricted to the
query terms. At 100 TB this layout turns BM25 candidate generation
from a corpus scan into an index read of |query| directories."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import retrieval
from shippai_knowledge_etl_spark.tables import load

TERMS = ("spark", "join", "window")
N_BUCKETS = 16


@pytest.mark.slow
def test_postings_index_partition_pruned_probe(spark, sf_dir, tmp_path):
    d = load(spark, sf_dir, "documents")
    postings = retrieval.build_postings(d, "doc_id", "text", N_BUCKETS)

    layout = str(tmp_path / "postings")
    postings.write.mode("overwrite").partitionBy("term_bucket").parquet(layout)
    index = spark.read.parquet(layout)

    # route the query terms to their buckets with the SAME hash
    buckets = {
        r["term_bucket"]
        for r in spark.createDataFrame([(t,) for t in TERMS], "term string")
        .select(
            F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).alias("term_bucket")
        )
        .collect()
    }
    probe = index.filter(
        F.col("term_bucket").isin(sorted(buckets))
        & F.col("term").isin(*TERMS)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "term_bucket" in part[1][:300], plan[:1500]
    assert "PushedFilters" in plan and "term" in plan.split(
        "PushedFilters", 1
    )[1][:300], plan[:1500]

    got = {
        (r["term"], r["doc_id"], r["tf"], r["dl"]) for r in probe.collect()
    }
    want = {
        (r["term"], r["doc_id"], r["tf"], r["dl"])
        for r in postings.filter(F.col("term").isin(*TERMS)).collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_batch_bm25_agrees_with_single_query_form(spark, sf_dir):
    """Each query of the batch must rank documents identically to the
    single-query dense form (scores differ only in the DECIMAL-vs-
    fixed-order summation path, which agrees after round(6))."""
    d = load(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(7, t) for t in TERMS], "query_id int, term string"
    )
    batch = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_topk_batch(d, "doc_id", "text", q, 10).collect()
    }
    single = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_topk(d, "doc_id", "text", TERMS, 10).collect()
    }
    assert set(batch) == set(single)
    for doc_id, s in single.items():
        assert abs(batch[doc_id] - s) < 2e-6, (doc_id, batch[doc_id], s)
