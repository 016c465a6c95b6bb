"""Similarity-search invariants that the SQL oracles can't express:
BLAS-vs-HOF agreement, k-means convergence, and IVF recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import simsearch
from shippai_knowledge_etl_spark.tables import load


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_blas_topk_matches_hof_ids(spark, emb):
    """The vectorized numpy path must return the same neighbor ids as
    the expression path (sims may differ in the last ulp)."""
    q = emb.filter(F.col("vec_id") == 0)
    hof = simsearch.topk_cosine(emb, q, k=10)
    blas = simsearch.topk_cosine_blas(emb, q, k=10)
    hof_ids = [r.vec_id for r in hof.collect()]
    blas_ids = [r.vec_id for r in blas.collect()]
    assert hof_ids == blas_ids
    # and the sims agree to far better than the ranking granularity
    hof_sims = {r.vec_id: r.sim for r in hof.collect()}
    for r in blas.collect():
        assert abs(hof_sims[r.vec_id] - r.sim) < 1e-6


def test_kmeans_objective_decreases(spark, emb):
    """Lloyd's iterations must not increase the within-cluster SSE."""
    prev = None
    for n in (1, 2, 3):
        assigned, _ = simsearch.kmeans_fit(emb, k=8, n_iter=n)
        sse = assigned.agg(F.sum("dist").alias("s")).collect()[0]["s"]
        if prev is not None:
            assert sse <= prev + 1e-6, f"SSE rose at iter {n}: {prev} -> {sse}"
        prev = sse


def test_kmeans_assignment_shape(spark, emb):
    assigned, centroids = simsearch.kmeans_fit(emb, k=8, n_iter=3)
    n = emb.count()
    assert assigned.count() == n  # every vector assigned exactly once
    clusters = {r.cluster for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(8)) and len(clusters) >= 2
    cents = centroids.collect()
    assert len(cents) == len({r.cluster for r in cents})
    assert all(len(r.centroid) == 64 for r in cents)


def test_ivf_recall_vs_brute_force(spark, emb):
    """Searching only the query's learned bucket must recover a decent
    fraction of the true top-10 (recall bound is loose: the corpus is
    random, so clusters are weak — the invariant is that pruned search
    returns plausible neighbors, not garbage)."""
    assigned, _ = simsearch.kmeans_fit(emb, k=8, n_iter=3)
    corpus = emb.join(assigned.select("vec_id", "cluster"), "vec_id")
    q = corpus.filter(F.col("vec_id") == 0)
    truth = {r.vec_id for r in simsearch.topk_cosine(emb, q, k=10).collect()}
    pruned = {
        r.vec_id
        for r in simsearch.topk_cosine_bucketed(
            corpus, q, k=10, bucket_col="cluster"
        ).collect()
    }
    assert len(pruned) == 10
    assert len(truth & pruned) >= 2


def test_lsh_buckets_spread_and_collide(spark, emb):
    """Sign-LSH buckets must (a) give identical ids to identical
    vectors, (b) spread a random corpus over many buckets, and (c) keep
    a slightly perturbed copy in the same bucket most of the time."""
    planes = simsearch._planes(64)
    bucketed = emb.select(
        "vec_id",
        simsearch.sign_lsh_bucket(F.col("embedding"), planes).alias("bucket"),
    )
    n_buckets = bucketed.select("bucket").distinct().count()
    assert n_buckets >= 32  # 500 random vectors over 256 buckets

    # perturb: nudge the first component; signs should survive mostly
    perturbed = emb.select(
        "vec_id",
        simsearch.sign_lsh_bucket(
            F.concat(
                F.array(F.get("embedding", 0).cast("double") + F.lit(0.001)),
                F.transform(
                    F.slice("embedding", 2, 63), lambda x: x.cast("double")
                ),
            ),
            planes,
        ).alias("bucket_p"),
    )
    joined = bucketed.join(perturbed, "vec_id")
    same = joined.filter(F.col("bucket") == F.col("bucket_p")).count()
    assert same / joined.count() >= 0.9
