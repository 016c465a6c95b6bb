"""Similarity search over embedding columns (SURVEY.md §2.11 [EXT]).

Brute-force cosine top-k as the exactness baseline, and a bucket-pruned
(IVF-style) variant as the scale path. Dot products are higher-order-
function expressions (zip_with + aggregate) — JVM-side, no Python UDF;
at 100 TB the upgrade is a Pandas-UDF batched BLAS kernel at the same
call sites (signature-compatible).

Scale notes:
  - query vectors broadcast (never shuffle the corpus for one query);
  - top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    heaps + k-row driver merge);
  - IVF: restrict the scan to the query's bucket(s) — partition-prune
    by a cluster-id column at rest, so the scan itself shrinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic summation order,
    so results are reproducible at any parallelism."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k: broadcast the query row(s), score every
    corpus vector, TakeOrderedAndProject. Tie-break on id."""
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    sim = cosine(F.col(vec_col), F.col("query_vec"))
    return (
        scored.select(
            "query_id",
            F.col(id_col),
            F.round(sim, 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def topk_cosine_bucketed(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style pruned search: score only vectors sharing the query's
    bucket (coarse cluster id). With the corpus partitioned by bucket at
    rest this is a partition-pruned scan — the 1000× speedup at scale.
    Recall depends on bucket quality; nprobe>1 = union more buckets."""
    q = query.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.col(bucket_col).alias("query_bucket"),
    )
    scored = corpus.join(
        F.broadcast(q), F.col(bucket_col) == F.col("query_bucket")
    ).filter(F.col(id_col) != F.col("query_id"))
    sim = cosine(F.col(vec_col), F.col("query_vec"))
    return (
        scored.select("query_id", F.col(id_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs within a bucket whose cosine
    meets the threshold. Bucketing bounds the pair space; the 100 TB
    form replaces the self-join with LSH banding over sign-projections."""
    a = corpus.select(
        F.col(bucket_col).alias("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = corpus.select(
        F.col(bucket_col).alias("bucket_b"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    pairs = a.join(
        b, (a.bucket == b.bucket_b) & (a.id_a < b.id_b)
    )
    sim = cosine(F.col("vec_a"), F.col("vec_b"))
    return pairs.select(
        "id_a", "id_b", F.round(sim, 6).alias("sim")
    ).filter(F.col("sim") >= threshold)
