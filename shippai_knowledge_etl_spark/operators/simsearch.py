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
    so results are reproducible at any parallelism. NB: ``aggregate``/
    ``zip_with`` lambdas are CodegenFallback (interpreted); on hot paths
    with a KNOWN dim prefer :func:`dot_fixed`."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Unrolled left-to-right sum of ``element_at`` products for a
    KNOWN embedding dim — no lambda HOFs. Summation order is identical
    to the fold's, so values match bit for bit and the same DuckDB
    oracle verifies both forms.

    MEASURED SLOWER than the fold at real widths (sf0.1, 2k×64 corpus:
    fold 0.35 s, this 1.42 s, chunked-projection variant 1.72 s): a
    cosine needs 3 dots = 192 element_at nodes, and the expression-tree
    optimization/codegen cost plus JIT-hostile generated method size
    swamp the interpreter overhead it removes. Kept as the documented
    negative result + for small dims (≤ ~8, e.g. geo/time features)
    where the unrolled tree is tiny and codegen wins. The actual scale
    path for wide embeddings is ``topk_cosine_blas``."""
    terms = [
        F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        for i in range(1, dim + 1)
    ]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    return dot_fixed(a, b, dim) / (
        F.sqrt(dot_fixed(a, a, dim)) * F.sqrt(dot_fixed(b, b, dim))
    )


def topk_cosine(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Brute-force top-k: broadcast the query row(s), score every
    corpus vector, TakeOrderedAndProject. Tie-break on id.

    Pass ``dim`` when the embedding width is known (it always is in a
    real corpus): scoring then uses the unrolled codegen'd dot product
    instead of the interpreted HOF fold — same values, ~an order of
    magnitude less scoring CPU, and the scan stays inside one
    WholeStageCodegen span."""
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    if dim is not None:
        sim = cosine_fixed(F.col(vec_col), F.col("query_vec"), dim)
    else:
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


def topk_cosine_blas(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100 TB form of ``topk_cosine``: per-Arrow-batch matrix·vector
    scoring in numpy (BLAS dgemv) via ``mapInPandas``, then the same
    TakeOrderedAndProject top-k. One Python worker call scores a whole
    batch (~10k vectors) — versus one fold per row — so the Python
    boundary amortizes to noise while the heavy math runs vectorized.

    Same ids as the HOF version; similarity values can differ in the
    last ulp (pairwise vs sequential summation), which is why this
    registers as a rows-only check with a pytest id-set cross-check."""
    import numpy as np
    import pandas as pd

    q_rows = query.select(id_col, vec_col).collect()  # 1-row query side
    q_id = q_rows[0][id_col]
    q_vec = np.asarray(q_rows[0][vec_col], dtype=np.float64)
    q_unit = q_vec / np.linalg.norm(q_vec)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ q_unit) / np.where(norms == 0, 1.0, norms)
            out = pd.DataFrame(
                {
                    "query_id": q_id,
                    id_col: pdf[id_col].to_numpy(),
                    "sim": np.round(sims, 6),
                }
            )
            yield out[out[id_col] != q_id]

    schema = f"query_id long, {id_col} long, sim double"
    return (
        corpus.select(id_col, vec_col)
        .mapInPandas(score, schema)
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table
    against every vector, argmin via min_by with a deterministic
    cluster-id tie-break. One narrow pass over the corpus — the corpus
    itself never shuffles."""
    scored = corpus.crossJoin(F.broadcast(centroids))
    d = _sq_dist(F.col(vec_col), F.col("centroid"))
    return (
        scored.select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cluster"),
            F.round(d, 9).alias("dist"),
        )
        .groupBy(id_col)
        .agg(
            F.min_by(
                F.struct(F.col("cluster"), F.col(vec_col).alias("vec")),
                F.struct("dist", "cluster"),
            ).alias("_m"),
            F.min("dist").alias("dist"),
        )
        .select(
            id_col,
            F.col("_m.cluster").alias("cluster"),
            F.col("_m.vec").alias(vec_col),
            "dist",
        )
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's iterations for IVF coarse quantization —
    the real version of the ``label``-as-bucket stand-in.

    Per round: assignment is a broadcast-join argmin (narrow over the
    corpus); the centroid update explodes (cluster, dim, value) and
    averages per (cluster, dim) — a shuffle of corpus×dims scalar rows
    with map-side combine, the standard MapReduce k-means shape. The
    centroid table (k×dims) is localCheckpoint'ed each round so lineage
    stays O(1); at cluster scale swap in reliable checkpoint(). Returns
    (assignments, centroids).

    Deterministic: seeds are the k lowest-id vectors, ties in argmin
    break on cluster id, and per-dim means use exact double sums over a
    fixed grouping — same result at any parallelism up to FP summation
    order in avg() (bounded by shuffle determinism of groupBy keys)."""
    from pyspark.sql import Window

    seeds = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cluster"),
            F.col(vec_col).alias("centroid"),
        )
    )
    centroids = seeds.localCheckpoint(eager=True)
    for _ in range(n_iter):
        assigned = assign_clusters(corpus, centroids, id_col, vec_col)
        centroids = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("x"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "x"))),
                    lambda s: s.getField("x"),
                ).alias("centroid")
            )
            .localCheckpoint(eager=True)
        )
    # final assignment runs against the RETURNED centroids — otherwise a
    # caller routing query vectors by centroid searches buckets the
    # corpus was never assigned to (and n_iter=0 stays well-defined)
    assigned = assign_clusters(corpus, centroids, id_col, vec_col)
    return assigned.select(id_col, "cluster", "dist"), centroids


N_PLANES = 8
_PLANE_SEED = 42


def _planes(dims: int = 64, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded, rounded to 6dp so the
    identical constants can be stated in a DuckDB oracle)."""
    import numpy as np

    rng = np.random.default_rng(_PLANE_SEED)
    return [
        [round(float(x), 6) for x in rng.uniform(-1.0, 1.0, dims)]
        for _ in range(n_planes)
    ]


def sign_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SimHash-for-cosine) bucket id: bit p is the
    sign of vec·plane_p, packed into an int. Pure expressions — the
    bucket computes in the scan stage; cosine-similar vectors agree on
    most signs, so near-dups collide while the corpus spreads over
    2^n_planes buckets."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(w) for w in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Embedding near-dup at scale: bucket by hyperplane signs, exact
    cosine verify only within buckets. Unlike ``near_dup_pairs`` (which
    needs a caller-supplied blocking column), the blocking key here is
    LEARNED from geometry — candidate count is driven by collision
    probability (1 - θ/π per plane), not by any label."""
    dims = len(corpus.select(vec_col).first()[0])
    planes = _planes(dims, n_planes)
    with_bucket = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        sign_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    return near_dup_pairs(
        with_bucket, threshold, bucket_col="bucket", id_col=id_col, vec_col=vec_col
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
