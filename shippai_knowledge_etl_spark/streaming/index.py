"""[EXT] Streaming incremental index maintenance: the at-rest postings
index of ``operators/retrieval.build_postings`` kept up to date by a
document stream, so lexical retrieval never rescans the corpus.

Per micro-batch, ``foreachBatch``:
  1. builds the batch's postings (term-bucketed, exactly the batch-mode
     layout) and writes them under ``batch=<id>/term_bucket=<b>/`` with
     per-batch OVERWRITE — a replayed batch rewrites its own directory
     with identical content instead of appending duplicates, so the
     merge is idempotent without any read-modify-write;
  2. rolls the corpus stats (n_docs, sum_dl) forward into a versioned
     state file, reading the highest version STRICTLY BELOW the
     current batch id (the ``streaming/sketches.py`` replay-safe
     discipline — after a crash the newest file may be the replayed
     batch's own partial output).

Query time (:func:`bm25_from_index`): score BM25 straight off the
stored postings + 1-row stats — document frequencies come from a
term-filtered index read (at rest: |query| pruned directories), the
corpus is never touched. The streaming test pins index-answered
scores EQUAL to the batch ``bm25_topk`` over the same corpus.

Scale notes: batch directories keep writes append-only and replays
idempotent; directory count grows with batches — :func:`compact_index`
rewrites old generations into one consolidated ``batch=-1`` generation
(same layout, so readers never change); answers before/after
compaction are pytest-pinned equal.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    build_postings,
)

_STATE_PREFIX = "stats_v"


def _version_of(name: str) -> int:
    return int(name[len(_STATE_PREFIX):].split(".")[0])


def _newest_state_below(state_dir: str, before_batch: int) -> dict | None:
    """Highest committed state version with batch id < ``before_batch``
    (None if there is none)."""
    if not os.path.isdir(state_dir):
        return None
    versions = [
        v
        for v in os.listdir(state_dir)
        if v.startswith(_STATE_PREFIX) and _version_of(v) < before_batch
    ]
    if not versions:
        return None
    with open(os.path.join(state_dir, max(versions, key=_version_of))) as f:
        return json.load(f)


def _prior_stats(state_dir: str, before_batch: int) -> tuple[int, int]:
    """(n_docs, sum_dl) from the highest state version < before_batch."""
    st = _newest_state_below(state_dir, before_batch)
    return (0, 0) if st is None else (st["n_docs"], st["sum_dl"])


def _latest_state(state_dir: str) -> dict:
    """Full latest state dict; raises a clear error when no committed
    state exists (empty stream, or a mistyped state_dir) instead of
    letting 0/0 surface as ZeroDivisionError downstream."""
    st = _newest_state_below(state_dir, 1 << 62)
    if st is None:
        raise FileNotFoundError(
            f"no committed index state under {state_dir}; "
            "run the stream (or its first micro-batch) before querying"
        )
    return st


def make_index_merger(index_dir: str, state_dir: str, n_buckets: int = 16):
    """foreachBatch callback maintaining the postings index + stats."""
    os.makedirs(state_dir, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        postings = build_postings(batch_df, "doc_id", "text", n_buckets)
        (
            postings.write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(os.path.join(index_dir, f"batch={batch_id}"))
        )
        from shippai_knowledge_etl_spark.operators.textops import tokenize

        row = (
            batch_df.select(F.size(tokenize(F.col("text"))).alias("dl"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
            .collect()[0]
        )
        n0, s0 = _prior_stats(state_dir, batch_id)
        out = {
            "batch_id": batch_id,
            "n_docs": n0 + row["n"],
            "sum_dl": s0 + (row["s"] or 0),
            # recorded so query time routes terms with the SAME
            # bucketing the index was written with
            "n_buckets": n_buckets,
        }
        tmp = os.path.join(state_dir, f".tmp_{batch_id}")
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, os.path.join(state_dir, f"{_STATE_PREFIX}{batch_id}.json"))

    return merge


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """All batch generations as one postings table (batch + term_bucket
    are partition columns → probes prune on term_bucket across every
    generation)."""
    return spark.read.option("basePath", index_dir).parquet(
        os.path.join(index_dir, "batch=*")
    )


def bm25_from_index(
    spark: SparkSession,
    index_dir: str,
    state_dir: str,
    query_terms: tuple[str, ...],
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k answered from the maintained index alone. Mirrors
    ``operators/retrieval.bm25_scores`` (same ``bm25_weight`` source
    of truth, same pivot determinism) with df/tf from the index read
    and (n_docs, sum_dl, n_buckets) from the stats state. Query terms
    route to their term buckets with the recorded bucketing, so the
    probe prunes to |query| directories per generation at PLAN time
    (PartitionFilters — pytest-pinned) instead of scanning every
    bucket."""
    from shippai_knowledge_etl_spark.operators.retrieval import bm25_weight

    st = _latest_state(state_dir)
    n_docs, sum_dl = st["n_docs"], st["sum_dl"]
    if n_docs == 0:
        raise ValueError("index state holds zero documents")
    n_buckets = st.get("n_buckets", 16)
    buckets = sorted(
        {
            r["b"]
            for r in spark.createDataFrame(
                [(t,) for t in query_terms], "term string"
            )
            .select(
                F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b")
            )
            .collect()
        }
    )
    postings = read_index(spark, index_dir).filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(*query_terms)
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = sum_dl / n_docs
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .withColumn(
            "w",
            bm25_weight(
                F.col("tf"),
                F.col("df"),
                F.col("dl"),
                F.lit(n_docs),
                F.lit(avgdl),
                k1,
                b,
            ),
        )
    )
    from shippai_knowledge_etl_spark.operators.retrieval import pivot_score

    return (
        pivot_score(scored, "doc_id", query_terms)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def compact_index(
    spark: SparkSession, index_dir: str, compacted_batch: int = -1
) -> int:
    """Offline compaction: rewrite every existing batch generation into
    ONE consolidated generation (``batch=<compacted_batch>``, default
    -1 so it sorts below every live batch id), then remove the source
    generations. Readers never change — the layout stays
    (batch, term_bucket)-partitioned — and postings rows are immutable
    so concatenation IS the merge (no counts to combine: a doc's
    postings live wholly inside the batch that ingested it).

    Order of operations is crash-safe for READERS and ROLL-FORWARD
    recoverable for CRASHES: the consolidated generation is fully
    written under a dot-prefixed tmp name (invisible — ``read_index``
    globs ``batch=*``) before anything visible moves, then the swap is
    two atomic renames (previous ``batch=<compacted_batch>`` → dot
    ``.old``, tmp → final), then sources are removed. At every crash
    point a COMPLETE copy of the compacted data exists on disk under a
    deterministic name, and :func:`_recover_compaction` (run first on
    every subsequent call) finishes the interrupted step:

      * crash mid-tmp-write → tmp partial but final untouched: tmp is
        discarded;
      * crash between the two renames → final momentarily absent, but
        tmp AND ``.old`` are both complete: tmp is promoted to final;
      * crash mid-source-removal → final carries a ``_MERGED_SOURCES``
        manifest (underscore-prefixed, Spark-ignored, renamed
        atomically WITH the generation) naming exactly the generations
        it already absorbed: the leftovers are deleted before anything
        is read, so their rows are never double-counted.

    Concurrent readers during a healthy run see either the old
    generations or old + new (double rows only between the publish and
    the removes — run compaction in the stream's maintenance window,
    the same discipline as parquet compaction jobs everywhere).
    Returns the number of source generations removed.

    Re-compaction safety: ``live`` is ALL generations including any
    existing ``batch=<compacted_batch>`` from a prior compaction — its
    rows must be carried into the rewrite, or every previously
    compacted posting is destroyed while the stats state still counts
    the vanished docs (inflated n_docs/sum_dl over a truncated index).
    The tmp write is a full action that reads the old files before any
    directory moves, so including the old compacted generation keeps
    the crash-safety ordering intact; pytest pins compact → ingest →
    compact-again answers unchanged, plus both simulated-crash states
    recovering to the no-crash answers."""
    import shutil

    compacted_name = f"batch={compacted_batch}"
    final = os.path.join(index_dir, compacted_name)
    tmp = os.path.join(index_dir, f".compact_{compacted_batch}")
    old = os.path.join(index_dir, f".compact_{compacted_batch}.old")
    _recover_compaction(index_dir, final, tmp, old)
    gens = [d for d in os.listdir(index_dir) if d.startswith("batch=")]
    source_gens = [d for d in gens if d != compacted_name]
    if not source_gens:
        return 0
    live = read_index(spark, index_dir)
    (
        live.drop("batch")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(tmp)
    )
    # Manifest travels INSIDE tmp so the atomic publish rename carries
    # it: after publish, final itself names the sources it absorbed.
    with open(os.path.join(tmp, _MERGED_MARKER), "w") as f:
        f.write("\n".join(source_gens))
    if os.path.isdir(final):
        os.replace(final, old)
    os.replace(tmp, final)
    shutil.rmtree(old, ignore_errors=True)
    for d in source_gens:
        shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
    # Marker removed LAST: until every absorbed source is gone, the
    # manifest must survive so recovery can finish the removals.
    os.remove(os.path.join(final, _MERGED_MARKER))
    return len(source_gens)


_MERGED_MARKER = "_MERGED_SOURCES"


def _recover_compaction(
    index_dir: str, final: str, tmp: str, old: str
) -> None:
    """Roll an interrupted :func:`compact_index` forward (see its
    docstring for the crash-point inventory). Idempotent; no-op after
    a clean run."""
    import shutil

    if os.path.isdir(old):
        if not os.path.isdir(final):
            # Crash between the two swap renames: tmp (the newer
            # consolidated copy) is complete — promote it; fall back
            # to restoring .old if tmp somehow vanished too.
            os.replace(tmp if os.path.isdir(tmp) else old, final)
        if os.path.isdir(old):
            shutil.rmtree(old)
    # Any surviving tmp is either a partial write or already
    # superseded by the promotion above — never the only copy.
    shutil.rmtree(tmp, ignore_errors=True)
    marker = os.path.join(final, _MERGED_MARKER)
    if os.path.isfile(marker):
        with open(marker) as f:
            absorbed = f.read().split()
        for name in absorbed:
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
        os.remove(marker)


# ---------------------------------------------------------------------------
# Vector-side analog: streaming sign-signature store
# ---------------------------------------------------------------------------


def make_sig_merger(sig_dir: str, vec_col: str = "embedding"):
    """foreachBatch callback maintaining the packed-signature store —
    the vector-side analog of :func:`make_index_merger`. Each batch
    writes (vec_id, lo, hi) — 16 bytes/vector, a 16x reduction of
    float32[64] — under its own ``batch=<id>`` generation (same
    replay-idempotence argument). Queries then never touch the
    embedding corpus at all."""
    from shippai_knowledge_etl_spark.operators.retrieval import sign_pack64

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        lo, hi = sign_pack64(F.col(vec_col))
        (
            batch_df.select(
                F.col("vec_id"), lo.alias("lo"), hi.alias("hi")
            )
            .write.mode("overwrite")
            .parquet(os.path.join(sig_dir, f"batch={batch_id}"))
        )

    return merge


def hamming_from_sig_store(
    spark: SparkSession, sig_dir: str, query_id: int, k: int
) -> DataFrame:
    """Hamming top-k answered from the signature store alone — must
    equal ``operators/retrieval.hamming_topk`` over the ingested
    corpus (pytest-pinned). The scan reads 16 bytes/vector; the query
    signature is a 1-row broadcast."""
    from shippai_knowledge_etl_spark.operators.retrieval import hamming_dist

    sigs = spark.read.option("basePath", sig_dir).parquet(
        os.path.join(sig_dir, "batch=*")
    )
    q = sigs.filter(F.col("vec_id") == query_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    return (
        sigs.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            hamming_dist(
                F.col("lo"), F.col("hi"), F.col("qlo"), F.col("qhi")
            ).alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Incremental near-dup: streaming LSH band-bucket store
# ---------------------------------------------------------------------------


def make_near_dup_merger(band_dir: str, pairs_dir: str):
    """foreachBatch callback for incremental near-duplicate detection:
    each batch (1) probes its docs against the band rows of every
    EARLIER generation, (2) self-probes its OWN band rows so two
    near-duplicates arriving inside the same micro-batch are caught
    (no later batch ever compares one generation against itself, so
    without the self-probe intra-batch pairs would be permanently
    missed), writing the union as candidate (new_id, old_id) pairs
    under its own ``batch=<id>`` pairs generation, then (3) writes its
    band rows as a new generation of the store. Intra-batch pairs are
    oriented new_id > old_id so each unordered pair appears once.
    Probing strictly earlier generations + per-batch overwrite makes
    replays emit identical pairs (the replayed batch's own
    half-written generation is never its probe target, and the
    self-probe is a pure function of the batch's content)."""
    from shippai_knowledge_etl_spark.operators.dedup import lsh_band_rows

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = lsh_band_rows(batch_df, "doc_id", "text")
        probe = bands.select(
            F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
        )
        # intra-batch: band collisions within this micro-batch, one
        # orientation per unordered pair
        pairs = (
            probe.join(
                bands.select(
                    F.col("doc_id").alias("old_id"), "band_idx", "band_hash"
                ),
                ["band_idx", "band_hash"],
            )
            .filter(F.col("new_id") > F.col("old_id"))
            .select("new_id", "old_id")
        )
        gens = (
            [
                d
                for d in os.listdir(band_dir)
                if d.startswith("batch=") and int(d.split("=")[1]) < batch_id
            ]
            if os.path.isdir(band_dir)
            else []
        )
        if gens:
            index = spark.read.option("basePath", band_dir).parquet(
                *[os.path.join(band_dir, d) for d in gens]
            ).drop("batch")
            cross = (
                probe.join(
                    index.withColumnRenamed("doc_id", "old_id"),
                    ["band_idx", "band_hash"],
                )
                .filter(F.col("new_id") != F.col("old_id"))
                .select("new_id", "old_id")
            )
            pairs = pairs.unionByName(cross)
        pairs.distinct().write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}")
        )
        bands.write.mode("overwrite").parquet(
            os.path.join(band_dir, f"batch={batch_id}")
        )

    return merge
