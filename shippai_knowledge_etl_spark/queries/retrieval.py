"""Lexical / hybrid retrieval query surface (SURVEY.md §2.11 [EXT]).

BM25 inverted-index top-k, RAG chunking with overlap, Hamming-distance
sign-signature search, and two-stage hybrid (BM25 candidates → cosine
re-rank). All oracle-checked: BM25/cosine doubles follow the repo's
round(6)-on-both-sides discipline; Hamming is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.operators import retrieval
from shippai_knowledge_etl_spark.operators.textops import tokenize
from shippai_knowledge_etl_spark.tables import load, scale_out

# DuckDB-side mirror of textops.tokenize (RE2 shares Java's \p classes).
_TOKS = (
    "list_filter(str_split(trim(regexp_replace(lower(text), "
    "'[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> '')"
)

QUERY_TERMS = ("spark", "join", "window")
CHUNK_W, CHUNK_S = 32, 24

# Shared BM25 CTE chain (Okapi, k1=1.2 b=0.75) — expression order
# mirrors operators/retrieval.bm25_scores token for token so doubles
# agree pre-round; round(6) absorbs the last-ulp ln() divergence.
_BM25_CTES = f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    docs AS (SELECT doc_id, len(t) AS dl, t FROM toks),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM docs),
    postings AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(t) AS term FROM docs)
      WHERE term IN ('spark', 'join', 'window')
      GROUP BY doc_id, dl, term),
    dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
    weights AS (
      SELECT p.doc_id, p.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * 2.2)
               / (p.tf + 1.2 * (0.25
                  + 0.75 * p.dl / (s.sum_dl / s.n_docs))) AS w
      FROM postings p JOIN dfreq d USING (term) CROSS JOIN stats s),
    bm25 AS (
      SELECT doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w END), 0),
                 6) AS bm25
      FROM weights GROUP BY doc_id)
"""


@register(
    "ext_bm25_topk",
    survey_ref="[EXT] BM25 inverted-index top-k retrieval (SURVEY §2.11); "
    "postings filtered to the query vocabulary pre-aggregation = the "
    "relational form of probing a term-bucketed index",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT doc_id, bm25 FROM bm25
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
)
def ext_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed query, dense single-scan form:
    per-term tf as codegen'd columns, one 1-row stats broadcast, zero
    wide shuffles (vs 3 corpus scans for the naive postings plan).
    Per-doc score is a fixed-order sum of per-term weights — no
    double-summation nondeterminism, so the exact hash gate holds at
    any parallelism. The general inverted-index form is
    ``operators.retrieval.bm25_scores`` (bit-identical, pytest
    cross-checked in test_retrieval.py)."""
    d = load(spark, sf_dir, "documents")
    return retrieval.bm25_topk(d, "doc_id", "text", QUERY_TERMS, 10)


@register(
    "ext_chunk_overlap",
    survey_ref="[EXT] RAG chunking: overlapping token windows "
    f"(width {CHUNK_W}, stride {CHUNK_S}) via sequence+posexplode+slice — "
    "narrow per-row expansion, zero shuffle",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 25 = 0),
    nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    bounded AS (
      SELECT doc_id, t,
             CASE WHEN n > {CHUNK_W}
                  THEN ((n - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S})
                       * {CHUNK_S}
                  ELSE 0 END AS last_start
      FROM nz),
    starts AS (
      SELECT doc_id, t,
             unnest(range(0, last_start + 1, {CHUNK_S})) AS start
      FROM bounded)
    SELECT doc_id,
           CAST(start // {CHUNK_S} AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(t, start + 1, start + {CHUNK_W})) AS BIGINT)
             AS chunk_tokens,
           array_to_string(list_slice(t, start + 1, start + {CHUNK_W}), ' ')
             AS chunk_text
    FROM starts
    """,
)
def ext_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunks over every 25th doc (gate-sized output);
    the last chunk of a doc may be short — standard RAG contract."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return retrieval.chunk_tokens(d, "doc_id", "text", CHUNK_W, CHUNK_S)


@register(
    "simsearch_hamming_topk",
    survey_ref="[EXT] sign-quantized Hamming top-k: 64-dim float32 → two "
    "32-bit words (64x compression), distance = bit_count(xor) — the "
    "integer-exact ANN probe; unlike cosine it needs NO float tolerance",
    oracle="""
    WITH idx AS (SELECT unnest(range(0, 32)) AS i),
    sig AS (
      SELECT e.vec_id,
             CAST(sum(CASE WHEN e.embedding[i.i + 1] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN e.embedding[i.i + 33] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS hi
      FROM embeddings e CROSS JOIN idx i
      GROUP BY e.vec_id),
    q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi
          FROM sig WHERE vec_id = 0)
    SELECT q.query_id, s.vec_id,
           CAST(bit_count(xor(s.lo, q.qlo))
              + bit_count(xor(s.hi, q.qhi)) AS BIGINT) AS hamming
    FROM sig s, q WHERE s.vec_id <> 0
    ORDER BY hamming ASC, s.vec_id ASC LIMIT 10
    """,
)
def simsearch_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming top-10 from vec_id 0 over packed sign signatures. The
    corpus shrinks to (id, 2 longs) before any join/sort — at 100 TB
    the signature projection is what the scan reads."""
    e = load(spark, sf_dir, "embeddings")
    return retrieval.hamming_topk(e, "vec_id", "embedding", 0, 10)


@register(
    "retrieval_hybrid",
    survey_ref="[EXT] two-stage hybrid retrieval flagship: BM25 candidate "
    "generation (50 lexical candidates, index-prunable) → exact cosine "
    "re-rank of the broadcast-bounded candidate set — the standard "
    "RAG retrieval composition",
    oracle=f"""
    WITH {_BM25_CTES},
    cand AS (
      SELECT doc_id, bm25 FROM bm25 WHERE doc_id <> 0
      ORDER BY bm25 DESC, doc_id ASC LIMIT 50),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb_d FROM embeddings),
    q AS (SELECT emb_d AS qv FROM e WHERE vec_id = 0)
    SELECT c.doc_id, c.bm25,
           round(list_inner_product(a.emb_d, q.qv)
                 / (sqrt(list_inner_product(a.emb_d, a.emb_d))
                    * sqrt(list_inner_product(q.qv, q.qv))), 6) AS sim
    FROM cand c JOIN e a ON a.vec_id = c.doc_id CROSS JOIN q
    WHERE a.vec_id <> 0
    ORDER BY sim DESC, c.doc_id ASC LIMIT 10
    """,
)
def retrieval_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-50 candidates re-ranked by exact cosine to the query
    vector (vec_id 0; doc_id ↔ vec_id aligned in the corpus)."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return retrieval.hybrid_candidates(
        d, e, "doc_id", "vec_id", "embedding", QUERY_TERMS, 0, 50, 10
    )


@register(
    "retrieval_mmr",
    survey_ref="[EXT] MMR diversified re-ranking (Carbonell & Goldstein "
    "1998): greedy lam*rel - (1-lam)*max-sim-to-selected over an "
    "in-engine-scored, candidate-bounded set — iterative greedy, not "
    "SQL-expressible → rows-only; diversity/reduction invariants "
    "pytest-pinned in tests/test_retrieval.py",
)
def retrieval_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 MMR selection (lam=0.7) from 50 cosine candidates of
    vec_id 0. Deterministic: rounded sims + id tie-breaks make the
    selection a pure function of the corpus."""
    e = load(spark, sf_dir, "embeddings")
    picked = retrieval.mmr_rerank(e, "vec_id", "embedding", 0, 50, 10)
    return spark.createDataFrame(
        [(i, d, s) for i, (d, s) in enumerate(picked)],
        "rank int, vec_id long, mmr_score double",
    )


_BATCH_QUERIES = [
    (0, "spark"), (0, "join"),
    (1, "window"), (1, "table"),
    (2, "hash"), (2, "value"),
]


@register(
    "ext_bm25_batch",
    survey_ref="[EXT] batch multi-query BM25: one plan scores a whole "
    "query batch — broadcast (query_id, term) table prunes the postings "
    "and fans each one out to its queries; per-term weights round to 6 dp "
    "and sum as DECIMAL (exact, order-independent — the "
    "curation_lm_quality pattern); per-query top-k window partitions by "
    "query_id, never global",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    docs AS (SELECT doc_id, len(t) AS dl, t FROM toks),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM docs),
    q(query_id, term) AS (
      VALUES (0, 'spark'), (0, 'join'), (1, 'window'), (1, 'table'),
             (2, 'hash'), (2, 'value')),
    postings AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(t) AS term FROM docs)
      WHERE term IN (SELECT DISTINCT term FROM q)
      GROUP BY doc_id, dl, term),
    dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
    w AS (
      SELECT q.query_id, p.doc_id,
             CAST(round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * 2.2)
               / (p.tf + 1.2 * (0.25
                  + 0.75 * p.dl / (s.sum_dl / s.n_docs))), 6)
               AS DECIMAL(18,6)) AS w6
      FROM postings p JOIN dfreq d USING (term) CROSS JOIN stats s
      JOIN q ON q.term = p.term),
    sc AS (SELECT query_id, doc_id, sum(w6) AS sd FROM w GROUP BY 1, 2),
    rk AS (SELECT query_id, doc_id, sd,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY sd DESC, doc_id) AS rnk
           FROM sc)
    SELECT query_id, doc_id, rnk, CAST(sd AS DOUBLE) AS bm25
    FROM rk WHERE rnk <= 10
    """,
)
def ext_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query for a 3-query batch in a single plan."""
    d = load(spark, sf_dir, "documents")
    q = spark.createDataFrame(_BATCH_QUERIES, "query_id int, term string")
    return retrieval.bm25_topk_batch(d, "doc_id", "text", q, 10)


@register(
    "retrieval_rrf_fusion",
    survey_ref="[EXT] Reciprocal Rank Fusion (Cormack et al. 2009): the "
    "training-free hybrid combiner — fuse BM25 and cosine rankings by "
    "sum(1/(60+rank)); rank-based so incomparable score scales never "
    "matter, the standard alternative to the rerank cascade",
    oracle=f"""
    WITH {_BM25_CTES},
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb_d FROM embeddings),
    q AS (SELECT emb_d AS qv FROM e WHERE vec_id = 0),
    cosd AS (
      SELECT a.vec_id AS doc_id,
             round(list_inner_product(a.emb_d, q.qv)
                   / (sqrt(list_inner_product(a.emb_d, a.emb_d))
                      * sqrt(list_inner_product(q.qv, q.qv))), 6) AS sim
      FROM e a CROSS JOIN q WHERE a.vec_id <> 0),
    rl AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
             AS rank_lex
           FROM (SELECT doc_id, bm25 FROM bm25 WHERE doc_id <> 0
                 ORDER BY bm25 DESC, doc_id LIMIT 100)),
    rs AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id)
             AS rank_sem
           FROM (SELECT doc_id, sim FROM cosd
                 ORDER BY sim DESC, doc_id LIMIT 100)),
    fused AS (
      SELECT coalesce(rl.doc_id, rs.doc_id) AS doc_id,
             rl.rank_lex, rs.rank_sem,
             round(coalesce(1.0 / (60 + rl.rank_lex), 0.0)
                 + coalesce(1.0 / (60 + rs.rank_sem), 0.0), 9) AS rrf
      FROM rl FULL JOIN rs ON rl.doc_id = rs.doc_id)
    SELECT doc_id, rank_lex, rank_sem, rrf FROM fused
    ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse the BM25 top-100 and cosine top-100 for the fixed query
    (terms + vec_id 0, query doc excluded from both lists). Each list
    cuts to depth 100 via TakeOrderedAndProject before the bounded
    rank window; the fusion sum is two fixed-order reciprocal terms —
    no float-summation hazard, exact at the 9-dp gate."""
    from shippai_knowledge_etl_spark.operators.simsearch import cosine

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    lex = retrieval.bm25_scores_dense(d, "doc_id", "text", QUERY_TERMS).filter(
        F.col("doc_id") != 0
    )
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    sem = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("sim"),
        )
    )
    return retrieval.rrf_fuse(lex, sem, "doc_id", "bm25", "sim")


@register(
    "retrieval_bm25_from_index",
    survey_ref="[EXT] index-at-rest retrieval flagship (streaming/index.py): "
    "ingest the corpus as three micro-batch generations of the "
    "term-bucketed postings index, compact them into one generation, "
    "then answer BM25 from the stored postings + 1-row stats alone — "
    "the corpus is never rescanned at query time; the oracle is the "
    "full-corpus BM25 (ext_bm25_topk's), so the gate proves "
    "merge → compact → index-answered scoring loses nothing",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT doc_id, bm25 FROM bm25
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
)
def retrieval_bm25_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the postings index under a throwaway dir from three
    doc_id%3 micro-batches (``make_index_merger``), compact the
    generations (``compact_index``), and score the fixed query from
    the index alone (``bm25_from_index``). The 10-row answer is
    collected before the dir is removed (bounded by k — the
    retrieval_mmr posture), so the returned frame has no dangling
    file dependency. At 100 TB this is the architecture that makes
    retrieval O(|query| pruned buckets) instead of O(corpus):
    partition pruning on term_bucket is plan-pinned in
    tests/test_retrieval_index.py."""
    import shutil
    import tempfile

    from shippai_knowledge_etl_spark.streaming import index as SI

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="bm25_index_")
    try:
        index_dir, state_dir = f"{root}/index", f"{root}/state"
        merge = SI.make_index_merger(index_dir, state_dir)
        for i in range(3):
            merge(d.filter(F.col("doc_id") % 3 == i), i)
        SI.compact_index(spark, index_dir)
        rows = SI.bm25_from_index(
            spark, index_dir, state_dir, QUERY_TERMS, 10
        ).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_id bigint, bm25 double")


@register(
    "retrieval_eval_recall",
    survey_ref="[EXT] ANN evaluation harness: recall@10 of the Hamming "
    "sign probe vs exact-cosine ground truth over a 10-query batch — "
    "the evaluation itself is deterministic (rounded cosine + integer "
    "Hamming + id tie-breaks) and oracle-checked end to end",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb_d FROM embeddings),
    qs AS (SELECT vec_id AS query_id, emb_d AS qv FROM e
           WHERE vec_id % 50 = 0),
    ex AS (
      SELECT q.query_id, a.vec_id,
             round(list_inner_product(a.emb_d, q.qv)
                   / (sqrt(list_inner_product(a.emb_d, a.emb_d))
                      * sqrt(list_inner_product(q.qv, q.qv))), 6) AS sim
      FROM e a CROSS JOIN qs q WHERE a.vec_id <> q.query_id),
    ex_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rn
        FROM ex) WHERE rn <= 10),
    idx AS (SELECT unnest(range(0, 32)) AS i),
    sig AS (
      SELECT e2.vec_id,
             CAST(sum(CASE WHEN e2.embedding[i.i + 1] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN e2.embedding[i.i + 33] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS hi
      FROM embeddings e2 CROSS JOIN idx i GROUP BY e2.vec_id),
    qsig AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM sig
             WHERE vec_id % 50 = 0),
    hm AS (
      SELECT q.query_id, s.vec_id,
             bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi))
               AS hamming
      FROM sig s CROSS JOIN qsig q WHERE s.vec_id <> q.query_id),
    hm_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY hamming ASC, vec_id) AS rn
        FROM hm) WHERE rn <= 10),
    hits AS (
      SELECT t.query_id, count(*) AS n_hits
      FROM ex_top t JOIN hm_top h USING (query_id, vec_id)
      GROUP BY t.query_id)
    SELECT q.query_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall_at_k
    FROM qs q LEFT JOIN hits h USING (query_id)
    """,
)
def retrieval_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 per query for the 10-query deterministic sample."""
    e = load(spark, sf_dir, "embeddings")
    return retrieval.ann_recall_eval(e, "vec_id", "embedding", 50, 10)


# nDCG discount literals shared by the Spark plan AND the oracle text,
# so neither engine's own log2 participates (see ndcg_discounts).
_NDCG_DISC, _NDCG_IDCG = retrieval.ndcg_discounts(10)
_NDCG_CASE = " ".join(
    f"WHEN {r} THEN {v:.6f}" for r, v in _NDCG_DISC.items()
)


@register(
    "retrieval_eval_ndcg",
    survey_ref="[EXT] ANN evaluation harness, rank-sensitive: nDCG@10 "
    "of the Hamming sign probe vs exact-cosine ground truth — binary "
    "relevance, shared literal discount table, DECIMAL(18,6) per-hit "
    "terms so the per-query DCG sum is exact at any partitioning",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb_d FROM embeddings),
    qs AS (SELECT vec_id AS query_id, emb_d AS qv FROM e
           WHERE vec_id % 50 = 0),
    ex AS (
      SELECT q.query_id, a.vec_id,
             round(list_inner_product(a.emb_d, q.qv)
                   / (sqrt(list_inner_product(a.emb_d, a.emb_d))
                      * sqrt(list_inner_product(q.qv, q.qv))), 6) AS sim
      FROM e a CROSS JOIN qs q WHERE a.vec_id <> q.query_id),
    ex_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rn
        FROM ex) WHERE rn <= 10),
    idx AS (SELECT unnest(range(0, 32)) AS i),
    sig AS (
      SELECT e2.vec_id,
             CAST(sum(CASE WHEN e2.embedding[i.i + 1] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN e2.embedding[i.i + 33] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS hi
      FROM embeddings e2 CROSS JOIN idx i GROUP BY e2.vec_id),
    qsig AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM sig
             WHERE vec_id % 50 = 0),
    hm AS (
      SELECT q.query_id, s.vec_id,
             bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi))
               AS hamming
      FROM sig s CROSS JOIN qsig q WHERE s.vec_id <> q.query_id),
    hm_top AS (
      SELECT query_id, vec_id, rn FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY hamming ASC, vec_id) AS rn
        FROM hm) WHERE rn <= 10),
    scored AS (
      SELECT h.query_id,
             count(*) FILTER (WHERE t.vec_id IS NOT NULL) AS n_hits,
             sum(CASE WHEN t.vec_id IS NOT NULL
                      THEN CAST(CASE h.rn {_NDCG_CASE} END
                                AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS dcg6
      FROM hm_top h LEFT JOIN ex_top t USING (query_id, vec_id)
      GROUP BY h.query_id)
    SELECT q.query_id,
           CAST(coalesce(s.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(coalesce(s.dcg6, 0) AS DOUBLE), 6) AS dcg,
           round(CAST(coalesce(s.dcg6, 0) AS DOUBLE) / {_NDCG_IDCG}, 6)
             AS ndcg
    FROM qs q LEFT JOIN scored s USING (query_id)
    """,
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per query for the deterministic 10-query sample — the
    rank-position-sensitive companion to retrieval_eval_recall (a
    probe that finds all k neighbors but ranks them inverted scores
    recall 1.0 yet ndcg < 1)."""
    e = load(spark, sf_dir, "embeddings")
    return retrieval.ann_ndcg_eval(e, "vec_id", "embedding", 50, 10)


@register(
    "retrieval_pipeline_e2e",
    survey_ref="[EXT] RAG pipeline flagship (composition): chunk (32/24 "
    "token windows) → feature-hash chunk embeddings (zero-training, "
    "integer-exact) → dense BM25 candidate generation over the CHUNK "
    "corpus → cosine re-rank against the hash-embedded query — every "
    "stage is the registered operator, composed in one plan; xxhash64 "
    "embeddings are engine-specific → rows-only, determinism and "
    "stage-consistency pytest-pinned in tests/test_retrieval.py",
)
def retrieval_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Answer one query end to end over chunk granularity: lexical
    candidates (cheap, index-prunable) re-ranked semantically. The
    chunk corpus never shuffles for scoring — BM25 is the single-scan
    dense plan and the re-rank joins a broadcast 50-row candidate set
    to a broadcast 1-row query embedding."""
    from shippai_knowledge_etl_spark.operators.simsearch import cosine

    d = load(spark, sf_dir, "documents")
    chunks = retrieval.chunk_tokens(d, "doc_id", "text", CHUNK_W, CHUNK_S)
    chunks = chunks.select(
        # 20-bit shift: collision-free for docs up to 2^20 chunks
        # (~25M tokens at stride 24) vs the reviewed *1000 packing,
        # which collided at 1000 chunks
        (F.shiftleft(F.col("doc_id"), 20) + F.col("chunk_idx")).alias(
            "chunk_id"
        ),
        "doc_id",
        "chunk_idx",
        F.col("chunk_text").alias("text"),
    )
    cand = retrieval.bm25_topk(chunks, "chunk_id", "text", QUERY_TERMS, 50)
    cand_rows = chunks.join(F.broadcast(cand), "chunk_id")
    cand_embs = retrieval.hash_embed(cand_rows, "chunk_id", "text")
    qdf = spark.createDataFrame(
        [(0, " ".join(QUERY_TERMS))], "qid int, text string"
    )
    qv = retrieval.hash_embed(qdf, "qid", "text").select(
        F.col("embedding").alias("qvec")
    )
    return (
        cand_embs.join(
            F.broadcast(cand_rows.select("chunk_id", "doc_id", "chunk_idx", "bm25")),
            "chunk_id",
        )
        .crossJoin(F.broadcast(qv))
        .select(
            "chunk_id",
            "doc_id",
            "chunk_idx",
            "bm25",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("chunk_id"))
        .limit(10)
    )


_MRR_CASE = " ".join(
    f"WHEN {r} THEN {v:.6f}"
    for r, v in retrieval.mrr_literals(10).items()
)


@register(
    "retrieval_eval_mrr",
    survey_ref="[EXT] ANN evaluation harness, first-hit-sensitive: "
    "MRR@10 of the Hamming sign probe vs exact-cosine ground truth — "
    "the navigational-query metric completing the recall/nDCG/MRR "
    "triple; shared reciprocal-rank literal table, integer ranks "
    "until the literal lookup (operators/retrieval.py:ann_mrr_eval)",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb_d FROM embeddings),
    qs AS (SELECT vec_id AS query_id, emb_d AS qv FROM e
           WHERE vec_id % 50 = 0),
    ex AS (
      SELECT q.query_id, a.vec_id,
             round(list_inner_product(a.emb_d, q.qv)
                   / (sqrt(list_inner_product(a.emb_d, a.emb_d))
                      * sqrt(list_inner_product(q.qv, q.qv))), 6) AS sim
      FROM e a CROSS JOIN qs q WHERE a.vec_id <> q.query_id),
    ex_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rn
        FROM ex) WHERE rn <= 10),
    idx AS (SELECT unnest(range(0, 32)) AS i),
    sig AS (
      SELECT e2.vec_id,
             CAST(sum(CASE WHEN e2.embedding[i.i + 1] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN e2.embedding[i.i + 33] > 0
                      THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS hi
      FROM embeddings e2 CROSS JOIN idx i GROUP BY e2.vec_id),
    qsig AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM sig
             WHERE vec_id % 50 = 0),
    hm AS (
      SELECT q.query_id, s.vec_id,
             bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi))
               AS hamming
      FROM sig s CROSS JOIN qsig q WHERE s.vec_id <> q.query_id),
    hm_top AS (
      SELECT query_id, vec_id, rn FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY hamming ASC, vec_id) AS rn
        FROM hm) WHERE rn <= 10),
    first_hit AS (
      SELECT h.query_id, min(h.rn) AS fr
      FROM hm_top h JOIN ex_top t USING (query_id, vec_id)
      GROUP BY h.query_id)
    SELECT q.query_id,
           CAST(coalesce(f.fr, 0) AS BIGINT) AS first_hit_rank,
           CAST(CASE CAST(coalesce(f.fr, 0) AS BIGINT) {_MRR_CASE}
                ELSE 0.0 END AS DOUBLE) AS rr
    FROM qs q LEFT JOIN first_hit f USING (query_id)
    """,
)
def retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 per query for the deterministic 10-query sample — how
    deep the first TRUE neighbor sits in the probe's list. Completes
    the eval triple: recall (set overlap), nDCG (whole-list order),
    MRR (first-hit depth)."""
    e = load(spark, sf_dir, "embeddings")
    return retrieval.ann_mrr_eval(e, "vec_id", "embedding", 50, 10)


@register(
    "retrieval_sentence_chunks",
    survey_ref="[EXT] sentence-aware RAG chunking: sentences never "
    "split mid-thought (the quality upgrade over fixed token windows "
    "— ext_chunk_overlap); chunk assignment is start-offset "
    "bucketing (floor(start_token/48)), window-expressible with NO "
    "greedy recurrence, overshoot bounded by one sentence",
    oracle="""
    WITH sents0 AS (
      SELECT doc_id, trim(s) AS sent,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY i) AS sidx
      FROM (
        SELECT doc_id, unnest(str_split_regex(text, '[.!?]+')) AS s,
               unnest(range(len(str_split_regex(text, '[.!?]+')))) AS i
        FROM documents)
      WHERE trim(s) <> ''),
    sents AS (
      SELECT doc_id, sidx, sent,
             len(list_filter(str_split(trim(regexp_replace(lower(sent),
               '[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> ''))
               AS n_toks
      FROM sents0),
    offs AS (
      SELECT doc_id, sidx, sent, n_toks,
             coalesce(sum(n_toks) OVER (PARTITION BY doc_id ORDER BY sidx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_off
      FROM sents)
    SELECT doc_id, CAST(start_off // 48 AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           string_agg(sent, ' ' ORDER BY sidx) AS chunk_text
    FROM offs GROUP BY doc_id, chunk_id
    """,
)
def retrieval_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunks that never cut a sentence: split on [.!?] runs,
    assign each sentence to chunk floor(start_token_offset / 48) —
    every sentence lands wholly in one chunk, chunks overshoot the
    48-token budget by at most one sentence, and the assignment is a
    plain cumsum window (a true greedy packer is a sequential
    recurrence; the start-offset rule keeps the 100 TB path
    window-only, the documented pack_sequences trade).

    Scale shape: one split/explode pass, doc-keyed windows for the
    sentence index and running offset, one (doc, chunk) rollup with
    the lambda-free sorted-struct text rebuild. Empty segments (the
    trailing split artifact, runs of punctuation) are filtered
    relationally on BOTH engines before indexing so sentence numbers
    can't diverge."""
    from pyspark.sql import Window

    from shippai_knowledge_etl_spark.operators.textops import tokenize

    d = load(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias("i", "s"),
    ).withColumn("sent", F.trim("s"))
    w = Window.partitionBy("doc_id").orderBy("i")
    sents = (
        raw.filter(F.col("sent") != "")
        .withColumn("sidx", F.row_number().over(w))
        .withColumn("n_toks", F.size(tokenize(F.col("sent"))))
    )
    woff = Window.partitionBy("doc_id").orderBy("sidx")
    offs = sents.withColumn(
        "start_off",
        F.coalesce(
            F.sum("n_toks").over(
                woff.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return (
        offs.groupBy(
            "doc_id",
            F.expr("start_off div 48").alias("chunk_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.sort_array(
                    F.collect_list(F.struct("sidx", "sent"))
                ).getField("sent"),
            ).alias("chunk_text"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "n_sentences",
            "n_tokens",
            "chunk_text",
        )
    )


# Misspelled query terms and their 1-char-delete keys, computed ONCE in
# Python and shipped to BOTH engines as literals (the shared-literal
# discipline: neither engine generates the query-side keys itself)
_SPELL_QUERIES = ("windw", "qury", "mergge")


def _delete_keys(term: str) -> list[str]:
    return [term] + [term[:i] + term[i + 1 :] for i in range(len(term))]


_SPELL_QROWS = ", ".join(
    f"('{q}', '{k}')" for q in _SPELL_QUERIES for k in _delete_keys(q)
)


@register(
    "retrieval_spell_correct",
    survey_ref="[EXT] did-you-mean spell correction via SymSpell "
    "delete-key indexing (Garbe): vocabulary terms index under their "
    "1-char-delete keys, query keys hash-join the index — candidates "
    "are bounded by key collisions (never levenshtein against the "
    "whole vocabulary), then exact edit-distance verify + "
    "(distance, -freq, term) ranking",
    oracle=f"""
    WITH vocab AS (
      SELECT term, count(*) AS freq FROM (
        SELECT unnest({{toks}}) AS term FROM documents)
      GROUP BY term),
    vkeys AS (
      SELECT term, freq, unnest(
        list_prepend(term, list_transform(range(1, len(term) + 1),
          i -> substring(term, 1, i - 1)
               || substring(term, i + 1, len(term) - i)))) AS k
      FROM vocab),
    qkeys AS (SELECT * FROM (VALUES {_SPELL_QROWS}) q(query_term, k)),
    cand AS (
      SELECT DISTINCT q.query_term, v.term, v.freq
      FROM qkeys q JOIN vkeys v USING (k)),
    verified AS (
      SELECT query_term, term AS suggestion, freq,
             levenshtein(query_term, term) AS dist
      FROM cand WHERE levenshtein(query_term, term) <= 1),
    ranked AS (
      SELECT query_term, suggestion, CAST(dist AS INT) AS dist,
             CAST(freq AS BIGINT) AS freq,
             row_number() OVER (PARTITION BY query_term
               ORDER BY dist ASC, freq DESC, suggestion ASC) AS rnk
      FROM verified)
    SELECT query_term, suggestion, dist, freq, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """.replace(
        "{toks}",
        "list_filter(str_split(trim(regexp_replace(lower(text), "
        "'[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> '')",
    ),
)
def retrieval_spell_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 corrections per misspelled query term from the corpus
    vocabulary, SymSpell style: every vocab term indexes under itself
    plus its 1-char deletions; the query side ships its own delete
    keys as SHARED LITERALS; a hash join on the key generates
    candidates and exact levenshtein <= 1 verifies. Frequency breaks
    ranking ties (the language-model prior), then the term itself.

    Scale shape: the delete index is vocabulary-sized x (len+1) keys
    — Heaps-bounded, built once and reusable at rest; the probe is a
    handful of literal keys hash-joined against it, so NO levenshtein
    ever runs against the full vocabulary (the all-pairs trap). The
    one lambda HOF runs over the VOCABULARY table, not the corpus
    (the BPE-train precedent for vocabulary-sized Python/HOF work)."""
    from shippai_knowledge_etl_spark.operators.textops import tokenize

    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tokenize(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ln = F.length("term")
    dels = F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: F.concat(
            F.substring("term", 1, i - 1),
            F.col("term").substr(i + 1, ln - i),
        ),
    )
    vkeys = vocab.select(
        "term",
        "freq",
        F.explode(F.concat(F.array(F.col("term")), dels)).alias("k"),
    )
    qrows = [
        (q, k) for q in _SPELL_QUERIES for k in _delete_keys(q)
    ]
    qkeys = spark.createDataFrame(qrows, ["query_term", "k"])
    cand = (
        vkeys.join(F.broadcast(qkeys), "k")
        .select("query_term", "term", "freq")
        .distinct()
    )
    dist = F.levenshtein("query_term", "term")
    verified = cand.withColumn("dist", dist).filter(F.col("dist") <= 1)
    from pyspark.sql import Window

    w = Window.partitionBy("query_term").orderBy(
        F.asc("dist"), F.desc("freq"), F.asc("term")
    )
    return (
        verified.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_term",
            F.col("term").alias("suggestion"),
            F.col("dist").cast("int").alias("dist"),
            F.col("freq").cast("long").alias("freq"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "retrieval_proximity_window",
    survey_ref=(
        "[EXT] positional-index proximity retrieval: conjunctive AND "
        "over the query vocabulary PLUS the minimal token window "
        "containing all terms per doc — the phrase/near-operator "
        "machinery BM25's bag-of-words scoring cannot express; "
        "positions resolved by ONE doc-keyed ordered sweep (O(sum tf) "
        "rows, no tf-product fan-out)"
    ),
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    hits AS (SELECT doc_id, tok, pos FROM ex
             WHERE tok IN ('spark', 'join', 'window')),
    spans AS (
      SELECT a.doc_id,
             min(greatest(a.pos, b.pos, c.pos)
                 - least(a.pos, b.pos, c.pos)) AS min_span
      FROM hits a
      JOIN hits b ON b.doc_id = a.doc_id AND b.tok = 'join'
      JOIN hits c ON c.doc_id = a.doc_id AND c.tok = 'window'
      WHERE a.tok = 'spark'
      GROUP BY a.doc_id),
    tf AS (
      SELECT doc_id,
             sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS n_spark,
             sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS n_join,
             sum(CASE WHEN tok = 'window' THEN 1 ELSE 0 END) AS n_window
      FROM hits GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(t.n_spark AS BIGINT) AS n_spark,
           CAST(t.n_join AS BIGINT) AS n_join,
           CAST(t.n_window AS BIGINT) AS n_window,
           CAST(s.min_span + 1 AS BIGINT) AS min_window_tokens,
           s.min_span + 1 <= 12 AS within_12
    FROM tf t JOIN spans s USING (doc_id)
    """,
)
def retrieval_proximity_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing ALL query terms, with the minimal token window
    covering one occurrence of each — the positional-index operator
    behind phrase and NEAR queries (Manning et al. IR ch. 2): ranking
    by proximity rewards passages where the terms interact, which
    bag-of-words tf cannot see.

    Scale shape: the positional postings for the QUERY VOCABULARY only
    (the ext_bm25 discipline — the explode filters to 3 terms before
    anything shuffles, so postings are query-sized, not corpus-sized);
    the window minimum is the ordered-positions sweep
    (operators/retrieval.min_cover_span): ONE doc-keyed sort window
    tracking the last-seen position per term, O(sum tf) rows per doc
    — EXACT, and it replaces the n-way positional self-join whose
    fan-out was the per-doc tf PRODUCT (the shape where one
    pathological tf=1e3 doc meant 1e9 rows in a single task;
    VERDICT r7 weak #1, fixed r8). Conjunctive docs only (the
    all-terms-seen filter = the AND gate); all outputs integer.
    Pathological-tf fan-out bound pinned in
    tests/test_retrieval.py::test_min_cover_span_pathological_tf."""
    d = load(spark, sf_dir, "documents")
    ex = scale_out(d).select(
        "doc_id",
        F.posexplode(tokenize(F.col("text"))).alias("pos", "tok"),
    )
    hits = ex.filter(F.col("tok").isin(*QUERY_TERMS)).select(
        "doc_id", "tok", "pos"
    )
    spans = retrieval.min_cover_span(
        hits, "doc_id", "tok", "pos", QUERY_TERMS
    )
    tf = hits.groupBy("doc_id").agg(
        *[
            F.sum((F.col("tok") == t).cast("int"))
            .cast("long")
            .alias(f"n_{t}")
            for t in QUERY_TERMS
        ]
    )
    return tf.join(spans, "doc_id").select(
        "doc_id",
        "n_spark",
        "n_join",
        "n_window",
        (F.col("min_span") + 1).cast("long").alias("min_window_tokens"),
        (F.col("min_span") + 1 <= 12).alias("within_12"),
    )


# Standing queries (alerting/routing filters), shared literals on both
# engines — the percolate direction: queries are DATA, documents stream
# past them. q4 carries a vocabulary-absent term so the zero-match path
# is exercised and visibly reported.
_STANDING_QUERIES = (
    (1, ("spark", "join")),
    (2, ("window", "stream", "data")),
    (3, ("the",)),
    (4, ("spark", "quantumfoo")),
    (5, ("join", "window", "stream", "data", "spark")),
)


@register(
    "retrieval_standing_queries",
    survey_ref=(
        "[EXT] standing-query matching (the Elasticsearch percolate / "
        "streaming-alert direction — queries are DATA, documents "
        "stream past them): conjunctive term-set queries matched via "
        "one vocabulary-filtered postings join + per-(query, doc) "
        "count == query size; zero-match queries stay visible"
    ),
    oracle=f"""
    WITH qt (qid, term) AS (VALUES {", ".join(
        f"({qid}, '{t}')" for qid, terms in _STANDING_QUERIES for t in terms
    )}),
    qsz AS (SELECT qid, count(*) AS k FROM qt GROUP BY qid),
    dt AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
      WHERE tok IN (SELECT term FROM qt)),
    m AS (SELECT q.qid, d.doc_id, count(*) AS c
          FROM dt d JOIN qt q ON q.term = d.tok
          GROUP BY q.qid, d.doc_id),
    hit AS (SELECT m.qid, m.doc_id
            FROM m JOIN qsz s ON s.qid = m.qid AND m.c = s.k)
    SELECT s.qid,
           CAST(s.k AS INT) AS n_terms,
           CAST(count(h.doc_id) AS BIGINT) AS n_matching_docs,
           CAST(min(h.doc_id) AS BIGINT) AS first_doc
    FROM qsz s LEFT JOIN hit h ON h.qid = s.qid
    GROUP BY s.qid, s.k
    """,
)
def retrieval_standing_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match a TABLE of standing conjunctive queries against the
    corpus — the percolate/alerting direction of retrieval (documents
    are the stream, queries are the index): content routing, saved
    searches, and compliance filters all run this shape. A doc
    matches a query when it contains EVERY query term, computed as
    per-(query, doc) distinct-term count equal to the query's size —
    no per-query scan, no OR-of-ANDs blowup.

    Scale shape: the corpus explodes ONCE, filtered to the standing
    vocabulary before any shuffle (postings are alert-vocabulary-
    sized, not corpus-sized); the query-term table is a broadcast
    literal; the (query, doc) count partial-aggregates map-side.
    Zero-match queries (q4 carries a vocabulary-absent term) survive
    through the LEFT JOIN with n_matching_docs = 0 — an alerting
    system that silently drops dead rules is unauditable."""
    d = load(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _STANDING_QUERIES for t in terms],
        "qid int, term string",
    )
    qsz = qt.groupBy("qid").agg(F.count(F.lit(1)).alias("k"))
    vocab = sorted({t for _, terms in _STANDING_QUERIES for t in terms})
    dt = (
        scale_out(d)
        .select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.col("tok").isin(*vocab))
        .distinct()
    )
    m = dt.join(F.broadcast(qt), dt.tok == qt.term).groupBy(
        "qid", "doc_id"
    ).agg(F.count(F.lit(1)).alias("c"))
    hit = m.join(F.broadcast(qsz), ["qid"]).filter(
        F.col("c") == F.col("k")
    ).select("qid", "doc_id")
    return (
        qsz.join(hit, "qid", "left")
        .groupBy("qid", "k")
        .agg(
            F.count("doc_id").cast("long").alias("n_matching_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .select(
            "qid",
            F.col("k").cast("int").alias("n_terms"),
            "n_matching_docs",
            "first_doc",
        )
    )


@register(
    "retrieval_prf_expansion",
    survey_ref=(
        "[EXT] pseudo-relevance-feedback query expansion (RM3-lite, "
        "Lavrenko & Croft 2001): BM25 top-10 feedback docs → candidate "
        "terms scored fb_tf/df as a SCALED INTEGER (collection-"
        "frequent noise self-penalizes; no float ordering) → top-10 "
        "expansion terms — the second retrieval stage that lifts "
        "recall without a learned model"
    ),
    oracle=f"""
    WITH {_BM25_CTES},
    fb AS (
      SELECT doc_id FROM bm25
      ORDER BY bm25 DESC, doc_id ASC LIMIT 10),
    cand AS (
      SELECT term, count(*) AS fb_tf,
             count(DISTINCT t.doc_id) AS n_fb_docs
      FROM (SELECT d.doc_id, unnest(d.t) AS term
            FROM docs d JOIN fb USING (doc_id)) t
      WHERE term NOT IN ('spark', 'join', 'window')
      GROUP BY term),
    gdf AS (
      SELECT term, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(t) AS term FROM docs)
      GROUP BY term)
    SELECT c.term,
           CAST(c.fb_tf AS BIGINT) AS fb_tf,
           CAST(c.n_fb_docs AS BIGINT) AS n_fb_docs,
           CAST(g.df AS BIGINT) AS collection_df,
           CAST(c.fb_tf * 1000000 // g.df AS BIGINT) AS rm3_score
    FROM cand c
    JOIN gdf g USING (term)
    ORDER BY rm3_score DESC, c.term ASC LIMIT 10
    """,
)
def retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expand the fixed query from its own top-10 BM25 results: terms
    frequent in the feedback docs but NOT collection-frequent become
    the expansion candidates (RM3's core move, integerized) — the
    classic no-model recall lift between plain BM25 and a learned
    reranker, and the catalog's first RETRIEVE → FEEDBACK → RERANK
    two-pass retrieval plan.

    Determinism: the feedback cut orders by (rounded bm25 DESC,
    doc_id); the RM3 relevance weight fb_tf/df is carried as the
    scaled integer fb_tf·10⁶ // df — collection-frequent terms
    self-penalize without any float ordering — and the final cut
    orders by (rm3_score DESC, term): total orders everywhere.
    Scale: feedback docs are 10 rows joined back semi-join-style, so
    the candidate explode touches 10 documents; the collection df agg
    is the standard postings rollup; both cuts are
    TakeOrderedAndProject."""
    d = load(spark, sf_dir, "documents")
    fb = retrieval.bm25_topk(d, "doc_id", "text", QUERY_TERMS, 10).select(
        "doc_id"
    )
    toks = d.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    )
    cand = (
        toks.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("term").isin(*QUERY_TERMS))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("fb_tf"),
            F.countDistinct("doc_id").alias("n_fb_docs"),
        )
    )
    gdf = toks.distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    return (
        cand.join(gdf, "term")
        .select(
            "term",
            F.col("fb_tf").cast("long").alias("fb_tf"),
            F.col("n_fb_docs").cast("long").alias("n_fb_docs"),
            F.col("df").cast("long").alias("collection_df"),
            F.expr("fb_tf * 1000000 div df").cast("long").alias("rm3_score"),
        )
        .orderBy(F.col("rm3_score").desc(), F.col("term"))
        .limit(10)
    )


@register(
    "retrieval_kwic_snippets",
    survey_ref=(
        "[EXT] KWIC snippet generation (keyword-in-context, the "
        "search-result preview): first query-term occurrence per doc "
        "(min (pos, term) struct — deterministic argmin) with a "
        "±4-token context window sliced from the token array; the "
        "user-facing rendering step after any retrieval stage"
    ),
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    hits AS (
      SELECT doc_id, pos, tok FROM ex
      WHERE tok IN ('spark', 'join', 'window')
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY pos, tok) = 1)
    SELECT h.doc_id,
           CAST(h.pos AS BIGINT) AS first_pos,
           h.tok AS matched_term,
           array_to_string(list_slice(b.toks,
             greatest(h.pos - 4, 0) + 1, h.pos + 5), ' ') AS snippet
    FROM hits h JOIN base b USING (doc_id)
    """,
)
def retrieval_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context preview for the fixed query: the FIRST
    occurrence of any query term per document with four tokens of
    context on each side — what a result page renders under each hit
    (and the last mile every retrieval pipeline here feeds:
    bm25/hybrid rank, THIS renders). Argmin is the deterministic
    min-(pos, term) struct; the context window is one array slice on
    the already-tokenized doc.

    Scale shape: positional postings filtered to the query vocabulary
    before any shuffle (the proximity-window discipline), a doc-keyed
    argmin aggregate, then one join back to the tokenized doc for the
    slice — snippet assembly touches only MATCHING docs. Snippets are
    plain VARCHAR; hash-gate-safe."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    )
    ex = base.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    hits = (
        ex.filter(F.col("tok").isin(*QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.min(F.struct("pos", "tok")).alias("h"))
        .select(
            "doc_id",
            F.col("h.pos").alias("pos"),
            F.col("h.tok").alias("matched_term"),
        )
    )
    return hits.join(base, "doc_id").select(
        "doc_id",
        F.col("pos").cast("long").alias("first_pos"),
        "matched_term",
        F.array_join(
            F.slice(
                F.col("toks"),
                F.greatest(F.col("pos") - 4, F.lit(0)) + 1,
                F.col("pos") + 5 - F.greatest(F.col("pos") - 4, F.lit(0)),
            ),
            " ",
        ).alias("snippet"),
    )


@register(
    "retrieval_postings_size_advisor",
    survey_ref=(
        "[EXT] inverted-index storage advisor: per-term Elias-Fano "
        "posting-list size estimate (Vigna 2013: n*(2 + "
        "floor(log2(U/n))) bits) vs raw 32-bit ids — the "
        "layout_encoding_advisor twin for the retrieval index; "
        "floor-log2 computed as binary-string length so both engines "
        "share one integer semantics (no float log)"
    ),
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_TOKS}) AS term FROM documents),
    n AS (SELECT count(*) AS u FROM documents),
    t AS (
      SELECT term, count(*) AS df FROM toks GROUP BY term
      HAVING count(*) >= 20)
    SELECT t.term,
           CAST(t.df AS BIGINT) AS df,
           CAST(n.u AS BIGINT) AS universe,
           CAST(32 * t.df AS BIGINT) AS raw_bits,
           CAST(t.df * (2 + length(bin(n.u // t.df)) - 1) AS BIGINT)
             AS ef_bits,
           round(CAST(t.df * (2 + length(bin(n.u // t.df)) - 1)
                 AS DOUBLE) / (32 * t.df), 6) AS compression,
           t.df * (2 + length(bin(n.u // t.df)) - 1) < 32 * t.df
             AS ef_wins
    FROM t, n
    """,
)
def retrieval_postings_size_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Storage planning for the postings index at rest
    (streaming/index.py): per term, the Elias-Fano quasi-succinct
    size estimate n·(2 + ⌊log2(U/n)⌋) bits against raw 32-bit doc ids
    — dense terms (df near U) compress toward ~2 bits/posting, rare
    terms approach ⌊log2 U⌋+2 and may not beat raw. The advisor says
    per term which representation the index writer should pick, the
    same decision layout_encoding_advisor makes for columnar pages.
    ⌊log2 x⌋ is the length of x's binary string minus one (Spark
    conv(x,10,2) / DuckDB bin(x)) — pure integer semantics, no float
    log anywhere, so the whole report is hash-exact.

    Scale shape: one distinct (doc, term) rollup to df (map-side
    partials); the universe is a 1-row broadcast (allowlisted);
    per-term math is scan-side expressions over the vocabulary-sized
    table."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    ).distinct()
    n = d.agg(F.count(F.lit(1)).alias("u"))
    t = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 20)
    )
    j = t.crossJoin(F.broadcast(n))
    log2q = (
        F.length(F.conv(F.expr("u div df").cast("string"), 10, 2)) - 1
    )
    ef_bits = (F.col("df") * (F.lit(2) + log2q)).cast("long")
    raw_bits = (F.lit(32) * F.col("df")).cast("long")
    return j.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("u").cast("long").alias("universe"),
        raw_bits.alias("raw_bits"),
        ef_bits.alias("ef_bits"),
        F.round(ef_bits.cast("double") / raw_bits, 6).alias(
            "compression"
        ),
        (ef_bits < raw_bits).alias("ef_wins"),
    )


@register(
    "retrieval_query_likelihood",
    survey_ref=(
        "[EXT] Dirichlet-smoothed query-likelihood LM ranking (Zhai & "
        "Lafferty 2001), BM25's probabilistic sibling: dense "
        "single-scan form (tf via array_remove counting, one 1-row "
        "stats broadcast, zero wide shuffles); per-term ln rounded at "
        "6 then summed in exact DECIMAL — the eval_bleu_log sum "
        "discipline — so the top-20 hash gate holds at any parallelism"
    ),
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    docs AS (
      SELECT doc_id, len(t) AS dl,
             len(t) - len(list_filter(t, x -> x <> 'spark')) AS tf_0,
             len(t) - len(list_filter(t, x -> x <> 'join')) AS tf_1,
             len(t) - len(list_filter(t, x -> x <> 'window')) AS tf_2
      FROM toks),
    stats AS (
      SELECT sum(dl) AS t_total, sum(tf_0) AS ctf_0,
             sum(tf_1) AS ctf_1, sum(tf_2) AS ctf_2
      FROM docs),
    scored AS (
      SELECT d.doc_id, d.dl, d.tf_0, d.tf_1, d.tf_2,
             CAST(
               CAST(round(ln((d.tf_0 + 100 * ((s.ctf_0 + 1)
                      / CAST(s.t_total + 1 AS DOUBLE)))
                      / CAST(d.dl + 100 AS DOUBLE)), 6) AS DECIMAL(18,6))
             + CAST(round(ln((d.tf_1 + 100 * ((s.ctf_1 + 1)
                      / CAST(s.t_total + 1 AS DOUBLE)))
                      / CAST(d.dl + 100 AS DOUBLE)), 6) AS DECIMAL(18,6))
             + CAST(round(ln((d.tf_2 + 100 * ((s.ctf_2 + 1)
                      / CAST(s.t_total + 1 AS DOUBLE)))
                      / CAST(d.dl + 100 AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS DOUBLE) AS ql_score
      FROM docs d CROSS JOIN stats s)
    SELECT doc_id, CAST(dl AS BIGINT) AS dl,
           CAST(tf_0 AS BIGINT) AS tf_0, CAST(tf_1 AS BIGINT) AS tf_1,
           CAST(tf_2 AS BIGINT) AS tf_2, ql_score
    FROM scored
    ORDER BY ql_score DESC, doc_id ASC LIMIT 20
    """,
)
def retrieval_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 by Dirichlet query likelihood for the catalog's fixed
    query — the LM-based ranking that complements ext_bm25_topk (same
    dense single-scan shape, different probability model: documents
    with NO query term still rank, by collection-probability mass
    shrunk toward μ/(dl+μ); longer non-matching docs sink). μ = 100,
    add-one collection smoothing.

    Scale shape: operators/retrieval.py:query_likelihood_dense — one
    corpus scan, one map-side-combined 1-row aggregate broadcast back
    (the allowlisted 1-row-stats BNLJ class), TakeOrderedAndProject
    for the top-20; no wide shuffle anywhere."""
    d = load(spark, sf_dir, "documents")
    scored = retrieval.query_likelihood_dense(
        d, "doc_id", "text", QUERY_TERMS, mu=100
    )
    return scored.orderBy(
        F.col("ql_score").desc(), F.col("doc_id").asc()
    ).limit(20)


@register(
    "retrieval_champion_lists",
    survey_ref=(
        "[EXT] champion-list / tiered-index pruning (Manning et al., "
        "IIR §7.1.3): per-term top-32-by-tf posting cut at index build, "
        "query scored over ≤|q|·32 rows vs the exact full-postings "
        "top-10 side by side — the rank-k agreement IS the gated "
        "result, so the pruning's recall trade is measured, not argued"
    ),
    oracle=f"""
    WITH {_BM25_CTES},
    champ AS (
      SELECT doc_id, dl, term, tf,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id ASC) AS r
      FROM postings),
    cweights AS (
      SELECT c.doc_id, c.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (c.tf * 2.2)
               / (c.tf + 1.2 * (0.25
                  + 0.75 * c.dl / (s.sum_dl / s.n_docs))) AS w
      FROM champ c JOIN dfreq d USING (term) CROSS JOIN stats s
      WHERE c.r <= 32),
    cl AS (
      SELECT doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w END), 0),
                 6) AS bm25
      FROM cweights GROUP BY doc_id),
    cl10 AS (
      SELECT doc_id, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
      FROM cl QUALIFY rank <= 10),
    full10 AS (
      SELECT doc_id, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
      FROM bm25 QUALIFY rank <= 10)
    SELECT c.rank AS rank,
           c.doc_id AS cl_doc_id, c.bm25 AS cl_bm25,
           f.doc_id AS exact_doc_id, f.bm25 AS exact_bm25,
           c.doc_id = f.doc_id AS same_doc
    FROM cl10 c JOIN full10 f USING (rank)
    """,
)
def retrieval_champion_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Champion-list top-10 vs exact top-10, rank by rank: the
    tiered-index answer touches only each query term's 32 highest-tf
    postings (global df/avgdl kept exact — champion lists prune rows,
    not statistics), and the gate compares document identity and score
    at every rank against the full-postings plan. On this corpus the
    lists are deep enough that the top ranks agree — exactly the
    regime the technique targets; rank disagreements, when the corpus
    makes them, are DATA the gate hashes, not a failure.

    Scale shape: one vocabulary-filtered explode feeds both paths;
    the champion cut is a term-partitioned window (WindowGroupLimit,
    never a global sort); both top-10s are TakeOrderedAndProject; the
    rank join moves 10 rows; both paths read ONE lazily-checkpointed
    weighted-postings frame (operators/retrieval.py:
    bm25_champion_vs_exact — 2 corpus scans, vs 5 when the paths
    planned independently)."""
    d = load(spark, sf_dir, "documents")
    return retrieval.bm25_champion_vs_exact(
        d, "doc_id", "text", QUERY_TERMS, 10, champions=32
    )


@register(
    "retrieval_wand_pruning",
    survey_ref=(
        "[EXT] WAND upper-bound pruning (Broder et al. 2003), "
        "rank-SAFE: per-term max-weight bounds + a champion-list "
        "θ estimate cut the scored candidate set, and the returned "
        "top-10 is provably identical to exhaustive evaluation "
        "(θ is an achieved score and the round-6 DECIMAL bound "
        "comparison is widened by the (|q|+1)·5e-7 rounding quantum, "
        "so ΣUB < θ−ε cannot hold for a true top-k member); survivor "
        "counts ride as gated columns so the pruning ratio is "
        "measured, not argued"
    ),
    oracle=f"""
    WITH {_BM25_CTES},
    cw AS (
      SELECT p.doc_id, p.term, p.tf, w.w
      FROM postings p
      JOIN weights w ON w.doc_id = p.doc_id AND w.term = p.term),
    champw AS (
      SELECT doc_id, term, w,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id ASC) AS r
      FROM cw),
    champ_scores AS (
      SELECT doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w END), 0),
                 6) AS bm25
      FROM champw WHERE r <= 8 GROUP BY doc_id),
    theta AS (
      SELECT min(bm25) AS theta FROM (
        SELECT bm25 FROM champ_scores
        ORDER BY bm25 DESC, doc_id ASC LIMIT 10)),
    ub AS (SELECT term,
                  CAST(round(max(w), 6) AS DECIMAL(18,6)) AS ub
           FROM weights GROUP BY term),
    bound AS (
      SELECT w.doc_id,
             coalesce(max(CASE WHEN w.term = 'spark' THEN u.ub END),
                      CAST(0 AS DECIMAL(18,6)))
           + coalesce(max(CASE WHEN w.term = 'join' THEN u.ub END),
                      CAST(0 AS DECIMAL(18,6)))
           + coalesce(max(CASE WHEN w.term = 'window' THEN u.ub END),
                      CAST(0 AS DECIMAL(18,6)))
               AS ub_sum
      FROM weights w JOIN ub u USING (term) GROUP BY w.doc_id),
    nb AS (SELECT count(*) AS n_docs_scored_bound FROM bound),
    surv AS (
      -- round-6 DECIMAL bound vs rounded theta minus the 2µ safety
      -- quantum ((|q|+1)·5e-7 rounded up): membership is ulp-stable
      -- AND rank-safe (operators/retrieval.py:bm25_wand_topk)
      SELECT b.doc_id FROM bound b CROSS JOIN theta t
      WHERE b.ub_sum >= CAST(t.theta AS DECIMAL(18,6))
                        - CAST(0.000002 AS DECIMAL(18,6))),
    ns AS (SELECT count(*) AS n_survivors FROM surv),
    final AS (
      SELECT w.doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w.w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w.w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w.w END), 0),
                 6) AS bm25
      FROM weights w JOIN surv USING (doc_id)
      GROUP BY w.doc_id
      ORDER BY bm25 DESC, w.doc_id ASC LIMIT 10)
    SELECT f.doc_id, f.bm25,
           CAST(nb.n_docs_scored_bound AS BIGINT) AS n_docs_scored_bound,
           CAST(ns.n_survivors AS BIGINT) AS n_survivors
    FROM final f CROSS JOIN nb CROSS JOIN ns
    """,
)
def retrieval_wand_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 under WAND-style candidate pruning, hash-gated end to
    end: champion-depth-8 θ estimate, per-term round-6 DECIMAL upper
    bounds, survivor filter ΣUB ≥ θ − ε (ε = the (|q|+1)·5e-7 rounding
    quantum), exhaustive scoring only of survivors. Safety argument in
    operators/retrieval.py:bm25_wand_topk (θ is a real document's
    achievable score, bounds dominate true scores, and ε absorbs the
    round-6 slack on both θ and the bounds); the equals-exhaustive
    property is additionally pinned by pytest.
    The two count columns make the evaluation-set reduction part of
    the gated result."""
    d = load(spark, sf_dir, "documents")
    return retrieval.bm25_wand_topk(
        d, "doc_id", "text", QUERY_TERMS, 10, champions=8
    )


_MAXSIM_DIM = 8


def _tok_embed_sql(tok_expr: str, d: int) -> str:
    """DuckDB mirror of the md5-surrogate token embedding dimension:
    integer in [-1000, 1000] from 16 bits of md5(tok || ':e<d>') —
    the salted-md5 discipline (engine-identical md5, no xxhash)."""
    return (
        f"(CAST('0x' || substring(md5({tok_expr} || ':e{d}'), 1, 4) AS INT)"
        " % 2001 - 1000)"
    )


def _maxsim_oracle() -> str:
    sims = []
    for i, t in enumerate(QUERY_TERMS):
        parts = [
            _tok_embed_sql(f"'{t}'", d) + " * " + _tok_embed_sql("tok", d)
            for d in range(_MAXSIM_DIM)
        ]
        sims.append("             " + "\n           + ".join(parts) + f" AS s{i}")
    return f"""
    WITH tk AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    vocab AS (SELECT DISTINCT tok FROM tk),
    emb AS (
      SELECT tok,
{",".join(sims)}
      FROM vocab),
    best AS (
      SELECT t.doc_id,
             max(e.s0) AS m0, max(e.s1) AS m1, max(e.s2) AS m2
      FROM tk t JOIN emb e USING (tok)
      GROUP BY t.doc_id)
    SELECT doc_id,
           CAST(m0 AS BIGINT) AS max_sim_spark,
           CAST(m1 AS BIGINT) AS max_sim_join,
           CAST(m2 AS BIGINT) AS max_sim_window,
           CAST(m0 + m1 + m2 AS BIGINT) AS maxsim_score
    FROM best
    ORDER BY maxsim_score DESC, doc_id ASC LIMIT 15
    """


@register(
    "retrieval_maxsim_late_interaction",
    survey_ref=(
        "[EXT] late-interaction MaxSim scoring (ColBERT, Khattab & "
        "Zaharia 2020, with md5-surrogate token embeddings standing in "
        "for the learned ones): score(q, d) = Σ_{t∈q} max_{tok∈d} "
        "⟨E(t), E(tok)⟩ — per-token rather than pooled similarity; "
        "embeddings are 8-dim integers from the salted-md5 discipline, "
        "so dot products, maxes and the fixed-order score sum are ALL "
        "integer-exact and the gate hashes the full ranking"
    ),
    # generated from QUERY_TERMS/_MAXSIM_DIM by _maxsim_oracle() so the
    # two engines can never drift on the embedding construction
    oracle=_maxsim_oracle(),
)
def retrieval_maxsim_late_interaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-15 by late-interaction MaxSim: each query term finds its
    best-matching token IN each document (the per-token interaction
    that pooled embeddings average away), and the score sums the three
    maxima in fixed query order. The md5-surrogate embeddings make the
    whole computation integer: the oracle regenerates every embedding
    dimension with the identical salted-md5 formula, so a single wrong
    dot-product term anywhere reorders the gated ranking.

    Scale shape (the ColBERT serving trade, relationally): token
    embeddings are computed once per DISTINCT vocabulary term (the
    |vocab|-sized frame carries 3 integer sims, not raw vectors), then
    one tok-keyed join back to the (doc, tok) stream and one doc-keyed
    max rollup — two linear shuffles, no per-pair vector math in the
    corpus-sized stage. At 100 TB the vocab-sim frame is the
    precomputed \"query-conditioned index probe\"; learned embeddings
    would swap the md5 expression for an index lookup, nothing else
    moves."""
    d = load(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    vocab = tk.select("tok").distinct()

    def emb(tok_col, d_i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(tok_col, F.lit(f":e{d_i}"))), 1, 4
                ),
                16,
                10,
            ).cast("int")
            % 2001
            - 1000
        )

    # materialize each token-embedding dimension ONCE as a column
    # (Catalyst does not CSE the md5 chain across the three sim
    # aliases — the inlined form ran 24 md5s/token, this one 8;
    # measured 5.5 s -> ~2 s warm at sf0.1); the query-side embeddings
    # emb(lit(term), d) are constant-folded at plan time, zero runtime
    dims = vocab.select(
        "tok", *[emb(F.col("tok"), di).alias(f"d{di}") for di in range(_MAXSIM_DIM)]
    )
    sims = []
    for i, t in enumerate(QUERY_TERMS):
        acc = None
        for di in range(_MAXSIM_DIM):
            term = emb(F.lit(t), di) * F.col(f"d{di}")
            acc = term if acc is None else acc + term
        sims.append(acc.alias(f"s{i}"))
    e = dims.select("tok", *sims)
    best = (
        tk.join(e, "tok")
        .groupBy("doc_id")
        .agg(
            F.max("s0").alias("m0"),
            F.max("s1").alias("m1"),
            F.max("s2").alias("m2"),
        )
    )
    return (
        best.select(
            "doc_id",
            F.col("m0").cast("long").alias("max_sim_spark"),
            F.col("m1").cast("long").alias("max_sim_join"),
            F.col("m2").cast("long").alias("max_sim_window"),
            (F.col("m0") + F.col("m1") + F.col("m2"))
            .cast("long")
            .alias("maxsim_score"),
        )
        .orderBy(F.desc("maxsim_score"), F.asc("doc_id"))
        .limit(15)
    )



@register(
    "retrieval_impact_quantized",
    survey_ref=(
        "[EXT] impact-quantized index scoring (Anh & Moffat 2005, the "
        "quantization Lucene ships for impact-ordered postings): "
        "per-(doc,term) BM25 weights → global 64-level integer "
        "impacts via the round-6→DECIMAL→BIGINT scale (no float ever "
        "crosses a bucket boundary), quantized top-10 as pure integer "
        "ordering, fidelity-audited against the exact-score top-10 — "
        "the precision/efficiency trade an impact-ordered engine "
        "accepts, made measurable"
    ),
    oracle=f"""
    WITH {_BM25_CTES},
    iw AS (
      SELECT doc_id, term,
             CAST(CAST(round(w, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT)
               AS iw
      FROM weights),
    bounds AS (SELECT min(iw) AS min_iw, max(iw) AS max_iw FROM iw),
    q AS (
      SELECT doc_id, term,
             1 + ((iw - min_iw) * 64) // (max_iw - min_iw + 1) AS q
      FROM iw CROSS JOIN bounds),
    sq AS (
      SELECT doc_id,
             coalesce(max(CASE WHEN term = 'spark' THEN q END), 0)
               AS q_spark,
             coalesce(max(CASE WHEN term = 'join' THEN q END), 0)
               AS q_join,
             coalesce(max(CASE WHEN term = 'window' THEN q END), 0)
               AS q_window
      FROM q GROUP BY doc_id),
    topq AS (
      SELECT doc_id, q_spark, q_join, q_window,
             q_spark + q_join + q_window AS score_q
      FROM sq ORDER BY score_q DESC, doc_id ASC LIMIT 10),
    topx AS (SELECT doc_id FROM bm25 ORDER BY bm25 DESC, doc_id LIMIT 10)
    SELECT t.doc_id,
           CAST(t.q_spark AS BIGINT) AS q_spark,
           CAST(t.q_join AS BIGINT) AS q_join,
           CAST(t.q_window AS BIGINT) AS q_window,
           CAST(t.score_q AS BIGINT) AS score_q,
           b.bm25 AS bm25_exact,
           (x.doc_id IS NOT NULL) AS in_exact_top10
    FROM topq t
    JOIN bm25 b USING (doc_id)
    LEFT JOIN topx x USING (doc_id)
    """,
)
def retrieval_impact_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact quantization audit: every (doc, term) BM25 weight maps to
    an integer impact 1..64 via global min/max bounds, per-doc scores
    become small-integer sums (the representation that lets a real
    engine store 6-bit impacts in postings and accumulate in int
    registers, and that makes impact-ORDERED traversal with integer
    early-termination thresholds possible at all), and the quantized
    top-10 carries its exact-score counterpart plus an in_exact_top10
    flag — the rank-fidelity loss of 6-bit quantization, gated as
    data.

    Hash discipline: the weight is rounded at 6 and scaled to BIGINT
    through DECIMAL(18,6) (the eval_bleu_log assembly — a bare
    round-6-double × 1e6 cast can land one ulp below the integer and
    truncate apart between engines); bucketing, scoring, and ordering
    are then pure integer arithmetic, with the non-negative numerator
    guaranteed by iw ≥ min_iw (README division audit).

    Scale shape: the dense single-scan BM25 form (per-term tf columns,
    1-row corpus-stats broadcast) plus ONE extra 1-row broadcast for
    the global impact bounds — a fundamental second pass, since
    quantization bounds are data-dependent; both top-10s are
    TakeOrderedAndProject cuts, and the fidelity join is 10×10
    broadcast. Zero wide shuffles at any corpus size."""
    from shippai_knowledge_etl_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        bm25_weight,
    )

    d = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    tf_cols = [
        (F.size("toks") - F.size(F.array_remove(F.col("toks"), t)))
        .cast("long")
        .alias(f"tf_{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    per_doc = d.select(F.col("doc_id"), toks.alias("toks")).select(
        "doc_id", F.size("toks").cast("long").alias("dl"), *tf_cols
    )
    # Round-12 optimization (guide §2.3 "don't recompute what you can
    # keep"; the eval_meteor_frag lazy-localCheckpoint idiom): four
    # consumers read per_doc — the corpus-stats aggregate, the global
    # impact-bounds aggregate, and the two top-10 cuts — and without a
    # barrier each one re-runs tokenize + the array_remove tf counting
    # from the parquet scan (measured: 16 Scan parquet leaves in the
    # physical plan, i.e. the tokenize pass ran 4x per execution).
    # per_doc is 5 longs per doc, so the materialized footprint is
    # tiny at any corpus size; lazy so plan-building stays action-free.
    per_doc = per_doc.localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats)).withColumn(
        "avgdl", F.col("sum_dl") / F.col("n_docs")
    )
    for i in range(len(QUERY_TERMS)):
        w = bm25_weight(
            F.col(f"tf_{i}"),
            F.col(f"df_{i}"),
            F.col("dl"),
            F.col("n_docs"),
            F.col("avgdl"),
            BM25_K1,
            BM25_B,
        )
        scored = scored.withColumn(
            f"w_{i}", F.when(F.col(f"tf_{i}") > 0, w)
        ).withColumn(
            f"iw_{i}",
            (F.round(F.col(f"w_{i}"), 6).cast("decimal(18,6)") * 1000000).cast(
                "long"
            ),
        )
    bounds = scored.select(
        F.explode(F.array(*[F.col(f"iw_{i}") for i in range(3)])).alias("iw")
    ).agg(F.min("iw").alias("min_iw"), F.max("iw").alias("max_iw"))
    qd = scored.crossJoin(F.broadcast(bounds))
    for i in range(len(QUERY_TERMS)):
        qd = qd.withColumn(
            f"q_{i}",
            F.when(
                F.col(f"tf_{i}") > 0,
                F.lit(1)
                + F.expr(f"((iw_{i} - min_iw) * 64) div (max_iw - min_iw + 1)"),
            ).otherwise(F.lit(0))
            .cast("long"),
        )
    exact = F.round(
        F.coalesce(F.col("w_0"), F.lit(0.0))
        + F.coalesce(F.col("w_1"), F.lit(0.0))
        + F.coalesce(F.col("w_2"), F.lit(0.0)),
        6,
    )
    any_hit = (
        (F.col("tf_0") > 0) | (F.col("tf_1") > 0) | (F.col("tf_2") > 0)
    )
    full = qd.filter(any_hit).select(
        "doc_id",
        F.col("q_0").alias("q_spark"),
        F.col("q_1").alias("q_join"),
        F.col("q_2").alias("q_window"),
        (F.col("q_0") + F.col("q_1") + F.col("q_2")).alias("score_q"),
        exact.alias("bm25_exact"),
    )
    topq = full.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(10)
    topx = (
        full.select("doc_id", "bm25_exact")
        .orderBy(F.desc("bm25_exact"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.lit(True).alias("hit"))
    )
    return topq.join(F.broadcast(topx), "doc_id", "left").select(
        "doc_id",
        "q_spark",
        "q_join",
        "q_window",
        "score_q",
        "bm25_exact",
        F.coalesce(F.col("hit"), F.lit(False)).alias("in_exact_top10"),
    )



@register(
    "retrieval_maxscore_pruning",
    survey_ref=(
        "[EXT] MaxScore essential-term pruning (Turtle & Flood 1995), "
        "rank-SAFE — the TERM-level counterpart of WAND's per-doc "
        "bound filter: terms sorted by round-6 DECIMAL upper bound, "
        "the tail-sum rule marks whole postings lists non-essential "
        "(a doc of only non-essential terms cannot reach the champion "
        "θ), candidates are docs containing ≥1 essential term — "
        "decided per LIST before any per-doc arithmetic — and the "
        "returned top-10 is provably identical to exhaustive "
        "evaluation (the (|q|+1)·5e-7 quantum widening, applied to "
        "tails); essential-term and candidate counts ride as gated "
        "columns so the skip is measured, not argued"
    ),
    oracle=f"""
    WITH {_BM25_CTES},
    cw AS (
      SELECT p.doc_id, p.term, p.tf, w.w
      FROM postings p
      JOIN weights w ON w.doc_id = p.doc_id AND w.term = p.term),
    champw AS (
      SELECT doc_id, term, w,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id ASC) AS r
      FROM cw),
    champ_scores AS (
      SELECT doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w END), 0),
                 6) AS bm25
      FROM champw WHERE r <= 8 GROUP BY doc_id),
    theta AS (
      SELECT min(bm25) AS theta FROM (
        SELECT bm25 FROM champ_scores
        ORDER BY bm25 DESC, doc_id ASC LIMIT 10)),
    ub AS (SELECT term,
                  CAST(round(max(w), 6) AS DECIMAL(18,6)) AS ub
           FROM weights GROUP BY term),
    tails AS (
      SELECT term, ub,
             sum(ub) OVER (ORDER BY ub DESC, term ASC
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS tail
      FROM ub),
    ess AS (
      -- non-essential only when the tail sits BELOW theta minus the
      -- 2µ quantum ((|q|+1)·5e-7 rounded up): rank-safe, ulp-stable
      SELECT term FROM tails CROSS JOIN theta
      WHERE tail >= CAST(theta AS DECIMAL(18,6))
                    - CAST(0.000002 AS DECIMAL(18,6))),
    ne AS (SELECT count(*) AS n_essential_terms FROM ess),
    cand AS (
      SELECT DISTINCT doc_id FROM weights
      WHERE term IN (SELECT term FROM ess)),
    nc AS (SELECT count(*) AS n_candidates FROM cand),
    final AS (
      SELECT w.doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w.w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w.w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w.w END), 0),
                 6) AS bm25
      FROM weights w JOIN cand USING (doc_id)
      GROUP BY w.doc_id
      ORDER BY bm25 DESC, w.doc_id ASC LIMIT 10)
    SELECT f.doc_id, f.bm25,
           CAST(ne.n_essential_terms AS BIGINT) AS n_essential_terms,
           CAST(nc.n_candidates AS BIGINT) AS n_candidates
    FROM final f CROSS JOIN ne CROSS JOIN nc
    """,
)
def retrieval_maxscore_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 under MaxScore list skipping, hash-gated end to end:
    champion-depth-8 θ, per-term round-6 DECIMAL bounds, tail sums
    over the UB-sorted term dimension, candidates = docs with ≥1
    essential term. Safety argument in
    operators/retrieval.py:bm25_maxscore_topk (θ is achieved, tails
    dominate only-suffix docs, ε absorbs round-6 slack); the
    equals-exhaustive property is additionally pinned by pytest.
    Beside retrieval_wand_pruning the catalog now carries BOTH classic
    dynamic-pruning families — per-document bounds and per-list
    essential sets."""
    d = load(spark, sf_dir, "documents")
    return retrieval.bm25_maxscore_topk(
        d, "doc_id", "text", QUERY_TERMS, 10, champions=8
    )


@register(
    "retrieval_blockmax_wand",
    survey_ref=(
        "[EXT] Block-Max WAND (Ding & Suel 2011) — the modern third "
        "member of the dynamic-pruning family beside WAND and "
        "MaxScore: per-(term, 64-doc-block) round-6 DECIMAL maxima "
        "bound each document by the blocks it actually sits in, a "
        "strictly tighter bound than the global UB, and BOTH survivor "
        "counts (block-max and classic global) ride as gated columns "
        "so the tightening is measured data; rank-safe under the same "
        "(|q|+1)·5e-7 quantum, equals-exhaustive pytest-pinned"
    ),
    oracle=f"""
    WITH {_BM25_CTES},
    cw AS (
      SELECT p.doc_id, p.term, p.tf, w.w
      FROM postings p
      JOIN weights w ON w.doc_id = p.doc_id AND w.term = p.term),
    champw AS (
      SELECT doc_id, term, w,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id ASC) AS r
      FROM cw),
    champ_scores AS (
      SELECT doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w END), 0),
                 6) AS bm25
      FROM champw WHERE r <= 8 GROUP BY doc_id),
    theta AS (
      SELECT min(bm25) AS theta FROM (
        SELECT bm25 FROM champ_scores
        ORDER BY bm25 DESC, doc_id ASC LIMIT 10)),
    bmax AS (
      SELECT term, doc_id // 64 AS blk,
             CAST(round(max(w), 6) AS DECIMAL(18,6)) AS bm
      FROM weights GROUP BY term, doc_id // 64),
    ub AS (SELECT term,
                  CAST(round(max(w), 6) AS DECIMAL(18,6)) AS ub
           FROM weights GROUP BY term),
    bbound AS (
      SELECT w.doc_id,
             coalesce(max(CASE WHEN w.term = 'spark' THEN b.bm END),
                      CAST(0 AS DECIMAL(18,6)))
           + coalesce(max(CASE WHEN w.term = 'join' THEN b.bm END),
                      CAST(0 AS DECIMAL(18,6)))
           + coalesce(max(CASE WHEN w.term = 'window' THEN b.bm END),
                      CAST(0 AS DECIMAL(18,6)))
               AS bsum
      FROM weights w
      JOIN bmax b ON b.term = w.term AND b.blk = w.doc_id // 64
      GROUP BY w.doc_id),
    gbound AS (
      SELECT w.doc_id,
             coalesce(max(CASE WHEN w.term = 'spark' THEN u.ub END),
                      CAST(0 AS DECIMAL(18,6)))
           + coalesce(max(CASE WHEN w.term = 'join' THEN u.ub END),
                      CAST(0 AS DECIMAL(18,6)))
           + coalesce(max(CASE WHEN w.term = 'window' THEN u.ub END),
                      CAST(0 AS DECIMAL(18,6)))
               AS gsum
      FROM weights w JOIN ub u USING (term) GROUP BY w.doc_id),
    sblk AS (
      SELECT b.doc_id FROM bbound b CROSS JOIN theta t
      WHERE b.bsum >= CAST(t.theta AS DECIMAL(18,6))
                      - CAST(0.000002 AS DECIMAL(18,6))),
    nb AS (SELECT count(*) AS n_survivors_block FROM sblk),
    sglob AS (
      SELECT g.doc_id FROM gbound g CROSS JOIN theta t
      WHERE g.gsum >= CAST(t.theta AS DECIMAL(18,6))
                      - CAST(0.000002 AS DECIMAL(18,6))),
    ng AS (SELECT count(*) AS n_survivors_global FROM sglob),
    final AS (
      SELECT w.doc_id,
             round(coalesce(max(CASE WHEN term = 'spark' THEN w.w END), 0)
                 + coalesce(max(CASE WHEN term = 'join' THEN w.w END), 0)
                 + coalesce(max(CASE WHEN term = 'window' THEN w.w END), 0),
                 6) AS bm25
      FROM weights w JOIN sblk USING (doc_id)
      GROUP BY w.doc_id
      ORDER BY bm25 DESC, w.doc_id ASC LIMIT 10)
    SELECT f.doc_id, f.bm25,
           CAST(nb.n_survivors_block AS BIGINT) AS n_survivors_block,
           CAST(ng.n_survivors_global AS BIGINT) AS n_survivors_global
    FROM final f CROSS JOIN nb CROSS JOIN ng
    """,
)
def retrieval_blockmax_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 under block-max bounds: the per-(term, block) maxima are
    what a block-max index stores at rest (the skip-list metadata of
    every modern engine's postings), and the per-doc bound joins each
    posting to its OWN block's maximum — tighter than WAND's global
    UB, with the reduction itself gated (n_survivors_block ≤
    n_survivors_global, both data). Safety argument in
    operators/retrieval.py:bm25_blockmax_topk."""
    d = load(spark, sf_dir, "documents")
    return retrieval.bm25_blockmax_topk(
        d, "doc_id", "text", QUERY_TERMS, 10, block=64, champions=8
    )
