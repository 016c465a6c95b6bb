"""Corpus-curation pipeline (SURVEY.md §2.11 [EXT]).

The LLM-data-pipeline operators chained the way a training-data build
actually runs them, as ONE declarative plan: exact dedup → language ID
→ quality gate → per-language token budget. Each stage is demonstrated
standalone elsewhere (dedup_exact, ext_langid_predict,
ext_quality_score, ext_token_counts); this query is the composition —
what a user pointing the engine at a raw crawl would run first.

Plan shape (the 100 TB argument):
  - ONE pass over the text: tokenize once behind a Generate barrier
    (``explode(array(...))`` pins a single evaluation; without it,
    CollapseProject would inline the tokenize expression into every
    derived column — measured ~9 copies of the regex+split per row).
  - All per-row features (token counts, stopword hits, language argmax)
    are built-in array expressions over that one token array — no
    Python, whole-stage codegen end to end.
  - Language argmax is ``sort_array(array(struct(-score, lang)))[0]``,
    i.e. per-row and shuffle-free — the window-based form
    (ext_langid_predict) demonstrates the relational shape; a curation
    pass over 100 TB cannot afford a doc_id shuffle just for argmax.
  - The raw text column is DROPPED before the only wide shuffle: dedup
    partitions by the 256-bit content hash carrying ~40 bytes/row of
    features, not documents.
  - The quality gate is integer arithmetic (``200*n_stop >= n_tokens``
    ⟺ stopword_ratio ≥ 0.005) so the kept-set is bit-identical across
    engines and partitionings — no FP threshold flicker.
  - Final per-language rollup aggregates exact integer sums; the only
    double (kept_stop_ratio) is one division at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.operators.textops import (
    LANG_MARKERS,
    marker_hits,
    tokenize,
)
from shippai_knowledge_etl_spark.queries.dedup import (
    _PLANTED_SQL,
    documents_with_planted_dups,
)
from shippai_knowledge_etl_spark.tables import scale_out

MIN_TOKENS = 25  # ≈ p15 of the corpus: drops fragments, keeps bulk
STOPWORD_PER_200 = 1  # kept ⟺ 200*n_stop >= n_tokens (ratio ≥ 0.005)

_TOKS = (
    "list_filter(str_split(trim(regexp_replace(lower(text), "
    "'[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> '')"
)

_STOP_EN = ", ".join(f"'{w}'" for w in LANG_MARKERS["en"])

_SCORES_SQL = " UNION ALL ".join(
    f"""SELECT doc_id, '{lang}' AS lang,
        len(list_filter(toks, x -> x IN ({", ".join("'" + w + "'" for w in words)})))
          AS score FROM base"""
    for lang, words in sorted(LANG_MARKERS.items())
)


@register(
    "curation_pipeline_e2e",
    survey_ref=(
        "[EXT] corpus curation end-to-end: exact dedup → langid argmax → "
        "integer quality gate → per-language token budget (composition of "
        "dedup_exact + ext_langid_predict + ext_quality_score)"
    ),
    oracle=f"""
    WITH {_PLANTED_SQL},
    dd AS (SELECT doc_id, text,
                  min(doc_id) OVER (PARTITION BY text) AS canon
           FROM planted),
    base AS (SELECT doc_id, {_TOKS} AS toks FROM dd WHERE doc_id = canon),
    feat AS (SELECT doc_id, len(toks) AS n_tokens,
                    len(list_filter(toks, x -> x IN ({_STOP_EN}))) AS n_stop
             FROM base),
    pred AS (SELECT doc_id, lang AS pred_lang FROM ({_SCORES_SQL})
             QUALIFY row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, lang ASC) = 1),
    j AS (SELECT f.n_tokens, f.n_stop, p.pred_lang,
                 (f.n_tokens >= {MIN_TOKENS}
                  AND 200 * f.n_stop >= f.n_tokens) AS kept
          FROM feat f JOIN pred p USING (doc_id))
    SELECT pred_lang,
           count(*) AS n_docs,
           CAST(coalesce(sum(CASE WHEN kept THEN 1 END), 0) AS BIGINT)
             AS n_kept,
           CAST(coalesce(sum(CASE WHEN kept THEN n_tokens END), 0) AS BIGINT)
             AS kept_tokens,
           round(coalesce(sum(CASE WHEN kept THEN n_stop END), 0)
             / CAST(greatest(coalesce(sum(CASE WHEN kept THEN n_tokens END),
                                      0), 1) AS DOUBLE), 6) AS kept_stop_ratio
    FROM j GROUP BY pred_lang
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = scale_out(documents_with_planted_dups(spark, sf_dir))

    # Generate barrier: tokenize evaluated exactly once per row, every
    # feature below reads the pinned array (same trick as coverage.py /
    # diagram.py). Raw text survives only long enough to be hashed.
    toked = corpus.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("h"),
        F.explode(F.array(tokenize(F.col("text")))).alias("toks"),
    )

    toks = F.col("toks")

    # per-row argmax: min of (-score, lang) == max score, ties → lang asc
    best = F.sort_array(
        F.array(
            *[
                F.struct(
                    (-marker_hits(toks, words)).alias("neg_score"),
                    F.lit(lang).alias("lang"),
                )
                for lang, words in sorted(LANG_MARKERS.items())
            ]
        )
    ).getItem(0)

    feats = toked.select(
        "doc_id",
        "h",
        F.size(toks).cast("long").alias("n_tokens"),
        marker_hits(toks, LANG_MARKERS["en"]).cast("long").alias("n_stop"),
        best.getField("lang").alias("pred_lang"),
    )

    # the ONLY wide shuffle: dedup on the content hash, text long gone
    w = Window.partitionBy("h")
    canon = feats.withColumn("canon", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("canon")
    )

    kept = (F.col("n_tokens") >= MIN_TOKENS) & (
        200 * F.col("n_stop") >= F.col("n_tokens")
    )
    zero = F.lit(0).cast("long")
    k_tokens = F.sum(F.when(kept, F.col("n_tokens")).otherwise(zero))
    k_stop = F.sum(F.when(kept, F.col("n_stop")).otherwise(zero))
    return canon.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_kept"),
        k_tokens.alias("kept_tokens"),
        F.round(
            k_stop / F.greatest(k_tokens, F.lit(1)).cast("double"), 6
        ).alias("kept_stop_ratio"),
    )
