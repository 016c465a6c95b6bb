"""Second-wave curation query surface (SURVEY.md §2.11 [EXT]):
repetition profiling, cross-document span dedup, PII redaction,
deterministic mix sampling, sequence packing.

Every oracle follows the catalog's hash-match discipline: exact
integer counts CAST to BIGINT on both sides, double ratios produced by
one final round(x, 6), deterministic tie-breaks (count DESC, gram
DESC) written identically in Spark (max(struct(...))) and DuckDB
(row_number() ... ORDER BY ... DESC)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.operators import curate
from shippai_knowledge_etl_spark.operators.textops import tokenize
from shippai_knowledge_etl_spark.queries.curation import _TOKS
from shippai_knowledge_etl_spark.queries.dedup import (
    _PLANTED_SQL,
    documents_with_planted_dups,
)
from shippai_knowledge_etl_spark.tables import load, scale_out

# ---------------------------------------------------------------------------
# Gopher-style repetition profile
# ---------------------------------------------------------------------------


@register(
    "ext_quality_repetition",
    survey_ref=(
        "[EXT] Gopher-style repetition quality signals: duplicate-token "
        "fraction, top-unigram fraction, top-bigram char coverage "
        "(Rae et al. 2021 table A1 heuristics, relationally)"
    ),
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    per_doc AS (SELECT doc_id, count(*) AS n_tokens,
                       count(*) - count(DISTINCT tok) AS n_repeat,
                       sum(length(tok)) AS n_token_chars
                FROM ex GROUP BY doc_id),
    uni AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok),
    uni_top AS (SELECT doc_id, c AS top_n, tok AS top_tok FROM uni
                QUALIFY row_number() OVER (PARTITION BY doc_id
                        ORDER BY c DESC, tok DESC) = 1),
    bi0 AS (SELECT doc_id, tok,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
            FROM ex),
    bic AS (SELECT doc_id, tok || ' ' || nxt AS bigram, count(*) AS c
            FROM bi0 WHERE nxt IS NOT NULL GROUP BY doc_id, bigram),
    bi_top AS (SELECT doc_id, c * length(bigram) AS top_chars,
                      bigram AS top_bigram FROM bic
               QUALIFY row_number() OVER (PARTITION BY doc_id
                       ORDER BY c * length(bigram) DESC, bigram DESC) = 1)
    SELECT d.doc_id,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(p.n_token_chars, 0) AS BIGINT) AS n_token_chars,
           round(coalesce(p.n_repeat, 0)
             / CAST(greatest(coalesce(p.n_tokens, 0), 1) AS DOUBLE), 6)
             AS dup_token_frac,
           coalesce(u.top_tok, '') AS top_unigram,
           round(coalesce(u.top_n, 0)
             / CAST(greatest(coalesce(p.n_tokens, 0), 1) AS DOUBLE), 6)
             AS top_unigram_frac,
           coalesce(b.top_bigram, '') AS top_bigram,
           round(coalesce(b.top_chars, 0)
             / CAST(greatest(coalesce(p.n_token_chars, 0), 1) AS DOUBLE), 6)
             AS top_bigram_char_frac
    FROM documents d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN uni_top u USING (doc_id)
    LEFT JOIN bi_top b USING (doc_id)
    """,
)
def ext_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals over the documents corpus — the filter a
    Gopher-style quality pipeline applies right after langid. Excess
    values in any column mark boilerplate/templated text for removal."""
    d = scale_out(load(spark, sf_dir, "documents"))
    return curate.repetition_profile(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# Cross-document span dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_spans",
    survey_ref=(
        "[EXT] cross-document duplicated-span profile: non-overlapping "
        "10-token spans grouped corpus-wide (relational analog of "
        "substring dedup, Lee et al. 2021); planted full-dup docs must "
        "show dup_span_frac == 1"
    ),
    oracle=f"""
    WITH {_PLANTED_SQL},
    base AS (SELECT doc_id, {_TOKS} AS toks FROM planted),
    ex AS (SELECT doc_id, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    spans AS (SELECT doc_id, pos - pos % 10 AS span_start,
                     string_agg(tok, ' ' ORDER BY pos) AS span_text
              FROM ex GROUP BY doc_id, span_start),
    owners AS (SELECT span_text, count(DISTINCT doc_id) AS n_owner
               FROM spans GROUP BY span_text),
    per_doc AS (SELECT s.doc_id, count(*) AS n_spans,
                       coalesce(sum(CASE WHEN o.n_owner > 1 THEN 1 END), 0)
                         AS n_dup
                FROM spans s JOIN owners o USING (span_text)
                GROUP BY s.doc_id)
    SELECT pl.doc_id,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
           round(coalesce(p.n_dup, 0)
             / CAST(greatest(coalesce(p.n_spans, 0), 1) AS DOUBLE), 6)
             AS dup_span_frac
    FROM planted pl LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup over the planted-duplicate corpus: every doc in
    a planted (original, copy) pair shares all its spans, so both ends
    profile at dup_span_frac 1.0; organic span collisions in the small
    vocabulary show up as partial fractions."""
    df = scale_out(documents_with_planted_dups(spark, sf_dir))
    return curate.span_dedup_profile(df, "doc_id", "text")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def documents_with_planted_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic synthetic PII appended (the corpus
    itself is letters-only, so planted strings are the only matches):
    doc_id%4==0 → an email, 1 → an IPv4, 2 → a phone, 3 → untouched."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    m = did % 4
    s = lambda c: c.cast("string")  # noqa: E731
    injected = (
        F.when(
            m == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"), s(did),
                F.lit("@example.com now"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.col("text"), F.lit(" node 10."), s(did % 256),
                F.lit(".0."), s(did % 100), F.lit(" up"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.col("text"), F.lit(" call +81 3 "),
                F.lpad(s(did % 10000), 4, "0"), F.lit(" 0199 today"),
            ),
        )
        .otherwise(F.col("text"))
    )
    return d.select("doc_id", injected.alias("text"))


_PII_SQL = """
    pii AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                           || '@example.com now'
               WHEN 1 THEN text || ' node 10.' || CAST(doc_id % 256 AS VARCHAR)
                           || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' up'
               WHEN 2 THEN text || ' call +81 3 '
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ' 0199 today'
               ELSE text END AS text
      FROM documents)
"""

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\+\d[\d -]{7,}\d"


@register(
    "ext_pii_redact",
    survey_ref=(
        "[EXT] PII scrub: email/IPv4/phone regex redaction with match "
        "counts; Java-regex/RE2-portable pattern set, narrow per-row map"
    ),
    oracle=f"""
    WITH {_PII_SQL}
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
             '{_EMAIL_RE}', '[EMAIL]', 'g'),
             '{_IPV4_RE}', '[IP]', 'g'),
             '{_PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM pii
    """,
)
def ext_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact planted PII. The rule order (email → ip →
    phone) is part of the operator contract — see operators/curate.py
    PII_RULES."""
    d = documents_with_planted_pii(spark, sf_dir)
    t = F.col("text")
    counts = curate.pii_counts(t)
    return d.select(
        "doc_id",
        counts["email"].cast("long").alias("n_emails"),
        counts["ipv4"].cast("long").alias("n_ips"),
        counts["phone"].cast("long").alias("n_phones"),
        curate.pii_redact(t).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Deterministic mix sampling
# ---------------------------------------------------------------------------

# source → sampling weight by numeric suffix mod 4; covers the =1
# short-circuit, two mid weights, and a heavy down-sample.
_MIX_CASE = """CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
               WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
               WHEN 2 THEN 0.25 ELSE 0.1 END"""


@register(
    "curation_mix_sample",
    survey_ref=(
        "[EXT] deterministic training-mix sampling: per-source weights "
        "applied via a pure md5(id)-based 16-bit draw — reproducible "
        "across runs/engines/partitionings, no rand()"
    ),
    oracle=f"""
    WITH w AS (SELECT doc_id, source, {_MIX_CASE} AS weight,
                      {_TOKS} AS toks FROM documents),
    k AS (SELECT source, weight, len(toks) AS n_tokens,
                 (weight >= 1.0 OR
                  substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 4)
                    < printf('%04x', CAST(floor(weight * 65536) AS BIGINT)))
                   AS kept
          FROM w)
    SELECT source, CAST(weight AS DOUBLE) AS weight,
           count(*) AS n_in,
           CAST(coalesce(sum(CASE WHEN kept THEN 1 END), 0) AS BIGINT)
             AS n_kept,
           CAST(coalesce(sum(CASE WHEN kept THEN n_tokens END), 0) AS BIGINT)
             AS kept_tokens
    FROM k GROUP BY source, weight
    """,
)
def curation_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply per-source mix weights and report achieved counts. The
    keep decision never touches rand(): identical output for any
    partitioning, retry, or engine — the property an auditable
    training-data build needs."""
    d = load(spark, sf_dir, "documents")
    sfx = F.regexp_extract(F.col("source"), r"([0-9]+)", 1).cast("int")
    weight = (
        F.when(sfx % 4 == 0, F.lit(1.0))
        .when(sfx % 4 == 1, F.lit(0.5))
        .when(sfx % 4 == 2, F.lit(0.25))
        .otherwise(F.lit(0.1))
    )
    base = d.select(
        "doc_id",
        "source",
        weight.alias("weight"),
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    kept = curate.mix_keep(F.col("doc_id"), F.col("weight"), "mix")
    zero = F.lit(0).cast("long")
    return base.groupBy("source", "weight").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(zero)).alias(
            "kept_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

PACK_BUDGET = 512
PACK_SHARDS = 8


@register(
    "pack_sequences_chunk",
    survey_ref=(
        "[EXT] token-budget sequence packing (concat-and-chunk): "
        "sharded running token count, cut every 512 tokens; per-"
        "sequence doc/token rollup"
    ),
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard,
                      len({_TOKS}) AS n_tokens FROM documents),
    packed AS (SELECT doc_id, shard, n_tokens,
                      sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_start
               FROM t)
    SELECT shard, CAST(floor(tok_start / {PACK_BUDGET}) AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM packed GROUP BY shard, seq_id
    """,
)
def pack_sequences_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-mode packing rollup: which docs land in which 512-token
    training sequence, per shard. Doc order within a shard is the id —
    reproducible — and the running sum never sees a global partition."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    packed = curate.pack_sequences(t, "doc_id", "n_tokens", PACK_BUDGET, "shard")
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "pack_sequences_greedy",
    survey_ref=(
        "[EXT] whole-doc first-fit packing via grouped Pandas (no doc "
        "splits; sequential per shard — rows-only check, invariants "
        "pinned in tests/test_curate.py)"
    ),
    oracle=None,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit packing rollup (same input as chunk mode). No sequence
    exceeds the budget unless a single document alone does."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    packed = curate.pack_sequences_greedy(
        t, "doc_id", "n_tokens", PACK_BUDGET, "shard"
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# oversampling weights by numeric suffix mod 4: a >1 fractional repeat
# factor, the =1 identity, and two down-samples.
_MIX_OVER_CASE = """CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
               WHEN 0 THEN 2.5 WHEN 1 THEN 1.0
               WHEN 2 THEN 0.5 ELSE 0.25 END"""


@register(
    "curation_mix_oversample",
    survey_ref=(
        "[EXT] training-mix repeat factors (weights > 1): explode over "
        "ceil(w) epochs, full epochs kept unconditionally, the "
        "fractional epoch passes the per-epoch-salted md5 draw — the "
        "auditable-mix property preserved under oversampling"
    ),
    oracle=f"""
    WITH w AS (SELECT doc_id, source, {_MIX_OVER_CASE} AS weight
               FROM documents),
    e AS (SELECT doc_id, source, weight,
                 unnest(range(CAST(greatest(ceil(weight), 1) AS INT)))
                   AS epoch
          FROM w),
    k AS (SELECT *,
                 (epoch < floor(weight) OR
                  substr(md5(CASE WHEN epoch = 0
                               THEN CAST(doc_id AS VARCHAR)
                               ELSE CAST(doc_id AS VARCHAR) || '#'
                                    || CAST(epoch AS VARCHAR)
                             END || ':mix'), 1, 4)
                    < printf('%04x',
                        CAST(floor((weight - floor(weight)) * 65536)
                             AS BIGINT))) AS kept
          FROM e)
    SELECT source, CAST(weight AS DOUBLE) AS weight,
           CAST(count(DISTINCT CASE WHEN kept THEN doc_id END) AS BIGINT)
             AS n_docs,
           CAST(coalesce(sum(CASE WHEN kept THEN 1 END), 0) AS BIGINT)
             AS n_emitted,
           CAST(coalesce(max(CASE WHEN kept THEN epoch END), -1) AS INT)
             AS max_epoch
    FROM k GROUP BY source, weight
    """,
)
def curation_mix_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-factor sampling rollup: a 2.5-weight source emits every
    doc twice plus a deterministic half a third time; ≤1 weights
    down-sample exactly like curation_mix_sample."""
    d = load(spark, sf_dir, "documents")
    sfx = F.regexp_extract(F.col("source"), r"([0-9]+)", 1).cast("int")
    weight = (
        F.when(sfx % 4 == 0, F.lit(2.5))
        .when(sfx % 4 == 1, F.lit(1.0))
        .when(sfx % 4 == 2, F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    base = d.select("doc_id", "source", weight.alias("weight"))
    out = curate.mix_oversample(base, "doc_id", F.col("weight"), "mix")
    agg = out.groupBy("source", "weight").agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
        F.count(F.lit(1)).alias("n_emitted"),
        F.max("epoch").cast("int").alias("max_epoch"),
    )
    # aggregate against the UNFILTERED (source, weight) universe: a
    # group whose rows are all dropped by the draw must still appear
    # (0, 0, -1) exactly as the oracle's coalesce produces — grouping
    # only emitted rows would lose it and break hash parity whenever a
    # low-weight source keeps nothing at some scale factor
    universe = base.select("source", "weight").distinct()
    return universe.join(agg, ["source", "weight"], "left").select(
        "source",
        F.col("weight").cast("double").alias("weight"),
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.col("n_emitted"), F.lit(0)).cast("long").alias(
            "n_emitted"
        ),
        F.coalesce(F.col("max_epoch"), F.lit(-1)).cast("int").alias(
            "max_epoch"
        ),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


@register(
    "curation_decontaminate",
    survey_ref=(
        "[EXT] benchmark decontamination: train docs sharing word "
        "3-grams with a held-out eval slice (GPT-3 appendix-C style); "
        "planted eval copies must show overlap == 1.0"
    ),
    oracle=f"""
    WITH sh0 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(toks) >= 3 THEN
          list_transform(range(0, len(toks) - 2),
            i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
        ELSE [array_to_string(toks, ' ')] END)) AS shingle
      FROM sh0),
    train_sh AS (
      SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, shingle FROM sh
      WHERE doc_id % 97 = 0),
    test_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    agg AS (
      SELECT s.doc_id,
             count(*) AS n_shingles,
             coalesce(sum(CASE WHEN t.shingle IS NOT NULL THEN 1 END), 0)
               AS n_hits
      FROM train_sh s LEFT JOIN test_sh t USING (shingle)
      GROUP BY s.doc_id)
    SELECT doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits / CAST(n_shingles AS DOUBLE), 6) AS overlap,
           n_hits > 0 AS contaminated
    FROM agg
    """,
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the documents corpus: every 97th
    document plays the held-out eval set, the rest (plus planted exact
    copies of the eval docs at id+200000, which MUST come out
    contaminated with overlap 1.0) is the training side. See
    ``curate.decontaminate`` for the broadcast-membership scale shape —
    the training side is shingled once and shuffles exactly once."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    test = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0).unionByName(
        test.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    return curate.decontaminate(scale_out(train), test, "doc_id", "text")


# ---------------------------------------------------------------------------
# DSIR importance weighting
# ---------------------------------------------------------------------------


@register(
    "curation_dsir_weights",
    survey_ref=(
        "[EXT] DSIR importance weights: hashed unigram+bigram "
        "log-ratio scores of raw docs against the English slice as "
        "the target domain (Xie et al. 2023)"
    ),
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang = 'en' AS t, {_TOKS} AS toks
                  FROM documents),
    grams AS (
      SELECT doc_id, t,
             unnest(list_transform(toks, x -> x || ' ')) AS gram
      FROM toks
      UNION ALL
      SELECT doc_id, t,
             unnest(list_transform(range(0, len(toks) - 1),
               i -> toks[i + 1] || ' ' || toks[i + 2])) AS gram
      FROM toks WHERE len(toks) >= 2),
    g2 AS (SELECT doc_id, t, substring(md5(gram), 1, 2) AS bucket
           FROM grams),
    b AS (SELECT bucket,
                 sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
                 sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS cr
          FROM g2 GROUP BY bucket),
    tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM b),
    w AS (SELECT bucket,
                 CAST(round(ln(CAST((ct + 1) * (nr + 256) AS DOUBLE)
                      / CAST((cr + 1) * (nt + 256) AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS lam
          FROM b, tot),
    sc AS (SELECT g2.doc_id, count(*) AS n_feats, sum(w.lam) AS logw
           FROM g2 JOIN w USING (bucket) WHERE NOT g2.t
           GROUP BY g2.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
           round(CAST(coalesce(sc.logw, 0) AS DOUBLE), 6) AS logw
    FROM (SELECT doc_id FROM documents WHERE lang <> 'en') d
    LEFT JOIN sc USING (doc_id)
    """,
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights over the documents corpus: the English
    slice plays the target domain, every non-English doc is scored by
    the summed log-ratio of its hashed unigram+bigram buckets. High
    logw = most target-like raw docs (what importance resampling would
    keep). See ``curate.dsir_logweights`` for the two-pass,
    256-row-collect, literal-map scale shape."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return curate.dsir_logweights(
        scale_out(d), F.col("lang") == "en", "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# CCNet-style LM perplexity filter
# ---------------------------------------------------------------------------


@register(
    "curation_lm_quality",
    survey_ref=(
        "[EXT] CCNet-style LM quality score: hashed-bigram LM trained "
        "on the English slice, raw docs ranked by mean negative "
        "log-likelihood (Wenzek et al. 2020 head/middle/tail buckets)"
    ),
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang = 'en' AS t, {_TOKS} AS toks
                  FROM documents),
    b2 AS (
      SELECT doc_id, t,
             unnest(list_transform(range(0, len(toks) - 1),
               i -> substring(md5(toks[i + 1]), 1, 2))) AS cb,
             unnest(list_transform(range(0, len(toks) - 1),
               i -> substring(md5(toks[i + 2]), 1, 2))) AS wb
      FROM toks WHERE len(toks) >= 2),
    pairs AS (SELECT cb, wb, count(*) AS pc FROM b2 WHERE t
              GROUP BY cb, wb),
    ctx AS (SELECT cb, sum(pc) AS cc FROM pairs GROUP BY cb),
    terms AS (
      SELECT r.doc_id,
             CAST(round(-ln(CAST(coalesce(p.pc, 0) + 1 AS DOUBLE)
                  / CAST(coalesce(c.cc, 0) + 256 AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS nll
      FROM b2 r
      LEFT JOIN pairs p ON p.cb = r.cb AND p.wb = r.wb
      LEFT JOIN ctx c ON c.cb = r.cb
      WHERE NOT r.t),
    sc AS (SELECT doc_id, count(*) AS n, sum(nll) AS s FROM terms
           GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(sc.n, 0) AS BIGINT) AS n_bigrams,
           round(CAST(coalesce(sc.s, 0) AS DOUBLE)
                 / CAST(greatest(coalesce(sc.n, 0), 1) AS DOUBLE), 6)
             AS mean_nll
    FROM (SELECT doc_id FROM documents WHERE lang <> 'en') d
    LEFT JOIN sc USING (doc_id)
    """,
)
def curation_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scores: hashed-bigram model trained on
    the English documents, every non-English doc scored by mean
    negative log-likelihood. See ``curate.ccnet_lm_scores`` for the
    broadcast-model scale shape (the trained model is ≤ 65,536 cells
    at any corpus size — the raw side never shuffles for scoring)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return curate.ccnet_lm_scores(
        scale_out(d), F.col("lang") == "en", "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


@register(
    "curation_stratified_sample",
    survey_ref=(
        "[EXT] exact-k-per-stratum deterministic sampling: md5-ranked "
        "row_number within each source, reproducible at any "
        "partitioning (balanced-subsample primitive)"
    ),
    oracle="""
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= 5
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 documents per source, drawn by the deterministic md5
    rank — the balanced per-source subsample a mix-debugging or
    eval-carving step takes. Window is partitioned by source (never
    global); the draw is a pure function of (doc_id, salt)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    return curate.stratified_sample(d, "source", 5, "doc_id")


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle
# ---------------------------------------------------------------------------


@register(
    "curation_corpus_shuffle",
    survey_ref=(
        "[EXT] deterministic corpus shuffle/reshard: md5-sharded, "
        "shard-local rank — a reproducible global permutation with no "
        "global sort (training-order randomization)"
    ),
    oracle="""
    SELECT doc_id,
           substring(md5(CAST(doc_id AS VARCHAR) || ':shuffle'), 1, 2)
             AS shard,
           CAST(row_number() OVER (
             PARTITION BY substring(md5(CAST(doc_id AS VARCHAR)
               || ':shuffle'), 1, 2)
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuffle'), doc_id
           ) AS BIGINT) AS pos
    FROM documents
    """,
)
def curation_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-order shuffle of the documents corpus into
    256 hash shards; see ``curate.corpus_shuffle`` for why this is the
    no-global-sort 100 TB shape."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    return curate.corpus_shuffle(d, "doc_id")


# ---------------------------------------------------------------------------
# Shuffle → pack composition (training-shard build)
# ---------------------------------------------------------------------------


@register(
    "curation_shards_e2e",
    survey_ref=(
        "[EXT] training-shard build end-to-end: deterministic corpus "
        "shuffle -> concat-and-chunk packing in SHUFFLED order -> "
        "per-sequence rollup, one plan"
    ),
    oracle=f"""
    WITH tok AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents),
    sh AS (SELECT doc_id,
                  substring(md5(CAST(doc_id AS VARCHAR) || ':shuffle'),
                            1, 2) AS shard,
                  row_number() OVER (
                    PARTITION BY substring(md5(CAST(doc_id AS VARCHAR)
                      || ':shuffle'), 1, 2)
                    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuffle'),
                             doc_id) AS pos
           FROM documents),
    t AS (SELECT sh.shard, sh.pos, tok.n_tokens
          FROM sh JOIN tok USING (doc_id)),
    packed AS (SELECT shard, pos, n_tokens,
                      sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_start
               FROM t)
    SELECT shard, CAST(floor(tok_start / {PACK_BUDGET}) AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           CAST(min(pos) AS BIGINT) AS first_pos,
           CAST(max(pos) AS BIGINT) AS last_pos
    FROM packed GROUP BY shard, seq_id
    """,
)
def curation_shards_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last mile of a pretraining data build as ONE plan: shuffle
    the corpus reproducibly (md5 shards + shard-local rank), lay the
    documents end to end in SHUFFLED order, cut 512-token training
    sequences, and roll up per-sequence stats. Unlike
    pack_sequences_chunk (which packs in raw id order), packing in
    shuffle order is what an actual training-shard writer does — and
    both the permutation and the cuts stay pure functions of
    (doc_id, salt), so the shards are byte-reproducible. Two window
    shuffles (shard rank, running sum) on the same shard partitioning;
    AQE reuses the exchange."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    shuffled = curate.corpus_shuffle(base, "doc_id")
    packed = curate.pack_sequences(
        shuffled, "pos", "n_tokens", PACK_BUDGET, "shard"
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("seq_tokens"),
        F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )


# ---------------------------------------------------------------------------
# C4-style heuristic page cleaning
# ---------------------------------------------------------------------------

# The synthetic corpus is single-line word soup, so the demo PLANTS a
# deterministic multi-line web-page shape on both sides (same pattern
# as documents_with_planted_dups): two content lines carved from the
# text (first punctuated, second not), a junk "javascript" line on
# doc_id%5, a lorem-ipsum + brace line on doc_id%7, and a third
# punctuated line for long docs — so every C4 rule fires on a known
# subset and the keep verdict is mixed, not degenerate.
_C4_PLANT_SPARK = lambda: F.concat_ws(  # noqa: E731
    "\n",
    F.concat(F.substring("text", 1, 80), F.lit(".")),
    F.substring("text", 81, 60),
    F.when(
        F.col("doc_id") % 5 == 0,
        F.lit("please enable javascript to view this page."),
    ),
    F.when(
        F.col("doc_id") % 7 == 0,
        F.lit("warning lorem ipsum dolor sit amet {template}."),
    ),
    F.when(
        F.col("n_chars") >= 200,
        F.concat(F.substring("text", 141, 80), F.lit(".")),
    ),
)

_C4_PLANT_SQL = """planted AS (
  SELECT doc_id, concat_ws(chr(10),
    substr(text, 1, 80) || '.',
    substr(text, 81, 60),
    CASE WHEN doc_id % 5 = 0
         THEN 'please enable javascript to view this page.' END,
    CASE WHEN doc_id % 7 = 0
         THEN 'warning lorem ipsum dolor sit amet {template}.' END,
    CASE WHEN n_chars >= 200 THEN substr(text, 141, 80) || '.' END
  ) AS page FROM documents
)"""


@register(
    "curation_c4_rules",
    survey_ref=(
        "[EXT] C4 heuristic cleaning (Raffel et al. 2020 §2.2): "
        "terminal-punctuation + min-words line filter, javascript "
        "line rule, lorem-ipsum / curly-brace page kill, min-kept-"
        "lines page verdict — zero-shuffle scan-side map"
    ),
    oracle="WITH "
    + _C4_PLANT_SQL
    + """,
    feat AS (
      SELECT doc_id, page, str_split(page, chr(10)) AS lines,
        list_filter(str_split(page, chr(10)), l ->
          regexp_matches(l, '[.!?"]$')
          AND regexp_matches(l, '(\\S+\\s+){4}\\S')
          AND NOT contains(l, 'javascript')
          AND NOT contains(l, '{')) AS kept
      FROM planted
    )
    SELECT doc_id,
      CAST(len(lines) AS BIGINT) AS n_lines,
      CAST(len(kept) AS BIGINT) AS n_kept_lines,
      contains(page, 'lorem ipsum') AS has_lorem,
      contains(page, '{') AS has_brace,
      (len(kept) >= 2 AND NOT contains(page, 'lorem ipsum')
        AND NOT contains(page, '{')) AS keep,
      array_to_string(kept, chr(10)) AS cleaned_text
    FROM feat
    """,
)
def curation_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules over planted web-page-shaped documents. The
    operator itself (`curate.c4_rules`) is a pure per-row map — at
    100 TB it rides the scan with zero shuffles; only the planted
    page construction is demo-specific."""
    d = scale_out(load(spark, sf_dir, "documents"))
    planted = d.select("doc_id", _C4_PLANT_SPARK().alias("page"))
    return curate.c4_rules(planted, "doc_id", "page")


# ---------------------------------------------------------------------------
# Per-domain cap with under-cap bypass
# ---------------------------------------------------------------------------

DOMAIN_CAP = 20


@register(
    "curation_domain_cap",
    survey_ref=(
        "[EXT] per-domain document cap (CCNet/RefinedWeb hot-domain "
        "damper): count → broadcast over-cap domains → window-rank "
        "ONLY those; under-cap domains bypass the shuffle entirely"
    ),
    oracle=f"""
    WITH hub AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN 'hub.example'
                  ELSE source END AS domain,
             n_chars
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, domain, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM hub
    )
    SELECT doc_id, domain, n_chars FROM ranked WHERE rk <= {DOMAIN_CAP}
    """,
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every domain at {DOMAIN_CAP} docs, longest-first. The demo
    plants one zipfian hot domain (every 4th doc reassigned to
    'hub.example') so the driver run exercises BOTH paths: the hot
    domain takes the window rank, the ~20 regular sources (now under
    cap) pass through without shuffling."""
    d = scale_out(load(spark, sf_dir, "documents"))
    hub = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.lit("hub.example"))
        .otherwise(F.col("source"))
        .alias("domain"),
        "n_chars",
    )
    return curate.domain_cap(hub, "domain", DOMAIN_CAP, "n_chars", "doc_id")


@register(
    "curation_url_canonicalize",
    survey_ref=(
        "[EXT] URL canonicalization + blocklist: lowercase scheme/host, "
        "default-port strip, fragment drop, tracking-param removal, "
        "param sort (operators/curate.py:canonical_url) -> broadcast "
        "deny-list probe; the frontier-dedup prerequisite for the "
        "Bloom seen-key filter"
    ),
    oracle="""
    WITH src AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) ||
        '://WWW.Site' || CAST(doc_id % 5 AS VARCHAR) || '.COM' ||
        (CASE WHEN doc_id % 4 = 0 THEN
               (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
              WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END) ||
        (CASE WHEN doc_id % 6 = 0 THEN '' ELSE '/' || source || '/item' END) ||
        (CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=news&a=1&fbclid=abc'
              WHEN doc_id % 5 = 2 THEN '?utm_medium=m' ELSE '' END) ||
        (CASE WHEN doc_id % 2 = 1 THEN '#frag' ELSE '' END) AS url
      FROM documents),
    c1 AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        regexp_replace(regexp_replace(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$', '') AS rest
      FROM src),
    c2 AS (
      SELECT *, lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
             regexp_extract(rest, '^[^/?]*(.*)$', 1) AS pathq
      FROM c1),
    c3 AS (
      SELECT *,
        CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
             ELSE hostport END AS host,
        CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
             ELSE regexp_extract(pathq, '^([^?]*)', 1) END AS path,
        regexp_extract(pathq, '\\?(.*)$', 1) AS query
      FROM c2),
    c4 AS (
      SELECT *,
        regexp_replace(regexp_replace(regexp_replace(
          '&' || query || '&',
          '&(utm_[^=&]*|fbclid|gclid|ref)=[^&]*', '', 'g'),
          '&&+', '&', 'g'), '^&|&$', '', 'g') AS cleaned
      FROM c3)
    SELECT doc_id, url AS url_raw,
           scheme || '://' || host || path ||
           CASE WHEN cleaned = '' THEN ''
                ELSE '?' ||
                  array_to_string(list_sort(str_split(cleaned, '&')), '&')
           END AS url_canonical,
           -- deny-lists key on the host, never host:port
           regexp_extract(host, '^([^:]*)', 1) AS host,
           (regexp_extract(host, '^([^:]*)', 1) LIKE '%1.com'
            OR regexp_extract(host, '^([^:]*)', 1) LIKE '%3.com') AS blocked
    FROM c4
    """,
)
def curation_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize deterministically-messy URLs (mixed case, default
    and non-default ports, tracking params, fragments, empty paths)
    and mark deny-listed hosts via the broadcast blocklist probe.

    Scale shape: ``canonical_url`` is a zero-shuffle per-row map in
    the scan stage; the blocklist is a dimension table joined with an
    explicit ``broadcast()`` so the corpus side never moves. See
    ``operators/curate.py:canonical_url`` for the RE2-safe regex
    discipline that keeps the oracle exact."""
    d = load(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 3 == 0, "HTTPS").otherwise("http"),
        F.lit("://WWW.Site"),
        (i % 5).cast("string"),
        F.lit(".COM"),
        F.when(
            i % 4 == 0, F.when(i % 3 == 0, ":443").otherwise(":80")
        ).when(i % 4 == 1, F.lit(":8080")).otherwise(""),
        F.when(i % 6 == 0, "").otherwise(
            F.concat(F.lit("/"), F.col("source"), F.lit("/item"))
        ),
        F.when(i % 2 == 0, "?b=2&utm_source=news&a=1&fbclid=abc")
        .when(i % 5 == 2, F.lit("?utm_medium=m"))
        .otherwise(""),
        F.when(i % 2 == 1, "#frag").otherwise(""),
    )
    # Generate barriers (diagram.py idiom): CollapseProject would
    # otherwise re-inline the whole regex cascade into every consumer
    # (host, blocklist key, output), exploding generated code past the
    # JIT's 64 KB method limit and evaluating it 4x per row
    with_url = d.select(
        "doc_id", F.explode(F.array(url)).alias("url_raw")
    )
    canon = with_url.select(
        "doc_id",
        "url_raw",
        F.explode(
            F.array(curate.canonical_url(F.col("url_raw")))
        ).alias("url_canonical"),
    ).withColumn("host", curate.url_host(F.col("url_canonical")))
    blocked_hosts = (
        canon.select(F.col("host"))
        .filter(F.col("host").endswith("1.com") | F.col("host").endswith("3.com"))
        .distinct()
    )
    return curate.blocklist_filter(canon, "url_canonical", blocked_hosts)


@register(
    "curation_frontier_interleave",
    survey_ref=(
        "[EXT] politeness-aware frontier schedule: per-host rank window "
        "+ broadcast host-index dim, arithmetic round-robin total order "
        "with NO corpus-wide window (operators/curate.py:"
        "frontier_interleave)"
    ),
    oracle="""
    WITH src AS (
      SELECT doc_id, 'h' || CAST(doc_id % 7 AS VARCHAR) AS host, n_chars
      FROM documents),
    rk AS (
      SELECT doc_id, host,
             CAST(row_number() OVER (
               PARTITION BY host ORDER BY n_chars DESC, doc_id) AS INT)
               AS rank_in_host
      FROM src),
    hx AS (
      SELECT host, CAST(row_number() OVER (ORDER BY host) AS INT) AS hidx
      FROM (SELECT DISTINCT host FROM src))
    SELECT r.doc_id, r.host, r.rank_in_host,
           CAST((r.rank_in_host - 1) * (SELECT count(*) FROM hx) + h.hidx
                AS BIGINT) AS fetch_pos
    FROM rk r JOIN hx h USING (host)
    """,
)
def curation_frontier_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin fetch schedule over 7 synthetic hosts, longest docs
    first within each host. ``fetch_pos`` is a deterministic total
    order with holes — see the operator docstring for why a dense
    global position is deliberately NOT computed."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias(
            "host"
        ),
        "n_chars",
    )
    out = curate.frontier_interleave(d, "host", "n_chars", "doc_id")
    return out.select(
        "doc_id",
        "host",
        F.col("rank_in_host").cast("int"),
        F.col("fetch_pos").cast("long"),
    )


@register(
    "curation_snapshot_diff",
    survey_ref=(
        "[EXT] corpus snapshot diff: crawl N vs crawl N+1 by content "
        "hash — added/removed/changed/unchanged verdicts; both sides "
        "prune to (key, sha256) at the scan before the full-outer "
        "hash join"
    ),
    oracle="""
    WITH old AS (
      SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 10 <> 3),
    new AS (
      SELECT doc_id,
             sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                         ELSE text END) AS h
      FROM documents WHERE doc_id % 10 <> 6)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.h <> n.h THEN 'changed'
                ELSE 'unchanged' END AS change
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
)
def curation_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two deterministic snapshots of the corpus (10% removed, 10%
    added, 20% edited). Scale shape: each side reduces to (doc_id,
    sha2-256) in its scan stage — 40 bytes/row into the only shuffle
    (the full-outer join, hash-partitioned on doc_id at 100 TB); text
    never moves."""
    from shippai_knowledge_etl_spark.operators.dedup import content_hash

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 3).select(
        "doc_id", content_hash(F.col("text")).alias("h")
    )
    new = docs.filter(F.col("doc_id") % 10 != 6).select(
        "doc_id",
        content_hash(
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("h"),
    )
    o, n = old.alias("o"), new.alias("n")
    return o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer").select(
        F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )


@register(
    "ext_compression_ratio",
    survey_ref=(
        "[EXT] zlib compression-ratio quality signal (Gopher family): "
        "Arrow mapInPandas + stdlib zlib — deterministic RFC 1950 "
        "output length, but no SQL zlib exists -> rows-only gate; "
        "discrimination pytest-pinned (tests/test_curate.py)"
    ),
)
def ext_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document compression ratio over the documents corpus. Low
    ratio = templated/repetitive, near-1 = non-text noise; the quality
    gate thresholds both tails."""
    d = load(spark, sf_dir, "documents")
    return curate.compression_ratio(d, "doc_id", "text")


@register(
    "curation_cluster_balance",
    survey_ref="[EXT] cluster-balanced sampling (composition): in-engine "
    "k-means buckets × exact-k stratified draw — the topic-debiasing "
    "sampler (cap dominant semantic clusters the way domain_cap caps "
    "dominant hosts). k-means FP is engine-specific → rows-only; "
    "balance/determinism invariants pytest-pinned in tests/test_curate.py",
)
def curation_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 20 vectors per learned semantic cluster, drawn by the
    reproducible md5 rank. Scale shape: clustering = broadcast-argmin
    assignment (corpus never shuffles for it); the draw's window is
    cluster-partitioned, never global; output carries cluster sizes so
    the cap's effect is auditable."""
    from shippai_knowledge_etl_spark.operators import curate, simsearch

    e = load(spark, sf_dir, "embeddings")
    assigned, _centroids = simsearch.kmeans_fit(e, k=8, n_iter=3)
    sampled = curate.stratified_sample(
        assigned.select("vec_id", "cluster"), "cluster", 20, "vec_id"
    )
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sampled.join(F.broadcast(sizes), "cluster")
        .select("cluster", "cluster_size", "vec_id")
        .orderBy("cluster", "vec_id")
    )


@register(
    "curation_main_content",
    survey_ref="[EXT] main-content extraction (boilerplate removal, "
    "jusText/Boilerpipe heuristics): block-segmentation parse edge → "
    "link-density + length classification with neighbor smoothing → "
    "order-safe page reassembly; oracle restates the expected "
    "classification of the generated pages relationally (the "
    "s1_html_parse pattern)",
    oracle="""
    WITH gen AS (
      SELECT o_orderkey AS case_key,
             printf('Priority %s reported with eleven steady words '
                    'inside the article body', o_orderpriority) AS p1,
             printf('Figure %d', o_orderkey % 7) AS p2,
             printf('Status %s closes the case with ten more words '
                    'appended here', o_orderstatus) AS p3
      FROM orders WHERE o_orderkey % 10 = 0)
    SELECT case_key,
           CAST(5 AS BIGINT) AS n_blocks,
           CAST(3 AS BIGINT) AS n_content_blocks,
           printf('%s %s %s', p1, p2, p3) AS main_text
    FROM gen
    """,
)
def curation_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order, generate a page with nav + three article blocks +
    footer; the classifier must drop both link rails, keep the two
    long paragraphs, and keep the short 'Figure N' caption via
    neighbor smoothing."""
    from shippai_knowledge_etl_spark.operators.curate import main_content
    from shippai_knowledge_etl_spark.sources.html_parse import page_blocks

    o = scale_out(load(spark, sf_dir, "orders")).filter(
        F.col("o_orderkey") % 10 == 0
    )
    page = F.format_string(
        '<div><a href="#">Home</a> <a href="#">About</a> '
        '<a href="#">Cases</a></div>'
        "<p>Priority %s reported with eleven steady words inside the "
        "article body</p>"
        "<p>Figure %d</p>"
        "<p>Status %s closes the case with ten more words appended here</p>"
        '<footer><a href="#">Terms</a> <a href="#">Privacy</a></footer>',
        F.col("o_orderpriority"),
        (F.col("o_orderkey") % 7).cast("int"),
        F.col("o_orderstatus"),
    )
    pages = o.select(
        F.col("o_orderkey").alias("case_key"), page_blocks(page).alias("blocks")
    )
    return main_content(pages, "case_key", "blocks")


@register(
    "curation_length_batches",
    survey_ref="[EXT] length-bucketed inference batching: similar-length "
    "docs batched together (bucket = exact floor(log2(tokens)) via "
    "binary-string length), per-batch padding overhead reported — the "
    "pre-inference step that stops a 10-token doc padding to a "
    "4096-token neighbor; bucket-partitioned window, exact ints",
    oracle=f"""
    WITH toks AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents),
    nz AS (SELECT doc_id, n_tokens FROM toks WHERE n_tokens > 0),
    b AS (SELECT doc_id, n_tokens,
                 CAST(length(to_base(n_tokens, 2)) - 1 AS INT) AS bucket
          FROM nz),
    r AS (SELECT *, row_number() OVER (PARTITION BY bucket
                    ORDER BY n_tokens, doc_id) AS rn FROM b),
    g AS (SELECT bucket, CAST((rn - 1) // 16 AS INT) AS batch_idx,
                 n_tokens FROM r)
    SELECT bucket, batch_idx,
           count(*) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           round((max(n_tokens) * count(*) - sum(n_tokens))
             / CAST(max(n_tokens) * count(*) AS DOUBLE), 6) AS padding_frac
    FROM g GROUP BY bucket, batch_idx
    """,
)
def curation_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return curate.length_batches(d, "doc_id", "text", 16)


@register(
    "curation_quality_outliers",
    survey_ref="[EXT] robust outlier screen: per-source median/MAD of "
    "doc length, rows beyond 3 MADs flagged — the length-anomaly check "
    "that mean/stddev can't do (outliers poison the mean); two exact "
    "group-keyed percentile passes, tiny stat tables broadcast back",
    oracle="""
    WITH base AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS v
                  FROM documents),
    med AS (SELECT source, median(v) AS med FROM base GROUP BY source),
    j1 AS (SELECT b.doc_id, b.source, b.v, m.med
           FROM base b JOIN med m USING (source)),
    mad AS (SELECT source, median(abs(v - med)) AS mad
            FROM j1 GROUP BY source)
    SELECT j1.doc_id, j1.source, j1.v AS value, j1.med, m2.mad,
           CAST(CASE WHEN abs(j1.v - j1.med) > 3.0 * m2.mad
                THEN 1 ELSE 0 END AS INT) AS is_outlier
    FROM j1 JOIN mad m2 USING (source)
    """,
)
def curation_quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    out = curate.robust_outliers(d, "doc_id", "n_chars", "source")
    return out.withColumn("is_outlier", F.col("is_outlier").cast("int"))


@register(
    "curation_mixture_kl",
    survey_ref="[EXT] data-mixture diagnostics: per-source share, "
    "entropy contribution, and KL(actual ‖ uniform-target) term — the "
    "numbers a pretraining run monitors to keep its domain mixture on "
    "target (Gopher/The Pile report exactly these tables); one "
    "count aggregate over the corpus, everything else is per-group "
    "scalar math",
    oracle="""
    WITH tot AS (SELECT count(*) AS n,
                        count(DISTINCT source) AS k FROM documents)
    SELECT source,
           count(*) AS n_docs,
           round(count(*) / CAST(t.n AS DOUBLE), 6) AS share,
           round(-(count(*) / CAST(t.n AS DOUBLE))
                 * ln(count(*) / CAST(t.n AS DOUBLE)), 6) AS entropy_term,
           round((count(*) / CAST(t.n AS DOUBLE))
                 * ln((count(*) / CAST(t.n AS DOUBLE)) * t.k), 6) AS kl_term
    FROM documents CROSS JOIN tot t
    GROUP BY source, t.n, t.k
    """,
)
def curation_mixture_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-balance report per source: share of the corpus, Shannon
    entropy contribution -p·ln(p), and the per-source KL term
    p·ln(p/q) against the uniform target q = 1/k (positive = source
    over-represented). Scale shape: one count aggregate with map-side
    partials on a low-cardinality key; corpus totals ride a broadcast
    1-row cross join, never a second scan per group. Expression
    operand order mirrors the oracle token for token so the 6-dp
    round is exact."""
    d = load(spark, sf_dir, "documents")
    tot = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("source").alias("k"),
    )
    p = F.count(F.lit(1)) / F.col("n").cast("double")
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("source", "n", "k")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(p, 6).alias("share"),
            F.round(-p * F.log(p), 6).alias("entropy_term"),
            F.round(p * F.log(p * F.col("k")), 6).alias("kl_term"),
        )
        .drop("n", "k")
    )


@register(
    "curation_temperature_mix",
    survey_ref="[EXT] temperature-scaled mixture weights (the mT5/XLM-R "
    "alpha-sampling recipe): per-source sampling probability "
    "p_i^alpha / sum_j p_j^alpha at alpha = 0.5 — sqrt is IEEE-exactly "
    "rounded in BOTH engines (pow is not), and the cross-source "
    "normalizer sums 6 dp-rounded terms as DECIMAL, so the whole "
    "reweighting is engine-exact; two 1-row broadcasts, zero "
    "corpus-wide shuffles beyond the count",
    oracle="""
    WITH s AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT sum(n_docs) AS n FROM s),
    sp AS (
      SELECT source, n_docs, t.n,
             round(sqrt(n_docs / CAST(t.n AS DOUBLE)), 6) AS sqrt_share
      FROM s CROSS JOIN tot t),
    den AS (SELECT sum(CAST(sqrt_share AS DECIMAL(18,6))) AS d6 FROM sp)
    SELECT source, n_docs,
           round(n_docs / CAST(n AS DOUBLE), 6) AS share,
           sqrt_share,
           round(sqrt_share / CAST(d.d6 AS DOUBLE), 6) AS sampled_share,
           round(round(sqrt_share / CAST(d.d6 AS DOUBLE), 6)
                 / round(n_docs / CAST(n AS DOUBLE), 6), 6) AS boost
    FROM sp CROSS JOIN den d
    """,
)
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature-scaled sampling weights: raising each
    source share p_i to alpha < 1 and renormalizing flattens the
    mixture toward uniform (low-resource sources are up-sampled — the
    multilingual-pretraining standard; boost > 1 marks up-sampled
    sources). alpha is PINNED at 0.5 because sqrt is correctly rounded
    under IEEE 754 in both engines while a general pow differs in the
    last ulp; the normalizer sums 6 dp-rounded sqrt-shares as
    DECIMAL(18,6) (exact, order-independent across the handful of
    sources). Scale shape: one map-side-combined count on a
    low-cardinality key, then two 1-row broadcast cross joins (corpus
    total, normalizer) — the corpus is scanned once."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = s.agg(F.sum("n_docs").alias("n"))
    sp = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n",
        F.round(
            F.sqrt(F.col("n_docs") / F.col("n").cast("double")), 6
        ).alias("sqrt_share"),
    )
    den = sp.agg(
        F.sum(F.col("sqrt_share").cast("decimal(18,6)")).alias("d6")
    )
    share = F.round(F.col("n_docs") / F.col("n").cast("double"), 6)
    sampled = F.round(
        F.col("sqrt_share") / F.col("d6").cast("double"), 6
    )
    return sp.crossJoin(F.broadcast(den)).select(
        "source",
        "n_docs",
        share.alias("share"),
        "sqrt_share",
        sampled.alias("sampled_share"),
        F.round(sampled / share, 6).alias("boost"),
    )


@register(
    "curation_quality_classifier",
    survey_ref="[EXT] fastText-recipe quality classifier (Joulin et "
    "al. 2017; the GPT-3/LLaMA curation-filter pattern): logistic "
    "regression over the shared 256-bucket hashed-gram feature space, "
    "trained by full-batch gradient descent INSIDE the engine — "
    "iterative, not SQL-expressible → rows-only; separability, "
    "loss-descent, and repeat-identity pinned in tests/test_curate.py",
)
def curation_quality_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train 3 GD iterations against a deterministic seed labelling
    (docs whose token stream contains 'the' — the reference-corpus
    membership stand-in), score the corpus with the learned weights,
    and report the per-source confusion counts plus accuracy.

    Everything after the seed label is learned: the classifier must
    discover which hash buckets carry the label signal. Counts are
    exact integers and the trained weights are a pure function of the
    corpus (DECIMAL-summed terms, driver-quantized weights), so the
    output is deterministic at any parallelism even though the gate
    records rows-only. Scale shape in
    ``operators/curate.py:logreg_quality_train``: one persisted gram
    pass, per-iteration one aggregate + one join, 256-row collects."""
    d = load(spark, sf_dir, "documents")
    label = F.array_contains(tokenize(F.col("text")), "the")
    weights, _ = curate.logreg_quality_train(
        d, label, "doc_id", "text", n_iters=3, lr=50.0
    )
    scored = curate.logreg_quality_score(d, weights, "doc_id", "text")
    truth = d.select("doc_id", "source", label.alias("y"))
    j = truth.join(scored, "doc_id")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("y")).alias("n_true_good"),
        F.count_if(F.col("y") & F.col("is_good")).alias("tp"),
        F.count_if(~F.col("y") & F.col("is_good")).alias("fp"),
        F.count_if(F.col("y") & ~F.col("is_good")).alias("fn"),
        F.count_if(~F.col("y") & ~F.col("is_good")).alias("tn"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_true_good",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            (F.col("tp") + F.col("tn")) / F.col("n_docs").cast("double"), 6
        ).alias("accuracy"),
    )


@register(
    "curation_source_overlap",
    survey_ref=(
        "[EXT] cross-source contamination matrix: distinct shared "
        "word 3-grams per source pair + overlap/Jaccard — the "
        "corpus-level audit complement of curation_decontaminate "
        "(mirror sites / syndicated feeds double-count mixture "
        "weights) (operators/curate.py:source_overlap_matrix)"
    ),
    oracle=f"""
    WITH base AS (SELECT source, {_TOKS} AS toks FROM documents),
    sh AS (
      SELECT DISTINCT src, shingle FROM (
        SELECT source AS src, unnest(
          CASE WHEN len(toks) >= 3 THEN
            list_transform(range(0, len(toks) - 2),
              i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
          ELSE [array_to_string(toks, ' ')] END) AS shingle
        FROM base)),
    vocab AS (SELECT src, count(*) AS nv FROM sh GROUP BY src),
    shared AS (
      SELECT a.src AS source_a, b.src AS source_b, count(*) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.src < b.src
      GROUP BY a.src, b.src)
    SELECT s.source_a, s.source_b,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(va.nv AS BIGINT) AS n_a,
           CAST(vb.nv AS BIGINT) AS n_b,
           round(CAST(s.n_shared AS DOUBLE) / least(va.nv, vb.nv), 6)
             AS overlap,
           round(CAST(s.n_shared AS DOUBLE)
                 / (va.nv + vb.nv - s.n_shared), 6) AS jaccard
    FROM shared s
    JOIN vocab va ON va.src = s.source_a
    JOIN vocab vb ON vb.src = s.source_b
    """,
)
def curation_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-3-gram overlap between every source pair: which
    "independent" corpus slices actually copy each other. One shingle
    pass collapses the corpus to per-source vocabularies BEFORE any
    pair exists; the cross-source join fans out per shingle by at
    most |sources|; output is |sources|^2-bounded. Exact integer
    counts, two rounded divisions at the gate."""
    d = load(spark, sf_dir, "documents")
    return curate.source_overlap_matrix(d, "text", "source", n=3)


# ---------------------------------------------------------------------------
# Gopher document-level quality rules
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("and", "be", "have", "of", "that", "the", "to", "with")

_GOPHER_PLANT_SQL = """gplant AS (
  SELECT doc_id, concat_ws(chr(10),
    text,
    CASE WHEN doc_id % 3 = 0 THEN '- bullet item one' END,
    CASE WHEN doc_id % 5 = 0 THEN 'to be continued...' END,
    CASE WHEN doc_id % 7 = 0 THEN '12345 67890 42' END,
    CASE WHEN doc_id % 11 = 0 THEN '# heading marker' END
  ) AS page FROM documents
)"""


@register(
    "curation_gopher_rules",
    survey_ref=(
        "[EXT] Gopher document-level quality rules (Rae et al. 2021 "
        "table A1): word-count bounds, mean-word-length band, "
        "symbol-to-word ratio, digit-only-word share, bullet/ellipsis "
        "line ratios, minimum distinct stop words — all as integer "
        "cross-multiplications, zero-shuffle scan-side map"
    ),
    oracle="WITH "
    + _GOPHER_PLANT_SQL
    + """,
    feat AS (
      SELECT doc_id, page,
        list_filter(str_split(trim(regexp_replace(lower(page),
          '[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> '') AS toks
      FROM gplant
    ),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(length(array_to_string(toks, '')) AS BIGINT) AS n_word_chars,
        CAST(len(regexp_extract_all(array_to_string(toks, chr(10)),
          '(?m)^\\p{Nd}+$')) AS BIGINT) AS n_digit_words,
        CAST(length(page) - length(replace(page, '#', ''))
          + (length(page) - length(replace(page, '...', ''))) // 3
          AS BIGINT) AS n_symbols,
        CAST(len(str_split(page, chr(10))) AS BIGINT) AS n_lines,
        CAST(len(regexp_extract_all(page, '(?m)^[-*•]')) AS BIGINT)
          AS n_bullet_lines,
        CAST(len(regexp_extract_all(page, '(?m)\\.\\.\\.$')) AS BIGINT)
          AS n_ellipsis_lines,
        CAST(list_contains(toks, 'and') AS BIGINT)
          + CAST(list_contains(toks, 'be') AS BIGINT)
          + CAST(list_contains(toks, 'have') AS BIGINT)
          + CAST(list_contains(toks, 'of') AS BIGINT)
          + CAST(list_contains(toks, 'that') AS BIGINT)
          + CAST(list_contains(toks, 'the') AS BIGINT)
          + CAST(list_contains(toks, 'to') AS BIGINT)
          + CAST(list_contains(toks, 'with') AS BIGINT) AS n_stop_kinds
      FROM feat
    )
    SELECT doc_id, n_words, n_word_chars, n_digit_words, n_symbols,
           n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_kinds,
           (n_words BETWEEN 50 AND 100000
            AND 3 * n_words <= n_word_chars
            AND n_word_chars <= 10 * n_words
            AND 10 * n_symbols <= n_words
            AND 5 * n_digit_words <= n_words
            AND 10 * n_bullet_lines <= 9 * n_lines
            AND 10 * n_ellipsis_lines <= 3 * n_lines
            AND n_stop_kinds >= 2) AS keep
    FROM m
    """,
)
def curation_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's document-level quality gate (Rae et al. 2021, table A1)
    over planted web-page-shaped documents: word-count bounds [50,
    100k], mean word length in [3, 10], symbol-to-word ratio ≤ 0.1
    ('#' chars + '...' runs), ≥ 80 % of words alphabetic (⟺ digit-only
    words ≤ 20 %), bullet-started lines ≤ 90 %, ellipsis-ended lines
    ≤ 30 %, and ≥ 2 distinct required stop words. The plant injects
    bullet / ellipsis / digit-run / '#' lines on deterministic doc_id
    residues so the driver run exercises every rule branch; the base
    corpus's 10–99-word spread makes the word-count bound split too.

    Scale shape: a pure per-row map riding the scan — zero shuffles,
    no Python, no lambda HOFs (digit-only words are counted with one
    multiline regexp_count over the newline-joined token array; word
    chars via length(array_join(toks, ''))). Every ratio threshold is
    an integer cross-multiplication, so the keep verdict is
    bit-identical across engines and partitionings — no FP boundary
    row can flip. At 100 TB this is the same shape as c4_rules: the
    filter a crawl pass runs before anything shuffles."""
    d = scale_out(load(spark, sf_dir, "documents"))
    page = F.concat_ws(
        "\n",
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("- bullet item one")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("to be continued...")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("12345 67890 42")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("# heading marker")),
    )
    planted = d.select("doc_id", page.alias("page"))
    # Single tokenize evaluation pinned behind a Generate barrier (the
    # curation-pipeline idiom: CollapseProject would otherwise inline
    # the regex+split into every derived column).
    toks = planted.select(
        "doc_id", "page", F.explode(F.array(tokenize(F.col("page")))).alias("toks")
    )
    n_words = F.size("toks").cast("long")
    m = toks.select(
        "doc_id",
        n_words.alias("n_words"),
        F.length(F.array_join("toks", "")).cast("long").alias("n_word_chars"),
        F.regexp_count(
            F.array_join("toks", "\n"), F.lit(r"(?m)^\p{Nd}+$")
        ).cast("long").alias("n_digit_words"),
        # Integer `div` mirrors the oracle's `//` STRUCTURALLY (ADVICE
        # r7: the old double-division-then-cast matched only because
        # '...' replace deltas are always multiples of 3).
        F.expr(
            "CAST(length(page) - length(replace(page, '#', '')) AS BIGINT)"
            " + CAST(length(page) - length(replace(page, '...', ''))"
            " AS BIGINT) div 3"
        ).cast("long").alias("n_symbols"),
        F.size(F.split("page", "\n", -1)).cast("long").alias("n_lines"),
        F.regexp_count(F.col("page"), F.lit("(?m)^[-*•]"))
        .cast("long")
        .alias("n_bullet_lines"),
        F.regexp_count(F.col("page"), F.lit(r"(?m)\.\.\.$"))
        .cast("long")
        .alias("n_ellipsis_lines"),
        sum(
            F.array_contains("toks", w).cast("long") for w in _GOPHER_STOPS
        ).alias("n_stop_kinds"),
    )
    return m.withColumn(
        "keep",
        F.col("n_words").between(50, 100000)
        & (3 * F.col("n_words") <= F.col("n_word_chars"))
        & (F.col("n_word_chars") <= 10 * F.col("n_words"))
        & (10 * F.col("n_symbols") <= F.col("n_words"))
        & (5 * F.col("n_digit_words") <= F.col("n_words"))
        & (10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines"))
        & (10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines"))
        & (F.col("n_stop_kinds") >= 2),
    )


# ---------------------------------------------------------------------------
# Token-budget waterfill allocation
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 26_000  # ~93% of the sf0.001/sf0.01 corpus: mixed caps


@register(
    "curation_token_budget",
    survey_ref=(
        "[EXT] token-budget waterfill allocation: spend a global "
        "training-token budget across sources by capping the largest "
        "(max-min fairness / progressive filling) — the data-mix "
        "allocator between proportional sampling (mix_sample) and "
        "temperature reweighting; exact integer waterfill over the "
        "|sources|-row rollup"
    ),
    oracle=f"""
    WITH t AS (
      SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    s AS (
      SELECT source, n_tokens,
             row_number() OVER (ORDER BY n_tokens, source) AS k,
             sum(n_tokens) OVER (ORDER BY n_tokens, source
                                 ROWS UNBOUNDED PRECEDING) AS pk,
             count(*) OVER () AS m,
             sum(n_tokens) OVER () AS total
      FROM t),
    feas AS (
      SELECT max(CASE WHEN pk + (m - k) * n_tokens <= {_BUDGET_TOKENS}
                 THEN k ELSE 0 END) AS ks
      FROM s),
    cap AS (
      SELECT CASE WHEN (SELECT max(total) FROM s) <= {_BUDGET_TOKENS}
                  THEN NULL
                  WHEN f.ks = 0 THEN {_BUDGET_TOKENS}
                       // (SELECT max(m) FROM s)
                  ELSE ({_BUDGET_TOKENS} - (SELECT pk FROM s
                                            WHERE k = f.ks))
                       // ((SELECT max(m) FROM s) - f.ks) END AS c
      FROM feas f)
    SELECT s.source,
           s.n_tokens,
           CAST(CASE WHEN cap.c IS NULL THEN s.n_tokens
                     ELSE least(s.n_tokens, cap.c) END AS BIGINT)
             AS alloc_tokens,
           (cap.c IS NOT NULL AND s.n_tokens > cap.c) AS capped,
           CAST(cap.c AS BIGINT) AS cap
    FROM s, cap
    """,
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate a global token budget across sources waterfill-style:
    every source keeps its tokens up to a common cap, the cap chosen
    so allocations sum to (just under) the budget — max-min fairness,
    the allocator that caps hot sources without starving small ones
    (the knob BETWEEN proportional mix_sample and temperature
    reweighting). Exact integer search: sort sources ascending, the
    largest k where prefix_k + (m−k)·t_k still fits determines the
    cap segment, cap = (B − prefix_k) // (m−k); the ≤(m−k)-token
    floor remainder is reported via the cap column, never silently
    spent. Uncapped corpora (total ≤ budget) return cap NULL with
    full allocations — visible, not fabricated.

    Scale shape: one per-source rollup cuts the corpus to |sources|
    rows; ranking, prefix sums, feasibility max, and the cap formula
    all run on that bounded table (allowlisted global-window class);
    allocations join the 1-row cap back (allowlisted broadcast)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).cast("long").alias("n_tokens")
    )
    wo = Window.orderBy("n_tokens", "source")
    wall = Window.partitionBy()
    s = t.select(
        "source",
        "n_tokens",
        F.row_number().over(wo).alias("k"),
        F.sum("n_tokens")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pk"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.sum("n_tokens").over(wall).alias("total"),
    )
    b = F.lit(_BUDGET_TOKENS)
    feas = s.agg(
        F.max(
            F.when(
                F.col("pk") + (F.col("m") - F.col("k")) * F.col("n_tokens")
                <= b,
                F.col("k"),
            ).otherwise(0)
        ).alias("ks"),
        F.max("m").alias("m"),
        F.max("total").alias("total"),
    )
    pk_at_ks = s.join(
        feas.select(F.col("ks").alias("k")), "k"
    ).select(F.col("pk").alias("pks"))
    cap = (
        feas.crossJoin(
            F.broadcast(
                pk_at_ks.agg(F.max("pks").alias("pks"))
            )
        )
        .select(
            # Integer `div` mirrors the oracle's `//` at ANY magnitude
            # (ADVICE r7: truncate-after-double-division can round up
            # across an integer boundary once operands outgrow the
            # 2^53 double mantissa — the 'exact integer waterfill'
            # contract is now structural, not budget-size luck).
            F.when(F.col("total") <= b, F.lit(None).cast("long"))
            .when(
                F.col("ks") == 0,
                F.expr(f"{_BUDGET_TOKENS}L div m").cast("long"),
            )
            .otherwise(
                F.expr(
                    f"({_BUDGET_TOKENS}L - pks) div (m - ks)"
                ).cast("long")
            )
            .alias("c")
        )
    )
    return s.crossJoin(F.broadcast(cap)).select(
        "source",
        "n_tokens",
        F.when(F.col("c").isNull(), F.col("n_tokens"))
        .otherwise(F.least(F.col("n_tokens"), F.col("c")))
        .cast("long")
        .alias("alloc_tokens"),
        (F.col("c").isNotNull() & (F.col("n_tokens") > F.col("c"))).alias(
            "capped"
        ),
        F.col("c").cast("long").alias("cap"),
    )


# ---------------------------------------------------------------------------
# Code-switching (mixed-language document) detection
# ---------------------------------------------------------------------------

_CS_MIN_HITS = 2  # a language "is present" at >= 2 marker hits


@register(
    "curation_code_switching",
    survey_ref=(
        "[EXT] code-switching detection: how many LANGUAGES are "
        "present in each doc (≥2 marker hits each) — mixed-language "
        "documents degrade monolingual training slices and LID-routed "
        "pipelines silently mislabel them; zero-shuffle scan-side map "
        "over the langid marker sets"
    ),
    oracle=f"""
    WITH planted_cs AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 25 = 0
                  THEN text || ' der die und das nicht der die'
                  ELSE text END AS text
      FROM documents),
    t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM planted_cs),
    h AS (
      SELECT doc_id, lang,
        {", ".join(
            "len(list_filter(toks, x -> x IN ("
            + ", ".join("'" + w + "'" for w in words)
            + f"))) AS h_{lang}"
            for lang, words in sorted(
                __import__("shippai_knowledge_etl_spark.operators.textops",
                           fromlist=["LANG_MARKERS"]).LANG_MARKERS.items()
            )
        )}
      FROM t)
    SELECT doc_id, lang AS labeled_lang,
           CAST(h_de AS BIGINT) AS h_de,
           CAST(h_en AS BIGINT) AS h_en,
           CAST(h_es AS BIGINT) AS h_es,
           CAST(h_fr AS BIGINT) AS h_fr,
           CAST(h_zh AS BIGINT) AS h_zh,
           CAST((h_de >= {_CS_MIN_HITS})::INT + (h_en >= {_CS_MIN_HITS})::INT
              + (h_es >= {_CS_MIN_HITS})::INT + (h_fr >= {_CS_MIN_HITS})::INT
              + (h_zh >= {_CS_MIN_HITS})::INT AS INT) AS n_langs_present,
           (h_de >= {_CS_MIN_HITS})::INT + (h_en >= {_CS_MIN_HITS})::INT
              + (h_es >= {_CS_MIN_HITS})::INT + (h_fr >= {_CS_MIN_HITS})::INT
              + (h_zh >= {_CS_MIN_HITS})::INT >= 2 AS is_code_switched
    FROM h
    """,
)
def curation_code_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-mixture profile: marker hits for EVERY
    language (not just the argmax langid reports), a language counts
    as present at ≥2 hits, and a doc with ≥2 present languages is
    code-switched — the docs a monolingual training slice must drop
    and an argmax LID silently mislabels (its label is still reported
    alongside for the contrast).

    Scale shape: a pure per-row map over one tokenize evaluation —
    marker hits via the lambda-free array_remove counting idiom (the
    ext_score_lift trick), zero shuffles, whole-stage codegen.
    Integer hits and integer threshold compares only."""
    from shippai_knowledge_etl_spark.operators.textops import LANG_MARKERS
    from shippai_knowledge_etl_spark.tables import scale_out

    # scale_out: 25 marker-hit array passes per row on a single-split
    # local scan ran on 1 of 32 cores (round 13; no-op on real layouts)
    d = scale_out(load(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 25 == 0,
            F.concat(F.col("text"), F.lit(" der die und das nicht der die")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    toks = tokenize(F.col("text"))
    base = d.select("doc_id", F.col("lang").alias("labeled_lang"),
                    toks.alias("toks"))
    hit_cols = {
        lang: sum(
            (F.size("toks") - F.size(F.array_remove(F.col("toks"), w)))
            for w in words
        ).cast("long")
        for lang, words in sorted(LANG_MARKERS.items())
    }
    h = base.select(
        "doc_id",
        "labeled_lang",
        *[c.alias(f"h_{lang}") for lang, c in hit_cols.items()],
    )
    present = [
        (F.col(f"h_{lang}") >= _CS_MIN_HITS).cast("int")
        for lang in sorted(LANG_MARKERS)
    ]
    n_present = sum(present)
    return h.select(
        "doc_id",
        "labeled_lang",
        *[f"h_{lang}" for lang in sorted(LANG_MARKERS)],
        n_present.cast("int").alias("n_langs_present"),
        (n_present >= 2).alias("is_code_switched"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split
# ---------------------------------------------------------------------------


@register(
    "curation_leakage_safe_split",
    survey_ref=(
        "[EXT] leakage-safe train/val/test split: hash the CONTENT, "
        "not the row id — id-hash splits scatter duplicate docs "
        "across train and test (silent eval contamination), "
        "content-hash splits keep every duplicate group in one split "
        "BY CONSTRUCTION; both strategies run side by side and the "
        "leaky-group counts are the lesson"
    ),
    oracle=f"""
    WITH {_PLANTED_SQL},
    s AS (
      SELECT doc_id, text,
             CAST('0x' || substring(md5(text), 1, 4) AS INT) % 10
               AS sc,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
               AS INT) % 10 AS si
      FROM planted),
    bd AS (
      SELECT 'content_hash' AS strategy, text, sc AS split FROM s
      UNION ALL
      SELECT 'id_hash', text, si FROM s),
    leaks AS (
      SELECT strategy, text, count(DISTINCT split) AS n_splits
      FROM bd GROUP BY strategy, text)
    SELECT b.strategy,
           CAST(sum(CASE WHEN b.split <= 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(sum(CASE WHEN b.split = 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_val,
           CAST(sum(CASE WHEN b.split = 9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_test,
           CAST(count(DISTINCT b.text) AS BIGINT) AS n_groups,
           CAST((SELECT count(*) FROM leaks l
                 WHERE l.strategy = b.strategy AND l.n_splits > 1)
             AS BIGINT) AS n_leaky_groups
    FROM bd b GROUP BY b.strategy
    """,
)
def curation_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split of the planted-duplicate corpus,
    computed two ways side by side: hashing the row id scatters the
    planted duplicate pairs across splits (n_leaky_groups > 0 — the
    doc in train and its copy in test is SILENT eval contamination),
    hashing the CONTENT cannot (same text ⇒ same hash ⇒ same split;
    n_leaky_groups = 0 by construction). The two-row output IS the
    argument for content-keyed splitting; in production the key
    generalizes to the dedup canonical id so near-dups split
    together too.

    Scale shape: one md5 per row per strategy (scan-side map), split
    counters partial-aggregate map-side; the leak check groups by
    content — the exact-dedup shuffle class. All integers."""
    d = documents_with_planted_dups(spark, sf_dir)
    sc = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10).cast("int")
        % 10
    )
    si = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("int")
        % 10
    )
    both = d.select(
        F.lit("content_hash").alias("strategy"),
        "text",
        sc.alias("split"),
    ).unionByName(
        d.select(
            F.lit("id_hash").alias("strategy"), "text", si.alias("split")
        )
    )
    leaks = (
        both.groupBy("strategy", "text")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .groupBy("strategy")
        .agg(F.count(F.lit(1)).alias("n_leaky_groups"))
    )
    stats = both.groupBy("strategy").agg(
        F.sum((F.col("split") <= 7).cast("int")).cast("long").alias("n_train"),
        F.sum((F.col("split") == 8).cast("int")).cast("long").alias("n_val"),
        F.sum((F.col("split") == 9).cast("int")).cast("long").alias("n_test"),
        F.countDistinct("text").alias("n_groups"),
    )
    return stats.join(leaks, "strategy", "left").select(
        "strategy",
        "n_train",
        "n_val",
        "n_test",
        F.col("n_groups").cast("long").alias("n_groups"),
        F.coalesce("n_leaky_groups", F.lit(0))
        .cast("long")
        .alias("n_leaky_groups"),
    )


@register(
    "curation_ngram_coverage",
    survey_ref=(
        "[EXT] train→test n-gram coverage: what fraction of the test "
        "split's distinct trigrams the train split already contains — "
        "high coverage means test metrics measure recombination, not "
        "generalization (the split-quality diagnostic beside "
        "leakage_safe_split's exact-dup check); one shingle pass + "
        "one semi-join on the gram key"
    ),
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_TOKS} AS toks,
             CAST('0x' || substring(md5(text), 1, 4) AS INT) % 10
               AS split
      FROM documents),
    g AS (
      SELECT split, unnest(list_distinct(CASE WHEN len(toks) >= 3 THEN
               list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             ELSE [array_to_string(toks, ' ')] END)) AS gram
      FROM s WHERE split <= 7 OR split = 9),
    tr AS (SELECT DISTINCT gram FROM g WHERE split <= 7),
    te AS (SELECT DISTINCT gram FROM g WHERE split = 9)
    SELECT CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_train_grams,
           CAST(count(*) AS BIGINT) AS n_test_grams,
           CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_covered,
           round(CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS coverage
    FROM te LEFT JOIN tr USING (gram)
    """,
)
def curation_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the test split's trigram vocabulary the train split
    already contains (content-hash 80/10/10 split, the
    leakage_safe_split keying): near-1.0 coverage means test scores
    measure recombination of seen phrases rather than generalization
    — the distribution-level split diagnostic after exact-dup leakage
    is ruled out.

    Scale shape: ONE tokenize+shingle evaluation over the two splits
    (the dedup shingle discipline), distinct gram sets per side, and
    a gram-keyed LEFT join of the (much smaller) test vocabulary
    against the train vocabulary — both sides vocabulary-sized, never
    corpus-sized. Exact counts, one division."""
    d = load(spark, sf_dir, "documents")
    split = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10).cast("int")
        % 10
    )
    base = scale_out(
        d.select("doc_id", "text", split.alias("split")).filter(
            (F.col("split") <= 7) | (F.col("split") == 9)
        )
    )
    from shippai_knowledge_etl_spark.operators.dedup import shingle_structs

    g = base.select(
        "split",
        F.explode(shingle_structs(F.col("text"), n=3)).alias("gram"),
    )
    tr = g.filter(F.col("split") <= 7).select("gram").distinct()
    te = g.filter(F.col("split") == 9).select("gram").distinct()
    trj = tr.select(F.col("gram").alias("gram"), F.lit(1).alias("hit"))
    n_train = tr.agg(F.count(F.lit(1)).alias("n_train_grams"))
    cov = te.join(trj, "gram", "left").agg(
        F.count(F.lit(1)).alias("n_test_grams"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)))
        .cast("long")
        .alias("n_covered"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
    )
    return cov.crossJoin(F.broadcast(n_train)).select(
        F.col("n_train_grams").cast("long").alias("n_train_grams"),
        "n_test_grams",
        "n_covered",
        "coverage",
    )


# ---------------------------------------------------------------------------
# CCNet-style line-frequency boilerplate dedup
# ---------------------------------------------------------------------------


@register(
    "curation_line_dedup",
    survey_ref=(
        "[EXT] CCNet line/paragraph-hash boilerplate dedup (Wenzek et "
        "al. 2020 §3.1): lines appearing verbatim in >5 distinct docs "
        "are dropped corpus-wide; the frequency shuffle carries md5 "
        "hashes, never line text"
    ),
    oracle=f"""
    WITH base AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    nz AS (SELECT doc_id, source, toks, len(toks) AS n FROM base
           WHERE len(toks) >= 1),
    idx AS (SELECT doc_id, toks,
                   unnest(range(0, ((n - 1) // 10) + 1)) AS i
            FROM nz),
    content AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10),
                             ' ') AS line
      FROM idx),
    boiler AS (
      SELECT doc_id, 'copyright footer ' || source AS line FROM nz
      UNION ALL
      SELECT doc_id, 'all rights reserved navigation menu' FROM nz),
    lines AS (SELECT * FROM content UNION ALL SELECT * FROM boiler),
    lh AS (SELECT doc_id, line, md5(line) AS h FROM lines),
    freq AS (SELECT h, count(DISTINCT doc_id) AS df_docs
             FROM lh GROUP BY h),
    j AS (SELECT l.doc_id, l.line, f.df_docs
          FROM lh l JOIN freq f USING (h))
    SELECT doc_id,
           count(*) AS n_lines,
           CAST(coalesce(sum(CASE WHEN df_docs <= 5 THEN 1 END), 0)
             AS BIGINT) AS n_kept,
           CAST(coalesce(sum(CASE WHEN df_docs > 5 THEN 1 END), 0)
             AS BIGINT) AS n_dropped,
           CAST(coalesce(sum(CASE WHEN df_docs <= 5
                             THEN length(line) END), 0)
             AS BIGINT) AS kept_chars
    FROM j GROUP BY doc_id
    """,
)
def curation_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-frequency boilerplate removal — the CCNet
    paragraph-dedup pass that kills nav menus / footers / cookie
    banners BEFORE any quality model sees them (they dominate naive
    quality scores). The corpus carries no newlines, so "lines" are
    deterministic 10-token chunks (curate.token_lines), plus two
    PLANTED boilerplate lines per doc: a per-source copyright footer
    (doc-frequency = |source| >> 5 → dropped) and a corpus-wide
    navigation line (dropped); organic content chunks are mostly
    unique → kept. Any organic chunk repeated across >5 docs is
    dropped too — that is the operator working, and the oracle agrees
    by construction.

    Scale shape: curate.line_frequency_filter — ONE md5(line)-keyed
    shuffle (32-char hash keys, never text) with map-side distinct
    collapse, verdict join reusing the same partitioning; per-doc
    rollup after. The exact-dedup shuffle class."""
    d = load(spark, sf_dir, "documents")
    content = curate.token_lines(d, "doc_id", "text", 10).select(
        "doc_id", "line"
    )
    nz = d.select(
        "doc_id", "source", F.size(tokenize(F.col("text"))).alias("n")
    ).filter(F.col("n") >= 1)
    boiler = nz.select(
        "doc_id",
        F.concat(F.lit("copyright footer "), F.col("source")).alias(
            "line"
        ),
    ).unionAll(
        nz.select(
            "doc_id",
            F.lit("all rights reserved navigation menu").alias("line"),
        )
    )
    lines = content.unionAll(boiler)
    verdicts = curate.line_frequency_filter(lines, "doc_id", "line", 5)
    return verdicts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
        F.sum((~F.col("kept")).cast("int")).cast("long").alias(
            "n_dropped"
        ),
        F.coalesce(
            F.sum(F.when(F.col("kept"), F.length("line"))), F.lit(0)
        )
        .cast("long")
        .alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# T5-style span corruption accounting
# ---------------------------------------------------------------------------


@register(
    "curation_span_corruption",
    survey_ref=(
        "[EXT] T5 span-corruption accounting (Raffel et al. 2020 "
        "§3.1.4): deterministic md5-drawn 3-token mask spans at 15%, "
        "exact input/target sequence-length accounting per doc"
    ),
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    nz AS (SELECT doc_id, len(toks) AS n FROM base WHERE len(toks) >= 1),
    spans AS (SELECT doc_id, n,
                     unnest(range(0, ((n - 1) // 3) + 1)) AS s
              FROM nz),
    marked AS (
      SELECT doc_id, n,
             least(3, n - s * 3) AS slen,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':sc:'
                                 || CAST(s AS VARCHAR)), 1, 4)
                       < '2666' THEN 1 ELSE 0 END AS m
      FROM spans),
    agg AS (
      SELECT doc_id, max(n) AS n_tokens, count(*) AS n_spans,
             sum(m) AS n_masked_spans,
             sum(m * slen) AS n_masked_tokens
      FROM marked GROUP BY doc_id)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_masked_spans AS BIGINT) AS n_masked_spans,
           CAST(n_masked_tokens AS BIGINT) AS n_masked_tokens,
           CAST(n_tokens - n_masked_tokens + n_masked_spans AS BIGINT)
             AS n_input_tokens,
           CAST(n_masked_tokens + n_masked_spans + 1 AS BIGINT)
             AS n_target_tokens
    FROM agg
    """,
)
def curation_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising-pretraining mask accounting: group tokens into
    3-token spans, mask each span on a deterministic 16-bit md5 draw
    at 15 % (0x2666/0x10000 — the mix_keep idiom, so the SAME doc gets
    the SAME mask on any engine/run/partitioning), and report the
    exact input/target lengths the T5 objective produces (masked span →
    one sentinel in the input; target = masked tokens + one sentinel
    each + final EOS). This is the sequence-length planning input for
    packing (curation_packing) and batch shaping — at 100 TB you size
    the packed batches from THIS profile, not by re-tokenizing.

    Scale shape: one posexplode to n/3 span rows pipelined into a
    doc-keyed rollup; no joins, no lambda HOFs, exact integers
    (curate.span_corruption_profile)."""
    d = load(spark, sf_dir, "documents")
    return curate.span_corruption_profile(d, "doc_id", "text", 3, 0.15)


# ---------------------------------------------------------------------------
# Weighted sampling via replicated min-hash
# ---------------------------------------------------------------------------


@register(
    "curation_weighted_sample",
    survey_ref=(
        "[EXT] deterministic weighted sampling (replicated-min-hash "
        "keys, the string-exact integer-weight analog of "
        "Efraimidis-Spirakis A-ES): quality-weighted top-50 draw, "
        "P(selected first) exactly w_i/sum(w)"
    ),
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             least(4, 1 + n_chars // 200) AS weight
      FROM documents),
    copies AS (
      SELECT doc_id, weight, unnest(range(0, weight)) AS j FROM w),
    keys AS (
      SELECT doc_id, weight,
             min(md5(CAST(doc_id AS VARCHAR) || ':ws:'
                     || CAST(j AS VARCHAR))) AS wkey
      FROM copies GROUP BY doc_id, weight)
    SELECT doc_id, CAST(weight AS BIGINT) AS weight, wkey
    FROM keys ORDER BY wkey, doc_id LIMIT 50
    """,
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of 50 docs, weight = length-quality bucket
    (1..4 from n_chars): each doc draws ``weight`` md5 keys and keeps
    the minimum, so ordering by that key is a weighted draw —
    P(doc is FIRST) = weight/sum(weights) exactly, by symmetry of the
    per-copy hashes. The A-ES float form (u^(1/w)) needs ln(), which
    is not exactly-rounded cross-engine and so can flip an ordering at
    the hash gate; the replicated form is pure string comparison —
    reproducible on ANY engine.

    Scale shape: explode fan-out bounded by the weight cap (4), min
    collapses map-side, top-50 is TakeOrderedAndProject (per-partition
    heaps + 50-row driver merge). No global sort, no shuffle beyond
    the bounded-key min (curate.weighted_sample_keys)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.least(
            F.lit(4), F.lit(1) + F.expr("n_chars div 200")
        ).alias("weight"),
    )
    keys = curate.weighted_sample_keys(d, "doc_id", "weight", "ws")
    return (
        keys.orderBy(F.asc("wkey"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", F.col("weight").cast("long").alias("weight"), "wkey")
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) budget apportionment
# ---------------------------------------------------------------------------


@register(
    "curation_apportion_budget",
    survey_ref=(
        "[EXT] largest-remainder (Hamilton) apportionment of an "
        "integer sample budget across sources: floor quotas + bonus "
        "seats by remainder rank — allocations sum to the budget "
        "EXACTLY, the property proportional rounding loses"
    ),
    oracle=f"""
    WITH t AS (
      SELECT source, sum(len({_TOKS})) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT sum(n_tokens) AS nt, count(*) AS m FROM t),
    q AS (
      SELECT t.source, t.n_tokens,
             (1000 * t.n_tokens) // tot.nt AS base,
             (1000 * t.n_tokens) % tot.nt AS rem
      FROM t, tot),
    l AS (SELECT 1000 - sum(base) AS bonus FROM q),
    r AS (
      SELECT source, n_tokens, base, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM q)
    SELECT r.source,
           CAST(r.n_tokens AS BIGINT) AS n_tokens,
           CAST(r.base + CASE WHEN r.rk <= l.bonus THEN 1 ELSE 0 END
             AS BIGINT) AS alloc,
           r.rk <= l.bonus AS got_bonus
    FROM r, l
    """,
)
def curation_apportion_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment: split a 1000-doc
    sample budget across sources proportionally to token mass with
    EXACT integer allocations summing to the budget (floor quotas,
    then the leftover seats go to the largest remainders — the
    apportionment that proportional-rounding schemes can miss by
    ±|sources|). The integer complement of curation_token_budget's
    waterfill: waterfill caps hot sources, Hamilton divides a fixed
    budget with zero remainder.

    Scale shape: one per-source rollup cuts the corpus to |sources|
    rows; the totals ride a 1-row broadcast (allowlisted BNLJ class)
    and the remainder-rank window runs over the bounded source
    dimension only (f14 fixed-dimension class, allowlisted)."""
    from pyspark.sql import Window as SqlWindow

    d = load(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).cast("long").alias(
            "n_tokens"
        )
    )
    tot = t.agg(
        F.sum("n_tokens").alias("nt"), F.count(F.lit(1)).alias("m")
    )
    q = t.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr("(1000 * n_tokens) div nt").alias("base"),
        ((F.lit(1000) * F.col("n_tokens")) % F.col("nt")).alias("rem"),
    )
    bonus = q.agg((F.lit(1000) - F.sum("base")).alias("bonus"))
    r = q.withColumn(
        "rk",
        F.row_number().over(
            SqlWindow.orderBy(F.desc("rem"), F.asc("source"))
        ),
    )
    return r.crossJoin(F.broadcast(bonus)).select(
        "source",
        "n_tokens",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("bonus"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
        (F.col("rk") <= F.col("bonus")).alias("got_bonus"),
    )


# ---------------------------------------------------------------------------
# WOE / Information Value feature screening
# ---------------------------------------------------------------------------


@register(
    "quality_woe_iv",
    survey_ref=(
        "[EXT] weight-of-evidence / information-value feature "
        "screening (the credit-scoring WOE/IV recipe applied to "
        "quality-classifier features): per-bucket WOE with Laplace "
        "smoothing, IV terms round-then-DECIMAL so the bucket sum is "
        "order-free"
    ),
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             least(9, n_chars // 100) AS bucket,
             CASE WHEN len(list_intersect(list_distinct({_TOKS}),
               ['and','be','have','of','that','the','to','with'])) >= 2
               THEN 1 ELSE 0 END AS good
      FROM documents),
    b AS (
      SELECT bucket,
             count(*) AS n,
             sum(good) AS n_good,
             count(*) - sum(good) AS n_bad
      FROM base GROUP BY bucket),
    tot AS (SELECT sum(n_good) AS tg, sum(n_bad) AS tb,
                   count(*) AS n_buckets FROM b)
    SELECT b.bucket,
           CAST(b.n AS BIGINT) AS n,
           CAST(b.n_good AS BIGINT) AS n_good,
           CAST(b.n_bad AS BIGINT) AS n_bad,
           round(ln((CAST(b.n_good + 1 AS DOUBLE)
                     / (tot.tg + tot.n_buckets))
                    / (CAST(b.n_bad + 1 AS DOUBLE)
                       / (tot.tb + tot.n_buckets))), 6) AS woe,
           round((CAST(b.n_good + 1 AS DOUBLE)
                  / (tot.tg + tot.n_buckets)
                  - CAST(b.n_bad + 1 AS DOUBLE)
                    / (tot.tb + tot.n_buckets))
                 * round(ln((CAST(b.n_good + 1 AS DOUBLE)
                             / (tot.tg + tot.n_buckets))
                            / (CAST(b.n_bad + 1 AS DOUBLE)
                               / (tot.tb + tot.n_buckets))), 6),
                 6) AS iv_term
    FROM b, tot
    """,
)
def quality_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screening of a
    quality-classifier feature: bucket docs by length (n_chars//100,
    capped decile), label "good" = >=2 Gopher stopword kinds (the
    cheap fluency proxy), and report per-bucket WOE =
    ln(good-share / bad-share) with Laplace +1 smoothing (no ln(0),
    integer-exact numerators) and the IV term (share-diff x WOE; the
    bucket sum is the feature's IV — >0.3 strong, <0.02 useless, the
    screening gate BEFORE training logreg_quality on a feature). WOE
    is the one ln() in the chain and is rounded 6 on both engines
    BEFORE the IV multiply, so the only cross-engine float op follows
    the round-then-multiply discipline; IV terms come out rounded —
    summing them is a <=10-row exact add for the caller.

    Scale shape: one scan-side map → <=10-bucket integer rollup
    (map-side partials), 1-row totals broadcast for the shares
    (allowlisted); nothing else moves."""
    d = load(spark, sf_dir, "documents")
    stops = F.array([F.lit(w) for w in _GOPHER_STOPS])
    n_stop_kinds = F.size(
        F.array_intersect(F.array_distinct(tokenize(F.col("text"))), stops)
    )
    base = d.select(
        F.least(F.lit(9), F.expr("n_chars div 100")).alias("bucket"),
        (n_stop_kinds >= 2).cast("int").alias("good"),
    )
    b = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("good").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("good")).alias("n_bad"),
    )
    tot = b.agg(
        F.sum("n_good").alias("tg"),
        F.sum("n_bad").alias("tb"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    j = b.crossJoin(F.broadcast(tot))
    gshare = (F.col("n_good") + 1).cast("double") / (
        F.col("tg") + F.col("n_buckets")
    )
    bshare = (F.col("n_bad") + 1).cast("double") / (
        F.col("tb") + F.col("n_buckets")
    )
    woe = F.round(F.log(gshare / bshare), 6)
    return j.select(
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        woe.alias("woe"),
        F.round((gshare - bshare) * woe, 6).alias("iv_term"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence (lang x source)
# ---------------------------------------------------------------------------


@register(
    "quality_chi2_independence",
    survey_ref=(
        "[EXT] chi-square test of INDEPENDENCE over the lang x source "
        "contingency table (the Benford audit is goodness-of-fit; "
        "this is the two-way cousin): is language distribution "
        "homogeneous across sources, the routing-assumption check a "
        "lang-sliced pipeline makes; full grid including zero cells, "
        "per-cell terms round-then-DECIMAL so the sum is order-free"
    ),
    oracle="""
    WITH obs AS (
      SELECT lang, source, count(*) AS o
      FROM documents GROUP BY 1, 2),
    rt AS (SELECT lang, sum(o) AS r FROM obs GROUP BY lang),
    ct AS (SELECT source, sum(o) AS c FROM obs GROUP BY source),
    n AS (SELECT sum(o) AS n FROM obs),
    grid AS (
      SELECT rt.lang, ct.source, rt.r, ct.c, n.n,
             coalesce(obs.o, 0) AS o
      FROM rt CROSS JOIN ct CROSS JOIN n
      LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source),
    terms AS (
      SELECT lang, source,
             round((CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / n)
                   * (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / n)
                   / (CAST(r * c AS DOUBLE) / n), 6) AS t
      FROM grid)
    SELECT (SELECT count(*) FROM rt) AS n_langs,
           (SELECT count(*) FROM ct) AS n_sources,
           CAST(((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS df,
           round(CAST(sum(CAST(t AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS chi2
    FROM terms
    """,
)
def quality_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence on the lang x source
    contingency table — "does every source carry the same language
    mix?", the homogeneity assumption behind routing a corpus by
    source and slicing it by language. The FULL grid participates
    (zero-observation cells contribute (0-E)^2/E — dropping them
    silently understates chi2, the classic implementation bug);
    expected counts come from integer row/col/N totals in one operand
    order, each cell's term is rounded 6 then DECIMAL-summed so the
    statistic is order-independent at the gate. df = (r-1)(c-1) rides
    along for the caller's critical-value lookup.

    Scale shape: the corpus collapses to the |langs| x |sources|
    contingency rollup map-side; the grid fill is a bounded
    dimension-by-dimension cross (allowlisted grid class); everything
    after moves <=|cells| rows."""
    d = load(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "r",
            "c",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    exp = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    term = F.round(
        (F.col("o").cast("double") - exp)
        * (F.col("o").cast("double") - exp)
        / exp,
        6,
    )
    terms = grid.select(term.alias("t"))
    nl = rt.agg(F.count(F.lit(1)).alias("n_langs"))
    ns = ct.agg(F.count(F.lit(1)).alias("n_sources"))
    tot = terms.agg(
        F.round(
            F.sum(F.col("t").cast("decimal(18,6)")).cast("double"), 6
        ).alias("chi2")
    )
    return (
        nl.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_langs").cast("long").alias("n_langs"),
            F.col("n_sources").cast("long").alias("n_sources"),
            ((F.col("n_langs") - 1) * (F.col("n_sources") - 1))
            .cast("long")
            .alias("df"),
            "chi2",
        )
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance (delta-apply == recompute)
# ---------------------------------------------------------------------------


@register(
    "quality_ivm_delta",
    survey_ref=(
        "[EXT] incremental view maintenance: apply an UPDATE delta to "
        "a per-source aggregate as old_agg - retracted + inserted "
        "contributions (the self-maintainable-view algebra) and pin "
        "it EQUAL to full recomputation over the updated table — the "
        "contract that lets a 100 TB rollup absorb a 1 GB delta "
        "without rescanning anything"
    ),
    oracle=f"""
    WITH upd AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 25 = 0
                  THEN text || ' appended delta tokens xyz'
                  ELSE text END AS text
      FROM documents),
    base_agg AS (
      SELECT source, count(*) AS n_docs,
             sum(len({_TOKS})) AS n_tokens
      FROM documents GROUP BY source),
    delta AS (
      SELECT d.source,
             sum(len(list_filter(str_split(trim(regexp_replace(
                   lower(u.text), '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g')), ' '),
                   x -> x <> ''))
                 - len(list_filter(str_split(trim(regexp_replace(
                   lower(d.text), '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g')), ' '),
                   x -> x <> ''))) AS tok_delta
      FROM documents d
      JOIN upd u ON u.doc_id = d.doc_id
      WHERE d.doc_id % 25 = 0
      GROUP BY d.source),
    maintained AS (
      SELECT b.source, b.n_docs,
             b.n_tokens + coalesce(dl.tok_delta, 0) AS n_tokens_m
      FROM base_agg b LEFT JOIN delta dl ON dl.source = b.source),
    recomputed AS (
      SELECT source, sum(len(list_filter(str_split(trim(regexp_replace(
               lower(text), '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g')), ' '),
               x -> x <> ''))) AS n_tokens_r
      FROM upd GROUP BY source)
    SELECT m.source,
           CAST(m.n_docs AS BIGINT) AS n_docs,
           CAST(m.n_tokens_m AS BIGINT) AS n_tokens_maintained,
           CAST(r.n_tokens_r AS BIGINT) AS n_tokens_recomputed,
           m.n_tokens_m = r.n_tokens_r AS consistent
    FROM maintained m JOIN recomputed r ON r.source = m.source
    """,
)
def quality_ivm_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a distributive aggregate:
    every 25th document receives an UPDATE (text append); the
    per-source token rollup is maintained by adding each updated
    row's (new - old) contribution — never rescanning the unchanged
    96% — and the output pins `maintained == recomputed` per source
    (the `consistent` column is part of the hash gate, so an algebra
    bug fails the driver). This is the view-maintenance contract
    behind materialized rollups, streaming upsert sinks, and the
    CDC MERGE audit's downstream aggregates: distributive/algebraic
    aggregates (SUM/COUNT, AVG via sum+count) absorb deltas;
    holistic ones (exact MEDIAN) do not — which is WHY the catalog's
    quantile path is the mergeable histogram sketch.

    Scale shape: the delta branch scans ONLY the updated keys (a
    pushed `doc_id % 25 = 0` predicate — at a real lakehouse this is
    the CDC feed, not a rescan); the maintained view is a
    |sources|-row join; the recompute branch exists purely as the
    in-query proof and would be absent in production."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    upd_text = F.when(
        F.col("doc_id") % 25 == 0,
        F.concat(F.col("text"), F.lit(" appended delta tokens xyz")),
    ).otherwise(F.col("text"))
    base_agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(F.col("text")))).alias("n_tokens"),
    )
    changed = d.filter(F.col("doc_id") % 25 == 0)
    delta = changed.groupBy("source").agg(
        F.sum(
            F.size(tokenize(upd_text)) - F.size(tokenize(F.col("text")))
        ).alias("tok_delta")
    )
    maintained = base_agg.join(delta, "source", "left").select(
        "source",
        "n_docs",
        (
            F.col("n_tokens") + F.coalesce(F.col("tok_delta"), F.lit(0))
        ).alias("n_tokens_m"),
    )
    recomputed = (
        d.select("source", upd_text.alias("text"))
        .groupBy("source")
        .agg(F.sum(F.size(tokenize(F.col("text")))).alias("n_tokens_r"))
    )
    return maintained.join(recomputed, "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens_m").cast("long").alias("n_tokens_maintained"),
        F.col("n_tokens_r").cast("long").alias("n_tokens_recomputed"),
        (F.col("n_tokens_m") == F.col("n_tokens_r")).alias("consistent"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction calibration
# ---------------------------------------------------------------------------


@register(
    "quality_conformal_threshold",
    survey_ref=(
        "[EXT] split-conformal calibration (Vovk et al.; the "
        "distribution-free coverage recipe): nonconformity threshold "
        "at the EXACT ceil((n+1)*0.9) calibration rank — integer rank "
        "selection, no quantile interpolation — plus held-out "
        "coverage, which the conformal guarantee lower-bounds"
    ),
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             abs(n_chars - 6 * len(list_filter(str_split(trim(
               regexp_replace(lower(text), '[^\\p{L}\\p{Nd}]+', ' ',
               'g')), ' '), x -> x <> ''))) AS nonconf,
             doc_id % 2 = 0 AS is_cal
      FROM documents),
    cal AS (
      SELECT nonconf,
             row_number() OVER (ORDER BY nonconf, doc_id) AS rk,
             count(*) OVER () AS n_cal
      FROM scored WHERE is_cal),
    thr AS (
      -- rank clamped to n_cal (ADVICE r8): for n_cal < 9 the raw
      -- ceil((n+1)*0.9) exceeds n_cal and the two engines would
      -- otherwise encode different degenerate semantics (NULL here
      -- vs overall max in Spark's limit+agg form)
      SELECT n_cal,
             max(CASE WHEN rk = least(((n_cal + 1) * 9 + 9) // 10, n_cal)
                 THEN nonconf END) AS threshold,
             least(((n_cal + 1) * 9 + 9) // 10, n_cal) AS rank_idx
      FROM cal GROUP BY n_cal),
    test AS (
      SELECT count(*) AS n_test,
             sum(CASE WHEN s.nonconf <= t.threshold THEN 1 ELSE 0 END)
               AS n_covered
      FROM scored s, thr t WHERE NOT s.is_cal)
    SELECT CAST(t.n_cal AS BIGINT) AS n_cal,
           CAST(t.rank_idx AS BIGINT) AS rank_idx,
           CAST(t.threshold AS BIGINT) AS threshold,
           CAST(e.n_test AS BIGINT) AS n_test,
           CAST(e.n_covered AS BIGINT) AS n_covered,
           round(CAST(e.n_covered AS DOUBLE) / e.n_test, 6) AS coverage
    FROM thr t, test e
    """,
)
def quality_conformal_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal calibration for a deterministic proxy model
    (predict n_chars as 6 x token count; nonconformity = absolute
    residual, an exact integer): the even-id half calibrates, the
    threshold is the nonconformity at EXACT rank ceil((n_cal+1)*0.9)
    (integer ceiling division (x*9+9)//10 — rank selection, never
    quantile interpolation, so both engines pick the identical row),
    and the odd-id half reports held-out coverage, which the conformal
    guarantee lower-bounds at 90 % in expectation REGARDLESS of the
    model or data distribution — the distribution-free uncertainty
    wrapper a production scorer ships with, and the third leg of the
    model-governance family (WOE/IV screens features, ECE audits
    calibration, conformal bounds coverage).

    Scale shape: one scan-side residual map; the exact calibration
    rank is selected with orderBy+limit(rank_idx) →
    TakeOrderedAndProject (per-partition heaps, rank_idx-row driver
    merge — NO global sort window; rank_idx is known up front from
    one bounded count action, the pagerank n-count precedent); the
    threshold and coverage stats are 1-row broadcasts
    (allowlisted)."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.abs(
            F.col("n_chars") - 6 * F.size(tokenize(F.col("text")))
        ).alias("nonconf"),
        (F.col("doc_id") % 2 == 0).alias("is_cal"),
    )
    cal = scored.filter(F.col("is_cal"))
    n_cal = cal.count()
    # clamp to n_cal (ADVICE r8): for n_cal < 9 the raw rank exceeds
    # n_cal — limit(rank) would silently return the overall max while
    # the oracle's rank-equality CASE yields NULL; clamping makes both
    # sides select "the largest calibration nonconformity" identically
    rank_idx = min(((n_cal + 1) * 9 + 9) // 10, n_cal)
    thr = (
        cal.orderBy(F.asc("nonconf"), F.asc("doc_id"))
        .limit(rank_idx)
        .agg(
            F.max("nonconf").alias("threshold"),
            F.lit(n_cal).alias("n_cal"),
            F.lit(rank_idx).alias("rank_idx"),
        )
    )
    test = (
        scored.filter(~F.col("is_cal"))
        .crossJoin(F.broadcast(thr))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (F.col("nonconf") <= F.col("threshold")).cast("int")
            ).alias("n_covered"),
            F.max("n_cal").alias("n_cal"),
            F.max("rank_idx").alias("rank_idx"),
            F.max("threshold").alias("threshold"),
        )
    )
    return test.select(
        F.col("n_cal").cast("long").alias("n_cal"),
        F.col("rank_idx").cast("long").alias("rank_idx"),
        F.col("threshold").cast("long").alias("threshold"),
        F.col("n_test").cast("long").alias("n_test"),
        F.col("n_covered").cast("long").alias("n_covered"),
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test"), 6
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Expected calibration error (reliability audit)
# ---------------------------------------------------------------------------


@register(
    "quality_calibration_ece",
    survey_ref=(
        "[EXT] calibration / reliability audit (ECE, Naeini 2015 "
        "binning form): per-confidence-bucket accuracy-vs-confidence "
        "gaps as PURE integers via the identity "
        "n_b*|acc-conf| = |1000*n_pos - sum_conf|/1000 — the whole "
        "reliability diagram is integer-exact, one rounded division "
        "per reported ratio"
    ),
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(str_split(trim(regexp_replace(lower(text),
               '[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> '')
               AS toks
      FROM documents),
    sc AS (
      SELECT doc_id,
             least(999, (1000 * len(list_filter(toks, x -> x IN
               ('and','be','have','of','that','the','to','with'))))
               // (len(toks) + 1) * 8) AS conf,
             CASE WHEN len(list_intersect(list_distinct(toks),
               ['and','be','have','of','that','the','to','with'])) >= 2
               THEN 1 ELSE 0 END AS pos
      FROM t),
    b AS (
      SELECT conf // 100 AS bucket, count(*) AS n,
             sum(pos) AS n_pos, sum(conf) AS sum_conf
      FROM sc GROUP BY 1)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(sum_conf AS BIGINT) AS sum_conf,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS acc,
           round(CAST(sum_conf AS DOUBLE) / (1000 * n), 6) AS avg_conf,
           CAST(abs(1000 * n_pos - sum_conf) AS BIGINT)
             AS ece_term_scaled
    FROM b
    """,
)
def quality_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE terms for a deterministic proxy
    scorer (confidence = scaled stopword-occurrence rate, truth =
    the Gopher >=2-stopword-kinds label): per confidence bucket,
    accuracy, mean confidence, and the ECE contribution — computed
    through the identity n_b * |acc_b - conf_b| =
    |1000*n_pos_b - sum_conf_b| / 1000, so every term is an EXACT
    integer (ece_term_scaled) and ECE = sum(terms) / (1000*N) is one
    division the caller performs; the reported acc/avg_conf ratios
    are each a single rounded division. A model whose high-confidence
    buckets under-deliver shows the gap here before any downstream
    gate trusts its scores — the calibration leg of the governance
    family (WOE/IV screens, conformal bounds, ECE audits).

    Scale shape: scan-side scoring, one <=10-bucket integer rollup
    with map-side partials; nothing else moves."""
    d = load(spark, sf_dir, "documents")
    stops = F.array([F.lit(w) for w in _GOPHER_STOPS])
    # single tokenize evaluation pinned behind a Generate barrier;
    # stopword OCCURRENCES counted lambda-free with the array_remove
    # idiom (size(toks) - size(remove(toks, w)) per stopword)
    base = d.select(
        "doc_id", F.explode(F.array(tokenize(F.col("text")))).alias("_toks")
    )
    n_stop_occ = None
    for w in _GOPHER_STOPS:
        term = F.size("_toks") - F.size(F.array_remove("_toks", w))
        n_stop_occ = term if n_stop_occ is None else n_stop_occ + term
    sc = base.select(
        n_stop_occ.alias("_nso"),
        F.size("_toks").alias("_n"),
        (
            F.size(
                F.array_intersect(F.array_distinct(F.col("_toks")), stops)
            )
            >= 2
        )
        .cast("int")
        .alias("pos"),
    ).select(
        F.least(
            F.lit(999), F.expr("(1000 * _nso) div (_n + 1) * 8")
        ).alias("conf"),
        "pos",
    )
    b = sc.groupBy(F.expr("conf div 100").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum("conf").alias("sum_conf"),
    )
    return b.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("sum_conf").cast("long").alias("sum_conf"),
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias(
            "acc"
        ),
        F.round(
            F.col("sum_conf").cast("double") / (1000 * F.col("n")), 6
        ).alias("avg_conf"),
        F.abs(1000 * F.col("n_pos") - F.col("sum_conf"))
        .cast("long")
        .alias("ece_term_scaled"),
    )


@register(
    "quality_psi_drift",
    survey_ref=(
        "[EXT] Population Stability Index drift audit (the standard "
        "credit-scoring / feature-monitoring statistic; Siddiqi 2006): "
        "fixed 50-unit value buckets, baseline = first 15 days vs "
        "target = rest, Laplace-smoothed shares, per-bucket term "
        "(p - q)·ln(p/q) — counts integer, shares single divisions, "
        "one ln rounded at 6, products of bit-identical doubles"
    ),
    oracle="""
    WITH b AS (
      SELECT CAST(least(floor(value / 50.0), 9) AS BIGINT) AS bucket,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS is_base
      FROM events),
    g AS (
      SELECT bucket,
             sum(is_base) AS n_base,
             sum(1 - is_base) AS n_tgt
      FROM b GROUP BY bucket),
    t AS (
      SELECT CAST(sum(n_base) AS BIGINT) AS tot_base,
             CAST(sum(n_tgt) AS BIGINT) AS tot_tgt,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM g)
    SELECT g.bucket,
           CAST(g.n_base AS BIGINT) AS n_base,
           CAST(g.n_tgt AS BIGINT) AS n_tgt,
           round((g.n_base + 1) / CAST(t.tot_base + t.n_buckets AS DOUBLE), 6)
             AS p_base,
           round((g.n_tgt + 1) / CAST(t.tot_tgt + t.n_buckets AS DOUBLE), 6)
             AS p_tgt,
           round(((g.n_base + 1) / CAST(t.tot_base + t.n_buckets AS DOUBLE)
                  - (g.n_tgt + 1) / CAST(t.tot_tgt + t.n_buckets AS DOUBLE))
                 * round(ln(((g.n_base + 1)
                             / CAST(t.tot_base + t.n_buckets AS DOUBLE))
                            / ((g.n_tgt + 1)
                               / CAST(t.tot_tgt + t.n_buckets AS DOUBLE))), 6),
                 6) AS psi_term
    FROM g CROSS JOIN t
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the first-15-day baseline window and the rest of
    the event log, over ten fixed 50-unit value buckets: per bucket,
    Laplace-smoothed share under each epoch and the signed term
    (p_base - p_tgt)·ln(p_base/p_tgt); the total PSI is the consumer's
    sum (kept per-bucket so the audit names WHICH value band drifted —
    and so no cross-row double sum enters the hash gate). Smoothing
    (+1 per bucket) keeps ln() off zero for any epoch split.

    Scale shape: one bucket-keyed aggregate with map-side partials
    (bounded grid, ≤10 rows) broadcast-joined to a 1-row totals
    aggregate — the BNLJ 1-row-stats class the plan gates allowlist.
    A 100 TB log costs a scan plus two tiny exchanges."""
    e = load(spark, sf_dir, "events")
    b = e.select(
        F.least(F.floor(F.col("value") / 50.0), F.lit(9))
        .cast("long")
        .alias("bucket"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_base"),
    )
    g = b.groupBy("bucket").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(1 - F.col("is_base")).alias("n_tgt"),
    )
    t = g.agg(
        F.sum("n_base").alias("tot_base"),
        F.sum("n_tgt").alias("tot_tgt"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    j = g.crossJoin(F.broadcast(t))
    p_base = (F.col("n_base") + 1) / (
        F.col("tot_base") + F.col("n_buckets")
    ).cast("double")
    p_tgt = (F.col("n_tgt") + 1) / (F.col("tot_tgt") + F.col("n_buckets")).cast(
        "double"
    )
    return j.select(
        "bucket",
        F.col("n_base").cast("long").alias("n_base"),
        F.col("n_tgt").cast("long").alias("n_tgt"),
        F.round(p_base, 6).alias("p_base"),
        F.round(p_tgt, 6).alias("p_tgt"),
        F.round((p_base - p_tgt) * F.round(F.log(p_base / p_tgt), 6), 6).alias(
            "psi_term"
        ),
    )


@register(
    "quality_mutual_information",
    survey_ref=(
        "[EXT] mutual-information dependence audit between two "
        "categorical columns (lang × source), the chi2_independence "
        "companion: per-cell pointwise term p(x,y)·ln(N·n_xy/(n_x·n_y)) "
        "— the ln argument is a pure integer ratio (N·n_xy and n_x·n_y "
        "are exact BIGINT products), so only ONE ln participates, "
        "rounded at 6 per the woe_iv discipline"
    ),
    oracle="""
    WITH c AS (
      SELECT lang, source, count(*) AS n_xy
      FROM documents GROUP BY lang, source),
    r AS (SELECT lang, sum(n_xy) AS n_x FROM c GROUP BY lang),
    s AS (SELECT source, sum(n_xy) AS n_y FROM c GROUP BY source),
    t AS (SELECT sum(n_xy) AS n FROM c)
    SELECT c.lang, c.source,
           CAST(c.n_xy AS BIGINT) AS n_cell,
           CAST(r.n_x AS BIGINT) AS n_lang,
           CAST(s.n_y AS BIGINT) AS n_source,
           round((c.n_xy / CAST(t.n AS DOUBLE))
                 * round(ln(CAST(t.n * c.n_xy AS DOUBLE)
                            / CAST(r.n_x * s.n_y AS DOUBLE)), 6), 6)
             AS mi_term
    FROM c JOIN r USING (lang) JOIN s USING (source) CROSS JOIN t
    """,
)
def quality_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual-information decomposition of the lang × source
    contingency table: per cell, p(x,y)·ln(N·n_xy / (n_x·n_y)) — the
    per-cell contributions to I(lang; source), positive where a
    language concentrates in a source (the crawl-skew signal the
    chi-square audit detects but cannot direction-attribute). The sum
    is the consumer's; rows stay per-cell for attribution and to keep
    cross-row double sums out of the gate.

    Scale shape: one (lang, source)-keyed aggregate with map-side
    partials, then two bounded-dimension rollups re-joined broadcast
    (≤|langs|, ≤|sources| rows) plus a 1-row total — the bounded-grid
    BNLJ class. The contingency table itself never exceeds
    |langs|·|sources| rows regardless of corpus size."""
    d = load(spark, sf_dir, "documents")
    # the contingency grid is bounded (|langs|·|sources| rows) and
    # feeds three rollups plus the final join — checkpoint it lazily
    # so the corpus scans once, not once per consumer (4 measured)
    c = (
        d.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .localCheckpoint(eager=False)
    )
    r = c.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    s = c.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    t = c.agg(F.sum("n_xy").alias("n"))
    j = (
        c.join(F.broadcast(r), "lang")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(t))
    )
    return j.select(
        "lang",
        "source",
        F.col("n_xy").cast("long").alias("n_cell"),
        F.col("n_x").cast("long").alias("n_lang"),
        F.col("n_y").cast("long").alias("n_source"),
        F.round(
            (F.col("n_xy") / F.col("n").cast("double"))
            * F.round(
                F.log(
                    (F.col("n") * F.col("n_xy")).cast("double")
                    / (F.col("n_x") * F.col("n_y")).cast("double")
                ),
                6,
            ),
            6,
        ).alias("mi_term"),
    )


@register(
    "curation_soft_dedup",
    survey_ref=(
        "[EXT] soft deduplication by duplicate-count downweighting "
        "(the reweight-don't-drop alternative to hard dedup — SoftDeDup, "
        "He et al. 2024; 'sampling proportional to 1/copies' in Biderman "
        "et al.'s Pythia ablations): per doc, weight 1/k over its "
        "exact-hash cluster size k, rolled up per source in EXACT "
        "DECIMAL(18,6) so the cross-row sum is order-independent"
    ),
    oracle=f"""
    WITH {_PLANTED_SQL},
    k AS (
      SELECT doc_id, source,
             count(*) OVER (PARTITION BY md5(text)) AS dup_k
      FROM planted)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dup_k > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_dup_clusters,
           CAST(max(dup_k) AS BIGINT) AS max_cluster,
           CAST(sum(CAST(round(1.0 / dup_k, 6) AS DECIMAL(18,6)))
                AS DOUBLE) AS effective_docs
    FROM k
    GROUP BY source
    """,
)
def curation_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware downweighting on the planted-dups corpus: every
    document keeps weight 1/k where k is its exact-content cluster
    size, so a cluster contributes total mass 1 regardless of how many
    copies crawled in — the training-mixture alternative to dropping
    (hard dedup loses cross-copy context like boilerplate-variant
    pages; downweighting keeps one expected copy). Per-source rollup:
    raw docs, docs sitting in >1-copy clusters, largest cluster, and
    the effective (weighted) doc count.

    Hash discipline: 1/k is rounded at 6 PER DOC and summed in exact
    DECIMAL(18,6) — a double-domain sum across rows would be
    partition-order-dependent. The md5 content hash is the same
    16-byte key class the exact-dedup family shuffles.

    Scale shape: one content-hash-keyed window (count per cluster —
    the exact_dedup shuffle), then one source-keyed aggregate with
    map-side partials; 32-hex hashes shuffle, text never does."""
    d = documents_with_planted_dups(spark, sf_dir)
    from pyspark.sql import Window

    k = d.select(
        "doc_id",
        "source",
        F.count(F.lit(1))
        .over(Window.partitionBy(F.md5("text")))
        .alias("dup_k"),
    )
    w6 = F.round(F.lit(1.0) / F.col("dup_k"), 6).cast("decimal(18,6)")
    return k.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("dup_k") > 1, 1).otherwise(0)).alias(
            "n_in_dup_clusters"
        ),
        F.max("dup_k").alias("max_cluster"),
        F.sum(w6).cast("double").alias("effective_docs"),
    )


@register(
    "curation_pareto_frontier",
    survey_ref=(
        "[EXT] Pareto-frontier (skyline) document selection (Börzsönyi "
        "et al. 2001 'The Skyline Operator'): keep docs not strictly "
        "dominated on (length, lexical-diversity) — the multi-objective "
        "curation cut that avoids collapsing quality axes into one "
        "weighted score; Spark computes it scale-correctly via bucketed "
        "windows + a bounded suffix-max grid, the oracle via one global "
        "RANGE window (independent derivations, same semantics)"
    ),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars AS m1,
             (1000 * len(list_distinct(toks))) // (len(toks) + 1) AS m2
      FROM (SELECT doc_id, n_chars, {_TOKS} AS toks FROM documents)),
    w AS (
      SELECT doc_id, m1, m2,
             max(m2) OVER (ORDER BY m1
                           RANGE BETWEEN 1 FOLLOWING
                           AND UNBOUNDED FOLLOWING) AS mx
      FROM t)
    SELECT doc_id, CAST(m1 AS BIGINT) AS m1, CAST(m2 AS BIGINT) AS m2,
           NOT coalesce(mx > m2, false) AS on_frontier
    FROM w
    """,
)
def curation_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline selection on (m1 = char length, m2 = scaled distinct-
    token ratio): a document survives iff no other document beats it
    STRICTLY on both axes — the dominance cut that keeps long-but-
    repetitive and short-but-diverse docs alike when neither is
    uniformly worse. Both metrics are integers (the ratio is a
    1000-scaled floor division), so dominance is engine-exact.

    Scale shape (why not the oracle's global window): Spark buckets m1
    into 512-char bands, resolves same-bucket dominance with a
    bucket-PARTITIONED range window (strictly-greater m1 frame), and
    cross-bucket dominance with a suffix-max over the bounded
    per-bucket-max grid (every higher-bucket doc has strictly greater
    m1 by construction, since band b tops out below band b+1's floor).
    Nothing global ever sorts: the frontier of a 100 TB corpus costs
    one bucket-keyed window plus a grid join of a few hundred rows.
    The DuckDB oracle instead runs the textbook single RANGE window —
    an independent derivation whose agreement gates BOTH the bucketed
    decomposition and the dominance algebra."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    # build toks as a real column first so the div expression sees it
    t = (
        d.select("doc_id", F.col("n_chars").alias("m1"), toks.alias("__toks"))
        .select(
            "doc_id",
            "m1",
            F.expr(
                "(1000 * size(array_distinct(__toks))) div (size(__toks) + 1)"
            ).alias("m2"),
        )
    )
    bucketed = t.withColumn("bucket", F.expr("m1 div 512"))
    win = (
        Window.partitionBy("bucket")
        .orderBy("m1")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    within = bucketed.withColumn("within_mx", F.max("m2").over(win))
    grid = bucketed.groupBy("bucket").agg(F.max("m2").alias("bmax"))
    suffix = (
        grid.alias("g1")
        .join(grid.alias("g2"), F.col("g2.bucket") > F.col("g1.bucket"))
        .groupBy(F.col("g1.bucket").alias("bucket"))
        .agg(F.max("g2.bmax").alias("suffix_mx"))
    )
    j = within.join(F.broadcast(suffix), "bucket", "left")
    dominated = F.coalesce(
        F.greatest("within_mx", "suffix_mx") > F.col("m2"), F.lit(False)
    )
    return j.select("doc_id", "m1", "m2", (~dominated).alias("on_frontier"))


@register(
    "quality_expectation_suite",
    survey_ref=(
        "[EXT] declarative expectation-suite audit (the "
        "great_expectations/dbt-test pattern): six assertions over "
        "orders — positivity, date range, value-set membership, "
        "not-null, format regex, key uniqueness — evaluated in ONE "
        "scan as conditional integer sums and unpivoted to one gated "
        "row per expectation; regex restricted to the RE2/Java-"
        "identical subset (the ext_pii_redact discipline)"
    ),
    oracle="""
    WITH a AS (
      SELECT count(*) AS n_rows,
             sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
               AS v_price_positive,
             sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                        OR o_orderdate >= TIMESTAMP '2002-01-01'
                      THEN 1 ELSE 0 END) AS v_date_range,
             sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS v_status_set,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS v_custkey_notnull,
             sum(CASE WHEN NOT regexp_matches(o_orderpriority,
                                              '^[1-5]-[A-Z]+$')
                      THEN 1 ELSE 0 END) AS v_priority_format,
             count(*) - count(DISTINCT o_orderkey) AS v_key_unique
      FROM orders)
    SELECT e.expectation,
           CAST(a.n_rows AS BIGINT) AS n_rows,
           CAST(CASE e.expectation
                WHEN 'price_positive' THEN a.v_price_positive
                WHEN 'date_in_range' THEN a.v_date_range
                WHEN 'status_in_set' THEN a.v_status_set
                WHEN 'custkey_not_null' THEN a.v_custkey_notnull
                WHEN 'priority_format' THEN a.v_priority_format
                ELSE a.v_key_unique END AS BIGINT) AS n_violations,
           CASE e.expectation
                WHEN 'price_positive' THEN a.v_price_positive
                WHEN 'date_in_range' THEN a.v_date_range
                WHEN 'status_in_set' THEN a.v_status_set
                WHEN 'custkey_not_null' THEN a.v_custkey_notnull
                WHEN 'priority_format' THEN a.v_priority_format
                ELSE a.v_key_unique END = 0 AS passed
    FROM a CROSS JOIN (
      SELECT unnest(['price_positive', 'date_in_range', 'status_in_set',
                     'custkey_not_null', 'priority_format',
                     'key_unique']) AS expectation) e
    """,
)
def quality_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-contract audit: every expectation is a
    conditional integer sum inside a single global aggregate (plus one
    exact distinct count for uniqueness), then the 1-row result
    unpivots onto the fixed 6-row expectation dimension — so the audit
    of a 100 TB table costs its scan, and adding an expectation adds a
    column to the aggregate, not a pass over the data. The violation
    counts (not just pass/fail booleans) are the gated values, so the
    audit's arithmetic is verified, not only its verdicts.

    Scale shape: ONE map-side-combined global aggregate; the unpivot
    is a 1-row × 6-literal-row broadcast cross (the f14
    fixed-dimension class)."""
    o = load(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "v_price_positive"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2002-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        ).alias("v_date_range"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("v_status_set"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "v_custkey_notnull"
        ),
        F.sum(
            F.when(
                ~F.col("o_orderpriority").rlike("^[1-5]-[A-Z]+$"), 1
            ).otherwise(0)
        ).alias("v_priority_format"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "v_key_unique"
        ),
    )
    exps = spark.createDataFrame(
        [
            ("price_positive",),
            ("date_in_range",),
            ("status_in_set",),
            ("custkey_not_null",),
            ("priority_format",),
            ("key_unique",),
        ],
        "expectation string",
    )
    j = a.crossJoin(F.broadcast(exps))
    viol = (
        F.when(F.col("expectation") == "price_positive", F.col("v_price_positive"))
        .when(F.col("expectation") == "date_in_range", F.col("v_date_range"))
        .when(F.col("expectation") == "status_in_set", F.col("v_status_set"))
        .when(
            F.col("expectation") == "custkey_not_null",
            F.col("v_custkey_notnull"),
        )
        .when(
            F.col("expectation") == "priority_format",
            F.col("v_priority_format"),
        )
        .otherwise(F.col("v_key_unique"))
    )
    return j.select(
        "expectation",
        F.col("n_rows").cast("long").alias("n_rows"),
        viol.cast("long").alias("n_violations"),
        (viol == 0).alias("passed"),
    )
