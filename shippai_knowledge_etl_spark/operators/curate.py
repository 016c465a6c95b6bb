"""Advanced corpus-curation operators for LLM-data pipelines
(SURVEY.md §2.11 [EXT], second wave).

Beyond the basic textops (token counts / quality ratios / langid),
these are the filters and transforms a production pretraining-data
build runs between "raw crawl" and "tokenizer":

  - :func:`repetition_profile` — Gopher-style repetition signals
    (duplicate-token fraction, most-frequent unigram fraction,
    most-frequent-bigram character coverage). Excess repetition is the
    strongest single heuristic for machine-generated / boilerplate
    text (Rae et al. 2021, "Scaling Language Models", table A1).
  - :func:`span_dedup_profile` — cross-document duplicated-span
    detection: fixed-width token spans hashed corpus-wide, per-doc
    duplicated-span fraction (the cheap relational cousin of
    suffix-array substring dedup à la Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better").
  - :func:`pii_redact` — regex PII scrubbing (emails / IPv4 / phone)
    with per-category match counts; pattern set chosen to behave
    identically under Java regex (Spark) and RE2 (DuckDB oracle).
  - :func:`mix_sample` — deterministic hash-based source re-weighting:
    every row's keep/drop decision is a pure function of (id, salt),
    so the sampled mix is reproducible across runs, engines, and
    partitionings — how training-mix weights are applied when the run
    must be auditable (no ``rand()``).
  - :func:`pack_sequences` — token-budget sequence packing in the
    concat-and-chunk style (running token count per shard, chunk at
    the budget boundary); :func:`pack_sequences_greedy` is the
    whole-doc first-fit variant as a grouped Pandas op.

Scale notes (100 TB):
  - Everything except the greedy packer is built-in expressions +
    window/groupBy — whole-stage codegen, no Python in the hot path.
  - repetition/span profiles shuffle token-sized rows once on the
    document id (AQE-coalesced); counts are map-side partially
    aggregated.
  - mix_sample and pii_redact are narrow per-row maps — no shuffle at
    all until the caller aggregates.
  - pack_sequences partitions its running sum by an explicit shard
    column, so the window never degenerates to a single global
    partition (the classic cumsum-at-scale trap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators.textops import tokenize

# ---------------------------------------------------------------------------
# Repetition profile (Gopher-style quality heuristics)
# ---------------------------------------------------------------------------


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition signals over one tokenize pass.

    Output columns (exact ints + final double divisions, deterministic
    at any parallelism):
      - ``n_tokens``, ``n_token_chars``
      - ``dup_token_frac``  = (n_tokens - n_distinct) / n_tokens
      - ``top_unigram``, ``top_unigram_frac`` = occurrences of the most
        frequent token / n_tokens (ties → greater token string)
      - ``top_bigram``, ``top_bigram_char_frac`` = chars covered by the
        most frequent 2-gram / total token chars (ties → greater
        bigram; coverage = count * length(bigram) — overlapping
        occurrences double-count, so the score can exceed 1; it is a
        repetition score ranked against a threshold, not a true
        coverage fraction)

    Shape: ONE tokenize → posexplode → (a) per-doc count/distinct/char
    sums, (b) unigram counts, (c) lead-window bigrams — all partial-agg
    combines on (id[, gram]) keys; three doc-keyed aggregates joined
    back onto the id universe (left, so empty docs keep zero rows).
    The bigram lead window and every groupBy share the same id-keyed
    shuffle exchange target, and no lambda HOF appears anywhere (see
    dedup.shingle_structs for why that matters in hot paths).
    """
    ids = df.select(F.col(id_col))
    ex = df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    )
    per_doc = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("tok"))).alias(
            "n_repeat_tokens"
        ),
        F.sum(F.length("tok")).alias("n_token_chars"),
    )
    uni_top = (
        ex.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max(F.struct(F.col("c"), F.col("tok"))).alias("m"))
        .select(
            id_col,
            F.col("m.c").alias("top_unigram_n"),
            F.col("m.tok").alias("top_unigram"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bi_top = (
        ex.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(id_col, F.concat_ws(" ", "tok", "nxt").alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    (F.col("c") * F.length("bigram")).alias("chars"),
                    F.col("bigram"),
                )
            ).alias("m")
        )
        .select(
            id_col,
            F.col("m.chars").alias("top_bigram_chars"),
            F.col("m.bigram").alias("top_bigram"),
        )
    )
    zero = F.lit(0).cast("long")
    joined = (
        ids.join(per_doc, id_col, "left")
        .join(uni_top, id_col, "left")
        .join(bi_top, id_col, "left")
    )
    n_tok = F.coalesce(F.col("n_tokens"), zero)
    n_chars = F.coalesce(F.col("n_token_chars"), zero)
    return joined.select(
        id_col,
        n_tok.alias("n_tokens"),
        n_chars.alias("n_token_chars"),
        F.round(
            F.coalesce(F.col("n_repeat_tokens"), zero)
            / F.greatest(n_tok, F.lit(1)).cast("double"),
            6,
        ).alias("dup_token_frac"),
        F.coalesce(F.col("top_unigram"), F.lit("")).alias("top_unigram"),
        F.round(
            F.coalesce(F.col("top_unigram_n"), zero)
            / F.greatest(n_tok, F.lit(1)).cast("double"),
            6,
        ).alias("top_unigram_frac"),
        F.coalesce(F.col("top_bigram"), F.lit("")).alias("top_bigram"),
        F.round(
            F.coalesce(F.col("top_bigram_chars"), zero)
            / F.greatest(n_chars, F.lit(1)).cast("double"),
            6,
        ).alias("top_bigram_char_frac"),
    )


# ---------------------------------------------------------------------------
# Cross-document span dedup
# ---------------------------------------------------------------------------

SPAN_TOKENS = 10


def span_dedup_profile(
    df: DataFrame, id_col: str, text_col: str, span_tokens: int = SPAN_TOKENS
) -> DataFrame:
    """Fraction of each document's fixed-width token spans that also
    appear (verbatim) in at least one OTHER document.

    Spans are non-overlapping ``span_tokens``-wide windows over the
    token stream; the ragged tail span is profiled too (its width is
    whatever remains). Output: (id, n_spans, n_dup_spans,
    dup_span_frac).

    Relational span construction without lambdas OR ordered
    collect_list: posexplode gives (pos, tok); spans group on
    ``pos div span_tokens``; within a span each token sits at a unique
    offset ``pos mod span_tokens``, so ``max(when(offset == j, tok))``
    for j in 0..span_tokens-1 rebuilds the span as span_tokens
    conditional-max agg columns, and ``concat_ws(' ', ...)`` (which
    skips the NULL tail offsets) reassembles the exact text — one
    codegen'd groupBy, order-safe at any parallelism.

    Corpus-wide duplication is then ONE groupBy on the span text
    (map-side combined; the shuffle carries ~span-sized keys, the
    analog of shingle shuffles in the Jaccard path). At the 100 TB end
    the span text would be xxhash64'd before the shuffle; kept verbatim
    here so the DuckDB oracle can reproduce it exactly.
    """
    ex = df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    )
    span_cols = [
        F.max(F.when(F.col("pos") % span_tokens == j, F.col("tok"))).alias(
            f"t{j}"
        )
        for j in range(span_tokens)
    ]
    spans = (
        ex.groupBy(F.col(id_col), (F.col("pos") - F.col("pos") % span_tokens).alias("span_start"))
        .agg(*span_cols)
        .select(
            id_col,
            "span_start",
            F.concat_ws(" ", *[f"t{j}" for j in range(span_tokens)]).alias(
                "span_text"
            ),
        )
    )
    owners = spans.groupBy("span_text").agg(
        F.count_distinct(F.col(id_col)).alias("n_owner_docs")
    )
    per_doc = (
        spans.join(owners, "span_text")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("n_owner_docs") > 1).cast("long")).alias(
                "n_dup_spans"
            ),
        )
    )
    ids = df.select(F.col(id_col))
    zero = F.lit(0).cast("long")
    out = ids.join(per_doc, id_col, "left")
    n_spans = F.coalesce(F.col("n_spans"), zero)
    return out.select(
        id_col,
        n_spans.alias("n_spans"),
        F.coalesce(F.col("n_dup_spans"), zero).alias("n_dup_spans"),
        F.round(
            F.coalesce(F.col("n_dup_spans"), zero)
            / F.greatest(n_spans, F.lit(1)).cast("double"),
            6,
        ).alias("dup_span_frac"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark executors) and RE2 (DuckDB oracle): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d -]{7,}\d"

# Replacement order matters (an email contains dot-runs an IP pattern
# could bite into; a phone's digit runs could eat a redacted IP's
# neighbors) — email → ip → phone, identically on both engines.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", PII_EMAIL, "[EMAIL]"),
    ("ipv4", PII_IPV4, "[IP]"),
    ("phone", PII_PHONE, "[PHONE]"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts (pre-redaction)."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat, _ in PII_RULES
    }


def pii_redact(col: Column) -> Column:
    """Apply every PII rule in order; pure narrow expression."""
    out = col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# Deterministic mix sampling
# ---------------------------------------------------------------------------


def keep_hash(id_col: Column, salt: str) -> Column:
    """The first 4 hex chars of md5(id || ':' || salt) — a uniform
    16-bit draw that is a pure function of the row id, identical in
    Spark and DuckDB (both emit lowercase-hex md5)."""
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 4
    )


def mix_keep(id_col: Column, weight: Column, salt: str = "mix") -> Column:
    """True for rows kept under ``weight`` ∈ [0, 1]: the 16-bit hash
    draw compared against floor(weight * 65536) as a 4-hex-digit
    threshold (lexicographic compare == numeric compare at fixed
    width). weight ≥ 1 short-circuits to keep-all (its threshold would
    need 5 digits)."""
    thr = F.lpad(
        F.conv(F.floor(weight * 65536).cast("string"), 10, 16), 4, "0"
    )
    return (weight >= 1.0) | (keep_hash(id_col, salt) < F.lower(thr))


def mix_oversample(
    df: DataFrame, id_col: str, weight: Column, salt: str = "mix"
) -> DataFrame:
    """Mix weights ABOVE 1 — repeat factors for high-quality sources
    (a 2.5 weight emits every doc twice plus half the docs a third
    time). Adds an ``epoch`` column (0-based copy index): the row
    explodes over ceil(weight) candidate epochs, every epoch below
    floor(weight) is kept unconditionally, and the one fractional
    epoch passes through the same deterministic 16-bit draw as
    :func:`mix_keep`, salted per epoch so different epochs sample
    independent subsets.

    Explode-then-filter is narrow (a Generate over a ≤ceil(w)-long
    sequence, no shuffle) and the emitted multiset is a pure function
    of (id, salt) — the auditable-mix property, preserved under
    oversampling. Weights ≤ 1 degenerate to exactly mix_keep's row set
    with epoch 0."""
    frac_thr = F.lpad(
        F.conv(
            F.floor((weight - F.floor(weight)) * 65536).cast("string"), 10, 16
        ),
        4,
        "0",
    )
    out = df.select(
        "*",
        weight.alias("__w"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.ceil(weight).cast("int") - 1, F.lit(0)),
            )
        ).alias("epoch"),
    )
    # epoch 0 draws with the plain id — IDENTICAL to mix_keep — so a
    # weight raised later (0.25 → 2.25) keeps the same base subset and
    # only adds copies; higher epochs salt with #epoch for independence
    hash_key = F.when(
        F.col("epoch") == 0, F.col(id_col).cast("string")
    ).otherwise(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit("#"),
            F.col("epoch").cast("string"),
        )
    )
    kept = (F.col("epoch") < F.floor(F.col("__w"))) | (
        keep_hash(hash_key, salt) < F.lower(frac_thr)
    )
    return out.filter(kept).drop("__w")


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """Concat-and-chunk packing: within each shard, documents in id
    order are laid end to end and cut into ``budget``-token sequences;
    a document belongs to the sequence its first token lands in.

    Adds ``seq_id`` (0-based within shard) and ``tok_start`` (offset of
    the doc's first token within the shard's stream). The running sum
    partitions by the shard column — never a global single-partition
    window. Pretraining packers work exactly this way when documents
    may be split at sequence boundaries (GPT-style); the no-split
    variant is :func:`pack_sequences_greedy`.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(F.col(n_tokens_col)).over(w)
    start = end - F.col(n_tokens_col)
    return df.select(
        "*",
        start.alias("tok_start"),
        F.floor(start / budget).cast("long").alias("seq_id"),
    )


def pack_sequences_greedy(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """Whole-document first-fit packing (no doc ever splits): within a
    shard, walk docs in id order, open a new sequence whenever the
    current one would overflow ``budget``. Docs longer than the budget
    get a sequence of their own.

    Sequential by nature (each decision depends on the previous fill),
    so it runs as a grouped Pandas op per shard — the shard count is
    the parallelism knob, and each shard's doc list must fit a worker
    (the same contract as any applyInPandas group).
    """
    import pandas as pd

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema += ", seq_id long, seq_fill long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seq_ids, fills = [], []
        seq, fill = 0, 0
        for n in pdf[n_tokens_col]:
            if fill > 0 and fill + n > budget:
                seq, fill = seq + 1, 0
            fill += int(n)
            seq_ids.append(seq)
            fills.append(fill)
        pdf["seq_id"] = seq_ids
        pdf["seq_fill"] = fills
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, out_schema)


# ---------------------------------------------------------------------------
# Benchmark decontamination (test-set n-gram overlap)
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    broadcast_test: bool = True,
) -> DataFrame:
    """Flag training documents sharing word n-grams with a held-out
    evaluation set — GPT-3-style benchmark decontamination (Brown et
    al. 2020, appendix C uses 13-grams; ``n`` is a knob because the
    useful width varies with corpus size and tokenizer).

    Output: one row per TRAIN document —
    ``(id, n_shingles, n_hits, overlap, contaminated)`` where
    ``n_hits`` counts the document's DISTINCT n-grams that appear
    anywhere in the test set, ``overlap = n_hits / n_shingles`` and
    ``contaminated = n_hits > 0``. Row count always equals the train
    side: clean documents aggregate to 0 hits (every document yields at
    least one shingle row via the short-document fallback, so none
    vanish through the explode).

    100 TB shape: the train side is shingled ONCE (Generate barrier,
    codegen-only ``shingle_structs``) and reaches exactly ONE shuffle —
    the per-document groupBy. The test side (benchmark suites are MBs,
    not TBs) collapses to a DISTINCT shingle set and is joined in with
    an explicit ``broadcast()`` by default, so the 100 TB side never
    shuffles for the membership probe (a 1M-shingle eval set is tens of
    MB broadcast — well under executor memory). Pass
    ``broadcast_test=False`` only if the held-out side is genuinely
    large; the plan degrades to a shuffle hash join on the shingle key.
    """
    from shippai_knowledge_etl_spark.operators.dedup import shingle_structs

    sh_train = train.select(
        F.col(id_col),
        F.explode(F.array(shingle_structs(F.col(text_col), n))).alias("__sh"),
    ).select(
        id_col,
        F.size("__sh").alias("n_shingles"),
        F.explode("__sh").alias("shingle"),
    )
    test_sh = test.select(
        F.explode(shingle_structs(F.col(text_col), n)).alias("shingle")
    ).distinct()
    if broadcast_test:
        test_sh = F.broadcast(test_sh)
    marked = sh_train.join(
        test_sh.withColumn("__hit", F.lit(1)), "shingle", "left"
    )
    agg = marked.groupBy(id_col).agg(
        F.max("n_shingles").cast("long").alias("n_shingles"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hits"),
    )
    return agg.select(
        id_col,
        "n_shingles",
        "n_hits",
        F.round(
            F.col("n_hits") / F.col("n_shingles").cast("double"), 6
        ).alias("overlap"),
        (F.col("n_hits") > 0).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (hashed n-gram features)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256  # 2 hex chars of md5 — engine-identical bucket key


def _gram_rows(df: DataFrame, id_col: str, carry: tuple[str, ...], text_col: str) -> DataFrame:
    """(carry..., id, bucket) — one row per unigram/bigram OCCURRENCE,
    bucketed by the first two hex chars of its md5 (256 buckets,
    identical in Spark and DuckDB). Lambda-free: unigrams via
    arrays_zip(toks, '' repeats), bigrams via zipped shifted slices —
    the whole tokenize→gram→bucket pipeline stays in WholeStageCodegen,
    and a single explode evaluates it once per row."""
    toks = tokenize(F.col(text_col))
    sz = F.size(toks)
    win = F.greatest(sz - 1, F.lit(0))
    uni = F.arrays_zip(
        toks.alias("a"), F.array_repeat(F.lit(""), sz).alias("b")
    )
    bi = F.arrays_zip(
        F.slice(toks, 1, win).alias("a"), F.slice(toks, 2, win).alias("b")
    )
    g = df.select(
        *carry, F.col(id_col), F.explode(F.concat(uni, bi)).alias("__g")
    )
    gram_str = F.concat(F.col("__g.a"), F.lit(" "), F.col("__g.b"))
    return g.select(
        *carry, id_col, F.substring(F.md5(gram_str), 1, 2).alias("bucket")
    )


def dsir_logweights(
    df: DataFrame, is_target: Column, id_col: str, text_col: str
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023):
    score every RAW document (``NOT is_target``) by how target-like its
    hashed n-gram features are. Bucket b's log-weight is the smoothed
    log-ratio ln(p_target(b) / p_raw(b)); a document's ``logw`` is the
    sum over its unigram+bigram occurrences. Selecting top-logw (or
    sampling ∝ exp(logw)) re-weights the raw pool toward the target
    domain.

    Output: (id, n_feats, logw) — one row per raw document, including
    zero-token docs (left join back, logw = 0).

    Determinism / oracle discipline: per-bucket weights are rounded
    HALF_UP to 6 dp and summed as DECIMAL(18,6) — exact and
    order-independent, so the result hashes identically at any
    partitioning; the ratio is formed as one double division of exact
    integer products (< 2^53) so Spark and the SQL oracle compute the
    identical double before ln().

    100 TB shape: two corpus passes, like DSIR itself (estimate, then
    score). The estimation pass partial-aggregates to exactly 256 rows
    regardless of corpus size — collecting it driver-side is the same
    legitimately-tiny collect as a PQ codebook — and the learned
    weights return to the executors as a 256-entry literal map, so the
    scoring pass is pure codegen expressions plus ONE shuffle (the
    per-document sum). No join touches the corpus."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    flagged = df.select(
        F.col(id_col), F.col(text_col), is_target.alias("__t")
    )
    counts = (
        _gram_rows(flagged, id_col, ("__t",), text_col)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
            F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("cr"),
        )
        .collect()
    )
    nt = sum(r["ct"] for r in counts)
    nr = sum(r["cr"] for r in counts)
    b = DSIR_BUCKETS
    items: list[Column] = []
    for r in sorted(counts, key=lambda r: r["bucket"]):
        ratio = float((r["ct"] + 1) * (nr + b)) / float((r["cr"] + 1) * (nt + b))
        lam = Decimal(repr(math.log(ratio))).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
        items += [F.lit(r["bucket"]), F.lit(lam).cast("decimal(18,6)")]
    wmap = F.create_map(*items)

    raw = flagged.filter(~F.col("__t"))
    scored = _gram_rows(raw, id_col, (), text_col).select(
        id_col, F.element_at(wmap, F.col("bucket")).alias("lam")
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"), F.sum("lam").alias("logw")
    )
    return (
        raw.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.round(
                F.coalesce(F.col("logw").cast("double"), F.lit(0.0)), 6
            ).alias("logw"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style LM perplexity filter (hashed-bigram language model)
# ---------------------------------------------------------------------------


def _bigram_rows(
    df: DataFrame, id_col: str, carry: tuple[str, ...], text_col: str
) -> DataFrame:
    """(carry..., id, cb, wb) — one row per bigram occurrence, context
    and word independently bucketed by their md5 prefix (256×256 model
    cells max). Lambda-free shifted-slice zip, single explode."""
    toks = tokenize(F.col(text_col))
    win = F.greatest(F.size(toks) - 1, F.lit(0))
    zipped = F.arrays_zip(
        F.slice(toks, 1, win).alias("a"), F.slice(toks, 2, win).alias("b")
    )
    return df.select(
        *carry, F.col(id_col), F.explode(zipped).alias("__g")
    ).select(
        *carry,
        id_col,
        F.substring(F.md5(F.col("__g.a")), 1, 2).alias("cb"),
        F.substring(F.md5(F.col("__g.b")), 1, 2).alias("wb"),
    )


def ccnet_lm_scores(
    df: DataFrame, is_target: Column, id_col: str, text_col: str
) -> DataFrame:
    """CCNet-style quality filter (Wenzek et al. 2020): train a tiny
    LM on the target-domain slice, score every RAW document by mean
    negative log-likelihood — low mean_nll reads as fluent/in-domain,
    high as noise (CCNet buckets the corpus by this score into
    head/middle/tail). The KenLM 5-gram stands in for a hashed-bigram
    model with add-one smoothing: P(w|c) = (count(c,w)+1)/(count(c)+256)
    over 256-way md5 buckets.

    Output: (id, n_bigrams, mean_nll) — one row per raw document;
    docs under 2 tokens score 0 with n_bigrams 0 (left join back).

    100 TB shape: the trained model is AT MOST 65,536 (context, word)
    cells no matter the corpus size — both model tables join back via
    explicit ``broadcast()``, so the raw side is never shuffled for
    scoring; its only shuffle is the per-document sum. Per-term nll is
    one IEEE division of exact small ints then log; terms are rounded
    to 6 dp and summed as DECIMAL(18,6) so the sum is exact and
    partitioning-independent (same discipline as ``dsir_logweights``)."""
    flagged = df.select(
        F.col(id_col), F.col(text_col), is_target.alias("__t")
    )
    bi = _bigram_rows(flagged, id_col, ("__t",), text_col)
    pairs = (
        bi.filter(F.col("__t"))
        .groupBy("cb", "wb")
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    ctx = pairs.groupBy("cb").agg(F.sum("pc").alias("cc"))
    p = (F.coalesce(F.col("pc"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("cc"), F.lit(0)) + DSIR_BUCKETS
    ).cast("double")
    terms = (
        bi.filter(~F.col("__t"))
        .join(F.broadcast(pairs), ["cb", "wb"], "left")
        .join(F.broadcast(ctx), ["cb"], "left")
        .select(
            id_col,
            F.round(-F.log(p), 6).cast("decimal(18,6)").alias("nll"),
        )
    )
    agg = terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum("nll").alias("s")
    )
    return (
        flagged.filter(~F.col("__t"))
        .select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                / F.greatest(F.coalesce(F.col("n"), F.lit(0)), F.lit(1)).cast(
                    "double"
                ),
                6,
            ).alias("mean_nll"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (exact-k per stratum)
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    k: int,
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Exactly-k-per-stratum sampling with a reproducible draw: rows
    are ranked inside their stratum by ``md5(id:salt)`` (id tie-break)
    and the top k kept. Unlike ``mix_keep``'s Bernoulli draw, this
    guarantees the per-stratum count — the balanced-subsample primitive
    (eval-set carving, per-source caps, debiased previews).

    Pure function of (id, salt): same sample at any partitioning, any
    engine, any run. One shuffle (the per-stratum window); the window
    is always partitioned by the stratum, never global. Skewed strata
    cost O(stratum size log k)-ish in the window sort — at 100 TB cap
    pathological strata upstream (or pre-filter with mix_keep at a
    generous rate, then exact-rank the survivors: the two-stage form
    keeps the window input bounded)."""
    rank_key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(rank_key, F.col(id_col))
    )
    return (
        df.select(F.col(id_col), F.col(stratum_col))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, stratum_col, F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle / resharding
# ---------------------------------------------------------------------------


def corpus_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    shard_hex_chars: int = 2,
) -> DataFrame:
    """Reproducible global permutation of a corpus WITHOUT a global
    sort — the training-order randomization step before sequence
    packing. Every row gets a (shard, pos): shard is the first
    ``shard_hex_chars`` hex chars of ``md5(id:salt)`` (16^k shards),
    pos the row's rank within its shard by the full hash (id
    tie-break). Reading shards in label order, rows within a shard in
    pos order, yields one fixed pseudo-random permutation — a pure
    function of (id, salt): same order on any engine, partitioning, or
    run, and changing the salt is a fresh epoch-level reshuffle.

    100 TB shape: this is the standard way to shuffle a corpus that
    cannot be globally sorted — ONE hash-partitioned exchange + a
    shard-local window sort (never `Exchange SinglePartition`); shards
    are uniform by construction (md5), so no skew. Writers partition
    the output by ``shard`` and get directly consumable training
    shards."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    shard = F.substring(h, 1, shard_hex_chars)
    w = Window.partitionBy(shard).orderBy(h, F.col(id_col))
    return df.select(
        "*",
        shard.alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# C4-style heuristic page cleaning (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

# Line-level junk markers (C4: the "javascript" line rule) and
# page-level kill phrases (lorem ipsum placeholder, code-brace pages).
# Plain substring matches — identical semantics in Spark and DuckDB.
C4_LINE_JUNK = "javascript"
C4_PAGE_LOREM = "lorem ipsum"
C4_PAGE_BRACE = "{"
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_KEPT_LINES = 2
# ≥(MIN_WORDS-1) space-joined tokens then a non-space — RE2-safe (no
# lookaround), identical under Java regex and DuckDB's RE2.
_C4_WORDS_RE = r"(\S+\s+){%d}\S" % (C4_MIN_WORDS_PER_LINE - 1)
_C4_PUNCT_RE = r'[.!?"]$'


def _c4_line_kept(line: Column) -> Column:
    """C4's line filter: terminal punctuation, ≥5 words, no junk
    marker, no curly brace — one boolean per line."""
    return (
        line.rlike(_C4_PUNCT_RE)
        & line.rlike(_C4_WORDS_RE)
        & ~line.contains(C4_LINE_JUNK)
        & ~line.contains(C4_PAGE_BRACE)
    )


def c4_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2) as a pure per-row map:
    split the page into lines, keep lines that end in terminal
    punctuation with ≥5 words and no junk marker, then keep the PAGE
    only if ≥``C4_MIN_KEPT_LINES`` lines survive and it carries no
    placeholder text ("lorem ipsum") and no curly brace.

    Output: id, n_lines, n_kept_lines, has_lorem, has_brace, keep,
    cleaned_text (the kept lines re-joined).

    100 TB shape: ZERO shuffles — every signal is a function of the
    single row, so this composes into any scan-side stage for free
    (predicate pushdown keeps `keep` next to the parquet scan). The
    line split/filter uses array HOFs, which are interpreted
    (CodegenFallback) — a measured per-row constant that is still far
    cheaper than the alternative relational shape (explode lines →
    groupBy id), whose corpus-wide doc_id shuffle is exactly what a
    scan-side quality gate cannot afford. Keep this operator's columns
    in their own projection so the interpreted call sites don't
    pollute sibling codegen (see dedup.shingle_structs notes).
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _c4_line_kept)
    has_lorem = F.col(text_col).contains(C4_PAGE_LOREM)
    has_brace = F.col(text_col).contains(C4_PAGE_BRACE)
    n_kept = F.size(kept)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_kept >= C4_MIN_KEPT_LINES) & ~has_lorem & ~has_brace
        ).alias("keep"),
        F.array_join(kept, "\n").alias("cleaned_text"),
    )


# ---------------------------------------------------------------------------
# Per-domain cap with under-cap bypass (skew-aware)
# ---------------------------------------------------------------------------


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    order_col: str,
    id_col: str,
) -> DataFrame:
    """Cap each domain at ``cap`` documents, preferring high
    ``order_col`` (quality proxy; ``id_col`` breaks ties) — the
    hot-domain damper every crawl pipeline runs (CCNet/RefinedWeb cap
    per registrable domain so hub sites don't dominate the mix).

    Two-path plan, unlike the always-shuffle window form
    (``stratified_sample``): per-domain counts first (map-side partial
    agg → a tiny domain table), then ONLY the over-cap domains' rows
    take the window shuffle; every under-cap domain's rows pass
    through shuffle-free. On a crawl corpus the domain histogram is
    zipfian — almost all domains sit under the cap, so the expensive
    per-domain sort touches a small head of hot domains instead of
    the whole corpus, and the broadcast over-cap list prunes at the
    scan. Deterministic: pure function of (order_col, id) — same kept
    set on any partitioning or engine.
    """
    over = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > cap)
        .select(domain_col)
    )
    under_docs = df.join(F.broadcast(over), domain_col, "left_anti")
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    capped = (
        df.join(F.broadcast(over), domain_col, "left_semi")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
    return under_docs.unionByName(capped)


# ---------------------------------------------------------------------------
# URL canonicalization + blocklist (crawl frontier hygiene)
# ---------------------------------------------------------------------------


def canonical_url(url: Column) -> Column:
    """Canonicalize an http(s) URL for frontier dedup the way every
    crawl pipeline must before hashing: lowercase scheme and host,
    strip the scheme-default port (:80 / :443), drop the fragment,
    remove tracking query params (utm_*, fbclid, gclid, ref), sort the
    surviving params, normalize an empty path to '/'.

    Pure per-row expressions — zero shuffle, whole-stage-codegen'd
    except the tiny ``sort_array`` over the param list (a non-lambda
    expression, NOT an interpreted HOF). Every regex is RE2-safe (no
    lookaround), so the DuckDB oracle replicates byte-for-byte; at
    100 TB this runs at scan speed in the same stage as the fetch
    filter. Two same-page URLs that differ only by tracking params /
    param order / case / default port hash identically afterwards —
    the prerequisite for the Bloom frontier (`sketches.bloom_build`)
    not re-crawling them.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(
        F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""), r"#.*$", ""
    )
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_extract(rest, r"^[^/?]*(.*)$", 1)
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    # &-wrap so every param is &-prefixed, strip tracking params in one
    # global pass: each match is a full '&name=value' cell that stops AT
    # (without consuming) the next '&', so adjacent tracking params all
    # match; the mandatory '=' keeps 'refresh=x' safe from the 'ref'
    # alternative (bare valueless tracking params are left alone —
    # RE2 has no lookahead to remove them adjacency-safely)
    cleaned = F.regexp_replace(
        F.concat(F.lit("&"), query, F.lit("&")),
        r"&(utm_[^=&]*|fbclid|gclid|ref)=[^&]*",
        "",
    )
    cleaned = F.regexp_replace(cleaned, r"&&+", "&")
    cleaned = F.regexp_replace(cleaned, r"^&|&$", "")
    sorted_q = F.array_join(F.sort_array(F.split(cleaned, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)
        ),
    )


def url_host(url: Column) -> Column:
    """Registrable host of a canonical URL (port already stripped)."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?:]*)", 1)


def blocklist_filter(
    df: DataFrame, url_col: str, blocked_hosts: DataFrame
) -> DataFrame:
    """Mark rows whose canonical host appears in ``blocked_hosts``
    (column ``host``) — the crawl-pipeline deny-list. The list is a
    dimension table (thousands of hosts vs billions of URLs), so the
    membership probe is an explicit BROADCAST left join; the corpus
    side never shuffles. Verdict as data (``blocked`` boolean), not a
    filter, so callers route rather than drop silently — the
    errors-as-data discipline of ``sources/fetch.py``."""
    h = url_host(F.col(url_col))
    marked = blocked_hosts.select(
        F.col("host").alias("__bh"), F.lit(True).alias("__blocked")
    )
    return (
        df.withColumn("__h", h)
        .join(F.broadcast(marked), F.col("__h") == F.col("__bh"), "left")
        .withColumn("blocked", F.coalesce(F.col("__blocked"), F.lit(False)))
        .drop("__bh", "__blocked", "__h")
    )


def frontier_interleave(
    df: DataFrame, host_col: str, priority_col: str, id_col: str
) -> DataFrame:
    """Politeness-aware fetch ordering: round-robin across hosts so no
    host is hit twice before every other host with pending work is hit
    once — the standard crawl-frontier schedule (a per-host FIFO drained
    breadth-first), expressed relationally.

    ``fetch_pos = (rank_in_host - 1) * n_hosts + host_idx`` is a total
    order with holes, NOT a dense sequence — computing a dense global
    position would need a corpus-wide single-partition window, which
    this repo's plan gate bans. The only windows here are per-host
    (rank_in_host, shuffle keyed by host) and over the DISTINCT host
    dimension (bounded, one of the documented allowed cases); the host
    index table joins back via explicit broadcast. Deterministic: pure
    function of (priority, id) within host and of the host set.
    """
    w_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(id_col)
    )
    # persist the distinct-host dim: both the count() action and the
    # host_idx window consume it — without the cache the full-corpus
    # distinct aggregation would run twice
    hosts = df.select(host_col).distinct().persist()
    w_dim = Window.orderBy(host_col)  # bounded dim: distinct hosts only
    host_idx = hosts.select(
        host_col, F.row_number().over(w_dim).alias("__hidx")
    )
    n_hosts = hosts.count()
    return (
        df.withColumn("rank_in_host", F.row_number().over(w_host))
        .join(F.broadcast(host_idx), host_col)
        .withColumn(
            "fetch_pos",
            (F.col("rank_in_host") - 1) * n_hosts + F.col("__hidx"),
        )
        .drop("__hidx")
    )


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher/RefinedWeb
    quality signal that catches both extremes: boilerplate/templated
    text compresses far below natural prose, encrypted/garbled text
    barely compresses at all (Rae et al. 2021 repetition family).

    Arrow-batched ``mapInPandas`` with stdlib zlib level 6 — the
    legitimate Python-edge case (no JVM/SQL zlib exists), same posture
    as the multimodal decoders: a narrow per-row map, no shuffle,
    scales linearly with input splits. Deterministic: zlib level-6
    output length is a pure function of the bytes (RFC 1950 stream),
    so the ratio is stable across runs, engines, and partitionings —
    but NOT expressible in DuckDB SQL, hence rows-only at the driver
    gate with the discriminative power pytest-pinned.
    """
    from collections.abc import Iterator

    import pandas as pd  # noqa: F401

    schema = f"{id_col} long, n_bytes long, n_compressed long, compression_ratio double"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import zlib

        import pandas as pd

        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, 6))).astype(
                "int64"
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "compression_ratio": (
                        n_comp / n_bytes.clip(lower=1)
                    ).round(6),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# Main-content extraction (boilerplate removal, jusText/Boilerpipe-style)
# ---------------------------------------------------------------------------


def main_content(
    pages: DataFrame,
    id_col: str,
    blocks_col: str,
    min_words: int = 10,
    max_link_density: float = 1.0 / 3.0,
) -> DataFrame:
    """Classify parsed text blocks into content vs boilerplate and
    reassemble each page's main text (Kohlschütter et al. 2010 /
    jusText heuristics, relationally):

      - link-dense blocks (anchor chars / chars >= max_link_density)
        are boilerplate — navigation, footers, related-links rails;
      - long low-link blocks (>= min_words) are content;
      - SHORT low-link blocks inherit from their neighbors (lag/lead
        over block order): a caption between two paragraphs stays, a
        copyright line between nav and footer goes.

    Input: (id, array<block>) from the ``page_blocks`` parse edge.
    All classification is column expressions over the exploded blocks
    — one page-keyed shuffle for the neighbor window + reassembly;
    per-block arithmetic is codegen'd. Page reassembly sorts
    ``struct(block_idx, text)`` so the concat order is deterministic
    regardless of partial-aggregation order."""
    from shippai_knowledge_etl_spark.operators.textops import tokenize

    b = pages.select(F.col(id_col), F.explode(blocks_col).alias("b")).select(
        id_col,
        F.col("b.block_idx").alias("block_idx"),
        F.col("b.text").alias("text"),
        F.col("b.n_anchor_chars").alias("n_anchor_chars"),
    )
    n_chars = F.length("text")
    n_words = F.size(tokenize(F.col("text")))
    link_density = F.col("n_anchor_chars") / F.greatest(n_chars, F.lit(1))
    base = (
        F.when(link_density >= max_link_density, F.lit("bad"))
        .when(n_words >= min_words, F.lit("good"))
        .otherwise(F.lit("short"))
    )
    w = Window.partitionBy(id_col).orderBy("block_idx")
    scored = b.withColumn("base", base)
    cls = (
        F.when(F.col("base") == "good", F.lit("content"))
        .when(F.col("base") == "bad", F.lit("boilerplate"))
        .otherwise(
            F.when(
                (F.lag("base").over(w) == "good")
                | (F.lead("base").over(w) == "good"),
                F.lit("content"),
            ).otherwise(F.lit("boilerplate"))
        )
    )
    classified = scored.withColumn("cls", cls)
    agg = classified.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum((F.col("cls") == "content").cast("long")).alias(
            "n_content_blocks"
        ),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("cls") == "content",
                            F.struct("block_idx", "text"),
                        )
                    )
                ),
                lambda s: s.getField("text"),
            ),
            " ",
        ).alias("main_text"),
    )
    # pages with zero parsed blocks vanished at the explode — restore
    # them with an explicit empty verdict so output rows == input rows
    # (review finding: silent row loss breaks join-back pipelines)
    return (
        pages.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("n_content_blocks", F.lit(0))
            .cast("long")
            .alias("n_content_blocks"),
            F.coalesce("main_text", F.lit("")).alias("main_text"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed inference batching
# ---------------------------------------------------------------------------


def length_batches(
    df: DataFrame, id_col: str, text_col: str, batch_size: int = 16
) -> DataFrame:
    """Group documents into inference batches of similar token length
    (bucket = floor(log2(n_tokens))) and report each batch's padding
    overhead — the batching step before batched model inference,
    where mixing a 10-token doc with a 4096-token doc wastes the
    difference in pad tokens.

    Deterministic: batch membership is row_number by (n_tokens, id)
    inside the length bucket — a pure function of the corpus. The
    window partitions by bucket (~30 partitions of similar size by
    construction), never global; padding arithmetic is exact ints
    with one final rounded division."""
    toks = df.select(
        F.col(id_col), F.size(tokenize(F.col(text_col))).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    # floor(log2) via binary-string length: exact integer path on any
    # engine (float log2 can land a hair under at powers of two)
    bucket = (F.length(F.conv(F.col("n_tokens"), 10, 2)) - 1).cast("int")
    w = Window.partitionBy("bucket").orderBy("n_tokens", id_col)
    rows = (
        toks.withColumn("bucket", bucket)
        .withColumn(
            "batch_idx",
            ((F.row_number().over(w) - 1) / batch_size).cast("int"),
        )
    )
    return rows.groupBy("bucket", "batch_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.round(
            (F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens"))
            / (F.max("n_tokens") * F.count(F.lit(1))).cast("double"),
            6,
        ).alias("padding_frac"),
    )


# ---------------------------------------------------------------------------
# Robust outlier flagging (median / MAD)
# ---------------------------------------------------------------------------


def robust_outliers(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str,
    n_mads: float = 3.0,
) -> DataFrame:
    """Flag rows whose value deviates from their group median by more
    than ``n_mads`` median-absolute-deviations — the robust z-score
    screen (immune to the outliers it hunts, unlike mean/stddev).

    Two passes by necessity (MAD needs the median first), both
    group-keyed exact percentile aggregates; the tiny per-group stat
    tables broadcast back, so the corpus shuffles only for the two
    aggregations. Exact interpolated percentiles are engine-portable
    (ints → .0/.5 midpoints), so the verdict is oracle-checkable."""
    v = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .select(
            F.col(id_col),
            group_col,
            v.alias("value"),
            F.col("med"),
            F.col("mad"),
            (F.abs(v - F.col("med")) > F.lit(n_mads) * F.col("mad")).alias(
                "is_outlier"
            ),
        )
    )


# ---------------------------------------------------------------------------
# fastText-style quality classifier (hashed-gram logistic regression)


def _bucket_features(
    flagged: DataFrame, id_col: str, carry: tuple[str, ...], text_col: str
) -> DataFrame:
    """(carry..., id, bucket, cnt, n_grams) — per-document hashed-gram
    term frequencies over the shared 256-bucket DSIR feature space.
    One explode + one (id, bucket)-keyed count with map-side partials;
    n_grams rides a window over the same partitioning, not a second
    corpus scan."""
    counts = (
        _gram_rows(flagged, id_col, carry, text_col)
        .groupBy(*carry, id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.withColumn(
        "n_grams", F.sum("cnt").over(Window.partitionBy(id_col))
    )


def logreg_quality_train(
    df: DataFrame,
    label: Column,
    id_col: str,
    text_col: str,
    n_iters: int = 4,
    lr: float = 5.0,
) -> tuple[dict[str, "Decimal"], list[float]]:
    """Train the fastText-recipe quality filter (Joulin et al. 2017;
    the GPT-3/LLaMA corpus-curation classifier pattern: logistic
    regression over hashed n-gram features, seeded by a boolean
    good/bad ``label`` column) with full-batch gradient descent INSIDE
    the engine. Returns ({bucket: weight}, per-iteration losses).

    Determinism at any parallelism (the ``dsir_logweights``
    discipline): features are exact integer (doc, bucket) counts; the
    per-doc score z, the per-bucket gradient, and the loss each sum
    6 dp-rounded terms as DECIMAL(18,6) — order-independent — and the
    256-entry weight vector is re-quantized HALF_UP to 6 dp on the
    driver every step, so the trained model is a pure function of the
    corpus.

    100 TB shape: the gram explode happens ONCE (persisted
    (doc, bucket, cnt) table, ≤ 256 rows per doc); each iteration is
    one id-keyed aggregate for scores, one id-keyed join back for the
    gradient, and a 256-row + 1-row driver collect. Weights travel as
    a literal map in the plan — no join against model state, the DSIR
    pattern."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    flagged = df.select(
        F.col(id_col), F.col(text_col), label.alias("__y")
    )
    feats = _bucket_features(flagged, id_col, ("__y",), text_col).persist()
    n_docs = flagged.count()
    weights = {f"{b:02x}": Decimal("0.000000") for b in range(256)}
    losses: list[float] = []
    q = Decimal("0.000001")
    for _ in range(n_iters):
        wmap = F.create_map(
            *[
                x
                for bkt, w in sorted(weights.items())
                for x in (F.lit(bkt), F.lit(w).cast("decimal(18,6)"))
            ]
        )
        zterm = F.round(
            F.element_at(wmap, F.col("bucket")).cast("double")
            * F.col("cnt")
            / F.col("n_grams"),
            6,
        ).cast("decimal(18,6)")
        scored = (
            feats.groupBy(F.col(id_col), F.col("__y"))
            .agg(F.sum(zterm).cast("double").alias("z"))
            .select(
                id_col,
                "__y",
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-F.greatest(
                            F.least(F.col("z"), F.lit(30.0)), F.lit(-30.0)
                        ))
                    )
                ).alias("p"),
            )
        )
        y = F.col("__y").cast("int")
        loss_term = F.round(
            -(
                y * F.log(F.col("p"))
                + (1 - y) * F.log(F.lit(1.0) - F.col("p"))
            ),
            6,
        ).cast("decimal(18,6)")
        gterm = F.round(
            (F.col("p") - y) * F.col("cnt") / F.col("n_grams"), 6
        ).cast("decimal(18,6)")
        both = feats.join(
            scored.select(id_col, "p"), id_col
        )
        grad = {
            r["bucket"]: r["g"]
            for r in both.groupBy("bucket")
            .agg(F.sum(gterm).cast("double").alias("g"))
            .collect()
        }
        losses.append(
            float(
                scored.agg(
                    F.sum(loss_term).cast("double")
                ).collect()[0][0]
            )
        )
        weights = {
            bkt: (
                w - Decimal(repr(lr * grad.get(bkt, 0.0) / n_docs))
            ).quantize(q, ROUND_HALF_UP)
            for bkt, w in weights.items()
        }
    feats.unpersist()
    return weights, losses


def logreg_quality_score(
    df: DataFrame,
    weights: dict[str, "Decimal"],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, score, is_good) under a trained weight vector: the same
    literal-map + DECIMAL-summed dot product as training, one
    id-keyed aggregate over the corpus, threshold at 0.5. Zero-gram
    documents score sigmoid(0) = 0.5 → kept (is_good on the tie)."""
    wmap = F.create_map(
        *[
            x
            for bkt, w in sorted(weights.items())
            for x in (F.lit(bkt), F.lit(w).cast("decimal(18,6)"))
        ]
    )
    feats = _bucket_features(
        df.select(id_col, text_col), id_col, (), text_col
    )
    zterm = F.round(
        F.element_at(wmap, F.col("bucket")).cast("double")
        * F.col("cnt")
        / F.col("n_grams"),
        6,
    ).cast("decimal(18,6)")
    z = feats.groupBy(id_col).agg(
        F.sum(zterm).cast("double").alias("z")
    )
    return (
        df.select(id_col)
        .join(z, id_col, "left")
        .select(
            id_col,
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -F.greatest(
                            F.least(
                                F.coalesce(F.col("z"), F.lit(0.0)),
                                F.lit(30.0),
                            ),
                            F.lit(-30.0),
                        )
                    )
                ),
                6,
            ).alias("score"),
            (F.coalesce(F.col("z"), F.lit(0.0)) >= 0).alias("is_good"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str,
    source_col: str,
    n: int = 3,
) -> DataFrame:
    """Corpus-level cross-source contamination matrix: for every
    source pair, how many DISTINCT word ``n``-grams they share, plus
    overlap (shared / min vocabulary — the containment analog) and
    Jaccard. The corpus-audit complement of :func:`decontaminate`
    (which flags individual train docs against one benchmark set):
    a hot cell here means two "independent" sources copy each other —
    mirror sites, syndicated feeds, a scrape fed back into itself —
    so their mixture weights double-count the same text.

    Output: (source_a, source_b, n_shared, n_a, n_b, overlap,
    jaccard), one row per unordered pair with n_shared >= 1,
    source_a < source_b.

    100 TB shape: ONE shingle pass (codegen ``shingle_structs``
    route is unnecessary here — the per-source DISTINCT collapses
    the corpus to |sources| vocabularies before any pair exists);
    the cross-source join fans out per shingle by at most the number
    of sources holding it (sources are tens, not millions), one
    shuffle on the shingle key, |sources|^2-bounded output. Counts
    are exact integers; the two divisions round 6 dp at the gate."""
    from shippai_knowledge_etl_spark.operators.dedup import shingle_structs

    # codegen struct shingles (the lambda-HOF string form pays the
    # documented CodegenFallback scan tax); the output consumes only
    # DISTINCT counts, and struct equality == joined-string equality
    # (space-free tokens), so the swap is result-invariant
    sv = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(
                shingle_structs(F.col(text_col), n=n)
            ).alias("shingle"),
        )
        .distinct()
    )
    vocab = sv.groupBy("src").agg(F.count(F.lit(1)).alias("n_vocab"))
    a, b = sv.alias("a"), sv.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("source_a"),
            F.col("b.src").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    va = vocab.select(
        F.col("src").alias("source_a"), F.col("n_vocab").alias("n_a")
    )
    vb = vocab.select(
        F.col("src").alias("source_b"), F.col("n_vocab").alias("n_b")
    )
    return (
        shared.join(va, "source_a")
        .join(vb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_shared").cast("double")
                / F.least(F.col("n_a"), F.col("n_b")),
                6,
            ).alias("overlap"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def remove_repeated_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Intra-document de-repetition (the self-repetition cleanup of
    Lee et al. 2022's dedup study, doc-local form): every LATER
    occurrence of a word ``n``-gram already seen earlier in the SAME
    document is removed — all ``n`` token positions the repeated
    window covers — and the text is rebuilt from the surviving
    tokens in order. Returns (id, n_tokens, n_removed, text_clean).

    Relational form: posexplode → n-gram start at each position
    (lead-window concat, no HOF) → a start is REPEATED iff an equal
    gram starts earlier in the doc (min-pos window over (doc, gram))
    → a position is removed iff ANY of the ``n`` starts covering it
    is repeated (max over a ROWS BETWEEN n-1 PRECEDING sliding
    window) → rebuild via sort_array(collect_list(struct(pos, tok)))
    and the array-of-struct ``getField`` projection — zero lambda
    HOFs end to end.

    Scale: everything rides doc-keyed windows over ONE posexplode
    pass except the (doc, gram) min — a second hash shuffle whose
    key count is bounded by corpus positions; state per position is
    one boolean. The rebuild's collect_list is per-document (bounded
    by doc length, the same bound any text column already has)."""
    ex = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    )
    wdoc = Window.partitionBy("doc").orderBy("pos")
    gram = F.concat_ws(
        " ",
        F.col("tok"),
        *[F.lead("tok", i).over(wdoc) for i in range(1, n)],
    )
    has_gram = F.lead("tok", n - 1).over(wdoc).isNotNull()
    g = ex.withColumn(
        "gram", F.when(has_gram, gram)
    )
    wgram = Window.partitionBy("doc", "gram")
    rep_start = (
        F.col("gram").isNotNull()
        & (F.min("pos").over(wgram) < F.col("pos"))
    ).cast("int")
    cover = Window.partitionBy("doc").orderBy("pos").rowsBetween(
        -(n - 1), 0
    )
    marked = g.withColumn("rep", rep_start).withColumn(
        "removed", F.max("rep").over(cover)
    )
    return marked.groupBy(F.col("doc").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("removed").cast("long").alias("n_removed"),
        F.concat_ws(
            " ",
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("removed") == 0,
                        F.struct("pos", "tok"),
                    )
                )
            ).getField("tok"),
        ).alias("text_clean"),
    )


# ---------------------------------------------------------------------------
# Line-frequency boilerplate dedup (CCNet-style paragraph-hash filter)
# ---------------------------------------------------------------------------


def line_frequency_filter(
    lines: DataFrame,
    id_col: str,
    line_col: str,
    max_doc_freq: int = 5,
) -> DataFrame:
    """CCNet-style line/paragraph dedup (Wenzek et al. 2020 §3.1): a
    line appearing verbatim in more than ``max_doc_freq`` DISTINCT
    documents is boilerplate (nav menus, footers, cookie banners) and
    is dropped corpus-wide; unique content survives. Returns the input
    rows with ``df_docs`` (distinct-document frequency) and ``kept``.

    Scale shape: the frequency rollup groups on ``md5(line)`` — a
    fixed-width 32-char key — so the shuffle carries hashes, never the
    line text; the verdict join re-uses the same hash partitioning
    (AQE reuses the exchange). At 100 TB this is the exact-dedup
    shuffle class: one wide exchange keyed on content hash, map-side
    distinct collapse before it."""
    lh = lines.withColumn("_lh", F.md5(F.col(line_col)))
    freq = (
        lh.select("_lh", id_col)
        .distinct()
        .groupBy("_lh")
        .agg(F.count(F.lit(1)).cast("long").alias("df_docs"))
    )
    return lh.join(freq, "_lh").drop("_lh").withColumn(
        "kept", F.col("df_docs") <= max_doc_freq
    )


def token_lines(
    df: DataFrame, id_col: str, text_col: str, width: int = 10
) -> DataFrame:
    """Deterministic "lines" for a corpus whose text carries no
    newlines: consecutive ``width``-token chunks (the chunk_tokens
    geometry with stride == width). Lambda-free: chunk indices come
    from posexplode(sequence(...)), the text from slice + array_join —
    all codegen'd. Docs with zero tokens emit no lines (both engines
    filter identically). Returns (id_col, line_no, line)."""
    base = df.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    nz = base.filter(F.col("_n") >= 1)
    idx = nz.select(
        id_col,
        "_toks",
        F.posexplode(
            F.sequence(F.lit(0), F.expr(f"(_n - 1) div {width}"))
        ).alias("line_no", "_i"),
    )
    return idx.select(
        id_col,
        "line_no",
        F.array_join(
            F.slice(
                F.col("_toks"),
                F.col("_i") * width + 1,
                F.lit(width),
            ),
            " ",
        ).alias("line"),
    )


# ---------------------------------------------------------------------------
# T5-style span corruption (deterministic denoising masks)
# ---------------------------------------------------------------------------


def span_corruption_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span: int = 3,
    mask_pct: float = 0.15,
) -> DataFrame:
    """Span-corruption accounting for denoising pretraining (Raffel et
    al. 2020 §3.1.4, the T5 objective): tokens are grouped into
    consecutive ``span``-token groups and each group is masked by a
    deterministic 16-bit md5 draw at ``mask_pct`` — the input sequence
    replaces each masked span with ONE sentinel, the target emits the
    masked tokens each prefixed by its sentinel plus a final EOS.
    Returns per-doc exact token accounting: n_tokens, n_spans,
    n_masked_spans, n_masked_tokens, n_input_tokens, n_target_tokens.

    Deterministic md5 masking (the mix_keep idiom) means the SAME doc
    gets the SAME mask on any engine/partitioning/run — reproducible
    training data, and the whole profile is hash-gateable. Scale
    shape: one posexplode to span rows (n/span fan-out), one doc-keyed
    rollup; no shuffle beyond the rollup, no lambda HOFs."""
    thr = format(int(mask_pct * 65536), "04x")
    base = df.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    nz = base.filter(F.col("_n") >= 1)
    spans = nz.select(
        id_col,
        "_n",
        F.posexplode(
            F.sequence(F.lit(0), F.expr(f"(_n - 1) div {span}"))
        ).alias("_s", "_ignored"),
    )
    draw = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":sc:"),
                F.col("_s").cast("string"),
            )
        ),
        1,
        4,
    )
    marked = spans.select(
        id_col,
        "_n",
        F.least(F.lit(span), F.col("_n") - F.col("_s") * span).alias(
            "_len"
        ),
        (draw < F.lit(thr)).cast("int").alias("_m"),
    )
    agg = marked.groupBy(id_col).agg(
        F.max("_n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("_m").cast("long").alias("n_masked_spans"),
        F.sum(F.col("_m") * F.col("_len")).cast("long").alias(
            "n_masked_tokens"
        ),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_spans",
        "n_masked_spans",
        "n_masked_tokens",
        (
            F.col("n_tokens")
            - F.col("n_masked_tokens")
            + F.col("n_masked_spans")
        ).alias("n_input_tokens"),
        (
            F.col("n_masked_tokens") + F.col("n_masked_spans") + 1
        ).alias("n_target_tokens"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling via replicated min-hash
# ---------------------------------------------------------------------------


def weighted_sample_keys(
    df: DataFrame, id_col: str, weight_col: str, salt: str = "ws"
) -> DataFrame:
    """Deterministic weighted sampling keys: each row draws
    ``weight`` independent md5 hashes (one per integer weight unit)
    and keeps the MINIMUM — ordering the corpus by that key makes
    P(row is the global minimum) exactly weight_i / sum(weights), the
    replicated-min-hash weighted draw (integer-weight analog of
    Efraimidis-Spirakis A-ES keys, which need u^(1/w) floats whose ln
    is NOT exactly-rounded cross-engine — this form is string-exact).
    Top-k by (wkey, id) is then a reproducible weighted sample.

    Scale shape: the explode fan-out is bounded by the weight cap
    (small integer), the min collapses map-side, and the top-k is
    TakeOrderedAndProject — per-partition heaps, k-row driver merge.
    Returns (id_col, weight_col, wkey).

    Rows with weight < 1 draw NOTHING (P = 0/sum(w)) and are filtered
    before the explode: Spark's sequence(0, -1) yields a DESCENDING
    [0, -1] (two elements!) rather than DuckDB's empty range(0, 0), so
    without the filter a zero-weight row would get TWO hash draws —
    the opposite of the contract (ADVICE r8)."""
    copies = df.filter(F.col(weight_col).cast("int") >= 1).select(
        id_col,
        weight_col,
        F.posexplode(
            F.sequence(F.lit(0), F.col(weight_col).cast("int") - 1)
        ).alias("_j", "_ignored"),
    )
    h = F.md5(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(f":{salt}:"),
            F.col("_j").cast("string"),
        )
    )
    return copies.select(id_col, weight_col, h.alias("_h")).groupBy(
        id_col, weight_col
    ).agg(F.min("_h").alias("wkey"))
