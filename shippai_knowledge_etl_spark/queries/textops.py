"""Text-analysis query surface (SURVEY.md §2.11 [EXT])."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.operators import textops
from shippai_knowledge_etl_spark.tables import load, scale_out, table_rowcount

# DuckDB-side mirror of textops.tokenize (RE2 shares Java's \p classes).
_TOKS = (
    "list_filter(str_split(trim(regexp_replace(lower(text), "
    "'[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> '')"
)


@register(
    "ext_token_counts",
    survey_ref="[EXT] token counting (whitespace + BPE-ish regex)",
    bench=True,
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_ws_tokens,
           len(regexp_extract_all(text,
               '[\\p{{L}}\\p{{Nd}}]+|[^\\p{{L}}\\p{{Nd}}\\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def ext_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws, bpe = textops.token_counts(F.col("text"))
    return d.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
    )


@register(
    "ext_quality_score",
    survey_ref="[EXT] quality scoring (length/punct/stopword ratios)",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           len(regexp_extract_all(text, '[^\\p{{L}}\\p{{Nd}}\\s]'))
             / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
           len(list_filter(toks, x -> x IN ('the','and','of','to','is')))
             / CAST(greatest(len(toks), 1) AS DOUBLE) AS stopword_ratio,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / CAST(greatest(len(toks), 1) AS DOUBLE) AS avg_token_len
    FROM t
    """,
)
def ext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    m = textops.quality_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["punct_ratio"].alias("punct_ratio"),
        m["stopword_ratio"].alias("stopword_ratio"),
        m["avg_token_len"].alias("avg_token_len"),
    )


_LANG_SCORE_SQL = " UNION ALL ".join(
    f"""SELECT doc_id, '{lang}' AS lang,
        len(list_filter({_TOKS}, x -> x IN ({", ".join("'" + w + "'" for w in words)})))
          AS score FROM documents"""
    for lang, words in sorted(textops.LANG_MARKERS.items())
)


@register(
    "ext_langid_scores",
    survey_ref="[EXT] language-ID: per-language marker-hit scores",
    oracle=f"SELECT doc_id, lang, CAST(score AS INT) AS score FROM ({_LANG_SCORE_SQL})",
)
def ext_langid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale_out: 25 marker_hits array passes per row on a single-split
    # local scan ran on 1 of 32 cores (round 13; no-op on real layouts)
    d = scale_out(load(spark, sf_dir, "documents"))
    return textops.langid_scores(d, "doc_id", "text").select(
        "doc_id", "lang", F.col("score").cast("int")
    )


@register(
    "ext_langid_predict",
    survey_ref="[EXT] language-ID: argmax with deterministic tie-break",
    oracle=f"""
    SELECT doc_id, lang AS pred_lang, CAST(score AS INT) AS score
    FROM ({_LANG_SCORE_SQL})
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, lang ASC) = 1
    """,
)
def ext_langid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    scores = textops.langid_scores(d, "doc_id", "text")
    return textops.langid_predict(scores, "doc_id").select(
        "doc_id", "pred_lang", F.col("score").cast("int")
    )


@register(
    "ext_fingerprint",
    survey_ref="[EXT] document fingerprinting (md5 whole + rolling windows)",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    n AS (SELECT doc_id, toks,
                 greatest(1, CAST((len(toks) - 8) // 4 + 1 AS INT)) AS n_win
          FROM t)
    SELECT doc_id,
           md5(array_to_string(toks, ' ')) AS doc_fp,
           CAST(to_json(list_transform(range(0, n_win),
             i -> md5(array_to_string(list_slice(toks, i*4 + 1, i*4 + 8), ' '))
           )) AS VARCHAR) AS window_fps
    FROM n
    """,
)
def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale_out: per-row md5-per-window compute on a single-split local
    # scan would run on 1 core (see ext_winnow_fingerprints)
    d = scale_out(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        textops.fingerprint(F.col("text")).alias("doc_fp"),
        # gate boundary: to_json the fingerprint array (driver can't hash lists)
        F.to_json(textops.window_fingerprints(F.col("text"))).alias("window_fps"),
    )


@register(
    "ext_countmin_heavy_hitters",
    survey_ref="[EXT] count-min sketch heavy hitters: d×256 salted-md5 "
    "grid, constant-size and mergeable (Cormode & Muthukrishnan 2005); "
    "top-10 exact tokens probed — estimate must never underestimate",
    oracle=f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    tc AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    probes AS (SELECT tok, cnt AS exact FROM tc
               ORDER BY cnt DESC, tok LIMIT 10),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    cells AS (
      SELECT j, substring(md5(tok || ':cms' || CAST(j AS VARCHAR)), 1, 2)
               AS bucket,
             sum(cnt) AS counter
      FROM tc CROSS JOIN js GROUP BY j, bucket),
    est AS (
      SELECT p.tok, p.exact, min(c.counter) AS cms_est
      FROM probes p CROSS JOIN js u
      JOIN cells c ON c.j = u.j AND c.bucket =
        substring(md5(p.tok || ':cms' || CAST(u.j AS VARCHAR)), 1, 2)
      GROUP BY p.tok, p.exact)
    SELECT tok, CAST(exact AS BIGINT) AS exact,
           CAST(cms_est AS BIGINT) AS cms_est,
           cms_est >= exact AS is_overestimate
    FROM est
    """,
)
def ext_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed with the
    exact top-10 tokens: the demo verifies the sketch's one-sided error
    (cms_est >= exact, always) against ground truth. See
    ``textops.countmin_sketch`` for why the d×256 grid is the
    mergeable, constant-size, map-side-partial heavy-hitter summary at
    100 TB."""
    d = load(spark, sf_dir, "documents")
    tok_counts = (
        d.select(F.explode(textops.tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sketch = textops.countmin_sketch(tok_counts)
    probes = (
        tok_counts.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(10)
        .select("tok", F.col("cnt").alias("exact"))
    )
    return textops.countmin_estimate(sketch, probes)


@register(
    "ext_winnow_fingerprints",
    survey_ref=(
        "[EXT] winnowing fingerprint selection (Schleimer et al. 2003 / "
        "MOSS): min-hash per sliding gram window — guaranteed-coverage "
        "local dedup index, bounded density ~2/(w+1)"
    ),
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, toks,
                 greatest(1, CAST(len(toks) - 5 + 1 AS INT)) AS n_grams
          FROM t),
    gr AS (SELECT doc_id, n_grams,
                  list_transform(range(0, n_grams),
                    i -> md5(array_to_string(
                           list_slice(toks, i + 1, i + 5), ' '))) AS grams
           FROM g),
    wi AS (SELECT doc_id, n_grams, grams,
                  greatest(1, len(grams) - 4 + 1) AS n_win
           FROM gr)
    SELECT doc_id, n_grams,
           CAST(to_json(list_sort(list_distinct(
             list_transform(range(0, n_win),
               i -> list_min(list_slice(grams, i + 1, i + 4)))
           ))) AS VARCHAR) AS winnow_fps
    FROM wi
    """,
)
def ext_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprint set per document (sorted, JSON at the gate
    boundary — the driver can't hash arrays). See
    ``textops.winnow_fingerprints`` for the coverage/density guarantees
    and why this beats fixed-stride sampling for copy detection.

    scale_out: the cost is per-row gram hashing + window minima, and
    the local single-file scan yields ONE split — without the
    conditional repartition the whole corpus hashes on 1 of 32 cores
    (no-op on real multi-split layouts; the scenario_source lesson)."""
    d = scale_out(load(spark, sf_dir, "documents"))
    toks = textops.tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.greatest(F.lit(1), (F.size(toks) - 4)).cast("int").alias("n_grams"),
        F.to_json(textops.winnow_fingerprints(F.col("text"))).alias(
            "winnow_fps"
        ),
    )


_TR_STEP = """
    c{i} AS (
      SELECT e.dst, sum(r.r // o.outdeg) AS inflow
      FROM edges e JOIN outdeg o USING (src) JOIN r{p} r ON r.id = e.src
      GROUP BY e.dst),
    r{i} AS (
      SELECT nodes.id,
             ((1000000000000 // (SELECT count(*) FROM nodes)) * 15) // 100
               + (85 * COALESCE(c{i}.inflow, 0)) // 100 AS r
      FROM nodes LEFT JOIN c{i} ON c{i}.dst = nodes.id)
"""


@register(
    "ext_textrank_keywords",
    survey_ref=(
        "[EXT] TextRank keyword extraction (Mihalcea & Tarau 2004): "
        "PageRank over the token co-occurrence graph — composition of "
        "operators/graph.py with the tokenizer; co-occurrence counts "
        "act as edge weights via row multiplicity; scaled-integer "
        "arithmetic keeps the 3-iteration run exactly oracle-checkable"
    ),
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    bi AS (SELECT doc_id, tok,
                  lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
           FROM ex),
    e0 AS (SELECT tok AS src, nxt AS dst FROM bi WHERE nxt IS NOT NULL
           UNION ALL
           SELECT nxt, tok FROM bi WHERE nxt IS NOT NULL),
    edges AS (SELECT src, dst FROM e0 WHERE src <> dst),
    nodes AS (SELECT DISTINCT tok AS id FROM ex),
    outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT id, 1000000000000 // (SELECT count(*) FROM nodes) AS r
           FROM nodes),
    {",".join(_TR_STEP.format(i=i, p=i - 1) for i in (1, 2, 3))}
    SELECT id AS keyword, CAST(r AS BIGINT) AS rank_scaled
    FROM r3 ORDER BY r DESC, id LIMIT 50
    """,
)
def ext_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus keywords by TextRank: undirected token
    co-occurrence edges (adjacent tokens, both directions, multiplicity
    = weight) fed to the integer-exact PageRank operator.

    Scale shape: the edge build is one posexplode + per-doc lead window
    (doc-keyed shuffle); the vocabulary graph that iterates is
    VOCABULARY-sized, not corpus-sized — the 100 TB corpus reduces to
    a few-million-node word graph before any iteration. Top-k is a
    TakeOrderedAndProject with (rank, keyword) tie-break so the
    LIMIT set is deterministic cross-engine."""
    from pyspark.sql import Window

    from shippai_knowledge_etl_spark.operators.graph import pagerank

    ex = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(textops.tokenize(F.col("text"))).alias("pos", "tok"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        ex.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("tok", "nxt")
    )
    e0 = bi.select(F.col("tok").alias("src"), F.col("nxt").alias("dst")).unionAll(
        bi.select(F.col("nxt").alias("src"), F.col("tok").alias("dst"))
    )
    # persist, NOT localCheckpoint (round 13, both measured): ``nodes``
    # is a corpus-sized computation (tokenize + explode + distinct)
    # consumed by the count, the rank init, and every PageRank round's
    # left join — unbarriered, each consumer re-ran the tokenize
    # pipeline (7.2 s median at sf0.1). localCheckpoint made it WORSE
    # (18.1 s): a checkpointed RDD reports UnknownPartitioning, so
    # every round re-exchanged the node side that the distinct's
    # hashpartitioning(id) used to satisfy for free. persist keeps the
    # InMemoryRelation's output partitioning visible to the planner —
    # no recompute AND no new exchange.
    nodes = ex.select(F.col("tok").alias("id")).distinct().persist()
    n = nodes.count()
    ranks = pagerank(nodes, e0, n_iters=3, n_nodes=n)
    return (
        ranks.select(F.col("id").alias("keyword"), F.col("rank_scaled").cast("long"))
        .orderBy(F.col("rank_scaled").desc(), "keyword")
        .limit(50)
    )


@register(
    "ext_bpe_train",
    survey_ref="[EXT] in-engine BPE tokenizer training (Sennrich et al. "
    "2016): corpus → vocabulary-sized word histogram (the ONE corpus "
    "shuffle) → N distributed pair-count rounds with 1-row argmax probes "
    "— iterative, not SQL-expressible → rows-only at the driver gate; "
    "merge-semantics parity with the published algorithm is pinned by the "
    "pure-Python golden in tests/test_bpe.py",
)
def ext_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 10 merges on the documents corpus and return the ordered
    merge table. Deterministic at any parallelism (exact integer pair
    counts, count-desc / pair-lexicographic tie-break), so the output
    is stable even though the driver gate can only count rows."""
    from shippai_knowledge_etl_spark.operators import bpe

    d = load(spark, sf_dir, "documents")
    merges, _ = bpe.bpe_train(bpe.word_histogram(d, "text"), 10)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


@register(
    "ext_bpe_encode",
    survey_ref="[EXT] corpus-scale BPE tokenization: the trained vocabulary "
    "(word → subword segmentation, vocabulary-sized) broadcasts back onto "
    "the corpus — the standard tokenizer-apply shape: explode words, "
    "broadcast-join the segmentation table, aggregate. Derivation is "
    "iterative (not SQL) → rows-only; encode/train consistency is pinned "
    "in tests/test_bpe.py",
)
def ext_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source subword statistics under a 20-merge BPE model trained
    on the same corpus. Integer counts + one final division, so the
    output is deterministic at any parallelism. At 100 TB: training
    touches the corpus once (word histogram); this encode pass is the
    SECOND and last corpus-sized operation, and the join side it
    carries is only the vocabulary."""
    from shippai_knowledge_etl_spark.operators import bpe

    d = load(spark, sf_dir, "documents")
    _, state = bpe.bpe_train(bpe.word_histogram(d, "text"), 20)
    vocab = state.select(
        "word", F.size(F.split("syms", " ")).cast("long").alias("n_subwords")
    )
    words = d.select(
        "source", F.explode(textops.tokenize(F.col("text"))).alias("word")
    )
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_subwords"),
        )
        .withColumn(
            "subwords_per_word",
            F.round(F.col("n_subwords") / F.col("n_words"), 6),
        )
    )


@register(
    "ext_char_entropy",
    survey_ref="[EXT] character-distribution entropy quality signal: "
    "per-doc Shannon entropy over characters — the gibberish / base64 / "
    "repeated-filler detector compression-ratio screening approximates; "
    "one char explode into a (doc, char)-keyed partial-aggregated "
    "count, per-char terms rounded to 6 dp and summed as DECIMAL so "
    "the per-doc entropy is exact at any partitioning",
    oracle="""
    WITH chars AS (
      SELECT doc_id, length(text) AS len, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0),
    counts AS (
      SELECT doc_id, len, ch, count(*) AS c
      FROM chars GROUP BY doc_id, len, ch)
    SELECT doc_id,
           CAST(len AS BIGINT) AS n_chars,
           count(*) AS n_distinct_chars,
           round(CAST(sum(CAST(round(
                   -(c / CAST(len AS DOUBLE))
                   * ln(c / CAST(len AS DOUBLE)), 6)
                 AS DECIMAL(18,6))) AS DOUBLE), 6) AS entropy
    FROM counts GROUP BY doc_id, len
    """,
)
def ext_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy -sum p_c ln p_c: natural text
    sits in a mid band, repeated filler collapses toward 0, uniform
    noise / base64 pushes toward ln(alphabet). The distribution-shape
    quality check that length and stopword ratios can't see.

    Scale shape: the char explode is the only row expansion (linear in
    corpus bytes, like the token ops); (doc, char) counts partial-
    aggregate map-side — at most |alphabet| rows per doc reach the one
    doc-keyed shuffle, and the entropy rollup reuses that partitioning
    (AQE coalesces). Each -p·ln(p) term is rounded to 6 dp and summed
    as DECIMAL(18,6): exact, order-independent, hash-gate-safe; the
    engines' ln agree because the operand p is identical and ln is
    correctly rounded for these magnitudes after the 6 dp round.
    Empty docs are excluded on both sides (no chars, entropy
    undefined)."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chars = d.select(
        "doc_id",
        F.length("text").alias("len"),
        F.explode(F.split("text", "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "len", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    p = F.col("c") / F.col("len").cast("double")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return counts.groupBy("doc_id", "len").agg(
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(F.sum(term).cast("double"), 6).alias("entropy"),
    ).select(
        "doc_id",
        F.col("len").cast("long").alias("n_chars"),
        "n_distinct_chars",
        "entropy",
    )


@register(
    "ext_zipf_fit",
    survey_ref="[EXT] Zipf power-law fit of the corpus term-frequency "
    "distribution: least-squares slope/intercept of ln(freq) vs "
    "ln(rank) over the top-100 terms — the corpus-health diagnostic "
    "(natural text slopes near -1; templated or synthetic corpora "
    "deviate sharply); closed-form sums with DECIMAL-exact "
    "accumulation, rank cut by TakeOrderedAndProject before the "
    "100-row window",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS term FROM documents),
    freq AS (
      SELECT term, count(*) AS freq FROM toks GROUP BY term),
    top AS (
      SELECT term, freq FROM freq ORDER BY freq DESC, term ASC LIMIT 100),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
      FROM top),
    pts AS (
      SELECT CAST(round(ln(rank), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(ln(freq), 6) AS DECIMAL(18,6)) AS y
      FROM ranked),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx
      FROM pts),
    fit AS (
      SELECT n, sx, sy,
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
      FROM s)
    SELECT CAST(n AS BIGINT) AS n_terms, slope,
           round((sy - slope * sx) / n, 6) AS intercept
    FROM fit
    """,
)
def ext_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of ln(freq) against ln(rank) for the 100 most
    frequent terms. Every ln operand is an exact integer (rank or
    count), its log rounded to 6 dp on both engines, the five
    regression sums accumulated as exact DECIMAL products, and only
    the final closed-form slope/intercept divisions run in double —
    with token-identical operand order both sides, so the hash gate is
    exact (the ext_char_entropy discipline).

    Scale shape: the term count is the standard vocabulary-keyed
    shuffle (map-side combined); the global top-100 is a
    TakeOrderedAndProject (never a full sort), and the rank window
    runs AFTER that cut, so its SinglePartition exchange moves 100
    rows at any corpus size (the retrieval_rrf_fusion discipline);
    the regression itself is one 5-column aggregate over 100 rows."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(textops.tokenize(F.col("text"))).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    top = freq.orderBy(F.desc("freq"), F.asc("term")).limit(100)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term"))),
    )
    pts = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    return s.select(
        n.cast("long").alias("n_terms"),
        slope.alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "ext_unigram_train",
    survey_ref="[EXT] in-engine unigram-LM tokenizer training (Kudo "
    "2018, SentencePiece): over-complete substring seed vocabulary → "
    "fixed Viterbi-EM rounds over the word histogram (one Arrow pass "
    "per round, vocabulary-sized state) → pruned (piece, count) "
    "vocabulary — Viterbi is not SQL-expressible → rows-only; golden "
    "parity with a pure-Python reference is pinned in "
    "tests/test_unigram.py",
)
def ext_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-piece unigram-LM vocabulary (2 EM rounds, pieces ≤ 4 chars)
    trained on the documents corpus. Counts are the final E-step's
    exact integer Viterbi totals, so the output is a pure function of
    the corpus — deterministic at any parallelism even though the
    driver gate can only count rows."""
    from shippai_knowledge_etl_spark.operators import bpe, unigram_lm

    d = load(spark, sf_dir, "documents")
    vocab = unigram_lm.unigram_train(
        bpe.word_histogram(d, "text"), vocab_size=128, n_iters=2
    )
    return spark.createDataFrame(
        [(p, c, len(p)) for p, c in vocab],
        "piece string, count long, piece_len int",
    )


@register(
    "ext_unigram_encode",
    survey_ref="[EXT] corpus-scale unigram-LM tokenization: each "
    "DISTINCT word segmented once by Viterbi (vocabulary-sized Arrow "
    "input), then the segmentation table broadcast-joins back onto "
    "the exploded corpus — the tokenizer-apply shape shared with "
    "ext_bpe_encode; rows-only (Viterbi), encode/train consistency "
    "pinned in tests/test_unigram.py",
)
def ext_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source subword statistics under the 128-piece unigram LM
    trained on the same corpus. Integer counts + one final division:
    deterministic at any parallelism. At 100 TB the corpus is touched
    twice (histogram, encode join) and the Python path only ever sees
    the distinct-word table."""
    from shippai_knowledge_etl_spark.operators import bpe, textops, unigram_lm

    d = load(spark, sf_dir, "documents")
    hist = bpe.word_histogram(d, "text")
    vocab = unigram_lm.unigram_train(hist, vocab_size=128, n_iters=2)
    seg = unigram_lm.segment_words(hist, vocab).select("word", "n_pieces")
    words = d.select(
        "source", F.explode(textops.tokenize(F.col("text"))).alias("word")
    )
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
        )
        .withColumn(
            "pieces_per_word",
            F.round(F.col("n_pieces") / F.col("n_words"), 6),
        )
    )


@register(
    "ext_collocations",
    survey_ref="[EXT] PMI collocation mining (Church & Hanks 1990): "
    "corpus-level pointwise mutual information over adjacent token "
    "pairs — the multiword-expression / tokenizer-merge-candidate "
    "signal; bigram counts partial-aggregate to the bigram vocabulary, "
    "marginals derive from that table, never a second corpus pass",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    bi AS (SELECT doc_id, tok,
                  lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
           FROM ex),
    co AS (SELECT tok AS tok_a, nxt AS tok_b, count(*) AS n_cooccur
           FROM bi WHERE nxt IS NOT NULL GROUP BY tok_a, tok_b),
    lf AS (SELECT tok_a, sum(n_cooccur) AS n_left FROM co GROUP BY tok_a),
    rt AS (SELECT tok_b, sum(n_cooccur) AS n_right FROM co GROUP BY tok_b),
    tt AS (SELECT sum(n_cooccur) AS n_pairs FROM co)
    SELECT c.tok_a, c.tok_b, CAST(c.n_cooccur AS BIGINT) AS n_cooccur,
           round(ln(CAST(c.n_cooccur AS DOUBLE) * t.n_pairs
                    / (CAST(l.n_left AS DOUBLE) * r.n_right)), 6) AS pmi
    FROM co c JOIN lf l USING (tok_a) JOIN rt r USING (tok_b)
    CROSS JOIN tt t
    WHERE c.n_cooccur >= 5
    """,
)
def ext_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PMI of adjacent token pairs, reported for pairs
    seen >= 5 times: pmi = ln(co * total / (left * right)) over the
    bigram contingency table. High-PMI pairs are multiword
    expressions (tokenizer merge candidates, phrase-dictionary
    seeds); low-PMI frequent pairs flag boilerplate.

    Scale shape: ONE tokenize → posexplode pass; the doc-keyed lead
    window rides the same partitioning the repetition profile uses;
    bigram counts partial-aggregate map-side to the bigram VOCABULARY
    (Heaps-bounded), and the marginals + grand total derive from that
    vocabulary table — three cheap re-aggregations of an
    already-bounded relation, never a second corpus scan (the co
    table is persisted). The total rides a 1-row broadcast
    (allowlisted BNLJ shape, like ext_tfidf); marginal joins are
    vocabulary-keyed equi-joins. All counts exact integers; the one
    ln per SURVIVING pair rounds 6 dp with identical operand order
    (the ext_char_entropy precedent)."""
    d = load(spark, sf_dir, "documents")
    return textops.collocation_pmi(d, "doc_id", "text", min_count=5)


@register(
    "ext_heaps_fit",
    survey_ref="[EXT] Heaps-law vocabulary-growth fit V(n) ~ K*n^beta "
    "over 10 corpus prefixes - the companion corpus-health diagnostic "
    "to ext_zipf_fit (natural text: beta ~ 0.4-0.6; templated/"
    "synthetic corpora saturate or explode); first-occurrence + "
    "conditional pivot sums, NO cumulative-distinct window",
    oracle="""
    WITH ex AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    first AS (SELECT term, min(doc_id) AS fd FROM ex GROUP BY term),
    ntok AS (SELECT doc_id, count(*) AS nt FROM ex GROUP BY doc_id),
    vrow AS (SELECT sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 1 // 10 THEN 1 ELSE 0 END) AS v1, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 2 // 10 THEN 1 ELSE 0 END) AS v2, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 3 // 10 THEN 1 ELSE 0 END) AS v3, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 4 // 10 THEN 1 ELSE 0 END) AS v4, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 5 // 10 THEN 1 ELSE 0 END) AS v5, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 6 // 10 THEN 1 ELSE 0 END) AS v6, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 7 // 10 THEN 1 ELSE 0 END) AS v7, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 8 // 10 THEN 1 ELSE 0 END) AS v8, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 9 // 10 THEN 1 ELSE 0 END) AS v9, sum(CASE WHEN fd < (SELECT count(*) FROM documents) * 10 // 10 THEN 1 ELSE 0 END) AS v10 FROM first),
    trow AS (SELECT sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 1 // 10 THEN nt ELSE 0 END) AS t1, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 2 // 10 THEN nt ELSE 0 END) AS t2, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 3 // 10 THEN nt ELSE 0 END) AS t3, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 4 // 10 THEN nt ELSE 0 END) AS t4, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 5 // 10 THEN nt ELSE 0 END) AS t5, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 6 // 10 THEN nt ELSE 0 END) AS t6, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 7 // 10 THEN nt ELSE 0 END) AS t7, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 8 // 10 THEN nt ELSE 0 END) AS t8, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 9 // 10 THEN nt ELSE 0 END) AS t9, sum(CASE WHEN doc_id < (SELECT count(*) FROM documents) * 10 // 10 THEN nt ELSE 0 END) AS t10 FROM ntok),
    cells AS (SELECT * FROM vrow CROSS JOIN trow),
    pts0 AS (SELECT t1 AS tn, v1 AS vn FROM cells UNION ALL SELECT t2 AS tn, v2 AS vn FROM cells UNION ALL SELECT t3 AS tn, v3 AS vn FROM cells UNION ALL SELECT t4 AS tn, v4 AS vn FROM cells UNION ALL SELECT t5 AS tn, v5 AS vn FROM cells UNION ALL SELECT t6 AS tn, v6 AS vn FROM cells UNION ALL SELECT t7 AS tn, v7 AS vn FROM cells UNION ALL SELECT t8 AS tn, v8 AS vn FROM cells UNION ALL SELECT t9 AS tn, v9 AS vn FROM cells UNION ALL SELECT t10 AS tn, v10 AS vn FROM cells),
    pts AS (
      SELECT CAST(round(ln(CAST(greatest(tn, 1) AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS x,
             CAST(round(ln(CAST(greatest(vn, 1) AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS y
      FROM pts0),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx
      FROM pts),
    fit AS (
      SELECT n, sx, sy,
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta
      FROM s)
    SELECT CAST(n AS BIGINT) AS n_points, beta,
           round((sy - beta * sx) / n, 6) AS intercept
    FROM fit
    """.replace("{_TOKS}", _TOKS),
)
def ext_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of ln(vocabulary) against ln(token count)
    over 10 doc-id prefixes of the corpus. The prefix vocabulary is
    NOT a cumulative-distinct window (the classic scale trap): each
    term contributes its FIRST doc id once, so prefix vocab sizes are
    10 conditional pivot sums over the vocabulary table, and prefix
    token counts are the same pivot over per-doc counts - one
    tokenize pass, two Heaps-bounded aggregates, a 1-row x 1-row
    cross join (sketch-merge class), and the Zipf closed-form
    regression over exactly 10 points."""
    d = load(spark, sf_dir, "documents")
    n_docs = table_rowcount(sf_dir, "documents")
    cuts = [(n_docs * k) // 10 for k in range(1, 11)]
    ex = d.select(
        "doc_id", F.explode(textops.tokenize(F.col("text"))).alias("term")
    )
    first = ex.groupBy("term").agg(F.min("doc_id").alias("fd"))
    ntok = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    vrow = first.agg(
        *[
            F.sum(F.when(F.col("fd") < c, 1).otherwise(0)).alias(f"v{k}")
            for k, c in zip(range(1, 11), cuts)
        ]
    )
    trow = ntok.agg(
        *[
            F.sum(
                F.when(F.col("doc_id") < c, F.col("nt")).otherwise(0)
            ).alias(f"t{k}")
            for k, c in zip(range(1, 11), cuts)
        ]
    )
    cells = vrow.crossJoin(trow)
    pts0 = cells.selectExpr(
        "stack(10, t1, v1, t2, v2, t3, v3, t4, v4, t5, v5, t6, v6, t7, v7, t8, v8, t9, v9, t10, v10) AS (tn, vn)"
    )
    pts = pts0.select(
        F.round(F.log(F.greatest(F.col("tn"), F.lit(1)).cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.greatest(F.col("vn"), F.lit(1)).cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    beta = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return s.select(
        F.col("n").cast("long").alias("n_points"),
        beta.alias("beta"),
        F.round(
            (F.col("sy") - beta * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )


@register(
    "ext_derepetition",
    survey_ref="[EXT] intra-document de-repetition (doc-local form of "
    "Lee et al. 2022): later occurrences of a word 3-gram already "
    "seen in the same doc are removed (all 3 covered positions) and "
    "the text rebuilt in order — the self-repetition cleanup run "
    "before training; zero lambda HOFs "
    "(operators/curate.py:remove_repeated_ngrams)",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    g AS (
      SELECT doc, pos, tok,
             CASE WHEN lead(tok, 2) OVER w IS NOT NULL THEN
               concat_ws(' ', tok, lead(tok, 1) OVER w,
                         lead(tok, 2) OVER w)
             END AS gram
      FROM ex WINDOW w AS (PARTITION BY doc ORDER BY pos)),
    r AS (
      SELECT doc, pos, tok,
             CASE WHEN gram IS NOT NULL
                       AND min(pos) OVER (PARTITION BY doc, gram) < pos
                  THEN 1 ELSE 0 END AS rep
      FROM g),
    m AS (
      SELECT doc, pos, tok,
             max(rep) OVER (PARTITION BY doc ORDER BY pos
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS removed
      FROM r)
    SELECT doc AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(removed) AS BIGINT) AS n_removed,
           coalesce(string_agg(CASE WHEN removed = 0 THEN tok END,
                               ' ' ORDER BY pos), '') AS text_clean
    FROM m GROUP BY doc
    """,
)
def ext_derepetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove every later occurrence of an already-seen 3-gram within
    each document and rebuild the surviving text in order — the
    boilerplate/self-repetition cleanup (navigation loops, repeated
    disclaimers) applied doc-locally before training. Scale shape in
    ``curate.remove_repeated_ngrams``: doc-keyed windows over one
    posexplode pass + one (doc, gram) min shuffle; the rebuild is the
    lambda-free sorted-struct ``getField`` projection."""
    d = load(spark, sf_dir, "documents")
    from shippai_knowledge_etl_spark.operators.curate import (
        remove_repeated_ngrams,
    )

    return remove_repeated_ngrams(d, "doc_id", "text", n=3)


@register(
    "ext_readability",
    survey_ref=(
        "[EXT] readability scoring (Flesch 1948 reading ease + "
        "Flesch-Kincaid grade, Kincaid et al. 1975): vowel-group "
        "syllable heuristic, sentence split on [.!?] runs — the "
        "audience-level / complexity-mix signal curation pipelines "
        "bucket corpora by; pure per-row map, zero shuffles"
    ),
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
          AS BIGINT) AS n_sentences,
        CAST(len(regexp_extract_all(array_to_string(toks, ' '),
          '[aeiouy]+')) AS BIGINT) AS n_syllables
      FROM t)
    SELECT doc_id, n_words, n_sentences, n_syllables,
      CASE WHEN n_words > 0 THEN
        round(206.835
              - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
              - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
      END AS flesch_ease,
      CASE WHEN n_words > 0 THEN
        round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
              + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
              - 15.59, 6)
      END AS fk_grade
    FROM m
    """,
)
def ext_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document. The
    syllable count is the standard cheap heuristic — maximal
    [aeiouy]+ vowel groups over the token stream (counted with ONE
    regexp_count over the space-joined token array: spaces cannot
    merge groups across tokens, so this equals the per-token sum
    without any HOF lambda) — and sentences are maximal [.!?] runs,
    floored at 1 so fragments score rather than divide by zero.

    Hash-safety: both scores are PER-ROW double expressions with
    identical operand order in both engines (every IEEE op is
    exactly rounded, so identical inputs give bit-identical doubles;
    the banned pattern is cross-row double SUMS, which reorder under
    parallelism — none here), then one round(, 6) each. Scale: pure
    scan-side map riding the documents scan — the same zero-shuffle
    class as quality_score/gopher_rules."""
    d = scale_out(load(spark, sf_dir, "documents"))
    toks = textops.tokenize(F.col("text"))
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
        ).cast("long").alias("n_sentences"),
        F.regexp_count(F.array_join(toks, " "), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    has = F.col("n_words") > 0
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            has, F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6)
        ).alias("flesch_ease"),
        F.when(
            has, F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6)
        ).alias("fk_grade"),
    )


@register(
    "ext_langid_eval",
    survey_ref=(
        "[EXT] classifier evaluation: per-class precision/recall/F1 "
        "of the n-gram language-ID against the corpus's true lang "
        "labels — the eval loop every curation classifier needs; "
        "F1 computed as 2·tp/(n_true+n_pred) so ONE division covers "
        "it (no P·R/(P+R) float chain)"
    ),
    oracle=f"""
    WITH preds AS (
      SELECT doc_id, lang AS pred FROM ({_LANG_SCORE_SQL})
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, lang ASC) = 1),
    j AS (SELECT d.lang AS true_lang, p.pred
          FROM documents d JOIN preds p USING (doc_id)),
    cls AS (SELECT DISTINCT true_lang AS lang FROM j
            UNION SELECT DISTINCT pred FROM j),
    tp AS (SELECT true_lang AS lang, count(*) AS tp FROM j
           WHERE true_lang = pred GROUP BY 1),
    tr AS (SELECT true_lang AS lang, count(*) AS n_true FROM j GROUP BY 1),
    pr AS (SELECT pred AS lang, count(*) AS n_pred FROM j GROUP BY 1)
    SELECT c.lang,
           CAST(coalesce(tr.n_true, 0) AS BIGINT) AS n_true,
           CAST(coalesce(pr.n_pred, 0) AS BIGINT) AS n_pred,
           CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
           CASE WHEN coalesce(pr.n_pred, 0) > 0 THEN
             round(CAST(coalesce(tp.tp, 0) AS DOUBLE) / pr.n_pred, 6)
           END AS precision,
           CASE WHEN coalesce(tr.n_true, 0) > 0 THEN
             round(CAST(coalesce(tp.tp, 0) AS DOUBLE) / tr.n_true, 6)
           END AS recall,
           CASE WHEN coalesce(tr.n_true, 0) + coalesce(pr.n_pred, 0) > 0
           THEN round(CAST(2 * coalesce(tp.tp, 0) AS DOUBLE)
                      / (coalesce(tr.n_true, 0) + coalesce(pr.n_pred, 0)),
                      6)
           END AS f1
    FROM cls c
    LEFT JOIN tp USING (lang)
    LEFT JOIN tr USING (lang)
    LEFT JOIN pr USING (lang)
    """,
)
def ext_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the marker-based language
    ID against the corpus's ground-truth lang column — the evaluation
    loop a curation pipeline runs before trusting any classifier gate
    (the langid family's missing third piece: scores → argmax → EVAL).

    Hash-safety: counts are exact integers; precision and recall are
    one rounded division each, and F1 uses the identity
    2PR/(P+R) = 2·tp/(n_true+n_pred) — a single division on integer
    operands instead of a float chain through already-divided P and
    R. Scale: predictions aggregate to |langs| rows before the three
    per-class joins (all tiny); the only stream-sized work is the
    argmax the langid operator already does."""
    d = load(spark, sf_dir, "documents")
    # Row-wise argmax (the curation-pipeline idiom): ONE projection,
    # no score explode, no doc_id window — measured 0.6 s vs 3.2 s for
    # the window form at sf0.1 (the long-format/window pair remains
    # demonstrated by ext_langid_scores / ext_langid_predict; an eval
    # over 100 TB cannot afford a doc-keyed shuffle just for argmax).
    # sort_array on (-score, lang) structs == the window's
    # (score DESC, lang ASC) order, so predictions are identical.
    toks_b = d.select(
        "doc_id",
        F.col("lang"),
        F.explode(F.array(textops.tokenize(F.col("text")))).alias("toks"),
    )
    arr = F.array(
        *[
            F.struct(
                (-textops.marker_hits(F.col("toks"), w)).alias("ns"),
                F.lit(lang).alias("lang"),
            )
            for lang, w in sorted(textops.LANG_MARKERS.items())
        ]
    )
    # true label rides the same projection — no self-join back to the
    # corpus (which would re-run the scan+tokenize pipeline twice and
    # add a doc-keyed shuffle join for nothing)
    j = toks_b.select(
        F.col("lang").alias("true_lang"),
        F.sort_array(arr)[0].getField("lang").alias("pred_lang"),
    )
    cls = (
        j.select(F.col("true_lang").alias("lang"))
        .union(j.select(F.col("pred_lang").alias("lang")))
        .distinct()
    )
    tp = (
        j.filter(F.col("true_lang") == F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("lang"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    tr = j.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    pr = j.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    nt = F.coalesce(F.col("n_true"), F.lit(0))
    np_ = F.coalesce(F.col("n_pred"), F.lit(0))
    tpc = F.coalesce(F.col("tp"), F.lit(0))
    return (
        cls.join(tp, "lang", "left")
        .join(tr, "lang", "left")
        .join(pr, "lang", "left")
        .select(
            "lang",
            nt.cast("long").alias("n_true"),
            np_.cast("long").alias("n_pred"),
            tpc.cast("long").alias("tp"),
            F.when(np_ > 0, F.round(tpc.cast("double") / F.col("n_pred"), 6))
            .alias("precision"),
            F.when(nt > 0, F.round(tpc.cast("double") / F.col("n_true"), 6))
            .alias("recall"),
            F.when(
                nt + np_ > 0,
                F.round((2 * tpc).cast("double") / (nt + np_), 6),
            ).alias("f1"),
        )
    )


@register(
    "ext_score_lift",
    survey_ref=(
        "[EXT] cumulative gains / lift table for a ranking score "
        "(the campaign-targeting readout): English-marker score vs "
        "true lang='en' labels, score-bucketed (bounded domain, "
        "capped at 10) — per-bucket precision, cumulative capture "
        "rate and lift scanning from the highest score down"
    ),
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang = 'en' AS pos,
             least(len(list_filter({_TOKS},
               x -> x IN ('the','and','of','to','is'))), 10) AS bucket
      FROM documents),
    b AS (
      SELECT bucket, count(*) AS n,
             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos
      FROM s GROUP BY bucket),
    t AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM b),
    c AS (
      SELECT bucket, n, n_pos,
             sum(n) OVER (ORDER BY bucket DESC) AS cum_n,
             sum(n_pos) OVER (ORDER BY bucket DESC) AS cum_pos
      FROM b)
    SELECT c.bucket,
           CAST(c.n AS BIGINT) AS n,
           CAST(c.n_pos AS BIGINT) AS n_pos,
           CAST(c.cum_n AS BIGINT) AS cum_n,
           CAST(c.cum_pos AS BIGINT) AS cum_pos,
           round(CAST(c.n_pos AS DOUBLE) / c.n, 6) AS bucket_precision,
           round(CAST(c.cum_pos AS DOUBLE) / t.tp, 6) AS capture_rate,
           round((CAST(c.cum_pos AS DOUBLE) / c.cum_n)
                 / (CAST(t.tp AS DOUBLE) / t.tn), 6) AS lift
    FROM c, t
    """,
)
def ext_score_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table for the English-marker score against true
    lang = 'en' labels — the standard "how much better than random is
    targeting the top buckets" readout (per-bucket precision,
    cumulative capture rate, lift vs base rate), the eval that turns
    any ranking score into a business decision.

    Scale shape: scores bucket into a BOUNDED domain (stopword count
    capped at 10) so the per-bucket rollup is ≤11 rows and the two
    cumulative windows move ≤11 rows through their SinglePartition
    exchange at any corpus size (allowlisted, the w15/zipf
    discipline); base-rate totals ride a 1-row broadcast
    (allowlisted). Counts exact; three rounded divisions with
    identical operand order."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = textops.tokenize(F.col("text"))
    stop_hits = sum(
        (F.size("toks") - F.size(F.array_remove(F.col("toks"), w)))
        for w in ("the", "and", "of", "to", "is")
    )
    s = d.select(
        "doc_id", (F.col("lang") == "en").alias("pos"), toks.alias("toks")
    ).select(
        "doc_id", "pos", F.least(stop_hits, F.lit(10)).alias("bucket")
    )
    b = s.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("pos").cast("int")).alias("n_pos"),
    )
    t = b.agg(F.sum("n").alias("tn"), F.sum("n_pos").alias("tp"))
    w = Window.orderBy(F.col("bucket").desc()).rangeBetween(
        Window.unboundedPreceding, 0
    )
    c = b.withColumn("cum_n", F.sum("n").over(w)).withColumn(
        "cum_pos", F.sum("n_pos").over(w)
    )
    return c.crossJoin(F.broadcast(t)).select(
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("cum_pos").cast("long").alias("cum_pos"),
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias(
            "bucket_precision"
        ),
        F.round(F.col("cum_pos").cast("double") / F.col("tp"), 6).alias(
            "capture_rate"
        ),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("cum_n"))
            / (F.col("tp").cast("double") / F.col("tn")),
            6,
        ).alias("lift"),
    )


@register(
    "ext_hapax_rate",
    survey_ref=(
        "[EXT] hapax-legomena vocabulary health per source: the "
        "fraction of a slice's vocabulary seen exactly once — "
        "Zipf's tail mass; near-zero hapax rate marks templated/"
        "machine-generated slices, Heaps' law (ext_heaps_fit) gives "
        "the growth curve, this gives the per-slice scalar"
    ),
    oracle=f"""
    WITH tf AS (
      SELECT source, tok, count(*) AS tf
      FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY source, tok)
    SELECT source,
           count(*) AS n_terms,
           CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_rate
    FROM tf GROUP BY source
    """,
)
def ext_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax-legomena rate: what fraction of the slice's
    vocabulary occurs exactly once. Natural text keeps a fat Zipf
    tail (hapax ≈ 40-60 % of vocabulary); templated or generated
    slices re-use a closed vocabulary and the rate collapses — the
    one-scalar vocabulary-health screen beside Heaps' growth fit.

    Scale shape: one (source, token) count with map-side partials —
    the postings rollup every text query already pays — then a
    per-source reduction over vocabulary-sized rows; exact integer
    counts, one rounded division."""
    d = scale_out(load(spark, sf_dir, "documents"))
    tf = (
        d.select("source", F.explode(textops.tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    one = (F.col("tf") == 1).cast("int")
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(one).cast("long").alias("n_hapax"),
        F.round(F.sum(one).cast("double") / F.count(F.lit(1)), 6).alias(
            "hapax_rate"
        ),
    )


@register(
    "ext_quantile_normalize",
    survey_ref=(
        "[EXT] per-source quantile normalization (percent_rank): the "
        "feature-normalization that makes length/quality scores "
        "comparable ACROSS sources with different distributions — "
        "rank-based, so source-specific scale/skew cancels; "
        "source-partitioned window, never a global sort"
    ),
    oracle="""
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id), 6)
             AS length_pctile
    FROM documents
    """,
)
def ext_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document length within each source: a 700-
    char doc may be long for a tweets source and short for a papers
    source — rank-based normalization makes cross-source thresholds
    (quality gates, length batching) mean the same thing everywhere.
    percent_rank has identical semantics in both engines; (value, id)
    ordering makes ties deterministic; the single rounded value is a
    ratio of integer ranks.

    Scale shape: one source-partitioned window — the shuffle key is
    the natural layout key (source-partitioned storage makes it
    exchange-free); never a global sort."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.percent_rank().over(w), 6).alias("length_pctile"),
    )


@register(
    "ext_distinct_ngrams",
    survey_ref=(
        "[EXT] distinct-n-gram diversity (the distinct-n generation/"
        "corpus-diversity metric, Li et al. 2016): per-source type-"
        "token ratios at n=1/2/3 — collapsing diversity flags "
        "template-generated or over-deduplicated slices"
    ),
    oracle=f"""
    WITH base AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, source, unnest(toks) AS tok,
                  unnest(range(len(toks))) AS pos FROM base),
    g AS (
      SELECT source, tok,
             lead(tok, 1) OVER w AS nxt,
             lead(tok, 2) OVER w AS nxt2
      FROM ex WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    r AS (
      SELECT source, tok AS uni,
             CASE WHEN nxt IS NOT NULL
                  THEN tok || ' ' || nxt END AS bi,
             CASE WHEN nxt2 IS NOT NULL
                  THEN tok || ' ' || nxt || ' ' || nxt2 END AS tri
      FROM g)
    SELECT source,
           count(uni) AS n_1, count(DISTINCT uni) AS d_1,
           count(bi) AS n_2, count(DISTINCT bi) AS d_2,
           count(tri) AS n_3, count(DISTINCT tri) AS d_3,
           round(CAST(count(DISTINCT uni) AS DOUBLE) / count(uni), 6)
             AS ttr_1,
           round(CAST(count(DISTINCT bi) AS DOUBLE) / count(bi), 6)
             AS ttr_2,
           round(CAST(count(DISTINCT tri) AS DOUBLE) / count(tri), 6)
             AS ttr_3
    FROM r GROUP BY source
    """,
)
def ext_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity per source: unique/total ratio for
    unigrams, bigrams, trigrams — the corpus-health dial that drops
    when a slice is template-generated, boilerplate-heavy, or
    synthetic-model output (distinct-n is the standard generation-
    diversity metric; at corpus level it screens SOURCES the same
    way). Ratios near 1 at n=3 = healthy natural text; a source whose
    ttr_3 collapses is repeating itself.

    Scale shape: n-grams assemble inside ONE doc-keyed sort window
    (two leads, no self-join, no explode beyond the token pass); the
    per-source multi-distinct aggregate is Spark's Expand strategy —
    3x the gram rows map-side, partials collapse before the single
    source-keyed exchange. Grand totals are integers; each ratio is
    one rounded division at the gate."""
    from pyspark.sql import Window as SqlWindow

    d = load(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        "source",
        F.posexplode(textops.tokenize(F.col("text"))).alias(
            "pos", "tok"
        ),
    )
    w = SqlWindow.partitionBy("doc_id").orderBy("pos")
    g = ex.select(
        "source",
        "tok",
        F.lead("tok", 1).over(w).alias("nxt"),
        F.lead("tok", 2).over(w).alias("nxt2"),
    )
    r = g.select(
        "source",
        F.col("tok").alias("uni"),
        F.when(
            F.col("nxt").isNotNull(),
            F.concat_ws(" ", "tok", "nxt"),
        ).alias("bi"),
        F.when(
            F.col("nxt2").isNotNull(),
            F.concat_ws(" ", "tok", "nxt", "nxt2"),
        ).alias("tri"),
    )
    a = r.groupBy("source").agg(
        F.count("uni").alias("n_1"),
        F.countDistinct("uni").alias("d_1"),
        F.count("bi").alias("n_2"),
        F.countDistinct("bi").alias("d_2"),
        F.count("tri").alias("n_3"),
        F.countDistinct("tri").alias("d_3"),
    )
    return a.select(
        "source",
        "n_1",
        "d_1",
        "n_2",
        "d_2",
        "n_3",
        "d_3",
        F.round(F.col("d_1").cast("double") / F.col("n_1"), 6).alias(
            "ttr_1"
        ),
        F.round(F.col("d_2").cast("double") / F.col("n_2"), 6).alias(
            "ttr_2"
        ),
        F.round(F.col("d_3").cast("double") / F.col("n_3"), 6).alias(
            "ttr_3"
        ),
    )


@register(
    "ext_cms_pruned_frequent",
    survey_ref=(
        "[EXT] sketch-pruned exact frequent-term mining: CMS "
        "candidates (one-sided error -> NO false negatives) + exact "
        "verification of the candidate vocabulary only — the "
        "j8_bloom_semi_reduction pattern applied to heavy hitters; "
        "the qualified set provably equals a plain HAVING filter"
    ),
    oracle=f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    tc AS (SELECT tok, count(*) AS exact FROM toks GROUP BY tok),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    cells AS (
      SELECT j, substring(md5(tok || ':cms' || CAST(j AS VARCHAR)), 1, 2)
               AS bucket,
             sum(exact) AS counter
      FROM tc CROSS JOIN js GROUP BY j, bucket),
    est AS (
      SELECT p.tok, p.exact, min(c.counter) AS cms_est
      FROM tc p CROSS JOIN js u
      JOIN cells c ON c.j = u.j AND c.bucket =
        substring(md5(p.tok || ':cms' || CAST(u.j AS VARCHAR)), 1, 2)
      GROUP BY p.tok, p.exact)
    SELECT tok,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(exact AS BIGINT) AS exact,
           exact >= 400 AS qualified
    FROM est WHERE cms_est >= 400
    """,
)
def ext_cms_pruned_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All tokens with exact count >= 400, found the sketch-pruned
    way: the count-min estimate NEVER underestimates (one-sided
    error), so `cms_est >= T` is a SUPERSET of the true frequent set —
    exact counting then runs over the candidate vocabulary only, and
    the `qualified` rows provably equal `GROUP BY tok HAVING count >=
    T`. The un-qualified rows ARE the sketch's false positives,
    reported rather than hidden. At 100 TB the first pass is the
    constant-size mergeable CMS grid (map-side partials, d x 256 cells
    shuffle); the second pass filters the token stream to the
    candidate vocabulary BEFORE its aggregation — the ext_bm25
    vocabulary-filter discipline — instead of shuffling every distinct
    term's count. The j8_bloom_semi_reduction pattern, applied to
    aggregation instead of a join.

    Scale shape: sketch grid broadcast to the probe (1024 cells);
    candidate vocabulary is threshold-bounded; no full-vocabulary
    shuffle survives in the scale path."""
    d = load(spark, sf_dir, "documents")
    tok_counts = (
        d.select(F.explode(textops.tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sketch = textops.countmin_sketch(tok_counts)
    est = textops.countmin_estimate(
        sketch, tok_counts.select("tok", F.col("cnt").alias("exact"))
    )
    return est.filter(F.col("cms_est") >= 400).select(
        "tok",
        F.col("cms_est").cast("long").alias("cms_est"),
        F.col("exact").cast("long").alias("exact"),
        (F.col("exact") >= 400).alias("qualified"),
    )


@register(
    "ext_cms_join_cardinality",
    survey_ref=(
        "[EXT] CMS inner-product join-size estimation (Cormode & "
        "Muthukrishnan 2005 §4.2): |orders JOIN lineitem| estimated "
        "from two constant-size sketches as min_j sum_b A[j,b]*B[j,b] "
        "— a one-sided overestimate, all-integer; the statistic a "
        "cost-based planner needs BEFORE committing to a join "
        "strategy, computed without touching either table twice"
    ),
    oracle="""
    WITH ak AS (SELECT CAST(o_orderkey AS VARCHAR) AS tok, count(*) AS cnt
                FROM orders GROUP BY 1),
    bk AS (SELECT CAST(l_orderkey AS VARCHAR) AS tok, count(*) AS cnt
           FROM lineitem GROUP BY 1),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    ca AS (
      SELECT j, substring(md5(tok || ':cms' || CAST(j AS VARCHAR)), 1, 4)
               AS bucket,
             sum(cnt) AS counter
      FROM ak CROSS JOIN js GROUP BY j, bucket),
    cb AS (
      SELECT j, substring(md5(tok || ':cms' || CAST(j AS VARCHAR)), 1, 4)
               AS bucket,
             sum(cnt) AS counter
      FROM bk CROSS JOIN js GROUP BY j, bucket),
    dots AS (
      SELECT ca.j, sum(ca.counter * cb.counter) AS dot
      FROM ca JOIN cb ON cb.j = ca.j AND cb.bucket = ca.bucket
      GROUP BY ca.j),
    est AS (SELECT min(dot) AS est_join_size FROM dots),
    ex AS (
      SELECT count(*) AS exact_join_size
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
    SELECT CAST(e.est_join_size AS BIGINT) AS est_join_size,
           CAST(x.exact_join_size AS BIGINT) AS exact_join_size,
           e.est_join_size >= x.exact_join_size AS is_overestimate
    FROM est e, ex x
    """,
)
def ext_cms_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from sketches: |A ⋈ B| on a key equals the
    inner product of the two key-frequency vectors, and the CMS
    estimator min_j Σ_b A[j,b]·B[j,b] overestimates it one-sidedly
    (collisions only ADD cross terms) — the cardinality statistic a
    cost-based planner consults before picking broadcast vs shuffle vs
    sort-merge, here computed from two 1024-cell grids instead of a
    trial join. The demo carries the exact join count alongside and
    pins the one-sided-error contract (is_overestimate is part of the
    hash gate, so a sketch regression that ever underestimates fails
    the driver).

    Scale shape: each side collapses to per-key counts then to the
    d×256 mergeable grid map-side (the countmin_sketch path); the
    grid-grid join moves ≤1024 rows; the exact count is the one real
    key-keyed shuffle — which is the POINT: at 100 TB you run the
    sketch path and skip the trial join entirely. Two 1-row stats
    crossJoined at the gate (allowlisted class)."""
    o = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").cast("string").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").cast("string").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Wider grid than the heavy-hitter default: inner-product error is
    # ~N1*N2/width per hash row, so 2^16 buckets (4 hex chars) sizes
    # the estimate to ~1.2x at this key count where 256 buckets would
    # be ~60x (measured) — the width is the planner's error budget,
    # the construction is unchanged (min over d rows of cell-product
    # sums, mergeable, one-sided).
    def wide_cms(tc):
        cells = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.substring(
                        F.md5(
                            F.concat(F.col("tok"), F.lit(f":cms{j}"))
                        ),
                        1,
                        4,
                    ).alias("bucket"),
                )
                for j in range(4)
            ]
        )
        return (
            tc.select(F.explode(cells).alias("c"), F.col("cnt"))
            .groupBy(
                F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")
            )
            .agg(F.sum("cnt").alias("counter"))
        )

    ca = wide_cms(o)
    cb = wide_cms(li)
    dots = (
        ca.alias("a")
        .join(
            cb.alias("b"),
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .groupBy(F.col("a.j"))
        .agg(
            F.sum(F.col("a.counter") * F.col("b.counter")).alias("dot")
        )
    )
    est = dots.agg(F.min("dot").alias("est_join_size"))
    lo = load(spark, sf_dir, "orders").select("o_orderkey")
    ll = load(spark, sf_dir, "lineitem").select("l_orderkey")
    ex = (
        lo.join(ll, lo.o_orderkey == ll.l_orderkey)
        .agg(F.count(F.lit(1)).alias("exact_join_size"))
    )
    return est.crossJoin(F.broadcast(ex)).select(
        F.col("est_join_size").cast("long").alias("est_join_size"),
        F.col("exact_join_size").cast("long").alias("exact_join_size"),
        (F.col("est_join_size") >= F.col("exact_join_size")).alias(
            "is_overestimate"
        ),
    )


@register(
    "ext_wordpiece_encode",
    survey_ref=(
        "[EXT] WordPiece greedy longest-match-first encoding (Wu et "
        "al. 2016; the tokenizer triad's third member after BPE and "
        "unigram-LM): a 200-piece vocabulary ranked (count DESC, piece "
        "ASC) over all length-2..4 substrings of the corpus' words, "
        "then each DISTINCT word segmented longest-match-first — run "
        "in Spark as a vocab-closure Arrow map and replayed by the "
        "oracle as a DuckDB RECURSIVE CTE over the cursor positions: "
        "two execution models, one md5-fingerprinted piece sequence "
        "per document"
    ),
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents),
    words AS (
      SELECT doc_id, unnest(t) AS word, generate_subscripts(t, 1) AS pos
      FROM toks),
    cand AS (
      SELECT unnest(list_transform(
               range(0, greatest(length(word) - 1, 0)),
               s -> substring(word, s + 1, 2))) AS piece FROM words
      UNION ALL
      SELECT unnest(list_transform(
               range(0, greatest(length(word) - 2, 0)),
               s -> substring(word, s + 1, 3))) AS piece FROM words
      UNION ALL
      SELECT unnest(list_transform(
               range(0, greatest(length(word) - 3, 0)),
               s -> substring(word, s + 1, 4))) AS piece FROM words),
    vocab AS (
      SELECT piece FROM (
        SELECT piece, count(*) AS cnt FROM cand GROUP BY piece
        ORDER BY cnt DESC, piece ASC LIMIT 200)),
    dw AS (SELECT DISTINCT word FROM words),
    rec AS (
      SELECT word, 0 AS cur, CAST('' AS VARCHAR) AS lens,
             0 AS np, 0 AS nm
      FROM dw
      UNION ALL
      SELECT word, cur + step AS cur,
             lens || (CASE WHEN cur = 0 THEN '' ELSE ',' END)
                  || CAST(step AS VARCHAR) AS lens,
             np + 1 AS np,
             nm + (CASE WHEN step >= 2 THEN 1 ELSE 0 END) AS nm
      FROM (
        SELECT word, cur, lens, np, nm,
               CASE WHEN length(word) - cur >= 4
                     AND substring(word, cur + 1, 4)
                         IN (SELECT piece FROM vocab) THEN 4
                    WHEN length(word) - cur >= 3
                     AND substring(word, cur + 1, 3)
                         IN (SELECT piece FROM vocab) THEN 3
                    WHEN length(word) - cur >= 2
                     AND substring(word, cur + 1, 2)
                         IN (SELECT piece FROM vocab) THEN 2
                    ELSE 1 END AS step
        FROM rec WHERE cur < length(word))),
    enc AS (
      SELECT word, lens, np, nm FROM rec WHERE cur = length(word))
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(e.np) AS BIGINT) AS n_pieces,
           CAST(sum(e.nm) AS BIGINT) AS n_multi_pieces,
           md5(string_agg(e.lens, ';' ORDER BY w.pos)) AS fingerprint
    FROM words w JOIN enc e USING (word)
    GROUP BY w.doc_id
    """,
)
def ext_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece encoding with a data-derived vocabulary, hash-gated
    end to end: the vocab is the top-200 length-2..4 word substrings
    by corpus frequency (count DESC, piece ASC — a total order, so
    both engines cut the same 200), and every distinct word is then
    segmented greedy longest-match-first (try 4, then 3, then 2
    characters at the cursor; fall back to a single character). The
    per-document gate is an md5 fingerprint of the full piece-length
    sequence in token order — one differently-segmented word anywhere
    in the corpus breaks it. The oracle replays the greedy loop as a
    RECURSIVE CTE (the w35_holt_linear discipline: sequential
    recurrences cross-checked against a different execution model).

    Scale shape: substring candidates ride posexplode Generates (no
    lambda HOFs — Column.substr over a start-sequence column); the
    vocab is a TakeOrdered top-200 collected to the driver (a bounded
    codebook collect, the documented class); segmentation runs once
    per DISTINCT word (Zipf: vocabulary ≪ corpus) inside an Arrow
    map whose closure holds the 200-piece set; the rejoin is one
    word-keyed shuffle and the doc rollup reuses the existing
    sorted-struct assembly idiom (array_join of getField over
    sort_array — no lambda)."""
    from typing import Iterator

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(textops.tokenize(F.col("text"))).alias("pos", "word"),
    )
    # Round-12 optimization (guide §2.3): toks feeds the candidate
    # explode, the distinct-word segmentation AND the final rejoin —
    # the lazy localCheckpoint barrier (eval_meteor_frag idiom) stops
    # each consumer re-running tokenize+posexplode from the scan.
    toks = toks.localCheckpoint(eager=False)
    # One Generate for all three candidate lengths (was a 3-branch
    # union, i.e. three explode passes over toks): anchor on start
    # position s (valid for L=2 whenever len>=2), emit the 3/4-char
    # pieces only where they fit — the same (piece) multiset, so the
    # frequency cut picks the identical vocabulary.
    w = F.col("word")
    ln = F.length(w)
    pieces = F.array(
        w.substr(F.col("s") + 1, F.lit(2)),
        F.when(ln - F.col("s") >= 3, w.substr(F.col("s") + 1, F.lit(3))),
        F.when(ln - F.col("s") >= 4, w.substr(F.col("s") + 1, F.lit(4))),
    )
    cands = (
        toks.filter(F.length("word") >= 2)
        .select(
            "word",
            F.explode(F.sequence(F.lit(0), F.length("word") - 2)).alias("s"),
        )
        .select(F.explode(pieces).alias("piece"))
        .filter(F.col("piece").isNotNull())
    )
    vocab_rows = (
        cands.groupBy("piece")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(200)
        .collect()
    )  # bounded codebook collect: exactly 200 short strings
    vocab = {r.piece for r in vocab_rows}

    def segment(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for word in pdf["word"]:
                w = str(word)
                cur, lens, nm = 0, [], 0
                while cur < len(w):
                    step = 1
                    for L in (4, 3, 2):
                        if len(w) - cur >= L and w[cur : cur + L] in vocab:
                            step = L
                            break
                    lens.append(step)
                    nm += 1 if step >= 2 else 0
                    cur += step
                rows.append(
                    (w, ",".join(str(x) for x in lens), len(lens), nm)
                )
            yield pd.DataFrame(
                rows, columns=["word", "lens", "np", "nm"]
            )

    wmap = (
        toks.select("word")
        .distinct()
        .mapInPandas(segment, "word string, lens string, np long, nm long")
    )
    joined = toks.join(wmap, "word")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("np").cast("long").alias("n_pieces"),
        F.sum("nm").cast("long").alias("n_multi_pieces"),
        F.md5(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.struct("pos", "lens"))
                ).getField("lens"),
                ";",
            )
        ).alias("fingerprint"),
    )


_U8_DIGSUM = (
    "list_sum(list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),"
    " i -> unicode(substr(CAST(doc_id AS VARCHAR), i, 1))))"
)
_U8_NREPL = (
    "(CASE WHEN doc_id % 5 = 0 THEN 0"
    " WHEN doc_id % 4 = 3 THEN 1 ELSE doc_id % 4 + 1 END)"
)
_U8_PLANTED_BYTES = (
    "(CASE WHEN doc_id % 5 = 0 THEN 0"
    " WHEN doc_id % 4 = 0 THEN 1 WHEN doc_id % 4 = 1 THEN 2"
    " WHEN doc_id % 4 = 2 THEN 3 ELSE 2 END)"
)
_U8_TRAILING = "(CASE WHEN doc_id % 5 <> 0 AND doc_id % 4 = 3 THEN 0 ELSE 1 END)"


@register(
    "curation_utf8_sanitize",
    survey_ref=(
        "[EXT] UTF-8 intake audit (round 12 — the sanitize pass a "
        "crawl corpus runs BEFORE any tokenizer): a hand-rolled "
        "WHATWG maximal-subpart decoder (fuzz-pinned BYTE-EQUAL to "
        "CPython's errors='replace' over 3000 random byte soups plus "
        "every boundary case — the audioop/tarfile independent-"
        "implementation discipline) counts and substitutes U+FFFD for "
        "lone continuations, C0 AF overlongs (TWO replacements, the "
        "classic '/' smuggle refused), ED surrogates, and truncated "
        "multibyte tails; the oracle recomputes byte counts, "
        "codepoint counts, and FFFD-inclusive codepoint sums in "
        "closed form per planted case"
    ),
    oracle=f"""
    SELECT doc_id,
           CAST(1 + length(CAST(doc_id AS VARCHAR)) + 3
                + {_U8_PLANTED_BYTES} + {_U8_TRAILING} AS BIGINT)
             AS n_bytes,
           CAST(1 + length(CAST(doc_id AS VARCHAR)) + 1
                + {_U8_NREPL} + {_U8_TRAILING} AS BIGINT) AS n_codepoints,
           CAST(117 + {_U8_DIGSUM} + 12354 + doc_id % 60
                + 65533 * {_U8_NREPL} + 122 * {_U8_TRAILING} AS BIGINT)
             AS cp_sum,
           CAST({_U8_NREPL} AS BIGINT) AS n_replacements,
           doc_id % 5 = 0 AS clean
    FROM documents
    """,
)
def curation_utf8_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the byte stream actually text: every payload mixes ascii, a
    valid CJK multibyte, and (for 4 of 5 docs) one planted invalid
    sequence chosen to hit a DIFFERENT decoder bug class — the
    FFFD-inclusive cp_sum means the gate pins not just invalidity
    detection but the exact WHATWG substitution behavior (how many
    replacements, which bytes consumed per subpart). The overlong
    C0 AF row is the security case: a decoder that accepts it reads
    '/' where the bytes say otherwise, and its cp_sum breaks here.

    Scale shape (operators/textops.py:utf8_sanitize_features): one
    narrow Arrow map, no shuffle; five integers per document return
    to the JVM. Cites /root/reference/src/extract.py:36 (the
    reference trusts requests' decoding blindly; byte-level intake
    hygiene is [EXT] surface)."""
    from shippai_knowledge_etl_spark.operators.textops import (
        attach_utf8_payload,
        utf8_sanitize_features,
    )

    d = load(spark, sf_dir, "documents")
    return utf8_sanitize_features(attach_utf8_payload(d, "doc_id"))
