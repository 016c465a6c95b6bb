"""[EXT] Sketch query surface: Bloom membership, HLL distinct-count
state, and the incremental-crawl dedup they exist to serve.

Every hash here is salted md5 (the ``textops._cms_bucket`` discipline),
so the DuckDB oracles replicate the sketches bit-for-bit — including
Bloom false positives — and the driver's value-hash gate checks the
whole construction, not just an invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.operators import dedup, sketches
from shippai_knowledge_etl_spark.operators.textops import tokenize
from shippai_knowledge_etl_spark.tables import load

# DuckDB-side mirror of textops.tokenize (same as queries/textops.py).
_TOKS = (
    "list_filter(str_split(trim(regexp_replace(lower(text), "
    "'[^\\p{L}\\p{Nd}]+', ' ', 'g')), ' '), x -> x <> '')"
)

# DuckDB mirrors of sketches._bloom_pos / _word_and_mask, j-salted.
_BF_POS = "substring(md5({v} || ':bf' || CAST({j} AS VARCHAR)), 1, 4)"
_BF_WORD = f"substring({_BF_POS}, 1, 3)"
_BF_MASK = (
    f"CAST(power(2, strpos('0123456789abcdef', "
    f"substring({_BF_POS}, 4, 1)) - 1) AS BIGINT)"
)


@register(
    "ext_bloom_membership",
    survey_ref=(
        "[EXT] Bloom-filter membership (Bloom 1970): packed bit-words "
        "via bit_or aggregation, broadcast probe; salted-md5 hashes "
        "make even the false positives deterministic cross-engine"
    ),
    oracle=f"""
    WITH tokrows AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    probes AS (
      SELECT tok, bool_or(doc_id % 2 = 0) AS present
      FROM tokrows GROUP BY tok
    ),
    bloom AS (
      SELECT {_BF_WORD.format(v="m.tok", j="u.j")} AS word,
             bit_or({_BF_MASK.format(v="m.tok", j="u.j")}) AS bits
      FROM (SELECT tok FROM probes WHERE present) m, range(0, 4) u(j)
      GROUP BY 1
    ),
    pcells AS (
      SELECT p.tok, p.present,
             {_BF_WORD.format(v="p.tok", j="u.j")} AS word,
             {_BF_MASK.format(v="p.tok", j="u.j")} AS mask
      FROM probes p, range(0, 4) u(j)
    )
    SELECT c.tok, c.present,
           bool_and((COALESCE(b.bits, 0) & c.mask) = c.mask)
             AS might_contain,
           (bool_and((COALESCE(b.bits, 0) & c.mask) = c.mask)
            OR NOT c.present) AS no_false_negative
    FROM pcells c LEFT JOIN bloom b USING (word)
    GROUP BY c.tok, c.present
    """,
)
def ext_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Bloom filter over the distinct tokens of the even-id
    half of ``documents``, then probe it with EVERY distinct token.

    ``no_false_negative`` is the filter's one-sided guarantee and is
    true on every row; ``might_contain`` additionally exposes the
    (deterministic, oracle-replicated) false positives on odd-only
    tokens. Scale shape in ``sketches.bloom_build`` /
    ``bloom_might_contain`` docstrings: the filter is <=4096 rows at
    any corpus size and is the broadcast side of the probe join."""
    tokrows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    )
    probes = tokrows.groupBy("tok").agg(
        F.bool_or(F.col("doc_id") % 2 == 0).alias("present")
    )
    members = probes.filter(F.col("present")).select("tok")
    bloom = sketches.bloom_build(members, "tok")
    out = sketches.bloom_might_contain(bloom, probes, "tok", carry=("present",))
    return out.select(
        "tok",
        "present",
        "might_contain",
        (F.col("might_contain") | ~F.col("present")).alias("no_false_negative"),
    )


# DuckDB mirror of sketches.hll_register_rows' rank derivation.
_HLL_RANK = """
    CASE WHEN nz = 13 THEN 53 ELSE nz * 4 + CASE
      WHEN first = '1' THEN 3
      WHEN first IN ('2', '3') THEN 2
      WHEN first IN ('4', '5', '6', '7') THEN 1
      ELSE 0 END + 1 END
"""


@register(
    "ext_hll_distinct",
    survey_ref=(
        "[EXT] HyperLogLog distinct-count state (Flajolet et al. 2007): "
        "mergeable per-group max-rank registers, exact-integer scaled "
        "harmonic sum checked against countDistinct ground truth"
    ),
    oracle=f"""
    WITH tokrows AS (
      SELECT DISTINCT lang, unnest({_TOKS}) AS tok FROM documents
    ),
    h AS (
      SELECT lang, tok, md5(tok || ':hll') AS hx FROM tokrows
    ),
    parts AS (
      SELECT lang, substring(hx, 1, 2) AS reg,
             length(regexp_extract(substring(hx, 3, 13), '^(0*)', 1)) AS nz,
             substring(substring(hx, 3, 13),
                       length(regexp_extract(substring(hx, 3, 13),
                                             '^(0*)', 1)) + 1, 1) AS first
      FROM h
    ),
    regs AS (
      SELECT lang, reg, max(least({_HLL_RANK}, 40)) AS rank
      FROM parts GROUP BY lang, reg
    ),
    summary AS (
      SELECT lang,
             CAST(sum(CAST(power(2, 40 - rank) AS BIGINT))
                  + (256 - count(*)) * CAST(power(2, 40) AS BIGINT)
                  AS BIGINT) AS hll_sum_scaled,
             CAST(256 - count(*) AS INT) AS hll_zero_regs
      FROM regs GROUP BY lang
    ),
    exact AS (
      SELECT lang, count(DISTINCT tok) AS exact_distinct FROM tokrows
      GROUP BY lang
    )
    SELECT s.lang, e.exact_distinct, s.hll_sum_scaled, s.hll_zero_regs
    FROM summary s JOIN exact e USING (lang)
    """,
)
def ext_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token cardinality two ways: exact
    ``countDistinct`` ground truth next to the HLL register state
    (``hll_sum_scaled``/``hll_zero_regs`` — exact integers, see
    ``sketches.hll_summary`` for why the float estimate stays out of
    the hash gate). The register table is the 100 TB artifact: stored
    per shard, a max-merge answers distinct-across-shards without
    rescanning text; ``tests/test_sketches.py`` pins estimate accuracy
    and merge associativity."""
    tokrows = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(tokenize(F.col("text"))).alias("tok"))
        .distinct()
    )
    regs = sketches.hll_register_rows(tokrows, ["lang"], "tok")
    summary = sketches.hll_summary(regs, ["lang"])
    exact = tokrows.groupBy("lang").agg(
        F.countDistinct("tok").alias("exact_distinct")
    )
    return summary.join(exact, ["lang"]).select(
        "lang", "exact_distinct", "hll_sum_scaled", "hll_zero_regs"
    )


@register(
    "stream_sketch_state_merge",
    survey_ref=(
        "[EXT] streaming sketch state (batch-shaped witness): two "
        "micro-batch generations' HLL register states max-merged and "
        "a gen-1 fresh-key probe against the gen-0 Bloom — the exact "
        "merge/probe operations of streaming/sketches.py foreachBatch "
        "callbacks, hash-gated against a one-shot oracle"
    ),
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type FROM events
    ),
    hrows AS (
      SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS k FROM ev
    ),
    h AS (
      SELECT event_type, md5(k || ':hll') AS hx FROM hrows
    ),
    parts AS (
      SELECT event_type, substring(hx, 1, 2) AS reg,
             length(regexp_extract(substring(hx, 3, 13), '^(0*)', 1)) AS nz,
             substring(substring(hx, 3, 13),
                       length(regexp_extract(substring(hx, 3, 13),
                                             '^(0*)', 1)) + 1, 1) AS first
      FROM h
    ),
    regs AS (
      SELECT event_type, reg, max(least({_HLL_RANK}, 40)) AS rank
      FROM parts GROUP BY event_type, reg
    ),
    summary AS (
      SELECT event_type,
             CAST(sum(CAST(power(2, 40 - rank) AS BIGINT))
                  + (256 - count(*)) * CAST(power(2, 40) AS BIGINT)
                  AS BIGINT) AS hll_sum_scaled,
             CAST(256 - count(*) AS INT) AS hll_zero_regs
      FROM regs GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct_users
      FROM ev GROUP BY event_type
    ),
    g0k AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || ':' || event_type AS k
      FROM ev WHERE event_id % 2 = 0
    ),
    bloom AS (
      SELECT {_BF_WORD.format(v="m.k", j="u.j")} AS word,
             bit_or({_BF_MASK.format(v="m.k", j="u.j")}) AS bits
      FROM g0k m, range(0, 4) u(j)
      GROUP BY 1
    ),
    g1k AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || ':' || event_type AS k
      FROM ev WHERE event_id % 2 = 1
    ),
    pcells AS (
      SELECT p.event_type, p.k,
             {_BF_WORD.format(v="p.k", j="u.j")} AS word,
             {_BF_MASK.format(v="p.k", j="u.j")} AS mask
      FROM g1k p, range(0, 4) u(j)
    ),
    probed AS (
      SELECT c.event_type, c.k,
             bool_and((COALESCE(b.bits, 0) & c.mask) = c.mask) AS mc
      FROM pcells c LEFT JOIN bloom b USING (word)
      GROUP BY c.event_type, c.k
    ),
    freshagg AS (
      SELECT event_type, count(*) AS gen1_keys,
             count(*) FILTER (WHERE NOT mc) AS gen1_fresh
      FROM probed GROUP BY event_type
    )
    SELECT s.event_type, e.exact_distinct_users,
           s.hll_sum_scaled, s.hll_zero_regs, f.gen1_keys, f.gen1_fresh
    FROM summary s
    JOIN exact e USING (event_type)
    JOIN freshagg f USING (event_type)
    """,
)
def stream_sketch_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-shaped witness for ``streaming/sketches.py``: split
    ``events`` into two generations (event_id parity — stand-ins for
    two micro-batches), build each generation's HLL register state
    independently, MAX-MERGE them (the exact ``foreachBatch`` merge of
    ``streaming_hll_distinct``), and probe generation 1's distinct
    (user, event_type) keys against the generation-0 Bloom filter (the
    exact fresh-key emission of ``streaming_new_keys``).

    The oracle computes the HLL state ONE-SHOT over the union, so the
    hash gate proves merge associativity — the property the whole
    incremental design rests on — not just the register derivation;
    the Bloom fresh counts include the deterministic salted-md5 false
    positives, replicated cell-for-cell by the oracle. All output
    columns are exact integers. Scale shape: both sketches partial-
    aggregate map-side to constant-size state (<=256 rows/group HLL,
    <=4096 words Bloom) before any shuffle; the probe broadcasts the
    filter, never the key stream."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    gen0 = ev.filter(F.col("event_id") % 2 == 0)
    gen1 = ev.filter(F.col("event_id") % 2 == 1)

    def gen_regs(gen: DataFrame) -> DataFrame:
        return sketches.hll_register_rows(
            gen.select(
                "event_type", F.col("user_id").cast("string").alias("k")
            ),
            ["event_type"],
            "k",
        )

    merged = (
        gen_regs(gen0)
        .unionAll(gen_regs(gen1))
        .groupBy("event_type", "reg")
        .agg(F.max("rank").alias("rank"))
    )
    summary = sketches.hll_summary(merged, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct_users")
    )
    key = F.concat_ws(
        ":", F.col("user_id").cast("string"), F.col("event_type")
    ).alias("k")
    bloom0 = sketches.bloom_build(gen0.select(key).distinct(), "k")
    g1_keys = gen1.select("event_type", key).distinct()
    probed = sketches.bloom_might_contain(
        bloom0, g1_keys, "k", carry=("event_type",)
    )
    fresh = probed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("gen1_keys"),
        F.count_if(~F.col("might_contain")).alias("gen1_fresh"),
    )
    return (
        summary.join(exact, ["event_type"])
        .join(fresh, ["event_type"])
        .select(
            "event_type",
            "exact_distinct_users",
            "hll_sum_scaled",
            "hll_zero_regs",
            "gen1_keys",
            "gen1_fresh",
        )
    )


@register(
    "dedup_incremental",
    survey_ref=(
        "[EXT] incremental-crawl dedup: new batch vs existing corpus "
        "index on content hash, then first-occurrence within the batch "
        "— the daily-ingest form of dedup_exact"
    ),
    oracle="""
    WITH batch AS (
      SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 10 = 7
    ),
    index_hashes AS (
      SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 10 <> 7
    ),
    marked AS (
      SELECT b.doc_id, b.h, i.h IS NOT NULL AS in_index,
             min(b.doc_id) OVER (PARTITION BY b.h) AS first_id
      FROM batch b LEFT JOIN index_hashes i USING (h)
    )
    SELECT doc_id,
           CASE WHEN in_index THEN 'index_dup'
                WHEN doc_id <> first_id THEN 'batch_dup'
                ELSE 'kept' END AS verdict
    FROM marked
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a new crawl batch (doc_id % 10 = 7) against the already-
    ingested corpus: a doc is ``index_dup`` if its sha2-256 content
    hash exists in the index, ``batch_dup`` if an earlier doc in the
    same batch shares its hash, else ``kept``.

    Scale shape: the index side collapses to DISTINCT hashes with a
    map-side partial before the only wide shuffle (a hash join on the
    content hash — at 100 TB neither side is broadcastable, and
    hash-partitioning both on the join key is the correct plan); the
    within-batch first-occurrence window re-uses the same hash
    partitioning, so AQE coalesces rather than re-shuffles. No text
    ever shuffles — only (hash, id) pairs."""
    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 7).select(
        "doc_id", dedup.content_hash(F.col("text")).alias("h")
    )
    index_hashes = (
        docs.filter(F.col("doc_id") % 10 != 7)
        .select(dedup.content_hash(F.col("text")).alias("h"))
        .distinct()
        .withColumn("in_index", F.lit(True))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("h")
    marked = batch.join(index_hashes, ["h"], "left").select(
        "doc_id",
        F.coalesce(F.col("in_index"), F.lit(False)).alias("in_index"),
        F.min("doc_id").over(w).alias("first_id"),
    )
    return marked.select(
        "doc_id",
        F.when(F.col("in_index"), "index_dup")
        .when(F.col("doc_id") != F.col("first_id"), "batch_dup")
        .otherwise("kept")
        .alias("verdict"),
    )


@register(
    "ext_hll_intersection",
    survey_ref=(
        "[EXT] sketch-algebra intersection: |A∩B| by inclusion-"
        "exclusion over HLL register states — the union sketch is a "
        "max-merge OF THE STORED per-half registers (never a rescan), "
        "the audience-overlap / cross-shard-dedup estimator; register "
        "sums exact integers, the float estimate pytest-pinned "
        "(tests/test_sketches.py)"
    ),
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT
             CASE WHEN (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 2
                  = 0 THEN 'even' ELSE 'odd' END AS grp,
             CAST(user_id AS VARCHAR) AS uid
      FROM events),
    h AS (SELECT grp, uid, md5(uid || ':hll') AS hx FROM ev),
    parts AS (
      SELECT grp, substring(hx, 1, 2) AS reg,
             length(regexp_extract(substring(hx, 3, 13), '^(0*)', 1)) AS nz,
             substring(substring(hx, 3, 13),
                       length(regexp_extract(substring(hx, 3, 13),
                                             '^(0*)', 1)) + 1, 1) AS first
      FROM h),
    regs AS (
      SELECT grp, reg, max(least({_HLL_RANK}, 40)) AS rank
      FROM parts GROUP BY grp, reg),
    uregs AS (SELECT reg, max(rank) AS rank FROM regs GROUP BY reg),
    summ AS (
      SELECT grp,
             CAST(sum(CAST(power(2, 40 - rank) AS BIGINT))
                  + (256 - count(*)) * CAST(power(2, 40) AS BIGINT)
                  AS BIGINT) AS sum_scaled,
             CAST(256 - count(*) AS INT) AS zero_regs
      FROM regs GROUP BY grp),
    usumm AS (
      SELECT CAST(sum(CAST(power(2, 40 - rank) AS BIGINT))
                  + (256 - count(*)) * CAST(power(2, 40) AS BIGINT)
                  AS BIGINT) AS u_sum_scaled,
             CAST(256 - count(*) AS INT) AS u_zero_regs
      FROM uregs),
    exact AS (
      SELECT
        (SELECT count(DISTINCT uid) FROM ev WHERE grp = 'even') AS n_a,
        (SELECT count(DISTINCT uid) FROM ev WHERE grp = 'odd') AS n_b,
        (SELECT count(DISTINCT uid) FROM ev) AS n_union,
        (SELECT count(*) FROM
          (SELECT uid FROM ev WHERE grp = 'even'
           INTERSECT SELECT uid FROM ev WHERE grp = 'odd'))
          AS n_inter)
    SELECT e.n_a AS n_a_exact, e.n_b AS n_b_exact,
           e.n_union AS n_union_exact, e.n_inter AS n_inter_exact,
           max(CASE WHEN s.grp = 'even' THEN s.sum_scaled END)
             AS a_sum_scaled,
           max(CASE WHEN s.grp = 'even' THEN s.zero_regs END)
             AS a_zero_regs,
           max(CASE WHEN s.grp = 'odd' THEN s.sum_scaled END)
             AS b_sum_scaled,
           max(CASE WHEN s.grp = 'odd' THEN s.zero_regs END)
             AS b_zero_regs,
           max(u.u_sum_scaled) AS u_sum_scaled,
           max(u.u_zero_regs) AS u_zero_regs
    FROM summ s CROSS JOIN usumm u CROSS JOIN exact e
    GROUP BY e.n_a, e.n_b, e.n_union, e.n_inter
    """,
)
def ext_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between even-day and odd-day active users,
    sketch-algebraically: per-half HLL registers over user ids, a
    union sketch MAX-MERGED FROM THE STORED REGISTERS (the whole
    point — |A∪B| without rescanning either half), and the exact
    ground truths beside the integer register summaries. The float
    inclusion-exclusion estimate |A|+|B|−|A∪B| stays out of the hash
    gate (the ext_hll_distinct convention) and is accuracy-pinned in
    tests/test_sketches.py.

    Scale shape: one scan → (grp, reg) max-rank partials (≤ 2·256
    rows); the union is a 256-row re-aggregation of the register
    table; exact ground truths are one distinct + aggregates at demo
    scale (at 100 TB you'd drop them — they're the point of the
    sketch)."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            F.when(
                F.expr(
                    "(CAST(unix_timestamp(ts) AS LONG) div 86400) % 2"
                )
                == 0,
                F.lit("even"),
            )
            .otherwise(F.lit("odd"))
            .alias("grp"),
            F.col("user_id").cast("string").alias("uid"),
        )
        .distinct()
    )
    regs = sketches.hll_register_rows(ev, ["grp"], "uid").persist()
    summ = sketches.hll_summary(regs, ["grp"])
    uregs = regs.groupBy("reg").agg(F.max("rank").alias("rank"))
    usumm = sketches.hll_summary(
        uregs.withColumn("g", F.lit("u")), ["g"]
    ).select(
        F.col("hll_sum_scaled").alias("u_sum_scaled"),
        F.col("hll_zero_regs").alias("u_zero_regs"),
    )
    n_a = ev.filter(F.col("grp") == "even").select("uid").distinct().count()
    n_b = ev.filter(F.col("grp") == "odd").select("uid").distinct().count()
    n_union = ev.select("uid").distinct().count()
    n_inter = n_a + n_b - n_union
    piv = summ.groupBy().agg(
        F.max(
            F.when(F.col("grp") == "even", F.col("hll_sum_scaled"))
        ).alias("a_sum_scaled"),
        F.max(
            F.when(F.col("grp") == "even", F.col("hll_zero_regs"))
        ).alias("a_zero_regs"),
        F.max(
            F.when(F.col("grp") == "odd", F.col("hll_sum_scaled"))
        ).alias("b_sum_scaled"),
        F.max(
            F.when(F.col("grp") == "odd", F.col("hll_zero_regs"))
        ).alias("b_zero_regs"),
    )
    return piv.crossJoin(F.broadcast(usumm)).select(
        F.lit(n_a).cast("long").alias("n_a_exact"),
        F.lit(n_b).cast("long").alias("n_b_exact"),
        F.lit(n_union).cast("long").alias("n_union_exact"),
        F.lit(n_inter).cast("long").alias("n_inter_exact"),
        "a_sum_scaled",
        "a_zero_regs",
        "b_sum_scaled",
        "b_zero_regs",
        "u_sum_scaled",
        "u_zero_regs",
    )


@register(
    "ext_hll_rolling_distinct",
    survey_ref=(
        "[EXT] sketch × window composition: 7-day ROLLING distinct "
        "users — exact rolling distinct needs the raw id set per "
        "window, the sketch form is a max(rank) window over stored "
        "per-day registers (256 rows/day regardless of traffic); "
        "integer register sums hash-gated beside the exact ground "
        "truth, estimate pinned in tests/test_sketches.py"
    ),
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             CAST(user_id AS VARCHAR) AS uid
      FROM events),
    h AS (SELECT day, uid, md5(uid || ':hll') AS hx FROM ev),
    parts AS (
      SELECT day, substring(hx, 1, 2) AS reg,
             length(regexp_extract(substring(hx, 3, 13), '^(0*)', 1)) AS nz,
             substring(substring(hx, 3, 13),
                       length(regexp_extract(substring(hx, 3, 13),
                                             '^(0*)', 1)) + 1, 1) AS first
      FROM h),
    dregs AS (
      SELECT day, reg, max(least({_HLL_RANK}, 40)) AS rank
      FROM parts GROUP BY day, reg),
    days AS (SELECT DISTINCT day FROM ev),
    grid AS (
      SELECT d.day, r.reg FROM days d
      CROSS JOIN (SELECT DISTINCT reg FROM dregs) r),
    filled AS (
      SELECT g.day, g.reg, coalesce(dr.rank, 0) AS rank
      FROM grid g LEFT JOIN dregs dr
        ON dr.day = g.day AND dr.reg = g.reg),
    rolled AS (
      SELECT day, reg,
             max(rank) OVER (PARTITION BY reg ORDER BY day
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS rank
      FROM filled),
    summ AS (
      SELECT day,
             CAST(sum(CASE WHEN rank > 0
                           THEN CAST(power(2, 40 - rank) AS BIGINT)
                           ELSE 0 END)
                  + (256 - count(*) FILTER (WHERE rank > 0))
                    * CAST(power(2, 40) AS BIGINT) AS BIGINT)
               AS hll_sum_scaled,
             CAST(256 - count(*) FILTER (WHERE rank > 0) AS INT)
               AS hll_zero_regs
      FROM rolled GROUP BY day),
    exact AS (
      SELECT d.day, count(DISTINCT e.uid) AS exact_rolling
      FROM days d JOIN ev e
        ON e.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day)
    SELECT s.day, e.exact_rolling, s.hll_sum_scaled, s.hll_zero_regs
    FROM summ s JOIN exact e USING (day)
    """,
)
def ext_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users over each trailing 7-day window, sketch-
    algebraically: per-day HLL registers (the stored state — 256 rows
    a day no matter the traffic), rolled with a ``max(rank)`` window
    per register over the trailing week, summarized per day. The
    exact rolling distinct beside it needs the raw per-day id SETS
    (a range join re-touching every event — exactly what becomes
    impossible at 100 TB and why the register form exists).

    Exactness at the gate: register sums are pure integers; the float
    estimate stays out (ext_hll_distinct convention), accuracy pinned
    in tests. The register×day grid is filled densely so absent
    (day, reg) cells roll as rank 0 — identical semantics in both
    engines."""
    from pyspark.sql import Window

    ev = (
        load(spark, sf_dir, "events")
        .select(
            F.expr("CAST(unix_timestamp(ts) AS LONG) div 86400").alias(
                "day"
            ),
            F.col("user_id").cast("string").alias("uid"),
        )
        .distinct()
    )
    dregs = sketches.hll_register_rows(ev, ["day"], "uid")
    days = ev.select("day").distinct()
    regs = dregs.select("reg").distinct()
    grid = days.crossJoin(regs)
    filled = grid.join(dregs, ["day", "reg"], "left").select(
        "day", "reg", F.coalesce("rank", F.lit(0)).alias("rank")
    )
    wroll = (
        Window.partitionBy("reg").orderBy("day").rowsBetween(-6, 0)
    )
    rolled = filled.withColumn("rank", F.max("rank").over(wroll))
    pos = F.col("rank") > 0
    summ = rolled.groupBy("day").agg(
        (
            F.sum(
                F.when(
                    pos,
                    F.pow(F.lit(2.0), 40 - F.col("rank")).cast("long"),
                ).otherwise(F.lit(0))
            )
            + (F.lit(256) - F.count_if(pos))
            * F.pow(F.lit(2.0), 40).cast("long")
        )
        .cast("long")
        .alias("hll_sum_scaled"),
        (F.lit(256) - F.count_if(pos)).cast("int").alias("hll_zero_regs"),
    )
    e1, e2 = days.alias("d"), ev.alias("e")
    exact = (
        e1.join(
            e2,
            (F.col("e.day") >= F.col("d.day") - 6)
            & (F.col("e.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("e.uid").alias("exact_rolling"))
    )
    return summ.join(exact, "day").select(
        "day", "exact_rolling", "hll_sum_scaled", "hll_zero_regs"
    )


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles (the fixed-width t-digest stand-in)
# ---------------------------------------------------------------------------

_HQ_W = 1_000_000  # bucket width in cents ($10k); ~50 buckets over orders
_HQ_QS = (25, 50, 90, 99)  # probed quantiles, integer percent


@register(
    "ext_hist_quantiles",
    survey_ref=(
        "[EXT] mergeable histogram quantile sketch: fixed-width "
        "value-bucket histogram → cumulative rank → in-bucket linear "
        "interpolation; the one-pass, constant-state, merge-is-"
        "addition quantile path a 100 TB scan takes where exact "
        "percentile needs a global sort (approx_percentile's GK "
        "cousin, but with a DuckDB-replicable deterministic state)"
    ),
    oracle=f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
    tot AS (SELECT count(*) AS n FROM cents),
    hist AS (SELECT c // {_HQ_W} AS b, count(*) AS nb
             FROM cents GROUP BY b),
    cum AS (SELECT b, nb, sum(nb) OVER (ORDER BY b) AS cum FROM hist),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS q),
    tr AS (SELECT q, (q * n + 99) // 100 AS target_rank FROM qs, tot),
    sel AS (
      SELECT t.q, t.target_rank, min(c.b) AS bucket
      FROM tr t JOIN cum c ON c.cum >= t.target_rank
      GROUP BY t.q, t.target_rank)
    SELECT s.q,
           CAST(s.target_rank AS BIGINT) AS target_rank,
           CAST(s.bucket AS BIGINT) AS bucket,
           CAST(c.cum - c.nb AS BIGINT) AS cum_before,
           CAST(c.nb AS BIGINT) AS n_in_bucket,
           round((CAST(s.bucket * {_HQ_W} AS DOUBLE)
                  + {_HQ_W}.0 * (s.target_rank - (c.cum - c.nb)) / c.nb)
                 / 100.0, 2) AS est_price
    FROM sel s JOIN cum c ON c.b = s.bucket
    """,
)
def ext_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quantiles from a fixed-width bucket histogram — the
    mergeable-sketch quantile path: ONE map-side-combinable count
    aggregation is the whole state (merge = vector addition, the CMS/
    HLL property), the cumulative walk and interpolation run on the
    ≤~50-row histogram. Exact percentile (a_percentiles) needs the
    full sort; approx_percentile's GK sketch is engine-internal; this
    one is deterministic integer state both engines replicate, so the
    full hash gate applies. Estimate error is bounded by the bucket
    width by construction (pinned in tests/test_sketches.py against
    the exact rank value).

    Scale shape: the only stream-sized stage is the histogram groupBy
    (key = value // width, ≤ value_range/width keys — a CONSTANT, so
    the post-agg global cumsum window moves ≤50 rows through its
    SinglePartition exchange at any corpus size; allowlisted with the
    w15/zipf bounded-input discipline); the 4-row quantile-target ×
    histogram non-equi join is a tiny-broadcast BNLJ (allowlisted)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    cents = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    tot = cents.agg(F.count(F.lit(1)).alias("n"))
    hist = cents.groupBy(
        F.expr(f"c div {_HQ_W}").alias("b")
    ).agg(F.count(F.lit(1)).alias("nb"))
    cum = hist.withColumn(
        "cum", F.sum("nb").over(Window.orderBy("b"))
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _HQ_QS])).alias("q")
    )
    tr = qs.crossJoin(F.broadcast(tot)).select(
        "q", F.expr("(q * n + 99) div 100").alias("target_rank")
    )
    sel = (
        tr.join(F.broadcast(cum), F.col("cum") >= F.col("target_rank"))
        .groupBy("q", "target_rank")
        .agg(F.min("b").alias("bucket"))
    )
    c2 = cum.select(
        F.col("b").alias("bucket"), F.col("nb"), F.col("cum")
    )
    w = F.lit(_HQ_W)
    return sel.join(c2, "bucket").select(
        "q",
        F.col("target_rank").cast("long").alias("target_rank"),
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("cum") - F.col("nb")).cast("long").alias("cum_before"),
        F.col("nb").cast("long").alias("n_in_bucket"),
        F.round(
            (
                (F.col("bucket") * w).cast("double")
                + w.cast("double")
                * (F.col("target_rank") - (F.col("cum") - F.col("nb")))
                / F.col("nb")
            )
            / 100.0,
            2,
        ).alias("est_price"),
    )


@register(
    "ext_decayed_counts",
    survey_ref=(
        "[EXT] time-decayed heavy hitters with a power-of-two half-life "
        "(the integer-exact analog of exponentially-decayed counters, "
        "Cormode et al. 2009 forward-decay framing): per-(type, day) "
        "counts halve per day of age via BIGINT floor-shift cnt >> age "
        "— no exp(), no float accumulation, so the decayed totals are "
        "partitioning- and engine-exact"
    ),
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    m AS (SELECT max(day) AS max_day FROM c)
    SELECT event_type,
           CAST(sum(cnt) AS BIGINT) AS raw_total,
           CAST(sum(cnt // (CAST(1 AS BIGINT)
                 << least(datediff('day', day, max_day), 40)))
             AS BIGINT) AS decayed_total,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(CASE WHEN day = max_day THEN cnt ELSE 0 END) AS BIGINT)
             AS latest_day_cnt
    FROM c CROSS JOIN m
    GROUP BY event_type
    """,
)
def ext_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted event-type totals: each (type, day) bucket
    contributes cnt >> age_days — a one-day half-life realized as an
    integer floor-shift, the exact-arithmetic stand-in for the
    exponential decay every trending/heavy-hitter dashboard applies.
    The decayed total therefore never needs float accumulation (the
    classic λ^age forms are engine-divergent transcendentals), and a
    type's score is dominated by its last ~10 days by construction.
    Age is capped at 40 so the shift stays in BIGINT for arbitrarily
    old history.

    Scale shape: one (type, day)-keyed aggregate with map-side
    partials collapses the stream to a bounded |types|×|days| grid;
    the 1-row max-day broadcast (quality_sequence_gaps' allowlisted
    class) and the final per-type rollup both operate on that grid,
    never the raw events."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    m = c.agg(F.max("day").alias("max_day"))
    j = c.crossJoin(F.broadcast(m))
    age = F.least(F.datediff("max_day", "day"), F.lit(40))
    return (
        j.withColumn("age", age)
        .withColumn("shifted", F.expr("shiftleft(CAST(1 AS BIGINT), age)"))
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("raw_total"),
            F.sum(F.expr("cnt div shifted")).alias("decayed_total"),
            F.count(F.lit(1)).alias("n_days"),
            F.max(
                F.when(F.col("day") == F.col("max_day"), F.col("cnt")).otherwise(0)
            ).alias("latest_day_cnt"),
        )
    )


@register(
    "ext_kmv_distinct",
    survey_ref=(
        "[EXT] K-minimum-values distinct sketch + theta-style union "
        "merge (Bar-Yossef et al. 2002; the KMV/theta family behind "
        "DataSketches): per-group bottom-64 of salted-md5 hash values, "
        "estimator (k−1)/U_k expressed as one BIGINT-assembled "
        "division 63·2^52/v_k; the '~all' row is merged FROM THE "
        "STORED per-group sketches (k smallest of the union of "
        "bottom-k sets IS the union's bottom-k — never a rescan), "
        "the cross-shard distinct-count merge HLL can't do when you "
        "also need the retained sample of hashes"
    ),
    oracle="""
    WITH ev AS (
      SELECT DISTINCT event_type AS grp, CAST(user_id AS VARCHAR) AS uid
      FROM events),
    hv AS (
      SELECT grp, uid,
             CAST('0x' || substring(md5(uid || ':kmv'), 1, 13) AS BIGINT)
               AS v
      FROM ev),
    dv AS (SELECT DISTINCT grp, v FROM hv),
    bk AS (
      SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v) AS rnk
      FROM dv QUALIFY rnk <= 64),
    per_sketch AS (
      SELECT grp, count(*) AS n_sketch,
             max(CASE WHEN rnk = 64 THEN v END) AS kth_v
      FROM bk GROUP BY grp),
    per_exact AS (SELECT grp, count(*) AS n_exact FROM ev GROUP BY grp),
    udv AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rnk
      FROM (SELECT DISTINCT v FROM bk) QUALIFY rnk <= 64),
    u_sketch AS (
      SELECT count(*) AS n_sketch,
             max(CASE WHEN rnk = 64 THEN v END) AS kth_v
      FROM udv),
    u_exact AS (
      SELECT count(*) AS n_exact FROM (SELECT DISTINCT uid FROM ev)),
    allrows AS (
      SELECT s.grp, s.n_sketch, s.kth_v, e.n_exact
      FROM per_sketch s JOIN per_exact e USING (grp)
      UNION ALL
      SELECT '~all' AS grp, s.n_sketch, s.kth_v, e.n_exact
      FROM u_sketch s CROSS JOIN u_exact e)
    SELECT grp, 64 AS k,
           CAST(n_sketch AS BIGINT) AS n_sketch,
           CAST(kth_v AS BIGINT) AS kth_v,
           CAST(n_exact AS BIGINT) AS n_exact,
           CASE WHEN n_sketch < 64 THEN round(CAST(n_sketch AS DOUBLE), 6)
                ELSE round(CAST(63 * 4503599627370496 AS DOUBLE) / kth_v, 6)
           END AS kmv_est
    FROM allrows
    """,
)
def ext_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV distinct-count sketches over active users,
    plus a '~all' union row merged from the STORED sketches alone: the
    k smallest hashes of A∪B are each among their own group's k
    smallest, so the union sketch is a re-rank of ≤ |types|·64 retained
    values — the mergeability that makes KMV a shard-level distinct
    sketch at 100 TB (and, unlike HLL, the retained hash SAMPLE also
    supports theta-style intersection later). The estimator
    (k−1)/U_k is assembled as one division whose numerator 63·2^52 is
    built in exact BIGINT; U_k's 52-bit hash prefix is integer on both
    engines ('0x'-cast in DuckDB, conv(16,10) in Spark), so the only
    float op is the final identically-ordered divide, round-6.

    Scale shape: one distinct (type, user) shuffle cuts the stream;
    the sketch is a per-type bottom-64 window on the distinct-hash
    grid; everything downstream (union merge, estimates) runs on
    ≤ |types|·64 retained rows. The global union window and the 1-row
    exact/union cross-join are bounded by construction (allowlisted
    plan classes, tests/test_plan_invariants.py)."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    ev = e.select(
        F.col("event_type").alias("grp"),
        F.col("user_id").cast("string").alias("uid"),
    ).distinct()
    hv = ev.select(
        "grp",
        "uid",
        F.conv(
            F.substring(F.md5(F.concat(F.col("uid"), F.lit(":kmv"))), 1, 13),
            16,
            10,
        )
        .cast("long")
        .alias("v"),
    )
    dv = hv.select("grp", "v").distinct()
    bk = dv.withColumn(
        "rnk", F.row_number().over(Window.partitionBy("grp").orderBy("v"))
    ).filter(F.col("rnk") <= 64)
    per_sketch = bk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(F.when(F.col("rnk") == 64, F.col("v"))).alias("kth_v"),
    )
    per_exact = ev.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    # Union sketch: re-rank the ≤ |types|·64 retained hashes. The global
    # window is bounded by construction (sketch rows, never the corpus).
    udv = (
        bk.select("v")
        .distinct()
        .withColumn("rnk", F.row_number().over(Window.orderBy("v")))
        .filter(F.col("rnk") <= 64)
    )
    u_sketch = udv.agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(F.when(F.col("rnk") == 64, F.col("v"))).alias("kth_v"),
    )
    u_exact = ev.select("uid").distinct().agg(F.count(F.lit(1)).alias("n_exact"))
    u_row = u_sketch.crossJoin(F.broadcast(u_exact)).select(
        F.lit("~all").alias("grp"), "n_sketch", "kth_v", "n_exact"
    )
    allrows = (
        per_sketch.join(per_exact, "grp")
        .select("grp", "n_sketch", "kth_v", "n_exact")
        .unionByName(u_row)
    )
    est = F.when(
        F.col("n_sketch") < 64, F.round(F.col("n_sketch").cast("double"), 6)
    ).otherwise(
        F.round(
            (F.lit(63) * F.lit(4503599627370496)).cast("double") / F.col("kth_v"),
            6,
        )
    )
    return allrows.select(
        "grp",
        F.lit(64).alias("k"),
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.col("kth_v").cast("long").alias("kth_v"),
        F.col("n_exact").cast("long").alias("n_exact"),
        est.alias("kmv_est"),
    )


def _ams_sign(salt: int) -> str:
    """DuckDB ±1 sign from the parity of one salted-md5 hex digit —
    the kmv '0x'-cast idiom reduced to a single bit."""
    return (
        f"(2 * (CAST('0x' || substring(md5(tok || ':ams{salt}'), 1, 1) "
        "AS BIGINT) % 2) - 1)"
    )


@register(
    "ext_ams_f2",
    survey_ref=(
        "[EXT] AMS tug-of-war second-moment sketch (Alon, Matias & "
        "Szegedy 1996 — the F2/self-join-size estimator behind skew "
        "detection and join planning): 9 independent ±1-sign "
        "estimators from salted-md5 bit parity, each (Σ sign_i·f_t)², "
        "median-of-9 as the exact integer middle element, gated "
        "BESIDE the exact F2 = Σ f_t² computed in the SAME single "
        "aggregation pass — the sketch, the truth, and the relative "
        "error all under one hash"
    ),
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS tok FROM documents),
    cnt AS (
      SELECT tok, count(*) AS f FROM toks GROUP BY tok),
    agg AS (
      SELECT count(*) AS n_terms,
             sum(f * f) AS f2_exact,
             {", ".join(f"sum({_ams_sign(i)} * f) AS s{i}"
                        for i in range(9))}
      FROM cnt)
    SELECT CAST(n_terms AS BIGINT) AS n_terms,
           CAST(f2_exact AS BIGINT) AS f2_exact,
           CAST(list_sort([s0*s0 + s1*s1 + s2*s2, s3*s3 + s4*s4 + s5*s5, s6*s6 + s7*s7 + s8*s8])[2] AS BIGINT) AS f2_est3x_median,
           round(CAST(abs(list_sort([s0*s0 + s1*s1 + s2*s2, s3*s3 + s4*s4 + s5*s5, s6*s6 + s7*s7 + s8*s8])[2]
                          - 3 * f2_exact) AS DOUBLE) / (3 * f2_exact), 6)
             AS rel_err
    FROM agg
    """,
)
def ext_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second frequency moment, sketched and verified in one pass: the
    term-frequency rollup feeds ONE aggregation computing the exact
    F2, the distinct-term count, and all nine tug-of-war sums — each
    term's nine ±1 signs are salted-md5 bit parities (bit-identical
    across engines, the kmv/bloom geometry), so each estimator
    (Σ sign·f)² and the median-of-means group sums are pure integers. No float
    exists except the final identically-ordered relative-error
    division, round-6.

    Scale shape: one tokenize Generate + one term-keyed shuffle (the
    ext_tfidf class); the nine sign-weighted sums ride the SAME
    aggregate as map-side partials — constant-size mergeable state,
    which is the point of AMS: at 100 TB the sketch costs nothing
    beyond the frequency rollup it shares, while exact F2 of a
    shifted corpus would need that rollup anyway. The estimator-count
    is fixed (9) so the median is one sorted-literal pick, not a
    percentile shuffle. Accuracy honesty: AMS variance is ~2F2²/g per
    g-mean group, so 3 groups give a wide (~80%) standard-error
    envelope — on this corpus (31 distinct terms, one dominating F2)
    the observed rel_err ≈ 0.35 sits inside it; production sizes g to
    the tolerance (the sketch stays one aggregate either way), and
    rel_err is GATED AS DATA so the estimate's quality is itself
    hash-checked, not asserted."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize(F.col("text"))).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))

    def sign(i: int):
        return (
            F.lit(2)
            * (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("tok"), F.lit(f":ams{i}"))),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            )
            - 1
        )

    agg = cnt.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("f") * F.col("f")).alias("f2_exact"),
        *[F.sum(sign(i) * F.col("f")).alias(f"s{i}") for i in range(9)],
    )
    # median-of-means, the canonical AMS assembly: groups of three
    # estimators summed (kept as INTEGER group sums — the mean's /3 is
    # deferred onto the exact side as 3*F2, so no division leaves the
    # integer domain), median of the three group sums.
    grp = [
        sum(
            F.col(f"s{3 * j + m}") * F.col(f"s{3 * j + m}")
            for m in range(3)
        )
        for j in range(3)
    ]
    med = F.sort_array(F.array(*grp))[1]
    return agg.select(
        F.col("n_terms").cast("long").alias("n_terms"),
        F.col("f2_exact").cast("long").alias("f2_exact"),
        med.cast("long").alias("f2_est3x_median"),
        F.round(
            F.abs(med - F.lit(3) * F.col("f2_exact")).cast("double")
            / (F.lit(3) * F.col("f2_exact")),
            6,
        ).alias("rel_err"),
    )


@register(
    "sketch_quantile_pow2",
    survey_ref=(
        "[EXT] power-of-2 quantile sketch (round 12 — the DDSketch "
        "family, Masson et al. VLDB 2019, at gamma = 2): bucket = "
        "bit-length of the positive integer value (length(bin(v)) — "
        "INTEGER-EXACT on both engines, no float log anywhere), at "
        "most 64 mergeable buckets total; per-shard histograms merge "
        "by addition and the merged==direct equality is gated "
        "(merge-associativity witness, the HLL discipline); "
        "quantile answer = first bucket whose cumulative count "
        "reaches ceil(q*N/1000), gated with its [2^(b-1), 2^b-1] "
        "bound bracketing the EXACT order statistic (the gamma=2 "
        "relative-error guarantee, proven per row as within_bound)"
    ),
    oracle="""
    WITH vals AS (
      SELECT CAST(floor(l_extendedprice) AS BIGINT) + 1 AS v,
             l_suppkey % 16 AS shard
      FROM lineitem),
    per_shard AS (
      SELECT shard, length(bin(v)) AS b, count(*) AS c
      FROM vals GROUP BY 1, 2),
    merged AS (SELECT b, sum(c) AS c FROM per_shard GROUP BY b),
    direct AS (SELECT length(bin(v)) AS b, count(*) AS c
               FROM vals GROUP BY 1),
    mok AS (
      SELECT COALESCE(min(m.c = d.c), true) AS merge_ok
      FROM merged m FULL JOIN direct d USING (b)),
    n AS (SELECT count(*) AS n_total FROM vals),
    cum AS (
      SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM merged),
    qs AS (SELECT unnest([500, 900, 990]) AS q_permille),
    picks AS (
      SELECT q.q_permille, n.n_total,
             (SELECT min(cum.b) FROM cum
              WHERE cum.cc >= (q.q_permille * n.n_total + 999) // 1000)
               AS bucket
      FROM qs q CROSS JOIN n),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rnk FROM vals),
    out AS (
      SELECT p.q_permille, p.n_total, p.bucket,
             (1::BIGINT << (p.bucket - 1)) AS est_lo,
             (1::BIGINT << p.bucket) - 1 AS est_hi,
             r.v AS exact_val
      FROM picks p JOIN ranked r
        ON r.rnk = (p.q_permille * p.n_total + 999) // 1000)
    SELECT CAST(q_permille AS BIGINT) AS q_permille,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(est_lo AS BIGINT) AS est_lo,
           CAST(est_hi AS BIGINT) AS est_hi,
           CAST(exact_val AS BIGINT) AS exact_val,
           (exact_val BETWEEN est_lo AND est_hi) AS within_bound,
           (SELECT merge_ok FROM mok) AS merge_ok
    FROM out
    """,
)
def sketch_quantile_pow2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles without floats: the gamma=2 DDSketch
    degenerates to bit-length buckets, which makes every piece of the
    pipeline — bucketing, shard merge, cumulative pick, even the
    relative-error guarantee — exact integer data both engines
    reproduce bit-for-bit. The exact order statistic rides along as
    the audit column, and within_bound gates the sketch's ±2x
    contract against it per quantile.

    Scale shape: the sketch side is two bucket-keyed aggregates
    (map-side partials; at most 64 groups) + a 64-row cumulative
    window + a 3-row quantile probe against broadcast 1-row N — all
    index-metadata-sized. The exact-rank audit is the only global
    sort and exists to VERIFY the sketch (drop it in production and
    the plan is pure map-side histogram merge, the 100 TB path).
    Reference analog: none; [EXT] sketch surface."""
    li = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(floor(l_extendedprice) AS BIGINT) + 1").alias("v"),
        F.expr("l_suppkey % 16").alias("shard"),
    )
    b = F.expr("length(bin(v))").alias("b")
    per_shard = li.groupBy("shard", b).agg(F.count(F.lit(1)).alias("c"))
    # Round-12: the merged 64-bucket histogram feeds the merge audit,
    # the cumulative, the below-bucket offsets AND the total — the lazy
    # localCheckpoint barrier stops each consumer re-aggregating the
    # corpus (guide §2.3); the frame is <=64 rows at ANY corpus size.
    merged = per_shard.groupBy("b").agg(F.sum("c").alias("c")).localCheckpoint(
        eager=False
    )
    direct = li.groupBy(b).agg(F.count(F.lit(1)).alias("cd"))
    mok = (
        merged.join(direct, "b", "full")
        .agg(
            F.coalesce(
                F.min(F.col("c") == F.col("cd")), F.lit(True)
            ).alias("merge_ok")
        )
    )
    # N = sum of the merged bucket counts (identical integer to a
    # count(*) over the corpus — v is never null) — saves a third full
    # corpus aggregate (round 12)
    n = merged.agg(F.sum("c").cast("long").alias("n_total"))
    from pyspark.sql import Window as SqlWindow

    cumf = merged.select(
        "b", "c", F.sum("c").over(SqlWindow.orderBy("b")).alias("cc")
    )
    cum = cumf.select("b", "cc")
    qs = spark.createDataFrame([(500,), (900,), (990,)], "q_permille long")
    rank_expr = "(q_permille * n_total + 999) div 1000"
    picks = (
        qs.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(cum))
        .filter(F.expr(f"cc >= {rank_expr}"))
        .groupBy("q_permille", "n_total")
        .agg(F.min("b").alias("bucket"))
    )
    # Exact-rank audit WITHOUT the single-partition corpus sort
    # (round-12, guide §2.4): bit-length buckets are MONOTONE in v, so
    # a row's global rank = (count in lower buckets) + (its rank
    # within its own bucket). Only rows of the <=3 picked buckets are
    # ranked, under a bucket-partitioned window — the Exchange moves a
    # bounded slice and sorts it in parallel, where the old global
    # row_number funneled the whole corpus through ONE partition.
    # Ties within a bucket share the same v, so the value at any rank
    # is unchanged by tie order.
    below = cumf.select("b", (F.col("cc") - F.col("c")).alias("below"))
    sel = picks.select(F.col("bucket").alias("b")).distinct()
    in_picked = li.select("v", b).join(F.broadcast(sel), "b", "semi")
    ranked = (
        in_picked.withColumn(
            "rib", F.row_number().over(SqlWindow.partitionBy("b").orderBy("v"))
        )
        .join(F.broadcast(below), "b")
        .select("v", (F.col("below") + F.col("rib")).alias("rnk"))
    )
    out = (
        picks.join(ranked, F.expr(f"rnk = {rank_expr}"))
        .crossJoin(F.broadcast(mok))
        .select(
            F.col("q_permille").cast("long"),
            F.col("n_total").cast("long"),
            F.col("bucket").cast("long"),
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")
            .cast("long")
            .alias("est_lo"),
            (F.expr("shiftleft(CAST(1 AS BIGINT), bucket)") - 1)
            .cast("long")
            .alias("est_hi"),
            F.col("v").cast("long").alias("exact_val"),
            F.expr(
                "v BETWEEN shiftleft(CAST(1 AS BIGINT), bucket - 1) "
                "AND shiftleft(CAST(1 AS BIGINT), bucket) - 1"
            ).alias("within_bound"),
            "merge_ok",
        )
    )
    return out
