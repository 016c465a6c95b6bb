"""Invariants for the second-wave curation operators
(operators/curate.py); value-level parity with DuckDB lives in
test_oracle_parity.py — these pin the semantic contracts the oracles
can't (greedy packing bounds, PII rule order, hash-sampling
determinism, planted-duplicate span recall)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import curate


def test_pii_redact_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-amp.le.org then 192.168.0.1 then +81 3 1234 5678 end"),
            (2, "clean text with no personal data at all"),
        ],
        "id long, text string",
    )
    counts = curate.pii_counts(F.col("text"))
    out = df.select(
        "id",
        *[c.alias(n) for n, c in counts.items()],
        curate.pii_redact(F.col("text")).alias("red"),
    ).collect()
    r1 = {r["id"]: r for r in out}[1]
    assert (r1["email"], r1["ipv4"], r1["phone"]) == (1, 1, 1)
    assert r1["red"] == "mail [EMAIL] then [IP] then [PHONE] end"
    r2 = {r["id"]: r for r in out}[2]
    assert (r2["email"], r2["ipv4"], r2["phone"]) == (0, 0, 0)
    assert r2["red"] == "clean text with no personal data at all"


def test_pii_email_wins_over_ip_and_phone(spark):
    # rule order contract: the email's host dots must not be re-matched
    # as an IP, and digits inside a redacted token stay redacted
    df = spark.createDataFrame([(1, "x 10.0.0.1@example.com y")], "id long, text string")
    red = df.select(curate.pii_redact(F.col("text")).alias("r")).first()["r"]
    assert red == "x [EMAIL] y"


def test_mix_keep_edge_weights_and_determinism(spark):
    df = spark.range(2000).select(F.col("id"))
    kept1 = df.filter(curate.mix_keep(F.col("id"), F.lit(1.0))).count()
    kept0 = df.filter(curate.mix_keep(F.col("id"), F.lit(0.0))).count()
    assert kept1 == 2000  # weight >= 1 short-circuits to keep-all
    assert kept0 == 0
    a = df.filter(curate.mix_keep(F.col("id"), F.lit(0.25))).count()
    b = (
        df.repartition(13)
        .filter(curate.mix_keep(F.col("id"), F.lit(0.25)))
        .count()
    )
    assert a == b  # partitioning-independent
    assert abs(a / 2000 - 0.25) < 0.05  # 16-bit draw is ~uniform


def test_span_dedup_planted_full_dup(spark, sf_dir):
    from shippai_knowledge_etl_spark.queries.dedup import (
        documents_with_planted_dups,
    )

    prof = curate.span_dedup_profile(
        documents_with_planted_dups(spark, sf_dir), "doc_id", "text"
    )
    planted = prof.filter(F.col("doc_id") >= 100000)
    n = planted.count()
    assert n > 0
    # a verbatim copy shares every span with its original
    assert planted.filter(F.col("dup_span_frac") < 1.0).count() == 0


def test_repetition_profile_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, ""), (3, "x y z")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in curate.repetition_profile(df, "doc_id", "text").collect()
    }
    r = rows[1]  # tokens a,a,a,b → 2 repeats; top unigram a (3/4)
    assert r["n_tokens"] == 4 and r["dup_token_frac"] == 0.5
    assert r["top_unigram"] == "a" and r["top_unigram_frac"] == 0.75
    assert r["top_bigram"] == "a a"  # 2 occurrences beat 'a b'
    e = rows[2]  # empty doc survives with zeroed metrics
    assert e["n_tokens"] == 0 and e["top_unigram"] == ""
    u = rows[3]  # all-unique doc
    assert u["dup_token_frac"] == 0.0 and u["top_unigram_frac"] == 0.333333


def test_pack_greedy_invariants(spark, sf_dir):
    from shippai_knowledge_etl_spark.tables import load
    from shippai_knowledge_etl_spark.operators.textops import tokenize

    budget = 512
    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    packed = curate.pack_sequences_greedy(t, "doc_id", "n_tokens", budget, "shard")
    assert packed.count() == t.count()  # every doc assigned exactly once
    seq = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx")
    )
    # a sequence only exceeds the budget when one doc alone does
    assert seq.filter((F.col("tot") > budget) & (F.col("mx") <= budget)).count() == 0
    # id order within a shard maps to non-decreasing seq ids
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    mono = packed.withColumn("prev", F.lag("seq_id").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("seq_id") < F.col("prev"))
    )
    assert mono.count() == 0


def test_pack_chunk_vs_greedy_fill(spark, sf_dir):
    """Chunk mode bins by start offset: per (shard, seq) token totals
    hover at the budget (docs straddle boundaries); greedy never
    overfills. Both modes see the same token mass per shard."""
    from shippai_knowledge_etl_spark.operators.textops import tokenize
    from shippai_knowledge_etl_spark.tables import load

    budget = 512
    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    chunk = curate.pack_sequences(t, "doc_id", "n_tokens", budget, "shard")
    g = curate.pack_sequences_greedy(t, "doc_id", "n_tokens", budget, "shard")
    ctot = chunk.groupBy("shard").agg(F.sum("n_tokens").alias("n")).collect()
    gtot = g.groupBy("shard").agg(F.sum("n_tokens").alias("n")).collect()
    assert {(r["shard"], r["n"]) for r in ctot} == {
        (r["shard"], r["n"]) for r in gtot
    }


def test_mix_oversample_bounds_and_degenerate(spark):
    df = spark.range(400).select(F.col("id"))
    # weight 2.5: every row twice unconditionally, ~half a third time
    out = curate.mix_oversample(df, "id", F.lit(2.5))
    per = out.groupBy("id").count()
    assert per.filter(F.col("count") < 2).count() == 0
    assert per.filter(F.col("count") > 3).count() == 0
    emitted = out.count()
    assert 400 * 2 < emitted < 400 * 3
    assert abs(emitted / 400 - 2.5) < 0.15
    # partitioning-independent multiset
    again = curate.mix_oversample(df.repartition(7), "id", F.lit(2.5))
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0
    # integer weight: exact copies, no fractional epoch
    two = curate.mix_oversample(df, "id", F.lit(2.0))
    assert two.count() == 800
    assert two.groupBy("id").count().filter(F.col("count") != 2).count() == 0
    # weight <= 1 degenerates to mix_keep's exact row set at epoch 0
    sub = curate.mix_oversample(df, "id", F.lit(0.25), "s")
    kept = df.filter(curate.mix_keep(F.col("id"), F.lit(0.25), "s"))
    assert sub.filter(F.col("epoch") != 0).count() == 0
    a = {r.id for r in sub.collect()}
    b = {r.id for r in kept.collect()}
    assert a == b


def test_decontaminate_planted_and_clean(spark):
    test_set = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # full copy
            (2, "a quick brown fox appeared in the garden today"),  # partial
            (3, "completely unrelated sentence about spark plans"),  # clean
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in curate.decontaminate(
            train, test_set, "doc_id", "text"
        ).collect()
    }
    assert len(rows) == 3  # row count == train side, clean docs included
    assert rows[1]["contaminated"] and rows[1]["overlap"] == 1.0
    assert rows[2]["contaminated"] and 0 < rows[2]["overlap"] < 1.0
    assert not rows[3]["contaminated"] and rows[3]["n_hits"] == 0
    # n_shingles: 9 tokens -> 7 distinct 3-grams
    assert rows[1]["n_shingles"] == 7


def test_decontaminate_short_doc_fallback(spark):
    # docs under n tokens fall back to a whole-text shingle and still
    # produce exactly one output row (nothing vanishes in the explode)
    test_set = spark.createDataFrame([(9, "hi")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "hi"), (2, "bye")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in curate.decontaminate(
            train, test_set, "doc_id", "text"
        ).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["overlap"] == 1.0
    assert not rows[2]["contaminated"] and rows[2]["n_shingles"] == 1


def test_dsir_logweights_direction_and_rowcount(spark):
    # target: fruit-speak; raw pool: one fruit-like doc, one metal doc,
    # one empty doc. The fruit-like doc must outscore the metal one,
    # and every raw doc (even the empty) must produce exactly one row.
    target = spark.createDataFrame(
        [
            (1, "apple banana cherry apple banana", True),
            (2, "banana cherry apple cherry", True),
        ],
        "doc_id long, text string, t boolean",
    )
    raw = spark.createDataFrame(
        [
            (10, "apple banana apple", False),
            (11, "iron copper zinc nickel", False),
            (12, "", False),
        ],
        "doc_id long, text string, t boolean",
    )
    out = curate.dsir_logweights(
        target.unionByName(raw), F.col("t"), "doc_id", "text"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {10, 11, 12}  # raw side only, nothing dropped
    assert rows[10]["logw"] > rows[11]["logw"]
    assert rows[12]["n_feats"] == 0 and rows[12]["logw"] == 0.0
    # n_feats = unigram + bigram occurrences (3 + 2 for doc 10)
    assert rows[10]["n_feats"] == 5


def test_ccnet_lm_scores_direction(spark):
    # in-domain raw doc must score lower mean_nll than out-of-domain;
    # sub-2-token docs keep their row with n_bigrams 0
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", True),
            (2, "the dog sat on the rug", True),
            (10, "the cat sat on the rug", False),  # in-domain
            (11, "zebra quantum flux harmonics", False),  # out-of-domain
            (12, "one", False),  # no bigrams
        ],
        "doc_id long, text string, t boolean",
    )
    rows = {
        r["doc_id"]: r
        for r in curate.ccnet_lm_scores(
            corpus, F.col("t"), "doc_id", "text"
        ).collect()
    }
    assert set(rows) == {10, 11, 12}
    assert rows[10]["mean_nll"] < rows[11]["mean_nll"]
    assert rows[12]["n_bigrams"] == 0 and rows[12]["mean_nll"] == 0.0


def test_stratified_sample_exact_k_and_determinism(spark, sf_dir):
    from shippai_knowledge_etl_spark.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    s1 = curate.stratified_sample(d, "source", 3, "doc_id")
    per = {r["source"]: r["n"] for r in
           s1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = {r["source"]: r["n"] for r in
             d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in per.items():
        assert n == min(3, total[src])
    # repartitioning must not change the draw
    s2 = curate.stratified_sample(d.repartition(7), "source", 3, "doc_id")
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_corpus_shuffle_permutation_and_determinism(spark, sf_dir):
    from shippai_knowledge_etl_spark.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id")
    s1 = curate.corpus_shuffle(d, "doc_id")
    rows = s1.collect()
    # a permutation: every doc exactly once, positions contiguous 1..n
    assert len(rows) == d.count()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # pure function of (id, salt): partitioning-independent...
    s2 = curate.corpus_shuffle(d.repartition(13), "doc_id")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, s2.collect()))
    # ...and the salt is an epoch knob: a different salt reorders
    s3 = curate.corpus_shuffle(d, "doc_id", salt="epoch1")
    assert sorted(map(tuple, rows)) != sorted(map(tuple, s3.collect()))


def test_countmin_merge_and_overestimate(spark):
    # mergeability: sketch(A) cell-add sketch(B) == sketch(A ∪ B);
    # estimates never underestimate the true count
    from shippai_knowledge_etl_spark.operators import textops as T

    a = spark.createDataFrame(
        [("apple", 3), ("pear", 1)], "tok string, cnt long"
    )
    b = spark.createDataFrame(
        [("apple", 2), ("plum", 5)], "tok string, cnt long"
    )
    u = spark.createDataFrame(
        [("apple", 5), ("pear", 1), ("plum", 5)], "tok string, cnt long"
    )
    merged = (
        T.countmin_sketch(a).unionByName(T.countmin_sketch(b))
        .groupBy("j", "bucket")
        .agg(F.sum("counter").alias("counter"))
    )
    direct = T.countmin_sketch(u)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    probes = u.select("tok", F.col("cnt").alias("exact"))
    est = {r["tok"]: r for r in T.countmin_estimate(direct, probes).collect()}
    for tok, true_cnt in (("apple", 5), ("pear", 1), ("plum", 5)):
        assert est[tok]["is_overestimate"] and est[tok]["cms_est"] >= true_cnt


def test_countmin_estimate_unseen_token_is_zero(spark):
    from shippai_knowledge_etl_spark.operators import textops as T

    tc = spark.createDataFrame([("apple", 7)], "tok string, cnt long")
    sketch = T.countmin_sketch(tc)
    probes = spark.createDataFrame(
        [("apple", 7), ("never-seen-gram", 0)], "tok string, exact long"
    )
    est = {r["tok"]: r for r in T.countmin_estimate(sketch, probes).collect()}
    # the unseen token keeps its row; empty cells count as 0, and with
    # depth 4 over 256 buckets and one stored token, at least one of
    # its cells is empty -> est exactly 0
    assert est["never-seen-gram"]["cms_est"] == 0
    assert est["never-seen-gram"]["is_overestimate"]
    assert est["apple"]["cms_est"] >= 7


def test_c4_rules_each_rule_fires(spark):
    docs = [
        # 3 good lines -> kept, cleaned_text drops nothing
        (1, "alpha beta gamma delta epsilon zeta.\n"
            "one two three four five six.\n"
            "seven eight nine ten eleven twelve."),
        # only 1 good line (2nd has no terminal punct, 3rd too few words)
        (2, "alpha beta gamma delta epsilon zeta.\n"
            "one two three four five six\n"
            "too few."),
        # javascript line is dropped but page survives on the other two
        (3, "alpha beta gamma delta epsilon zeta.\n"
            "please enable javascript to view this.\n"
            "seven eight nine ten eleven twelve."),
        # lorem ipsum kills the page even with enough good lines
        (4, "alpha beta gamma delta epsilon zeta.\n"
            "lorem ipsum dolor sit amet consectetur.\n"
            "seven eight nine ten eleven twelve."),
        # curly brace kills the page
        (5, "alpha beta gamma delta epsilon zeta.\n"
            "var x = {a: 1};\n"
            "seven eight nine ten eleven twelve."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curate.c4_rules(df, "doc_id", "text").collect()}
    assert out[1]["keep"] and out[1]["n_kept_lines"] == 3
    assert out[1]["cleaned_text"] == docs[0][1]
    assert not out[2]["keep"] and out[2]["n_kept_lines"] == 1
    assert out[3]["keep"] and out[3]["n_kept_lines"] == 2
    assert "javascript" not in out[3]["cleaned_text"]
    assert not out[4]["keep"] and out[4]["has_lorem"]
    assert not out[5]["keep"] and out[5]["has_brace"]


def test_c4_rules_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a.")], "doc_id long, text string")
    plan = curate.c4_rules(df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_cap_both_paths(spark):
    # hot: 10 docs, cold: 3 docs; cap 4 -> hot keeps its 4 longest,
    # cold passes through the bypass untouched
    rows = [(i, "hot", 100 + i) for i in range(10)]
    rows += [(100 + i, "cold", 50 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_chars long")
    out = curate.domain_cap(df, "domain", 4, "n_chars", "doc_id")
    got = sorted((r["domain"], r["doc_id"]) for r in out.collect())
    assert got == [("cold", 100), ("cold", 101), ("cold", 102),
                   ("hot", 6), ("hot", 7), ("hot", 8), ("hot", 9)]
    # the bypass contract: under-cap rows reach the output without a
    # window — the plan ranks only the semi-joined over-cap side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("RunningWindowFunction") <= 1
    assert "LeftAnti" in plan and "LeftSemi" in plan


def test_domain_cap_tie_break_deterministic(spark):
    # equal n_chars everywhere: the doc_id ascending tie-break decides
    rows = [(i, "d", 7) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_chars long")
    kept = sorted(r["doc_id"] for r in
                  curate.domain_cap(df, "domain", 2, "n_chars", "doc_id").collect())
    assert kept == [0, 1]


def test_canonical_url_edge_cases(spark):
    from shippai_knowledge_etl_spark.operators.curate import canonical_url

    cases = {
        # adjacent tracking params all removed, survivors sorted
        "http://A.com/p?b=2&utm_a=1&utm_b=2&a=1": "http://a.com/p?a=1&b=2",
        # tracking-only query -> no '?' at all
        "http://a.com/p?utm_source=x&fbclid=y": "http://a.com/p",
        # 'refresh' must NOT be eaten by the 'ref' rule
        "http://a.com/p?refresh=1&ref=x": "http://a.com/p?refresh=1",
        # default port stripped only for the matching scheme
        "http://a.com:80/p": "http://a.com/p",
        "https://a.com:443/p": "https://a.com/p",
        "http://a.com:443/p": "http://a.com:443/p",
        "https://A.com:8080/p": "https://a.com:8080/p",
        # fragment dropped; empty path -> '/'
        "HTTP://a.com#frag": "http://a.com/",
        "http://a.com?a=1#frag": "http://a.com/?a=1",
    }
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(k,) for k in cases], ["u"])
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonical_url(F.col("u")).alias("c")).collect()
    }
    assert got == cases


def test_canonical_url_idempotent(spark, sf_dir):
    """canonical(canonical(u)) == canonical(u): frontier hashing relies
    on canonicalization being a projection."""
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.curate import canonical_url
    from shippai_knowledge_etl_spark.queries.curate_ops import (
        curation_url_canonicalize,
    )

    c1 = curation_url_canonicalize(spark, sf_dir).select(
        "doc_id", "url_canonical"
    )
    diffs = c1.select(
        "doc_id",
        "url_canonical",
        F.explode(F.array(canonical_url(F.col("url_canonical")))).alias("c2"),
    ).filter(F.col("c2") != F.col("url_canonical"))
    assert diffs.count() == 0, diffs.limit(5).collect()


def test_compression_ratio_discriminates(spark):
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.curate import compression_ratio

    rows = [
        (0, "spam " * 200),  # templated
        (1, " ".join(f"w{i * 37 % 9973}x{i}" for i in range(200))),  # varied
        (2, ""),  # empty: ratio over max(n,1), no crash
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in compression_ratio(df, "doc_id", "text").collect()
    }
    assert got[0]["compression_ratio"] < 0.05
    assert got[1]["compression_ratio"] > 3 * got[0]["compression_ratio"]
    assert got[2]["n_bytes"] == 0 and got[2]["n_compressed"] > 0
    # determinism across partitionings
    again = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(
            df.repartition(5), "doc_id", "text"
        ).collect()
    }
    assert again == {k: v["compression_ratio"] for k, v in got.items()}


def test_cluster_balance_caps_and_is_deterministic(spark, sf_dir):
    """Cluster-balanced sampling: ≤ k rows per learned cluster, rows
    drawn from the real assignment, and the draw reproducible across
    invocations (pure md5 rank, no rand())."""
    from shippai_knowledge_etl_spark.catalog import load_catalog

    fn = load_catalog()["curation_cluster_balance"].fn
    a = [(r["cluster"], r["vec_id"]) for r in fn(spark, sf_dir).collect()]
    b = [(r["cluster"], r["vec_id"]) for r in fn(spark, sf_dir).collect()]
    assert a == b and len(a) > 0
    import collections

    per = collections.Counter(c for c, _ in a)
    assert all(n <= 20 for n in per.values())


def test_main_content_smoothing_and_rails(spark):
    """Short caption between paragraphs stays; short line between two
    link rails goes; link-dense rails always go."""
    from shippai_knowledge_etl_spark.operators.curate import main_content
    from shippai_knowledge_etl_spark.sources.html_parse import page_blocks

    html = (
        '<div><a href="#">Home</a> <a href="#">About</a></div>'
        "<p>© 2026 corp</p>"
        '<footer><a href="#">Terms</a> <a href="#">Privacy</a></footer>'
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa</p>"
        "<p>Figure 7</p>"
        "<p>one two three four five six seven eight nine ten eleven</p>"
    )
    df = spark.createDataFrame([(1, html)], "id long, html string")
    out = main_content(
        df.select("id", page_blocks(F.col("html")).alias("blocks")),
        "id",
        "blocks",
    ).collect()[0]
    assert out["n_blocks"] == 6
    assert out["n_content_blocks"] == 3
    assert out["main_text"].startswith("alpha beta")
    assert "Figure 7" in out["main_text"]
    assert "©" not in out["main_text"] and "Home" not in out["main_text"]


def test_main_content_keeps_blockless_pages(spark):
    from shippai_knowledge_etl_spark.operators.curate import main_content
    from shippai_knowledge_etl_spark.sources.html_parse import page_blocks

    df = spark.createDataFrame(
        [(1, "<p>one two three four five six seven eight nine ten</p>"),
         (2, "<script>var x=1;</script>"), (3, "")],
        "id long, html string",
    )
    out = {
        r["id"]: r
        for r in main_content(
            df.select("id", page_blocks(F.col("html")).alias("blocks")),
            "id",
            "blocks",
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[2]["n_blocks"] in (0, 1) and out[3]["n_blocks"] == 0
    assert out[3]["main_text"] == ""


def test_logreg_separates_planted_vocabularies(spark):
    """Two disjoint vocabularies -> the classifier must reach perfect
    train accuracy within a few iterations, and the loss must fall
    monotonically."""
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.curate import (
        logreg_quality_score,
        logreg_quality_train,
    )

    good = [f"alpha beta gamma delta {w}" for w in
            ("one", "two", "three", "four", "five", "six")]
    bad = [f"zork quux blorp fnord {w}" for w in
           ("uno", "dos", "tres", "cuatro", "cinco", "seis")]
    rows = [(i, t, i < len(good)) for i, t in enumerate(good + bad)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    w, losses = logreg_quality_train(
        df, F.col("y"), "doc_id", "text", n_iters=4, lr=50.0
    )
    assert losses == sorted(losses, reverse=True)  # monotone descent
    assert losses[-1] < losses[0] * 0.3
    got = {
        r["doc_id"]: r["is_good"]
        for r in logreg_quality_score(df, w, "doc_id", "text").collect()
    }
    assert all(got[i] for i in range(len(good)))
    assert not any(got[i] for i in range(len(good), len(good) + len(bad)))


def test_logreg_train_repeat_identical(spark):
    """Weights are a pure function of the corpus: DECIMAL-summed terms
    + driver-quantized updates -> two runs agree exactly."""
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.curate import (
        logreg_quality_train,
    )

    rows = [
        (i, f"tok{i % 7} tok{i % 5} tok{i % 3} filler word", i % 2 == 0)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    w1, l1 = logreg_quality_train(df, F.col("y"), "doc_id", "text", n_iters=2)
    w2, l2 = logreg_quality_train(df, F.col("y"), "doc_id", "text", n_iters=2)
    assert w1 == w2 and l1 == l2


def test_logreg_score_handles_empty_docs(spark):
    """Zero-gram documents score exactly 0.5 and fall on the kept side
    of the threshold (documented tie rule)."""
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.curate import (
        logreg_quality_score,
        logreg_quality_train,
    )

    rows = [(0, "alpha beta", True), (1, "zork quux", False), (2, "", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    w, _ = logreg_quality_train(df, F.col("y"), "doc_id", "text", n_iters=2)
    got = {r["doc_id"]: (r["score"], r["is_good"])
           for r in logreg_quality_score(df, w, "doc_id", "text").collect()}
    assert got[2] == (0.5, True)


def test_source_overlap_matrix_planted(spark):
    """A syndicated copy shared by two sources lights up exactly that
    pair; a vocabulary-disjoint source shares nothing with anyone."""
    from shippai_knowledge_etl_spark.operators.curate import (
        source_overlap_matrix,
    )

    shared_text = "breaking news syndicated wire story repeated verbatim"
    rows = [
        (1, shared_text, "wire"),
        (2, shared_text + " with local edits appended", "mirror"),
        (3, "totally disjoint vocabulary cluster one", "indie"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(df, "text", "source").collect()
    }
    assert set(out) == {("mirror", "wire")}
    r = out[("mirror", "wire")]
    # wire's 3-grams: 5 of 6 token positions -> all contained in mirror
    assert r["n_shared"] == 5 and min(r["n_a"], r["n_b"]) == 5
    assert r["overlap"] == 1.0


def test_derepetition_planted(spark):
    """A doc that repeats a 3-gram loses exactly the later window; a
    repetition-free doc is untouched; idempotent on its own output."""
    from shippai_knowledge_etl_spark.operators.curate import (
        remove_repeated_ngrams,
    )

    rows = [
        # "a b c" repeats at positions 4-6 -> those 3 tokens removed
        (1, "a b c x a b c y"),
        (2, "all tokens here are fresh and never repeat themselves"),
        # pure loop: "x y z x y z x y z" -> keep first window + nothing
        (3, "x y z x y z x y z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in remove_repeated_ngrams(df, "doc_id", "text").collect()
    }
    assert out[1] == (8, 3, "a b c x y")
    assert out[2][1] == 0 and out[2][2] == rows[1][1]
    assert out[3] == (9, 6, "x y z")

    # idempotence: cleaning the cleaned text changes nothing
    clean = spark.createDataFrame(
        [(k, v[2]) for k, v in out.items()], ["doc_id", "text"]
    )
    again = {
        r["doc_id"]: r["text_clean"]
        for r in remove_repeated_ngrams(clean, "doc_id", "text").collect()
    }
    assert again == {k: v[2] for k, v in out.items()}


def test_token_budget_waterfill_properties(spark, sf_dir):
    """Waterfill invariants: allocations never exceed the budget, the
    floor remainder is smaller than the number of capped sources (so
    nothing is silently over- or under-spent beyond flooring), every
    uncapped source keeps all its tokens, and every capped source
    sits exactly at the cap."""
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.queries.curate_ops import _BUDGET_TOKENS

    rows = load_catalog()["curation_token_budget"].fn(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    alloc = sum(r.alloc_tokens for r in rows)
    if total <= _BUDGET_TOKENS:
        assert alloc == total
        assert all(r.cap is None for r in rows)
    else:
        n_capped = sum(1 for r in rows if r.capped)
        assert alloc <= _BUDGET_TOKENS
        assert _BUDGET_TOKENS - alloc < max(n_capped, 1)
        for r in rows:
            if r.capped:
                assert r.alloc_tokens == r.cap
            else:
                assert r.alloc_tokens == r.n_tokens


def test_token_budget_all_capped_branch(spark):
    """Budget below m*min(tokens): the k*=0 branch caps EVERY source
    at budget//m."""
    from shippai_knowledge_etl_spark.operators.textops import tokenize  # noqa
    import shippai_knowledge_etl_spark.queries.curate_ops as co
    import os
    import tempfile

    # 4 sources x 7000 tokens: total 28000 > budget 26000 AND
    # m*min = 28000 > budget, so no prefix is feasible (k* = 0) and
    # every source caps at budget // m = 6500.
    docs = [(i, " ".join(f"w{j}" for j in range(100)), "en", f"s{i % 4}", 100)
            for i in range(280)]
    df = spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        from shippai_knowledge_etl_spark.catalog import load_catalog

        rows = load_catalog()["curation_token_budget"].fn(spark, td).collect()
    assert all(r.cap == 6500 and r.alloc_tokens == 6500 and r.capped
               for r in rows)


# ---------------------------------------------------------------------------
# Round-8 additions: line dedup, span corruption, weighted sample,
# apportionment
# ---------------------------------------------------------------------------


def test_token_lines_partition_tokens_exactly(spark):
    """Lines are a PARTITION of the token stream: re-joining them in
    line order reproduces the tokenized text; every line but the last
    has exactly `width` tokens; empty docs emit nothing."""
    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(23))),
            (2, "a b c"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = curate.token_lines(df, "doc_id", "text", 10).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["line_no"])):
        by_doc.setdefault(r["doc_id"], []).append(r["line"])
    assert 3 not in by_doc
    assert " ".join(by_doc[1]) == " ".join(f"t{i}" for i in range(23))
    assert [len(x.split()) for x in by_doc[1]] == [10, 10, 3]
    assert by_doc[2] == ["a b c"]


def test_line_frequency_filter_drops_planted_boilerplate(spark):
    """The corpus-wide planted line is dropped, unique content kept —
    and the threshold is on DISTINCT docs, so one doc repeating its
    own line cannot get it globally banned."""
    rows = [(i, "footer line shared everywhere") for i in range(10)]
    rows += [(i, f"unique content line {i}") for i in range(10)]
    rows += [(99, "self repeated line")] * 8  # 8 copies, ONE doc
    df = spark.createDataFrame(rows, "doc_id long, line string")
    out = curate.line_frequency_filter(df, "doc_id", "line", 5).collect()
    verdict = {}
    for r in out:
        verdict.setdefault(r["line"], set()).add(r["kept"])
    assert verdict["footer line shared everywhere"] == {False}
    assert verdict["unique content line 3"] == {True}
    assert verdict["self repeated line"] == {True}  # df_docs == 1


def test_span_corruption_identities_and_determinism(spark, sf_dir):
    """Exact accounting identities hold per doc, the corpus-wide mask
    rate lands near 15%, and the md5 masks are run-stable."""
    from shippai_knowledge_etl_spark.tables import load

    d = load(spark, sf_dir, "documents")
    a = curate.span_corruption_profile(d, "doc_id", "text").collect()
    b = curate.span_corruption_profile(d, "doc_id", "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    tot_spans = tot_masked = 0
    for r in a:
        assert r["n_input_tokens"] == (
            r["n_tokens"] - r["n_masked_tokens"] + r["n_masked_spans"]
        )
        assert r["n_target_tokens"] == (
            r["n_masked_tokens"] + r["n_masked_spans"] + 1
        )
        # input sentinels + target tokens re-assemble the doc + EOS
        assert (
            r["n_input_tokens"] + r["n_target_tokens"]
            == r["n_tokens"] + 2 * r["n_masked_spans"] + 1
        )
        assert 0 <= r["n_masked_spans"] <= r["n_spans"]
        tot_spans += r["n_spans"]
        tot_masked += r["n_masked_spans"]
    assert 0.10 < tot_masked / tot_spans < 0.20  # 15% draw, corpus-size CI


def test_weighted_sample_keys_favor_heavy_rows(spark):
    """Among rows with identical hash material apart from weight, the
    weight-4 population wins far more top slots than the weight-1
    population (P(min over 4 draws < min over 1 draw) = 4/5 per pair);
    and each wkey is the true min of the per-copy hashes (golden
    md5)."""
    import hashlib

    rows = [(i, 4 if i % 2 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, weight int")
    keys = curate.weighted_sample_keys(df, "doc_id", "weight").collect()
    for r in keys[:10]:
        want = min(
            hashlib.md5(f"{r['doc_id']}:ws:{j}".encode()).hexdigest()
            for j in range(r["weight"])
        )
        assert r["wkey"] == want
    top50 = sorted(keys, key=lambda r: (r["wkey"], r["doc_id"]))[:50]
    n_heavy = sum(1 for r in top50 if r["weight"] == 4)
    assert n_heavy > 30  # E[n_heavy] = 40; 30 is a >6-sigma floor


def test_weighted_sample_keys_zero_weight_draws_nothing(spark):
    """P(w=0 row) = 0/sum(w): zero- and negative-weight rows must get
    NO draws at all. Regression for the ADVICE r8 latent bug: Spark's
    sequence(0, -1) yields a DESCENDING [0, -1] — two elements — so an
    unfiltered explode gave a zero-weight row TWO hash draws, the
    opposite of the contract and of DuckDB's range(0,0) = [] analog."""
    rows = [(1, 0), (2, 3), (3, -2), (4, 1)]
    df = spark.createDataFrame(rows, "doc_id long, weight int")
    keys = curate.weighted_sample_keys(df, "doc_id", "weight").collect()
    got = {r["doc_id"] for r in keys}
    assert got == {2, 4}  # weight<1 rows absent, positive rows kept


def test_apportionment_sums_to_budget_exactly(spark, sf_dir):
    """The Hamilton guarantee: allocations sum to the budget EXACTLY
    and each allocation is floor-quota or floor-quota+1."""
    from shippai_knowledge_etl_spark.queries.curate_ops import (
        curation_apportion_budget,
    )

    rows = curation_apportion_budget(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == 1000
    nt = sum(r["n_tokens"] for r in rows)
    for r in rows:
        base = (1000 * r["n_tokens"]) // nt
        assert r["alloc"] in (base, base + 1)
        assert r["got_bonus"] == (r["alloc"] == base + 1)


def test_soft_dedup_cluster_mass(spark, sf_dir):
    """Every exact-duplicate cluster contributes ~1 effective doc:
    summing effective_docs across sources must equal the number of
    DISTINCT texts in the planted corpus to within the round-6 error
    of the 1/k weights (k=2 here, so exactly)."""
    from shippai_knowledge_etl_spark.queries.curate_ops import (
        curation_soft_dedup,
    )
    from shippai_knowledge_etl_spark.queries.dedup import (
        documents_with_planted_dups,
    )

    rows = curation_soft_dedup(spark, sf_dir).collect()
    planted = documents_with_planted_dups(spark, sf_dir)
    n_distinct = planted.select("text").distinct().count()
    eff = sum(r["effective_docs"] for r in rows)
    assert abs(eff - n_distinct) < 1e-6
    assert all(r["n_docs"] >= r["n_in_dup_clusters"] for r in rows)


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    """The bucketed-window + suffix-grid skyline equals the O(n²)
    brute-force dominance check on the real corpus slice."""
    from shippai_knowledge_etl_spark.queries.curate_ops import (
        curation_pareto_frontier,
    )

    rows = curation_pareto_frontier(spark, sf_dir).collect()
    pts = [(r["doc_id"], r["m1"], r["m2"]) for r in rows]
    flags = {r["doc_id"]: r["on_frontier"] for r in rows}
    for i, m1, m2 in pts:
        dominated = any(
            o1 > m1 and o2 > m2 for j, o1, o2 in pts if j != i
        )
        assert flags[i] == (not dominated), f"doc {i}"
    assert any(flags.values()) and not all(flags.values())


def test_utf8_decode_replace_matches_cpython_fuzz():
    """The hand-rolled WHATWG maximal-subpart decoder is byte-equal to
    CPython's errors='replace' over random byte soup and every
    boundary class: lone continuation, C0/C1 overlongs (two FFFDs —
    never an accepted '/'), ED surrogates, F0/F4 plane guards, E0
    floor, truncated tails at end-of-stream."""
    import random

    from shippai_knowledge_etl_spark.operators.textops import (
        utf8_decode_replace,
    )

    random.seed(1207)
    for _ in range(2000):
        b = bytes(random.randrange(256) for _ in range(random.randint(0, 24)))
        exp = b.decode("utf-8", "replace")
        n, s, r = utf8_decode_replace(b)
        assert (n, s, r) == (
            len(exp), sum(map(ord, exp)), exp.count("�")
        ), b.hex()
    cases = {
        b"\x80": 1, b"\xc0\xaf": 2, b"\xc1\xbf": 2, b"\xed\xa0\x80": 3,
        b"\xe0\x9f\x80": 3, b"\xe3\x81": 1, b"\xf0\x80\x80\x80": 4,
        b"\xf4\x90\x80\x80": 4, b"\xf5\x80": 2, b"\xf0\x9f\x98\x80": 0,
        b"\xf0\x9f\x98": 1, b"\xff": 1,
    }
    for b, nf in cases.items():
        exp = b.decode("utf-8", "replace")
        n, s, r = utf8_decode_replace(b)
        assert r == exp.count("�") == nf, (b.hex(), r, nf)
        assert (n, s) == (len(exp), sum(map(ord, exp)))
