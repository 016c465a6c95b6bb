"""Sketch operators: properties the oracle-parity gate can't see —
Bloom false-positive rate and merge, HLL estimate accuracy and merge
associativity, incremental-dedup edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import sketches
from shippai_knowledge_etl_spark.queries.sketches import (
    dedup_incremental,
    ext_bloom_membership,
    ext_hll_distinct,
)


def _values(spark, n, tag):
    return spark.range(n).select(
        F.concat(F.lit(f"{tag}-"), F.col("id").cast("string")).alias("v")
    )


def test_bloom_no_false_negatives_and_fp_bound(spark):
    members = _values(spark, 1000, "in")
    absent = _values(spark, 2000, "out")
    bloom = sketches.bloom_build(members, "v")
    # filter never exceeds its fixed geometry
    assert bloom.count() <= 2 ** (4 * (sketches.BLOOM_HEX - 1))

    hits = sketches.bloom_might_contain(bloom, members, "v")
    assert hits.filter(~F.col("might_contain")).count() == 0  # one-sided

    fp = (
        sketches.bloom_might_contain(bloom, absent, "v")
        .filter(F.col("might_contain"))
        .count()
    )
    # n=1000, m=2^16, k=4 -> theoretical fp ~ 1.2e-5; allow slack
    assert fp / 2000 < 0.01


def test_bloom_union_merge_equals_joint_build(spark):
    a, b = _values(spark, 300, "a"), _values(spark, 300, "b")
    joint = sketches.bloom_build(a.unionAll(b), "v")
    merged = (
        sketches.bloom_build(a, "v")
        .unionAll(sketches.bloom_build(b, "v"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert (
        sorted(map(tuple, joint.collect())) == sorted(map(tuple, merged.collect()))
    )


def test_hll_estimate_accuracy(spark):
    for n in (50, 500, 5000):
        df = _values(spark, n, f"h{n}").withColumn("g", F.lit("x"))
        regs = sketches.hll_register_rows(df, ["g"], "v")
        row = sketches.hll_summary(regs, ["g"]).collect()[0]
        est = sketches.hll_estimate(row["hll_sum_scaled"], row["hll_zero_regs"])
        # m=256 -> standard error 1.04/16 = 6.5%; allow 4 sigma
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_shard_merge_equals_joint_state(spark):
    df = _values(spark, 2000, "m").withColumn("g", F.lit("x"))
    shard_a = df.filter(F.col("v").endswith("1"))
    shard_b = df.filter(~F.col("v").endswith("1"))
    joint = sketches.hll_summary(
        sketches.hll_register_rows(df, ["g"], "v"), ["g"]
    ).collect()
    merged_regs = (
        sketches.hll_register_rows(shard_a, ["g"], "v")
        .unionAll(sketches.hll_register_rows(shard_b, ["g"], "v"))
        .groupBy("g", "reg")
        .agg(F.max("rank").alias("rank"))
    )
    merged = sketches.hll_summary(merged_regs, ["g"]).collect()
    assert [tuple(r) for r in joint] == [tuple(r) for r in merged]


def test_dedup_incremental_verdict_partition(spark, sf_dir):
    out = dedup_incremental(spark, sf_dir)
    counts = {
        r["verdict"]: r["count"] for r in out.groupBy("verdict").count().collect()
    }
    assert set(counts) <= {"kept", "index_dup", "batch_dup"}
    assert counts.get("kept", 0) > 0


def test_bloom_membership_query_invariant(spark, sf_dir):
    out = ext_bloom_membership(spark, sf_dir)
    assert out.filter(~F.col("no_false_negative")).count() == 0


def test_hll_distinct_query_state_in_range(spark, sf_dir):
    for r in ext_hll_distinct(spark, sf_dir).collect():
        est = sketches.hll_estimate(r["hll_sum_scaled"], r["hll_zero_regs"])
        assert abs(est - r["exact_distinct"]) / max(r["exact_distinct"], 1) < 0.3


def test_hll_intersection_estimate_accuracy(spark):
    """Inclusion-exclusion over the register summaries lands near the
    exact intersection, and the union registers are a true max-merge
    (estimate(U) <= estimate(A) + estimate(B))."""
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.operators.sketches import hll_estimate

    r = (
        load_catalog()["ext_hll_intersection"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    ea = hll_estimate(r["a_sum_scaled"], r["a_zero_regs"])
    eb = hll_estimate(r["b_sum_scaled"], r["b_zero_regs"])
    eu = hll_estimate(r["u_sum_scaled"], r["u_zero_regs"])
    est_inter = ea + eb - eu
    # m=256 registers -> ~6.5% relative error per sketch; allow a
    # generous additive band on the (small) intersection
    assert abs(ea - r["n_a_exact"]) <= 0.25 * r["n_a_exact"] + 3
    assert abs(eb - r["n_b_exact"]) <= 0.25 * r["n_b_exact"] + 3
    assert abs(eu - r["n_union_exact"]) <= 0.25 * r["n_union_exact"] + 3
    assert abs(est_inter - r["n_inter_exact"]) <= (
        0.5 * r["n_union_exact"] * 0.065 + 0.3 * r["n_inter_exact"] + 3
    )
    assert eu <= ea + eb + 1e-9


def test_hll_rolling_estimate_tracks_exact(spark):
    """The rolled register estimate stays within sketch error of the
    exact trailing-7-day distinct for every day, and the rolling
    estimate is monotone under window growth on day 1..7 ramp-in."""
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.operators.sketches import hll_estimate

    rows = sorted(
        load_catalog()["ext_hll_rolling_distinct"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["day"],
    )
    assert rows
    for r in rows:
        est = hll_estimate(r["hll_sum_scaled"], r["hll_zero_regs"])
        assert abs(est - r["exact_rolling"]) <= (
            0.25 * r["exact_rolling"] + 3
        ), (r["day"], est, r["exact_rolling"])


def test_hist_quantile_error_bounded_by_bucket_width(spark, sf_dir):
    """The histogram estimate must land within one bucket width of the
    exact rank value — the sketch's construction guarantee."""
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.tables import load

    est = {
        r["q"]: r["est_price"]
        for r in load_catalog()["ext_hist_quantiles"].fn(spark, sf_dir).collect()
    }
    prices = sorted(
        r["o_totalprice"]
        for r in load(spark, sf_dir, "orders").select("o_totalprice").collect()
    )
    n = len(prices)
    for q, e in est.items():
        exact = prices[(q * n + 99) // 100 - 1]  # value at ceil(q*n/100)
        assert abs(e - exact) <= 10_000.0, (q, e, exact)
