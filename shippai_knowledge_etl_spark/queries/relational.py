"""Relational surface: joins, aggregations, windows, set ops, top-k.

SURVEY.md §2.4–§2.7: the reference's join-shaped computations (J1–J3)
plus the standard relational demonstrations the engine needs (semi/anti,
multiway, range, as-of, rollup/cube/grouping sets, rank/lead/cumsum,
union/intersect/except, top-k). All built-in Catalyst operators — no
UDFs — so every query here is whole-stage-codegen'd.

Scale notes applied throughout:
  - dimension sides are explicitly ``broadcast()`` (no shuffle of the
    fact table for dim joins);
  - money aggregates run on exact DECIMAL inputs (order-independent,
    hash-stable at any parallelism — float sums are neither);
  - every window / top-k carries a deterministic tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.operators import sketches as sketches_ops
from shippai_knowledge_etl_spark.tables import load, scale_out


def _money(col: str) -> F.Column:
    """Exact money input: parquet doubles carry 2-decimal values."""
    return F.col(col).cast("decimal(18,2)")


def _rate(col: str) -> F.Column:
    """Exact rate input (discount/tax, 2-decimal)."""
    return F.col(col).cast("decimal(5,2)")


def _out(col: F.Column, alias: str) -> F.Column:
    """Gate-interface cast for DECIMAL aggregates: the driver's value hash
    compares Spark ``toPandas`` (Decimal objects) against DuckDB's pandas
    conversion (float64), so numerically-equal DECIMAL results hash
    differently. Aggregate exactly in DECIMAL (order-independent), then
    emit ``round(cast double, 2)`` — mirrored as
    ``round(CAST(... AS DOUBLE), 2)`` in every oracle."""
    return F.round(col.cast("double"), 2).alias(alias)


# --------------------------------------------------------------------------
# Headline aggregations (bench)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    survey_ref="A1-family agg; TPC-H Q1 shape (SURVEY §2.4 built-ins)",
    bench=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
               / 100.0, 2) AS sum_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS DOUBLE) / 100.0, 2) AS sum_base_price,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
               / 10000.0, 2) AS sum_disc_price,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE)
               / 1000000.0, 2) AS sum_charge,
           round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*), 2) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem. Single shuffle on a low-cardinality
    key (≤6 groups) with map-side partial aggregation; the shipdate
    predicate pushes into the parquet scan, and only 7 of 11 columns are
    read (column pruning).

    Arithmetic: per-row money values scale to integer cents (LONG
    multiplies — whole-stage codegen emits plain 64-bit ops) and only
    the SUM runs in DECIMAL(38,0) (exact, order-independent,
    overflow-safe past 10^38 — a pure LONG sum would wrap near 10^19,
    within reach of a 100 TB corpus). This replaced the all-DECIMAL
    formulation after profiling showed q1's 2.7 s cold floor was
    Janino compiling the Decimal128 aggregate codegen (~4 s first
    plan, ~1.2 s per fresh plan), not execution (60 ms warm): the
    integer form compiles in ~1 s cold / 0.8 s fresh-plan, same exact
    results (values pinned equal at sf0.001/0.01/0.1)."""
    li = load(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    disc_units = price_c * (F.lit(100) - disc_c)
    charge_units = disc_units * (F.lit(100) + tax_c)

    def dec_sum(c: F.Column) -> F.Column:
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(dec_sum(qty_c) / 100.0, 2).alias("sum_qty"),
            F.round(dec_sum(price_c) / 100.0, 2).alias("sum_base_price"),
            F.round(dec_sum(disc_units) / 10000.0, 2).alias("sum_disc_price"),
            F.round(dec_sum(charge_units) / 1000000.0, 2).alias("sum_charge"),
            F.round(
                dec_sum(qty_c) / 100.0 / F.count(F.lit(1)), 2
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue",
    survey_ref="top-k + multiway join (SURVEY §2.5/§2.6 built-ins)",
    bench=True,
    oracle="""
    SELECT o_orderkey, round(CAST(revenue AS DOUBLE), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM (
      SELECT o.o_orderkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
      ORDER BY revenue DESC, o.o_orderkey
      LIMIT 10
    )
    """,
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered customer (small after filter → broadcast)
    ⋈ orders ⋈ lineitem, agg by orderkey, top-10. Catalyst plans
    TakeOrderedAndProject for the limit — no full sort at scale.
    Deterministic tie-break on o_orderkey."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = load(spark, sf_dir, "lineitem")
    revenue = _money("l_extendedprice") * (F.lit(1) - _rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("revenue"))
        # top-10 is selected on the EXACT decimal revenue (rounding first
        # could flip ties); the gate-interface cast happens after the limit.
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            _out(F.col("revenue"), "revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.6)
# --------------------------------------------------------------------------


@register(
    "j1_lookup_join",
    survey_ref="J1 (src/extract.py:197-215): per-row enrichment as left join",
    oracle="""
    SELECT n.n_name,
           count(c.c_custkey) AS n_customers,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_acctbal
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j1_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scenario-enrichment lookup as a broadcast left
    join: nation is a fixed 25-row dim — broadcast at any scale."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            _out(F.sum(_money("c_acctbal")), "sum_acctbal"),
        )
    )


@register(
    "j2_semi_join",
    survey_ref="J2 (src/extract.py:14-20,264): membership as left-semi join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having a large order — left_semi keeps the build side
    out of the output (no duplicate-row blowup, smaller shuffle)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "j3_anti_join",
    survey_ref="J3-adjacent; anti join (SURVEY §2.6 built-ins)",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j4_multiway_region_revenue",
    survey_ref="multiway dim chain (SURVEY §2.6); TPC-H Q5 shape",
    bench=True,
    oracle="""
    SELECT r.r_name,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE), 2)
               AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j4_multiway_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ three dim levels: customer/nation/region all broadcast, so
    the only shuffle is lineitem⋈orders (both huge at 100 TB → sort-merge
    on orderkey, AQE-skew-safe) plus the final 5-group agg."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = _money("l_extendedprice") * (F.lit(1) - _rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(_out(F.sum(revenue), "revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "j5_range_join_buckets",
    survey_ref="range join (SURVEY §2.6 'not present → built-in demo')",
    oracle="""
    WITH buckets(bucket, lo, hi) AS (
      VALUES ('small', 0, 10), ('medium', 10, 25), ('large', 25, 51)
    )
    SELECT b.bucket, count(*) AS n_items,
           round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_qty
    FROM lineitem l JOIN buckets b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bucket
    """,
)
def j5_range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny literal dim: Spark plans a
    BroadcastNestedLoopJoin — correct strategy when one side is rows-of-
    constants; never shuffles the fact side."""
    li = load(spark, sf_dir, "lineitem").select("l_quantity")
    buckets = spark.createDataFrame(
        [("small", 0, 10), ("medium", 10, 25), ("large", 25, 51)],
        "bucket string, lo int, hi int",
    )
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _out(F.sum(F.col("l_quantity").cast("decimal(18,2)")), "sum_qty"),
        )
    )


@register(
    "j6_asof_latest_order",
    survey_ref="as-of join (SURVEY §2.6 'not present → built-in demo')",
    oracle="""
    SELECT event_id, asof_orderkey FROM (
      SELECT e.event_id, o.o_orderkey AS asof_orderkey,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def j6_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the most recent order at or before its
    timestamp. Spark-first strategy: equi-join on the key, then a
    per-left-row window picks the latest match — one shuffle on the join
    key, no per-row scans. (An O(1)-memory merge-asof over co-bucketed
    sorted partitions is the 100 TB upgrade path; same result.)"""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", F.col("o_orderkey").alias("asof_orderkey"))
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube / distinct aggregates (SURVEY §2.4)
# --------------------------------------------------------------------------


@register(
    "a_rollup_region_nation",
    survey_ref="rollup (SURVEY §2.4 'not present → built-in demo')",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def a_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "a_cube_status_priority",
    survey_ref="cube (SURVEY §2.4 'not present → built-in demo')",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _out(F.sum(_money("o_totalprice")), "sum_total"),
    )


@register(
    "a_grouping_sets",
    survey_ref="grouping sets (SURVEY §2.4 'not present → built-in demo')",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "a_distinct_agg",
    survey_ref="distinct aggregates (SURVEY §2.4 'not present → built-in demo')",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates: Catalyst plans expand + two-phase
    agg; at scale prefer approx_count_distinct (demoed rows-only in
    ext_approx_distinct) when exactness isn't required."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Windows (SURVEY §2.8 W5/W7 + ranking built-ins)
# --------------------------------------------------------------------------


@register(
    "w5_cumulative_sum",
    survey_ref="W5 (src/render_pdf.py:217-227): running position as cumsum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 2) AS running_total
    FROM orders
    """,
)
def w5_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's running-y-position accumulator as the canonical
    cumulative window frame. Partitioned by customer → parallel across
    the cluster; no global sort."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _out(F.sum(_money("o_totalprice")).over(w), "running_total"),
    )


@register(
    "w7_lead_lag",
    survey_ref="W7 (src/render_pdf.py:285-299): lead-dependent placement",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           lag(o_orderkey)  OVER w AS prev_orderkey,
           CAST(epoch(lead(o_orderdate) OVER w) AS BIGINT)
             - CAST(epoch(o_orderdate) AS BIGINT) AS sec_to_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def w7_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        (
            F.unix_timestamp(F.lead("o_orderdate").over(w))
            - F.unix_timestamp("o_orderdate")
        ).alias("sec_to_next"),
    )


@register(
    "o1_rank_in_nation",
    survey_ref="O1 + ranking built-ins (SURVEY §2.5/§2.8)",
    oracle="""
    SELECT c_custkey, c_nationkey,
           rank()       OVER w AS bal_rank,
           dense_rank() OVER w AS bal_dense_rank,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS bal_rownum
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
    """,
)
def o1_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank tolerate ties; row_number carries an explicit
    c_custkey tie-break (SURVEY §7.4: never rely on implicit order)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    wn = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.row_number().over(wn).alias("bal_rownum"),
    )


@register(
    "o2_topk_orders",
    survey_ref="O2 limit pushdown (src/extract.py:404-406) + top-k",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o2_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject: per-partition top-k then a
    k-row merge on the driver; the reference's in-scan `break` is the
    degenerate single-partition case of the same pushdown."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    ).limit(10)


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# --------------------------------------------------------------------------


@register(
    "u1_union_worklists",
    survey_ref="U1 (src/run.py:66-77): worklist union",
    oracle="""
    SELECT DISTINCT o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def u1_union_worklists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return a.unionByName(b).distinct()


@register(
    "u3_intersect",
    survey_ref="U3/intersect (SURVEY §2.7 built-ins)",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )


@register(
    "u4_except",
    survey_ref="U4 (src/render_pdf.py:187-201): set subtraction",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)  # EXCEPT (distinct) semantics, matches SQL EXCEPT


@register(
    "q14_promo_share",
    survey_ref="TPC-H Q14 shape (beyond-reference built-in): promo "
    "revenue share over a shipdate year — conditional-sum ratio over "
    "one broadcast-part join; DECIMAL-exact numerator/denominator, "
    "one rounded division at the gate",
    oracle="""
    SELECT round(CAST(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(5,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE),
                 6) AS promo_share_pct,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of 1996 shipped revenue came from promo parts —
    TPC-H Q14's conditional-sum-ratio shape. The part dim broadcasts
    (it is partkey-sized, not fact-sized); the shipdate predicate
    reaches the parquet scan as a pushed filter; numerator and
    denominator aggregate in exact DECIMAL with the single division
    rounded at the gate boundary."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _money("l_extendedprice") * (F.lit(1) - _rate("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
            )
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q15_top_supplier",
    survey_ref="TPC-H Q15 shape (beyond-reference built-in): ALL "
    "suppliers tied at maximum quarterly revenue — supplier-keyed "
    "rollup, 1-row broadcast max, tie-preserving equality filter "
    "(LIMIT 1 would silently drop ties), broadcast supplier dim",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey),
    mx AS (SELECT max(total_rev) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name,
           round(CAST(r.total_rev AS DOUBLE), 2) AS total_rev
    FROM rev r
    JOIN mx ON r.total_rev = mx.m
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum Q1-1996 revenue — TPC-H Q15's
    tie-preserving max semantics: the max rides a 1-row broadcast and
    the equality filter keeps EVERY tied supplier (an ORDER BY/LIMIT 1
    would silently drop ties and make the answer
    partitioning-dependent on equal DECIMALs). Comparison happens on
    the exact DECIMAL revenue; the rounded cast is gate-interface
    only. The supplier dim broadcasts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                _money("l_extendedprice") * (F.lit(1) - _rate("l_discount"))
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("m"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _out(F.col("total_rev"), "total_rev"),
        )
    )


@register(
    "sql_correlated_scalar",
    survey_ref="SQL-surface demo (beyond-reference built-in): "
    "correlated scalar subqueries through Catalyst decorrelation — "
    "orders priced above 1.5x their customer's own average, written "
    "AS correlated subqueries (not hand-joined aggregates) so the "
    "optimizer's RewriteCorrelatedScalarSubquery does the plan work; "
    "the 1.5x-average test is an exact cross-multiplied DECIMAL "
    "compare, no float boundary",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           round(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                      AS DOUBLE), 2) AS o_totalprice
    FROM orders o
    WHERE 2 * (SELECT count(*) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)
            * CAST(o.o_totalprice AS DECIMAL(18,2))
        > 3 * (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
               FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders more than 1.5x their own customer's average order value,
    expressed with CORRELATED SCALAR SUBQUERIES — the declarative
    form analysts write — and left to Catalyst to decorrelate into
    aggregate + join (no hand-rewritten groupBy). The comparison
    cross-multiplies: price > 1.5*avg becomes 2*cnt*price > 3*sum,
    all in exact DECIMAL/integer terms, so no float-boundary row can
    flip between engines. Scale: after decorrelation this is one
    custkey-keyed aggregate joined back to the fact — the same
    shuffle class as writing it by hand."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               round(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                          AS DOUBLE), 2) AS o_totalprice
        FROM orders_v o
        WHERE 2 * (SELECT count(*) FROM orders_v o2
                   WHERE o2.o_custkey = o.o_custkey)
                * CAST(o.o_totalprice AS DECIMAL(18,2))
            > 3 * (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                   FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q13_customer_distribution",
    survey_ref="TPC-H Q13 shape (beyond-reference built-in): customer "
    "order-count distribution — LEFT OUTER join that must preserve "
    "zero-order customers, then a second aggregation over the first's "
    "output (count-of-counts); the outer-join + two-level-agg plan "
    "family's first catalog entry",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey,
             count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N (non-urgent) orders — TPC-H
    Q13's count-of-counts shape, the canonical "distribution of
    engagement" report. The LEFT OUTER join is load-bearing: customers
    with zero qualifying orders must appear as c_count = 0, which an
    inner join silently drops (and which is why Q13 famously cannot be
    pre-aggregated on the orders side alone — the zero groups only
    exist on the customer side).

    Scale shape: the orders side is pre-aggregated to one row per
    custkey BEFORE the join (cuts the join input from |orders| to
    ≤|customer| rows — at 100 TB that is the difference between
    shuffling the fact table and shuffling a per-key rollup), then a
    custkey-keyed shuffle join against customer keeps zero-order rows
    via coalesce(cnt, 0), and the final count-of-counts aggregates a
    ≤|customer|-row input on a tiny key domain. The non-equi predicate
    (o_orderpriority <> '1-URGENT') pushes into the orders scan as a
    pushed filter, not a join residual. Both aggregations are integer
    counts — hash-exact at any parallelism."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_cust = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q22_dormant_accounts",
    survey_ref="TPC-H Q22 shape (beyond-reference built-in): "
    "above-average-balance customers with NO recent orders — global "
    "scalar aggregate (1-row broadcast) + anti join + rollup in one "
    "plan; the balance test is cross-multiplied DECIMAL/integer, no "
    "float boundary (the sql_correlated_scalar discipline)",
    oracle="""
    WITH stats AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
             count(*) AS c
      FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01')
    SELECT c.c_mktsegment,
           count(*) AS numcust,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE),
                 2) AS totacctbal
    FROM customer c, stats
    WHERE stats.c * CAST(c.c_acctbal AS DECIMAL(18,2)) > stats.s
      AND NOT EXISTS (SELECT 1 FROM recent r
                      WHERE r.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment count and balance of customers whose balance beats
    the positive-balance average but who placed no order since
    2000-01-01 — TPC-H Q22's "sales opportunity" shape: a global
    scalar aggregate feeding the filter, an anti join removing the
    active customers, and a small-key rollup, all one plan.

    Scale shape: the scalar stats are a 1-row broadcast (allowlisted
    BNLJ class — broadcasting one row is the CORRECT plan; the
    alternative is a shuffle to a single reducer); the recent-orders
    probe side is date-pruned AT THE SCAN then distinct'd to ≤
    |customer| keys before the LeftAnti (broadcastable at dim scale,
    AQE decides); the balance predicate is exact cross-multiplied
    DECIMAL so no float boundary row flips. The rollup key has ~5
    values — map-side partials collapse it."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", _money("c_acctbal").alias("bal")
    )
    stats = c.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("s"), F.count(F.lit(1)).alias("c")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(F.col("c") * F.col("bal") > F.col("s"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _out(F.sum("bal"), "totacctbal"),
        )
    )


@register(
    "q12_fulfillment_latency",
    survey_ref="TPC-H Q12 shape (beyond-reference built-in): "
    "order-to-ship latency classes per priority — the catalog's first "
    "RAW fact-to-fact equi-join (orders x lineitem on orderkey, "
    "nothing pre-aggregated on either side); integer epoch-day lag, "
    "exact dyadic median per priority",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             (CAST(floor(epoch(l.l_shipdate)) AS BIGINT)
              - CAST(floor(epoch(o.o_orderdate)) AS BIGINT)) // 86400
               AS lag_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           count(*) AS n_lines,
           CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_fast,
           CAST(sum(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_slow,
           round(quantile_cont(lag_days, 0.5), 6) AS median_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def q12_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per order priority — TPC-H Q12's
    "is expensive shipping actually faster" report re-expressed on
    this schema: every lineitem joins its order, the lag classifies
    fast (≤30 days) / slow (>90 days), and the exact median latency
    rides along per priority.

    Scale shape: a RAW fact-to-fact equi-join — orders and lineitem
    both shuffle on orderkey (no pre-aggregation can stand in: the
    lag needs both sides' dates row-by-row). This is THE shuffle the
    bucketing/partitioned-layout modules exist to delete (co-located
    bucketed tables turn it into a zero-exchange SortMergeJoin; see
    tests/test_bucketing.py); expressed declaratively, AQE picks the
    join strategy. Lag is integer epoch-day arithmetic with NO
    calendar/timezone functions; note Spark's `div` truncates toward
    zero while the DuckDB oracle's `//` floors — they agree here
    because TPC-H guarantees l_shipdate >= o_orderdate (lag is never
    negative) AND both dates are midnight stamps (the difference is an
    exact multiple of 86400). That data invariant is asserted, not
    assumed: the parity suite plants no negative lags, and the n_fast
    count below would flip on any floor/trunc divergence. The median
    of integers is a dyadic rational — exact at the gate."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_timestamp("o_orderdate").alias("ot"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.unix_timestamp("l_shipdate").alias("st")
    )
    lat = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.expr("(st - ot) div 86400").alias("lag_days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("lag_days") <= 30).cast("int"))
        .cast("long")
        .alias("n_fast"),
        F.sum((F.col("lag_days") > 90).cast("int"))
        .cast("long")
        .alias("n_slow"),
        F.round(F.percentile("lag_days", F.lit(0.5)), 6).alias(
            "median_days"
        ),
    )


@register(
    "a_contribution_shares",
    survey_ref="§2.4/§2.8 composition (beyond-reference built-in): "
    "percent-of-total contribution reporting — nation revenue share "
    "of its region and region share of grand total, both as windows "
    "OVER THE ROLLUP (25 nation rows), never the fact stream; the "
    "ratio_to_report pattern every BI layer ships",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS nrev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name)
    SELECT region, nation,
           round(CAST(nrev AS DOUBLE), 2) AS nation_rev,
           round(CAST(nrev AS DOUBLE)
                 / CAST(sum(nrev) OVER (PARTITION BY region) AS DOUBLE),
                 6) AS share_of_region,
           round(CAST(sum(nrev) OVER (PARTITION BY region) AS DOUBLE)
                 / CAST(sum(nrev) OVER () AS DOUBLE), 6)
             AS region_share_of_total
    FROM rev
    """,
)
def a_contribution_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue contribution report: each nation's share of its region
    and each region's share of the grand total — the percent-of-total
    (ratio_to_report) window pattern. The fact stream aggregates ONCE
    to 25 (region, nation) DECIMAL rows; both share windows run over
    that rollup (the global window moves 25 rows at any scale — the
    f14 fixed-dimension discipline), so the report costs one fact
    shuffle no matter how wide the warehouse is. Revenue sums are
    exact DECIMAL; each share is one rounded division of DECIMAL-
    backed doubles with identical operand order."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (_money("l_extendedprice") * (F.lit(1) - _rate("l_discount"))).alias(
            "rev"
        ),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("rev").alias("nrev"))
    )
    wr = Window.partitionBy("region")
    wg = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round(F.col("nrev").cast("double"), 2).alias("nation_rev"),
        F.round(
            F.col("nrev").cast("double")
            / F.sum("nrev").over(wr).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.sum("nrev").over(wr).cast("double")
            / F.sum("nrev").over(wg).cast("double"),
            6,
        ).alias("region_share_of_total"),
    )


@register(
    "quality_cdc_merge",
    survey_ref=(
        "warehouse-maintenance demo (beyond-reference built-in): "
        "CDC / MERGE-upsert semantics relationally — a derived change "
        "log (updates, deletes, inserts, conflicting seqs) applied "
        "latest-wins per key over a FULL OUTER join: the Delta/Iceberg "
        "MERGE INTO shape expressed as a plain declarative plan"
    ),
    oracle="""
    WITH ch AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
             CAST(o_totalprice AS DECIMAL(18,2)) + 1000 AS price
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 1, 'D', NULL FROM orders WHERE o_orderkey % 10 = 1
      UNION ALL
      SELECT o_orderkey + 10000000, 1, 'I',
             CAST(o_totalprice AS DECIMAL(18,2))
      FROM orders WHERE o_orderkey % 10 = 2
      UNION ALL
      SELECT o_orderkey, 2, 'U',
             CAST(o_totalprice AS DECIMAL(18,2)) + 2000
      FROM orders WHERE o_orderkey % 100 = 0),
    last AS (
      SELECT k, op, price FROM ch
      QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1),
    merged AS (
      SELECT coalesce(l.k, b.o_orderkey) AS o_orderkey,
             CASE WHEN l.k IS NULL
                  THEN CAST(b.o_totalprice AS DECIMAL(18,2))
                  ELSE l.price END AS price,
             CASE WHEN l.k IS NULL THEN 'base'
                  WHEN b.o_orderkey IS NULL THEN 'insert'
                  ELSE 'upsert' END AS src
      FROM orders b FULL OUTER JOIN last l ON l.k = b.o_orderkey
      WHERE coalesce(l.op, '') <> 'D')
    SELECT o_orderkey, round(CAST(price AS DOUBLE), 2) AS price, src
    FROM merged
    """,
)
def quality_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change log to a base table with MERGE semantics —
    updates replace, deletes drop, inserts add, and conflicting
    changes to one key resolve LATEST-WINS by sequence number (orders
    keys ≡0 mod 100 carry two competing updates; the seq-2 one must
    land). This is Delta/Iceberg's MERGE INTO expressed as a plain
    plan: dedupe the log per key (row_number over seq DESC — the
    w7/as-of machinery), FULL OUTER join against the base, one CASE
    per column. The change log is derived deterministically from the
    base so both engines hold the identical log.

    Scale shape: the per-key log dedupe shuffles only the CHANGE LOG
    (in real CDC: hours of changes, a sliver of the base); the merge
    itself is one key-equi FULL OUTER join — the q12 fact-fact class,
    bucketing's other marquee customer (a bucketed base makes nightly
    MERGE a zero-exchange join). Money stays DECIMAL until the gate
    round; row provenance (src) is part of the output contract."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", _money("o_totalprice").alias("bprice")
    )
    k = F.col("o_orderkey")
    ch = (
        o.filter(k % 10 == 0)
        .select(
            k.alias("k"),
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
            (F.col("bprice") + 1000).alias("price"),
        )
        .unionByName(
            o.filter(k % 10 == 1).select(
                k.alias("k"),
                F.lit(1).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("decimal(19,2)").alias("price"),
            )
        )
        .unionByName(
            o.filter(k % 10 == 2).select(
                (k + 10000000).alias("k"),
                F.lit(1).alias("seq"),
                F.lit("I").alias("op"),
                F.col("bprice").cast("decimal(19,2)").alias("price"),
            )
        )
        .unionByName(
            o.filter(k % 100 == 0).select(
                k.alias("k"),
                F.lit(2).alias("seq"),
                F.lit("U").alias("op"),
                (F.col("bprice") + 2000).alias("price"),
            )
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    last = (
        ch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "op", "price")
    )
    merged = (
        o.join(last, o.o_orderkey == last.k, "full_outer")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("k"), F.col("o_orderkey")).alias("o_orderkey"),
            F.when(F.col("k").isNull(), F.col("bprice").cast("decimal(19,2)"))
            .otherwise(F.col("price"))
            .alias("price"),
            F.when(F.col("k").isNull(), F.lit("base"))
            .when(F.col("o_orderkey").isNull(), F.lit("insert"))
            .otherwise(F.lit("upsert"))
            .alias("src"),
        )
    )
    return merged.select(
        "o_orderkey",
        F.round(F.col("price").cast("double"), 2).alias("price"),
        "src",
    )


# Benford expected first-digit probabilities, computed ONCE in Python
# and shipped to BOTH engines as shared literals (the nDCG discount
# discipline — neither engine's own log10 participates).
import math as _math

_BENFORD_P = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


@register(
    "quality_benford_audit",
    survey_ref=(
        "data-quality audit (beyond-reference built-in): Benford's-law "
        "first-digit test on order amounts — the fraud/synthetic-data "
        "screen auditors run; expected probabilities are SHARED Python "
        "literals, chi-square terms round-then-DECIMAL-sum so the "
        "9-term total is order-independent"
    ),
    oracle=f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
      WHERE o_totalprice > 0),
    dg AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT) AS d
           FROM cents),
    n AS (SELECT count(*) AS n FROM dg),
    obs AS (SELECT d, count(*) AS n_obs FROM dg GROUP BY d),
    exp AS (SELECT d, CAST(p AS DOUBLE) AS p FROM (VALUES {", ".join(
        f"({d}, {p!r})" for d, p in sorted(_BENFORD_P.items())
    )}) AS t(d, p)),
    terms AS (
      SELECT e.d, coalesce(o.n_obs, 0) AS n_obs,
             CAST(round(n.n * e.p, 2) AS DECIMAL(18,2)) AS n_exp,
             CAST(round((coalesce(o.n_obs, 0) - n.n * e.p)
                        * (coalesce(o.n_obs, 0) - n.n * e.p)
                        / (n.n * e.p), 6) AS DECIMAL(18,6)) AS term
      FROM exp e LEFT JOIN obs o ON o.d = e.d, n)
    SELECT d,
           CAST(n_obs AS BIGINT) AS n_obs,
           round(CAST(n_exp AS DOUBLE), 2) AS n_exp,
           round(CAST(term AS DOUBLE), 6) AS chi2_term,
           round(CAST(sum(term) OVER () AS DOUBLE), 6) AS chi2_total,
           CAST(sum(term) OVER () AS DOUBLE) > 15.51 AS rejected_95
    FROM terms
    """,
)
def quality_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order amounts: observed first-digit
    counts vs log10(1 + 1/d) expectations and the chi-square statistic
    (8 degrees of freedom, 15.51 = 95 % critical value) — the screen
    auditors run against fabricated or unit-biased numeric columns.

    Hash-safety: expected probabilities are shared Python literals;
    each chi-square term is a per-row double expression rounded then
    DECIMAL(18,6)-summed (the dsir discipline) so the 9-term total is
    order-independent; the rejection flag compares the DECIMAL-backed
    total. Scale: one scan to first digits (string head of the cents
    integer — no float log), a 9-key count, and 9-row literal joins;
    the chi2 window moves 9 rows (allowlisted bounded class)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    dg = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    n = dg.agg(F.count(F.lit(1)).alias("n"))
    obs = dg.groupBy("d").agg(F.count(F.lit(1)).alias("n_obs"))
    exp = spark.createDataFrame(
        sorted(_BENFORD_P.items()), "d int, p double"
    )
    j = (
        exp.join(obs, "d", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "d",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            (F.col("n") * F.col("p")).alias("ne"),
        )
    )
    term = F.round(
        (F.col("n_obs") - F.col("ne"))
        * (F.col("n_obs") - F.col("ne"))
        / F.col("ne"),
        6,
    ).cast("decimal(18,6)")
    terms = j.select(
        "d",
        "n_obs",
        F.round(F.col("ne"), 2).cast("decimal(18,2)").alias("n_exp"),
        term.alias("term"),
    )
    tot = F.sum("term").over(Window.partitionBy())
    return terms.select(
        "d",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(F.col("n_exp").cast("double"), 2).alias("n_exp"),
        F.round(F.col("term").cast("double"), 6).alias("chi2_term"),
        F.round(tot.cast("double"), 6).alias("chi2_total"),
        (tot.cast("double") > 15.51).alias("rejected_95"),
    )


@register(
    "a_ks_test_bucketed",
    survey_ref=(
        "distribution-drift test (beyond-reference built-in): two-"
        "sample Kolmogorov-Smirnov on bucketed ECDFs — click vs "
        "purchase value distributions; the drift gate every feature "
        "store / model monitor runs; D maximized in INTEGER cross-"
        "multiplied form so no float boundary picks the wrong bucket"
    ),
    oracle="""
    WITH t AS (
      SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
             CAST(floor(value / 10) AS INT) AS b
      FROM events WHERE event_type IN ('click', 'purchase')),
    n AS (
      SELECT sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n2
      FROM t),
    h AS (
      SELECT b,
             sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c2
      FROM t GROUP BY b),
    c AS (
      SELECT b,
             sum(c1) OVER (ORDER BY b) AS cum1,
             sum(c2) OVER (ORDER BY b) AS cum2
      FROM h),
    d AS (SELECT c.b, abs(cum1 * n.n2 - cum2 * n.n1) AS dn FROM c, n),
    m AS (SELECT max(dn) AS md FROM d)
    SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
           CAST(m.md AS BIGINT) AS d_num,
           round(CAST(m.md AS DOUBLE) / (n.n1 * n.n2), 6) AS ks_d,
           CAST(min(CASE WHEN d.dn = m.md THEN d.b END) AS INT)
             AS at_bucket
    FROM d, m, n
    GROUP BY n.n1, n.n2, m.md
    """,
)
def a_ks_test_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance between the click and purchase value
    distributions on a bucketed grid (width-10 value buckets) — the
    distribution-drift gate feature stores and model monitors run
    between snapshots. Bucketing makes the ECDF state bounded (the
    hist-quantile discipline: value_range/width rows, a constant),
    and the D statistic maximizes |cum1·n2 − cum2·n1| in INTEGER form
    — the exact fraction comparison — so the winning bucket cannot
    flip on a float boundary; one division at the gate.

    Scale shape: one conditional-count rollup per bucket (map-side
    partials over the stream), cumulative windows over the ≤35-row
    bucket grid (allowlisted bounded class), 1-row totals and max
    broadcast back."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    t = ev.select(
        (F.col("event_type") != "click").cast("int").alias("g"),
        F.floor(F.col("value") / 10).cast("int").alias("b"),
    )
    n = t.agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n2"),
    )
    h = t.groupBy("b").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("b").rangeBetween(Window.unboundedPreceding, 0)
    c = h.select(
        "b",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    d = c.crossJoin(F.broadcast(n)).select(
        "b",
        "n1",
        "n2",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias(
            "dn"
        ),
    )
    m = d.agg(F.max("dn").alias("md"))
    return (
        d.crossJoin(F.broadcast(m))
        .groupBy("n1", "n2", "md")
        .agg(
            F.min(F.when(F.col("dn") == F.col("md"), F.col("b")))
            .cast("int")
            .alias("at_bucket")
        )
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("md").cast("long").alias("d_num"),
            F.round(
                F.col("md").cast("double") / (F.col("n1") * F.col("n2")), 6
            ).alias("ks_d"),
            "at_bucket",
        )
    )


@register(
    "a_trimmed_mean",
    survey_ref=(
        "robust-stats completion (beyond-reference built-in): 10 % "
        "two-sided trimmed mean of order value per priority — the "
        "robust LEVEL estimate beside w22's MAD (spread) and w23's "
        "Theil-Sen (trend); exact dyadic decile bounds on integer "
        "cents, one gate division"
    ),
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    b AS (
      SELECT pri,
             quantile_cont(cents, 0.1) AS lo,
             quantile_cont(cents, 0.9) AS hi
      FROM c GROUP BY pri)
    SELECT c.pri AS o_orderpriority,
           count(*) AS n_kept,
           round(CAST(sum(c.cents) AS DOUBLE) / count(*) / 100.0, 4)
             AS trimmed_mean
    FROM c JOIN b ON b.pri = c.pri
    WHERE c.cents >= b.lo AND c.cents <= b.hi
    GROUP BY c.pri
    """,
)
def a_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 % two-sided trimmed mean of order value per priority: drop
    everything outside the [p10, p90] band, average the rest — the
    robust level estimate (a handful of fat-finger orders cannot move
    it) completing the robust-stats family (w22 MAD = spread, w23
    Theil-Sen = trend, this = level).

    Hash-safety: trim bounds are exact interpolated percentiles of
    integer cents — dyadic rationals both engines hold bit-identically
    — so the keep/drop comparison cannot flicker; the kept sum is an
    integer, with one rounded division at the gate. Scale: one
    per-priority percentile rollup (≤5 rows) broadcast back onto the
    scan; no global sort."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    b = o.groupBy("pri").agg(
        F.percentile("cents", F.lit(0.1)).alias("lo"),
        F.percentile("cents", F.lit(0.9)).alias("hi"),
    )
    return (
        o.join(F.broadcast(b), "pri")
        .filter((F.col("cents") >= F.col("lo")) & (F.col("cents") <= F.col("hi")))
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(
                F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0, 4
            ).alias("trimmed_mean"),
        )
        .select(
            F.col("pri").alias("o_orderpriority"), "n_kept", "trimmed_mean"
        )
    )


@register(
    "quality_sequence_gaps",
    survey_ref=(
        "data-completeness audit (beyond-reference built-in): "
        "block-level sequence-gap detection over a dense key domain "
        "(planted ~1% key losses) — the 'did the loader drop rows' "
        "check; per-block expected-vs-actual counts instead of a "
        "global sort, so the audit is one rollup at any scale"
    ),
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 <> 13),
    g AS (SELECT min(k) AS mn, max(k) AS mx FROM src),
    blk AS (SELECT k // 1000 AS b, count(*) AS n_actual
            FROM src GROUP BY b)
    SELECT CAST(blk.b AS BIGINT) AS block,
           CAST(least(g.mx, blk.b * 1000 + 999)
                - greatest(g.mn, blk.b * 1000) + 1 AS BIGINT)
             AS n_expected,
           CAST(blk.n_actual AS BIGINT) AS n_actual,
           CAST(least(g.mx, blk.b * 1000 + 999)
                - greatest(g.mn, blk.b * 1000) + 1
                - blk.n_actual AS BIGINT) AS n_missing
    FROM blk, g
    """,
)
def quality_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which 1000-key blocks of the order-key sequence are missing
    rows — the load-completeness audit that localizes a dropped batch
    without sorting the key column globally: per-block actual counts
    against the expected span (edge blocks clipped by the global
    min/max, a 1-row broadcast). Planted losses (every 97th key ≡ 13)
    make the driver run detect real gaps; a clean load reports zeros.

    Scale: one block-keyed rollup with map-side partials (block =
    key div 1000 — blocks inherit the scan's natural ordering, no
    shuffle skew), one 1-row global min/max broadcast; no window, no
    sort. Relational sibling of the referential-integrity audit
    (quality_referential_integrity): that one checks FK edges, this
    one checks the key sequence itself."""
    src = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 != 13)
        .select(F.col("o_orderkey").alias("k"))
    )
    g = src.agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
    blk = src.groupBy(F.expr("k div 1000").alias("b")).agg(
        F.count(F.lit(1)).alias("n_actual")
    )
    exp = (
        F.least(F.col("mx"), F.col("b") * 1000 + 999)
        - F.greatest(F.col("mn"), F.col("b") * 1000)
        + 1
    )
    return blk.crossJoin(F.broadcast(g)).select(
        F.col("b").cast("long").alias("block"),
        exp.cast("long").alias("n_expected"),
        F.col("n_actual").cast("long").alias("n_actual"),
        (exp - F.col("n_actual")).cast("long").alias("n_missing"),
    )


_FD_CANDIDATES = (
    ("o_orderkey", "o_custkey"),
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderpriority", "o_orderstatus"),
)


@register(
    "quality_fd_profile",
    survey_ref=(
        "schema-inference audit (beyond-reference built-in): "
        "functional-dependency profiling (Metanome-style) — does "
        "LHS determine RHS, measured as distinct(LHS) vs "
        "distinct(LHS, RHS); key columns must hold, attribute pairs "
        "must report their violation counts, all exact integers"
    ),
    oracle="""
    """
    + "\nUNION ALL\n".join(
        f"""SELECT '{l}' AS lhs, '{r}' AS rhs,
           count(DISTINCT {l}) AS n_lhs_values,
           count(DISTINCT ({l}, {r})) AS n_lhs_rhs_pairs,
           CAST(count(DISTINCT ({l}, {r})) - count(DISTINCT {l})
             AS BIGINT) AS n_violating,
           count(DISTINCT ({l}, {r})) = count(DISTINCT {l}) AS fd_holds
    FROM orders"""
        for l, r in _FD_CANDIDATES
    ),
)
def quality_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which functional dependencies actually hold in the loaded data
    — the schema-inference / constraint-discovery audit (Papenbrock
    et al.'s Metanome family, the two-distinct-count special case):
    distinct(LHS) == distinct(LHS, RHS) ⟺ LHS → RHS. The key column
    (o_orderkey) must determine everything; attribute pairs report
    how many LHS groups carry conflicting RHS values — the number a
    MERGE or dimension build would silently mangle.

    Scale shape: one aggregate per candidate over a two-column pruned
    scan (count-distinct partials merge map-side); candidates are a
    fixed literal list, so the plan is |candidates| independent
    scan+agg branches unioned — embarrassingly parallel, no joins.
    Exact integer counts only."""
    o = load(spark, sf_dir, "orders")
    parts = []
    for l, r in _FD_CANDIDATES:
        parts.append(
            o.agg(
                F.countDistinct(l).alias("n_lhs_values"),
                F.countDistinct(l, r).alias("n_lhs_rhs_pairs"),
            ).select(
                F.lit(l).alias("lhs"),
                F.lit(r).alias("rhs"),
                "n_lhs_values",
                "n_lhs_rhs_pairs",
                (F.col("n_lhs_rhs_pairs") - F.col("n_lhs_values"))
                .cast("long")
                .alias("n_violating"),
                (F.col("n_lhs_rhs_pairs") == F.col("n_lhs_values")).alias(
                    "fd_holds"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "quality_table_checksum",
    survey_ref=(
        "replication-validation audit (beyond-reference built-in): "
        "block-level order-independent table checksums (the "
        "pt-table-checksum / anti-entropy pattern) — base vs a "
        "replica with planted silent corruption; per-block row counts "
        "+ SUMS of per-row 32-bit content hashes localize the "
        "divergent block without moving either table"
    ),
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    replica AS (
      SELECT k,
             CASE WHEN k % 501 = 7 THEN cents + 1 ELSE cents END AS cents
      FROM base WHERE k <> 42),
    bsum AS (
      SELECT k // 1000 AS block, count(*) AS n_rows,
             sum(CAST('0x' || substring(md5(CAST(k AS VARCHAR) || '|'
                 || CAST(cents AS VARCHAR)), 1, 8) AS BIGINT)) AS crc
      FROM base GROUP BY block),
    rsum AS (
      SELECT k // 1000 AS block, count(*) AS n_rows,
             sum(CAST('0x' || substring(md5(CAST(k AS VARCHAR) || '|'
                 || CAST(cents AS VARCHAR)), 1, 8) AS BIGINT)) AS crc
      FROM replica GROUP BY block)
    SELECT b.block,
           CAST(b.n_rows AS BIGINT) AS n_base,
           CAST(coalesce(r.n_rows, 0) AS BIGINT) AS n_replica,
           CAST(b.crc AS BIGINT) AS base_crc,
           CAST(coalesce(r.crc, 0) AS BIGINT) AS replica_crc,
           (b.n_rows = coalesce(r.n_rows, 0)
            AND b.crc = coalesce(r.crc, 0)) AS block_matches
    FROM bsum b LEFT JOIN rsum r USING (block)
    """,
)
def quality_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the replica still equal the base — without shipping either
    table: per-1000-key-block row counts and ORDER-INDEPENDENT content
    checksums (sum of per-row 32-bit md5 prefixes; addition commutes,
    so partitioning and row order cannot change the block value — the
    pt-table-checksum / Cassandra anti-entropy pattern). The planted
    replica silently corrupts every 501st price by one cent and drops
    one row; the mismatching blocks localize both without a row-level
    diff. At warehouse scale the 32-bit-sum checksum would move to a
    DECIMAL(38) or modular sum — the shape (per-block agg + tiny
    join) is unchanged.

    Scale shape: one block-keyed rollup per side (map-side partials),
    a block-count-sized join; no sort, no row shipping. Integer
    output only."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    replica = o.filter(F.col("k") != 42).select(
        "k",
        F.when(F.col("k") % 501 == 7, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )

    def block_sums(df: DataFrame) -> DataFrame:
        crc = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("k").cast("string"),
                        F.lit("|"),
                        F.col("cents").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return df.groupBy(F.expr("k div 1000").alias("block")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(crc).alias("crc"),
        )

    b = block_sums(o)
    r = block_sums(replica)
    rb = r.select(
        F.col("block"),
        F.col("n_rows").alias("rn"),
        F.col("crc").alias("rcrc"),
    )
    return b.join(rb, "block", "left").select(
        "block",
        F.col("n_rows").cast("long").alias("n_base"),
        F.coalesce("rn", F.lit(0)).cast("long").alias("n_replica"),
        F.col("crc").cast("long").alias("base_crc"),
        F.coalesce("rcrc", F.lit(0)).cast("long").alias("replica_crc"),
        (
            (F.col("n_rows") == F.coalesce("rn", F.lit(0)))
            & (F.col("crc") == F.coalesce("rcrc", F.lit(0)))
        ).alias("block_matches"),
    )


@register(
    "a_pareto_concentration",
    survey_ref=(
        "BI concentration analysis (beyond-reference built-in): "
        "Lorenz/Pareto report over customer revenue in log2 revenue "
        "bands (the curation_length_batches bucketing) — 'does 20% of "
        "the base drive 80% of revenue'; cumulative shares as windows "
        "over the ≤40-band rollup, never a global customer sort"
    ),
    oracle="""
    WITH cr AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey),
    b AS (
      SELECT CAST(floor(log2(cents)) AS INT) AS band,
             count(*) AS n_cust,
             sum(cents) AS band_cents
      FROM cr GROUP BY band),
    t AS (SELECT sum(n_cust) AS tc, sum(band_cents) AS tr FROM b),
    c AS (
      SELECT band, n_cust, band_cents,
             sum(n_cust) OVER (ORDER BY band DESC) AS cum_cust,
             sum(band_cents) OVER (ORDER BY band DESC) AS cum_cents
      FROM b)
    SELECT c.band,
           CAST(c.n_cust AS BIGINT) AS n_cust,
           round(CAST(c.band_cents AS DOUBLE) / 100.0, 2) AS band_revenue,
           round(CAST(c.cum_cust AS DOUBLE) / t.tc, 6) AS cust_share,
           round(CAST(c.cum_cents AS DOUBLE) / t.tr, 6) AS revenue_share
    FROM c, t
    """,
)
def a_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto/Lorenz) report: customers roll up
    into log2 revenue bands, and cumulative customer-share vs
    revenue-share scanning from the highest band answers "what
    fraction of the base drives what fraction of revenue". The exact
    Lorenz curve needs a global customer sort; banding (the
    length_batches floor(log2) discipline) makes the curve's support
    BOUNDED (≤~40 bands for any revenue range), which is what a
    100 TB warehouse can afford — and band resolution is a knob, not
    a rewrite.

    Hash-safety: integer cents throughout; floor(log2(cents)) on an
    integer only misrounds if log2 lands within an ulp of an integer,
    i.e. cents within 1 ulp of a power of two — impossible for
    IEEE-exact integer inputs below 2^53 since log2 of a power of two
    is exact in both engines. Shares are single rounded divisions
    against 1-row totals."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    b = cr.groupBy(
        F.floor(F.log2("cents")).cast("int").alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("cents").alias("band_cents"),
    )
    t = b.agg(
        F.sum("n_cust").alias("tc"), F.sum("band_cents").alias("tr")
    )
    w = Window.orderBy(F.col("band").desc()).rangeBetween(
        Window.unboundedPreceding, 0
    )
    c = b.withColumn("cum_cust", F.sum("n_cust").over(w)).withColumn(
        "cum_cents", F.sum("band_cents").over(w)
    )
    return c.crossJoin(F.broadcast(t)).select(
        "band",
        F.col("n_cust").cast("long").alias("n_cust"),
        F.round(F.col("band_cents").cast("double") / 100.0, 2).alias(
            "band_revenue"
        ),
        F.round(F.col("cum_cust").cast("double") / F.col("tc"), 6).alias(
            "cust_share"
        ),
        F.round(F.col("cum_cents").cast("double") / F.col("tr"), 6).alias(
            "revenue_share"
        ),
    )


@register(
    "a_moments_profile",
    survey_ref=(
        "distribution-profiling completion (beyond-reference "
        "built-in): skewness and excess kurtosis per event type from "
        "exact DECIMAL power sums (Σx..Σx⁴ on integer cents — an "
        "int64 Σx⁴ overflows at ~2k rows, DECIMAL(38,0) does not); "
        "the shape stats a data profiler reports beside min/max/mean"
    ),
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0))
               AS x
      FROM events),
    s AS (
      SELECT event_type,
             count(*) AS n,
             sum(x) AS s1, sum(x * x) AS s2,
             sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
      FROM c GROUP BY event_type),
    m AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n AS m1,
             CAST(s2 AS DOUBLE) / n AS m2,
             CAST(s3 AS DOUBLE) / n AS m3,
             CAST(s4 AS DOUBLE) / n AS m4
      FROM s)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(m1 / 100.0, 4) AS mean_value,
           round(sqrt(m2 - m1 * m1) / 100.0, 4) AS stddev_value,
           round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                 / (sqrt(m2 - m1 * m1) * (m2 - m1 * m1)), 6)
             AS skewness,
           round((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2
                  - 3 * m1 * m1 * m1 * m1)
                 / ((m2 - m1 * m1) * (m2 - m1 * m1)) - 3, 6)
             AS excess_kurtosis
    FROM m
    """,
)
def a_moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of event value per type — the
    distribution-shape stats a profiler reports beside mean/stddev
    (positive skew = long right tail; positive excess kurtosis =
    outlier-prone): computed from raw power sums Σx..Σx⁴ on integer
    cents held in DECIMAL(38,0) (Σx⁴ of cents ~3e4 overflows int64
    by ~2000 rows; DECIMAL(38) has 10¹⁸ headroom at 100 TB), so every
    cross-row sum is exact and order-independent, and the central-
    moment algebra runs once per group on DECIMAL-backed doubles with
    identical operand order; the x^1.5 and x² denominators are written
    as sqrt(x)·x and x·x — sqrt and multiplication are IEEE
    exactly-rounded, general pow() is NOT guaranteed to be (the
    temperature-mix lesson).

    Scale shape: ONE map-side-combined aggregate per type — the same
    single-pass class as a1; no second pass, no window."""
    ev = load(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long").cast("decimal(38,0)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    m4 = F.col("s4").cast("double") / n
    var = m2 - m1 * m1
    return s.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(m1 / 100.0, 4).alias("mean_value"),
        F.round(F.sqrt(var) / 100.0, 4).alias("stddev_value"),
        F.round(
            (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / (F.sqrt(var) * var), 6
        ).alias("skewness"),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1)
            / (var * var)
            - 3,
            6,
        ).alias("excess_kurtosis"),
    )


@register(
    "sql_exists_decorrelation",
    survey_ref="SQL-surface demo (beyond-reference built-in): "
    "correlated EXISTS / NOT EXISTS written declaratively and left to "
    "Catalyst's RewritePredicateSubquery — the optimizer must plan "
    "the semi/anti joins itself (sql_correlated_scalar's sibling for "
    "the predicate-subquery surface; the hand-joined forms are "
    "j2/j3/q22)",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def sql_exists_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with a big-ticket order but no urgent one, written as
    correlated EXISTS / NOT EXISTS predicates — the declarative form —
    and left to Catalyst's RewritePredicateSubquery to plan as a
    LeftSemi + LeftAnti pair (the hand-written joins are demonstrated
    by j2/j3/q22; THIS witnesses the optimizer surface that turns
    analyst SQL into them). Price predicate on raw doubles is safe
    here: it selects rows, never aggregates them.

    Scale shape: after decorrelation both probes are custkey-keyed
    semi/anti joins with the order-side predicates pushed to the
    scans — identical plan class to writing the joins by hand, which
    is the point."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders_v o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        """
    )


@register(
    "quality_status_coherence",
    survey_ref=(
        "cross-field consistency audit (beyond-reference built-in): "
        "order status x lineitem linestatus contingency table with "
        "row shares — the semantic-coherence check after any load or "
        "MERGE (fields that must agree drifting apart is the bug "
        "row-level constraints can't see); one fact-fact join + "
        "tiny-key rollup"
    ),
    oracle="""
    WITH j AS (
      SELECT o.o_orderstatus, l.l_linestatus
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    c AS (
      SELECT o_orderstatus, l_linestatus, count(*) AS n
      FROM j GROUP BY o_orderstatus, l_linestatus),
    t AS (SELECT o_orderstatus, sum(n) AS tn FROM c
          GROUP BY o_orderstatus)
    SELECT c.o_orderstatus, c.l_linestatus,
           CAST(c.n AS BIGINT) AS n,
           round(CAST(c.n AS DOUBLE) / t.tn, 6) AS row_share
    FROM c JOIN t USING (o_orderstatus)
    """,
)
def quality_status_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table of order status against lineitem line status
    with per-order-status row shares — do the two status fields still
    tell one story after loads and merges (a finished order whose
    lines are mostly open is the inconsistency row-level NOT NULL /
    FK checks cannot see; this surfaces it as a share shift).

    Scale shape: the q12 fact-fact orderkey join feeding a ≤|status|²
    rollup with map-side partials, then a per-status total join on
    tiny keys. Exact counts, one rounded division."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus"
    )
    c = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.groupBy("o_orderstatus").agg(F.sum("n").alias("tn"))
    return c.join(F.broadcast(t), "o_orderstatus").select(
        "o_orderstatus",
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n").cast("double") / F.col("tn"), 6).alias(
            "row_share"
        ),
    )


@register(
    "j8_bloom_semi_reduction",
    survey_ref=(
        "beyond-reference built-in (§2.6): Bloom runtime-filter join "
        "reduction — the sideways-information-passing trick: build a "
        "4096-word Bloom over the dimension-side join keys, prefilter "
        "the fact table with a SCAN-SIDE expression BEFORE its join "
        "exchange; false positives die in the join, so the result is "
        "invariant and the oracle is the plain join"
    ),
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE), 2)
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate BETWEEN TIMESTAMP '2000-01-01'
                            AND TIMESTAMP '2000-03-31'
    GROUP BY o.o_orderpriority
    """,
)
def j8_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-2000 revenue per priority with a Bloom RUNTIME FILTER ahead
    of the fact join: the date-windowed orders' keys build a fixed
    4096-word Bloom (sketches.bloom_build), the filter ships as a
    constant-folded 4096-long ARRAY literal in the scan predicate, and
    lineitem is prefiltered by the O(1)-per-probe element_at
    expression (sketches.bloom_contains_array_expr) IN THE SCAN STAGE
    — before the join exchange ever sees the dropped rows. Two slower
    probe shapes were measured and killed on the way here (MapType
    element_at = linear scan per lookup, 78 s; dynamic-position
    substring on a 16 KiB literal = O(position) UTF8 scan, 44 s; the
    array form ~1.5 s at sf0.1) — see bloom_word_values.
    At 100 TB this is what engine-native runtime filters / DPP do for
    you when the dimension predicate is selective: the ~99% of fact
    rows whose order is outside the window never shuffle. No false
    negatives (no lost rows), false positives bounded by the geometry
    and REMOVED by the inner join — so the result is bit-identical to
    the plain join, which is exactly what the oracle runs.

    Scale shape: bloom build collapses map-side to <=4096 words; the
    probe is zero-shuffle scan-side expression; the residual join
    shuffles only surviving rows; the rollup key has 5 values."""
    lo = F.lit("2000-01-01").cast("timestamp")
    hi = F.lit("2000-03-31").cast("timestamp")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between(lo, hi))
        .select("o_orderkey", "o_orderpriority")
    )
    bloom = sketches_ops.bloom_build(
        o.select(F.col("o_orderkey").cast("string").alias("k")), "k"
    )
    # ONE bounded driver collect (4096 ints — the codebook class):
    # the filter ships as a constant-folded ARRAY literal inside the
    # scan predicate, exactly how engine-native runtime filters ship
    # (broadcast VALUES in the filter, never a join column). Two
    # slower forms were measured and killed — see
    # sketches.bloom_word_values.
    bm_words = sketches_ops.bloom_word_values(bloom)
    # scale_out: the 4-salted-md5 probe is per-row work pinned to the
    # single-split local scan (the a_bootstrap_ci lesson); a no-op on
    # real multi-split layouts
    li = scale_out(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            (_money("l_extendedprice") * (1 - _rate("l_discount"))).alias(
                "rev"
            ),
        )
    )
    pred = sketches_ops.bloom_contains_array_expr(
        F.col("l_orderkey").cast("string"), bm_words
    )
    li_f = li.filter(pred)
    return (
        li_f.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _out(F.sum("rev"), "revenue"),
        )
    )


@register(
    "layout_zonemap_pruning",
    survey_ref=(
        "beyond-reference physical-layout op (§4.2): zone-map / "
        "min-max data skipping under TWO layouts of the same table — "
        "random-key blocks (zone maps useless, skip 0) vs "
        "date-partitioned blocks (the warehouse norm, skip ~15/16ths "
        "for a quarter predicate); the match count is computed only "
        "from surviving blocks and must equal the full-scan answer in "
        "BOTH rows (result-invariance of skipping, the parquet "
        "row-group-stats contract)"
    ),
    oracle="""
    WITH blocks AS (
      SELECT 'random_key' AS layout,
             o_orderkey // 1000 AS blk, o_orderkey, o_orderdate
      FROM orders
      UNION ALL
      SELECT 'date_partitioned' AS layout,
             (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) // 32
               AS blk, o_orderkey, o_orderdate
      FROM orders),
    b AS (
      SELECT layout, blk,
             min(o_orderdate) AS mn, max(o_orderdate) AS mx,
             count(*) AS c
      FROM blocks GROUP BY 1, 2),
    f AS (
      SELECT layout, blk, c,
             (mx < TIMESTAMP '2000-01-01'
              OR mn > TIMESTAMP '2000-03-31') AS skipped
      FROM b),
    t AS (
      SELECT layout,
             count(*) AS n_blocks,
             CAST(coalesce(sum(CASE WHEN skipped THEN 1 END), 0)
               AS BIGINT) AS n_skipped,
             CAST(coalesce(sum(CASE WHEN NOT skipped THEN c END), 0)
               AS BIGINT) AS n_candidate_rows
      FROM f GROUP BY layout),
    m AS (
      SELECT o.layout, count(*) AS n_match
      FROM blocks o
      JOIN f ON f.layout = o.layout AND f.blk = o.blk
                AND NOT f.skipped
      WHERE o.o_orderdate BETWEEN TIMESTAMP '2000-01-01'
                              AND TIMESTAMP '2000-03-31'
      GROUP BY o.layout)
    SELECT t.layout,
           CAST(t.n_blocks AS BIGINT) AS n_blocks,
           t.n_skipped,
           t.n_candidate_rows,
           CAST(m.n_match AS BIGINT) AS n_match,
           round(CAST(t.n_skipped AS DOUBLE) / t.n_blocks, 6)
             AS skip_frac
    FROM t JOIN m ON m.layout = t.layout
    """,
)
def layout_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping under two layouts of the same orders
    table: 1000-key blocks of a RANDOM-key layout (dates uniform in
    every block → no block can be skipped — the measured lesson in why
    unsorted layouts defeat min/max stats) versus ~monthly
    DATE-PARTITIONED blocks (the time-partitioned-fact norm → a
    quarter predicate skips all but ~3 partitions + edges). Each
    block carries (min, max) o_orderdate zone stats; the predicate
    skips blocks whose range cannot intersect it; the residual exact
    filter runs ONLY over surviving blocks, and the output pins
    RESULT-INVARIANCE: n_match is identical in both layout rows and
    equals the full-scan count — min/max skipping can never lose a
    matching row, the contract parquet row-group stats, Delta/Iceberg
    file stats, and partition pruning all rest on. The Z-order module
    is the multi-column generalization of the date-sorted layout.

    Scale shape: one block-keyed rollup per layout builds the zone
    maps (map-side partials, |orders|/1000-ish rows); the candidate
    join broadcasts surviving block ids; the per-layout report is a
    2-row join."""
    lo = F.lit("2000-01-01").cast("timestamp")
    hi = F.lit("2000-03-31").cast("timestamp")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    blocks = o.select(
        F.lit("random_key").alias("layout"),
        F.expr("o_orderkey div 1000").alias("blk"),
        "o_orderdate",
    ).unionAll(
        o.select(
            F.lit("date_partitioned").alias("layout"),
            F.expr(
                "(unix_timestamp(o_orderdate) div 86400) div 32"
            ).alias("blk"),
            "o_orderdate",
        )
    )
    b = blocks.groupBy("layout", "blk").agg(
        F.min("o_orderdate").alias("mn"),
        F.max("o_orderdate").alias("mx"),
        F.count(F.lit(1)).alias("c"),
    )
    f = b.select(
        "layout",
        "blk",
        "c",
        ((F.col("mx") < lo) | (F.col("mn") > hi)).alias("skipped"),
    )
    t = f.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.coalesce(F.sum(F.col("skipped").cast("int")), F.lit(0))
        .cast("long")
        .alias("n_skipped"),
        F.coalesce(
            F.sum(F.when(~F.col("skipped"), F.col("c"))), F.lit(0)
        )
        .cast("long")
        .alias("n_candidate_rows"),
    )
    m = (
        blocks.join(
            F.broadcast(
                f.filter(~F.col("skipped")).select("layout", "blk")
            ),
            ["layout", "blk"],
        )
        .filter(F.col("o_orderdate").between(lo, hi))
        .groupBy("layout")
        .agg(F.count(F.lit(1)).cast("long").alias("n_match"))
    )
    return t.join(m, "layout").select(
        "layout",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        "n_skipped",
        "n_candidate_rows",
        "n_match",
        F.round(
            F.col("n_skipped").cast("double") / F.col("n_blocks"), 6
        ).alias("skip_frac"),
    )


@register(
    "quality_k_anonymity",
    survey_ref=(
        "beyond-reference data-governance audit: k-anonymity + "
        "l-diversity over quasi-identifier groups (Sweeney 2002 / "
        "Machanavajjhala 2007) — which (nation, segment) equivalence "
        "classes are small enough to re-identify a customer, and "
        "which expose a near-constant sensitive attribute; the "
        "release gate BEFORE a table leaves the governed zone"
    ),
    oracle="""
    SELECT c_nationkey,
           c_mktsegment,
           count(*) AS group_size,
           count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
             AS n_sensitive,
           count(*) < 5 AS k_violation,
           count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 3
             AS l_violation
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit: treat (nationkey, mktsegment) as the
    quasi-identifier an adversary can link on, and the coarse balance
    band (1000-unit buckets) as the sensitive attribute. A group
    smaller than k=5 re-identifies its members by the QI alone
    (k-anonymity violation); a group whose members share fewer than
    l=3 distinct sensitive values leaks the attribute even without
    re-identification (l-diversity violation — the homogeneity attack
    k-anonymity alone misses). Per-group verdicts, integer-exact; the
    negative-balance bucket keeps DuckDB's floor // semantics matched
    by flooring on the Spark side explicitly.

    Scale shape: ONE QI-keyed rollup with a distinct-count (Expand,
    map-side partials); output is the bounded |nations| x |segments|
    group table. No joins."""
    c = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000)).cast("long")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(band).alias("n_sensitive"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("group_size").cast("long").alias("group_size"),
        F.col("n_sensitive").cast("long").alias("n_sensitive"),
        (F.col("group_size") < 5).alias("k_violation"),
        (F.col("n_sensitive") < 3).alias("l_violation"),
    )


@register(
    "layout_encoding_advisor",
    survey_ref=(
        "beyond-reference physical-layout op (§4.2): columnar "
        "encoding advisor — per-column cardinality ratio, average "
        "run length (in table order), and the dictionary/RLE/plain "
        "recommendation a parquet writer derives from them; the "
        "storage-layout twin of the zone-map demo (that one reads "
        "stats, this one decides how to WRITE them)"
    ),
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_orderpriority, o_orderstatus,
             CAST(o_custkey AS VARCHAR) AS o_custkey_s
      FROM orders),
    longcols AS (
      SELECT 'o_orderpriority' AS col, o_orderkey AS k,
             o_orderpriority AS v FROM src
      UNION ALL
      SELECT 'o_orderstatus', o_orderkey, o_orderstatus FROM src
      UNION ALL
      SELECT 'o_custkey', o_orderkey, o_custkey_s FROM src),
    runs AS (
      SELECT col, v,
             CASE WHEN lag(v) OVER (PARTITION BY col ORDER BY k)
                       IS DISTINCT FROM v
                  THEN 1 ELSE 0 END AS run_start
      FROM longcols),
    stats AS (
      SELECT col,
             count(*) AS n_rows,
             count(DISTINCT v) AS n_distinct,
             sum(run_start) AS n_runs
      FROM runs GROUP BY col)
    SELECT col,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(n_runs AS BIGINT) AS n_runs,
           round(CAST(n_distinct AS DOUBLE) / n_rows, 6)
             AS distinct_ratio,
           round(CAST(n_rows AS DOUBLE) / n_runs, 6) AS avg_run_len,
           CASE WHEN 2 * n_rows <= 3 * n_runs AND 20 * n_distinct
                     >= n_rows THEN 'plain'
                WHEN 2 * n_rows > 3 * n_runs THEN 'rle_dict'
                ELSE 'dict' END AS recommendation
    FROM stats
    """,
)
def layout_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column storage-encoding advisor over three orders columns
    with very different shapes: o_orderstatus (3 values, long runs →
    RLE+dictionary), o_orderpriority (5 values, short runs →
    dictionary), o_custkey (near-unique → plain). Cardinality ratio
    says whether a dictionary pays for itself; average run length IN
    TABLE ORDER (runs counted with one lag window per column — the
    IS DISTINCT FROM form so NULLs break runs identically on both
    engines) says whether run-length encoding adds anything on top.
    The thresholds (avg run >= 1.5 → RLE wins; distinct ratio > 5% and
    no runs → plain) are expressed as INTEGER cross-multiplications so
    the verdict can't flicker on a float boundary. This is the advisor
    a parquet/ORC writer runs implicitly; surfacing it makes layout
    regressions visible (a re-sort that destroys runs shows up as
    avg_run_len collapsing — the zone-map demo's write-side twin).

    Scale shape: the three columns unpivot into one (col, key, value)
    stream; run detection is one col-keyed sort window; the rollup is
    a 3-group aggregate with a distinct-count Expand. At a real scan
    these stats come per row-group from the writer — same math,
    block-local."""
    from pyspark.sql import Window as SqlWindow

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.col("o_custkey").cast("string").alias("o_custkey_s"),
    )
    longcols = (
        o.select(
            F.lit("o_orderpriority").alias("col"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("v"),
        )
        .unionAll(
            o.select(
                F.lit("o_orderstatus").alias("col"),
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("v"),
            )
        )
        .unionAll(
            o.select(
                F.lit("o_custkey").alias("col"),
                F.col("o_orderkey").alias("k"),
                F.col("o_custkey_s").alias("v"),
            )
        )
    )
    w = SqlWindow.partitionBy("col").orderBy("k")
    runs = longcols.select(
        "col",
        "v",
        F.when(
            ~F.lag("v").over(w).eqNullSafe(F.col("v")), 1
        )
        .otherwise(0)
        .alias("run_start"),
    )
    stats = runs.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("v").alias("n_distinct"),
        F.sum("run_start").alias("n_runs"),
    )
    return stats.select(
        "col",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_runs").cast("long").alias("n_runs"),
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_rows"), 6
        ).alias("distinct_ratio"),
        F.round(
            F.col("n_rows").cast("double") / F.col("n_runs"), 6
        ).alias("avg_run_len"),
        F.when(
            (2 * F.col("n_rows") <= 3 * F.col("n_runs"))
            & (20 * F.col("n_distinct") >= F.col("n_rows")),
            F.lit("plain"),
        )
        .when(2 * F.col("n_rows") > 3 * F.col("n_runs"), F.lit("rle_dict"))
        .otherwise(F.lit("dict"))
        .alias("recommendation"),
    )


@register(
    "layout_compaction_advisor",
    survey_ref=(
        "[EXT] small-files compaction planning (the lakehouse OPTIMIZE "
        "sizing pass — Delta/Iceberg bin-packing's relational core): "
        "per source, bytes-proportional target file counts at a 64 KiB "
        "demo target, fill percentage, and the write-amplification "
        "ratio of compacting now vs leaving one file per doc — pure "
        "integer ceil-division arithmetic on a bounded rollup"
    ),
    oracle="""
    WITH s AS (
      SELECT source,
             count(*) AS n_docs,
             sum(n_chars) AS total_bytes,
             max(n_chars) AS max_doc_bytes
      FROM documents GROUP BY source)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_bytes AS BIGINT) AS total_bytes,
           CAST((total_bytes + 65535) // 65536 AS BIGINT) AS files_needed,
           CASE WHEN total_bytes > 0 THEN
             CAST((total_bytes * 100)
                  // (((total_bytes + 65535) // 65536) * 65536) AS BIGINT)
             END AS fill_pct,
           CASE WHEN total_bytes > 0 THEN
             CAST(n_docs // ((total_bytes + 65535) // 65536) AS BIGINT)
             END AS docs_per_file,
           CAST(max_doc_bytes AS BIGINT) AS max_doc_bytes,
           max_doc_bytes > 65536 AS has_oversize_doc
    FROM s
    """,
)
def layout_compaction_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPTIMIZE sizing readout: for each source partition, how
    many target-size files its bytes pack into (ceil division at the
    64 KiB demo target — production uses 128 MB-1 GB, the arithmetic
    is identical), the resulting fill percentage, how many of today's
    one-doc files collapse into each compacted file, and whether any
    single document exceeds the target (it then becomes its own file
    regardless — the flag the planner must respect before bin
    packing). All integer ceil/floor arithmetic on non-negative
    operands, engine-exact.

    Scale shape: ONE source-keyed aggregate with map-side partials —
    the advisor reads table statistics, never file contents; at 100 TB
    this is the metadata pass that decides which partitions are worth
    rewriting."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_bytes"),
        F.max("n_chars").alias("max_doc_bytes"),
    )
    files = F.expr("(total_bytes + 65535) div 65536")
    return s.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
        files.alias("files_needed"),
        # all-empty-docs guard (files_needed = 0): Spark's ANSI div
        # RAISES on zero divisors where DuckDB yields NULL — explicit
        # CASE on both sides (the ADVICE structural-parity class)
        F.when(
            F.col("total_bytes") > 0,
            F.expr(
                "(total_bytes * 100)"
                " div (((total_bytes + 65535) div 65536) * 65536)"
            ),
        ).alias("fill_pct"),
        F.when(
            F.col("total_bytes") > 0,
            F.expr("n_docs div ((total_bytes + 65535) div 65536)"),
        ).alias("docs_per_file"),
        F.col("max_doc_bytes").cast("long").alias("max_doc_bytes"),
        (F.col("max_doc_bytes") > 65536).alias("has_oversize_doc"),
    )


@register(
    "quality_t_closeness",
    survey_ref=(
        "beyond-reference data-governance audit, the third rung after "
        "k-anonymity/l-diversity (Li, Li & Venkatasubramanian 2007): "
        "t-closeness via Earth Mover's Distance between each "
        "quasi-identifier group's sensitive-value distribution and the "
        "global one over ORDERED buckets — EMD = Σ|cumdiff|/(B−1) "
        "assembled as exact integer cross-products cum_g·T − cum_t·G "
        "over a common denominator, so the homogeneity-attack metric "
        "l-diversity misses (a group skewed toward high balances leaks "
        "even with many distinct values) is hash-gated"
    ),
    oracle="""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bkt,
             count(*) AS g
      FROM customer GROUP BY 1, 2, 3),
    grp AS (
      SELECT c_nationkey, c_mktsegment, sum(g) AS gsz
      FROM cells GROUP BY 1, 2),
    bdim AS (SELECT bkt, sum(g) AS t FROM cells GROUP BY bkt),
    btot AS (
      SELECT count(*) AS n_buckets, sum(t) AS total FROM bdim),
    bcum AS (
      SELECT bkt, t, sum(t) OVER (ORDER BY bkt) AS cum_t FROM bdim),
    grid AS (
      SELECT gr.c_nationkey, gr.c_mktsegment, gr.gsz,
             bc.bkt, bc.cum_t, coalesce(ce.g, 0) AS g
      FROM grp gr CROSS JOIN bcum bc
      LEFT JOIN cells ce ON ce.c_nationkey = gr.c_nationkey
                        AND ce.c_mktsegment = gr.c_mktsegment
                        AND ce.bkt = bc.bkt),
    cum AS (
      SELECT c_nationkey, c_mktsegment, gsz, bkt, cum_t,
             sum(g) OVER (PARTITION BY c_nationkey, c_mktsegment
                          ORDER BY bkt) AS cum_g
      FROM grid),
    emd AS (
      SELECT c_nationkey, c_mktsegment, gsz,
             sum(abs(cum_g * bt.total - cum_t * gsz)) AS num,
             max(bt.total) AS total, max(bt.n_buckets) AS n_buckets
      FROM cum CROSS JOIN btot bt
      GROUP BY 1, 2, gsz)
    SELECT c_nationkey, c_mktsegment,
           CAST(gsz AS BIGINT) AS group_size,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CASE WHEN n_buckets > 1 THEN
             round(CAST(num AS DOUBLE)
                   / (gsz * total * (n_buckets - 1)), 6)
           ELSE 0.0 END AS emd,
           CASE WHEN n_buckets > 1 THEN
             round(CAST(num AS DOUBLE)
                   / (gsz * total * (n_buckets - 1)), 6) > 0.2
           ELSE false END AS t_violation
    FROM emd
    """,
)
def quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release audit over the same (nation, segment) QI and
    1000-unit balance bands as quality_k_anonymity: for each group, the
    ordered-bucket Earth Mover's Distance to the GLOBAL sensitive
    distribution, EMD = (1/(B−1))·Σ_i |Σ_{j≤i}(p_j − q_j)|. The cumdiff
    is put over the common denominator G·T so every per-bucket term is
    the exact BIGINT |cum_g·T − cum_t·G|; the single float op is the
    final identically-ordered division, round-6, with the B=1
    degenerate source guarded per the ANSI zero-divisor rule.

    Scale shape: one (QI, bucket)-keyed rollup cuts the table; the
    dense grid is a bounded |groups|×|buckets| dimension cross (the
    w19 grid-fill class), the global bucket cumsum runs on the
    |buckets|-row dimension (w15 bounded-rollup class), and the
    per-group cumsum rides the QI partitioning. Nothing downstream of
    the first rollup ever touches a customer row."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000)).cast("long").alias("bkt"),
    ).agg(F.count(F.lit(1)).alias("g"))
    grp = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("g").alias("gsz")
    )
    bdim = cells.groupBy("bkt").agg(F.sum("g").alias("t"))
    btot = bdim.agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("t").alias("total")
    )
    # Global cumsum over the bounded bucket dimension (|buckets| rows).
    bcum = bdim.withColumn("cum_t", F.sum("t").over(Window.orderBy("bkt")))
    grid = (
        grp.crossJoin(F.broadcast(bcum.select("bkt", "cum_t")))
        .join(cells, ["c_nationkey", "c_mktsegment", "bkt"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "gsz",
            "bkt",
            "cum_t",
            F.coalesce("g", F.lit(0)).alias("g"),
        )
    )
    cum = grid.withColumn(
        "cum_g",
        F.sum("g").over(
            Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("bkt")
        ),
    )
    emd = (
        cum.crossJoin(F.broadcast(btot))
        .groupBy("c_nationkey", "c_mktsegment", "gsz")
        .agg(
            F.sum(
                F.abs(F.col("cum_g") * F.col("total") - F.col("cum_t") * F.col("gsz"))
            ).alias("num"),
            F.max("total").alias("total"),
            F.max("n_buckets").alias("n_buckets"),
        )
    )
    emd_val = F.round(
        F.col("num").cast("double")
        / (F.col("gsz") * F.col("total") * (F.col("n_buckets") - 1)),
        6,
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("gsz").cast("long").alias("group_size"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.when(F.col("n_buckets") > 1, emd_val).otherwise(F.lit(0.0)).alias("emd"),
        F.when(F.col("n_buckets") > 1, emd_val > 0.2)
        .otherwise(F.lit(False))
        .alias("t_violation"),
    )


def _hilbert_stages(div: str) -> list[tuple[str, str, str, str, str]]:
    """Per-level (rx, ry, d, x, y) expression strings for the order-4
    Hilbert transform, parameterized on the integer-division token
    (Spark ``div`` / DuckDB ``//``) — everything else is engine-shared
    +,−,*,% arithmetic on non-negative ints. The quadrant value
    3rx + ry − 2rx·ry is the arithmetic form of (3rx) XOR ry for
    rx,ry ∈ {0,1}; reflection+swap is the CASE pair, using the classic
    n−1 = 15 reflection so every intermediate coordinate stays in
    [0, 16) — NON-NEGATIVE is load-bearing: the first cut reflected
    with s−1, went negative, and Python floor-div/mod, Spark div/% and
    DuckDB //,% all disagree below zero (README division audit class;
    the gate caught it). Tests pin that consecutive indexes are
    Manhattan-adjacent across the whole 16×16 grid, which is the
    locality property the layout exists for."""
    out = []
    for s in (8, 4, 2, 1):
        rx = f"(x {div} {s}) % 2"
        ry = f"(y {div} {s}) % 2"
        d = f"d + {s * s} * (3 * rx + ry - 2 * rx * ry)"
        nx = (
            f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 15 - y "
            f"ELSE y END) ELSE x END"
        )
        ny = (
            f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 15 - x "
            f"ELSE x END) ELSE y END"
        )
        out.append((rx, ry, d, nx, ny))
    return out


def _zorder4(div: str) -> str:
    """4-bit Morton interleave as pure arithmetic (disjoint powers of 4
    sum exactly — the zorder_key2 discipline without bit operators)."""
    terms = []
    for i in range(4):
        terms.append(f"((x {div} {1 << i}) % 2) * {4 ** i}")
        terms.append(f"((y {div} {1 << i}) % 2) * {2 * 4 ** i}")
    return " + ".join(terms)


def _hilbert_oracle_sql() -> str:
    stages = _hilbert_stages("//")
    inner = "SELECT x0 AS x, y0 AS y, 0 AS d FROM cells0"
    for rx, ry, d, nx, ny in stages:
        inner = (
            f"SELECT {d} AS d, {nx} AS x, {ny} AS y FROM "
            f"(SELECT x, y, d, {rx} AS rx, {ry} AS ry FROM ({inner}))"
        )
    # re-attach the original cell coords for the travel metric
    inner_keyed = "SELECT x0 AS x, y0 AS y, x0, y0, 0 AS d FROM cells0"
    for rx, ry, d, nx, ny in stages:
        inner_keyed = (
            f"SELECT x0, y0, {d} AS d, {nx} AS x, {ny} AS y FROM "
            f"(SELECT x, y, x0, y0, d, {rx} AS rx, {ry} AS ry "
            f"FROM ({inner_keyed}))"
        )
    return f"""
    WITH cells0 AS (
      SELECT user_id % 16 AS x0,
             (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 16 AS y0
      FROM events GROUP BY 1, 2),
    hk AS (SELECT x0, y0, d AS k FROM ({inner_keyed})),
    zk AS (SELECT x0, y0, {_zorder4("//").replace("x ", "x0 ").replace("y ", "y0 ")} AS k
           FROM cells0),
    curves AS (
      SELECT 'hilbert' AS curve, x0, y0, k FROM hk
      UNION ALL SELECT 'zorder' AS curve, x0, y0, k FROM zk),
    steps AS (
      SELECT curve,
             abs(x0 - lag(x0) OVER w) + abs(y0 - lag(y0) OVER w) AS step
      FROM curves WINDOW w AS (PARTITION BY curve ORDER BY k))
    SELECT curve,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(step) AS BIGINT) AS total_travel,
           CAST(max(step) AS BIGINT) AS max_jump,
           CASE WHEN count(*) > 1 THEN
             round(CAST(sum(step) AS DOUBLE) / (count(*) - 1), 6)
           ELSE 0.0 END AS mean_step
    FROM steps GROUP BY curve
    """


@register(
    "layout_hilbert_order",
    survey_ref=(
        "[EXT] Hilbert-curve clustering key vs Z-order, measured (the "
        "OPTIMIZE ... BY HILBERT option in modern lakehouse writers): "
        "order-4 transform unrolled to four levels of pure {div,%,*,"
        "CASE} arithmetic — identical non-negative-integer semantics "
        "on both engines, no float, no bit operators — and the payoff "
        "quantified as curve-order Manhattan travel over the occupied "
        "cell grid (a unit-step curve visits neighbors; Morton jumps "
        "quadrant seams), the locality that decides parquet min/max "
        "pruning quality at 100 TB"
    ),
    oracle=_hilbert_oracle_sql(),
)
def layout_hilbert_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert vs Morton locality audit over the occupied (user mod 16,
    day mod 16) cell grid: both curve keys are computed for every
    occupied cell (Hilbert via four unrolled reflect-swap levels, pure
    integer arithmetic shared token-for-token with the oracle modulo
    the division keyword; Morton via disjoint-power-of-4 interleave),
    then each curve is walked in key order and the Manhattan distance
    between consecutive occupied cells is summed — total_travel,
    max_jump and mean_step per curve. On a full grid the unit-step
    property pins Hilbert at 255 total (neighbor every step, pytest)
    while Morton pays 480; the gap is WHY Hilbert layouts prune
    better.

    Scale shape: one (x, y) cell rollup cuts the events stream (the
    layout_zorder_events class); everything after runs on ≤256 cell
    rows — the curve windows partition by curve over the bounded cell
    dimension, and the output is two rows."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("user_id") % 16).alias("x0"),
            (
                F.expr(
                    "CAST(floor(unix_timestamp(ts)) AS BIGINT) div 86400"
                )
                % 16
            ).alias("y0"),
        )
        .groupBy("x0", "y0")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("x0", "y0")
    )
    h = cells.selectExpr("x0", "y0", "x0 AS x", "y0 AS y", "0 AS d")
    for rx, ry, d, nx, ny in _hilbert_stages("div"):
        h = h.selectExpr(
            "x0", "y0", "x", "y", "d", f"{rx} AS rx", f"{ry} AS ry"
        ).selectExpr("x0", "y0", f"{d} AS d", f"{nx} AS x", f"{ny} AS y")
    hk = h.select("x0", "y0", F.col("d").alias("k"), F.lit("hilbert").alias("curve"))
    zk = cells.selectExpr(
        "x0",
        "y0",
        _zorder4("div").replace("x ", "x0 ").replace("y ", "y0 ") + " AS k",
    ).select("x0", "y0", "k", F.lit("zorder").alias("curve"))
    both = hk.unionByName(zk)
    w = Window.partitionBy("curve").orderBy("k")
    steps = both.select(
        "curve",
        (
            F.abs(F.col("x0") - F.lag("x0").over(w))
            + F.abs(F.col("y0") - F.lag("y0").over(w))
        ).alias("step"),
    )
    return steps.groupBy("curve").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("step").cast("long").alias("total_travel"),
        F.max("step").cast("long").alias("max_jump"),
        F.when(
            F.count(F.lit(1)) > 1,
            F.round(
                F.sum("step").cast("double") / (F.count(F.lit(1)) - 1), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_step"),
    )


@register(
    "layout_overlap_depth",
    survey_ref=(
        "[EXT] zone-map overlap depth — the read-amplification metric "
        "lakehouse table services watch (Iceberg/Delta compaction "
        "triggers on it): bucket the fact table into files, take each "
        "file's [min, max] date range (its zone map), and sweep +1/−1 "
        "boundary deltas with a running sum over the date axis — "
        "max_depth IS how many files a point lookup must read at the "
        "worst date, area/span the expected amplification; pure "
        "integer day arithmetic end to end"
    ),
    oracle="""
    WITH files AS (
      SELECT o_orderkey // 1000 AS f,
             min(date_diff('day', DATE '1970-01-01', o_orderdate)) AS lo,
             max(date_diff('day', DATE '1970-01-01', o_orderdate)) AS hi
      FROM orders GROUP BY 1),
    b AS (
      SELECT lo AS pos, 1 AS delta FROM files
      UNION ALL
      SELECT hi + 1 AS pos, -1 AS delta FROM files),
    net AS (SELECT pos, sum(delta) AS net FROM b GROUP BY pos),
    sweep AS (
      SELECT pos, sum(net) OVER (ORDER BY pos) AS depth,
             lead(pos) OVER (ORDER BY pos) AS next_pos
      FROM net),
    agg AS (
      SELECT max(depth) AS max_depth,
             sum(CASE WHEN next_pos IS NOT NULL
                      THEN depth * (next_pos - pos) ELSE 0 END) AS area,
             max(pos) - min(pos) AS span
      FROM sweep),
    nf AS (SELECT count(*) AS n_files FROM files)
    SELECT CAST(n.n_files AS BIGINT) AS n_files,
           CAST(a.max_depth AS BIGINT) AS max_depth,
           CAST(a.area AS BIGINT) AS area_file_days,
           CAST(a.span AS BIGINT) AS span_days,
           CASE WHEN a.span > 0 THEN
             round(CAST(a.area AS DOUBLE) / a.span, 6) END AS mean_depth
    FROM agg a CROSS JOIN nf n
    """,
)
def layout_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How badly do the table's files overlap on the date axis? Each
    1000-orderkey bucket is a file whose zone map is its [min, max]
    orderdate; the classic +1/−1 boundary sweep (one running sum over
    the boundary set) yields the depth profile — max_depth is the
    worst-case point-lookup fan-in, area/span the mean — the number a
    compaction service compares against its rewrite budget
    (layout_compaction_advisor sizes the rewrite; this measures
    whether one is needed). Dates are integer day numbers from a
    shared epoch literal, so everything up to the final mean division
    is exact BIGINT.

    Scale shape: one file-bucket rollup cuts the fact table (the
    zonemap class — at 100 TB this input is the MANIFEST, thousands
    of rows, not the data); the sweep's global window runs over the
    ≤ 2·|files| netted boundary dates. Output is one row."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    files = o.groupBy(
        F.expr("o_orderkey div 1000").alias("f")
    ).agg(F.min(day).alias("lo"), F.max(day).alias("hi"))
    b = files.select(F.col("lo").alias("pos"), F.lit(1).alias("delta")).unionByName(
        files.select((F.col("hi") + 1).alias("pos"), F.lit(-1).alias("delta"))
    )
    net = b.groupBy("pos").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("pos")
    sweep = net.select(
        "pos",
        F.sum("net").over(w).alias("depth"),
        F.lead("pos").over(w).alias("next_pos"),
    )
    agg = sweep.agg(
        F.max("depth").alias("max_depth"),
        F.sum(
            F.when(
                F.col("next_pos").isNotNull(),
                F.col("depth") * (F.col("next_pos") - F.col("pos")),
            ).otherwise(0)
        ).alias("area"),
        (F.max("pos") - F.min("pos")).alias("span"),
    )
    nf = files.agg(F.count(F.lit(1)).alias("n_files"))
    return agg.crossJoin(F.broadcast(nf)).select(
        F.col("n_files").cast("long").alias("n_files"),
        F.col("max_depth").cast("long").alias("max_depth"),
        F.col("area").cast("long").alias("area_file_days"),
        F.col("span").cast("long").alias("span_days"),
        F.when(
            F.col("span") > 0,
            F.round(F.col("area").cast("double") / F.col("span"), 6),
        ).alias("mean_depth"),
    )


_FFD_CAP = 40
_FFD_IDX = (
    "list_filter(range(1, len(f.loads)+1), "
    f"i -> f.loads[i] + o.sz <= {_FFD_CAP})[1]"
)


@register(
    "layout_compaction_binpack",
    survey_ref=(
        "[EXT] first-fit-decreasing compaction planning (round 12 — "
        "the small-file bin packer behind every lakehouse OPTIMIZE; "
        "Johnson 1973's 11/9 OPT + 1 heuristic): per PARTITION, "
        "files sorted size-desc (fid-asc ties) fold through the "
        "lowest-index-bin-that-fits rule; Spark runs the fold as a "
        "grouped-map applyInPandas per partition (the w35 mechanism "
        "— the distribution axis is the partition, exactly how real "
        "table services shard packing), the oracle replays it as a "
        "recursive CTE whose carried state is the per-bin load LIST "
        "(list_filter for first-fit, list_transform for the load "
        "update) — the sequential-recurrence gate class extended to "
        "LIST state; every per-file bin assignment is hash-gated"
    ),
    oracle=f"""
    WITH RECURSIVE files AS (
      SELECT year(o_orderdate) AS part, o_orderkey // 100 AS fid,
             count(*) AS sz
      FROM orders GROUP BY 1, 2),
    ordered AS (
      SELECT *, row_number() OVER (PARTITION BY part
                                   ORDER BY sz DESC, fid) AS rn
      FROM files),
    fold AS (
      SELECT part, 0 AS rn, CAST([] AS BIGINT[]) AS loads,
             CAST(NULL AS BIGINT) AS fid, CAST(NULL AS BIGINT) AS sz,
             CAST(NULL AS BIGINT) AS bin
      FROM (SELECT DISTINCT part FROM ordered)
      UNION ALL
      SELECT o.part, o.rn,
             CASE WHEN {_FFD_IDX} IS NULL
                  THEN list_append(f.loads, o.sz)
                  ELSE list_transform(range(1, len(f.loads)+1),
                         i -> CASE WHEN i = {_FFD_IDX}
                              THEN f.loads[i] + o.sz
                              ELSE f.loads[i] END) END,
             o.fid, o.sz,
             COALESCE({_FFD_IDX}, len(f.loads) + 1)
      FROM fold f JOIN ordered o ON o.part = f.part AND o.rn = f.rn + 1)
    SELECT CAST(part AS BIGINT) AS part, fid AS file_id,
           sz AS size_rows, CAST(bin AS BIGINT) AS bin
    FROM fold WHERE rn > 0
    """,
)
def layout_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which small files merge into which compaction target: the
    manifest (year partitions x orderkey//100 file buckets, size =
    row count) runs FFD per partition and EVERY file's bin assignment
    is gated — a wrong sort order, a last-fit instead of first-fit,
    or a capacity off-by-one moves assignments and breaks the hash.
    Oversized files open their own bin (natural first-fit behavior,
    exercised when capacity < max file size at larger SFs).

    Scale shape (operators/layout.py:ffd_binpack): one manifest agg
    (map-side partials), one part-keyed grouped-map over FILE COUNTS
    (not data) — per-partition state is a bin-load list bounded by
    files-per-partition; the plan the real compaction services run.
    Reference analog: none (the reference writes one JSON per case,
    src/run.py:139-166); table maintenance is [EXT] surface."""
    from shippai_knowledge_etl_spark.operators.layout import ffd_binpack

    o = load(spark, sf_dir, "orders")
    files = o.groupBy(
        F.year("o_orderdate").cast("long").alias("part"),
        F.expr("o_orderkey div 100").alias("fid"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    packed = ffd_binpack(files, _FFD_CAP)
    return packed.select(
        F.col("part").cast("long").alias("part"),
        F.col("fid").cast("long").alias("file_id"),
        F.col("sz").cast("long").alias("size_rows"),
        F.col("bin").cast("long").alias("bin"),
    )
