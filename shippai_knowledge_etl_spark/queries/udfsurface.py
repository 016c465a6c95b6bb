"""UDF / UDAF / UDTF surface + ranking suite (SURVEY.md §2.9, §2.8).

The engine's UDF policy is expression-first (§2.9): Python only at the
edges. This module demonstrates each *kind* of Python extension point
once, over the driver tables, with exact oracles:

  - Python UDTF (``@udtf``) driven through a SQL LATERAL join — the
    row-based form of the S2 worklist expansion (src/run.py:70-73) for
    when the expansion needs imperative logic a HOF can't express.
  - pandas grouped-agg UDAF (Arrow-batched) — the custom-aggregate
    extension point; the reference itself needs none (SURVEY §2.9
    "UDAF: none"), so the demo recomputes a known aggregate (median)
    through the UDAF path where the oracle can check it exactly.
  - ``applyInPandas`` grouped-map — per-group imperative logic with an
    exact relational oracle (sequence numbering == row_number).
  - ranking built-ins beyond the reference (§2.8 note): ntile /
    dense_rank / percent_rank / cume_dist, tie-handling exercised.

Scale notes: the UDTF and grouped-map run per-partition with no state
across groups (shuffle only on the groupBy key); the grouped-agg UDAF
has no partial aggregation (whole groups move), so built-in aggregates
remain the default — the UDAF is for semantics Catalyst lacks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.tables import load

BASE_URL = "https://www.shippai.org/fkd"
_PER_LIST_LIMIT = 4

# Real DataTypes, not DDL strings: string return types are parsed via
# the active session, and this module imports before any session exists
# (same constraint as sources/html_parse.ROWS_TYPE).
_EXPAND_TYPE = T.StructType(
    [
        T.StructField("list_id", T.IntegerType()),
        T.StructField("case_url", T.StringType()),
        T.StructField("pos", T.IntegerType()),
    ]
)


class WorklistExpandUDTF:
    """S2 expansion as a table function: one (list_id, n_links) row in,
    up to ``_PER_LIST_LIMIT`` case-URL rows out. The in-loop ``break``
    mirrors the reference's in-scan limit (src/extract.py:404-406).
    Wrapped with ``udtf()`` lazily inside the query (see _EXPAND_TYPE
    comment)."""

    def eval(self, list_id: int, n_links: int):  # noqa: D102
        for i in range(n_links):
            if i >= _PER_LIST_LIMIT:
                break
            yield list_id, f"{BASE_URL}/cf/CZ{list_id}_{i}.html", i


@register(
    "u5_udtf_expand",
    survey_ref="§2.9 UDTF surface: S2 worklist expansion as @udtf + "
    "SQL LATERAL (row-based alternative to s2_worklist_expand's HOF)",
    oracle="""
    WITH lists AS (
      SELECT n_nationkey AS list_id, 3 + n_nationkey % 5 AS n_links FROM nation)
    SELECT list_id,
           printf('https://www.shippai.org/fkd/cf/CZ%d_%d.html',
                  list_id, CAST(i AS INT)) AS case_url,
           CAST(i AS INT) AS pos
    FROM lists, LATERAL unnest(range(0, least(n_links, 4))) AS t(i)
    """,
)
def u5_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("u5_expand", udtf(WorklistExpandUDTF, returnType=_EXPAND_TYPE))
    load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("list_id"),
        (F.lit(3) + F.col("n_nationkey") % 5).cast("int").alias("n_links"),
    ).createOrReplaceTempView("u5_udtf_lists")
    return spark.sql(
        """
        SELECT t.list_id, t.case_url, t.pos
        FROM u5_udtf_lists l, LATERAL u5_expand(l.list_id, l.n_links) t
        """
    )


@pandas_udf(T.DoubleType())
def _median_udaf(v: pd.Series) -> float:
    """Exact interpolated median over the whole group (Arrow-batched).
    No partial-agg support — the group's values all ship to one task,
    which is precisely why built-ins win when they exist."""
    return float(v.median())


@pandas_udf(T.LongType())
def _count_udaf(v: pd.Series) -> int:
    """Companion count: Spark disallows mixing pandas grouped-agg UDFs
    with non-pandas aggregates in one agg, so the count rides the same
    path."""
    return int(len(v))


@register(
    "a_udaf_median",
    survey_ref="§2.9 UDAF surface: pandas grouped-agg median vs the "
    "same quantile through the built-in path (a_percentiles)",
    oracle="""
    SELECT l_linestatus,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
)
def a_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        _median_udaf(F.col("l_quantity")).alias("median_qty"),
        _count_udaf(F.col("l_quantity")).alias("n"),
    )


def _sequence_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user event sequencing: deterministic (ts, event_id) order,
    1-based position — imperative stand-in for row_number so the oracle
    can check the grouped-map path exactly."""
    out = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    out["seq"] = range(1, len(out) + 1)
    return out[["user_id", "event_id", "seq"]]


@register(
    "p13_grouped_map_seq",
    survey_ref="§2.9 applyInPandas grouped-map: per-user sequencing "
    "(exact oracle: row_number over the same deterministic order)",
    oracle="""
    SELECT user_id, event_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT) AS seq
    FROM events
    """,
)
def p13_grouped_map_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return ev.groupBy("user_id").applyInPandas(
        _sequence_group, schema="user_id long, event_id long, seq long"
    )


@register(
    "w8_ranking_suite",
    survey_ref="§2.8 ranking built-ins beyond the reference: ntile, "
    "dense_rank, percent_rank, cume_dist (ties on nationkey)",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w_total AS quartile,
           CAST(row_number() OVER w_total AS BIGINT) AS rn,
           CAST(dense_rank() OVER w_ties AS BIGINT) AS dr_nation,
           percent_rank() OVER w_ties AS pr_nation,
           cume_dist() OVER w_ties AS cd_nation
    FROM customer
    WINDOW w_total AS (PARTITION BY c_mktsegment
                       ORDER BY c_acctbal, c_custkey),
           w_ties AS (PARTITION BY c_mktsegment ORDER BY c_nationkey)
    """,
)
def w8_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two windows per segment: a total order (acctbal, custkey — makes
    ntile/row_number deterministic) and a tied order (nationkey — rank
    functions are functions of the key, so output is deterministic even
    with ties). One shuffle per distinct partitioning: both windows
    share PARTITION BY c_mktsegment, so Catalyst plans a single exchange
    and two in-partition sorts."""
    c = load(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_ties = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w_total).alias("quartile"),
        F.row_number().over(w_total).cast("long").alias("rn"),
        F.dense_rank().over(w_ties).cast("long").alias("dr_nation"),
        F.percent_rank().over(w_ties).alias("pr_nation"),
        F.cume_dist().over(w_ties).alias("cd_nation"),
    )


def _cogroup_stats(key, clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    """Per-user two-sided stats; either side may be empty (cogroup emits
    the union of keys)."""
    return pd.DataFrame(
        [(key[0], len(clicks), len(purchases))],
        columns=["user_id", "n_clicks", "n_purchases"],
    )


@register(
    "p14_cogroup_stats",
    survey_ref="§2.9 cogroup().applyInPandas: two-sided grouped-map "
    "(per-key pandas over aligned click/purchase groups)",
    oracle="""
    SELECT user_id,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY user_id
    """,
)
def p14_cogroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides shuffle once on user_id, then each key's two pandas
    frames arrive aligned in one Python call — the extension point for
    per-key logic that needs BOTH groups at once (alignment, as-of
    matching, per-user reconciliation). Count-based output keeps the
    oracle exact."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").groupBy("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").groupBy("user_id")
    return clicks.cogroup(purchases).applyInPandas(
        _cogroup_stats, schema="user_id long, n_clicks long, n_purchases long"
    )


@register(
    "j6_asof_merge_scale",
    survey_ref="as-of join, merge-asof form (SURVEY §2.6 scale path; same "
    "semantics + oracle as j6_asof_latest_order's window form)",
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
def j6_asof_merge_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(nL+nR) merge-asof form of j6_asof_latest_order: cogroup on
    the key, sorted two-pointer merge per key (pandas.merge_asof inside
    applyInPandas) — no (event, earlier-order) candidate set is ever
    materialized. Hash-checked against the SAME oracle as the window
    form, proving the two plans agree row-for-row."""
    from shippai_knowledge_etl_spark.operators.asof import merge_asof_latest

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return merge_asof_latest(
        e,
        o,
        key_left="user_id",
        key_right="o_custkey",
        ts_left="ts",
        ts_right="o_orderdate",
        id_left="event_id",
        id_right="o_orderkey",
        out_col="asof_orderkey",
    )
