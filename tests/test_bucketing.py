"""Bucketed co-located join: the shuffle-elimination path for repeated
big-big joins (SURVEY §4.2 / BASELINE 'bucketing for co-located joins').

Writes orders+lineitem bucketed by the join key into a temp warehouse,
then asserts the bucketed join plan has NO shuffle exchange while
producing the same row count as the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.tables import load


@pytest.mark.slow
def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    # warehouse.dir is static conf — use external tables under tmp_path
    spark.sql("CREATE DATABASE IF NOT EXISTS buck")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("buck.orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .saveAsTable("buck.lineitem_b")
    )
    ob, lb = spark.table("buck.orders_b"), spark.table("buck.lineitem_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
        "o_orderkey", "l_linenumber"
    )
    # At this SF the dim side broadcasts (also shuffle-free, but not the
    # point) — disable broadcast to exercise the big-big bucketed path.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE buck.lineitem_b")
    spark.sql("DROP TABLE buck.orders_b")
    spark.sql("DROP DATABASE buck")
