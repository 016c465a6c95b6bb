"""Property-style checks (SURVEY.md §5.2) via hypothesis.

Random inputs go through the Spark expressions in batches; invariants
come from the reference's documented contracts:
  - flatten(chunk3(x)) == x, all-but-last groups have size 3
    (src/extract.py:370-371)
  - slice_categories partitions the items exactly (no loss, no overlap)
  - renumbering is dense 1..N (src/render_pdf.py:154-170)
  - status partition is exhaustive and disjoint (src/run.py:86-131)
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.functions import listparse, nested

tokens = st.lists(
    st.text(alphabet="abcdefg東京", min_size=1, max_size=5), min_size=0, max_size=20
)
boundary_sets = st.lists(
    st.integers(min_value=1, max_value=24), min_size=0, max_size=3, unique=True
).map(sorted)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def run_rows(spark):
    def _run(rows, schema, expr):
        df = spark.createDataFrame(rows, schema)
        return [r["out"] for r in df.select(expr.alias("out")).collect()]

    return _run


@given(batch=st.lists(tokens, min_size=1, max_size=8))
@_slow
def test_chunk3_roundtrip(run_rows, batch):
    out = run_rows(
        [(t,) for t in batch],
        "items array<string>",
        F.struct(
            F.flatten(nested.chunk(F.col("items"))).alias("flat"),
            nested.chunk(F.col("items")).alias("groups"),
        ),
    )
    for (items, r) in zip(batch, out):
        assert r.flat == items  # lossless, order-preserving
        for g in r.groups[:-1]:
            assert len(g) == 3  # all but last full
        if r.groups:
            assert 1 <= len(r.groups[-1]) <= 3


@given(batch=st.lists(st.tuples(tokens, boundary_sets), min_size=1, max_size=8))
@_slow
def test_slice_categories_partitions(run_rows, batch):
    out = run_rows(
        [(t, b) for t, b in batch],
        "items array<string>, boundaries array<int>",
        nested.slice_categories(F.col("items"), F.col("boundaries")),
    )
    for (items, bounds), r in zip(batch, out):
        assert r.cause + r.action + r.result == items  # exact partition


@given(
    batch=st.lists(
        st.text(alphabet="ab・12３．. \n", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@_slow
def test_parse_knowledge_total(run_rows, batch):
    from tests.test_functions import golden_knowledge

    out = run_rows(
        [(t,) for t in batch], "t string", listparse.parse_knowledge(F.col("t"))
    )
    for t, got in zip(batch, out):
        assert got == golden_knowledge(t)


def test_renumber_dense_and_partition_exhaustive(spark, sf_dir):
    from shippai_knowledge_etl_spark.operators import diagram
    from shippai_knowledge_etl_spark.queries.manifest import validated_orders
    from shippai_knowledge_etl_spark.queries.nested import (
        scenario_source,
        scenario_struct,
    )

    items = diagram.positioned_items(
        scenario_struct(scenario_source(spark, sf_dir)), "doc_id"
    )
    bad = items.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("num").alias("lo"),
        F.max("num").alias("hi"),
        F.countDistinct("num").alias("d"),
    ).filter(
        ~((F.col("lo") == 1) & (F.col("hi") == F.col("n")) & (F.col("d") == F.col("n")))
    )
    assert bad.count() == 0  # numbering dense 1..N per case

    v = validated_orders(spark, sf_dir)
    statuses = {r.status for r in v.select("status").distinct().collect()}
    assert statuses <= {"success", "excluded", "error"}
    total = v.count()
    by = dict(v.groupBy("status").count().collect())
    assert sum(by.values()) == total  # exhaustive + disjoint
