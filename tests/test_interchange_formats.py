"""Interchange formats: the curated corpus must survive ORC / CSV /
JSONL roundtrips with pinned schemas (no inference — at 100 TB schema
inference is an extra data pass), and the columnar format must still
push filters into the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.tables import load

SCHEMA = "doc_id long, lang string, n_chars long"


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_roundtrip_preserves_rows_and_schema(spark, sf_dir, tmp_path, fmt):
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / fmt)
    w = d.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    getattr(w, fmt)(path)

    r = spark.read.schema(SCHEMA)
    if fmt == "csv":
        r = r.option("header", True)
    back = getattr(r, fmt)(path)

    assert back.schema.simpleString() == d.schema.simpleString()
    want = sorted(map(tuple, d.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


@pytest.mark.slow
def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "orc_pd")
    d.write.mode("overwrite").orc(path)
    probe = (
        spark.read.schema(SCHEMA).orc(path).filter(F.col("n_chars") > 300)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_chars" in plan.split(
        "PushedFilters", 1
    )[1][:200], plan[:1200]
