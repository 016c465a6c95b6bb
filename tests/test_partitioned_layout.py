"""Partitioned-at-rest layout: the partition-pruning path for the
curation pipeline's output (SURVEY §4.2 / BASELINE 'partition pruning').

A 100 TB corpus curated per language is laid out partitioned by
`pred_lang` so downstream per-language jobs scan only their partition.
This test writes that layout, then asserts the filtered read prunes at
PLAN time (PartitionFilters, not a post-scan filter) and touches only
the matching directory.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import textops
from shippai_knowledge_etl_spark.tables import load


@pytest.mark.slow
def test_partition_pruning_on_lang_layout(spark, sf_dir, tmp_path):
    d = load(spark, sf_dir, "documents")
    pred = textops.langid_predict(
        textops.langid_scores(d, "doc_id", "text"), "doc_id"
    ).select("doc_id", "pred_lang")
    out = d.join(pred, "doc_id").select("doc_id", "text", "source", "pred_lang")
    layout = str(tmp_path / "docs_by_lang")
    out.write.mode("overwrite").partitionBy("pred_lang").parquet(layout)

    back = spark.read.parquet(layout)
    langs = [r.pred_lang for r in back.select("pred_lang").distinct().collect()]
    assert len(langs) >= 2, f"corpus predicted a single language: {langs}"
    target = sorted(langs)[0]

    q = back.filter(F.col("pred_lang") == target).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [isnotnull(pred_lang" in plan or (
        "PartitionFilters" in plan and "pred_lang" in plan.split("PartitionFilters", 1)[1][:200]
    ), f"no partition filter in plan:\n{plan[:2000]}"

    # pruning is only an access-path change: the filtered scan reads
    # exactly what a direct read of the one partition directory reads
    # (inputFiles() can't witness this — it lists the relation's full
    # file index, not the pruned selection)
    direct = spark.read.parquet(f"{layout}/pred_lang={target}")
    n = q.count()
    assert n > 0
    assert n == direct.count()
    assert n == out.filter(F.col("pred_lang") == target).count()
