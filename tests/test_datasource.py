"""Custom Python DataSource test: directory of saved case pages → scan."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    for i in range(20):
        (d / f"CZ{i:07d}.html").write_text(
            "<table>"
            f'<tr><td bgcolor="#DFE9F2">事例名称</td><td>case {i}</td></tr>'
            f'<tr><td bgcolor="#FFFFFF">skip</td><td>x</td></tr>'
            f'<tr><td bgcolor="#dfe9f2">分野</td>'
            f'<td><a href="/mf/m{i}.jpg">img</a>field {i % 3}</td></tr>'
            "</table>",
            encoding="utf-8",
        )
    return str(d)


def test_fkd_pages_datasource(spark, pages_dir):
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.sources.fkd_datasource import (
        FkdPagesDataSource,
    )

    spark.dataSource.register(FkdPagesDataSource)
    df = spark.read.format("fkd_pages").option("path", pages_dir).load()
    assert df.count() == 60  # 3 tr rows × 20 pages
    labels = (
        df.filter(F.upper("bgcolor") == "#DFE9F2")
        .groupBy("label")
        .count()
        .collect()
    )
    assert {r.label: r["count"] for r in labels} == {"事例名称": 20, "分野": 20}
    one = df.filter(
        (F.col("page_id") == "CZ0000003") & (F.col("label") == "分野")
    ).collect()[0]
    assert one.href == "/mf/m3.jpg" and one.value == "imgfield 0"
