"""Custom Python DataSource: saved case-page directory → tall rows.

Spark 4's Python DataSource API (SURVEY.md §2.1 S1 'custom Python
DataSource') lets the HTML corpus register as a real table source:

    spark.dataSource.register(FkdPagesDataSource)
    spark.read.format("fkd_pages").load("/path/to/pages")

Each partition reads a shard of the HTML files and emits the parsed
tall rows (page_id, row_idx, label, value, bgcolor, href) — the same
shape as sources.html_parse, but produced inside a DataSourceReader so
Catalyst sees an honest scan (column pruning reaches it; one file list
on the driver, file reads on executors).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("page_id", StringType()),
        StructField("row_idx", IntegerType()),
        StructField("label", StringType()),
        StructField("value", StringType()),
        StructField("bgcolor", StringType()),
        StructField("href", StringType()),
    ]
)

N_PARTITIONS = 8


class _Shard(InputPartition):
    def __init__(self, paths: list[str]) -> None:
        self.paths = paths


class FkdPagesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fkd_pages requires a path")

    def partitions(self) -> list[_Shard]:
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".html")
        )
        shards = [files[i::N_PARTITIONS] for i in range(N_PARTITIONS)]
        return [_Shard(s) for s in shards if s]

    def read(self, partition: _Shard):
        # Imported inside read(): this body runs on executors.
        from shippai_knowledge_etl_spark.sources.html_parse import parse_page

        for path in partition.paths:
            page_id = os.path.splitext(os.path.basename(path))[0]
            with open(path, encoding="utf-8") as f:
                html = f.read()
            for row_idx, label, value, bgcolor, href in parse_page(html):
                yield (page_id, row_idx, label, value, bgcolor, href)


class FkdPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fkd_pages"

    def schema(self) -> StructType:
        return PAGES_SCHEMA

    def reader(self, schema: StructType) -> FkdPagesReader:
        return FkdPagesReader(self.options)
