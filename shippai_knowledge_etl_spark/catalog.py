"""Query catalog: the driver-facing registry behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers one demonstration
query here (name → callable over ``(spark, sf_dir)``) plus, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle string. The driver
compares Spark vs oracle at sf0.01 (row count + schema + order-insensitive
value hash); ``tests/test_oracle_parity.py`` runs the identical check at
sf0.001 so the gate is exercised locally before every commit.

Conventions (hash-match discipline):
  - alias every computed column identically in Spark and SQL;
  - monetary/num aggregates go through DECIMAL(18,4) on BOTH sides so
    results are order-independent and exact (float sums are neither);
  - any ORDER-dependent output carries an explicit deterministic key;
  - timestamps are handled in UTC (tables.load pins session TZ).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules whose import populates the registry. Order = SURVEY.md §7.2.
_QUERY_MODULES = (
    "shippai_knowledge_etl_spark.queries.manifest",
    "shippai_knowledge_etl_spark.queries.relational",
    "shippai_knowledge_etl_spark.queries.scalar",
    "shippai_knowledge_etl_spark.queries.nested",
    "shippai_knowledge_etl_spark.queries.textops",
    "shippai_knowledge_etl_spark.queries.dedup",
    "shippai_knowledge_etl_spark.queries.simsearch",
    "shippai_knowledge_etl_spark.queries.multimodal",
    "shippai_knowledge_etl_spark.queries.windows",
    "shippai_knowledge_etl_spark.queries.coverage",
    "shippai_knowledge_etl_spark.queries.udfsurface",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    survey_ref: str = ""  # SURVEY.md §2 operator ids this demonstrates
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default=())


def register(
    name: str,
    oracle: str | None = None,
    survey_ref: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, survey_ref, bench, tags)
        return fn

    return deco


def load_catalog() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_catalog().items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in load_catalog().items() if s.bench}
