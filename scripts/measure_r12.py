"""Round-12 optimization measurement harness (guide §1).

Usage: python scripts/measure_r12.py [--plans DIR --suffix _before]
         [--reps N] [--sf SF_DIR] name [name ...]

For each named catalog query: times cold + (reps-1) repeats against the
noop sink (guide §1.4 — compute everything, pay no sink), labels the
jobs (§1.5), writes ``.explain("formatted")`` to
``<plans_dir>/<name><suffix>.txt`` when --plans is given, and prints a
per-query line plus one JSON summary. Plan-shape counters (Exchange /
BatchEvalPython / ArrowEvalPython / MapInPandas / join strategies) are
extracted from the formatted plan so before/after diffs are one grep.

This is a DIAGNOSTIC tool: bench.py stays the only artifact-producing
timer (its stdout contract line is pinned; this script never writes
BENCH*.json).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import pandas as pd

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def plan_counters(plan: str) -> dict[str, int]:
    out = {}
    for token in (
        "Exchange hashpartitioning",
        "Exchange rangepartitioning",
        "Exchange SinglePartition",
        "BroadcastExchange",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin",
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
        "WholeStageCodegen",
        "Window",
        "Sort ",
        "TakeOrderedAndProject",
        "Scan parquet",
        "Scan ExistingRDD",
    ):
        n = plan.count(token)
        if n:
            out[token.strip()] = n
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from shippai_knowledge_etl_spark.catalog import queries
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("measure-r12")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()
    unknown = [n for n in args.names if n not in q]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # session warm-up: JVM codegen + Python worker pool (bench.py's
    # protocol), so the first measured query is not charged session cost
    from pyspark.sql.functions import pandas_udf

    q[args.names[0]](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    @pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    results = {}
    for name in args.names:
        fn = q[name]
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.plans:
            pdir = Path(args.plans)
            pdir.mkdir(parents=True, exist_ok=True)
            (pdir / f"{name}{args.suffix}.txt").write_text(plan)
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        med = sorted(times)[len(times) // 2]
        counters = plan_counters(plan)
        results[name] = {
            "times": times,
            "median": med,
            "counters": counters,
        }
        print(f"{name}: times={times} median={med} {counters}", flush=True)

    print(json.dumps({n: r["median"] for n, r in results.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
