"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Execution is measured end-to-end per query with a `noop` write so the
full plan (scan → shuffle → agg) runs without driver-collect overhead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

import pandas as pd

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from shippai_knowledge_etl_spark.catalog import bench_queries
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("shippai-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = bench_queries()
    # Warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session startup.
    next(iter(names.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # Also spin up the Python/Arrow workers (one per core): the first
    # pandas-UDF query would otherwise absorb ~2s of worker fork/init
    # that is session startup, not query cost.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    # per-query min over all three runs: the machine occasionally hits
    # multi-minute external-contention windows (observed: the identical
    # bench at 179 s and 26 s back-to-back with zero guest-side load) —
    # best_total_sec is the contention-robust signal when the cold pass
    # lands in one.
    best: dict[str, float] = {}
    for name, fn in names.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        # Steady-state latency (codegen + JIT warmed): min of two
        # post-cold runs. A single repeat occasionally lands on a JIT
        # compile-queue stall (all 32 cores busy → C2 starved → the
        # whole single-wave stage runs interpreted, 5-10x slower), which
        # says nothing about the plan; min-of-2 filters that tail.
        # Reported alongside, NOT in the headline value, so totals stay
        # methodology-compatible with earlier rounds.
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        warm[name] = round(min(reps), 4)
        best[name] = round(min([timings[name], *reps]), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "warm_total_sec": round(sum(warm.values()), 4),
                "queries_best": best,
                "best_total_sec": round(sum(best.values()), 4),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
