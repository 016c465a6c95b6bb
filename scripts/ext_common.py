"""Shared measurement loop for the two pinned EXT benches.

VERDICT r8 item 1: round-over-round EXT comparisons were
noise-dominated because each query ran ONCE per session — a 1.16x
total drift appeared with provably zero code changes (between-session
JVM/JIT variance exceeds the signal of a once-warm run). bench.py's
fix since round 7 is the per-query median-of-3 in-session statistic;
this module gives the SAME protocol to ext_bench.py and ext_bench2.py
without touching their frozen query sets: cold stays the first
execution (methodology-compatible with earlier rounds' `queries`
numbers), two further in-session reps give `queries_median` (median
of the three samples — robust to a stalled cold pass and to one lucky
rep) and `queries_warm` (min of the two post-cold reps). Cross-round
diffs should be computed on the medians.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Iterable


def run_set(cat, spark, sf_dir: str, names: Iterable[str], metric: str) -> int:
    """Time each catalog query cold + 2 reps; print ONE JSON line."""
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    median: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        n = len(cat[name].fn(spark, sf_dir).collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            cat[name].fn(spark, sf_dir).collect()
            reps.append(time.perf_counter() - t0)
        warm[name] = round(min(reps), 3)
        median[name] = round(sorted([timings[name], *reps])[1], 3)
        print(
            f"# {name}: cold {timings[name]}s median {median[name]}s"
            f" ({n} rows)",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "warm_total_sec": round(sum(warm.values()), 3),
                "queries_median": median,
                "median_total_sec": round(sum(median.values()), 3),
                "sf": sf_dir,
            }
        )
    )
    return 0
