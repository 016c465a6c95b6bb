"""Second pinned EXT timing set — round-over-round telemetry for the
round-7/8 operator cohort (VERDICT r7 item 2: the behavioral-windows,
graph, quality-audit, unigram, and new dedup/retrieval families were a
third of the catalog with no pinned timing artifact; ext_bench.py's set
is frozen by design, so this file pins a SECOND set rather than
extending the first). Runs each flagship once warm and prints ONE JSON
line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench2.py

Reference numbers (sf0.1, local[32], first execution per query so
per-query Janino codegen is included, 2026-08, round 8): see
EXTBENCH2_r08.json — the round this set was pinned; later rounds diff
against it with the same triage convention as EXTBENCH (flag >1.25x,
re-run in-session before attributing to code).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of round 8 — never add to or remove from this tuple (the
# ext_bench.py convention; newer operators get timed ad hoc until a
# third set is pinned). One representative per round-7/8 family:
# graph (profile composition, triangle counting, iterative k-core
# peel), behavioral/time-series (user profile, sessionization, anomaly
# consensus, interval coverage, market basket), data-quality audits
# (table checksum, CDC merge), round-7 dedup (prefix-filter all-pairs,
# duplicated passages), unigram-LM tokenizer (train + encode),
# curation diagnostics (source-overlap matrix, bootstrap CI, Heaps
# fit), retrieval additions (PRF expansion, the round-8 sweep-form
# proximity window), and multimodal scene cuts.
EXT2_SET = (
    "graph_node_profile",
    "graph_triangles",
    "graph_kcore",
    "behavior_user_profile",
    "w12_sessionization",
    "w28_anomaly_consensus",
    "w24_interval_coverage",
    "behavior_market_basket",
    "quality_table_checksum",
    "quality_cdc_merge",
    "dedup_prefix_allpairs",
    "dedup_dup_passages",
    "ext_unigram_train",
    "ext_unigram_encode",
    "curation_source_overlap",
    "a_bootstrap_ci",
    "ext_heaps_fit",
    "retrieval_prf_expansion",
    "retrieval_proximity_window",
    "mm_scene_cuts",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench2")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    # Protocol change round 9 (VERDICT r8 item 1): cold + 2 in-session
    # reps per query; `queries` stays the cold numbers (comparable with
    # the r8 pin), `queries_median` is the cross-round statistic. The
    # SET is unchanged — protocol, not queries.
    return run_set(cat, spark, sf_dir, EXT2_SET, "ext2_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
