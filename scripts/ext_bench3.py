"""Third pinned EXT timing set — round-over-round telemetry for the
round-9 operator cohort (the EXTBENCH2 discipline: ext_bench.py and
ext_bench2.py are frozen by design, so new cohorts get a NEW set
rather than extending an old one). Runs each flagship with the shared
cold + median-of-3 protocol (scripts/ext_common.py) and prints ONE
JSON line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench3.py

Reference numbers (sf0.1, local[32], 2026-08, round 9): see
EXTBENCH3_r09.json — the round this set was pinned; later rounds diff
against its `queries_median` with the same triage convention (flag
>1.25x, re-run in-session before attributing to code).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of round 9 — never add to or remove from this tuple. One
# representative per round-9 family: the two REAL codec paths + the
# decoded-PCM VAD and real-pixel downsample, pairwise text evals,
# experimentation sizing, governance drift/dependence audits, landmark
# BFS centrality, soft dedup + skyline curation, LM ranking +
# champion-list and WAND pruning retrieval, decayed counters, RFM,
# cohort LTV, and path mining.
EXT3_SET = (
    "mm_png_decode",
    "mm_png_downsample",
    "mm_wav_decode",
    "mm_wav_vad",
    "eval_rouge_bigram",
    "eval_bleu_log",
    "behavior_power_mde",
    "quality_psi_drift",
    "quality_mutual_information",
    "graph_bfs_closeness",
    "curation_soft_dedup",
    "curation_pareto_frontier",
    "retrieval_query_likelihood",
    "retrieval_champion_lists",
    "retrieval_wand_pruning",
    "ext_decayed_counts",
    "behavior_rfm_segments",
    "w34_cohort_ltv",
    "behavior_path_trigrams",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench3")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    return run_set(cat, spark, sf_dir, EXT3_SET, "ext3_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
