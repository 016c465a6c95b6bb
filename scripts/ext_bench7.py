"""Seventh pinned EXT timing set — round-13 optimization telemetry.

VERDICT r12 item 1: every round-12 optimization shipped its
after-number in commit messages only — all EXT pins predated the
optimization commits. This set pins, on the POST-r12-optimization
tree, (a) the ten r12-optimized query paths, converting the r12
claims into artifact ground truth, and (b) the round-13 optimization
targets (the heaviest untouched paths per the r12 EXT medians), so
round 13's own before/after deltas land in ONE artifact. Same shared
protocol as EXT2-6 (scripts/ext_common.py): cold + median-of-3 with
the BRACKETED contention sentinel; cross-round diffs use
``queries_median``.

Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench7.py

Reference numbers (sf0.1, local[32], 2026-08, round 13): see
EXTBENCH7_r13_pre.json (pinned on the r12 tree before any round-13
change) and EXTBENCH7_r13.json (end of round 13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of round 13 — never add to or remove from this tuple
# afterward. First block: the ten r12-optimized paths (VERDICT r12
# item 1's list). Second block: round-13 targets — the heaviest
# untouched EXT paths by the r12 pins (quality_t_closeness 5.86 s,
# mm_png_tile_dedup 4.52 s, mm_bmp_decode 3.39 s, mm_png_adam7
# 2.99 s, eval_meteor_frag 2.3 s, eval_chrf_bigram 2.57 s,
# eval_rouge_bigram 2.22 s, retrieval_wand_pruning 1.80 s).
EXT7_SET = (
    "graph_sssp",
    "graph_bfs_closeness",
    "dedup_semantic_int8",
    "retrieval_impact_quantized",
    "eval_bleu_log",
    "ext_wordpiece_encode",
    "sketch_quantile_pow2",
    "mm_jpeg_decode",
    "mm_jpeg_progressive",
    "mm_avi_mjpeg",
    "quality_t_closeness",
    "mm_png_tile_dedup",
    "mm_bmp_decode",
    "mm_png_adam7",
    "eval_meteor_frag",
    "eval_chrf_bigram",
    "eval_rouge_bigram",
    "retrieval_wand_pruning",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench7")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    return run_set(cat, spark, sf_dir, EXT7_SET, "ext7_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
