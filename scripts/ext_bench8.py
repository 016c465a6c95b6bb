"""Eighth pinned EXT timing set — the round-13 discovered paths.

Round 13's zero-exchange plan sweep + full-catalog timing pass found
heavy query paths NO earlier bench set ever measured (the extreme:
dedup_edit_distance at 125 s median, the slowest query in the whole
engine), plus the round's own optimization targets outside EXT7's
frozen tuple. This set pins them on the post-optimization tree so the
round's claimed deltas live in an artifact, not in commit messages
(the VERDICT r12 item-1 lesson, applied to the round that learned
it). Same shared protocol as EXT2-7 (scripts/ext_common.py): cold +
median-of-3 with the BRACKETED contention sentinel; cross-round diffs
use ``queries_median``.

Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench8.py

Reference numbers (sf0.1, local[32], 2026-08, round 13): see
EXTBENCH8_r13.json. Pre-optimization same-session A/B numbers for
these paths are recorded per change in OPTIMIZATION_r13.md (the
before-code no longer exists on the tree; winnow's before could not
even complete one pass).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of round 13 — never add to or remove from this tuple
# afterward. Block 1: the sweep-found heavies (each was running its
# per-row compute on ONE core and/or doing provably redundant work).
# Block 2: round-13-optimized paths not in EXT7's frozen set.
EXT8_SET = (
    # sweep finds
    "dedup_edit_distance",
    "ext_textrank_keywords",
    "ext_winnow_fingerprints",
    "ext_fingerprint",
    "ext_langid_scores",
    "curation_code_switching",
    "ext_unigram_train",
    "behavior_bradley_terry",
    # round-13 optimized, outside EXT7
    "behavior_attribution_position",
    "dedup_clusters",
    "ext_bpe_train",
    "ext_bpe_encode",
    "s1_html_parse",
    "f6_knowledge_parse",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench8")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    return run_set(cat, spark, sf_dir, EXT8_SET, "ext8_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
