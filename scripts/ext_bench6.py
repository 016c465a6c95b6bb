"""Sixth pinned EXT timing set — round-over-round telemetry for the
round-12 operator cohort (the EXTBENCH2/3/4/5 discipline: earlier
sets are frozen by design, so each round's cohort gets a NEW set).
Runs each flagship with the shared cold + median-of-3 protocol AND
the bracketed contention sentinel (scripts/ext_common.py) and prints
ONE JSON line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench6.py

Reference numbers (sf0.1, local[32], 2026-08, round 12): see
EXTBENCH6_r12.json — the round this set was pinned; later rounds diff
against its `queries_median` with the sentinel + >1.25x triage
convention, re-running in-session before attributing to code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of round 12 — never add to or remove from this tuple
# afterward. One row per round-12 operator: the progressive-JPEG
# decoder (three real streams per doc: flat progressive + the
# AC-dense baseline/progressive equivalence pair), the adversarial
# flate/TJ PDF extraction, Bellman-Ford SSSP on the generic fixpoint
# loop (early-exit convergence probes included in its time), the
# U-shaped attribution window chain, FFD compaction packing
# (grouped-map fold), the gamma=2 quantile sketch, RFC 9309 robots
# filtering, the WHATWG UTF-8 sanitize pass, sorted-neighborhood
# dedup and binseg changepoint detection — plus the two round-12
# WIDENINGS whose medians should be tracked (deflate members in
# zip, member-gzip WARC).
EXT6_SET = (
    "mm_jpeg_progressive",
    "mm_pdf_flate_extract",
    "graph_sssp",
    "behavior_attribution_position",
    "layout_compaction_binpack",
    "sketch_quantile_pow2",
    "crawl_robots_filter",
    "mm_zip_extract",
    "mm_warc_parse",
    "curation_utf8_sanitize",
    "dedup_sorted_neighborhood",
    "w38_changepoint_binseg",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench6")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    return run_set(cat, spark, sf_dir, EXT6_SET, "ext6_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
