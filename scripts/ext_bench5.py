"""Fifth pinned EXT timing set — round-over-round telemetry for the
round-11 operator cohort (the EXTBENCH2/3/4 discipline: earlier sets
are frozen by design, so each round's cohort gets a NEW set). Runs
each flagship with the shared cold + median-of-3 protocol AND the
round-11 contention sentinel (scripts/ext_common.py) and prints ONE
JSON line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench5.py

Reference numbers (sf0.1, local[32], 2026-08, round 11): see
EXTBENCH5_r11.json — the round this set was pinned; later rounds diff
against its `queries_median` with the sentinel + >1.25x triage
convention, re-running in-session before attributing to code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of round 11 — never add to or remove from this tuple
# afterward. One row per round-11 operator (the codec quartet:
# baseline JPEG, IMA ADPCM with its recursive-CTE codec replay, TIFF
# with PackBits in both byte orders, Motion-JPEG-in-AVI composition)
# plus the annotation-agreement eval, the seasonal Holt-Winters
# recurrence, the AMS F2 sketch, the ustar/WARC/zip ingestion-container trio — and the two round-11 REWRITES whose
# medians the verdict asked to track (METEOR's single-tokenize form,
# SemDeDup's enforced cluster cap).
EXT5_SET = (
    "mm_jpeg_decode",
    "mm_wav_adpcm",
    "mm_tiff_decode",
    "mm_avi_mjpeg",
    "eval_cohen_kappa",
    "w37_holt_winters",
    "ext_ams_f2",
    "eval_meteor_frag",
    "dedup_semantic_int8",
    "mm_tar_extract",
    "mm_warc_parse",
    "mm_zip_extract",
    "stream_hw_replay",
    "mm_pdf_text_extract",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench5")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    return run_set(cat, spark, sf_dir, EXT5_SET, "ext5_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
