"""Fourth pinned EXT timing set — round-over-round telemetry for the
round-10 operator cohort (the EXTBENCH2/3 discipline: earlier sets are
frozen by design, so each round's cohort gets a NEW set). Runs each
flagship with the shared cold + median-of-3 protocol
(scripts/ext_common.py) and prints ONE JSON line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench4.py

Reference numbers (sf0.1, local[32], 2026-08, round 10): see
EXTBENCH4_r10.json — the round this set was pinned; later rounds diff
against its `queries_median` with the same triage convention (flag
>1.25x, re-run in-session before attributing to code).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of END of round 10 (re-pinned once late-round on the full
# cohort, the EXTBENCH3 late-r9 precedent) — never add to or remove
# from this tuple afterward. One row per round-10 operator: the GIF +
# mu-law codec branches, alignment/combinatorial/char-level evals, the
# KMV/theta sketch, impact-quantized retrieval, t-closeness EMD
# governance, the BMP/AVI containers + real-pixel tile dedup + PCM
# resample + SRT sidecar, Hilbert-vs-Morton layout, overlap depth, the
# Holt recurrence + its streaming replay, WordPiece encoding,
# modularity scoring, int8-exact SemDeDup, DID + matched ATT, one-way
# ANOVA, and hash-randomness random walks.
EXT4_SET = (
    "mm_gif_decode",
    "mm_wav_mulaw",
    "eval_meteor_frag",
    "eval_pass_at_k",
    "eval_chrf_bigram",
    "ext_kmv_distinct",
    "retrieval_impact_quantized",
    "quality_t_closeness",
    "mm_bmp_decode",
    "mm_png_tile_dedup",
    "mm_png_adam7",
    "mm_png_16bit",
    "mm_audio_resample",
    "mm_avi_decode",
    "mm_srt_parse",
    "layout_hilbert_order",
    "layout_overlap_depth",
    "w35_holt_linear",
    "stream_holt_replay",
    "ext_wordpiece_encode",
    "graph_modularity",
    "graph_random_walks",
    "dedup_semantic_int8",
    "behavior_did",
    "behavior_matched_att",
    "w36_anova_dow",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench4")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    return run_set(cat, spark, sf_dir, EXT4_SET, "ext4_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
