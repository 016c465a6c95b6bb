"""Timing harness for the [EXT] LLM-pipeline surface (separate from
bench.py, whose headline set is pinned for round-over-round
comparison). Runs each EXT flagship once warm and prints ONE JSON
line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ext_bench.py

Reference numbers (sf0.1, local[32], first execution per query so
per-query Janino codegen is included, 2026-08): total ~55s — bm25
~5.8s, bm25_batch ~6.5s, chunking ~0.6s, hamming ~2.3s, hybrid
~3.3s, eval_recall ~4.4s, mmr ~1.5s, rag e2e ~7.0s, bpe_train
~3.2s, bpe_encode ~5.7s, cluster_balance ~4.5s, main_content ~6.7s
(150k pages through the Python parse edge), length_batches /
outliers / negative_pairs / hard_negatives / profile all <1s. None
scale worse than linearly in rows; the multi-second constants are
codegen + AQE rounds + (for bpe/kmeans) driver iteration probes,
all of which amortize at real scale."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PINNED as of round 6 — the EXT surface's round-over-round regression
# telemetry, the same convention as bench.py's headline set: never add
# to or remove from this tuple (new operators get timed ad hoc, not
# here). One representative per EXT family: retrieval (dense, batch,
# index-free chunking, Hamming, hybrid, eval, MMR, RAG e2e),
# incremental near-dup probe, tokenizer (train+encode), graph, and the
# curation flagships (DSIR, cluster balance, main content, length
# batching, outliers, negatives ×2, profile).
EXT_SET = (
    "ext_bm25_topk",
    "ext_bm25_batch",
    "ext_chunk_overlap",
    "simsearch_hamming_topk",
    "retrieval_hybrid",
    "retrieval_eval_recall",
    "retrieval_mmr",
    "retrieval_pipeline_e2e",
    "dedup_incremental",
    "graph_pagerank",
    "curation_dsir_weights",
    "ext_bpe_train",
    "ext_bpe_encode",
    "curation_cluster_balance",
    "curation_main_content",
    "curation_length_batches",
    "curation_quality_outliers",
    "curation_negative_pairs",
    "simsearch_hard_negatives",
    "ext_table_profile",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scripts.ext_common import run_set
    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("ext-bench")
    cat = load_catalog()
    # warm the JVM + Arrow workers so timings measure the queries
    cat["a1_status_summary"].fn(spark, sf_dir).collect()

    # Protocol change round 9 (VERDICT r8 item 1): cold + 2 in-session
    # reps per query; `queries` stays the cold numbers (comparable with
    # r6-r8), `queries_median` is the cross-round statistic. The SET is
    # unchanged — protocol, not queries.
    return run_set(cat, spark, sf_dir, EXT_SET, "ext_queries_total_sec")


if __name__ == "__main__":
    sys.exit(main())
