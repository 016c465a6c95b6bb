"""Scale probe: MEASURE the shuffle-heavy flagships' documented
scaling bounds instead of arguing them (VERDICT r8 item 4).

The sf0.1 documents corpus is epoch-exploded k-fold in memory for
k in (1, 2, 4, 8) with the ``mix_oversample`` machinery (integer
weight k keeps every epoch), then each epoch is made FRESH CONTENT:
ids are offset per epoch and every token gets an epoch suffix, so a
k-fold corpus models k-fold NEW data (the growth regime the 100 TB
claims are about), not k-fold literal duplicates (which would
legitimately grow near-dup pair counts quadratically inside each
duplicate group — that regime is what ``max_df`` / banding caps
bound, and it is pinned separately by the planted-duplicate tests).

Per operator and k we count the documented scale-critical
intermediate — the rows that actually cross the wire:

- ``dedup_ngram_jaccard`` (operators/dedup.py:jaccard_pairs):
  shuffle_rows = exploded (block, shingle, id) rows entering the
  owner-list groupBy; candidate_pairs = sum over owner keys of
  C(|owners|, 2), the pairs the HOF expansion materializes. Documented
  bound: both ~linear in corpus for fresh content (a hidden global
  pairing stage would show k^2 here).
- ``dedup_prefix_allpairs`` (operators/dedup.py:prefix_candidates):
  prefix_rows = per-doc prefix tokens entering the self-join;
  candidate_pairs = DISTINCT pairs surviving prefix + PPJoin length +
  positional filters. Documented bound: ~linear (hot tokens sort out
  of prefixes, so the join fan-out must not grow superlinearly).
- ``ext_bm25_batch`` (operators/retrieval.py:build_postings):
  postings_rows = (doc, term, tf) rows — the index build shuffle.
  Documented bound: linear in corpus tokens.
- ``graph_pagerank`` (operators/graph.py:pagerank): per-round
  dst-keyed shuffle rows = |edges| contributions + |nodes| rank rows.
  Documented bound: linear in nodes for the bounded-degree synthetic
  graph (2 out-links/node).

Round 10 (VERDICT r9 item 5) adds the candidate-bounded shapes the
r9 probe skipped, each with an EXPLICIT per-metric expectation —
"linear" is not the only healthy shape:

- ``dedup_minhash_lsh`` (operators/dedup.py:lsh_band_rows): band rows
  (16/doc — the signature shuffle) expect LINEAR; bucket-collision
  candidate pairs expect AT-MOST-LINEAR (fresh epochs share no
  shingles, so collisions stay within epochs).
- ``simsearch_margin_mining`` (queries/simsearch.py): the pre-cut
  scored rows |Q|·|corpus| expect LINEAR — and the post-
  WindowGroupLimit candidate rows expect CONSTANT (4/query); the cut
  existing is the documented 100 TB argument, now measured.
- ``curation_source_overlap`` (operators/curate.py:
  source_overlap_matrix): distinct (source, shingle) vocabulary rows
  expect LINEAR; the per-shingle cross-source pair fan-out expects
  AT-MOST-LINEAR (bounded by |sources| per shingle — the documented
  ≤|sources|² applies to the OUTPUT matrix, not the fan-out).
- ``graph_pagerank_densify``: node count FIXED (epoch-0 only), out-
  degree scaled 2k — per-round shuffle rows expect LINEAR IN DEGREE,
  the densification axis corpus explosion cannot probe.

Output: SCALEPROBE_r{N}.json with per-operator {k: metrics}, the
measured m(k)/m(1) ratios, per-metric expectations, and a verdict
(linear: ratio within 10% of k; at_most_linear: ratio <= 1.1k;
constant: ratio within 10% of 1).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = (1, 2, 4, 8)
ID_OFFSET = 1_000_000_000  # epoch e docs live at doc_id + e * offset


def scaled_documents(spark, sf_dir: str, k: int):
    """k-fold fresh-content explosion of the documents table."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators.curate import mix_oversample
    from shippai_knowledge_etl_spark.tables import load

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    out = mix_oversample(d, "doc_id", F.lit(float(k)), salt="scaleprobe")
    # fresh content per epoch: distinct ids, every token epoch-suffixed
    # (tokenize() lowercases and splits on non-alphanumerics, so the
    # suffix fuses into each token and epochs share NO tokens/shingles)
    return out.select(
        (
            F.col("doc_id").cast("long")
            + F.col("epoch").cast("long") * F.lit(ID_OFFSET).cast("long")
        ).alias("doc_id"),
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1x"), F.col("epoch").cast("string")),
        ).alias("text"),
        "source",
    )


def probe_jaccard(spark, docs, k):
    """jaccard_pairs' owner-list shuffle rows + expanded pair count."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators.dedup import shingle_structs

    # identical first stages as operators/dedup.py:jaccard_pairs
    # (block = source, the dedup_ngram_jaccard configuration)
    rows = docs.select(
        F.col("doc_id"),
        F.col("source").alias("block"),
        F.explode(shingle_structs(F.col("text"))).alias("shingle"),
    )
    owners = (
        rows.groupBy("block", "shingle")
        .agg(F.count(F.lit(1)).alias("n_owners"))
    )
    agg = owners.agg(
        F.sum("n_owners").alias("shuffle_rows"),
        F.sum(
            F.when(
                F.col("n_owners") >= 2,
                F.col("n_owners") * (F.col("n_owners") - 1) / 2,
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("candidate_pairs"),
    ).collect()[0]
    return {
        "shuffle_rows": int(agg["shuffle_rows"]),
        "candidate_pairs": int(agg["candidate_pairs"]),
    }


def probe_prefix(spark, docs, k):
    """prefix_candidates' prefix-row count + surviving candidates."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators.dedup import (
        prefix_candidates,
        shingle_structs,
    )

    cand, toks = prefix_candidates(
        docs, "doc_id", "text", threshold_num=1, threshold_den=2
    )
    # prefix rows = |d| - ceil(t|d|) + 1 per doc, summed — recompute
    # from per-doc sizes (cheap; the join input the theorem bounds)
    sizes = (
        docs.select(
            F.size(shingle_structs(F.col("text"))).alias("sz")
        )
        .agg(
            F.sum(
                F.col("sz") - F.expr("(1 * sz + 2 - 1) div 2") + 1
            ).alias("prefix_rows")
        )
        .collect()[0]
    )
    n_cand = cand.count()
    toks.unpersist()
    return {
        "prefix_rows": int(sizes["prefix_rows"]),
        "candidate_pairs": int(n_cand),
    }


def probe_postings(spark, docs, k):
    """build_postings row count — the index-build shuffle."""
    from shippai_knowledge_etl_spark.operators.retrieval import (
        build_postings,
    )

    return {"postings_rows": build_postings(docs, "doc_id", "text").count()}


def probe_pagerank(spark, docs, k):
    """Per-round shuffle rows of the synthetic-graph PageRank: edge
    contributions + node rank rows (the dst-keyed exchange)."""
    from pyspark.sql import functions as F

    n = docs.count()
    i = F.col("doc_id")
    edges = (
        docs.select(i.alias("src"), ((i * 7 + 1) % n).alias("dst"))
        .unionAll(
            docs.select(i.alias("src"), ((i * 13 + 2) % n).alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return {"per_round_shuffle_rows": edges.count() + n}


def probe_rouge(spark, docs, k):
    """eval_rouge_bigram's gram shuffle (round 9): exploded bigram
    rows entering the (doc, gram) count groupBy, and the distinct
    (doc, gram) rows entering the clipped-match pair join. Documented
    bound: both linear in corpus tokens (pairing is id-arithmetic, so
    no stage can pair across the whole corpus)."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.queries.evals import _gram_counts

    cnt = _gram_counts(docs, 2)
    agg = cnt.agg(
        F.sum("c").alias("gram_rows"),
        F.count(F.lit(1)).alias("distinct_doc_grams"),
    ).collect()[0]
    return {
        "gram_rows": int(agg["gram_rows"]),
        "distinct_doc_grams": int(agg["distinct_doc_grams"]),
    }




def probe_minhash(spark, docs, k):
    """lsh_band_rows' signature shuffle + LSH bucket-collision pairs."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators.dedup import lsh_band_rows

    rows = lsh_band_rows(docs, "doc_id", "text")
    agg = (
        rows.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n_owners"))
        .agg(
            F.sum("n_owners").alias("band_rows"),
            F.sum(
                F.when(
                    F.col("n_owners") >= 2,
                    F.col("n_owners") * (F.col("n_owners") - 1) / 2,
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("collision_pairs"),
        )
        .collect()[0]
    )
    return {
        "band_rows": int(agg["band_rows"]),
        "collision_pairs": int(agg["collision_pairs"]),
    }


def scaled_embeddings(spark, sf_dir: str, k: int):
    """k-fold embeddings: ids offset per epoch (vector values repeat,
    which only AIDS collision-style worst cases — counts are the
    probed quantity)."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.tables import load

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    parts = [
        e.select(
            (F.col("vec_id") + F.lit(i * ID_OFFSET)).alias("vec_id"),
            "embedding",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe_margin_eval(spark, docs, k):
    """simsearch_margin_mining / retrieval_eval class: broadcast-query
    scoring rows BEFORE the per-query WindowGroupLimit cut (linear by
    construction) and candidate rows AFTER it (must stay CONSTANT —
    the cut is the whole 100 TB argument)."""
    from pyspark.sql import Window, functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus = scaled_embeddings(spark, sf_dir, k)
    queries = (
        scaled_embeddings(spark, sf_dir, 1)
        .filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
        )
    )
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "q_id",
        "vec_id",
        F.expr(
            "aggregate(zip_with(embedding, q, (x, y) -> x * y), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("dot"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("dot"), F.asc("vec_id")
    )
    cand = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 4
    )
    return {
        "scored_rows": scored.count(),
        "candidate_rows": cand.count(),
    }


def probe_source_overlap(spark, docs, k):
    """source_overlap_matrix's two intermediates: the per-source
    DISTINCT shingle vocabulary (the shuffle) and the per-shingle
    cross-source pair fan-out (bounded by |sources| per shingle)."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators.dedup import shingle_structs

    sv = (
        docs.select(
            F.col("source").alias("src"),
            F.explode(shingle_structs(F.col("text"), n=3)).alias("shingle"),
        )
        .distinct()
    )
    agg = (
        sv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_src"))
        .agg(
            F.sum("n_src").alias("vocab_rows"),
            F.sum(
                F.when(
                    F.col("n_src") >= 2,
                    F.col("n_src") * (F.col("n_src") - 1) / 2,
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("pair_fanout_rows"),
        )
        .collect()[0]
    )
    return {
        "vocab_rows": int(agg["vocab_rows"]),
        "pair_fanout_rows": int(agg["pair_fanout_rows"]),
    }


def probe_pagerank_densify(spark, docs, k):
    """Iterative-graph probe on the DENSIFICATION axis: node count
    pinned to epoch 0, out-degree 2k — the per-round dst-keyed
    shuffle's edge contributions must scale with degree, not worse."""
    from pyspark.sql import functions as F

    base = docs.filter(F.col("doc_id") < ID_OFFSET)
    n = base.count()
    i = F.col("doc_id")
    edges = None
    for j in range(2 * k):
        e = base.select(
            i.alias("src"), ((i * (7 + 6 * j) + j + 1) % n).alias("dst")
        )
        edges = e if edges is None else edges.unionAll(e)
    edges = edges.filter(F.col("src") != F.col("dst"))
    return {"edge_contrib_rows": edges.count()}


def probe_semantic_cap(spark, docs, k):
    """Round-11 cap receipt (VERDICT r10 item 2): dedup_semantic_int8
    now ENFORCES its 300-vector cluster cap before the quadratic
    within-label stage. Fresh-data regime: each epoch brings FRESH
    labels (cluster sizes constant, label count k-fold) plus one HOT
    label spanning every epoch (cluster size k-fold — the regime the
    cap exists for). The kept-pair fan-out must stay linear in k and
    the hot label must stay dropped (dropped_labels constant at 1) —
    without the cap the hot label alone would add C(2000k, 2) ≈ 2M·k²
    pairs and own the runtime."""
    import os as _os

    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.tables import load

    sf_dir = _os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    ids = None
    for epoch in range(k):
        part = e.select(
            (F.col("vec_id") + epoch * 1_000_000).alias("vec_id"),
            (F.col("label") + 10 * epoch).cast("long").alias("label"),
        )
        ids = part if ids is None else ids.unionAll(part)
    hot = ids.select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"),
        F.lit(-1).cast("long").alias("label"),
    )
    sizes = (
        ids.unionAll(hot)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row = sizes.agg(
        F.sum(
            F.when(
                F.col("c") <= 300,
                F.expr("(c * (c - 1)) div 2"),
            ).otherwise(F.lit(0))
        ).alias("kept_pair_fanout"),
        F.sum(F.when(F.col("c") > 300, 1).otherwise(0)).alias(
            "dropped_labels"
        ),
        F.max(F.when(F.col("c") > 300, F.col("c"))).alias(
            "hot_label_size"
        ),
    ).collect()[0]
    return {
        "kept_pair_fanout": int(row[0]),
        "dropped_labels": int(row[1]),
        "hot_label_size": int(row[2]),
    }


def probe_sssp(spark, docs, k):
    """Round-12 fixpoint receipt: graph_sssp's per-round relax join
    must stay linear in the graph. Fresh-data regime: k epochs of the
    demo graph (ids offset per epoch, edges within epochs, seeds
    id%101==0 per epoch), 3 FIXED Bellman-Ford rounds through the
    real operator — reached-node count and edge count both k-fold; a
    hidden all-pairs stage would blow the reach superlinearly."""
    import os as _os

    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators.graph import (
        INF_DIST,
        shortest_paths,
    )
    from shippai_knowledge_etl_spark.tables import load, table_rowcount

    sf_dir = _os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d = load(spark, sf_dir, "documents").select("doc_id")
    n = table_rowcount(sf_dir, "documents")
    nodes = edges = seeds = None
    for epoch in range(k):
        off = epoch * 10_000_000
        i = F.col("doc_id")
        nn = d.select((i + off).alias("id"))
        e0 = d.select(
            (i + off).alias("src"), ((i * 7 + 1) % n + off).alias("dst")
        ).unionAll(
            d.select(
                (i + off).alias("src"), ((i * 13 + 2) % n + off).alias("dst")
            )
        )
        ee = e0.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", (1 + (F.col("src") + F.col("dst")) % 7).alias("w")
        )
        ss = nn.filter((F.col("id") - off) % 101 == 0)
        nodes = nn if nodes is None else nodes.unionAll(nn)
        edges = ee if edges is None else edges.unionAll(ee)
        seeds = ss if seeds is None else seeds.unionAll(ss)
    state, _rounds = shortest_paths(
        nodes, edges, seeds, 3, converge=False
    )
    reached = state.filter(F.col("dist") < INF_DIST).count()
    return {
        "edge_rows": edges.count(),
        "reached_nodes_r3": int(reached),
        "state_rows": nodes.count(),
    }


def probe_attribution(spark, docs, k):
    """Round-12 attribution receipt: the journey/credit row counts
    must stay linear in events. Fresh-data regime: k epochs of the
    events table with per-epoch user offsets (fresh users — sessions
    never straddle epochs), run through the registered query's exact
    window chain; journey rows and total credited basis points both
    k-fold, and per-session credit stays exactly 10000."""
    import os as _os

    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.tables import load

    sf_dir = _os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = load(spark, sf_dir, "events")
    folded = None
    for epoch in range(k):
        part = ev.select(
            (F.col("event_id") + epoch * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + epoch * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        folded = part if folded is None else folded.unionAll(part)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        folded.write.parquet(os.path.join(td, "events.parquet"))
        from shippai_knowledge_etl_spark.catalog import load_catalog

        out = load_catalog()["behavior_attribution_position"].fn(spark, td)
        row = out.agg(
            F.sum("n_touches").alias("touches"),
            F.sum("credit_bp").alias("credit_bp"),
        ).collect()[0]
    return {
        "journey_touch_rows": int(row["touches"]),
        "credit_bp_total": int(row["credit_bp"]),
    }


PROBES = {
    "dedup_ngram_jaccard": probe_jaccard,
    "dedup_prefix_allpairs": probe_prefix,
    "ext_bm25_batch": probe_postings,
    "graph_pagerank": probe_pagerank,
    "eval_rouge_bigram": probe_rouge,
    "dedup_minhash_lsh": probe_minhash,
    "simsearch_margin_mining": probe_margin_eval,
    "curation_source_overlap": probe_source_overlap,
    "graph_pagerank_densify": probe_pagerank_densify,
    "dedup_semantic_cap": probe_semantic_cap,
    "graph_sssp": probe_sssp,
    "behavior_attribution": probe_attribution,
}

# Per-metric growth expectation; anything not listed defaults to
# "linear" (the r9 probes' contract, unchanged).
EXPECT = {
    ("dedup_minhash_lsh", "collision_pairs"): "at_most_linear",
    ("simsearch_margin_mining", "candidate_rows"): "constant",
    ("curation_source_overlap", "pair_fanout_rows"): "at_most_linear",
    # the cap receipt: hot-label growth is linear but its PAIRS never
    # materialize — dropped_labels stays exactly 1 at every k
    ("dedup_semantic_cap", "dropped_labels"): "constant",
    ("dedup_semantic_cap", "hot_label_size"): "linear",
}


def _metric_ok(kind: str, ratio: float, k: int) -> bool:
    if kind == "constant":
        return abs(ratio - 1) <= 0.1
    if kind == "at_most_linear":
        return ratio <= 1.1 * k
    return abs(ratio - k) <= 0.1 * k


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for name, probe in PROBES.items():
        per_k: dict[str, dict] = {}
        for k in SCALES:
            docs = scaled_documents(spark, sf_dir, k)
            t0 = time.perf_counter()
            m = probe(spark, docs, k)
            m["probe_sec"] = round(time.perf_counter() - t0, 2)
            per_k[str(k)] = m
            print(f"# {name} k={k}: {m}", file=sys.stderr)
        base = per_k["1"]
        ratios = {
            metric: {
                str(k): round(per_k[str(k)][metric] / base[metric], 3)
                for k in SCALES
            }
            for metric in base
            if metric != "probe_sec" and base[metric]
        }
        expect = {
            metric: EXPECT.get((name, metric), "linear")
            for metric in ratios
        }
        ok = all(
            _metric_ok(expect[metric], ratios[metric][str(k)], k)
            for metric in ratios
            for k in SCALES
        )
        worst = max(
            (ratios[m][str(k)] / k for m in ratios for k in SCALES),
        )
        results[name] = {
            "metrics": per_k,
            "ratios_vs_k1": ratios,
            "expect": expect,
            "verdict": (
                f"ok: every intermediate within 10% of its expected "
                f"bound (worst ratio/k = {worst:.3f}; expectations: "
                + ", ".join(f"{m}={e}" for m, e in expect.items())
                + ")"
                if ok
                else f"BOUND EXCEEDED (worst ratio/k = {worst:.3f}) — "
                "investigate before the 100 TB claim stands"
            ),
            "linear": ok,
        }
    out = {
        "metric": "scale_probe",
        "sf": sf_dir,
        "scales": list(SCALES),
        "regime": "fresh-content epoch explosion (k-fold new data)",
        "operators": results,
    }
    print(json.dumps(out))
    return 0 if all(r["linear"] for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
