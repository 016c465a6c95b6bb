"""IVF index AT REST: k-means buckets as a partitioned parquet layout.

The ANN scale story end-to-end: train the coarse quantizer in-engine
(`kmeans_fit`), lay the corpus out partitioned by cluster id, route a
query to its cluster, and probe — the probe must prune at PLAN time
(PartitionFilters on the cluster directory) and return exactly the
brute-force answer restricted to the probed bucket. At 100 TB this
layout is what turns top-k from a full scan into an
nprobe/k-sized read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators import simsearch
from shippai_knowledge_etl_spark.tables import load


@pytest.mark.slow
def test_ivf_partitioned_probe(spark, sf_dir, tmp_path):
    corpus = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, centroids = simsearch.kmeans_fit(corpus, k=8, n_iter=3)

    layout = str(tmp_path / "ivf")
    # the index rows carry the vectors; cluster becomes the directory key
    index_rows = assigned.select("vec_id", "cluster").join(corpus, "vec_id")
    index_rows.write.mode("overwrite").partitionBy("cluster").parquet(layout)
    index = spark.read.parquet(layout)

    # route one query vector through the SAME centroids
    query = corpus.filter(F.col("vec_id") == 7)
    routed = simsearch.assign_clusters(query, centroids)
    q_cluster = routed.collect()[0].cluster

    probe_scan = index.filter(F.col("cluster") == q_cluster)
    plan = probe_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split(
        "PartitionFilters", 1
    )[1][:200], f"probe does not prune partitions:\n{plan[:1500]}"

    got = simsearch.topk_cosine_bucketed(
        probe_scan.withColumn("bucket", F.col("cluster")),
        routed.withColumn("bucket", F.lit(q_cluster)),
        k=5,
        bucket_col="bucket",
    ).collect()

    # pruned search is EXACT within the probed bucket: equals the
    # brute-force ranking restricted to that bucket
    bucket_members = (
        assigned.filter(F.col("cluster") == q_cluster)
        .select("vec_id")
        .join(corpus, "vec_id")
    )
    want = simsearch.topk_cosine(bucket_members, query, k=5).collect()
    assert [(r.vec_id, r.sim) for r in got] == [(r.vec_id, r.sim) for r in want]
    assert len(got) == 5
