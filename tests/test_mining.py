"""Hard-negative mining + quality-aware dedup policy."""

import pyspark.sql.functions as F

from distributed_vector_database_spark.operators.dedup import (
    keep_best_per_cluster,
)
from distributed_vector_database_spark.operators.mining import hard_negatives


def _anchors(embeddings, ids):
    return embeddings.filter(F.col("vec_id").isin(*ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
        F.col("label").alias("query_label"),
    )


def test_hard_negatives_excludes_anchor_label(spark, embeddings):
    anchors = _anchors(embeddings, [0, 1, 2])
    out = hard_negatives(embeddings, anchors, k=5).collect()
    anchor_label = {
        r["query_id"]: r["query_label"] for r in anchors.collect()
    }
    label_of = {
        r["vec_id"]: r["label"]
        for r in embeddings.select("vec_id", "label").collect()
    }
    assert len(out) == 15  # 3 anchors x k
    for r in out:
        assert label_of[r["vec_id"]] != anchor_label[r["query_id"]]


def test_hard_negatives_matches_naive_per_anchor(spark, embeddings):
    """Mask-kernel result == brute-force topk over the label-filtered
    corpus, per anchor."""
    from distributed_vector_database_spark.operators.topk import topk

    anchors = _anchors(embeddings, [0, 5])
    out = {}
    for r in hard_negatives(embeddings, anchors, k=4).collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["score"])
        )
    for a in anchors.collect():
        cand = embeddings.filter(F.col("label") != a["query_label"])
        exp = topk(cand, list(a["query_vector"]), k=4).collect()
        got = [v for _, v, _ in sorted(out[a["query_id"]])]
        assert got == [r["vec_id"] for r in exp]


def test_keep_best_per_cluster(spark):
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.3), (5, 0.7)],
        "doc_id long, quality double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5)],  # {1,2,3} cluster; 5 self; 4 absent
        "doc_id long, cluster_id long",
    )
    kept = {
        r["doc_id"]: r for r in keep_best_per_cluster(quality, clusters).collect()
    }
    # cluster 1: quality tie 2 vs 3 -> lowest id wins
    assert set(kept) == {2, 4, 5}
    assert kept[2]["cluster_id"] == 1
    assert kept[4]["cluster_id"] == 4  # singleton fallback = own id
