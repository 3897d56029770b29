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


def test_label_prototypes_match_plain_mean(spark, embeddings):
    """Prototype = per-label mean (within micro-unit quantization)."""
    import numpy as np

    from distributed_vector_database_spark.operators.mining import (
        label_prototypes,
    )

    dim = len(embeddings.select("embedding").head()[0])
    got = {
        r["label"]: np.array(r["prototype"])
        for r in label_prototypes(embeddings, dim).collect()
    }
    rows = embeddings.select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            np.asarray(r["embedding"], dtype=np.float64)
        )
    for lab, vecs in by_label.items():
        ref = np.mean(vecs, axis=0)
        assert np.allclose(got[lab], ref, atol=2e-6), lab


def test_prototype_scores_self_is_high(spark, embeddings):
    """A label's OWN prototype scores ~1.0 against itself; every row gets
    exactly one score; scores bounded to [-1, 1]."""
    from distributed_vector_database_spark.operators.mining import (
        label_prototypes,
        prototype_scores,
    )
    from distributed_vector_database_spark.functions.vector import (
        cosine_similarity,
        round_score,
    )
    from pyspark.sql import functions as F

    dim = len(embeddings.select("embedding").head()[0])
    out = prototype_scores(embeddings, dim)
    assert out.count() == embeddings.count()
    mm = out.agg(F.min("proto_cos"), F.max("proto_cos")).head()
    assert -1.0 <= mm[0] and mm[1] <= 1.0
    protos = label_prototypes(embeddings, dim)
    self_cos = protos.select(
        round_score(
            cosine_similarity(F.col("prototype"), F.col("prototype")), 6
        ).alias("c")
    ).collect()
    assert all(abs(r["c"] - 1.0) < 1e-6 for r in self_cos)


def test_semantic_dedup_invariants(spark, embeddings):
    """Every row appears once with a cluster; kept[min id per cluster] is
    always True; a dropped row has a lower-id in-cluster neighbor >= t."""
    from distributed_vector_database_spark.operators.dedup import (
        semantic_dedup,
    )
    from pyspark.sql import functions as F

    cents = [
        [float(x) for x in r["embedding"]]
        for r in embeddings.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    out = semantic_dedup(embeddings, cents, threshold=0.9)
    rows = out.collect()
    assert len(rows) == embeddings.count()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    import numpy as np

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in embeddings.collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return round(float(a @ b) / (na * nb), 6)

    for cid, members in by_cluster.items():
        members.sort(key=lambda r: r["vec_id"])
        assert members[0]["kept"] is True  # lowest id always kept
        for i, r in enumerate(members):
            has_lower = any(
                cos(vecs[m["vec_id"]], vecs[r["vec_id"]]) >= 0.9
                for m in members[:i]
            )
            assert r["kept"] == (not has_lower), (cid, r["vec_id"])


def test_hard_negatives_join_equals_broadcast(spark, embeddings):
    """The distributed blocked-GEMM strategy returns EXACTLY the
    broadcast-kernel rows (same (rounded score DESC, id ASC) contract)."""
    from distributed_vector_database_spark.operators.mining import (
        hard_negatives_join,
    )

    ids = [0, 1, 5, 9, 17]
    anchors = _anchors(embeddings, ids)
    bc = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score"])
        for r in hard_negatives(
            embeddings, anchors, k=6, method="broadcast"
        ).collect()
    }
    jn = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score"])
        for r in hard_negatives_join(embeddings, anchors, k=6).collect()
    }
    assert bc == jn and len(bc) == 5 * 6


def test_hard_negatives_anchor_cap_raises(spark, embeddings, monkeypatch):
    """Regression (VERDICT r2 item 5): an oversized anchor batch raises a
    clear error under method='broadcast' (and auto-falls back to the join
    strategy under method='auto')."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_MAX_ANCHOR_BATCH", "3")
    anchors = _anchors(embeddings, [0, 1, 2, 5, 9])
    with pytest.raises(ValueError, match="closure-broadcast cap"):
        hard_negatives(embeddings, anchors, k=2, method="broadcast")
    # auto: silently takes the distributed path instead
    out = hard_negatives(embeddings, anchors, k=2, method="auto").collect()
    assert len(out) == 10


def test_batch_topk_query_cap_raises(spark, embeddings, monkeypatch):
    """Oversized query batches fail fast instead of OOMing the driver."""
    import pytest

    from distributed_vector_database_spark.operators.topk import batch_topk

    monkeypatch.setenv("SPARK_GRAFT_MAX_QUERY_BATCH", "2")
    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    with pytest.raises(ValueError, match="closure-broadcast cap"):
        batch_topk(embeddings, queries, 3).collect()


def test_negative_samples_contract(spark):
    """Negatives are never interacted items, capped at n_neg per user,
    deterministic across invocations."""
    from distributed_vector_database_spark.operators.mining import (
        negative_samples,
    )

    inter = spark.createDataFrame(
        [(u, i) for u in range(5) for i in range(u + 1)],
        "user_id long, item_id long",
    )
    items = spark.createDataFrame(
        [(i,) for i in range(20)], "item_id long"
    )
    out1 = negative_samples(inter, items, n_neg=4).collect()
    out2 = negative_samples(inter, items, n_neg=4).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    seen = {(r["user_id"], r["item_id"]) for r in inter.collect()}
    per_user = {}
    for r in out1:
        assert (r["user_id"], r["item_id"]) not in seen
        per_user.setdefault(r["user_id"], []).append(r["neg_rank"])
    for u, ranks in per_user.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4
    assert len(per_user) == 5


def test_negative_samples_near_full_coverage(spark):
    """A user who interacted with all but one item can only ever get that
    item (or nothing if the draws miss it) — never an interacted one."""
    from distributed_vector_database_spark.operators.mining import (
        negative_samples,
    )

    items = spark.createDataFrame([(i,) for i in range(5)], "item_id long")
    inter = spark.createDataFrame(
        [(1, i) for i in range(4)], "user_id long, item_id long"
    )
    out = negative_samples(inter, items, n_neg=3, oversample=10).collect()
    assert all(r["item_id"] == 4 for r in out)
    assert len(out) <= 1 or all(r["neg_rank"] == 1 for r in out)


def test_label_guard_counts_nulls_out_before_the_cap(spark, monkeypatch):
    """Regression (ADVICE r4): NULL labels must be dropped BEFORE the
    `limit(cap+1)` sample — filtering after could let a >cap label space
    slip past the guard with a truncated label set (wrong negatives, no
    error). With cap=3 and 4 distinct non-null labels (+ a NULL row), the
    guard must raise regardless of which rows the limit samples."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_MAX_LABELS", "3")
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 1),
            (2, [0.0, 1.0], 2),
            (3, [0.1, 0.9], 3),
            (4, [0.5, 0.5], None),
        ],
        "vec_id int, embedding array<double>, label int",
    )
    anchors = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
        F.col("label").alias("query_label"),
    )
    with pytest.raises(ValueError, match="distinct labels"):
        hard_negatives(corpus, anchors, k=2, method="broadcast")
