"""MMR re-rank (fusion.mmr_rerank): greedy relevance/novelty trade on a
collected shortlist."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.fusion import mmr_rerank
from distributed_vector_database_spark.operators.topk import topk


def _shortlist(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_lambda_one_is_relevance_order(spark):
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.5, 0.5]]
    out = mmr_rerank(_shortlist(spark, vecs), [1.0, 0.0], k=4, lambda_=1.0)
    got = [r["vec_id"] for r in out.orderBy("rank").collect()]
    # pure cosine order to [1,0]
    sims = [
        (round(float(np.dot(v, [1, 0]) / np.linalg.norm(v)), 6), i)
        for i, v in enumerate(vecs)
    ]
    exp = [i for s, i in sorted(sims, key=lambda t: (-t[0], t[1]))]
    assert got == exp


def test_mmr_skips_near_duplicate_second_pick(spark):
    # 0 and 1 identical and most relevant; 2 less relevant but diverse
    vecs = [[0.9, 0.1], [0.9, 0.1], [0.8, -0.6]]
    out = mmr_rerank(_shortlist(spark, vecs), [1.0, 0.0], k=2, lambda_=0.5)
    got = [r["vec_id"] for r in out.orderBy("rank").collect()]
    assert got[0] == 0  # most relevant first (tie -> lowest id)
    assert got[1] == 2  # exact duplicate penalized below the diverse doc


def test_first_pick_score_is_relevance(spark):
    vecs = [[1.0, 0.0], [0.0, 1.0]]
    out = mmr_rerank(_shortlist(spark, vecs), [1.0, 0.0], k=1, lambda_=1.0)
    r = out.head()
    assert r["rank"] == 1 and r["vec_id"] == 0
    assert r["mmr_score"] == pytest.approx(r["relevance"])


def test_mmr_over_real_shortlist_is_subset_and_sized(embeddings):
    qv = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    short = topk(embeddings, qv, k=30).join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    )
    out = mmr_rerank(short, qv, k=10, lambda_=0.7)
    rows = out.collect()
    assert len(rows) == 10
    short_ids = {r["vec_id"] for r in short.collect()}
    assert {r["vec_id"] for r in rows} <= short_ids
    # ranks are 1..10 and mmr_score non-increasing is NOT guaranteed
    # (classic MMR), but relevance of rank 1 is the max relevance
    rel1 = [r for r in rows if r["rank"] == 1][0]["relevance"]
    assert rel1 == max(r["relevance"] for r in rows)


def test_mmr_inherits_string_id_type(spark):
    """Regression (round-3 advice): the result schema derives the id type
    from the shortlist — string ids (sqlite-store shape) round-trip."""
    short = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [0.9, 0.1])],
        "vec_id string, embedding array<double>",
    )
    out = mmr_rerank(short, [1.0, 0.0], k=2, lambda_=0.5)
    assert out.schema["vec_id"].dataType.simpleString() == "string"
    got = [r["vec_id"] for r in out.orderBy("rank").collect()]
    assert got[0] == "a" and len(got) == 2


def test_mmr_shortlist_cap_raises(spark, monkeypatch):
    """Regression (VERDICT r2 item 5): an oversized shortlist fails fast
    with a clear message instead of OOMing the driver."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_MAX_SHORTLIST", "3")
    short = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="shortlist exceeds"):
        mmr_rerank(short, [1.0, 0.0], k=2)


# ---------------------------------------------------------------------------
# Rocchio pseudo-relevance feedback (fusion.rocchio_expanded_topk)
# ---------------------------------------------------------------------------

from distributed_vector_database_spark.operators.fusion import (  # noqa: E402
    rocchio_expanded_topk,
)


def _corpus(spark):
    # integer-count "hashing embed" style vectors
    vecs = [
        [4.0, 0.0, 1.0],   # 0: the query doc
        [3.0, 0.0, 3.0],   # 1: near the query, heavy on dim 2
        [3.0, 0.0, 4.0],   # 2: near the query, heavy on dim 2
        [0.0, 5.0, 0.0],   # 3: off-topic
        [0.0, 0.0, 6.0],   # 4: pulled in only by feedback drift
        [1.0, 1.0, 0.0],   # 5: raw-query tail, orthogonal to feedback
    ]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "doc_id long, embedding array<double>",
    )


def test_rocchio_scale_invariance(spark):
    """(alpha, beta) and (2*alpha, 2*beta) give the identical ranking —
    the expanded query is only defined up to positive scale."""
    df = _corpus(spark)
    q = [4.0, 0.0, 1.0]
    a = rocchio_expanded_topk(
        df, q, k_feedback=2, alpha=4, beta=3, k=6,
        vector_col="embedding", id_col="doc_id", exclude_ids=[0],
    ).collect()
    b = rocchio_expanded_topk(
        df, q, k_feedback=2, alpha=8, beta=6, k=6,
        vector_col="embedding", id_col="doc_id", exclude_ids=[0],
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_rocchio_beta_zero_is_plain_search(spark):
    df = _corpus(spark)
    q = [4.0, 0.0, 1.0]
    out = rocchio_expanded_topk(
        df, q, k_feedback=2, alpha=1, beta=0, k=6,
        vector_col="embedding", id_col="doc_id",
    ).collect()
    plain = topk(
        df, q, k=6, vector_col="embedding", id_col="doc_id"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (r["doc_id"], r["score"]) for r in plain
    ]


def test_rocchio_feedback_moves_the_ranking(spark):
    """A doc aligned with the feedback centroid (doc 4, pure dim 2) must
    overtake a raw-query-tail doc orthogonal to it (doc 5) once the top-2
    feedback docs (1, 2 — both heavy on dim 2) expand the query."""
    df = _corpus(spark)
    q = [4.0, 0.0, 1.0]
    plain = [
        r["doc_id"]
        for r in topk(df, q, k=6, vector_col="embedding", id_col="doc_id")
        .collect()
    ]
    expanded = [
        r["doc_id"]
        for r in rocchio_expanded_topk(
            df, q, k_feedback=2, alpha=1, beta=30, k=6,
            vector_col="embedding", id_col="doc_id", exclude_ids=[0],
        ).collect()
    ]
    assert plain.index(5) < plain.index(4)
    assert expanded.index(4) < expanded.index(5)


def test_rocchio_exclude_and_validation(spark):
    df = _corpus(spark)
    q = [4.0, 0.0, 1.0]
    # excluded id may still appear in the FINAL results
    out = rocchio_expanded_topk(
        df, q, k_feedback=2, alpha=4, beta=3, k=6,
        vector_col="embedding", id_col="doc_id", exclude_ids=[0],
    ).collect()
    assert 0 in {r["doc_id"] for r in out}
    with pytest.raises(ValueError, match="k_feedback"):
        rocchio_expanded_topk(df, q, k_feedback=0)
    with pytest.raises(ValueError, match="alpha/beta"):
        rocchio_expanded_topk(df, q, alpha=0, beta=0)
