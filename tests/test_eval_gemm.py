"""GEMM block dedup vs brute-force ground truth (property-style), and
recall@k of the approximate search paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.dedup import (
    embedding_neardup_pairs,
)
from distributed_vector_database_spark.operators.eval import recall_at_k
from distributed_vector_database_spark.operators.topk import topk
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("num_blocks", [1, 3, 8])
def test_gemm_pairs_equal_bruteforce(spark, num_blocks):
    rng = np.random.default_rng(7)
    n, dim, thr = 60, 8, 0.9
    vecs = rng.standard_normal((n, dim))
    vecs[5] = vecs[4] * 2.0  # exact-direction dup
    vecs[9] = vecs[8] + rng.standard_normal(dim) * 0.01  # near dup
    vecs[13] = 0.0  # zero vector -> cosine 0 with everything
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["vec_id_a"], r["vec_id_b"]): r["score"]
        for r in embedding_neardup_pairs(
            df, threshold=thr, num_blocks=num_blocks
        ).collect()
    }
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    unit = np.zeros_like(vecs)
    np.divide(vecs, norms, out=unit, where=norms > 0)
    sims = np.round(unit @ unit.T, 6)
    exp = {
        (i, j): sims[i, j]
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= thr
    }
    assert got == exp
    assert (4, 5) in got and (8, 9) in got
    assert not any(13 in p for p in got)


def test_recall_exact_vs_itself_is_one(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = topk(emb, q, k=10)
    r = recall_at_k(exact, exact).head()
    assert r["recall"] == 1.0 and r["n_exact"] == 10


def test_recall_partial_overlap(spark):
    exact = spark.createDataFrame([(i,) for i in range(10)], "vec_id long")
    approx = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 99, 98, 97, 96, 95]], "vec_id long"
    )
    r = recall_at_k(approx, exact).head()
    assert r["recall"] == 0.5 and r["n_hit"] == 5


def test_prefix_jaccard_equals_full_join(spark):
    """PPJoin prefix filtering is provably lossless: identical pairs and
    scores to the full shingle self-join, including boundary thresholds."""
    from distributed_vector_database_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    for t in (0.5, 0.8, 0.95):
        full = sorted(tuple(r) for r in jaccard_pairs(docs, t).collect())
        pref = sorted(tuple(r) for r in jaccard_pairs_prefix(docs, t).collect())
        assert full == pref, t
        if t == 0.5:
            assert len(full) > 0


def test_prefix_jaccard_positional_filter_keeps_boundary_pairs(spark):
    """Round-14 PPJoin positional filter: deep-prefix match rows get
    pruned (their overlap upper bound falls below the threshold's
    minimum), but a true pair must survive through its FIRST shared
    shingle's row. Crafted so the shared shingles are the most frequent
    (sorted to the prefix tail, tightest bounds) and J sits just above
    the threshold — if the filter over-pruned, these pairs would vanish."""
    from distributed_vector_database_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    # unigram shingles: tokens ARE the shingle set. A/B share s1..s6 of 8
    # (J = 0.6); C/D share c1..c5 of 10 and 8 (J = 5/13 ~ 0.385); the
    # shared tokens have df=2 vs the uniques' df=1, so they sort LAST.
    rows = [
        (0, "ua1 ua2 s1 s2 s3 s4 s5 s6"),
        (1, "ub1 ub2 s1 s2 s3 s4 s5 s6"),
        (2, "uc1 uc2 uc3 uc4 uc5 c1 c2 c3 c4 c5"),
        (3, "ud1 ud2 ud3 c1 c2 c3 c4 c5"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.35, 0.5, 0.6):
        full = sorted(
            tuple(r) for r in jaccard_pairs(docs, t, n=1).collect()
        )
        pref = sorted(
            tuple(r)
            for r in jaccard_pairs_prefix(docs, t, n=1).collect()
        )
        assert full == pref, t
    # sanity: the crafted pairs actually exist at their thresholds
    assert len(jaccard_pairs_prefix(docs, 0.5, n=1).collect()) == 1
    assert len(jaccard_pairs_prefix(docs, 0.35, n=1).collect()) == 2


def test_ivf_recall_curve_monotone(spark):
    """Recall rises (weakly) with nprobe and hits 1.0 at nprobe=num_shards."""
    from distributed_vector_database_spark.operators.eval import ivf_recall_curve
    from distributed_vector_database_spark.operators.ivf import IVFIndex

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    idx = IVFIndex(spark, cents)
    idx.write(emb)
    qs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([11, 23])).collect()
    ]
    curve = ivf_recall_curve(idx, qs, k=5, nprobes=(1, 2, 4))
    recalls = [p["mean_recall"] for p in curve]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0
    assert all(p["n_queries"] == 2 for p in curve)


def test_ndcg_at_k_rank_awareness(spark):
    """NDCG: perfect prefix scores 1.0; a relevant item buried at the
    bottom scores lower than the same set found at the top; disjoint
    lists score 0."""
    from distributed_vector_database_spark.operators.eval import ndcg_at_k

    exact = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "vec_id long, rank int"
    )
    perfect = ndcg_at_k(exact, exact, 5).head()["ndcg"]
    assert perfect == 1.0

    # same 5 relevant ids, worst order (reversed) -> still 1.0 with
    # binary relevance IF all k are relevant... so test partial overlap:
    # only id 1 found, at rank 5 vs at rank 1
    at_top = spark.createDataFrame(
        [(1, 1), (10, 2), (11, 3), (12, 4), (13, 5)], "vec_id long, rank int"
    )
    at_bottom = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3), (13, 4), (1, 5)], "vec_id long, rank int"
    )
    top_score = ndcg_at_k(at_top, exact, 5).head()["ndcg"]
    bottom_score = ndcg_at_k(at_bottom, exact, 5).head()["ndcg"]
    assert top_score > bottom_score > 0
    disjoint = spark.createDataFrame(
        [(10, 1), (11, 2)], "vec_id long, rank int"
    )
    assert ndcg_at_k(disjoint, exact, 5).head()["ndcg"] == 0.0

    # batched: per-query rows, missing-query dcg coalesces to 0
    b_exact = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (7, 1, 1)], "query_id long, vec_id long, rank int"
    )
    b_approx = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id long, vec_id long, rank int"
    )
    got = {
        r["query_id"]: r["ndcg"]
        for r in ndcg_at_k(
            b_approx, b_exact, 2, query_col="query_id"
        ).collect()
    }
    assert got[0] == 1.0 and got[7] == 0.0


def test_ivf_recall_curve_df_matches_list_variant(spark):
    """The distributed curve (one batched search per nprobe) equals the
    per-query list variant, and its mean_recall is the exact integer
    ratio total_hits / (k * n_queries)."""
    from distributed_vector_database_spark.operators.eval import (
        ivf_recall_curve,
        ivf_recall_curve_df,
    )
    from distributed_vector_database_spark.operators.ivf import IVFIndex

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    idx = IVFIndex(spark, cents).attach(emb)
    q_ids = [11, 23, 40]
    qdf = emb.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    got = {
        r["nprobe"]: r
        for r in ivf_recall_curve_df(
            idx, qdf, k=5, nprobes=(1, 2, 4)
        ).collect()
    }
    qs = [
        [float(x) for x in r["query_vector"]]
        for r in qdf.orderBy("query_id").collect()
    ]
    ref = {p["nprobe"]: p for p in ivf_recall_curve(idx, qs, k=5, nprobes=(1, 2, 4))}
    for np_ in (1, 2, 4):
        assert got[np_]["n_queries"] == 3
        assert got[np_]["mean_recall"] == pytest.approx(
            ref[np_]["mean_recall"], abs=1e-4
        )
        assert got[np_]["mean_recall"] == pytest.approx(
            got[np_]["total_hits"] / 15.0, abs=5e-7
        )
    assert got[4]["mean_recall"] == 1.0


def test_pick_nprobe_minimal_on_fixture_curve(spark):
    """VERDICT r9 item 4: pick_nprobe selects the SMALLEST measured nprobe
    meeting the target; unattainable targets fall back to the largest
    measured point; bad inputs refuse."""
    from distributed_vector_database_spark.operators.ivf import pick_nprobe

    fixture = [
        {"nprobe": 1, "mean_recall": 0.62},
        {"nprobe": 2, "mean_recall": 0.81},
        {"nprobe": 4, "mean_recall": 0.97},
        {"nprobe": 8, "mean_recall": 1.0},
    ]
    assert pick_nprobe(fixture, 0.95) == 4
    assert pick_nprobe(fixture, 0.81) == 2   # boundary: >= is inclusive
    assert pick_nprobe(fixture, 0.5) == 1
    assert pick_nprobe(fixture, 1.0) == 8
    # a non-monotone curve (sampling noise) still picks the smallest
    noisy = fixture + [{"nprobe": 3, "mean_recall": 0.96}]
    assert pick_nprobe(noisy, 0.95) == 3
    df = spark.createDataFrame(
        [(r["nprobe"], r["mean_recall"]) for r in fixture],
        "nprobe long, mean_recall double",
    )
    assert pick_nprobe(df, 0.95) == 4
    with pytest.raises(ValueError, match="target_recall"):
        pick_nprobe(fixture, 1.5)
    with pytest.raises(ValueError, match="no measured"):
        pick_nprobe([], 0.9)


def test_autotuned_search_target_one_equals_exact(spark):
    """target_recall=1.0 on a curve that reaches 1.0 at nprobe=num_shards
    picks num_shards, so the autotuned search IS the exact search — and
    any autotuned result is a subset of the corpus the exact path scores
    (the invariant the registered row ivf_autotuned_search rides on)."""
    from distributed_vector_database_spark.operators.eval import (
        ivf_recall_curve_df,
    )
    from distributed_vector_database_spark.operators.ivf import (
        IVFIndex,
        pick_nprobe,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    idx = IVFIndex(spark, cents).attach(emb)
    qdf = emb.filter(F.col("vec_id").isin([11, 23])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    curve = ivf_recall_curve_df(idx, qdf, k=5, nprobes=(1, 2, 4))
    picked = pick_nprobe(curve, 1.0)
    pts = {r["nprobe"]: r["mean_recall"] for r in curve.collect()}
    assert pts[picked] == 1.0
    # minimality: every smaller measured nprobe misses the target
    assert all(rec < 1.0 for np_, rec in pts.items() if np_ < picked)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 11).head()["embedding"]
    ]
    # recall 1.0 over the query set means every query's top-k id set is
    # exact, so the autotuned search returns exactly the exact rows
    tuned = idx.search(qv, k=5, target_recall=1.0, recall_curve=curve)
    exact = idx.exact_search(qv, k=5)
    assert sorted(map(tuple, tuned.collect())) == sorted(
        map(tuple, exact.collect())
    )
    with pytest.raises(ValueError, match="recall_curve"):
        idx.search(qv, k=5, target_recall=0.9)
