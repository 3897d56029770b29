"""Product-quantization operator tests (operators/pq.py).

Semantics: per-subspace squared-L2 argmin encode (first-min tie-break),
lossy decode by codeword concatenation, ADC search from codes alone.
Cross-checked against numpy and against exact search for recall.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.pq import (
    codebooks_from_rows,
    fit_pq_codebooks,
    pq_adc_lut,
    pq_adc_topk,
    pq_decode,
    pq_encode,
    pq_encode_arrow,
)
from distributed_vector_database_spark.operators.topk import topk
from distributed_vector_database_spark.operators.eval import recall_at_k
from distributed_vector_database_spark.functions.vector import (
    euclidean_distance,
)


@pytest.fixture(scope="module")
def books(embeddings):
    rows = (
        embeddings.filter(F.col("vec_id") < 16)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return codebooks_from_rows([[float(x) for x in r[0]] for r in rows], m=8)


def _np_encode(X, books):
    m, sub = len(books), len(books[0][0])
    C = [np.asarray(b, dtype=np.float64) for b in books]
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        d2 = ((S[:, None, :] - C[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = d2.argmin(1)
    return codes


def test_encode_matches_numpy(spark, embeddings, books):
    sample = embeddings.orderBy("vec_id").limit(50)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in sample.select(
            "vec_id", pq_encode("embedding", books).alias("codes")
        ).collect()
    }
    rows = sample.select("vec_id", "embedding").collect()
    X = np.asarray([[float(x) for x in r["embedding"]] for r in rows])
    exp = _np_encode(X, books)
    for i, r in enumerate(rows):
        assert got[r["vec_id"]] == list(exp[i])


def test_arrow_path_equals_expression_path(spark, embeddings, books):
    expr = {
        r["vec_id"]: list(r["codes"])
        for r in embeddings.select(
            "vec_id", pq_encode("embedding", books).alias("codes")
        ).collect()
    }
    arrow = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode_arrow(embeddings, books).collect()
    }
    assert expr == arrow


def test_decode_error_bounded_by_worst_codeword(spark, embeddings, books):
    # reconstruction can never be worse than the farthest codeword choice;
    # sanity bound: err^2 <= sum_j max_c ||s_j - c||^2 and err >= 0
    enc = embeddings.select(
        F.col("embedding").cast("array<double>").alias("e"),
        pq_encode("embedding", books).alias("codes"),
    )
    errs = enc.select(
        euclidean_distance("e", pq_decode("codes", books)).alias("err")
    ).agg(F.min("err"), F.max("err")).head()
    assert errs[0] >= 0.0
    assert errs[1] < 10.0  # unit-ish 64-d embeddings: loose sanity ceiling


def test_fit_is_deterministic_and_improves_on_arbitrary_books(
    spark, embeddings
):
    f1 = fit_pq_codebooks(embeddings, m=8, k=16, sample_n=256, iters=5)
    f2 = fit_pq_codebooks(embeddings, m=8, k=16, sample_n=256, iters=5)
    assert f1 == f2  # deterministic sample + init + iterations

    rows = (
        embeddings.filter(F.col("vec_id") < 16)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    naive = codebooks_from_rows(
        [[float(x) for x in r[0]] for r in rows], m=8
    )

    def mean_err(bk):
        enc = embeddings.select(
            F.col("embedding").cast("array<double>").alias("e"),
            pq_encode("embedding", bk).alias("codes"),
        )
        return enc.select(
            euclidean_distance("e", pq_decode("codes", bk)).alias("err")
        ).agg(F.avg("err")).head()[0]

    assert mean_err(f1) < mean_err(naive)  # k-means beats raw-row codebooks


def test_adc_topk_recall_vs_exact(spark, embeddings):
    # finer subspaces -> better recall (m=32 over 64-d: 2-d subquantizers)
    books = fit_pq_codebooks(embeddings, m=32, k=16, sample_n=512, iters=8)
    enc = pq_encode_arrow(embeddings, books).select("vec_id", "codes").cache()
    qv = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 3)
        .select("embedding")
        .head()[0]
    ]
    approx = pq_adc_topk(enc, books, qv, k=10)
    exact = topk(embeddings, qv, k=10, metric="euclidean")
    r = recall_at_k(approx, exact, id_col="vec_id").head()["recall"]
    assert r >= 0.5, f"ADC recall@10 {r} too low"
    # the query's own row must be the nearest code
    assert approx.head()["vec_id"] == 3
    enc.unpersist()


def test_adc_score_matches_python_lut(spark, embeddings, books):
    qv = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    ]
    lut = pq_adc_lut(qv, books)
    enc_rows = (
        embeddings.orderBy("vec_id")
        .limit(20)
        .select("vec_id", pq_encode("embedding", books).alias("codes"))
        .collect()
    )
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_topk(
            embeddings.orderBy("vec_id")
            .limit(20)
            .select(
                "vec_id", pq_encode("embedding", books).alias("codes")
            ),
            books,
            qv,
            k=20,
        ).collect()
    }
    for r in enc_rows:
        exp = sum(lut[j][c] for j, c in enumerate(r["codes"]))
        assert got[r["vec_id"]] == pytest.approx(round(exp, 6), abs=1e-6)


def test_bad_shapes_raise():
    with pytest.raises(ValueError):
        codebooks_from_rows([[1.0, 2.0, 3.0]], m=2)  # 3 % 2 != 0
    with pytest.raises(ValueError):
        pq_encode("v", [[[1.0]], [[1.0], [2.0]]])  # ragged


def test_batch_adc_equals_single_query_loop(spark, embeddings, books):
    from distributed_vector_database_spark.operators.pq import (
        pq_adc_batch_topk,
        pq_encode_arrow,
    )

    enc = pq_encode_arrow(embeddings, books).select("vec_id", "codes").cache()
    qids = [3, 47, 200]
    queries = [
        (
            qid,
            [
                float(x)
                for x in embeddings.filter(F.col("vec_id") == qid)
                .select("embedding")
                .head()[0]
            ],
        )
        for qid in qids
    ]
    batch = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"])
        for r in pq_adc_batch_topk(enc, books, queries, k=7).collect()
    }
    for qid, vec in queries:
        single = pq_adc_topk(enc, books, vec, k=7).collect()
        for rank, r in enumerate(single, start=1):
            assert batch[(qid, rank)] == (r["vec_id"], r["adc_dist"]), (
                qid,
                rank,
            )
    enc.unpersist()


def test_codebooks_save_load_roundtrip(spark, books, tmp_path):
    from distributed_vector_database_spark.operators.pq import (
        load_codebooks,
        save_codebooks,
    )

    d = str(tmp_path / "idx")
    save_codebooks(spark, books, d)
    loaded = load_codebooks(spark, d)
    assert loaded == [[list(c) for c in b] for b in books]
    with pytest.raises(Exception):  # Spark AnalysisException: path not found
        load_codebooks(spark, str(tmp_path / "empty"), subdir="_nope")


def test_adc_gather_method_equals_expr(spark, embeddings, books):
    from distributed_vector_database_spark.operators.pq import (
        pq_encode_arrow,
    )

    enc = pq_encode_arrow(embeddings, books).select("vec_id", "codes")
    qv = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 11)
        .select("embedding")
        .head()[0]
    ]
    expr = [tuple(r) for r in pq_adc_topk(enc, books, qv, k=12).collect()]
    gather = [
        tuple(r)
        for r in pq_adc_topk(enc, books, qv, k=12, method="gather").collect()
    ]
    assert expr == gather
    with pytest.raises(ValueError):
        pq_adc_topk(enc, books, qv, method="nope")


# ---------------------------------------------------------------------------
# Residual IVF-PQ (IVFADC proper): codes quantize vector - routing centroid;
# search re-expresses the query per probed cell (per-shard LUTs).
# ---------------------------------------------------------------------------

from distributed_vector_database_spark.operators.ivf import (  # noqa: E402
    assign_shards,
    fit_centroids,
)
from distributed_vector_database_spark.operators.pq import (  # noqa: E402
    ivfpq_residual_luts,
    ivfpq_residual_topk,
    residual_col,
)


@pytest.fixture(scope="module")
def cents(embeddings):
    rows = (
        embeddings.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def test_residual_col_matches_numpy(spark, embeddings, cents):
    got = (
        assign_shards(embeddings, cents)
        .select("vec_id", "shard_id", "embedding",
                residual_col("embedding", "shard_id", cents).alias("r"))
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    C = np.asarray(cents)
    for row in got:
        x = np.asarray([float(v) for v in row["embedding"]])
        exp = x - C[row["shard_id"]]
        np.testing.assert_allclose(np.asarray(row["r"]), exp, rtol=0, atol=0)


def test_residual_full_probe_matches_numpy_adc(spark, embeddings, cents, books):
    # nprobe = num_shards -> every cell scored; cross-check distances + order
    # against a pure-numpy IVFADC implementation
    assigned = assign_shards(embeddings, cents)
    enc = assigned.select(
        "vec_id", "shard_id",
        pq_encode(residual_col("embedding", "shard_id", cents), books)
        .alias("codes"),
    ).cache()
    qv = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 7)
        .select("embedding").head()[0]
    ]
    got = ivfpq_residual_topk(
        enc, cents, books, qv, k=10, nprobe=len(cents)
    ).collect()

    rows = assigned.select("vec_id", "shard_id", "embedding").collect()
    C = np.asarray(cents)
    luts = np.asarray(ivfpq_residual_luts(qv, cents, books))  # S x m x k
    m, sub = len(books), len(books[0][0])
    exp = []
    for r in rows:
        x = np.asarray([float(v) for v in r["embedding"]])
        res = x - C[r["shard_id"]]
        codes = _np_encode(res[None, :], books)[0]
        d = sum(luts[r["shard_id"], j, codes[j]] for j in range(m))
        exp.append((round(d, 6), r["vec_id"]))
    exp.sort()
    assert [(g["adc_dist"], g["vec_id"]) for g in got] == exp[:10]
    enc.unpersist()


def test_residual_beats_plain_pq_reconstruction(spark, embeddings):
    # At identical code bits (m=8, k=16), quantizing residuals against
    # fitted centroids must reconstruct better than quantizing raw vectors
    # (the IVFADC rationale): compare mean ||x - x_hat||.
    cents = fit_centroids(embeddings, 8, seed=7)
    assigned = assign_shards(embeddings, cents).select(
        "vec_id",
        "shard_id",
        F.col("embedding").cast("array<double>").alias("e"),
        residual_col("embedding", "shard_id", cents).alias("r"),
    ).cache()

    plain_books = fit_pq_codebooks(
        assigned.select("vec_id", F.col("e").alias("embedding")),
        m=8, k=16, sample_n=512, iters=8,
    )
    res_books = fit_pq_codebooks(
        assigned.select("vec_id", F.col("r").alias("embedding")),
        m=8, k=16, sample_n=512, iters=8,
    )

    plain_err = (
        assigned.select(
            euclidean_distance(
                "e", pq_decode(pq_encode("e", plain_books), plain_books)
            ).alias("err")
        ).agg(F.avg("err")).head()[0]
    )
    # residual reconstruction: centroid + decoded residual
    cents_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
        for c in cents
    ])
    recon = F.zip_with(
        F.element_at(cents_lit, F.col("shard_id").cast("int") + 1),
        pq_decode(pq_encode("r", res_books), res_books),
        lambda c, d: c + d,
    )
    res_err = (
        assigned.select(euclidean_distance("e", recon).alias("err"))
        .agg(F.avg("err")).head()[0]
    )
    assigned.unpersist()
    assert res_err < plain_err, (res_err, plain_err)


# ---------------------------------------------------------------------------
# OPQ-style rotation: PCA + eigenvalue allocation fit, Catalyst matrix
# multiply, Householder fast path.
# ---------------------------------------------------------------------------

from distributed_vector_database_spark.operators.pq import (  # noqa: E402
    fit_opq_rotation,
    householder_rotation,
    rotate_col,
)


def test_opq_rotation_is_orthogonal_and_deterministic(spark, embeddings):
    R1 = fit_opq_rotation(embeddings, m=8, sample_n=512)
    R2 = fit_opq_rotation(embeddings, m=8, sample_n=512)
    assert R1 == R2
    R = np.asarray(R1)
    np.testing.assert_allclose(R @ R.T, np.eye(64), atol=1e-9)


def test_rotate_col_matches_numpy(spark, embeddings):
    R = fit_opq_rotation(embeddings, m=8, sample_n=256)
    got = (
        embeddings.orderBy("vec_id")
        .limit(20)
        .select("vec_id", "embedding", rotate_col("embedding", R).alias("y"))
        .collect()
    )
    Rm = np.asarray(R)
    for r in got:
        x = np.asarray([float(v) for v in r["embedding"]])
        np.testing.assert_allclose(
            np.asarray(r["y"]), Rm @ x, rtol=1e-12, atol=1e-12
        )
        # orthogonal rotation preserves the norm
        assert abs(np.linalg.norm(r["y"]) - np.linalg.norm(x)) < 1e-9


def test_householder_matrix_equals_fast_path(spark, embeddings):
    H = householder_rotation(64)
    Hm = np.asarray(H)
    np.testing.assert_allclose(Hm @ Hm.T, np.eye(64), atol=1e-12)
    got = (
        embeddings.orderBy("vec_id")
        .limit(10)
        .select("embedding", rotate_col("embedding", H).alias("y"))
        .collect()
    )
    for r in got:
        x = np.asarray([float(v) for v in r["embedding"]])
        exp = x - (2.0 / 64.0) * x.sum()
        np.testing.assert_allclose(np.asarray(r["y"]), exp, atol=1e-10)


def test_opq_rotation_improves_reconstruction(spark, embeddings):
    # PQ in the OPQ-rotated basis must reconstruct at least as well as PQ
    # in the raw basis at identical bits (the OPQ objective).
    R = fit_opq_rotation(embeddings, m=8, sample_n=512)
    rotated = embeddings.select(
        "vec_id", rotate_col("embedding", R).alias("embedding")
    ).cache()

    def mean_err(df):
        bk = fit_pq_codebooks(df, m=8, k=16, sample_n=512, iters=8)
        return (
            df.select(
                euclidean_distance(
                    F.col("embedding").cast("array<double>"),
                    pq_decode(pq_encode("embedding", bk), bk),
                ).alias("err")
            ).agg(F.avg("err")).head()[0]
        )

    raw = mean_err(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    opq = mean_err(rotated)
    rotated.unpersist()
    # rotation cannot hurt much and usually helps; assert no regression
    # beyond noise and record the typical improvement
    assert opq <= raw * 1.02, (opq, raw)


def test_residual_gather_method_equals_expr(spark, embeddings, cents, books):
    from distributed_vector_database_spark.operators.pq import (
        ivfpq_residual_batch_topk,
    )

    assigned = assign_shards(embeddings, cents)
    enc = assigned.select(
        "vec_id", "shard_id",
        pq_encode(residual_col("embedding", "shard_id", cents), books)
        .alias("codes"),
    ).cache()
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in embeddings.filter(F.col("vec_id").isin(3, 7)).collect()
    ]
    for _, qv in qs:
        expr = [
            (r["vec_id"], r["adc_dist"])
            for r in ivfpq_residual_topk(
                enc, cents, books, qv, k=10, nprobe=2, method="expr"
            ).collect()
        ]
        gather = [
            (r["vec_id"], r["adc_dist"])
            for r in ivfpq_residual_topk(
                enc, cents, books, qv, k=10, nprobe=2, method="gather"
            ).collect()
        ]
        assert expr == gather
    # batch form: one job, both queries, same per-query results
    batch = ivfpq_residual_batch_topk(
        enc, cents, books, qs, k=10, nprobe=2
    ).collect()
    for qid, qv in qs:
        single = [
            r["vec_id"]
            for r in ivfpq_residual_topk(
                enc, cents, books, qv, k=10, nprobe=2
            ).collect()
        ]
        got = [r["vec_id"] for r in sorted(
            (r for r in batch if r["query_id"] == qid),
            key=lambda r: r["rank"],
        )]
        assert got == single
    enc.unpersist()
