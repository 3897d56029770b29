"""Approximate nearest-neighbor search operators.

Three physical strategies over an ``array<float>`` embedding column:

  1. brute force — exact: operators/topk.py (baseline & small corpora);
  2. IVF — centroid-pruned: operators/ivf.py (the reference's own strategy,
     `reference: src/compute_server.py:110` + report p.2);
  3. sign-LSH (this module) — random-hyperplane buckets (Charikar's SimHash
     for cosine): bucket = sign bits of dot(v, plane_j). Indexing is a
     narrow projection (planes are broadcast literals); search reads ONE
     bucket. At 100 TB: write the corpus ``partitionBy("bucket")`` (or
     bucketBy for joins) so a query is a partition-pruned scan of
     |corpus| / 2^bits rows, and batch queries group by bucket.

Recall tuning: more planes -> smaller buckets -> lower recall per probe;
``multiprobe`` flips each bit once (Hamming-1 neighbors) to recover recall
without re-indexing — the same trade the reference exposes as
``shards_to_search`` (`reference: src/compute_server.py:63`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.vector import dot
from distributed_vector_database_spark.operators.topk import topk

__all__ = [
    "random_hyperplanes",
    "lsh_bucket",
    "lsh_index",
    "lsh_search",
    "binary_topk",
    "binary_rerank_topk",
    "matryoshka_rerank_topk",
    "knn_graph",
    "knn_graph_lsh",
]


def random_hyperplanes(dim: int, n_planes: int = 8, seed: int = 42):
    """Seeded Gaussian hyperplanes for production indexes (tests inject
    data-derived planes so the oracle can reproduce them in SQL)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(
    vector_col: Column | str, planes: Sequence[Sequence[float]]
) -> Column:
    """Bucket id = concatenated sign bits of dot(v, plane_j), e.g. '10110010'.

    JVM-side only: the plane matrix enters the plan as a literal
    array<array<double>>; no shuffle, no Python.
    """
    plane_exprs = [
        F.array(*[F.lit(float(x)) for x in p]).cast("array<double>")
        for p in planes
    ]
    bits = [
        F.when(dot(vector_col, p) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in plane_exprs
    ]
    return F.concat(*bits)


def lsh_index(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    *,
    vector_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Add the LSH bucket column. Persist with ``partitionBy(bucket_col)``
    to make every search a partition-pruned scan."""
    return df.withColumn(bucket_col, lsh_bucket(F.col(vector_col), planes))


def _bucket_of(query_vector: Sequence[float], planes) -> str:
    return "".join(
        "1"
        if sum(float(a) * float(b) for a, b in zip(query_vector, p)) >= 0
        else "0"
        for p in planes
    )


def lsh_search(
    indexed: DataFrame,
    planes: Sequence[Sequence[float]],
    query_vector: Sequence[float],
    k: int = 5,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str = "bucket",
    metric: str = "cosine",
    multiprobe: bool = False,
) -> DataFrame:
    """Top-k within the query's bucket (plus Hamming-1 buckets when
    ``multiprobe``). May return fewer than k rows — ANN semantics."""
    qb = _bucket_of(query_vector, planes)
    buckets = [qb]
    if multiprobe:
        for i in range(len(qb)):
            flipped = qb[:i] + ("0" if qb[i] == "1" else "1") + qb[i + 1 :]
            buckets.append(flipped)
    cand = indexed.filter(F.col(bucket_col).isin(buckets))
    return topk(
        cand, query_vector, k, vector_col=vector_col, id_col=id_col, metric=metric
    )


def binary_topk(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by bit-packed sign (binary) quantization: rank the corpus by
    Hamming distance between 1-bit sign codes — the cheapest rung of the
    quantization ladder (32x smaller than float32, distance = XOR +
    popcount, no codebook).

    Returns (id_col, hamming) ordered by (hamming ASC, id ASC). The plan
    is a pruned scan + codegen'd bit ops + TakeOrderedAndProject: at
    100 TB, persist the packed codes as their own skinny column (2 BIGINTs
    for 64-d) and this runs at column-scan speed with no shuffle. Exact
    ties (hamming is integral) make the cut deterministic with the id
    tie-break.
    """
    from distributed_vector_database_spark.functions.quantize import (
        hamming_distance,
        sign_pack,
        sign_pack_vector,
    )

    dim = len(query_vector)
    q = F.array(
        *[F.lit(int(w)).cast("long") for w in sign_pack_vector(query_vector)]
    )
    scored = df.select(
        F.col(id_col),
        hamming_distance(sign_pack(F.col(vector_col), dim), q).alias(
            "hamming"
        ),
    )
    return scored.orderBy(F.asc("hamming"), F.asc(id_col)).limit(k)


def binary_rerank_topk(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    *,
    shortlist: int = 50,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """Two-stage binary search: Hamming shortlist over sign codes, then
    exact re-rank of the ``shortlist`` survivors in full precision — the
    standard compressed-domain recall recovery (same shape as PQ's ADC +
    re-rank, with an even cheaper first stage).

    Returns (id_col, score, rank). Stage 1 never touches the float
    vectors; stage 2 rescores only ``shortlist`` rows via a semi-join on
    id, so the full-precision column is read for O(shortlist) rows.
    """
    from distributed_vector_database_spark.functions.vector import round_score
    from distributed_vector_database_spark.operators.topk import (
        _order,
        score_column,
    )
    from pyspark.sql import Window

    short = binary_topk(
        df, query_vector, shortlist, vector_col=vector_col, id_col=id_col
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vector]).cast(
        "array<double>"
    )
    cand = df.join(
        F.broadcast(short.select(id_col)), on=id_col, how="left_semi"
    )
    score = round_score(score_column(metric, F.col(vector_col), qv), 6)
    scored = cand.select(F.col(id_col), score.alias("score"))
    w = Window.orderBy(*_order(metric, F.col("score"), F.col(id_col)))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )


def matryoshka_rerank_topk(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    *,
    prefix_dim: int = 16,
    shortlist: int = 50,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka (truncated-dimension) two-stage search: shortlist by
    cosine over the first ``prefix_dim`` dimensions, then re-rank the
    survivors in full precision — the MRL serving pattern (Kusupati et
    al. 2022): embeddings trained front-loaded let the coarse stage read
    a prefix_dim/dim fraction of the vector bytes.

    Returns (id_col, score, rank), rank 1..k by full-precision cosine.
    Stage 1 is the same pruned-scan + TakeOrdered plan as ``topk`` but on
    ``slice(vec, 1, prefix_dim)``; at 100 TB, store the prefix as its own
    column (or leading PQ subspaces) so the scan reads prefix bytes only.
    Both stages' cuts order by (rounded score, id) — deterministic.
    """
    from distributed_vector_database_spark.functions.vector import round_score
    from distributed_vector_database_spark.operators.topk import (
        _order,
        score_column,
        topk,
    )
    from pyspark.sql import Window

    prefixed = df.select(
        F.col(id_col),
        F.col(vector_col),
        F.slice(F.col(vector_col).cast("array<double>"), 1, prefix_dim).alias(
            "_prefix"
        ),
    )
    short = topk(
        prefixed,
        [float(x) for x in query_vector[:prefix_dim]],
        shortlist,
        vector_col="_prefix",
        id_col=id_col,
        metric="cosine",
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vector]).cast(
        "array<double>"
    )
    cand = df.join(
        F.broadcast(short.select(id_col)), on=id_col, how="left_semi"
    )
    score = round_score(score_column("cosine", F.col(vector_col), qv), 6)
    scored = cand.select(F.col(id_col), score.alias("score"))
    w = Window.orderBy(*_order("cosine", F.col("score"), F.col(id_col)))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """Exact k-nearest-neighbor graph over the corpus: for every vector,
    its k most similar OTHER vectors — the substrate for SemDeDup-style
    cluster dedup, graph-based label propagation, and kNN classifiers.

    Runs as one ``batch_topk`` job with the corpus itself as the query
    batch: per-partition Arrow GEMM top-(k+1), then a window merge over
    the O(partitions*k*|V|) survivors — never an unreduced |V|^2 shuffle.
    The +1 over-fetch absorbs the self-match, which is then dropped and
    ranks recomputed.

    Exact all-pairs is O(|V|^2) compute by definition; at 100 TB scope the
    query side to the slice you need neighbors for, or generate candidate
    pairs with the LSH buckets / IVF cells in this package and use this
    kernel per-bucket.
    """
    from distributed_vector_database_spark.operators.topk import (
        _order,
        batch_topk,
    )
    from pyspark.sql import Window

    queries = df.select(
        F.col(id_col).alias("query_id"),
        F.col(vector_col).cast("array<double>").alias("query_vector"),
    )
    res = batch_topk(
        df,
        queries,
        k + 1,
        vector_col=vector_col,
        id_col=id_col,
        metric=metric,
    ).filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(
        *_order(metric, F.col("score"), F.col(id_col))
    )
    return (
        res.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def knn_graph_lsh(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    k: int = 5,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate kNN graph: candidates come from sign-LSH buckets, so
    total pair work is sum_b m_b^2 (bounded by bucket size) instead of
    `knn_graph`'s |V|^2 — the scale path the exact graph's docstring
    points at (measured: exact graph 58x slower on 10x rows; this stays
    near-linear while buckets stay bounded).

    Entirely JVM-side relational: bucket projection (plane matrix is a
    plan literal, no shuffle) -> ONE equi-self-join on the bucket key ->
    inline cosine/euclidean in whole-stage codegen -> per-query rank
    window. No Python in the path; Catalyst/AQE size the bucket shuffle.

    ``multiprobe`` also probes every Hamming-1 bucket of each query row
    (planes+1 probe keys per row), recovering neighbors that fall just
    across one hyperplane — recall knob without re-indexing. Probe keys
    are distinct per query row and each candidate has ONE bucket, so no
    pair is generated twice (no dedup shuffle needed).

    ANN semantics: a row alone in its probe set yields no edges; rows may
    get fewer than k neighbors. Same output shape as `knn_graph`
    (query_id, id, score, rank) so triangle/2-hop consumers swap in
    directly.
    """
    from pyspark.sql import Window

    from distributed_vector_database_spark.functions.vector import (
        cosine_similarity,
        euclidean_distance,
        round_score,
    )
    from distributed_vector_database_spark.operators.topk import _order

    bucket = lsh_bucket(F.col(vector_col), planes)
    if multiprobe:
        n_bits = len(planes)
        # the row's own bucket + each Hamming-1 flip, as ONE array column
        probes = F.array(
            bucket,
            *[
                F.concat(
                    F.substring(bucket, 1, i),
                    F.when(
                        F.substring(bucket, i + 1, 1) == "1", F.lit("0")
                    ).otherwise(F.lit("1")),
                    F.substring(bucket, i + 2, n_bits - i - 1),
                )
                for i in range(n_bits)
            ],
        )
    else:
        probes = F.array(bucket)
    q = df.select(
        F.col(id_col).alias("query_id"),
        F.col(vector_col).cast("array<double>").alias("_qv"),
        F.explode(probes).alias("_probe"),
    )
    c = df.select(
        F.col(id_col),
        F.col(vector_col).cast("array<double>").alias("_cv"),
        lsh_bucket(F.col(vector_col), planes).alias("_bucket"),
    )
    score = (
        cosine_similarity("_qv", "_cv")
        if metric == "cosine"
        else euclidean_distance("_qv", "_cv")
    )
    pairs = (
        q.join(c, q["_probe"] == c["_bucket"])
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, round_score(score).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        *_order(metric, F.col("score"), F.col(id_col))
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )
