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
