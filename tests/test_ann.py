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
