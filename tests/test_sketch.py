"""KMV sketch and hash-sampling unit fixtures."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.sketch import (
    hash_fraction,
    hash_sample,
    kmv_distinct,
)


def test_kmv_exact_below_k(spark):
    """Groups with <= k distinct keys report the EXACT distinct count."""
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(30)],
        "g string, key long",
    )
    got = {
        r["g"]: r["kmv_distinct"]
        for r in kmv_distinct(df, "key", group_cols=["g"], k=64).collect()
    }
    assert got == {"a": 7, "b": 3}


def test_kmv_estimates_above_k(spark):
    """Above k the estimate is approximate but within the ~1/sqrt(k) band."""
    n = 2000
    df = spark.createDataFrame([(i,) for i in range(n)], "key long")
    est = kmv_distinct(df, "key", k=64).head()["kmv_distinct"]
    assert abs(est - n) / n < 0.5  # 64-hash sketch: loose but sane band
    # deterministic: re-run gives the identical estimate
    est2 = kmv_distinct(df, "key", k=64).head()["kmv_distinct"]
    assert est == est2


def test_hash_fraction_range_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "key long")
    rows = df.select(hash_fraction("key").alias("h")).collect()
    assert all(0.0 <= r["h"] < 1.0 for r in rows)
    frac = df.filter(hash_fraction("key") < 0.2).count() / 500
    assert 0.1 < frac < 0.3  # roughly uniform


def test_hash_sample_stable_across_tables(spark):
    """The same key samples identically wherever it appears (join-stable)."""
    a = spark.createDataFrame([(i, "x") for i in range(300)], "key long, p string")
    b = spark.createDataFrame([(i, 1.5) for i in range(300)], "key long, v double")
    ka = {r["key"] for r in hash_sample(a, "key", 0.15).collect()}
    kb = {r["key"] for r in hash_sample(b, "key", 0.15).collect()}
    assert ka == kb and 10 < len(ka) < 90
