"""Unit tests for IVF shard rebalancing (ivf.shard_split_plan /
split_hot_shards) — the oracle query covers the end-to-end value contract;
these cover the operator semantics directly."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ivf import (
    shard_split_plan,
    split_hot_shards,
)


def _assigned(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, shard_id int, embedding array<double>"
    )


def test_split_partitions_hot_shard_on_widest_dim(spark):
    # shard 0: 4 members, widest spread on dim 2 (values 0..9); cap=3
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [0.1, 3.0]),
        (3, 0, [0.2, 6.0]),
        (4, 0, [0.3, 9.0]),
        (5, 1, [5.0, 5.0]),
    ]
    a = _assigned(spark, rows)
    plan = shard_split_plan(a, cap=3, next_shard_id=2)
    p = plan.head()
    assert p["shard_id"] == 0 and p["n_vecs"] == 4
    assert p["split_dim"] == 2  # spread 9.0 beats 0.3
    assert p["mid_mic"] == (0 + 9_000_000) / 2.0
    assert p["right_id"] == 2

    out = {
        r["vec_id"]: (r["old_shard"], r["new_shard"])
        for r in split_hot_shards(a, plan).collect()
    }
    assert out == {
        1: (0, 0),  # 0.0 <= 4.5
        2: (0, 0),  # 3.0 <= 4.5
        3: (0, 2),  # 6.0 > 4.5 -> right
        4: (0, 2),
        5: (1, 1),  # cold shard passes through
    }


def test_split_tie_breaks_lowest_dim_and_numbers_rights_in_order(spark):
    # two hot shards, equal spread on both dims -> split_dim = 1 for both;
    # right ids number from next_shard_id in shard order
    rows = [
        (i, s, [float(i % 2), float(i % 2)])
        for s in (3, 7)
        for i in range(s * 10, s * 10 + 4)
    ]
    a = _assigned(spark, rows)
    plan = {
        r["shard_id"]: r
        for r in shard_split_plan(a, cap=3, next_shard_id=8).collect()
    }
    assert set(plan) == {3, 7}
    assert plan[3]["split_dim"] == 1 and plan[7]["split_dim"] == 1
    assert plan[3]["right_id"] == 8 and plan[7]["right_id"] == 9


def test_degenerate_identical_shard_splits_nothing(spark):
    rows = [(i, 0, [1.0, 1.0]) for i in range(5)]
    a = _assigned(spark, rows)
    plan = shard_split_plan(a, cap=3, next_shard_id=1)
    out = split_hot_shards(a, plan)
    # mid == the single value -> everything stays left
    assert out.filter(F.col("new_shard") != F.col("old_shard")).count() == 0
    assert out.count() == 5


def test_no_hot_shards_is_identity(spark):
    rows = [(1, 0, [1.0]), (2, 1, [2.0])]
    a = _assigned(spark, rows)
    plan = shard_split_plan(a, cap=10, next_shard_id=2)
    assert plan.count() == 0
    out = split_hot_shards(a, plan)
    assert out.filter(F.col("new_shard") != F.col("old_shard")).count() == 0


def test_rebalance_preserves_membership_and_caps_shrink(embeddings, spark):
    from distributed_vector_database_spark.operators.ivf import assign_shards

    cents = [
        [float(x) for x in r["embedding"]]
        for r in embeddings.filter(F.col("vec_id") < 4)
        .orderBy("vec_id")
        .collect()
    ]
    a = assign_shards(embeddings, cents)
    before = a.groupBy("shard_id").count().toPandas()
    cap = int(before["count"].max()) - 1  # force at least one split
    plan = shard_split_plan(a, cap=cap, next_shard_id=4)
    assert plan.count() >= 1
    out = split_hot_shards(a, plan)
    # every vector exactly once, and every split shard got strictly smaller
    assert out.count() == embeddings.count()
    after = {
        r["new_shard"]: r["n"]
        for r in out.groupBy("new_shard").agg(F.count("*").alias("n")).collect()
    }
    for r in plan.collect():
        assert after[r["shard_id"]] < r["n_vecs"]
