"""Dynamic partition pruning (dpp_hot_shard_scan): the fact scan's
partition filter must be a runtime dynamicpruning subquery derived from
the stats-table filter, and the result must equal the statically-pruned
equivalent."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.queries import (
    _dpp_layout_dir,
    registry,
)
from tests.conftest import SF_SMOKE


def test_plan_carries_dynamicpruning_subquery(spark):
    fn, _sql = registry()["dpp_hot_shard_scan"]
    df = fn(spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan, plan
    assert "PartitionFilters" in plan


def test_matches_static_shard_filter(spark):
    d = _dpp_layout_dir(spark, SF_SMOKE)
    fact = spark.read.parquet(f"{d}/fact")
    stats = spark.read.parquet(f"{d}/shard_stats")
    thr = 1.05 * stats.agg(F.avg("n_vecs")).head()[0]
    hot_ids = [
        r["shard_id"]
        for r in stats.filter(F.col("n_vecs") > thr).collect()
    ]
    assert 0 < len(hot_ids) < stats.count()  # a real, proper subset
    fn, _sql = registry()["dpp_hot_shard_scan"]
    dyn = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    static = {
        tuple(r)
        for r in (
            fact.filter(F.col("shard_id").isin(hot_ids))
            .groupBy(F.col("shard_id").cast("long").alias("shard_id"))
            .agg(
                F.count("*").alias("n_vectors"),
                F.sum(
                    F.round(
                        F.sqrt(
                            F.aggregate(
                                F.transform(
                                    F.col("embedding").cast("array<double>"),
                                    lambda x: x * x,
                                ),
                                F.lit(0.0),
                                lambda a, x: a + x,
                            )
                        )
                        * F.lit(1e6)
                    ).cast("long")
                ).alias("norm_mic_sum"),
            )
        ).collect()
    }
    assert dyn == static
