"""footer_stats (sources/stats.py): the aggregate must be answered by
the V2 scan's PushedAggregation, and the conf flip must not leak."""

from distributed_vector_database_spark.sources.stats import footer_stats
from tests.conftest import SF_SMOKE


def test_aggregates_are_pushed_to_the_scan(spark):
    row, plan = footer_stats(
        spark, f"{SF_SMOKE}/lineitem.parquet", ["l_orderkey"]
    )
    assert "PushedAggregation: [MIN(l_orderkey), MAX(l_orderkey), COUNT(*)]" in plan
    assert "BatchScan" in plan


def test_values_match_full_scan(spark):
    from pyspark.sql import functions as F

    row, _ = footer_stats(
        spark, f"{SF_SMOKE}/lineitem.parquet", ["l_orderkey"]
    )
    df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    exp = df.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.count("*")
    ).head()
    assert (row["min_l_orderkey"], row["max_l_orderkey"], row["cnt"]) == (
        exp[0],
        exp[1],
        exp[2],
    )


def test_conf_scope_is_restored(spark):
    before = (
        spark.conf.get("spark.sql.sources.useV1SourceList", None),
        spark.conf.get("spark.sql.parquet.aggregatePushdown", None),
    )
    footer_stats(spark, f"{SF_SMOKE}/lineitem.parquet", ["l_orderkey"])
    after = (
        spark.conf.get("spark.sql.sources.useV1SourceList", None),
        spark.conf.get("spark.sql.parquet.aggregatePushdown", None),
    )
    assert before == after
    # and a subsequent plain read still plans the V1 scan
    df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").groupBy().count()
    from distributed_vector_database_spark.plans.inspect import plan_text

    assert "BatchScan" not in plan_text(df)
