"""transformWithStateInPandas operator (streaming/events.py): runs the
full replay ≡ batch proof when protobuf (the transformWithState worker
protocol) is installed; otherwise asserts the guided ImportError so the
gate itself stays covered."""

import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_vector_database_spark.streaming.events import (
    _tws_available,
    stateful_user_totals_tws,
)

_HAVE_TWS = _tws_available()


def test_gate_raises_with_guidance_when_unavailable(spark):
    if _HAVE_TWS:
        pytest.skip("protobuf present; gate not reachable")
    src = spark.createDataFrame(
        [(1, 1, 1.0)], "event_id long, user_id long, value double"
    )
    with pytest.raises(ImportError, match="applyInPandasWithState"):
        stateful_user_totals_tws(src)


@pytest.mark.skipif(not _HAVE_TWS, reason="protobuf not installed")
def test_tws_replay_equals_batch(spark):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = spark.createDataFrame(
        [(i, i % 5, float(i) / 4) for i in range(100)],
        "event_id long, user_id long, value double",
    )
    d = tempfile.mkdtemp(prefix="dvdb_tws_")
    src.coalesce(3).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stateful_user_totals_tws(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = spark.table("tws_test")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        res.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    exp = src.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "total_cents"
        ),
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, exp.collect())
    )
