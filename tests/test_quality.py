"""Data-quality operators (operators/quality.py)."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.quality import (
    apply_expectations,
    expectations_report,
    write_observed,
)

def _rules():
    return {
        "pos": F.col("v") > 0,
        "named": F.col("name").isNotNull(),
    }


def _df(spark):
    return spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, "b"), (3, 2.0, None), (4, -3.0, None)],
        "id long, v double, name string",
    )


def test_split_partitions_rows_and_names_violations(spark):
    valid, bad = apply_expectations(_df(spark), _rules())
    assert [r["id"] for r in valid.collect()] == [1]
    got = {r["id"]: r["violations"] for r in bad.collect()}
    assert got == {
        2: ["pos"],
        3: ["named"],
        4: ["pos", "named"],  # rule definition order preserved
    }
    assert valid.columns == ["id", "v", "name"]  # original schema


def test_null_rule_result_is_a_violation(spark):
    df = spark.createDataFrame(
        [(1, None)], "id long, v double"
    )
    valid, bad = apply_expectations(df, {"pos": F.col("v") > 0})
    assert valid.count() == 0
    assert bad.head()["violations"] == ["pos"]


def test_report_counts_match_split(spark):
    rep = {
        r["rule"]: (r["n_violations"], r["n_rows"])
        for r in expectations_report(_df(spark), _rules()).collect()
    }
    assert rep == {"pos": (2, 4), "named": (2, 4)}


def test_write_observed_returns_metrics_from_the_write(spark, tmp_path):
    df = _df(spark)
    out = str(tmp_path / "audit")
    m = write_observed(
        df,
        out,
        metrics={
            "n_null_names": F.sum(
                F.when(F.col("name").isNull(), 1).otherwise(0)
            ).cast("long"),
            "v_cents": F.sum(F.round(F.col("v") * 100).cast("long")),
        },
    )
    assert m["n_rows"] == 4
    assert m["n_null_names"] == 2
    assert m["v_cents"] == 300
    back = spark.read.parquet(out)
    assert back.count() == 4
