"""Interchange-format round-trip fidelity (sources/formats.py)."""

import tempfile

import pytest
from pyspark.sql import Row, functions as F

from distributed_vector_database_spark.sources.formats import roundtrip


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_adversarial_text_survives(spark, fmt):
    rows = [
        Row(id=1, text='comma, "quoted", done'),
        Row(id=2, text="line\nbreak\tand tab"),
        Row(id=3, text=""),
        Row(id=4, text=None),
        Row(id=5, text="unicode: ünïcödé ☃"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    with tempfile.TemporaryDirectory() as d:
        back = roundtrip(df, fmt, f"{d}/t")
        got = {r["id"]: r["text"] for r in back.collect()}
    exp = {r.id: r.text for r in rows}
    # CSV cannot distinguish NULL from empty string (both serialize to an
    # empty field) — that is inherent to the format, normalize both sides.
    if fmt == "csv":
        got = {k: (v or None) for k, v in got.items()}
        exp = {k: (v or None) for k, v in exp.items()}
    assert got == exp


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_microsecond_timestamps_survive(spark, fmt):
    df = spark.sql(
        "SELECT 1 AS id, timestamp'2024-02-29 23:59:59.123456' AS ts"
    )
    with tempfile.TemporaryDirectory() as d:
        back = roundtrip(df, fmt, f"{d}/t")
        assert back.head()["ts"] == df.head()["ts"]


def test_doubles_roundtrip_exactly(spark, embeddings):
    # float64 values must survive text serialization bit-for-bit
    df = embeddings.limit(50).select(
        "vec_id", F.element_at(F.col("embedding").cast("array<double>"), 1).alias("x")
    )
    with tempfile.TemporaryDirectory() as d:
        back = roundtrip(df, "csv", f"{d}/t")
        got = {r["vec_id"]: r["x"] for r in back.collect()}
    for r in df.collect():
        assert got[r["vec_id"]] == r["x"]


def test_bad_format_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        roundtrip(df, "xml", "/tmp/never")
