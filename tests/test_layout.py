"""Z-order layout tests (sources/layout.py)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.sources.layout import (
    save_zordered,
    zorder_file_ranges,
    zvalue,
)


def test_zvalue_interleaves_bits(spark):
    # z(a=0b11, b=0b01) = a bits at even positions, b bits at odd:
    #   a0=1 -> bit0, b0=1 -> bit1, a1=1 -> bit2, b1=0 -> bit3  => 0b0111
    row = spark.sql("SELECT 3 AS a, 1 AS b").select(
        zvalue("a", "b", bits=4).alias("z")
    ).head()
    assert row["z"] == 0b0111
    # masking: only the low `bits` bits participate
    row = spark.sql("SELECT 16 AS a, 0 AS b").select(
        zvalue("a", "b", bits=4).alias("z")
    ).head()
    assert row["z"] == 0
    with pytest.raises(ValueError):
        zvalue("a", "b", bits=0)


def test_zvalue_is_monotone_in_locality(spark):
    # nearby (a,b) points share high z bits: the four cells of a 2x2 block
    # are contiguous in z space
    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], "a int, b int"
    ).select("a", "b", zvalue("a", "b", bits=4).alias("z"))
    z = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    block = sorted([z[(0, 0)], z[(1, 0)], z[(0, 1)], z[(1, 1)]])
    assert block == [0, 1, 2, 3]  # first quadrant occupies z 0..3


def test_saved_layout_has_disjoint_file_ranges(spark, spark_tmpdir=None):
    df = (
        spark.range(20000)
        .select(
            (F.col("id") % 128).alias("a"),
            ((F.col("id") * 7) % 128).alias("b"),
        )
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/zlayout"
        save_zordered(df, ("a", "b"), path, n_files=8, bits=8)
        ranges = zorder_file_ranges(spark, path).collect()
        assert len(ranges) >= 4
        spans = sorted((r["min_z"], r["max_z"]) for r in ranges)
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, "file z-ranges overlap"
        # a z-range predicate touches few files
        total = len(spans)
        probe = (
            spark.read.parquet(path)
            .filter(F.col("_z").between(spans[0][0], spans[0][1]))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert probe == 1, f"z-range probe touched {probe}/{total} files"


def test_zorder_reduces_scanned_rows_vs_single_sort(spark):
    # against a layout sorted ONLY by a, a selective predicate on b hits
    # every file; in z-order it hits a bounded subset of per-file ranges
    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("a"), (F.col("id") / 128).cast("long").alias("b")
    )
    zdf = df.select("a", "b", zvalue("a", "b", bits=7).alias("z"))
    # collect per-z-chunk min/max of b for 8 equal z chunks
    chunks = (
        zdf.withColumn("chunk", F.shiftright("z", 11))
        .groupBy("chunk")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .collect()
    )
    target_lo, target_hi = 0, 15  # b in [0,16): 1/8th of the b domain
    touched = sum(
        1 for r in chunks if not (r["hi"] < target_lo or r["lo"] > target_hi)
    )
    assert touched < len(chunks), "z-chunks show no b-locality"


def test_zvalue_roundtrips_via_deinterleave(spark):
    from hypothesis import given, settings, strategies as st

    # build once outside the property: one Spark job over a parameter table
    pairs = [(a, b) for a in (0, 1, 5, 127, 255) for b in (0, 2, 63, 254, 255)]
    df = spark.createDataFrame(pairs, "a int, b int").select(
        "a", "b", zvalue("a", "b", bits=8).alias("z")
    )
    for r in df.collect():
        z = r["z"]
        a = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (a, b) == (r["a"], r["b"])

    # pure-python model must agree with the Spark expression on random pairs
    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=(1 << 16) - 1),
        st.integers(min_value=0, max_value=(1 << 16) - 1),
    )
    def model(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        az = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        bz = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (az, bz) == (a, b)

    model()
