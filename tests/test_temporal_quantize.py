"""Unit fixtures for the as-of join (union-merge plan) and int8 quantization."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.quantize import (
    int8_dequantize,
    int8_quantize,
    quantize_stats,
)
from distributed_vector_database_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00")),
            (2, "A", _ts("2024-01-01 10:05:00")),
            (3, "B", _ts("2024-01-01 09:00:00")),  # before any B quote
            (4, "C", _ts("2024-01-01 10:00:00")),  # key with no quotes
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:00"), 10, 100.0),
            ("A", _ts("2024-01-01 10:00:00"), 11, 101.0),  # ts == trade 1 ts
            ("A", _ts("2024-01-01 10:00:00"), 12, 102.0),  # tie -> higher id
            ("A", _ts("2024-01-01 10:04:00"), 13, 103.0),
            ("B", _ts("2024-01-01 09:30:00"), 20, 200.0),
        ],
        "sym string, ts timestamp, quote_id long, px double",
    )
    return trades, quotes


def test_asof_inner(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", right_tiebreak="quote_id", how="inner"
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    # inclusive <=, equal-ts tie broken by highest quote_id
    assert rows[1]["asof_quote_id"] == 12 and rows[1]["asof_px"] == 102.0
    assert rows[2]["asof_quote_id"] == 13
    # trade before any quote and key with no quotes are dropped
    assert set(rows) == {1, 2}


def test_asof_left(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", right_tiebreak="quote_id", how="left"
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3]["asof_quote_id"] is None
    assert rows[4]["asof_px"] is None


def test_asof_rejects_reserved_columns(spark, trades_quotes):
    _, quotes = trades_quotes
    bad = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:00"))], "_p long, sym string, ts timestamp"
    )
    with pytest.raises(ValueError, match="_p"):
        asof_join(bad, quotes, on="sym")


def test_quantize_roundtrip_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 2.0, 255.0]),
            (2, [-1.0, -0.5, 0.0, 0.5]),
            (3, [3.25, 3.25, 3.25, 3.25]),  # constant vector
            (4, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        ],
        "vec_id long, v array<double>",
    )
    out = df.select(
        "vec_id",
        int8_quantize("v").alias("q"),
        int8_dequantize(int8_quantize("v")).alias("recon"),
        quantize_stats("v").alias("max_err"),
        F.array_min(F.col("v")).alias("mn"),
        F.array_max(F.col("v")).alias("mx"),
    ).collect()
    for r in out:
        codes = r["q"]["codes"]
        assert all(0 <= c <= 255 for c in codes)
        step = (r["mx"] - r["mn"]) / 255.0
        # reconstruction error bounded by one quantization step
        assert r["max_err"] <= step + 1e-12
        if r["mx"] == r["mn"]:
            assert codes == [0, 0, 0, 0]
            assert all(x == r["mn"] for x in r["recon"])


def test_quantize_monotone(spark):
    """Codes preserve ordering of the original components."""
    df = spark.createDataFrame(
        [(1, [5.0, -3.0, 7.5, 7.5, 0.25])], "vec_id long, v array<double>"
    )
    r = df.select(int8_quantize("v").alias("q")).head()
    codes = r["q"]["codes"]
    vals = [5.0, -3.0, 7.5, 7.5, 0.25]
    for i in range(len(vals)):
        for j in range(len(vals)):
            if vals[i] < vals[j]:
                assert codes[i] <= codes[j]
    assert codes[2] == codes[3] == 255
    assert codes[1] == 0


def test_range_join_boundaries(spark):
    """Window is inclusive at ts-W, exclusive at ts."""
    from distributed_vector_database_spark.operators.temporal import range_join

    purchases = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    clicks = spark.createDataFrame(
        [
            (10, 7, _ts("2024-01-01 08:59:59")),  # too early
            (11, 7, _ts("2024-01-01 09:00:00")),  # == ts-W -> in
            (12, 7, _ts("2024-01-01 09:59:59")),  # in
            (13, 7, _ts("2024-01-01 10:00:00")),  # == ts -> out
            (14, 8, _ts("2024-01-01 09:30:00")),  # other user
        ],
        "click_id long, user_id long, ts timestamp",
    )
    got = sorted(
        r["r_click_id"]
        for r in range_join(
            purchases, clicks, on="user_id", window_seconds=3600
        ).collect()
    )
    assert got == [11, 12]


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=0,
        max_size=15,
    ),
)
def test_asof_matches_quadratic_reference(spark, lefts, rights):
    """Union-merge as-of == the brute-force 'latest right with rt <= lt,
    ties by highest tiebreak id' definition, on random key/time data."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, base + timedelta(seconds=t)) for i, (k, t) in enumerate(lefts)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, base + timedelta(seconds=t), rid) for (k, t, rid) in rights],
        "k long, ts timestamp, rid long",
    )
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, on="k", right_tiebreak="rid", how="left"
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, rid) for (rk, rt, rid) in rights if rk == k and rt <= t]
        exp = max(cands, key=lambda c: (c[0], c[1]))[1] if cands else None
        assert got[i] == exp, (i, k, t, cands)


def test_asof_forward_direction(spark):
    """Forward as-of: each left row gets the EARLIEST right row at or
    after its timestamp; inclusive at equality; unmatched tail rows drop
    (inner) or null-fill (left)."""
    from distributed_vector_database_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 25, "l25"), (1, 99, "l99")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 20, "r20"), (1, 30, "r30")],
        "k long, ts long, rv string",
    )
    got = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(
            left, right, on="k", direction="forward", how="left"
        ).collect()
    }
    assert got == {"l10": "r10", "l25": "r30", "l99": None}
    inner = asof_join(left, right, on="k", direction="forward").collect()
    assert {r["lv"] for r in inner} == {"l10", "l25"}
    # backward unchanged: l25 -> r20
    back = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(left, right, on="k", how="left").collect()
    }
    assert back == {"l10": "r10", "l25": "r20", "l99": "r30"}
