"""Event-analytics operators (operators/analytics.py) — hand-computed
cases; the oracle queries cover the full-corpus forms."""

import datetime

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.analytics import (
    conversion_funnel,
    retention_cohorts,
    user_value_ewma,
    zscore_outliers,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_ewma_hand_case(spark):
    # user 1 values in time order: 1, 2, 4 -> s = 1; 0.5*2+0.5*1 = 1.5;
    # 0.5*4 + 0.5*1.5 = 2.75
    rows = [
        (1, _ts(1), 1, "view", 1.0),
        (2, _ts(2), 1, "view", 2.0),
        (3, _ts(3), 1, "view", 4.0),
        (4, _ts(1), 2, "view", 7.0),  # single event -> ewma = value
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {r["user_id"]: r["ewma"] for r in user_value_ewma(df).collect()}
    assert out == {1: 2.75, 2: 7.0}


def test_ewma_tie_breaks_on_event_id(spark):
    rows = [
        (2, _ts(1), 1, "view", 10.0),  # same ts: event_id orders them
        (1, _ts(1), 1, "view", 0.0),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    # order = (id 1: 0.0), (id 2: 10.0) -> 0.5*10 + 0.5*0 = 5.0
    assert user_value_ewma(df).head()["ewma"] == 5.0


def test_zscore_outliers_flags_only_the_spike(spark):
    rows = [(i, _ts(1), 1, "view", 1.0) for i in range(20)]
    rows.append((99, _ts(2), 1, "view", 100.0))
    df = spark.createDataFrame(rows, _SCHEMA)
    out = zscore_outliers(df, threshold=3.0).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["z"] > 4


def test_zscore_no_outliers_in_uniform_data(spark):
    rows = [(i, _ts(1), 1, "view", float(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, _SCHEMA)
    assert zscore_outliers(df, threshold=3.0).count() == 0


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1 completes the funnel in order
        (1, _ts(1), 1, "view", 0.0),
        (2, _ts(2), 1, "click", 0.0),
        (3, _ts(3), 1, "purchase", 0.0),
        # user 2 clicks BEFORE viewing -> stage 2 not reached
        (4, _ts(2), 2, "view", 0.0),
        (5, _ts(1), 2, "click", 0.0),
        # user 3 views+clicks but purchase precedes the click
        (6, _ts(1), 3, "view", 0.0),
        (7, _ts(3), 3, "click", 0.0),
        (8, _ts(2), 3, "purchase", 0.0),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    r = conversion_funnel(df).head()
    assert (r["n_stage1"], r["n_stage2"], r["n_stage3"]) == (3, 2, 1)


def test_funnel_equal_timestamps_not_counted(spark):
    rows = [
        (1, _ts(1), 1, "view", 0.0),
        (2, _ts(1), 1, "click", 0.0),  # same instant -> NOT after
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    r = conversion_funnel(df).head()
    assert (r["n_stage1"], r["n_stage2"], r["n_stage3"]) == (1, 0, 0)


def test_retention_cohorts_hand_case(spark):
    d1, d2, d3 = (
        datetime.datetime(2024, 1, 1, 5),
        datetime.datetime(2024, 1, 2, 5),
        datetime.datetime(2024, 1, 3, 5),
    )
    rows = [
        (1, d1, 1, "view", 0.0),
        (2, d2, 1, "view", 0.0),  # user 1: offsets 0, 1
        (3, d2, 2, "view", 0.0),
        (4, d3, 2, "view", 0.0),  # user 2 (cohort 1-2): offsets 0, 1
        (5, d3, 1, "view", 0.0),  # user 1 offset 2
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }


# ---------------------------------------------------------------------------
# Market-basket association rules (analytics.copurchase_rules)
# ---------------------------------------------------------------------------


def test_copurchase_rules_exact_counts_and_lift(spark):
    from distributed_vector_database_spark.operators.analytics import (
        copurchase_rules,
    )

    # 4 baskets; (a,b) together in 2 of them; c alone rides with a once;
    # duplicate line (b1, a) must not inflate supports
    rows = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "d"),
    ]
    items = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in copurchase_rules(
            items, basket_col="bk", item_col="it", min_pair_support=1
        ).collect()
    }
    ab = got[("a", "b")]
    assert ab["pair_support"] == 2
    assert (ab["support_a"], ab["support_b"]) == (3, 2)
    assert ab["confidence_ab"] == round(2 / 3, 6)
    assert ab["lift"] == round(4 * 2 / (3 * 2), 6)  # 1.333333
    ac = got[("a", "c")]
    assert ac["pair_support"] == 1 and ac["lift"] == round(4 / 3, 6)
    assert ("a", "d") not in got  # never co-occur
    # threshold filters
    from distributed_vector_database_spark.operators.analytics import (
        copurchase_rules as cr,
    )

    got2 = cr(
        items, basket_col="bk", item_col="it", min_pair_support=2
    ).collect()
    assert {(r["item_a"], r["item_b"]) for r in got2} == {("a", "b")}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_pair_support"):
        cr(items, basket_col="bk", item_col="it", min_pair_support=0)


def test_event_transition_matrix_counts_and_probs(spark):
    from datetime import datetime

    from distributed_vector_database_spark.operators.analytics import (
        event_transition_matrix,
    )

    t = datetime(2026, 1, 1)

    def ts(sec):
        return datetime(2026, 1, 1, 0, 0, sec)

    rows = [
        # user 1: a -> b -> a -> c
        (1, 1, ts(0), "a"), (1, 2, ts(1), "b"),
        (1, 3, ts(2), "a"), (1, 4, ts(3), "c"),
        # user 2: a -> b  (transitions never cross users)
        (2, 5, ts(0), "a"), (2, 6, ts(1), "b"),
        # user 3: single event -> no transitions
        (3, 7, ts(0), "c"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transition_matrix(ev).collect()
    }
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in got  # user 3's lone event emits nothing
    # rows per from_type sum to 1 within rounding
    assert abs(got[("a", "b")][1] + got[("a", "c")][1] - 1.0) < 2e-6


def test_event_transition_matrix_tiebreak_is_deterministic(spark):
    from datetime import datetime

    from distributed_vector_database_spark.operators.analytics import (
        event_transition_matrix,
    )

    t0 = datetime(2026, 1, 1)
    # two events at the SAME timestamp: event_id breaks the tie
    ev = spark.createDataFrame(
        [(1, 10, t0, "x"), (1, 11, t0, "y")],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = [
        (r["from_type"], r["to_type"])
        for r in event_transition_matrix(ev).collect()
    ]
    assert got == [("x", "y")]
