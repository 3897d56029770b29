"""Event-analytics operators: exponentially-weighted moving averages,
z-score outliers, conversion funnels, retention cohorts.

The standard product-analytics reading of the events table, each written
so a DuckDB oracle can verify it value-for-value:

  - EWMA is a LEFT FOLD over each user's time-ordered values — Spark's
    ``aggregate`` and DuckDB's ``list_reduce`` execute the identical
    IEEE op sequence, so the result is bit-equal with no rounding
    tricks needed mid-fold;
  - outlier z-scores derive mean/variance from EXACT integer-cents sums
    (sum, sum-of-squares as int64) — float aggregation order can never
    move a z past the threshold;
  - the funnel is strict-ordering subsequence matching (view -> click ->
    purchase) via three cascaded min-after aggregations, not a window
    over the whole event stream;
  - retention buckets users by first-seen day and counts distinct
    (cohort, day-offset) activity.

Scale notes: EWMA's per-user collect is bounded by per-user event counts
(thousands, not corpus-scale) — the same per-group array pattern as the
engine's quantile queries; funnel and retention are partial-agg'd
groupBys; outliers broadcast a |type|-row stats frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "user_value_ewma",
    "zscore_outliers",
    "conversion_funnel",
    "retention_cohorts",
    "copurchase_rules",
    "event_transition_matrix",
]


def user_value_ewma(
    events: DataFrame,
    alpha: float = 0.5,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user EWMA of ``value`` in (ts, event_id) order:
    ``s_1 = x_1;  s_i = alpha*x_i + (1-alpha)*s_{i-1}``.

    Left fold over the sorted per-user array — seeded with the first
    element, exactly ``list_reduce``'s contract, so both engines run the
    same float64 op sequence. Returns (user, n_events, ewma round-6).
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(ts_col, id_col, value_col))
    )
    vals = F.transform(ordered, lambda s: s[value_col])
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda s, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * s,
    )
    return (
        events.groupBy(user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(ewma, 6).alias("ewma"),
        )
    )


def zscore_outliers(
    events: DataFrame,
    threshold: float = 3.0,
    *,
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Events whose value is more than ``threshold`` standard deviations
    from their type's mean: (event_id, event_type, value, z).

    Population stats per type come from exact int64 cents sums
    (n, sum, sum-of-squares): ``var = s2/n - (s1/n)^2`` evaluated in
    float64 from integers, so partial-agg order cannot perturb the
    boundary. The |type|-row stats frame broadcasts back onto the
    stream; z rounds to 6dp before the threshold test so both engines
    cut identically. (At 100 TB the cents² sum needs decimal(38) —
    noted, int64 is exact to ~9e18.)
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    stats = (
        events.select(F.col(type_col), cents.alias("_c"))
        .groupBy(type_col)
        .agg(
            F.count("*").alias("_n"),
            F.sum("_c").alias("_s1"),
            F.sum(F.col("_c") * F.col("_c")).alias("_s2"),
        )
    )
    mean_c = F.col("_s1").cast("double") / F.col("_n").cast("double")
    var_c = (
        F.col("_s2").cast("double") / F.col("_n").cast("double")
        - mean_c * mean_c
    )
    z = F.round((cents.cast("double") - mean_c) / F.sqrt(var_c), 6)
    return (
        events.join(F.broadcast(stats), type_col)
        .select(
            F.col(id_col),
            F.col(type_col),
            F.col(value_col),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > threshold)
    )


def conversion_funnel(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: one row
    ``(n_stage1, n_stage2, n_stage3)`` counting users with a stage-1
    event, a stage-2 event STRICTLY AFTER their first stage-1, and a
    stage-3 event strictly after that first qualifying stage-2.

    Three cascaded min-after joins on user — each input is pre-filtered
    to one event type before any shuffle, and each stage frame is
    |users|-sized.
    """
    s1, s2, s3 = stages
    a = (
        events.filter(F.col(type_col) == s1)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"))
    )
    b = (
        events.filter(F.col(type_col) == s2)
        .join(a, user_col)
        .filter(F.col(ts_col) > F.col("_t1"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t2"))
    )
    c = (
        events.filter(F.col(type_col) == s3)
        .join(b, user_col)
        .filter(F.col(ts_col) > F.col("_t2"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t3"))
    )
    return (
        a.agg(F.count("*").alias("n_stage1"))
        .crossJoin(b.agg(F.count("*").alias("n_stage2")))
        .crossJoin(c.agg(F.count("*").alias("n_stage3")))
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen day
    (cohort), counted per distinct activity-day offset:
    ``(cohort_day, day_offset, n_users)``.

    Two partial-agg'd shuffles: first-seen per user, then a distinct
    (cohort, offset, user) count. The cohort frame is |users|-sized and
    joins back broadcast-style under AQE.
    """
    first = events.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    active = events.select(
        F.col(user_col), F.to_date(ts_col).alias("_day")
    ).distinct()
    return (
        active.join(first, user_col)
        .select(
            user_col,
            "cohort_day",
            F.datediff("_day", "cohort_day").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def copurchase_rules(
    items: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
) -> DataFrame:
    """Market-basket association rules (Agrawal & Srikant, VLDB'94 —
    the pairwise slice): for every item pair co-occurring in >=
    ``min_pair_support`` baskets,

      confidence(a->b) = s(a,b) / s(a)
      lift(a,b)        = N * s(a,b) / (s(a) * s(b))

    with s() basket-level supports and N the basket count. Lift > 1 is
    positive association; both ratios in exact-integer 6dp
    (`ratio_6dp_exact` — products stay inside int64: N*s_ab and
    s_a*s_b <= N^2).

    Scale: baskets dedupe to (basket, item); the pair generator is an
    equi-self-join ON THE BASKET KEY, so fan-out per basket is
    C(k, 2) with k the basket size — bounded by order-line semantics
    (TPC-H <= 7), i.e. LINEAR in baskets, never |items|^2. Supports are
    |item-vocab| aggregates; N enters as a literal.

    Returns (item_a, item_b, pair_support, support_a, support_b,
    confidence_ab, lift), pair_support >= min_pair_support.
    """
    from distributed_vector_database_spark.functions.vector import (
        ratio_6dp_exact,
    )

    if min_pair_support < 1:
        raise ValueError(
            f"min_pair_support must be >= 1, got {min_pair_support}"
        )
    b = items.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
    ).distinct()
    n_baskets = int(b.select(F.countDistinct("_bk")).head()[0])
    sup = b.groupBy("_it").agg(F.count("*").cast("long").alias("s"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x._bk") == F.col("y._bk"))
            & (F.col("x._it") < F.col("y._it")),
        )
        .groupBy(
            F.col("x._it").alias("item_a"), F.col("y._it").alias("item_b")
        )
        .agg(F.count("*").cast("long").alias("pair_support"))
        .filter(F.col("pair_support") >= min_pair_support)
    )
    out = (
        pairs.join(
            sup.select(
                F.col("_it").alias("item_a"),
                F.col("s").alias("support_a"),
            ),
            "item_a",
        )
        .join(
            sup.select(
                F.col("_it").alias("item_b"),
                F.col("s").alias("support_b"),
            ),
            "item_b",
        )
        .withColumn("_liftnum", F.lit(n_baskets) * F.col("pair_support"))
        .withColumn("_liftden", F.col("support_a") * F.col("support_b"))
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_support",
        "support_a",
        "support_b",
        ratio_6dp_exact("pair_support", "support_a").alias("confidence_ab"),
        ratio_6dp_exact("_liftnum", "_liftden").alias("lift"),
    )


def event_transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_break_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition model of user behavior: for every
    (event_type -> next event_type) pair within a user's time-ordered
    stream, the transition count and the row-normalized probability

        p(to | from) = n(from, to) / n(from, ·)

    in exact-integer 6dp. Ties on the timestamp break on
    ``order_break_col`` so the sequence (and therefore the counts) is
    deterministic. Transitions never cross users.

    Scale: one lead() window per user (the partitioning every
    sessionization op already pays) + a |type x type| aggregate —
    output is vocabulary-sized, never event-sized.

    Returns (from_type, to_type, n, p) — the behavioral twin of the
    token-level bigram LM fit (`lm.bigram_counts`).
    """
    from distributed_vector_database_spark.functions.vector import (
        ratio_6dp_exact,
    )

    w = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(order_break_col)
    )
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("_tot")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            ratio_6dp_exact("n", "_tot").alias("p"),
        )
    )
