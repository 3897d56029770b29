"""Temporal joins: as-of (last right row at-or-before each left row).

Beyond-reference surface (the reference has no join operators at all,
SURVEY.md §2.12); this is the standard time-series / attribution primitive
(e.g. last-click-before-purchase, latest quote before each trade).

Scale design — the naive plan is ``left JOIN right ON key AND r.ts <= l.ts``
then keep-latest, which explodes to |left| x |right-per-key| intermediate
rows before pruning. Instead we use the union-merge plan:

  1. tag both sides and union them (no join at all);
  2. ONE shuffle: partition by key, sort by (ts, side, tiebreak);
  3. ``last(payload, ignorenulls=True)`` over a running window carries the
     most recent right payload forward onto each left row.

Cost is a single sort-shuffle of |left|+|right| rows — the same shape Spark
uses for window functions — and never materializes the quadratic pair set.
Skewed keys behave like any window op (one key = one partition's worth of
rows); pre-splitting by coarse time bucket is the remedy if one key's
history alone exceeds an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "point_in_time_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
) -> DataFrame:
    """Interval join: pairs (l, r) of the same key with
    ``l.ts - window <= r.ts < l.ts`` (the "right events in the window
    before each left event" shape, e.g. clicks preceding a purchase).

    Scale design — a raw theta-join ``ON key AND r.ts BETWEEN ...`` degrades
    to a per-key nested loop. Instead the left side EXPLODES to its two
    covering time buckets of width ``window_seconds`` and the join becomes a
    pure equi-join on (key, bucket) — shuffle-hash/sort-merge eligible,
    AQE-skew-splittable — followed by the exact range filter. Each left row
    duplicates exactly twice regardless of window size, so the intermediate
    is 2|L| + matched pairs, never |L|x|R|.

    Right columns come through prefixed ``r_``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lb = F.floor(
        F.unix_timestamp(F.col(left_ts).cast("timestamp")) / window_seconds
    )
    rb = F.floor(
        F.unix_timestamp(F.col(right_ts).cast("timestamp")) / window_seconds
    )

    l = left.withColumn("_bucket", F.explode(F.array(lb - 1, lb)))
    r = right.select(
        *[F.col(c).alias(c if c in keys else f"r_{c}") for c in right.columns]
    ).withColumn(
        "_bucket",
        F.floor(
            F.unix_timestamp(F.col(f"r_{right_ts}").cast("timestamp"))
            / window_seconds
        ),
    )
    rts = F.col(f"r_{right_ts}")
    lts = F.col(left_ts)
    return (
        l.join(r, [*keys, "_bucket"])
        .filter(
            (rts >= lts - F.expr(f"INTERVAL {window_seconds} SECOND"))
            & (rts < lts)
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row of the same key with
    ``right_ts <= left_ts`` (inclusive) — or, with
    ``direction='forward'``, the EARLIEST right row with
    ``right_ts >= left_ts`` (the look-ahead form: next shipment after an
    order, next error after a deploy).

    ``right`` must share no column names with ``left`` except the ``on``
    keys; its non-key, non-ts columns come through prefixed ``asof_``
    (plus ``asof_<right_ts>`` for the matched timestamp). Ties on
    ``right_ts`` are broken by ``right_tiebreak`` (highest wins) so results
    are deterministic. ``how='left'`` keeps unmatched left rows with NULL
    payload; ``'inner'`` drops them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)

    payload_cols = [c for c in right.columns if c not in keys]
    reserved = {"_t", "_side", "_p", "_m", "_tb"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"left columns clash with internals: {sorted(clash)}")

    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_p")
    order_tail = (
        [F.col("_tb").asc_nulls_first()] if right_tiebreak else []
    )

    r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        payload,
        *(
            [F.col(right_tiebreak).alias("_tb")]
            if right_tiebreak
            else []
        ),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal ts (side desc) => inclusive
    # match; among equal-ts right rows the tiebreak puts the winner last.
    # Forward = the same running last-non-null, over time DESCENDING —
    # the nearest right at-or-after each left row.
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("_side").desc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w)).filter(
        F.col("_side") == 0
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    out = matched.select(
        *left.columns,
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    *,
    keys: list[str],
    at_col: str,
    from_col: str = "valid_from_batch",
    to_col: str = "valid_to_batch",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (PIT) join — the warehouse-standard companion of an
    SCD2 dimension (`sources/mor.MorStore.history`): each fact row joins
    the ONE dimension version valid at its as-of coordinate:

        from_col <= fact.at_col < coalesce(to_col, +infinity)

    By the SCD2 non-overlap invariant at most one version matches per
    (fact, key), so the join never fans out. ``how='inner'`` drops facts
    whose key was deleted (or not yet born) at their as-of point;
    ``how='left'`` keeps them with null dimension columns — the two
    deploy shapes of training-data labeling against a changing
    dimension.

    Scale: a plain equi-join on ``keys`` — the validity range rides the
    same shuffle as a join residual, no extra exchange, no range
    explosion (dim versions per key are few by construction).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    dim_cols = [
        c
        for c in dim_history.columns
        if c not in keys and c not in (from_col, to_col)
    ]
    # A dim payload column sharing a fact column's name would produce a
    # duplicate output column (ADVICE r9) — refuse loudly so the caller
    # renames on one side instead of debugging an ambiguous frame.
    colliding = sorted(set(dim_cols) & set(facts.columns))
    if colliding:
        raise ValueError(
            "dim payload columns collide with fact columns — rename them "
            f"before the PIT join: {colliding}"
        )
    f, d = facts.alias("f"), dim_history.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"f.{k}") == F.col(f"d.{k}")
        cond = c if cond is None else (cond & c)
    at = F.col(f"f.{at_col}")
    # Open interval = "to is null" (the current version), NOT a numeric
    # sentinel: a +inf literal silently assumes a numeric as-of column and
    # breaks on the timestamp-typed PIT shape (ADVICE r9).
    to = F.col(f"d.{to_col}")
    cond = (
        cond
        & (F.col(f"d.{from_col}") <= at)
        & (to.isNull() | (at < to))
    )
    return f.join(d, cond, how).select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"d.{c}") for c in dim_cols],
    )
