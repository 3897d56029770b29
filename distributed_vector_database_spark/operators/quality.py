"""Data-quality operators: rule-based expectations with quarantine, and
write-time audit metrics via Spark's Observation API.

The guardrails a 100 TB ingestion pipeline runs on every batch:

- **Expectations** (the Delta-Live-Tables / Great-Expectations shape):
  each rule is a boolean Column; rows failing any rule are split into a
  quarantine frame with the list of violated rule names attached, rows
  passing all rules flow on. One pass, pure Catalyst expressions — the
  rule evaluation is a projection, the split two filters over it.

- **Observed writes**: `df.observe(...)` attaches aggregate metrics
  (row counts, null counts, sums) that the driver collects from the
  SAME job that materialized the data — no second audit scan. At 100 TB
  the difference between `observe` and a follow-up audit query is a
  full corpus re-read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = [
    "apply_expectations",
    "expectations_report",
    "write_observed",
]


def _flags(rules: dict[str, Column]) -> Column:
    """Array of violated rule names (empty array = row passes)."""
    # a rule passes only when it evaluates to TRUE — null (rule could
    # not evaluate) is a violation, so coalesce before negating
    return F.array_compact(
        F.array(
            *[
                F.when(
                    F.coalesce(cond, F.lit(False)), F.lit(None)
                ).otherwise(F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )


def apply_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into ``(valid, quarantined)`` by the boolean rules.

    ``valid`` has df's schema; ``quarantined`` adds ``violations:
    array<string>`` naming every failed rule (rule order preserved).
    NULL rule results count as violations (a null check that cannot
    evaluate is a failure, not a pass).
    """
    flagged = df.withColumn("_viol", _flags(rules))
    valid = flagged.filter(F.size("_viol") == 0).drop("_viol")
    bad = flagged.filter(F.size("_viol") > 0).withColumnRenamed(
        "_viol", "violations"
    )
    return valid, bad


def expectations_report(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Per-rule violation counts in ONE pass over the data:
    ``(rule, n_violations, n_rows, violation_rate)`` — conditional
    aggregates, no per-rule scans, map-side combinable.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"_v_{name}").alias("n_violations"),
                )
                for name in rules
            ]
        )
    )
    return row.select(pairs.alias("_p"), F.col("_n")).select(
        F.col("_p.rule").alias("rule"),
        F.col("_p.n_violations").cast("long").alias("n_violations"),
        F.col("_n").cast("long").alias("n_rows"),
        F.round(
            F.col("_p.n_violations").cast("double") / F.col("_n"), 6
        ).alias("violation_rate"),
    )


def write_observed(
    df: DataFrame,
    path: str,
    *,
    metrics: dict[str, Column] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` and return audit metrics collected FROM THE WRITE
    JOB ITSELF via ``df.observe`` — row count always, plus any caller
    metrics (aggregate expressions). No second scan touches the data.
    """
    mets = {"n_rows": F.count(F.lit(1)).cast("long")}
    if metrics:
        mets.update(metrics)
    obs = Observation()
    observed = df.observe(
        obs, *[c.alias(k) for k, c in mets.items()]
    )
    observed.write.format(format).mode(mode).save(path)
    return dict(obs.get)
