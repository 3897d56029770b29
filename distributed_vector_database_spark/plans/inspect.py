"""Physical-plan inspection helpers.

The scale contract of this engine ("would the plan survive 100×?") is
enforced by tests that READ THE PLAN, not by hope: filters must reach the
parquet scan (PushedFilters), projections must prune columns (ReadSchema),
small-dim joins must broadcast, and hot expressions must sit inside
whole-stage codegen. These helpers extract those facts from
``explain("formatted")`` output so tests can assert on them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "plan_text",
    "pushed_filters",
    "read_schema_columns",
    "assert_filter_pushdown",
    "assert_no_cross_join",
    "wholestage_codegen_spans",
]


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet scan."""
    text = plan_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read by each scan (column pruning evidence)."""
    text = plan_text(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        scans.append(cols)
    return scans


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-pruning predicates applied at the scan (directory-level
    pruning on a partitionBy layout — the IVF probe's physical form)."""
    text = plan_text(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def assert_partition_pruned(df: DataFrame, column: str) -> None:
    pf = partition_filters(df)
    if not any(column in f for f in pf):
        raise AssertionError(
            f"no partition filter mentions {column!r}; PartitionFilters={pf}\n"
            f"{plan_text(df)}"
        )


def assert_filter_pushdown(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    if not any(column in f for f in pf):
        raise AssertionError(
            f"no pushed filter mentions {column!r}; PushedFilters={pf}\n"
            f"{plan_text(df)}"
        )


def assert_no_cross_join(df: DataFrame, allow_broadcast: bool = True) -> None:
    """Fail on a non-broadcast cartesian product in the physical plan."""
    text = plan_text(df)
    if "CartesianProduct" in text:
        raise AssertionError(f"CartesianProduct in plan:\n{text}")
    if not allow_broadcast and "BroadcastNestedLoopJoin" in text:
        raise AssertionError(f"BroadcastNestedLoopJoin in plan:\n{text}")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more JVM-fused pipeline)."""
    return len(re.findall(r"WholeStageCodegen", plan_text(df)))
