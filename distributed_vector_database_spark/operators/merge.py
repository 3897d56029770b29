"""MERGE INTO semantics as a pure relational transform.

The lakehouse write primitive (ANSI SQL:2003 MERGE; Delta/Iceberg/Hudi
``MERGE INTO``): one source table conditionally UPDATEs, DELETEs, and
INSERTs against a base in a single pass. The reference's only write
verb is blind REPLACE INTO (`reference: src/storage_server.py:43-46`);
real pipelines reconcile (CDC apply, dimension maintenance, dedup
upserts) and need the three-way form.

Spark-first shape: MERGE is exactly ONE full-outer join on the key plus
per-column conditional projection — no iterative logic, no driver loop.
``merge_into`` returns the merged RESULT (functional, like every other
operator here); pair it with ``MorStore`` to persist: write the result
as the new base, or diff it into an upsert/tombstone delta batch.

At scale the join shuffles both sides on the key once; when the source
is a small CDC slice, broadcast it (`F.broadcast(source)`) and the base
never shuffles at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_into"]


def merge_into(
    base: DataFrame,
    source: DataFrame,
    *,
    on: str | Sequence[str],
    update_cols: Sequence[str] | None = None,
    insert: bool = True,
    delete_condition: Column | None = None,
) -> DataFrame:
    """Apply SQL MERGE semantics and return the merged table.

    - WHEN MATCHED AND ``delete_condition`` (evaluated over the SOURCE
      row's columns) THEN DELETE;
    - WHEN MATCHED THEN UPDATE SET ``update_cols`` from the source
      (all columns when ``update_cols`` is None);
    - WHEN NOT MATCHED [BY TARGET] THEN INSERT the source row (skipped
      when ``insert=False``);
    - rows only in the base pass through unchanged.

    ``base`` and ``source`` must share the output schema (the usual
    MERGE contract). ``on`` is the equi-key (or list of keys); the
    source must be unique per key — duplicate source keys would make the
    merge non-deterministic, so it raises.
    """
    keys = [on] if isinstance(on, str) else list(on)
    cols = base.columns
    missing = [c for c in cols if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing merge columns: {missing}")
    dup = (
        source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1)
    )
    if dup.count() > 0:
        raise ValueError("source has duplicate keys; MERGE is ambiguous")
    upd = set(cols if update_cols is None else update_cols)

    b = base.alias("b")
    # evaluate the delete condition on the source BEFORE the join so it
    # can reference plain column names without b/s ambiguity
    src = source.select(*cols).withColumn(
        "_del",
        F.lit(False) if delete_condition is None else delete_condition,
    )
    s = src.alias("s")
    cond = None
    for k in keys:
        eq = F.col(f"b.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else (cond & eq)
    j = b.join(s, cond, "full_outer")

    b_has = F.col(f"b.{keys[0]}").isNotNull()
    s_has = F.col(f"s.{keys[0]}").isNotNull()
    matched = b_has & s_has

    j = j.filter(~(matched & F.coalesce(F.col("s._del"), F.lit(False))))
    if not insert:
        j = j.filter(b_has)

    out = []
    for c in cols:
        bc, sc = F.col(f"b.{c}"), F.col(f"s.{c}")
        updated = sc if c in upd or c in keys else bc
        out.append(
            F.when(matched, updated)
            .when(b_has, bc)
            .otherwise(sc)
            .alias(c)
        )
    return j.select(*out)
