"""Entity-resolution / record-linkage operators: sorted-neighborhood
blocking and edit-distance-verified fuzzy duplicate pairs.

A third blocking family next to the engine's hash blocking (exact
fingerprints) and LSH blocking (MinHash/SimHash bands): classic record
linkage sorts records by a normalized key and compares only neighbors
within a fixed window (Hernandez & Stolfo's sorted-neighborhood method,
SIGMOD 1995), or blocks on cheap keys (first token + length band) and
verifies candidates with an edit-distance predicate. Both are built-in
JVM expressions end to end — `lead()` windows and `levenshtein()` — no
Python in the loop, and both have exact DuckDB oracles.

Scale shape:
  - sorted-neighborhood is ONE global sort (range-partitioned, the same
    machinery as any ORDER BY) and a `lead` window emitting w-1
    candidates per row — candidate count is O(n·w), never O(n²);
  - fuzzy blocking joins on (block key, length band) — equi-keys, so
    the shuffle is hash-balanced; Levenshtein runs only on in-block
    candidates. Skewed blocks (a very common first token) are the
    LSH-bucket hazard in new clothes; cap or salt hot blocks at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.text import normalize_ws

__all__ = [
    "sorted_neighborhood_pairs",
    "fuzzy_dup_pairs",
]


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col,
    window: int = 3,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs by the sorted-neighborhood method: records sorted
    by ``key_col`` (ties by id); each record pairs with its next
    ``window - 1`` neighbors. Returns ``(id_a, id_b, key_a, key_b)``
    with ``id_a`` the earlier record in sort order.

    Candidate volume is (w-1)·n rows. A production run multi-passes with
    several sort keys (key inversions defeat any single ordering); each
    pass is this operator.

    Parallel plan (a bare ``Window.orderBy`` would execute as a
    single-partition WindowExec — every row on one task): the global
    (key, id) order is established by ``repartitionByRange``; a dense
    global index is partition-local ``row_number`` plus the collected
    per-partition row counts (O(#partitions) driver rows) as offsets;
    neighbor pairing is then a hash EQUI-join on ``index + offset`` —
    every stage range/hash-partitioned, nothing single-task.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    spark = df.sparkSession
    nparts = max(
        1, int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    ranged = (
        df.select(F.col(id_col), key.alias("_k"))
        .repartitionByRange(nparts, F.col("_k").asc(), F.col(id_col).asc())
        .withColumn("_part", F.spark_partition_id())
    )
    # partitionBy("_part") keeps the window parallel: each range
    # partition is one window group, re-sorted locally.
    local = Window.partitionBy("_part").orderBy(
        F.col("_k").asc(), F.col(id_col).asc()
    )
    with_rn = ranged.withColumn(
        "_rn", F.row_number().over(local)
    ).localCheckpoint(eager=False)
    sizes = {
        r["_part"]: r["n"]
        for r in with_rn.groupBy("_part").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]
    off_expr = F.lit(0)
    for p, o in offsets.items():
        off_expr = F.when(F.col("_part") == p, F.lit(o)).otherwise(off_expr)
    indexed = with_rn.select(
        F.col(id_col),
        F.col("_k"),
        (F.col("_rn") + off_expr - 1).alias("_ix"),
    )
    probes = indexed.select(
        F.col(id_col).alias("id_a"),
        F.col("_k").alias("key_a"),
        F.explode(
            F.array(*[F.lit(o) for o in range(1, window)])
        ).alias("_off"),
        F.col("_ix").alias("_base"),
    ).select(
        "id_a", "key_a", (F.col("_base") + F.col("_off")).alias("_ix")
    )
    return probes.join(indexed, "_ix").select(
        "id_a",
        F.col(id_col).alias("id_b"),
        "key_a",
        F.col("_k").alias("key_b"),
    )


def fuzzy_dup_pairs(
    docs: DataFrame,
    *,
    prefix_chars: int = 40,
    max_edits: int = 10,
    length_band: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
) -> DataFrame:
    """Blocked edit-distance duplicate pairs: candidates share a block
    key AND a text-length band (|len_a - len_b| <= band implied by equal
    band ids... see note), verified with
    ``levenshtein(prefix_a, prefix_b) <= max_edits`` on the normalized
    ``prefix_chars``-char prefix. Returns
    ``(id_a, id_b, edit_distance)``, ``id_a < id_b``.

    Note the band semantics: records join when their lengths fall in
    the SAME fixed band (floor(len / length_band)) — a deterministic
    equi-key, cross-engine reproducible. Border pairs one band apart
    are missed (run a second pass with offset bands for full coverage,
    same operator).

    Edit distance is the O(len²) verifier, so it runs ONLY inside
    (block, band) candidate groups — the same block-then-verify
    topology as the LSH + Jaccard stack.
    """
    norm = normalize_ws(text_col)
    pref = F.substring(norm, 1, prefix_chars)
    base = docs.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        pref.alias("_p"),
        F.floor(F.length(norm) / length_band).cast("long").alias("_band"),
    )
    a = base.alias("a")
    b = base.alias("b")
    ed = F.levenshtein(F.col("a._p"), F.col("b._p"))
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._band") == F.col("b._band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(ed <= max_edits)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ed.cast("long").alias("edit_distance"),
        )
    )
