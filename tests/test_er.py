"""Entity-resolution operators (operators/er.py)."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.er import (
    fuzzy_dup_pairs,
    sorted_neighborhood_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_snm_pairs_only_adjacent_in_sort_order(spark):
    rows = [
        (1, "aaa x", "s"),
        (2, "aab x", "s"),
        (3, "zzz x", "s"),
        (4, "aac x", "s"),
    ]
    df = _docs(spark, rows)
    out = sorted_neighborhood_pairs(
        df, F.substring("text", 1, 3), window=2
    )
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    # sort order by 3-char prefix: 1(aaa) 2(aab) 4(aac) 3(zzz)
    assert got == [(1, 2), (2, 4), (4, 3)]


def test_snm_window_3_pairs_two_ahead(spark):
    rows = [(i, f"k{i:02d}", "s") for i in range(5)]
    df = _docs(spark, rows)
    out = sorted_neighborhood_pairs(df, F.col("text"), window=3)
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    exp = sorted(
        [(i, i + 1) for i in range(4)] + [(i, i + 2) for i in range(3)]
    )
    assert got == exp
    # n·(w-1) bound minus the tail truncation
    assert len(got) == 4 + 3


def test_fuzzy_pairs_verify_with_edit_distance(spark):
    rows = [
        (1, "the quick brown fox jumps", "s"),
        (2, "the quick brown fox jumped", "s"),   # 2 edits, same band
        (3, "completely different text here ok", "s"),
        (4, "the quick brown fox jumps", "other"),  # same text, other block
    ]
    df = _docs(spark, rows)
    out = fuzzy_dup_pairs(
        df, prefix_chars=40, max_edits=3, length_band=8
    )
    got = {(r["id_a"], r["id_b"]): r["edit_distance"] for r in out.collect()}
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert all(a != 4 and b != 4 for a, b in got)  # block isolates source


def test_fuzzy_pairs_length_band_blocks_far_lengths(spark):
    rows = [
        (1, "ab", "s"),
        (2, "ab" + " filler" * 20, "s"),  # same prefix start, far length
    ]
    df = _docs(spark, rows)
    out = fuzzy_dup_pairs(df, prefix_chars=5, max_edits=5, length_band=8)
    assert out.count() == 0


def test_snm_plan_has_no_single_partition_exchange(spark):
    """Regression (round-3 advice): the neighbor window must not run as a
    single-partition WindowExec — no Exchange SinglePartition anywhere."""
    rows = [(i, f"k{i:02d}", "s") for i in range(20)]
    df = _docs(spark, rows)
    out = sorted_neighborhood_pairs(df, F.col("text"), window=3)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan, plan


def test_snm_matches_serial_reference(spark):
    """Pairs equal the definitional serial computation on a shuffled key
    set (incl. duplicate keys, id tie-break)."""
    rows = [(i, f"k{i % 7:02d}", "s") for i in range(30)]
    df = _docs(spark, rows).repartition(8)
    out = sorted_neighborhood_pairs(df, F.col("text"), window=4)
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    order = [i for _, i in sorted((f"k{i % 7:02d}", i) for i in range(30))]
    exp = sorted(
        (order[j], order[j + off])
        for j in range(30)
        for off in (1, 2, 3)
        if j + off < 30
    )
    assert got == exp
