"""File-level min/max stats skipping (sources/stats.py)."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.sources.stats import (
    collect_file_stats,
    load_stats,
    prune_files,
    read_pruned,
    save_stats,
)


@pytest.fixture(scope="module")
def ranged_layout(spark, tmp_path_factory):
    """Orders written range-partitioned by o_orderkey → disjoint file
    ranges, the layout stats skipping rewards."""
    path = str(tmp_path_factory.mktemp("stats") / "orders_ranged")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    o.repartitionByRange(8, "o_orderkey").write.mode("overwrite").parquet(path)
    return path


def test_stats_cover_layout_and_roundtrip(spark, ranged_layout):
    stats = collect_file_stats(spark, ranged_layout, ["o_orderkey"])
    rows = stats.collect()
    assert len(rows) == 8  # one row per file
    total = sum(r["n_rows"] for r in rows)
    assert total == spark.read.parquet(ranged_layout).count()
    save_stats(stats, ranged_layout)
    loaded = load_stats(spark, ranged_layout)
    assert {r["file"] for r in loaded.collect()} == {r["file"] for r in rows}
    # hidden subdir: plain readers of the layout are unaffected
    assert spark.read.parquet(ranged_layout).count() == total


def test_point_and_range_pruning_skips_files(spark, ranged_layout):
    stats = collect_file_stats(spark, ranged_layout, ["o_orderkey"])
    full = spark.read.parquet(ranged_layout)
    lo, hi = 100, 120
    pruned_files = prune_files(stats, "o_orderkey", lo, hi)
    # disjoint ranges -> a 21-key range touches 1-2 of 8 files
    assert 1 <= len(pruned_files) <= 2
    got = sorted(
        r["o_orderkey"]
        for r in read_pruned(spark, stats, "o_orderkey", lo, hi).collect()
    )
    exp = sorted(
        r["o_orderkey"]
        for r in full.filter(F.col("o_orderkey").between(lo, hi)).collect()
    )
    assert got == exp and len(got) > 0


def test_out_of_range_prunes_everything(spark, ranged_layout):
    stats = collect_file_stats(spark, ranged_layout, ["o_orderkey"])
    assert prune_files(stats, "o_orderkey", -100, -1) == []
    empty = read_pruned(spark, stats, "o_orderkey", -100, -1)
    assert empty.count() == 0
    assert "o_orderkey" in empty.columns


def test_pruning_is_superset_on_random_layout(spark, tmp_path):
    """A randomly laid-out table skips nothing but stays CORRECT — the
    superset guarantee."""
    path = str(tmp_path / "orders_random")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    o.repartition(8).write.mode("overwrite").parquet(path)
    stats = collect_file_stats(spark, path, ["o_orderkey"])
    files = prune_files(stats, "o_orderkey", 100, 120)
    assert len(files) == 8  # full-range stats: nothing skippable
    got = read_pruned(spark, stats, "o_orderkey", 100, 120).count()
    exp = (
        spark.read.parquet(path)
        .filter(F.col("o_orderkey").between(100, 120))
        .count()
    )
    assert got == exp


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """Composition: file stats over a Z-ORDERED layout prune on BOTH
    z-columns; a linear sort layout only prunes on its leading column.
    This is the scale argument for Z-order + stats skipping together."""
    from distributed_vector_database_spark.sources.layout import (
        save_zordered,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_id", "user_id", "value")
        .withColumn("value_bucket", (F.col("value") * 10).cast("long"))
    )
    zpath = str(tmp_path / "z")
    save_zordered(ev, ("user_id", "value_bucket"), zpath, n_files=16)
    lpath = str(tmp_path / "linear")
    ev.repartitionByRange(16, "user_id").write.mode("overwrite").parquet(
        lpath
    )

    zstats = collect_file_stats(spark, zpath, ["user_id", "value_bucket"])
    lstats = collect_file_stats(spark, lpath, ["user_id", "value_bucket"])
    # narrow range on the SECOND z-column: z-order skips, linear can't
    z_files = prune_files(zstats, "value_bucket", 0, 0)
    l_files = prune_files(lstats, "value_bucket", 0, 0)
    # the z layout clusters the SECOND column too, so it must skip
    # strictly more files than the user_id-sorted linear layout
    assert len(z_files) < len(l_files)
    # and the pruned read stays correct
    got = read_pruned(spark, zstats, "value_bucket", 0, 0).count()
    exp = ev.filter(F.col("value_bucket") == 0).count()
    assert got == exp > 0


# ---------------------------------------------------------------------------
# Bloom-filter file skipping (content-addressed; hash layouts)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hashed_layout(spark, tmp_path_factory):
    """Orders HASH-distributed by o_orderkey: every file spans the full
    key range, so min/max stats prune nothing — bloom territory."""
    path = str(tmp_path_factory.mktemp("bloom") / "orders_hashed")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    o.repartition(8, "o_orderkey").write.mode("overwrite").parquet(path)
    return path


def test_minmax_useless_on_hash_layout_bloom_prunes(spark, hashed_layout):
    from distributed_vector_database_spark.sources.stats import (
        collect_file_blooms,
        prune_files_bloom,
    )

    full = spark.read.parquet(hashed_layout)
    lo, hi = full.agg(F.min("o_orderkey"), F.max("o_orderkey")).head()
    mid_lo, mid_hi = lo + (hi - lo) // 4, hi - (hi - lo) // 4
    keys = [
        r["o_orderkey"]
        for r in full.filter(
            F.col("o_orderkey").between(mid_lo, mid_hi)
        )
        .select("o_orderkey")
        .limit(20)
        .collect()
    ]
    stats = collect_file_stats(spark, hashed_layout, ["o_orderkey"])
    blooms = collect_file_blooms(spark, hashed_layout, "o_orderkey").cache()
    n_files = blooms.count()
    assert n_files == 8
    # min/max keeps every file for a mid-range point probe (hash layout:
    # every file's [min, max] covers the middle of the key range)
    assert (
        len(prune_files(stats, "o_orderkey", keys[0], keys[0])) == n_files
    )
    # bloom keeps the owning file (+ rare false positives), never all
    kept = [len(prune_files_bloom(blooms, k)) for k in keys]
    assert all(1 <= n for n in kept)
    # ~1875 keys/file at 32768 bits -> FP well under 10%: on average
    # barely more than the single owning file survives
    assert sum(kept) <= len(keys) * 2
    blooms.unpersist()


def test_bloom_pruned_lookup_exact_for_present_and_absent(
    spark, hashed_layout
):
    from distributed_vector_database_spark.sources.stats import (
        collect_file_blooms,
        load_stats,
        read_bloom_pruned,
        save_stats,
    )

    blooms = collect_file_blooms(spark, hashed_layout, "o_orderkey")
    save_stats(blooms, hashed_layout, subdir="_bloom")
    loaded = load_stats(spark, hashed_layout, subdir="_bloom")
    full = spark.read.parquet(hashed_layout)
    present = full.select("o_orderkey").head()["o_orderkey"]
    got = read_bloom_pruned(
        spark, loaded, "o_orderkey", present
    ).collect()
    exp = full.filter(F.col("o_orderkey") == present).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    # absent key: zero rows, regardless of bloom false positives
    absent = full.agg(F.max("o_orderkey")).head()[0] + 10_000
    assert (
        read_bloom_pruned(spark, loaded, "o_orderkey", absent).count() == 0
    )
