"""SQLite shard-store connector (sources/sqlite_store.py): reads and
writes the reference's on-disk format (shard_{i}.sqlite3, table
vectors(id TEXT PRIMARY KEY, vector_json TEXT))."""

import json
import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.sources.sqlite_store import (
    _ShardReader,
    read_shards,
    write_shards,
)


def _mk_reference_store(path, shards):
    """Build shard files exactly as the reference's storage server does."""
    os.makedirs(path, exist_ok=True)
    for sid, rows in shards.items():
        con = sqlite3.connect(os.path.join(path, f"shard_{sid}.sqlite3"))
        con.execute(
            "CREATE TABLE IF NOT EXISTS vectors ("
            "id TEXT PRIMARY KEY, vector_json TEXT NOT NULL)"
        )
        con.executemany(
            "REPLACE INTO vectors (id, vector_json) VALUES (?, ?)",
            [(i, json.dumps(v)) for i, v in rows],
        )
        con.commit()
        con.close()


def test_reads_reference_format_store(spark, tmp_path):
    d = str(tmp_path / "data")
    _mk_reference_store(
        d,
        {
            0: [("a", [1.0, 2.0]), ("b", [3.0, 4.0])],
            2: [("c", [5.0, 6.0])],
        },
    )
    got = sorted(map(tuple, read_shards(spark, d).collect()))
    assert got == [
        ("a", [1.0, 2.0], 0),
        ("b", [3.0, 4.0], 0),
        ("c", [5.0, 6.0], 2),
    ]


def test_point_lookup_pushdown_filters_in_sqlite(spark, tmp_path):
    d = str(tmp_path / "data")
    _mk_reference_store(
        d, {0: [(str(i), [float(i)]) for i in range(50)]}
    )
    df = read_shards(spark, d)
    assert [r["id"] for r in df.filter(F.col("id") == "7").collect()] == ["7"]
    assert sorted(
        r["id"] for r in df.filter(F.col("id").isin("3", "4")).collect()
    ) == ["3", "4"]
    # composite predicate: id filter pushed, the rest evaluated by Spark
    assert df.filter(
        (F.col("id") == "7") & (F.col("shard_id") == 3)
    ).count() == 0


def test_push_filters_unit():
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    r = _ShardReader({"path": "/nonexistent"})
    eq = EqualTo(("id",), "x")
    gt = GreaterThan(("shard_id",), 1)
    rest = list(r.pushFilters([eq, gt]))
    assert rest == [gt]  # id filter consumed, shard filter returned
    assert r.id_values == ["x"]
    r2 = _ShardReader({"path": "/nonexistent"})
    inf = In(("id",), ("a", "b"))
    assert list(r2.pushFilters([inf])) == []
    assert r2.id_values == ["a", "b"]


def test_write_read_roundtrip(spark, tmp_path):
    d = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(str(i), [float(i), 0.5], i % 3) for i in range(20)],
        "id string, embedding array<double>, shard_id int",
    )
    write_shards(df, d)
    assert sorted(os.listdir(d)) == [
        "shard_0.sqlite3",
        "shard_1.sqlite3",
        "shard_2.sqlite3",
    ]
    back = read_shards(spark, d)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # files are valid for the reference's own reader (plain sqlite3)
    con = sqlite3.connect(os.path.join(d, "shard_1.sqlite3"))
    rows = dict(con.execute("SELECT id, vector_json FROM vectors"))
    con.close()
    assert json.loads(rows["4"]) == [4.0, 0.5]


def test_overwrite_replaces_whole_store(spark, tmp_path):
    d = str(tmp_path / "out")
    df1 = spark.createDataFrame(
        [("a", [1.0], 0)], "id string, embedding array<double>, shard_id int"
    )
    df2 = spark.createDataFrame(
        [("b", [2.0], 0)], "id string, embedding array<double>, shard_id int"
    )
    write_shards(df1, d)
    write_shards(df2, d)
    got = read_shards(spark, d).collect()
    assert [r["id"] for r in got] == ["b"]


def test_append_mode_rejected(spark, tmp_path):
    from distributed_vector_database_spark.sources.sqlite_store import (
        register,
    )

    register(spark)
    df = spark.createDataFrame(
        [("a", [1.0], 0)], "id string, embedding array<double>, shard_id int"
    )
    with pytest.raises(Exception, match="overwrite"):
        (
            df.write.format("sqlite_vector_shards")
            .option("path", str(tmp_path / "x"))
            .mode("append")
            .save()
        )


def test_conjunctive_id_filters_intersect(spark, tmp_path):
    """Regression (round-3 advice): two consumed id predicates must
    INTERSECT — isin('1','2') AND isin('2','3') selects only '2'."""
    d = str(tmp_path / "conj")
    _mk_reference_store(
        d, {0: [("1", [1.0]), ("2", [2.0])], 1: [("3", [3.0])]}
    )
    df = read_shards(spark, d)
    got = (
        df.filter(F.col("id").isin("1", "2") & F.col("id").isin("2", "3"))
        .select("id")
        .collect()
    )
    assert [r["id"] for r in got] == ["2"]
    empty = df.filter(
        F.col("id").isin("1") & F.col("id").isin("3")
    ).collect()
    assert empty == []


def test_stream_shards_tails_inserts_and_updates(spark, tmp_path):
    """CDC semantics: the initial content arrives in batch 1; rows
    REPLACE'd or inserted afterwards arrive in batch 2 (an update shows
    up as a new row for the same id — keep-latest folds it)."""
    import json as _json

    from distributed_vector_database_spark.sources.sqlite_store import (
        stream_shards,
    )

    d = str(tmp_path / "live")
    _mk_reference_store(
        d,
        {
            0: [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
            1: [("c", [2.0, 2.0])],
        },
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batches = []

    def drain():
        q = (
            stream_shards(spark, d)
            .writeStream.foreachBatch(
                lambda df, bid: batches.append(
                    sorted(
                        (r["id"], tuple(r["embedding"]), r["shard_id"])
                        for r in df.collect()
                    )
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    drain()
    flat1 = [r for b in batches for r in b]
    assert sorted(flat1) == [
        ("a", (1.0, 0.0), 0),
        ("b", (0.0, 1.0), 0),
        ("c", (2.0, 2.0), 1),
    ]
    # live changes: one brand-new row, one REPLACE of a NON-max row
    con = sqlite3.connect(os.path.join(d, "shard_0.sqlite3"))
    con.execute(
        "REPLACE INTO vectors (id, vector_json) VALUES (?, ?)",
        ("a", _json.dumps([9.0, 9.0])),
    )
    con.execute(
        "INSERT INTO vectors (id, vector_json) VALUES (?, ?)",
        ("d", _json.dumps([3.0, 3.0])),
    )
    con.commit()
    con.close()
    n_before = len(batches)
    drain()  # restart from the checkpointed offset
    new_rows = [r for b in batches[n_before:] for r in b]
    assert sorted(new_rows) == [
        ("a", (9.0, 9.0), 0),
        ("d", (3.0, 3.0), 0),
    ]


def test_stream_replace_of_max_rowid_row_is_emitted(spark, tmp_path):
    """Regression (ADVICE r4): SQLite REPLACE of the row holding a
    shard's MAX rowid reuses that rowid, so a bare `rowid > watermark`
    scan never sees the update. The offset's per-shard tip fingerprint
    must catch it — and an unchanged store must emit nothing (no
    spurious re-emit of the watermark row every batch)."""
    import json as _json

    from distributed_vector_database_spark.sources.sqlite_store import (
        stream_shards,
    )

    d = str(tmp_path / "live")
    _mk_reference_store(
        d, {0: [("a", [1.0, 0.0]), ("b", [0.0, 1.0])]}
    )
    ckpt = str(tmp_path / "ckpt")
    batches = []

    def drain():
        q = (
            stream_shards(spark, d)
            .writeStream.foreachBatch(
                lambda df, bid: batches.append(
                    sorted(
                        (r["id"], tuple(r["embedding"]), r["shard_id"])
                        for r in df.collect()
                    )
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    drain()
    assert sorted(r for b in batches for r in b) == [
        ("a", (1.0, 0.0), 0),
        ("b", (0.0, 1.0), 0),
    ]
    # drain with NO changes: the tip row must not be re-emitted
    n = len(batches)
    drain()
    assert [r for b in batches[n:] for r in b] == []
    # Rewrite the max-rowid row ("b" holds rowid 2) in a way that REUSES
    # rowid 2 (DELETE then INSERT: the fresh insert takes max+1 of the
    # REMAINING rows = 2 again) — invisible to the range scan alone.
    # (A single-statement REPLACE happens to pick its new rowid before
    # deleting the conflict, but delete-then-rewrite batches hit this.)
    con = sqlite3.connect(os.path.join(d, "shard_0.sqlite3"))
    con.execute("DELETE FROM vectors WHERE id = 'b'")
    con.execute(
        "INSERT INTO vectors (id, vector_json) VALUES (?, ?)",
        ("b", json.dumps([7.0, 7.0])),
    )
    con.commit()
    # confirm the edge is real: max rowid did NOT advance
    assert con.execute("SELECT max(rowid) FROM vectors").fetchone()[0] == 2
    con.close()
    n = len(batches)
    drain()
    assert [r for b in batches[n:] for r in b] == [("b", (7.0, 7.0), 0)]
    # and the re-emit is one-shot: the next unchanged drain is empty
    n = len(batches)
    drain()
    assert [r for b in batches[n:] for r in b] == []


def test_stream_full_verify_catches_multirow_rowid_reuse(spark, tmp_path):
    """Regression (round-5 review): a batch that DELETEs the max-rowid
    row TOGETHER with rows below it can reuse rowids strictly below the
    watermark for its re-INSERTs — invisible to the range scan AND to
    the single-row tip fingerprint. verify='full' carries a region
    checksum and must re-emit the rewritten region; an unchanged store
    must still emit nothing."""
    d = str(tmp_path / "live")
    _mk_reference_store(
        d,
        {0: [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [1.0, 1.0])]},
    )
    from distributed_vector_database_spark.sources.sqlite_store import (
        stream_shards,
    )

    ckpt = str(tmp_path / "ckpt")
    batches = []

    def drain():
        q = (
            stream_shards(spark, d, verify="full")
            .writeStream.foreachBatch(
                lambda df, bid: batches.append(
                    sorted(
                        (r["id"], tuple(r["embedding"]), r["shard_id"])
                        for r in df.collect()
                    )
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    drain()
    assert sorted(r for b in batches for r in b) == [
        ("a", (1.0, 0.0), 0),
        ("b", (0.0, 1.0), 0),
        ("c", (1.0, 1.0), 0),
    ]
    # no-change drain: nothing re-emitted despite the O(region) checksum
    n = len(batches)
    drain()
    assert [r for b in batches[n:] for r in b] == []
    # delete rowids 2 AND 3 (the max), then insert two rewritten rows:
    # SQLite hands out max(remaining)+1 = 2, then 3 — both at/below the
    # watermark, and the tip row's content alone can't prove row 2 moved
    con = sqlite3.connect(os.path.join(d, "shard_0.sqlite3"))
    con.execute("DELETE FROM vectors WHERE id IN ('b', 'c')")
    con.execute(
        "INSERT INTO vectors (id, vector_json) VALUES (?, ?)",
        ("b2", json.dumps([7.0, 7.0])),
    )
    con.execute(
        "INSERT INTO vectors (id, vector_json) VALUES (?, ?)",
        ("c2", json.dumps([8.0, 8.0])),
    )
    con.commit()
    got = con.execute("SELECT rowid, id FROM vectors ORDER BY rowid").fetchall()
    assert got == [(1, "a"), (2, "b2"), (3, "c2")], got
    con.close()
    n = len(batches)
    drain()
    emitted = sorted(r for b in batches[n:] for r in b)
    # the whole rewritten region replays (keep-latest absorbs "a")
    assert ("b2", (7.0, 7.0), 0) in emitted
    assert ("c2", (8.0, 8.0), 0) in emitted
