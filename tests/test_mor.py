"""MorStore: merge-on-read upsert layout (base + delta batches)."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.plans.inspect import (
    assert_filter_pushdown,
)
from distributed_vector_database_spark.sources.mor import MorStore


@pytest.fixture()
def store(spark, tmp_path):
    st = MorStore(spark, str(tmp_path / "mor"), id_col="id")
    base = spark.createDataFrame(
        [(i, f"v0_{i}") for i in range(20)], "id long, payload string"
    )
    st.write_base(base)
    return st


def _as_dict(df):
    return {r["id"]: r["payload"] for r in df.collect()}


def test_read_without_deltas_is_base(store):
    got = _as_dict(store.read())
    assert got == {i: f"v0_{i}" for i in range(20)}
    assert store.read().columns == ["id", "payload"]


def test_latest_batch_wins_across_overlapping_deltas(store, spark):
    store.append(
        spark.createDataFrame(
            [(i, f"v1_{i}") for i in (1, 5, 9, 21)], "id long, payload string"
        )
    )
    store.append(
        spark.createDataFrame(
            [(i, f"v2_{i}") for i in (5, 9)], "id long, payload string"
        )
    )
    got = _as_dict(store.read())
    assert got[5] == "v2_5" and got[9] == "v2_9"  # batch 2 beats batch 1
    assert got[1] == "v1_1"  # batch 1 beats base
    assert got[0] == "v0_0"  # untouched base survives
    assert got[21] == "v1_21"  # pure insert appears
    assert len(got) == 21


def test_append_is_crash_invisible(store, spark, tmp_path):
    """A half-written (dot-temp) batch never changes the read."""
    before = _as_dict(store.read())
    # simulate a crashed append: the temp dir exists, the rename never ran
    crashed = spark.createDataFrame([(3, "SHOULD_NOT_APPEAR")],
                                    "id long, payload string")
    crashed.withColumn("_batch", F.lit(99).cast("long")).write.parquet(
        str(tmp_path / "mor" / "delta" / ".b00000099.writing")
    )
    assert _as_dict(store.read()) == before


def test_compact_folds_and_preserves_merge(store, spark):
    store.append(
        spark.createDataFrame(
            [(i, f"v1_{i}") for i in (0, 7)], "id long, payload string"
        )
    )
    store.append(
        spark.createDataFrame([(7, "v2_7")], "id long, payload string")
    )
    before = _as_dict(store.read())
    summary = store.compact()
    assert summary["folded_batches"] == 2 and summary["watermark"] == 2
    assert store._delta_dirs() == []  # folded deltas removed
    assert _as_dict(store.read()) == before  # merge result unchanged
    # appends after compaction still win over the folded base
    store.append(
        spark.createDataFrame([(7, "v3_7")], "id long, payload string")
    )
    assert _as_dict(store.read())[7] == "v3_7"


def test_point_get_pushes_id_predicate(store, spark):
    store.append(
        spark.createDataFrame([(4, "v1_4")], "id long, payload string")
    )
    df = store.point_get(4)
    assert_filter_pushdown(df, "id")
    rows = df.collect()
    assert [(r["id"], r["payload"]) for r in rows] == [(4, "v1_4")]
    # base-version id: the lookup returns the base row
    assert store.point_get(2).head()["payload"] == "v0_2"


def test_read_matches_eager_upsert(store, spark):
    """MoR read == the eager upsert_keep_latest result, batch by batch."""
    from distributed_vector_database_spark.sources.vector_store import (
        upsert_keep_latest,
    )

    b1 = spark.createDataFrame(
        [(i, f"v1_{i}") for i in (2, 4, 30)], "id long, payload string"
    )
    b2 = spark.createDataFrame(
        [(i, f"v2_{i}") for i in (4, 31)], "id long, payload string"
    )
    base = spark.createDataFrame(
        [(i, f"v0_{i}") for i in range(20)], "id long, payload string"
    )
    eager = upsert_keep_latest(upsert_keep_latest(base, b1), b2)
    store.append(b1)
    store.append(b2)
    assert _as_dict(store.read()) == _as_dict(eager)


def test_delete_tombstones_hide_rows_and_rebirth_wins(store, spark):
    """Deleted ids vanish from read() and point_get(); a later re-insert
    (higher batch) resurrects the id; delete of an updated id wins over
    the earlier update."""
    store.append(
        spark.createDataFrame(
            [(5, "v1_5")], "id long, payload string"
        )
    )
    store.delete([3, 5, 19])
    got = _as_dict(store.read())
    assert 3 not in got and 5 not in got and 19 not in got
    assert len(got) == 17
    assert store.point_get(5).count() == 0
    assert store.point_get(4).count() == 1
    # re-insert id 5 after the delete: the higher batch wins
    store.append(
        spark.createDataFrame([(5, "reborn")], "id long, payload string")
    )
    assert _as_dict(store.read())[5] == "reborn"
    assert store.read().columns == ["id", "payload"]


def test_compact_applies_tombstones_physically(store, spark):
    store.delete([0, 1, 2])
    store.append(
        spark.createDataFrame([(1, "back")], "id long, payload string")
    )
    info = store.compact()
    assert info["folded_batches"] == 2
    # deleted ids are gone from the BASE FILES themselves (GDPR erasure),
    # except id 1 which was re-inserted after its tombstone
    raw = spark.read.parquet(store._base)  # resolved current version
    ids = {r["id"] for r in raw.select("id").collect()}
    assert 0 not in ids and 2 not in ids and 1 in ids
    got = _as_dict(store.read())
    assert got[1] == "back" and 0 not in got and 2 not in got
    # post-compact append still outranks the folded base
    store.delete([1])
    assert 1 not in _as_dict(store.read())


def test_changes_feed_nets_per_id_and_respects_watermark(store, spark):
    """changes(since) returns the NET change per id from deltas newer than
    the watermark: upsert/delete typed, latest batch wins, base excluded."""
    b1 = store.append(
        spark.createDataFrame(
            [(1, "v1_1"), (2, "v1_2")], "id long, payload string"
        )
    )
    b2 = store.delete([2, 7])
    b3 = store.append(
        spark.createDataFrame([(7, "back")], "id long, payload string")
    )
    feed = {r["id"]: r for r in store.changes().collect()}
    assert set(feed) == {1, 2, 7}
    assert feed[1]["change_type"] == "upsert" and feed[1]["payload"] == "v1_1"
    assert feed[2]["change_type"] == "delete"
    assert feed[7]["change_type"] == "upsert" and feed[7]["payload"] == "back"
    assert feed[7]["_batch"] == b3
    # incremental poll: only batches after b1
    late = {r["id"]: r["change_type"] for r in store.changes(b1).collect()}
    assert late == {2: "delete", 7: "upsert"}
    # nothing new after the last batch -> empty frame, stable schema
    empty = store.changes(b3)
    assert empty.count() == 0
    assert "change_type" in empty.columns
    assert b2 > b1


def test_time_travel_read_reconstructs_each_batch_state(store, spark):
    b1 = store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    b2 = store.delete([1, 2])
    b3 = store.append(
        spark.createDataFrame([(2, "v3_2")], "id long, payload string")
    )
    # as of b1: update visible, nothing deleted
    s1 = _as_dict(store.read(as_of_batch=b1))
    assert s1[1] == "v1_1" and s1[2] == "v0_2" and len(s1) == 20
    # as of b2: ids 1,2 gone
    s2 = _as_dict(store.read(as_of_batch=b2))
    assert 1 not in s2 and 2 not in s2 and len(s2) == 18
    # as of b3 == current: id 2 reborn
    s3 = _as_dict(store.read(as_of_batch=b3))
    assert s3 == _as_dict(store.read())
    assert s3[2] == "v3_2" and 1 not in s3
    # as of batch 0: the pristine base
    s0 = _as_dict(store.read(as_of_batch=0))
    assert s0 == {i: f"v0_{i}" for i in range(20)}


def test_vacuum_retains_recent_history(spark, tmp_path):
    """vacuum(retain_last=1) folds old batches into the base but keeps the
    newest delta addressable: the current view is unchanged, time travel
    to the retained batch still works, and the folded dirs are gone."""
    from distributed_vector_database_spark.sources.mor import MorStore

    store = MorStore(spark, str(tmp_path / "mv"), id_col="id")
    store.write_base(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    b1 = store.append(spark.createDataFrame([(1, "a2")], "id long, v string"))
    b2 = store.delete([2])
    b3 = store.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    before = sorted(map(tuple, store.read().collect()))
    out = store.vacuum(retain_last=1)
    assert out["folded_batches"] == 2 and out["watermark"] == b2
    # only the retained delta dir remains
    assert [bid for bid, _ in store._delta_dirs()] == [b3]
    assert sorted(map(tuple, store.read().collect())) == before
    # time travel to the fold watermark and to the retained batch
    as_of_b2 = sorted(map(tuple, store.read(as_of_batch=b2).collect()))
    assert as_of_b2 == [(1, "a2")]  # id 2 deleted, id 3 not yet appended
    as_of_b3 = sorted(map(tuple, store.read(as_of_batch=b3).collect()))
    assert as_of_b3 == before
    # appends after vacuum still outrank everything
    store.append(spark.createDataFrame([(1, "a3")], "id long, v string"))
    assert sorted(map(tuple, store.read().collect())) == [
        (1, "a3"),
        (3, "c"),
    ]


def test_vacuum_retain_all_is_noop(spark, tmp_path):
    from distributed_vector_database_spark.sources.mor import MorStore

    store = MorStore(spark, str(tmp_path / "mv2"), id_col="id")
    store.write_base(spark.createDataFrame([(1, "a")], "id long, v string"))
    store.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    out = store.vacuum(retain_last=5)
    assert out == {"folded_batches": 0, "watermark": 0}
    assert len(store._delta_dirs()) == 1


def test_history_scd2_intervals(store, spark):
    """Deletes close intervals and emit no row; re-inserts open new
    current intervals; untouched ids stay open from batch 0."""
    store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    store.delete([2, 1])
    store.append(
        spark.createDataFrame([(1, "v3_1")], "id long, payload string")
    )
    h = {
        (r["id"], r["valid_from_batch"]): (
            r["payload"],
            r["valid_to_batch"],
            r["is_current"],
        )
        for r in store.history().collect()
    }
    # id 1: base [0,1) -> upsert [1,2) -> (delete @2) -> re-insert [3, open)
    assert h[(1, 0)] == ("v0_1", 1, False)
    assert h[(1, 1)] == ("v1_1", 2, False)
    assert h[(1, 3)] == ("v3_1", None, True)
    # id 2: deleted at 2, never re-inserted -> one closed interval
    assert h[(2, 0)] == ("v0_2", 2, False)
    assert not any(k[0] == 2 and v[2] for k, v in h.items())
    # untouched id: one open interval from batch 0
    assert h[(5, 0)] == ("v0_5", None, True)
    # current rows of history == read()
    cur = {
        r["id"]: r["payload"]
        for r in store.history().filter("is_current").collect()
    }
    assert cur == _as_dict(store.read())


def test_history_after_compaction_folds(store, spark):
    """compact() folds deltas into the base: pre-compaction versions are
    no longer addressable and every surviving row is one open interval
    at the fold watermark — the documented retention contract."""
    store.append(
        spark.createDataFrame([(3, "v1_3")], "id long, payload string")
    )
    store.delete([4])
    store.compact()
    h = store.history().collect()
    assert all(r["is_current"] and r["valid_to_batch"] is None for r in h)
    byid = {r["id"]: r for r in h}
    assert 4 not in byid            # tombstoned rows folded away
    assert byid[3]["payload"] == "v1_3"
    assert byid[3]["valid_from_batch"] >= 2  # fold watermark, not batch 0


def test_point_in_time_join_reconstructs_each_batch_state(store, spark):
    """PIT join at a fixed batch == read(as_of_batch) for every batch —
    the SCD2 history answers any time-travel read through one join."""
    from distributed_vector_database_spark.operators.temporal import (
        point_in_time_join,
    )

    store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    store.delete([2])
    store.append(
        spark.createDataFrame([(2, "v3_2")], "id long, payload string")
    )
    hist = store.history()
    for b in range(4):
        facts = spark.createDataFrame(
            [(i, b) for i in range(20)], "id long, b long"
        )
        got = {
            r["id"]: r["payload"]
            for r in point_in_time_join(
                facts, hist, keys=["id"], at_col="b"
            ).collect()
        }
        exp = _as_dict(store.read(as_of_batch=b))
        assert got == exp, f"batch {b}"


def test_point_in_time_join_left_keeps_dead_facts(store, spark):
    from distributed_vector_database_spark.operators.temporal import (
        point_in_time_join,
    )
    import pytest as _pytest

    store.delete([2])
    hist = store.history()
    facts = spark.createDataFrame([(2, 1)], "id long, b long")
    inner = point_in_time_join(facts, hist, keys=["id"], at_col="b")
    left = point_in_time_join(
        facts, hist, keys=["id"], at_col="b", how="left"
    )
    assert inner.count() == 0
    rows = left.collect()
    assert len(rows) == 1 and rows[0]["payload"] is None
    with _pytest.raises(ValueError, match="how"):
        point_in_time_join(facts, hist, keys=["id"], at_col="b", how="full")


def test_point_in_time_join_timestamp_typed_as_of(spark):
    """ADVICE r9: the open interval must be modeled as `to IS NULL`, not a
    numeric +inf sentinel — a timestamp-typed as-of column is the other
    common PIT shape and must join correctly."""
    from distributed_vector_database_spark.operators.temporal import (
        point_in_time_join,
    )

    hist = spark.createDataFrame(
        [
            (1, "old", "2024-01-01 00:00:00", "2024-06-01 00:00:00"),
            (1, "new", "2024-06-01 00:00:00", None),
        ],
        "id long, payload string, vfrom string, vto string",
    ).selectExpr(
        "id",
        "payload",
        "CAST(vfrom AS TIMESTAMP) AS vfrom",
        "CAST(vto AS TIMESTAMP) AS vto",
    )
    facts = spark.createDataFrame(
        [(1, "2024-03-15 12:00:00"), (1, "2024-07-01 00:00:00")],
        "id long, at string",
    ).selectExpr("id", "CAST(at AS TIMESTAMP) AS at")
    got = {
        str(r["at"]): r["payload"]
        for r in point_in_time_join(
            facts, hist, keys=["id"], at_col="at",
            from_col="vfrom", to_col="vto",
        ).collect()
    }
    assert got == {
        "2024-03-15 12:00:00": "old",
        "2024-07-01 00:00:00": "new",
    }


def test_point_in_time_join_rejects_colliding_payload_columns(spark):
    """ADVICE r9: a dim payload column named like a fact column would emit
    a duplicate output column — the join must refuse it loudly."""
    from distributed_vector_database_spark.operators.temporal import (
        point_in_time_join,
    )
    import pytest as _pytest

    hist = spark.createDataFrame(
        [(1, "x", 0, None)],
        "id long, b string, valid_from_batch long, valid_to_batch long",
    )
    facts = spark.createDataFrame([(1, 1)], "id long, b long")
    with _pytest.raises(ValueError, match="collide.*\\['b'\\]"):
        point_in_time_join(facts, hist, keys=["id"], at_col="b")


def test_concurrent_append_one_writer_loses_loudly(store, spark):
    """Optimistic concurrency (VERDICT r11 item 6): two writers race the
    same batch slot — the commit rename arbitrates, exactly one lands
    delta/bN, the loser raises ConcurrentWriteConflict with its prepared
    temp cleaned up and the store untouched by it. The legacy
    FileSystem.rename hazard (loser's temp silently NESTING inside the
    winner's committed batch) must never occur."""
    import os

    from unittest import mock

    from distributed_vector_database_spark.sources.mor import (
        ConcurrentWriteConflict,
    )

    a_rows = spark.createDataFrame(
        [(5, "writer_A")], "id long, payload string"
    )
    b_rows = spark.createDataFrame(
        [(5, "writer_B")], "id long, payload string"
    )
    # writer B reads the store state (high id 0), then writer A commits
    # b1 inside B's read->commit window: B's first _delta_dirs call
    # returns the STALE pre-A listing, everything after is live
    real_listing = store._delta_dirs
    calls = {"n": 0}

    def stale_once():
        calls["n"] += 1
        if calls["n"] == 1:
            return []  # B's optimistic read, before A committed
        return real_listing()

    assert store.append(a_rows) == 1  # writer A wins the slot
    with mock.patch.object(store, "_delta_dirs", side_effect=stale_once):
        with pytest.raises(ConcurrentWriteConflict, match="batch 1"):
            store.append(b_rows)

    # the loser left nothing behind: no temp litter, no nested dir, and
    # the read is exactly the winner's state
    delta_root = os.path.join(store.root, "delta")
    assert sorted(os.listdir(delta_root)) == ["b00000001"]
    assert not any(
        n.endswith(".writing") for n in os.listdir("%s/b00000001" % delta_root)
    )
    got = _as_dict(store.read())
    assert got[5] == "writer_A"


def test_concurrent_append_retry_commits_after_winner(store, spark):
    """The standard OCC retry: append(max_retries=1) re-reads the high
    id after losing and lands at a HIGHER batch than the winner — so
    keep-latest precedence follows commit order, and the retried
    writer's overlapping rows win the merged view."""
    from unittest import mock

    a_rows = spark.createDataFrame(
        [(5, "writer_A"), (6, "writer_A")], "id long, payload string"
    )
    b_rows = spark.createDataFrame(
        [(5, "writer_B"), (7, "writer_B")], "id long, payload string"
    )
    real_listing = store._delta_dirs
    calls = {"n": 0}

    def stale_once():
        calls["n"] += 1
        if calls["n"] == 1:
            return []
        return real_listing()

    assert store.append(a_rows) == 1
    with mock.patch.object(store, "_delta_dirs", side_effect=stale_once):
        assert store.append(b_rows, max_retries=1) == 2  # after the winner

    got = _as_dict(store.read())
    assert got[5] == "writer_B"  # retried commit outranks the winner
    assert got[6] == "writer_A" and got[7] == "writer_B"
    assert len(got) == 20  # ids 5/6/7 are updates of base rows, not inserts


def test_concurrent_compaction_refuses_loudly(store, spark):
    """Two concurrent folds would double-delete folded deltas and
    collide on the base swap, so compact()/vacuum() arbitrate through
    an atomic .compact_lock — the second compactor refuses loudly; a
    clean fold releases the lock."""
    import os

    from distributed_vector_database_spark.sources.mor import (
        ConcurrentWriteConflict,
    )

    store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    lock = os.path.join(store.root, ".compact_lock")
    with open(lock, "w"):
        pass  # a fold in flight (or died mid-fold)
    with pytest.raises(ConcurrentWriteConflict, match="compact_lock"):
        store.compact()
    with pytest.raises(ConcurrentWriteConflict, match="compact_lock"):
        store.vacuum(0)
    os.remove(lock)  # the documented manual step for a dead holder
    out = store.compact()
    assert out["folded_batches"] == 1
    assert not os.path.exists(lock)  # released after a clean fold
    assert _as_dict(store.read())[1] == "v1_1"


def test_write_base_refuses_while_deltas_exist(store, spark):
    """Replacing only the base while deltas exist would leave the stale
    deltas outranking every replacement row (higher batch ids than the
    reset watermark) — write_base refuses loudly; after compact() the
    bootstrap path reopens."""
    store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    fresh = spark.createDataFrame([(1, "NEW")], "id long, payload string")
    with pytest.raises(ValueError, match="outrank"):
        store.write_base(fresh)
    assert _as_dict(store.read())[1] == "v1_1"  # store untouched
    store.compact()
    store.write_base(fresh)  # no deltas left -> legitimate re-bootstrap
    assert _as_dict(store.read()) == {1: "NEW"}


def test_truly_concurrent_appends_commit_distinct_batches(store, spark):
    """A REAL race (two threads, no simulation): both writers append
    concurrently with the OCC retry enabled. Whatever the interleaving,
    both must commit, at DISTINCT batch ids, with no temp litter and
    both rows present — the arbitration can cost a loser a retry but
    never data."""
    import os
    import threading

    a_rows = spark.createDataFrame(
        [(101, "writer_A")], "id long, payload string"
    )
    b_rows = spark.createDataFrame(
        [(102, "writer_B")], "id long, payload string"
    )
    results, errors = {}, []
    barrier = threading.Barrier(2)

    def run(name, rows):
        try:
            barrier.wait()
            results[name] = store.append(rows, max_retries=5)
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((name, e))

    threads = [
        threading.Thread(target=run, args=("A", a_rows)),
        threading.Thread(target=run, args=("B", b_rows)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert sorted(results.values()) == [1, 2]  # distinct consecutive ids
    delta_root = os.path.join(store.root, "delta")
    assert sorted(os.listdir(delta_root)) == ["b00000001", "b00000002"]
    got = _as_dict(store.read())
    assert got[101] == "writer_A" and got[102] == "writer_B"


def test_fold_orders_watermark_before_flip_and_deletes(store, spark):
    """ADVICE r12: a lock-free append that lists delta/ after the fold's
    deletes but read the OLD watermark would mint a batch id at or below
    the folded base's stamp — silently outranked. The fold therefore
    advances the watermark BEFORE the pointer flip, which itself precedes
    every delta delete; spied here at the commit point."""
    store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    store.append(
        spark.createDataFrame([(2, "v2_2")], "id long, payload string")
    )
    seen = {}
    orig = store._flip_pointer

    def spy(version):
        seen["watermark"] = store._read_watermark()
        seen["deltas"] = [b for b, _ in store._delta_dirs()]
        orig(version)

    store._flip_pointer = spy
    info = store.compact()
    store._flip_pointer = orig
    assert seen["watermark"] == info["watermark"] == 2
    assert seen["deltas"] == [1, 2]  # folded deltas intact at commit time


def test_reader_sees_intact_base_at_every_fold_stage(store, spark):
    """VERDICT r12 item 3 (reader-vs-compact isolation): the base is
    committed by version-pointer flip, never by renaming the live dir, so
    a read at EVERY stage of the fold — new version written but pointer
    old / pointer flipped with deltas still on disk / fold complete —
    resolves an intact base and returns the exact keep-latest rows."""
    store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    store.delete([0])
    expected = {i: f"v0_{i}" for i in range(2, 20)}
    expected[1] = "v1_1"
    stages = {}
    orig = store._flip_pointer

    def spy(version):
        stages["pre_flip"] = _as_dict(store.read())
        orig(version)
        stages["post_flip_deltas_intact"] = _as_dict(store.read())

    store._flip_pointer = spy
    store.compact()
    store._flip_pointer = orig
    stages["post_fold"] = _as_dict(store.read())
    for stage, got in stages.items():
        assert got == expected, stage


def test_looping_reader_during_compact_never_loses_base(store, spark):
    """A reader loops read()+collect while compact() commits base swaps.
    The version-pointer commit (+ one retained superseded version) keeps
    the BASE intact for every resolve; a listed delta dir can still
    vanish at the fold's tail inside the bounded grace window — the
    reader retries those like any lakehouse client. Every read that
    completes must be exactly the keep-latest rows; a base-path failure
    or a wrong result fails the test."""
    import threading

    for i in range(3):
        store.append(
            spark.createDataFrame(
                [(i, f"u{i}")], "id long, payload string"
            )
        )
    expected = {i: f"v0_{i}" for i in range(3, 20)}
    expected.update({0: "u0", 1: "u1", 2: "u2"})
    stop = threading.Event()
    bad, reads = [], {"n": 0}

    def reader():
        while not stop.is_set():
            try:
                got = _as_dict(store.read())
            except Exception as exc:
                if "delta" in str(exc):
                    continue  # vanished delta file: documented grace
                bad.append(("base-error", str(exc)[:500]))
                break
            if got != expected:
                bad.append(("wrong-result", got))
                break
            reads["n"] += 1

    t = threading.Thread(target=reader)
    t.start()
    try:
        for _ in range(3):
            # same-value upsert: the merged view stays constant while the
            # fold rewrites + swaps the base underneath the reader
            store.append(
                spark.createDataFrame(
                    [(1, "u1")], "id long, payload string"
                )
            )
            store.compact()
    finally:
        stop.set()
        t.join()
    assert not bad, bad[0]
    assert reads["n"] > 0  # the loop genuinely overlapped the folds


def test_write_base_detects_mid_replace_append(store, spark):
    """ADVICE r12: the delta-existence guard was check-then-act. A
    lock-free append that commits while write_base replaces the base is
    now caught by the post-flip re-check and surfaced loudly; the
    replacement base IS committed and keep-latest still holds (the
    racer's delta outranks batch 0)."""
    from distributed_vector_database_spark.sources.mor import (
        ConcurrentWriteConflict,
    )

    fresh = spark.createDataFrame([(1, "NEW")], "id long, payload string")
    racer = spark.createDataFrame([(1, "racer")], "id long, payload string")
    orig = store._flip_pointer

    def racy_flip(version):
        orig(version)
        store.append(racer)  # lock-free append lands mid-replace

    store._flip_pointer = racy_flip
    with pytest.raises(ConcurrentWriteConflict, match="outrank"):
        store.write_base(fresh)
    store._flip_pointer = orig
    assert _as_dict(store.read())[1] == "racer"


def test_write_base_arbitrates_through_compact_lock(store, spark):
    """write_base shares the compact lock: interleaving with a live fold
    would race the base version sequence."""
    import os

    from distributed_vector_database_spark.sources.mor import (
        ConcurrentWriteConflict,
    )

    lock = os.path.join(store.root, ".compact_lock")
    with open(lock, "w"):
        pass
    fresh = spark.createDataFrame([(1, "NEW")], "id long, payload string")
    with pytest.raises(ConcurrentWriteConflict, match="compact_lock"):
        store.write_base(fresh)
    os.remove(lock)
    store.write_base(fresh)
    assert _as_dict(store.read()) == {1: "NEW"}


def test_legacy_bare_base_layout_reads_and_migrates(store, spark):
    """A pre-pointer store (bare base/ dir, no _base_version) still
    reads; the first fold migrates it to the versioned layout, retaining
    the legacy dir one fold for in-flight readers, and the second fold
    vacuums it."""
    import os

    v = store._read_base_version()
    os.rename(f"{store.root}/base_v{v:08d}", f"{store.root}/base")
    os.remove(f"{store.root}/_base_version")
    assert _as_dict(store.read()) == {i: f"v0_{i}" for i in range(20)}

    store.append(
        spark.createDataFrame([(1, "v1_1")], "id long, payload string")
    )
    store.compact()
    assert store._read_base_version() == 1
    assert os.path.isdir(f"{store.root}/base")  # retained one fold
    assert _as_dict(store.read())[1] == "v1_1"

    store.append(
        spark.createDataFrame([(2, "v2_2")], "id long, payload string")
    )
    store.compact()
    assert store._read_base_version() == 2
    assert not os.path.exists(f"{store.root}/base")  # vacuumed
    dirs = sorted(
        d for d in os.listdir(store.root) if d.startswith("base_v")
    )
    # current + one retained previous version, nothing older
    assert dirs == ["base_v00000001", "base_v00000002"]
    got = _as_dict(store.read())
    assert got[1] == "v1_1" and got[2] == "v2_2"
