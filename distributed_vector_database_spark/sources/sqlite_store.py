"""Spark Python DataSource for the reference's on-disk storage format:
a directory of ``shard_{i}.sqlite3`` files, each holding

    CREATE TABLE vectors (id TEXT PRIMARY KEY, vector_json TEXT NOT NULL)

(`reference: src/storage_server.py:10-22` — ids are TEXT, vectors are
JSON-encoded float lists, one SQLite file per storage shard). This
connector is the MIGRATION PATH: a user of the reference points Spark at
their existing ``data/`` directory and every query in this engine runs
over it unchanged — and can export any (id, embedding, shard_id) frame
back into the same files.

Spark-first shape (Spark 4 Python DataSource API):
  - one input partition PER SHARD FILE, so shard-parallel reads mirror
    the reference's shard-parallel fan-out (`src/compute_server.py:
    107-138`) and a 256-shard store reads with 256-way parallelism;
  - ``id`` equality/IN filters are PUSHED into SQLite as indexed WHERE
    clauses (``id`` is the PRIMARY KEY, so a point lookup touches one
    B-tree per shard instead of scanning — the exact GET /get semantics,
    `src/storage_server.py:53-60`);
  - writes go through tmp files renamed on driver-side commit (task
    failures leave no partial shard; abort removes tmps). Callers
    repartition by shard_id so each task owns whole shards.

At 100 TB one would not STORE in SQLite — the parquet layouts elsewhere
in `sources/` are the scale path — but reading a legacy store in place,
shard-parallel, is exactly what a migration needs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

__all__ = [
    "SqliteVectorShards",
    "register",
    "read_shards",
    "write_shards",
    "stream_shards",
]

SCHEMA = "id string, embedding array<double>, shard_id int"


def _shard_files(path: str) -> list[tuple[int, str]]:
    out = []
    for f in sorted(os.listdir(path)):
        if f.startswith("shard_") and f.endswith(".sqlite3"):
            sid = int(f[len("shard_") : -len(".sqlite3")])
            out.append((sid, os.path.join(path, f)))
    return out


class _ShardReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sqlite_vector_shards requires option 'path'")
        self.id_values: list[str] | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("id",):
                values = [f.value]
            elif isinstance(f, In) and f.attribute == ("id",):
                values = list(f.value)
            else:
                yield f  # unsupported -> Spark evaluates it post-scan
                continue
            # A conjunction of consumed id predicates must INTERSECT, not
            # overwrite: id IN ('1','2') AND id IN ('2','3') selects {'2'}.
            if self.id_values is None:
                self.id_values = values
            else:
                keep = set(values)
                self.id_values = [v for v in self.id_values if v in keep]

    def partitions(self):
        return [InputPartition(sf) for sf in _shard_files(self.path)]

    def read(self, partition):
        import json
        import sqlite3

        sid, file = partition.value
        if self.id_values is not None and not self.id_values:
            return  # contradictory id predicates -> empty scan
        con = sqlite3.connect(file)
        try:
            if self.id_values is not None:
                ph = ",".join("?" for _ in self.id_values)
                cur = con.execute(
                    f"SELECT id, vector_json FROM vectors WHERE id IN ({ph})",
                    self.id_values,
                )
            else:
                cur = con.execute("SELECT id, vector_json FROM vectors")
            for id_, vj in cur:
                yield (id_, [float(x) for x in json.loads(vj)], sid)
        finally:
            con.close()


@dataclass
class _WriteMessage(WriterCommitMessage):
    renames: list = field(default_factory=list)  # [(tmp_path, final_path)]


class _ShardWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sqlite_vector_shards requires option 'path'")
        if not overwrite:
            raise ValueError(
                "sqlite_vector_shards writes whole shard files; use "
                "mode('overwrite') (REPLACE-by-id appends belong to the "
                "reference's live server, not a bulk export)"
            )

    def write(self, rows):
        import json
        import sqlite3
        import uuid

        by_shard: dict[int, list[tuple[str, str]]] = {}
        for row in rows:
            by_shard.setdefault(int(row["shard_id"]), []).append(
                (str(row["id"]), json.dumps([float(x) for x in row["embedding"]]))
            )
        renames = []
        for sid, items in by_shard.items():
            final = os.path.join(self.path, f"shard_{sid}.sqlite3")
            tmp = final + f".tmp-{uuid.uuid4().hex[:12]}"
            con = sqlite3.connect(tmp)
            try:
                con.execute(
                    "CREATE TABLE IF NOT EXISTS vectors ("
                    "id TEXT PRIMARY KEY, vector_json TEXT NOT NULL)"
                )
                con.executemany(
                    "REPLACE INTO vectors (id, vector_json) VALUES (?, ?)",
                    items,
                )
                con.commit()
            finally:
                con.close()
            renames.append((tmp, final))
        return _WriteMessage(renames=renames)

    def commit(self, messages):
        all_renames = [r for m in messages if m for r in m.renames]
        finals = [f for _, f in all_renames]
        dups = {f for f in finals if finals.count(f) > 1}
        if dups:
            for t, _ in all_renames:
                os.remove(t)
            raise ValueError(
                f"multiple tasks wrote the same shard file(s) {sorted(dups)}; "
                "repartition the frame by shard_id before writing "
                "(write_shards does this)"
            )
        for tmp, final in all_renames:
            os.replace(tmp, final)

    def abort(self, messages):
        for m in messages:
            if m:
                for tmp, _ in m.renames:
                    if os.path.exists(tmp):
                        os.remove(tmp)


class _ShardStreamReader(SimpleDataSourceStreamReader):
    """Streaming CDC over a live reference store: each micro-batch emits
    the rows whose SQLite ``rowid`` rose above the per-shard high-water
    mark since the last batch — the offset is ``{"rowid": {shard: max}}``.

    The reference's writes are ``REPLACE INTO`` (src/storage_server.py:
    43-46): SQLite implements REPLACE as delete+insert, so an update
    surfaces here as a NEW row for the same id — downstream applies
    keep-latest (`vector_store.upsert_keep_latest` / `MorStore`) exactly
    like any CDC feed. ``readBetweenOffsets`` replays committed ranges by
    rowid (stable once written); rows surfaced by the re-verify paths
    below replay with their CURRENT content, so the source is
    exactly-once for append-only writes and at-least-once (keep-latest
    absorbed) under concurrent rewrites.

    Known edge (inherent to rowid watermarks): SQLite assigns
    max(rowid)+1, so a batch that DELETEs the shard's max row can reuse
    rowids at-or-below the watermark for its re-INSERTs, which
    ``rowid > watermark`` never sees. Two verify levels
    (``option("verify", ...)``):

    - ``"tip"`` (default): the offset carries a content fingerprint of
      the single row AT the watermark (``{"tip": {shard: sha1(...)}}``);
      each read re-reads that row and re-emits it on divergence. Covers
      the common case — REPLACE of the current max row — but NOT a
      multi-row delete-then-reinsert that reuses rowids strictly below
      the watermark.
    - ``"full"``: the offset additionally carries an order-insensitive
      64-bit content checksum of the ENTIRE sub-watermark region
      (``{"sum": {shard: int}}``); each read recomputes it (O(region)
      per shard, driver-side) and re-emits the whole region on
      divergence. Closes the multi-row hole at re-scan cost.

    A production feed would add a monotone version column, which the
    reference's schema lacks — these verify modes are the best a
    versionless rowid store admits.

    Scale shape: this simple reader tails CHANGES (driver-side, small);
    bulk backfill is the batch reader's shard-parallel job. The pairing —
    parallel snapshot + sequential tail — is the standard migration
    topology.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sqlite_vector_shards requires option 'path'")
        self.verify = options.get("verify", "tip")
        if self.verify not in ("tip", "full"):
            raise ValueError(
                f"verify must be 'tip' or 'full', got {self.verify!r}"
            )

    def initialOffset(self) -> dict:
        return {"rowid": {}, "tip": {}, "sum": {}}

    @staticmethod
    def _fingerprint(id_: str, vector_json: str) -> str:
        import hashlib

        return hashlib.sha1(
            f"{id_}\x00{vector_json}".encode()
        ).hexdigest()

    @classmethod
    def _fp64(cls, id_: str, vector_json: str) -> int:
        # order-insensitive region checksum term: 64 bits of the row
        # fingerprint, summed mod 2^64 across rows
        return int(cls._fingerprint(id_, vector_json)[:16], 16)

    def _region_sum(self, con, watermark: int) -> int:
        total = 0
        for id_, vj in con.execute(
            "SELECT id, vector_json FROM vectors WHERE rowid <= ?",
            (watermark,),
        ):
            total = (total + self._fp64(id_, vj)) % (1 << 64)
        return total

    def _scan(self, lo: dict, hi: dict | None, lo_tip: dict, lo_sum: dict):
        import json
        import sqlite3

        rows = []
        new = {}
        new_tip = {}
        new_sum = {}
        for sid, f in _shard_files(self.path):
            start = int(lo.get(str(sid), 0))
            stop = None if hi is None else int(hi.get(str(sid), start))
            con = sqlite3.connect(f)
            try:
                # Watermark re-verify (see class docstring): REPLACE of
                # the max-rowid row reuses its rowid, so the plain
                # `rowid > start` scan misses it. Re-read the one row AT
                # the watermark and emit it when its content diverged
                # from the fingerprint recorded in the offset.
                tip_fp = lo_tip.get(str(sid))
                resnapshot = False
                if self.verify == "full" and start > 0:
                    # order-insensitive checksum of the whole region at or
                    # below the watermark: any delete-then-reinsert that
                    # reused rowids below the watermark diverges it
                    cur_sum = self._region_sum(con, start)
                    rec = lo_sum.get(str(sid))
                    if rec is not None and cur_sum != int(rec):
                        resnapshot = True
                        for id_, vj in con.execute(
                            "SELECT id, vector_json FROM vectors "
                            "WHERE rowid <= ? ORDER BY rowid",
                            (start,),
                        ):
                            rows.append(
                                (
                                    id_,
                                    [float(x) for x in json.loads(vj)],
                                    sid,
                                )
                            )
                if start > 0 and not resnapshot:
                    r = con.execute(
                        "SELECT id, vector_json FROM vectors "
                        "WHERE rowid = ?",
                        (start,),
                    ).fetchone()
                    if r is not None:
                        fp = self._fingerprint(r[0], r[1])
                        if tip_fp is not None and fp != tip_fp:
                            rows.append(
                                (
                                    r[0],
                                    [float(x) for x in json.loads(r[1])],
                                    sid,
                                )
                            )
                        tip_fp = fp
                if stop is None:
                    cur = con.execute(
                        "SELECT rowid, id, vector_json FROM vectors "
                        "WHERE rowid > ? ORDER BY rowid",
                        (start,),
                    )
                else:
                    cur = con.execute(
                        "SELECT rowid, id, vector_json FROM vectors "
                        "WHERE rowid > ? AND rowid <= ? ORDER BY rowid",
                        (start, stop),
                    )
                mx = start
                for rowid, id_, vj in cur:
                    rows.append(
                        (id_, [float(x) for x in json.loads(vj)], sid)
                    )
                    mx = rowid
                    tip_fp = self._fingerprint(id_, vj)
                new[str(sid)] = mx if stop is None else stop
                if tip_fp is not None:
                    new_tip[str(sid)] = tip_fp
                if self.verify == "full":
                    new_sum[str(sid)] = self._region_sum(
                        con, new[str(sid)]
                    )
            finally:
                con.close()
        return rows, new, new_tip, new_sum

    def read(self, start: dict):
        rows, new, new_tip, new_sum = self._scan(
            start.get("rowid", {}),
            None,
            start.get("tip", {}),
            start.get("sum", {}),
        )
        return iter(rows), {"rowid": new, "tip": new_tip, "sum": new_sum}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replays the same re-verify decisions against the live store:
        # rowids are stable once written, so the range scan is exact; rows
        # surfaced by the tip/region re-verify replay with their CURRENT
        # content (at-least-once under concurrent rewrites — absorbed by
        # keep-latest).
        rows, _, _, _ = self._scan(
            start.get("rowid", {}),
            end.get("rowid", {}),
            start.get("tip", {}),
            start.get("sum", {}),
        )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's checkpoint, nothing to ack


class SqliteVectorShards(DataSource):
    """``spark.read.format("sqlite_vector_shards").option("path", dir)``"""

    @classmethod
    def name(cls) -> str:
        return "sqlite_vector_shards"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return _ShardReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _ShardWriter(self.options, overwrite)

    def simpleStreamReader(self, schema):
        return _ShardStreamReader(self.options)


_REGISTERED: set[int] = set()


def register(spark) -> None:
    """Idempotently register the data source with this session (and turn
    on Python-data-source filter pushdown, off by default in Spark 4.1,
    so the id-filter reaches SQLite's primary-key B-tree)."""
    key = id(spark)
    if key not in _REGISTERED:
        # The reader/writer classes are cloudpickled to Python workers,
        # which may not have this package on sys.path (e.g. a driver
        # script run from elsewhere) — serialize the module BY VALUE so
        # the pickle is self-contained.
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(SqliteVectorShards)
        _REGISTERED.add(key)


def read_shards(spark, path: str):
    """DataFrame over a reference-format shard directory:
    ``(id string, embedding array<double>, shard_id int)``."""
    register(spark)
    return (
        spark.read.format("sqlite_vector_shards").option("path", path).load()
    )


def write_shards(df, path: str) -> None:
    """Export ``(id, embedding, shard_id)`` to reference-format shard
    files (one SQLite file per distinct shard_id, commit-renamed)."""
    register(df.sparkSession)
    os.makedirs(path, exist_ok=True)
    (
        df.select("id", "embedding", "shard_id")
        .repartition("shard_id")
        .write.format("sqlite_vector_shards")
        .option("path", path)
        .mode("overwrite")
        .save()
    )


def stream_shards(spark, path: str, *, verify: str = "tip"):
    """Streaming DataFrame tailing a reference-format shard directory:
    every new / replaced row arrives as a micro-batch row (CDC feed).
    Same ``(id, embedding, shard_id)`` schema as :func:`read_shards`.
    ``verify``: "tip" (default, cheap) or "full" (region checksum that
    also catches multi-row rowid reuse below the watermark) — see
    `_ShardStreamReader`."""
    register(spark)
    return (
        spark.readStream.format("sqlite_vector_shards")
        .option("path", path)
        .option("verify", verify)
        .load()
    )
