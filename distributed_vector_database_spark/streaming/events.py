"""Structured Streaming operators over the events schema.

The reference has NO streaming surface (SURVEY.md §2.9) — ingest is a
synchronous HTTP POST loop (`reference: src/test.py:97-98`). This module is
the beyond-reference extension: the same windowed aggregations the batch
operators compute, expressed so ONE definition serves both batch and
streaming DataFrames (pass either; Spark plans micro-batch state handling
automatically for streams).

Late data: ``tumbling_counts`` applies a watermark when the input is
streaming — state for windows older than the watermark is dropped, bounding
memory at 100 TB/day rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_event_stream",
    "dedup_stream",
    "tumbling_counts",
    "session_window_stats",
    "stateful_user_totals",
    "stateful_user_totals_tws",
    "join_event_streams",
    "run_stream_to_batch",
    "stream_cms_counts",
    "read_cms",
    "stream_hdr_hist",
    "read_hdr_hist",
    "stream_event_transitions",
    "read_transition_counts",
]

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    directory: str,
    *,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source event stream: new parquet files in ``directory`` become
    micro-batches (the Spark-native replacement for the reference's per-record
    HTTP ingest). ``max_files_per_trigger=None`` drops the cap — all
    available files arrive in the first micro-batch (the replay-to-batch
    fast path; per-batch spin-up dominates when batches are tiny)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
    *,
    slide: str | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per (time window, event_type): count + exact DECIMAL value sum.

    ``slide=None`` gives tumbling windows; a slide shorter than the
    window gives OVERLAPPING sliding windows (each event expands into
    window/slide copies JVM-side — the same Expand the batch
    `sliding_window_counts` query plans).

    Works on batch or streaming input; watermark applied only for streams.
    ``watermark=None`` keeps all window state forever — exact for replays
    whose arrival order is not time-ordered (historical backfill), at the
    cost of unbounded state; leave the default for live feeds.
    """
    if events.isStreaming and watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide)
        if slide is not None
        else F.window(ts_col, window)
    )
    return events.groupBy(win.alias("w"), F.col(type_col)).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        type_col,
        "n_events",
        "sum_value",
    )


def dedup_stream(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    within_watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication: each key's FIRST arrival is emitted,
    later duplicates are dropped across micro-batches (the streaming form
    of the batch ``dedup_exact`` operator; the reference gets this only as
    SQLite REPLACE-on-id, `reference: src/storage_server.py:43-46`).

    Default keeps one state entry per key forever — exact, but state grows
    with |keys|. Pass ``within_watermark`` (e.g. ``"2 hours"``) to bound
    state via ``dropDuplicatesWithinWatermark``: duplicates are only
    guaranteed dropped when they arrive within the watermark delay of the
    first occurrence — the standard at-scale trade (bounded state, dedup
    window instead of global exactness).

    Works on batch frames too (plain dropDuplicates) so one definition
    serves both, same as ``tumbling_counts``.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    if within_watermark:
        return events.withWatermark(
            ts_col, within_watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user running event count and exact cents total, re-emitted each
    micro-batch the user appears in.

    This is the arbitrary-state API the built-in windows can't express
    (cross-batch per-key accumulators with explicit state schema). Money
    math is integer cents in state so accumulation order can never change
    the result. State is one (long, long) pair per user — bounded, and
    evictable via timeouts if keys churn.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_cents long"
    state_schema = "n long, cents long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += int(len(pdf))
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "60 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream INNER join: pair each left event with every right
    event of the same key whose timestamp lands in ``[left.ts, left.ts +
    within]`` — e.g. purchases attributable to a preceding click. The
    batch form of this semantics is ``operators/temporal.range_join``; one
    definition here serves streaming AND batch frames like the rest of
    this module.

    State: an inner stream-stream join is complete without watermarks but
    buffers both sides forever; pass ``watermark`` (applied to both sides,
    which with the interval condition lets Spark evict rows older than
    watermark + within) for bounded state on live feeds. Leave ``None``
    for historical replays where files arrive out of time order — exact
    results, unbounded state (SURVEY.md §2.9 extension; same replay-vs-live
    trade documented on ``tumbling_counts``/``dedup_stream``).

    Output columns: key, left ``event_id``/``ts`` as ``left_id``/``left_ts``,
    right as ``right_id``/``right_ts``.
    """
    if left.isStreaming and watermark is not None:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming and watermark is not None:
        right = right.withWatermark(ts_col, watermark)
    l = left.select(
        F.col(key_col).alias("k"),
        F.col("event_id").alias("left_id"),
        F.col(ts_col).alias("left_ts"),
    )
    r = right.select(
        F.col(key_col).alias("rk"),
        F.col("event_id").alias("right_id"),
        F.col(ts_col).alias("right_ts"),
    )
    cond = (
        (l["k"] == r["rk"])
        & (r["right_ts"] >= l["left_ts"])
        & (r["right_ts"] <= l["left_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("k").alias(key_col), "left_id", "left_ts", "right_id", "right_ts"
    )


def run_stream_to_batch(
    stream_df: DataFrame,
    *,
    final_keys: list[str] | None = None,
    latest_by: str | None = None,
    output_mode: str = "update",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion against a memory sink and
    return the result as a batch DataFrame.

    With ``final_keys``, update-mode re-emissions are collapsed to each
    key's FINAL state: the row maximizing ``latest_by`` (which must be a
    monotone accumulator, e.g. a running count — sink row order is not a
    contract to rely on).

    ``shuffle_partitions`` temporarily overrides
    ``spark.sql.shuffle.partitions`` for the stream run: a stateful
    streaming query pays per-micro-batch state-store overhead on EVERY
    shuffle partition, so a bounded replay (small state, few batches) wants
    far fewer partitions than a batch shuffle does. The session conf is
    restored afterwards. A live deployment sizes this to cluster cores ×
    state volume instead.
    """
    import uuid

    spark = stream_df.sparkSession
    name = f"stream_{uuid.uuid4().hex[:12]}"
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set(conf_key, saved)
    out = spark.table(name)
    if final_keys:
        if not latest_by:
            raise ValueError("final_keys requires latest_by")
        from pyspark.sql import Window

        w = Window.partitionBy(*final_keys).orderBy(F.desc(latest_by))
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return out


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user gap-based session windows via Spark's native session_window
    (stream-capable form of operators/sessions.py's sessionize; window end =
    last event + gap by session_window semantics)."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
    ).agg(F.count("*").alias("n_events")).select(
        F.col(user_col),
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


def _tws_available() -> bool:
    """transformWithStateInPandas speaks protobuf to its state server;
    the dependency is optional in this environment."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """`stateful_user_totals` on Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState`` (typed state
    handles, timers, TTL, state evolvable between runs). Same contract:
    per-user running event count and exact integer-cents total,
    re-emitted each micro-batch the user appears in.

    State is ONE ValueState tuple per user held in the RocksDB state
    store (the provider transformWithState requires — incremental
    checkpointing, state far larger than executor memory; set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` on the session).

    Requires ``protobuf`` (the transformWithState worker protocol);
    raises ImportError with guidance when absent — the
    ``applyInPandasWithState`` twin above has no extra dependency and
    computes the same result.
    """
    if not _tws_available():
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package; "
            "use stateful_user_totals (applyInPandasWithState) in "
            "environments without it"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            n, cents = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                n += int(len(pdf))
                cents += int(
                    (pdf["value"] * 100).round().astype("int64").sum()
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType="user_id long, n_events long, total_cents long",
        outputMode="Update",
        timeMode="None",
    )


def stream_cms_counts(
    event_stream: DataFrame,
    state_dir: str,
    *,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Incrementally-maintained Count-Min registers over an event stream:
    each micro-batch writes its batch-local sketch (one partial-aggregated
    groupBy, <= depth*width rows), and the merged view re-sums registers at
    read time. Registers are SUMS, so stream-built == batch-built for ANY
    chunking — the same associativity that makes the sketch mergeable
    across sources makes it maintainable from a live feed.

    State layout mirrors `streaming/docs.stream_bigram_counts`: per-batch
    ``batch=<id>`` dirs written with overwrite, so an at-least-once
    foreachBatch retry replaces, never duplicates, its partial. Returns the
    merged register frame after running the stream to completion; a live
    pipeline queries :func:`read_cms` without touching the ingest.
    """
    import os

    from distributed_vector_database_spark.operators.sketch import cms_build

    spark = event_stream.sparkSession
    regs_path = os.path.join(state_dir, "cms_registers")
    ckpt_path = os.path.join(state_dir, "_cms_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cms_build(
            batch_df,
            key_col,
            depth=depth,
            width=width,
            weight_col=weight_col,
        ).write.mode("overwrite").parquet(
            os.path.join(regs_path, f"batch={batch_id}")
        )

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_cms(spark, state_dir)


def read_cms(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge-on-read view of the stream-maintained CMS: sum the per-batch
    register partials per (row, bucket) — `sketch.cms_merge` over the
    discovered ``batch=<id>`` partitions."""
    import os

    regs_path = os.path.join(state_dir, "cms_registers")
    return (
        spark.read.parquet(regs_path)
        .drop("batch")
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def stream_hdr_hist(
    event_stream: DataFrame,
    state_dir: str,
    *,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Incrementally-maintained HDR histogram registers over an event
    stream: each micro-batch writes its batch-local histogram (one
    partial-aggregated groupBy, <= ~960 rows per group), and the merged
    view re-sums registers at read time. Registers are SUMS — the same
    additivity as the CMS twin above — so stream-built == batch-built
    for ANY chunking, and live quantile reads
    (`sketch.hdr_quantiles(read_hdr_hist(...))`) never rescan the feed.

    ``value_col`` must already be the positive integral domain (cents),
    exactly as `sketch.hdr_hist_build` requires. State layout mirrors
    the other streaming sketches: per-batch ``batch=<id>`` overwrite
    dirs, at-least-once-retry safe.
    """
    import os

    from distributed_vector_database_spark.operators.sketch import (
        hdr_hist_build,
    )

    spark = event_stream.sparkSession
    groups = group_cols or []
    regs_path = os.path.join(state_dir, "hdr_registers")
    ckpt_path = os.path.join(state_dir, "_hdr_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        hdr_hist_build(
            batch_df, value_col, group_cols=groups
        ).write.mode("overwrite").parquet(
            os.path.join(regs_path, f"batch={batch_id}")
        )

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_hdr_hist(spark, state_dir, group_cols=groups)


def read_hdr_hist(
    spark: SparkSession,
    state_dir: str,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge-on-read view of the stream-maintained HDR histogram: sum the
    per-batch register partials per (*group_cols, e, sub)."""
    import os

    groups = group_cols or []
    regs_path = os.path.join(state_dir, "hdr_registers")
    return (
        spark.read.parquet(regs_path)
        .drop("batch")
        .groupBy(*groups, "e", "sub")
        .agg(F.sum("cnt").alias("cnt"))
    )


def stream_hll_registers(
    event_stream: DataFrame,
    state_dir: str,
    *,
    key_col: str = "user_id",
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Incrementally-maintained HyperLogLog registers over an event
    stream — the distinct-count member of the streaming sketch family
    (CMS `stream_cms_counts`, HDR `stream_hdr_hist`), and the one with
    the STRONGEST delivery guarantee: registers merge by MAX, which is
    idempotent, so per-batch partials are written with plain APPEND — an
    at-least-once foreachBatch retry appends a duplicate partial and the
    merge-on-read max absorbs it. No per-batch overwrite dirs, no batch
    bookkeeping (the sum-merged sketches need both). stream == batch for
    ANY chunking because max is associative/commutative/idempotent.

    Returns the merged register frame after running the stream to
    completion; a live pipeline queries :func:`read_hll` without
    touching the ingest.
    """
    import os

    from distributed_vector_database_spark.operators.sketch import hll_build

    spark = event_stream.sparkSession
    regs_path = os.path.join(state_dir, "hll_registers")
    ckpt_path = os.path.join(state_dir, "_hll_checkpoint")
    groups = group_cols or []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        hll_build(batch_df, key_col, p=p, group_cols=groups).write.mode(
            "append"
        ).parquet(regs_path)

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_hll(spark, state_dir, group_cols=groups)


def read_hll(
    spark: SparkSession,
    state_dir: str,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge-on-read view of the stream-maintained HLL: max per register
    over every appended partial — `sketch.hll_merge` semantics over one
    flat directory. Before the first batch lands the state directory does
    not exist — return an EMPTY register frame (same guard as
    :func:`read_kmv` / `docs.read_bucket_owners`), so a live pipeline can
    query the estimate at any time."""
    import os

    groups = group_cols or []
    regs_path = os.path.join(state_dir, "hll_registers")
    try:
        raw = spark.read.parquet(regs_path)
    except Exception:
        schema = ", ".join(
            [f"{g} string" for g in groups] + ["reg long", "rank int"]
        )
        return spark.createDataFrame([], schema)
    return raw.groupBy(*groups, "reg").agg(F.max("rank").alias("rank"))


def stream_kmv_values(
    event_stream: DataFrame,
    state_dir: str,
    *,
    key_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Incrementally-maintained KMV distinct sketch over an event stream —
    the last member of the streaming sketch family (CMS sums, HDR sums,
    HLL max, now KMV k-smallest): each micro-batch APPENDS its
    batch-local k smallest distinct hash fractions; the merged view keeps
    the k smallest distinct values over all partials. Like the HLL twin,
    the merge (distinct union + top-k) is IDEMPOTENT, so plain appends
    are at-least-once safe with no overwrite protocol — a re-delivered
    partial is absorbed by the distinct.

    Correctness: every one of the GLOBAL k smallest hashes is among its
    own batch's k smallest, so the merged top-k equals the batch-built
    sketch exactly for ANY chunking. Returns the merged sketch after
    running the stream to completion; live pipelines read
    :func:`read_kmv`.
    """
    import os

    from distributed_vector_database_spark.operators.sketch import (
        kmv_sketch,
    )

    spark = event_stream.sparkSession
    vals_path = os.path.join(state_dir, "kmv_values")
    ckpt_path = os.path.join(state_dir, "_kmv_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        kmv_sketch(batch_df, key_col, k=k).write.mode("append").parquet(
            vals_path
        )

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_kmv(spark, state_dir, k=k)


def read_kmv(
    spark: SparkSession, state_dir: str, *, k: int = 64
) -> DataFrame:
    """Merge-on-read KMV sketch: k smallest DISTINCT hash fractions over
    every appended partial (TakeOrderedAndProject — never a global
    sort)."""
    import os

    vals_path = os.path.join(state_dir, "kmv_values")
    try:
        raw = spark.read.parquet(vals_path)
    except Exception:
        # no batch has landed yet — empty sketch (same guard as
        # read_bucket_owners / read_fp_owners)
        return spark.createDataFrame([], "_h double")
    return (
        raw.select("_h")
        .distinct()
        .orderBy(F.asc("_h"))
        .limit(k)
    )


def read_transition_counts(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Merge-on-read view of the stream-maintained transition counts:
    sum the per-batch (from_type, to_type) partials. Missing path ->
    empty frame."""
    import os

    path = os.path.join(state_dir, "transitions")
    try:
        raw = spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame(
            [], "from_type string, to_type string, n long"
        )
    return (
        raw.drop("batch")
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def stream_event_transitions(
    event_stream: DataFrame,
    state_dir: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_break_col: str = "event_id",
) -> DataFrame:
    """Incrementally-maintained Markov transition counts over an event
    stream — the streaming twin of `analytics.event_transition_matrix`,
    and the op a naive per-batch window gets WRONG: the transition that
    straddles a micro-batch boundary (user's last event of batch k ->
    first event of batch k+1) belongs to the model too.

    Per micro-batch (foreachBatch):
      1. within-batch transitions: one lead() window over the batch;
      2. boundary transitions: the persisted last-event-per-user state
         (rows with ``_sbatch < batch_id`` — so a REPLAYED batch reads
         the same prior it saw the first time) joined to the batch's
         FIRST event per user;
      3. the batch's pair counts overwrite ``transitions/batch=<id>``
         (a retry replaces, never duplicates) and the batch's last
         events append to ``last_events`` tagged with the batch id
         (duplicate appends carry identical values; the max-per-user
         merge absorbs them).

    For time-ordered arrival the accumulated counts equal the batch
    operator on the full stream under ANY chunking (proven in tests).
    State is one row per (user, batch) — id-sized, never event-sized.

    Lifecycle contract (ADVICE r9): ``state_dir`` and its embedded
    ``_checkpoint`` are created and retired TOGETHER. A fresh checkpoint
    restarts batch ids at 0, so running it against previously
    accumulated state would make batch 0 ignore every persisted
    last-event (``_sbatch < 0`` matches nothing) and overwrite
    ``transitions/batch=0`` — silent count corruption. That signature
    (state present, checkpoint absent) is refused at startup.
    """
    import os

    from pyspark.sql import Window

    spark = event_stream.sparkSession
    trans_path = os.path.join(state_dir, "transitions")
    last_path = os.path.join(state_dir, "last_events")
    ckpt_path = os.path.join(state_dir, "_checkpoint")
    # EITHER accumulated dir is the signature (ADVICE r10): a partial
    # manual cleanup that removed last_events/ but left transitions/
    # would otherwise restart batch ids at 0 and silently overwrite
    # transitions/batch=0
    if (
        os.path.exists(last_path) or os.path.exists(trans_path)
    ) and not os.path.exists(ckpt_path):
        raise ValueError(
            f"{state_dir!r} holds accumulated transition state but no "
            "_checkpoint: a fresh checkpoint would restart batch ids at 0 "
            "over that state and silently corrupt the counts. Retire the "
            "whole state_dir (state + checkpoint together) or restore the "
            "original checkpoint."
        )

    def _prior_last(batch_id: int) -> DataFrame:
        try:
            raw = spark.read.parquet(last_path)
        except Exception:
            return spark.createDataFrame(
                [],
                f"{user_col} long, {ts_col} timestamp, "
                f"{order_break_col} long, {type_col} string",
            )
        w = Window.partitionBy(user_col).orderBy(
            F.desc(ts_col), F.desc(order_break_col)
        )
        return (
            raw.filter(F.col("_sbatch") < batch_id)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(user_col, ts_col, order_break_col, type_col)
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cols = [user_col, ts_col, order_break_col, type_col]
        b = batch_df.select(*cols).cache()
        w = Window.partitionBy(user_col).orderBy(
            F.asc(ts_col), F.asc(order_break_col)
        )
        within = (
            b.select(
                F.col(type_col).alias("from_type"),
                F.lead(type_col).over(w).alias("to_type"),
            ).filter(F.col("to_type").isNotNull())
        )
        firsts = (
            b.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col(user_col),
                F.col(type_col).alias("to_type"),
            )
        )
        prior = _prior_last(batch_id).select(
            F.col(user_col), F.col(type_col).alias("from_type")
        )
        boundary = prior.join(firsts, user_col).select(
            "from_type", "to_type"
        )
        counts = (
            within.unionByName(boundary)
            .groupBy("from_type", "to_type")
            .agg(F.count("*").cast("long").alias("n"))
        )
        counts.write.mode("overwrite").parquet(
            os.path.join(trans_path, f"batch={batch_id}")
        )
        wl = Window.partitionBy(user_col).orderBy(
            F.desc(ts_col), F.desc(order_break_col)
        )
        lasts = (
            b.withColumn("_rn", F.row_number().over(wl))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_sbatch", F.lit(batch_id).cast("long"))
        )
        lasts.write.mode("append").parquet(last_path)
        b.unpersist()

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_transition_counts(spark, state_dir)
