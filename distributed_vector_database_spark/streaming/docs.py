"""Streaming near-duplicate document dedup: an incrementally-maintained
MinHash-LSH bucket index over a document stream.

The batch operators (`operators/dedup.py`) answer "which docs in THIS
corpus are near-dups"; a live ingestion pipeline needs the incremental
question — "is this NEW doc a near-dup of anything already ingested" —
without re-scanning the corpus. The index that answers it is tiny
relative to the corpus: one ``(band_ix, bv) -> owner_id`` entry per band
bucket, exactly the LSH state a production dedup service keeps.

Contract: a doc is a duplicate iff any of its band buckets is owned by a
smaller doc id (`dedup.minhash_bucket_dup_flags` — the order-free form of
greedy keep-first LSH dedup). For id-ordered arrival the incremental
decision equals the batch decision on the full corpus, proven in tests
(replay ≡ batch, any chunking).

Scale shape (100 TB/day ingest):
  - per micro-batch work is batch-local banding (explode + min-agg, no
    corpus access) plus ONE join against the owner index on the uniform
    band-hash key;
  - the owner index is append-only (crash-safe, no read-modify-write):
    each batch appends its per-bucket minima and readers take
    ``min(owner)`` per bucket — merge-on-read, the same pattern as
    `sources/mor.py`; periodic compaction folds the appends (
    `sources/compaction.compact_layout`);
  - nothing is driver-side; state lives in parquet, so the stream can
    restart anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.dedup import (
    minhash_band_buckets,
)

__all__ = [
    "read_document_stream",
    "stream_minhash_dedup",
    "read_bucket_owners",
    "read_dedup_flags",
    "stream_bigram_counts",
    "read_bigram_counts",
    "stream_winnow_dedup",
    "read_winnow_flags",
    "read_fp_owners",
    "stream_cdc_chunk_dedup",
    "read_chunk_owners",
    "read_cdc_flags",
    "stream_cdc_chunk_index",
    "read_cdc_chunk_index",
    "stream_doc_novelty",
    "read_novelty",
    "read_gram_owners",
    "stream_payload_dhash",
    "read_payload_fps",
    "read_payload_pairs",
]

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_document_stream(
    spark: SparkSession,
    directory: str,
    *,
    max_files_per_trigger: int | None = 1,
    schema: str = DOC_SCHEMA,
) -> DataFrame:
    """File-source document stream: new parquet files become micro-batches
    (oldest file first, so a chunked replay arrives in write order)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)


def read_bucket_owners(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current bucket-owner index: min doc id per (band_ix, bv) over every
    appended batch — the merge-on-read view of the append-only state."""
    owners_path = os.path.join(state_dir, "owners")
    try:
        raw = spark.read.parquet(owners_path)
    except Exception:
        return spark.createDataFrame(
            [], "band_ix int, bv string, owner long"
        )
    return raw.groupBy("band_ix", "bv").agg(F.min("owner").alias("owner"))


def stream_minhash_dedup(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    num_hashes: int = 8,
    bands: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Run a document stream through the incremental LSH dedup index and
    return the accumulated per-doc decisions as a batch frame
    ``(doc_id, n_bands, n_dup_bands, is_dup)``.

    Per micro-batch (foreachBatch — every step a plain batch plan):
      1. band the batch's docs (`dedup.minhash_band_buckets`);
      2. owner per bucket = min(persisted owner, this batch's min id);
      3. flag each batch doc whose bucket owner is a smaller id;
      4. overwrite the decisions into ``<state_dir>/flags/batch=<id>``
         and append the batch minima to the append-only
         ``<state_dir>/owners`` index.

    foreachBatch is at-least-once, so every state write must tolerate a
    batch replay: the flags write is keyed by ``batch_id`` and
    overwrites its own directory (a retry replaces, never duplicates,
    its rows), and duplicate owner appends are absorbed by the
    ``min()`` merge-on-read view.

    For doc-id-ordered arrival the result equals
    `dedup.minhash_bucket_dup_flags` on the full corpus regardless of
    how the stream is chunked (a bucket's final owner is the globally
    smallest id, which under ordered arrival is also the first — so no
    later batch can invalidate an earlier decision).
    """
    spark = doc_stream.sparkSession
    owners_path = os.path.join(state_dir, "owners")
    flags_path = os.path.join(state_dir, "flags")
    ckpt_path = os.path.join(state_dir, "_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        st = minhash_band_buckets(
            batch_df,
            num_hashes,
            bands,
            n=n,
            text_col=text_col,
            id_col=id_col,
        ).cache()
        batch_min = st.groupBy("band_ix", "bv").agg(
            F.min(id_col).alias("owner")
        )
        prior = read_bucket_owners(spark, state_dir)
        owner = (
            batch_min.withColumnRenamed("owner", "_bmin")
            .join(prior.withColumnRenamed("owner", "_prior"),
                  ["band_ix", "bv"], "left")
            .select(
                "band_ix",
                "bv",
                F.least(
                    F.col("_bmin"), F.coalesce(F.col("_prior"), F.col("_bmin"))
                ).alias("_owner"),
            )
        )
        lost = F.sum(
            F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0)
        )
        flags = (
            st.join(owner, ["band_ix", "bv"])
            .groupBy(id_col)
            .agg(
                F.count("*").alias("n_bands"),
                lost.cast("long").alias("n_dup_bands"),
                (lost > 0).alias("is_dup"),
            )
        )
        flags.write.mode("overwrite").parquet(
            os.path.join(flags_path, f"batch={batch_id}")
        )
        batch_min.write.mode("append").parquet(owners_path)
        st.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_dedup_flags(spark, state_dir)


def read_dedup_flags(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated per-doc dedup decisions from the stream state —
    querying is independent of the ingest. ``batch=<id>`` subdirs surface
    as a discovered partition column; the decision frame drops it."""
    flags_path = os.path.join(state_dir, "flags")
    return spark.read.parquet(flags_path).drop("batch")


def stream_bigram_counts(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incrementally-maintained bigram LM counts over a document stream:
    each micro-batch appends its batch-local ``(w1, w2, n)`` partial
    counts (one plain batch aggregation — bigrams never cross documents,
    so batch partials sum to the corpus truth for ANY chunking), and the
    merged view sums partials per bigram at read time.

    The same append-only merge-on-read state pattern as the LSH owner
    index above and `sources/mor.py`: crash-safe (no read-modify-write),
    restartable, compactable. This is how a live ingest keeps the
    perplexity-filter LM (`operators/lm.py`) fresh without corpus
    rescans — counts only ever ADD, so maintenance is exact, unlike
    model families that need refitting.

    foreachBatch is at-least-once, so each batch's partials land in
    their own ``batch=<id>`` directory with overwrite — a retried batch
    replaces, never duplicates, its counts.

    Returns the merged ``(w1, w2, n)`` frame after running the stream to
    completion (see :func:`read_bigram_counts` for querying the live
    state without re-ingesting).
    """
    from distributed_vector_database_spark.operators.lm import (
        bigram_counts,
    )

    spark = doc_stream.sparkSession
    counts_path = os.path.join(state_dir, "bigram_counts")
    ckpt_path = os.path.join(state_dir, "_lm_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bigram_counts(
            batch_df, text_col=text_col, id_col=id_col
        ).write.mode("overwrite").parquet(
            os.path.join(counts_path, f"batch={batch_id}")
        )

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_bigram_counts(spark, state_dir)


def read_bigram_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge-on-read view of the stream-maintained LM counts: sum the
    per-batch partials per bigram. Querying the state is independent of
    the ingest — a live pipeline calls this without replaying anything."""
    counts_path = os.path.join(state_dir, "bigram_counts")
    return (
        spark.read.parquet(counts_path)
        .drop("batch")
        .groupBy("w1", "w2")
        .agg(F.sum("n").alias("n"))
    )


def read_fp_owners(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current winnowing-fingerprint owner index: min doc id per fp over
    every appended batch — merge-on-read, same pattern as the LSH bucket
    owners above."""
    owners_path = os.path.join(state_dir, "fp_owners")
    try:
        raw = spark.read.parquet(owners_path)
    except Exception:
        return spark.createDataFrame([], "fp string, owner long")
    return raw.groupBy("fp").agg(F.min("owner").alias("owner"))


def stream_winnow_dedup(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental SUBSTRING-level dedup: the streaming twin of
    `dedup.winnow_owner_dup_flags`. The maintained state is the
    (fingerprint -> lowest owner id) index — one row per distinct
    winnowing fingerprint ever seen, ~2/(window+1) of the corpus' gram
    count, the same index a production quote-reuse/template detector
    keeps.

    Per micro-batch (foreachBatch — every step a plain batch plan):
      1. winnowing fingerprints of the batch docs (Arrow kernel);
      2. fp owner = min(persisted owner, this batch's min id);
      3. flag each batch doc with >= ``min_shared`` fps owned by a
         smaller id;
      4. overwrite decisions into ``<state_dir>/winnow_flags/batch=<id>``
         and append batch minima to the append-only
         ``<state_dir>/fp_owners`` index.

    At-least-once safe exactly like `stream_minhash_dedup`: per-batch
    overwrite dirs for decisions, duplicate owner appends absorbed by
    the min() merge-on-read. For doc-id-ordered arrival the accumulated
    decisions equal the batch form on the full corpus under ANY chunking
    (a fingerprint's final owner is the globally smallest id, which
    ordered arrival presents first — no later batch can invalidate an
    earlier decision).
    """
    from distributed_vector_database_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    spark = doc_stream.sparkSession
    owners_path = os.path.join(state_dir, "fp_owners")
    flags_path = os.path.join(state_dir, "winnow_flags")
    ckpt_path = os.path.join(state_dir, "_winnow_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fps = winnow_fingerprints(
            batch_df, k=k, window=window, text_col=text_col, id_col=id_col
        ).cache()
        batch_min = fps.groupBy("fp").agg(F.min(id_col).alias("owner"))
        prior = read_fp_owners(spark, state_dir)
        owner = (
            batch_min.withColumnRenamed("owner", "_bmin")
            .join(prior.withColumnRenamed("owner", "_prior"), "fp", "left")
            .select(
                "fp",
                F.least(
                    F.col("_bmin"),
                    F.coalesce(F.col("_prior"), F.col("_bmin")),
                ).alias("_owner"),
            )
        )
        lost = F.sum(
            F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0)
        )
        flags = (
            fps.join(owner, "fp")
            .groupBy(id_col)
            .agg(
                F.count("*").cast("long").alias("n_fps"),
                lost.cast("long").alias("n_owned_elsewhere"),
                (lost >= min_shared).alias("is_span_dup"),
            )
        )
        flags.write.mode("overwrite").parquet(
            os.path.join(flags_path, f"batch={batch_id}")
        )
        batch_min.write.mode("append").parquet(owners_path)
        fps.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_winnow_flags(spark, state_dir)


def read_winnow_flags(
    spark: SparkSession, state_dir: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """Accumulated per-doc substring-dup decisions from the stream state —
    querying is independent of the ingest.

    A doc delivered in two different micro-batches (re-delivering or
    non-id-ordered sources) writes one decision row per batch; rather
    than surface duplicate, potentially conflicting rows, the read keeps
    the LATEST decision per doc (max batch id — computed with more
    fingerprint history, so it can only be more complete). Partial-agg
    max-of-struct, no window: skew-free however hot one doc id is."""
    flags_path = os.path.join(state_dir, "winnow_flags")
    raw = spark.read.parquet(flags_path)
    val_cols = [c for c in raw.columns if c not in (id_col, "batch")]
    # cast the partition column explicitly: with
    # spark.sql.sources.partitionColumnTypeInference.enabled=false the
    # `batch` directory value reads as STRING, and '10' < '9' would pick
    # a stale decision as "latest"
    latest_key = F.col("batch").cast("long")
    return (
        raw.groupBy(id_col)
        .agg(F.max(F.struct(latest_key.alias("batch"), *val_cols)).alias("_latest"))
        .select(id_col, *[F.col(f"_latest.{c}").alias(c) for c in val_cols])
    )


def stream_cdc_chunk_dedup(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    mask_bits: int = 4,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental CHUNK-level dedup: the streaming twin of
    `dedup.cdc_chunk_dup_flags`. Maintained state = the (chunk_hash ->
    lowest owner id) index — the live dedup-store directory a
    storage-granularity pipeline keeps; because CDC boundaries survive
    edits, a revised re-upload of an earlier doc still flags on its
    unchanged chunks as it streams in.

    Identical protocol to `stream_winnow_dedup` (per-batch: chunk ->
    owner = min(prior, batch min) -> flags; per-batch overwrite dirs for
    decisions, duplicate owner appends absorbed by the min()
    merge-on-read), so it inherits the same at-least-once safety and the
    same ordered-arrival equivalence: for doc-id-ordered arrival the
    accumulated decisions equal the batch form under ANY chunking of the
    stream.
    """
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    spark = doc_stream.sparkSession
    owners_path = os.path.join(state_dir, "chunk_owners")
    flags_path = os.path.join(state_dir, "cdc_flags")
    ckpt_path = os.path.join(state_dir, "_cdc_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ch = (
            cdc_chunk_documents(
                batch_df,
                mask_bits=mask_bits,
                text_col=text_col,
                id_col=id_col,
            )
            .select(F.col(id_col), "chunk_hash")
            .cache()
        )
        batch_min = ch.groupBy("chunk_hash").agg(
            F.min(id_col).alias("owner")
        )
        prior = read_chunk_owners(spark, state_dir)
        owner = (
            batch_min.withColumnRenamed("owner", "_bmin")
            .join(
                prior.withColumnRenamed("owner", "_prior"),
                "chunk_hash",
                "left",
            )
            .select(
                "chunk_hash",
                F.least(
                    F.col("_bmin"),
                    F.coalesce(F.col("_prior"), F.col("_bmin")),
                ).alias("_owner"),
            )
        )
        lost = F.sum(
            F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0)
        )
        flags = (
            ch.join(owner, "chunk_hash")
            .groupBy(id_col)
            .agg(
                F.count("*").cast("long").alias("n_chunks"),
                lost.cast("long").alias("n_owned_elsewhere"),
                (lost >= min_shared).alias("is_chunk_dup"),
            )
        )
        flags.write.mode("overwrite").parquet(
            os.path.join(flags_path, f"batch={batch_id}")
        )
        batch_min.write.mode("append").parquet(owners_path)
        ch.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_cdc_flags(spark, state_dir)


def read_chunk_owners(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge-on-read (chunk_hash, owner) index: min over the appended
    batch minima; empty frame before the first batch."""
    owners_path = os.path.join(state_dir, "chunk_owners")
    if not os.path.exists(owners_path):
        return spark.createDataFrame(
            [], "chunk_hash string, owner long"
        )
    return (
        spark.read.parquet(owners_path)
        .groupBy("chunk_hash")
        .agg(F.min("owner").alias("owner"))
    )


def read_cdc_flags(
    spark: SparkSession, state_dir: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """Accumulated per-doc chunk-dup decisions; keeps the LATEST decision
    per doc (max batch id, cast to long — the read_winnow_flags
    partition-type guard). Empty frame before the first batch lands
    (same guard as read_chunk_owners), so a live pipeline can query the
    flags at any time."""
    flags_path = os.path.join(state_dir, "cdc_flags")
    if not os.path.exists(flags_path):
        return spark.createDataFrame(
            [],
            f"{id_col} long, n_chunks long, n_owned_elsewhere long, "
            "is_chunk_dup boolean",
        )
    raw = spark.read.parquet(flags_path)
    val_cols = [c for c in raw.columns if c not in (id_col, "batch")]
    latest_key = F.col("batch").cast("long")
    return (
        raw.groupBy(id_col)
        .agg(
            F.max(
                F.struct(latest_key.alias("batch"), *val_cols)
            ).alias("_latest")
        )
        .select(
            id_col, *[F.col(f"_latest.{c}").alias(c) for c in val_cols]
        )
    )


def stream_cdc_chunk_index(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    mask_bits: int = 4,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incrementally-maintained CDC chunk EMBEDDING index — the
    streaming half of the `cdc_chunk_search_hashed` lifecycle: each
    micro-batch chunks its own documents (content-defined boundaries,
    so an edited re-upload re-embeds ONLY its perturbed chunks' rows)
    and hash-embeds them; the maintained state IS the vector index the
    read path searches, no corpus re-scan ever.

    Chunk embedding is per-document-deterministic (no cross-doc state),
    so replay == batch for ANY chunking of the stream. Each batch writes
    its rows under an OVERWRITE ``batch={id}`` dir (at-least-once-safe:
    a re-run of batch N replaces batch N); a doc re-delivered in a LATER
    batch is resolved at read time by latest-batch-wins per doc
    (`read_cdc_chunk_index`), the `read_winnow_flags` protocol.

    Returns the merged index after running the stream to completion;
    live pipelines read :func:`read_cdc_chunk_index`.
    """
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    spark = doc_stream.sparkSession
    index_path = os.path.join(state_dir, "chunk_index")
    ckpt_path = os.path.join(state_dir, "_index_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ch = cdc_chunk_documents(
            batch_df, mask_bits=mask_bits, text_col=text_col, id_col=id_col
        ).select(
            (F.col(id_col) * 65536 + F.col("chunk_ix")).alias("_ck"),
            "chunk_text",
        )
        emb = hashing_embed(
            ch,
            dim=dim,
            normalize=False,
            text_col="chunk_text",
            id_col="_ck",
        )
        emb.select(
            (F.col("_ck") / 65536).cast("long").alias(id_col),
            (F.col("_ck") % 65536).cast("long").alias("chunk_ix"),
            "embedding",
        ).write.mode("overwrite").parquet(
            os.path.join(index_path, f"batch={batch_id}")
        )

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_cdc_chunk_index(spark, state_dir, id_col=id_col)


def read_cdc_chunk_index(
    spark: SparkSession, state_dir: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """Merge-on-read chunk embedding index: (doc_id, chunk_ix,
    embedding), latest batch per DOC winning (a re-delivered doc's whole
    chunk set comes from one batch — taking max per (doc, chunk) row
    instead could stitch chunks from two revisions together). Empty
    typed frame before the first batch lands. Partial-agg max + one
    doc-keyed semi join — state-sized, skew-free."""
    index_path = os.path.join(state_dir, "chunk_index")
    if not os.path.exists(index_path):
        return spark.createDataFrame(
            [], f"{id_col} long, chunk_ix long, embedding array<double>"
        )
    raw = spark.read.parquet(index_path)
    latest = raw.groupBy(id_col).agg(
        F.max(F.col("batch").cast("long")).alias("_latest_batch")
    )
    return (
        raw.withColumn("_b", F.col("batch").cast("long"))
        .join(latest, id_col)
        .filter(F.col("_b") == F.col("_latest_batch"))
        .select(id_col, "chunk_ix", "embedding")
    )


def read_gram_owners(
    spark: SparkSession, state_dir: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """Merge-on-read (gram -> lowest owner id) index: min over the
    appended batch minima; empty frame before the first batch."""
    owners_path = os.path.join(state_dir, "gram_owners")
    if not os.path.exists(owners_path):
        return spark.createDataFrame([], "g string, owner long")
    return (
        spark.read.parquet(owners_path)
        .groupBy("g")
        .agg(F.min("owner").alias("owner"))
    )


def stream_doc_novelty(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental n-gram NOVELTY scoring at ingest time — the streaming
    twin of `text_analysis.novelty_scores`: each arriving document is
    scored against everything already ingested (the maintained
    gram -> lowest-owner index) WITHOUT re-scanning the corpus — the
    live "is this fresh text?" gate a 100-TB/day curation pipeline
    runs before admitting a document.

    Per micro-batch: the batch's distinct (doc, gram) rows, owner =
    min(prior owner, batch minimum) — so two batch docs sharing a new
    gram resolve exactly as the batch operator does — then per-doc
    novel-gram counts and the exact-6dp ratio. For id-ordered arrival
    the at-arrival decision is FINAL (a later, larger id can never
    become an owner below an earlier doc), so the accumulated frame
    equals the batch operator on the full corpus for any chunking —
    same argument as `stream_cdc_chunk_dedup`.

    State writes are at-least-once-safe: per-batch OVERWRITE dirs for
    the novelty rows, plain appends for the owner minima (absorbed by
    the min() merge-on-read)."""
    from distributed_vector_database_spark.functions.vector import (
        ratio_6dp_exact,
    )
    from distributed_vector_database_spark.operators.dedup import _shingled

    spark = doc_stream.sparkSession
    owners_path = os.path.join(state_dir, "gram_owners")
    rows_path = os.path.join(state_dir, "novelty")
    ckpt_path = os.path.join(state_dir, "_novelty_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        grams = (
            _shingled(batch_df, text_col, id_col, n)
            .select(F.col(id_col), F.explode("shingles").alias("g"))
            .cache()
        )
        batch_min = grams.groupBy("g").agg(F.min(id_col).alias("owner"))
        prior = read_gram_owners(spark, state_dir, id_col=id_col)
        owner = (
            batch_min.withColumnRenamed("owner", "_bmin")
            .join(prior.withColumnRenamed("owner", "_prior"), "g", "left")
            .select(
                "g",
                F.least(
                    F.col("_bmin"),
                    F.coalesce(F.col("_prior"), F.col("_bmin")),
                ).alias("_owner"),
            )
        )
        out = (
            grams.join(owner, "g")
            .groupBy(id_col)
            .agg(
                F.count("*").cast("long").alias("n_grams"),
                F.sum(
                    F.when(F.col("_owner") == F.col(id_col), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_novel"),
            )
            .withColumn("novelty", ratio_6dp_exact("n_novel", "n_grams"))
        )
        out.write.mode("overwrite").parquet(
            os.path.join(rows_path, f"batch={batch_id}")
        )
        batch_min.write.mode("append").parquet(owners_path)
        grams.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_novelty(spark, state_dir, id_col=id_col)


def read_novelty(
    spark: SparkSession, state_dir: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """Accumulated per-doc novelty rows, latest batch winning per doc
    (the read_winnow_flags protocol, incl. the partition-type cast);
    empty typed frame before the first batch."""
    rows_path = os.path.join(state_dir, "novelty")
    if not os.path.exists(rows_path):
        return spark.createDataFrame(
            [],
            f"{id_col} long, n_grams long, n_novel long, novelty double",
        )
    raw = spark.read.parquet(rows_path)
    val_cols = [c for c in raw.columns if c not in (id_col, "batch")]
    latest_key = F.col("batch").cast("long")
    return (
        raw.groupBy(id_col)
        .agg(
            F.max(
                F.struct(latest_key.alias("batch"), *val_cols)
            ).alias("_latest")
        )
        .select(
            id_col, *[F.col(f"_latest.{c}").alias(c) for c in val_cols]
        )
    )


def read_payload_fps(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current payload-fingerprint index (doc_id, dhash) — the append-only
    state of `stream_payload_dhash`. Missing path -> empty frame (querying
    live state before the first batch lands must not throw)."""
    fps_path = os.path.join(state_dir, "fps")
    try:
        return spark.read.parquet(fps_path).select("doc_id", "dhash")
    except Exception:
        return spark.createDataFrame([], "doc_id long, dhash string")


def _acquire_state_lock(state_dir: str, holder: str, *, refusal: str) -> str:
    """Atomically acquire ``<state_dir>/.stream_lock`` via
    ``open(..., 'x')`` — the single mutual-exclusion point for every
    writer of a payload-dhash state dir (the live stream AND the fold's
    swap). ADVICE r11: a check-then-create race let two concurrent
    starts both pass, and the fold held no lock at all during its
    multi-second rename swap, so a stream started mid-fold could land a
    micro-batch inside the destruction window. ``'x'`` delegates the
    race to the filesystem: exactly one creator wins; the loser reads
    the holder string out of the existing file for the refusal message.
    Returns the lock path (caller removes it in its ``finally``)."""
    os.makedirs(state_dir, exist_ok=True)
    lock = os.path.join(state_dir, ".stream_lock")
    try:
        with open(lock, "x") as fh:
            fh.write(holder)
    except FileExistsError:
        try:
            held_by = open(lock).read().strip() or "unknown holder"
        except OSError:
            held_by = "unknown holder"
        raise ValueError(
            f"{state_dir!r} is locked ({held_by}): {refusal}; if the "
            f"previous holder died without cleanup, delete {lock!r} by "
            "hand."
        )
    return lock


def fold_payload_fps(spark: SparkSession, state_dir: str) -> dict:
    """Fold the per-batch fps dirs (``fps/batch=<id>``, one per
    micro-batch — the idempotent-replay layout) into a single
    consolidated ``fps/batch=-1`` partition: the periodic small-file
    maintenance for the perceptual screen's live index. Run while the
    stream is stopped.

    Swap protocol (the MoR compact pattern): merged rows are written to
    a dot-temp dir, the old ``fps`` tree is renamed to a trash dir, the
    temp becomes ``fps/batch=-1``, then trash is deleted. A crash
    mid-swap leaves the trash dir; the next fold call restores it and
    starts over, so the fold is re-runnable. Returns
    ``{dirs_before, rows}``.

    Live-stream refusal (ADVICE r10, hardened per ADVICE r11): the
    stopped-stream contract is MUTUAL — `stream_payload_dhash` holds
    ``.stream_lock`` for its lifetime, and the fold acquires the SAME
    lock (atomically, ``open(..., 'x')``) for the duration of its swap.
    A micro-batch landing between the fps->trash rename and trash
    deletion would otherwise be silently destroyed, and readers
    mid-swap would see an empty index; with a one-directional check a
    stream started mid-fold saw no lock and ran straight into that
    window. A lock left by a hard-killed process must be removed by
    hand once it is known dead — a loud manual step, mirroring
    `stream_event_transitions`'s startup refusal (streaming/events.py).
    """
    import shutil

    fps_path = os.path.join(state_dir, "fps")
    tmp = os.path.join(state_dir, ".fps_fold_tmp")
    trash = os.path.join(state_dir, ".fps_trash")
    if not os.path.isdir(state_dir):
        return {"dirs_before": 0, "rows": 0}
    lock = _acquire_state_lock(
        state_dir,
        "fold",
        refusal=(
            "folding while a micro-batch can land would destroy rows "
            "written between the swap's rename and its trash deletion. "
            "Stop the stream first"
        ),
    )
    try:
        if os.path.exists(trash):  # crashed previous fold — restore first
            if os.path.exists(fps_path):
                shutil.rmtree(fps_path)
            os.rename(trash, fps_path)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if not os.path.exists(fps_path):
            return {"dirs_before": 0, "rows": 0}
        dirs_before = sum(
            1 for d in os.listdir(fps_path) if d.startswith("batch=")
        )
        # distinct: a replay that re-overwrote its batch dir AFTER a fold
        # had already absorbed those rows into batch=-1 leaves exact
        # duplicates; the fold is where they get swept
        rows = (
            spark.read.parquet(fps_path).select("doc_id", "dhash").distinct()
        )
        rows.write.mode("overwrite").parquet(tmp)
        n = spark.read.parquet(tmp).count()
        os.rename(fps_path, trash)
        os.makedirs(fps_path)
        os.rename(tmp, os.path.join(fps_path, "batch=-1"))
        shutil.rmtree(trash)
        return {"dirs_before": dirs_before, "rows": n}
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def read_payload_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated near-dup pairs from the stream state. Missing path ->
    empty frame."""
    pairs_path = os.path.join(state_dir, "pairs")
    try:
        return spark.read.parquet(pairs_path).select(
            "doc_id_a", "doc_id_b", "hamming"
        )
    except Exception:
        return spark.createDataFrame(
            [], "doc_id_a long, doc_id_b long, hamming long"
        )


def stream_payload_dhash(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    max_hamming: int = 3,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental perceptual near-dup screen for binary payloads: the
    streaming twin of `payload_dhash_pairs`. Per micro-batch
    (foreachBatch — every step a plain batch plan):

      1. dHash the batch's payloads (`multimodal.dhash_fingerprints`,
         an Arrow pass over the batch only — no corpus access);
      2. band-join the batch fingerprints against the maintained index
         PLUS the batch itself (`dedup.hamming_band_pairs(against=...)`)
         — each pair surfaces exactly once, in the batch where its
         later member arrives;
      3. overwrite the pairs into ``<state_dir>/pairs/batch=<id>`` and
         the batch fingerprints into ``<state_dir>/fps/batch=<id>``.

    At-least-once safety: a replayed batch overwrites BOTH its own pairs
    dir and its own fps dir (replaces, never duplicates) — the per-batch
    overwrite-dir idiom every streaming state write here uses. Fps rows
    from a crashed earlier attempt that the re-run's index read still
    sees only duplicate the batch's own fingerprints, which the pair
    id-inequality/distinct absorbs (ADVICE r9: a plain append instead
    would leave replay duplicates in the index permanently, inflating
    every subsequent band join until a manual compaction).

    The accumulated pairs equal the batch screen on the full corpus for
    ANY chunking of an id-ordered stream. State is fingerprint-sized
    (16 hex chars/doc), not corpus-sized — the live ingest shape at
    100 TB/day.
    """
    from distributed_vector_database_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from distributed_vector_database_spark.sources.multimodal import (
        dhash_fingerprints,
    )

    spark = doc_stream.sparkSession
    fps_path = os.path.join(state_dir, "fps")
    pairs_path = os.path.join(state_dir, "pairs")
    ckpt_path = os.path.join(state_dir, "_checkpoint")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        payloads = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.encode(text_col, "UTF-8").alias("content"),
        )
        # below-min-length payloads dhash to NULL (ADVICE r9 guard); they
        # can never witness a pair, so keep them out of the index too
        fp = (
            dhash_fingerprints(payloads)
            .filter(F.col("dhash").isNotNull())
            .cache()
        )
        index = read_payload_fps(spark, state_dir).unionByName(fp)
        pairs = hamming_band_pairs(
            fp,
            fp_col="dhash",
            max_hamming=max_hamming,
            bands=bands,
            id_col="doc_id",
            against=index,
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_path, f"batch={batch_id}")
        )
        fp.write.mode("overwrite").parquet(
            os.path.join(fps_path, f"batch={batch_id}")
        )
        fp.unpersist()

    # lifetime lock: fold_payload_fps refuses while this exists (ADVICE
    # r10 — the stopped-stream contract enforced, not docstring-only);
    # also refuses a concurrent writer on the same state_dir. Acquired
    # atomically (ADVICE r11: exists-check + open('w') let two
    # concurrent starts both pass) and BEFORE start so no micro-batch
    # can land while unlocked.
    lock = _acquire_state_lock(
        state_dir,
        "starting payload-dhash stream",
        refusal=(
            "two writers on one state_dir would interleave batch ids, "
            "and starting while a fold swap is mid-rename would land a "
            "micro-batch inside its destruction window"
        ),
    )
    try:
        q = (
            doc_stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt_path)
            .start()
        )
        with open(lock, "w") as fh:
            fh.write(str(q.id))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass
    return read_payload_pairs(spark, state_dir)
