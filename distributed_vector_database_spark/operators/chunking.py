"""Document chunking: fixed-token-window splits with overlap.

The reference embeds and indexes WHOLE documents (`reference:
src/embed.py:11-20` encodes one string per row; `src/test.py:26-37` stores
full articles). Real retrieval corpora are chunked first — fixed token
windows with overlap are the standard RAG/embedding-index ingestion step —
so the engine provides chunking as a first-class relational operator: the
chunk table IS the unit that flows into hashing_embed / IVF / PQ.

Contract (deterministic, engine-portable, oracle-checked):
- tokens = non-empty whitespace splits (functions.text.tokens);
- chunk starts at token positions 1, 1+stride, 1+2*stride, ... <= n_tokens,
  stride = chunk_tokens - overlap_tokens;
- a chunk takes min(chunk_tokens, n - start + 1) tokens, joined by single
  spaces — the final chunk may be short;
- docs with zero tokens produce no chunks;
- chunk_ix is the 0-based start index: doc_id x chunk_ix is the stable
  chunk key (re-chunking the same text yields identical keys — idempotent
  re-ingest, the property an index rebuild at 100 TB needs).

Scale: pure narrow Catalyst (tokenize -> sequence -> posexplode -> slice);
no shuffle, no UDF, no driver involvement. Chunk multiplication is bounded
by ceil(n/stride) per doc; partition sizing follows input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.text import tokens

__all__ = ["chunk_documents", "cdc_chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_ix, start_token, n_chunk_tokens, chunk_text).

    ``start_token`` is 1-based; ``chunk_ix`` 0-based. See module docstring
    for the exact window contract.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            "need 0 <= overlap_tokens < chunk_tokens, got "
            f"{overlap_tokens} / {chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    # Generate trick (see dedup._shingled): materialize the token array
    # once per row so downstream lambdas don't re-tokenize per element.
    toked = docs.select(
        F.col(id_col), F.explode(F.array(tokens(text_col))).alias("_toks")
    ).select(F.col(id_col), "_toks", F.size("_toks").alias("_n"))
    starts = F.sequence(F.lit(1), F.col("_n"), F.lit(stride))
    ex = toked.filter(F.col("_n") > 0).select(
        F.col(id_col),
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_ix", "start_token"),
    )
    return ex.select(
        F.col(id_col),
        F.col("chunk_ix").cast("long").alias("chunk_ix"),
        F.col("start_token").cast("long").alias("start_token"),
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("start_token") + 1
        )
        .cast("long")
        .alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("start_token"), chunk_tokens)
        ).alias("chunk_text"),
    )


def cdc_chunk_documents(
    docs: DataFrame,
    *,
    mask_bits: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the rolling-hash chunker of dedup
    storage systems — LBFS/Muthitacharoen SOSP'01 — at token
    granularity): a chunk boundary falls AFTER token p whenever
    md5('c:' || token_p) mod 2^mask_bits == 0, giving expected chunk
    length 2^mask_bits tokens. Because boundaries depend only on LOCAL
    content, an insertion or deletion perturbs ONLY the chunk it lands
    in — boundaries resynchronize at the next hash match, so every
    following chunk keeps its identity (property-tested). A fixed-window
    chunker (`chunk_documents`) shifts EVERY downstream chunk instead,
    which is why storage/dedup pipelines use CDC: shared-content
    detection survives edits. ``chunk_hash`` = md5(chunk_text) is the
    content key chunk-level dedup joins on.

    Returns (id_col, chunk_ix, start_token, n_chunk_tokens, chunk_text,
    chunk_hash); docs with zero tokens produce no chunks.

    Scale: pure narrow Catalyst — tokenize once, boundary positions via
    array filter, starts via prepend, posexplode, slice. NO shuffle, no
    UDF, no per-doc window: per-row work is linear in doc length, and
    partition sizing follows input splits (the same plan family as
    `chunk_documents`).
    """
    if not 1 <= mask_bits <= 16:
        raise ValueError(f"mask_bits must be in [1, 16], got {mask_bits}")
    m = 1 << mask_bits

    def is_boundary(tok):
        return (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit("c"), tok)), 1, 12
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m),
            )
            == 0
        )

    toked = (
        docs.select(
            F.col(id_col),
            F.explode(F.array(tokens(text_col))).alias("_toks"),
        )
        .select(F.col(id_col), "_toks", F.size("_toks").alias("_n"))
        .filter(F.col("_n") > 0)
    )
    bpos = F.filter(
        F.sequence(F.lit(1), F.col("_n")),
        lambda p: (p < F.col("_n"))
        & is_boundary(F.element_at(F.col("_toks"), p)),
    )
    starts = F.concat(
        F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1)
    )
    ex = toked.select(
        F.col(id_col), "_toks", "_n", starts.alias("_starts")
    ).select(
        F.col(id_col),
        "_toks",
        "_n",
        "_starts",
        F.posexplode("_starts").alias("chunk_ix", "start_token"),
    )
    # try_element_at: the LAST chunk has no successor start (ANSI
    # element_at throws out-of-bounds; DuckDB's subscript returns NULL)
    end = F.coalesce(
        F.try_element_at(F.col("_starts"), F.col("chunk_ix") + 2) - 1,
        F.col("_n"),
    )
    length = end - F.col("start_token") + 1
    chunk_text = F.concat_ws(
        " ", F.slice(F.col("_toks"), F.col("start_token"), length)
    )
    return ex.select(
        F.col(id_col),
        F.col("chunk_ix").cast("long").alias("chunk_ix"),
        F.col("start_token").cast("long").alias("start_token"),
        length.cast("long").alias("n_chunk_tokens"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_hash"),
    )
