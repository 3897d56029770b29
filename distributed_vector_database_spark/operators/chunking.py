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

__all__ = ["chunk_documents"]


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
