"""Conditional coverage for the gated real-model embedding hook.

``transformer_embed_udf`` is the production path mirroring the reference's
sentence-transformers embedder (reference: src/embed.py:6-20); this
container has no model libraries, so the offline ``hashing_embed`` is the
oracle-checked substitute. These tests make sure the production UDF body
is exercised wherever the library DOES exist, and that the gate fails
loudly (not silently) where it doesn't.
"""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.embed import (
    transformer_embed_udf,
)

_HAS_ST = True
try:
    import sentence_transformers  # noqa: F401
except ImportError:
    _HAS_ST = False


@pytest.mark.skipif(_HAS_ST, reason="library present: gate does not trigger")
def test_transformer_gate_raises_without_library():
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        transformer_embed_udf()


@pytest.mark.skipif(not _HAS_ST, reason="sentence-transformers not installed")
def test_transformer_embed_runs(spark, documents):
    """Production pandas_udf path: real model, Arrow batches, fixed-dim
    float vectors, deterministic across invocations."""
    udf = transformer_embed_udf()
    docs = documents.limit(4).select("doc_id", "text")
    out = docs.select("doc_id", udf(F.col("text")).alias("emb")).collect()
    assert len(out) == 4
    dims = {len(r["emb"]) for r in out}
    assert len(dims) == 1 and dims.pop() > 0
    again = {
        r["doc_id"]: r["emb"]
        for r in docs.select("doc_id", udf(F.col("text")).alias("emb")).collect()
    }
    for r in out:
        assert again[r["doc_id"]] == pytest.approx(r["emb"], abs=1e-6)
