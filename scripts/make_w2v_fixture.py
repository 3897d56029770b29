"""Freeze a trained Word2Vec vocab-vector table as a parquet fixture.

The trainable embedding rung (`functions.embed.word2vec_doc_embeddings`)
can't be oracle-checked end to end — MLlib training isn't reproducible in
DuckDB — but its TRANSFORM (doc vector = mean of in-vocab word vectors) is
exact relational math. This script runs the training exactly once, offline,
and freezes the resulting (word, dim, val_micros) table so the registered
`w2v_doc_embed_transform` query can oracle-check the transform on any SF.

Protocol (all deterministic):
  - train on sf0.001 documents, dim=8, minCount=2, seed=7, numPartitions=1
    (the seeded single-partition configuration the §7.3 invariant tests
    pin as reproducible);
  - keep the 24 most frequent corpus words (ties broken by word), so the
    larger corpora genuinely exercise the OOV-token path;
  - store components as INTEGER MICROS (round(v * 1e6)) — downstream sums
    are exact integers, so the Spark result and the DuckDB oracle are
    bit-identical with no float-accumulation-order risk.

Usage: python scripts/make_w2v_fixture.py   (writes fixtures/w2v_vocab_micros.parquet)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from distributed_vector_database_spark.functions.embed import (  # noqa: E402
    word2vec_doc_embeddings,
)
from distributed_vector_database_spark.functions.text import tokens  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "w2v_vocab_micros.parquet")
VOCAB_KEEP = 24
DIM = 8


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model, _ = word2vec_doc_embeddings(
        docs, dim=DIM, min_count=2, seed=7, num_partitions=1
    )
    freq = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    kept = (
        freq.orderBy(F.desc("n"), F.asc("word"))
        .limit(VOCAB_KEEP)
        .select("word")
    )
    from pyspark.ml.functions import vector_to_array

    vecs = model.getVectors().select(
        "word", vector_to_array("vector").alias("v")
    )
    long_form = (
        vecs.join(kept, "word")
        .select(
            "word",
            F.posexplode(F.col("v")).alias("dim", "_val"),
        )
        .select(
            "word",
            F.col("dim").cast("int"),
            F.round(F.col("_val") * 1e6).cast("long").alias("val_micros"),
        )
        .orderBy("word", "dim")
    )
    pdf = long_form.toPandas()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(pdf)} rows "
          f"({pdf.word.nunique()} words x {DIM} dims)")
    spark.stop()


if __name__ == "__main__":
    main()
