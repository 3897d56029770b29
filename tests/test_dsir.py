"""DSIR importance weighting: directional sanity + selection contract."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.dsir import (
    dsir_select,
    importance_log_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_score_higher(spark):
    target = _docs(
        spark,
        [(100 + i, "physics energy quantum field theory lecture notes")
         for i in range(5)],
    )
    source = _docs(
        spark,
        [
            (1, "physics energy quantum field theory overview"),  # on-target
            (2, "buy cheap shoes online free shipping today now"),  # off
            (3, "quantum field lecture notes energy physics intro"),  # on
            (4, "celebrity gossip news photo gallery slideshow click"),  # off
        ],
    )
    w = {
        r["doc_id"]: r["log_w"]
        for r in importance_log_weights(source, target).collect()
    }
    assert w[1] > w[2] and w[3] > w[4]
    assert min(w[1], w[3]) > max(w[2], w[4])


def test_short_docs_absent_and_select_topk(spark):
    target = _docs(spark, [(100, "alpha beta gamma delta")])
    source = _docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "unrelated words entirely different content"),
            (3, "tiny"),  # < 2 tokens -> no bigram features -> absent
        ],
    )
    w = importance_log_weights(source, target)
    assert sorted(r["doc_id"] for r in w.collect()) == [1, 2]
    top = dsir_select(source, target, k=1).collect()
    assert [r["doc_id"] for r in top] == [1]


def test_weights_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    tgt = docs.filter(F.col("doc_id") % 10 == 0)
    src = docs.filter(F.col("doc_id") % 10 != 0)
    a = importance_log_weights(src, tgt).collect()
    b = importance_log_weights(
        src.repartition(13), tgt.repartition(3)
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_gumbel_sample_reproducible_and_seed_sensitive(spark):
    from distributed_vector_database_spark.operators.dsir import (
        dsir_gumbel_sample,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    tgt = docs.filter(F.col("doc_id") % 10 == 0)
    src = docs.filter(F.col("doc_id") % 10 != 0)
    a = [tuple(r) for r in dsir_gumbel_sample(src, tgt, 10, seed=1).collect()]
    b = [tuple(r) for r in dsir_gumbel_sample(
        src.repartition(7), tgt, 10, seed=1
    ).collect()]
    assert a == b  # same seed -> identical sample, any partitioning
    c = [tuple(r) for r in dsir_gumbel_sample(src, tgt, 10, seed=2).collect()]
    assert {r[0] for r in c} != {r[0] for r in a}  # seed changes the draw


def test_cross_entropy_orders_by_target_likeness(spark):
    from distributed_vector_database_spark.operators.dsir import (
        target_cross_entropy,
    )

    target = _docs(
        spark,
        [(100 + i, "physics energy quantum field theory lecture notes")
         for i in range(5)],
    )
    docs = _docs(
        spark,
        [
            (1, "physics energy quantum field theory overview"),
            (2, "buy cheap shoes online free shipping today now"),
        ],
    )
    x = {r["doc_id"]: r["xent"] for r in
         target_cross_entropy(docs, target).collect()}
    assert x[1] < x[2]  # target-like text has LOWER cross-entropy
    assert all(v > 0 for v in x.values())
