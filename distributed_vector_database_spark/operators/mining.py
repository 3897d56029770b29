"""Training-pair mining over embedding tables.

Contrastive / metric-learning recipes need, for every anchor, the most
similar corpus items that are NOT of the anchor's class — "hard negatives"
(high-similarity, wrong-label items teach the margin; random negatives are
too easy). The reference has no supervised surface at all (labels exist
only as an unused column of its AG News test corpus, `reference:
src/test.py:26-37`); this is beyond-reference pipeline surface.

Plan shape: one job. The per-anchor label exclusion rides the SAME
per-query mask the batched IVF search uses (``batch_topk(...,
allowed_shards=..., shard_col=label)``, operators/topk.py): each anchor
only scores rows whose label is in its allowed set, the mask is applied
inside the Arrow partition kernel, and the only shuffle is the final merge
of <= partitions*k rows per anchor. No per-label driver loop, no
|corpus|x|anchors| cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.topk import batch_topk

__all__ = ["hard_negatives", "label_prototypes", "prototype_scores"]


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    anchor_id_col: str = "query_id",
    anchor_vec_col: str = "query_vector",
    anchor_label_col: str = "query_label",
    metric: str = "cosine",
) -> DataFrame:
    """Top-k most-similar corpus rows with a label DIFFERENT from each
    anchor's. Returns (query_id, id, score, rank), rank 1..k per anchor.

    The corpus's distinct label set is collected once (labels are
    enumerable by definition); each anchor's allowed set = all labels
    except its own.
    """
    labels = [
        r[0]
        for r in corpus.select(label_col).distinct().collect()
        if r[0] is not None
    ]
    a_rows = anchors.select(anchor_id_col, anchor_label_col).collect()
    allowed = {
        int(r[0]): [int(l) for l in labels if l != r[1]] for r in a_rows
    }
    return batch_topk(
        corpus,
        anchors.select(anchor_id_col, anchor_vec_col),
        k,
        vector_col=vector_col,
        id_col=id_col,
        query_id_col=anchor_id_col,
        query_vec_col=anchor_vec_col,
        metric=metric,
        allowed_shards=allowed,
        shard_col=label_col,
    )


def label_prototypes(
    emb: DataFrame,
    dim: int,
    *,
    vector_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, prototype): the per-class mean vector — class prototypes for
    nearest-centroid classification, coreset pruning, and outlier scoring.

    Means accumulate as exact integer micro-units before dividing (the
    engine's standard order-independent mean: float addition order differs
    between partial-aggregate trees, integer sums don't), so the prototype
    is bit-identical across engines and cluster layouts. Components round
    to 6dp.

    Plan: one partial-aggregated groupBy(label) carrying ``dim`` sum
    columns — no posexplode row multiplication, no shuffle wider than
    |labels| x dim. ``dim`` must be the fixed vector width.
    """
    sums = [
        F.sum(
            F.round(F.col(vector_col)[i].cast("double") * 1e6).cast("long")
        ).alias(f"_s{i}")
        for i in range(dim)
    ]
    agg = emb.groupBy(label_col).agg(F.count("*").alias("_n"), *sums)
    proto = F.array(
        *[
            F.round(F.col(f"_s{i}") / F.col("_n") / F.lit(1e6), 6)
            for i in range(dim)
        ]
    )
    return agg.select(F.col(label_col), proto.alias("prototype"))


def prototype_scores(
    emb: DataFrame,
    dim: int,
    *,
    vector_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, label, proto_cos): each vector's cosine to ITS OWN class
    prototype — low scores are intra-class outliers (mislabels, noise; the
    rows a curation pass reviews or drops first).

    The prototype table is |labels| rows — broadcast; the corpus side is a
    narrow projection. One aggregation shuffle total (inside
    ``label_prototypes``).
    """
    from distributed_vector_database_spark.functions.vector import (
        cosine_similarity,
        round_score,
    )

    protos = label_prototypes(
        emb, dim, vector_col=vector_col, label_col=label_col
    )
    return (
        emb.join(F.broadcast(protos), label_col)
        .select(
            F.col(id_col),
            F.col(label_col),
            round_score(
                cosine_similarity(
                    F.col(vector_col).cast("array<double>"),
                    F.col("prototype"),
                ),
                6,
            ).alias("proto_cos"),
        )
    )
