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

__all__ = ["hard_negatives"]


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
