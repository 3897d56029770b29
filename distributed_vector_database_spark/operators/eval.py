"""Search-quality evaluation: recall@k of an approximate result vs exact.

"Measure, don't guess" for the approximate operators (IVF with
nprobe < num_shards, sign-LSH buckets): recall@k against the brute-force
top-k is the scalar that tells you whether a speedup was free or paid for
in quality. The reference never measures recall (its benchmarks are
latency-only, `reference: report/benchmarks.py:5-24`); at 100 TB you tune
nprobe / LSH bits against THIS number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "recall_at_k",
    "ndcg_at_k",
    "ivf_recall_curve",
    "ivf_recall_curve_df",
]


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    *,
    id_col: str = "vec_id",
    query_col: str | None = None,
) -> DataFrame:
    """|approx ∩ exact| / |exact| per query (one global row when
    ``query_col`` is None — the single-query case).

    Both inputs are top-k result frames carrying ``id_col`` (and
    ``query_col`` for batched search). Join is a broadcast-friendly semi
    join on the tiny result sets.
    """
    keys = [query_col, id_col] if query_col else [id_col]
    hit = approx.select(*keys).join(exact.select(*keys), keys, "left_semi")
    group = [query_col] if query_col else []
    n_exact = (
        exact.groupBy(*group).agg(F.count("*").alias("n_exact"))
        if group
        else exact.agg(F.count("*").alias("n_exact"))
    )
    n_hit = (
        hit.groupBy(*group).agg(F.count("*").alias("n_hit"))
        if group
        else hit.agg(F.count("*").alias("n_hit"))
    )
    joined = (
        n_exact.join(n_hit, group, "left") if group else n_exact.crossJoin(n_hit)
    )
    return joined.select(
        *group,
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 6
        ).alias("recall"),
        "n_hit",
        "n_exact",
    )


def ndcg_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    rank_col: str = "rank",
    query_col: str | None = None,
) -> DataFrame:
    """Rank-aware quality: NDCG@k of the approximate list against the
    exact list (binary relevance — an item is relevant iff it appears in
    the exact top-k; gain discounted by 1/log2(rank+1)).

    recall@k treats position 1 and position k the same; NDCG penalizes
    the approximate list for burying true neighbors. Both frames carry
    ``id_col`` and a 1-based ``rank_col`` (and ``query_col`` when
    batched). IDCG is the all-relevant ideal over min(k, |exact|)
    positions, so a perfect-prefix list scores 1.0.
    """
    keys = [query_col, id_col] if query_col else [id_col]
    group = [query_col] if query_col else []
    gain = 1.0 / F.log2(F.col(rank_col).cast("double") + 1.0)
    hits = (
        approx.filter(F.col(rank_col) <= k)
        .join(exact.select(*keys), keys, "left_semi")
        .select(*group, gain.alias("_g"))
    )
    dcg = (
        hits.groupBy(*group).agg(F.sum("_g").alias("dcg"))
        if group
        else hits.agg(F.sum("_g").alias("dcg"))
    )
    ideal = (
        exact.filter(F.col(rank_col) <= k)
        .select(*group, gain.alias("_g"))
    )
    idcg = (
        ideal.groupBy(*group).agg(F.sum("_g").alias("idcg"))
        if group
        else ideal.agg(F.sum("_g").alias("idcg"))
    )
    joined = dcg.join(idcg, group, "right") if group else idcg.crossJoin(dcg)
    return joined.select(
        *group,
        F.round(
            F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
        ).alias("ndcg"),
    )


def ivf_recall_curve_df(
    index,
    queries: DataFrame,
    k: int = 10,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """The recall-vs-nprobe tuning curve as a DataFrame — one row per
    nprobe: ``(nprobe, total_hits, n_queries, mean_recall)``.

    The distributed form of :func:`ivf_recall_curve`: ground truth is ONE
    batched exact search (``nprobe = num_shards``), each curve point ONE
    batched pruned search (`IVFIndex.search_batch` — union-of-probes scan,
    per-query masks in the Arrow kernel), and the hit count a semi-join of
    tiny top-k frames. len(nprobes)+1 jobs total regardless of |Q|;
    ``mean_recall = total_hits / (k * |Q|)`` is an exact integer ratio, so
    it is bit-identical cross-engine (no float summation order).

    This is the accuracy/latency trade the reference's latency-only
    benchmarks never measure (reference: report p.2 discusses recall loss
    at shards_to_search=1 without quantifying it).
    """
    from functools import reduce

    id_col = index.id_col
    # |Q|*k rows; localCheckpoint so the ground-truth search isn't
    # re-evaluated once per curve point (it appears under every union
    # branch's semi-join otherwise — measured 4x evaluation)
    exact = (
        index.search_batch(
            queries,
            k,
            nprobe=index.num_shards(),
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )
        .select(query_id_col, id_col)
        .localCheckpoint()
    )
    n_queries = queries.count()
    per_np = []
    for np_ in nprobes:
        ap = index.search_batch(
            queries,
            k,
            nprobe=np_,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        ).select(
            F.lit(int(np_)).cast("long").alias("nprobe"),
            F.col(query_id_col),
            F.col(id_col),
        )
        per_np.append(ap)
    approx = reduce(DataFrame.unionByName, per_np)
    spark = queries.sparkSession
    np_frame = spark.createDataFrame(
        [(int(n),) for n in nprobes], "nprobe long"
    )
    hits = (
        approx.join(exact, [query_id_col, id_col], "left_semi")
        .groupBy("nprobe")
        .agg(F.count("*").alias("total_hits"))
    )
    return (
        np_frame.join(hits, "nprobe", "left")
        .select(
            "nprobe",
            F.coalesce(F.col("total_hits"), F.lit(0)).alias("total_hits"),
            F.lit(int(n_queries)).cast("long").alias("n_queries"),
            F.round(
                F.coalesce(F.col("total_hits"), F.lit(0))
                / F.lit(float(k * n_queries)),
                6,
            ).alias("mean_recall"),
        )
        .orderBy("nprobe")
    )


def ivf_recall_curve(
    index,
    query_vectors,
    k: int = 10,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
) -> list[dict]:
    """Mean recall@k over the query set at each nprobe — the tuning curve
    that tells you how many shards to probe for a target quality.

    ``index`` is an :class:`~...operators.ivf.IVFIndex`;
    ``query_vectors`` an iterable of vectors. Exact ground truth is the
    nprobe=num_shards search. Returns
    ``[{nprobe, mean_recall, n_queries}, ...]``.
    """
    qs = [list(map(float, q)) for q in query_vectors]
    exact = [
        {r[index.id_col] for r in index.exact_search(q, k).collect()}
        for q in qs
    ]
    out = []
    for nprobe in nprobes:
        recalls = []
        for q, truth in zip(qs, exact):
            got = {
                r[index.id_col]
                for r in index.search(q, k, nprobe=nprobe).collect()
            }
            recalls.append(len(got & truth) / len(truth))
        out.append(
            {
                "nprobe": nprobe,
                "mean_recall": round(sum(recalls) / len(recalls), 4),
                "n_queries": len(qs),
            }
        )
    return out
