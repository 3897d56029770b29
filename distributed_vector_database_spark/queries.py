"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL
per operator (SURVEY.md §2 inventory).

Every entry is a named pair (spark_fn, oracle_sql):
  - spark_fn(spark, sf_dir) -> DataFrame, built from this package's operators;
  - oracle_sql: equivalent ANSI SQL for DuckDB over the same parquet views
    (or None for non-SQL-expressible ops -> rows-only check).

Cross-engine determinism rules (SURVEY.md §5):
  - all vector math in float64 (storage is float32 -> explicit casts);
  - every float output rounded to 6 decimals on BOTH sides;
  - every top-k ordered by (rounded score best-first, id ASC) on BOTH sides
    so LIMIT boundaries agree;
  - integer outputs cast to BIGINT on the Spark side (DuckDB counts/ids are
    BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.vector import (
    cosine_similarity,
    l2_norm,
    round_score,
)
from distributed_vector_database_spark.operators.topk import topk, batch_topk
from distributed_vector_database_spark.operators.ivf import (
    assign_shards,
    nearest_shards,
)
from distributed_vector_database_spark.sources.vector_store import (
    upsert_keep_latest,
)

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def registry():
    return dict(_REGISTRY)


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# DuckDB SQL fragment helpers (float64 list math mirroring functions/vector.py)
# ---------------------------------------------------------------------------


def _dot(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def _norm(a: str) -> str:
    return f"sqrt(list_dot_product({a}, {a}))"


def _cos(a: str, b: str) -> str:
    """Cosine with the reference's zero-norm guard (src/compute_server.py:33-38)."""
    return (
        f"(CASE WHEN {_norm(a)} = 0 OR {_norm(b)} = 0 THEN 0.0 "
        f"ELSE {_dot(a, b)} / ({_norm(a)} * {_norm(b)}) END)"
    )


E = "(e.embedding::DOUBLE[])"  # corpus vector as DOUBLE[]


# ===========================================================================
# §2.3/§2.6 J1+T2: exact top-k similarity search (the flagship read path,
# reference: POST /search with nprobe=num_shards; src/compute_server.py:107-138)
# ===========================================================================


def _query_vec(spark, sf_dir, qid: int) -> list[float]:
    row = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == qid)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


@register(
    "topk_cosine",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
FROM embeddings e, q
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def q_topk_cosine(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    return topk(emb, _query_vec(spark, sf_dir, 0), k=10, metric="cosine")


@register(
    "topk_euclidean",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1)
SELECT e.vec_id AS vec_id, ROUND(list_distance({E}, q.qv), 6) AS score
FROM embeddings e, q
ORDER BY score ASC, vec_id ASC
LIMIT 10
""",
)
def q_topk_euclidean(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    return topk(emb, _query_vec(spark, sf_dir, 1), k=10, metric="euclidean")


@register(
    "topk_dot",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 2)
SELECT e.vec_id AS vec_id, ROUND({_dot(E, 'q.qv')}, 6) AS score
FROM embeddings e, q
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def q_topk_dot(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    return topk(emb, _query_vec(spark, sf_dir, 2), k=10, metric="dot")


@register(
    "batch_topk_cosine",
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.query_id, e.vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
      FROM embeddings e, q),
r AS (SELECT query_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT query_id, vec_id, score, "rank" FROM r WHERE "rank" <= 5
""",
)
def q_batch_topk_cosine(spark, sf_dir):
    """Batched search: per-partition Arrow top-k then global merge
    (SURVEY.md §2.11 — the pymilvus variant's local-topk+merge plan)."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    out = batch_topk(emb, queries, k=5, metric="cosine")
    return out.withColumn("rank", F.col("rank").cast("long"))


# ===========================================================================
# §2.1 S1/S2 + §2.2 P1/P2: point lookup & id listing
# ===========================================================================


@register(
    "point_lookup",
    f"""
SELECT e.vec_id AS vec_id, len(e.embedding) AS dim,
       ROUND({_norm(E)}, 6) AS norm
FROM embeddings e WHERE e.vec_id = 42
""",
)
def q_point_lookup(spark, sf_dir):
    """GET /get/{{id}} (reference: src/storage_server.py:53-69) — a pushed-down
    id-equality parquet scan."""
    emb = _read(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") == 42).select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        round_score(l2_norm("embedding")).alias("norm"),
    )


@register(
    "list_ids_stats",
    """
SELECT count(*) AS num_vectors, min(vec_id) AS min_id, max(vec_id) AS max_id
FROM embeddings
""",
)
def q_list_ids_stats(spark, sf_dir):
    """GET /list_ids count semantics (reference: src/storage_server.py:72-81)."""
    emb = _read(spark, sf_dir, "embeddings")
    return emb.agg(
        F.count("*").alias("num_vectors"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
    )


# ===========================================================================
# §2.3 J2 + §2.8 D1: IVF shard assignment with injected centroids
# (centroids := embeddings of vec_id < 8, deterministic & SQL-expressible;
# mirrors POST /set_centroids + routing, src/compute_server.py:41-49,67-71)
# ===========================================================================

_ASSIGN_CTE = f"""
c AS (SELECT vec_id AS shard_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, shard_id FROM (
    SELECT e.vec_id, c.shard_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance({E}, c.cv) ASC,
                                       c.shard_id ASC) AS rn
    FROM embeddings e, c) t
  WHERE rn = 1)
"""


def _fixed_centroids(spark, sf_dir, n: int = 8) -> list[list[float]]:
    rows = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


@register(
    "ivf_assign",
    f"WITH {_ASSIGN_CTE} SELECT vec_id, shard_id FROM assign",
)
def q_ivf_assign(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    return assign_shards(emb, cents).select(
        "vec_id", F.col("shard_id").cast("long").alias("shard_id")
    )


@register(
    "ivf_count_per_shard",
    f"""
WITH {_ASSIGN_CTE}
SELECT shard_id, count(*) AS num_vectors FROM assign GROUP BY shard_id
""",
)
def q_ivf_count_per_shard(spark, sf_dir):
    """Per-shard counts (reference: src/storage_server.py:81 via list_ids)."""
    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    return (
        assign_shards(emb, cents)
        .groupBy(F.col("shard_id").cast("long").alias("shard_id"))
        .agg(F.count("*").alias("num_vectors"))
    )


@register(
    "ivf_search_pruned",
    f"""
WITH {_ASSIGN_CTE},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 100),
probe AS (SELECT c.shard_id FROM c, q
          ORDER BY list_distance(c.cv, q.qv) ASC, c.shard_id ASC LIMIT 2),
cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN assign a ON e.vec_id = a.vec_id
         WHERE a.shard_id IN (SELECT shard_id FROM probe))
SELECT e.vec_id AS vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
FROM cand e, q
ORDER BY score DESC, vec_id ASC
LIMIT 5
""",
)
def q_ivf_search_pruned(spark, sf_dir):
    """The full IVF read path with nprobe=2 (reference: POST /search,
    src/compute_server.py:107-138): centroid routing -> partition pruning ->
    brute-force cosine -> global top-k."""
    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 100)
    shards = nearest_shards(qv, cents, nprobe=2)
    candidates = assign_shards(emb, cents).filter(F.col("shard_id").isin(shards))
    return topk(candidates, qv, k=5, metric="cosine")


# ===========================================================================
# §2.1 S3 / §1.4: upsert keep-latest (REPLACE INTO semantics,
# reference: src/storage_server.py:43-46)
# ===========================================================================


@register(
    "upsert_keep_latest",
    """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e, 0 AS b FROM embeddings),
upd AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x * 2) AS e, 1 AS b
        FROM embeddings WHERE vec_id < 10),
u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
m AS (SELECT vec_id, e FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY b DESC) AS rn
        FROM u) t
      WHERE rn = 1)
SELECT vec_id, ROUND(sqrt(list_dot_product(e, e)), 6) AS norm
FROM m WHERE vec_id < 20
""",
)
def q_upsert_keep_latest(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    updates = emb.filter(F.col("vec_id") < 10).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    merged = upsert_keep_latest(emb, updates, id_col="vec_id")
    return merged.filter(F.col("vec_id") < 20).select(
        "vec_id", round_score(l2_norm("embedding")).alias("norm")
    )
