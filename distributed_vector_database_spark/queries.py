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

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.vector import (
    cosine_similarity,
    l2_norm,
    micros_mean_6dp_exact,
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
from distributed_vector_database_spark.operators import pq as _pq

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
    if table == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
        # read the raw int64 and truncate to micros (same nanos->micros
        # truncation DuckDB applies when it reads the file).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _spread_read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """``_spread(_read(...))`` with a metadata-only partition-count
    decision: ``df.rdd.getNumPartitions()`` costs a py4j RDD conversion
    (~0.1-0.16 s measured) per call, paid by 58 query setups. For a
    single local parquet file under half the default 128 MB split size
    the effective scan parallelism is (at most a few) partitions of one
    small file — the repartition `_spread` would choose anyway — so the
    decision needs only the file size; anything else falls back to the
    exact check (round 13, guide §5). ADVICE r13 caveat, accepted: a
    session with a non-default ``spark.sql.files.maxPartitionBytes``
    could byte-range-split even a small single file, making this path
    repartition a frame that already had enough partitions — an extra
    small-input shuffle, results unchanged; the sizes where that occurs
    are exactly the sizes where the repartition is cheap."""
    df = _read(spark, sf_dir, table)
    f = _local_parquet(sf_dir, table)
    if f is not None and os.path.getsize(f) < (64 << 20):
        parts = spark.sparkContext.defaultParallelism
        return df.repartition(parts) if parts > 1 else df
    return _spread(df)


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin a small input across the cluster before CPU-heavy
    per-row work (shingle explode, signature aggregation, GEMM).

    The sf* corpora are ONE parquet row-group each, so Spark plans a single
    input task and the whole derivation runs serially on 1 of N cores. A
    real 100 TB corpus has input splits >> cores, where the condition below
    is False and this is a no-op — the repartition is a small-input-only
    policy, never a full-corpus shuffle at scale.
    """
    parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parts:
        return df.repartition(parts)
    return df


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


def _local_parquet(sf_dir: str, table: str) -> str | None:
    """``table``'s single local parquet file, or None when the root is a
    remote URI or the table is a multi-file directory — those read
    through Spark. Guide §5: tiny driver-side setup reads (one query
    vector, 8-16 codebook rows) do not need a distributed job; at
    cluster scale the inputs are multi-file/remote and this returns
    None, keeping the Spark path authoritative.

    Also requires a local master (ADVICE r13): the driver-side read
    assumes the driver's filesystem view of ``sf_dir`` is the one Spark
    reads — true in local mode and for shared mounts, silently wrong
    under Spark Connect or any deployment where client and cluster paths
    differ. Non-local masters opt in via SPARK_GRAFT_DRIVER_READS=1
    (for shared-mount clusters where the paths provably coincide)."""
    if "://" in sf_dir:
        return None
    if os.environ.get("SPARK_GRAFT_DRIVER_READS") != "1":
        sess = SparkSession.getActiveSession()
        if sess is not None and not _master_is_local(sess):
            return None
    p = os.path.join(sf_dir, f"{table}.parquet")
    return p if os.path.isfile(p) else None


_MASTER_LOCAL_MEMO: dict[int, bool] = {}


def _master_is_local(sess: SparkSession) -> bool:
    """Memoized `spark.master startswith local` (the conf lookup is a
    py4j round-trip; `_local_parquet` runs on every query setup)."""
    key = id(sess)
    hit = _MASTER_LOCAL_MEMO.get(key)
    if hit is None:
        hit = sess.conf.get("spark.master", "local").startswith("local")
        _MASTER_LOCAL_MEMO.clear()  # one live session at a time; no leak
        _MASTER_LOCAL_MEMO[key] = hit
    return hit


def _embedding_rows_local(
    sf_dir: str, *, eq: int | None = None, lt: int | None = None
) -> list[list[float]] | None:
    """Driver-side fetch of embedding rows by vec_id predicate from a
    single local parquet file (ordered by vec_id); None -> caller uses
    Spark. float32 -> float64 widening is exact, identical to the JVM
    collect path."""
    f = _local_parquet(sf_dir, "embeddings")
    if f is None:
        return None
    import pyarrow.dataset as ds

    fld = ds.field("vec_id")
    filt = (fld == eq) if eq is not None else (fld < lt)
    t = (
        ds.dataset(f)
        .to_table(columns=["vec_id", "embedding"], filter=filt)
        .sort_by("vec_id")
    )
    return [[float(x) for x in v] for v in t.column("embedding").to_pylist()]


def _hash_embed_py(text: str, dim: int = 64) -> list[float]:
    """Driver-side twin of ``functions.embed.hashing_embed(normalize=False)``
    for ONE short text: ASCII-whitespace tokens (Java ``\\s`` is
    [ \\t\\n\\x0b\\f\\r] — deliberately NOT Python's unicode ``\\s``),
    bucket = int(md5(tok)[:6], 16) % dim, dense count vector. Counts are
    small exact integers, so the doubles are bit-identical to the
    Catalyst path (property-tested in tests/test_embed_hooks.py)."""
    import hashlib
    import re

    counts = [0] * dim
    for tok in re.split("[ \t\n\x0b\f\r]+", text):
        if tok:
            h = hashlib.md5(tok.encode("utf-8")).hexdigest()
            counts[int(h[:6], 16) % dim] += 1
    return [float(c) for c in counts]


def _hashed_doc_vec(sf_dir: str, doc_id: int, dim: int = 64) -> list[float] | None:
    """The unnormalized hashed-BoW vector of one document, computed
    driver-side from the local parquet file (None -> caller derives it
    through Spark). Replaces a full tokenize+explode+groupBy Spark job
    whose output is a single 64-float query vector (guide §5: the
    driver should do almost no data work — but ONE row's hash counts is
    exactly the 'almost')."""
    f = _local_parquet(sf_dir, "documents")
    if f is None:
        return None
    import pyarrow.dataset as ds

    t = ds.dataset(f).to_table(
        columns=["text"], filter=ds.field("doc_id") == doc_id
    )
    if t.num_rows != 1:
        return None
    return _hash_embed_py(t.column(0)[0].as_py(), dim)


def _doc0_hash_qv(spark, sf_dir, dim: int = 64) -> list[float]:
    """Query vector = unnormalized hashed-BoW of doc_id=0, via the local
    fast path when available, else the original Spark derivation."""
    qv = _hashed_doc_vec(sf_dir, 0, dim)
    if qv is not None:
        return qv
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )

    docs = _read(spark, sf_dir, "documents")
    return [
        float(x)
        for x in hashing_embed(
            docs.filter(F.col("doc_id") == 0), dim=dim, normalize=False
        ).head()["embedding"]
    ]


def _query_vec(spark, sf_dir, qid: int) -> list[float]:
    local = _embedding_rows_local(sf_dir, eq=qid)
    if local:
        return local[0]
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
    local = _embedding_rows_local(sf_dir, lt=n)
    if local is not None:
        return local
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


@register(
    "ivf_exact_equiv",
    f"""
WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id IN (0, 50, 100)),
s AS (SELECT qs.query_id, e.vec_id, ROUND({_cos(E, 'qs.qv')}, 6) AS score
      FROM embeddings e, qs),
r AS (SELECT query_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT query_id, vec_id, score, "rank" FROM r WHERE "rank" <= 10
""",
)
def q_ivf_exact_equiv(spark, sf_dir):
    """SURVEY §5.3 primary invariant as a driver-checked row: IVF search
    with nprobe == num_shards must EQUAL exact brute-force top-k
    (reference: POST /search degrades to exact when shards_to_search = N,
    src/compute_server.py:110-138). The Spark side runs the full batched
    IVF machinery — centroid routing, per-query probe masks, Arrow
    per-partition top-k reduce, global merge (IVFIndex.search_batch); the
    oracle is plain exact top-k SQL with no IVF anywhere."""
    from distributed_vector_database_spark.operators.ivf import IVFIndex

    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    idx = IVFIndex(spark, cents).attach(emb)
    queries = emb.filter(F.col("vec_id").isin(0, 50, 100)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    out = idx.search_batch(queries, k=10, nprobe=idx.num_shards())
    return out.withColumn("rank", F.col("rank").cast("long"))


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


# ===========================================================================
# Text analysis operators (SURVEY.md §7.7; operators/text_analysis.py)
# ===========================================================================

from distributed_vector_database_spark.operators import text_analysis as _ta
from distributed_vector_database_spark.operators import dedup as _dd

_TOKS_CTE = (
    "toks AS (SELECT doc_id, text, "
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t "
    "FROM documents)"
)


@register(
    "doc_token_stats",
    f"""
WITH {_TOKS_CTE}
SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
       ROUND(list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t), 6)
         AS avg_token_len
FROM toks
""",
)
def q_doc_token_stats(spark, sf_dir):
    return _ta.token_stats(_read(spark, sf_dir, "documents"))


@register(
    "doc_quality",
    f"""
WITH {_TOKS_CTE}
SELECT doc_id, len(t) AS n_tokens,
       ROUND(0.4 * LEAST(len(t) / 50.0, 1.0)
           + 0.4 * (len(list_distinct(t))::DOUBLE / len(t))
           + 0.2 * LEAST((list_sum(list_transform(t, x -> len(x)))::DOUBLE
                          / len(t)) / 6.0, 1.0), 6) AS quality
FROM toks
""",
)
def q_doc_quality(spark, sf_dir):
    return _ta.quality_scores(_read(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    from distributed_vector_database_spark.operators.text_analysis import (
        LANG_MARKERS,
    )

    order = list(LANG_MARKERS)
    hits = {
        lang: (
            "len(list_filter(t, x -> list_contains(["
            + ", ".join(f"'{m}'" for m in ms)
            + "], x)))"
        )
        for lang, ms in LANG_MARKERS.items()
    }
    sel = ", ".join(f"{hits[lang]} AS s_{lang}" for lang in order)
    cases = []
    for lang in order:
        conds = [f"s_{lang} > 0"]
        for other in order:
            if other == lang:
                continue
            op = ">" if order.index(other) < order.index(lang) else ">="
            conds.append(f"s_{lang} {op} s_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    total = " + ".join(f"s_{lang}" for lang in order)
    return f"""
WITH {_TOKS_CTE},
sc AS (SELECT doc_id, {sel} FROM toks)
SELECT doc_id,
       CASE {' '.join(cases)} ELSE 'und' END AS lang_pred,
       ({total}) AS lang_hits
FROM sc
"""


@register("lang_id", _lang_sql())
def q_lang_id(spark, sf_dir):
    return _ta.language_id(_read(spark, sf_dir, "documents"))


@register(
    "bpe_token_count",
    r"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))
         AS n_bpe_tokens
FROM documents
""",
)
def q_bpe_token_count(spark, sf_dir):
    return _ta.regex_token_count(_read(spark, sf_dir, "documents"))


_FP = r"md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"


@register(
    "doc_fingerprint",
    f"SELECT doc_id, {_FP} AS fp FROM documents",
)
def q_doc_fingerprint(spark, sf_dir):
    return _ta.fingerprints(_read(spark, sf_dir, "documents"))


# ===========================================================================
# Dedup operators (SURVEY.md §7.7; operators/dedup.py)
# ===========================================================================


@register(
    "dedup_exact",
    f"""
SELECT {_FP} AS text_hash, min(doc_id) AS rep_doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
""",
)
def q_dedup_exact(spark, sf_dir):
    return _dd.exact_dedup_groups(_read(spark, sf_dir, "documents"))


_SHINGLE_CTE = f"""
{_TOKS_CTE},
sh0 AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
sh AS (SELECT * FROM sh0 WHERE len(s) > 0)
"""


@register(
    "dedup_jaccard",
    f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg, len(s) AS n FROM sh),
p AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT doc_id_a, doc_id_b,
       ROUND(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
FROM p
WHERE ROUND(inter::DOUBLE / (na + nb - inter), 6) >= 0.8
""",
)
def q_dedup_jaccard(spark, sf_dir):
    return _dd.jaccard_pairs_prefix(
        _spread_read(spark, sf_dir, "documents"), threshold=0.8
    )


def _minhash_sql(num_hashes: int = 8, bands: int = 2) -> str:
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5("
        + " || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_ix, band{b} AS bv FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sig),
st AS ({stacked})
SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM st a JOIN st b
  ON a.band_ix = b.band_ix AND a.bv = b.bv AND a.doc_id < b.doc_id
"""


@register("dedup_minhash_lsh", _minhash_sql())
def q_dedup_minhash_lsh(spark, sf_dir):
    return _dd.minhash_candidate_pairs(
        _spread_read(spark, sf_dir, "documents"), num_hashes=8, bands=2
    )


def _simhash_sql() -> str:
    hexs = "0123456789abcdef"
    sums = []
    for j in range(16):
        nib = f"(strpos('{hexs}', substr(h, {j + 1}, 1)) - 1)"
        for bit in range(4):
            sums.append(
                f"sum((({nib} // {2 ** bit}) % 2) * 2 - 1) AS v_{j}_{bit}"
            )
    chars = []
    for j in range(16):
        val = " + ".join(
            f"(CASE WHEN v_{j}_{b} > 0 THEN {2 ** b} ELSE 0 END)"
            for b in range(4)
        )
        chars.append(f"substr('{hexs}', ({val}) + 1, 1)")
    return f"""
WITH {_TOKS_CTE},
tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
hh AS (SELECT doc_id, md5(tok) AS h FROM tk),
v AS (SELECT doc_id, {', '.join(sums)} FROM hh GROUP BY doc_id)
SELECT doc_id, {' || '.join(chars)} AS simhash FROM v
"""


@register("dedup_simhash", _simhash_sql())
def q_dedup_simhash(spark, sf_dir):
    return _dd.simhash_fingerprints(_spread_read(spark, sf_dir, "documents"))


def _simhash_pairs_sql(max_hamming: int = 3, bands: int = 4) -> str:
    hexs = "0123456789abcdef"
    chunk = 16 // bands
    fp_select = _simhash_sql().strip()
    band_items = ", ".join(
        f"'{b}:' || substr(simhash, {b * chunk + 1}, {chunk})"
        for b in range(bands)
    )
    nib = lambda col, j: f"(strpos('{hexs}', substr({col}, {j + 1}, 1)) - 1)"
    ham = " + ".join(
        f"bit_count(xor({nib('sa', j)}, {nib('sb', j)}))" for j in range(16)
    )
    return f"""
WITH fp AS ({fp_select}),
bands AS (SELECT doc_id, simhash, unnest([{band_items}]) AS band FROM fp),
cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                a.simhash AS sa, b.simhash AS sb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.doc_id < b.doc_id)
SELECT doc_id_a, doc_id_b, ({ham})::BIGINT AS hamming
FROM cand WHERE ({ham}) <= {max_hamming}
"""


@register("dedup_simhash_pairs", _simhash_pairs_sql())
def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS (Manku et al. WWW'07 band blocking): the
    fingerprint table self-joins on 16-bit chunks — pigeonhole guarantees
    no pair within 3 bit flips is missed with 4 bands — then exact
    XOR-popcount verification. Completes the simhash family from
    fingerprints to discovered pairs."""
    return _dd.simhash_neardup_pairs(
        _spread_read(spark, sf_dir, "documents"), max_hamming=3, bands=4
    )


_EA = "(a.embedding::DOUBLE[])"
_EB = "(b.embedding::DOUBLE[])"


@register(
    "dedup_embedding_cosine",
    f"""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       ROUND({_cos(_EA, _EB)}, 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND({_cos(_EA, _EB)}, 6) >= 0.45
""",
)
def q_dedup_embedding_cosine(spark, sf_dir):
    # testdata has no true near-dups (max pairwise cosine ~0.51); 0.45
    # exercises the operator non-trivially. Production default is 0.99.
    return _dd.embedding_neardup_pairs(
        _read(spark, sf_dir, "embeddings"), threshold=0.45
    )


# ===========================================================================
# Relational operator surface (beyond-reference, SURVEY.md §2.12 gaps filled
# Spark-natively): hash-agg with exact DECIMAL sums, broadcast joins, window
# functions, sessionization, rollup, set ops, JSON extraction.
# ===========================================================================

from distributed_vector_database_spark.operators import sessions as _ss


@register(
    "lineitem_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_qty,
       ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_base_price,
       ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_lineitem_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped hash aggregation. Sums go through DECIMAL so results
    are independent of partial-aggregation order (double sums are not)."""
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sp"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sq").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("sp").cast("double"), 2).alias("sum_base_price"),
        F.round(F.col("sq").cast("double") / F.col("count_order"), 6).alias(
            "avg_qty"
        ),
        "count_order",
    )


@register(
    "top_revenue_customers",
    """
SELECT c.c_custkey AS c_custkey, n.n_name AS nation,
       ROUND(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue,
       count(*) AS num_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
""",
)
def q_top_revenue_customers(spark, sf_dir):
    """Fact-to-dim joins: both dims are broadcast (no shuffle of orders on
    the dim side); one hash-agg shuffle on custkey; TakeOrdered top-10."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    joined = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    agg = joined.groupBy(
        F.col("c_custkey"), F.col("n_name").alias("nation")
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("revenue"),
        F.count("*").alias("num_orders"),
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(10)


@register(
    "events_hourly_rollup",
    """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_hourly_rollup(spark, sf_dir):
    """Tumbling-window counts (batch form of the streaming demo in
    streaming/; epoch-aligned 1h tumble == date_trunc('hour'))."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    )


@register(
    "sessionization",
    """
WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sx AS (
  SELECT user_id, ts, event_id, value,
         -- CAST: DuckDB sum(INTEGER) is HUGEINT, which pandas renders as
         -- float64 and the driver's value-hash then mismatches Spark's bigint.
         CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts ASC,
                                  event_id ASC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_ix
  FROM s
)
SELECT user_id, session_ix, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM sx
GROUP BY user_id, session_ix
""",
)
def q_sessionization(spark, sf_dir):
    """Gap-based sessionization (lag window -> boundary flags -> running sum
    -> per-session aggregates). Spark-native form of a session window."""
    return _ss.session_stats(_read(spark, sf_dir, "events"), gap_seconds=1800)


@register(
    "running_totals",
    """
SELECT event_id, user_id,
       count(*) OVER w AS running_n,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
         AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS UNBOUNDED PRECEDING)
""",
)
def q_running_totals(spark, sf_dir):
    return _ss.running_totals(_read(spark, sf_dir, "events"))


@register(
    "latest_event_per_user",
    """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
""",
)
def q_latest_event_per_user(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return _ss.latest_event_per_user(ev).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@register(
    "event_type_rollup",
    """
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events GROUP BY ROLLUP (event_type)
""",
)
def q_event_type_rollup(spark, sf_dir):
    """ROLLUP grouping sets (subtotal + grand total rows, NULL markers)."""
    ev = _read(spark, sf_dir, "events")
    return ev.rollup("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "clickers_also_purchasing",
    """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def q_clickers_also_purchasing(spark, sf_dir):
    """Set operation (INTERSECT == distinct semi-join both ways)."""
    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "json_props_extract",
    """
SELECT event_id,
       CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
FROM events WHERE event_type = 'purchase'
""",
)
def q_json_props_extract(spark, sf_dir):
    """Typed extraction from the JSON props column (regex form is portable;
    Spark-native alternative is get_json_object / from_json)."""
    ev = _read(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.regexp_extract("props", r'"k":\s*(\d+)', 1)
        .cast("long")
        .alias("k"),
    )


@register(
    "median_value_by_type",
    """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS median_value,
       ROUND(sum(CAST(round(value * 100) AS BIGINT))::DOUBLE
             / count(*) / 100.0, 6) AS mean_value
FROM events GROUP BY event_type
""",
)
def q_median_value_by_type(spark, sf_dir):
    """Exact interpolated median + mean per group (the reference's benchmark
    stats shape — mean/std over trials, report/benchmarks.py:35-41)."""
    ev = _read(spark, sf_dir, "events")
    # mean via exact integer-cents sum: double avg() partial-sum order can
    # straddle the 6-dec rounding boundary across engines/runs
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.count("*")
            / 100.0,
            6,
        ).alias("mean_value"),
    )


# ===========================================================================
# ANN (sign-LSH) + hashing embedder (operators/ann.py, functions/embed.py)
# ===========================================================================

from distributed_vector_database_spark.operators import ann as _ann
from distributed_vector_database_spark.functions import embed as _em

_LSH_CTE = """
p AS (SELECT vec_id AS plane_id, embedding::DOUBLE[] AS pv
      FROM embeddings WHERE vec_id < 8),
b AS (SELECT e.vec_id,
             string_agg(CASE WHEN list_dot_product((e.embedding::DOUBLE[]), p.pv) >= 0
                             THEN '1' ELSE '0' END, '' ORDER BY p.plane_id)
               AS bucket
      FROM embeddings e, p GROUP BY e.vec_id)
"""


@register(
    "ann_lsh_buckets",
    f"""
WITH {_LSH_CTE}
SELECT bucket, count(*) AS n_vectors FROM b GROUP BY bucket
""",
)
def q_ann_lsh_buckets(spark, sf_dir):
    """Sign-LSH bucket histogram (planes := first 8 embeddings so the oracle
    can recompute them; production uses random_hyperplanes(seed))."""
    emb = _read(spark, sf_dir, "embeddings")
    planes = _fixed_centroids(spark, sf_dir, 8)
    return (
        _ann.lsh_index(emb, planes)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


@register(
    "ann_lsh_search",
    f"""
WITH {_LSH_CTE},
q AS (SELECT b.bucket AS qb, (e2.embedding::DOUBLE[]) AS qv
      FROM embeddings e2 JOIN b ON b.vec_id = e2.vec_id
      WHERE e2.vec_id = 100),
cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN b ON e.vec_id = b.vec_id
         JOIN q ON b.bucket = q.qb)
SELECT e.vec_id AS vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
FROM cand e, q
ORDER BY score DESC, vec_id ASC
LIMIT 5
""",
)
def q_ann_lsh_search(spark, sf_dir):
    """LSH-bucketed ANN top-k: candidates = the query's bucket only (the
    scale path — one pruned partition instead of the whole corpus)."""
    emb = _read(spark, sf_dir, "embeddings")
    planes = _fixed_centroids(spark, sf_dir, 8)
    indexed = _ann.lsh_index(emb, planes)
    return _ann.lsh_search(indexed, planes, _query_vec(spark, sf_dir, 100), k=5)


@register(
    "ann_lsh_ndcg",
    f"""
WITH {_LSH_CTE},
q AS (SELECT b.bucket AS qb, (e2.embedding::DOUBLE[]) AS qv
      FROM embeddings e2 JOIN b ON b.vec_id = e2.vec_id
      WHERE e2.vec_id = 100),
cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN b ON e.vec_id = b.vec_id
         JOIN q ON b.bucket = q.qb),
approx AS (SELECT vec_id, rnk FROM (
  SELECT e.vec_id,
         ROW_NUMBER() OVER (ORDER BY ROUND({_cos(E, 'q.qv')}, 6) DESC,
                            e.vec_id ASC) AS rnk
  FROM cand e, q) t WHERE rnk <= 10),
exact AS (SELECT vec_id, rnk FROM (
  SELECT e.vec_id,
         ROW_NUMBER() OVER (ORDER BY ROUND({_cos(E, 'q.qv')}, 6) DESC,
                            e.vec_id ASC) AS rnk
  FROM embeddings e, q) t WHERE rnk <= 10),
dcg AS (SELECT COALESCE(sum(1.0 / log2(a.rnk + 1.0)), 0.0) AS dcg
        FROM approx a JOIN exact x ON a.vec_id = x.vec_id),
idcg AS (SELECT sum(1.0 / log2(rnk + 1.0)) AS idcg FROM exact)
SELECT ROUND(dcg.dcg / idcg.idcg, 6) AS ndcg FROM dcg, idcg
""",
)
def q_ann_lsh_ndcg(spark, sf_dir):
    """Rank-aware search-quality as a driver row: NDCG@10 of the LSH
    single-bucket search against exact cosine top-10 (operators/
    eval.ndcg_at_k) — the IR metric that penalizes burying true
    neighbors, not just missing them. Measures quality of the SAME
    pruned path ann_lsh_search verifies for values."""
    from distributed_vector_database_spark.operators.eval import ndcg_at_k
    from distributed_vector_database_spark.operators.fusion import ranked

    emb = _read(spark, sf_dir, "embeddings")
    planes = _fixed_centroids(spark, sf_dir, 8)
    qv = _query_vec(spark, sf_dir, 100)
    indexed = _ann.lsh_index(emb, planes)
    approx = ranked(
        _ann.lsh_search(indexed, planes, qv, k=10),
        id_col="vec_id",
        top_n=10,
    )
    exact = ranked(topk(emb, qv, k=10), id_col="vec_id", top_n=10)
    return ndcg_at_k(approx, exact, 10)


def _bucket_sql(tok_expr: str, dim: int = 64) -> str:
    hexs = "0123456789abcdef"
    terms = " + ".join(
        f"(strpos('{hexs}', substr(md5({tok_expr}), {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    )
    return f"(({terms}) % {dim})"


@register(
    "embed_hash_sparse",
    f"""
WITH {_TOKS_CTE},
tk AS (SELECT doc_id, unnest(t) AS tok FROM toks)
SELECT doc_id, {_bucket_sql('tok')} AS bucket, count(*) AS cnt
FROM tk GROUP BY 1, 2
""",
)
def q_embed_hash_sparse(spark, sf_dir):
    """Hashing-trick embedder, sparse form (reference: src/embed.py's
    embed_text, re-expressed as an offline-safe deterministic transform)."""
    return _em.sparse_token_buckets(_read(spark, sf_dir, "documents"), dim=64)


@register(
    "embed_hash_dense_check",
    f"""
WITH {_TOKS_CTE},
tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
sp AS (SELECT doc_id, {_bucket_sql('tok')} AS bucket, count(*) AS cnt
       FROM tk GROUP BY 1, 2)
SELECT doc_id, ROUND(sqrt(sum(cnt * cnt)::DOUBLE), 6) AS norm,
       count(*) AS nnz
FROM sp GROUP BY doc_id
""",
)
def q_embed_hash_dense_check(spark, sf_dir):
    """Dense hashed-BoW construction checked against an independent SQL
    path: ||dense||₂ must equal sqrt(Σ cnt²) and nnz the bucket count."""
    dense = _em.hashing_embed(
        _read(spark, sf_dir, "documents"), dim=64, normalize=False
    )
    return dense.select(
        "doc_id",
        round_score(l2_norm("embedding")).alias("norm"),
        F.size(F.filter("embedding", lambda x: x != 0.0))
        .cast("long")
        .alias("nnz"),
    )


# ===========================================================================
# Streaming-capable session windows (streaming/events.py, batch-checkable)
# ===========================================================================

from distributed_vector_database_spark.streaming import events as _st


@register(
    "session_window_stats",
    """
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sx AS (
  SELECT user_id, ts,
         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts ASC
                             ROWS UNBOUNDED PRECEDING) AS session_ix
  FROM s
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sx GROUP BY user_id, session_ix
""",
)
def q_session_window_stats(spark, sf_dir):
    """Spark-native session_window (stream-capable) checked against an
    independent lag/boundary SQL derivation. session_window's end is
    last-event + gap; a new session starts when the exact gap >= 30 min."""
    return _st.session_window_stats(_read(spark, sf_dir, "events"))


# ===========================================================================
# End-to-end compositions: embed -> search, and candidates -> verify -> drop
# ===========================================================================


@register(
    "doc_search_hashed",
    f"""
WITH {_TOKS_CTE},
tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
sp AS (SELECT doc_id, {_bucket_sql('tok')} AS bucket, count(*) AS cnt
       FROM tk GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(cnt * cnt)::DOUBLE) AS n FROM sp GROUP BY doc_id),
qd AS (SELECT bucket, cnt FROM sp WHERE doc_id = 0),
dotp AS (SELECT sp.doc_id, sum(sp.cnt * qd.cnt)::DOUBLE AS dp
         FROM sp JOIN qd ON sp.bucket = qd.bucket GROUP BY sp.doc_id)
SELECT n2.doc_id AS doc_id,
       ROUND(COALESCE(dotp.dp, 0.0)
             / (n2.n * (SELECT n FROM nrm WHERE doc_id = 0)), 6) AS score
FROM nrm n2 LEFT JOIN dotp ON n2.doc_id = dotp.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
""",
)
def q_doc_search_hashed(spark, sf_dir):
    """The reference's full text flow (embed_text -> store -> search,
    src/test.py:26-37,114-125) offline: hash-embed all documents, then
    top-10 cosine search for the doc_id=0 query document. The oracle
    recomputes the same cosine from the SPARSE representation."""
    from distributed_vector_database_spark.functions.embed import hashing_embed

    docs = _spread_read(spark, sf_dir, "documents")
    dense = hashing_embed(docs, dim=64, normalize=False)
    qv = _doc0_hash_qv(spark, sf_dir)
    return topk(dense, qv, k=10, vector_col="embedding", id_col="doc_id")


@register(
    "dedup_docs_to_drop",
    f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg, len(s) AS n FROM sh),
p AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT DISTINCT doc_id_b AS doc_id
FROM p WHERE ROUND(inter::DOUBLE / (na + nb - inter), 6) >= 0.8
""",
)
def q_dedup_docs_to_drop(spark, sf_dir):
    """Dedup pipeline end state: near-dup pairs (keep the lower doc_id of
    each pair) -> distinct higher ids to drop. Production flow runs minhash
    candidates first and verifies with exact jaccard — same plan shape."""
    pairs = _dd.jaccard_pairs_prefix(
        _spread_read(spark, sf_dir, "documents"), threshold=0.8
    )
    return pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()


# ===========================================================================
# Temporal as-of join, anti join, EXCEPT, multi-join (operators/temporal.py;
# filling more SURVEY.md §2.12 absent-in-reference join/set-op categories)
# ===========================================================================

from distributed_vector_database_spark.operators.temporal import asof_join


@register(
    "asof_last_click_before_purchase",
    """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click'),
j AS (SELECT p.event_id, p.user_id,
             c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
SELECT event_id, user_id, click_id, click_ts, click_value
FROM j WHERE rn = 1
""",
)
def q_asof_last_click(spark, sf_dir):
    """As-of join (last-click attribution): each purchase gets the user's
    most recent click at-or-before it. The oracle is the quadratic
    range-join + keep-latest definition; the engine's union-merge plan
    (one sort-shuffle, no pair blow-up) must produce identical rows."""
    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        right_tiebreak="event_id",
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("click_id"),
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )


@register(
    "asof_next_purchase_after_click",
    """
WITH c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'),
j AS (SELECT c.event_id, c.user_id,
             p.event_id AS purchase_id, p.ts AS purchase_ts,
             p.value AS purchase_value,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY p.ts ASC, p.event_id DESC) AS rn
      FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts)
SELECT event_id, user_id, purchase_id, purchase_ts, purchase_value
FROM j WHERE rn = 1
""",
)
def q_asof_next_purchase(spark, sf_dir):
    """FORWARD as-of join (click → next purchase conversion): each click
    gets the user's earliest purchase at-or-after it — the look-ahead
    twin of last-click attribution, same union-merge single-shuffle plan
    over time DESCENDING. Ties at equal ts: highest event_id wins (the
    engine's highest-tiebreak contract), mirrored in the oracle's
    ``p.event_id DESC``."""
    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        right_tiebreak="event_id",
        how="inner",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("purchase_id"),
        F.col("asof_ts").alias("purchase_ts"),
        F.col("asof_value").alias("purchase_value"),
    )



@register(
    "quantize_int8_recon",
    """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  list_min(embedding::DOUBLE[]) AS mn,
                  list_max(embedding::DOUBLE[]) AS mx
           FROM embeddings),
q AS (SELECT vec_id, v, mn, mx,
             CASE WHEN mx = mn THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x ->
                    least(greatest(floor((x - mn) * 255.0 / (mx - mn)), 0.0),
                          255.0)::INT)
             END AS codes
      FROM v),
r AS (SELECT vec_id, v,
             list_transform(codes, c -> mn + c * ((mx - mn) / 255.0)) AS recon
      FROM q)
SELECT vec_id,
       ROUND(CASE WHEN sqrt(list_dot_product(v, v)) = 0
                    OR sqrt(list_dot_product(recon, recon)) = 0 THEN 0.0
                  ELSE list_dot_product(v, recon)
                       / (sqrt(list_dot_product(v, v))
                          * sqrt(list_dot_product(recon, recon))) END,
             6) AS recon_cos,
       ROUND(list_max(list_transform(range(1, len(v) + 1),
                                     i -> abs(v[i] - recon[i]))), 6) AS max_err
FROM r
""",
)
def q_quantize_int8_recon(spark, sf_dir):
    """int8 scalar quantization round-trip fidelity per vector: cosine of
    (original, reconstructed) and max abs error. Codes use only IEEE-exact
    ops so the oracle reproduces them bit-for-bit."""
    from distributed_vector_database_spark.functions.quantize import (
        int8_dequantize,
        int8_quantize,
        quantize_stats,
    )

    emb = _read(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    recon = int8_dequantize(int8_quantize("embedding"))
    return emb.select(
        "vec_id",
        round_score(cosine_similarity(v, recon)).alias("recon_cos"),
        F.round(quantize_stats("embedding"), 6).alias("max_err"),
    )


@register(
    "multimodal_payload_stats",
    """
SELECT doc_id,
       strlen(text)::BIGINT AS n_bytes,
       ((strlen(text) + 63) // 64)::BIGINT AS n_frames,
       COALESCE(list_sum(list_transform(string_split(text, ''),
                                        x -> ascii(x))), 0)::BIGINT AS byte_sum
FROM documents
""",
)
def q_multimodal_payload_stats(spark, sf_dir):
    """Multimodal decode plumbing, oracle-checked end-to-end: text encoded
    to a binary content column, then the Arrow-batched mapInPandas stage
    computes size / frame-count / checksum from the raw bytes (the ASCII
    corpus makes byte math SQL-expressible: byte_sum == sum of ascii codes)."""
    from distributed_vector_database_spark.sources.multimodal import (
        payload_stats,
    )

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    return payload_stats(docs, id_col="doc_id", frame_bytes=64)


@register(
    "customers_no_big_order",
    """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
)
def q_customers_no_big_order(spark, sf_dir):
    """Left anti join (NOT EXISTS): customers with no order above 300k.
    The filtered build side keeps the anti-join's hash table small enough
    to broadcast at any scale where 'big orders' are rare."""
    c = _read(spark, sf_dir, "customer")
    big = _read(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return c.join(
        big, c.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "big_purchasers_never_erroring",
    """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 95
""",
)
def q_big_purchasers_never_erroring(spark, sf_dir):
    """EXCEPT DISTINCT set operation (completes the set-op surface next to
    INTERSECT in clickers_also_purchasing)."""
    ev = _read(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 95)
    ).select("user_id")
    e = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 95)
    ).select("user_id")
    return p.subtract(e)


@register(
    "shipping_priority",
    """
SELECT l_orderkey,
       ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1.0 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast against two fact
    scans; filters pushed to every parquet scan; one agg shuffle on the
    (orderkey, orderdate) key; TakeOrdered top-10. Revenue goes through
    per-row DECIMAL cast so partial-agg order can't change cents."""
    c = _read(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1.0).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            ).cast("double"),
            2,
        ).alias("revenue")
    )
    return agg.select("l_orderkey", "revenue", "o_orderdate").orderBy(
        F.desc("revenue"), F.asc("l_orderkey")
    ).limit(10)


# per-process cache of the micro-batch input layout (the stream RUN is what
# the query measures; rewriting the input parquet per call is not)
_STREAM_INPUT_CACHE: dict[str, str] = {}


@register(
    "stateful_running_totals",
    """
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(round(value * 100))::BIGINT AS total_cents
FROM events GROUP BY user_id
""",
)
def q_stateful_running_totals(spark, sf_dir):
    """Custom stateful STREAMING operator, oracle-checked: events replayed
    as 4 micro-batches through applyInPandasWithState (per-user running
    count + integer-cents total); the final per-user state must equal the
    one-shot batch aggregate — streaming and batch are the same definition."""
    import tempfile

    from distributed_vector_database_spark.streaming.events import (
        run_stream_to_batch,
        stateful_user_totals,
    )

    d = _STREAM_INPUT_CACHE.get(sf_dir)
    if d is None:
        src = _read(spark, sf_dir, "events").select("user_id", "value")
        d = tempfile.mkdtemp(prefix="dvdb_stream_")
        src.repartition(4).write.mode("overwrite").parquet(d)
        _STREAM_INPUT_CACHE[sf_dir] = d
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return run_stream_to_batch(
        stateful_user_totals(stream),
        final_keys=["user_id"],
        latest_by="n_events",
        shuffle_partitions=8,
    )


@register(
    "range_clicks_before_purchase",
    """
SELECT p.event_id AS event_id, count(*) AS n_clicks,
       ROUND(CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS click_value
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
GROUP BY 1
""",
)
def q_range_clicks_before_purchase(spark, sf_dir):
    """Interval join: clicks in the hour before each purchase. The oracle
    is the quadratic theta-join definition; the engine's plan explodes each
    purchase to its two covering hour-buckets and equi-joins on
    (user_id, bucket) — shuffle-hash eligible, no per-key nested loop."""
    from distributed_vector_database_spark.operators.temporal import range_join

    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = range_join(
        purchases, clicks, on="user_id", window_seconds=3600
    )
    return pairs.groupBy("event_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(
            F.sum(F.col("r_value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("click_value"),
    )


@register(
    "event_cohort_cube",
    """
SELECT event_type, user_id % 10 AS cohort, count(*) AS n
FROM events GROUP BY CUBE (event_type, cohort)
""",
)
def q_event_cohort_cube(spark, sf_dir):
    """CUBE grouping sets (all 4 grouping combinations, NULL markers) —
    completes the grouping-set surface next to ROLLUP."""
    ev = _read(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 10
    )
    return ev.cube("event_type", "cohort").agg(F.count("*").alias("n"))


@register(
    "event_grouping_sets",
    """
SELECT event_type, user_id % 10 AS cohort,
       CAST(grouping(event_type) * 2 + grouping(cohort) AS BIGINT) AS gid,
       count(*) AS n
FROM events
GROUP BY GROUPING SETS ((event_type), (cohort), ())
""",
)
def q_event_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (neither ROLLUP nor CUBE): per-type totals,
    per-cohort totals, and the grand total in ONE pass, disambiguated by
    grouping_id — the exact multi-marginal shape reporting layers ask
    for. One Expand + one partial-agg shuffle; no re-reads of the fact."""
    ev = _read(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 10
    )
    return ev.groupingSets(
        [["event_type"], ["cohort"], []], "event_type", "cohort"
    ).agg(
        (
            F.grouping("event_type") * 2 + F.grouping("cohort")
        ).cast("long").alias("gid"),
        F.count("*").alias("n"),
    )


@register(
    "click_purchase_reconcile",
    """
WITH c AS (SELECT user_id, count(*)::BIGINT AS n_clicks FROM events
           WHERE event_type = 'click' GROUP BY user_id),
p AS (SELECT user_id, count(*)::BIGINT AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(n_clicks, 0)::BIGINT AS n_clicks,
       COALESCE(n_purchases, 0)::BIGINT AS n_purchases,
       (COALESCE(n_clicks, 0) - COALESCE(n_purchases, 0))::BIGINT AS diff
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
""",
)
def q_click_purchase_reconcile(spark, sf_dir):
    """FULL OUTER reconciliation of two independent rollups (clicks vs
    purchases per user): users present on either side survive with
    zero-filled counts — the audit-join shape used to reconcile two
    pipelines' outputs. Both inputs pre-aggregate before the join, so
    the full-outer shuffle moves one row per user per side."""
    ev = _read(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    j = c.withColumnRenamed("user_id", "cu").join(
        p.withColumnRenamed("user_id", "pu"),
        F.col("cu") == F.col("pu"),
        "full_outer",
    )
    nc = F.coalesce("n_clicks", F.lit(0))
    np_ = F.coalesce("n_purchases", F.lit(0))
    return j.select(
        F.coalesce("cu", "pu").alias("user_id"),
        nc.alias("n_clicks"),
        np_.alias("n_purchases"),
        (nc - np_).alias("diff"),
    )


@register(
    "sql_topk_cosine",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 2)
SELECT e.vec_id AS vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
FROM embeddings e, q
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def q_sql_topk_cosine(spark, sf_dir):
    """The flagship search expressed as pure SQL TEXT against the engine's
    SQL surface (temp views + Spark-4 SQL scalar UDFs that inline into
    codegen — sql.py). Same plan as the Column-API topk_cosine."""
    from distributed_vector_database_spark import sql as _sql

    return _sql.sql(
        spark,
        sf_dir,
        """
WITH q AS (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qv
           FROM embeddings WHERE vec_id = 2)
SELECT e.vec_id AS vec_id,
       ROUND(cosine_sim(CAST(e.embedding AS ARRAY<DOUBLE>), q.qv), 6) AS score
FROM embeddings e CROSS JOIN q
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
    )


@register(
    "skewed_type_totals",
    """
SELECT event_type, count(*) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_value
FROM events GROUP BY event_type
""",
)
def q_skewed_type_totals(spark, sf_dir):
    """Skew-resistant two-phase aggregation (operators/skew.py): 6 hot keys
    salted across 32 buckets before the final combine. DECIMAL sums make the
    regrouping provably result-identical to the plain GROUP BY oracle."""
    from distributed_vector_database_spark.operators.skew import (
        skew_safe_totals,
    )

    ev = _read(spark, sf_dir, "events")
    return skew_safe_totals(
        ev, ["event_type"], value_col="value", salt_from="event_id"
    )


_MULTIRES_SQL = """
WITH b AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
                  CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
                  value
           FROM events)
SELECT bucket_hour, bucket_day, count(*) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_value
FROM b GROUP BY GROUPING SETS ((bucket_hour), (bucket_day))
"""


@register("multires_rollup", _MULTIRES_SQL)
def q_multires_rollup(spark, sf_dir):
    """Hypertable-style multi-resolution rollup: hourly AND daily
    aggregates in ONE scan via GROUPING SETS (the same SQL text runs on
    both engines). At scale this halves the passes a tiered
    continuous-aggregate pipeline makes over raw events."""
    from distributed_vector_database_spark import sql as _sql

    return _sql.sql(spark, sf_dir, _MULTIRES_SQL)


@register(
    "local_supplier_volume",
    """
SELECT n_name AS nation,
       ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1.0 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation ASC
""",
)
def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: the six-table join. Every dimension (customer,
    supplier, nation, region) broadcasts; the only shuffle joins the two
    facts on orderkey; region filter prunes suppliers BEFORE the fact join
    via the broadcast hash lookup."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(dims),
            (li.l_suppkey == dims.s_suppkey)
            & (c.c_nationkey == dims.s_nationkey),
        )
    )
    agg = j.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1.0).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            ).cast("double"),
            2,
        ).alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("nation"))


# ===========================================================================
# Deterministic sketches (operators/sketch.py): portable-hash KMV distinct
# estimation and hash-Bernoulli sampling — oracle-exact across engines.
# ===========================================================================


@register(
    "kmv_distinct_users_by_type",
    """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT
               / 281474976710656.0 AS _h
      FROM d),
r AS (SELECT event_type, _h,
             row_number() OVER (PARTITION BY event_type ORDER BY _h ASC)
               AS _rn
      FROM h),
a AS (SELECT event_type, count(*) AS _nd,
             max(CASE WHEN _rn = 64 THEN _h END) AS _hk
      FROM r GROUP BY event_type)
SELECT event_type,
       (CASE WHEN _nd <= 64 THEN _nd
             ELSE round(63.0 / _hk)::BIGINT END)::BIGINT AS kmv_distinct
FROM a
""",
)
def q_kmv_distinct_users(spark, sf_dir):
    """KMV distinct-count sketch per event_type (k=64; 150 users > k so the
    ESTIMATOR path is exercised, not the exact fallback). Portable md5
    hashing makes the estimate bit-identical across engines — a sketch the
    oracle can verify EXACTLY, unlike HLL."""
    from distributed_vector_database_spark.operators.sketch import kmv_distinct

    ev = _read(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", group_cols=["event_type"], k=64)


@register(
    "hash_sample_docs",
    """
SELECT doc_id, n_chars FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
      / 281474976710656.0 < 0.1
""",
)
def q_hash_sample_docs(spark, sf_dir):
    """Deterministic ~10% Bernoulli sample by key hash (eval-set carving:
    reproducible, join-stable, no RNG state, no global sort)."""
    from distributed_vector_database_spark.operators.sketch import hash_sample

    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return hash_sample(docs, "doc_id", 0.1)


@register(
    "brand_revenue",
    """
SELECT p_brand,
       ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1.0 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand ASC
LIMIT 10
""",
)
def q_brand_revenue(spark, sf_dir):
    """Fact-to-part-dim broadcast join + hash agg on the dim attribute
    (completes table coverage: every testdata table now appears in at
    least one oracle-checked query)."""
    li = _read(spark, sf_dir, "lineitem")
    p = _read(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = j.groupBy("p_brand").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1.0).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            ).cast("double"),
            2,
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )
    return agg.orderBy(F.desc("revenue"), F.asc("p_brand")).limit(10)


@register(
    "vector_json_roundtrip",
    f"""
SELECT e.vec_id AS vec_id, ROUND({_norm(E)}, 6) AS norm
FROM embeddings e
""",
)
def q_vector_json_roundtrip(spark, sf_dir):
    """Reference storage-format compatibility: vectors serialized to the
    JSON-text encoding the reference keeps in SQLite (`reference:
    src/storage_server.py:43-46`) and parsed back must be lossless — the
    oracle computes each norm from the ORIGINAL column; we compute it from
    the to_json -> from_json round-trip."""
    emb = _read(spark, sf_dir, "embeddings")
    as_json = emb.select(
        "vec_id", F.to_json(F.col("embedding")).alias("vector_json")
    )
    parsed = as_json.select(
        "vec_id",
        F.from_json(F.col("vector_json"), "array<double>").alias("v"),
    )
    return parsed.select("vec_id", round_score(l2_norm("v")).alias("norm"))


@register(
    "event_value_pivot",
    """
SELECT user_id,
       ROUND(CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS click,
       ROUND(CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS purchase,
       ROUND(CAST(sum(CASE WHEN event_type = 'error'
                           THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS error
FROM events GROUP BY user_id
""",
)
def q_event_value_pivot(spark, sf_dir):
    """Pivot (long -> wide): per-user value sums as one column per event
    type. A fixed pivot-value list keeps the schema static (no extra
    distinct-scan job) — the form that scales."""
    ev = _read(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "error"])
        .agg(F.sum(F.col("value").cast("decimal(18,2)")))
    )
    return out.select(
        "user_id",
        *[
            F.round(F.col(c).cast("double"), 2).alias(c)
            for c in ("click", "purchase", "error")
        ],
    )


@register(
    "moving_avg_value",
    """
SELECT event_id, user_id,
       ROUND(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
         AS avg_7
FROM events
""",
)
def q_moving_avg_value(spark, sf_dir):
    """Bounded-frame analytic window (7-row sliding mean per user) —
    completes the frame-spec surface next to the unbounded running sums."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("avg_7"),
    )


def _curation_funnel_sql() -> str:
    """Compose the quality / language / dedup oracle fragments into the
    one-pass curation-report SQL (same fragments the individual queries
    verify in isolation)."""
    from distributed_vector_database_spark.operators.text_analysis import (
        LANG_MARKERS,
    )

    order = list(LANG_MARKERS)
    hits = {
        lang: (
            "len(list_filter(t, x -> list_contains(["
            + ", ".join(f"'{m}'" for m in ms)
            + "], x)))"
        )
        for lang, ms in LANG_MARKERS.items()
    }
    sel = ", ".join(f"{hits[lang]} AS s_{lang}" for lang in order)
    cases = []
    for lang in order:
        conds = [f"s_{lang} > 0"]
        for other in order:
            if other == lang:
                continue
            op = ">" if order.index(other) < order.index(lang) else ">="
            conds.append(f"s_{lang} {op} s_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
WITH {_TOKS_CTE},
q AS (SELECT doc_id, len(t) AS n_tokens,
             ROUND(0.4 * LEAST(len(t) / 50.0, 1.0)
                 + 0.4 * (len(list_distinct(t))::DOUBLE / len(t))
                 + 0.2 * LEAST((list_sum(list_transform(t, x -> len(x)))::DOUBLE
                                / len(t)) / 6.0, 1.0), 6) AS quality
      FROM toks),
sc AS (SELECT doc_id, {sel} FROM toks),
lng AS (SELECT doc_id, CASE {' '.join(cases)} ELSE 'und' END AS lang_pred
        FROM sc),
f AS (SELECT d.doc_id, d.source, d.text, q.n_tokens, q.quality
      FROM documents d
      JOIN q USING (doc_id) JOIN lng USING (doc_id)
      WHERE q.quality >= 0.5 AND lng.lang_pred = 'en'),
k AS (SELECT *, row_number() OVER (PARTITION BY {_FP.replace('text', 'f.text')}
                                   ORDER BY doc_id ASC) AS rn
      FROM f)
SELECT source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
       ROUND(sum(CAST(round(quality * 1000000) AS BIGINT))::DOUBLE
             / count(*) / 1000000.0, 6) AS avg_quality
FROM k WHERE rn = 1
GROUP BY source
"""


@register("curation_funnel", _curation_funnel_sql())
def q_curation_funnel(spark, sf_dir):
    """The training-data curation pipeline END TO END as one declarative
    plan: quality filter -> language filter -> exact dedup (keep lowest id
    per content hash) -> per-source corpus report (docs kept, token budget,
    mean quality). Every stage reuses an operator already verified in
    isolation; this query verifies their COMPOSITION against the composed
    oracle."""
    from distributed_vector_database_spark.functions.text import doc_fingerprint
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    q = _ta.quality_scores(docs)
    lng = _ta.language_id(docs).select("doc_id", "lang_pred")
    f = (
        docs.select("doc_id", "source", "text")
        .join(q, "doc_id")
        .join(lng, "doc_id")
        .filter((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
    )
    w = Window.partitionBy(doc_fingerprint("text")).orderBy(F.asc("doc_id"))
    kept = f.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    # quality is 6-dec rounded -> micro-units are exact integers; integer
    # sum + one division is order-independent, unlike avg() over doubles
    # (whose partial-sum order can straddle a rounding boundary)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum(F.round(F.col("quality") * 1000000).cast("long")).cast(
                "double"
            )
            / F.count("*")
            / 1000000.0,
            6,
        ).alias("avg_quality"),
    )


def _lang_confusion_sql() -> str:
    from distributed_vector_database_spark.operators.text_analysis import (
        LANG_MARKERS,
    )

    order = list(LANG_MARKERS)
    hits = {
        lang: (
            "len(list_filter(t, x -> list_contains(["
            + ", ".join(f"'{m}'" for m in ms)
            + "], x)))"
        )
        for lang, ms in LANG_MARKERS.items()
    }
    sel = ", ".join(f"{hits[lang]} AS s_{lang}" for lang in order)
    cases = []
    for lang in order:
        conds = [f"s_{lang} > 0"]
        for other in order:
            if other == lang:
                continue
            op = ">" if order.index(other) < order.index(lang) else ">="
            conds.append(f"s_{lang} {op} s_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
WITH {_TOKS_CTE},
sc AS (SELECT doc_id, {sel} FROM toks),
p AS (SELECT doc_id, CASE {' '.join(cases)} ELSE 'und' END AS lang_pred
      FROM sc)
SELECT d.lang, p.lang_pred, count(*) AS n
FROM documents d JOIN p USING (doc_id)
GROUP BY d.lang, p.lang_pred
"""


@register("lang_confusion", _lang_confusion_sql())
def q_lang_confusion(spark, sf_dir):
    """Classifier evaluation as a query: confusion counts of predicted vs
    labeled language (the documents table carries ground-truth ``lang``)."""
    docs = _read(spark, sf_dir, "documents")
    pred = _ta.language_id(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


# ===========================================================================
# Product quantization (operators/pq.py): compressed-domain encode + ADC
# search — the 100 TB memory path the reference lacks (it stores raw float64
# JSON, src/storage_server.py:43-46). Codebooks := subvector slices of
# embeddings vec_id < 16 (m=8 subspaces × k=16 codewords over 64-d), the PQ
# analogue of POST /set_centroids so both engines derive identical books.
# ===========================================================================

_PQ_CTE = """
cbrows AS (SELECT vec_id AS c, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 16),
js AS (SELECT j::INT AS j FROM range(8) t(j)),
cb AS (SELECT j, list(list_slice(e, j*8+1, j*8+8) ORDER BY c) AS book FROM cbrows, js GROUP BY j),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
enc AS (SELECT v.vec_id, cb.j, cb.book,
        list_transform(cb.book,
          c -> list_reduce(list_transform(list_zip(list_slice(v.e, cb.j*8+1, cb.j*8+8), c),
                 z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS dists
        FROM vecs v, cb),
codes AS (SELECT vec_id, j, book, dists,
          (list_position(dists, list_min(dists)) - 1)::INT AS code FROM enc)
"""


def _pq_books(spark, sf_dir, n: int = 16, m: int = 8):
    local = _embedding_rows_local(sf_dir, lt=n)
    if local is not None:
        return _pq.codebooks_from_rows(local, m)
    rows = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return _pq.codebooks_from_rows([[float(x) for x in r[0]] for r in rows], m)


@register(
    "pq_encode_recon",
    f"""
WITH {_PQ_CTE}
SELECT vec_id, string_agg(code::VARCHAR, ',' ORDER BY j) AS codes,
       ROUND(sqrt(SUM(list_min(dists))), 6) AS recon_err
FROM codes GROUP BY vec_id
""",
)
def q_pq_encode_recon(spark, sf_dir):
    """PQ encode (squared-L2 argmin per subspace, first-min tie-break) +
    reconstruction error — a narrow projection, no shuffle; codes are the
    32x-compressed index representation."""
    books = _pq_books(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    # Arrow/GEMM encode (proven element-identical to the expression path in
    # tests/test_pq.py::test_arrow_path_equals_expression_path) — at 100k+
    # rows the batched matmul beats the m*k expression tree ~10x
    enc = _pq.pq_encode_arrow(emb, books).select(
        "vec_id",
        "codes",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    from distributed_vector_database_spark.functions.vector import (
        euclidean_distance,
    )

    return enc.select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes"),
        F.round(
            euclidean_distance("e", _pq.pq_decode("codes", books)), 6
        ).alias("recon_err"),
    )


@register(
    "pq_adc_topk",
    f"""
WITH {_PQ_CTE},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 100),
adc AS (SELECT vec_id,
        SUM(list_reduce(list_transform(list_zip(list_slice(q.qv, j*8+1, j*8+8), book[code+1]),
              z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS d
        FROM codes, q GROUP BY vec_id)
SELECT vec_id, ROUND(d, 6) AS adc_dist FROM adc
ORDER BY adc_dist ASC, vec_id ASC LIMIT 10
""",
)
def q_pq_adc_topk(spark, sf_dir):
    """Asymmetric-distance top-k over PQ codes only (query stays raw; per-
    subspace LUT enters the plan as a literal — m lookups + sum per row,
    scanning 1/32nd the bytes of the float column)."""
    books = _pq_books(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    enc = _pq.pq_encode_arrow(emb, books).select("vec_id", "codes")
    qv = _query_vec(spark, sf_dir, 100)
    return _pq.pq_adc_topk(enc, books, qv, k=10)


# ===========================================================================
# Interchange formats (sources/formats.py): CSV / JSON-lines round trips.
# The re-read copy must aggregate identically to the original parquet —
# proves the text sources/sinks are lossless (explicit schema, microsecond
# timestamps). Oracle reads the ORIGINAL parquet: any roundtrip loss shows
# up as a value mismatch.
# ===========================================================================

_FMT_CACHE: dict[tuple[str, str], str] = {}


def _roundtripped(spark, sf_dir: str, table: str, fmt: str, cols) -> DataFrame:
    import tempfile

    from distributed_vector_database_spark.sources.formats import (
        read_text_format,
        write_text_format,
    )

    src = _read(spark, sf_dir, table).select(*cols)
    key = (sf_dir, f"{table}.{fmt}")
    d = _FMT_CACHE.get(key)
    if d is None:
        d = tempfile.mkdtemp(prefix=f"dvdb_{fmt}_")
        write_text_format(src, fmt, d)
        _FMT_CACHE[key] = d
    return read_text_format(spark, fmt, d, src.schema)


@register(
    "csv_roundtrip_orders",
    """
SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
       sum(round(o_totalprice * 100))::BIGINT AS total_cents,
       max(o_orderdate) AS last_order
FROM orders GROUP BY o_orderstatus
""",
)
def q_csv_roundtrip_orders(spark, sf_dir):
    """Orders written to CSV and re-read with explicit schema; aggregates
    must equal DuckDB over the original parquet (lossless text sink)."""
    back = _roundtripped(
        spark,
        sf_dir,
        "orders",
        "csv",
        ["o_orderstatus", "o_totalprice", "o_orderdate"],
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "json_roundtrip_events",
    """
SELECT event_type, count(*)::BIGINT AS n,
       sum(round(value * 100))::BIGINT AS value_cents,
       max(ts) AS last_ts
FROM events GROUP BY event_type
""",
)
def q_json_roundtrip_events(spark, sf_dir):
    """Events written as JSON lines and re-read (microsecond timestamps);
    aggregates must equal DuckDB over the original parquet."""
    back = _roundtripped(
        spark, sf_dir, "events", "json", ["event_type", "value", "ts"]
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "value_cents"
        ),
        F.max("ts").alias("last_ts"),
    )


# ===========================================================================
# §2.5 extension: lag/lead analytic windows — inter-event gap + next event
# type per user (the per-entity sequence feature a training pipeline derives
# from an event log).
# ===========================================================================


@register(
    "event_gaps",
    """
SELECT user_id, event_id,
       ROUND(EXTRACT(EPOCH FROM ts - LAG(ts) OVER w), 6) AS gap_sec,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_event_gaps(spark, sf_dir):
    """lag/lead over a deterministic (ts, event_id) per-user order: seconds
    since the user's previous event and the type of their next one. One
    shuffle by user_id; both functions share the same window spec so
    Catalyst plans a single Window operator."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast: unix_micros is LTZ-strict; parquet ts may arrive NTZ under a
    # default session (NTZ->LTZ at UTC is wall-clock-preserving, and the
    # lag DIFFERENCE cancels any fixed offset anyway)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            (us - F.lag(us).over(w)).cast("double") / 1000000.0, 6
        ).alias("gap_sec"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "value_range_window",
    """
SELECT event_id, user_id,
       CAST(sum(round(value * 100)::BIGINT) OVER w AS BIGINT) AS hour_cents,
       CAST(count(*) OVER w AS BIGINT) AS hour_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def q_value_range_window(spark, sf_dir):
    """VALUE-based window frame (RANGE, not ROWS): each event's trailing
    one-hour sum/count for its user — frames sized by TIME, so ties and
    bursts are handled by value, not row position. Ordered by epoch
    micros (a numeric key both engines frame identically); values sum as
    exact integer cents. One shuffle by user_id. The DuckDB ``sum`` over
    BIGINT returns HUGEINT, hence the explicit BIGINT casts (the r1
    ``sessionization`` lesson)."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3600 * 1000000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("hour_cents"),
        F.count(F.lit(1)).over(w).alias("hour_events"),
    )


@register(
    "hourly_gap_fill",
    """
WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                  date_trunc('hour', max(ts)) AS h1 FROM events),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM b),
agg AS (SELECT date_trunc('hour', ts) AS hour, count(*)::BIGINT AS n_events,
               CAST(sum(round(value * 100)::BIGINT) AS BIGINT) AS value_cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT spine.hour AS hour,
       COALESCE(agg.n_events, 0)::BIGINT AS n_events,
       COALESCE(agg.value_cents, 0)::BIGINT AS value_cents
FROM spine LEFT JOIN agg ON spine.hour = agg.hour
""",
)
def q_hourly_gap_fill(spark, sf_dir):
    """Date-spine gap filling: a generated hour spine (``sequence`` +
    explode, the Spark idiom for generate_series) LEFT-joined to the
    hourly purchase rollup, absent hours filled with zero — the standard
    time-series densification step reporting layers need (46 of ~720
    hours have no purchase at sf0.01). The spine is tiny and
    broadcast; the rollup is one partial-agg shuffle."""
    ev = _read(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
    )
    return spine.join(agg, "hour", "left").select(
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
    )


# ===========================================================================
# Skew-safe equi-join (operators/skew.py salted_join): big-side salt +
# buckets-fold dim replication. Semantically a plain equi-join — the oracle
# is the unsalted SQL join, so any row lost/duplicated by the salting
# mechanics fails the gate.
# ===========================================================================


@register(
    "salted_event_enrichment",
    """
SELECT c.c_mktsegment, count(*)::BIGINT AS n_events,
       count(DISTINCT e.user_id)::BIGINT AS n_users,
       sum(round(e.value * 100))::BIGINT AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_salted_event_enrichment(spark, sf_dir):
    """Enrich the (skewed) event log with customer attributes via
    salted_join(buckets=8), then aggregate per market segment. At scale:
    each hot user's rows spread over 8 tasks instead of stalling one."""
    from distributed_vector_database_spark.operators.skew import salted_join

    ev = _read(spark, sf_dir, "events").select("user_id", "event_id", "value")
    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, "user_id", buckets=8, salt_from="event_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "value_cents"
        ),
    )


# ===========================================================================
# IVF-PQ: the two index halves composed — centroid routing prunes shards
# (reference's only optimization, src/compute_server.py:110), then the
# surviving shards are scanned in the COMPRESSED domain (ADC over codes).
# At 100 TB: read nprobe/N of the corpus × 1/32 of the bytes.
# ===========================================================================


@register(
    "ivfpq_search",
    f"""
WITH {_ASSIGN_CTE}, {_PQ_CTE},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 100),
probe AS (SELECT c.shard_id FROM c, q
          ORDER BY list_distance(c.cv, q.qv) ASC, c.shard_id ASC LIMIT 2),
adc AS (SELECT codes.vec_id,
        SUM(list_reduce(list_transform(list_zip(list_slice(q.qv, j*8+1, j*8+8), book[code+1]),
              z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS d
        FROM codes, q
        WHERE codes.vec_id IN (SELECT vec_id FROM assign
                               WHERE shard_id IN (SELECT shard_id FROM probe))
        GROUP BY codes.vec_id)
SELECT vec_id, ROUND(d, 6) AS adc_dist FROM adc
ORDER BY adc_dist ASC, vec_id ASC LIMIT 10
""",
)
def q_ivfpq_search(spark, sf_dir):
    """Full IVF-PQ read path: nearest-2-centroid probe -> partition-pruned
    scan -> ADC top-10 over PQ codes only (no float column touched)."""
    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    books = _pq_books(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 100)
    shards = nearest_shards(qv, cents, nprobe=2)
    # prune FIRST, then encode only the probed shards' rows (at scale the
    # codes are precomputed at index build; on the fly, encoding after the
    # prune keeps the Python kernel off the unprobed 6/8 of the corpus)
    pruned = assign_shards(emb, cents).filter(F.col("shard_id").isin(shards))
    enc = _pq.pq_encode_arrow(pruned, books).select("vec_id", "codes")
    return _pq.pq_adc_topk(enc, books, qv, k=10)


def _residual_books(spark, sf_dir, cents, n: int = 16, m: int = 8):
    """Codebooks from the residuals of the first ``n`` vectors against
    their assigned centroid — the residual analogue of ``_pq_books``,
    reproducible row-for-row by the oracle's CTE."""
    local = _embedding_rows_local(sf_dir, lt=n)
    if local is not None:
        rows = [(v,) for v in local]
    else:
        rows = (
            _read(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < n)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
    res = []
    for r in rows:
        v = [float(x) for x in r[0]]
        # same routing rule as assign_shards: squared-L2 argmin, lowest
        # shard wins ties (reference: src/compute_server.py:41-49)
        best, best_d = 0, None
        for sid, c in enumerate(cents):
            d = sum((a - float(b)) ** 2 for a, b in zip(v, c))
            if best_d is None or d < best_d:
                best, best_d = sid, d
        res.append([a - float(b) for a, b in zip(v, cents[best])])
    return _pq.codebooks_from_rows(res, m)


@register(
    "ivfpq_residual_search",
    f"""
WITH {_ASSIGN_CTE},
res AS (SELECT e.vec_id, a.shard_id,
        list_transform(list_zip(e.embedding::DOUBLE[], c.cv), z -> z[1]-z[2]) AS r
        FROM embeddings e JOIN assign a USING (vec_id)
        JOIN c ON a.shard_id = c.shard_id),
cbrows AS (SELECT vec_id AS cid, r FROM res WHERE vec_id < 16),
js AS (SELECT j::INT AS j FROM range(8) t(j)),
cb AS (SELECT j, list(list_slice(r, j*8+1, j*8+8) ORDER BY cid) AS book
       FROM cbrows, js GROUP BY j),
enc AS (SELECT res.vec_id, res.shard_id, cb.j, cb.book,
        list_transform(cb.book,
          cc -> list_reduce(list_transform(list_zip(list_slice(res.r, cb.j*8+1, cb.j*8+8), cc),
                 z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS dists
        FROM res, cb),
codes AS (SELECT vec_id, shard_id, j, book, dists,
          (list_position(dists, list_min(dists)) - 1)::INT AS code FROM enc),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 100),
probe AS (SELECT c.shard_id FROM c, q
          ORDER BY list_distance(c.cv, q.qv) ASC, c.shard_id ASC LIMIT 2),
qres AS (SELECT c.shard_id,
         list_transform(list_zip(q.qv, c.cv), z -> z[1]-z[2]) AS qr FROM c, q),
adc AS (SELECT codes.vec_id,
        SUM(list_reduce(list_transform(list_zip(list_slice(qres.qr, j*8+1, j*8+8), book[code+1]),
              z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS d
        FROM codes JOIN qres ON codes.shard_id = qres.shard_id
        WHERE codes.shard_id IN (SELECT shard_id FROM probe)
        GROUP BY codes.vec_id)
SELECT vec_id, ROUND(d, 6) AS adc_dist FROM adc
ORDER BY adc_dist ASC, vec_id ASC LIMIT 10
""",
)
def q_ivfpq_residual_search(spark, sf_dir):
    """Residual IVF-PQ (IVFADC proper, Jégou et al. TPAMI 2011 §IV):
    vectors are PQ-encoded as residuals against their routing centroid,
    and the query is re-expressed per probed cell via per-shard LUTs —
    better recall than plain IVF-PQ at identical code bits (delta
    published in RECALL.md). Beyond-reference surface: the reference's
    report cites IVF (p.2) but stores raw float JSON
    (`reference: src/storage_server.py:43-46`)."""
    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    books = _residual_books(spark, sf_dir, cents)
    qv = _query_vec(spark, sf_dir, 100)
    assigned = assign_shards(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ),
        cents,
    )
    # materialize the residual through a Generate: pq_encode references its
    # input once per (subspace × codeword) distance term, and Catalyst
    # would re-inline the zip_with subtraction into every one of them
    res = assigned.select(
        "vec_id",
        "shard_id",
        F.explode(
            F.array(_pq.residual_col("embedding", "shard_id", cents))
        ).alias("_res"),
    )
    # Arrow GEMM encode + numpy-gather ADC: proven element-identical to
    # the pure-expression paths (tests/test_pq.py), ~4x faster here since
    # the S*m*k LUT literals never enter the plan
    enc = _pq.pq_encode_arrow(
        res, books, vector_col="_res", keep_cols=("shard_id",)
    ).select("vec_id", "shard_id", "codes")
    return _pq.ivfpq_residual_topk(
        enc, cents, books, qv, k=10, nprobe=2, method="gather"
    )


@register(
    "opq_rotated_adc_topk",
    """
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
rot AS (SELECT vec_id,
        list_transform(e, x -> x - (2.0/64.0) * list_reduce(e, (a,b) -> a+b)) AS re
        FROM vecs),
cbrows AS (SELECT vec_id AS c, re FROM rot WHERE vec_id < 16),
js AS (SELECT j::INT AS j FROM range(8) t(j)),
cb AS (SELECT j, list(list_slice(re, j*8+1, j*8+8) ORDER BY c) AS book
       FROM cbrows, js GROUP BY j),
enc AS (SELECT r.vec_id, cb.j, cb.book,
        list_transform(cb.book,
          cc -> list_reduce(list_transform(list_zip(list_slice(r.re, cb.j*8+1, cb.j*8+8), cc),
                 z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS dists
        FROM rot r, cb),
codes AS (SELECT vec_id, j, book, dists,
          (list_position(dists, list_min(dists)) - 1)::INT AS code FROM enc),
q AS (SELECT re AS qv FROM rot WHERE vec_id = 100),
adc AS (SELECT vec_id,
        SUM(list_reduce(list_transform(list_zip(list_slice(q.qv, j*8+1, j*8+8), book[code+1]),
              z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS d
        FROM codes, q GROUP BY vec_id)
SELECT vec_id, ROUND(d, 6) AS adc_dist FROM adc
ORDER BY adc_dist ASC, vec_id ASC LIMIT 10
""",
)
def q_opq_rotated_adc_topk(spark, sf_dir):
    """OPQ pipeline shape (Ge et al. CVPR 2013): rotate → PQ-encode in the
    rotated basis → ADC search with the rotated query. The registered
    rotation is the fixed Householder ``H = I - (2/dim)·11ᵀ`` so the
    oracle reproduces the arithmetic exactly (``H·x = x - (2/dim)·Σx``);
    the data-dependent PCA rotation (``fit_opq_rotation``, eigenvalue
    allocation) runs through the SAME rotate→encode→ADC path and is
    verified against numpy in tests/test_pq.py. Rotation is a narrow
    Catalyst projection — no shuffle; orthogonality preserves L2, so ADC
    distances in the rotated basis estimate original distances."""
    emb = _read(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    s = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    f = 2.0 / 64.0
    # route the element sum through a Generate so the transform lambda
    # reads a materialized attribute instead of re-evaluating the
    # aggregate per element (the _shingled O(len²) re-inline pitfall)
    rot = emb.select(
        "vec_id", v.alias("_v"), F.explode(F.array(s)).alias("_s")
    ).select(
        "vec_id",
        F.transform(
            F.col("_v"), lambda x: x - F.lit(f) * F.col("_s")
        ).alias("re"),
    )

    def _hrot(vec):
        t = 0.0
        for x in vec:
            t += float(x)
        return [float(x) - f * t for x in vec]

    local = _embedding_rows_local(sf_dir, lt=16)
    if local is not None:
        rows = [(v,) for v in local]
    else:
        rows = (
            _read(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < 16)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
    books = _pq.codebooks_from_rows([_hrot(r[0]) for r in rows], 8)
    qv = _hrot(_query_vec(spark, sf_dir, 100))
    enc = _pq.pq_encode_arrow(rot, books, vector_col="re").select(
        "vec_id", "codes"
    )
    return _pq.pq_adc_topk(enc, books, qv, k=10, method="gather")


# ===========================================================================
# Corpus dictionary + keyword extraction (operators/text_analysis.py):
# global term frequencies and per-doc smoothed TF-IDF top terms.
# ===========================================================================

_DT_CTE = (
    _TOKS_CTE
    + """,
dt AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM dt GROUP BY doc_id, term)"""
)


@register(
    "term_frequencies",
    f"""
WITH {_DT_CTE}
SELECT term, sum(tf)::BIGINT AS n FROM tf GROUP BY term
ORDER BY n DESC, term ASC LIMIT 50
""",
)
def q_term_frequencies(spark, sf_dir):
    """Top-50 corpus dictionary: explode -> partial-agg wordcount."""
    return (
        _ta.term_frequencies(_read(spark, sf_dir, "documents"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(50)
    )


@register(
    "doc_tfidf_top_terms",
    f"""
WITH {_DT_CTE},
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * ln((1.0 + n.n) / (1.0 + df.df)), 6) AS tfidf
  FROM tf JOIN df USING (term), n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored)
SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= 3
""",
)
def q_doc_tfidf_top_terms(spark, sf_dir):
    """Per-doc top-3 keywords by smoothed TF-IDF (rounded-score ranking so
    both engines break ties identically)."""
    return _ta.tfidf_top_terms(_read(spark, sf_dir, "documents"), k=3)


# ===========================================================================
# Streaming exact dedup (streaming/events.py dedup_stream): the event log is
# replayed TWICE as separate micro-batches; the deduped stream must
# aggregate exactly like the single batch copy — proving cross-batch
# duplicate state works. Oracle: plain SQL over the original events.
# ===========================================================================

_DEDUP_STREAM_CACHE: dict[str, str] = {}


@register(
    "stream_dedup_counts",
    """
SELECT event_type, count(*)::BIGINT AS n,
       sum(round(value * 100))::BIGINT AS value_cents
FROM events GROUP BY event_type
""",
)
def q_stream_dedup_counts(spark, sf_dir):
    import tempfile

    from distributed_vector_database_spark.streaming.events import (
        dedup_stream,
        read_event_stream,
        run_stream_to_batch,
    )

    d = _DEDUP_STREAM_CACHE.get(sf_dir)
    if d is None:
        src = _read(spark, sf_dir, "events")
        d = tempfile.mkdtemp(prefix="dvdb_dedupstream_")
        # two identical file sets -> every event arrives in two different
        # micro-batches
        src.coalesce(2).write.mode("append").parquet(d)
        src.coalesce(2).write.mode("append").parquet(d)
        _DEDUP_STREAM_CACHE[sf_dir] = d
    deduped = dedup_stream(
        read_event_stream(spark, d, max_files_per_trigger=2),
        keys=["event_id"],
    )
    out = run_stream_to_batch(deduped, shuffle_partitions=8)
    return out.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "value_cents"
        ),
    )


# ===========================================================================
# Z-order layout (sources/layout.py): Morton z-value of (l_orderkey,
# l_partkey), histogrammed by fixed z-range — the curve addressing that
# makes a two-column range predicate file-skippable. Oracle computes the
# identical unrolled bit-interleave in SQL.
# ===========================================================================


def _zorder_sql() -> str:
    from distributed_vector_database_spark.sources.layout import zvalue_sql

    z = zvalue_sql("l_orderkey", "l_partkey", bits=16)
    return f"""
WITH z AS (SELECT {z} AS zv FROM lineitem)
SELECT (zv >> 26)::BIGINT AS z_bucket, count(*)::BIGINT AS n,
       min(zv)::BIGINT AS min_z, max(zv)::BIGINT AS max_z
FROM z GROUP BY z_bucket
"""


@register("zorder_curve_stats", _zorder_sql())
def q_zorder_curve_stats(spark, sf_dir):
    """Morton z-values bucketed by their top bits: each bucket is a
    rectangle of the (orderkey, partkey) plane — the per-file range audit
    of a z-ordered layout, without a global sort (bucket = zv >> 26)."""
    from distributed_vector_database_spark.sources.layout import zvalue

    li = _read(spark, sf_dir, "lineitem")
    zv = zvalue("l_orderkey", "l_partkey", bits=16)
    return (
        li.select(zv.alias("zv"))
        .groupBy(F.shiftright(F.col("zv"), 26).alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("zv").alias("min_z"),
            F.max("zv").alias("max_z"),
        )
    )


# ===========================================================================
# Streamed tumbling windows (streaming/events.tumbling_counts): the event
# log replayed as 4 unordered micro-batches; final window states must equal
# the one-shot batch rollup. watermark=None because backfill replay is not
# time-ordered (see docstring) — the live-feed path keeps the watermark.
# ===========================================================================


@register(
    "stream_tumbling_counts",
    """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling_counts(spark, sf_dir):
    import tempfile

    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        run_stream_to_batch,
        tumbling_counts,
    )

    d = _STREAM_INPUT_CACHE.get(f"{sf_dir}#full")
    if d is None:
        src = _read(spark, sf_dir, "events")
        d = tempfile.mkdtemp(prefix="dvdb_streamfull_")
        src.repartition(4).write.mode("overwrite").parquet(d)
        _STREAM_INPUT_CACHE[f"{sf_dir}#full"] = d
    stream = read_event_stream(spark, d, max_files_per_trigger=2)
    out = run_stream_to_batch(
        tumbling_counts(stream, watermark=None),
        final_keys=["window_start", "window_end", "event_type"],
        latest_by="n_events",
        shuffle_partitions=8,
    )
    return out.select("window_start", "event_type", "n_events", "sum_value")


# ===========================================================================
# UDAF surface: a registered pandas GROUPED_AGG aggregate (the reference has
# no UDF system at all, SURVEY.md §2.10). Money math in integer cents inside
# the UDAF so partial-order cannot change the result.
# ===========================================================================


@register(
    "udaf_mean_cents_by_type",
    """
SELECT event_type,
       sign(sum(round(value * 100)))
         * ((2000000 * abs(sum(round(value * 100))::BIGINT) + count(*))
            // (2 * count(*))) / 1e6 AS mean_cents
FROM events GROUP BY event_type
""",
)
def q_udaf_mean_cents_by_type(spark, sf_dir):
    """Arrow-batched GROUPED_AGG pandas UDAF (registered, reusable from SQL
    too): exact mean-in-cents per event type."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: the type-hint form can't resolve 'pd.Series'
    # under postponed annotations with a function-local pandas import
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def mean_cents(v):
        # exact-integer 6dp half-away rounding in python ints (the
        # ratio_6dp_exact convention — rounding the float quotient
        # diverges across engines ON a 6dp boundary)
        s = int((v * 100).round().astype("int64").sum())
        n = len(v)
        sign = -1 if s < 0 else 1
        return sign * ((2_000_000 * abs(s) + n) // (2 * n)) / 1e6

    spark.udf.register("mean_cents", mean_cents)
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        mean_cents(F.col("value")).alias("mean_cents")
    )


# ===========================================================================
# Scalar + correlated subqueries (§2.12 absent-in-reference category).
# ===========================================================================


@register(
    "orders_above_global_avg",
    """
SELECT o_orderstatus, count(*)::BIGINT AS n
FROM orders
WHERE o_totalprice > (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))::DOUBLE
                             / count(*) / 100.0
                      FROM orders)
GROUP BY o_orderstatus
""",
)
def q_orders_above_global_avg(spark, sf_dir):
    """Scalar subquery: orders pricier than the global mean. Spark plans
    the subquery as an independent one-row job reused as a literal."""
    o = _read(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_sq")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n
        FROM _orders_sq
        WHERE o_totalprice > (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                                     / count(*) / 100.0
                              FROM _orders_sq)
        GROUP BY o_orderstatus
        """
    )


@register(
    "customer_max_order",
    """
SELECT c.c_custkey, c.c_name,
       (SELECT max(o.o_totalprice) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_price
FROM customer c
WHERE c.c_custkey < 100
""",
)
def q_customer_max_order(spark, sf_dir):
    """Correlated scalar subquery per customer (Catalyst de-correlates it
    into an aggregate + left outer join — no per-row re-execution)."""
    _read(spark, sf_dir, "orders").createOrReplaceTempView("_orders_c")
    _read(spark, sf_dir, "customer").createOrReplaceTempView("_customer_c")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               (SELECT max(o.o_totalprice) FROM _orders_c o
                WHERE o.o_custkey = c.c_custkey) AS max_price
        FROM _customer_c c
        WHERE c.c_custkey < 100
        """
    )


@register(
    "pq_adc_batch_topk",
    f"""
WITH {_PQ_CTE},
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (100, 200, 300)),
adc AS (SELECT q.query_id, codes.vec_id,
        SUM(list_reduce(list_transform(list_zip(list_slice(q.qv, j*8+1, j*8+8), book[code+1]),
              z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS d
        FROM codes, q GROUP BY q.query_id, codes.vec_id),
ranked AS (SELECT query_id, vec_id, ROUND(d, 6) AS adc_dist,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ROUND(d, 6) ASC, vec_id ASC) AS rank
           FROM adc)
SELECT query_id, vec_id, adc_dist, rank::BIGINT AS rank
FROM ranked WHERE rank <= 5
""",
)
def q_pq_adc_batch_topk(spark, sf_dir):
    """Batched compressed-domain search: 3 queries' LUT tensors ship in one
    task closure; per-partition numpy-gather top-k then a window merge of
    partitions x k x |Q| survivors (same two-phase shape as batch_topk)."""
    books = _pq_books(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    enc = _pq.pq_encode_arrow(emb, books).select("vec_id", "codes")
    queries = [
        (qid, _query_vec(spark, sf_dir, qid)) for qid in (100, 200, 300)
    ]
    out = _pq.pq_adc_batch_topk(enc, books, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ===========================================================================
# Iterative closure (operators/graph.py): connected components of the
# near-dup pair graph — the "keep one per duplicate GROUP" step that pair
# detection alone cannot answer (A~B, B~C => {A,B,C} one cluster). Spark
# side is a label-propagation fixpoint loop; oracle is an independent
# RECURSIVE CTE. A new operator class: iterative algorithms.
# ===========================================================================


@register(
    "dedup_clusters",
    f"""
WITH RECURSIVE {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg, len(s) AS n FROM sh),
p AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
pairs AS (SELECT doc_id_a AS a, doc_id_b AS b FROM p
          WHERE ROUND(inter::DOUBLE / (na + nb - inter), 6) >= 0.8),
e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
walk(n, m) AS (
  SELECT a, a FROM e
  UNION
  SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a)
SELECT n AS doc_id, min(m)::BIGINT AS cluster_id FROM walk GROUP BY n
""",
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters: exact-Jaccard pairs (>= 0.8) closed into
    components; cluster_id = smallest doc_id reachable (the canonical
    keeper). Label propagation converges in diameter rounds, one
    edge-join shuffle each."""
    from distributed_vector_database_spark.operators.graph import (
        connected_components,
    )

    pairs = _dd.jaccard_pairs_prefix(
        _spread_read(spark, sf_dir, "documents"), threshold=0.8
    ).select("doc_id_a", "doc_id_b")
    cc = connected_components(pairs, src="doc_id_a", dst="doc_id_b")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )


# ===========================================================================
# Two-stage retrieval: ADC shortlist (compressed domain, cheap) -> exact
# re-rank of the survivors (full floats, 50 rows) — the standard production
# ANN topology (shortlist cost O(m) per row; exact cost paid only on R
# candidates). Both stages already verified alone; this checks the splice.
# ===========================================================================


@register(
    "pq_rerank_topk",
    f"""
WITH {_PQ_CTE},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 100),
adc AS (SELECT vec_id,
        SUM(list_reduce(list_transform(list_zip(list_slice(q.qv, j*8+1, j*8+8), book[code+1]),
              z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b)) AS d
        FROM codes, q GROUP BY vec_id),
short AS (SELECT vec_id FROM adc
          ORDER BY ROUND(d, 6) ASC, vec_id ASC LIMIT 50)
SELECT e.vec_id AS vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
FROM embeddings e JOIN short USING (vec_id), q
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def q_pq_rerank_topk(spark, sf_dir):
    """ADC top-50 shortlist re-ranked exactly (cosine) to top-10. The
    shortlist never materializes float vectors; the re-rank join touches
    50 rows of the float column (broadcast semi join at scale)."""
    books = _pq_books(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    enc = _pq.pq_encode_arrow(emb, books).select("vec_id", "codes")
    qv = _query_vec(spark, sf_dir, 100)
    shortlist = _pq.pq_adc_topk(enc, books, qv, k=50).select("vec_id")
    return topk(
        emb.join(F.broadcast(shortlist), "vec_id"), qv, k=10, metric="cosine"
    )


# ===========================================================================
# Ranking analytics: ntile + percent_rank over per-user spend (both are
# exact rational functions of the deterministic (total, user) order).
# ===========================================================================


@register(
    "user_spend_quartiles",
    """
WITH t AS (SELECT user_id, sum(round(value * 100))::BIGINT AS total_cents
           FROM events GROUP BY user_id)
SELECT user_id, total_cents,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM t
WINDOW w AS (ORDER BY total_cents DESC, user_id ASC)
""",
)
def q_user_spend_quartiles(spark, sf_dir):
    """ntile(4) + percent_rank over exact per-user cents totals; single
    window spec -> one sort, deterministic (total DESC, user ASC) order."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    t = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "total_cents"
        )
    )
    w = Window.orderBy(F.desc("total_cents"), F.asc("user_id"))
    return t.select(
        "user_id",
        "total_cents",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# ===========================================================================
# TPC-H Q6 shape: the canonical filter->aggregate scan. Every predicate
# must reach the parquet scan (PushedFilters); revenue through DECIMAL.
# ===========================================================================


@register(
    "forecast_revenue_change",
    """
SELECT ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
)
def q_forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6: what revenue would vanish if small-quantity discounts in
    1996 were dropped. One scan, four pushed predicates, DECIMAL-exact
    money math, single-row aggregate."""
    li = _read(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            ).cast("double"),
            2,
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ===========================================================================
# Train/val/test split (operators/sketch.hash_split): reproducible hash
# carving — same key -> same split in every run, engine, and table.
# ===========================================================================


@register(
    "train_val_test_split",
    """
WITH f AS (SELECT doc_id, source,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
             / 281474976710656.0 AS hf
           FROM documents)
SELECT source,
       CASE WHEN hf < 0.8 THEN 'train'
            WHEN hf < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs
FROM f GROUP BY 1, 2
""",
)
def q_train_val_test_split(spark, sf_dir):
    """80/10/10 deterministic split audited per source — the leakage-free
    eval carving a dedup-then-split pipeline needs (randomSplit would
    reshuffle membership every run)."""
    from distributed_vector_database_spark.operators.sketch import hash_split

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# ===========================================================================
# TPC-H Q4 / Q18 shapes over the synthetic star schema (correlated-EXISTS
# semi join; groupBy-HAVING-IN pipeline) + a relational Lloyd step.
# ===========================================================================


@register(
    "late_orders_by_priority",
    """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q_late_orders_by_priority(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS becomes
    a LEFT SEMI join with a non-equi ship-lag predicate, then one small
    agg on priority. The semi join shuffles on orderkey only once and
    keeps no lineitem payload columns past the probe."""
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


@register(
    "large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
SELECT c_custkey, c_name, o_orderkey, ROUND(sum_qty, 2) AS sum_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN big ON o_orderkey = l_orderkey
""",
)
def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): pre-aggregate lineitem to
    per-order quantity, HAVING-filter BEFORE the joins (the selective side
    shrinks to ~20% so both remaining joins move only qualifying orders),
    then join orders + customer. Quantities sum as DECIMAL so the HAVING
    boundary is exact across engines."""
    li = _read(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
        )
        .filter(F.col("q") > 150)
        .select("l_orderkey", F.round(F.col("q").cast("double"), 2).alias("sum_qty"))
    )
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "sum_qty")
    )


@register(
    "sole_failing_suppliers",
    """
SELECT s_name, count(*)::BIGINT AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 10
""",
)
def q_sole_failing_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to the
    synthetic schema: the return flag stands in for the missing
    receipt>commit lag. Plan: correlated EXISTS -> LEFT SEMI join with a
    two-column non-equi condition; correlated NOT EXISTS -> LEFT ANTI
    join; both shuffle on orderkey only, carrying (orderkey, suppkey)
    pairs — no payload columns cross either exchange. The final count is
    a small partial-agg groupBy, ordered totally for a deterministic
    LIMIT."""
    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"),
        "l_returnflag",
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("ok", "sk")
    l2 = li.select(F.col("ok").alias("ok2"), F.col("sk").alias("sk2"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("ok").alias("ok3"), F.col("sk").alias("sk3"))
    )
    o = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cand = l1.join(o, l1.ok == o.o_orderkey).join(s, l1.sk == s.s_suppkey)
    multi = cand.join(
        l2,
        (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
        "left_semi",
    )
    sole = multi.join(
        l3,
        (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
        "left_anti",
    )
    return (
        sole.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "supplier_diversity_by_part",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20
""",
)
def q_supplier_diversity_by_part(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN subquery
    becomes a broadcast LEFT ANTI join against the (tiny) excluded
    supplier set; distinct-count per part attributes. The anti join is
    broadcast (6 rows), so the only shuffle is the final distinct-agg on
    the grouping keys; the p_size filter is pushed to the part scan."""
    p = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 25)
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        _read(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    kept = li.join(
        F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        kept.join(p, kept.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
        .limit(20)
    )


@register(
    "priority_shipping_split",
    """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1995-01-01'
  AND l_shipdate < DATE '1996-01-01'
GROUP BY l_returnflag
""",
)
def q_priority_shipping_split(spark, sf_dir):
    """TPC-H Q12 shape (shipping-priority split), adapted: conditional
    CASE sums over a joined fact, one year-window filter pushed to the
    lineitem scan. The join carries only (orderkey, priority flag) wide;
    the CASE pair collapses in the partial aggregate so the exchange
    moves 3 rows per flag, not per line."""
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "disjunctive_brand_revenue",
    """
SELECT ROUND(sum(round(l_extendedprice * (1 - l_discount) * 100))
             / 100.0, 2) AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
""",
)
def q_disjunctive_brand_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue under disjunctive bracketed
    predicates): an OR-of-ANDs across BOTH join sides. Catalyst pushes
    the per-side residuals (brand/size to the part scan, quantity to the
    lineitem scan as a range union) and evaluates the cross-side
    conjunctions post-join. Revenue accumulates as exact integer cents
    so the float sum order can't straddle the rounding boundary."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return j.filter(cond).agg(
        F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "idle_rich_customers",
    """
SELECT substr(c_name, length(c_name), 1) AS cust_bucket,
       count(*)::BIGINT AS n_custs,
       ROUND(sum(round(c_acctbal * 100)) / 100.0, 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
""",
)
def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (global-customer-opportunity): above-average-
    balance customers with NO RECENT order — scalar AVG subquery in the
    filter + NOT EXISTS anti join (with a pushed date predicate on the
    anti side) + substring grouping. The scalar lands as a plan literal
    (one tiny pre-job); only custkeys cross the anti join."""
    c = _read(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal"))
        .head()[0]
    )
    o = (
        _read(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    rich = c.filter(F.col("c_acctbal") > F.lit(avg_bal))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        idle.groupBy(
            F.expr("substring(c_name, length(c_name), 1)").alias(
                "cust_bucket"
            )
        )
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_bal"),
        )
    )


@register(
    "vector_dim_stats",
    """
SELECT vec_id,
       CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS BIGINT)
         AS n_pos,
       CASE WHEN len(list_filter(embedding::DOUBLE[], x -> abs(x) > 2.5)) > 0
            THEN TRUE ELSE FALSE END AS has_outlier,
       CASE WHEN len(list_filter(embedding::DOUBLE[], x -> abs(x) <= 4.0))
                 = len(embedding) THEN TRUE ELSE FALSE END AS all_bounded,
       ROUND(list_reduce(list_slice(list_reverse_sort(
               list_transform(embedding::DOUBLE[], x -> abs(x))), 1, 3),
             (a, b) -> a + b), 6) AS top3_abs_mass
FROM embeddings
""",
)
def q_vector_dim_stats(spark, sf_dir):
    """Higher-order array functions as a user-facing query: per vector,
    the positive-dim count (``filter``), an any-dim predicate
    (``exists``), an all-dims predicate (``forall``), and the mass of
    the 3 largest |dims| (``transform`` → ``array_sort`` → ``slice`` →
    ``aggregate``). All whole-stage-codegen expressions — a narrow
    projection, no shuffle, no Python."""
    emb = _read(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    absd = F.transform(v, lambda x: F.abs(x))
    top3 = F.slice(F.array_sort(absd, lambda a, b: F.when(a < b, 1).otherwise(F.when(a > b, -1).otherwise(0))), 1, 3)
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(v, lambda x: F.abs(x) > 2.5).alias("has_outlier"),
        F.forall(v, lambda x: F.abs(x) <= 4.0).alias("all_bounded"),
        F.round(
            F.aggregate(top3, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("top3_abs_mass"),
    )


@register(
    "value_quartiles_by_type",
    """
SELECT event_type,
       ROUND(quantile_cont(value, 0.25), 6) AS q25,
       ROUND(quantile_cont(value, 0.50), 6) AS q50,
       ROUND(quantile_cont(value, 0.75), 6) AS q75,
       ROUND(quantile_cont(value, 0.95), 6) AS q95
FROM events GROUP BY event_type
""",
)
def q_value_quartiles_by_type(spark, sf_dir):
    """Grouped multi-quantile profile (the array form of ``percentile``):
    four continuous quantiles per event type in ONE aggregation pass —
    the distribution-profile query monitoring layers run per batch. At
    scale swap in ``approx_percentile`` for one-pass sketching; the
    exact form here is what the oracle can reproduce."""
    ev = _read(spark, sf_dir, "events")
    q = F.percentile("value", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]))
    return (
        ev.groupBy("event_type")
        .agg(q.alias("_q"))
        .select(
            "event_type",
            F.round(F.col("_q")[0], 6).alias("q25"),
            F.round(F.col("_q")[1], 6).alias("q50"),
            F.round(F.col("_q")[2], 6).alias("q75"),
            F.round(F.col("_q")[3], 6).alias("q95"),
        )
    )


@register(
    "customer_order_distribution",
    """
WITH co AS (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey)
SELECT c_count, count(*)::BIGINT AS custdist
FROM co GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): LEFT join so zero-order
    customers keep c_count=0, then a second aggregation over the first's
    output — the histogram-of-group-sizes double aggregate. The join
    predicate's status filter lives IN the join condition (not a WHERE),
    which is what preserves the never-ordered customers."""
    c = _read(spark, sf_dir, "customer").select("c_custkey")
    o = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "F"
    ).select("o_custkey", "o_orderkey")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "small_quantity_part_revenue",
    """
WITH t AS (
  SELECT l_partkey, 0.4 * avg(l_quantity) AS thresh
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(ROUND(sum(round(l_extendedprice * 100)) / 7.0) AS BIGINT)
         AS avg_yearly_cents,
       count(*)::BIGINT AS n_lines
FROM lineitem JOIN t ON lineitem.l_partkey = t.l_partkey
WHERE l_quantity < t.thresh
""",
)
def q_small_quantity_part_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): each part's own
    average quantity becomes its filter threshold — the per-group scalar
    produced by a self-aggregation and joined back (Catalyst's
    decorrelation of the correlated AVG subquery). Revenue sums as exact
    integer cents before the final division."""
    li = _read(spark, sf_dir, "lineitem")
    t = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.4).alias("thresh")
    )
    j = li.join(
        t.withColumnRenamed("l_partkey", "pk"),
        li.l_partkey == F.col("pk"),
    ).filter(F.col("l_quantity") < F.col("thresh"))
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return j.agg(
        F.round(F.sum(cents) / 7.0)
        .cast("long")
        .alias("avg_yearly_cents"),
        F.count("*").alias("n_lines"),
    )


@register(
    "embedding_drift",
    """
WITH x AS (
  SELECT vec_id % 2 AS grp, t.pos,
         CAST(round((embedding::DOUBLE[])[t.pos] * 1e6) AS BIGINT) AS vmic
  FROM embeddings
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) t),
m AS (SELECT grp, pos, sum(vmic) // count(*) AS mean_mic
      FROM x GROUP BY grp, pos),
d AS (SELECT a.pos, (a.mean_mic - b.mean_mic) AS diff_mic
      FROM m a JOIN m b ON a.pos = b.pos AND a.grp = 0 AND b.grp = 1)
SELECT ROUND(sqrt(sum((diff_mic / 1e6) * (diff_mic / 1e6))), 6)
         AS mean_shift_l2,
       ROUND(max(abs(diff_mic)) / 1e6, 6) AS max_dim_shift,
       CAST((SELECT pos FROM d ORDER BY abs(diff_mic) DESC, pos ASC LIMIT 1)
            AS BIGINT) AS worst_dim
FROM d
""",
)
def q_embedding_drift(spark, sf_dir):
    """Embedding-distribution drift monitor: the L2 distance between two
    slices' mean vectors (even vs odd ids as stand-ins for
    yesterday/today), the largest per-dimension shift, and which
    dimension moved most. Means accumulate as exact integer micros (the
    ``ivf_centroid_update`` trick) so the drift score is bit-exact
    cross-engine — the per-batch health check a production embedding
    pipeline alerts on. One explode + one partial-agg shuffle."""
    emb = _read(spark, sf_dir, "embeddings")
    x = emb.select(
        (F.col("vec_id") % 2).alias("grp"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos0", "v"
        ),
    ).select(
        "grp",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v") * 1e6).cast("long").alias("vmic"),
    )
    m = x.groupBy("grp", "pos").agg(
        F.expr("sum(vmic) div count(*)").alias("mean_mic")
    )
    a = m.filter(F.col("grp") == 0).select(
        "pos", F.col("mean_mic").alias("ma")
    )
    b = m.filter(F.col("grp") == 1).select(
        F.col("pos").alias("posb"), F.col("mean_mic").alias("mb")
    )
    d = a.join(b, a.pos == b.posb).select(
        "pos", (F.col("ma") - F.col("mb")).alias("diff_mic")
    )
    worst = (
        d.orderBy(F.desc(F.abs("diff_mic")), F.asc("pos"))
        .limit(1)
        .select(F.col("pos").cast("long").alias("worst_dim"))
    )
    agg = d.agg(
        F.round(
            F.sqrt(
                F.sum(
                    (F.col("diff_mic") / 1e6) * (F.col("diff_mic") / 1e6)
                )
            ),
            6,
        ).alias("mean_shift_l2"),
        F.round(F.max(F.abs("diff_mic")) / 1e6, 6).alias("max_dim_shift"),
    )
    return agg.crossJoin(worst)


def _pagerank_sql(iters: int = 5) -> str:
    steps = []
    prev = "pr0"
    for i in range(1, iters + 1):
        steps.append(f"""
pr{i} AS (
  SELECT n.node,
         150000 + COALESCE((
           SELECT sum((p.mass * 85) // (100 * od._deg))
           FROM edges e JOIN {prev} p ON e.src = p.node
           JOIN outdeg od ON e.src = od.src
           WHERE e.dst = n.node), 0) AS mass
  FROM nodes n)""")
        prev = f"pr{i}"
    return f"""
WITH edges AS (
  SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst AS node FROM edges),
outdeg AS (SELECT src, count(*) AS _deg FROM edges GROUP BY src),
pr0 AS (SELECT node, 1000000::BIGINT AS mass FROM nodes),{','.join(steps)}
SELECT node, mass::BIGINT AS mass FROM {prev}
ORDER BY mass DESC, node ASC LIMIT 20
"""


@register("supplier_customer_pagerank", _pagerank_sql())
def q_supplier_customer_pagerank(spark, sf_dir):
    """Iterative PageRank as a driver-verified row: 5 exact integer-micro
    rounds (graph.pagerank_micro) over the supplier→customer supply
    graph, top-20 by final mass. Floating PageRank can't be
    oracle-compared (neighbor-sum order drifts the low bits each round);
    the integer-micro recurrence is bit-exact in both engines — the
    iterative-algorithm counterpart of the integer-cents money sums."""
    from distributed_vector_database_spark.operators.graph import (
        pagerank_micro,
    )

    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank_micro(edges, iters=5)
    return pr.orderBy(F.desc("mass"), F.asc("node")).limit(20)


@register(
    "nation_market_share",
    """
WITH base AS (
  SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
         round(l_extendedprice * (1 - l_discount) * 100)::BIGINT AS cents,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_brand = 'Brand#15')
SELECT o_year,
       ROUND(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN cents
                           ELSE 0 END) AS DOUBLE)
             / sum(cents), 6) AS mkt_share
FROM base GROUP BY o_year
""",
)
def q_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): eight-table join, year
    extraction, then a conditional-share ratio per year — NATION_2's
    slice of Brand#15 revenue consumed in ASIA. Every dimension
    broadcasts; the single wide shuffle joins the two facts on orderkey;
    revenue accumulates as exact integer cents so the share ratio is
    reproducible bit-for-bit."""
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#15")
        .select("p_partkey")
    )
    cust_dim = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_dim = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_dim), o.o_custkey == cust_dim.c_custkey)
        .join(F.broadcast(supp_dim), li.l_suppkey == supp_dim.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("cents"))
                .otherwise(0)
            ).cast("double")
            / F.sum("cents"),
            6,
        ).alias("mkt_share")
    )


@register(
    "merge_into_orders",
    """
SELECT o_orderkey, o_orderstatus, total_cents FROM (
  SELECT o_orderkey, o_orderstatus,
         round(o_totalprice * 100)::BIGINT AS total_cents
  FROM orders WHERE o_orderkey % 10 <> 0
  UNION ALL
  SELECT o_orderkey, 'X' AS o_orderstatus,
         round(o_totalprice * 110)::BIGINT AS total_cents
  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 100 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000, 'N' AS o_orderstatus,
         round(o_totalprice * 100)::BIGINT AS total_cents
  FROM orders WHERE o_orderkey % 1000 = 0
) t
""",
)
def q_merge_into_orders(spark, sf_dir):
    """SQL MERGE INTO semantics (operators/merge.py) end to end: the
    source UPDATEs every %10 order (status 'X', price +10%), DELETEs the
    %100 subset of those, and INSERTs a new +1000000-key order for every
    %1000 key — one full-outer join + conditional projection, no
    iterative logic. The oracle reconstructs the final state with plain
    CASE/UNION algebra, so every branch (update/delete/insert/pass-
    through) is value-checked."""
    from distributed_vector_database_spark.operators.merge import merge_into

    o = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    upd = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") * 110)
            .cast("long")
            .alias("total_cents"),
        )
    )
    ins = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("total_cents"),
        )
    )
    src = upd.unionByName(ins)
    return merge_into(
        o,
        src,
        on="o_orderkey",
        delete_condition=(F.col("o_orderkey") % 100 == 0)
        & (F.col("o_orderstatus") == "X"),
    )


_STATS_CACHE: dict = {}


@register(
    "stats_pruned_range_scan",
    """
SELECT count(*)::BIGINT AS n_orders,
       sum(round(o_totalprice * 100))::BIGINT AS total_cents,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM orders WHERE o_orderkey BETWEEN 1000 AND 1500
""",
)
def q_stats_pruned_range_scan(spark, sf_dir):
    """File-level stats skipping end to end (sources/stats.py): orders
    rewritten range-partitioned by key, per-file min/max collected and
    persisted inside the layout, then a range scan that OPENS only the
    1-2 files whose interval intersects the predicate — the Delta/
    Iceberg-style metadata skip on plain parquet. The oracle scans the
    original table, so any row lost or duplicated by the pruning fails
    the gate."""
    import tempfile

    from distributed_vector_database_spark.sources.stats import (
        collect_file_stats,
        load_stats,
        read_pruned,
        save_stats,
    )

    layout = _STATS_CACHE.get(sf_dir)
    if layout is None:
        layout = tempfile.mkdtemp(prefix="dvdb_stats_") + "/orders_ranged"
        o = _read(spark, sf_dir, "orders")
        o.repartitionByRange(8, "o_orderkey").write.mode(
            "overwrite"
        ).parquet(layout)
        save_stats(
            collect_file_stats(spark, layout, ["o_orderkey"]), layout
        )
        _STATS_CACHE[sf_dir] = layout
    stats = load_stats(spark, layout)
    pruned = read_pruned(spark, stats, "o_orderkey", 1000, 1500)
    return pruned.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


_BLOOM_CACHE: dict = {}


@register(
    "bloom_pruned_point_lookup",
    """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders WHERE o_orderkey = 1234
""",
)
def q_bloom_pruned_point_lookup(spark, sf_dir):
    """Bloom-filter file skipping (sources/stats.py): orders rewritten
    HASH-distributed across 8 files — the layout where min/max stats
    prune NOTHING (every file spans the full key range) — then a point
    lookup that opens only the files whose per-file Bloom bitset
    contains all probe bits of the key. The content-addressed complement
    to `stats_pruned_range_scan`'s range skipping; the oracle scans the
    original table, so a false-negative (lost row) fails the gate."""
    import tempfile

    from distributed_vector_database_spark.sources.stats import (
        collect_file_blooms,
        load_stats,
        read_bloom_pruned,
        save_stats,
    )

    layout = _BLOOM_CACHE.get(sf_dir)
    if layout is None:
        layout = tempfile.mkdtemp(prefix="dvdb_bloom_") + "/orders_hashed"
        o = _read(spark, sf_dir, "orders")
        o.repartition(8, "o_orderkey").write.mode("overwrite").parquet(
            layout
        )
        save_stats(
            collect_file_blooms(spark, layout, "o_orderkey"),
            layout,
            subdir="_bloom",
        )
        _BLOOM_CACHE[sf_dir] = layout
    blooms = load_stats(spark, layout, subdir="_bloom")
    return read_bloom_pruned(spark, blooms, "o_orderkey", 1234).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


@register(
    "ivf_centroid_update",
    f"""
WITH {_ASSIGN_CTE},
x AS (
  SELECT a.shard_id, t.pos,
         CAST(round((e.embedding::DOUBLE[])[t.pos] * 1e6) AS BIGINT) AS vmic
  FROM embeddings e
  JOIN assign a ON e.vec_id = a.vec_id
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) t)
SELECT shard_id, pos::BIGINT AS pos,
       sign(sum(vmic)) * ((2 * abs(sum(vmic))::BIGINT + count(*))
                          // (2 * count(*))) / 1e6 AS mean_val
FROM x GROUP BY shard_id, pos
""",
)
def q_ivf_centroid_update(spark, sf_dir):
    """One Lloyd iteration expressed relationally: per-shard mean vector
    (posexplode -> groupBy(shard, dim) avg) — the distributed KMeans
    update step the reference runs inside sklearn on a collected sample
    (`reference: src/cluster.py:28-33`). Values quantize to integer
    micro-units before summing so the mean is order-independent and
    exact across engines (same trick as udaf_mean_cents_by_type).

    Scale note: posexplode multiplies rows by dim; the alternative narrow
    plan is a GROUPED_AGG pandas UDAF summing numpy arrays per shard.
    Both shuffle once on shard_id; this form keeps the whole plan in
    codegen and gives Catalyst a (shard_id, pos) key to parallelize the
    reduce across 64x more tasks than shards."""
    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    assigned = assign_shards(emb, cents)
    ex = assigned.select(
        F.col("shard_id").cast("long").alias("shard_id"),
        F.posexplode("embedding").alias("pos0", "val"),
    )
    return (
        ex.select(
            "shard_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.round(F.col("val").cast("double") * 1e6)
            .cast("long")
            .alias("vmic"),
        )
        .groupBy("shard_id", "pos")
        .agg(
            F.sum("vmic").alias("_s"), F.count("*").alias("_n")
        )
        .select(
            "shard_id",
            "pos",
            # exact-integer 6dp (boundary-safe across engines)
            micros_mean_6dp_exact("_s", "_n").alias("mean_val"),
        )
    )


@register(
    "orc_roundtrip_lineitem",
    """
SELECT l_returnflag, count(*)::BIGINT AS n,
       sum(round(l_extendedprice * 100))::BIGINT AS price_cents,
       max(l_shipdate) AS last_ship
FROM lineitem GROUP BY l_returnflag
""",
)
def q_orc_roundtrip_lineitem(spark, sf_dir):
    """Lineitem written to ORC and re-read; aggregates must equal DuckDB
    over the original parquet — the engine's second lossless columnar
    interchange format (splittable, predicate-pushdown scans like
    parquet, unlike the non-splittable multiLine CSV path)."""
    back = _roundtripped(
        spark,
        sf_dir,
        "lineitem",
        "orc",
        ["l_returnflag", "l_extendedprice", "l_shipdate"],
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "stream_click_purchase_join",
    """
SELECT c.user_id,
       c.event_id AS left_id, c.ts AS left_ts,
       p.event_id AS right_id, p.ts AS right_ts
FROM events c
JOIN events p ON c.user_id = p.user_id
             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
)
def q_stream_click_purchase_join(spark, sf_dir):
    """Stream-stream inner join replayed to completion: purchases within
    60 min of a same-user click, both sides micro-batched file streams.
    No watermark (exact historical replay — files are not time-ordered);
    append-mode sink; result must equal the batch interval join."""
    import tempfile

    from distributed_vector_database_spark.streaming.events import (
        join_event_streams,
        read_event_stream,
        run_stream_to_batch,
    )

    d = _STREAM_INPUT_CACHE.get(f"{sf_dir}#full")
    if d is None:
        src = _read(spark, sf_dir, "events")
        d = tempfile.mkdtemp(prefix="dvdb_streamfull_")
        src.repartition(4).write.mode("overwrite").parquet(d)
        _STREAM_INPUT_CACHE[f"{sf_dir}#full"] = d
    # 2 files per trigger -> 2 micro-batches: still exercises cross-batch
    # join state, without paying 4x micro-batch spin-up (the round-1 bench
    # measured harness overhead, not the operator — VERDICT r1 item 6).
    clicks = read_event_stream(spark, d, max_files_per_trigger=2).filter(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, d, max_files_per_trigger=2).filter(
        F.col("event_type") == "purchase"
    )
    return run_stream_to_batch(
        join_event_streams(clicks, purchases, within="60 minutes"),
        output_mode="append",
        shuffle_partitions=8,
    )


# ===========================================================================
# Reshaping (unpivot), stratified sampling, histogram binning.
# ===========================================================================


@register(
    "stratified_lang_sample",
    """
WITH f AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
           / 281474976710656.0 AS hf
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc
FROM f
WHERE hf < (CASE lang WHEN 'en' THEN 0.1
                      WHEN 'fr' THEN 0.5
                      ELSE 1.0 END)
GROUP BY lang
""",
)
def q_stratified_lang_sample(spark, sf_dir):
    """Corpus rebalancing: per-language deterministic sampling (keep 10% of
    dominant English, 50% of French, all the rest) — audited by per-lang
    counts. Join-stable and reproducible, unlike RNG ``sampleBy``."""
    from distributed_vector_database_spark.operators.sketch import (
        stratified_hash_sample,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.1, "fr": 0.5}, default_rate=1.0
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc")
    )


@register(
    "event_value_unpivot",
    """
WITH wide AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'click'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS click,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS purchase
  FROM events GROUP BY user_id)
SELECT user_id, 'click' AS event_type,
       ROUND(CAST(click AS DOUBLE), 2) AS sum_value
FROM wide WHERE click IS NOT NULL
UNION ALL
SELECT user_id, 'purchase', ROUND(CAST(purchase AS DOUBLE), 2)
FROM wide WHERE purchase IS NOT NULL
""",
)
def q_event_value_unpivot(spark, sf_dir):
    """Unpivot (wide -> long, the inverse of event_value_pivot): per-user
    per-type sums melt back into (user_id, event_type, sum_value) rows.
    Unpivot is a zero-shuffle projection (each input row expands locally);
    null cells are dropped to mirror 'absent in long form'."""
    ev = _read(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase"])
        .agg(F.sum(F.col("value").cast("decimal(18,2)")))
    )
    long = wide.unpivot(
        ["user_id"], ["click", "purchase"], "event_type", "v"
    )
    return long.filter(F.col("v").isNotNull()).select(
        "user_id",
        "event_type",
        F.round(F.col("v").cast("double"), 2).alias("sum_value"),
    )


@register(
    "event_value_histogram",
    """
WITH c AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT event_type,
       CAST(floor(cents / 5000.0) AS BIGINT) AS bucket,
       count(*)::BIGINT AS n
FROM c GROUP BY event_type, bucket
""",
)
def q_event_value_histogram(spark, sf_dir):
    """Fixed-width value histogram per event type (bucket = 50-unit bins
    over exact integer cents, so bin edges are engine-independent). The
    profiling pass a quality-filter pipeline runs before choosing
    thresholds; one partial-aggregated shuffle on (type, bucket)."""
    ev = _read(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.select(
            "event_type", F.floor(cents / F.lit(5000.0)).cast("long").alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "radius_search_cosine",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
FROM embeddings e, q
WHERE ROUND({_cos(E, 'q.qv')}, 6) >= 0.2
""",
)
def q_radius_search_cosine(spark, sf_dir):
    """Range/radius search (Faiss range_search semantics): all rows with
    cosine >= 0.2 against the query — a filter-only plan with no global
    merge, the set-valued companion to top-k."""
    from distributed_vector_database_spark.operators.topk import radius_search

    emb = _read(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return radius_search(emb, qv, 0.2, metric="cosine")


@register(
    "topk_dot_prenormalized",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
n AS (SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> x / {_norm('(embedding::DOUBLE[])')}) AS ne
      FROM embeddings WHERE {_norm('(embedding::DOUBLE[])')} > 0),
qn AS (SELECT list_transform(qv, x -> x / {_norm('qv')}) AS qv FROM q)
SELECT n.vec_id AS vec_id,
       ROUND(list_dot_product(n.ne, qn.qv), 6) AS score
FROM n, qn
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def q_topk_dot_prenormalized(spark, sf_dir):
    """Store-time normalization: unit-normalize the corpus once
    (l2_normalize, norm materialized through a Generate barrier), then
    search by plain DOT — equal scores to cosine, two norms cheaper per
    row per query. The standard embedding-table layout at scale.

    Zero-norm vectors are EXCLUDED at store time on both sides (a zero
    vector has no unit form and scores 0 against everything under cosine);
    the oracle applies the same norm > 0 filter, keeping the two engines
    aligned even on a corpus that contains zero vectors near the k
    boundary."""
    from distributed_vector_database_spark.functions.vector import (
        l2_norm,
        l2_normalize,
    )

    emb = (
        _read(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(l2_norm("embedding") > 0.0)
    )
    unit = l2_normalize(emb, "embedding")
    qv = _query_vec(spark, sf_dir, 0)
    import math

    qn = math.sqrt(sum(x * x for x in qv))
    qunit = [x / qn for x in qv]
    return topk(unit, qunit, k=10, metric="dot")


@register(
    "kfold_assignment",
    """
WITH f AS (SELECT doc_id,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS hv
           FROM documents)
SELECT (hv % 5)::BIGINT AS fold, count(*)::BIGINT AS n_docs,
       min(doc_id) AS min_doc
FROM f GROUP BY fold
""",
)
def q_kfold_assignment(spark, sf_dir):
    """Deterministic k-fold assignment (fold = key-hash mod k) audited by
    per-fold counts: the cross-validation carving that, like hash_split,
    is reproducible across runs/engines and join-stable across tables —
    no RNG, no shuffle, a narrow projection."""
    from distributed_vector_database_spark.operators.sketch import _HEX_DIGITS

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("long")
    return (
        docs.select("doc_id", (hv % 5).alias("fold"))
        .groupBy("fold")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
    )


# ===========================================================================
# Corpus curation: decontamination + repetition filter + sequence packing
# (operators/curation.py, text_analysis.repetition_scores)
# ===========================================================================

_EVAL_PRED = "doc_id % 50 = 0"  # deterministic stand-in eval/benchmark set


@register(
    "decontaminate_report",
    f"""
WITH {_TOKS_CTE},
sh AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE {_EVAL_PRED}),
tr AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE NOT ({_EVAL_PRED}))
SELECT tr.doc_id AS doc_id, count(*)::BIGINT AS n_shared
FROM tr JOIN ev USING (shingle)
GROUP BY tr.doc_id
""",
)
def q_decontaminate_report(spark, sf_dir):
    """Benchmark decontamination (operators/curation.py): training docs
    sharing any word 3-gram with the held-out eval slice, with the count
    of leaked shingles. Eval shingle dictionary is BROADCAST; the corpus
    side is a narrow explode -> broadcast semi-join (no corpus shuffle
    before the tiny survivor aggregation)."""
    from distributed_vector_database_spark.operators.curation import (
        contaminated_doc_ids,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ev = docs.filter(F.expr(_EVAL_PRED))
    tr = docs.filter(~F.expr(_EVAL_PRED))
    return contaminated_doc_ids(tr, ev, ngram=3)


@register(
    "decontaminate_clean_count",
    f"""
WITH {_TOKS_CTE},
sh AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE {_EVAL_PRED}),
bad AS (SELECT DISTINCT doc_id FROM
          (SELECT doc_id, unnest(s) AS shingle FROM sh
           WHERE NOT ({_EVAL_PRED})) tr
        JOIN ev USING (shingle))
SELECT count(*)::BIGINT AS n_clean,
       (SELECT count(*) FROM bad)::BIGINT AS n_dropped
FROM documents d
WHERE NOT ({_EVAL_PRED})
  AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)
""",
)
def q_decontaminate_clean_count(spark, sf_dir):
    """The anti-join side of decontamination: how much of the training
    corpus survives. Single-row audit (n_clean, n_dropped)."""
    from distributed_vector_database_spark.operators.curation import (
        decontaminate,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ev = docs.filter(F.expr(_EVAL_PRED))
    tr = docs.filter(~F.expr(_EVAL_PRED))
    clean = decontaminate(tr, ev, ngram=3)
    n_tr = tr.count()
    return clean.agg(
        F.count("*").cast("long").alias("n_clean"),
        (F.lit(n_tr) - F.count("*")).cast("long").alias("n_dropped"),
    )


@register(
    "doc_repetition",
    f"""
WITH {_TOKS_CTE},
bg0 AS (SELECT doc_id, t,
               CASE WHEN len(t) >= 2 THEN
                 list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
               ELSE [] END AS bg
        FROM toks),
m AS (SELECT doc_id,
             ROUND(CASE WHEN len(t) > 0
                   THEN 1.0 - len(list_distinct(t))::DOUBLE / len(t)
                   ELSE 0.0 END, 6) AS dup_word_frac,
             ROUND(CASE WHEN len(bg) > 0
                   THEN list_max(list_transform(list_distinct(bg),
                        d -> len(list_filter(bg, x -> x = d))))::DOUBLE
                        / len(bg)
                   ELSE 0.0 END, 6) AS top_bigram_frac,
             COALESCE(list_max(list_transform(list_distinct(bg),
                      d -> len(list_filter(bg, x -> x = d)))), 0)
               AS top_cnt
      FROM bg0)
SELECT doc_id, dup_word_frac, top_bigram_frac,
       (dup_word_frac > 0.7
        OR (top_bigram_frac > 0.18 AND top_cnt >= 2)) AS is_repetitive
FROM m
""",
)
def q_doc_repetition(spark, sf_dir):
    """Gopher-style repetition filter (text_analysis.repetition_scores):
    duplicate-word fraction + top-bigram fraction, flagged against fixed
    thresholds. Pure narrow Catalyst expressions — no shuffle."""
    return _ta.repetition_scores(_read(spark, sf_dir, "documents"))


@register(
    "sequence_packing",
    """
WITH b AS (SELECT doc_id,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                 x -> x <> '')) AS n_tokens,
             md5(doc_id::VARCHAR) AS h,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 8
               AS bucket
           FROM documents),
c AS (SELECT doc_id, n_tokens::BIGINT AS n_tokens, bucket,
             sum(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM b)
SELECT doc_id, n_tokens, bucket,
       ((cum - n_tokens) // 512)::BIGINT AS pack_id
FROM c
""",
)
def q_sequence_packing(spark, sf_dir):
    """Deterministic sequence packing (operators/curation.pack_sequences):
    md5-ordered docs chunked into 512-token packs within 8 hash buckets.
    The window is PARTITIONED BY bucket so the packing parallelizes (a
    global ORDER BY window would serialize the corpus through one task)."""
    from distributed_vector_database_spark.operators.curation import (
        pack_sequences,
    )

    return pack_sequences(
        _read(spark, sf_dir, "documents"),
        budget_tokens=512,
        num_buckets=8,
    )


@register(
    "quality_weighted_sample",
    f"""
WITH {_TOKS_CTE},
q AS (SELECT doc_id,
       ROUND(0.4 * LEAST(len(t) / 50.0, 1.0)
           + 0.4 * (len(list_distinct(t))::DOUBLE / len(t))
           + 0.2 * LEAST((list_sum(list_transform(t, x -> len(x)))::DOUBLE
                          / len(t)) / 6.0, 1.0), 6) AS quality
      FROM toks)
SELECT doc_id, quality FROM q
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
      / 281474976710656.0 < quality
""",
)
def q_quality_weighted_sample(spark, sf_dir):
    """Deterministic importance resampling (curation.quality_weighted_sample):
    survive with probability = quality score, via the portable md5
    fraction instead of RNG. Narrow filter, no shuffle."""
    from distributed_vector_database_spark.operators.curation import (
        quality_weighted_sample,
    )

    return quality_weighted_sample(_read(spark, sf_dir, "documents"))


@register(
    "source_budget_mix",
    """
WITH b AS (SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                 x -> x <> ''))::BIGINT AS n_tokens,
             md5(doc_id::VARCHAR) AS h
           FROM documents),
c AS (SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM b)
SELECT doc_id, source, n_tokens FROM c
WHERE cum <= (CASE WHEN source = 'src0' THEN 900 ELSE 600 END)
""",
)
def q_source_budget_mix(spark, sf_dir):
    """Domain mixing (curation.budget_mix): cap each source's token
    contribution (src0 over-weighted at 900 tokens, 600 for the rest) by
    an md5-ordered running total per source — one parallel window per
    source, deterministic across engines."""
    from distributed_vector_database_spark.operators.curation import budget_mix

    return budget_mix(
        _read(spark, sf_dir, "documents"),
        {"src0": 900},
        default_budget=600,
    )


# ===========================================================================
# Filtered / grouped vector search (operators/topk.py composed with
# relational predicates — the "filtered ANN" surface real vector stores add
# on top of the reference's unfiltered POST /search)
# ===========================================================================


@register(
    "filtered_topk_cosine",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
c AS (SELECT e.vec_id, e.embedding, d.lang FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en' AND d.n_chars >= 200)
SELECT c.vec_id AS vec_id, c.lang AS lang,
       ROUND({_cos('(c.embedding::DOUBLE[])', 'q.qv')}, 6) AS score
FROM c, q
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def q_filtered_topk_cosine(spark, sf_dir):
    """Attribute-filtered vector search: metadata predicates (lang,
    length) applied BEFORE scoring, so the scan that feeds top-k reads
    only survivors — predicate pushdown into the parquet scan plus an
    equi-join to the metadata table, then the same TakeOrdered top-k.
    (The filter must run pre-k, not post-k: filtering the top-10 of the
    unfiltered corpus would return < 10 survivors.)"""
    emb = _read(spark, sf_dir, "embeddings")
    docs = _read(spark, sf_dir, "documents").filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 200)
    )
    cand = emb.join(
        docs.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
    )
    scored = topk(cand, _query_vec(spark, sf_dir, 0), k=10, metric="cosine")
    # topk returns (vec_id, score); re-attach the filtered attribute
    return (
        scored.join(
            docs.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
        )
        .select("vec_id", "lang", "score")
        .orderBy(F.desc("score"), F.asc("vec_id"))
    )


@register(
    "grouped_topk_by_label",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
s AS (SELECT e.vec_id, e.label,
             ROUND({_cos(E, 'q.qv')}, 6) AS score,
             row_number() OVER (PARTITION BY e.label
                                ORDER BY ROUND({_cos(E, 'q.qv')}, 6) DESC,
                                         e.vec_id ASC) AS rnk
      FROM embeddings e, q)
SELECT vec_id, label, score, rnk::BIGINT AS rnk
FROM s WHERE rnk <= 3
""",
)
def q_grouped_topk_by_label(spark, sf_dir):
    """Grouped top-k: the 3 nearest corpus vectors to the query PER
    label — one scored scan + a rank window partitioned by label (the
    'diverse results' shape: per-category best hits in one job, no
    per-category re-scan)."""
    from distributed_vector_database_spark.functions.vector import (
        cosine_similarity,
    )
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    scored = emb.select(
        "vec_id",
        "label",
        round_score(
            cosine_similarity(F.col("embedding"), F.lit(qv)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


# ===========================================================================
# PII scrubbing (operators/curation.pii_scrub): the documents table is
# synthetic word-soup with no real PII, so both sides deterministically
# inject synthetic emails/IPs/phones keyed on doc_id before scrubbing —
# the regex detection + sequential redaction machinery is then genuinely
# exercised and compared via counts + md5 of the redacted text.
# ===========================================================================

_PII_ORACLE = (
    """
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' ip 10.0.' || (doc_id % 256) || '.7'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call 555-123-4567'
                 ELSE '' END AS t
  FROM documents),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '"""
    + r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    + """'))::BIGINT AS n_email,
         len(regexp_extract_all(t, '"""
    + r"\b\d{3}-\d{3}-\d{4}\b"
    + """'))::BIGINT AS n_phone,
         len(regexp_extract_all(t, '"""
    + r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    + """'))::BIGINT AS n_ipv4,
         regexp_replace(regexp_replace(regexp_replace(t,
           '"""
    + r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    + """', '<PII>', 'g'),
           '"""
    + r"\b\d{3}-\d{3}-\d{4}\b"
    + """', '<PII>', 'g'),
           '"""
    + r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    + """', '<PII>', 'g') AS r
  FROM aug)
SELECT doc_id, n_email, n_phone, n_ipv4,
       (n_email + n_phone + n_ipv4)::BIGINT AS n_pii,
       md5(r) AS redacted_md5, len(r)::BIGINT AS redacted_len
FROM red
"""
)


@register("pii_redaction_stats", _PII_ORACLE)
def q_pii_redaction_stats(spark, sf_dir):
    """PII scrub over deterministically-augmented documents: per-doc match
    counts per pattern plus an md5 of the fully redacted text, so the
    oracle verifies both detection and the byte-exact replacement output."""
    from distributed_vector_database_spark.operators.curation import pii_scrub

    docs = _read(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" ip 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = pii_scrub(aug)
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        "n_pii",
        F.md5(F.col("text")).alias("redacted_md5"),
        F.length("text").cast("long").alias("redacted_len"),
    )


@register(
    "doc_oov_rate",
    r"""
WITH toks AS (SELECT doc_id,
       list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
     FROM documents),
terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
vocab AS (SELECT term FROM (
            SELECT term, count(*) AS n FROM terms GROUP BY term)
          ORDER BY n DESC, term ASC LIMIT 100),
j AS (SELECT d.doc_id, v.term IS NOT NULL AS iv
      FROM terms d LEFT JOIN vocab v ON d.term = v.term)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN iv THEN 0 ELSE 1 END)::BIGINT AS n_oov,
       ((2000000 * sum(CASE WHEN iv THEN 0 ELSE 1 END)::BIGINT
          + count(*)) // (2 * count(*))) / 1e6 AS oov_rate
FROM j GROUP BY doc_id
""",
)
def q_doc_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per doc vs the corpus's own top-100 vocab
    (text_analysis.oov_rates): wordcount -> TakeOrdered vocab -> broadcast
    join -> map-side-combinable per-doc agg."""
    return _ta.oov_rates(_read(spark, sf_dir, "documents"), vocab_size=100)


# ===========================================================================
# Quality-aware dedup policy (dedup.keep_best_per_cluster): near-dup
# clusters (exact Jaccard >= 0.8 closed into components) keep their
# HIGHEST-quality member instead of their lowest id. Oracle: the
# dedup_clusters RECURSIVE CTE + the doc_quality formula + one argmax
# window.
# ===========================================================================


@register(
    "dedup_keep_best",
    f"""
WITH RECURSIVE {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg, len(s) AS n FROM sh),
p AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
pairs AS (SELECT doc_id_a AS a, doc_id_b AS b FROM p
          WHERE ROUND(inter::DOUBLE / (na + nb - inter), 6) >= 0.8),
e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
walk(n, m) AS (
  SELECT a, a FROM e
  UNION
  SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a),
cl AS (SELECT n AS doc_id, min(m) AS cluster_id FROM walk GROUP BY n),
q AS (SELECT doc_id,
       ROUND(0.4 * LEAST(len(t) / 50.0, 1.0)
           + 0.4 * (len(list_distinct(t))::DOUBLE / len(t))
           + 0.2 * LEAST((list_sum(list_transform(t, x -> len(x)))::DOUBLE
                          / len(t)) / 6.0, 1.0), 6) AS quality
      FROM toks),
j AS (SELECT q.doc_id, COALESCE(cl.cluster_id, q.doc_id) AS cluster_id,
             q.quality
      FROM q LEFT JOIN cl ON q.doc_id = cl.doc_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                                   ORDER BY quality DESC, doc_id ASC) AS rn
      FROM j)
SELECT doc_id, cluster_id::BIGINT AS cluster_id, quality FROM r WHERE rn = 1
""",
)
def q_dedup_keep_best(spark, sf_dir):
    """Near-dup dedup keeping the cleanest variant: prefix-filtered exact
    Jaccard pairs -> connected components -> per-cluster argmax on the
    quality score (ties -> lowest doc_id); singletons kept as themselves."""
    from distributed_vector_database_spark.operators.dedup import (
        keep_best_per_cluster,
    )
    from distributed_vector_database_spark.operators.graph import (
        connected_components,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    quality = _ta.quality_scores(docs).select("doc_id", "quality")
    pairs = _dd.jaccard_pairs_prefix(docs, threshold=0.8).select(
        "doc_id_a", "doc_id_b"
    )
    cc = connected_components(pairs, src="doc_id_a", dst="doc_id_b")
    clusters = cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )
    return keep_best_per_cluster(quality, clusters)


# ===========================================================================
# Hard-negative mining (operators/mining.py): for each anchor, the top-k
# most-similar corpus rows of a DIFFERENT label — contrastive-training
# pair mining, riding the batched top-k kernel's per-query mask.
# ===========================================================================


@register(
    "hard_negative_mining",
    f"""
WITH qs AS (SELECT vec_id AS query_id, label AS qlabel,
                   embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id IN (0, 7, 42)),
s AS (SELECT qs.query_id, e.vec_id, ROUND({_cos(E, 'qs.qv')}, 6) AS score
      FROM embeddings e, qs WHERE e.label <> qs.qlabel),
r AS (SELECT query_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT query_id, vec_id, score, "rank" FROM r WHERE "rank" <= 5
""",
)
def q_hard_negative_mining(spark, sf_dir):
    """Top-5 wrong-label nearest neighbors per anchor (mining.hard_negatives):
    one job, per-anchor label exclusion applied inside the Arrow partition
    kernel — no per-label driver loop, no corpus×anchors cross product."""
    from distributed_vector_database_spark.operators.mining import (
        hard_negatives,
    )

    emb = _read(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
        F.col("label").alias("query_label"),
    )
    out = hard_negatives(emb, anchors, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ===========================================================================
# Document chunking (operators/chunking.py): fixed-token windows with
# overlap — the RAG/embedding-index ingestion step upstream of embed/IVF.
# ===========================================================================


@register(
    "doc_chunks",
    f"""
WITH {_TOKS_CTE},
c AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
s AS (SELECT doc_id, t, n, unnest(range(1, n + 1, 24)) AS st FROM c)
SELECT doc_id,
       ((st - 1) // 24)::BIGINT AS chunk_ix,
       st::BIGINT AS start_token,
       LEAST(32, n - st + 1)::BIGINT AS n_chunk_tokens,
       array_to_string(list_slice(t, st, LEAST(st + 31, n)), ' ')
         AS chunk_text
FROM s
""",
)
def q_doc_chunks(spark, sf_dir):
    """Fixed-window chunking: 32-token chunks, 8-token overlap (stride 24).
    Narrow tokenize -> sequence -> posexplode plan; (doc_id, chunk_ix) is
    the stable chunk key an idempotent re-ingest needs."""
    from distributed_vector_database_spark.operators.chunking import (
        chunk_documents,
    )

    docs = _read(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)


# ===========================================================================
# Semantic deduplication (operators/dedup.semantic_dedup): SemDeDup-style
# cluster-then-in-cluster-cosine dedup over the embedding table.
# ===========================================================================


@register(
    "semantic_dedup",
    f"""
WITH nk AS (SELECT greatest(CAST(ceil(count(*) / 250.0) AS BIGINT), 2) AS k
            FROM embeddings),
c AS (SELECT vec_id AS shard_id, embedding::DOUBLE[] AS cv
      FROM embeddings, nk WHERE vec_id < nk.k),
assign AS (
  SELECT vec_id, shard_id FROM (
    SELECT e.vec_id, c.shard_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance({E}, c.cv) ASC,
                                       c.shard_id ASC) AS rn
    FROM embeddings e, c) t
  WHERE rn = 1),
v AS (SELECT e.vec_id, a.shard_id AS cluster_id, e.embedding::DOUBLE[] AS ev
      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
d AS (SELECT DISTINCT b.vec_id
      FROM v a JOIN v b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE ROUND({_cos('a.ev', 'b.ev')}, 6) >= 0.9)
SELECT v.vec_id AS vec_id, v.cluster_id::BIGINT AS cluster_id,
       (d.vec_id IS NULL) AS kept
FROM v LEFT JOIN d ON v.vec_id = d.vec_id
""",
)
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (public arXiv 2303.09540): route every vector to its
    nearest injected centroid (the IVF routing rule), then inside each
    cluster drop any row with cosine >= 0.9 to a lower-id row. One narrow
    assignment + one cluster shuffle + per-cluster Arrow GEMM.

    k scales with the corpus — ceil(n/250), floor 2 — so in-cluster pair
    work stays ~(250)^2 per cluster and the whole query is LINEAR in
    corpus size (SCALING.md: the k=8 pin went 6.1x on 10x rows because
    (n/k)^2 grew; re-measured at k∝n it's ~1x/decade). The count() that
    sizes k is a single scalar aggregate, not a data-sized collect."""
    from distributed_vector_database_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = _read(spark, sf_dir, "embeddings")
    k = max(-(-emb.count() // 250), 2)
    cents = _fixed_centroids(spark, sf_dir, n=k)
    return semantic_dedup(emb, cents, threshold=0.9)


# ===========================================================================
# Class prototypes (operators/mining.py): per-label mean vector + each
# row's cosine to its own prototype — intra-class outlier scoring.
# ===========================================================================


@register(
    "label_prototype_cos",
    f"""
WITH x AS (SELECT e.label, t.pos,
                  CAST(round((e.embedding::DOUBLE[])[t.pos] * 1e6) AS BIGINT)
                    AS vmic
           FROM embeddings e
           CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) t),
p AS (SELECT label, pos,
             sign(sum(vmic)) * ((2 * abs(sum(vmic))::BIGINT + count(*))
                                // (2 * count(*))) / 1e6 AS m
      FROM x GROUP BY label, pos),
pr AS (SELECT label, list(m ORDER BY pos) AS proto FROM p GROUP BY label)
SELECT e.vec_id AS vec_id, e.label AS label,
       ROUND({_cos(E, 'pr.proto')}, 6) AS proto_cos
FROM embeddings e JOIN pr USING (label)
""",
)
def q_label_prototype_cos(spark, sf_dir):
    """Every vector's cosine to its class prototype (exact integer-micro
    means, order-independent across engines); low scores = likely
    mislabels. Prototype table is |labels| rows -> broadcast join."""
    from distributed_vector_database_spark.operators.mining import (
        prototype_scores,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return prototype_scores(emb, 64)


# ===========================================================================
# TPC-H Q7/Q14 shapes: multi-dim snowflake join + conditional aggregation
# over the fact table (analytics-engine completeness).
# ===========================================================================


@register(
    "volume_shipping",
    """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1.0 - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""",
)
def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation trade volume by ship year. The only
    fact-fact shuffle is lineitem-orders on orderkey; customer, supplier
    and both nation roles broadcast. DECIMAL revenue sums are
    partial-aggregation-order independent."""
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


@register(
    "promo_revenue_monthly",
    """
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
       CAST(ROUND(sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1.0 - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE 0 END), 2) AS DOUBLE) AS promo_revenue,
       CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1.0 - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
)
def q_promo_revenue_monthly(spark, sf_dir):
    """TPC-H Q14 shape: promo vs total revenue per ship month. part is the
    broadcast dim; one hash-agg shuffle on the month key; the ratio is left
    to the reader so both sums stay DECIMAL-exact."""
    li = _read(spark, sf_dir, "lineitem")
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(F.sum(promo), 2).cast("double").alias("promo_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "chunk_search_hashed",
    f"""
WITH {_TOKS_CTE},
c AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
s AS (SELECT doc_id, t, n, unnest(range(1, n + 1, 24)) AS st FROM c),
ch AS (SELECT doc_id, ((st - 1) // 24)::BIGINT AS chunk_ix,
              list_slice(t, st, LEAST(st + 31, n)) AS ct FROM s),
tk AS (SELECT doc_id, chunk_ix, unnest(ct) AS tok FROM ch),
sp AS (SELECT doc_id, chunk_ix, {_bucket_sql('tok')} AS bucket,
              count(*) AS cnt
       FROM tk GROUP BY 1, 2, 3),
nrm AS (SELECT doc_id, chunk_ix, sqrt(sum(cnt * cnt)::DOUBLE) AS nn
        FROM sp GROUP BY 1, 2),
qd AS (SELECT {_bucket_sql('tok')} AS bucket, count(*) AS cnt
       FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id = 0)
       GROUP BY 1),
qn AS (SELECT sqrt(sum(cnt * cnt)::DOUBLE) AS qn FROM qd),
dotp AS (SELECT sp.doc_id, sp.chunk_ix, sum(sp.cnt * qd.cnt)::DOUBLE AS dp
         FROM sp JOIN qd USING (bucket) GROUP BY 1, 2)
SELECT n2.doc_id AS doc_id, n2.chunk_ix AS chunk_ix,
       ROUND(COALESCE(dotp.dp, 0.0) / (n2.nn * (SELECT qn FROM qn)), 6)
         AS score
FROM nrm n2 LEFT JOIN dotp USING (doc_id, chunk_ix)
ORDER BY score DESC, doc_id ASC, chunk_ix ASC
LIMIT 10
""",
)
def q_chunk_search_hashed(spark, sf_dir):
    """The full RAG read path at CHUNK granularity: chunk every document
    (32-token windows, stride 24), hash-embed each chunk, top-10 cosine
    for the doc_id=0 query document. Composes chunk_documents ->
    hashing_embed -> topk in one declarative plan; the composite
    (doc_id, chunk_ix) key rides a single packed long through the top-k
    kernel (chunk_ix < 2^16 by construction: chunks per doc are bounded
    by token count / stride)."""
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.chunking import (
        chunk_documents,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ch = chunk_documents(docs, chunk_tokens=32, overlap_tokens=8).select(
        (F.col("doc_id") * 65536 + F.col("chunk_ix")).alias("chunk_key"),
        "chunk_text",
    )
    dense = hashing_embed(
        ch, dim=64, normalize=False, text_col="chunk_text",
        id_col="chunk_key",
    )
    qv = _doc0_hash_qv(spark, sf_dir)
    out = topk(dense, qv, k=10, vector_col="embedding", id_col="chunk_key")
    return out.select(
        (F.col("chunk_key") / 65536).cast("long").alias("doc_id"),
        (F.col("chunk_key") % 65536).cast("long").alias("chunk_ix"),
        "score",
    )


# ===========================================================================
# Merge-on-read upsert layout (sources/mor.py): base + delta batches,
# window-merged reads — the lakehouse MoR pattern on plain parquet.
# ===========================================================================

_MOR_CACHE: dict = {}
_MOR_DEL_CACHE: dict = {}


@register(
    "mor_upsert_read",
    """
SELECT vec_id,
       (CASE WHEN vec_id % 21 = 0 THEN 3
             WHEN vec_id % 7 = 0 THEN 2
             ELSE 1 END)::BIGINT AS version,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             * (CASE WHEN vec_id % 21 = 0 THEN 3
                     WHEN vec_id % 7 = 0 THEN 2
                     ELSE 1 END), 6) AS val
FROM embeddings
""",
)
def q_mor_upsert_read(spark, sf_dir):
    """Merge-on-read REPLACE INTO: bootstrap a base from the embeddings
    table (version 1), append two OVERLAPPING upsert batches (version 2 for
    vec_id%7, version 3 for vec_id%21 — batch order must win, not batch
    size), and return the merged view. Appends never shuffle the base
    (O(|delta|) writes); the keep-latest window is paid once at read, and
    not at all after `compact()` folds the deltas (tests/test_mor.py)."""
    import tempfile

    from distributed_vector_database_spark.functions.vector import l2_norm
    from distributed_vector_database_spark.sources.mor import MorStore

    emb = _read(spark, sf_dir, "embeddings")

    def versioned(df, v):
        return df.select(
            "vec_id",
            F.lit(v).cast("long").alias("version"),
            round_score(l2_norm("embedding") * v).alias("val"),
        )

    store = _MOR_CACHE.get(sf_dir)
    if store is None:
        store = MorStore(
            spark, tempfile.mkdtemp(prefix="dvdb_mor_"), id_col="vec_id"
        )
        store.write_base(versioned(emb, 1))
        store.append(versioned(emb.filter(F.col("vec_id") % 7 == 0), 2))
        store.append(versioned(emb.filter(F.col("vec_id") % 21 == 0), 3))
        _MOR_CACHE[sf_dir] = store
    return store.read()


@register(
    "mor_delete_read",
    """
SELECT vec_id,
       (CASE WHEN vec_id % 35 = 0 THEN 4
             WHEN vec_id % 7 = 0 THEN 2
             ELSE 1 END)::BIGINT AS version,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             * (CASE WHEN vec_id % 35 = 0 THEN 4
                     WHEN vec_id % 7 = 0 THEN 2
                     ELSE 1 END), 6) AS val
FROM embeddings
WHERE vec_id % 5 <> 0 OR vec_id % 35 = 0
""",
)
def q_mor_delete_read(spark, sf_dir):
    """Merge-on-read TOMBSTONE deletes: bootstrap (version 1), upsert
    vec_id%7 (version 2), DELETE vec_id%5 (tombstone batch — O(|ids|)
    write, value columns never touched), then re-insert vec_id%35
    (version 4) — the re-insert must resurrect ids its tombstone had
    deleted, and every other %5 id must vanish from the merged view.
    After ``compact()`` the tombstoned rows leave the base files
    physically (GDPR erasure, tests/test_mor.py)."""
    import tempfile

    from distributed_vector_database_spark.functions.vector import l2_norm
    from distributed_vector_database_spark.sources.mor import MorStore

    emb = _read(spark, sf_dir, "embeddings")

    def versioned(df, v):
        return df.select(
            "vec_id",
            F.lit(v).cast("long").alias("version"),
            round_score(l2_norm("embedding") * v).alias("val"),
        )

    store = _MOR_DEL_CACHE.get(sf_dir)
    if store is None:
        store = MorStore(
            spark, tempfile.mkdtemp(prefix="dvdb_mordel_"), id_col="vec_id"
        )
        store.write_base(versioned(emb, 1))
        store.append(versioned(emb.filter(F.col("vec_id") % 7 == 0), 2))
        store.delete(emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"))
        store.append(versioned(emb.filter(F.col("vec_id") % 35 == 0), 4))
        _MOR_DEL_CACHE[sf_dir] = store
    return store.read()


@register(
    "mor_changes_feed",
    """
SELECT vec_id,
       (CASE WHEN vec_id % 35 = 0 THEN 4
             WHEN vec_id % 5 = 0 THEN NULL
             ELSE 2 END)::BIGINT AS version,
       CASE WHEN vec_id % 35 = 0
              THEN ROUND(sqrt(list_dot_product(embedding::DOUBLE[],
                                               embedding::DOUBLE[])) * 4, 6)
            WHEN vec_id % 5 = 0 THEN NULL
            ELSE ROUND(sqrt(list_dot_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[])) * 2, 6)
       END AS val,
       CASE WHEN vec_id % 5 = 0 AND vec_id % 35 <> 0 THEN 'delete'
            ELSE 'upsert' END AS change_type,
       (CASE WHEN vec_id % 35 = 0 THEN 3
             WHEN vec_id % 5 = 0 THEN 2
             ELSE 1 END)::BIGINT AS _batch
FROM embeddings
WHERE vec_id % 7 = 0 OR vec_id % 5 = 0
""",
)
def q_mor_changes_feed(spark, sf_dir):
    """CDC incremental read over the tombstone store: ``changes(0)`` nets
    the three delta batches (upsert %7 @1, delete %5 @2, re-insert %35
    @3) to one typed change per id — the poll-with-watermark feed an
    index-maintenance or replication consumer reads instead of the base.
    Reads ONLY delta slivers; at 100 TB the feed cost is O(|changes|)."""
    q_mor_delete_read(spark, sf_dir)  # ensure the cached store exists
    store = _MOR_DEL_CACHE[sf_dir]
    return store.changes(0).select(
        "vec_id", "version", "val", "change_type", "_batch"
    )


@register(
    "mor_time_travel",
    """
SELECT vec_id,
       (CASE WHEN vec_id % 7 = 0 THEN 2 ELSE 1 END)::BIGINT AS version,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             * (CASE WHEN vec_id % 7 = 0 THEN 2 ELSE 1 END), 6) AS val
FROM embeddings
WHERE vec_id % 5 <> 0
""",
)
def q_mor_time_travel(spark, sf_dir):
    """Time-travel read: the tombstone store AS OF batch 2 — after the
    %5 delete but BEFORE the %35 re-insert — so every %5 id is absent
    (including the ones batch 3 later resurrects) and %7 ids still show
    version 2. The as-of predicate prunes higher delta dirs at the scan;
    history ≤ the compaction watermark folds away (vacuum-style
    retention)."""
    q_mor_delete_read(spark, sf_dir)  # ensure the cached store exists
    store = _MOR_DEL_CACHE[sf_dir]
    return store.read(as_of_batch=2)


# ===========================================================================
# DSIR importance weighting (operators/dsir.py): hashed-ngram importance
# log-weights of every raw doc against a target slice — data selection.
# ===========================================================================


@register(
    "dsir_log_weights",
    f"""
WITH {_TOKS_CTE},
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t), 1)),
                                   i -> t[i] || ' ' || t[i+1])) AS gm
      FROM toks WHERE len(t) >= 2),
f AS (SELECT doc_id, {_bucket_sql('gm', 256)} AS bucket FROM g),
tc AS (SELECT bucket, count(*) AS ct FROM f WHERE {_EVAL_PRED}
       GROUP BY bucket),
tt AS (SELECT count(*) AS t FROM f WHERE {_EVAL_PRED}),
sc AS (SELECT bucket, count(*) AS cs FROM f WHERE NOT ({_EVAL_PRED})
       GROUP BY bucket),
ss AS (SELECT count(*) AS s FROM f WHERE NOT ({_EVAL_PRED})),
u AS (SELECT unnest(range(0, 256)) AS bucket),
lr AS (SELECT u.bucket,
              CAST(round((ln((COALESCE(ct, 0) + 1)::DOUBLE / (tt.t + 256))
                        - ln((COALESCE(cs, 0) + 1)::DOUBLE / (ss.s + 256)))
                         * 1e6) AS BIGINT) AS lr_micro
       FROM u LEFT JOIN tc ON u.bucket = tc.bucket
              LEFT JOIN sc ON u.bucket = sc.bucket, tt, ss)
SELECT f.doc_id AS doc_id, count(*)::BIGINT AS n_feats,
       ROUND(sum(lr_micro) / 1e6, 6) AS log_w
FROM f JOIN lr ON f.bucket = lr.bucket
WHERE NOT (f.doc_id % 50 = 0)
GROUP BY f.doc_id
""",
)
def q_dsir_log_weights(spark, sf_dir):
    """DSIR data selection (public arXiv 2302.03169): importance log-weight
    of every raw doc = log-likelihood ratio of its hashed-bigram bag under
    the eval-slice target model vs the raw-source model (Laplace-smoothed,
    256 buckets). Log-ratios quantize to integer micro-nats so per-doc
    sums are exact and order-independent; the ratio table is 256 rows ->
    broadcast; one per-doc aggregation shuffle total."""
    from distributed_vector_database_spark.operators.dsir import (
        importance_log_weights,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    target = docs.filter(F.expr(_EVAL_PRED))
    source = docs.filter(~F.expr(_EVAL_PRED))
    return importance_log_weights(source, target, ngram=2, dim=256)


@register(
    "dsir_gumbel_sample",
    f"""
WITH {_TOKS_CTE},
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t), 1)),
                                   i -> t[i] || ' ' || t[i+1])) AS gm
      FROM toks WHERE len(t) >= 2),
f AS (SELECT doc_id, {_bucket_sql('gm', 256)} AS bucket FROM g),
tc AS (SELECT bucket, count(*) AS ct FROM f WHERE {_EVAL_PRED}
       GROUP BY bucket),
tt AS (SELECT count(*) AS t FROM f WHERE {_EVAL_PRED}),
sc AS (SELECT bucket, count(*) AS cs FROM f WHERE NOT ({_EVAL_PRED})
       GROUP BY bucket),
ss AS (SELECT count(*) AS s FROM f WHERE NOT ({_EVAL_PRED})),
u AS (SELECT unnest(range(0, 256)) AS bucket),
lr AS (SELECT u.bucket,
              CAST(round((ln((COALESCE(ct, 0) + 1)::DOUBLE / (tt.t + 256))
                        - ln((COALESCE(cs, 0) + 1)::DOUBLE / (ss.s + 256)))
                         * 1e6) AS BIGINT) AS lr_micro
       FROM u LEFT JOIN tc ON u.bucket = tc.bucket
              LEFT JOIN sc ON u.bucket = sc.bucket, tt, ss),
w AS (SELECT f.doc_id AS doc_id, count(*)::BIGINT AS n_feats,
             ROUND(sum(lr_micro) / 1e6, 6) AS log_w
      FROM f JOIN lr ON f.bucket = lr.bucket
      WHERE NOT (f.doc_id % 50 = 0)
      GROUP BY f.doc_id)
SELECT doc_id, n_feats, log_w,
       ROUND(log_w + (-ln(-ln(
           (('0x' || substr(md5('0:' || doc_id::VARCHAR), 1, 12))::BIGINT
            + 0.5) / 281474976710656.0))), 6) AS gumbel_key
FROM w
ORDER BY gumbel_key DESC, doc_id ASC
LIMIT 50
""",
)
def q_dsir_gumbel_sample(spark, sf_dir):
    """DSIR's resampling step: Gumbel-top-50 over the importance
    log-weights with md5-derandomized noise (seed 0) — sampling ∝ exp(log_w)
    without replacement, reproducible across engines/partitionings/runs."""
    from distributed_vector_database_spark.operators.dsir import (
        dsir_gumbel_sample,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    target = docs.filter(F.expr(_EVAL_PRED))
    source = docs.filter(~F.expr(_EVAL_PRED))
    return dsir_gumbel_sample(source, target, k=50, seed=0)


@register(
    "doc_perplexity_filter",
    f"""
WITH {_TOKS_CTE},
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t), 1)),
                                   i -> t[i] || ' ' || t[i+1])) AS gm
      FROM toks WHERE len(t) >= 2),
f AS (SELECT doc_id, {_bucket_sql('gm', 256)} AS bucket FROM g),
tc AS (SELECT bucket, count(*) AS ct FROM f WHERE {_EVAL_PRED}
       GROUP BY bucket),
tt AS (SELECT count(*) AS t FROM f WHERE {_EVAL_PRED}),
u AS (SELECT unnest(range(0, 256)) AS bucket),
nlp AS (SELECT u.bucket,
               CAST(round(-ln((COALESCE(ct, 0) + 1)::DOUBLE / (tt.t + 256))
                          * 1e6) AS BIGINT) AS nlp_micro
        FROM u LEFT JOIN tc ON u.bucket = tc.bucket, tt)
SELECT f.doc_id AS doc_id, count(*)::BIGINT AS n_feats,
       ((2 * sum(nlp_micro) + count(*)) // (2 * count(*))) / 1e6 AS xent
FROM f JOIN nlp ON f.bucket = nlp.bucket
WHERE NOT (f.doc_id % 50 = 0)
GROUP BY f.doc_id
""",
)
def q_doc_perplexity_filter(spark, sf_dir):
    """CCNet-style perplexity filtering (public arXiv 1911.00359) with the
    engine's hashed-feature model: each raw doc's cross-entropy under the
    eval-slice target model — drop the high-xent tail. Exact micro-nat
    accumulation; 256-row model broadcast; one per-doc shuffle."""
    from distributed_vector_database_spark.operators.dsir import (
        target_cross_entropy,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    target = docs.filter(F.expr(_EVAL_PRED))
    source = docs.filter(~F.expr(_EVAL_PRED))
    return target_cross_entropy(source, target, ngram=2, dim=256)


# ===========================================================================
# Substring-level dedup signal (dedup.repeated_spans): exact cross-document
# repeated token spans — the relational form of suffix-array substring dedup.
# ===========================================================================

_SPAN8 = " || ' ' || ".join(f"t[i+{j}]" for j in range(8))


@register(
    "repeated_span_report",
    f"""
WITH {_TOKS_CTE},
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
                                   i -> {_SPAN8})) AS gm
      FROM toks WHERE len(t) >= 8)
SELECT md5(gm) AS span_hash,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_occurrences,
       min(doc_id) AS rep_doc_id
FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
""",
)
def q_repeated_span_report(spark, sf_dir):
    """Cross-document exact 8-token spans (dedup.repeated_spans): the
    repeated-substring signal of Lee et al. substring dedup, as one
    partial-aggregated groupBy over exploded span occurrences."""
    from distributed_vector_database_spark.operators.dedup import (
        repeated_spans,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return repeated_spans(docs, span_tokens=8, min_docs=2)


@register(
    "doc_repeated_span_stats",
    f"""
WITH {_TOKS_CTE},
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
                                   i -> {_SPAN8})) AS gm
      FROM toks WHERE len(t) >= 8),
h AS (SELECT doc_id, md5(gm) AS span_hash FROM g),
fr AS (SELECT span_hash, count(DISTINCT doc_id) AS nd FROM h GROUP BY 1)
SELECT h.doc_id AS doc_id, count(*)::BIGINT AS n_spans,
       sum(CASE WHEN fr.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       ROUND(sum(CASE WHEN fr.nd >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS shared_frac
FROM h JOIN fr USING (span_hash)
GROUP BY h.doc_id
""",
)
def q_doc_repeated_span_stats(spark, sf_dir):
    """Per-document recycled-text fraction: the share of a doc's 8-token
    span positions whose span also appears in another doc — the per-doc
    drop/trim signal of substring dedup."""
    from distributed_vector_database_spark.operators.dedup import (
        doc_repeated_span_stats,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return doc_repeated_span_stats(docs, span_tokens=8)


# ===========================================================================
# Hybrid retrieval with reciprocal-rank fusion (operators/fusion.py): a
# dense arm (hashed-embedding cosine) and a lexical arm (3-gram Jaccard)
# fused score-free by RRF — the two-arm search stack the reference's
# single-arm cosine flow lacks.
# ===========================================================================


@register(
    "hybrid_search_rrf",
    f"""
WITH {_TOKS_CTE},
tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
sp AS (SELECT doc_id, {_bucket_sql('tok')} AS bucket, count(*) AS cnt
       FROM tk GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(cnt * cnt)::DOUBLE) AS n FROM sp GROUP BY doc_id),
qd AS (SELECT bucket, cnt FROM sp WHERE doc_id = 0),
dotp AS (SELECT sp.doc_id, sum(sp.cnt * qd.cnt)::DOUBLE AS dp
         FROM sp JOIN qd ON sp.bucket = qd.bucket GROUP BY sp.doc_id),
cosr AS (SELECT n2.doc_id AS doc_id,
         ROUND(COALESCE(dotp.dp, 0.0)
               / (n2.n * (SELECT n FROM nrm WHERE doc_id = 0)), 6) AS score
         FROM nrm n2 LEFT JOIN dotp ON n2.doc_id = dotp.doc_id),
arma AS (SELECT doc_id, rnk FROM (
           SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
           FROM cosr) t WHERE rnk <= 20),
sh0 AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
sh AS (SELECT * FROM sh0 WHERE len(s) > 0),
q AS (SELECT s AS qs FROM sh WHERE doc_id = 0),
jac AS (SELECT sh.doc_id AS doc_id,
        ROUND(len(list_intersect(sh.s, q.qs))::DOUBLE
              / (len(sh.s) + len(q.qs) - len(list_intersect(sh.s, q.qs))), 6)
          AS score
        FROM sh, q WHERE len(list_intersect(sh.s, q.qs)) > 0),
armb AS (SELECT doc_id, rnk FROM (
           SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
           FROM jac) t WHERE rnk <= 20),
fused AS (SELECT doc_id, sum(1.0 / (60 + rnk)) AS s
          FROM (SELECT * FROM arma UNION ALL SELECT * FROM armb) u
          GROUP BY doc_id)
SELECT doc_id, ROUND(s, 6) AS rrf_score FROM fused
ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
""",
)
def q_hybrid_search_rrf(spark, sf_dir):
    """Two-arm hybrid search for the doc_id=0 query document: dense arm =
    hashed-embedding cosine top-20, lexical arm = 3-gram Jaccard top-20,
    fused by reciprocal-rank (k=60, Cormack et al. SIGIR'09). Both arms
    rank on ROUNDED scores with id tie-breaks so ranks reproduce across
    engines; fusion itself touches only k·arms rows — free at any corpus
    scale."""
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.fusion import (
        ranked,
        rrf_fuse,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    dense = hashing_embed(docs, dim=64, normalize=False)
    qv = _doc0_hash_qv(spark, sf_dir)
    arm_a = ranked(
        topk(dense, qv, k=20, vector_col="embedding", id_col="doc_id"),
        id_col="doc_id",
        top_n=20,
    )

    sh = _dd._shingled(docs, "text", "doc_id", 3)
    q_sh = sh.filter(F.col("doc_id") == 0).select(
        F.col("shingles").alias("qs")
    )
    inter = F.size(F.array_intersect(F.col("shingles"), F.col("qs")))
    jac = (
        sh.join(F.broadcast(q_sh))
        .filter(inter > 0)
        .select(
            "doc_id",
            round_score(
                inter.cast("double")
                / (F.size("shingles") + F.size("qs") - inter),
                6,
            ).alias("score"),
        )
    )
    arm_b = ranked(jac, id_col="doc_id", top_n=20)
    fused = rrf_fuse([arm_a, arm_b], k=60, id_col="doc_id")
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)


# ===========================================================================
# Paragraph-level dedup (dedup.paragraph_*): non-overlapping token blocks as
# the paragraph unit (the sf corpora carry no structural delimiters), exact
# block-hash sharing across documents.
# ===========================================================================

_PARA_CTE = f"""
{_TOKS_CTE},
pb AS (SELECT doc_id,
              unnest(list_transform(range(0, (len(t)+15)//16),
                     i -> md5(array_to_string(list_slice(t, i*16+1, i*16+16), ' ')))) AS bh
       FROM toks WHERE len(t) > 0)
"""


@register(
    "paragraph_dedup_stats",
    f"""
WITH {_PARA_CTE},
fr AS (SELECT bh, count(DISTINCT doc_id) AS nd FROM pb GROUP BY 1)
SELECT pb.doc_id AS doc_id, count(*)::BIGINT AS n_blocks,
       sum(CASE WHEN fr.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_recycled,
       ROUND(sum(CASE WHEN fr.nd >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS recycled_frac
FROM pb JOIN fr USING (bh)
GROUP BY pb.doc_id
""",
)
def q_paragraph_dedup_stats(spark, sf_dir):
    """Per-document recycled-paragraph fraction: share of a doc's
    non-overlapping 16-token blocks whose content also appears as a block
    in another document — paragraph-granularity dedup signal
    (complements the overlapping 8-token span stats)."""
    from distributed_vector_database_spark.operators.dedup import (
        paragraph_dedup_stats,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return paragraph_dedup_stats(docs, block_tokens=16)


@register(
    "duplicate_paragraph_report",
    f"""
WITH {_PARA_CTE}
SELECT bh AS block_hash, count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_occurrences, min(doc_id) AS rep_doc_id
FROM pb GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
""",
)
def q_duplicate_paragraph_report(spark, sf_dir):
    """Corpus-level boilerplate inventory: 16-token paragraph blocks shared
    by >= 2 distinct documents, with occurrence counts and the lowest
    containing doc as representative."""
    from distributed_vector_database_spark.operators.dedup import (
        duplicate_paragraphs,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return duplicate_paragraphs(docs, block_tokens=16, min_docs=2)


# ===========================================================================
# TPC-H sweep completion — the six query shapes (Q2 Q9 Q10 Q11 Q15 Q20) not
# yet covered, adapted to the testdata schema (no partsupp table: supply
# relationships and unit costs derive from lineitem). With these, all 22
# TPC-H query archetypes have a registered, oracle-checked representative.
# ===========================================================================


@register(
    "min_cost_supplier",
    """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100.0 / l_quantity) AS BIGINT))
           AS unit_cents
  FROM lineitem GROUP BY 1, 2),
rc AS (
  SELECT cost.l_partkey, cost.unit_cents, s_name, s_acctbal, n_name
  FROM cost
  JOIN supplier ON cost.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, rc.unit_cents
FROM rc JOIN part ON rc.l_partkey = p_partkey
WHERE p_size BETWEEN 10 AND 20
  AND rc.unit_cents = (SELECT min(r2.unit_cents) FROM rc r2
                       WHERE r2.l_partkey = rc.l_partkey)
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
""",
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): for mid-size parts, the
    cheapest ASIA supplier, where unit cost is the best observed
    price-per-unit in lineitem (testdata has no partsupp, reference's
    relational sweep has no analogue either). The correlated min-cost
    subquery decorrelates into a window MIN over the region-restricted
    offers — one shuffle on partkey; supplier/nation/region broadcast.
    All costs are exact integer cents so the min-equality join is
    bit-stable cross-engine."""
    from pyspark.sql import Window

    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region")
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_size")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") * 100.0 / F.col("l_quantity"))
            .cast("long")
        ).alias("unit_cents")
    )
    rc = (
        cost.join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("l_partkey", "unit_cents", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    best = rc.withColumn("_min_cents", F.min("unit_cents").over(w)).filter(
        F.col("unit_cents") == F.col("_min_cents")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .filter(F.col("p_size").between(10, 20))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "unit_cents",
        )
        .orderBy(
            F.desc("s_acctbal"), "nation", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "nation_profit_by_year",
    """
SELECT n_name AS nation, year(l_shipdate)::BIGINT AS o_year,
       CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1.0 - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS profit
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
""",
)
def q_nation_profit_by_year(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): profit on 'gear' parts by
    supplier nation and ship year. The LIKE filter reaches the part scan
    before the broadcast join, so only matching partkeys probe the fact;
    supplier and nation broadcast too — lineitem is never shuffled until
    the final small (nation, year) aggregation. DECIMAL sums keep the
    cents exact under any partial-agg order."""
    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("profit"))
    )


@register(
    "returned_item_customers",
    """
SELECT c_custkey, c_name, n_name AS nation,
       CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1.0 - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): customers who returned
    the most revenue in 1996H1. The returnflag filter is pushed to the
    lineitem scan and the date filter to the orders scan; the only
    fact-fact shuffle is lineitem-orders on orderkey, then customer and
    nation broadcast onto the aggregated custkeys. Top-20 runs as
    TakeOrderedAndProject — no global sort. Cents are exact DECIMAL, so
    the revenue tie-break (custkey) cuts deterministically."""
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "important_part_values",
    """
WITH pv AS (
  SELECT l_partkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT))
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1)
SELECT l_partkey AS p_partkey,
       ROUND(value_cents / 100.0, 2) AS part_value
FROM pv
WHERE value_cents > (SELECT sum(value_cents) FROM pv) * 0.001
ORDER BY value_cents DESC, p_partkey
""",
)
def q_important_part_values(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): parts whose
    EUROPE-supplied line value exceeds 0.1% of the total. The global
    threshold is a one-row aggregate broadcast against the per-part
    values (Spark plans the scalar subquery as an independent job reused
    as a literal); supplier/nation/region broadcast onto the fact scan.
    Values accumulate as exact integer cents so the threshold comparison
    is deterministic cross-engine."""
    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _read(spark, sf_dir, "region")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = pv.agg(
        (F.sum("value_cents") * 0.001).alias("_thresh")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("_thresh"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_cents") / 100.0, 2).alias("part_value"),
            "value_cents",
        )
        .orderBy(F.desc("value_cents"), "p_partkey")
        .drop("value_cents")
    )


@register(
    "top_supplier_revenue",
    """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, ROUND(total_cents / 100.0, 2) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_cents = (SELECT max(total_cents) FROM rev)
ORDER BY s_suppkey
""",
)
def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    1996Q1 ship revenue — the view-plus-max pattern. Spark computes the
    quarter's per-supplier revenue once, takes the one-row max as a
    broadcast literal, and keeps every supplier tied at the max (exact
    integer cents make ties well-defined). Date filter pushed to the
    lineitem scan; supplier broadcast."""
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("total_cents"))
    mx = rev.agg(F.max("total_cents").alias("_max_cents"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("_max_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "promotion_part_suppliers",
    """
WITH avail AS (
  SELECT l_suppkey, l_partkey,
         sum(CAST(round(l_quantity) AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1, 2),
need AS (
  SELECT l_partkey, sum(CAST(round(l_quantity) AS BIGINT)) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN avail ON s_suppkey = avail.l_suppkey
JOIN need  ON avail.l_partkey = need.l_partkey
JOIN part  ON avail.l_partkey = p_partkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_name LIKE 'red%' AND r_name = 'AMERICA'
  AND avail.qty > 0.5 * need.total_qty
ORDER BY s_suppkey
""",
)
def q_promotion_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): AMERICA suppliers whose
    cumulative supply of a 'red' part exceeds half of that part's 1997
    shipped quantity (availqty stands in for the missing partsupp). Two
    partial-agg shuffles on (supp, part) / part, then part/supplier/
    nation/region all broadcast and a DISTINCT projection of the
    surviving suppliers. Quantities are exact integers, so the
    half-threshold comparison is bit-stable."""
    li = _read(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    avail = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(qty).alias("qty")
    )
    need = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("npk"))
        .agg(F.sum(qty).alias("total_qty"))
    )
    p = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    s = _read(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _read(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        avail.join(need, avail.l_partkey == F.col("npk"))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(p), avail.l_partkey == p.p_partkey)
        .join(F.broadcast(s), avail.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


# ===========================================================================
# Binary (1-bit) quantization search, Matryoshka truncated-dim search, exact
# kNN graph, temperature mixture sampling — round-2 session-3 additions.
# ===========================================================================

_HAMMING64 = (
    "CAST(list_sum(list_transform(range(1, 65), "
    "i -> CASE WHEN ((e.embedding::DOUBLE[])[i] >= 0) <> (q.qv[i] >= 0) "
    "THEN 1 ELSE 0 END)) AS BIGINT)"
)


@register(
    "binary_hamming_topk",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 3)
SELECT e.vec_id AS vec_id, {_HAMMING64} AS hamming
FROM embeddings e, q
ORDER BY hamming ASC, vec_id ASC
LIMIT 10
""",
)
def q_binary_hamming_topk(spark, sf_dir):
    """1-bit (sign) quantized search: corpus packed to 2 BIGINT words per
    64-d vector (32x smaller than float32), ranked by XOR+popcount
    Hamming distance — all Catalyst bit ops inside whole-stage codegen,
    TakeOrderedAndProject for the cut. The oracle ranks by
    sign-disagreement count, which packed Hamming equals by
    construction."""
    from distributed_vector_database_spark.operators.ann import binary_topk

    emb = _read(spark, sf_dir, "embeddings")
    return binary_topk(emb, _query_vec(spark, sf_dir, 3), k=10)


@register(
    "binary_rerank_search",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 3),
h AS (SELECT e.vec_id, {_HAMMING64} AS hamming FROM embeddings e, q),
s AS (SELECT vec_id FROM h ORDER BY hamming ASC, vec_id ASC LIMIT 50),
sc AS (SELECT e.vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
       FROM embeddings e, q
       WHERE e.vec_id IN (SELECT vec_id FROM s)),
r AS (SELECT vec_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM sc)
SELECT vec_id, score, "rank" FROM r WHERE "rank" <= 10
""",
)
def q_binary_rerank_search(spark, sf_dir):
    """Two-stage binary search: Hamming-shortlist 50 candidates over sign
    codes (never touching the float column), then exact cosine re-rank of
    the survivors — the compressed-domain recall-recovery pattern (PQ's
    ADC+re-rank with an even cheaper stage 1)."""
    from distributed_vector_database_spark.operators.ann import (
        binary_rerank_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return binary_rerank_topk(
        emb, _query_vec(spark, sf_dir, 3), k=10, shortlist=50
    )


_E16 = "(list_slice((e.embedding::DOUBLE[]), 1, 16))"
_Q16 = "(list_slice(q.qv, 1, 16))"


@register(
    "matryoshka_rerank_search",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 4),
p AS (SELECT e.vec_id, ROUND({_cos(_E16, _Q16)}, 6) AS pscore
      FROM embeddings e, q),
s AS (SELECT vec_id FROM p ORDER BY pscore DESC, vec_id ASC LIMIT 50),
sc AS (SELECT e.vec_id, ROUND({_cos(E, 'q.qv')}, 6) AS score
       FROM embeddings e, q
       WHERE e.vec_id IN (SELECT vec_id FROM s)),
r AS (SELECT vec_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM sc)
SELECT vec_id, score, "rank" FROM r WHERE "rank" <= 10
""",
)
def q_matryoshka_rerank_search(spark, sf_dir):
    """Matryoshka truncated-dimension search: cosine shortlist over the
    first 16 of 64 dims (a quarter of the vector bytes), exact full-dim
    re-rank of 50 survivors — the MRL serving pattern; at scale the
    prefix persists as its own skinny column."""
    from distributed_vector_database_spark.operators.ann import (
        matryoshka_rerank_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return matryoshka_rerank_topk(
        emb, _query_vec(spark, sf_dir, 4), k=10, prefix_dim=16, shortlist=50
    )


_A = "(a.embedding::DOUBLE[])"


@register(
    "knn_graph_exact",
    f"""
WITH s AS (SELECT a.vec_id AS query_id, e.vec_id AS vec_id,
                  ROUND({_cos(_A, E)}, 6) AS score
           FROM embeddings a JOIN embeddings e ON a.vec_id <> e.vec_id),
r AS (SELECT query_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT query_id, vec_id, score, "rank" FROM r WHERE "rank" <= 3
""",
)
def q_knn_graph_exact(spark, sf_dir):
    """Exact 3-NN graph over the whole corpus in ONE batched job: the
    corpus doubles as the query batch through the Arrow per-partition
    GEMM top-k kernel, so the window merge sees O(partitions*k) rows per
    vertex — never the |V|^2 cross product (plan-asserted). Substrate
    for SemDeDup clustering, kNN classification, and graph-based label
    propagation; at 100 TB generate candidates per LSH bucket / IVF cell
    and run this kernel within each."""
    from distributed_vector_database_spark.operators.ann import knn_graph

    emb = _read(spark, sf_dir, "embeddings")
    return knn_graph(emb, k=3)


@register(
    "temperature_lang_mix",
    """
WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
w AS (SELECT lang, CAST(round(sqrt(n_docs) * 1e6) AS BIGINT) AS w_mic FROM c),
t AS (SELECT lang, (200 * w_mic) // (SELECT sum(w_mic) FROM w) AS target
      FROM w),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS "rank"
      FROM documents)
SELECT r.doc_id, r.lang, r."rank"
FROM r JOIN t USING (lang) WHERE r."rank" <= t.target
""",
)
def q_temperature_lang_mix(spark, sf_dir):
    """Temperature-scaled mixture sampling (alpha = 0.5) of ~200 docs
    across languages: allocations proportional to sqrt(count) up-weight
    low-resource languages (the mT5/XLM-R temperature trick), filled in
    deterministic md5-hash order. Weights round to integer micros before
    the split so the allocation is exact integer math cross-engine."""
    from distributed_vector_database_spark.operators.curation import (
        temperature_mix,
    )

    docs = _read(spark, sf_dir, "documents")
    return temperature_mix(docs, total=200, alpha=0.5, source_col="lang")


@register(
    "bm25_topk",
    f"""
WITH {_TOKS_CTE},
d AS (SELECT doc_id, len(t)::BIGINT AS dl, t FROM toks),
st AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl,
              count(*)::BIGINT AS n FROM d),
e AS (SELECT doc_id, dl, unnest(t) AS term FROM d),
tf AS (SELECT doc_id, dl, term, count(*)::BIGINT AS tf
       FROM e WHERE term IN ('scan', 'join', 'filter')
       GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
sc AS (SELECT tf.doc_id,
              CAST(round(
                ln(1.0 + (CAST((SELECT n FROM st) AS DOUBLE) - df + 0.5)
                         / (df + 0.5))
                * (tf * 2.2)
                / (tf + 1.2 * (0.25 + 0.75 * dl / (SELECT avgdl FROM st)))
                * 1e6) AS BIGINT) AS mic
      FROM tf JOIN dfreq USING (term)),
agg AS (SELECT doc_id, sum(mic) AS m FROM sc GROUP BY 1)
SELECT doc_id, ROUND(m / 1e6, 6) AS score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT 10
""",
)
def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-10 for the query bag {scan, join, filter} — the
    sparse lexical arm of hybrid retrieval (k1=1.2, b=0.75,
    Lucene-smoothed idf). Per-term scores round to integer micros and
    sum as exact longs, so the 3-addend float sum cannot diverge
    cross-engine. The explode filters to query terms before the only
    shuffle; corpus stats enter the plan as index-build literals."""
    from distributed_vector_database_spark.operators.text_analysis import (
        bm25_search,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return bm25_search(docs, ["scan", "join", "filter"], k=10)


def _li_q_cte(name: str, toks: list[str]) -> str:
    """Bucket-count CTE for one literal query phrase (late interaction)."""
    lst = ", ".join(f"'{t}'" for t in toks)
    return (
        f"{name} AS (SELECT {_bucket_sql('tok')} AS bucket, count(*) AS cnt "
        f"FROM (SELECT unnest([{lst}]) AS tok) GROUP BY 1)"
    )


_LI_PHRASES = [["scan", "join"], ["filter", "merge"], ["hash", "table"]]


@register(
    "late_interaction_search",
    f"""
WITH {_TOKS_CTE},
c AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
s AS (SELECT doc_id, t, n, unnest(range(1, n + 1, 24)) AS st FROM c),
ch AS (SELECT doc_id, ((st - 1) // 24)::BIGINT AS chunk_ix,
              list_slice(t, st, LEAST(st + 31, n)) AS ct FROM s),
tk AS (SELECT doc_id, chunk_ix, unnest(ct) AS tok FROM ch),
sp AS (SELECT doc_id, chunk_ix, {_bucket_sql('tok')} AS bucket,
              count(*) AS cnt
       FROM tk GROUP BY 1, 2, 3),
nrm AS (SELECT doc_id, chunk_ix, sqrt(sum(cnt * cnt)::DOUBLE) AS nn
        FROM sp GROUP BY 1, 2),
{", ".join(_li_q_cte(f"q{i}", p) for i, p in enumerate(_LI_PHRASES))},
{", ".join(
    f"d{i} AS (SELECT sp.doc_id, sp.chunk_ix, "
    f"sum(sp.cnt * q{i}.cnt)::DOUBLE AS dp "
    f"FROM sp JOIN q{i} USING (bucket) GROUP BY 1, 2), "
    f"m{i} AS (SELECT nrm.doc_id, "
    f"max(ROUND(COALESCE(d{i}.dp, 0.0) / (nrm.nn * "
    f"(SELECT sqrt(sum(cnt * cnt)::DOUBLE) FROM q{i})), 6)) AS m "
    f"FROM nrm LEFT JOIN d{i} USING (doc_id, chunk_ix) GROUP BY 1)"
    for i in range(len(_LI_PHRASES))
)}
SELECT m0.doc_id AS doc_id, ROUND(m0.m + m1.m + m2.m, 6) AS score
FROM m0 JOIN m1 USING (doc_id) JOIN m2 USING (doc_id)
ORDER BY score DESC, doc_id ASC
LIMIT 10
""",
)
def q_late_interaction_search(spark, sf_dir):
    """ColBERT-style MaxSim late interaction at chunk granularity: three
    hashed query phrases, each scored against every 32-token chunk in
    one codegen'd projection; score(doc) = sum of per-phrase maxima.
    All dot products are exact small-integer sums (hashed counts), so
    the rounded cosines are bit-identical cross-engine; the final sum is
    a fixed-order 3-term expression, not a float aggregation."""
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.chunking import (
        chunk_documents,
    )
    from distributed_vector_database_spark.operators.fusion import (
        late_interaction_topk,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ch = chunk_documents(docs, chunk_tokens=32, overlap_tokens=8).select(
        (F.col("doc_id") * 65536 + F.col("chunk_ix")).alias("chunk_key"),
        "chunk_text",
    )
    units = hashing_embed(
        ch, dim=64, normalize=False, text_col="chunk_text",
        id_col="chunk_key",
    ).select(
        F.expr("chunk_key div 65536").alias("doc_id"), "embedding"
    )
    # phrase vectors computed driver-side: _hash_embed_py is the
    # proven-identical twin of hashing_embed(normalize=False), and the
    # phrases are literals — a 3-row Spark job bought nothing (guide §5)
    qvecs = [_hash_embed_py(" ".join(p)) for p in _LI_PHRASES]
    return late_interaction_topk(units, qvecs, k=10)


# ===========================================================================
# Count-based LM scoring + tokenizer training + boilerplate detection
# (operators/lm.py, operators/tokenizer.py, curation.boilerplate_*):
# the KenLM/CCNet-shaped perplexity filter, per-source distribution
# divergence, the distributed half of a BPE trainer, and source-scoped
# template detection.
# ===========================================================================

_BG_CTE = (
    _TOKS_CTE
    + """,
bgp AS (SELECT doc_id,
        unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
          AS bg
        FROM toks),
bg AS (SELECT doc_id, split_part(bg, ' ', 1) AS w1,
              split_part(bg, ' ', 2) AS w2 FROM bgp)"""
)


@register(
    "bigram_lm_ppl",
    f"""
WITH {_BG_CTE},
c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
v AS (SELECT count(DISTINCT x)::DOUBLE AS v
      FROM (SELECT unnest(t) AS x FROM toks)),
term AS (
  SELECT bg.doc_id,
         round(ln((c12.c12 + 1.0) / (c1.c1 + v.v)) * 1e6)::BIGINT AS mic
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(mic)::BIGINT AS m
        FROM term GROUP BY 1)
SELECT doc_id, n_bigrams,
       ((2 * (-m) + n_bigrams) // (2 * n_bigrams)) / 1e6 AS cross_entropy,
       ROUND(exp(((2 * (-m) + n_bigrams) // (2 * n_bigrams)) / 1e6), 6)
         AS ppl
FROM agg
""",
)
def q_bigram_lm_ppl(spark, sf_dir):
    """Per-doc cross-entropy/perplexity under the corpus's own add-1
    bigram LM (the CCNet-style perplexity quality filter). Per-bigram
    log-probs round to integer micros and sum exactly, so partial-agg
    order never moves the 6-decimal result."""
    from distributed_vector_database_spark.operators.lm import (
        doc_bigram_cross_entropy,
    )

    return doc_bigram_cross_entropy(
        _spread_read(spark, sf_dir, "documents"), alpha=1.0
    )


@register(
    "bigram_kn_ppl",
    f"""
WITH {_BG_CTE},
c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1p_fwd
       FROM c12 GROUP BY 1),
cont AS (SELECT w2, count(*)::BIGINT AS n1p_back FROM c12 GROUP BY 1),
s AS (SELECT ((SELECT count(*) FROM c12)
        + (SELECT count(DISTINCT x)
           FROM (SELECT unnest(t) AS x FROM toks)))::DOUBLE AS denom),
term AS (
  SELECT bg.doc_id,
         round(ln(
           (greatest(c12.c12 - 0.75, 0)
            + 0.75 * c1.n1p_fwd
              * ((cont.n1p_back + 1.0) / s.denom))
           / c1.c1) * 1e6)::BIGINT AS mic
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
          JOIN cont USING (w2), s),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(mic)::BIGINT AS m
        FROM term GROUP BY 1)
SELECT doc_id, n_bigrams,
       ((2 * (-m) + n_bigrams) // (2 * n_bigrams)) / 1e6 AS cross_entropy,
       ROUND(exp(((2 * (-m) + n_bigrams) // (2 * n_bigrams)) / 1e6), 6)
         AS ppl
FROM agg
""",
)
def q_bigram_kn_ppl(spark, sf_dir):
    """Per-doc cross-entropy/perplexity under an INTERPOLATED KNESER-NEY
    bigram LM (`lm.doc_bigram_kn_cross_entropy`, d=0.75, add-one
    continuation floor) — the smoothing KenLM/CCNet filters actually
    use, next to `bigram_lm_ppl`'s add-alpha rung; proven against an
    independent python reference in tests/test_lm_tokenizer.py. All
    counts exact integers; the c-0.75 differences are binary-exact;
    per-bigram log-probs round to integer micros and sum as longs, so
    the 6dp result survives any partial-agg order. Same plan family:
    |bigram-vocab| count tables, hash joins on the n-gram key, two
    literal scalars."""
    from distributed_vector_database_spark.operators.lm import (
        doc_bigram_kn_cross_entropy,
    )

    return doc_bigram_kn_cross_entropy(
        _spread_read(spark, sf_dir, "documents"), discount=0.75
    )


@register(
    "source_unigram_kl",
    """
WITH stoks AS (SELECT source,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
        FROM documents),
st AS (SELECT source, unnest(t) AS term FROM stoks),
g AS (SELECT source, term, count(*)::BIGINT AS c_sw FROM st GROUP BY 1, 2),
ns AS (SELECT source, sum(c_sw)::BIGINT AS n_s FROM g GROUP BY 1),
cw AS (SELECT term, sum(c_sw)::BIGINT AS c_w FROM g GROUP BY 1),
n AS (SELECT sum(len(t))::DOUBLE AS n FROM stoks),
tm AS (
  SELECT g.source, ns.n_s,
         round((g.c_sw / ns.n_s::DOUBLE)
               * ln((g.c_sw / ns.n_s::DOUBLE) / (cw.c_w / n.n))
               * 1e6)::BIGINT AS mic
  FROM g JOIN ns USING (source) JOIN cw USING (term), n)
SELECT source, n_s::BIGINT AS n_tokens, count(*)::BIGINT AS n_terms,
       ROUND(sum(mic)::BIGINT / 1e6, 6) AS kl_nats
FROM tm GROUP BY source, n_s
""",
)
def q_source_unigram_kl(spark, sf_dir):
    """Per-source KL divergence from the source's unigram distribution to
    the corpus distribution — the domain-similarity audit behind mixture
    weighting. Integer-micro term sums."""
    from distributed_vector_database_spark.operators.lm import (
        source_unigram_kl,
    )

    return source_unigram_kl(_spread_read(spark, sf_dir, "documents"))


@register(
    "bpe_pair_counts",
    f"""
WITH {_TOKS_CTE},
wf AS (SELECT x AS word, count(*)::BIGINT AS f
       FROM (SELECT unnest(t) AS x FROM toks) GROUP BY 1),
sy AS (SELECT f, list_append(string_split(word, ''), '</w>') AS s FROM wf),
pr AS (SELECT f,
       unnest(list_transform(range(1, len(s)), i -> s[i] || ' ' || s[i+1]))
         AS pair
       FROM sy)
SELECT pair, sum(f)::BIGINT AS n FROM pr GROUP BY 1
ORDER BY n DESC, pair ASC LIMIT 50
""",
)
def q_bpe_pair_counts(spark, sf_dir):
    """Top-50 adjacent-symbol pairs of BPE merge step 0 (chars + </w>,
    weighted by corpus word frequency) — the distributed half of the
    tokenizer trainer, driver-verifiable; the argmax row IS the first
    merge `tokenizer.train_bpe` learns."""
    from distributed_vector_database_spark.operators.tokenizer import (
        bpe_pair_counts,
    )

    return (
        bpe_pair_counts(_spread_read(spark, sf_dir, "documents"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(50)
    )


_BOILER_CTE = """
btoks AS (SELECT source, doc_id,
          list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
          FROM documents),
bsh AS (SELECT source, doc_id,
        unnest(list_distinct(CASE WHEN len(t) >= 2
          THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
          ELSE []::VARCHAR[] END)) AS shingle
        FROM btoks)"""


@register(
    "boilerplate_report",
    f"""
WITH {_BOILER_CTE}
SELECT source, shingle, count(DISTINCT doc_id)::BIGINT AS n_docs
FROM bsh GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 3
""",
)
def q_boilerplate_report(spark, sf_dir):
    """Source-scoped boilerplate dictionary: word bigrams recurring in
    >= 3 distinct docs of the SAME source (C4-style per-site template
    detection; bigrams because the sf corpora are short word-soup
    docs)."""
    from distributed_vector_database_spark.operators.curation import (
        boilerplate_shingles,
    )

    return boilerplate_shingles(
        _spread_read(spark, sf_dir, "documents"), ngram=2, min_docs=3
    )


@register(
    "doc_boilerplate_frac",
    f"""
WITH {_BOILER_CTE},
freq AS (SELECT source, shingle, count(DISTINCT doc_id)::BIGINT AS nd
         FROM bsh GROUP BY 1, 2)
SELECT doc_id, count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN nd >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
       ((2000000 * sum(CASE WHEN nd >= 3 THEN 1 ELSE 0 END)::BIGINT
          + count(*)) // (2 * count(*))) / 1e6 AS boiler_frac
FROM bsh JOIN freq USING (source, shingle)
GROUP BY doc_id
""",
)
def q_doc_boilerplate_frac(spark, sf_dir):
    """Per-doc fraction of its distinct bigram inventory that is
    source-level boilerplate — the drop/trim decision signal for
    template chrome."""
    from distributed_vector_database_spark.operators.curation import (
        doc_boilerplate_frac,
    )

    return doc_boilerplate_frac(
        _spread_read(spark, sf_dir, "documents"), ngram=2, min_docs=3
    )


# ===========================================================================
# IVF shard rebalancing (operators/ivf.shard_split_plan/split_hot_shards):
# widest-dimension midpoint split of overfull cells — deterministic,
# fully relational index maintenance (the reference's shard count is
# fixed at boot; a hot cell just grows).
# ===========================================================================


@register(
    "ivf_shard_rebalance",
    f"""
WITH {_ASSIGN_CTE},
cnt AS (SELECT shard_id, count(*)::BIGINT AS n FROM assign GROUP BY 1),
hot AS (SELECT shard_id FROM cnt
        WHERE n > (SELECT 1.05 * avg(n) FROM cnt)),
av AS (SELECT a.vec_id, a.shard_id, e.embedding::DOUBLE[] AS v
       FROM assign a JOIN embeddings e USING (vec_id)),
ex AS (SELECT shard_id, i, round(v[i] * 1e6)::BIGINT AS mic
       FROM (SELECT av.* FROM av JOIN hot USING (shard_id)) h,
            unnest(range(1, len(v) + 1)) AS u(i)),
ds AS (SELECT shard_id, i, min(mic) AS mn, max(mic) AS mx
       FROM ex GROUP BY 1, 2),
sp AS (SELECT shard_id, i AS split_dim, (mn + mx) / 2.0 AS mid,
              ROW_NUMBER() OVER (PARTITION BY shard_id
                                 ORDER BY (mx - mn) DESC, i ASC) AS rn
       FROM ds),
plan AS (SELECT shard_id, split_dim, mid,
                8 + ROW_NUMBER() OVER (ORDER BY shard_id) - 1 AS right_id
         FROM sp WHERE rn = 1)
SELECT av.vec_id,
       av.shard_id::BIGINT AS old_shard,
       (CASE WHEN plan.split_dim IS NULL
                  OR round(av.v[plan.split_dim] * 1e6)::BIGINT <= plan.mid
             THEN av.shard_id ELSE plan.right_id END)::BIGINT AS new_shard
FROM av LEFT JOIN plan USING (shard_id)
""",
)
def q_ivf_shard_rebalance(spark, sf_dir):
    """Every vector's (old_shard, new_shard) after splitting shards more
    than 5% over the mean occupancy on their widest dimension's
    midpoint (a relative cap, so real splits happen at every scale
    factor). Split arithmetic is exact integer micros (min/max only —
    no float aggregation), so the iterative-maintenance step is
    driver-verifiable value-for-value."""
    from distributed_vector_database_spark.operators.ivf import (
        shard_split_plan,
        split_hot_shards,
    )

    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    # three consumers (cap scalar, split plan, rewrite) — cache so the
    # centroid-argmin assignment runs once, not three times (round 13)
    assigned = assign_shards(emb, cents).cache()
    counts = [
        r["n"]
        for r in assigned.groupBy("shard_id")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    cap = 1.05 * (sum(counts) / len(counts))
    plan = shard_split_plan(assigned, cap=cap, next_shard_id=len(cents))
    return split_hot_shards(assigned, plan)


# ===========================================================================
# Bucket-owner LSH dedup, batch + streaming (dedup.minhash_bucket_dup_flags,
# streaming/docs.stream_minhash_dedup): the order-free greedy keep-lowest-id
# rule, decidable incrementally against an append-only owner index.
# ===========================================================================


def _minhash_flags_sql(num_hashes: int = 8, bands: int = 2) -> str:
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5("
        + " || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_ix, band{b} AS bv FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sig),
st AS ({stacked}),
own AS (SELECT band_ix, bv, min(doc_id) AS owner FROM st GROUP BY 1, 2)
SELECT st.doc_id, count(*)::BIGINT AS n_bands,
       sum(CASE WHEN own.owner < st.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_dup_bands,
       (sum(CASE WHEN own.owner < st.doc_id THEN 1 ELSE 0 END) > 0)
         AS is_dup
FROM st JOIN own USING (band_ix, bv)
GROUP BY st.doc_id
"""


@register("minhash_dedup_flags", _minhash_flags_sql())
def q_minhash_dedup_flags(spark, sf_dir):
    """Per-doc LSH dedup decision without pair mining: every band bucket
    is owned by its lowest doc id; any band owned elsewhere flags the
    doc. One min-agg + one join on the uniform band key — no pair
    fan-out."""
    return _dd.minhash_bucket_dup_flags(
        _spread_read(spark, sf_dir, "documents"), num_hashes=8, bands=2
    )


_MINHASH_STREAM_CACHE: dict[str, str] = {}
# sf_dir -> completed ingest state dir. A live pipeline ingests ONCE and
# serves reads from the maintained state; re-running the micro-batch replay
# for every read would be the harness measuring itself (VERDICT r2 item 6).
# First call per process pays the full replay; later calls (bench timed
# runs) query the same state through the merge-on-read view and return
# identical rows by construction (the state is deterministic for the
# ordered 2-chunk arrival).
_MINHASH_STATE_CACHE: dict[str, str] = {}
_LM_STATE_CACHE: dict[str, str] = {}


@register("stream_minhash_dedup_flags", _minhash_flags_sql())
def q_stream_minhash_dedup_flags(spark, sf_dir):
    """The SAME dedup contract computed incrementally: documents arrive
    id-ordered in two micro-batches; each batch is flagged against the
    append-only bucket-owner index built from prior batches. The replay's
    accumulated decisions must equal the batch/SQL form on the full
    corpus — cross-batch near-dup state proven, not just exact-key dedup
    (`stream_dedup_counts`)."""
    import tempfile

    from distributed_vector_database_spark.streaming.docs import (
        read_dedup_flags,
        read_document_stream,
        stream_minhash_dedup,
    )

    state = _MINHASH_STATE_CACHE.get(sf_dir)
    if state is not None:
        out = read_dedup_flags(spark, state)
    else:
        d = _ordered_two_chunk_replay_dir(spark, sf_dir)
        state = tempfile.mkdtemp(prefix="dvdb_mhstate_")
        out = stream_minhash_dedup(
            read_document_stream(spark, d, max_files_per_trigger=1),
            state,
            num_hashes=8,
            bands=2,
        )
        _MINHASH_STATE_CACHE[sf_dir] = state
    return out.select("doc_id", "n_bands", "n_dup_bands", "is_dup")


def _ordered_two_chunk_replay_dir(spark, sf_dir) -> str:
    """Documents split into two parquet chunks with strictly increasing
    mtimes (the file stream replays oldest-first, so arrival is
    doc_id-ordered). Built once per (process, sf_dir)."""
    import os
    import tempfile
    import time

    d = _MINHASH_STREAM_CACHE.get(sf_dir)
    if d is not None:
        return d
    docs = _read(spark, sf_dir, "documents")
    mid = docs.agg(F.max("doc_id")).head()[0] // 2
    d = tempfile.mkdtemp(prefix="dvdb_mhstream_")
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    first = {f for f in os.listdir(d) if f.endswith(".parquet")}
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    now = time.time()
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            ts = now if f in first else now + 10
            os.utime(os.path.join(d, f), (ts, ts))
    _MINHASH_STREAM_CACHE[sf_dir] = d
    return d


# ===========================================================================
# Diversified retrieval, sliding windows, corpus card: per-group result
# caps on a global top-k, overlapping time windows (the streaming-window
# shape in batch form), and the one-row dataset audit.
# ===========================================================================


@register(
    "diversified_topk",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
s AS (SELECT e.vec_id, e.label,
             ROUND({_cos(E, 'q.qv')}, 6) AS score,
             row_number() OVER (PARTITION BY e.label
                                ORDER BY ROUND({_cos(E, 'q.qv')}, 6) DESC,
                                         e.vec_id ASC) AS rnk
      FROM embeddings e, q)
SELECT vec_id, label, score
FROM s WHERE rnk <= 2
ORDER BY score DESC, vec_id ASC LIMIT 10
""",
)
def q_diversified_topk(spark, sf_dir):
    """Diversified search: global top-10 subject to AT MOST 2 results per
    label — the per-source result cap every production retrieval API
    exposes. One scored scan; the label cap is a rank window over the
    scored rows; the global cut is TakeOrderedAndProject. No re-scan per
    label, no post-hoc driver filtering."""
    from distributed_vector_database_spark.functions.vector import (
        cosine_similarity,
    )
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    scored = emb.select(
        "vec_id",
        "label",
        round_score(
            cosine_similarity(F.col("embedding"), F.lit(qv)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= 2)
        .drop("_rnk")
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "sliding_window_counts",
    """
WITH w AS (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         event_type, value
  FROM events)
SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
       event_type, count(*)::BIGINT AS n_events,
       sum(round(value * 100))::BIGINT AS value_cents
FROM w GROUP BY 1, 2, 3
""",
)
def q_sliding_window_counts(spark, sf_dir):
    """Overlapping 2-hour windows sliding by 1 hour: every event lands in
    two windows (Spark's window(size, slide) generates both copies
    JVM-side). The same definition is streaming-capable — this is the
    batch form of the classic sliding-window aggregation. Money sums in
    exact integer cents."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


@register(
    "corpus_card",
    f"""
WITH {_TOKS_CTE},
tok AS (SELECT sum(len(t))::BIGINT AS n_tokens,
               count(*)::BIGINT AS n_docs FROM toks),
voc AS (SELECT count(DISTINCT x)::BIGINT AS vocab
        FROM (SELECT unnest(t) AS x FROM toks)),
dup AS (SELECT (count(*) - count(DISTINCT
                 md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               ))::BIGINT AS n_exact_dups
        FROM documents),
lng AS (SELECT lang AS top_lang FROM documents
        GROUP BY lang ORDER BY count(*) DESC, lang ASC LIMIT 1)
SELECT tok.n_docs, tok.n_tokens, voc.vocab, dup.n_exact_dups, lng.top_lang,
       ROUND(tok.n_tokens / tok.n_docs::DOUBLE, 6) AS mean_doc_tokens
FROM tok, voc, dup, lng
""",
)
def q_corpus_card(spark, sf_dir):
    """One-row dataset card: corpus size, token count, vocabulary size,
    exact-duplicate count, dominant language, mean doc length — the
    audit header of a dataset datasheet. Four independent aggregates
    cross-joined as single-row literals (each a one-pass partial agg; at
    100 TB these four jobs share the same cached scan)."""
    from distributed_vector_database_spark.functions.text import (
        doc_fingerprint,
        tokens,
    )

    docs = _read(spark, sf_dir, "documents")
    tok = docs.agg(
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
        F.count("*").alias("n_docs"),
    )
    voc = docs.select(F.explode(tokens("text")).alias("x")).agg(
        F.countDistinct("x").alias("vocab")
    )
    dup = docs.agg(
        (F.count("*") - F.countDistinct(doc_fingerprint("text"))).alias(
            "n_exact_dups"
        )
    )
    lng = (
        docs.groupBy("lang")
        .count()
        .orderBy(F.desc("count"), F.asc("lang"))
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    return (
        tok.crossJoin(voc)
        .crossJoin(dup)
        .crossJoin(lng)
        .select(
            "n_docs",
            "n_tokens",
            "vocab",
            "n_exact_dups",
            "top_lang",
            F.round(
                F.col("n_tokens") / F.col("n_docs").cast("double"), 6
            ).alias("mean_doc_tokens"),
        )
    )


# ===========================================================================
# Reference-format SQLite shard store (sources/sqlite_store.py, Spark 4
# Python DataSource): the migration connector — read the reference's
# data/shard_{i}.sqlite3 files shard-parallel, with id-filter pushdown
# into the SQLite primary-key B-tree. The store is built once per sf_dir
# from embeddings.parquet (the same deterministic 8-shard assignment the
# IVF queries use), so the oracle runs on the parquet ground truth.
# ===========================================================================

_SQLITE_STORE_CACHE: dict[str, str] = {}


def _sqlite_store_dir(spark, sf_dir: str) -> str:
    d = _SQLITE_STORE_CACHE.get(sf_dir)
    if d is None:
        import tempfile

        from distributed_vector_database_spark.sources.sqlite_store import (
            write_shards,
        )

        emb = _read(spark, sf_dir, "embeddings")
        cents = _fixed_centroids(spark, sf_dir)
        assigned = assign_shards(emb, cents).select(
            F.col("vec_id").cast("string").alias("id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("shard_id").cast("int").alias("shard_id"),
        )
        d = tempfile.mkdtemp(prefix="dvdb_sqlitestore_")
        write_shards(assigned, d)
        _SQLITE_STORE_CACHE[sf_dir] = d
    return d


@register(
    "sqlite_store_scan",
    f"""
WITH {_ASSIGN_CTE}
SELECT a.vec_id, a.shard_id::BIGINT AS shard_id,
       len(e.embedding)::BIGINT AS dim,
       ROUND({_norm(E)}, 6) AS norm
FROM assign a JOIN embeddings e USING (vec_id)
""",
)
def q_sqlite_store_scan(spark, sf_dir):
    """Full scan of a reference-format SQLite shard store (one input
    partition per shard file): every vector back with its shard, dim and
    norm. Proves a reference user's existing data/ directory is readable
    in place, values intact."""
    from distributed_vector_database_spark.sources.sqlite_store import (
        read_shards,
    )
    from distributed_vector_database_spark.functions.vector import l2_norm

    d = _sqlite_store_dir(spark, sf_dir)
    return read_shards(spark, d).select(
        F.col("id").cast("long").alias("vec_id"),
        F.col("shard_id").cast("long").alias("shard_id"),
        F.size("embedding").cast("long").alias("dim"),
        round_score(l2_norm("embedding")).alias("norm"),
    )


@register(
    "sqlite_store_point_lookup",
    f"""
WITH {_ASSIGN_CTE}
SELECT a.vec_id, a.shard_id::BIGINT AS shard_id,
       ROUND({_norm(E)}, 6) AS norm
FROM assign a JOIN embeddings e USING (vec_id)
WHERE a.vec_id = 100
""",
)
def q_sqlite_store_point_lookup(spark, sf_dir):
    """GET /get against the SQLite store through Spark: the id equality
    predicate is PUSHED into each shard's primary-key B-tree
    (DataSourceReader.pushFilters -> WHERE id IN (...)), so no shard is
    table-scanned — the reference's point-lookup path
    (`reference: src/storage_server.py:53-60`), shard-parallel."""
    from distributed_vector_database_spark.sources.sqlite_store import (
        read_shards,
    )
    from distributed_vector_database_spark.functions.vector import l2_norm

    d = _sqlite_store_dir(spark, sf_dir)
    return (
        read_shards(spark, d)
        .filter(F.col("id") == "100")
        .select(
            F.col("id").cast("long").alias("vec_id"),
            F.col("shard_id").cast("long").alias("shard_id"),
            round_score(l2_norm("embedding")).alias("norm"),
        )
    )


# ===========================================================================
# Spark 4 semi-structured + iterative SQL surface: VariantType JSON
# (parse once, binary-encoded, typed extraction — the modern
# get_json_object replacement) and native WITH RECURSIVE (depth-bounded
# graph walk entirely inside the SQL engine, no driver loop).
# ===========================================================================


@register(
    "variant_props_rollup",
    """
WITH p AS (SELECT event_type,
                  TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                           AS BIGINT) AS k
           FROM events WHERE props IS NOT NULL)
SELECT event_type, count(*)::BIGINT AS n_with_props,
       sum(k)::BIGINT AS sum_k, max(k)::BIGINT AS max_k
FROM p GROUP BY 1
""",
)
def q_variant_props_rollup(spark, sf_dir):
    """Typed rollup over the JSON props column through VariantType:
    ``parse_json`` once into the binary variant encoding, then
    ``try_variant_get`` typed paths — one parse per row regardless of
    how many fields downstream extracts touch (``get_json_object``
    re-parses per field). The oracle extracts the same values by regex,
    so the variant path is value-verified."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").isNotNull())
        .select(
            "event_type",
            F.try_variant_get(
                F.parse_json("props"), "$.k", "long"
            ).alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_with_props"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "knn_two_hop_reach",
    f"""
WITH RECURSIVE
s AS (SELECT a.vec_id AS query_id, e.vec_id AS vec_id,
             ROUND({_cos(_A, E)}, 6) AS score
      FROM embeddings a JOIN embeddings e
        ON a.vec_id <> e.vec_id AND a.vec_id < 200 AND e.vec_id < 200),
knn AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, vec_id ASC) AS rnk
          FROM s) t
        WHERE rnk <= 3),
reach(node, hops) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
  UNION ALL
  SELECT e.vec_id AS node, r.hops + 1 AS hops
  FROM reach r JOIN knn e ON e.query_id = r.node
  WHERE r.hops < 2)
SELECT node, min(hops)::BIGINT AS hops FROM reach GROUP BY node
""",
)
def q_knn_two_hop_reach(spark, sf_dir):
    """Nodes within 2 hops of vector 0 in the exact 3-NN graph, with
    their minimum hop count — a depth-bounded graph walk run by Spark's
    NATIVE recursive CTE (WITH RECURSIVE ... UNION ALL, new in Spark 4),
    not a driver loop: the fixpoint executes as a UnionLoop operator
    inside the engine, same as the DuckDB oracle's recursion. The edge
    frame underneath is the distributed Arrow-GEMM kNN kernel."""
    from distributed_vector_database_spark.operators.ann import knn_graph

    emb = _read(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    # materialize the GEMM-derived edge frame once — every UnionLoop
    # round joins the view, and the recursion would otherwise re-run the
    # kNN kernel per hop
    edges = (
        knn_graph(_spread(emb), k=3)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    edges.createOrReplaceTempView("knn_edges_2hop")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hops) AS (
          SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
          UNION ALL
          SELECT e.vec_id AS node, r.hops + 1 AS hops
          FROM reach r JOIN knn_edges_2hop e ON e.query_id = r.node
          WHERE r.hops < 2)
        SELECT node, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY node
        """
    )


# ===========================================================================
# Product analytics (operators/analytics.py): EWMA, exact-variance
# z-score outliers, strict-order conversion funnel, retention cohorts.
# ===========================================================================


@register(
    "user_value_ewma",
    """
WITH o AS (SELECT user_id, list(value ORDER BY ts, event_id) AS v,
                  count(*)::BIGINT AS n_events
           FROM events GROUP BY user_id)
SELECT user_id, n_events,
       ROUND(list_reduce(v, (s, x) -> 0.5 * x + 0.5 * s), 6) AS ewma
FROM o
""",
)
def q_user_value_ewma(spark, sf_dir):
    """Per-user EWMA (alpha=0.5) of event values in time order — a LEFT
    FOLD seeded with the first element, the exact op sequence DuckDB's
    list_reduce runs, so the compounding float is bit-equal cross-engine
    with no per-step rounding."""
    from distributed_vector_database_spark.operators.analytics import (
        user_value_ewma,
    )

    return user_value_ewma(_read(spark, sf_dir, "events"), alpha=0.5)


@register(
    "event_zscore_outliers",
    """
WITH c AS (SELECT event_id, event_type, value,
                  round(value * 100)::BIGINT AS c FROM events),
st AS (SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
              sum(c * c)::BIGINT AS s2
       FROM c GROUP BY 1),
z AS (SELECT c.event_id, c.event_type, c.value,
             ROUND((c.c - s1 / n::DOUBLE)
                   / sqrt(s2 / n::DOUBLE
                          - (s1 / n::DOUBLE) * (s1 / n::DOUBLE)), 6) AS z
      FROM c JOIN st USING (event_type))
SELECT event_id, event_type, value, z FROM z WHERE abs(z) > 3.0
""",
)
def q_event_zscore_outliers(spark, sf_dir):
    """Events more than 3 sigma from their type's mean. Per-type stats
    come from exact int64 cents sums (n, sum, sum-of-squares), so
    float-agg order can never move a z across the cut; the |type|-row
    stats frame broadcasts back onto the stream."""
    from distributed_vector_database_spark.operators.analytics import (
        zscore_outliers,
    )

    return zscore_outliers(_read(spark, sf_dir, "events"), threshold=3.0)


@register(
    "conversion_funnel",
    """
WITH a AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN a USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN b USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY 1)
SELECT (SELECT count(*) FROM a)::BIGINT AS n_stage1,
       (SELECT count(*) FROM b)::BIGINT AS n_stage2,
       (SELECT count(*) FROM c)::BIGINT AS n_stage3
""",
)
def q_conversion_funnel(spark, sf_dir):
    """Strict-order view -> click -> purchase funnel: users with a
    click strictly after their first view, then a purchase strictly
    after that first qualifying click. Three cascaded min-after
    aggregations, each pre-filtered to one event type before any
    shuffle."""
    from distributed_vector_database_spark.operators.analytics import (
        conversion_funnel,
    )

    return conversion_funnel(_read(spark, sf_dir, "events"))


@register(
    "retention_cohorts",
    """
WITH f AS (SELECT user_id, min(ts)::DATE AS cohort_day
           FROM events GROUP BY 1),
act AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       date_diff('day', f.cohort_day, act.day)::BIGINT AS day_offset,
       count(DISTINCT act.user_id)::BIGINT AS n_users
FROM act JOIN f USING (user_id)
GROUP BY 1, 2
""",
)
def q_retention_cohorts(spark, sf_dir):
    """Retention triangle: users bucketed by first-seen day, counted per
    distinct activity-day offset — the cohort-retention table every
    product dashboard draws."""
    from distributed_vector_database_spark.operators.analytics import (
        retention_cohorts,
    )

    out = retention_cohorts(_read(spark, sf_dir, "events"))
    # dates serialize differently across engines (pandas Timestamp vs
    # datetime.date) — emit the ISO string both sides
    return out.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_users",
    )


# ===========================================================================
# Parquet footer aggregates (sources/stats.footer_stats): MIN/MAX/COUNT
# pushed into the V2 BatchScan — a metadata-only job, zero row groups
# decoded (the engine-side twin of the manual stats-skipping surface).
# ===========================================================================


@register(
    "footer_minmax_stats",
    """
SELECT min(l_orderkey)::BIGINT AS min_l_orderkey,
       max(l_orderkey)::BIGINT AS max_l_orderkey,
       ROUND(min(l_quantity), 6) AS min_l_quantity,
       ROUND(max(l_quantity), 6) AS max_l_quantity,
       count(*)::BIGINT AS cnt
FROM lineitem
""",
)
def q_footer_minmax_stats(spark, sf_dir):
    """Dataset id-range / row-count audit answered from parquet FOOTERS:
    the V2 scan's PushedAggregation evaluates MIN/MAX/COUNT from file
    metadata without decoding a single row group (plan-asserted in
    tests). The confs enabling the V2 path are scoped to this call."""
    from distributed_vector_database_spark.sources.stats import footer_stats

    row, _plan = footer_stats(
        spark,
        f"{sf_dir}/lineitem.parquet",
        ["l_orderkey", "l_quantity"],
    )
    return spark.createDataFrame([row]).select(
        F.col("min_l_orderkey").cast("long"),
        F.col("max_l_orderkey").cast("long"),
        F.round("min_l_quantity", 6).alias("min_l_quantity"),
        F.round("max_l_quantity", 6).alias("max_l_quantity"),
        F.col("cnt").cast("long"),
    )


# ===========================================================================
# Dynamic partition pruning over the IVF layout: the probed-shard set is
# decided by a FILTER ON ANOTHER TABLE at runtime, not a literal — the
# optimizer injects a dynamicpruning subquery into the fact scan's
# PartitionFilters, so only qualifying shard directories are read even
# though no shard ids appear in the query text (plan-asserted in
# tests/test_dpp.py). Static pruning (`ivf_search_pruned`) covers the
# literal-IN case; THIS is the data-driven case.
# ===========================================================================

_DPP_CACHE: dict[str, str] = {}


def _dpp_layout_dir(spark, sf_dir: str) -> str:
    d = _DPP_CACHE.get(sf_dir)
    if d is None:
        import tempfile

        emb = _read(spark, sf_dir, "embeddings")
        cents = _fixed_centroids(spark, sf_dir)
        assigned = assign_shards(emb, cents)
        d = tempfile.mkdtemp(prefix="dvdb_dpp_")
        assigned.write.partitionBy("shard_id").parquet(f"{d}/fact")
        assigned.groupBy("shard_id").agg(
            F.count("*").alias("n_vecs")
        ).write.parquet(f"{d}/shard_stats")
        _DPP_CACHE[sf_dir] = d
    return d


@register(
    "dpp_hot_shard_scan",
    f"""
WITH {_ASSIGN_CTE},
cnt AS (SELECT shard_id, count(*)::BIGINT AS n FROM assign GROUP BY 1),
sel AS (SELECT shard_id FROM cnt WHERE n > (SELECT 1.05 * avg(n) FROM cnt))
SELECT a.shard_id::BIGINT AS shard_id, count(*)::BIGINT AS n_vectors,
       sum(round({_norm(E)} * 1e6))::BIGINT AS norm_mic_sum
FROM assign a JOIN embeddings e USING (vec_id) JOIN sel USING (shard_id)
GROUP BY 1
""",
)
def q_dpp_hot_shard_scan(spark, sf_dir):
    """Scan ONLY the overfull shards of the partitioned layout, where
    'overfull' is read from a stats table at runtime: the join against
    the filtered shard_stats side becomes a dynamicpruning subquery in
    the fact scan's PartitionFilters — directory-level skipping with no
    shard id literal anywhere. Norm mass sums in exact integer micros."""
    from distributed_vector_database_spark.functions.vector import l2_norm

    d = _dpp_layout_dir(spark, sf_dir)
    fact = spark.read.parquet(f"{d}/fact")
    stats = spark.read.parquet(f"{d}/shard_stats")
    thr = 1.05 * stats.agg(F.avg("n_vecs")).head()[0]
    hot = stats.filter(F.col("n_vecs") > thr).select("shard_id")
    return (
        fact.join(hot, "shard_id")
        .groupBy(F.col("shard_id").cast("long").alias("shard_id"))
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(
                F.round(l2_norm("embedding") * F.lit(1e6)).cast("long")
            ).alias("norm_mic_sum"),
        )
    )


# ===========================================================================
# Runtime bloom-filter join: the non-partition-column twin of DPP — the
# optimizer builds a bloom filter over the selective side's join keys
# at runtime and injects might_contain(...) into the big side's scan
# filter, shrinking the shuffle before the join. Plan-asserted in
# tests/test_bloom_join.py.
# ===========================================================================

_BLOOM_CONFS = (
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.autoBroadcastJoinThreshold",
)


def _bloom_joined(spark, sf_dir):
    """Urgent-order revenue by return flag with the runtime bloom filter
    active: lineitem's scan carries might_contain(bloom(o_orderkey)), so
    non-urgent orderkeys drop BEFORE the join shuffle."""
    li = _read(spark, sf_dir, "lineitem")
    urgent = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("price_cents"),
        )
    )


@register(
    "runtime_bloom_join",
    """
SELECT l.l_returnflag, count(*)::BIGINT AS n_items,
       sum(round(l.l_extendedprice * 100))::BIGINT AS price_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
""",
)
def q_runtime_bloom_join(spark, sf_dir):
    """The bloom-filter confs are scoped to this call (execution is
    forced inside the scope — plan decisions happen at run time); the
    materialized 3-row aggregate is returned. The semijoin-reduction
    value is measured against 100 TB shapes: the fact side sheds
    non-matching keys at the scan instead of shuffling them."""
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        spark.conf.set(_BLOOM_CONFS[0], "true")
        spark.conf.set(_BLOOM_CONFS[1], "0")
        spark.conf.set(_BLOOM_CONFS[2], "-1")  # shuffle join -> filter applies
        out = _bloom_joined(spark, sf_dir)
        rows = out.collect()
        schema = out.schema
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(rows, schema)


# ===========================================================================
# Streaming sliding windows: the overlapping-window aggregation replayed
# through micro-batches must equal the batch form (`sliding_window_counts`
# proves the batch values; THIS proves the streaming state handles an
# event belonging to TWO windows across batch boundaries).
# ===========================================================================


@register(
    "stream_sliding_counts",
    """
WITH w AS (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         event_type, value
  FROM events)
SELECT window_start, event_type, count(*)::BIGINT AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_value
FROM w GROUP BY 1, 2
""",
)
def q_stream_sliding_counts(spark, sf_dir):
    import tempfile

    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        run_stream_to_batch,
        tumbling_counts,
    )

    d = _STREAM_INPUT_CACHE.get(f"{sf_dir}#full")
    if d is None:
        src = _read(spark, sf_dir, "events")
        d = tempfile.mkdtemp(prefix="dvdb_streamfull_")
        src.repartition(4).write.mode("overwrite").parquet(d)
        _STREAM_INPUT_CACHE[f"{sf_dir}#full"] = d
    stream = read_event_stream(spark, d, max_files_per_trigger=2)
    out = run_stream_to_batch(
        tumbling_counts(
            stream, window="2 hours", slide="1 hour", watermark=None
        ),
        final_keys=["window_start", "window_end", "event_type"],
        latest_by="n_events",
        shuffle_partitions=8,
    )
    return out.select("window_start", "event_type", "n_events", "sum_value")


# ===========================================================================
# Entity resolution / record linkage (operators/er.py): sorted-
# neighborhood blocking and edit-distance-verified fuzzy pairs — the
# third blocking family next to hash and LSH blocking.
# ===========================================================================

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "snm_candidate_pairs",
    f"""
WITH b AS (SELECT doc_id, substr({_NORM_SQL}, 1, 20) AS k FROM documents),
s AS (SELECT doc_id, k,
             lead(doc_id, 1) OVER (ORDER BY k, doc_id) AS id1,
             lead(k, 1) OVER (ORDER BY k, doc_id) AS k1,
             lead(doc_id, 2) OVER (ORDER BY k, doc_id) AS id2,
             lead(k, 2) OVER (ORDER BY k, doc_id) AS k2
      FROM b)
SELECT doc_id AS id_a, id1 AS id_b, k AS key_a, k1 AS key_b
FROM s WHERE id1 IS NOT NULL
UNION ALL
SELECT doc_id, id2, k, k2 FROM s WHERE id2 IS NOT NULL
""",
)
def q_snm_candidate_pairs(spark, sf_dir):
    """Sorted-neighborhood candidate pairs (Hernandez & Stolfo, SIGMOD
    1995): sort by the normalized 20-char text prefix, pair each record
    with its next 2 neighbors — O(n·w) candidates from one sort + one
    lead window, no pairwise join anywhere."""
    from distributed_vector_database_spark.operators.er import (
        sorted_neighborhood_pairs,
    )
    from distributed_vector_database_spark.functions.text import (
        normalize_ws,
    )

    docs = _read(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        docs, F.substring(normalize_ws("text"), 1, 20), window=3
    )


@register(
    "fuzzy_dup_pairs",
    f"""
WITH nb AS (SELECT doc_id, source AS blk,
                   substr({_NORM_SQL}, 1, 40) AS p,
                   floor(length({_NORM_SQL}) / 8)::BIGINT AS band
            FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.p, b.p)::BIGINT AS edit_distance
FROM nb a JOIN nb b
  ON a.blk = b.blk AND a.band = b.band AND a.doc_id < b.doc_id
WHERE levenshtein(a.p, b.p) <= 10
""",
)
def q_fuzzy_dup_pairs(spark, sf_dir):
    """Blocked fuzzy duplicates: same source + same length band, then
    Levenshtein <= 10 on the normalized 40-char prefix — the classic
    block-then-verify record-linkage topology with the edit-distance
    verifier confined to in-block candidates."""
    from distributed_vector_database_spark.operators.er import (
        fuzzy_dup_pairs,
    )

    return fuzzy_dup_pairs(
        _read(spark, sf_dir, "documents"),
        prefix_chars=40,
        max_edits=10,
        length_band=8,
    )


# ===========================================================================
# LATERAL correlated subquery: per-row top-N — the remaining relational
# surface item next to INTERSECT/EXCEPT/scalar/EXISTS subqueries. Spark
# plans the correlated limit as a partitioned rank, so it decorrelates
# to the same window plan `top-k per group` uses — but the USER-FACING
# form is the SQL-standard LATERAL.
# ===========================================================================


@register(
    "lateral_top_orders",
    """
SELECT c.c_custkey, t.o_orderkey, t.price_cents
FROM customer c, LATERAL (
  SELECT o_orderkey, round(o_totalprice * 100)::BIGINT AS price_cents
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY round(o_totalprice * 100)::BIGINT DESC, o_orderkey ASC
  LIMIT 2
) t
WHERE c.c_custkey < 50
""",
)
def q_lateral_top_orders(spark, sf_dir):
    """Each of the first 50 customers' top-2 orders by price via a
    LATERAL correlated subquery with ORDER BY + LIMIT — identical SQL
    text on both engines (prices ordered in exact integer cents so the
    LIMIT boundary ties identically)."""
    _read(spark, sf_dir, "customer").createOrReplaceTempView("lat_c")
    _read(spark, sf_dir, "orders").createOrReplaceTempView("lat_o")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.price_cents
        FROM lat_c c, LATERAL (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM lat_o o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                   o_orderkey ASC
          LIMIT 2
        ) t
        WHERE c.c_custkey < 50
        """
    )


# ===========================================================================
# Data-quality expectations (operators/quality.py): rule-based checks
# with quarantine — the per-batch guardrail of an ingestion pipeline.
# Rules here: value <= 100 (business range), event_type != 'error'
# (malformed records), props present.
# ===========================================================================


def _dq_rules():
    return {
        "value_le_100": F.col("value") <= 100.0,
        "no_error_type": F.col("event_type") != "error",
        "props_present": F.col("props").isNotNull(),
    }


@register(
    "dq_violations_report",
    """
SELECT rule, n_violations, n_rows,
       ROUND(n_violations / n_rows::DOUBLE, 6) AS violation_rate
FROM (
  SELECT unnest([
    struct_pack(rule := 'value_le_100',
                n_violations := count(*) FILTER (NOT coalesce(value <= 100.0, FALSE))::BIGINT),
    struct_pack(rule := 'no_error_type',
                n_violations := count(*) FILTER (NOT coalesce(event_type <> 'error', FALSE))::BIGINT),
    struct_pack(rule := 'props_present',
                n_violations := count(*) FILTER (props IS NULL)::BIGINT)
  ], recursive := true) , count(*)::BIGINT AS n_rows
  FROM events)
""",
)
def q_dq_violations_report(spark, sf_dir):
    """Per-rule violation counts in ONE pass (conditional aggregates, no
    per-rule scans): the expectations summary a pipeline logs per
    ingested batch. NULL rule results count as violations."""
    from distributed_vector_database_spark.operators.quality import (
        expectations_report,
    )

    return expectations_report(_read(spark, sf_dir, "events"), _dq_rules())


@register(
    "dq_quarantined_events",
    """
SELECT event_id,
       array_to_string(list_filter([
         CASE WHEN NOT coalesce(value <= 100.0, FALSE)
              THEN 'value_le_100' END,
         CASE WHEN NOT coalesce(event_type <> 'error', FALSE)
              THEN 'no_error_type' END,
         CASE WHEN props IS NULL THEN 'props_present' END
       ], x -> x IS NOT NULL), ',') AS violations
FROM events
WHERE NOT coalesce(value <= 100.0, FALSE)
   OR NOT coalesce(event_type <> 'error', FALSE)
   OR props IS NULL
""",
)
def q_dq_quarantined_events(spark, sf_dir):
    """The quarantine side of the expectations split: every failing
    event with the ordered list of rules it violated — the reviewable
    reject stream, while the valid side flows on with its original
    schema.

    The library API (`apply_expectations`) keeps `violations` as an
    ARRAY<STRING>; this driver row flattens it to a comma-joined string
    on BOTH sides because the round driver's canonicalizer sorts raw
    pandas cells and cannot hash/sort list values (r3/r4 red row)."""
    from distributed_vector_database_spark.operators.quality import (
        apply_expectations,
    )

    _valid, bad = apply_expectations(
        _read(spark, sf_dir, "events"), _dq_rules()
    )
    return bad.select(
        "event_id", F.array_join("violations", ",").alias("violations")
    )


# ===========================================================================
# Streaming LM maintenance (streaming/docs.stream_bigram_counts): the
# perplexity-filter LM's count tables maintained incrementally from a
# document stream — batch partials appended per micro-batch, summed at
# read (merge-on-read). Counts are associative, so stream-built ==
# batch-built for ANY chunking; oracle = the batch bigram CTE.
# ===========================================================================


@register(
    "stream_bigram_lm_counts",
    f"""
WITH {_BG_CTE}
SELECT w1, w2, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2
ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 50
""",
)
def q_stream_bigram_lm_counts(spark, sf_dir):
    """Top-50 bigram counts from the STREAM-maintained LM state after a
    two-micro-batch replay — must equal the batch fit exactly (count
    partials are associative; the merge-on-read sum closes them). Ingest
    runs once per process; repeat calls query the maintained state
    (see _LM_STATE_CACHE note above — a live LM is read, not re-fit)."""
    import tempfile

    from distributed_vector_database_spark.streaming.docs import (
        read_bigram_counts,
        read_document_stream,
        stream_bigram_counts,
    )

    state = _LM_STATE_CACHE.get(sf_dir)
    if state is not None:
        merged = read_bigram_counts(spark, state)
    else:
        d = _ordered_two_chunk_replay_dir(spark, sf_dir)
        state = tempfile.mkdtemp(prefix="dvdb_lmstate_")
        merged = stream_bigram_counts(
            read_document_stream(spark, d, max_files_per_trigger=1), state
        )
        _LM_STATE_CACHE[sf_dir] = state
    return merged.orderBy(
        F.desc("n"), F.asc("w1"), F.asc("w2")
    ).limit(50)


# ===========================================================================
# IVF recall-vs-nprobe tuning curve as a DRIVER-CHECKED artifact
# (operators/eval.ivf_recall_curve_df): the accuracy/latency trade the
# reference's latency-only benchmarks never quantify (reference: report
# p.2 discusses recall loss at shards_to_search=1 without measuring it).
# mean_recall = total_hits / (k * |Q|) — an exact integer ratio, so the
# row is bit-identical cross-engine.
# ===========================================================================


@register(
    "ivf_recall_curve",
    f"""
WITH {_ASSIGN_CTE},
qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id IN (0, 25, 50, 75, 100)),
probe AS (
  SELECT qs.query_id, c.shard_id,
         ROW_NUMBER() OVER (PARTITION BY qs.query_id
                            ORDER BY list_distance(c.cv, qs.qv) ASC,
                                     c.shard_id ASC) AS pr
  FROM qs, c),
scored AS (
  SELECT qs.query_id, e.vec_id, a.shard_id,
         ROUND({_cos(E, 'qs.qv')}, 6) AS score
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, qs),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, vec_id ASC) AS rk
    FROM scored) t
  WHERE rk <= 10),
np AS (SELECT * FROM (VALUES (1), (2), (4), (8)) t(nprobe)),
approx AS (
  SELECT nprobe, query_id, vec_id FROM (
    SELECT np.nprobe, s.query_id, s.vec_id,
           ROW_NUMBER() OVER (PARTITION BY np.nprobe, s.query_id
                              ORDER BY s.score DESC, s.vec_id ASC) AS rk
    FROM np, scored s
    JOIN probe p ON p.query_id = s.query_id AND p.shard_id = s.shard_id
    WHERE p.pr <= np.nprobe) t
  WHERE rk <= 10),
hits AS (
  SELECT nprobe, count(*) AS total_hits
  FROM approx JOIN exact USING (query_id, vec_id)
  GROUP BY nprobe)
SELECT np.nprobe::BIGINT AS nprobe,
       COALESCE(h.total_hits, 0)::BIGINT AS total_hits,
       5::BIGINT AS n_queries,
       ROUND(COALESCE(h.total_hits, 0) / 50.0, 6) AS mean_recall
FROM np LEFT JOIN hits h ON np.nprobe = h.nprobe
ORDER BY nprobe
""",
)
def q_ivf_recall_curve(spark, sf_dir):
    """(nprobe, recall@10) curve over 5 fixed corpus queries on the
    8-centroid layout — ground truth is the nprobe=num_shards batched
    search, each curve point one union-of-probes batched search
    (reference: POST /search with shards_to_search, src/compute_server.py:
    107-138; the recall side is this engine's addition)."""
    from distributed_vector_database_spark.operators.eval import (
        ivf_recall_curve_df,
    )
    from distributed_vector_database_spark.operators.ivf import IVFIndex

    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    idx = IVFIndex(spark, cents).attach(emb)
    queries = emb.filter(F.col("vec_id").isin(0, 25, 50, 75, 100)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    return ivf_recall_curve_df(idx, queries, k=10, nprobes=(1, 2, 4, 8))


# ===========================================================================
# SQ8 scalar quantization (operators/sq.py): per-dim uint8 codes — the
# byte-domain point on the compression curve (binary 1 bit/dim, PQ
# sub-byte, SQ8 1 byte, float32 4 bytes). The reference stores raw float
# JSON (src/storage_server.py:23-27); SQ8 is the 4x-scan-bytes cut.
# ===========================================================================

_SQ_BOUNDS_CTE = """
dims AS (
  SELECT i, min(x) AS lo, max(x) AS hi FROM (
    SELECT generate_subscripts(embedding::DOUBLE[],1) AS i,
           unnest(embedding::DOUBLE[]) AS x FROM embeddings) ex
  GROUP BY i),
b AS (SELECT list(lo ORDER BY i) AS mins,
             list(CASE WHEN hi>lo THEN (hi-lo)/255.0 ELSE 1.0 END
                  ORDER BY i) AS scales
      FROM dims),
deq AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS ev,
               list_transform(e.embedding::DOUBLE[],
                 (x,i) -> b.mins[i]
                          + round((x - b.mins[i]) / b.scales[i])
                            * b.scales[i]) AS dv
        FROM embeddings e, b)
"""

_SQ_COS = (
    "(CASE WHEN sqrt(list_dot_product(dv,dv)) = 0 "
    "OR sqrt(list_dot_product(q.qv,q.qv)) = 0 THEN 0.0 "
    "ELSE list_dot_product(dv, q.qv) / "
    "(sqrt(list_dot_product(dv,dv)) * sqrt(list_dot_product(q.qv,q.qv))) "
    "END)"
)


def _sq_bounds(spark, sf_dir):
    f = _local_parquet(sf_dir, "embeddings")
    if f is not None:
        try:
            # driver-side twin of fit_sq_bounds over a single local file
            # (round 13, guide §5): per-dim min/max are order-free exact
            # double comparisons, identical to the Spark aggregate; the
            # float32 -> float64 widening matches the JVM cast.
            # Equivalence is asserted in tests/test_sq.py. Any shape
            # surprise (null or ragged embeddings — reshape would throw
            # where fit_sq_bounds has defined behavior) falls back to
            # the Spark aggregate (ADVICE r13).
            import numpy as np
            import pyarrow.dataset as ds

            t = ds.dataset(f).to_table(columns=["embedding"])
            col = t.column(0).combine_chunks()
            if col.null_count:
                # a null embedding would silently vanish in flatten();
                # the Spark aggregate owns that case
                raise ValueError("null embeddings")
            mat = np.asarray(col.flatten(), dtype=np.float64).reshape(
                t.num_rows, -1
            )
            return [
                (float(lo), float(hi))
                for lo, hi in zip(mat.min(axis=0), mat.max(axis=0))
            ]
        except Exception:
            pass
    from distributed_vector_database_spark.operators.sq import fit_sq_bounds

    return fit_sq_bounds(_read(spark, sf_dir, "embeddings"))


@register(
    "sq8_encode_recon",
    f"""
WITH {_SQ_BOUNDS_CTE}
SELECT vec_id,
       ROUND(list_max(list_transform(ev, (x,i) -> abs(x - dv[i]))), 6)
         AS max_abs_err
FROM deq WHERE vec_id < 20 ORDER BY vec_id
""",
)
def q_sq8_encode_recon(spark, sf_dir):
    """Encode -> dequantize round trip: per-vector max reconstruction
    error (bounded by scale/2 per dim — the pytest invariant; here the
    exact values are the driver row)."""
    from distributed_vector_database_spark.operators.sq import (
        sq_dequantize_col,
        sq_encode_col,
    )

    emb = _read(spark, sf_dir, "embeddings")
    bounds = _sq_bounds(spark, sf_dir)
    deq = sq_dequantize_col(
        sq_encode_col("embedding", bounds), bounds
    )
    err = F.array_max(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            deq,
            lambda a, b: F.abs(a - b),
        )
    )
    return (
        emb.filter(F.col("vec_id") < 20)
        .select("vec_id", F.round(err, 6).alias("max_abs_err"))
        .orderBy("vec_id")
    )


@register(
    "sq8_adc_topk",
    f"""
WITH {_SQ_BOUNDS_CTE},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, ROUND({_SQ_COS}, 6) AS score
FROM deq, q
ORDER BY score DESC, vec_id ASC LIMIT 10
""",
)
def q_sq8_adc_topk(spark, sf_dir):
    """Top-10 by SQ8 approximate cosine — the scan reads codes (1
    byte/dim at rest) and dequantizes inline in whole-stage codegen."""
    from distributed_vector_database_spark.operators.sq import (
        sq_encode_col,
        sq_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    bounds = _sq_bounds(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 0)
    coded = emb.select(
        "vec_id", sq_encode_col("embedding", bounds).alias("codes")
    )
    return sq_topk(coded, qv, bounds, k=10)


@register(
    "sq8_rerank_topk",
    f"""
WITH {_SQ_BOUNDS_CTE},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
short AS (
  SELECT vec_id, ev FROM (
    SELECT deq.vec_id, deq.ev, ROUND({_SQ_COS}, 6) AS approx
    FROM deq, q ORDER BY approx DESC, vec_id ASC LIMIT 50) t),
resc AS (
  SELECT s.vec_id,
         ROUND(CASE WHEN sqrt(list_dot_product(s.ev,s.ev)) = 0
                    OR sqrt(list_dot_product(q.qv,q.qv)) = 0 THEN 0.0
               ELSE list_dot_product(s.ev, q.qv) /
                    (sqrt(list_dot_product(s.ev,s.ev))
                     * sqrt(list_dot_product(q.qv,q.qv))) END, 6) AS score
  FROM short s, q)
SELECT vec_id, score,
       ROW_NUMBER() OVER (ORDER BY score DESC, vec_id ASC) AS "rank"
FROM resc QUALIFY "rank" <= 10
""",
)
def q_sq8_rerank_topk(spark, sf_dir):
    """Two-stage SQ8 search: byte-domain shortlist (50) -> exact float
    re-rank (10) — the shortlist-then-verify shape shared with the
    binary and matryoshka paths."""
    from distributed_vector_database_spark.operators.sq import sq_rerank_topk

    emb = _read(spark, sf_dir, "embeddings")
    bounds = _sq_bounds(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 7)
    return sq_rerank_topk(emb, qv, bounds, k=10, shortlist=50)


# ===========================================================================
# Triangle census of the kNN graph (operators/graph.triangle_stats):
# degree-oriented node-iterator — the transitivity of the embedding
# space, and the standard structural sanity metric for ANN graph indexes.
# ===========================================================================


@register(
    "knn_triangle_stats",
    f"""
WITH s AS (SELECT a.vec_id AS query_id, e.vec_id AS vec_id,
                  ROUND({_cos(_A, E)}, 6) AS score
           FROM embeddings a JOIN embeddings e ON a.vec_id <> e.vec_id),
r AS (SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rk
      FROM s),
und AS (SELECT DISTINCT least(query_id, vec_id) AS a,
                        greatest(query_id, vec_id) AS b
        FROM r WHERE rk <= 3),
deg AS (SELECT n, count(*)::BIGINT AS d FROM (
          SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und) t
        GROUP BY n),
tri AS (SELECT count(*)::BIGINT AS n_triangles
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
agg AS (SELECT count(*)::BIGINT AS n_nodes,
               sum(d * (d - 1) // 2)::BIGINT AS n_wedges
        FROM deg)
SELECT agg.n_nodes,
       (SELECT count(*) FROM und)::BIGINT AS n_edges,
       agg.n_wedges,
       tri.n_triangles,
       ROUND(CASE WHEN agg.n_wedges = 0 THEN 0.0
             ELSE 3.0 * tri.n_triangles / agg.n_wedges END, 6)
         AS global_clustering
FROM agg, tri
""",
)
def q_knn_triangle_stats(spark, sf_dir):
    """Transitivity of the exact 3-NN graph: triangles counted once via
    degree orientation (out-degree bounded O(sqrt|E|), so the wedge join
    cannot explode on hub nodes — the property that keeps this feasible
    on power-law graphs at 100 TB). The a<b<c three-way self-join is the
    oracle's independent formulation."""
    from distributed_vector_database_spark.operators.ann import knn_graph
    from distributed_vector_database_spark.operators.graph import (
        triangle_stats,
    )

    emb = _read(spark, sf_dir, "embeddings")
    edges = knn_graph(emb, k=3).select(
        F.col("query_id").alias("src"), F.col("vec_id").alias("dst")
    )
    return triangle_stats(edges)


# ===========================================================================
# PMI collocations (text_analysis.pmi_pairs): document-level token
# co-occurrence — the classic collocation signal and a corpus-drift
# monitor. Counts are integers, so the ln is bit-identical cross-engine.
# ===========================================================================


@register(
    "pmi_top_pairs",
    """
WITH tk AS (SELECT DISTINCT doc_id, t FROM (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x <> '')) AS t
  FROM documents) u),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
ca AS (SELECT t, count(*)::BIGINT AS c FROM tk GROUP BY t),
pc AS (SELECT a.t AS t1, b.t AS t2, count(*)::BIGINT AS pair_count
       FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.t < b.t
       GROUP BY 1, 2
       HAVING count(*) >= 50)
SELECT pc.t1, pc.t2, pc.pair_count,
       ROUND(ln((pc.pair_count * nd.n)::DOUBLE / (c1.c * c2.c)::DOUBLE), 6)
         AS pmi
FROM pc
JOIN ca c1 ON c1.t = pc.t1
JOIN ca c2 ON c2.t = pc.t2
CROSS JOIN nd
ORDER BY pmi DESC, t1 ASC, t2 ASC
LIMIT 20
""",
)
def q_pmi_top_pairs(spark, sf_dir):
    """Top-20 token pairs by within-document PMI (pair support >= 50):
    which words travel together beyond what their frequencies predict."""
    from distributed_vector_database_spark.operators.text_analysis import (
        pmi_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    out = pmi_pairs(docs, min_pair_count=50)
    return out.orderBy(
        F.desc("pmi"), F.asc("t1"), F.asc("t2")
    ).limit(20)


# ===========================================================================
# Multimodal frame sampling (sources/multimodal.frame_sample): the 1-to-N
# mapInPandas expansion every video pipeline needs (one row per sampled
# frame), oracle-checked end-to-end over ASCII payloads — the codec is the
# documented deterministic fake, the Spark plumbing (binary column, Arrow
# batches, generator expansion) is real.
# ===========================================================================


@register(
    "multimodal_frame_sample",
    """
WITH f AS (SELECT doc_id, text, strlen(text) AS n
           FROM documents WHERE doc_id < 50),
ix AS (SELECT doc_id, text,
              unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS frame_ix
       FROM f WHERE n > 0)
SELECT doc_id, frame_ix::BIGINT AS frame_ix,
       (frame_ix * 64)::BIGINT AS "offset",
       ascii(substr(text, CAST(frame_ix * 64 + 1 AS BIGINT), 1))::BIGINT
         AS byte
FROM ix
""",
)
def q_multimodal_frame_sample(spark, sf_dir):
    """One row per sampled 64-byte 'frame' of each payload: document text
    encoded to the binary content column behind an 8-byte fake header
    (the ASCII corpus makes the sampled byte SQL-expressible as an ascii
    code, so the expansion shape is driver-verified)."""
    from distributed_vector_database_spark.sources.multimodal import (
        frame_sample,
    )

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(
            F.lit(bytearray(b"DVDB\x00\x00\x00\x00")),
            F.encode("text", "UTF-8"),
        ).alias("content"),
    )
    return frame_sample(assets, every_n_bytes=64).select(
        F.col("asset_id").alias("doc_id"),
        F.col("frame_ix").cast("long").alias("frame_ix"),
        F.col("offset").cast("long").alias("offset"),
        F.col("byte").cast("long").alias("byte"),
    )


# ===========================================================================
# Deterministic negative sampling (mining.negative_samples): seeded-hash
# rejection sampling — |users| x draws candidates, never |users| x |items|;
# the reproducible implicit-feedback training-pair generator.
# ===========================================================================


@register(
    "purchase_negative_samples",
    """
WITH inter AS (SELECT DISTINCT o.o_custkey AS user_id,
                               l.l_partkey AS item_id
               FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
               WHERE o.o_custkey < 200),
idx AS (SELECT p_partkey AS item_id,
               ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS ix
        FROM part),
n AS (SELECT count(*)::BIGINT AS n_items FROM part),
draws AS (SELECT u.user_id, j.j,
                 CAST(('0x' || substr(
                        md5('ns:' || u.user_id::VARCHAR || ':' || j.j::VARCHAR),
                        1, 15)) AS BIGINT) % n.n_items AS ix
          FROM (SELECT DISTINCT user_id FROM inter) u
          CROSS JOIN (SELECT unnest(range(0, 9)) AS j) j
          CROSS JOIN n),
cand AS (SELECT d.user_id, i.item_id, d.j
         FROM draws d JOIN idx i ON i.ix = d.ix),
surv AS (SELECT c.user_id, c.item_id, min(c.j) AS j
         FROM cand c
         WHERE NOT EXISTS (SELECT 1 FROM inter t
                           WHERE t.user_id = c.user_id
                             AND t.item_id = c.item_id)
         GROUP BY c.user_id, c.item_id),
rk AS (SELECT user_id, item_id,
              ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY j ASC, item_id ASC) AS neg_rank
       FROM surv)
SELECT user_id, item_id, neg_rank::BIGINT AS neg_rank
FROM rk WHERE neg_rank <= 3
""",
)
def q_purchase_negative_samples(spark, sf_dir):
    """3 reproducible negative parts per customer (customers < 200):
    parts the customer never ordered, drawn by seeded md5 hash — the
    engines agree row-for-row because the 'randomness' is a shared hash,
    not an RNG."""
    from distributed_vector_database_spark.operators.mining import (
        negative_samples,
    )

    o = _read(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    l = _read(spark, sf_dir, "lineitem")
    inter = o.join(
        l, l.l_orderkey == o.o_orderkey
    ).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
    )
    items = _read(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item_id")
    )
    return negative_samples(inter, items, n_neg=3, oversample=3)


# ===========================================================================
# Streaming migration from a LIVE reference store (sources/sqlite_store.
# stream_shards): the CDC tail of the shard_{i}.sqlite3 directory — batch
# reader backfills, this stream keeps following REPLACE INTO traffic.
# ===========================================================================

_SQLITE_STREAM_CACHE: dict[str, str] = {}


@register(
    "sqlite_store_stream_ingest",
    f"""
WITH {_ASSIGN_CTE}
SELECT e.vec_id::VARCHAR AS id,
       a.shard_id::BIGINT AS shard_id,
       ROUND(sqrt(list_dot_product({E}, {E})), 6) AS norm
FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id
WHERE e.vec_id < 100
""",
)
def q_sqlite_store_stream_ingest(spark, sf_dir):
    """Round-trip through the live-migration path: 100 vectors exported
    into a reference-format store (8 shards via centroid assignment),
    then STREAM-read back through the CDC source and landed in parquet —
    the ingested rows must equal the parquet truth. Ingest runs once per
    process; repeat calls read the landed table (same memoization
    contract as the other stream queries)."""
    import tempfile

    from distributed_vector_database_spark.operators.ivf import assign_shards
    from distributed_vector_database_spark.sources.sqlite_store import (
        stream_shards,
        write_shards,
    )

    out_dir = _SQLITE_STREAM_CACHE.get(sf_dir)
    if out_dir is None:
        emb = _read(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
        cents = _fixed_centroids(spark, sf_dir)
        frame = assign_shards(emb, cents).select(
            F.col("vec_id").cast("string").alias("id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("shard_id").cast("int").alias("shard_id"),
        )
        store = tempfile.mkdtemp(prefix="dvdb_sqlstream_store_")
        write_shards(frame, store)
        out_dir = tempfile.mkdtemp(prefix="dvdb_sqlstream_out_")
        ckpt = tempfile.mkdtemp(prefix="dvdb_sqlstream_ckpt_")
        # foreachBatch is at-least-once: a replayed batch must not double
        # its rows, so each batch overwrites its own batch=<id> subdir
        # (same idempotence contract as streaming/docs.py) instead of
        # appending to a shared directory.
        q = (
            stream_shards(spark, store)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("overwrite").parquet(
                    f"{out_dir}/batch={bid}"
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _SQLITE_STREAM_CACHE[sf_dir] = out_dir
    landed = spark.read.parquet(out_dir)
    return landed.select(
        "id",
        F.col("shard_id").cast("long").alias("shard_id"),
        round_score(l2_norm("embedding")).alias("norm"),
    )


# ===========================================================================
# MoR retention vacuum (sources/mor.MorStore.vacuum): bounded-history
# compaction — fold all but the newest N delta batches, keep that much
# time-travel/CDC addressable. The lakehouse VACUUM contract.
# ===========================================================================

_MOR_VACUUM_CACHE: dict[str, object] = {}


@register(
    "mor_vacuum_read",
    """
SELECT vec_id,
       (CASE WHEN vec_id % 20 = 0 THEN 3
             WHEN vec_id % 5 = 0 THEN 2
             ELSE 1 END)::BIGINT AS version,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             * (CASE WHEN vec_id % 20 = 0 THEN 3
                     WHEN vec_id % 5 = 0 THEN 2
                     ELSE 1 END), 6) AS val
FROM embeddings
WHERE NOT (vec_id % 50 = 0 AND vec_id % 20 <> 0)
""",
)
def q_mor_vacuum_read(spark, sf_dir):
    """The merged view AFTER vacuum(retain_last=1): base + three deltas
    (upsert %5 -> v2, delete %50, upsert %20 -> v3), then all but the
    newest delta folded into the base — the read must be byte-identical
    to the unvacuumed view (tombstoned ids physically gone, the retained
    delta still outranking the fold)."""
    import tempfile

    from distributed_vector_database_spark.functions.vector import l2_norm
    from distributed_vector_database_spark.sources.mor import MorStore

    emb = _read(spark, sf_dir, "embeddings")

    def versioned(df, v):
        return df.select(
            "vec_id",
            F.lit(v).cast("long").alias("version"),
            round_score(l2_norm("embedding") * v).alias("val"),
        )

    store = _MOR_VACUUM_CACHE.get(sf_dir)
    if store is None:
        store = MorStore(
            spark, tempfile.mkdtemp(prefix="dvdb_morvac_"), id_col="vec_id"
        )
        store.write_base(versioned(emb, 1))
        store.append(versioned(emb.filter(F.col("vec_id") % 5 == 0), 2))
        store.delete(
            emb.filter(F.col("vec_id") % 50 == 0).select("vec_id")
        )
        store.append(versioned(emb.filter(F.col("vec_id") % 20 == 0), 3))
        folded = store.vacuum(retain_last=1)
        assert folded["folded_batches"] == 2, folded
        _MOR_VACUUM_CACHE[sf_dir] = store
    return store.read()


# ===========================================================================
# Distributed hard negatives + IVF×SQ8 composition: the two round-3
# strategies that complete their stacks — the blocked-GEMM anchor-scale
# path as a driver row of its own, and partition pruning composed with
# byte-domain scanning + exact re-rank (the full 100 TB read recipe:
# touch nprobe/N of the corpus, 1 byte/dim of that, floats only for R
# survivors).
# ===========================================================================


@register(
    "hard_negatives_join_topk",
    f"""
WITH qs AS (SELECT vec_id AS query_id, label AS qlabel,
                   embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id IN (0, 7, 42, 99, 123)),
s AS (SELECT qs.query_id, e.vec_id, ROUND({_cos(E, 'qs.qv')}, 6) AS score
      FROM embeddings e, qs WHERE e.label <> qs.qlabel),
r AS (SELECT query_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT query_id, vec_id, score, "rank" FROM r WHERE "rank" <= 5
""",
)
def q_hard_negatives_join_topk(spark, sf_dir):
    """The DISTRIBUTED hard-negative strategy as its own driver row
    (`hard_negative_mining` covers the broadcast kernel): blocked GEMM
    with the label-inequality mask, nothing on the driver — the shape
    that mines negatives for EVERY training example at corpus scale."""
    from distributed_vector_database_spark.operators.mining import (
        hard_negatives_join,
    )

    emb = _read(spark, sf_dir, "embeddings")
    anchors = emb.filter(
        F.col("vec_id").isin(0, 7, 42, 99, 123)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
        F.col("label").alias("query_label"),
    )
    out = hard_negatives_join(emb, anchors, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "ivf_sq8_search",
    f"""
WITH {_ASSIGN_CTE},
dims AS (
  SELECT i, min(x) AS lo, max(x) AS hi FROM (
    SELECT generate_subscripts(embedding::DOUBLE[],1) AS i,
           unnest(embedding::DOUBLE[]) AS x FROM embeddings) ex
  GROUP BY i),
b AS (SELECT list(lo ORDER BY i) AS mins,
             list(CASE WHEN hi>lo THEN (hi-lo)/255.0 ELSE 1.0 END
                  ORDER BY i) AS scales
      FROM dims),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 100),
probe AS (SELECT c.shard_id FROM c, q
          ORDER BY list_distance(c.cv, q.qv) ASC, c.shard_id ASC LIMIT 2),
cand AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS ev,
                list_transform(e.embedding::DOUBLE[],
                  (x,i) -> b.mins[i]
                           + round((x - b.mins[i]) / b.scales[i])
                             * b.scales[i]) AS dv
         FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, b
         WHERE a.shard_id IN (SELECT shard_id FROM probe)),
short AS (
  SELECT vec_id, ev FROM (
    SELECT cand.vec_id, cand.ev,
           ROUND({_SQ_COS.replace('dv', 'cand.dv')}, 6) AS approx
    FROM cand, q ORDER BY approx DESC, vec_id ASC LIMIT 50) t),
resc AS (
  SELECT s.vec_id,
         ROUND(CASE WHEN sqrt(list_dot_product(s.ev,s.ev)) = 0
                    OR sqrt(list_dot_product(q.qv,q.qv)) = 0 THEN 0.0
               ELSE list_dot_product(s.ev, q.qv) /
                    (sqrt(list_dot_product(s.ev,s.ev))
                     * sqrt(list_dot_product(q.qv,q.qv))) END, 6) AS score
  FROM short s, q)
SELECT vec_id, score,
       ROW_NUMBER() OVER (ORDER BY score DESC, vec_id ASC) AS "rank"
FROM resc QUALIFY "rank" <= 10
""",
)
def q_ivf_sq8_search(spark, sf_dir):
    """The composed 100 TB read recipe: IVF routing prunes to nprobe=2 of
    8 shards, the SQ8 byte-domain scan shortlists 50 within the probed
    fraction, exact float cosine re-ranks 10 — floats touched only for
    the 50 survivors. (Reference: POST /search scans full floats of the
    probed shards, src/compute_server.py:107-138; this is that path with
    a 4x cheaper scan inserted.)"""
    from distributed_vector_database_spark.operators.ivf import (
        assign_shards,
        nearest_shards,
    )
    from distributed_vector_database_spark.operators.sq import sq_rerank_topk

    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    bounds = _sq_bounds(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 100)
    shards = nearest_shards(qv, cents, nprobe=2)
    pruned = assign_shards(emb, cents).filter(
        F.col("shard_id").isin(shards)
    )
    return sq_rerank_topk(pruned, qv, bounds, k=10, shortlist=50)


# ===========================================================================
# Approximate kNN graph (operators/ann.knn_graph_lsh): the scale path for
# graph construction — sign-LSH buckets bound the pair work to sum_b m_b^2
# where the exact graph (knn_graph_exact) is |V|^2 GEMM (measured 58x
# slower at 10x rows, SCALING.md decade sweep). Same output shape, so the
# triangle/2-hop consumers swap in directly.
# ===========================================================================


@register(
    "knn_graph_lsh",
    f"""
WITH {_LSH_CTE},
pairs AS (
  SELECT bq.vec_id AS query_id, e.vec_id AS vec_id,
         ROUND({_cos('(q.embedding::DOUBLE[])', E)}, 6) AS score
  FROM b bq
  JOIN embeddings q ON q.vec_id = bq.vec_id
  JOIN b bc ON bc.bucket = bq.bucket
  JOIN embeddings e ON e.vec_id = bc.vec_id
  WHERE bq.vec_id <> bc.vec_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT query_id, vec_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= 5
""",
)
def q_knn_graph_lsh(spark, sf_dir):
    """Approximate kNN graph via sign-LSH buckets (planes := first 8
    embeddings so the oracle can rebuild them): one bucket equi-self-join
    + inline cosine + per-query rank window, all JVM-side. ANN semantics:
    rows alone in their bucket yield no edges."""
    emb = _read(spark, sf_dir, "embeddings")
    planes = _fixed_centroids(spark, sf_dir, 8)
    g = _ann.knn_graph_lsh(emb, planes, k=5)
    return g.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")
    )


@register(
    "knn_graph_lsh_capped",
    f"""
WITH p AS (SELECT vec_id AS plane_id, embedding::DOUBLE[] AS pv
           FROM embeddings WHERE vec_id < 8),
sig AS (SELECT e.vec_id,
               string_agg(CASE WHEN list_dot_product({E}, p.pv) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p.plane_id)
                 AS fullsig
        FROM embeddings e, p GROUP BY e.vec_id),
cnt AS (SELECT fullsig, count(*) AS c FROM sig GROUP BY fullsig),
pc AS (SELECT t.d, substr(fullsig, 1, t.d) AS pk, sum(c) AS pcnt
       FROM cnt, generate_series(4, 8) AS t(d)
       GROUP BY t.d, substr(fullsig, 1, t.d)),
choice AS (SELECT cnt.fullsig, cnt.c,
                  coalesce(min(CASE WHEN pc.pcnt <= 4 THEN pc.d END), 8) AS cd
           FROM cnt JOIN pc ON pc.pk = substr(cnt.fullsig, 1, pc.d)
           GROUP BY cnt.fullsig, cnt.c),
keyed AS (SELECT s.vec_id,
                 CASE WHEN ch.c <= 4 THEN substr(s.fullsig, 1, ch.cd)
                      ELSE substr(s.fullsig, 1, ch.cd) || ':' || CAST(CAST(
                             floor((ROW_NUMBER() OVER (
                                 PARTITION BY s.fullsig
                                 ORDER BY md5(CAST(s.vec_id AS VARCHAR)),
                                          s.vec_id) - 1) / 4) AS BIGINT)
                             AS VARCHAR)
                 END AS key
          FROM sig s JOIN choice ch ON ch.fullsig = s.fullsig),
pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                 ROUND({_cos('(ea.embedding::DOUBLE[])',
                             '(eb.embedding::DOUBLE[])')}, 6) AS score
          FROM keyed a
          JOIN keyed b ON a.key = b.key AND a.vec_id <> b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id),
ranked AS (SELECT query_id, vec_id, score,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, vec_id ASC) AS rank
           FROM pairs)
SELECT query_id, vec_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= 5
""",
)
def q_knn_graph_lsh_capped(spark, sf_dir):
    """Cap-bounded approximate kNN graph: rows pair on the shortest
    plane-bit prefix whose bucket is <= 4 rows (adaptive depth 4..8);
    identical-signature piles beyond the cap shard into md5-ordered salt
    cells, so worst-case pair work is |V| * cap even for clusters tighter
    than every plane margin. Scoring runs the cap-bounded Arrow GEMM
    (impl='gemm'), proven row-identical to the relational scorer. The tiny
    cap makes the driver row exercise BOTH mechanisms at sf0.01."""
    emb = _read(spark, sf_dir, "embeddings")
    planes = _fixed_centroids(spark, sf_dir, 8)
    g = _ann.knn_graph_lsh(
        emb, planes, k=5, max_bucket=4, min_depth=4, impl="gemm"
    )
    return g.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")
    )


@register(
    "dedup_embedding_cosine_lsh",
    f"""
WITH p AS (SELECT vec_id AS plane_id, embedding::DOUBLE[] AS pv
           FROM embeddings WHERE vec_id < 8),
sig AS (SELECT e.vec_id,
               string_agg(CASE WHEN list_dot_product({E}, p.pv) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p.plane_id)
                 AS fullsig
        FROM embeddings e, p GROUP BY e.vec_id),
cnt AS (SELECT fullsig, count(*) AS c FROM sig GROUP BY fullsig),
pc AS (SELECT t.d, substr(fullsig, 1, t.d) AS pk, sum(c) AS pcnt
       FROM cnt, generate_series(4, 8) AS t(d)
       GROUP BY t.d, substr(fullsig, 1, t.d)),
choice AS (SELECT cnt.fullsig, cnt.c,
                  coalesce(min(CASE WHEN pc.pcnt <= 32 THEN pc.d END), 8) AS cd
           FROM cnt JOIN pc ON pc.pk = substr(cnt.fullsig, 1, pc.d)
           GROUP BY cnt.fullsig, cnt.c),
keyed AS (SELECT s.vec_id,
                 CASE WHEN ch.c <= 32 THEN substr(s.fullsig, 1, ch.cd)
                      ELSE substr(s.fullsig, 1, ch.cd) || ':' || CAST(CAST(
                             floor((ROW_NUMBER() OVER (
                                 PARTITION BY s.fullsig
                                 ORDER BY md5(CAST(s.vec_id AS VARCHAR)),
                                          s.vec_id) - 1) / 32) AS BIGINT)
                             AS VARCHAR)
                 END AS key
          FROM sig s JOIN choice ch ON ch.fullsig = s.fullsig)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       ROUND({_cos('(ea.embedding::DOUBLE[])',
                   '(eb.embedding::DOUBLE[])')}, 6) AS score
FROM keyed a
JOIN keyed b ON a.key = b.key AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE ROUND({_cos('(ea.embedding::DOUBLE[])',
                  '(eb.embedding::DOUBLE[])')}, 6) >= 0.38
""",
)
def q_dedup_embedding_cosine_lsh(spark, sf_dir):
    """The 100 TB path for embedding-cosine near-dup discovery: candidate
    pairs from cap-bounded adaptive LSH buckets (cap=32, depths 4..8),
    verified by one float64 GEMM per group — |V|*cap worst-case pair work
    where the exact operator is |V|^2. Threshold 0.38 (vs the exact
    query's 0.45) keeps the same-bucket survivor set non-trivial at
    sf0.01 — the testdata's max pairwise cosine is ~0.51; production
    near-dup default is 0.99, where sign-bit agreement — and thus
    recall — is highest."""
    emb = _read(spark, sf_dir, "embeddings")
    planes = _fixed_centroids(spark, sf_dir, 8)
    return _dd.embedding_neardup_pairs_lsh(
        emb, planes, threshold=0.38, max_bucket=32, min_depth=4
    )


# ===========================================================================
# Mergeable frequency / set-cardinality sketches (operators/sketch.py):
# Count-Min registers and KMV set operations on the portable md5 hash —
# the 100 TB monitoring pattern (per-source/per-day sketches folded into a
# global one; registers shuffle at most depth*width rows per task), with
# estimates the oracle reproduces bit-exactly.
# ===========================================================================


@register(
    "cms_heavy_hitters",
    """
WITH regs AS (
  SELECT i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket,
         count(*)::BIGINT AS cnt
  FROM events, range(4) t(i)
  GROUP BY i, bucket),
probes AS (
  SELECT user_id, i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket
  FROM (SELECT DISTINCT user_id FROM events), range(4) t(i)),
est AS (SELECT user_id, min(cnt)::BIGINT AS cms_count
        FROM probes JOIN regs USING (i, bucket)
        GROUP BY user_id),
exact AS (SELECT user_id, count(*)::BIGINT AS exact_count
          FROM events GROUP BY user_id)
SELECT user_id, cms_count, exact_count
FROM est JOIN exact USING (user_id)
ORDER BY cms_count DESC, user_id ASC
LIMIT 15
""",
)
def q_cms_heavy_hitters(spark, sf_dir):
    """Count-Min heavy hitters over event traffic: a depth=4 x width=64
    register sketch (width < #users, so collisions — and the sketch's
    never-underestimate inflation — are actually exercised), probed for
    every user and laid beside the exact counts. The register build is one
    map-side-combinable groupBy whose shuffle carries <= 256 rows per task
    at any corpus size; the probe join broadcasts the sketch. Deterministic
    md5 row-hashes make every register and estimate oracle-exact."""
    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_lookup,
    )

    ev = _read(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id", depth=4, width=64)
    keys = ev.select("user_id").distinct()
    est = cms_lookup(sketch, keys, "user_id", depth=4, width=64)
    exact = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("exact_count")
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            F.col("cms_count").cast("long").alias("cms_count"),
            "exact_count",
        )
        .orderBy(F.desc("cms_count"), F.asc("user_id"))
        .limit(15)
    )


@register(
    "kmv_order_year_overlap",
    """
WITH ha AS (SELECT DISTINCT
              ('0x' || substr(md5(o_custkey::VARCHAR), 1, 12))::BIGINT
                / 281474976710656.0 AS _h
            FROM orders WHERE year(o_orderdate) = 1995
            ORDER BY _h ASC LIMIT 64),
hb AS (SELECT DISTINCT
              ('0x' || substr(md5(o_custkey::VARCHAR), 1, 12))::BIGINT
                / 281474976710656.0 AS _h
            FROM orders WHERE year(o_orderdate) = 1996
            ORDER BY _h ASC LIMIT 64),
pool AS (SELECT coalesce(ha._h, hb._h) AS _h,
                (ha._h IS NOT NULL)::INT AS _a,
                (hb._h IS NOT NULL)::INT AS _b
         FROM ha FULL JOIN hb ON ha._h = hb._h),
r AS (SELECT _h, _a, _b,
             row_number() OVER (ORDER BY _h ASC) AS _rn
      FROM pool),
kk AS (SELECT * FROM r WHERE _rn <= 64),
agg AS (SELECT count(*) AS _n,
               max(CASE WHEN _rn = 64 THEN _h END) AS _hk,
               sum(_a * _b) AS _m
        FROM kk)
SELECT (CASE WHEN _n < 64 THEN _n::DOUBLE
             ELSE round(63.0 / _hk) END)::BIGINT AS union_est,
       round((_m::DOUBLE / _n)
             * (CASE WHEN _n < 64 THEN _n::DOUBLE
                     ELSE round(63.0 / _hk) END))::BIGINT AS intersect_est,
       round(_m::DOUBLE / _n, 6) AS jaccard
FROM agg
""",
)
def q_kmv_order_year_overlap(spark, sf_dir):
    """Customer-set overlap across adjacent order years from two k=64 KMV
    sketches [Beyer et al. SIGMOD 2007]: union / intersection / Jaccard
    estimated from 128 hash fractions, never from the data — each sketch
    is a TakeOrderedAndProject (per-partition top-k, no global sort), and
    the set algebra touches <= 2k rows. The audience question ("how many
    customers did we retain year-over-year?") costs two tiny sketches
    however many orders exist."""
    from distributed_vector_database_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_sketch,
    )

    orders = _read(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    a = orders.filter(year == 1995).select("o_custkey")
    b = orders.filter(year == 1996).select("o_custkey")
    return kmv_set_estimates(
        kmv_sketch(a, "o_custkey", k=64),
        kmv_sketch(b, "o_custkey", k=64),
        k=64,
    )


_CMS_STATE_CACHE: dict[str, str] = {}


@register(
    "stream_cms_heavy_hitters",
    """
WITH regs AS (
  SELECT i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket,
         count(*)::BIGINT AS cnt
  FROM events, range(4) t(i)
  GROUP BY i, bucket),
probes AS (
  SELECT user_id, i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket
  FROM (SELECT DISTINCT user_id FROM events), range(4) t(i)),
est AS (SELECT user_id, min(cnt)::BIGINT AS cms_count
        FROM probes JOIN regs USING (i, bucket)
        GROUP BY user_id)
SELECT user_id, cms_count
FROM est
ORDER BY cms_count DESC, user_id ASC
LIMIT 15
""",
)
def q_stream_cms_heavy_hitters(spark, sf_dir):
    """The STREAM-maintained twin of `cms_heavy_hitters`: the event log
    replayed as unordered micro-batches, each folding its batch-local
    registers into the state; the merged sketch must equal the one-shot
    batch build exactly — registers are sums, so the oracle is the same
    batch SQL regardless of chunking. Ingest runs once per process;
    repeat calls query the live state (read_cms), which is how a
    production monitor reads traffic sketches without replay."""
    import tempfile

    from distributed_vector_database_spark.operators.sketch import cms_lookup
    from distributed_vector_database_spark.streaming.events import (
        read_cms,
        read_event_stream,
        stream_cms_counts,
    )

    state = _CMS_STATE_CACHE.get(sf_dir)
    if state is not None:
        sketch = read_cms(spark, state)
    else:
        d = _STREAM_INPUT_CACHE.get(f"{sf_dir}#full")
        if d is None:
            src = _read(spark, sf_dir, "events")
            d = tempfile.mkdtemp(prefix="dvdb_streamfull_")
            src.repartition(4).write.mode("overwrite").parquet(d)
            _STREAM_INPUT_CACHE[f"{sf_dir}#full"] = d
        state = tempfile.mkdtemp(prefix="dvdb_cmsstate_")
        sketch = stream_cms_counts(
            read_event_stream(spark, d, max_files_per_trigger=2),
            state,
            key_col="user_id",
            depth=4,
            width=64,
        )
        _CMS_STATE_CACHE[sf_dir] = state
    keys = _read(spark, sf_dir, "events").select("user_id").distinct()
    est = cms_lookup(sketch, keys, "user_id", depth=4, width=64)
    return (
        est.select(
            "user_id", F.col("cms_count").cast("long").alias("cms_count")
        )
        .orderBy(F.desc("cms_count"), F.asc("user_id"))
        .limit(15)
    )


# ===========================================================================
# Winnowing fingerprints (Schleimer et al. SIGMOD 2003;
# text_analysis.winnow_fingerprints + dedup.shared_span_pairs): substring-
# level duplication — pairs sharing verbatim token runs — the signal
# whole-doc hashes and bag-of-words Jaccard both miss.
# ===========================================================================


@register(
    "winnow_shared_span_pairs",
    """
WITH toks AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(len(t)-3, 1)),
          i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                   t[i+3] || ' ' || t[i+4])) AS gh
      FROM toks),
fp AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(gh)-2, 2)),
           j -> list_aggregate(list_slice(gh, j, j+3), 'min')))) AS fp
       FROM g WHERE len(gh) > 0),
keep AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 10)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       count(*)::BIGINT AS n_shared
FROM fp a JOIN fp b USING (fp) JOIN keep USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
""",
)
def q_winnow_shared_span_pairs(spark, sf_dir):
    """Document pairs sharing >= 3 winnowing fingerprints (k=5-token
    grams, window=4 -> guaranteed detection of any shared verbatim run of
    >= 8 tokens). Fingerprint selection is one array-expression projection
    per row; candidates come from an equi-join on fp with ubiquitous
    fingerprints (df > 10) dropped first, so pair work is df-bounded at
    any corpus size. Integer-only output — bit-identical cross-engine."""
    docs = _spread_read(spark, sf_dir, "documents")
    return _dd.shared_span_pairs(
        docs, k=5, window=4, max_df=10, min_shared=3
    )


@register(
    "shared_span_longest_run",
    """
WITH toks AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(len(t)-3, 1)),
          i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                   t[i+3] || ' ' || t[i+4])) AS gh
      FROM toks),
fp AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(gh)-2, 2)),
           j -> list_aggregate(list_slice(gh, j, j+3), 'min')))) AS fp
       FROM g WHERE len(gh) > 0),
keep AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 10),
cand AS (SELECT a.doc_id AS da, b.doc_id AS db
         FROM fp a JOIN fp b USING (fp) JOIN keep USING (fp)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3),
wanted AS (SELECT DISTINCT doc_id FROM
           (SELECT da AS doc_id FROM cand UNION ALL SELECT db FROM cand)),
gp AS (SELECT doc_id, u['pos']::BIGINT AS pos, u['fp'] AS fp
       FROM (SELECT g.doc_id,
               unnest(list_transform(range(1, len(gh)+1),
                 i -> {'pos': i, 'fp': gh[i]})) AS u
             FROM g JOIN wanted USING (doc_id))),
m AS (SELECT c.da, c.db, a.pos AS pa, a.pos - b.pos AS diag
      FROM cand c
      JOIN gp a ON a.doc_id = c.da
      JOIN gp b ON b.doc_id = c.db AND b.fp = a.fp),
isl AS (SELECT da, db, diag,
               pa - row_number() OVER (PARTITION BY da, db, diag ORDER BY pa)
                 AS grp
        FROM m),
runs AS (SELECT da, db, count(*) AS rl FROM isl GROUP BY da, db, diag, grp)
SELECT da AS doc_id_a, db AS doc_id_b,
       (max(rl) + 4)::BIGINT AS longest_run_tokens
FROM runs GROUP BY 1, 2
""",
)
def q_shared_span_longest_run(spark, sf_dir):
    """The locate step of exact substring dedup (Lee et al., ACL 2022):
    winnowing candidates (`shared_span_pairs`) verified to their exact
    longest shared verbatim token run via the diagonal gaps-and-islands
    join (`dedup.longest_shared_runs`) — at sf0.01 the candidate pairs
    turn out to share runs up to 93 tokens. Grams are positioned only for
    the docs the candidate list touches (semi-join prune); every shuffle
    is keyed by the pair. Integer-only output."""
    docs = _spread_read(spark, sf_dir, "documents")
    pairs = _dd.shared_span_pairs(
        docs, k=5, window=4, max_df=10, min_shared=3
    )
    return _dd.longest_shared_runs(
        docs, pairs.select("doc_id_a", "doc_id_b"), k=5
    )


@register(
    "binary_asym_topk",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 3)
SELECT e.vec_id AS vec_id,
       ROUND(list_reduce(list_transform(range(1, 65),
         i -> CASE WHEN (e.embedding::DOUBLE[])[i] >= 0
                   THEN q.qv[i] ELSE -q.qv[i] END),
         (a, b) -> a + b), 6) AS score
FROM embeddings e, q
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def q_binary_asym_topk(spark, sf_dir):
    """Asymmetric binary search (ann.binary_asym_topk): the full-precision
    query scored against sign-quantized docs, dot(q, sign(d)) — the same
    1 bit/dim storage as binary_hamming_topk but the query's magnitudes
    survive, so ranking is strictly better informed (the ADC asymmetry
    applied to the 1-bit rung). Left-fold sum on both engines keeps the
    float result bit-identical."""
    from distributed_vector_database_spark.operators.ann import (
        binary_asym_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    return binary_asym_topk(emb, _query_vec(spark, sf_dir, 3), k=10)


@register(
    "cms_merge_heavy_hitters",
    """
WITH regs AS (
  SELECT i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket,
         count(*)::BIGINT AS cnt
  FROM events, range(4) t(i)
  GROUP BY i, bucket),
probes AS (
  SELECT user_id, i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket
  FROM (SELECT DISTINCT user_id FROM events), range(4) t(i)),
est AS (SELECT user_id, min(cnt)::BIGINT AS cms_count
        FROM probes JOIN regs USING (i, bucket)
        GROUP BY user_id)
SELECT user_id, cms_count
FROM est
ORDER BY cms_count DESC, user_id ASC
LIMIT 15
""",
)
def q_cms_merge_heavy_hitters(spark, sf_dir):
    """The MERGE path of the Count-Min family as a driver row: two
    independently-built per-source sketches (interaction events vs the
    rest — the per-day / per-source sharding a 100 TB pipeline actually
    has) folded by `cms_merge` (union + re-sum), then probed. Because
    registers are sums, the merged sketch is register-identical to the
    one-shot global build — the oracle IS the global computation."""
    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_lookup,
        cms_merge,
    )

    ev = _read(spark, sf_dir, "events")
    interactive = F.col("event_type").isin("click", "view")
    part_a = cms_build(ev.filter(interactive), "user_id", depth=4, width=64)
    part_b = cms_build(ev.filter(~interactive), "user_id", depth=4, width=64)
    sketch = cms_merge(part_a, part_b)
    keys = ev.select("user_id").distinct()
    est = cms_lookup(sketch, keys, "user_id", depth=4, width=64)
    return (
        est.select(
            "user_id", F.col("cms_count").cast("long").alias("cms_count")
        )
        .orderBy(F.desc("cms_count"), F.asc("user_id"))
        .limit(15)
    )


@register(
    "cms_top_spenders",
    """
WITH ev AS (SELECT user_id, round(value * 100)::BIGINT AS cents
            FROM events),
regs AS (
  SELECT i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket,
         sum(cents)::BIGINT AS cnt
  FROM ev, range(4) t(i)
  GROUP BY i, bucket),
probes AS (
  SELECT user_id, i,
         ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 12))
           ::BIGINT % 64 AS bucket
  FROM (SELECT DISTINCT user_id FROM ev), range(4) t(i)),
est AS (SELECT user_id, min(cnt)::BIGINT AS cms_cents
        FROM probes JOIN regs USING (i, bucket)
        GROUP BY user_id)
SELECT user_id, cms_cents
FROM est
ORDER BY cms_cents DESC, user_id ASC
LIMIT 15
""",
)
def q_cms_top_spenders(spark, sf_dir):
    """WEIGHTED Count-Min as a driver row: registers accumulate exact
    integer spend-cents (weight_col) instead of occurrence counts — the
    'which keys carry the most volume' monitor (top spenders, heaviest
    token sources) at register-sized state. Weights are positive here, so
    the never-underestimate guarantee carries over; exact integer cents
    keep the sums bit-identical cross-engine."""
    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_lookup,
    )

    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    sketch = cms_build(
        ev, "user_id", depth=4, width=64, weight_col="cents"
    )
    keys = ev.select("user_id").distinct()
    est = cms_lookup(sketch, keys, "user_id", depth=4, width=64)
    return (
        est.select(
            "user_id", F.col("cms_count").cast("long").alias("cms_cents")
        )
        .orderBy(F.desc("cms_cents"), F.asc("user_id"))
        .limit(15)
    )


@register(
    "fixed_k_sample_per_lang",
    """
WITH h AS (SELECT doc_id, lang, n_chars,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                    / 281474976710656.0 AS _h
           FROM documents),
r AS (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY _h ASC) AS _rn
      FROM h)
SELECT doc_id, lang, n_chars FROM r WHERE _rn <= 20
""",
)
def q_fixed_k_sample_per_lang(spark, sf_dir):
    """Exactly-20-docs-per-language eval carve (sketch.hash_topk_sample):
    the k smallest doc-id hash fractions per group — a FIXED-SIZE
    deterministic sample where rate-based sampling can't guarantee a
    count. Growth-stable by the KMV property: a sampled doc is displaced
    only when a new doc hashes below the group's k-th minimum. One window
    shuffle on the group key."""
    from distributed_vector_database_spark.operators.sketch import (
        hash_topk_sample,
    )

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return hash_topk_sample(docs, "doc_id", 20, group_cols=["lang"])


@register(
    "substring_dedup_excised_stats",
    """
WITH toks AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(len(t)-3, 1)),
          i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                   t[i+3] || ' ' || t[i+4])) AS gh
      FROM toks),
fp AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(gh)-2, 2)),
           j -> list_aggregate(list_slice(gh, j, j+3), 'min')))) AS fp
       FROM g WHERE len(gh) > 0),
keep AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 10),
cand AS (SELECT a.doc_id AS da, b.doc_id AS db
         FROM fp a JOIN fp b USING (fp) JOIN keep USING (fp)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3),
wanted AS (SELECT DISTINCT doc_id FROM
           (SELECT da AS doc_id FROM cand UNION ALL SELECT db FROM cand)),
gp AS (SELECT doc_id, u['pos']::BIGINT AS pos, u['fp'] AS fp
       FROM (SELECT g.doc_id,
               unnest(list_transform(range(1, len(gh)+1),
                 i -> {'pos': i, 'fp': gh[i]})) AS u
             FROM g JOIN wanted USING (doc_id))),
m AS (SELECT c.da, c.db, a.pos AS pa, a.pos - b.pos AS diag
      FROM cand c
      JOIN gp a ON a.doc_id = c.da
      JOIN gp b ON b.doc_id = c.db AND b.fp = a.fp),
isl AS (SELECT da, db, diag, pa,
               pa - row_number() OVER (PARTITION BY da, db, diag ORDER BY pa)
                 AS grp
        FROM m),
runs AS (SELECT da, db, diag, count(*) AS rl, min(pa) AS minpa
         FROM isl GROUP BY da, db, diag, grp),
-- 1-based inclusive token interval the island covers on the b side:
-- gram pos p covers tokens p..p+4, so [minpa-diag, minpa-diag+rl+3]
spans AS (SELECT db AS doc_id, (minpa - diag) AS s,
                 (minpa - diag + rl + 3) AS e
          FROM runs WHERE rl + 4 >= 8),
ivs AS (SELECT doc_id, list({'s': s, 'e': e}) AS ivs
        FROM spans GROUP BY doc_id),
cleaned AS (SELECT toks.doc_id,
        CASE WHEN ivs.ivs IS NULL THEN toks.t
             ELSE list_filter(toks.t, (x, j) ->
                    len(list_filter(ivs.ivs,
                        v -> j >= v['s'] AND j <= v['e'])) = 0)
        END AS t
      FROM toks LEFT JOIN ivs USING (doc_id)),
g2 AS (SELECT doc_id,
        list_transform(range(1, greatest(len(t)-3, 1)),
          i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                   t[i+3] || ' ' || t[i+4])) AS gh
      FROM cleaned),
fp2 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(gh)-2, 2)),
           j -> list_aggregate(list_slice(gh, j, j+3), 'min')))) AS fp
       FROM g2 WHERE len(gh) > 0),
keep2 AS (SELECT fp FROM fp2 GROUP BY fp HAVING count(*) <= 10),
cand2 AS (SELECT a.doc_id AS da, b.doc_id AS db
         FROM fp2 a JOIN fp2 b USING (fp) JOIN keep2 USING (fp)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3)
SELECT (SELECT count(*) FROM cand)::BIGINT AS pairs_before,
       (SELECT count(DISTINCT doc_id) FROM spans)::BIGINT AS docs_excised,
       ((SELECT sum(len(t)) FROM toks)
        - (SELECT sum(len(t)) FROM cleaned))::BIGINT AS tokens_removed,
       (SELECT count(*) FROM cand2)::BIGINT AS residual_pairs
""",
)
def q_substring_dedup_excised_stats(spark, sf_dir):
    """The COMPLETE Lee et al. (ACL 2022) substring-dedup pipeline, closed
    loop: winnowing candidates (`dedup.shared_span_pairs`) -> ALL shared
    verbatim runs >= the 8-token winnowing detection floor, with positions
    (`dedup.shared_runs`) -> corpus rewrite cutting each run from the
    higher-id document (`dedup.excise_spans`) -> candidate generator
    re-run on the cleaned corpus. One audit row: candidate pairs before,
    documents cut, tokens removed, residual candidate pairs after.

    Every stage is equi-join / single-projection work: the corpus never
    shuffles (spans broadcast onto it), the pair frame is df-capped, and
    the run verify is gram_pos_cap-bounded (exact here — the corpus'
    within-doc gram multiplicity is 1). The tiny runs frame is
    checkpointed: both the rewrite and the stats read it, and it sits
    behind the candidate join + islands window."""
    docs = _spread_read(spark, sf_dir, "documents")
    # measured-and-rejected: checkpointing `pairs` too (it feeds runs +
    # the pairs_before stat) read 6.46 vs 6.39 s at sf0.1 — the saved
    # join pass repays its own materialization, nothing more
    pairs = _dd.shared_span_pairs(
        docs, k=5, window=4, max_df=10, min_shared=3
    )
    runs = _dd.shared_runs(docs, pairs, k=5).localCheckpoint(eager=True)
    cleaned = _dd.excise_spans(docs, runs)
    pairs_after = _dd.shared_span_pairs(
        cleaned, k=5, window=4, max_df=10, min_shared=3
    )
    from distributed_vector_database_spark.functions.text import tokens

    ntok = F.size(tokens("text"))
    before = pairs.agg(F.count("*").cast("long").alias("pairs_before"))
    cut = runs.agg(
        F.countDistinct("doc_id_b").cast("long").alias("docs_excised")
    )
    tb = docs.agg(F.sum(ntok).cast("long").alias("_tb"))
    ta = cleaned.agg(F.sum(ntok).cast("long").alias("_ta"))
    residual = pairs_after.agg(
        F.count("*").cast("long").alias("residual_pairs")
    )
    return (
        before.crossJoin(cut)
        .crossJoin(tb)
        .crossJoin(ta)
        .crossJoin(residual)
        .select(
            "pairs_before",
            "docs_excised",
            (F.col("_tb") - F.col("_ta")).cast("long").alias(
                "tokens_removed"
            ),
            "residual_pairs",
        )
    )


@register(
    "bloom_decontaminate_stats",
    f"""
WITH {_TOKS_CTE},
sh AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE {_EVAL_PRED}),
nb AS (SELECT greatest(16 * count(*), 1024)::BIGINT AS m FROM ev),
bloom AS (SELECT DISTINCT
            ('0x' || substr(md5(r.i::VARCHAR || ':' || ev.g), 1, 12))::BIGINT
              % (SELECT m FROM nb) AS pos
          FROM ev, range(0, 4) r(i)),
trg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT ({_EVAL_PRED})),
gdict AS (SELECT DISTINCT g FROM trg),
hits AS (SELECT p.g FROM
           (SELECT g, ('0x' || substr(md5(r.i::VARCHAR || ':' || g), 1, 12))
                        ::BIGINT % (SELECT m FROM nb) AS pos
            FROM gdict, range(0, 4) r(i)) p
         JOIN bloom USING (pos)
         GROUP BY p.g HAVING count(*) = 4),
fb AS (SELECT DISTINCT doc_id FROM trg JOIN hits USING (g)),
fe AS (SELECT DISTINCT doc_id FROM trg JOIN ev ON trg.g = ev.g)
SELECT (SELECT count(*) FROM documents WHERE NOT ({_EVAL_PRED}))::BIGINT
         AS n_train,
       (SELECT count(*) FROM fb)::BIGINT AS flagged_bloom,
       (SELECT count(*) FROM fe)::BIGINT AS flagged_exact,
       ((SELECT count(*) FROM fb) - (SELECT count(*) FROM fe))::BIGINT
         AS false_positive_docs
""",
)
def q_bloom_decontaminate_stats(spark, sf_dir):
    """Bloom-filter decontamination (`sketch.bloom_build/bloom_contains`):
    the eval slice's word-3-gram dictionary becomes a portable Bloom
    filter (m = 16 bits per gram, k=4 — FPR ~0.24%), every distinct
    training gram probes it, and a doc is bloom-flagged when any of its
    grams is maybe-present. One audit row alongside the EXACT
    contamination count, so the false-positive overhead of the sketch
    path is measured, not assumed.

    The 100-TB shape this rehearses: the eval set's exact gram dictionary
    may be too large to broadcast, but its Bloom positions (<= m single
    ints, data-independent size) always fit — the corpus probes the
    broadcast filter with no shuffle, and only the tiny maybe-present
    remainder ever needs the exact verify. No false negatives by
    construction (the test suite proves merge==global and absence
    exactness), so the clean side — the side that feeds training — is
    identical to exact decontamination's."""
    from distributed_vector_database_spark.functions.text import (
        word_shingles_arrow,
    )
    from distributed_vector_database_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ev = docs.filter(F.expr(_EVAL_PRED))
    tr = docs.filter(~F.expr(_EVAL_PRED))
    evg = (
        ev.select(
            F.explode(
                word_shingles_arrow(F.col("text"), 3, distinct=True)
            ).alias("g")
        )
        .distinct()
        .localCheckpoint(eager=True)  # tiny; read by count + build
    )
    num_bits = max(16 * evg.count(), 1024)
    bloom = bloom_build(evg, "g", num_bits=num_bits, num_hashes=4)
    # three consumers (probe-dictionary distinct, bloom-flag join, exact
    # -flag join) each re-ran the corpus tokenize+shingle explode — pin
    # it once (round 14, guide §5; same shared-explode treatment as
    # curation.bloom_screened_contaminated_ids). Eager: the consumers
    # are independent subtrees of one action, lazy branches race.
    trg = tr.select(
        "doc_id",
        F.explode(
            word_shingles_arrow(F.col("text"), 3, distinct=True)
        ).alias("g"),
    ).localCheckpoint(eager=True)
    verd = bloom_contains(
        bloom,
        trg.select("g").distinct(),
        "g",
        num_bits=num_bits,
        num_hashes=4,
    )
    fb = (
        trg.join(verd.filter(F.col("maybe_present")), "g")
        .select("doc_id")
        .distinct()
        .agg(F.count("*").cast("long").alias("flagged_bloom"))
    )
    fe = (
        trg.join(F.broadcast(evg), "g")
        .select("doc_id")
        .distinct()
        .agg(F.count("*").cast("long").alias("flagged_exact"))
    )
    nt = tr.agg(F.count("*").cast("long").alias("n_train"))
    return (
        nt.crossJoin(fb)
        .crossJoin(fe)
        .select(
            "n_train",
            "flagged_bloom",
            "flagged_exact",
            (F.col("flagged_bloom") - F.col("flagged_exact"))
            .cast("long")
            .alias("false_positive_docs"),
        )
    )


_WINNOW_FLAGS_SQL = """
WITH toks AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(len(t)-3, 1)),
          i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                   t[i+3] || ' ' || t[i+4])) AS gh
      FROM toks),
fp AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(gh)-2, 2)),
           j -> list_aggregate(list_slice(gh, j, j+3), 'min')))) AS fp
       FROM g WHERE len(gh) > 0),
own AS (SELECT fp, min(doc_id) AS owner FROM fp GROUP BY fp)
SELECT f.doc_id AS doc_id, count(*)::BIGINT AS n_fps,
       sum(CASE WHEN own.owner < f.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_owned_elsewhere,
       (sum(CASE WHEN own.owner < f.doc_id THEN 1 ELSE 0 END) >= 3)
         AS is_span_dup
FROM fp f JOIN own USING (fp)
GROUP BY f.doc_id
"""


@register("winnow_dup_flags", _WINNOW_FLAGS_SQL)
def q_winnow_dup_flags(spark, sf_dir):
    """Per-doc SUBSTRING-dup decision without pair mining
    (`dedup.winnow_owner_dup_flags`): every winnowing fingerprint is
    owned by its lowest doc id; >= 3 fingerprints owned elsewhere flag
    the doc. One min-window on the uniform fp key — no pair fan-out, no
    df cap needed — the flat-plan screen in front of the exact
    pair/verify/excise chain."""
    return _dd.winnow_owner_dup_flags(
        _spread_read(spark, sf_dir, "documents"),
        k=5,
        window=4,
        min_shared=3,
    )


_WINNOW_STATE_CACHE: dict[str, str] = {}


@register("stream_winnow_dup_flags", _WINNOW_FLAGS_SQL)
def q_stream_winnow_dup_flags(spark, sf_dir):
    """The SAME substring-dup contract computed incrementally: documents
    arrive id-ordered in two micro-batches; each batch is flagged against
    the append-only fingerprint-owner index built from prior batches
    (`streaming.docs.stream_winnow_dedup`). The replay's accumulated
    decisions must equal the batch/SQL owner form on the full corpus —
    cross-batch VERBATIM-SPAN state proven, complementing the minhash
    (whole-doc similarity) streaming twin."""
    import tempfile

    from distributed_vector_database_spark.streaming.docs import (
        read_document_stream,
        read_winnow_flags,
        stream_winnow_dedup,
    )

    state = _WINNOW_STATE_CACHE.get(sf_dir)
    if state is not None:
        out = read_winnow_flags(spark, state)
    else:
        d = _ordered_two_chunk_replay_dir(spark, sf_dir)
        state = tempfile.mkdtemp(prefix="dvdb_wnstate_")
        out = stream_winnow_dedup(
            read_document_stream(spark, d, max_files_per_trigger=1),
            state,
            k=5,
            window=4,
            min_shared=3,
        )
        _WINNOW_STATE_CACHE[sf_dir] = state
    return out.select("doc_id", "n_fps", "n_owned_elsewhere", "is_span_dup")


@register(
    "hdr_value_quantiles",
    """
WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
           FROM events WHERE CAST(round(value * 100) AS BIGINT) >= 1),
b AS (SELECT event_type,
             length(bin(c)) - 1 AS e,
             (c >> greatest(length(bin(c)) - 1 - 4, 0)) & 15 AS sub,
             count(*) AS cnt
      FROM c GROUP BY 1, 2, 3),
cum AS (SELECT event_type, e, sub,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY e, sub) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
        FROM b),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
SELECT event_type, q::DOUBLE AS q,
       min(CASE WHEN e < 4 THEN sub::BIGINT
                ELSE (16 + sub)::BIGINT << (e - 4) END)::BIGINT
         AS est_cents
FROM cum, qs
WHERE cum >= greatest(CAST(ceil(q * total) AS BIGINT), 1)
GROUP BY 1, 2
""",
)
def q_hdr_value_quantiles(spark, sf_dir):
    """Per-event-type p50/p90/p99 of spend from the HDR histogram sketch
    (`sketch.hdr_hist_build/hdr_quantiles`) — the quantile member of the
    mergeable-sketch quartet (CMS frequency, KMV distinct, Bloom
    membership). Bucketing is EXACT integer math (floor(log2) via binary
    length + 4 mantissa bits), so unlike float-log DDSketch buckets the
    oracle reproduces every register and estimate bit-identically, and
    the estimate is guaranteed within 6.25% below the true quantile.

    Scale shape: the corpus contributes one partial-aggregated shuffle
    of <= ~960 register rows per group however large the input; the
    quantile read is a window over those registers. Per-day / per-source
    sketches fold with `hdr_hist_merge` (sums) — the pattern that lets a
    100-TB pipeline keep live value distributions without re-scans."""
    from distributed_vector_database_spark.operators.sketch import (
        hdr_hist_build,
        hdr_quantiles,
    )

    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    sk = hdr_hist_build(ev, "cents", group_cols=["event_type"])
    return (
        hdr_quantiles(sk, [0.5, 0.9, 0.99], group_cols=["event_type"])
        .select(
            "event_type",
            "q",
            F.col("est").cast("long").alias("est_cents"),
        )
        .orderBy("event_type", "q")
    )


_HDR_STATE_CACHE: dict[str, str] = {}


@register(
    "stream_hdr_value_quantiles",
    """
WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
           FROM events WHERE CAST(round(value * 100) AS BIGINT) >= 1),
b AS (SELECT event_type,
             length(bin(c)) - 1 AS e,
             (c >> greatest(length(bin(c)) - 1 - 4, 0)) & 15 AS sub,
             count(*) AS cnt
      FROM c GROUP BY 1, 2, 3),
cum AS (SELECT event_type, e, sub,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY e, sub) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
        FROM b),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
SELECT event_type, q::DOUBLE AS q,
       min(CASE WHEN e < 4 THEN sub::BIGINT
                ELSE (16 + sub)::BIGINT << (e - 4) END)::BIGINT
         AS est_cents
FROM cum, qs
WHERE cum >= greatest(CAST(ceil(q * total) AS BIGINT), 1)
GROUP BY 1, 2
""",
)
def q_stream_hdr_value_quantiles(spark, sf_dir):
    """The STREAM-maintained twin of `hdr_value_quantiles`: the event log
    replayed as unordered micro-batches, each folding its batch-local
    histogram registers into the state; quantiles read from the merged
    state must equal the one-shot batch sketch exactly — registers are
    sums, so the oracle is the same batch SQL regardless of chunking.
    Ingest runs once per process; repeat calls query the live state
    (read_hdr_hist) — a latency dashboard reading p50/p99 without ever
    rescanning the feed."""
    import tempfile

    from distributed_vector_database_spark.operators.sketch import (
        hdr_quantiles,
    )
    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        read_hdr_hist,
        stream_hdr_hist,
    )

    cents = F.round(F.col("value") * 100).cast("long").alias("cents")
    state = _HDR_STATE_CACHE.get(sf_dir)
    if state is not None:
        sketch = read_hdr_hist(spark, state, group_cols=["event_type"])
    else:
        d = _STREAM_INPUT_CACHE.get(f"{sf_dir}#full")
        if d is None:
            src = _read(spark, sf_dir, "events")
            d = tempfile.mkdtemp(prefix="dvdb_streamfull_")
            src.repartition(4).write.mode("overwrite").parquet(d)
            _STREAM_INPUT_CACHE[f"{sf_dir}#full"] = d
        state = tempfile.mkdtemp(prefix="dvdb_hdrstate_")
        sketch = stream_hdr_hist(
            read_event_stream(spark, d, max_files_per_trigger=2).select(
                "event_type", cents
            ),
            state,
            value_col="cents",
            group_cols=["event_type"],
        )
        _HDR_STATE_CACHE[sf_dir] = state
    return (
        hdr_quantiles(sketch, [0.5, 0.9, 0.99], group_cols=["event_type"])
        .select(
            "event_type",
            "q",
            F.col("est").cast("long").alias("est_cents"),
        )
        .orderBy("event_type", "q")
    )


@register(
    "winnow_screen_dedup_stats",
    """
WITH toks AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(len(t)-3, 1)),
          i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                   t[i+3] || ' ' || t[i+4])) AS gh
      FROM toks),
fp AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(gh)-2, 2)),
           j -> list_aggregate(list_slice(gh, j, j+3), 'min')))) AS fp
       FROM g WHERE len(gh) > 0),
own AS (SELECT fp, min(doc_id) AS owner FROM fp GROUP BY fp),
dropd AS (SELECT f.doc_id FROM fp f JOIN own USING (fp)
          GROUP BY f.doc_id
          HAVING sum(CASE WHEN own.owner < f.doc_id THEN 1 ELSE 0 END) >= 3),
fp2 AS (SELECT * FROM fp
        WHERE doc_id NOT IN (SELECT doc_id FROM dropd)),
own2 AS (SELECT fp, min(doc_id) AS owner FROM fp2 GROUP BY fp),
resid AS (SELECT f.doc_id FROM fp2 f JOIN own2 USING (fp)
          GROUP BY f.doc_id
          HAVING sum(CASE WHEN own2.owner < f.doc_id THEN 1 ELSE 0 END) >= 3)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(*) FROM dropd)::BIGINT AS docs_dropped,
       ((SELECT count(*) FROM documents)
        - (SELECT count(*) FROM dropd))::BIGINT AS docs_kept,
       (SELECT sum(len(t)) FROM toks)::BIGINT AS tokens_before,
       (SELECT coalesce(sum(len(t)), 0) FROM toks
        JOIN dropd USING (doc_id))::BIGINT AS tokens_removed,
       (SELECT count(*) FROM resid)::BIGINT AS residual_flagged
""",
)
def q_winnow_screen_dedup_stats(spark, sf_dir):
    """The SCALABLE substring-dedup path a 100-TB user actually runs
    (VERDICT r6 item 4): `dedup.winnow_owner_dup_flags` screens the
    corpus (flat plan — partial-agg ownership on the fingerprint key, no
    pair mining), flagged docs are dropped via one broadcast-scale
    anti-join, and the screen re-runs on the survivors. One audit row:
    corpus size, docs dropped/kept, token mass before/removed, and the
    residual flag count — which is 0 BY CONSTRUCTION (dropping docs only
    removes fingerprints, so a surviving doc's owners can only move UP;
    its owned-elsewhere count can only shrink), making this a closed
    loop like the exact excision row but on the flat screen law, not the
    pair law. Contrast `substring_dedup_excised_stats`, which pays pair
    mining + run verification to cut only the duplicated SPANS — that's
    the surgical path; this is the throughput path."""
    from distributed_vector_database_spark.functions.text import tokens

    docs = _spread_read(spark, sf_dir, "documents")
    flags = _dd.winnow_owner_dup_flags(
        docs, k=5, window=4, min_shared=3
    )
    # tiny (flagged ids only), three consumers (drop anti-join, count,
    # removed-token join) and behind the screen's shuffles -> checkpoint
    to_drop = (
        flags.filter(F.col("is_span_dup"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    cleaned = docs.join(F.broadcast(to_drop), "doc_id", "left_anti")
    residual = (
        _dd.winnow_owner_dup_flags(cleaned, k=5, window=4, min_shared=3)
        .filter(F.col("is_span_dup"))
        .agg(F.count("*").cast("long").alias("residual_flagged"))
    )
    ntok = F.size(tokens("text"))
    nd = docs.agg(F.count("*").cast("long").alias("n_docs"))
    dd = to_drop.agg(F.count("*").cast("long").alias("docs_dropped"))
    tb = docs.agg(F.sum(ntok).cast("long").alias("tokens_before"))
    tr = (
        docs.join(F.broadcast(to_drop), "doc_id")
        .agg(
            F.coalesce(F.sum(ntok), F.lit(0))
            .cast("long")
            .alias("tokens_removed")
        )
    )
    return (
        nd.crossJoin(dd)
        .crossJoin(tb)
        .crossJoin(tr)
        .crossJoin(residual)
        .select(
            "n_docs",
            "docs_dropped",
            (F.col("n_docs") - F.col("docs_dropped"))
            .cast("long")
            .alias("docs_kept"),
            "tokens_before",
            "tokens_removed",
            "residual_flagged",
        )
    )


import os as _os

_FIXTURES_DIR = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "fixtures",
)
_W2V_FIXTURE = _os.path.join(_FIXTURES_DIR, "w2v_vocab_micros.parquet")


@register(
    "w2v_doc_embed_transform",
    f"""
WITH vocab AS (SELECT word, dim, val_micros
               FROM '{_W2V_FIXTURE}'),
toks AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents),
tok AS (SELECT doc_id, len(t)::BIGINT AS n_tok, unnest(t) AS word
        FROM toks)
SELECT tok.doc_id AS doc_id, vocab.dim AS dim,
       floor(sum(vocab.val_micros) * 1.0 / max(tok.n_tok))::BIGINT
         AS mean_micros,
       count(*)::BIGINT AS n_invocab,
       max(tok.n_tok)::BIGINT AS n_tokens
FROM tok JOIN vocab USING (word)
GROUP BY tok.doc_id, vocab.dim
""",
)
def q_w2v_doc_embed_transform(spark, sf_dir):
    """The trainable-embedding rung's TRANSFORM, oracle-exact (VERDICT r6
    item 7): the committed fixtures/w2v_vocab_micros.parquet table — an
    MLlib Word2Vec model trained ONCE offline (scripts/make_w2v_fixture.py:
    sf0.001, dim=8, seed=7, single partition, top-24 words kept so larger
    corpora exercise real OOV tokens) frozen as (word, dim, val_micros) —
    applied to the corpus: doc vector = in-vocab token-vector sum over
    TOTAL token count, Word2VecModel.transform's measured semantics
    (`functions.embed.doc_embed_from_vocab_micros`, proven equivalent).
    Training itself stays invariant-tested
    (§7.3, same policy as A2 KMeans); everything after the fit is now a
    driver row. Integer-micro components make every partial sum exact —
    bit-identical across engines and partitionings. Plan: broadcast the
    192-row model table, explode tokens, one partial-agg groupBy on
    (doc, dim) — the corpus never shuffles before the aggregate."""
    from distributed_vector_database_spark.functions.embed import (
        doc_embed_from_vocab_micros,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    vocab = spark.read.parquet(_W2V_FIXTURE)
    return doc_embed_from_vocab_micros(docs, vocab)


def _minhash_est_sql(num_hashes: int = 8, bands: int = 2) -> str:
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5("
        + " || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_ix, band{b} AS bv FROM banded"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END)"
        for j in range(num_hashes)
    )
    return f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sig),
st AS ({stacked}),
cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM st a JOIN st b
           ON a.band_ix = b.band_ix AND a.bv = b.bv
          AND a.doc_id < b.doc_id),
j AS (SELECT c.da, c.db,
        round(({agree}) * 1.0 / {num_hashes}, 6) AS est_jaccard,
        round(len(list_intersect(ha.s, hb.s)) * 1.0
              / (len(ha.s) + len(hb.s) - len(list_intersect(ha.s, hb.s))),
              6) AS jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.da
      JOIN sig sb ON sb.doc_id = c.db
      JOIN sh ha ON ha.doc_id = c.da
      JOIN sh hb ON hb.doc_id = c.db)
SELECT da AS doc_id_a, db AS doc_id_b, est_jaccard, jaccard,
       round(abs(est_jaccard - jaccard), 6) AS abs_err
FROM j
"""


@register("minhash_jaccard_estimate", _minhash_est_sql())
def q_minhash_jaccard_estimate(spark, sf_dir):
    """Per-candidate-pair MinHash Jaccard estimate vs exact Jaccard
    (`dedup.minhash_jaccard_estimates`) — the estimator-error audit
    behind the dedup family's verify-with-exact policy: at k=8 hashes
    the estimate's stderr is ~0.17 at J=0.5, so LSH is a candidate
    GENERATOR here, never the dedup verdict. Signature frame computed
    once and checkpointed (band build + both estimate sides read it)."""
    return _dd.minhash_jaccard_estimates(
        _spread_read(spark, sf_dir, "documents"), num_hashes=8, bands=2
    )


def _minhash_band_stats_sql(num_hashes: int = 8, bands: int = 2) -> str:
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5("
        + " || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_ix, band{b} AS bv FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sig),
st AS ({stacked}),
bk AS (SELECT band_ix, bv, count(*) AS c FROM st GROUP BY band_ix, bv)
SELECT band_ix, count(*)::BIGINT AS n_buckets,
       sum(c)::BIGINT AS n_docs,
       max(c)::BIGINT AS max_bucket,
       (sum(c * (c - 1)) // 2)::BIGINT AS pairs_upper_bound
FROM bk GROUP BY band_ix ORDER BY band_ix
"""


@register("minhash_band_bucket_stats", _minhash_band_stats_sql())
def q_minhash_band_bucket_stats(spark, sf_dir):
    """Per-band LSH bucket-size audit (`dedup.minhash_band_stats`) — run
    BEFORE any banded self-join at scale: pairs_upper_bound = sum of
    c*(c-1)/2 over buckets is exactly the pair volume the band's
    equi-join will emit, and max_bucket ~ n_docs is the degenerate-
    signature signature (SCALING.md's dense-pile LSH failure found this
    the expensive way; this row is the cheap detector). Two partial-agg
    shuffles on uniform hash keys, integers only."""
    return _dd.minhash_band_stats(
        _spread_read(spark, sf_dir, "documents"), num_hashes=8, bands=2
    )


@register(
    "bloom_screened_decontaminate_stats",
    f"""
WITH {_TOKS_CTE},
sh AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE {_EVAL_PRED}),
nb AS (SELECT greatest(16 * count(*), 1024)::BIGINT AS m FROM ev),
bloom AS (SELECT DISTINCT
            ('0x' || substr(md5(r.i::VARCHAR || ':' || ev.g), 1, 12))::BIGINT
              % (SELECT m FROM nb) AS pos
          FROM ev, range(0, 4) r(i)),
trg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT ({_EVAL_PRED})),
gdict AS (SELECT DISTINCT g FROM trg),
hits AS (SELECT p.g FROM
           (SELECT g, ('0x' || substr(md5(r.i::VARCHAR || ':' || g), 1, 12))
                        ::BIGINT % (SELECT m FROM nb) AS pos
            FROM gdict, range(0, 4) r(i)) p
         JOIN bloom USING (pos)
         GROUP BY p.g HAVING count(*) = 4),
leak AS (SELECT hits.g FROM hits JOIN ev ON hits.g = ev.g),
fe AS (SELECT DISTINCT doc_id FROM trg JOIN leak USING (g))
SELECT (SELECT count(*) FROM fe)::BIGINT AS flagged_docs,
       ((SELECT count(*) FROM documents WHERE NOT ({_EVAL_PRED}))
        - (SELECT count(*) FROM fe))::BIGINT AS clean_docs,
       (SELECT count(*) FROM gdict)::BIGINT AS grams_probed,
       (SELECT count(*) FROM hits)::BIGINT AS grams_maybe,
       (SELECT count(*) FROM leak)::BIGINT AS grams_contaminated
""",
)
def q_bloom_screened_decontaminate_stats(spark, sf_dir):
    """The scale protocol SCALING.md round-7 measured into existence:
    Bloom-SCREEN the train gram dictionary, exact-verify only the
    maybe-present remainder (`curation.bloom_screened_contaminated_ids`)
    — flags identical to exact decontamination (the oracle computes the
    EXACT flag count; the Spark side arrives at it THROUGH the screen,
    so the equality is the proof), while the exact dictionary join
    probes only grams_maybe rows (~0.24% of grams_probed plus true
    leaks) instead of all of them. Work ledger rides along:
    grams_probed / grams_maybe / grams_contaminated."""
    from distributed_vector_database_spark.operators.curation import (
        bloom_screened_contaminated_ids,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ev = docs.filter(F.expr(_EVAL_PRED))
    tr = docs.filter(~F.expr(_EVAL_PRED))
    flags, stats = bloom_screened_contaminated_ids(
        tr, ev, ngram=3, bits_per_gram=16, num_hashes=4,
        with_gram_stats=True,
    )
    fd = flags.agg(F.count("*").cast("long").alias("flagged_docs"))
    nt = tr.agg(F.count("*").cast("long").alias("_n_train"))
    return (
        fd.crossJoin(nt)
        .crossJoin(stats)
        .select(
            "flagged_docs",
            (F.col("_n_train") - F.col("flagged_docs"))
            .cast("long")
            .alias("clean_docs"),
            "grams_probed",
            "grams_maybe",
            "grams_contaminated",
        )
    )


@register(
    "w2v_ivf_search",
    f"""
WITH vocab AS (SELECT word, dim, val_micros
               FROM '{_W2V_FIXTURE}'),
toks AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents),
tok AS (SELECT doc_id, len(t)::BIGINT AS n_tok, unnest(t) AS word
        FROM toks),
dv AS (SELECT tok.doc_id AS doc_id, vocab.dim AS dim,
              floor(sum(vocab.val_micros) * 1.0 / max(tok.n_tok))::BIGINT
                AS m
       FROM tok JOIN vocab USING (word)
       GROUP BY tok.doc_id, vocab.dim),
vec AS (SELECT doc_id, list(m::DOUBLE ORDER BY dim) AS v
        FROM dv GROUP BY doc_id),
cents AS (SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS shard_id,
                 v AS cv
          FROM vec WHERE doc_id < 4),
qv AS (SELECT v AS q FROM vec WHERE doc_id = 10),
probe AS (SELECT shard_id FROM cents, qv
          ORDER BY list_distance(cv, q) ASC, shard_id ASC LIMIT 2),
assign AS (SELECT doc_id, shard_id FROM (
    SELECT vec.doc_id, c.shard_id,
           ROW_NUMBER() OVER (PARTITION BY vec.doc_id
                              ORDER BY list_distance(vec.v, c.cv) ASC,
                                       c.shard_id ASC) AS rn
    FROM vec, cents c) t WHERE rn = 1)
SELECT vec.doc_id AS vec_id, ROUND({_cos('vec.v', 'qv.q')}, 6) AS score
FROM vec JOIN assign USING (doc_id), qv
WHERE assign.shard_id IN (SELECT shard_id FROM probe)
ORDER BY score DESC, vec_id ASC
LIMIT 5
""",
)
def q_w2v_ivf_search(spark, sf_dir):
    """The reference's FULL lifecycle — embed texts, build the sharded
    index, embed a query, route, search (reference: src/test.py:132-145)
    — run end-to-end with a TRAINED embedder, oracle-checked (VERDICT r7
    item 3; `doc_search_hashed` covers the same lifecycle on the hashing
    rung). Embedder = the frozen fixtures/w2v_vocab_micros.parquet
    Word2Vec model applied by `embed.doc_embed_from_vocab_micros` (exact
    integer-micro transform, MLlib semantics); doc vectors stay in raw
    micro units — cosine is scale-invariant, and integer-valued doubles
    make every cross-engine product bit-exact. Centroids = the vectors of
    the 4 lowest doc ids (injected, like `_fixed_centroids`); query = doc
    10's vector; nprobe=2 of 4; k=5 cosine, 6dp, (score DESC, id ASC).

    Plan: vocab broadcast + (doc,dim) partial agg (the transform), one
    groupBy(doc) pivot to arrays (keyed shuffle, no skew — dims per doc
    = model dim), vectors frame cached (three consumers: centroid
    collect, query collect, search scan; at 100 TB this frame IS the
    persisted index — built once, like IVFPQIndex — so the cache stands
    in for the index build), then the standard IVF read path:
    argmin-projection shard assign (narrow), probe-pruned filter,
    per-partition TakeOrdered + driver merge."""
    from distributed_vector_database_spark.functions.embed import (
        doc_embed_from_vocab_micros,
    )
    from distributed_vector_database_spark.operators.ivf import (
        assign_shards,
        nearest_shards,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    vocab = spark.read.parquet(_W2V_FIXTURE)
    dv = doc_embed_from_vocab_micros(docs, vocab)
    vec = (
        dv.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_micros"))
            ).alias("_s")
        )
        .select(
            F.col("doc_id").alias("vec_id"),
            F.expr(
                "transform(_s, x -> cast(x.mean_micros AS double))"
            ).alias("embedding"),
        )
        .cache()
    )
    crows = (
        vec.filter(F.col("vec_id") < 4)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cents = [[float(x) for x in r[0]] for r in crows]
    qrow = vec.filter(F.col("vec_id") == 10).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    shards = nearest_shards(qv, cents, nprobe=2)
    cand = assign_shards(vec, cents).filter(F.col("shard_id").isin(shards))
    return topk(cand, qv, k=5, metric="cosine")


def _minhash_op_points_sql(
    configs: tuple = ((8, 2), (8, 4), (16, 4), (16, 8)),
    threshold: float = 0.5,
) -> str:
    blocks, selects = [], []
    for ci, (nh, b) in enumerate(configs):
        rows = nh // b
        mins = ", ".join(
            f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(nh)
        )
        band_exprs = ", ".join(
            "md5("
            + " || ".join(f"mh{bb * rows + r}" for r in range(rows))
            + f") AS band{bb}"
            for bb in range(b)
        )
        stacked = " UNION ALL ".join(
            f"SELECT doc_id, {bb} AS band_ix, band{bb} AS bv"
            f" FROM banded{ci}"
            for bb in range(b)
        )
        blocks.append(
            f"""
sig{ci} AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
banded{ci} AS (SELECT doc_id, {band_exprs} FROM sig{ci}),
st{ci} AS ({stacked}),
cand{ci} AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM st{ci} a JOIN st{ci} b
               ON a.band_ix = b.band_ix AND a.bv = b.bv
              AND a.doc_id < b.doc_id)"""
        )
        selects.append(
            f"""
SELECT {nh}::BIGINT AS num_hashes, {b}::BIGINT AS bands,
       (SELECT count(*) FROM cand{ci})::BIGINT AS n_candidates,
       (SELECT count(*) FROM truth)::BIGINT AS n_true,
       (SELECT count(*) FROM cand{ci} c
         JOIN truth t ON c.da = t.da AND c.db = t.db)::BIGINT AS n_hits"""
        )
    inter = "len(list_intersect(ha.s, hb.s))"
    return f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
cpair AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
          FROM ex x JOIN ex y ON x.sg = y.sg AND x.doc_id < y.doc_id),
truth AS (SELECT da, db FROM cpair
          JOIN sh ha ON ha.doc_id = cpair.da
          JOIN sh hb ON hb.doc_id = cpair.db
          WHERE round({inter} * 1.0
                / (len(ha.s) + len(hb.s) - {inter}), 6) >= {threshold}),
{','.join(blocks)},
base AS ({' UNION ALL '.join(selects)})
SELECT num_hashes, bands, n_candidates, n_true, n_hits,
       CASE WHEN n_true > 0
            THEN ((2000000 * n_hits + n_true) // (2 * n_true)) / 1e6
       END AS recall,
       CASE WHEN n_candidates > 0
            THEN ((2000000 * n_hits + n_candidates)
                  // (2 * n_candidates)) / 1e6
       END AS "precision"
FROM base
"""


def _hll_sql(p: int = 8) -> str:
    from distributed_vector_database_spark.operators.sketch import (
        hll_alpha_numerator,
    )

    m = 1 << p
    two49 = 1 << 49
    return f"""
WITH w0 AS (SELECT event_type, user_id,
        ('0x' || substr(md5('r:' || user_id::VARCHAR), 1, 12))::BIGINT
          % {m} AS reg,
        ('0x' || substr(md5('q:' || user_id::VARCHAR), 1, 12))::BIGINT AS w
      FROM events),
regs AS (SELECT event_type, reg,
           max(CASE WHEN w = 0 THEN 49
                    ELSE 49 - length(bin(w)) END) AS rnk
         FROM w0 GROUP BY 1, 2),
agg AS (SELECT event_type,
          sum(1::BIGINT << (49 - rnk))::BIGINT AS s,
          count(*)::BIGINT AS nreg
        FROM regs GROUP BY 1),
est AS (SELECT event_type, ({m} - nreg) AS v,
          {hll_alpha_numerator(p)!r}
            / (s + ({m} - nreg) * {two49})::DOUBLE AS raw
        FROM agg),
ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
       FROM events GROUP BY 1)
SELECT est.event_type AS event_type,
       round(CASE WHEN raw <= {2.5 * m!r} AND v > 0
                  THEN {float(m)!r} * ln({float(m)!r} / v)
                  ELSE raw END, 6) AS hll_distinct,
       ex.exact_distinct AS exact_distinct
FROM est JOIN ex ON est.event_type = ex.event_type
"""


@register("hll_distinct_users_by_type", _hll_sql())
def q_hll_distinct_users_by_type(spark, sf_dir):
    """Portable HyperLogLog distinct-user estimate per event type, exact
    count(distinct) alongside (`sketch.hll_build/hll_estimate`) — the
    fixed-size industry-standard distinct counter joining the mergeable
    family (frequency CMS, distinct-set KMV, membership Bloom, quantile
    HDR). Registers are exact integer max-ranks on the portable md5
    hash, so the estimate is bit-comparable across engines; max-merge is
    IDEMPOTENT (safe under at-least-once replay without the overwrite
    protocol the sum-merged sketches need). Plan: one partial-agg max
    shuffle to <= 2^p register rows per group, one register-sized
    aggregate — the corpus is scanned once, nothing corpus-scale
    shuffles."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    ev = _read(spark, sf_dir, "events")
    sk = hll_build(ev, "user_id", p=8, group_cols=["event_type"])
    est = hll_estimate(sk, p=8, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "hll_distinct", "exact_distinct"
    )


_HLL_STATE_CACHE: dict[str, str] = {}


def _hll_global_sql(p: int = 8) -> str:
    from distributed_vector_database_spark.operators.sketch import (
        hll_alpha_numerator,
    )

    m = 1 << p
    two49 = 1 << 49
    return f"""
WITH w0 AS (SELECT
        ('0x' || substr(md5('r:' || user_id::VARCHAR), 1, 12))::BIGINT
          % {m} AS reg,
        ('0x' || substr(md5('q:' || user_id::VARCHAR), 1, 12))::BIGINT AS w
      FROM events),
regs AS (SELECT reg,
           max(CASE WHEN w = 0 THEN 49
                    ELSE 49 - length(bin(w)) END) AS rnk
         FROM w0 GROUP BY 1),
agg AS (SELECT sum(1::BIGINT << (49 - rnk))::BIGINT AS s,
               count(*)::BIGINT AS nreg
        FROM regs),
est AS (SELECT ({m} - nreg) AS v,
          {hll_alpha_numerator(p)!r}
            / (s + ({m} - nreg) * {two49})::DOUBLE AS raw
        FROM agg)
SELECT round(CASE WHEN raw <= {2.5 * m!r} AND v > 0
                  THEN {float(m)!r} * ln({float(m)!r} / v)
                  ELSE raw END, 6) AS hll_distinct,
       (SELECT count(DISTINCT user_id)::BIGINT FROM events)
         AS exact_distinct
FROM est
"""


@register("stream_hll_distinct_users", _hll_global_sql())
def q_stream_hll_distinct_users(spark, sf_dir):
    """The STREAM-maintained twin of the HLL row: the event log replayed
    as unordered micro-batches, each APPENDING its batch-local register
    partial — no overwrite protocol, because max-merge is IDEMPOTENT (a
    re-delivered partial is absorbed; the sum-merged CMS/HDR streams need
    per-batch overwrite dirs to stay at-least-once-safe). The merged
    registers must equal the one-shot batch build exactly, so the oracle
    is the plain batch SQL regardless of chunking. Ingest runs once per
    process; repeat calls query the live state (`read_hll`)."""
    import tempfile

    from distributed_vector_database_spark.operators.sketch import (
        hll_estimate,
    )
    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        read_hll,
        stream_hll_registers,
    )

    state = _HLL_STATE_CACHE.get(sf_dir)
    if state is not None:
        sketch = read_hll(spark, state)
    else:
        d = _STREAM_INPUT_CACHE.get(f"{sf_dir}#full")
        if d is None:
            src = _read(spark, sf_dir, "events")
            d = tempfile.mkdtemp(prefix="dvdb_streamfull_")
            src.repartition(4).write.mode("overwrite").parquet(d)
            _STREAM_INPUT_CACHE[f"{sf_dir}#full"] = d
        state = tempfile.mkdtemp(prefix="dvdb_hllstate_")
        sketch = stream_hll_registers(
            read_event_stream(spark, d, max_files_per_trigger=2),
            state,
            key_col="user_id",
            p=8,
        )
        _HLL_STATE_CACHE[sf_dir] = state
    est = hll_estimate(sketch, p=8)
    exact = _read(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.crossJoin(exact)


@register(
    "cdc_chunk_dedup_stats",
    f"""
WITH {_TOKS_CTE},
tt AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
bs AS (SELECT doc_id, t, n,
         list_prepend(1, list_transform(
           list_filter(range(1, n + 1),
             p -> p < n AND
                  ('0x' || substr(md5('c:' || t[p]), 1, 12))::BIGINT
                    % 16 = 0),
           p -> p + 1)) AS starts
       FROM tt),
ch AS (SELECT doc_id,
         md5(array_to_string(
           t[u.c.s : coalesce(starts[u.c.ix + 2] - 1, n)], ' ')) AS h,
         coalesce(starts[u.c.ix + 2] - 1, n) - u.c.s + 1 AS toklen
       FROM bs, unnest(list_transform(starts,
              (s, i) -> {{'ix': i - 1, 's': s}})) AS u(c)),
per AS (SELECT h, count(*) AS cnt, max(toklen) AS toklen
        FROM ch GROUP BY h)
SELECT sum(cnt)::BIGINT AS n_chunks,
       count(*)::BIGINT AS n_distinct_chunks,
       sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::BIGINT
         AS n_dup_occurrences,
       sum((cnt - 1) * toklen)::BIGINT AS dup_tokens
FROM per
""",
)
def q_cdc_chunk_dedup_stats(spark, sf_dir):
    """Chunk-level dedup ledger over content-defined chunks
    (`chunking.cdc_chunk_documents`, mask_bits=4 — expected 16-token
    chunks): total chunks, distinct chunk hashes, occurrences of
    duplicated chunks, and the redundant token mass a chunk-store would
    save — the storage-dedup view of corpus redundancy, complementary to
    the document- (MinHash), substring- (winnowing) and semantic-
    (SemDeDup) granularities. CDC (LBFS, SOSP'01) is the chunker that
    keeps chunk identities STABLE under edits: an insertion perturbs one
    chunk and boundaries resynchronize (property-tested), so shared
    content keeps deduplicating after revisions — a fixed window shifts
    every downstream chunk and loses it all.

    Plan: chunking is pure narrow Catalyst (no shuffle, no window); the
    ledger is one partial-agg groupBy on the uniform md5 chunk key + a
    one-row rollup. Same shape at 100 TB."""
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ch = cdc_chunk_documents(docs, mask_bits=4)
    per = ch.groupBy("chunk_hash").agg(
        F.count("*").alias("cnt"),
        F.max("n_chunk_tokens").alias("toklen"),
    )
    return per.agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct_chunks"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_dup_occurrences"),
        F.sum((F.col("cnt") - 1) * F.col("toklen"))
        .cast("long")
        .alias("dup_tokens"),
    )


_CDC_FLAGS_SQL = f"""
WITH {_TOKS_CTE},
tt AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
bs AS (SELECT doc_id, t, n,
         list_prepend(1, list_transform(
           list_filter(range(1, n + 1),
             p -> p < n AND
                  ('0x' || substr(md5('c:' || t[p]), 1, 12))::BIGINT
                    % 16 = 0),
           p -> p + 1)) AS starts
       FROM tt),
ch AS (SELECT doc_id,
         md5(array_to_string(
           t[u.c.s : coalesce(starts[u.c.ix + 2] - 1, n)], ' ')) AS h
       FROM bs, unnest(list_transform(starts,
              (s, i) -> {{'ix': i - 1, 's': s}})) AS u(c)),
own AS (SELECT h, min(doc_id) AS owner FROM ch GROUP BY 1)
SELECT ch.doc_id AS doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN own.owner < ch.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_owned_elsewhere,
       (sum(CASE WHEN own.owner < ch.doc_id THEN 1 ELSE 0 END) >= 1)
         AS is_chunk_dup
FROM ch JOIN own USING (h)
GROUP BY ch.doc_id
"""


@register("cdc_chunk_dup_flags", _CDC_FLAGS_SQL)
def q_cdc_chunk_dup_flags(spark, sf_dir):
    """Chunk-level dup DECISION without pair mining
    (`dedup.cdc_chunk_dup_flags`): every CDC chunk hash owned by the
    lowest doc id containing it; a doc flags when >= 1 of its chunks is
    owned by a smaller id — the owner-screen rule at storage granularity
    (the minhash/winnow screens' CDC sibling). Edit-stable: a revised
    copy still flags on its unchanged chunks. Plan: narrow chunker, one
    partial-agg min on the uniform md5 key + join-back — no window, no
    pair fan-out."""
    from distributed_vector_database_spark.operators.dedup import (
        cdc_chunk_dup_flags,
    )

    return cdc_chunk_dup_flags(
        _spread_read(spark, sf_dir, "documents"), mask_bits=4
    )


_CDC_STATE_CACHE: dict[str, str] = {}


@register("stream_cdc_chunk_dup_flags", _CDC_FLAGS_SQL)
def q_stream_cdc_chunk_dup_flags(spark, sf_dir):
    """The STREAM-maintained twin of `cdc_chunk_dup_flags`
    (`streaming.docs.stream_cdc_chunk_dedup`): the corpus replayed as
    id-ordered micro-batches against an incremental (chunk_hash ->
    lowest owner) index — the live dedup-store directory. For ordered
    arrival the accumulated decisions equal the batch form under any
    chunking of the stream, so the oracle is the same batch SQL. Ingest
    runs once per process; repeat calls read the maintained state
    (`read_cdc_flags`)."""
    from distributed_vector_database_spark.streaming.docs import (
        read_cdc_flags,
        read_document_stream,
        stream_cdc_chunk_dedup,
    )

    state = _CDC_STATE_CACHE.get(sf_dir)
    if state is not None:
        out = read_cdc_flags(spark, state)
    else:
        import tempfile

        d = _ordered_two_chunk_replay_dir(spark, sf_dir)
        state = tempfile.mkdtemp(prefix="dvdb_cdcstate_")
        out = stream_cdc_chunk_dedup(
            read_document_stream(spark, d, max_files_per_trigger=1),
            state,
            mask_bits=4,
        )
        _CDC_STATE_CACHE[sf_dir] = state
    return out.select(
        "doc_id", "n_chunks", "n_owned_elsewhere", "is_chunk_dup"
    )


_KMV_STATE_CACHE: dict[str, str] = {}


@register(
    "stream_kmv_distinct_users",
    """
WITH d AS (SELECT DISTINCT user_id FROM events),
h AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT
               / 281474976710656.0 AS _h
      FROM d),
r AS (SELECT _h, row_number() OVER (ORDER BY _h ASC) AS _rn FROM h),
a AS (SELECT count(*) AS _ns,
             max(CASE WHEN _rn = 64 THEN _h END) AS _hk
      FROM r WHERE _rn <= 64)
SELECT (CASE WHEN _ns < 64 THEN _ns
             ELSE round(63.0 / _hk)::BIGINT END)::BIGINT AS kmv_distinct,
       (SELECT count(DISTINCT user_id)::BIGINT FROM events)
         AS exact_distinct
FROM a
""",
)
def q_stream_kmv_distinct_users(spark, sf_dir):
    """The STREAM-maintained KMV distinct sketch
    (`streaming.events.stream_kmv_values`) — with this row every member
    of the mergeable sketch family has a streaming twin (CMS/HDR sums,
    HLL max, KMV k-smallest). Per-batch k-smallest partials are PLAIN
    APPENDS (distinct-union merge is idempotent — same delivery story as
    the HLL twin); the merged top-k equals the batch sketch for ANY
    chunking because every global k-smallest hash is in its own batch's
    k-smallest. Estimator is the SKETCH-ONLY form (n < k -> exact n,
    else (k-1)/h_k — the classic KMV rule; unlike `kmv_distinct`'s
    full-data `_nd` it never peeks past the sketch, which is all a
    stream ever has). Exact count rides alongside. Ingest once per
    process; repeat calls read the maintained state."""
    import tempfile

    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        read_kmv,
        stream_kmv_values,
    )

    state = _KMV_STATE_CACHE.get(sf_dir)
    if state is not None:
        sketch = read_kmv(spark, state, k=64)
    else:
        d = _STREAM_INPUT_CACHE.get(f"{sf_dir}#full")
        if d is None:
            src = _read(spark, sf_dir, "events")
            d = tempfile.mkdtemp(prefix="dvdb_streamfull_")
            src.repartition(4).write.mode("overwrite").parquet(d)
            _STREAM_INPUT_CACHE[f"{sf_dir}#full"] = d
        state = tempfile.mkdtemp(prefix="dvdb_kmvstate_")
        sketch = stream_kmv_values(
            read_event_stream(spark, d, max_files_per_trigger=2),
            state,
            key_col="user_id",
            k=64,
        )
        _KMV_STATE_CACHE[sf_dir] = state
    agg = sketch.agg(
        F.count("*").alias("_ns"),
        F.max(F.col("_h")).alias("_hmax"),
    )
    est = F.when(F.col("_ns") < 64, F.col("_ns").cast("long")).otherwise(
        F.round(F.lit(63.0) / F.col("_hmax")).cast("long")
    )
    exact = _read(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return agg.select(est.alias("kmv_distinct")).crossJoin(exact)


@register(
    "cdc_shared_chunk_pairs",
    f"""
WITH {_TOKS_CTE},
tt AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
bs AS (SELECT doc_id, t, n,
         list_prepend(1, list_transform(
           list_filter(range(1, n + 1),
             p -> p < n AND
                  ('0x' || substr(md5('c:' || t[p]), 1, 12))::BIGINT
                    % 16 = 0),
           p -> p + 1)) AS starts
       FROM tt),
ch AS (SELECT DISTINCT doc_id,
         md5(array_to_string(
           t[u.c.s : coalesce(starts[u.c.ix + 2] - 1, n)], ' ')) AS h
       FROM bs, unnest(list_transform(starts,
              (s, i) -> {{'ix': i - 1, 's': s}})) AS u(c)),
sizes AS (SELECT doc_id, count(*)::BIGINT AS nc FROM ch GROUP BY 1),
keep AS (SELECT h FROM ch GROUP BY h HAVING count(*) <= 10),
kept AS (SELECT ch.doc_id, ch.h FROM ch JOIN keep USING (h)),
pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
                 count(*)::BIGINT AS n_shared
          FROM kept a JOIN kept b
            ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING count(*) >= 1)
SELECT pairs.da AS doc_id_a, pairs.db AS doc_id_b, pairs.n_shared,
       ((2000000 * pairs.n_shared + least(sa.nc, sb.nc))
        // (2 * least(sa.nc, sb.nc))) / 1e6 AS containment
FROM pairs JOIN sizes sa ON sa.doc_id = pairs.da
           JOIN sizes sb ON sb.doc_id = pairs.db
""",
)
def q_cdc_shared_chunk_pairs(spark, sf_dir):
    """Document pairs sharing content-defined chunks
    (`dedup.cdc_shared_chunk_pairs`, max_df=10) — partial-copy
    provenance at storage granularity, the WHO to the owner screen's
    that-someone-owns-it; containment = shared / min chunk-set size
    (exact-integer 6dp), 1.0 = the smaller doc's chunks are a subset.
    df-capped before the self-join (bounded-block discipline: a
    boilerplate chunk never fans out; the screen covers that regime)."""
    from distributed_vector_database_spark.operators.dedup import (
        cdc_shared_chunk_pairs,
    )

    return cdc_shared_chunk_pairs(
        _spread_read(spark, sf_dir, "documents"), mask_bits=4, max_df=10
    )


@register(
    "dedup_exact_alnum",
    """
WITH h AS (SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\\s]+', '', 'g'), '\\s+', ' ', 'g'))) AS hh
           FROM documents),
g AS (SELECT hh, min(doc_id) AS rep, count(*)::BIGINT AS n
      FROM h GROUP BY 1)
SELECT h.doc_id AS doc_id, g.rep AS rep_doc_id, g.n AS dup_count,
       h.doc_id <> g.rep AS is_dropped
FROM h JOIN g USING (hh)
""",
)
def q_dedup_exact_alnum(spark, sf_dir):
    """Punctuation-insensitive EXACT dedup
    (`functions.text.doc_fingerprint_alnum`: lower, strip non-alnum,
    collapse whitespace, md5) — the aggressive-normalization rung real
    pipelines run before any near-dup machinery: `"Hello, world!"` and
    `"hello world"` collapse to one fingerprint where the
    whitespace-only `dedup_exact` keeps both. Keep-lowest-id per group;
    (doc_id, rep_doc_id, dup_count, is_dropped). One partial-agg hash
    shuffle + join-back on the md5 key — flat at 100 TB like every
    owner screen."""
    from distributed_vector_database_spark.functions.text import (
        doc_fingerprint_alnum,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    h = docs.select(
        F.col("doc_id"), doc_fingerprint_alnum("text").alias("hh")
    )
    g = h.groupBy("hh").agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count("*").cast("long").alias("dup_count"),
    )
    return h.join(g, "hh").select(
        "doc_id",
        "rep_doc_id",
        "dup_count",
        (F.col("doc_id") != F.col("rep_doc_id")).alias("is_dropped"),
    )


@register(
    "dedup_modality_agreement",
    f"""
WITH {_SHINGLE_CTE},
eh AS (SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]+', '', 'g'), '\\s+', ' ', 'g'))) AS hh
       FROM documents),
eg AS (SELECT hh, min(doc_id) AS rep FROM eh GROUP BY 1),
ef AS (SELECT eh.doc_id, eh.doc_id <> eg.rep AS fx
       FROM eh JOIN eg USING (hh)),
ex2 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sig AS (SELECT doc_id,
        {', '.join(f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(8))}
        FROM ex2 GROUP BY doc_id),
banded AS (SELECT doc_id, md5(mh0 || mh1 || mh2 || mh3) AS band0,
                  md5(mh4 || mh5 || mh6 || mh7) AS band1 FROM sig),
st AS (SELECT doc_id, 0 AS band_ix, band0 AS bv FROM banded
       UNION ALL
       SELECT doc_id, 1 AS band_ix, band1 AS bv FROM banded),
mown AS (SELECT band_ix, bv, min(doc_id) AS owner FROM st GROUP BY 1, 2),
mf AS (SELECT st.doc_id,
              max(CASE WHEN mown.owner < st.doc_id THEN 1 ELSE 0 END) = 1
                AS fm
       FROM st JOIN mown USING (band_ix, bv) GROUP BY st.doc_id),
tt AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
bs AS (SELECT doc_id, t, n,
         list_prepend(1, list_transform(
           list_filter(range(1, n + 1),
             p -> p < n AND
                  ('0x' || substr(md5('c:' || t[p]), 1, 12))::BIGINT
                    % 16 = 0),
           p -> p + 1)) AS starts
       FROM tt),
cch AS (SELECT doc_id,
         md5(array_to_string(
           t[u.c.s : coalesce(starts[u.c.ix + 2] - 1, n)], ' ')) AS h
        FROM bs, unnest(list_transform(starts,
               (s, i) -> {{'ix': i - 1, 's': s}})) AS u(c)),
cown AS (SELECT h, min(doc_id) AS owner FROM cch GROUP BY 1),
cf AS (SELECT cch.doc_id,
              max(CASE WHEN cown.owner < cch.doc_id THEN 1 ELSE 0 END) = 1
                AS fc
       FROM cch JOIN cown USING (h) GROUP BY cch.doc_id),
j AS (SELECT ef.doc_id, ef.fx,
             coalesce(mf.fm, false) AS fm,
             coalesce(cf.fc, false) AS fc
      FROM ef LEFT JOIN mf USING (doc_id) LEFT JOIN cf USING (doc_id))
SELECT count(*)::BIGINT AS n_docs,
       sum(CASE WHEN fx THEN 1 ELSE 0 END)::BIGINT AS flagged_exact,
       sum(CASE WHEN fm THEN 1 ELSE 0 END)::BIGINT AS flagged_minhash,
       sum(CASE WHEN fc THEN 1 ELSE 0 END)::BIGINT AS flagged_cdc,
       sum(CASE WHEN fx AND fm THEN 1 ELSE 0 END)::BIGINT
         AS exact_and_minhash,
       sum(CASE WHEN fx AND fc THEN 1 ELSE 0 END)::BIGINT AS exact_and_cdc,
       sum(CASE WHEN fm AND fc THEN 1 ELSE 0 END)::BIGINT
         AS minhash_and_cdc,
       sum(CASE WHEN fx AND fm AND fc THEN 1 ELSE 0 END)::BIGINT
         AS all_three
FROM j
""",
)
def q_dedup_modality_agreement(spark, sf_dir):
    """The dedup-modality dashboard in one row: how many docs each
    keep-lowest-id screen flags — punctuation-insensitive EXACT
    (`doc_fingerprint_alnum`), near-dup MinHash-LSH buckets
    (`minhash_bucket_dup_flags`, 8 hashes / 2 bands), and
    content-defined CHUNK overlap (`cdc_chunk_dup_flags`) — plus every
    pairwise overlap and the triple intersection. The containment chain
    the counts should (and at sf0.01 do) respect: an exact copy shares
    all chunks and all bands, so exact ⊆ the others up to banding
    probability; the gaps BETWEEN the counts are each modality's
    exclusive catch (reformatting → exact-alnum only; partial copies →
    CDC only; fuzzy rewrites → MinHash only). Plan: three independent
    owner screens (each one partial-agg min + join-back on an md5 key)
    + two doc-keyed left joins + one global rollup — no pair fan-out
    anywhere, flat at 100 TB."""
    from distributed_vector_database_spark.functions.text import (
        doc_fingerprint_alnum,
    )
    from distributed_vector_database_spark.operators.dedup import (
        cdc_chunk_dup_flags,
        minhash_bucket_dup_flags,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    h = docs.select(
        F.col("doc_id"), doc_fingerprint_alnum("text").alias("hh")
    )
    g = h.groupBy("hh").agg(F.min("doc_id").alias("rep"))
    ef = h.join(g, "hh").select(
        "doc_id", (F.col("doc_id") != F.col("rep")).alias("fx")
    )
    mf = minhash_bucket_dup_flags(docs, num_hashes=8, bands=2).select(
        "doc_id", F.col("is_dup").alias("fm")
    )
    cf = cdc_chunk_dup_flags(docs, mask_bits=4).select(
        "doc_id", F.col("is_chunk_dup").alias("fc")
    )
    j = (
        ef.join(mf, "doc_id", "left")
        .join(cf, "doc_id", "left")
        .select(
            "fx",
            F.coalesce("fm", F.lit(False)).alias("fm"),
            F.coalesce("fc", F.lit(False)).alias("fc"),
        )
    )

    def cnt(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    return j.agg(
        F.count("*").cast("long").alias("n_docs"),
        cnt(F.col("fx"), "flagged_exact"),
        cnt(F.col("fm"), "flagged_minhash"),
        cnt(F.col("fc"), "flagged_cdc"),
        cnt(F.col("fx") & F.col("fm"), "exact_and_minhash"),
        cnt(F.col("fx") & F.col("fc"), "exact_and_cdc"),
        cnt(F.col("fm") & F.col("fc"), "minhash_and_cdc"),
        cnt(F.col("fx") & F.col("fm") & F.col("fc"), "all_three"),
    )


@register("minhash_operating_points", _minhash_op_points_sql())
def q_minhash_operating_points(spark, sf_dir):
    """The LSH banding TUNING curve as a driver row (VERDICT r7 item 6 —
    the `ivf_recall_curve` of the dedup family): candidate-pair recall
    and precision of each (num_hashes, bands) configuration against the
    EXACT Jaccard >= 0.5 pair set, exact integer counts
    (`dedup.minhash_operating_points`). Truth = the prefix-filtered
    exact pairs kernel, computed once; each config adds one banding
    self-join (the cost its production flags pay anyway) + one broadcast
    join against the small truth frame. More bands at fixed num_hashes
    moves along the 1-(1-s^r)^b s-curve: recall up, precision down —
    this row pins where the corpus actually sits."""
    docs = _spread_read(spark, sf_dir, "documents")
    return _dd.minhash_operating_points(docs)


_CDC_CHUNK_SEARCH_SQL = f"""
WITH {_TOKS_CTE},
tt AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
bs AS (SELECT doc_id, t, n,
         list_prepend(1, list_transform(
           list_filter(range(1, n + 1),
             p -> p < n AND
                  ('0x' || substr(md5('c:' || t[p]), 1, 12))::BIGINT
                    % 16 = 0),
           p -> p + 1)) AS starts
       FROM tt),
ch AS (SELECT doc_id, u.c.ix AS chunk_ix,
         t[u.c.s : coalesce(starts[u.c.ix + 2] - 1, n)] AS ct
       FROM bs, unnest(list_transform(starts,
              (s, i) -> {{'ix': i - 1, 's': s}})) AS u(c)),
tk AS (SELECT doc_id, chunk_ix, unnest(ct) AS tok FROM ch),
sp AS (SELECT doc_id, chunk_ix, {_bucket_sql('tok')} AS bucket,
              count(*) AS cnt
       FROM tk GROUP BY 1, 2, 3),
nrm AS (SELECT doc_id, chunk_ix, sqrt(sum(cnt * cnt)::DOUBLE) AS nn
        FROM sp GROUP BY 1, 2),
qd AS (SELECT {_bucket_sql('tok')} AS bucket, count(*) AS cnt
       FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id = 0)
       GROUP BY 1),
qn AS (SELECT sqrt(sum(cnt * cnt)::DOUBLE) AS qn FROM qd),
dotp AS (SELECT sp.doc_id, sp.chunk_ix, sum(sp.cnt * qd.cnt)::DOUBLE AS dp
         FROM sp JOIN qd USING (bucket) GROUP BY 1, 2)
SELECT n2.doc_id AS doc_id, n2.chunk_ix::BIGINT AS chunk_ix,
       ROUND(COALESCE(dotp.dp, 0.0) / (n2.nn * (SELECT qn FROM qn)), 6)
         AS score
FROM nrm n2 LEFT JOIN dotp USING (doc_id, chunk_ix)
ORDER BY score DESC, doc_id ASC, chunk_ix ASC
LIMIT 10
"""


@register("cdc_chunk_search_hashed", _CDC_CHUNK_SEARCH_SQL)
def q_cdc_chunk_search_hashed(spark, sf_dir):
    """The RAG read path at CDC-chunk granularity (VERDICT r8 item 7 —
    the retrieval composition of `chunking.cdc_chunk_documents`,
    completing the lifecycle `reference: src/test.py:132-145` runs at
    document granularity): content-defined chunks (mask_bits=4) ->
    hash-embed each chunk -> top-10 cosine for the doc_id=0 query
    document. Unlike the fixed-window twin (`chunk_search_hashed`),
    chunk identities here are EDIT-STABLE: revising one passage perturbs
    one chunk's embedding and every other chunk (and its index entry)
    survives — the property an incrementally-maintained chunk index at
    100 TB needs, since a fixed window would re-embed and re-index every
    downstream chunk of every edited document.

    Plan: narrow CDC chunker (no shuffle/UDF) -> hash-embed groupBy ->
    TakeOrdered top-k; the composite (doc_id, chunk_ix) key rides one
    packed long through the top-k kernel (chunk_ix < 2^16: bounded by
    tokens per doc, and the packed-key order makes score ties
    deterministic as (score DESC, doc ASC, chunk ASC) on both engines).
    """
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ch = cdc_chunk_documents(docs, mask_bits=4).select(
        (F.col("doc_id") * 65536 + F.col("chunk_ix")).alias("chunk_key"),
        "chunk_text",
    )
    dense = hashing_embed(
        ch, dim=64, normalize=False, text_col="chunk_text",
        id_col="chunk_key",
    )
    qv = _doc0_hash_qv(spark, sf_dir)
    out = topk(dense, qv, k=10, vector_col="embedding", id_col="chunk_key")
    return out.select(
        (F.col("chunk_key") / 65536).cast("long").alias("doc_id"),
        (F.col("chunk_key") % 65536).cast("long").alias("chunk_ix"),
        "score",
    )


_CDC_INDEX_STATE_CACHE: dict[str, str] = {}


@register("stream_cdc_chunk_search", _CDC_CHUNK_SEARCH_SQL)
def q_stream_cdc_chunk_search(spark, sf_dir):
    """Search over the STREAM-MAINTAINED chunk embedding index
    (`streaming.docs.stream_cdc_chunk_index`) — the incremental half of
    the `cdc_chunk_search_hashed` lifecycle: documents arrive as
    micro-batches, each batch chunk-embeds only its OWN docs into the
    persisted index, and the read path searches the maintained state
    with no corpus re-scan. Chunk embedding is per-doc-deterministic
    (CDC boundaries + hash buckets, no cross-doc state), so the
    maintained index == the batch index for ANY chunking of the stream
    and the oracle is the same batch SQL. Redelivery-safe twice over:
    per-batch overwrite dirs absorb a batch re-run; a doc re-delivered
    in a later batch resolves latest-batch-wins at read. Ingest runs
    once per process; repeat calls read the maintained state."""
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.streaming.docs import (
        read_cdc_chunk_index,
        read_document_stream,
        stream_cdc_chunk_index,
    )

    state = _CDC_INDEX_STATE_CACHE.get(sf_dir)
    if state is not None:
        idx = read_cdc_chunk_index(spark, state)
    else:
        import tempfile

        d = _ordered_two_chunk_replay_dir(spark, sf_dir)
        state = tempfile.mkdtemp(prefix="dvdb_cdcidx_")
        idx = stream_cdc_chunk_index(
            read_document_stream(spark, d, max_files_per_trigger=1),
            state,
            mask_bits=4,
            dim=64,
        )
        _CDC_INDEX_STATE_CACHE[sf_dir] = state
    docs = _read(spark, sf_dir, "documents")
    qv = _doc0_hash_qv(spark, sf_dir)
    dense = idx.select(
        (F.col("doc_id") * 65536 + F.col("chunk_ix")).alias("chunk_key"),
        "embedding",
    )
    out = topk(dense, qv, k=10, vector_col="embedding", id_col="chunk_key")
    return out.select(
        (F.col("chunk_key") / 65536).cast("long").alias("doc_id"),
        (F.col("chunk_key") % 65536).cast("long").alias("chunk_ix"),
        "score",
    )


_DOC_NOVELTY_SQL = f"""
WITH {_TOKS_CTE},
sh AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
g AS (SELECT doc_id, unnest(s) AS g FROM sh),
own AS (SELECT g, min(doc_id) AS owner FROM g GROUP BY 1),
per AS (SELECT g.doc_id AS doc_id, count(*) AS n_grams,
               sum(CASE WHEN own.owner = g.doc_id THEN 1 ELSE 0 END)
                 AS n_novel
        FROM g JOIN own USING (g) GROUP BY 1)
SELECT doc_id, n_grams::BIGINT AS n_grams, n_novel::BIGINT AS n_novel,
       ((2000000 * n_novel + n_grams) // (2 * n_grams)) / 1e6 AS novelty
FROM per
"""


@register("doc_novelty_ngram", _DOC_NOVELTY_SQL)
def q_doc_novelty_ngram(spark, sf_dir):
    """Per-doc 3-gram NOVELTY vs every earlier (lower-id) document
    (`text_analysis.novelty_scores`) — the graded curation complement of
    the dedup owner screens: recycled/boilerplate-heavy docs score near
    0, first occurrences near 1 ("prefer fresh text" selection, the
    scoring view of what `winnow_dup_flags`/`dedup_exact` decide).
    Exact-integer 6dp ratio on both engines (the KN-ppl rounding
    lesson). Plan: one shingle explode + partial-agg min on the uniform
    gram key + join back + per-doc agg — the flat owner-screen shape,
    no pair fan-out, same cost family at 100 TB as the screens already
    measured flat in SCALING.md."""
    return _ta.novelty_scores(
        _spread_read(spark, sf_dir, "documents"), n=3
    )


def _hll_overlap_sql(p: int = 8) -> str:
    from distributed_vector_database_spark.operators.sketch import (
        hll_alpha_numerator,
    )

    m = 1 << p
    two49 = 1 << 49
    est = (
        "round(CASE WHEN raw <= {lim!r} AND v > 0"
        "           THEN {mf!r} * ln({mf!r} / v)"
        "           ELSE raw END, 6)"
    ).format(lim=2.5 * m, mf=float(m))
    block = (
        "(SELECT {est} FROM"
        " (SELECT ({m} - nreg) AS v,"
        "         {alpha!r} / (s + ({m} - nreg) * {two49})::DOUBLE AS raw"
        "  FROM (SELECT sum(1::BIGINT << (49 - rnk))::BIGINT AS s,"
        "               count(*)::BIGINT AS nreg FROM {src})))"
    )

    def estimate(src: str) -> str:
        return block.format(
            est=est, m=m, alpha=hll_alpha_numerator(p), two49=two49, src=src
        )

    return f"""
WITH w0 AS (SELECT o_custkey AS k, year(o_orderdate) AS y,
        ('0x' || substr(md5('r:' || o_custkey::VARCHAR), 1, 12))::BIGINT
          % {m} AS reg,
        ('0x' || substr(md5('q:' || o_custkey::VARCHAR), 1, 12))::BIGINT AS w
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)),
ra AS (SELECT reg, max(CASE WHEN w = 0 THEN 49
                            ELSE 49 - length(bin(w)) END) AS rnk
       FROM w0 WHERE y = 1995 GROUP BY 1),
rb AS (SELECT reg, max(CASE WHEN w = 0 THEN 49
                            ELSE 49 - length(bin(w)) END) AS rnk
       FROM w0 WHERE y = 1996 GROUP BY 1),
ru AS (SELECT reg, max(rnk) AS rnk
       FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
e AS (SELECT {estimate('ra')} AS hll_a,
             {estimate('rb')} AS hll_b,
             {estimate('ru')} AS hll_union)
SELECT hll_a, hll_b, hll_union,
       round(greatest(hll_a + hll_b - hll_union, 0.0), 6) AS hll_intersect,
       (SELECT count(DISTINCT k) FROM w0)::BIGINT AS exact_union,
       (SELECT count(*) FROM (SELECT k FROM w0 GROUP BY k
                              HAVING count(DISTINCT y) = 2))::BIGINT
         AS exact_intersect
FROM e
"""


@register("hll_order_year_overlap", _hll_overlap_sql())
def q_hll_order_year_overlap(spark, sf_dir):
    """Customer-set overlap across adjacent order years in HLL REGISTER
    space (`sketch.hll_set_estimates`) — the HLL twin of
    `kmv_order_year_overlap`, closing the set-algebra story for the max-
    merge sketch: the union estimate is EXACT in sketch space (max-merged
    registers ARE the union's sketch — what makes per-shard HLL partials
    composable at 100 TB with no re-scan), and intersection is
    inclusion–exclusion over the three estimates, clamped at 0. Exact
    union/intersection counts ride alongside so the estimate error is an
    auditable column, not an assumption. Register-sized work: two
    2^8-register builds from year-filtered scans, one max-merge, a
    single-row crossJoin."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_set_estimates,
    )

    orders = _read(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    a = orders.filter(year == 1995).select("o_custkey")
    b = orders.filter(year == 1996).select("o_custkey")
    ests = hll_set_estimates(
        hll_build(a, "o_custkey", p=8), hll_build(b, "o_custkey", p=8), p=8
    )
    exact_u = a.union(b).agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_union")
    )
    exact_i = (
        a.distinct()
        .join(b.distinct(), "o_custkey", "left_semi")
        .agg(F.count("*").cast("long").alias("exact_intersect"))
    )
    return ests.crossJoin(exact_u).crossJoin(exact_i)


def _hll_rollup_sql(p: int = 8) -> str:
    from distributed_vector_database_spark.operators.sketch import (
        hll_alpha_numerator,
    )

    m = 1 << p
    two49 = 1 << 49
    est = (
        "round(CASE WHEN raw <= {lim!r} AND v > 0"
        "           THEN {mf!r} * ln({mf!r} / v)"
        "           ELSE raw END, 6)"
    ).format(lim=2.5 * m, mf=float(m))
    return f"""
WITH w0 AS (SELECT event_type, user_id,
        ('0x' || substr(md5('r:' || user_id::VARCHAR), 1, 12))::BIGINT
          % {m} AS reg,
        ('0x' || substr(md5('q:' || user_id::VARCHAR), 1, 12))::BIGINT AS w
      FROM events),
regs AS (SELECT event_type, reg,
           max(CASE WHEN w = 0 THEN 49
                    ELSE 49 - length(bin(w)) END) AS rnk
         FROM w0 GROUP BY 1, 2),
lv AS (SELECT event_type, reg, rnk FROM regs
       UNION ALL
       SELECT 'ALL' AS event_type, reg, max(rnk) AS rnk
       FROM regs GROUP BY reg),
agg AS (SELECT event_type,
          sum(1::BIGINT << (49 - rnk))::BIGINT AS s,
          count(*)::BIGINT AS nreg
        FROM lv GROUP BY 1),
e AS (SELECT event_type, ({m} - nreg) AS v,
        {hll_alpha_numerator(p)!r}
          / (s + ({m} - nreg) * {two49})::DOUBLE AS raw
      FROM agg),
ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
       FROM events GROUP BY 1
       UNION ALL
       SELECT 'ALL', count(DISTINCT user_id)::BIGINT FROM events)
SELECT e.event_type AS event_type, {est} AS hll_distinct,
       ex.exact_distinct AS exact_distinct
FROM e JOIN ex ON e.event_type = ex.event_type
"""


@register("hll_rollup_distinct_users", _hll_rollup_sql())
def q_hll_rollup_distinct_users(spark, sf_dir):
    """Distinct-user ROLLUP from ONE sketch pass: build grouped HLL
    registers per event type, then derive the grand-total estimate by
    max-merging the per-type sketches IN REGISTER SPACE — the corpus is
    scanned once and every rollup level re-aggregates <= groups * 2^p
    register rows (why HLL is the distinct-count workhorse of OLAP cube
    layers: COUNT(DISTINCT) cannot re-aggregate, its sketch can). Exact
    counts ride alongside per level. One partial-agg register shuffle +
    register-sized rollup; the same two frames at 100 TB."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    ev = _read(spark, sf_dir, "events")
    regs = hll_build(ev, "user_id", p=8, group_cols=["event_type"]).cache()
    total = regs.groupBy("reg").agg(F.max("rank").alias("rank"))
    est_by_type = hll_estimate(regs, p=8, group_cols=["event_type"])
    est_all = hll_estimate(total, p=8).select(
        F.lit("ALL").alias("event_type"), "hll_distinct"
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
        .unionByName(
            ev.agg(
                F.countDistinct("user_id").cast("long").alias("exact_distinct")
            ).select(F.lit("ALL").alias("event_type"), "exact_distinct")
        )
    )
    return est_by_type.unionByName(est_all).join(exact, "event_type")


_NOVELTY_STATE_CACHE: dict[str, str] = {}


@register("stream_doc_novelty", _DOC_NOVELTY_SQL)
def q_stream_doc_novelty(spark, sf_dir):
    """Novelty scoring AT INGEST TIME (`streaming.docs.
    stream_doc_novelty`): each arriving micro-batch of documents is
    scored against the maintained gram -> lowest-owner index — the live
    "is this fresh text?" admission gate, no corpus re-scan. For
    id-ordered arrival the at-arrival score is final (a later, larger
    id can never take ownership below an earlier doc), so the
    accumulated rows equal `doc_novelty_ngram`'s batch form for any
    chunking and the oracle is the same batch SQL. Ingest runs once per
    process; repeat calls read the maintained state (`read_novelty`)."""
    from distributed_vector_database_spark.streaming.docs import (
        read_document_stream,
        read_novelty,
        stream_doc_novelty,
    )

    state = _NOVELTY_STATE_CACHE.get(sf_dir)
    if state is not None:
        out = read_novelty(spark, state)
    else:
        import tempfile

        d = _ordered_two_chunk_replay_dir(spark, sf_dir)
        state = tempfile.mkdtemp(prefix="dvdb_novstate_")
        out = stream_doc_novelty(
            read_document_stream(spark, d, max_files_per_trigger=1),
            state,
            n=3,
        )
        _NOVELTY_STATE_CACHE[sf_dir] = state
    return out.select("doc_id", "n_grams", "n_novel", "novelty")


@register(
    "cdc_chunk_ivf_search",
    f"""
WITH {_TOKS_CTE},
tt AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
bs AS (SELECT doc_id, t, n,
         list_prepend(1, list_transform(
           list_filter(range(1, n + 1),
             p -> p < n AND
                  ('0x' || substr(md5('c:' || t[p]), 1, 12))::BIGINT
                    % 16 = 0),
           p -> p + 1)) AS starts
       FROM tt),
ch AS (SELECT doc_id, u.c.ix AS chunk_ix,
         t[u.c.s : coalesce(starts[u.c.ix + 2] - 1, n)] AS ct
       FROM bs, unnest(list_transform(starts,
              (s, i) -> {{'ix': i - 1, 's': s}})) AS u(c)),
tk AS (SELECT doc_id, chunk_ix, unnest(ct) AS tok FROM ch),
sp AS (SELECT doc_id, chunk_ix, {_bucket_sql('tok')} AS bucket,
              count(*) AS cnt
       FROM tk GROUP BY 1, 2, 3),
keys AS (SELECT DISTINCT doc_id, chunk_ix FROM sp),
grid AS (SELECT k.doc_id, k.chunk_ix, t.d FROM keys k, range(0, 64) t(d)),
dense AS (SELECT g.doc_id, g.chunk_ix,
            list(coalesce(sp.cnt, 0)::DOUBLE ORDER BY g.d) AS v
          FROM grid g LEFT JOIN sp
            ON sp.doc_id = g.doc_id AND sp.chunk_ix = g.chunk_ix
           AND sp.bucket = g.d
          GROUP BY 1, 2),
cents AS (SELECT ROW_NUMBER() OVER (ORDER BY doc_id, chunk_ix) - 1
                   AS shard_id,
                 v AS cv
          FROM dense ORDER BY doc_id, chunk_ix LIMIT 4),
qd AS (SELECT {_bucket_sql('tok')} AS bucket, count(*) AS cnt
       FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id = 0)
       GROUP BY 1),
qv AS (SELECT list(coalesce(qd.cnt, 0)::DOUBLE ORDER BY t.d) AS q
       FROM range(0, 64) t(d) LEFT JOIN qd ON qd.bucket = t.d),
probe AS (SELECT shard_id FROM cents, qv
          ORDER BY list_distance(cv, q) ASC, shard_id ASC LIMIT 2),
assign AS (SELECT doc_id, chunk_ix, shard_id FROM (
    SELECT d.doc_id, d.chunk_ix, c.shard_id,
           ROW_NUMBER() OVER (PARTITION BY d.doc_id, d.chunk_ix
                              ORDER BY list_distance(d.v, c.cv) ASC,
                                       c.shard_id ASC) AS rn
    FROM dense d, cents c) t WHERE rn = 1)
SELECT d.doc_id AS doc_id, d.chunk_ix::BIGINT AS chunk_ix,
       ROUND({_cos('d.v', 'qv.q')}, 6) AS score
FROM dense d JOIN assign USING (doc_id, chunk_ix), qv
WHERE assign.shard_id IN (SELECT shard_id FROM probe)
ORDER BY score DESC, doc_id ASC, chunk_ix ASC
LIMIT 10
""",
)
def q_cdc_chunk_ivf_search(spark, sf_dir):
    """PRUNED chunk-granularity search — the IVF routing the linear
    chunk scan of `cdc_chunk_search_hashed` needs at scale (the
    SCALING.md round-9 note, closed): the chunk embedding frame IS an
    IVF-shardable vector index, so the standard read path applies
    unchanged — inject centroids (the 4 lowest chunk keys' vectors),
    `assign_shards` argmin routing, nprobe=2 pruned filter, top-10
    cosine for the doc-0 query. At 100 TB the assign is the write-time
    partition key (partitionBy(shard_id), as IVFIndex lays out) and the
    probe-pruned filter becomes partition pruning — the scan touches
    nprobe/nlist of the corpus instead of all of it.

    Plan: narrow CDC chunker -> hash-embed aggs -> cached index frame
    (3 consumers: centroid collect, assign scan, search scan) ->
    argmin-projection assign (narrow) -> pruned TakeOrdered."""
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )
    from distributed_vector_database_spark.operators.ivf import (
        assign_shards,
        nearest_shards,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ch = cdc_chunk_documents(docs, mask_bits=4).select(
        (F.col("doc_id") * 65536 + F.col("chunk_ix")).alias("chunk_key"),
        "chunk_text",
    )
    dense = hashing_embed(
        ch, dim=64, normalize=False, text_col="chunk_text",
        id_col="chunk_key",
    ).withColumnRenamed("chunk_key", "vec_id").cache()
    crows = (
        dense.orderBy("vec_id").select("embedding").limit(4).collect()
    )
    cents = [[float(x) for x in r[0]] for r in crows]
    qv = _doc0_hash_qv(spark, sf_dir)
    shards = nearest_shards(qv, cents, nprobe=2)
    cand = assign_shards(dense, cents).filter(
        F.col("shard_id").isin(shards)
    )
    out = topk(cand, qv, k=10, metric="cosine")
    return out.select(
        (F.col("vec_id") / 65536).cast("long").alias("doc_id"),
        (F.col("vec_id") % 65536).cast("long").alias("chunk_ix"),
        "score",
    )


def _hll_sliding_sql(p: int = 8, days: int = 7) -> str:
    from distributed_vector_database_spark.operators.sketch import (
        hll_alpha_numerator,
    )

    m = 1 << p
    two49 = 1 << 49
    return f"""
WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                  user_id,
        ('0x' || substr(md5('r:' || user_id::VARCHAR), 1, 12))::BIGINT
          % {m} AS reg,
        ('0x' || substr(md5('q:' || user_id::VARCHAR), 1, 12))::BIGINT AS w
      FROM events),
regs AS (SELECT day, reg,
           max(CASE WHEN w = 0 THEN 49
                    ELSE 49 - length(bin(w)) END) AS rnk
         FROM e GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM regs),
pairs AS (SELECT w.day AS wday, m.day AS day
          FROM days w JOIN days m
            ON date_diff('day', w.day::DATE, m.day::DATE)
               BETWEEN 0 AND {days - 1}),
merged AS (SELECT p.wday, r.reg, max(r.rnk) AS rnk
           FROM pairs p JOIN regs r USING (day) GROUP BY 1, 2),
agg AS (SELECT wday,
          sum(1::BIGINT << (49 - rnk))::BIGINT AS s,
          count(*)::BIGINT AS nreg
        FROM merged GROUP BY 1),
est AS (SELECT wday, ({m} - nreg) AS v,
          {hll_alpha_numerator(p)!r}
            / (s + ({m} - nreg) * {two49})::DOUBLE AS raw
        FROM agg),
ex AS (SELECT p.wday, count(DISTINCT e.user_id)::BIGINT AS exact_distinct
       FROM pairs p JOIN e USING (day) GROUP BY 1)
SELECT est.wday AS window_start,
       round(CASE WHEN raw <= {2.5 * m!r} AND v > 0
                  THEN {float(m)!r} * ln({float(m)!r} / v)
                  ELSE raw END, 6) AS hll_distinct,
       ex.exact_distinct AS exact_distinct
FROM est JOIN ex ON est.wday = ex.wday
"""


@register(
    "cdc_dup_clusters",
    f"""
WITH RECURSIVE {_TOKS_CTE},
tt AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
bs AS (SELECT doc_id, t, n,
         list_prepend(1, list_transform(
           list_filter(range(1, n + 1),
             p -> p < n AND
                  ('0x' || substr(md5('c:' || t[p]), 1, 12))::BIGINT
                    % 16 = 0),
           p -> p + 1)) AS starts
       FROM tt),
ch AS (SELECT DISTINCT doc_id,
         md5(array_to_string(
           t[u.c.s : coalesce(starts[u.c.ix + 2] - 1, n)], ' ')) AS h
       FROM bs, unnest(list_transform(starts,
              (s, i) -> {{'ix': i - 1, 's': s}})) AS u(c)),
keep AS (SELECT h FROM ch GROUP BY h HAVING count(*) <= 10),
kept AS (SELECT ch.doc_id, ch.h FROM ch JOIN keep USING (h)),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
          FROM kept a JOIN kept b
            ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING count(*) >= 2),
e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
walk(n, m) AS (
  SELECT a, a FROM e
  UNION
  SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a)
SELECT n AS doc_id, min(m)::BIGINT AS cluster_id FROM walk GROUP BY n
""",
)
def q_cdc_dup_clusters(spark, sf_dir):
    """Shared-content FAMILIES at storage granularity: CDC pair evidence
    (docs sharing >= 2 content-defined chunks, df-capped) closed into
    connected components — the chunk-granularity sibling of
    `dedup_clusters` (Jaccard) and the composition the provenance row
    feeds: pairs say WHO shares, components say which docs form one
    copy-family (cluster_id = the canonical lowest id). Cross-subsystem
    composition: chunking -> dedup pairs -> graph. Scale: pair volume is
    max_df-bounded; label propagation converges in diameter rounds, one
    uniform edge-join shuffle each (lineage checkpointed inside
    `connected_components`)."""
    from distributed_vector_database_spark.operators.dedup import (
        cdc_shared_chunk_pairs,
    )
    from distributed_vector_database_spark.operators.graph import (
        connected_components,
    )

    pairs = cdc_shared_chunk_pairs(
        _spread_read(spark, sf_dir, "documents"),
        mask_bits=4,
        max_df=10,
        min_shared=2,
    ).select("doc_id_a", "doc_id_b")
    cc = connected_components(pairs, src="doc_id_a", dst="doc_id_b")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )


@register(
    "cms_join_size_estimate",
    """
WITH ra AS (SELECT t.i AS i,
              ('0x' || substr(md5(t.i::VARCHAR || ':' || user_id::VARCHAR),
                              1, 12))::BIGINT % 64 AS bucket,
              count(*)::BIGINT AS cnt
            FROM events, range(4) t(i) GROUP BY 1, 2),
rb AS (SELECT t.i AS i,
              ('0x' || substr(md5(t.i::VARCHAR || ':' ||
                                  o_custkey::VARCHAR), 1, 12))::BIGINT
                % 64 AS bucket,
              count(*)::BIGINT AS cnt
       FROM orders, range(4) t(i) GROUP BY 1, 2),
prod AS (SELECT ra.i AS i, sum(ra.cnt * rb.cnt) AS ip
         FROM ra JOIN rb ON ra.i = rb.i AND ra.bucket = rb.bucket
         GROUP BY 1),
allrows AS (SELECT t.i, coalesce(p.ip, 0) AS ip
            FROM range(4) t(i) LEFT JOIN prod p ON p.i = t.i)
SELECT (SELECT min(ip) FROM allrows)::BIGINT AS cms_join_size,
       (SELECT count(*) FROM events e
        JOIN orders o ON e.user_id = o.o_custkey)::BIGINT
         AS exact_join_size
""",
)
def q_cms_join_size_estimate(spark, sf_dir):
    """JOIN-SIZE estimation from per-column sketches
    (`sketch.cms_inner_product`, AMS'96 / Cormode-Muthukrishnan'05):
    |events ⋈ orders ON user_id = o_custkey| estimated as the CMS
    inner product min_i Σ_b cntA[i][b]·cntB[i][b] — the planner-adjacent
    "will this join blow up?" answered from two register frames WITHOUT
    touching either table (the sketches are what a catalog keeps per
    column; at 100 TB this is how you price a join before paying its
    shuffle). Never underestimates (collisions only add mass) — the
    exact join count rides alongside so the overestimate is an audited
    column. width=64 < 150 live keys here, so the collision regime is
    real, not vacuous. All-integer register math, bit-exact both
    engines; products accumulate in decimal(38,0) (two large counts
    overflow int64), emitted as BIGINT."""
    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_inner_product,
    )

    ev = _read(spark, sf_dir, "events")
    orders = _read(spark, sf_dir, "orders")
    ska = cms_build(ev, "user_id", depth=4, width=64)
    skb = cms_build(orders, "o_custkey", depth=4, width=64)
    est = cms_inner_product(ska, skb, depth=4).select(
        F.col("cms_join_size").cast("long").alias("cms_join_size")
    )
    exact = (
        ev.select(F.col("user_id").alias("k"))
        .join(orders.select(F.col("o_custkey").alias("k")), "k")
        .agg(F.count("*").cast("long").alias("exact_join_size"))
    )
    return est.crossJoin(exact)


@register(
    "hdr_sliding_value_quantiles",
    """
WITH c AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events WHERE CAST(round(value * 100) AS BIGINT) >= 1),
b AS (SELECT day,
             length(bin(c)) - 1 AS e,
             (c >> greatest(length(bin(c)) - 1 - 4, 0)) & 15 AS sub,
             count(*) AS cnt
      FROM c GROUP BY 1, 2, 3),
days AS (SELECT DISTINCT day FROM b),
pairs AS (SELECT w.day AS wday, m.day AS day
          FROM days w JOIN days m
            ON date_diff('day', w.day::DATE, m.day::DATE) BETWEEN 0 AND 6),
merged AS (SELECT p.wday, b.e, b.sub, sum(b.cnt) AS cnt
           FROM pairs p JOIN b USING (day) GROUP BY 1, 2, 3),
cum AS (SELECT wday, e, sub,
             sum(cnt) OVER (PARTITION BY wday ORDER BY e, sub) AS cum,
             sum(cnt) OVER (PARTITION BY wday) AS total
        FROM merged),
qs AS (SELECT unnest([0.5, 0.99]) AS q)
SELECT wday AS window_start, q::DOUBLE AS q,
       min(CASE WHEN e < 4 THEN sub::BIGINT
                ELSE (16 + sub)::BIGINT << (e - 4) END)::BIGINT
         AS est_cents
FROM cum, qs
WHERE cum >= greatest(CAST(ceil(q * total) AS BIGINT), 1)
GROUP BY 1, 2
""",
)
def q_hdr_sliding_value_quantiles(spark, sf_dir):
    """SLIDING-window p50/p99 spend from daily HDR partials — the
    quantile member of the window-in-sketch-space pair (distinct ->
    `hll_sliding_distinct_users`, quantiles -> this row): one corpus
    scan builds per-day histograms; every 7-day window's quantiles
    derive by SUMMING the member days' registers (percentile_approx /
    exact percentiles must re-scan per overlapping window; histogram
    partials re-aggregate — what a latency/spend dashboard persists).
    All-integer registers and estimates — bit-exact cross-engine.
    Plan: one partial-agg register shuffle; the window join fans out
    only (days x 7) x <= ~960 register rows."""
    from distributed_vector_database_spark.operators.sketch import (
        hdr_hist_build,
        hdr_quantiles,
    )

    ev = _read(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = hdr_hist_build(ev, "cents", group_cols=["day"]).cache()
    days = daily.select("day").distinct()
    pairs = (
        days.alias("w")
        .join(
            days.alias("m"),
            F.datediff(
                F.to_date(F.col("m.day")), F.to_date(F.col("w.day"))
            ).between(0, 6),
        )
        .select(F.col("w.day").alias("wday"), F.col("m.day").alias("day"))
    )
    merged = (
        pairs.join(daily, "day")
        .groupBy("wday", "e", "sub")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumnRenamed("wday", "window_start")
    )
    return (
        hdr_quantiles(merged, [0.5, 0.99], group_cols=["window_start"])
        .select(
            "window_start", "q", F.col("est").cast("long").alias("est_cents")
        )
    )


@register("hll_sliding_distinct_users", _hll_sliding_sql())
def q_hll_sliding_distinct_users(spark, sf_dir):
    """SLIDING-window distinct users from daily HLL partials: for every
    day, the 7-day forward window's distinct count is estimated by
    max-merging the member days' registers — the events are scanned
    ONCE to build the daily partials and every window is register-sized
    set algebra (30 windows x 7 members x <= 2^p rows here; at 100 TB
    the daily partials are what a metrics pipeline persists, and any
    window — 7-day, 28-day, MTD — derives from them with no re-scan,
    which COUNT(DISTINCT) fundamentally cannot do across overlapping
    windows). Exact counts ride alongside per window. Day keys are ISO
    strings (the DATE-dtype driver pitfall). Plan: one corpus scan +
    partial-agg max per (day, reg); the window join fans out only the
    tiny (days x window) x registers frame."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    ev = _read(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    regs = hll_build(ev, "user_id", p=8, group_cols=["day"]).cache()
    days = regs.select("day").distinct()
    pairs = (
        days.alias("w")
        .join(
            days.alias("m"),
            F.datediff(
                F.to_date(F.col("m.day")), F.to_date(F.col("w.day"))
            ).between(0, 6),
        )
        .select(F.col("w.day").alias("wday"), F.col("m.day").alias("day"))
    )
    merged = (
        pairs.join(regs, "day")
        .groupBy("wday", "reg")
        .agg(F.max("rank").alias("rank"))
        .withColumnRenamed("wday", "window_start")
    )
    est = hll_estimate(merged, p=8, group_cols=["window_start"])
    exact = (
        pairs.join(ev.select("day", "user_id"), "day")
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
        .withColumnRenamed("wday", "window_start")
    )
    return est.join(exact, "window_start")


@register(
    "rocchio_expanded_search",
    f"""
WITH {_TOKS_CTE},
tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
sp AS (SELECT doc_id, {_bucket_sql('tok')} AS bucket, count(*) AS cnt
       FROM tk GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(cnt * cnt)::DOUBLE) AS n FROM sp GROUP BY doc_id),
qd AS (SELECT bucket, cnt FROM sp WHERE doc_id = 0),
d1 AS (SELECT sp.doc_id, sum(sp.cnt * qd.cnt)::DOUBLE AS dp
       FROM sp JOIN qd ON sp.bucket = qd.bucket
       WHERE sp.doc_id <> 0 GROUP BY sp.doc_id),
fb AS (SELECT n2.doc_id,
              ROUND(COALESCE(d1.dp, 0.0)
                    / (n2.n * (SELECT n FROM nrm WHERE doc_id = 0)), 6) AS score
       FROM nrm n2 LEFT JOIN d1 ON n2.doc_id = d1.doc_id
       WHERE n2.doc_id <> 0
       ORDER BY score DESC, n2.doc_id ASC LIMIT 5),
fbsum AS (SELECT bucket, sum(cnt) AS s FROM sp
          WHERE doc_id IN (SELECT doc_id FROM fb) GROUP BY bucket),
q2 AS (SELECT COALESCE(qd.bucket, fbsum.bucket) AS bucket,
              20 * COALESCE(qd.cnt, 0) + 3 * COALESCE(fbsum.s, 0) AS c
       FROM qd FULL OUTER JOIN fbsum ON qd.bucket = fbsum.bucket),
q2n AS (SELECT sqrt(sum(c * c)::DOUBLE) AS n FROM q2),
d2 AS (SELECT sp.doc_id, sum(sp.cnt * q2.c)::DOUBLE AS dp
       FROM sp JOIN q2 ON sp.bucket = q2.bucket GROUP BY sp.doc_id)
SELECT n2.doc_id AS doc_id,
       ROUND(COALESCE(d2.dp, 0.0) / (n2.n * (SELECT n FROM q2n)), 6) AS score
FROM nrm n2 LEFT JOIN d2 ON n2.doc_id = d2.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
""",
)
def q_rocchio_expanded_search(spark, sf_dir):
    """Pseudo-relevance-feedback retrieval (Rocchio 1971; IIR ch. 9):
    hash-embed the corpus, search with doc 0's raw vector, expand the query
    toward the top-5 feedback docs' centroid IN EXACT INTEGER SPACE
    (q' = 20q + 3*sum5 = 5*(4q + 3*mean5); cosine is scale-invariant, so no
    float mean ever forms), then re-search for the final top-10. The oracle
    rebuilds q' from the sparse counts — bit-identical coordinates — and
    recomputes both searches relationally. Scale: two TakeOrdered scans +
    one 5-row driver collect (operators/fusion.rocchio_expanded_topk)."""
    from distributed_vector_database_spark.functions.embed import hashing_embed
    from distributed_vector_database_spark.operators.fusion import (
        rocchio_expanded_topk,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    dense = hashing_embed(docs, dim=64, normalize=False)
    qv = _doc0_hash_qv(spark, sf_dir)
    return rocchio_expanded_topk(
        dense,
        qv,
        k_feedback=5,
        alpha=4,
        beta=3,
        k=10,
        vector_col="embedding",
        id_col="doc_id",
        exclude_ids=[0],
    )


@register(
    "trigram_kn_ppl",
    f"""
WITH {_TOKS_CTE},
tgp AS (SELECT doc_id,
        unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tgs
        FROM toks),
tg AS (SELECT doc_id, split_part(tgs, ' ', 1) AS w1,
              split_part(tgs, ' ', 2) AS w2,
              split_part(tgs, ' ', 3) AS w3 FROM tgp),
c123 AS MATERIALIZED (
  SELECT w1, w2, w3, count(*)::BIGINT AS c3 FROM tg GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, sum(c3)::BIGINT AS cctx, count(*)::BIGINT AS n1p_ctx
        FROM c123 GROUP BY 1, 2),
mid AS MATERIALIZED (
  SELECT w2, w3, count(*)::BIGINT AS n1p_mid FROM c123 GROUP BY 1, 2),
midctx AS (SELECT w2, sum(n1p_mid)::BIGINT AS nmidctx,
                  count(*)::BIGINT AS n1p_midfwd FROM mid GROUP BY 1),
base AS (SELECT w3, count(*)::BIGINT AS n1p_base FROM mid GROUP BY 1),
s AS MATERIALIZED (SELECT ((SELECT count(*) FROM mid)
        + (SELECT count(DISTINCT x)
           FROM (SELECT unnest(t) AS x FROM toks)))::DOUBLE AS denom),
term AS (
  SELECT tg.doc_id,
         round(ln(
           (greatest(c123.c3 - 0.75, 0)
            + 0.75 * ctx.n1p_ctx
              * ((greatest(mid.n1p_mid - 0.75, 0)
                  + 0.75 * midctx.n1p_midfwd
                    * ((base.n1p_base + 1.0) / s.denom))
                 / midctx.nmidctx))
           / ctx.cctx) * 1e6)::BIGINT AS mic
  FROM tg JOIN c123 USING (w1, w2, w3) JOIN ctx USING (w1, w2)
          JOIN mid USING (w2, w3) JOIN midctx USING (w2)
          JOIN base USING (w3), s),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_trigrams, sum(mic)::BIGINT AS m
        FROM term GROUP BY 1)
SELECT doc_id, n_trigrams,
       ((2 * (-m) + n_trigrams) // (2 * n_trigrams)) / 1e6 AS cross_entropy,
       ROUND(exp(((2 * (-m) + n_trigrams) // (2 * n_trigrams)) / 1e6), 6)
         AS ppl
FROM agg
""",
)
def q_trigram_kn_ppl(spark, sf_dir):
    """Per-doc cross-entropy/perplexity under the full three-layer
    INTERPOLATED KNESER-NEY TRIGRAM LM (`lm.doc_trigram_kn_cross_entropy`,
    d=0.75, continuation counts at the lower orders, add-one continuation
    floor) — completing the LM ladder above `bigram_lm_ppl` (add-alpha)
    and `bigram_kn_ppl` (bigram KN); proven against an independent python
    reference in tests/test_lm_tokenizer.py. All counts exact integers;
    per-trigram log-probs round to integer micros and sum as longs; the
    final 6dp division is exact integer half-away rounding. Self-scored
    here, so every doc trigram is in the LM and the oracle inner-joins
    (the operator's left joins + backoff branches serve held-out
    scoring).

    Oracle note: c123/mid/s are AS MATERIALIZED — without the hint,
    DuckDB inlines the scalar-subquery CTE `s` into the 6-relation join
    and re-derives the whole mid pipeline PER PROBE ROW (measured: the
    0.1 s query runs > 10 min at sf0.001) — the cross-engine twin of
    Spark's "cache the frame the self-join reads twice" rule."""
    from distributed_vector_database_spark.operators.lm import (
        doc_trigram_kn_cross_entropy,
    )

    return doc_trigram_kn_cross_entropy(
        _spread_read(spark, sf_dir, "documents"), discount=0.75
    )


def _trigram_kn_heldout_sql() -> str:
    """Held-out trigram-KN oracle: the full backoff CASE tree (seen
    context / unseen context / unseen middle / OOV floor) in SQL. The
    p-expressions are generated so the Spark and DuckDB double
    expression trees are structurally identical."""
    pcont = "((COALESCE(base.n1p_base, 0) + 1.0) / s.denom)"
    pmid = (
        "(CASE WHEN midctx.nmidctx IS NOT NULL THEN "
        "(greatest(COALESCE(mid.n1p_mid, 0) - 0.75, 0) "
        f"+ 0.75 * midctx.n1p_midfwd * {pcont}) / midctx.nmidctx "
        f"ELSE {pcont} END)"
    )
    p = (
        "(CASE WHEN ctx.cctx IS NOT NULL THEN "
        "(greatest(COALESCE(c123.c3, 0) - 0.75, 0) "
        f"+ 0.75 * ctx.n1p_ctx * {pmid}) / ctx.cctx "
        f"ELSE {pmid} END)"
    )
    return f"""
WITH {_TOKS_CTE},
lmtoks AS (SELECT doc_id, t FROM toks WHERE doc_id % 2 = 0),
sctoks AS (SELECT doc_id, t FROM toks WHERE doc_id % 2 = 1),
tgp AS (SELECT doc_id,
        unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tgs
        FROM sctoks),
tg AS (SELECT doc_id, split_part(tgs, ' ', 1) AS w1,
              split_part(tgs, ' ', 2) AS w2,
              split_part(tgs, ' ', 3) AS w3 FROM tgp),
ltgp AS (SELECT doc_id,
        unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tgs
        FROM lmtoks),
c123 AS MATERIALIZED (
  SELECT split_part(tgs, ' ', 1) AS w1, split_part(tgs, ' ', 2) AS w2,
         split_part(tgs, ' ', 3) AS w3, count(*)::BIGINT AS c3
  FROM ltgp GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, sum(c3)::BIGINT AS cctx, count(*)::BIGINT AS n1p_ctx
        FROM c123 GROUP BY 1, 2),
mid AS MATERIALIZED (
  SELECT w2, w3, count(*)::BIGINT AS n1p_mid FROM c123 GROUP BY 1, 2),
midctx AS (SELECT w2, sum(n1p_mid)::BIGINT AS nmidctx,
                  count(*)::BIGINT AS n1p_midfwd FROM mid GROUP BY 1),
base AS (SELECT w3, count(*)::BIGINT AS n1p_base FROM mid GROUP BY 1),
s AS MATERIALIZED (SELECT ((SELECT count(*) FROM mid)
        + (SELECT count(DISTINCT x)
           FROM (SELECT unnest(t) AS x FROM lmtoks)))::DOUBLE AS denom),
term AS (
  SELECT tg.doc_id, round(ln({p}) * 1e6)::BIGINT AS mic
  FROM tg LEFT JOIN c123 USING (w1, w2, w3) LEFT JOIN ctx USING (w1, w2)
          LEFT JOIN mid USING (w2, w3) LEFT JOIN midctx USING (w2)
          LEFT JOIN base USING (w3), s),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_trigrams, sum(mic)::BIGINT AS m
        FROM term GROUP BY 1)
SELECT doc_id, n_trigrams,
       ((2 * (-m) + n_trigrams) // (2 * n_trigrams)) / 1e6 AS cross_entropy,
       ROUND(exp(((2 * (-m) + n_trigrams) // (2 * n_trigrams)) / 1e6), 6)
         AS ppl
FROM agg
"""


@register("trigram_kn_heldout_ppl", _trigram_kn_heldout_sql())
def q_trigram_kn_heldout_ppl(spark, sf_dir):
    """HELD-OUT trigram-KN scoring: odd doc_ids scored under the LM fit
    on even doc_ids — the deploy shape of a perplexity filter (candidate
    web data scored against a trusted-corpus LM), and the row that
    oracle-checks the BACKOFF branches the self-scored `trigram_kn_ppl`
    cannot reach. Measured branch mix at sf0.01: 8,081 of 13,519 scored
    trigrams unseen (discount+interpolation), 1 unseen (w1,w2) context
    (-> bigram layer), 1 unseen middle word (-> continuation floor); the
    OOV add-one floor is pinned by the unit test's z-z-z doc. The oracle
    mirrors the full CASE tree with left joins; both engines evaluate
    the structurally identical double expression. Same exact-integer
    micro-sum + half-away 6dp discipline."""
    from distributed_vector_database_spark.operators.lm import (
        doc_trigram_kn_cross_entropy,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return doc_trigram_kn_cross_entropy(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        discount=0.75,
    )


def _dhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB mirror of `multimodal.dhash_fingerprints` + the revision
    screen: 65 block byte-sums per payload (ASCII corpus, so byte ==
    ascii code), cross-multiplied mean comparisons into hi/lo 32-bit
    halves, exact all-pairs Hamming (band blocking is EXACT for
    max_hamming <= bands-1, so the clean all-pairs semantics and the
    banded plan agree by pigeonhole)."""

    def ln(i: int) -> str:
        return f"((({i}+1)*L)//65 - ({i}*L)//65)"

    blocks = ",\n       ".join(
        f"COALESCE(list_sum(array_slice(b, ({i}*L)//65 + 1, "
        f"(({i}+1)*L)//65)), 0)"
        for i in range(65)
    )
    hi = " + ".join(
        f"CASE WHEN s[{i + 1}]*{ln(i + 1)} > s[{i + 2}]*{ln(i)} "
        f"THEN {1 << (31 - i)} ELSE 0 END"
        for i in range(32)
    )
    lo = " + ".join(
        f"CASE WHEN s[{i + 1}]*{ln(i + 1)} > s[{i + 2}]*{ln(i)} "
        f"THEN {1 << (63 - i)} ELSE 0 END"
        for i in range(32, 64)
    )
    ctes = f"""
WITH assets AS (
  SELECT doc_id * 2 AS doc_id, text AS t FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1, substr(t1.text, 1, 10) || 'XYZ' || substr(t1.text, 14)
  FROM documents t1 WHERE doc_id % 5 = 0
),
a AS (SELECT doc_id, list_transform(string_split(t, ''), x -> ascii(x)) AS b,
             strlen(t)::BIGINT AS L FROM assets
      WHERE strlen(t) >= 65),
sm AS (SELECT doc_id, L, [{blocks}] AS s FROM a),
f AS MATERIALIZED (
  SELECT doc_id, ({hi})::BIGINT AS hi, ({lo})::BIGINT AS lo FROM sm),
pairs AS (
  SELECT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b,
         (bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)))::BIGINT
           AS hamming
  FROM f x JOIN f y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
        <= {max_hamming})"""
    return ctes


def _dhash_pairs_sql(max_hamming: int = 3) -> str:
    return (
        _dhash_oracle_sql(max_hamming)
        + "\nSELECT doc_id_a, doc_id_b, hamming FROM pairs\n"
    )


@register("payload_dhash_pairs", _dhash_pairs_sql())
def q_payload_dhash_pairs(spark, sf_dir):
    """Perceptual near-dup screen for BINARY payloads: 64-bit dHash
    (gradient signs of 65 block byte-means, exact integer math —
    `sources/multimodal.dhash_fingerprints`, an Arrow mapInPandas over
    the binary content column) + the shared Hamming band join
    (`dedup.hamming_band_pairs`, exact for hamming <= bands-1 by
    pigeonhole). The workload models re-encoded/patched asset revisions:
    every 5th document arrives again with a 3-byte patch, and the screen
    must pair each revision with its original WITHOUT pairing any of the
    500 distinct documents. At sf0.01: 96 twins found, 0 false pairs
    (the other 4 twins are sub-65-byte payloads whose dHash is NULL by
    the min-length guard — degenerate tiny fingerprints would otherwise
    flood a real asset mix with hamming-0 false pairs, ADVICE r9).
    Token-level SimHash cannot run here — binary columns have no tokens;
    this is the image/audio near-dup rung of the dedup ladder."""
    from distributed_vector_database_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from distributed_vector_database_spark.sources.multimodal import (
        dhash_fingerprints,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    orig = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    rev = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.encode(
            F.concat(
                F.substring("text", 1, 10),
                F.lit("XYZ"),
                F.expr("substring(text, 14)"),
            ),
            "UTF-8",
        ).alias("content"),
    )
    # the fingerprint frame is tiny (one 16-hex row per asset) but costly
    # to derive (an Arrow pass over every payload byte) and the band
    # self-join reads it twice — cache, lazily (round-8 policy).
    fp = dhash_fingerprints(orig.unionByName(rev)).cache()
    return hamming_band_pairs(fp, fp_col="dhash", max_hamming=3, bands=4)


@register(
    "payload_dedup_agreement",
    _dhash_oracle_sql()
    + """,
ex AS (SELECT doc_id, md5(t) AS h FROM assets),
exo AS (SELECT h, min(doc_id) AS o FROM ex GROUP BY 1),
exflag AS (SELECT ex.doc_id FROM ex JOIN exo USING (h) WHERE exo.o < ex.doc_id),
pflag AS (SELECT DISTINCT doc_id_b AS doc_id FROM pairs)
SELECT (SELECT count(*) FROM assets)::BIGINT AS n_assets,
       (SELECT count(*) FROM exflag)::BIGINT AS exact_dup_assets,
       (SELECT count(*) FROM pflag)::BIGINT AS perceptual_dup_assets,
       (SELECT count(*) FROM pflag
        WHERE doc_id NOT IN (SELECT doc_id FROM exflag))::BIGINT
         AS perceptual_only_assets
""",
)
def q_payload_dedup_agreement(spark, sf_dir):
    """Payload-modality dedup dashboard: the EXACT screen (md5 of the
    raw bytes — what a content-addressed store dedups) next to the
    PERCEPTUAL screen (dHash hamming <= 3) on the same asset corpus.
    Patched revisions are invisible to exact hashing by construction,
    so perceptual_only_assets quantifies exactly what the dHash rung
    adds: at sf0.01 — 600 assets, 0 exact dups, 96 perceptual dups,
    96 perceptual-only (4 revisions are sub-65-byte payloads, NULL
    dHash by the min-length guard). The byte-modality counterpart of the
    token/chunk `dedup_modality_agreement` dashboard; all four counts
    are result-sized aggregates (no pair fan-out beyond the banded
    screen)."""
    from distributed_vector_database_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from distributed_vector_database_spark.sources.multimodal import (
        dhash_fingerprints,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    orig = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    rev = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.encode(
            F.concat(
                F.substring("text", 1, 10),
                F.lit("XYZ"),
                F.expr("substring(text, 14)"),
            ),
            "UTF-8",
        ).alias("content"),
    )
    assets = orig.unionByName(rev).cache()
    fp = dhash_fingerprints(assets).cache()
    pairs = hamming_band_pairs(fp, fp_col="dhash", max_hamming=3, bands=4)
    pflag = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    ex = assets.select("doc_id", F.md5("content").alias("h"))
    exo = ex.groupBy("h").agg(F.min("doc_id").alias("o"))
    exflag = (
        ex.join(exo, "h")
        .filter(F.col("o") < F.col("doc_id"))
        .select("doc_id")
    )
    return (
        assets.agg(F.count("*").cast("long").alias("n_assets"))
        .crossJoin(
            exflag.agg(
                F.count("*").cast("long").alias("exact_dup_assets")
            )
        )
        .crossJoin(
            pflag.agg(
                F.count("*").cast("long").alias("perceptual_dup_assets")
            )
        )
        .crossJoin(
            pflag.join(exflag, "doc_id", "left_anti").agg(
                F.count("*").cast("long").alias("perceptual_only_assets")
            )
        )
    )


@register(
    "bm25_prf_topk",
    f"""
WITH {_TOKS_CTE},
d AS (SELECT doc_id, len(t)::BIGINT AS dl, t FROM toks),
st AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl,
              count(*)::BIGINT AS n FROM d),
e AS MATERIALIZED (SELECT doc_id, dl, unnest(t) AS term FROM d),
tf AS (SELECT doc_id, dl, term, count(*)::BIGINT AS tf
       FROM e WHERE term IN ('scan', 'join', 'filter')
       GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
sc AS (SELECT tf.doc_id,
              CAST(round(
                ln(1.0 + (CAST((SELECT n FROM st) AS DOUBLE) - df + 0.5)
                         / (df + 0.5))
                * (tf * 2.2)
                / (tf + 1.2 * (0.25 + 0.75 * dl / (SELECT avgdl FROM st)))
                * 1e6) AS BIGINT) AS mic
      FROM tf JOIN dfreq USING (term)),
fb AS (SELECT doc_id, ROUND(sum(mic) / 1e6, 6) AS s1 FROM sc GROUP BY 1
       ORDER BY s1 DESC, doc_id ASC LIMIT 5),
ex AS MATERIALIZED (
  SELECT term FROM e
  WHERE doc_id IN (SELECT doc_id FROM fb)
    AND term NOT IN ('scan', 'join', 'filter')
  GROUP BY term ORDER BY count(*) DESC, term ASC LIMIT 3),
tf2 AS (SELECT doc_id, dl, term, count(*)::BIGINT AS tf
        FROM e WHERE term IN ('scan', 'join', 'filter')
                  OR term IN (SELECT term FROM ex)
        GROUP BY 1, 2, 3),
dfreq2 AS (SELECT term, count(*)::BIGINT AS df FROM tf2 GROUP BY 1),
sc2 AS (SELECT tf2.doc_id,
              CAST(round(
                ln(1.0 + (CAST((SELECT n FROM st) AS DOUBLE) - df + 0.5)
                         / (df + 0.5))
                * (tf * 2.2)
                / (tf + 1.2 * (0.25 + 0.75 * dl / (SELECT avgdl FROM st)))
                * 1e6) AS BIGINT) AS mic
      FROM tf2 JOIN dfreq2 USING (term)),
agg2 AS (SELECT doc_id, sum(mic) AS m FROM sc2 GROUP BY 1)
SELECT doc_id, ROUND(m / 1e6, 6) AS score
FROM agg2 ORDER BY score DESC, doc_id ASC LIMIT 10
""",
)
def q_bm25_prf_topk(spark, sf_dir):
    """BM25 pseudo-relevance feedback (`text_analysis.bm25_prf_search`,
    RM3-lite) — the LEXICAL twin of `rocchio_expanded_search`: top-5
    feedback docs for {scan, join, filter}, the 3 most frequent
    non-query terms mined from them (total tf DESC, term ASC — the
    deterministic expansion criterion), BM25 re-run over the 6-term
    query. Both passes keep the micro-rounded exact-long score sums;
    the oracle replays both passes and the expansion mining. Recovers
    vocabulary-mismatch recall the single-pass bm25_topk cannot."""
    from distributed_vector_database_spark.operators.text_analysis import (
        bm25_prf_search,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return bm25_prf_search(
        docs,
        ["scan", "join", "filter"],
        k_feedback=5,
        n_expansion=3,
        k=10,
    )


@register(
    "mor_scd2_history",
    """
WITH e AS (SELECT vec_id,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS l2
           FROM embeddings)
SELECT vec_id, 1::BIGINT AS version, ROUND(l2 * 1, 6) AS val,
       0::BIGINT AS valid_from_batch,
       (CASE WHEN vec_id % 7 = 0 THEN 1
             WHEN vec_id % 5 = 0 THEN 2 END)::BIGINT AS valid_to_batch,
       (vec_id % 7 <> 0 AND vec_id % 5 <> 0) AS is_current
FROM e
UNION ALL
SELECT vec_id, 2, ROUND(l2 * 2, 6), 1,
       (CASE WHEN vec_id % 5 = 0 THEN 2 END)::BIGINT,
       vec_id % 5 <> 0
FROM e WHERE vec_id % 7 = 0
UNION ALL
SELECT vec_id, 4, ROUND(l2 * 4, 6), 3, NULL::BIGINT, true
FROM e WHERE vec_id % 35 = 0
""",
)
def q_mor_scd2_history(spark, sf_dir):
    """SCD2 type-2 history over the tombstone store (`MorStore.history`):
    every (id, version) interval with its validity batch range — v1
    closes at the %7 upsert or the %5 delete, the %35 re-insert opens a
    new current interval after its own tombstone. One lead() window per
    id over base+deltas, no joins; deletes close intervals and emit no
    row. The oracle derives the expected interval set from the store's
    deterministic batch scheme (base@0, %7 upsert@1, %5 delete@2, %35
    re-insert@3)."""
    q_mor_delete_read(spark, sf_dir)  # ensure the cached store exists
    store = _MOR_DEL_CACHE[sf_dir]
    return store.history().select(
        "vec_id",
        "version",
        "val",
        "valid_from_batch",
        "valid_to_batch",
        "is_current",
    )


@register(
    "mor_pit_read",
    """
WITH e AS (SELECT vec_id, vec_id % 4 AS b,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS l2
           FROM embeddings),
v AS (SELECT vec_id, b,
        CASE WHEN vec_id % 35 = 0 THEN
               (CASE WHEN b = 0 THEN 1 WHEN b = 1 THEN 2
                     WHEN b = 3 THEN 4 END)
             WHEN vec_id % 7 = 0 THEN (CASE WHEN b = 0 THEN 1 ELSE 2 END)
             WHEN vec_id % 5 = 0 THEN (CASE WHEN b < 2 THEN 1 END)
             ELSE 1 END AS ver,
        l2
      FROM e)
SELECT vec_id, b::BIGINT AS as_of_batch, ver::BIGINT AS version,
       ROUND(l2 * ver, 6) AS val
FROM v WHERE ver IS NOT NULL
""",
)
def q_mor_pit_read(spark, sf_dir):
    """Point-in-time join against the SCD2 history
    (`temporal.point_in_time_join` x `MorStore.history`): every vec_id
    probed AS OF batch (vec_id % 4) joins the ONE version interval
    covering that batch — ids dead at their as-of point (%5 ids probed
    at b >= 2, unless the %35 re-insert) drop out under how='inner'.
    The fact-side as-of spread exercises every batch state in one join;
    per-batch slices equal `read(as_of_batch=...)` (unit-tested). Plain
    equi-join on the key; the validity range is a join residual — no
    extra exchange. Oracle derives alive-version-at-batch from the
    store's deterministic batch scheme."""
    from distributed_vector_database_spark.operators.temporal import (
        point_in_time_join,
    )

    q_mor_delete_read(spark, sf_dir)  # ensure the cached store exists
    store = _MOR_DEL_CACHE[sf_dir]
    facts = _read(spark, sf_dir, "embeddings").select(
        "vec_id", (F.col("vec_id") % 4).cast("long").alias("as_of_batch")
    )
    return point_in_time_join(
        facts,
        store.history(),
        keys=["vec_id"],
        at_col="as_of_batch",
    ).select("vec_id", "as_of_batch", "version", "val")


@register(
    "ql_dirichlet_topk",
    f"""
WITH {_TOKS_CTE},
d AS (SELECT doc_id, len(t)::BIGINT AS dl, t FROM toks WHERE len(t) > 0),
cn AS (SELECT sum(dl)::BIGINT AS c FROM d),
e AS (SELECT doc_id, unnest(t) AS term FROM d),
q AS (SELECT term, count(*)::BIGINT AS cf FROM e
      WHERE term IN ('scan', 'join', 'filter') GROUP BY 1),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM e
       WHERE term IN ('scan', 'join', 'filter') GROUP BY 1, 2),
probe AS (SELECT d.doc_id, d.dl, q.term, q.cf FROM d, q),
sc AS (SELECT probe.doc_id,
         round(ln(
           (COALESCE(tf.tf, 0)
            + 2000.0 * (probe.cf / (SELECT c FROM cn)::DOUBLE))
           / (probe.dl + 2000.0)) * 1e6)::BIGINT AS mic
       FROM probe LEFT JOIN tf
         ON tf.doc_id = probe.doc_id AND tf.term = probe.term),
agg AS (SELECT doc_id, sum(mic) AS m FROM sc GROUP BY 1)
SELECT doc_id, ROUND(m / 1e6, 6) AS score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT 10
""",
)
def q_ql_dirichlet_topk(spark, sf_dir):
    """Dirichlet-smoothed query-likelihood retrieval
    (`text_analysis.ql_dirichlet_search`, Zhai & Lafferty SIGIR'01,
    mu=2000) — the language-model ranking family next to bm25_topk's
    probabilistic one, same query bag {scan, join, filter}. Absent
    query terms still contribute the smoothed collection probability
    (every doc scores finitely — the property BM25 lacks), so the probe
    frame is doc-length x live-terms with tf left-joined in. Per-term
    log-probs round to integer micros and sum as exact longs; the
    collection model enters as a literal map (index-build scalars)."""
    from distributed_vector_database_spark.operators.text_analysis import (
        ql_dirichlet_search,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return ql_dirichlet_search(
        docs, ["scan", "join", "filter"], k=10, mu=2000.0
    )


@register(
    "hourly_session_concurrency",
    """
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sx AS (
  SELECT user_id, ts,
         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts ASC
                             ROWS UNBOUNDED PRECEDING) AS session_ix
  FROM s
),
sess AS (SELECT user_id, min(ts) AS st,
                max(ts) + INTERVAL 30 MINUTE AS en
         FROM sx GROUP BY user_id, session_ix),
hrs AS (SELECT user_id,
               unnest(generate_series(date_trunc('hour', st),
                                      date_trunc('hour', en),
                                      INTERVAL 1 HOUR)) AS hour
        FROM sess)
SELECT hour, count(*)::BIGINT AS n_sessions,
       count(DISTINCT user_id)::BIGINT AS n_users,
       (count(*) * (count(*) - 1) // 2)::BIGINT AS coactive_pairs
FROM hrs GROUP BY hour
""",
)
def q_hourly_session_concurrency(spark, sf_dir):
    """Session concurrency per hour: each 30-min-gap session explodes to
    the hour grid it covers (sequence of date_trunc'd hours — the
    INTERVAL-TO-GRID pattern: grid explode + count, NEVER the quadratic
    interval self-join, whose pair volume at sf0.1 is already 6.5M and
    grows ~n² with concurrency), then per-hour session/user counts and
    the co-active pair count n*(n-1)/2 DERIVED from the count — exact,
    zero pair fan-out. Fan-out per session = its duration in hours
    (bounded by the session gap semantics); output is one row per
    active hour."""
    from distributed_vector_database_spark.streaming.events import (
        session_window_stats,
    )

    sess = session_window_stats(_read(spark, sf_dir, "events"))
    hrs = sess.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "session_start"),
                F.date_trunc("hour", "session_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    )
    return (
        hrs.groupBy("hour")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            "hour",
            "n_sessions",
            "n_users",
            F.expr("(n_sessions * (n_sessions - 1)) div 2").alias(
                "coactive_pairs"
            ),
        )
    )


@register(
    "copurchase_lift",
    """
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
n AS (SELECT count(DISTINCT bk)::BIGINT AS n FROM b),
sup AS (SELECT it, count(*)::BIGINT AS s FROM b GROUP BY 1),
p AS (SELECT x.it AS item_a, y.it AS item_b, count(*)::BIGINT AS ps
      FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
      GROUP BY 1, 2),
f AS (SELECT p.item_a, p.item_b, p.ps,
             sa.s AS support_a, sb.s AS support_b,
             (SELECT n FROM n) * p.ps AS ln_, sa.s * sb.s AS ld_
      FROM p JOIN sup sa ON sa.it = p.item_a
             JOIN sup sb ON sb.it = p.item_b
      WHERE p.ps >= 2)
SELECT item_a, item_b, ps AS pair_support, support_a, support_b,
       sign(ps) * ((2000000 * abs(ps) + support_a) // (2 * support_a))
         / 1e6 AS confidence_ab,
       sign(ln_) * ((2000000 * abs(ln_) + ld_) // (2 * ld_)) / 1e6 AS lift
FROM f
""",
)
def q_copurchase_lift(spark, sf_dir):
    """Market-basket association rules (`analytics.copurchase_rules`):
    part pairs co-purchased in >= 2 orders with exact-integer 6dp
    confidence and lift. The pair generator self-joins on the ORDER KEY,
    so fan-out per order is C(lines, 2) — bounded by order-line
    semantics (TPC-H <= 7 lines/order), linear in orders, never
    |parts|^2; supports are |part-vocab| aggregates and the basket
    count enters as a literal."""
    from distributed_vector_database_spark.operators.analytics import (
        copurchase_rules,
    )

    li = _read(spark, sf_dir, "lineitem")
    return copurchase_rules(
        li,
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_support=2,
    )


@register(
    "event_transition_matrix",
    """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS to_type
  FROM events
),
pairs AS (SELECT from_type, to_type, count(*)::BIGINT AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, sum(n)::BIGINT AS t FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
       sign(p.n) * ((2000000 * abs(p.n) + tot.t) // (2 * tot.t)) / 1e6 AS p
FROM pairs p JOIN tot USING (from_type)
""",
)
def q_event_transition_matrix(spark, sf_dir):
    """First-order Markov transition model of user behavior
    (`analytics.event_transition_matrix`): (event_type -> next
    event_type) counts within each user's time-ordered stream (ties
    break on event_id — deterministic sequences) and row-normalized
    probabilities in exact-integer 6dp — the behavioral twin of the
    token-level bigram LM fit. One lead() window per user + a
    |type x type| aggregate; output is vocabulary-sized."""
    from distributed_vector_database_spark.operators.analytics import (
        event_transition_matrix,
    )

    return event_transition_matrix(_read(spark, sf_dir, "events"))


_ETM_STREAM_CACHE: dict[str, str] = {}
_ETM_STATE_CACHE: dict[str, str] = {}


@register(
    "stream_event_transitions",
    """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS to_type
  FROM events
),
pairs AS (SELECT from_type, to_type, count(*)::BIGINT AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, sum(n)::BIGINT AS t FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
       sign(p.n) * ((2000000 * abs(p.n) + tot.t) // (2 * tot.t)) / 1e6 AS p
FROM pairs p JOIN tot USING (from_type)
""",
)
def q_stream_event_transitions(spark, sf_dir):
    """The STREAM-maintained twin of `event_transition_matrix`
    (`streaming.events.stream_event_transitions`): events arrive as
    time-ordered micro-batches; each batch contributes its within-batch
    lead() pairs PLUS the boundary transition (persisted last event per
    user -> the batch's first event per user) — the pair a naive
    per-batch window drops, so stream == batch under any chunking and
    the oracle is the same batch SQL. Probabilities derive from the
    accumulated counts at read time. Ingest runs once per process;
    repeat calls read the maintained state."""
    from distributed_vector_database_spark.functions.vector import (
        ratio_6dp_exact,
    )
    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        read_transition_counts,
        stream_event_transitions,
    )

    state = _ETM_STATE_CACHE.get(sf_dir)
    if state is not None:
        counts = read_transition_counts(spark, state)
    else:
        import os
        import tempfile
        import time

        d = _ETM_STREAM_CACHE.get(sf_dir)
        if d is None:
            ev = _read(spark, sf_dir, "events")
            mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
            d = tempfile.mkdtemp(prefix="dvdb_etmstream_")
            # events.parquet is ts-ordered by construction, so an
            # event_id split IS a time split (verified in the module
            # tests by the stream == batch assertion).
            ev.filter(F.col("event_id") <= mid).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            first = {
                f for f in os.listdir(d) if f.endswith(".parquet")
            }
            ev.filter(F.col("event_id") > mid).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            now = time.time()
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    t = now if f in first else now + 10
                    os.utime(os.path.join(d, f), (t, t))
            _ETM_STREAM_CACHE[sf_dir] = d
        state = tempfile.mkdtemp(prefix="dvdb_etmstate_")
        counts = stream_event_transitions(
            read_event_stream(spark, d, max_files_per_trigger=1), state
        )
        _ETM_STATE_CACHE[sf_dir] = state
    totals = counts.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("_tot")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        ratio_6dp_exact("n", "_tot").alias("p"),
    )


@register(
    "kmv_order_year_churn",
    """
WITH ha AS (SELECT DISTINCT
              ('0x' || substr(md5(o_custkey::VARCHAR), 1, 12))::BIGINT
                / 281474976710656.0 AS _h
            FROM orders WHERE year(o_orderdate) = 1995
            ORDER BY _h ASC LIMIT 64),
hb AS (SELECT DISTINCT
              ('0x' || substr(md5(o_custkey::VARCHAR), 1, 12))::BIGINT
                / 281474976710656.0 AS _h
            FROM orders WHERE year(o_orderdate) = 1996
            ORDER BY _h ASC LIMIT 64),
sa AS (SELECT count(*) AS na, max(_h) AS hka FROM ha),
sb AS (SELECT count(*) AS nb, max(_h) AS hkb FROM hb),
pool AS (SELECT coalesce(ha._h, hb._h) AS _h,
                (ha._h IS NOT NULL)::INT AS _a,
                (hb._h IS NOT NULL)::INT AS _b
         FROM ha FULL JOIN hb ON ha._h = hb._h),
r AS (SELECT _h, _a, _b, row_number() OVER (ORDER BY _h ASC) AS _rn
      FROM pool),
kk AS (SELECT * FROM r WHERE _rn <= 64),
agg AS (SELECT count(*) AS _n,
               max(CASE WHEN _rn = 64 THEN _h END) AS _hk,
               sum(_a * _b) AS _m
        FROM kk),
est AS (SELECT
  (CASE WHEN sa.na < 64 THEN sa.na::DOUBLE
        ELSE round(63.0 / sa.hka) END)::BIGINT AS a_est,
  (CASE WHEN sb.nb < 64 THEN sb.nb::DOUBLE
        ELSE round(63.0 / sb.hkb) END)::BIGINT AS b_est,
  round((agg._m::DOUBLE / agg._n)
        * (CASE WHEN agg._n < 64 THEN agg._n::DOUBLE
                ELSE round(63.0 / agg._hk) END))::BIGINT AS intersect_est
  FROM sa, sb, agg),
exact AS (SELECT
  (SELECT count(*) FROM
     (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
  )::BIGINT AS exact_churned,
  (SELECT count(*) FROM
     (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
  )::BIGINT AS exact_new)
SELECT a_est, b_est, intersect_est,
       greatest(a_est - intersect_est, 0)::BIGINT AS diff_a_est,
       greatest(b_est - intersect_est, 0)::BIGINT AS diff_b_est,
       exact_churned, exact_new
FROM est, exact
""",
)
def q_kmv_order_year_churn(spark, sf_dir):
    """Year-over-year customer CHURN from two k=64 KMV sketches
    (`sketch.kmv_set_diff_estimates`): per-side cardinalities + joint
    intersection + both set DIFFERENCES (churned = in 1995 not 1996;
    new = in 1996 not 1995), clamped at 0 — completing the KMV set
    algebra next to `kmv_order_year_overlap`'s union/intersect/Jaccard.
    Exact EXCEPT counts audited alongside — and they SHOW the known
    weakness of difference-of-estimates honestly: at sf0.01 the true
    churn is a small fraction of either side (261 of ~1.5k), so the
    combined estimator error of a_est and intersect_est dominates
    (est 42); at sf0.1, where churn is ~20% of the side, the estimate
    lands within the k=64 error band (2,058 vs 2,530). Size k to the
    difference you need to resolve, not the sides. All sketch steps are
    TakeOrdered k-row frames; the differences are exact integer
    arithmetic on the rounded estimates."""
    from distributed_vector_database_spark.operators.sketch import (
        kmv_set_diff_estimates,
        kmv_sketch,
    )

    orders = _read(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    a = orders.filter(year == 1995).select("o_custkey")
    b = orders.filter(year == 1996).select("o_custkey")
    est = kmv_set_diff_estimates(
        kmv_sketch(a, "o_custkey", k=64),
        kmv_sketch(b, "o_custkey", k=64),
        k=64,
    )
    exact = (
        a.distinct()
        .subtract(b.distinct())
        .agg(F.count("*").cast("long").alias("exact_churned"))
        .crossJoin(
            b.distinct()
            .subtract(a.distinct())
            .agg(F.count("*").cast("long").alias("exact_new"))
        )
    )
    return est.crossJoin(exact)


def _neardup_decontam_sql(
    num_hashes: int = 8, bands: int = 4, threshold: float = 0.5
) -> str:
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5("
        + " || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_ix, band{b} AS bv FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sig),
st AS MATERIALIZED ({stacked}),
cand AS (SELECT DISTINCT t.doc_id AS td, e.doc_id AS ed
         FROM (SELECT * FROM st WHERE NOT ({_EVAL_PRED})) t
         JOIN (SELECT * FROM st WHERE {_EVAL_PRED}) e
           ON t.band_ix = e.band_ix AND t.bv = e.bv),
j AS (SELECT c.td, c.ed,
        round(len(list_intersect(ha.s, hb.s)) * 1.0
              / (len(ha.s) + len(hb.s) - len(list_intersect(ha.s, hb.s))),
              6) AS jaccard
      FROM cand c
      JOIN sh ha ON ha.doc_id = c.td
      JOIN sh hb ON hb.doc_id = c.ed)
SELECT td AS doc_id, ed AS eval_doc_id, jaccard
FROM j WHERE jaccard >= {threshold}
"""


@register("neardup_decontaminate_pairs", _neardup_decontam_sql())
def q_neardup_decontaminate_pairs(spark, sf_dir):
    """NEAR-DUPLICATE decontamination
    (`curation.neardup_contaminated_pairs`): training docs that are
    near-duplicates (exact Jaccard >= 0.5 on word 3-gram sets) of the
    held-out eval slice (doc_id % 50 = 0) — the paraphrased/edited leak
    mode the exact n-gram screens (`decontaminate_report`,
    `bloom_screened_decontaminate_stats`) see only as partial overlap.
    Candidates come from the asymmetric train x eval MinHash band join
    (8 hashes, 4 bands — never |train| x |eval|), then exact verify on
    the candidate set only. At sf0.01 the screen surfaces the one
    J=0.96 train-eval near-dup; the oracle mirrors banding + verify on
    the portable md5 minhash convention."""
    from distributed_vector_database_spark.operators.curation import (
        neardup_contaminated_pairs,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    ev = docs.filter(F.expr(_EVAL_PRED))
    tr = docs.filter(~F.expr(_EVAL_PRED))
    return neardup_contaminated_pairs(
        tr, ev, num_hashes=8, bands=4, n=3, threshold=0.5
    )


_DHASH_STREAM_CACHE: dict[str, str] = {}


def _asset_stream_replay_dir(spark, sf_dir) -> str:
    """The payload_dhash asset frame (originals + every-5th-doc 3-byte
    revisions, asset id = doc_id*2 / doc_id*2+1) split into two parquet
    chunks with strictly increasing mtimes, so the file stream replays
    in asset-id order. Built once per (process, sf_dir)."""
    import os
    import tempfile
    import time

    d = _DHASH_STREAM_CACHE.get(sf_dir)
    if d is not None:
        return d
    docs = _read(spark, sf_dir, "documents")
    orig = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"), F.col("text")
    )
    rev = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 10),
            F.lit("XYZ"),
            F.expr("substring(text, 14)"),
        ).alias("text"),
    )
    assets = orig.unionByName(rev)
    mid = assets.agg(F.max("doc_id")).head()[0] // 2
    d = tempfile.mkdtemp(prefix="dvdb_dhstream_")
    assets.filter(F.col("doc_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    first = {f for f in os.listdir(d) if f.endswith(".parquet")}
    assets.filter(F.col("doc_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    now = time.time()
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            ts = now if f in first else now + 10
            os.utime(os.path.join(d, f), (ts, ts))
    _DHASH_STREAM_CACHE[sf_dir] = d
    return d


_DHASH_STATE_CACHE: dict[str, str] = {}


@register("stream_payload_dhash_pairs", _dhash_pairs_sql())
def q_stream_payload_dhash_pairs(spark, sf_dir):
    """The STREAM-maintained twin of `payload_dhash_pairs`
    (`streaming.docs.stream_payload_dhash`): assets arrive as id-ordered
    micro-batches; each batch dHashes its own payloads and band-joins
    them against the maintained fingerprint index — each near-dup pair
    surfaces exactly once, in the batch where its later member arrives,
    so the accumulated pairs equal the batch screen under any chunking
    and the oracle is the same all-pairs SQL. State is 16 hex chars per
    asset (never the payloads). Ingest runs once per process; repeat
    calls read the maintained state (`read_payload_pairs`)."""
    from distributed_vector_database_spark.streaming.docs import (
        read_document_stream,
        read_payload_pairs,
        stream_payload_dhash,
    )

    state = _DHASH_STATE_CACHE.get(sf_dir)
    if state is not None:
        return read_payload_pairs(spark, state)
    import tempfile

    d = _asset_stream_replay_dir(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="dvdb_dhstate_")
    out = stream_payload_dhash(
        read_document_stream(
            spark, d, max_files_per_trigger=1,
            schema="doc_id long, text string",
        ),
        state,
        max_hamming=3,
        bands=4,
    )
    _DHASH_STATE_CACHE[sf_dir] = state
    return out


# shared by ivf_autotuned_search (in-memory attach) and
# ivf_persisted_autotuned_search (cold load from the persisted layout):
# same fixed centroids + same corpus => identical curve, pick and hits
_AUTOTUNED_IVF_SQL = f"""
WITH {_ASSIGN_CTE},
qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id IN (0, 25, 50, 75, 100)),
cprobe AS (
  SELECT qs.query_id, c.shard_id,
         ROW_NUMBER() OVER (PARTITION BY qs.query_id
                            ORDER BY list_distance(c.cv, qs.qv) ASC,
                                     c.shard_id ASC) AS pr
  FROM qs, c),
scored AS (
  SELECT qs.query_id, e.vec_id, a.shard_id,
         ROUND({_cos(E, 'qs.qv')}, 6) AS score
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, qs),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, vec_id ASC) AS rk
    FROM scored) t
  WHERE rk <= 10),
np AS (SELECT * FROM (VALUES (1), (2), (4), (8)) t(nprobe)),
approx AS (
  SELECT nprobe, query_id, vec_id FROM (
    SELECT np.nprobe, s.query_id, s.vec_id,
           ROW_NUMBER() OVER (PARTITION BY np.nprobe, s.query_id
                              ORDER BY s.score DESC, s.vec_id ASC) AS rk
    FROM np, scored s
    JOIN cprobe p ON p.query_id = s.query_id AND p.shard_id = s.shard_id
    WHERE p.pr <= np.nprobe) t
  WHERE rk <= 10),
curve AS (
  SELECT np.nprobe,
         ROUND(COALESCE(h.total_hits, 0) / 50.0, 6) AS mean_recall
  FROM np LEFT JOIN (
    SELECT nprobe, count(*) AS total_hits
    FROM approx JOIN exact USING (query_id, vec_id)
    GROUP BY nprobe) h ON np.nprobe = h.nprobe),
picked AS (
  SELECT COALESCE(
           (SELECT min(nprobe) FROM curve WHERE mean_recall >= 0.95),
           (SELECT max(nprobe) FROM curve))::BIGINT AS np),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 100),
sprobe AS (
  SELECT shard_id FROM (
    SELECT c.shard_id,
           ROW_NUMBER() OVER (ORDER BY list_distance(c.cv, q.qv) ASC,
                              c.shard_id ASC) AS pr
    FROM c, q) t, picked
  WHERE t.pr <= picked.np),
cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN assign a ON e.vec_id = a.vec_id
         WHERE a.shard_id IN (SELECT shard_id FROM sprobe))
SELECT picked.np AS nprobe, e.vec_id AS vec_id,
       ROUND({_cos(E, 'q.qv')}, 6) AS score
FROM cand e, q, picked
ORDER BY score DESC, vec_id ASC
LIMIT 5
"""


@register("ivf_autotuned_search", _AUTOTUNED_IVF_SQL)
def q_ivf_autotuned_search(spark, sf_dir):
    """Evidence-driven nprobe (VERDICT r9 item 4): the reference hand-sets
    ``shards_to_search`` (`reference: src/compute_server.py:60-63`); here
    the measured recall curve picks it. Pipeline: (1) the registered
    recall-vs-nprobe curve over 5 fixed corpus queries
    (`eval.ivf_recall_curve_df` — one batched exact search + one batched
    pruned search per point); (2) `ivf.pick_nprobe(curve, 0.95)` = the
    SMALLEST measured nprobe whose mean recall@10 meets the target;
    (3) the standard pruned read path at that nprobe for query vec 100.
    Output carries the picked nprobe so the choice itself is
    oracle-checked, not just the hits. Invariants (unit-tested):
    picked nprobe is minimal on the curve; target 1.0 picks
    nprobe=num_shards ≡ exact search.

    Scale: the curve costs len(nprobes)+1 batched jobs ONCE at tuning
    time (amortized over every subsequent query); serving stays the
    partition-pruned scan — now with a recall certificate instead of a
    guessed knob."""
    from distributed_vector_database_spark.operators.eval import (
        ivf_recall_curve_df,
    )
    from distributed_vector_database_spark.operators.ivf import (
        IVFIndex,
        pick_nprobe,
    )

    emb = _read(spark, sf_dir, "embeddings")
    cents = _fixed_centroids(spark, sf_dir)
    idx = IVFIndex(spark, cents).attach(emb)
    queries = emb.filter(F.col("vec_id").isin(0, 25, 50, 75, 100)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    curve = ivf_recall_curve_df(idx, queries, k=10, nprobes=(1, 2, 4, 8))
    picked = pick_nprobe(curve, target_recall=0.95)
    qv = _query_vec(spark, sf_dir, 100)
    return idx.search(qv, k=5, nprobe=picked).select(
        F.lit(picked).cast("long").alias("nprobe"),
        "vec_id",
        "score",
    )


def _split_leakage_sql(
    num_hashes: int = 8, bands: int = 4, threshold: float = 0.5
) -> str:
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(md5('{j}:' || sg)) AS mh{j}" for j in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5("
        + " || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_ix, band{b} AS bv FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sig),
st AS MATERIALIZED ({stacked}),
cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM st a JOIN st b
           ON a.band_ix = b.band_ix AND a.bv = b.bv
          AND a.doc_id < b.doc_id),
ver AS (SELECT c.da, c.db FROM cand c
        JOIN sh ha ON ha.doc_id = c.da
        JOIN sh hb ON hb.doc_id = c.db
        WHERE round(len(list_intersect(ha.s, hb.s)) * 1.0
              / (len(ha.s) + len(hb.s) - len(list_intersect(ha.s, hb.s))),
              6) >= {threshold}),
f AS (SELECT doc_id,
        ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
          / 281474976710656.0 AS hf
      FROM documents),
sp AS (SELECT doc_id, CASE WHEN hf < 0.8 THEN 'train'
                           WHEN hf < 0.9 THEN 'val'
                           ELSE 'test' END AS split FROM f),
lab AS (SELECT least(pa.split, pb.split) AS split_a,
               greatest(pa.split, pb.split) AS split_b
        FROM ver JOIN sp pa ON pa.doc_id = ver.da
                 JOIN sp pb ON pb.doc_id = ver.db)
SELECT split_a, split_b, count(*)::BIGINT AS n_pairs,
       (split_a != split_b) AS leaked
FROM lab GROUP BY 1, 2
"""


@register("split_leakage_audit", _split_leakage_sql())
def q_split_leakage_audit(spark, sf_dir):
    """Near-dup leakage census across the pipeline's own train/val/test
    carving (`curation.split_leakage_audit`): every surviving near-dup
    pair (MinHash 8x4 band candidates, exact Jaccard >= 0.5 verify)
    labeled with its members' hash-split assignments — pairs straddling
    splits are eval leaks (a val/test doc that paraphrases a training
    doc). The split-time counterpart of `neardup_decontaminate_pairs`
    (which screens an external benchmark); together they close both
    leak surfaces a training pipeline has. Output is the |splits|²-
    bounded dashboard (split_a, split_b, n_pairs, leaked)."""
    from distributed_vector_database_spark.operators.curation import (
        split_leakage_audit,
    )

    docs = _spread_read(spark, sf_dir, "documents")
    return split_leakage_audit(
        docs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        num_hashes=8,
        bands=4,
        n=3,
        threshold=0.5,
    )


_PERSISTED_IVF_CACHE: dict = {}


@register("ivf_persisted_autotuned_search", _AUTOTUNED_IVF_SQL)
def q_ivf_persisted_autotuned_search(spark, sf_dir):
    """The serving-path end-to-end story (VERDICT r10 items 5+8): build
    and TUNE the persisted IVF index ONCE (index build time — partitioned
    parquet layout + `_centroids` + the measured `_recall_curve` tuning
    artifact, `IVFIndex.tune`), then COLD-LOAD it from disk and serve the
    autotuned pruned search — `search(target_recall=0.95)` picks nprobe
    from the PERSISTED curve with zero curve jobs (round-trip-tested in
    tests/test_store_ivf.py). The reference re-sets ``shards_to_search``
    per router process and loses all routing state on restart
    (`reference: src/compute_server.py:23-26,60-63`); here the knob's
    evidence survives restart inside the index layout itself.

    Same oracle as `ivf_autotuned_search`: identical fixed centroids +
    identical corpus give an identical curve, pick, and hit set whether
    served from the in-memory attach or the reloaded layout — so the
    oracle also checks that persistence round-trips the evidence."""
    import tempfile

    from distributed_vector_database_spark.operators.ivf import IVFIndex

    path = _PERSISTED_IVF_CACHE.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="dvdb_ivftuned_") + "/index"
        emb = _read(spark, sf_dir, "embeddings")
        idx = IVFIndex(spark, _fixed_centroids(spark, sf_dir), path=path)
        idx.write(emb)
        idx.tune(
            emb.filter(F.col("vec_id").isin(0, 25, 50, 75, 100)).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vector"),
            ),
            k=10,
            nprobes=(1, 2, 4, 8),
        )
        _PERSISTED_IVF_CACHE[sf_dir] = path
    cold = IVFIndex.load(spark, path)  # centroids + curve from disk
    qv = _query_vec(spark, sf_dir, 100)
    from distributed_vector_database_spark.operators.ivf import pick_nprobe

    picked = pick_nprobe(cold.recall_curve, 0.95)
    return cold.search(qv, k=5, target_recall=0.95).select(
        F.lit(picked).cast("long").alias("nprobe"),
        "vec_id",
        "score",
    )


# ---------------------------------------------------------------------------
# mor_concurrent_append_audit: the MoR commit protocol under a two-writer
# race (VERDICT r11 item 6 — the last untested claim in the MoR family's
# "database" framing). The reference has no concurrency story at all: its
# REPLACE INTO upserts go through one SQLite connection per storage node
# (`reference: src/storage_server.py:43-46`) and two clients interleave at
# row granularity with no detection. Here the append path is optimistic
# concurrency on plain parquet (the Delta/Iceberg commit pattern): read
# the high batch id, prepare under a writer-unique dot-temp, commit via a
# strict rename that exactly one racer can win (sources/mor.py
# `_commit_rename`).
# ---------------------------------------------------------------------------

_MOR_OCC_CACHE: dict = {}

_MOR_OCC_SQL = """
WITH merged AS (
  SELECT vec_id,
         (CASE WHEN vec_id % 5 = 0 THEN 3
               WHEN vec_id % 7 = 0 THEN 2
               ELSE 1 END) AS version
  FROM embeddings
)
SELECT CAST(version AS BIGINT) AS version,
       CAST(version - 1 AS BIGINT) AS committed_batch,
       CAST(CASE WHEN version = 3 THEN 1 ELSE 0 END AS BIGINT) AS conflicts,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM merged
GROUP BY version
ORDER BY version
"""


@register("mor_concurrent_append_audit", _MOR_OCC_SQL)
def q_mor_concurrent_append_audit(spark, sf_dir):
    """Two writers race one MoR upsert slot; optimistic concurrency
    arbitrates: writer A (vec_id%7, version 2) commits batch 1; writer B
    (vec_id%5, version 3) — whose optimistic read happened before A's
    commit — prepares the SAME slot and must lose LOUDLY at the commit
    rename (`ConcurrentWriteConflict`, prepared temp discarded, store
    untouched by it), then retries per the documented policy and lands
    at batch 2. The audit is all exact integers: per-version row counts
    and vec_id sums over the merged read (B's retried commit outranks A
    on the %35 overlap BECAUSE it committed later — keep-latest follows
    commit order, not wall-clock write order), the REAL committed batch
    ids returned by each append, and the observed conflict count. Any
    failure of the arbitration — B silently winning the slot, nesting
    inside A's batch (the legacy FileSystem.rename hazard), or landing
    at the wrong id — shifts a count, a batch id, or the overlap
    precedence and hash-mismatches the oracle.

    The reference has no concurrent-writer detection at all (one SQLite
    connection per node, `reference: src/storage_server.py:43-46`); a
    lakehouse store at 100 TB has many writers, and the commit cost here
    is O(1) filesystem metadata per batch regardless of corpus size —
    the arbitration never reads or shuffles data.
    """
    import tempfile

    from distributed_vector_database_spark.sources.mor import (
        ConcurrentWriteConflict,
        MorStore,
    )

    emb = _read(spark, sf_dir, "embeddings")

    def versioned(df, v):
        return df.select(
            "vec_id", F.lit(v).cast("long").alias("version")
        )

    cached = _MOR_OCC_CACHE.get(sf_dir)
    if cached is None:
        store = MorStore(
            spark, tempfile.mkdtemp(prefix="dvdb_morocc_"), id_col="vec_id"
        )
        store.write_base(versioned(emb, 1))
        a_id = store.append(
            versioned(emb.filter(F.col("vec_id") % 7 == 0), 2)
        )
        # writer B's race: its optimistic read of the high batch id
        # happened BEFORE A's commit (the stale listing below is that
        # read), so B prepares batch a_id too; the prepare and the
        # commit-rename refusal are fully real filesystem operations.
        b_rows = versioned(emb.filter(F.col("vec_id") % 5 == 0), 3)
        real_listing = store._delta_dirs
        state = {"stale": True}

        def optimistic_read():
            if state["stale"]:
                state["stale"] = False
                return []  # what B saw before A committed
            return real_listing()

        store._delta_dirs = optimistic_read
        conflicts = 0
        try:
            store.append(b_rows)
            raise AssertionError(
                "concurrent append must lose the commit race"
            )
        except ConcurrentWriteConflict:
            conflicts = 1
        finally:
            store._delta_dirs = real_listing
        b_id = store.append(b_rows)  # the documented retry: after A
        _MOR_OCC_CACHE[sf_dir] = (store, a_id, b_id, conflicts)
        cached = _MOR_OCC_CACHE[sf_dir]
    store, a_id, b_id, conflicts = cached
    batch_of = (
        F.when(F.col("version") == 1, F.lit(0))
        .when(F.col("version") == 2, F.lit(a_id))
        .otherwise(F.lit(b_id))
    )
    return (
        store.read()
        .groupBy("version")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("vec_id").cast("long").alias("sum_vec_id"),
        )
        .select(
            F.col("version").cast("long").alias("version"),
            batch_of.cast("long").alias("committed_batch"),
            F.when(F.col("version") == 3, F.lit(conflicts))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("conflicts"),
            "n_rows",
            "sum_vec_id",
        )
        .orderBy("version")
    )


# ---------------------------------------------------------------------------
# mor_compact_read_isolation: reads DURING a compaction fold (VERDICT r12
# item 3/5 — the one concurrency pair the OCC story didn't cover). The old
# swap protocol renamed the live base dir (base -> .base.trash -> new
# base), leaving a window where a concurrent read resolved NO base at all;
# the version-pointer commit (sources/mor.py: write base_v{N+1} ->
# advance watermark -> flip _base_version atomically -> delete folded
# deltas, retaining the superseded version one fold) closes it. This row
# audits the claim with real filesystem stages: a read executed at EVERY
# fold stage — before the fold, after the new version is written but
# before the pointer flips, after the flip with folded deltas still on
# disk, and after the fold completes — must return EXACTLY the keep-latest
# rows, as all-integer (count, sum) evidence. The reference has no
# compaction at all (its "reset" is delete-the-files,
# `reference: README.md:59`); this defends the engine's own claim.
# ---------------------------------------------------------------------------

_MOR_ISO_CACHE: dict = {}

_MOR_ISO_SQL = """
WITH live AS (
  SELECT vec_id FROM embeddings WHERE vec_id % 5 <> 0
)
SELECT CAST(s.stage AS BIGINT) AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM (VALUES (0), (1), (2), (3)) s(stage)
CROSS JOIN live
GROUP BY s.stage
ORDER BY stage
"""


@register("mor_compact_read_isolation", _MOR_ISO_SQL)
def q_mor_compact_read_isolation(spark, sf_dir):
    """Reader-vs-compaction isolation audit: the MoR base is committed by
    VERSION-POINTER flip (the Delta/Iceberg metadata-pointer pattern on
    plain parquet), so a read concurrent with ``compact()`` always
    resolves an intact base directory — either the superseded version
    (retained one fold) or the new one. The audit stages a real fold over
    base(all ids, v1) + an upsert delta (%7 -> v2) + a tombstone delta
    (%5 deleted) and executes a FULL merged read at each stage, hooked at
    the pointer-flip commit point:

      stage 0  before the fold
      stage 1  new base version written, watermark advanced, pointer
               still on the old version (a reader here scans the OLD
               base + all deltas)
      stage 2  pointer flipped, folded deltas still on disk (a reader
               here scans the NEW base; surviving delta rows tie with
               identical folded content, tombstones re-suppress)
      stage 3  fold complete, folded deltas deleted (live read)

    Every stage must report the identical keep-latest integers
    (count, sum of vec_id over ids not deleted) — under the old swap
    protocol stage 1/2-equivalent reads could observe a MISSING base
    (path error) or partial state, which would either throw or shift the
    exact-integer evidence. Stage 3 is computed by a live distributed
    read in the returned plan; stages 0-2 are the audited integers from
    the staged fold. O(1) filesystem metadata per commit regardless of
    corpus size — the isolation mechanism never reads or shuffles data.
    """
    import tempfile

    from distributed_vector_database_spark.sources.mor import MorStore

    emb = _read(spark, sf_dir, "embeddings")

    cached = _MOR_ISO_CACHE.get(sf_dir)
    if cached is None:
        store = MorStore(
            spark, tempfile.mkdtemp(prefix="dvdb_moriso_"), id_col="vec_id"
        )
        store.write_base(emb.select("vec_id"))
        store.append(
            emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
        )
        store.delete(emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"))

        def read_counts():
            row = store.read().agg(
                F.count("*").alias("n"),
                F.sum("vec_id").alias("s"),
            ).head()
            return int(row["n"]), int(row["s"])

        audited = {0: read_counts()}
        orig_flip = store._flip_pointer

        def staged_flip(version):
            audited[1] = read_counts()  # old pointer, new version staged
            orig_flip(version)
            audited[2] = read_counts()  # new pointer, deltas intact

        store._flip_pointer = staged_flip
        try:
            store.compact()
        finally:
            store._flip_pointer = orig_flip
        _MOR_ISO_CACHE[sf_dir] = (store, audited)
        cached = _MOR_ISO_CACHE[sf_dir]
    store, audited = cached
    staged = spark.createDataFrame(
        [(s, n, t) for s, (n, t) in sorted(audited.items())],
        "stage long, n_rows long, sum_vec_id long",
    )
    live = store.read().agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("vec_id").cast("long").alias("sum_vec_id"),
    ).select(F.lit(3).cast("long").alias("stage"), "n_rows", "sum_vec_id")
    return staged.unionByName(live).orderBy("stage")


# ---------------------------------------------------------------------------
# Registration-order rotation (round 14).
#
# The round driver oracle-checks only the FIRST 50 registered queries, so
# each round rotates a window to the front. This round-14 window = ROADMAP's
# next-window ledger (the 1 round-13 BUILD-session registration never
# driver-verified, fronted) + the first 49 round-10 window names
# (CORRECTNESS_r10 order) per the round-robin refresh schedule (ROADMAP.md
# "Rotation re-verification schedule"): r13 = r9 names, r14 = r10 names,
# repeat. The round-10 name that doesn't fit (upsert_keep_latest) is a
# refresh-only displacement — it stays driver-green on its r10 row and
# rejoins the cycle later. This window also happens to front most of the
# round-14 optimization targets (knn_graph_lsh/_capped, shared_span_*,
# cdc_dup_clusters, trigram/bm25 scorers), so the driver re-verifies the
# touched paths directly.
# NEW queries register at the registry END and get a line in ROADMAP's
# ```next-window``` block so they front round 15 before any refresh names.
# ---------------------------------------------------------------------------

_CHECK_FIRST = [
    # --- the 1 round-13 BUILD-session registration never driver-verified
    # (fronted, from ROADMAP's next-window ledger) ---
    "mor_compact_read_isolation",
    # --- round-robin refresh: the first 49 round-10 window names,
    # in their CORRECTNESS_r10 order (rotation schedule, ROADMAP.md) ---
    "cdc_chunk_search_hashed",
    "stream_cdc_chunk_search",
    "doc_novelty_ngram",
    "hll_order_year_overlap",
    "hll_rollup_distinct_users",
    "stream_doc_novelty",
    "cdc_chunk_ivf_search",
    "cdc_dup_clusters",
    "cms_join_size_estimate",
    "hdr_sliding_value_quantiles",
    "hll_sliding_distinct_users",
    "rocchio_expanded_search",
    "payload_dhash_pairs",
    "trigram_kn_ppl",
    "trigram_kn_heldout_ppl",
    "stream_payload_dhash_pairs",
    "payload_dedup_agreement",
    "bm25_prf_topk",
    "neardup_decontaminate_pairs",
    "mor_scd2_history",
    "mor_pit_read",
    "ql_dirichlet_topk",
    "hourly_session_concurrency",
    "copurchase_lift",
    "event_transition_matrix",
    "stream_event_transitions",
    "kmv_order_year_churn",
    "duplicate_paragraph_report",
    "knn_graph_lsh",
    "knn_graph_lsh_capped",
    "dedup_embedding_cosine_lsh",
    "cms_heavy_hitters",
    "kmv_order_year_overlap",
    "stream_cms_heavy_hitters",
    "winnow_shared_span_pairs",
    "shared_span_longest_run",
    "binary_asym_topk",
    "cms_merge_heavy_hitters",
    "cms_top_spenders",
    "fixed_k_sample_per_lang",
    "topk_cosine",
    "topk_euclidean",
    "topk_dot",
    "batch_topk_cosine",
    "point_lookup",
    "list_ids_stats",
    "ivf_assign",
    "ivf_count_per_shard",
    "ivf_search_pruned",
]


def _rotate_registry(front: list[str]) -> None:
    missing = [n for n in front if n not in _REGISTRY]
    assert not missing, f"rotation names not registered: {missing}"
    rest = [n for n in _REGISTRY if n not in front]
    ordered = {n: _REGISTRY[n] for n in [*front, *rest]}
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


_rotate_registry(_CHECK_FIRST)
