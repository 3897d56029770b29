"""SQL query surface: table views + SQL-callable vector functions.

The reference exposes no query language (SURVEY.md §2.12); Spark gives us
one for free. ``register`` publishes:

  - every testdata table as a temp view;
  - the vector kernel as SQL scalar UDFs (Spark 4 ``CREATE TEMPORARY
    FUNCTION ... RETURN <expr>`` — the body is a Catalyst expression, so
    these inline into whole-stage codegen exactly like the Column API in
    functions/vector.py; they are NOT Python UDFs).

After that, the whole engine is usable as plain ``spark.sql(...)`` text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "register", "sql"]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Bodies mirror functions/vector.py exactly (float64, zero-norm guard of
# reference: src/compute_server.py:33-38).
_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
    "(acc, v) -> acc + v)"
)
_FUNCTIONS = {
    "dot_product": f"""
CREATE OR REPLACE TEMPORARY FUNCTION dot_product(
    a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
RETURN {_DOT}
""",
    "l2_norm": """
CREATE OR REPLACE TEMPORARY FUNCTION l2_norm(a ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN sqrt(dot_product(a, a))
""",
    "cosine_sim": """
CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(
    a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
RETURN CASE WHEN l2_norm(a) = 0.0 OR l2_norm(b) = 0.0 THEN 0.0
            ELSE dot_product(a, b) / (l2_norm(a) * l2_norm(b)) END
""",
    "euclidean_dist": """
CREATE OR REPLACE TEMPORARY FUNCTION euclidean_dist(
    a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                      CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
""",
}


def register(spark: SparkSession, sf_dir: str) -> None:
    """Create temp views for every table in ``sf_dir`` and the SQL vector
    functions. Idempotent."""
    from distributed_vector_database_spark.queries import _read

    for t in TABLES:
        _read(spark, sf_dir, t).createOrReplaceTempView(t)
    for stmt in _FUNCTIONS.values():
        spark.sql(stmt)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL string against the registered surface."""
    register(spark, sf_dir)
    return spark.sql(query)
