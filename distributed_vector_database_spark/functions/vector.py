"""Vector math as native Spark SQL column expressions.

The reference computes cosine similarity and Euclidean distance in per-pair
Python/numpy calls on the compute node (`reference: src/compute_server.py:29-38`):

    def euclidean(a, b): return np.linalg.norm(a - b)
    def cosine(a, b):
        na, nb = norm(a), norm(b)
        if na == 0 or nb == 0: return 0.0        # zero-norm guard
        return dot(a, b) / (na * nb)

Here the same math is expressed with Catalyst higher-order functions
(``zip_with`` + ``aggregate``), which run JVM-side inside the task — no
Python boundary, no serialization, works on any ``array<numeric>`` column.
All arithmetic is float64 regardless of the storage type (testdata stores
float32) so results are deterministic and oracle-comparable.

For brute-force scoring of very wide corpora there is also an Arrow-batched
numpy path in ``operators/topk.py``; these expressions are the semantic
definition both must match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
    "euclidean_distance",
    "squared_euclidean",
    "round_score",
    "ratio_6dp_exact",
    "micros_mean_6dp_exact",
]


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, computed in float64.

    Sequential left-to-right accumulation (same order as numpy's pairwise
    falls within 1e-12 for 64-d unit vectors; oracle comparisons round
    to 6 decimals — see ``round_score``).
    """
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean (L2) norm of an array column, float64."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with the reference's zero-norm guard.

    Returns 0.0 when either vector has zero norm
    (`reference: src/compute_server.py:36-37`), else dot/(|a|·|b|).
    """
    na = l2_norm(a)
    nb = l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def squared_euclidean(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance — cheaper than euclidean for argmin comparisons
    (monotone transform, same argmin), used by IVF shard routing."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (`reference: src/compute_server.py:29-30`)."""
    return F.sqrt(squared_euclidean(a, b))


def l2_normalize(df, vector_col: str, out_col: str | None = None):
    """Unit-normalize an array column (zero vectors pass through unchanged,
    mirroring the cosine zero-norm guard). Returns the DataFrame with
    ``out_col`` (default: replace ``vector_col``).

    This is a DataFrame-level op, not a Column fn, on purpose: the norm
    must be materialized ONCE per row through a Generate barrier —
    referencing a norm subexpression inside a ``transform`` lambda would
    recompute the O(d) norm for every element (Catalyst does no CSE inside
    HOF lambda bodies; README 'higher-order-function discipline').

    Why pre-normalize at all: over a normalized corpus cosine == dot, so
    every search drops two norm computations per row — the standard
    store-time trade for embedding tables.
    """
    out = out_col or vector_col
    v = _as_double(vector_col)
    ncol = "_n"
    while ncol in df.columns:  # collision-free helper name
        ncol += "_"
    with_n = df.select(
        *df.columns, F.explode(F.array(l2_norm(vector_col))).alias(ncol)
    )
    unit = F.when(F.col(ncol) == 0.0, v).otherwise(
        F.transform(v, lambda x: x / F.col(ncol))
    )
    cols = [unit.alias(c) if c == out else F.col(c) for c in df.columns]
    if out not in df.columns:
        cols.append(unit.alias(out))
    return with_n.select(*cols)


def round_score(c: Column, digits: int = 6) -> Column:
    """Round a float64 score for oracle comparison.

    Absorbs summation-order FP noise between engines (<=1e-12 for unit
    vectors) while keeping 6 significant decimals of the score.
    """
    return F.round(c, digits)


def ratio_6dp_exact(num_col: str, den_col: str) -> Column:
    """Half-away-from-zero 6dp rounding of an integer ratio num/den
    (den > 0) in EXACT 64-bit arithmetic:
    sign(num) * (2e6*|num| + den) div (2*den), then /1e6.

    Why not ``F.round(num/den, 6)``: when the exact rational sits ON a
    6dp boundary the nearest double is fractionally off it, and Spark's
    round of that double disagrees with DuckDB's ROUND (which rounds the
    shortest decimal repr) — found live on bigram_kn_ppl (doc 488,
    exactly 3.4223245). Takes column NAMES because exactness needs the
    JVM's integer ``div``, reachable only through an expr string. Both
    engines mirror: ``sign(num) * ((2000000*abs(num) + den) // (2*den))
    / 1e6`` (all operands must stay non-negative inside the div so
    Spark's truncate-toward-zero and DuckDB's floor agree)."""
    return (
        F.expr(
            f"sign({num_col}) * ((2000000 * abs(cast({num_col} AS bigint))"
            f" + {den_col}) div (2 * {den_col}))"
        ).cast("double")
        / F.lit(1e6)
    )


def micros_mean_6dp_exact(sum_micros_col: str, cnt_col: str) -> Column:
    """Half-away-from-zero 6dp mean of an exact integer-micro sum:
    round(sum/cnt) micros, computed as
    sign(sum) * (2*|sum| + cnt) div (2*cnt), then /1e6 — the
    exact-integer twin of ``F.round(sum/cnt/1e6, 6)`` (same boundary
    hazard as :func:`ratio_6dp_exact`). DuckDB mirror:
    ``sign(s) * ((2*abs(s) + n) // (2*n)) / 1e6``."""
    return (
        F.expr(
            f"sign({sum_micros_col}) *"
            f" ((2 * abs(cast({sum_micros_col} AS bigint)) + {cnt_col})"
            f" div (2 * {cnt_col}))"
        ).cast("double")
        / F.lit(1e6)
    )
