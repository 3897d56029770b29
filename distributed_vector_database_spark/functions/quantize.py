"""Scalar (int8) vector quantization as pure Catalyst expressions.

Beyond-reference surface: at 100 TB an ``array<float>`` embedding column is
4 bytes/dim; per-vector min-max int8 codes cut that 4x (1 byte/dim + two
float64 bounds), which is the difference between an index that fits in
executor memory and one that spills. The reference stores raw float64 JSON
(reference: src/storage_server.py:43-46) — no compression at all.

All math is float64 JVM-side (``transform`` higher-order function — no UDF,
stays inside whole-stage codegen) and uses only IEEE-exact ops (sub, mul,
div, floor, least/greatest) so an independent engine (the DuckDB oracle)
reproduces codes bit-for-bit from the same formula text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["int8_quantize", "int8_dequantize", "quantize_stats"]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def int8_quantize(vec: str | Column) -> Column:
    """Struct ``(mn double, mx double, codes array<int>)`` — per-vector
    min-max scalar quantization to the 0..255 grid.

    ``code = floor((x - mn) * 255.0 / (mx - mn))`` clamped to [0, 255];
    constant vectors (mx == mn) encode as all-zero codes.
    """
    v = _c(vec).cast("array<double>")
    mn = F.array_min(v)
    mx = F.array_max(v)
    code = lambda x: F.least(  # noqa: E731
        F.greatest(
            F.floor((x - mn) * F.lit(255.0) / (mx - mn)), F.lit(0.0)
        ),
        F.lit(255.0),
    ).cast("int")
    codes = F.when(mx == mn, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, code)
    )
    return F.struct(
        mn.alias("mn"), mx.alias("mx"), codes.alias("codes")
    )


def int8_dequantize(q: str | Column) -> Column:
    """Reconstruct ``array<double>`` from an :func:`int8_quantize` struct:
    ``x' = mn + code * ((mx - mn) / 255.0)``."""
    q = _c(q)
    mn, mx = q["mn"], q["mx"]
    return F.transform(
        q["codes"],
        lambda c: mn + c.cast("double") * ((mx - mn) / F.lit(255.0)),
    )


def quantize_stats(vec: str | Column) -> Column:
    """Round-trip fidelity: max absolute reconstruction error for the
    vector (bounded by the quantization step ``(mx-mn)/255``)."""
    v = _c(vec).cast("array<double>")
    recon = int8_dequantize(int8_quantize(v))
    return F.aggregate(
        F.zip_with(v, recon, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
