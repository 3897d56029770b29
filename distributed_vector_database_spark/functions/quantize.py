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

__all__ = [
    "int8_quantize",
    "int8_dequantize",
    "quantize_stats",
    "sign_pack",
    "sign_pack_vector",
    "hamming_distance",
]


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


def sign_pack(vec: str | Column, dim: int, *, word_bits: int = 32) -> Column:
    """Binary (1-bit) quantization: pack the sign bits of a ``dim``-wide
    vector into ``ceil(dim / word_bits)`` BIGINT words (big-endian within
    each word; trailing bits of a ragged last word are zero).

    32 bits per word (not 64) keeps every intermediate below 2^32 so the
    Horner accumulation ``acc*2 + bit`` never overflows a signed 64-bit
    integer — Spark would silently wrap while the DuckDB oracle would
    raise, and an overflow-free formula is also what a SQL engine without
    unsigned types can evaluate verbatim. 1 bit/dim is a 32x compression
    over float32: the coarsest rung of the quantization ladder
    (float32 -> int8 -> PQ -> binary), and the only one whose distance
    (Hamming) needs no codebook at all.
    """
    v = _c(vec).cast("array<double>")
    n_words = (dim + word_bits - 1) // word_bits
    words = []
    for w in range(n_words):
        bits = F.slice(v, w * word_bits + 1, word_bits)
        word = F.aggregate(
            bits,
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(2).cast("long")
            + F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )
        # ragged last word: left-shift the short run so bit positions are
        # stable regardless of dim (slice returns only the available tail)
        short = dim - w * word_bits
        if short < word_bits:
            word = word * F.lit(2 ** (word_bits - short)).cast("long")
        words.append(word)
    return F.array(*words)


def sign_pack_vector(
    vector, *, word_bits: int = 32
) -> list[int]:
    """Driver-side twin of :func:`sign_pack` for packing a query literal."""
    dim = len(vector)
    n_words = (dim + word_bits - 1) // word_bits
    out = []
    for w in range(n_words):
        acc = 0
        chunk = vector[w * word_bits : (w + 1) * word_bits]
        for x in chunk:
            acc = acc * 2 + (1 if float(x) >= 0 else 0)
        acc <<= word_bits - len(chunk)
        out.append(acc)
    return out


def hamming_distance(a: str | Column, b: str | Column) -> Column:
    """Bit-level Hamming distance between two packed sign arrays
    (:func:`sign_pack` output): ``sum(bit_count(a[i] XOR b[i]))``.

    Pure Catalyst (zip_with + bit_count + aggregate) — whole-stage
    codegen'd, no shuffle, no Python. For sign-packed vectors this equals
    the number of dimensions where the two vectors disagree in sign,
    which is the binary estimate of angular distance (Charikar's SimHash
    bound: P[bit differs] = angle / pi).
    """
    xor = F.zip_with(
        _c(a), _c(b), lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")
    )
    return F.aggregate(xor, F.lit(0).cast("long"), lambda acc, x: acc + x)


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
