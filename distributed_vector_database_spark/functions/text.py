"""Text analysis column functions (LLM-training-data pipeline surface).

The reference embeds raw text (`reference: src/embed.py:11-20`) and otherwise
treats it as an opaque id (`reference: src/test.py:31-34` stores the article
text AS the id). This module adds the text-side operators a training-data
pipeline needs — tokenization, shingling, fingerprinting, portable hashing —
all as JVM-side Catalyst expressions (no Python UDFs).

Portability contract: every function here has an exact DuckDB-SQL equivalent
(see queries.py) built from the same primitives: regexp splits, md5 (both
engines emit lowercase hex), and list lambdas. md5-as-string also gives an
engine-independent total order (lexicographic on hex), which MinHash uses
instead of integer hashes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "word_shingles",
    "word_shingles_arrow",
    "normalize_ws",
    "doc_fingerprint",
    "doc_fingerprint_alnum",
    "md5_hash",
    "minhash_value",
]


def tokens(text: Column | str) -> Column:
    """Non-empty whitespace tokens.

    DuckDB mirror: list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> '')
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def word_shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Distinct word n-grams joined by single spaces.

    DuckDB mirror: list_distinct(list_transform(range(1, greatest(len(t)-(n-2),1)),
                                 i -> t[i] || ' ' || ... || t[i+n-1]))
    Docs with fewer than n tokens get an empty array.
    """
    out = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(out) if distinct else out


def word_shingles_arrow(
    text: Column | str, n: int = 3, distinct: bool = True
) -> Column:
    """Arrow-batched twin of ``word_shingles(tokens(text))`` — one pandas_udf
    doing tokenize + shingle + first-occurrence dedup per batch.

    Same contract as the expression form (tested equal on the sf corpora):
    whitespace tokens, n-grams joined by single spaces, docs with < n tokens
    -> empty array, ``distinct`` keeps first occurrence order.

    Why it exists: the expression form is a nest of higher-order functions
    (filter / transform / array_distinct) that Catalyst evaluates
    INTERPRETED, outside whole-stage codegen — measured 5.8 s vs 1.7 s for
    this kernel exploding 260k shingles at sf0.1. Python string slicing over
    an Arrow batch beats an interpreted expression tree; this is the hot
    path for every shingle-based operator (dedup, decontamination). Scales
    the same way at 100 TB: per-batch, shuffle-free, no driver involvement.
    """
    import re

    from pyspark.sql.types import ArrayType, StringType

    ws = re.compile(r"\s+")

    @F.pandas_udf(ArrayType(StringType()))
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [x for x in ws.split(t or "") if x]
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            if distinct:
                grams = list(dict.fromkeys(grams))
            out.append(grams)
        return pd.Series(out)

    return _sh(F.col(text) if isinstance(text, str) else text)


def normalize_ws(text: Column | str) -> Column:
    """Lowercase, collapse all whitespace runs to single spaces, trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def doc_fingerprint(text: Column | str) -> Column:
    """Whitespace-insensitive document content fingerprint (md5 hex).

    DuckDB mirror: md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    """
    return F.md5(normalize_ws(text))


def md5_hash(*cols: Column) -> Column:
    """md5 over the concatenation of string columns — the portable hash."""
    return F.md5(F.concat(*cols))


def minhash_value(shingle: Column, seed: int) -> Column:
    """One MinHash 'hash function': md5 of (seed ':' shingle).

    The *minimum hex string* per document under lexicographic order is the
    signature element — identical in any engine with md5, unlike integer
    murmur variants.
    """
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle))


def doc_fingerprint_alnum(text: Column | str) -> Column:
    """Punctuation-insensitive content fingerprint: lower -> strip every
    non-[a-z0-9 whitespace] char -> collapse whitespace -> trim -> md5.
    Catches the trivially-reformatted exact copies (`"Hello, world!"` ==
    `"hello world"`) that the whitespace-only `doc_fingerprint` misses —
    the aggressive normalization rung real pipelines run FIRST, before
    any near-dup machinery. DuckDB mirror:
    ``md5(trim(regexp_replace(regexp_replace(lower(text),
    '[^a-z0-9\\s]+', '', 'g'), '\\s+', ' ', 'g')))``."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    c = F.regexp_replace(c, r"[^a-z0-9\s]+", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.md5(F.trim(c))
