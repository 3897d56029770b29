"""Deduplication operators for training-data pipelines.

Five dedup families over the ``documents`` / ``embeddings`` tables, each a
declarative DataFrame plan (SURVEY.md §7.7; BASELINE.json north star):

  - exact:      content-hash groupBy (one shuffle on the hash)
  - jaccard:    exact n-gram Jaccard similarity join (explode + equi-join on
                shingle — the shuffle key is the shingle, so common shingles
                dominate cost; use minhash for the 100 TB path)
  - minhash:    MinHash+LSH banding — candidate pairs via equi-join on band
                signature; O(docs × bands) shuffle rows instead of O(pairs)
  - simhash:    64-bit SimHash fingerprint (bit-vote aggregation)
  - embedding:  cosine near-duplicate pairs (brute force here; the ANN/LSH
                variants in operators/ann.py are the scale path)

All hashing is md5-based (portable across engines — see functions/text.py),
so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.text import (
    tokens,
    word_shingles,
    word_shingles_arrow,
    doc_fingerprint,
    minhash_value,
)
from distributed_vector_database_spark.functions.vector import (
    cosine_similarity,
    round_score,
)

__all__ = [
    "exact_dedup_groups",
    "jaccard_pairs",
    "jaccard_pairs_prefix",
    "minhash_signatures",
    "minhash_band_buckets",
    "minhash_bucket_dup_flags",
    "minhash_candidate_pairs",
    "simhash_fingerprints",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_lsh",
    "keep_best_per_cluster",
    "semantic_dedup",
    "repeated_spans",
    "doc_repeated_span_stats",
    "paragraph_blocks",
    "paragraph_dedup_stats",
    "duplicate_paragraphs",
    "simhash_neardup_pairs",
    "shared_span_pairs",
    "longest_shared_runs",
    "shared_runs",
    "excise_spans",
    "winnow_owner_dup_flags",
    "hamming_band_pairs",
]

HEX = "0123456789abcdef"


def exact_dedup_groups(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by normalized-content hash.

    Returns (text_hash, rep_doc_id = min id, dup_count). Drop duplicates by
    keeping rep_doc_id. One hash-shuffle; at 100 TB combine map-side via the
    partial aggregation Spark already does for min/count.
    """
    return (
        docs.select(doc_fingerprint(text_col).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


def _shingled(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    method: str = "expr",
) -> DataFrame:
    """(id, shingles): distinct word n-grams per doc, empty docs dropped.

    ``method="expr"`` (default) evaluates shingles via Catalyst with the
    Generate trick below. The dedup self-join plans REFERENCE this frame
    3-4 times (prefix side a, side b, verify join-back), and Spark
    re-evaluates an un-cached subtree per reference — the Arrow kernel
    (``method="arrow"``, `functions.text.word_shingles_arrow`) pays a
    Python round-trip per re-evaluation and measured SLOWER end-to-end
    here (5.9 s vs 3.5 s, dedup_jaccard sf0.1), while single-evaluation
    consumers (decontamination) are 5x FASTER on arrow. Pick per call
    site; both are tested equal.

    Expression-path note: Catalyst does no subexpression elimination inside
    higher-order-function lambdas, and ProjectCollapse re-inlines aliased
    projections — so naively passing ``tokens(text)`` into ``word_shingles``
    makes every per-position ``element_at`` lambda re-tokenize the document:
    O(len²) per doc and a ~60x slowdown observed at sf0.1.
    ``explode(array(expr))`` routes the token array through a Generate
    operator (one evaluation per row, not inlinable), so the shingle lambdas
    read a materialized array attribute.
    """
    if method == "arrow":
        return docs.select(
            F.col(id_col),
            word_shingles_arrow(text_col, n=n).alias("shingles"),
        ).filter(F.size("shingles") > 0)
    with_toks = docs.select(
        F.col(id_col), F.explode(F.array(tokens(text_col))).alias("_toks")
    )
    return with_toks.select(
        F.col(id_col),
        word_shingles(F.col("_toks"), n=n).alias("shingles"),
    ).filter(F.size("shingles") > 0)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity self-join.

    Plan: shingle -> explode -> equi-join on shingle (a < b) -> count
    intersections -> |A∪B| = |A|+|B|-∩. Returns (doc_id_a, doc_id_b, jaccard)
    for pairs >= threshold.

    Scale note: the equi-join on shingle is exact but its cost is
    sum(df_shingle²) over shingle frequencies — a stop-shingle appearing in
    every doc creates |docs|² pairs. At 100 TB use minhash_candidate_pairs
    (bounded fan-out) and verify candidates with this operator.
    """
    sh = _shingled(docs, text_col, id_col, n)
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("sg"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sg") == F.col("b.sg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            round_score(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def jaccard_pairs_prefix(
    docs: DataFrame,
    threshold: float = 0.8,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard pairs via PPJoin-style prefix filtering — identical
    results to :func:`jaccard_pairs`, sub-quadratic candidate generation.

    Theorem (prefix filter): order every set by one global total order; if
    J(A,B) >= t, A and B must share a shingle within each one's first
    ``|X| - ceil(t*|X|) + 1`` elements. Ordering by ASCENDING document
    frequency puts the RAREST shingles in the prefix, so the candidate
    equi-join runs on rare keys only — the hot-shingle blow-up of the full
    join (cost sum(df²), SURVEY-noted) never happens. A length filter
    (t*|A| <= |B|) prunes further. Candidates are verified exactly with
    ``array_intersect`` on the two shingle arrays — no second explode.

    Shuffles: one groupBy(shingle) for df, one window by doc for prefix
    positions, the (small) candidate join, one join back to the shingle
    arrays. Every stage is partial-aggregated or narrow.
    """
    # three consumers (the prefix explode + both verify sides) would each
    # re-run the shingle kernel — cache it once (round 13, guide §2.4;
    # same idiom minhash_jaccard_estimates already used). Lifetime
    # (ADVICE r13, applies to every in-plan .cache() in this package):
    # the cached frame is part of the returned lazy plan, so it cannot be
    # unpersisted here without recomputing per consumer; it stays pinned
    # (evictable — cache, not checkpoint) until the session ends. Callers
    # here are short-lived query/bench/oracle sessions; a long-lived
    # server would wrap calls with an explicit
    # `spark.catalog.clearCache()` between requests.
    sh = (
        _shingled(docs, text_col, id_col, n)
        .select(
            F.col(id_col),
            F.col("shingles"),
            F.size("shingles").alias("n_sh"),
        )
        .cache()
    )
    ex = sh.select(F.col(id_col), F.col("n_sh"), F.explode("shingles").alias("sg"))
    # df stays groupBy + join-back (NOT a count window by sg): the
    # window form was measured slower here (dedup_clusters 4.1 -> 5.7 at
    # sf0.1) and is skew-prone at scale — one hot shingle becomes one
    # giant window partition, while the groupBy reduces map-side. The
    # bucket-owner dedup's window idiom wins only on uniform hash keys.
    df_counts = ex.groupBy("sg").agg(F.count("*").alias("_df"))
    ranked = ex.join(df_counts, "sg").withColumn(
        "_pos",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.asc("_df"), F.asc("sg")
            )
        ),
    )
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(float(threshold)) * F.col("n_sh")) + 1
    )
    prefix = ranked.filter(F.col("_pos") <= prefix_len).select(
        id_col, "n_sh", "sg", "_pos"
    )

    a = prefix.select(
        F.col(id_col).alias("doc_id_a"),
        F.col("n_sh").alias("na"),
        "sg",
        F.col("_pos").alias("_pa"),
    )
    b = prefix.select(
        F.col(id_col).alias("doc_id_b"),
        F.col("n_sh").alias("nb"),
        "sg",
        F.col("_pos").alias("_pb"),
    )
    t = float(threshold)
    # PPJoin positional filter (round 14, guide §2.3/§2.4 — shrink the
    # candidate set before the distinct + verify shuffles): a match on a
    # prefix shingle at positions (_pa, _pb) bounds the pair's overlap at
    # 1 + min(na - _pa, nb - _pb), and J >= t needs overlap >=
    # t*(na+nb)/(1+t). Safe by the shared global order (asc df, asc sg —
    # identical on both sides): a true pair's FIRST shared shingle lies
    # within both prefixes (prefix theorem) and every other shared
    # shingle sits after it on BOTH sides, so that row's bound covers the
    # full overlap and the row passes — at least one row per true pair
    # survives into the distinct. The 1e-9 slack only loosens pruning
    # (float round-off can never drop a true pair); pruned rows are
    # candidates the exact verify would have rejected anyway.
    ubound = 1 + F.least(
        F.col("na") - F.col("_pa"), F.col("nb") - F.col("_pb")
    )
    cands = (
        a.join(b, "sg")
        .filter(
            (F.col("doc_id_a") < F.col("doc_id_b"))
            # length filter: J >= t requires t*|A| <= |B| and t*|B| <= |A|
            & (F.lit(t) * F.col("na") <= F.col("nb"))
            & (F.lit(t) * F.col("nb") <= F.col("na"))
            & (
                ubound * F.lit(1.0 + t)
                >= F.lit(t) * (F.col("na") + F.col("nb")) - F.lit(1e-9)
            )
        )
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )

    sa = sh.select(
        F.col(id_col).alias("doc_id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    sb = sh.select(
        F.col(id_col).alias("doc_id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    verified = (
        cands.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("sh_a", "sh_b"))
        )
        .withColumn(
            "jaccard",
            round_score(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )
    return verified


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per document: for seed j, min over shingles of
    md5(j ':' shingle) (lexicographic min of hex strings — engine-portable).

    Returns (id, mh0..mh{num_hashes-1}). One explode + one groupBy with
    map-side-combinable min aggregates.
    """
    sh = _shingled(docs, text_col, id_col, n)
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("sg"))
    aggs = [
        F.min(minhash_value(F.col("sg"), j)).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_band_buckets(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 2,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH band bucket membership: ``(id, band_ix, bv)`` where ``bv`` is
    md5 of the band's signature rows — one row per (doc, band). The
    shared front half of pair mining (`minhash_candidate_pairs`), bucket
    dup-flagging (`minhash_bucket_dup_flags`), and the streaming index
    (`streaming.docs.stream_minhash_dedup`)."""
    sig = minhash_signatures(
        docs, num_hashes, n=n, text_col=text_col, id_col=id_col
    )
    return _band_buckets_from_signatures(sig, num_hashes, bands, id_col=id_col)


def _band_buckets_from_signatures(
    sig: DataFrame,
    num_hashes: int,
    bands: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band-bucket membership derived from an EXISTING signature frame
    (``(id, mh0..mh{k-1})`` with ``k >= num_hashes``). Because hash j is
    seed-indexed (``minhash_value(sg, j)`` — the seed is part of the
    hashed bytes), the first ``num_hashes`` columns of a wider signature
    frame are bit-identical to a ``minhash_signatures(docs, num_hashes)``
    run, so one corpus pass at ``max(num_hashes)`` can serve every
    narrower config by slicing (VERDICT r8 item 2: the operating-point
    audit was paying the shingle-explode-groupBy corpus pass once PER
    config)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_ix"), F.col(f"band{b}").alias("bv")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band_ix"), F.col("bb.bv"))


def minhash_bucket_dup_flags(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 2,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-pass bucket-owner dedup decision: every LSH band bucket is
    owned by the LOWEST doc id it contains; a doc is flagged duplicate if
    ANY of its bands lands in a bucket owned by a smaller id.

    ``(id, n_bands, n_dup_bands, is_dup)``. This is the greedy keep-
    lowest-id LSH dedup rule, made ORDER-FREE (ownership is a min over
    the whole bucket, not an arrival race) — so the same contract is
    computable incrementally by a stream (`streaming.docs.
    stream_minhash_dedup` maintains owner-so-far state and matches this
    batch form exactly for id-ordered arrival) and by a SQL oracle.

    Scale: ONE shuffle on the uniform band key — ownership is a
    ``min() OVER (PARTITION BY band)`` window, not a groupBy + join back
    (the join form evaluates the signature subtree twice; the window
    form was measured 2x faster at sf0.1). No pair fan-out at all,
    which is why production pipelines flag via bucket owners first and
    reserve pair verification for the survivors. Docs with zero
    shingles are absent (no bands).
    """
    from pyspark.sql import Window

    st = minhash_band_buckets(
        docs, num_hashes, bands, n=n, text_col=text_col, id_col=id_col
    )
    owner = F.min(id_col).over(Window.partitionBy("band_ix", "bv"))
    lost = F.sum(
        F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0)
    )
    return (
        st.withColumn("_owner", owner)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bands"),
            lost.cast("long").alias("n_dup_bands"),
            (lost > 0).alias("is_dup"),
        )
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 2,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: docs sharing any band of their MinHash signature.

    band_b = md5(concat of the band's rows); candidates = equi-join on
    (band index, band value), a < b, distinct. Returns (doc_id_a, doc_id_b).

    Scale: the join key is a hash band — uniform by construction, so the
    shuffle is balanced; pair fan-out is bounded by bucket sizes (tunable
    via bands/rows), never |docs|².
    """
    stacked = minhash_band_buckets(
        docs, num_hashes, bands, n=n, text_col=text_col, id_col=id_col
    )
    return _candidate_pairs_from_buckets(stacked, id_col=id_col)


def _candidate_pairs_from_buckets(
    stacked: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """The banding self-join half of `minhash_candidate_pairs`, taking a
    pre-built ``(id, band_ix, bv)`` bucket frame so callers that already
    hold one (the operating-point audit slicing a shared signature frame)
    skip the corpus pass."""
    a, b = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_ix") == F.col("b.band_ix"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .distinct()
    )


def minhash_jaccard_estimates(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 2,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-candidate-pair MinHash Jaccard ESTIMATE next to the EXACT
    shingle Jaccard — the error audit that tells you whether
    ``num_hashes`` is big enough for the threshold you filter at (the
    estimator is the mean of ``num_hashes`` Bernoulli(J) draws:
    stderr = sqrt(J(1-J)/num_hashes) ~ 0.17 at J=0.5, k=8 — wide, which
    is exactly why the production dedup paths VERIFY with exact Jaccard
    and use MinHash only to generate candidates).

    Candidates come from the same LSH banding as
    `minhash_candidate_pairs`; the signature frame (1 row/doc, computed
    once, checkpointed — three consumers: band build + both estimate
    sides) also supplies the estimate. The shingle frame feeding the
    exact verify has two consumers too (the a and b join sides), so it
    is cache()d — one kernel run when memory allows, recomputed under
    eviction pressure (corpus-scale arrays, so no pinned checkpoint).
    Returns (doc_id_a, doc_id_b, est_jaccard, jaccard, abs_err), floats
    rounded to 6dp.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(
        docs, num_hashes, n=n, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=True)
    band_cols = [
        F.md5(
            F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    stacked = (
        sig.select(F.col(id_col), *band_cols)
        .select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_ix"),
                            F.col(f"band{b}").alias("bv"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select(F.col(id_col), F.col("bb.band_ix"), F.col("bb.bv"))
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_ix") == F.col("b.band_ix"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .distinct()
    )
    sig_a = sig.select(
        F.col(id_col).alias("doc_id_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(num_hashes)],
    )
    sig_b = sig.select(
        F.col(id_col).alias("doc_id_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(num_hashes)],
    )
    agree = reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
            for j in range(num_hashes)
        ],
    )
    sh = _shingled(docs, text_col, id_col, n).cache()
    sh_a = sh.select(
        F.col(id_col).alias("doc_id_a"),
        F.col("shingles").alias("sh_a"),
        F.size("shingles").alias("na"),
    )
    sh_b = sh.select(
        F.col(id_col).alias("doc_id_b"),
        F.col("shingles").alias("sh_b"),
        F.size("shingles").alias("nb"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cands.join(sig_a, "doc_id_a")
        .join(sig_b, "doc_id_b")
        .withColumn(
            "est_jaccard",
            F.round(agree.cast("double") / F.lit(float(num_hashes)), 6),
        )
        .join(sh_a, "doc_id_a")
        .join(sh_b, "doc_id_b")
        .withColumn(
            "jaccard",
            F.round(
                inter.cast("double")
                / (F.col("na") + F.col("nb") - inter).cast("double"),
                6,
            ),
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            "est_jaccard",
            "jaccard",
            F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6).alias(
                "abs_err"
            ),
        )
    )


def minhash_band_stats(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 2,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-band LSH bucket-size audit — the operational guard EVERY
    banded-LSH join at scale needs BEFORE launching the self-join:
    (band_ix, n_buckets, n_docs, max_bucket, pairs_upper_bound) where
    ``pairs_upper_bound = sum over buckets of c*(c-1)/2`` is exactly the
    candidate-pair volume the band's equi-join will emit. A skewed or
    degenerate signature distribution (see SCALING.md's adaptive-LSH
    section — dense embedding piles put 96% of rows in 2 buckets) shows
    up here as max_bucket ~ n_docs and a quadratic pairs bound, BEFORE
    you pay for it. All integers — bit-exact cross-engine.

    Scale: one partial-agg groupBy on the uniform (band, bucket) key,
    then a per-band rollup of at most #buckets rows — no pair fan-out
    anywhere in the audit itself.
    """
    buckets = minhash_band_buckets(
        docs, num_hashes, bands, n=n, text_col=text_col, id_col=id_col
    )
    per_bucket = buckets.groupBy("band_ix", "bv").agg(
        F.count("*").alias("c")
    )
    return (
        per_bucket.groupBy("band_ix")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("c").cast("long").alias("n_docs"),
            F.max("c").cast("long").alias("max_bucket"),
            F.sum(
                (F.col("c") * (F.col("c") - 1) / 2).cast("long")
            )
            .cast("long")
            .alias("pairs_upper_bound"),
        )
        .orderBy("band_ix")
    )


def minhash_operating_points(
    docs: DataFrame,
    configs: Sequence[tuple[int, int]] = ((8, 2), (8, 4), (16, 4), (16, 8)),
    threshold: float = 0.5,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The LSH TUNING artifact (VERDICT r7 item 6 — the banding
    counterpart of `eval.ivf_recall_curve_df`): for each
    (num_hashes, bands) configuration, candidate-pair recall AND
    precision against the EXACT Jaccard >= threshold pair set, as exact
    integer counts. One row per config:
    (num_hashes, bands, n_candidates, n_true, n_hits, recall, precision)
    where n_hits = |candidates ∩ truth|, recall = n_hits/n_true,
    precision = n_hits/n_candidates (6dp; null when the denominator is
    0). Banding theory says a config's match probability at Jaccard s is
    1-(1-s^r)^b (r = num_hashes/bands): more bands at fixed num_hashes
    shifts the s-curve left (recall up, precision down). This row
    measures where YOUR corpus actually lands on that curve.

    Truth = `jaccard_pairs_prefix(threshold)` — exact by the prefix
    theorem, sub-quadratic, computed ONCE and checkpointed (it is a
    pairs-at-threshold frame: small, every config reads it). The corpus
    signature pass (shingle explode + groupBy min) ALSO runs once, at
    ``max(num_hashes)``, and is cached: hash j is seed-indexed, so every
    config's bands derive from column slices of that one frame,
    bit-identical to a per-config run (`_band_buckets_from_signatures` —
    VERDICT r8 item 2; the previous form paid the corpus pass once per
    config, 4x here). Per config the candidate frame is consumed once
    (a single left join carries both the candidate count and the hit
    count), so nothing corpus-scale is pinned beyond the one evictable
    cached signature frame. Scale: one corpus pass + per-config banding
    self-joins (the cost its production flags pay anyway) + one
    broadcast join per config against the small truth frame.
    """
    truth = (
        jaccard_pairs_prefix(
            docs, threshold, n=n, text_col=text_col, id_col=id_col
        )
        .select("doc_id_a", "doc_id_b")
        .localCheckpoint(eager=True)
    )
    t_marked = truth.withColumn("_t", F.lit(1))
    sig = minhash_signatures(
        docs,
        max(nh for nh, _ in configs),
        n=n,
        text_col=text_col,
        id_col=id_col,
    ).cache()
    # Round 13 (guide §2.4): ONE config-tagged banding self-join instead
    # of one per config. The per-config band frames are cheap projections
    # of the shared cached signature frame; tagging them with
    # (num_hashes, bands) literals and unioning makes the candidate
    # generation a single equi-join on (config, band_ix, bv) over the
    # same total row volume — 4 exchange+join+distinct pipelines collapse
    # to 1 (plan: 66 Exchange -> 32), and the truth-count aggregate runs
    # once instead of once per config. Emitted counts are byte-identical:
    # the config tag rides the join key, so no cross-config pair can
    # match.
    stacked = None
    for num_hashes, bands in configs:
        s = _band_buckets_from_signatures(
            sig, num_hashes, bands, id_col=id_col
        ).select(
            F.lit(num_hashes).cast("long").alias("num_hashes"),
            F.lit(bands).cast("long").alias("bands"),
            F.col(id_col),
            "band_ix",
            "bv",
        )
        stacked = s if stacked is None else stacked.unionByName(s)
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.num_hashes") == F.col("b.num_hashes"))
            & (F.col("a.bands") == F.col("b.bands"))
            & (F.col("a.band_ix") == F.col("b.band_ix"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col("a.num_hashes").alias("num_hashes"),
            F.col("a.bands").alias("bands"),
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .distinct()
    )
    grouped = (
        cand.join(F.broadcast(t_marked), ["doc_id_a", "doc_id_b"], "left")
        .groupBy("num_hashes", "bands")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.count("_t").cast("long").alias("n_hits"),
        )
    )
    # a config whose banding yields ZERO candidates must still emit its
    # row (n_candidates=0, precision null) — the per-config agg used to
    # guarantee that; after the groupBy it needs the literal config frame
    spark = docs.sparkSession
    cfg_df = spark.createDataFrame(
        [(int(nh), int(b)) for nh, b in configs],
        "num_hashes long, bands long",
    )
    counts = (
        cfg_df.join(grouped, ["num_hashes", "bands"], "left")
        .select(
            "num_hashes",
            "bands",
            F.coalesce(F.col("n_candidates"), F.lit(0).cast("long")).alias(
                "n_candidates"
            ),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias(
                "n_hits"
            ),
        )
        .crossJoin(truth.agg(F.count("*").cast("long").alias("n_true")))
    )

    # 6dp ratio rounding in EXACT integer arithmetic ((2e6*num + den)
    # div (2*den) = half-up of the exact rational): rounding the
    # DOUBLE quotient diverges across engines when the exact value
    # sits ON a 6dp boundary (the KN-ppl lesson, lm.py)
    def ratio6(num: str, den: str):
        return F.when(
            F.col(den) > 0,
            F.expr(
                f"(2000000 * {num} + {den}) div (2 * {den})"
            ).cast("double")
            / F.lit(1e6),
        )

    return counts.select(
        "num_hashes",
        "bands",
        "n_candidates",
        "n_true",
        "n_hits",
        ratio6("n_hits", "n_true").alias("recall"),
        ratio6("n_hits", "n_candidates").alias("precision"),
    )


def simhash_fingerprints(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document as a 16-char hex string.

    Per token occurrence: h = md5(token); its first 16 hex nibbles carry
    4 bits each. Each bit votes +1/-1; fingerprint bit = majority > 0.
    Pure aggregation: explode tokens -> 64 conditional sums -> reassemble.
    All md5/strpos arithmetic — portable to the SQL oracle.
    """
    ex = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    agg_exprs = []
    for j in range(16):
        # nibble value at 1-based hex position j+1: conv(hexchar, 16, 10)
        nib = F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int")
        for bit in range(4):
            vote = (F.floor(nib / (2**bit)).cast("int") % 2) * 2 - 1
            agg_exprs.append(F.sum(vote).alias(f"v_{j}_{bit}"))
    votes = ex.groupBy(id_col).agg(*agg_exprs)
    hex_chars = F.array(*[F.lit(c) for c in HEX])
    chars = [
        F.element_at(
            hex_chars,
            (
                reduce(
                    lambda x, y: x + y,
                    [
                        F.when(F.col(f"v_{j}_{b}") > 0, F.lit(2**b)).otherwise(
                            F.lit(0)
                        )
                        for b in range(4)
                    ],
                )
                + 1
            ).cast("int"),
        )
        for j in range(16)
    ]
    return votes.select(F.col(id_col), F.concat(*chars).alias("simhash"))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    num_blocks: int = 8,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Exact all-pairs, computed as a distributed block outer product: rows
    hash into ``num_blocks`` blocks, each block packs its vectors into one
    numpy matrix, the B(B+1)/2 block pairs cross-join, and each pair runs
    ONE float64 GEMM (A_norm @ B_normᵀ) inside Arrow-batched mapInPandas.
    Versus the row-at-a-time expression join this is ~100x: a 25M-pair
    sf0.1 run drops from ~124 s to ~1 s, because the dot products run in
    BLAS instead of one interpreted lambda per element per pair.

    Still O(n²) work — exact dedup can't avoid it in the worst case; size
    ``num_blocks`` so a block's matrix (rows/B x dim x 8B) fits an executor.
    The corpus size is guarded (``max_rows``, same discipline as
    `batch_topk`'s query cap): above it the call refuses and points at
    `embedding_neardup_pairs_lsh` — the sub-quadratic capped-LSH twin
    whose output is proven a subset-complete match at the threshold —
    rather than silently launching n² GEMM work. The guard runs a bounded
    probe job (``limit(max_rows+1).count()`` — stops after max_rows+1
    rows rather than executing the full upstream plan) on every call;
    ``max_rows=None`` skips it for deliberate offline exact runs.
    """
    import numpy as np  # noqa: F401  (executor-side import checked early)

    if max_rows is not None:
        n = emb.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                "embedding_neardup_pairs is exact O(n^2): corpus has more "
                f"than max_rows={max_rows} rows. Use "
                "dedup.embedding_neardup_pairs_lsh (the sub-quadratic "
                "twin) or pass max_rows=None for a deliberate exact run."
            )

    spark = emb.sparkSession
    src = emb.select(
        F.col(id_col).alias("_id").cast("long"),
        F.col(vector_col).cast("array<double>").alias("_v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(num_blocks)).alias("_bid"),
    )

    pack_schema = "bid int, ids binary, mat binary, n int, dim int"

    def pack(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["_id"].to_numpy(dtype=np.int64)
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        # zero-norm guard (reference: src/compute_server.py:36-37): zero
        # rows stay zero => their cosine with anything is 0.0
        np.divide(mat, norms, out=mat, where=norms > 0)
        return pd.DataFrame(
            {
                "bid": [int(pdf["_bid"].iloc[0])],
                "ids": [ids.tobytes()],
                "mat": [mat.tobytes()],
                "n": [mat.shape[0]],
                "dim": [mat.shape[1]],
            }
        )

    packed = src.groupBy("_bid").applyInPandas(pack, pack_schema)

    x = packed.select(
        F.col("bid").alias("bid_a"),
        F.col("ids").alias("ids_a"),
        F.col("mat").alias("mat_a"),
        F.col("n").alias("n_a"),
        F.col("dim").alias("dim_a"),
    )
    y = packed.select(
        F.col("bid").alias("bid_b"),
        F.col("ids").alias("ids_b"),
        F.col("mat").alias("mat_b"),
        F.col("n").alias("n_b"),
        F.col("dim").alias("dim_b"),
    )
    block_pairs = x.join(y, F.col("bid_a") <= F.col("bid_b"))

    out_schema = "vec_id_a long, vec_id_b long, score double"

    def gemm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ia = np.frombuffer(r.ids_a, dtype=np.int64)
                ib = np.frombuffer(r.ids_b, dtype=np.int64)
                ma = np.frombuffer(r.mat_a, dtype=np.float64).reshape(
                    r.n_a, r.dim_a
                )
                mb = np.frombuffer(r.mat_b, dtype=np.float64).reshape(
                    r.n_b, r.dim_b
                )
                scores = np.round(ma @ mb.T, 6)
                ii, jj = np.nonzero(scores >= threshold)
                if len(ii) == 0:
                    continue
                ida, idb = ia[ii], ib[jj]
                if r.bid_a == r.bid_b:
                    # same block: both (i,j) and (j,i) are in the matrix —
                    # keep exactly the ida < idb orientation (drops self)
                    keep = ida < idb
                    lo, hi, sc = ida[keep], idb[keep], scores[ii, jj][keep]
                else:
                    # cross block: ids are disjoint, each unordered pair
                    # appears once — just orient it
                    lo = np.minimum(ida, idb)
                    hi = np.maximum(ida, idb)
                    sc = scores[ii, jj]
                yield pd.DataFrame(
                    {"vec_id_a": lo, "vec_id_b": hi, "score": sc}
                )

    return block_pairs.mapInPandas(gemm, out_schema)


def embedding_neardup_pairs_lsh(
    emb: DataFrame,
    planes,
    threshold: float = 0.99,
    *,
    max_bucket: int = 256,
    min_depth: int = 4,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The sub-quadratic 100 TB path `embedding_neardup_pairs` points at:
    candidate pairs come from cap-bounded adaptive sign-LSH buckets
    (operators/ann.adaptive_lsh_keys — dense buckets split onto more
    plane bits, identical-signature piles shard into salt cells), and
    the in-bucket verifier is one float64 GEMM per group emitting ALL
    pairs with cosine >= threshold.

    Work is sum_b m_b^2 with m_b <= max_bucket — |V| * cap worst case —
    versus the exact operator's |V|^2. ANN semantics: pairs whose rows
    land in different buckets are missed; near-dup thresholds (~0.99)
    mean near-identical vectors, which agree on sign bits with high
    probability, so recall concentrates exactly where dedup needs it.

    Same output shape as `embedding_neardup_pairs`
    (vec_id_a < vec_id_b, score rounded to 6dp).
    """
    from distributed_vector_database_spark.operators.ann import (
        adaptive_lsh_keys,
    )

    keyed = adaptive_lsh_keys(
        emb.select(id_col, vector_col),
        planes,
        max_bucket,
        vector_col=vector_col,
        id_col=id_col,
        min_depth=min_depth,
    )
    out_schema = "vec_id_a long, vec_id_b long, score double"

    def verify(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "score": []})
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        # zero-norm guard (reference: src/compute_server.py:36-37)
        np.divide(mat, norms, out=mat, where=norms > 0)
        scores = np.round(mat @ mat.T, 6)
        ii, jj = np.nonzero(scores >= threshold)
        keep = ids[ii] < ids[jj]
        return pd.DataFrame(
            {
                "vec_id_a": ids[ii][keep],
                "vec_id_b": ids[jj][keep],
                "score": scores[ii, jj][keep],
            }
        )

    # one Python dispatch per partition instead of per bucket (round 14
    # — same grouped-runner treatment as ann._bucket_gemm_topk; the
    # verify kernel is untouched)
    from distributed_vector_database_spark.operators.ann import (
        _grouped_map_sorted,
    )

    return _grouped_map_sorted(
        keyed, "_key", verify, out_schema,
        ["vec_id_a", "vec_id_b", "score"],
    )


def keep_best_per_cluster(
    docs_quality: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Quality-aware dedup policy: from each near-dup cluster keep the
    HIGHEST-quality member (ties -> lowest id); documents in no cluster
    are their own singleton and always kept. The standard refinement over
    "keep lowest id": when a page exists in five scraped variants, keep
    the cleanest one, not the numerically first one.

    ``docs_quality``: (id, quality); ``clusters``: (id, cluster) as
    produced by ``graph.connected_components`` over near-dup pairs —
    singletons may be absent. Output: kept rows (id, cluster, quality).

    Scale notes: the cluster table is |clustered docs| rows (tiny next to
    the corpus — broadcastable in practice); the argmax window shuffles
    by cluster_id once, and cluster sizes are near-dup group sizes, so no
    skewed partitions.
    """
    from pyspark.sql import Window

    joined = docs_quality.join(clusters, id_col, "left").withColumn(
        cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col))
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, cluster_col, quality_col)
    )


def semantic_dedup(
    emb: DataFrame,
    centroids,
    threshold: float = 0.95,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023, public
    arXiv 2303.09540): cluster the embedding space, then inside each
    cluster greedily drop any row whose cosine to a LOWER-id kept-or-not
    row meets ``threshold`` — keep-first-by-id, the deterministic variant
    of "keep one per semantic duplicate group".

    Returns (id, cluster_id, kept). Clustering reuses the IVF routing rule
    (`ivf.assign_shards`, argmin Euclidean to injected/fitted centroids) so
    index build and semantic dedup share one partitioning of the space.

    Plan: narrow centroid assignment (no shuffle) -> ONE shuffle grouping
    rows by cluster -> per-cluster Arrow kernel (normalize f64, one GEMM,
    round 6dp, lower-triangle any()). At 100 TB the centroid count is
    chosen so a cluster's matrix fits an executor (SemDeDup's own regime:
    ~100k clusters over web-scale corpora); the O(m²) work is per-cluster,
    never corpus-wide.
    """
    from distributed_vector_database_spark.operators.ivf import assign_shards

    assigned = assign_shards(
        emb.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(vector_col).cast("array<double>").alias("_v"),
        ),
        centroids,
        vector_col="_v",
        out_col="_cid",
    )

    out_schema = f"{id_col} long, cluster_id long, kept boolean"

    def flag(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        mat = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        np.divide(mat, norms, out=mat, where=norms > 0)
        scores = np.round(mat @ mat.T, 6)
        # kept[i] = no earlier (lower-id) row within threshold
        tri = np.tril(scores >= threshold, k=-1)
        kept = ~tri.any(axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": int(pdf["_cid"].iloc[0]),
                "kept": kept,
            }
        )

    return assigned.groupBy("_cid").applyInPandas(flag, out_schema)


def repeated_spans(
    docs: DataFrame,
    span_tokens: int = 8,
    *,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token spans of ``span_tokens`` words appearing in at least
    ``min_docs`` DISTINCT documents: (span_hash, n_docs, n_occurrences,
    rep_doc_id = lowest containing doc).

    The Spark-shaped core of substring-level dedup (Lee et al., public
    arXiv 2107.06499, "Deduplicating Training Data Makes Language Models
    Better"): that work builds a corpus suffix array to find repeated
    byte spans; a relational engine gets the same cross-document repeated
    -span signal from fixed-width token windows — explode every span
    occurrence (NOT distinct: multiplicity matters for n_occurrences),
    hash to md5, and run ONE partial-aggregated groupBy. No joins, no
    suffix sort; shuffle width is one hash + counts per span occurrence.
    """
    ex = docs.select(
        F.col(id_col), F.explode(F.array(tokens(text_col))).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(
            word_shingles(F.col("_toks"), n=span_tokens, distinct=False)
        ).alias("_g"),
    )
    return (
        ex.select(F.col(id_col), F.md5("_g").alias("span_hash"))
        .groupBy("span_hash")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min(id_col).alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def doc_repeated_span_stats(
    docs: DataFrame,
    span_tokens: int = 8,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_spans, n_shared, shared_frac): how much of each doc is
    covered by spans that ALSO occur in another document — the per-doc
    decision signal of substring dedup (drop/trim docs whose text is
    mostly recycled boilerplate).

    ``n_spans`` counts the doc's span positions (len - span + 1);
    ``n_shared`` those positions whose span occurs in >= 2 distinct docs.
    Docs shorter than ``span_tokens`` have no spans and are absent.

    Plan: the occurrence explode feeds BOTH the span-frequency aggregate
    and a join back on span_hash — two shuffles on the same key; at scale
    the frequency side is heavily reduced by partial aggregation before
    the join.
    """
    ex = docs.select(
        F.col(id_col), F.explode(F.array(tokens(text_col))).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(
            word_shingles(F.col("_toks"), n=span_tokens, distinct=False)
        ).alias("_g"),
    ).select(F.col(id_col), F.md5("_g").alias("span_hash"))
    freq = ex.groupBy("span_hash").agg(
        F.count_distinct(F.col(id_col)).alias("_nd")
    )
    return (
        ex.join(freq, "span_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).alias(
                "n_shared"
            ),
            round_score(
                F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("shared_frac"),
        )
    )


def paragraph_blocks(
    text_col, block_tokens: int = 16
):
    """Non-overlapping ``block_tokens``-token blocks of a document — the
    relational stand-in for paragraphs when the corpus carries no
    structural delimiters (the trailing partial block is kept). Returns an
    ``array<string>`` column; empty-token docs get an empty array.

    DuckDB mirror: ``list_transform(range(0, (len(t)+B-1)//B),
    i -> array_to_string(list_slice(t, i*B+1, i*B+B), ' '))``.
    """
    toks = tokens(text_col)
    b = block_tokens
    nblocks = F.ceil(F.size(toks) / F.lit(b)).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nblocks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i * b + 1).cast("int"), b)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def paragraph_dedup_stats(
    docs: DataFrame,
    block_tokens: int = 16,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_blocks, n_recycled, recycled_frac): per-doc fraction of
    paragraph blocks whose content ALSO appears (as a block) in at least
    one other document — the paragraph-granularity complement to the
    overlapping 8-token :func:`doc_repeated_span_stats` signal.
    Paragraph-level dedup drops/trims documents assembled from recycled
    boilerplate even when whole-document hashes differ.

    Plan shape: explode blocks → md5 → frequency aggregate (partial-agg
    combinable) → join back on block hash → per-doc aggregate. Two
    shuffles on the block hash; block hashes are uniform md5 so no hot
    keys at 100 TB.
    """
    ex = docs.select(
        F.col(id_col),
        F.explode(paragraph_blocks(text_col, block_tokens)).alias("_b"),
    ).select(F.col(id_col), F.md5("_b").alias("block_hash"))
    freq = ex.groupBy("block_hash").agg(
        F.count_distinct(F.col(id_col)).alias("_nd")
    )
    rec = F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0))
    return (
        ex.join(freq, "block_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_blocks"),
            rec.alias("n_recycled"),
            round_score(
                rec.cast("double") / F.count("*"), 6
            ).alias("recycled_frac"),
        )
    )


def duplicate_paragraphs(
    docs: DataFrame,
    block_tokens: int = 16,
    *,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph blocks shared by ≥ ``min_docs`` distinct documents:
    (block_hash, n_docs, n_occurrences, rep_doc_id). The corpus-level
    boilerplate inventory (license headers, navigation chrome, templated
    intros) — one partial-aggregated groupBy on uniform md5 keys."""
    ex = docs.select(
        F.col(id_col),
        F.explode(paragraph_blocks(text_col, block_tokens)).alias("_b"),
    ).select(F.col(id_col), F.md5("_b").alias("block_hash"))
    return (
        ex.groupBy("block_hash")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min(id_col).alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    *,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance with band
    blocking (Manku, Jain & Sarma, "Detecting Near-Duplicates for Web
    Crawling", WWW 2007): split the 64-bit fingerprint into ``bands``
    chunks — any pair within ``max_hamming <= bands - 1`` bit flips must
    agree on at least one whole chunk (pigeonhole), so candidates come
    from an EQUI-join on (band index, band value) instead of all pairs.
    Verification is the exact nibble-wise popcount of the XOR.

    Returns (doc_id_a, doc_id_b, hamming), hamming <= max_hamming.

    Scale: fingerprinting is one aggregation pass; the band join's keys
    are 16-bit chunks of an avalanche hash — uniform, bounded fan-out;
    verify is O(1) per candidate. The whole-corpus pair discovery the
    quadratic embedding join can't do at 100 TB.
    """
    _validate_band_args(max_hamming, bands)
    # the fingerprint frame is tiny (one 16-hex row per doc) but COSTLY
    # to derive (per-doc weighted-bit sums over every shingle), and the
    # self-join below would evaluate that derivation once per side (no
    # exchange reuse across the join) — materialize it first. Measured
    # 5.6 s -> 4.6 s at sf0.1 (the band join + candidate distinct owns
    # the rest).
    fp = simhash_fingerprints(
        docs, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=True)
    return hamming_band_pairs(
        fp,
        fp_col="simhash",
        max_hamming=max_hamming,
        bands=bands,
        id_col=id_col,
    )


def _validate_band_args(max_hamming: int, bands: int) -> None:
    if max_hamming > bands - 1:
        raise ValueError(
            f"band blocking is only exact for max_hamming <= bands - 1 "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    if 16 % bands:
        raise ValueError(f"bands must divide 16, got {bands}")


def hamming_band_pairs(
    fp: DataFrame,
    *,
    fp_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    against: DataFrame | None = None,
) -> DataFrame:
    """Pairs of rows whose 64-bit fingerprints (16-hex-char strings in
    ``fp_col``) are within ``max_hamming`` bit flips, by pigeonhole band
    blocking (Manku et al., WWW 2007): the fingerprint splits into
    ``bands`` chunks; any pair within ``bands - 1`` flips must agree on a
    whole chunk, so candidates come from an EQUI-join on (band index,
    band value) — never all pairs. Shared by the SimHash (token-level)
    and dHash (binary-payload-level) near-dup screens.

    ``against=None`` (default): self-join — all pairs within ``fp``.
    ``against=index``: asymmetric — pairs between ``fp`` (e.g. a stream
    micro-batch) and ``index`` (the maintained fingerprint index), ids
    normalized to (min, max); pairs internal to ``against`` are NOT
    emitted (the incremental-screen contract: each pair surfaces in the
    batch where its later member arrives).

    NULL fingerprints (e.g. `dhash_fingerprints`' below-min-length
    payloads, ADVICE r9) are dropped before banding — a NULL can never
    be a near-dup witness, and the equi-join would silently drop it
    anyway; filtering first keeps the explode fan-out honest.

    Returns (``{id_col}_a``, ``{id_col}_b``, hamming), a < b.
    """
    _validate_band_args(max_hamming, bands)
    fp = fp.filter(F.col(fp_col).isNotNull())
    if against is not None:
        against = against.filter(F.col(fp_col).isNotNull())
    out_a, out_b = f"{id_col}_a", f"{id_col}_b"
    chunk = 16 // bands

    def _banded(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.col(fp_col),
            F.explode(
                F.array(
                    *[
                        F.concat(
                            F.lit(f"{b}:"),
                            F.substring(fp_col, b * chunk + 1, chunk),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band"),
        )

    a = _banded(fp).alias("a")
    if against is None:
        b = _banded(fp).alias("b")
        cand = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias(out_a),
            F.col(f"b.{id_col}").alias(out_b),
            F.col(f"a.{fp_col}").alias("_sa"),
            F.col(f"b.{fp_col}").alias("_sb"),
        )
    else:
        b = _banded(against).alias("b")
        # hamming is symmetric, so (min, max) normalization + the final
        # distinct absorb both join orders of a batch-internal pair.
        cand = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        ).select(
            F.least(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias(out_a),
            F.greatest(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias(out_b),
            F.col(f"a.{fp_col}").alias("_sa"),
            F.col(f"b.{fp_col}").alias("_sb"),
        )

    # XOR-popcount over two 8-hex halves (each fits a signed long), not
    # 16 nibble-wise conv(substring) pairs: 4 string conversions per
    # candidate instead of 32. Measured on the sf0.1 band join (191k
    # candidates): 2.67 s -> 0.86 s for the verify+dedup stage.
    def _half(col, start):
        return F.conv(F.substring(col, start, 8), 16, 10).cast("long")

    ham = F.bit_count(
        _half("_sa", 1).bitwiseXOR(_half("_sb", 1))
    ) + F.bit_count(_half("_sa", 9).bitwiseXOR(_half("_sb", 9)))
    # verify BEFORE the dedup shuffle: with the cheap hamming, evaluating
    # it on the (up to `bands`x) duplicated candidates is negligible
    # CPU, while distinct()-first would shuffle EVERY candidate with
    # both 16-char fingerprints attached. Post-filter, only actual
    # near-dup pairs — (id, id, tiny long), a vanishing fraction at
    # production thresholds — reach the distinct exchange. (0.86 s ->
    # 0.77 s at sf0.1; the win grows with candidate volume.)
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select(out_a, out_b, "hamming")
        .distinct()
    )


def shared_span_pairs(
    docs: DataFrame,
    *,
    k: int = 5,
    window: int = 4,
    max_df: int = 10,
    min_shared: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level duplication candidates via winnowing fingerprints
    (`text_analysis.winnow_fingerprints`): document pairs sharing >=
    ``min_shared`` selected fingerprints, i.e. likely sharing verbatim
    token runs of length >= k + window - 1 — the quote-reuse / template /
    partial-copy signal that bag-of-words Jaccard dilutes away on long
    documents.

    Scale shape: fingerprints whose document frequency exceeds ``max_df``
    are dropped BEFORE the self-join (ubiquitous boilerplate would
    otherwise contribute df^2/2 pairs each), so per-fingerprint pair work
    is bounded by max_df^2 and the join is a plain equi-join on ``fp`` —
    the same bounded-block discipline as the MinHash/SimHash candidate
    generators above. Returns (doc_id_a, doc_id_b, n_shared), integers
    only — bit-identical cross-engine.
    """
    from distributed_vector_database_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    # three consumers below (df filter + both self-join sides) would each
    # re-run the fingerprint kernel — checkpoint the small (doc_id, fp)
    # frame once (same pattern as the simhash/graph iteratives)
    fps = winnow_fingerprints(
        docs, k=k, window=window, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=True)
    # measured-and-rejected (round 14): eagerly checkpointing `keep`
    # (the tiny surviving-fp dictionary) read winnow_shared_span_pairs
    # 1.17-1.41 s -> 1.75-1.83 s in interleaved A/B — the added blocking
    # job costs more than the re-evaluated aggregate, whose duplicate
    # branches overlap inside the one main job on idle cores
    keep = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    kept = fps.join(keep, "fp")
    a = kept.select(F.col("fp"), F.col(id_col).alias("doc_id_a"))
    b = kept.select(F.col("fp"), F.col(id_col).alias("doc_id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_owner_dup_flags(
    docs: DataFrame,
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-pass SUBSTRING-dup decision without pair mining: every
    winnowing fingerprint is owned by the LOWEST doc id that contains
    it; a doc is flagged when at least ``min_shared`` of its fingerprints
    are owned by smaller ids — the keep-lowest-id form of
    `shared_span_pairs`'s contract, made ORDER-FREE (ownership is a min
    over the whole corpus, not an arrival race), so the same decision is
    computable incrementally by a stream
    (`streaming.docs.stream_winnow_dedup`) and by a SQL oracle.

    ``(id, n_fps, n_owned_elsewhere, is_span_dup)``. Scale: ownership is
    a partial-aggregating ``groupBy(fp).agg(min(id))`` joined back on the
    fingerprint key — NOT a ``min().over(partitionBy(fp))`` window, which
    would force every row of one fingerprint into a single task and turn
    a boilerplate fingerprint shared by millions of docs into a straggler
    (the map-side combine collapses such a key to one row per input
    partition before the shuffle; its streaming twin
    `streaming.docs.stream_winnow_dedup` uses the identical two-step).
    No pair fan-out, no df cap needed (a ubiquitous fingerprint costs one
    combined aggregate row, not df^2/2 pairs). Docs with zero
    fingerprints (< k tokens) are absent. The owner form is one-sided vs
    the pair form: ``min_shared`` fingerprints owned by DIFFERENT smaller
    docs still flag, trading the per-pair guarantee for the flat plan —
    the pair/verify/excise chain stays the exact path.
    """
    from distributed_vector_database_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    # two consumers (aggregate input + join probe side) and no exchange
    # reuse across the self-join — cache() (NOT localCheckpoint) so the
    # fingerprint kernel runs once when memory allows: the (doc_id, fp)
    # frame is corpus-scale (~2/(window+1) of all gram hashes), so a
    # checkpoint would pin it to executor storage unconditionally and make
    # the API eager; a cache is lazy and EVICTABLE — under storage
    # pressure at 100-TB scale Spark drops blocks and recomputes the
    # kernel, the right degradation. Eager checkpoints stay reserved for
    # genuinely tiny frames (e.g. to_drop in queries.py).
    fps = winnow_fingerprints(
        docs, k=k, window=window, text_col=text_col, id_col=id_col
    ).cache()
    owners = fps.groupBy("fp").agg(F.min(id_col).alias("_owner"))
    lost = F.sum(
        F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0)
    )
    return (
        fps.join(owners, "fp")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_fps"),
            lost.cast("long").alias("n_owned_elsewhere"),
            (lost >= min_shared).alias("is_span_dup"),
        )
    )


def _run_islands(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    k: int,
    text_col: str,
    id_col: str,
    gram_pos_cap: int | None,
) -> DataFrame:
    """Shared machinery of `longest_shared_runs` / `shared_runs`: the
    per-(pair, diagonal) match islands frame —
    (doc_id_a, doc_id_b, _diag, _len, _start_a, _overflowed).

    k-gram hashes with positions for only the docs the pair list touches
    (semi-join prune), equi-joined per pair on gram equality; a shared run
    of length L contributes L-k+1 matches on one DIAGONAL (pos_a - pos_b
    constant), so each run is a consecutive-pos_a island per (pair,
    diagonal) — the gaps-and-islands trick, all equi-shuffles keyed by
    the pair.

    ``gram_pos_cap`` bounds the join fan-out BY CONSTRUCTION: a gram
    occurring p_a x p_b times across a pair contributes p_a*p_b match
    rows — quadratic in the repeated gram's multiplicity, unbounded on
    pathologically repetitive text ("x x x x ..."). Per (doc, gram) only
    the first ``gram_pos_cap`` positions survive (deterministic: lowest
    positions), so per-pair work is <= (#distinct shared grams) * cap^2
    however repetitive the text. Rows whose gram was truncated on either
    side carry ``_overflowed = true``: island lengths on those pairs are
    LOWER bounds; everywhere else results are exact (the sf corpora's max
    within-doc gram multiplicity is 1 — measured, so the default cap
    changes nothing on real text).
    """
    from pyspark.sql import Window

    from distributed_vector_database_spark.functions.text import (
        word_shingles_arrow,
    )

    # The caller's candidate pipeline is referenced THREE times below
    # (both `wanted` union branches + the `matches` join) — un-pinned,
    # Spark re-evaluates the whole upstream candidate join per reference
    # (round 14, guide §2.4; verified in
    # plans/r14/shared_span_longest_run_before.txt: the pair candidate
    # join appears 3x, 0 ReusedExchange). The TINY pair frame is eagerly
    # checkpointed once. The self-pair/duplicate dropping (see `matches`
    # note below) moves up here so the checkpointed frame is already
    # canonical — a doc appearing ONLY in self-pairs drops out of
    # `wanted` too, which cannot change results (its grams only ever
    # matched inside its own dropped pair).
    pairs = (
        pairs.select("doc_id_a", "doc_id_b")
        .filter(F.col("doc_id_a") != F.col("doc_id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    wanted = (
        pairs.select(F.col("doc_id_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_id_b").alias(id_col)))
        .distinct()
    )
    grams = (
        docs.join(wanted, id_col)
        .select(
            F.col(id_col),
            F.posexplode(
                word_shingles_arrow(F.col(text_col), k, distinct=False)
            ).alias("pos", "_g"),
        )
        .select(id_col, "pos", F.md5("_g").alias("fp"))
    )
    if gram_pos_cap is not None:
        if gram_pos_cap < 1:
            raise ValueError(f"gram_pos_cap must be >= 1, got {gram_pos_cap}")
        wcap = Window.partitionBy(id_col, "fp")
        grams = (
            grams.withColumn(
                "_rn", F.row_number().over(wcap.orderBy(F.asc("pos")))
            )
            .withColumn(
                "_tr", (F.count("*").over(wcap) > gram_pos_cap)
            )
            .filter(F.col("_rn") <= gram_pos_cap)
            .drop("_rn")
        )
    else:
        grams = grams.withColumn("_tr", F.lit(False))
    # grams stays LAZY on purpose (round 14, measured): its two
    # evaluations (a/b sides) are independent subtrees that overlap
    # inside the one main job; an eager checkpoint serialized them into
    # an extra blocking job and read WORSE at sf0.1 (shared_span_
    # longest_run 2.3-3.2 -> 2.8-3.3 interleaved with both frames
    # pinned). The pair checkpoint above stays: it collapses THREE
    # evaluations of the whole upstream candidate pipeline.
    a = grams.select(
        F.col(id_col).alias("doc_id_a"),
        F.col("pos").alias("_pa"),
        F.col("_tr").alias("_tra"),
        "fp",
    )
    b = grams.select(
        F.col(id_col).alias("doc_id_b"),
        F.col("pos").alias("_pb"),
        F.col("_tr").alias("_trb"),
        "fp",
    )
    # duplicate pair rows would double every match and split the
    # row_number islands (corrupting run lengths); self-pairs would just
    # report the doc's own length — both were dropped at the checkpoint
    # above
    matches = (
        pairs.join(a, "doc_id_a")
        .join(b, ["doc_id_b", "fp"])
        .select(
            "doc_id_a",
            "doc_id_b",
            "_pa",
            (F.col("_pa") - F.col("_pb")).alias("_diag"),
            (F.col("_tra") | F.col("_trb")).alias("_ovf"),
        )
    )
    w = Window.partitionBy("doc_id_a", "doc_id_b", "_diag").orderBy("_pa")
    islands = matches.withColumn(
        "_grp", F.col("_pa") - F.row_number().over(w)
    )
    return islands.groupBy("doc_id_a", "doc_id_b", "_diag", "_grp").agg(
        F.count("*").alias("_len"),
        F.min("_pa").alias("_start_a"),
        F.max("_ovf").alias("_overflowed"),
    )


def longest_shared_runs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_positions: bool = False,
    gram_pos_cap: int | None = 64,
    with_overflow_flag: bool = False,
) -> DataFrame:
    """Exact verification of substring-duplication candidates: for each
    (doc_id_a, doc_id_b) pair, the length in tokens of the LONGEST verbatim
    token run the two documents share — (doc_id_a, doc_id_b,
    longest_run_tokens).

    ``with_positions=True`` adds (start_a, start_b): the 0-based token
    offsets where the longest run begins in each document — what an
    excision pass needs to actually cut the duplicated span (argmax is
    deterministic: longest island, then earliest start_a, then diagonal).

    This is the locate step of exact substring dedup (Lee et al., ACL
    2022, "Deduplicating Training Data Makes Language Models Better"):
    candidates come cheap from `shared_span_pairs` winnowing, and this op
    tells you exactly how much text to excise.

    Per-pair cost is bounded BY CONSTRUCTION via ``gram_pos_cap`` (see
    `_run_islands`): pathologically repetitive pairs — where a single
    repeated gram would otherwise contribute multiplicity^2 match rows —
    are truncated to the cap's quadratic and their reported run lengths
    become lower bounds; on text whose within-doc gram multiplicity stays
    under the cap (all real corpora measured here: max 1) results are
    exact. ``with_overflow_flag=True`` adds a boolean ``overflowed``
    column marking affected pairs; ``gram_pos_cap=None`` restores the
    uncapped exact behavior.
    """
    from pyspark.sql import Window

    runs = _run_islands(
        docs,
        pairs,
        k=k,
        text_col=text_col,
        id_col=id_col,
        gram_pos_cap=gram_pos_cap,
    )
    flag = (
        [F.max("_overflowed").alias("overflowed")]
        if with_overflow_flag
        else []
    )
    if not with_positions:
        return runs.groupBy("doc_id_a", "doc_id_b").agg(
            (F.max("_len") + F.lit(k - 1))
            .cast("long")
            .alias("longest_run_tokens"),
            *flag,
        )
    # excision-ready variant: also report WHERE the longest run starts in
    # each doc (0-based token offsets). Deterministic argmax: longest
    # island first, then earliest start in a, then earliest in b.
    pick = Window.partitionBy("doc_id_a", "doc_id_b").orderBy(
        F.desc("_len"), F.asc("_start_a"), F.asc("_diag")
    )
    pair_flag = (
        [
            F.max("_overflowed")
            .over(Window.partitionBy("doc_id_a", "doc_id_b"))
            .alias("overflowed")
        ]
        if with_overflow_flag
        else []
    )
    return (
        runs.select("*", *pair_flag)
        .withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id_a",
            "doc_id_b",
            (F.col("_len") + F.lit(k - 1)).cast("long").alias(
                "longest_run_tokens"
            ),
            F.col("_start_a").cast("long").alias("start_a"),
            (F.col("_start_a") - F.col("_diag")).cast("long").alias(
                "start_b"
            ),
            *(["overflowed"] if with_overflow_flag else []),
        )
    )


def shared_runs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    k: int = 5,
    min_run_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_pos_cap: int | None = 64,
    with_overflow_flag: bool = False,
) -> DataFrame:
    """ALL verbatim token runs shared by each candidate pair — not just the
    longest — with their positions: (doc_id_a, doc_id_b, run_tokens,
    start_a, start_b). The input to a COMPLETE excision pass
    (`excise_spans`): cutting only the longest run per pair leaves any
    second long run behind; cutting every reported run >= the winnowing
    detection floor removes all duplication the candidate generator can
    see.

    ``min_run_tokens`` defaults to k + 3 — the `shared_span_pairs`
    winnowing guarantee floor (k + window - 1 with the default window=4):
    runs at least that long are exactly the ones guaranteed to keep
    producing candidate pairs, so excising them drives a re-run of the
    candidate generator on the cleaned corpus toward empty. Same bounded
    join discipline as `longest_shared_runs` (``gram_pos_cap``).

    ``with_overflow_flag=True`` propagates the cap's truncation marker:
    an ``overflowed`` boolean column, AND overflowed runs are kept even
    below ``min_run_tokens`` — a truncated island's length is a LOWER
    bound, so the cap could otherwise shrink a real >= floor run under
    the floor and silently drop it from the excision set (its longest-run
    sibling already exposed the flag; a complete-excision caller needs
    it here too). Default off: exact on every corpus whose within-doc
    gram multiplicity stays under the cap (all sf corpora: max 1).
    """
    if min_run_tokens is None:
        min_run_tokens = k + 3
    runs = _run_islands(
        docs,
        pairs,
        k=k,
        text_col=text_col,
        id_col=id_col,
        gram_pos_cap=gram_pos_cap,
    )
    out = runs.select(
        "doc_id_a",
        "doc_id_b",
        (F.col("_len") + F.lit(k - 1)).cast("long").alias("run_tokens"),
        F.col("_start_a").cast("long").alias("start_a"),
        (F.col("_start_a") - F.col("_diag")).cast("long").alias("start_b"),
        F.col("_overflowed").alias("overflowed"),
    )
    floor = F.col("run_tokens") >= F.lit(int(min_run_tokens))
    if with_overflow_flag:
        return out.filter(floor | F.col("overflowed"))
    return out.filter(floor).drop("overflowed")


def excise_spans(
    docs: DataFrame,
    runs: DataFrame,
    *,
    side: str = "b",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus rewrite from located duplicate spans (the final step of the
    Lee et al. ACL'22 substring-dedup pipeline): cut every reported span
    out of the ``side`` document of each pair and re-emit the corpus with
    ``text_col`` rewritten (all other columns pass through; docs with no
    spans are untouched).

    ``runs`` is `shared_runs` / `longest_shared_runs(with_positions=True)`
    output: (doc_id_a, doc_id_b, run_tokens|longest_run_tokens, start_a,
    start_b). ``side="b"`` cuts from doc_id_b — one copy of the duplicated
    text (in the LOWEST-id document, since candidate pairs are emitted
    with doc_id_a < doc_id_b) survives, mirroring keep-first dedup.

    Plan shape: spans aggregate to one short interval array per cut doc
    (collect_list over the span rows — bounded by the pairs touching that
    doc), broadcast-scale left join onto the corpus, then one projection:
    tokens are kept when no interval covers their position (a
    single-level ``filter(.., (tok, i) -> !exists(intervals, ..))`` HOF
    over a short interval array — overlapping intervals need no merge,
    coverage is coverage). No data-sized shuffle: the corpus never moves;
    only the tiny span frame aggregates.
    """
    if side not in ("a", "b"):
        raise ValueError(f"side must be 'a' or 'b', got {side!r}")
    len_col = (
        "run_tokens" if "run_tokens" in runs.columns else "longest_run_tokens"
    )
    start = F.col(f"start_{side}")
    spans = (
        runs.select(
            F.col(f"doc_id_{side}").alias(id_col),
            F.struct(
                start.cast("long").alias("s"),
                (start + F.col(len_col) - 1).cast("long").alias("e"),
            ).alias("_iv"),
        )
        .groupBy(id_col)
        .agg(F.collect_list("_iv").alias("_ivs"))
    )
    from distributed_vector_database_spark.functions.text import tokens

    # positions in `runs` index the NON-EMPTY whitespace token sequence
    # (the same tokenization the gram/winnowing kernels use) — cut
    # against that exact sequence, not a raw split
    toks = tokens(text_col)
    # i is the 0-based token position; an interval [s, e] covers it when
    # s <= i <= e. exists() over the short interval array handles
    # overlapping spans with no merge step.
    kept = F.filter(
        toks,
        lambda tok, i: ~F.exists(
            F.col("_ivs"),
            lambda iv: (i >= iv["s"]) & (i <= iv["e"]),
        ),
    )
    rewritten = F.when(
        F.col("_ivs").isNull(), F.col(text_col)
    ).otherwise(F.array_join(kept, " "))
    out_cols = [
        rewritten.alias(c) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return docs.join(spans, id_col, "left").select(*out_cols)


def cdc_chunk_dup_flags(
    docs: DataFrame,
    *,
    mask_bits: int = 4,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-pass CHUNK-level dup decision without pair mining — the
    content-defined-chunking member of the owner-screen family
    (`minhash_bucket_dup_flags` for whole docs, `winnow_owner_dup_flags`
    for substrings): every CDC chunk hash (`chunking.cdc_chunk_documents`)
    is owned by the LOWEST doc id containing it; a doc is flagged when at
    least ``min_shared`` of its chunks are owned by smaller ids. Because
    CDC boundaries survive edits, a revised copy of an earlier doc still
    flags on its unchanged chunks — the property fixed-window chunk
    hashing loses.

    ``(id, n_chunks, n_owned_elsewhere, is_chunk_dup)``. Order-free
    (ownership is a corpus min), so the same decision is computable
    incrementally (`streaming.docs.stream_cdc_chunk_dedup`) and by a SQL
    oracle. Scale: ownership is partial-agg ``groupBy(hash).agg(min)``
    + join-back on the uniform md5 key — no window (a ubiquitous chunk
    collapses map-side; the round-7 de-skew rule), no pair fan-out. Docs
    with zero tokens are absent (no chunks).
    """
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    # two consumers (owner agg + join probe) — cache(), not checkpoint:
    # corpus-scale frame, evictable (same policy as winnow_owner_dup_flags)
    ch = cdc_chunk_documents(
        docs, mask_bits=mask_bits, text_col=text_col, id_col=id_col
    ).select(F.col(id_col), "chunk_hash").cache()
    owners = ch.groupBy("chunk_hash").agg(F.min(id_col).alias("_owner"))
    lost = F.sum(
        F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0)
    )
    return (
        ch.join(owners, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            lost.cast("long").alias("n_owned_elsewhere"),
            (lost >= min_shared).alias("is_chunk_dup"),
        )
    )


def cdc_shared_chunk_pairs(
    docs: DataFrame,
    *,
    mask_bits: int = 4,
    max_df: int = 10,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document PAIRS sharing >= ``min_shared`` content-defined chunks —
    the pair-evidence complement of `cdc_chunk_dup_flags` (which only
    says "someone smaller owns my chunks", this says WHO): partial-copy
    and shared-boilerplate detection at storage granularity, edit-stable
    because CDC chunk identities survive revisions.

    Returns (doc_id_a, doc_id_b, n_shared, containment) where
    ``n_shared`` counts shared DISTINCT chunk hashes and ``containment``
    = n_shared / min(|chunks_a|, |chunks_b|) (6dp, exact-integer
    rounding) — 1.0 means the smaller doc's chunk set is entirely inside
    the larger's (the verbatim-subset signal).

    Scale shape: chunk hashes with document frequency > ``max_df`` are
    dropped BEFORE the self-join (a boilerplate chunk would contribute
    df^2/2 pairs), so per-chunk pair work is bounded by max_df^2 — the
    same bounded-block discipline as `shared_span_pairs` and the
    MinHash/SimHash candidate generators. Per-doc chunk sets are
    DISTINCT (within-doc repeats collapse), so containment is a set
    measure. The frequent chunks the cap drops are exactly what the
    owner SCREEN already flags — the two operators split the work:
    screen for ubiquitous content, pairs for targeted provenance.
    """
    from distributed_vector_database_spark.functions.vector import (
        ratio_6dp_exact,
    )
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    # three consumers (df filter + both join sides) + the per-doc size
    # frame — cache() the distinct (doc, hash) set (corpus-scale,
    # evictable; same policy as the other screens)
    ch = (
        cdc_chunk_documents(
            docs, mask_bits=mask_bits, text_col=text_col, id_col=id_col
        )
        .select(F.col(id_col), "chunk_hash")
        .distinct()
        .cache()
    )
    sizes = ch.groupBy(id_col).agg(F.count("*").alias("_nc"))
    keep = (
        ch.groupBy("chunk_hash")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("chunk_hash")
    )
    kept = ch.join(keep, "chunk_hash")
    a = kept.select(F.col("chunk_hash"), F.col(id_col).alias("doc_id_a"))
    b = kept.select(F.col("chunk_hash"), F.col(id_col).alias("doc_id_b"))
    pairs = (
        a.join(b, "chunk_hash")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(
        F.col(id_col).alias("doc_id_a"), F.col("_nc").alias("_na")
    )
    sb = sizes.select(
        F.col(id_col).alias("doc_id_b"), F.col("_nc").alias("_nb")
    )
    return (
        pairs.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn("_mn", F.least("_na", "_nb"))
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared",
            ratio_6dp_exact("n_shared", "_mn").alias("containment"),
        )
    )
