"""DSIR-style importance weighting for data selection.

Data Selection via Importance Resampling (Xie et al., public arXiv
2302.03169): score every raw-corpus document by how much more likely its
hashed n-gram bag is under a TARGET distribution (the domain you want more
of — curated text, a benchmark-adjacent corpus) than under the RAW source
distribution, then resample by that weight. The standard tractable model is
a unigram bag over hashed n-gram features:

    log w(x) = sum over feature occurrences f in x of
               [ ln p_target(f) - ln p_source(f) ]

with Laplace-smoothed feature probabilities p(f) = (count_f + 1) /
(total + dim). High log-w docs look like the target; selection keeps the
top slice (or Gumbel-samples proportionally — the deterministic top-k
variant is what ships here).

Engine mapping (one pass, no corpus self-join):
  - features: word n-grams WITH multiplicity, hashed to ``dim`` buckets by
    the same md5 bucket as the hashing embedder (portable to the oracle);
  - the per-bucket log-ratio table is ``dim`` rows — built from two
    partial-aggregated counts, quantized to integer MICRO-NATS
    (round(ln_ratio * 1e6)) so per-doc sums are exact integers: the sum is
    order-independent across partial-aggregation trees and engines, the
    one place a float sum would be nondeterministic;
  - per-doc score: explode features -> broadcast-join the ratio table ->
    integer sum per doc. One shuffle (the per-doc aggregation).

The only cross-engine float risk is ln() itself (libm vs JVM may differ in
the last ulp before micro-quantization) — in practice identical on every
bucket tested; sqrt-style IEEE correct rounding is not guaranteed for ln.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.embed import token_bucket
from distributed_vector_database_spark.functions.text import (
    tokens,
    word_shingles,
)

__all__ = [
    "ngram_bucket_counts",
    "importance_log_weights",
    "dsir_select",
    "dsir_gumbel_sample",
    "target_cross_entropy",
]


def _features(
    docs: DataFrame, *, ngram: int, dim: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, bucket) — one row PER FEATURE OCCURRENCE (bag, not set)."""
    toked = docs.select(
        F.col(id_col), F.explode(F.array(tokens(text_col))).alias("_toks")
    )
    grams = toked.select(
        F.col(id_col),
        F.explode(
            word_shingles(F.col("_toks"), n=ngram, distinct=False)
        ).alias("_g"),
    )
    return grams.select(
        F.col(id_col), token_bucket(F.col("_g"), dim).alias("bucket")
    )


def ngram_bucket_counts(
    docs: DataFrame,
    *,
    ngram: int = 2,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, cnt) over the whole corpus — the unigram feature model."""
    return (
        _features(docs, ngram=ngram, dim=dim, text_col=text_col, id_col=id_col)
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def importance_log_weights(
    source: DataFrame,
    target: DataFrame,
    *,
    ngram: int = 2,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, log_w) for every source doc with >= 1 feature.

    ``log_w`` is the Laplace-smoothed target/source log-likelihood ratio of
    the doc's hashed feature bag, accumulated in exact micro-nats and
    rounded to 6dp. Docs shorter than ``ngram`` tokens have no features and
    are absent (callers decide their fate; DSIR has no evidence either way).
    """
    spark = source.sparkSession
    # each bucket-count frame feeds its total AND the ratio join; they
    # aggregate to <= dim rows, so cache both (one corpus pass each)
    tc = ngram_bucket_counts(
        target, ngram=ngram, dim=dim, text_col=text_col, id_col=id_col
    ).cache()
    sc = ngram_bucket_counts(
        source, ngram=ngram, dim=dim, text_col=text_col, id_col=id_col
    ).cache()
    # the two corpus totals enter as a broadcast 1-row frame instead of
    # two driver-collected literals — the old .head() calls ran the two
    # bucket-count aggregations as blocking setup jobs AND the plan then
    # re-derived both subtrees for the ratio join (round 13, guide §5);
    # the exact integer totals are unchanged.
    totals = tc.agg(
        (F.coalesce(F.sum("cnt"), F.lit(0)) + dim)
        .cast("double")
        .alias("_td")
    ).crossJoin(
        sc.agg(
            (F.coalesce(F.sum("cnt"), F.lit(0)) + dim)
            .cast("double")
            .alias("_sd")
        )
    )

    universe = spark.range(dim).select(F.col("id").cast("long").alias("bucket"))
    lr = (
        universe.join(tc, "bucket", "left")
        .withColumnRenamed("cnt", "ct")
        .join(sc, "bucket", "left")
        .withColumnRenamed("cnt", "cs")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / F.col("_td")
                    )
                    - F.log(
                        (F.coalesce(F.col("cs"), F.lit(0)) + 1).cast("double")
                        / F.col("_sd")
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    feats = _features(
        source, ngram=ngram, dim=dim, text_col=text_col, id_col=id_col
    )
    return (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("lr_micro") / F.lit(1e6), 6).alias("log_w"),
        )
    )


def dsir_select(
    source: DataFrame,
    target: DataFrame,
    k: int,
    *,
    ngram: int = 2,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The deterministic top-k selection: the k source docs most
    target-like by ``log_w`` (ties -> lowest id). TakeOrdered plan — no
    global sort materialization."""
    w = importance_log_weights(
        source, target, ngram=ngram, dim=dim, text_col=text_col, id_col=id_col
    )
    return w.orderBy(F.desc("log_w"), F.asc(id_col)).limit(k)


def dsir_gumbel_sample(
    source: DataFrame,
    target: DataFrame,
    k: int,
    *,
    seed: int = 0,
    temperature: float = 1.0,
    ngram: int = 2,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR's actual selection step: sample k docs WITHOUT replacement with
    probability ∝ exp(log_w / temperature), via the Gumbel-top-k trick
    (public: Kool et al. 2019) — add independent Gumbel noise to each
    scaled log-weight and take the k largest keys.

    The noise is DERANDOMIZED the engine's standard way: u in (0, 1) from
    md5(seed:id) (12 hex chars -> uniform to ~2^-48), g = -ln(-ln(u)).
    Same seed -> same sample on any engine, any partitioning, any run —
    reproducible data selection, which a 100 TB pipeline needs far more
    than true randomness. Plan: the log-weight aggregation plus one
    TakeOrdered(k) — no extra shuffle.
    """
    w = importance_log_weights(
        source, target, ngram=ngram, dim=dim, text_col=text_col,
        id_col=id_col,
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("double")
    u = (h + 0.5) / float(16**12)
    gumbel = -F.log(-F.log(u))
    key = F.round(
        F.col("log_w") / F.lit(float(temperature)) + gumbel, 6
    ).alias("gumbel_key")
    return (
        w.select(F.col(id_col), "n_feats", "log_w", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )


def target_cross_entropy(
    docs: DataFrame,
    target: DataFrame,
    *,
    ngram: int = 2,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, xent): per-doc cross-entropy (mean negative log-prob,
    nats/feature) of each doc's hashed n-gram bag under the Laplace-smoothed
    TARGET feature model — the perplexity-filter signal (CCNet-style
    pipelines score raw text under a clean-corpus LM and drop the
    high-perplexity tail; public reference: arXiv 1911.00359). This is that
    stage with the engine's hashed-feature unigram model instead of an
    external KenLM binary: exp(xent) is the doc's feature perplexity.

    Same exactness contract as the importance weights: per-bucket
    -ln p_target quantizes to integer micro-nats, per-doc sums are exact,
    the mean divides two exact integers. One broadcast join + one shuffle.
    """
    spark = docs.sparkSession
    # cached (<= dim rows) + total folded into the plan as a broadcast
    # 1-row frame — same no-blocking-setup-job shape as
    # importance_log_weights (round 13, guide §5)
    tc = ngram_bucket_counts(
        target, ngram=ngram, dim=dim, text_col=text_col, id_col=id_col
    ).cache()
    total = tc.agg(
        (F.coalesce(F.sum("cnt"), F.lit(0)) + dim)
        .cast("double")
        .alias("_td")
    )
    universe = spark.range(dim).select(
        F.col("id").cast("long").alias("bucket")
    )
    nlp = (
        universe.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.round(
                -F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                    / F.col("_td")
                )
                * 1e6
            )
            .cast("long")
            .alias("nlp_micro"),
        )
    )
    feats = _features(
        docs, ngram=ngram, dim=dim, text_col=text_col, id_col=id_col
    )
    return (
        feats.join(F.broadcast(nlp), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            # exact-integer 6dp rounding (same hazard class as the LM
            # rows: rounding the DOUBLE quotient diverges across engines
            # when the exact rational sits ON a 6dp boundary)
            (
                F.expr(
                    "(2 * sum(nlp_micro) + count(*)) div (2 * count(*))"
                ).cast("double")
                / F.lit(1e6)
            ).alias("xent"),
        )
    )
