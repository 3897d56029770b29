"""Corpus-curation operators: decontamination, sequence packing,
quality-weighted sampling, domain mixing.

Training-data-pipeline steps the reference (a vector DB prototype) has
no analogue for, but that any 100 TB pretraining corpus build needs:

- **Decontamination**: drop training documents that share an n-gram with a
  held-out evaluation set, so benchmark text does not leak into training
  (the published n-gram-overlap protocol of GPT-2/GPT-3/PaLM appendix-style
  decontamination). Shaped as a semi-join of exploded shingles against the
  eval set's shingle dictionary, then an anti-join back to docs.

- **Sequence packing**: deterministically assign documents to fixed
  token-budget packs. Docs are ordered by a portable hash (md5 — a
  deterministic global shuffle, the same trick as ``sketch.hash_sample``),
  bucketed so the packing window parallelizes, and chunked greedily by
  cumulative token count within each bucket.

Scale notes (100 TB):
- Eval sets are small (thousands of docs, ~1e6 distinct shingles), so the
  contaminated-shingle dictionary broadcasts; the only wide op against the
  full corpus is the final doc_id anti-join, and with the broadcast
  semi-join the candidate set is already tiny. The corpus-side explode
  never shuffles (generate -> broadcast-hash-semi-join -> distinct on the
  small survivor set).
- Packing's window runs PER BUCKET (``num_buckets`` parallel chains), not
  as one global ORDER BY — a global window would serialize 100 TB through
  one task. Buckets are hash-derived, so the assignment is reproducible
  run-to-run and engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.vector import (
    ratio_6dp_exact,
)
from distributed_vector_database_spark.functions.text import (
    tokens,
    word_shingles_arrow,
)

__all__ = [
    "contaminated_doc_ids",
    "decontaminate",
    "neardup_contaminated_pairs",
    "pack_sequences",
    "quality_weighted_sample",
    "budget_mix",
    "temperature_mix",
    "PII_PATTERNS",
    "pii_scrub",
    "boilerplate_shingles",
    "doc_boilerplate_frac",
]


def _shingles(text_col: str, n: int):
    # Arrow-batched kernel: 3.5x the interpreted HOF expression (see
    # functions.text.word_shingles_arrow); same distinct-n-gram contract.
    return word_shingles_arrow(text_col, n=n, distinct=True)


def contaminated_doc_ids(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shared) of training docs sharing >=1 word ``ngram`` with
    any eval doc. ``n_shared`` counts the doc's distinct leaked shingles."""
    eval_sh = (
        eval_docs.select(
            F.explode(_shingles(text_col, ngram)).alias("shingle")
        )
        .distinct()
    )
    train_sh = train.select(
        F.col(id_col), F.explode(_shingles(text_col, ngram)).alias("shingle")
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training docs with every eval-overlapping doc removed (anti-join on
    the contaminated id set). Schema = ``train``'s."""
    bad = contaminated_doc_ids(
        train, eval_docs, ngram=ngram, text_col=text_col, id_col=id_col
    ).select(id_col)
    return train.join(bad, id_col, "left_anti")


def bloom_screened_contaminated_ids(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    ngram: int = 3,
    bits_per_gram: int = 16,
    num_hashes: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_gram_stats: bool = False,
):
    """EXACT contamination flags at sketch-screen cost — the protocol
    SCALING.md's round-7 Bloom measurement implies for 100 TB: the eval
    gram dictionary's Bloom filter screens the distinct train grams
    (broadcast probe, shuffle-free), and ONLY the maybe-present
    remainder — all true leaks plus ~FPR of the rest (measured 0.24% at
    16 bits/gram) — joins the exact dictionary. No false negatives by
    Bloom construction, false positives removed by the exact verify, so
    the output is IDENTICAL to `contaminated_doc_ids` row for row while
    the exact dictionary join probes ~400x fewer gram rows. Flagging
    directly off the filter is NOT equivalent (doc-level FPR amplifies
    gram FPR by grams-per-doc — 11% of docs at sf1.0x, SCALING.md).

    Returns the (doc_id, n_shared) flags frame; with
    ``with_gram_stats=True`` returns ``(flags, stats)`` where stats is
    one row (grams_probed, grams_maybe, grams_contaminated) — the
    screen's work ledger.
    """
    from distributed_vector_database_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
    )

    eval_sh = (
        eval_docs.select(
            F.explode(_shingles(text_col, ngram)).alias("shingle")
        )
        .distinct()
        .localCheckpoint(eager=True)  # tiny; read by count + build + verify
    )
    num_bits = max(bits_per_gram * eval_sh.count(), 1024)
    bloom = bloom_build(
        eval_sh, "shingle", num_bits=num_bits, num_hashes=num_hashes
    )
    # the corpus-scale (doc_id, shingle) explode feeds BOTH the probe
    # dictionary and the final flag join — un-pinned, each consumer
    # re-runs the tokenize+shingle kernel over the full corpus (round 14,
    # guide §5 / VERDICT r13 item 3: one corpus-scan stage removed).
    # Eager checkpoint, not cache: the consumers are independent subtrees
    # of one action and lazy branches race (the repo's measured CC/winnow
    # lesson). The pinned frame is the corpus's exploded gram list —
    # the price of halving the corpus passes; it spills under pressure.
    train_sh = train.select(
        F.col(id_col),
        F.explode(_shingles(text_col, ngram)).alias("shingle"),
    ).localCheckpoint(eager=True)
    probe = train_sh.select("shingle").distinct()
    if with_gram_stats:
        # the stats mode reads probe three times (count, maybe, leaked) —
        # pin the gram dictionary once so nothing re-aggregates the
        # checkpointed explode per consumer
        probe = probe.localCheckpoint(eager=True)
    maybe = bloom_contains(
        bloom, probe, "shingle", num_bits=num_bits, num_hashes=num_hashes
    ).filter(F.col("maybe_present")).select("shingle")
    # exact verify of the maybe-present remainder only; tiny -> broadcast
    leaked = maybe.join(F.broadcast(eval_sh), "shingle", "left_semi")
    flags = (
        train_sh.join(F.broadcast(leaked), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    if not with_gram_stats:
        return flags
    stats = (
        probe.agg(F.count("*").cast("long").alias("grams_probed"))
        .crossJoin(
            maybe.agg(F.count("*").cast("long").alias("grams_maybe"))
        )
        .crossJoin(
            leaked.agg(
                F.count("*").cast("long").alias("grams_contaminated")
            )
        )
    )
    return flags, stats


def pack_sequences(
    docs: DataFrame,
    *,
    budget_tokens: int = 512,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic greedy packing: (doc_id, n_tokens, bucket, pack_id).

    Docs are ordered by ``md5(id)`` (portable pseudo-shuffle), split into
    ``num_buckets`` independent chains by the hash's first hex nibbles,
    and packed contiguously: a doc starts a new pack when the running
    token total before it has crossed the next ``budget_tokens`` boundary
    (packs may overflow by at most one doc — standard greedy semantics).
    ``pack_id`` is unique per (bucket, chunk).
    """
    h = F.md5(F.col(id_col).cast("string"))
    n_tok = F.size(tokens(text_col)).cast("long")
    base = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        h.alias("_h"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % num_buckets)
        .alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("bucket"),
        F.floor((cum - F.col("n_tokens")) / budget_tokens)
        .cast("long")
        .alias("pack_id"),
    )


def quality_weighted_sample(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic importance sampling: keep a doc iff its key's md5
    fraction is below its quality score — i.e. each doc survives with
    probability equal to ``text_analysis.quality_scores`` quality, but
    reproducibly (no RNG) and join-stably (same keys survive every run,
    every engine). Output: (doc_id, quality) of survivors.

    This is the standard quality-weighted corpus resampling step
    (keep-probability proportional to a scorer) expressed as a narrow
    filter — no shuffle, scales linearly.
    """
    from distributed_vector_database_spark.operators.sketch import (
        hash_fraction,
    )
    from distributed_vector_database_spark.operators.text_analysis import (
        quality_scores,
    )

    q = quality_scores(docs, text_col=text_col, id_col=id_col)
    return q.filter(hash_fraction(id_col) < F.col("quality")).select(
        id_col, "quality"
    )


# Detection/redaction patterns chosen to parse identically under Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround. Dict order IS the
# redaction order (replacements run sequentially).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
    replacement: str = "<PII>",
) -> DataFrame:
    """Detect and redact PII-shaped spans (emails, phone numbers, IPv4
    addresses by default) — the scrubbing pass every public-web pretraining
    corpus runs before training.

    Output: ``(id, <text_col> redacted, n_<kind> per pattern, n_pii)``.
    Detection and redaction are single-pass Catalyst ``regexp_count`` /
    ``regexp_replace`` projections — narrow, shuffle-free, whole-stage
    codegen; nothing here costs more than a scan at 100 TB. Patterns are
    applied in dict order; supply ``patterns`` to extend (SSNs, IBANs,
    secrets) — keep them RE2-compatible so the DuckDB oracle can mirror
    them.
    """
    pats = patterns or PII_PATTERNS
    counts = []
    redacted = F.col(text_col)
    total = F.lit(0).cast("long")
    for name, pat in pats.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        counts.append(c.alias(f"n_{name}"))
        total = total + c
        redacted = F.regexp_replace(redacted, pat, replacement)
    return docs.select(
        F.col(id_col),
        redacted.alias(text_col),
        *counts,
        total.alias("n_pii"),
    )


def budget_mix(
    docs: DataFrame,
    budgets: dict[str, int] | None = None,
    *,
    default_budget: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Domain mixing to per-source token budgets: within each source, docs
    are ordered by md5(id) (deterministic shuffle) and kept while the
    running token total stays within the source's budget (truncating —
    the first doc that would cross the cap is dropped, as is everything
    after it). Output: (doc_id, source, n_tokens) of the mixed corpus.

    The ``cum <= budget`` filter is a true prefix cutoff because
    ``n_tokens`` is clamped to >= 0 below, making the running sum monotone
    non-decreasing: once a doc crosses the cap, every later doc in the
    source — including zero-token docs, whose cum equals the crossing
    doc's — sits above the budget and is dropped. (Without the clamp a
    null ``text`` could yield a null/negative size and break the
    monotonicity argument.)

    This is the mixture-weights step of a pretraining data recipe (cap
    each domain's token contribution) as one window per source — the
    window parallelizes across sources, and within a source the scan is
    a single ordered chain (at 100 TB, split giant sources into
    sub-buckets first, as ``pack_sequences`` does).
    """
    budget_expr = F.lit(default_budget)
    if budgets:
        pairs = [x for kv in budgets.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        budget_expr = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(source_col)),
            F.lit(default_budget),
        )
    base = docs.select(
        F.col(id_col),
        F.col(source_col),
        F.greatest(F.lit(0), F.coalesce(F.size(tokens(text_col)), F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
        budget_expr.alias("_budget"),
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") <= F.col("_budget"))
        .select(id_col, source_col, "n_tokens")
    )


def temperature_mix(
    docs: DataFrame,
    total: int,
    *,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled mixture sampling: draw ~``total`` docs with
    per-source allocations proportional to ``count(source) ** alpha`` —
    the standard multinomial temperature trick (alpha < 1 up-weights
    small domains, alpha = 1 is natural sampling; mT5/XLM-R style).

    Within each source the allocation is filled by md5-hash order, so the
    draw is reproducible, engine-portable, and stable under reruns.
    Output: (id, source, rank) of the selected docs, rank 1..target
    within source. Floor division under-allocates by < n_sources docs —
    by design (no cross-source remainder pass, which would serialize).

    Determinism note: the source weights are rounded to integer MICROS
    before the target split (``round(n^alpha * 1e6)``) so the division is
    exact integer math cross-engine. ``alpha=0.5`` routes through
    ``sqrt`` (IEEE correctly-rounded everywhere); arbitrary alphas use
    ``pow``, whose last-ulp may differ between libm builds — fine for
    production, but pin alpha to sqrt-expressible values when an oracle
    must reproduce the split bit-for-bit.

    Plan shape: one tiny counts agg (broadcast back), one window
    rank per source — the same per-source parallel chain as
    :func:`budget_mix`; nothing global, scales with the corpus.
    """
    n_alpha = (
        F.sqrt(F.col("n_docs"))
        if alpha == 0.5
        else F.pow(F.col("n_docs"), F.lit(float(alpha)))
    )
    w_mic = F.round(n_alpha * 1e6).cast("long").alias("w_mic")
    weights = (
        docs.groupBy(source_col)
        .agg(F.count("*").alias("n_docs"))
        .select(source_col, w_mic)
    )
    targets = weights.join(
        F.broadcast(weights.agg(F.sum("w_mic").alias("_tot")))
    ).select(
        source_col,
        F.expr(f"({int(total)} * w_mic) div _tot").alias("_target"),
    )
    rk = F.row_number().over(
        Window.partitionBy(source_col).orderBy(
            F.md5(F.col(id_col).cast("string")), id_col
        )
    )
    ranked = docs.select(F.col(id_col), F.col(source_col), rk.alias("rank"))
    return ranked.join(F.broadcast(targets), on=source_col).filter(
        F.col("rank") <= F.col("_target")
    ).select(id_col, source_col, "rank")


def boilerplate_shingles(
    docs: DataFrame,
    *,
    ngram: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Source-scoped boilerplate dictionary: word ``ngram``s that recur in
    at least ``min_docs`` DISTINCT documents of the SAME source —
    navigation chrome, license footers, templated headers.

    This is the per-site form of boilerplate removal (C4 drops lines
    repeated across pages of a domain; jusText/trafilatura classify by
    site-level repetition): global repetition (`dedup.repeated_spans`)
    catches corpus-wide quotes, while THIS operator keys the frequency
    count by source so a phrase common to one crawl template surfaces
    even if the corpus is huge.

    Output: ``(source, shingle, n_docs)``. Plan: distinct (source,
    shingle, id) projection -> one partial-aggregated groupBy on
    (source, shingle); shuffle carries per-partition partials only.
    """
    sh = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.explode(_shingles(text_col, ngram)).alias("shingle"),
    )
    return (
        sh.groupBy("source", "shingle")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def doc_boilerplate_frac(
    docs: DataFrame,
    *,
    ngram: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, boiler_frac): how much of each doc's
    distinct ``ngram`` inventory is source-level boilerplate (per
    `boilerplate_shingles`). High-fraction docs are template chrome to
    trim or drop.

    Plan: shingles are DISTINCT per doc, so the per-bucket doc count is
    a plain ``count() OVER (PARTITION BY source, shingle)`` window — one
    shuffle on the (source, shingle) key, no second evaluation of the
    explode and no join back (the join form ran the shingle kernel
    twice; the window form was measured 2x faster at sf0.1). The window
    key includes source, so one crawl's hot template lines never fan
    out across sources. Docs with zero shingles (< ngram tokens) are
    absent.
    """
    from pyspark.sql import Window

    sh = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.explode(_shingles(text_col, ngram)).alias("shingle"),
    )
    nd = F.count("*").over(Window.partitionBy("source", "shingle"))
    boiler = F.sum(
        F.when(F.col("_nd") >= min_docs, 1).otherwise(0)
    )
    return (
        sh.withColumn("_nd", nd)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            boiler.alias("n_boiler"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_boiler",
            # exact-integer 6dp (boundary-safe across engines, see
            # functions.vector.ratio_6dp_exact)
            ratio_6dp_exact("n_boiler", "n_shingles").alias("boiler_frac"),
        )
    )


def neardup_contaminated_pairs(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR-DUPLICATE decontamination (the Dolma/Llama mode): training
    docs that are near-duplicates of held-out eval docs — contamination
    the exact n-gram screens (`contaminated_doc_ids`,
    `bloom_screened_contaminated_ids`) only see as partial overlap and a
    paraphrased or lightly-edited leak can slip past entirely.

    Pipeline: MinHash band buckets on BOTH sides, candidates from the
    ASYMMETRIC train x eval equi-join on (band_ix, bv) — never
    |train| x |eval| — then exact Jaccard verification of the candidates
    (distinct word n-gram sets, array_intersect), keeping pairs with
    ``jaccard >= threshold``.

    Banding recall follows the LSH s-curve 1-(1-J^r)^b (r = num_hashes /
    bands rows per band): the default (8, 4) gives ~0.68 at J = 0.5 and
    ~1.0 above J ~ 0.8 — tune with `dedup.minhash_operating_points`.

    Scale: band keys are uniform md5 values, the eval side is tiny
    (benchmarks, not corpora), so the candidate join broadcasts; verify
    touches candidates only. Returns (``id_col``, eval_doc_id, jaccard).
    """
    from distributed_vector_database_spark.operators.dedup import (
        _shingled,
        minhash_band_buckets,
    )

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    tb = minhash_band_buckets(
        train, num_hashes, bands, n=n, text_col=text_col, id_col=id_col
    )
    eb = minhash_band_buckets(
        eval_docs, num_hashes, bands, n=n, text_col=text_col, id_col=id_col
    )
    cand = (
        tb.alias("t")
        .join(
            F.broadcast(eb.alias("e")),
            (F.col("t.band_ix") == F.col("e.band_ix"))
            & (F.col("t.bv") == F.col("e.bv")),
        )
        .select(
            F.col(f"t.{id_col}").alias(id_col),
            F.col(f"e.{id_col}").alias("eval_doc_id"),
        )
        .distinct()
    )
    tsh = _shingled(train, text_col, id_col, n, method="arrow").select(
        F.col(id_col), F.col("shingles").alias("_ts")
    )
    esh = _shingled(
        eval_docs, text_col, id_col, n, method="arrow"
    ).select(F.col(id_col).alias("eval_doc_id"), F.col("shingles").alias("_es"))
    inter = F.size(F.array_intersect("_ts", "_es"))
    denom = F.size("_ts") + F.size("_es") - inter
    j = F.round(inter.cast("double") / denom.cast("double"), 6)
    return (
        cand.join(tsh, id_col)
        .join(F.broadcast(esh), "eval_doc_id")
        .select(F.col(id_col), F.col("eval_doc_id"), j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def split_leakage_audit(
    docs: DataFrame,
    fractions: dict[str, float],
    *,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate leakage census across a train/val/test carving: a
    deduped-then-split pipeline is only leakage-free w.r.t. the dup
    definition it deduped with — any SURVIVING near-dup pair whose
    members hash into different splits is an eval leak (the val/test
    member is a paraphrase of a training doc). This is the split-time
    counterpart of eval-set decontamination
    (:func:`neardup_contaminated_pairs`): that screens against an
    external benchmark; this audits the pipeline's own carving.

    Pipeline: `sketch.hash_split` assigns splits (key-hash, join-stable);
    near-dup pairs come from the symmetric MinHash band self-join
    (`dedup.minhash_candidate_pairs` — uniform band keys, never |docs|²)
    verified by exact Jaccard on distinct word n-gram sets; each verified
    pair joins to its members' splits. Output: one row per unordered
    split combination — ``(split_a, split_b, n_pairs, leaked)`` with
    ``split_a <= split_b`` and ``leaked = split_a != split_b`` — the
    dashboard that says "K near-dup pairs straddle train/test".

    Scale: two id-keyed joins of the (tiny) verified-pair frame against
    the id-sized split projection, then a |splits|²-bounded aggregate;
    the only corpus-sized work is the shared MinHash/shingle pass the
    dedup screens already pay.
    """
    from distributed_vector_database_spark.operators.dedup import (
        _shingled,
        minhash_candidate_pairs,
    )
    from distributed_vector_database_spark.operators.sketch import hash_split

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    cand = minhash_candidate_pairs(
        docs, num_hashes, bands, n=n, text_col=text_col, id_col=id_col
    )
    sh = _shingled(docs, text_col, id_col, n, method="arrow")
    sa = sh.select(
        F.col(id_col).alias("doc_id_a"), F.col("shingles").alias("_sa")
    )
    sb = sh.select(
        F.col(id_col).alias("doc_id_b"), F.col("shingles").alias("_sb")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    denom = F.size("_sa") + F.size("_sb") - inter
    j = F.round(inter.cast("double") / denom.cast("double"), 6)
    verified = (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select("doc_id_a", "doc_id_b", j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    splits = hash_split(docs.select(id_col), id_col, fractions).select(
        F.col(id_col), F.col("split")
    )
    pa = splits.select(
        F.col(id_col).alias("doc_id_a"), F.col("split").alias("_pa")
    )
    pb = splits.select(
        F.col(id_col).alias("doc_id_b"), F.col("split").alias("_pb")
    )
    return (
        verified.join(pa, "doc_id_a")
        .join(pb, "doc_id_b")
        .select(
            F.least("_pa", "_pb").alias("split_a"),
            F.greatest("_pa", "_pb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .withColumn("leaked", F.col("split_a") != F.col("split_b"))
    )
