"""Text analysis operators: token stats, quality scoring, language ID,
regex token counting, content fingerprinting.

Training-data-pipeline surface (SURVEY.md §7.7) over the ``documents`` table.
Everything is JVM-side Catalyst expressions over whitespace tokens — no
Python in the hot path; each operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.vector import (
    ratio_6dp_exact,
)
from distributed_vector_database_spark.functions.text import (
    tokens,
    doc_fingerprint,
)

__all__ = [
    "token_stats",
    "quality_scores",
    "repetition_scores",
    "language_id",
    "regex_token_count",
    "fingerprints",
    "winnow_fingerprints",
    "term_frequencies",
    "tfidf_top_terms",
    "oov_rates",
    "pmi_pairs",
    "bm25_search",
    "bm25_prf_search",
    "ql_dirichlet_search",
    "novelty_scores",
    "LANG_MARKERS",
]


def token_stats(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, avg_token_len) — narrow projection."""
    t = tokens(text_col)
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return docs.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        F.round(total_len.cast("double") / F.size(t), 6).alias("avg_token_len"),
    )


def quality_scores(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality in [0,1]:

      0.4 * min(n_tokens/50, 1)        (enough content)
    + 0.4 * n_distinct/n_tokens        (lexical diversity)
    + 0.2 * min(avg_token_len/6, 1)    (non-degenerate tokens)

    The shape (length + diversity + token-size mix) follows public
    pretraining-data heuristics (C4/Gopher-style filters); weights are this
    engine's own.
    """
    t = tokens(text_col)
    n = F.size(t).cast("double")
    nd = F.size(F.array_distinct(t)).cast("double")
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    ).cast("double")
    score = (
        F.lit(0.4) * F.least(n / 50.0, F.lit(1.0))
        + F.lit(0.4) * (nd / n)
        + F.lit(0.2) * F.least((total_len / n) / 6.0, F.lit(1.0))
    )
    return docs.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.round(score, 6).alias("quality"),
    )


def repetition_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_word_threshold: float = 0.7,
    top_bigram_threshold: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition signals per document:

      dup_word_frac   = 1 - n_distinct_tokens / n_tokens
      top_bigram_frac = occurrences of the most frequent bigram / n_bigrams
                        (0.0 for docs with < 2 tokens)
      is_repetitive   = dup_word_frac over threshold, OR top_bigram_frac
                        over threshold AND the top bigram actually repeats
                        (count >= 2 — otherwise every short all-distinct
                        doc would trip the ratio test)

    The signal pair follows the published "repetitious text" filters of
    Rae et al.'s Gopher data pipeline (duplicate-word and top-n-gram
    fractions); thresholds here are this engine's own. Everything is a
    per-row Catalyst expression — narrow, shuffle-free, and O(tokens²)
    only in the distinct-bigram count loop, which whole-stage codegen
    keeps in the JVM. The reference has no quality surface at all (its
    text is an opaque id, `reference: src/test.py:31-34`).
    """
    t = tokens(text_col)
    n = F.size(t).cast("double")
    nd = F.size(F.array_distinct(t)).cast("double")
    dup_frac = F.when(n > 0, F.lit(1.0) - nd / n).otherwise(F.lit(0.0))

    # non-distinct bigrams, then max count of any distinct bigram
    bg = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i.cast("int")),
                F.element_at(t, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_count = F.array_max(
        F.transform(
            F.array_distinct(bg),
            lambda d: F.size(F.filter(bg, lambda x: x == d)),
        )
    )
    top_frac = F.when(
        F.size(bg) > 0, top_count.cast("double") / F.size(bg)
    ).otherwise(F.lit(0.0))

    dup_r = F.round(dup_frac, 6)
    top_r = F.round(top_frac, 6)
    top_repeats = F.coalesce(top_count, F.lit(0)) >= 2
    return docs.select(
        F.col(id_col),
        dup_r.alias("dup_word_frac"),
        top_r.alias("top_bigram_frac"),
        (
            (dup_r > F.lit(dup_word_threshold))
            | ((top_r > F.lit(top_bigram_threshold)) & top_repeats)
        ).alias("is_repetitive"),
    )


# marker stopwords per language; cascade order = tie-break priority
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "is", "of", "and", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "de", "y", "es"],
    "fr": ["le", "la", "les", "et", "est", "un"],
}


def _marker_hits(t: Column, markers: list[str]) -> Column:
    mset = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(t, lambda x: F.array_contains(mset, x)))


def language_id(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-stopword language ID: hit count per language's marker set,
    argmax with fixed cascade priority (en > de > es > fr), 'und' when no
    marker hits. Returns (doc_id, lang_pred, lang_hits).

    (A production system swaps the marker sets for char-n-gram profiles;
    the operator shape — per-language score then cascade argmax — is the
    same and stays fully declarative.)
    """
    t = tokens(text_col)
    hits = {lang: _marker_hits(t, m) for lang, m in LANG_MARKERS.items()}
    order = list(LANG_MARKERS)
    # cascade argmax: a language wins if it strictly beats every
    # higher-priority language and ties-or-beats every lower-priority one
    pred = F.lit("und")
    for lang in reversed(order):
        others = [o for o in order if o != lang]
        cond = hits[lang] > 0
        for other in others:
            if order.index(other) < order.index(lang):
                cond = cond & (hits[lang] > hits[other])
            else:
                cond = cond & (hits[lang] >= hits[other])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    total_hits = None
    for lang in order:
        total_hits = hits[lang] if total_hits is None else total_hits + hits[lang]
    return docs.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        total_hits.cast("long").alias("lang_hits"),
    )


def regex_token_count(
    docs: DataFrame,
    pattern: str = "[a-z0-9]+|[^a-z0-9\\s]",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BPE-ish token count: alnum runs + single punctuation marks.

    (Whitespace tokenization undercounts for tokenizer-budget estimates;
    this matches the common pre-tokenizer split.)
    """
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.lower(text_col), F.lit(pattern), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def fingerprints(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fp): whitespace-insensitive md5 content fingerprint."""
    return docs.select(F.col(id_col), doc_fingerprint(text_col).alias("fp"))


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
    per document, the distinct minima of each ``window`` consecutive
    k-token-gram md5s — (doc_id, fp) rows.

    The winnowing guarantee: any token run of length >= k + window - 1
    shared by two documents selects at least one common fingerprint, so an
    equi-join on ``fp`` finds substring-level duplication (quote reuse,
    template text, partial plagiarism) that whole-document or bag-of-words
    fingerprints miss — while keeping only ~2/(window+1) of the gram
    hashes per document.

    Selection is one projection per row — no shuffle until a consumer
    joins on fp. ``impl="arrow"`` (default) computes it in an
    Arrow-batched kernel: the expression form is a transform-inside-
    transform nest (md5 per gram, array_min per window) that Catalyst
    evaluates INTERPRETED and re-inlines the gram-hash array into every
    window's slice — measured 15 s vs 0.9 s for the pair query at sf0.01.
    Same hot-path story as `functions.text.word_shingles_arrow`; the
    ``impl="expr"`` twin stays as the oracle-parity reference (tested
    equal) and the DuckDB mirror matches both: md5 hex minima compare
    lexicographically in all three.

    Documents with fewer than k tokens yield no fingerprints; with fewer
    than k + window - 1 tokens, the (single, short) window still selects
    the global minimum, so short docs remain joinable.
    """
    if impl not in ("arrow", "expr"):
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
    if impl == "expr":
        from distributed_vector_database_spark.functions.text import (
            word_shingles,
        )

        toks = tokens(text_col)
        grams = word_shingles(toks, k, distinct=False)
        gh = F.transform(grams, F.md5)
        n_windows = F.greatest(F.size(gh) - (window - 1), F.lit(1))
        mins = F.when(
            F.size(gh) > 0,
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(gh, j, window)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return docs.select(
            F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
        )

    import hashlib
    import re

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType
    from pyspark.sql.types import ArrayType, StringType

    ws = re.compile(r"\s+")

    # explicit SCALAR: the type-hint form can't resolve 'pd.Series' under
    # postponed annotations with a function-local pandas import
    @F.pandas_udf(ArrayType(StringType()), PandasUDFType.SCALAR)
    def _winnow(texts):
        out = []
        for t in texts:
            toks = [x for x in ws.split(t or "") if x]
            gh = [
                hashlib.md5(
                    " ".join(toks[i : i + k]).encode("utf-8")
                ).hexdigest()
                for i in range(len(toks) - k + 1)
            ]
            if not gh:
                out.append([])
                continue
            n_windows = max(len(gh) - window + 1, 1)
            out.append(
                sorted({min(gh[j : j + window]) for j in range(n_windows)})
            )
        return pd.Series(out)

    return docs.select(
        F.col(id_col), F.explode(_winnow(F.col(text_col))).alias("fp")
    )


def term_frequencies(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global ``(term, n)`` counts — distributed wordcount.

    explode → hash-agg: Spark plans a map-side partial count per partition,
    so the shuffle carries |vocab| partials, not |tokens| rows. At 100 TB
    this is the canonical "build the corpus dictionary" job.
    """
    return (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF:
    ``tf(term, doc) * ln((1 + N) / (1 + df(term)))``.

    Plan shape: one explode + (doc, term) hash-agg for tf; df derives from
    the SAME aggregated frame (|doc·term| rows, not |tokens|); the df join
    is on ``term`` (broadcastable while the vocabulary is small); final
    per-doc ranking windows only |doc·term| rows. Deterministic order:
    (rounded score DESC, term ASC).
    """
    from pyspark.sql import Window

    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.count()  # index-build scalar, enters the plan as a literal
    scored = tf.join(df, "term").select(
        F.col(id_col),
        "term",
        "tf",
        F.round(
            F.col("tf")
            * F.log((1.0 + float(n)) / (1.0 + F.col("df").cast("double"))),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def oov_rates(
    docs: DataFrame,
    vocab_size: int = 100,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own top-V
    vocabulary — the tokenizer-prep audit (how much of each doc a V-entry
    vocab fails to cover; high-OOV docs are noise/foreign-language
    candidates).

    Vocabulary = top ``vocab_size`` terms by global frequency,
    deterministically tie-broken (n DESC, term ASC). Plan shape: the
    wordcount's |vocab| result is TakeOrdered'd to V rows and BROADCAST to
    the exploded corpus (a V-row build side regardless of corpus size), so
    the only wide op is the per-doc count agg — map-side combinable.

    Output: ``(id, n_tokens, n_oov, oov_rate)`` with rate rounded to 6dp.
    """
    vocab = (
        term_frequencies(docs, text_col=text_col, id_col=id_col)
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(True).alias("_in_vocab"))
    )
    terms = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    joined = terms.join(F.broadcast(vocab), "term", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            # exact-integer 6dp (boundary-safe across engines, see
            # functions.vector.ratio_6dp_exact)
            ratio_6dp_exact("n_oov", "n_tokens").alias("oov_rate"),
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 lexical retrieval: top-k docs for a bag of query terms,
    ``score = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` with
    the Lucene-smoothed ``idf = ln(1 + (N-df+0.5)/(df+0.5))``.

    The classic sparse arm of a hybrid retrieval stack (pair with dense
    cosine via ``fusion.rrf_fuse``). Plan shape: explode -> filter to the
    query terms BEFORE any shuffle (the per-doc tf agg carries only
    |docs x |q|| rows), df from the tiny tf frame, corpus stats (N,
    avgdl) enter as literals from a one-row index-build agg. Nothing
    touches docs without a query term — at 100 TB an inverted-index
    layout (partitionBy(term)) makes the explode a pruned scan.

    Determinism: per-term scores round to integer MICROS and sum as
    exact longs, so the cross-engine float-sum-order hazard (3 doubles
    per doc) vanishes; the final score divides once at the end.
    """
    terms = [str(t) for t in query_terms]
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    # corpus stats (N, avgdl) enter as a broadcast 1-row frame instead of
    # a driver-collected literal pair — the old .head() ran a full corpus
    # tokenize pass as a blocking setup job before the real query (round
    # 13, guide §5; bm25_prf_search paid it twice). float(s)/n is the
    # identical double division in-plan.
    st = base.agg(
        F.count("*").cast("double").alias("_nd"),
        (
            F.sum(F.size("_t")).cast("double") / F.count("*")
        ).alias("_avgdl"),
    )
    tf = (
        base.select(
            F.col(id_col),
            F.size("_t").cast("long").alias("dl"),
            F.explode("_t").alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    dfd = F.col("df").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_nd") - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    term_score = (
        idf
        * (tfd * F.lit(k1 + 1.0))
        / (
            tfd
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * dld / F.col("_avgdl"))
        )
    )
    mic = F.round(term_score * F.lit(1e6)).cast("long")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(st))
        .select(F.col(id_col), mic.alias("_mic"))
        .groupBy(id_col)
        .agg(F.sum("_mic").alias("_m"))
        .select(
            F.col(id_col),
            F.round(F.col("_m") / F.lit(1e6), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def pmi_pairs(
    docs: DataFrame,
    *,
    min_pair_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information of within-document token
    co-occurrence: ``pmi(a,b) = ln( c_ab * N / (c_a * c_b) )`` over
    document-level presence counts — the classic collocation / topic-pair
    signal (Church & Hanks 1990), and a cheap corpus-drift monitor (PMI
    of a pair shifting across snapshots means the sources changed).

    Plan: one distinct (doc, token) projection; unary counts are a
    token-group aggregate; pair counts come from the per-document
    self-equi-join on ``doc_id`` (fan-out is O(u²) per doc with u =
    DISTINCT tokens in the doc — bounded by document length, and in a
    curated corpus documents are length-capped upstream; this never
    joins across documents). N rides in as a broadcast one-row frame.
    Integer count products stay exact in float64 (≤ 2⁵³), so the ln and
    its 6dp rounding are bit-identical cross-engine.

    Returns ``(t1, t2, pair_count, pmi)``, ``t1 < t2``, pairs with
    ``pair_count >= min_pair_count``.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("t")
    )
    n_docs = docs.select(F.count("*").alias("_nd"))
    ca = toks.groupBy(F.col("t")).agg(F.count("*").alias("_c"))
    a = toks.select(F.col(id_col), F.col("t").alias("t1"))
    b = toks.select(F.col(id_col), F.col("t").alias("t2"))
    pairs = (
        a.join(b, id_col)
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    # unary-count joins are left to AQE: the vocab frame is usually
    # broadcastable, but at web-corpus vocab sizes (1e8+) it must take
    # the shuffle path — don't force the hint either way
    return (
        pairs.join(ca.withColumnsRenamed({"t": "t1", "_c": "_c1"}), "t1")
        .join(ca.withColumnsRenamed({"t": "t2", "_c": "_c2"}), "t2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t1",
            "t2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("pair_count") * F.col("_nd")).cast("double")
                    / (F.col("_c1") * F.col("_c2")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def novelty_scores(
    docs: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram NOVELTY against every earlier (lower-id)
    document: ``(id, n_grams, n_novel, novelty)`` where ``n_grams`` is
    the doc's distinct word n-gram count, ``n_novel`` counts grams whose
    corpus-wide minimum owner id IS this doc, and ``novelty`` is their
    exact-6dp ratio. The curation signal behind "prefer fresh text":
    boilerplate-heavy or recycled docs score near 0, first occurrences
    near 1 — the scoring complement of the dedup owner screens (same
    min-owner machinery, but graded instead of flagged). Docs with no
    n-grams (fewer than ``n`` tokens) are absent.

    Scale: one shingle explode + partial-agg min on the uniform gram
    key + join back + per-doc agg — the flat owner-screen shape; no
    pair fan-out, nothing corpus-scale pinned.
    """
    from distributed_vector_database_spark.operators.dedup import _shingled

    sh = _shingled(docs, text_col, id_col, n)
    grams = sh.select(F.col(id_col), F.explode("shingles").alias("g"))
    owner = grams.groupBy("g").agg(F.min(id_col).alias("_owner"))
    return (
        grams.join(owner, "g")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("_owner") == F.col(id_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn("novelty", ratio_6dp_exact("n_novel", "n_grams"))
    )


def bm25_prf_search(
    docs: DataFrame,
    query_terms,
    *,
    k_feedback: int = 5,
    n_expansion: int = 3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 with pseudo-relevance feedback — the LEXICAL twin of
    `fusion.rocchio_expanded_topk` (RM3-lite): retrieve ``k_feedback``
    docs for the raw query, mine the ``n_expansion`` most frequent
    non-query terms from them (total term frequency DESC, term ASC —
    a deterministic, exactly-mirrorable criterion; full RM3 would
    weight by the relevance model, which adds nothing at exact-oracle
    granularity), union them into the query, re-run BM25.

    Recovers vocabulary-mismatch recall: a doc using the feedback
    docs' vocabulary but none of the original terms is invisible to
    pass 1 and reachable in pass 2.

    Scale: two BM25 passes (each explode-filters to its term set
    BEFORE any shuffle) + two bounded driver collects (k_feedback ids,
    n_expansion terms). Returns the final (id, score) top-k.
    """
    if not (1 <= k_feedback <= 64):
        raise ValueError(
            f"k_feedback must be in [1, 64], got {k_feedback}"
        )
    if not (1 <= n_expansion <= 64):
        raise ValueError(
            f"n_expansion must be in [1, 64], got {n_expansion}"
        )
    terms = [str(t) for t in query_terms]
    fb = bm25_search(
        docs,
        terms,
        k=k_feedback,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
    )
    fb_ids = [r[0] for r in fb.select(id_col).collect()]
    expansion = [
        r["term"]
        for r in (
            docs.filter(F.col(id_col).isin(fb_ids))
            .select(F.explode(tokens(text_col)).alias("term"))
            .filter(~F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("term"))
            .limit(n_expansion)
            .collect()
        )
    ]
    return bm25_search(
        docs,
        terms + expansion,
        k=k,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
    )


def ql_dirichlet_search(
    docs: DataFrame,
    query_terms,
    *,
    k: int = 10,
    mu: float = 2000.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR 2001) — the language-model ranking family next to
    BM25's probabilistic one:

        score(d) = sum_q ln( (tf(q,d) + mu * p_c(q)) / (dl + mu) )

    where ``p_c(q) = cf(q) / |C|`` is the collection unigram model.
    Unlike BM25, ABSENT query terms still contribute (the smoothed
    collection probability), so every doc gets a finite score and the
    ranking degrades gracefully for rare vocabularies. Query terms with
    zero collection frequency contribute ln(mu*0 + tf=0 ...) = -inf and
    are dropped up front (standard QL practice).

    Plan shape: same as `bm25_search` — the explode filters to query
    terms BEFORE any shuffle; collection stats enter as literals; the
    per-(doc, term) tf frame left-joins back to EVERY doc via the
    doc-length frame so absent terms score the smoothed floor. Per-term
    log-probs round to integer MICROS and sum as exact longs.
    """
    terms = sorted({str(t) for t in query_terms})
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    dl = base.select(
        F.col(id_col), F.size("_t").cast("long").alias("dl")
    ).filter(F.col("dl") > 0)
    ex = base.select(
        F.col(id_col), F.explode("_t").alias("term")
    ).filter(F.col("term").isin(terms))
    # ONE corpus pass for both the collection total and the per-term
    # collection frequencies (round 13, guide §1.2): group every token
    # by its own value when it is a query term, else NULL — the collect
    # is |terms|+1 rows, coll_n is their exact sum. The old form paid
    # two full tokenize passes as blocking setup jobs.
    stats = (
        base.select(F.explode("_t").alias("term"))
        .groupBy(
            F.when(F.col("term").isin(terms), F.col("term")).alias("_t")
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    coll_n = int(sum(r["c"] for r in stats))
    cf = {r["_t"]: int(r["c"]) for r in stats if r["_t"] is not None}
    live = [t for t in terms if cf.get(t, 0) > 0]
    if not live:
        raise ValueError(
            f"no query term occurs in the collection: {terms}"
        )
    tf = ex.filter(F.col("term").isin(live)).groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    # one row per (doc, live term): absent terms get tf = 0
    probe = dl.crossJoin(
        F.broadcast(
            dl.sparkSession.createDataFrame(
                [(t,) for t in live], "term string"
            )
        )
    )
    joined = probe.join(tf, [id_col, "term"], "left").select(
        F.col(id_col),
        F.col("dl"),
        F.coalesce(F.col("tf"), F.lit(0)).cast("double").alias("tfd"),
        F.col("term"),
    )
    # collection model as a literal map: term -> cf/|C| (index-build
    # scalars, like the BM25 idf inputs)
    pcol = F.element_at(
        F.create_map(
            *[
                x
                for t in live
                for x in (F.lit(t), F.lit(float(cf[t]) / float(coll_n)))
            ]
        ),
        F.col("term"),
    )
    term_score = F.log(
        (F.col("tfd") + F.lit(mu) * pcol)
        / (F.col("dl").cast("double") + F.lit(mu))
    )
    mic = F.round(term_score * F.lit(1e6)).cast("long")
    scored = (
        joined.select(F.col(id_col), mic.alias("_mic"))
        .groupBy(id_col)
        .agg(F.sum("_mic").alias("_m"))
        .select(
            F.col(id_col),
            F.round(F.col("_m") / F.lit(1e6), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
