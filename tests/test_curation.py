"""Corpus curation: decontamination, repetition filter, sequence packing."""

import pyspark.sql.functions as F

from distributed_vector_database_spark.functions.text import (
    tokens,
    word_shingles,
)
from distributed_vector_database_spark.operators.curation import (
    contaminated_doc_ids,
    decontaminate,
    pack_sequences,
)
from distributed_vector_database_spark.operators.text_analysis import (
    repetition_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_removes_every_overlap(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps")])
    tr = _docs(
        spark,
        [
            (1, "a quick brown fox ran away"),  # shares "quick brown fox"
            (2, "totally unrelated text here now"),
            (3, "the quick brown fox jumps again"),  # shares several
            (4, "short doc"),  # < 3 tokens -> no shingles, never flagged
        ],
    )
    bad = {r["doc_id"]: r["n_shared"] for r in
           contaminated_doc_ids(tr, ev, ngram=3).collect()}
    assert set(bad) == {1, 3}
    assert bad[3] > bad[1] >= 1
    clean = decontaminate(tr, ev, ngram=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]
    # invariant: clean corpus shares ZERO shingles with the eval set
    sh = lambda df: {
        r[0]
        for r in df.select(
            F.explode(word_shingles(tokens("text"), n=3)).alias("s")
        ).collect()
    }
    assert not (sh(clean) & sh(ev))


def test_decontaminate_eval_side_is_broadcast(spark, documents):
    ev = documents.filter(F.col("doc_id") % 50 == 0)
    tr = documents.filter(F.col("doc_id") % 50 != 0)
    plan = (
        contaminated_doc_ids(tr, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_repetition_scores_flags_degenerate_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),  # one token repeated
            (2, "buy now buy now buy now buy now"),  # one bigram dominates
            (3, "each word here appears exactly once"),
            (4, ""),  # empty -> 0.0 fractions, not flagged
        ],
    )
    r = {x["doc_id"]: x for x in repetition_scores(docs).collect()}
    assert r[1]["is_repetitive"] and r[1]["dup_word_frac"] > 0.8
    assert r[2]["is_repetitive"] and r[2]["top_bigram_frac"] > 0.4
    assert not r[3]["is_repetitive"] and r[3]["dup_word_frac"] == 0.0
    assert not r[4]["is_repetitive"]
    assert r[4]["dup_word_frac"] == r[4]["top_bigram_frac"] == 0.0


def test_repetition_scores_is_shuffle_free(spark, documents):
    plan = (
        repetition_scores(documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_partitions_and_budget(spark, documents):
    packed = pack_sequences(documents, budget_tokens=128, num_buckets=4)
    rows = packed.collect()
    # every doc packed exactly once
    assert len({r["doc_id"] for r in rows}) == documents.count()
    assert {r["bucket"] for r in rows} <= set(range(4))
    # greedy-contiguous invariant: a pack exceeds the budget only by its
    # final doc => sum(pack) - max_doc(pack) < budget for multi-doc packs
    agg = (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max("n_tokens").alias("mx"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    for r in agg:
        if r["n"] > 1:
            assert r["tot"] - r["mx"] < 128, dict(r.asDict())
    # pack ids within a bucket are dense from 0
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], set()).add(r["pack_id"])
    for ids in by_bucket.values():
        assert ids == set(range(max(ids) + 1))


def test_pack_sequences_deterministic(spark, documents):
    a = sorted(map(tuple, pack_sequences(documents).collect()))
    b = sorted(
        map(tuple, pack_sequences(documents.repartition(7)).collect())
    )
    assert a == b


def test_quality_weighted_sample_subset_and_deterministic(spark, documents):
    from distributed_vector_database_spark.operators.curation import (
        quality_weighted_sample,
    )
    from distributed_vector_database_spark.operators.sketch import (
        hash_fraction,
    )
    from distributed_vector_database_spark.operators.text_analysis import (
        quality_scores,
    )

    kept = quality_weighted_sample(documents)
    rows = kept.collect()
    n_docs = documents.count()
    assert 0 < len(rows) < n_docs
    # survival rule is exactly hash_fraction < quality
    q = {r["doc_id"]: r["quality"] for r in quality_scores(documents).collect()}
    frac = {
        r["doc_id"]: r["f"]
        for r in documents.select(
            "doc_id", hash_fraction("doc_id").alias("f")
        ).collect()
    }
    kept_ids = {r["doc_id"] for r in rows}
    expect = {d for d in q if frac[d] < q[d]}
    assert kept_ids == expect
    # shuffle-free narrow plan
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_budget_mix_caps_every_source(spark, documents):
    from distributed_vector_database_spark.operators.curation import budget_mix

    mixed = budget_mix(documents, {"src0": 900}, default_budget=600)
    per_src = {
        r["source"]: r["tot"]
        for r in mixed.groupBy("source")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    for src, tot in per_src.items():
        cap = 900 if src == "src0" else 600
        assert tot <= cap, (src, tot)
    # the cap binds (sources have more tokens than budget) and the
    # over-weighted source got more than the default cap allows
    assert per_src["src0"] > 600
    # deterministic under physical re-layout
    a = sorted(map(tuple, mixed.collect()))
    b = sorted(
        map(
            tuple,
            budget_mix(
                documents.repartition(13), {"src0": 900}, default_budget=600
            ).collect(),
        )
    )
    assert a == b


# ---- PII scrubbing --------------------------------------------------------


def test_pii_scrub_detects_and_redacts(spark):
    from distributed_vector_database_spark.operators.curation import pii_scrub

    rows = [
        (0, "reach me at a.b-c_1@mail.example.org thanks"),
        (1, "server 192.168.1.254 and backup 10.0.0.1"),
        (2, "call 555-123-4567 now"),
        (3, "nothing sensitive here"),
        (4, "x@y.io or 1.2.3.4 or 999-888-7777"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_pii"]) == (1, 1)
    assert "a.b-c_1@mail.example.org" not in out[0]["text"]
    assert "<PII>" in out[0]["text"]
    assert out[1]["n_ipv4"] == 2 and out[1]["text"].count("<PII>") == 2
    assert out[2]["n_phone"] == 1
    assert out[3]["n_pii"] == 0 and out[3]["text"] == rows[3][1]
    assert out[4]["n_pii"] == 3 and out[4]["text"].count("<PII>") == 3


def test_pii_scrub_custom_patterns(spark):
    from distributed_vector_database_spark.operators.curation import pii_scrub

    docs = spark.createDataFrame(
        [(0, "key=AKIA1234 other")], "doc_id long, text string"
    )
    out = pii_scrub(
        docs, patterns={"akia": r"AKIA[0-9A-Z]+"}, replacement="[SECRET]"
    ).collect()[0]
    assert out["n_akia"] == 1 and out["n_pii"] == 1
    assert out["text"] == "key=[SECRET] other"


# ---- OOV rate -------------------------------------------------------------


def test_oov_rates_invariants(spark, documents):
    from distributed_vector_database_spark.operators.text_analysis import (
        oov_rates,
    )

    out = oov_rates(documents, vocab_size=10).collect()
    assert len(out) == documents.count()
    for r in out:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - round(r["n_oov"] / r["n_tokens"], 6)) < 1e-9
    # a giant vocab covers everything -> OOV 0 everywhere
    full = oov_rates(documents, vocab_size=10**6).collect()
    assert all(r["n_oov"] == 0 for r in full)


def test_word_shingles_arrow_equals_expression(spark, docs_df=None):
    """The Arrow shingle kernel is value- and order-identical to the
    Catalyst expression form, including edge docs (empty / whitespace-only /
    shorter than n / repeated grams)."""
    from distributed_vector_database_spark.functions.text import (
        word_shingles_arrow,
    )

    edge = _docs(
        spark,
        [
            (1, ""),
            (2, "   \t  "),
            (3, "one two"),
            (4, "a b c a b c a b c"),
            (5, "x  y\tz   x y"),
        ],
    )
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    for df in (edge, corpus):
        for n in (2, 3):
            got = df.select(
                "doc_id",
                word_shingles(tokens("text"), n=n).alias("e"),
                word_shingles_arrow("text", n=n).alias("a"),
            ).collect()
            for r in got:
                assert r["e"] == r["a"], (n, r["doc_id"], r["e"], r["a"])


# ---------------------------------------------------------------------------
# Temperature mixture sampling
# ---------------------------------------------------------------------------


def test_temperature_mix_allocations(spark, documents):
    import math

    from distributed_vector_database_spark.operators.curation import (
        temperature_mix,
    )

    total = 100
    res = temperature_mix(
        documents, total=total, alpha=0.5, source_col="lang"
    ).collect()
    counts = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    w_mic = {s: round(math.sqrt(n) * 1e6) for s, n in counts.items()}
    tot = sum(w_mic.values())
    expected = {s: (total * w) // tot for s, w in w_mic.items()}
    got = {}
    for r in res:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got == {s: t for s, t in expected.items() if t > 0}
    # floor division: under-allocates by strictly less than n_sources
    assert total - len(res) < len(counts)
    # ranks are 1..target within each source
    for s, t in expected.items():
        ranks = sorted(r["rank"] for r in res if r["lang"] == s)
        assert ranks == list(range(1, t + 1))


def test_temperature_mix_deterministic_and_flattening(spark, documents):
    from distributed_vector_database_spark.operators.curation import (
        temperature_mix,
    )

    a = temperature_mix(documents, total=80, source_col="lang").collect()
    b = temperature_mix(documents, total=80, source_col="lang").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # alpha=0.5 up-weights rare sources vs natural (alpha=1) sampling
    counts = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    rare = min(counts, key=counts.get)
    head = max(counts, key=counts.get)
    sel = {}
    for r in a:
        sel[r["lang"]] = sel.get(r["lang"], 0) + 1
    # share of the head language shrinks, share of the rarest grows
    assert sel[head] / len(a) < counts[head] / sum(counts.values())
    assert sel[rare] / len(a) > counts[rare] / sum(counts.values()) - 0.01


# ---------------------------------------------------------------------------
# BM25 lexical retrieval
# ---------------------------------------------------------------------------


def test_bm25_ranking_properties(spark):
    import math

    from distributed_vector_database_spark.operators.text_analysis import (
        bm25_search,
    )

    rows = [
        (0, "scan scan scan join"),          # high tf, short
        (1, "scan join " + "pad " * 30),     # hits diluted by length
        (2, "filter"),                        # rare-ish single hit
        (3, "pad pad pad"),                   # no query terms
        (4, "scan join filter"),              # all three terms
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = bm25_search(docs, ["scan", "join", "filter"], k=10).collect()
    ids = [r["doc_id"] for r in res]
    scores = {r["doc_id"]: r["score"] for r in res}
    assert 3 not in ids  # no query term -> never retrieved
    # covering all three terms beats the long diluted doc
    assert scores[4] > scores[1]
    # length normalization: same hits, shorter doc scores higher
    assert scores[0] > scores[1]
    # python reference model (same formula, micro-rounded)
    n, avgdl = 5, sum(len(t.split()) for _, t in rows) / 5
    toks = {i: t.split() for i, t in rows}
    df = {
        q: sum(1 for t in toks.values() if q in t)
        for q in ("scan", "join", "filter")
    }
    for i, t in toks.items():
        mics = 0
        for q in ("scan", "join", "filter"):
            tf = t.count(q)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
            mics += round(s * 1e6)
        if mics:
            assert scores[i] == round(mics / 1e6, 6)


def test_pmi_pairs_hand_computed(spark):
    """4 docs: (a,b) co-occur in 2, a in 3, b in 2 -> pmi = ln(2*4/(3*2))."""
    import math

    from distributed_vector_database_spark.operators.text_analysis import (
        pmi_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b x"),
            (2, "a b y"),
            (3, "a z"),
            (4, "q r"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["t1"], r["t2"]): (r["pair_count"], r["pmi"])
        for r in pmi_pairs(docs, min_pair_count=2).collect()
    }
    assert got[("a", "b")] == (2, round(math.log(2 * 4 / (3 * 2)), 6))
    # duplicate tokens inside one doc count once (document-level presence)
    docs2 = spark.createDataFrame(
        [(1, "a a b b"), (2, "a b")], "doc_id long, text string"
    )
    got2 = {
        (r["t1"], r["t2"]): r["pair_count"]
        for r in pmi_pairs(docs2, min_pair_count=1).collect()
    }
    assert got2[("a", "b")] == 2


def test_bm25_prf_recovers_vocabulary_mismatch(spark):
    """A doc sharing only the feedback docs' vocabulary (none of the
    original query terms) is invisible to pass 1 and retrieved by the
    expanded pass 2."""
    from distributed_vector_database_spark.operators.text_analysis import (
        bm25_prf_search,
        bm25_search,
    )

    rows = [
        (0, "scan join filter exchange shuffle"),
        (1, "scan join exchange exchange shuffle"),
        (2, "scan filter exchange shuffle shuffle"),
        (3, "exchange shuffle exchange shuffle"),   # vocabulary-mismatch doc
        (4, "pad pad pad pad"),                      # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = ["scan", "join", "filter"]
    plain = {r["doc_id"] for r in bm25_search(docs, q, k=10).collect()}
    assert 3 not in plain
    prf = {
        r["doc_id"]
        for r in bm25_prf_search(
            docs, q, k_feedback=3, n_expansion=2, k=10
        ).collect()
    }
    assert 3 in prf          # reached through expansion terms
    assert 4 not in prf      # unrelated doc still invisible


def test_bm25_prf_validation_and_expansion_determinism(spark):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.text_analysis import (
        bm25_prf_search,
    )

    docs = spark.createDataFrame(
        [(0, "scan a b"), (1, "scan b a"), (2, "a b c")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="k_feedback"):
        bm25_prf_search(docs, ["scan"], k_feedback=0)
    with _pytest.raises(ValueError, match="n_expansion"):
        bm25_prf_search(docs, ["scan"], n_expansion=100)
    # tf tie between 'a' and 'b' in the feedback docs -> term ASC wins;
    # two runs must be identical (pure function of the corpus)
    r1 = bm25_prf_search(docs, ["scan"], k_feedback=2, n_expansion=1).collect()
    r2 = bm25_prf_search(docs, ["scan"], k_feedback=2, n_expansion=1).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


# ---------------------------------------------------------------------------
# Near-duplicate decontamination (curation.neardup_contaminated_pairs)
# ---------------------------------------------------------------------------


def test_neardup_decontamination_finds_planted_paraphrase(spark):
    from distributed_vector_database_spark.operators.curation import (
        neardup_contaminated_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    edited = "XX " + base[6:]      # near-dup of base (tiny edit)
    other = "one two three four five six seven eight nine ten " * 4
    train = spark.createDataFrame(
        [(1, edited), (2, other), (3, "lambda mu nu xi omicron pi " * 5)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = neardup_contaminated_pairs(train, ev, threshold=0.5).collect()
    assert [(r["doc_id"], r["eval_doc_id"]) for r in got] == [(1, 100)]
    assert got[0]["jaccard"] >= 0.5


def test_neardup_decontamination_subset_of_exact_verify(spark):
    """Every emitted pair must pass the EXACT Jaccard bar (banding can
    only lose candidates, never admit false ones past the verify)."""
    from distributed_vector_database_spark.operators.curation import (
        neardup_contaminated_pairs,
    )
    from distributed_vector_database_spark.operators.dedup import _shingled

    rows = [(i, f"tok{i} " * 5 + "shared common words here " * 3) for i in range(8)]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "shared common words here " * 3 + "evalish tail")],
        "doc_id long, text string",
    )
    got = neardup_contaminated_pairs(train, ev, threshold=0.3).collect()
    tsh = {
        r["doc_id"]: set(r["shingles"])
        for r in _shingled(train, "text", "doc_id", 3).collect()
    }
    esh = set(
        _shingled(ev, "text", "doc_id", 3).collect()[0]["shingles"]
    )
    for r in got:
        s = tsh[r["doc_id"]]
        j = len(s & esh) / len(s | esh)
        assert round(j, 6) >= 0.3
        assert abs(round(j, 6) - r["jaccard"]) < 1e-9


def test_neardup_decontamination_threshold_validation(spark):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.curation import (
        neardup_contaminated_pairs,
    )

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="threshold"):
        neardup_contaminated_pairs(df, df, threshold=0.0)


def test_ql_dirichlet_matches_python_reference(spark):
    """Dirichlet QL checked doc-by-doc against an independent reference
    (incl. micro rounding); absent terms contribute the smoothed floor."""
    import math

    from distributed_vector_database_spark.operators.text_analysis import (
        ql_dirichlet_search,
    )

    rows = [
        (0, "scan scan join pad"),
        (1, "scan " + "pad " * 20),
        (2, "pad pad pad"),          # no query term: smoothed floor only
        (3, "join filter scan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = ["scan", "join", "filter"]
    mu = 10.0
    got = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_search(docs, q, k=10, mu=mu).collect()
    }
    toks = {i: t.split() for i, t in rows}
    coll = sum(len(t) for t in toks.values())
    cf = {t: sum(d.count(t) for d in toks.values()) for t in q}
    exp = {}
    for i, d in toks.items():
        mics = [
            round(
                math.log(
                    (d.count(t) + mu * (cf[t] / float(coll)))
                    / (len(d) + mu)
                )
                * 1e6
            )
            for t in q
            if cf[t] > 0
        ]
        exp[i] = round(sum(mics) / 1e6, 6)
    assert got == exp
    # every doc scored (even 2, which has no query terms) ...
    assert set(got) == {0, 1, 2, 3}
    # ... and docs carrying the terms outrank the floor-only doc
    assert got[3] > got[2] and got[0] > got[2]


def test_ql_dirichlet_rejects_all_oov_query(spark):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.text_analysis import (
        ql_dirichlet_search,
    )

    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="no query term"):
        ql_dirichlet_search(docs, ["zzz"], k=5)


# ---------------------------------------------------------------------------
# Split leakage audit (curation.split_leakage_audit)
# ---------------------------------------------------------------------------


def _split_of(i: int) -> str:
    import hashlib

    hf = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) / 2**48
    return "train" if hf < 0.8 else ("val" if hf < 0.9 else "test")


def test_split_leakage_audit_flags_cross_split_neardups(spark):
    """A planted near-dup pair straddling train/val must surface as a
    leaked row; a same-split near-dup pair must not be flagged."""
    from distributed_vector_database_spark.operators.curation import (
        split_leakage_audit,
    )

    # deterministically find ids per split (hash_split is key-hash only)
    by_split = {"train": [], "val": [], "test": []}
    i = 0
    while min(len(v) for v in by_split.values()) < 2:
        by_split[_split_of(i)].append(i)
        i += 1
    t1, t2 = by_split["train"][:2]
    v1 = by_split["val"][0]
    base_a = "alpha beta gamma delta epsilon zeta eta theta iota " * 4
    base_b = "one two three four five six seven eight nine ten " * 4
    rows = [
        (t1, base_a),                 # train
        (t2, "XX " + base_a[6:]),     # train near-dup of t1 (same split)
        (v1, "YY " + base_b[4:]),     # val near-dup of test doc below
        (by_split["test"][0], base_b),
        (by_split["test"][1], "unrelated words entirely distinct " * 5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["split_a"], r["split_b"]): (r["n_pairs"], r["leaked"])
        for r in split_leakage_audit(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, threshold=0.5
        ).collect()
    }
    assert got[("train", "train")] == (1, False)
    assert got[("test", "val")] == (1, True)
    assert len(got) == 2  # nothing else pairs


def test_split_leakage_audit_threshold_validation(spark):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.curation import (
        split_leakage_audit,
    )

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="threshold"):
        split_leakage_audit(df, {"train": 1.0}, threshold=1.5)
