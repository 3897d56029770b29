"""Property-based checks (hypothesis) of the vector math kernel against
numpy ground truth, batched through one DataFrame per example set."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from distributed_vector_database_spark.functions.vector import (
    cosine_similarity,
    dot,
    euclidean_distance,
)

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)
vec = st.lists(finite, min_size=4, max_size=4)


@pytest.fixture(scope="module")
def run_pairs(spark):
    def _run(pairs):
        df = spark.createDataFrame(
            [(a, b) for a, b in pairs], "a array<double>, b array<double>"
        )
        return df.select(
            cosine_similarity("a", "b").alias("cos"),
            euclidean_distance("a", "b").alias("euc"),
            dot("a", "b").alias("dot"),
        ).collect()

    return _run


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=8))
def test_matches_numpy(run_pairs, pairs):
    rows = run_pairs(pairs)
    for (a, b), r in zip(pairs, rows):
        na, nb = np.array(a), np.array(b)
        exp_dot = float(np.dot(na, nb))
        exp_euc = float(np.linalg.norm(na - nb))
        norm_a, norm_b = np.linalg.norm(na), np.linalg.norm(nb)
        exp_cos = (
            0.0 if norm_a == 0 or norm_b == 0 else exp_dot / (norm_a * norm_b)
        )
        assert r["dot"] == pytest.approx(exp_dot, rel=1e-9, abs=1e-9)
        assert r["euc"] == pytest.approx(exp_euc, rel=1e-9, abs=1e-9)
        assert r["cos"] == pytest.approx(exp_cos, rel=1e-9, abs=1e-9)
        assert -1.0 - 1e-9 <= r["cos"] <= 1.0 + 1e-9 or (
            norm_a == 0 or norm_b == 0
        )


@settings(max_examples=5, deadline=None)
@given(vec)
def test_self_similarity(run_pairs, v):
    r = run_pairs([(v, v)])[0]
    nrm = math.sqrt(sum(x * x for x in v))
    assert r["euc"] == pytest.approx(0.0, abs=1e-9)
    if nrm > 1e-6:
        assert r["cos"] == pytest.approx(1.0, rel=1e-6)
    else:
        # zero (or denormal-tiny) vectors take the guard path
        assert r["cos"] == pytest.approx(r["cos"], abs=2.0)


_mrow = st.tuples(
    st.integers(min_value=0, max_value=15),          # key
    st.sampled_from(["a", "b", "DEL"]),              # tag
    st.integers(min_value=-100, max_value=100),      # val
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_mrow, min_size=0, max_size=12, unique_by=lambda r: r[0]),
    st.lists(_mrow, min_size=0, max_size=12, unique_by=lambda r: r[0]),
)
def test_merge_into_matches_reference_model(spark, base_rows, src_rows):
    """merge_into == a dict-based reference merge for arbitrary unique-key
    base/source tables: matched+DEL deletes, matched updates tag only,
    unmatched source inserts, unmatched base passes through."""
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.merge import merge_into

    schema = "id long, tag string, val long"
    base = spark.createDataFrame(base_rows, schema) if base_rows else (
        spark.createDataFrame([], schema)
    )
    src = spark.createDataFrame(src_rows, schema) if src_rows else (
        spark.createDataFrame([], schema)
    )
    got = {
        r["id"]: (r["tag"], r["val"])
        for r in merge_into(
            base,
            src,
            on="id",
            update_cols=["tag"],
            delete_condition=F.col("tag") == "DEL",
        ).collect()
    }

    model = {k: (t, v) for k, t, v in base_rows}
    for k, t, v in src_rows:
        if k in model:
            if t == "DEL":
                del model[k]
            else:
                model[k] = (t, model[k][1])  # tag updated, val kept
        else:
            model[k] = (t, v)                # insert (even tag == DEL)
    assert got == model


@settings(max_examples=8, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_sq8_roundtrip_error_bounded(spark, vecs):
    """For ANY float corpus (incl. constant and negative dims):
    |x - dequant(encode(x))| <= scale_d/2 elementwise, and constant
    dimensions reconstruct exactly."""
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.sq import (
        fit_sq_bounds,
        sq_dequantize_col,
        sq_encode_col,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    bounds = fit_sq_bounds(df)
    deq = sq_dequantize_col(sq_encode_col("embedding", bounds), bounds)
    rows = df.select(
        F.col("embedding"), deq.alias("deq")
    ).collect()
    half = [
        ((hi - lo) / 255.0) / 2.0 if hi > lo else 0.0 for lo, hi in bounds
    ]
    for r in rows:
        for d, (x, y) in enumerate(zip(r["embedding"], r["deq"])):
            assert abs(x - y) <= half[d] + 1e-9 * max(1.0, abs(x))


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_triangle_stats_matches_bruteforce(spark, edges):
    """Degree-oriented census == O(n^3) brute force on arbitrary small
    graphs (self-loops and duplicate/reversed edges included)."""
    from distributed_vector_database_spark.operators.graph import (
        triangle_stats,
    )

    und = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    if not und:
        return  # operator contract: edge list with no proper edges
    nodes = sorted({n for e in und for n in e})
    tri = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            for c in nodes[nodes.index(b) + 1 :]:
                if (
                    (a, b) in und
                    and (b, c) in und
                    and (a, c) in und
                ):
                    tri += 1
    df = spark.createDataFrame(list(edges), "src long, dst long")
    r = triangle_stats(df).head()
    assert r["n_triangles"] == tri
    assert r["n_edges"] == len(und)
    assert r["n_nodes"] == len(nodes)


# --- sketch invariants (round 5) --------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=200
    )
)
def test_cms_never_underestimates_property(spark, keys):
    """For ANY key multiset, every CMS point estimate >= the true count
    (width 8 forces heavy collisions; the md5 hash is deterministic, so
    hypothesis explores multisets, not hash luck)."""
    from collections import Counter

    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_lookup,
    )

    truth = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    sk = cms_build(df, "key", depth=3, width=8)
    got = {
        r["key"]: r["cms_count"]
        for r in cms_lookup(
            sk, df.select("key").distinct(), "key", depth=3, width=8
        ).collect()
    }
    assert set(got) == set(truth)
    assert all(got[k] >= truth[k] for k in truth)


@settings(max_examples=6, deadline=None)
@given(
    st.integers(min_value=0, max_value=30),   # tokens before the run in A
    st.integers(min_value=0, max_value=30),   # tokens before the run in B
    st.integers(min_value=8, max_value=20),   # shared run length (>= k+w-1)
    st.randoms(use_true_random=False),
)
def test_winnow_guarantee_property(spark, pre_a, pre_b, run_len, rnd):
    """Winnowing guarantee, property form: whatever surrounds it, a shared
    verbatim run of >= k + window - 1 tokens always selects at least one
    common fingerprint (k=5, window=4)."""
    from distributed_vector_database_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    run = " ".join(f"run{i}" for i in range(run_len))
    noise = lambda n, tag: " ".join(  # noqa: E731
        f"{tag}{rnd.randrange(10**6)}" for _ in range(n)
    )
    docs = spark.createDataFrame(
        [
            (1, f"{noise(pre_a, 'a')} {run} {noise(3, 'za')}".strip()),
            (2, f"{noise(pre_b, 'b')} {run} {noise(5, 'zb')}".strip()),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=5, window=4)
    by_doc = {1: set(), 2: set()}
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2]


@settings(max_examples=15, deadline=None)
@given(
    n_tokens=st.integers(min_value=1, max_value=40),
    raw_spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),
            st.integers(min_value=1, max_value=12),
        ),
        min_size=0,
        max_size=4,
    ),
)
def test_excise_spans_matches_python_reference(spark, n_tokens, raw_spans):
    """excise_spans' indexed-HOF interval cut == an independent Python
    token slice for arbitrary (possibly overlapping, possibly
    past-the-end) span sets; docs without spans pass through untouched."""
    from distributed_vector_database_spark.operators.dedup import (
        excise_spans,
    )

    toks = [f"w{i}" for i in range(n_tokens)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "untouched doc text")],
        "doc_id long, text string",
    )
    runs = spark.createDataFrame(
        [(0, 1, ln, 0, s) for s, ln in raw_spans],
        "doc_id_a long, doc_id_b long, run_tokens long, "
        "start_a long, start_b long",
    )
    got = {r["doc_id"]: r["text"] for r in excise_spans(docs, runs).collect()}
    cut = set()
    for s, ln in raw_spans:
        cut |= set(range(s, s + ln))
    expect = " ".join(t for i, t in enumerate(toks) if i not in cut)
    assert got[1] == expect
    assert got[2] == "untouched doc text"


tok_word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(
    toks=st.lists(tok_word, min_size=1, max_size=120),
    prefix=st.lists(tok_word, min_size=0, max_size=5),
)
def test_cdc_chunks_reconstruct_and_resync_property(spark, toks, prefix):
    """For ANY token list: CDC chunks tile the doc exactly, and a
    prefix insertion preserves every chunk after the first boundary
    (shift resistance — the content-defined contract)."""
    from collections import Counter

    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    base = " ".join(toks)
    edited = " ".join(prefix + toks)
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    rows = cdc_chunk_documents(docs, mask_bits=2).collect()
    ch1 = sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_ix"]
    )
    # lossless tiling
    assert " ".join(r["chunk_text"] for r in ch1) == base
    assert sum(r["n_chunk_tokens"] for r in ch1) == len(toks)
    # shift resistance: doc2 = prefix ++ toks. Every chunk of doc1 that
    # starts AFTER doc1's first boundary must also be a chunk of doc2
    # (boundaries depend only on local content, so they re-align once
    # past the edit region).
    if len(ch1) > 1:
        tail1 = Counter(r["chunk_hash"] for r in ch1[1:])
        ch2 = Counter(
            r["chunk_hash"] for r in rows if r["doc_id"] == 2
        )
        assert tail1 & ch2 == tail1, "a post-boundary chunk lost identity"


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300
    ),
    pivot=st.integers(min_value=0, max_value=10_000),
)
def test_hll_split_merge_and_duplicate_invariance_property(
    spark, keys, pivot
):
    """For ANY key multiset and ANY 2-way split: registers of the merge
    equal registers of the whole; duplicating the input changes nothing
    (the max-absorption that makes the streaming twin append-safe)."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_merge,
    )

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    lo = df.filter(F.col("k") <= pivot)
    hi = df.filter(F.col("k") > pivot)

    def as_set(s):
        return {tuple(r) for r in s.collect()}

    whole = as_set(hll_build(df, "k", p=5))
    parts = [p for p in (lo, hi) if p.count() > 0]
    merged = as_set(hll_merge(*[hll_build(p, "k", p=5) for p in parts]))
    assert merged == whole
    doubled = as_set(hll_build(df.unionByName(df), "k", p=5))
    assert doubled == whole


def test_novelty_scores_match_python_reference(spark):
    """Property: novelty_scores == a brute-force python reference on a
    randomized corpus (distinct 3-grams; owner = min doc id; exact
    half-away 6dp ratio)."""
    import random

    from distributed_vector_database_spark.operators.text_analysis import (
        novelty_scores,
    )

    rng = random.Random(97)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for d in range(60)
    ]

    def grams(text):
        t = [x for x in text.split() if x]
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    owner = {}
    for d, text in rows:
        for g in grams(text):
            owner.setdefault(g, d)  # rows are id-ordered
    expected = {}
    for d, text in rows:
        gs = grams(text)
        if not gs:
            continue
        novel = sum(1 for g in gs if owner[g] == d)
        ratio = (2 * 10**6 * novel + len(gs)) // (2 * len(gs)) / 1e6
        expected[d] = (len(gs), novel, ratio)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in novelty_scores(df, n=3).collect()
    }
    assert got == expected


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=400), min_size=1, max_size=8
    )
)
def test_dhash_arrow_kernel_matches_python_reference(spark, payloads):
    """The Arrow mapInPandas dHash (cumsum + cross-multiplied mean
    comparisons over numpy int64) must agree bit-for-bit with the pure
    python reference on ARBITRARY payloads — empty, shorter than the 65
    spans, and longer — pinning the floor-boundary arithmetic both
    implementations share. min_bytes=0 exercises the full range; at the
    default guard (65, ADVICE r9) sub-65-byte payloads must be NULL."""
    from distributed_vector_database_spark.sources.multimodal import (
        dhash_bits,
        dhash_fingerprints,
    )

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, content binary",
    )
    got = {
        r["doc_id"]: r["dhash"]
        for r in dhash_fingerprints(df, min_bytes=0).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == f"{dhash_bits(p):016x}", (i, len(p))
    guarded = {
        r["doc_id"]: r["dhash"] for r in dhash_fingerprints(df).collect()
    }
    for i, p in enumerate(payloads):
        exp = None if len(p) < 65 else f"{dhash_bits(p):016x}"
        assert guarded[i] == exp, (i, len(p))
