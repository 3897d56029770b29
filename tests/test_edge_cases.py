"""Edge-case probes: zero vectors, k > corpus, empty inputs, tiny corpora."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.topk import topk, batch_topk
from distributed_vector_database_spark.operators.dedup import (
    embedding_neardup_pairs,
    jaccard_pairs_prefix,
)
from tests.conftest import SF_SMOKE


def test_zero_query_vector_scores_zero(spark):
    """The reference's zero-norm guard: cosine with a zero query is 0.0
    for every row (reference: src/compute_server.py:36-37)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    dim = len(emb.head()["embedding"])
    rows = topk(emb, [0.0] * dim, k=7).collect()
    assert len(rows) == 7
    assert all(r["score"] == 0.0 for r in rows)
    # ties on score=0 resolve by id ASC -> deterministic
    assert [r["vec_id"] for r in rows] == sorted(r["vec_id"] for r in rows)


def test_k_larger_than_corpus(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(6)
    q = [float(x) for x in emb.head()["embedding"]]
    assert topk(emb, q, k=100).count() == 6
    queries = spark.createDataFrame(
        [(0, q)], "query_id long, query_vector array<double>"
    )
    assert batch_topk(emb, queries, k=100).count() == 6


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert topk(empty, [1.0, 0.0], k=5).count() == 0
    assert embedding_neardup_pairs(empty, threshold=0.5).count() == 0


def test_single_doc_no_pairs(spark):
    one = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    assert jaccard_pairs_prefix(one, threshold=0.1).count() == 0


def test_docs_shorter_than_shingle_width(spark):
    """Docs with < n tokens produce no shingles and never crash or pair."""
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "x")], "doc_id long, text string"
    )
    assert jaccard_pairs_prefix(docs, threshold=0.5, n=3).count() == 0


def test_identical_docs_jaccard_one(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    rows = jaccard_pairs_prefix(docs, threshold=0.99, n=3).collect()
    assert [(r["doc_id_a"], r["doc_id_b"], r["jaccard"]) for r in rows] == [
        (1, 2, 1.0)
    ]


# ---------------------------------------------------------------------------
# salted_join (operators/skew.py)
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    from distributed_vector_database_spark.operators.skew import salted_join
    from pyspark.sql import functions as F

    # hot key: 900 of 1000 rows share key=7
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("rid"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    for how in ("inner", "left"):
        got = sorted(
            tuple(r)
            for r in salted_join(big, dim, "k", buckets=4, how=how).collect()
        )
        exp = sorted(tuple(r) for r in big.join(dim, "k", how).collect())
        assert got == exp, how


def test_salted_join_spreads_hot_key_and_rejects_bad_how(spark):
    from distributed_vector_database_spark.operators.skew import salted_join
    from pyspark.sql import functions as F
    import pytest as _pt

    big = spark.range(400).select(F.lit(1).alias("k"), F.col("id").alias("rid"))
    dim = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    # the internal salt must take >1 distinct value for a single hot key
    salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.struct(*big.columns)), F.lit(8)).cast("int"),
    )
    assert salted.select("_salt").distinct().count() > 1
    with _pt.raises(ValueError):
        salted_join(big, dim, "k", how="full")


def test_hash_split_is_exhaustive_stable_and_validates(spark):
    from distributed_vector_database_spark.operators.sketch import hash_split
    from pyspark.sql import functions as F
    import pytest as _pt

    df = spark.range(2000).select(F.col("id").alias("k"))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = hash_split(df, "k", fr)
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # exhaustive, no row lost
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stable: identical assignment on re-run
    s2 = {r["k"]: r["split"] for r in hash_split(df, "k", fr).collect()}
    for r in s1.collect():
        assert s2[r["k"]] == r["split"]
    with _pt.raises(ValueError):
        hash_split(df, "k", {"a": 0.5, "b": 0.2})


def test_repeated_spans_multiplicity_and_short_docs(spark):
    """Span stats count OCCURRENCES (not distinct per doc); sub-span-width
    docs are absent; a span repeated only WITHIN one doc is not flagged."""
    from distributed_vector_database_spark.operators.dedup import (
        doc_repeated_span_stats,
        repeated_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h tail one"),
            (2, "a b c d e f g h tail two"),       # shares the first span
            (3, "x y z x y z x y z x y z x y z"),  # self-repeats only
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    spans = repeated_spans(docs, span_tokens=8).collect()
    assert all(r["n_docs"] >= 2 for r in spans)
    assert {r["rep_doc_id"] for r in spans} == {1}  # only the 1-2 overlap
    stats = {r["doc_id"]: r for r in
             doc_repeated_span_stats(docs, span_tokens=8).collect()}
    assert 4 not in stats            # shorter than the span width
    assert stats[3]["n_shared"] == 0  # within-doc repeats don't count
    assert stats[1]["n_shared"] >= 1 and stats[2]["n_shared"] >= 1
    assert stats[1]["n_spans"] == 3  # 10 tokens -> 3 span positions


def test_paragraph_blocks_partial_tail_and_empty(spark):
    """Blocks are non-overlapping with the trailing partial kept; empty
    docs yield no blocks; within-doc repeats are not 'recycled'."""
    from distributed_vector_database_spark.operators.dedup import (
        duplicate_paragraphs,
        paragraph_blocks,
        paragraph_dedup_stats,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # blocks(2): "a b","c d","e"
            (2, "a b c d x"),          # shares "a b","c d"
            (3, "p q p q"),            # self-repeat only -> not recycled
            (4, ""),                   # no tokens -> absent
        ],
        "doc_id long, text string",
    )
    blocks = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", paragraph_blocks("text", 2).alias("b")
        ).collect()
    }
    assert blocks[1] == ["a b", "c d", "e"]
    assert blocks[3] == ["p q", "p q"]
    assert blocks[4] == []

    stats = {
        r["doc_id"]: r
        for r in paragraph_dedup_stats(docs, block_tokens=2).collect()
    }
    assert 4 not in stats
    assert stats[1]["n_recycled"] == 2 and stats[1]["n_blocks"] == 3
    assert stats[2]["n_recycled"] == 2
    assert stats[3]["n_recycled"] == 0  # within-doc repeat, 1 distinct doc
    assert abs(stats[1]["recycled_frac"] - round(2 / 3, 6)) < 1e-9

    dup = duplicate_paragraphs(docs, block_tokens=2).collect()
    assert {r["rep_doc_id"] for r in dup} == {1}
    assert all(r["n_docs"] == 2 for r in dup)


def test_rrf_fuse_weights_and_missing_ids(spark):
    """RRF: ids missing from an arm contribute nothing for it; weights
    scale per arm; single-arm fusion reproduces 1/(k+rank)."""
    from distributed_vector_database_spark.operators.fusion import (
        ranked,
        rrf_fuse,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([a, b], k=60).collect()
    }
    assert abs(got[2] - round(1 / 62 + 1 / 61, 6)) < 1e-9  # both arms
    assert abs(got[1] - round(1 / 61, 6)) < 1e-9           # arm a only
    assert abs(got[4] - round(1 / 62, 6)) < 1e-9           # arm b only
    w = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([a, b], k=60, weights=[2.0, 0.5]).collect()
    }
    assert abs(w[2] - round(2 / 62 + 0.5 / 61, 6)) < 1e-9

    scored = spark.createDataFrame(
        [(10, 0.9), (11, 0.9), (12, 0.5)], "doc_id long, score double"
    )
    rk = {r["doc_id"]: r["rank"] for r in ranked(scored).collect()}
    assert rk == {10: 1, 11: 2, 12: 3}  # tie broken by id
    asc = {
        r["doc_id"]: r["rank"]
        for r in ranked(scored, ascending=True, top_n=2).collect()
    }
    assert asc == {12: 1, 10: 2}  # distances: smaller is better


def test_simhash_pairs_pigeonhole_and_exactness(spark):
    """Band blocking must find every pair within max_hamming (pigeonhole:
    4 bands cover <= 3 flips) and the reported hamming must equal the
    true bit distance of the fingerprints."""
    from distributed_vector_database_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_neardup_pairs,
    )
    import pytest as _pytest

    # identical docs -> hamming 0; near-identical (one token swapped)
    # -> small hamming; unrelated -> large
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                  # exact dup
            (3, base.replace("zeta", "zetaX", 1)),      # near dup
            (4, "totally different words entirely here" * 5),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    # verify reported hamming against fingerprints directly
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs).collect()
    }

    def true_ham(a, b):
        return bin(int(fps[a], 16) ^ int(fps[b], 16)).count("1")

    for (a, b), h in pairs.items():
        assert h == true_ham(a, b)
    assert (1, 4) not in pairs and (2, 4) not in pairs
    # blocking exactness precondition is enforced
    with _pytest.raises(ValueError):
        simhash_neardup_pairs(docs, max_hamming=5, bands=4)


def test_merge_into_three_way_semantics(spark):
    """MERGE: matched+delete drops, matched updates listed cols only,
    unmatched-source inserts, unmatched-base passes through; duplicate
    source keys raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.merge import merge_into

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, tag string, val long",
    )
    src = spark.createDataFrame(
        [(2, "B", 99), (3, "DEL", 0), (4, "d", 40)],
        "id long, tag string, val long",
    )
    got = {
        r["id"]: (r["tag"], r["val"])
        for r in merge_into(
            base,
            src,
            on="id",
            update_cols=["tag"],  # val NOT updated on match
            delete_condition=F.col("tag") == "DEL",
        ).collect()
    }
    assert got == {
        1: ("a", 10),    # base-only: untouched
        2: ("B", 20),    # matched: tag updated, val kept
        4: ("d", 40),    # source-only: inserted
    }                    # 3: matched + delete -> gone
    # insert=False drops source-only rows
    no_ins = merge_into(base, src, on="id", insert=False)
    assert {r["id"] for r in no_ins.collect()} == {1, 2, 3}
    with _pytest.raises(ValueError):
        merge_into(
            base,
            spark.createDataFrame(
                [(2, "x", 1), (2, "y", 2)], "id long, tag string, val long"
            ),
            on="id",
        )
    with _pytest.raises(ValueError):
        merge_into(base, src.drop("val"), on="id")


# ---------------------------------------------------------------------------
# Late interaction (MaxSim)
# ---------------------------------------------------------------------------


def test_late_interaction_maxsim_semantics(spark):
    from distributed_vector_database_spark.operators.fusion import (
        late_interaction_topk,
    )

    # doc 1: one chunk perfectly matching q0, one orthogonal
    # doc 2: two chunks weakly matching q0 (max, not sum, must win)
    # doc 3: matches q1 only
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0]),
        (2, [1.0, 1.0, 0.0]),
        (2, [1.0, 2.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    units = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>"
    )
    q0, q1 = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    res = late_interaction_topk(units, [q0, q1], k=10).collect()
    scores = {r["doc_id"]: r["score"] for r in res}
    # doc1: max cos vs q0 = 1.0; vs q1 = 0.0 -> 1.0
    assert scores[1] == 1.0
    # doc2: max over chunks, NOT sum: cos([1,1],q0)=.707107, cos([1,2],q0)=.447214
    # vs q0 -> 0.707107 ; vs q1 -> max(.707107, .894427) = .894427
    assert scores[2] == round(0.707107 + 0.894427, 6)
    # doc3: 0 + 1.0
    assert scores[3] == 1.0
    # ordering: score desc then doc_id asc (docs 1 and 3 tie at 1.0)
    assert [r["doc_id"] for r in res] == [2, 1, 3]


def test_late_interaction_groups_before_topk(spark, embeddings):
    """Every doc appears at most once, and k bounds the output."""
    from distributed_vector_database_spark.operators.fusion import (
        late_interaction_topk,
    )

    units = embeddings.select(
        (F.col("vec_id") % 7).alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    q = [float(x) for x in embeddings.head()["embedding"]]
    res = late_interaction_topk(units, [q, q], k=5).collect()
    ids = [r["doc_id"] for r in res]
    assert len(ids) == len(set(ids)) == 5
