"""chunk_documents: window contract, stable keys, edge docs."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.chunking import (
    chunk_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_tail(spark):
    # 10 tokens, chunk 4, overlap 2 -> stride 2 -> starts 1,3,5,7,9
    text = " ".join(f"t{i}" for i in range(1, 11))
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=4, overlap_tokens=2
    ).orderBy("chunk_ix").collect()
    assert [r["start_token"] for r in out] == [1, 3, 5, 7, 9]
    assert [r["chunk_ix"] for r in out] == [0, 1, 2, 3, 4]
    assert out[0]["chunk_text"] == "t1 t2 t3 t4"
    assert out[-1]["chunk_text"] == "t9 t10"  # short tail kept
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 4, 2]


def test_consecutive_chunks_overlap_exactly(spark):
    text = " ".join(f"w{i}" for i in range(1, 31))
    out = chunk_documents(
        _docs(spark, [(7, text)]), chunk_tokens=8, overlap_tokens=3
    ).orderBy("chunk_ix").collect()
    for a, b in zip(out, out[1:]):
        ta, tb = a["chunk_text"].split(), b["chunk_text"].split()
        if len(ta) == 8:
            assert ta[-3:] == tb[:3]  # the overlap region is shared


def test_empty_and_short_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, "   "), (3, "only three tokens")]),
        chunk_tokens=16,
        overlap_tokens=4,
    ).collect()
    # empty/whitespace docs vanish; a short doc yields ONE short chunk
    assert [(r["doc_id"], r["chunk_ix"]) for r in out] == [(3, 0)]
    assert out[0]["chunk_text"] == "only three tokens"
    assert out[0]["n_chunk_tokens"] == 3


def test_rechunk_is_idempotent_key(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = chunk_documents(docs).select("doc_id", "chunk_ix", "chunk_text")
    b = chunk_documents(docs).select("doc_id", "chunk_ix", "chunk_text")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # (doc_id, chunk_ix) is unique
    dup = (
        a.groupBy("doc_id", "chunk_ix").count().filter(F.col("count") > 1)
    )
    assert dup.isEmpty()


def test_bad_params_raise(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a b")]), chunk_tokens=4,
                        overlap_tokens=4)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a b")]), chunk_tokens=4,
                        overlap_tokens=-1)


def test_chunks_cover_every_token(spark):
    """Union of [start, start+len) windows covers 1..n with no gaps."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    rows = (
        chunk_documents(docs, chunk_tokens=12, overlap_tokens=5)
        .groupBy("doc_id")
        .agg(
            F.max(F.col("start_token") + F.col("n_chunk_tokens") - 1).alias(
                "covered_to"
            ),
            F.min("start_token").alias("first_start"),
            F.max(F.col("start_token")).alias("last_start"),
        )
        .collect()
    )
    from distributed_vector_database_spark.functions.text import tokens

    n_tok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tokens("text")).alias("n")
        ).collect()
    }
    for r in rows:
        assert r["first_start"] == 1
        assert r["covered_to"] == n_tok[r["doc_id"]]
        # stride 7: last start within one stride of the end
        assert r["last_start"] > n_tok[r["doc_id"]] - 7


def test_cdc_chunks_reconstruct_and_expected_length(spark):
    """Chunks tile the doc exactly (concatenation round-trips) and the
    mean chunk length sits near 2^mask_bits tokens."""
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    base = " ".join(f"tok{i % 97}x{i % 13}" for i in range(300))
    docs = spark.createDataFrame([(1, base)], "doc_id long, text string")
    ch = sorted(
        cdc_chunk_documents(docs, mask_bits=4).collect(),
        key=lambda r: r["chunk_ix"],
    )
    assert " ".join(r["chunk_text"] for r in ch) == base
    assert sum(r["n_chunk_tokens"] for r in ch) == 300
    mean = 300 / len(ch)
    assert 4 <= mean <= 64  # 2^4 expected, generous band
    # start/length bookkeeping is consistent
    pos = 1
    for r in ch:
        assert r["start_token"] == pos
        pos += r["n_chunk_tokens"]


def test_cdc_shift_resistance_beats_fixed_window(spark):
    """THE content-defined property (LBFS): a 2-token prepend perturbs
    only the chunk it lands in — boundaries resynchronize and every
    later chunk keeps its hash. The fixed-window chunker loses (almost)
    all chunk identities under the same edit."""
    from collections import Counter

    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
        chunk_documents,
    )

    base = " ".join(f"tok{i % 97}x{i % 13}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, base), (2, "ins0 ins1 " + base)], "doc_id long, text string"
    )
    ch = cdc_chunk_documents(docs, mask_bits=4).collect()
    c1 = Counter(r["chunk_hash"] for r in ch if r["doc_id"] == 1)
    c2 = Counter(r["chunk_hash"] for r in ch if r["doc_id"] == 2)
    n1 = sum(c1.values())
    shared_cdc = sum((c1 & c2).values())
    assert shared_cdc >= n1 - 2  # at most the first chunk(s) perturbed

    fx = chunk_documents(docs, chunk_tokens=16, overlap_tokens=0)
    rows = fx.collect()
    f1 = Counter(r["chunk_text"] for r in rows if r["doc_id"] == 1)
    f2 = Counter(r["chunk_text"] for r in rows if r["doc_id"] == 2)
    shared_fixed = sum((f1 & f2).values())
    assert shared_fixed <= 2  # every window shifted by the prepend
    assert shared_cdc > shared_fixed


def test_cdc_mask_bits_guard_and_empty_docs(spark):
    import pytest

    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   ")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="mask_bits"):
        cdc_chunk_documents(docs, mask_bits=0)
    out = cdc_chunk_documents(docs, mask_bits=2).collect()
    assert {r["doc_id"] for r in out} == {1}  # zero-token doc absent


def test_cdc_shared_chunk_pairs_semantics(spark):
    """A doc containing a verbatim block of another pairs with it at
    containment 1.0 when the smaller doc's chunks are a subset; unrelated
    docs never pair; a chunk shared by > max_df docs is dropped before
    the self-join (bounded-block discipline)."""
    from distributed_vector_database_spark.operators.dedup import (
        cdc_shared_chunk_pairs,
    )

    base = " ".join(f"tok{i % 97}x{i % 13}" for i in range(200))
    rows = [
        (1, base),
        (2, base + " tail0 tail1 tail2"),   # superset of doc 1's content
        (3, "solo3a solo3b solo3c solo3d"),  # unrelated
    ]
    # 12 docs all sharing one boilerplate block -> its chunks exceed
    # max_df=10 and must NOT fan out into pairs
    boiler = " ".join(f"bp{i}" for i in range(40))
    rows += [(10 + i, boiler) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in cdc_shared_chunk_pairs(
            docs, mask_bits=4, max_df=10
        ).collect()
    }
    assert (1, 2) in out
    r = out[(1, 2)]
    # doc 1's chunk set is contained in doc 2's (the suffix can only
    # perturb doc 2's LAST chunk, which doc 1 may or may not share)
    assert r["containment"] >= 0.9
    assert all(3 not in p for p in out)
    assert not any(a >= 10 or b >= 10 for a, b in out), (
        "df-capped boilerplate chunks fanned out into pairs"
    )


def test_cdc_chunk_search_index_survives_edits(spark):
    """The retrieval composition (VERDICT r8 item 7): hash-embedding CDC
    chunks gives an index whose (chunk_hash -> embedding) entries are
    edit-stable — after inserting a passage into one doc, the embeddings
    of every resynchronized chunk are IDENTICAL, so an incremental index
    maintains only the perturbed chunk(s)."""
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )

    base = " ".join(f"w{i}" for i in range(160))
    edited = "inserted passage here " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    ch = cdc_chunk_documents(docs, mask_bits=4)
    emb = hashing_embed(
        ch.select(
            F.concat_ws("#", "doc_id", "chunk_hash").alias("k"),
            "chunk_text",
            "chunk_hash",
        ),
        dim=64,
        normalize=False,
        text_col="chunk_text",
        id_col="k",
    )
    # join the two docs' indexes on chunk_hash: shared hashes must carry
    # bit-identical embeddings (same content -> same vector)
    rows = ch.collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    shared = h1 & h2
    assert len(shared) >= len(h1) - 2  # boundaries resynchronize
    by_key = {}
    for r in emb.collect():
        doc, h = r["k"].split("#")
        by_key.setdefault(h, {})[doc] = list(r["embedding"])
    for h in shared:
        assert by_key[h]["1"] == by_key[h]["2"]


def test_cdc_chunk_ivf_full_probe_equals_brute_force(spark):
    """The §5.3 exactness invariant at chunk granularity: probing ALL
    shards of the chunk index returns exactly the unpruned top-k."""
    from distributed_vector_database_spark.functions.embed import (
        hashing_embed,
    )
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )
    from distributed_vector_database_spark.operators.ivf import (
        assign_shards,
        nearest_shards,
    )
    from distributed_vector_database_spark.operators.topk import topk

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    ch = cdc_chunk_documents(docs, mask_bits=4).select(
        (F.col("doc_id") * 65536 + F.col("chunk_ix")).alias("chunk_key"),
        "chunk_text",
    )
    dense = hashing_embed(
        ch, dim=32, normalize=False, text_col="chunk_text",
        id_col="chunk_key",
    ).withColumnRenamed("chunk_key", "vec_id").cache()
    cents = [
        [float(x) for x in r[0]]
        for r in dense.orderBy("vec_id").select("embedding").limit(4).collect()
    ]
    qv = [
        float(x)
        for x in hashing_embed(
            docs.filter(F.col("doc_id") == 1), dim=32, normalize=False
        ).head()["embedding"]
    ]
    shards = nearest_shards(qv, cents, nprobe=4)
    pruned = topk(
        assign_shards(dense, cents).filter(F.col("shard_id").isin(shards)),
        qv, k=10, metric="cosine",
    )
    brute = topk(dense, qv, k=10, metric="cosine")
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, brute.collect())
    )
