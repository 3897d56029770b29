"""Data-quality operators (operators/quality.py)."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.quality import (
    apply_expectations,
    expectations_report,
    write_observed,
)

def _rules():
    return {
        "pos": F.col("v") > 0,
        "named": F.col("name").isNotNull(),
    }


def _df(spark):
    return spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, "b"), (3, 2.0, None), (4, -3.0, None)],
        "id long, v double, name string",
    )


def test_split_partitions_rows_and_names_violations(spark):
    valid, bad = apply_expectations(_df(spark), _rules())
    assert [r["id"] for r in valid.collect()] == [1]
    got = {r["id"]: r["violations"] for r in bad.collect()}
    assert got == {
        2: ["pos"],
        3: ["named"],
        4: ["pos", "named"],  # rule definition order preserved
    }
    assert valid.columns == ["id", "v", "name"]  # original schema


def test_null_rule_result_is_a_violation(spark):
    df = spark.createDataFrame(
        [(1, None)], "id long, v double"
    )
    valid, bad = apply_expectations(df, {"pos": F.col("v") > 0})
    assert valid.count() == 0
    assert bad.head()["violations"] == ["pos"]


def test_report_counts_match_split(spark):
    rep = {
        r["rule"]: (r["n_violations"], r["n_rows"])
        for r in expectations_report(_df(spark), _rules()).collect()
    }
    assert rep == {"pos": (2, 4), "named": (2, 4)}


def test_write_observed_returns_metrics_from_the_write(spark, tmp_path):
    df = _df(spark)
    out = str(tmp_path / "audit")
    m = write_observed(
        df,
        out,
        metrics={
            "n_null_names": F.sum(
                F.when(F.col("name").isNull(), 1).otherwise(0)
            ).cast("long"),
            "v_cents": F.sum(F.round(F.col("v") * 100).cast("long")),
        },
    )
    assert m["n_rows"] == 4
    assert m["n_null_names"] == 2
    assert m["v_cents"] == 300
    back = spark.read.parquet(out)
    assert back.count() == 4


# --- winnowing fingerprints ---------------------------------------------------


def test_winnow_guarantee_shared_run(spark):
    """Two docs sharing a verbatim run of >= k + window - 1 tokens select at
    least one common fingerprint (the winnowing guarantee), and the pair
    surfaces in shared_span_pairs at min_shared=1."""
    from distributed_vector_database_spark.operators.dedup import (
        shared_span_pairs,
    )
    from distributed_vector_database_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    run = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {run} tail one"),
            (2, f"different opening {run} other ending entirely"),
            (3, "no overlap with anything else at all whatsoever today"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=5, window=4)
    by_doc = {
        r["doc_id"]: set()
        for r in docs.select("doc_id").collect()
    }
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fp"
    pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in shared_span_pairs(
            docs, k=5, window=4, max_df=10, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_short_docs(spark):
    """< k tokens -> no fingerprints; between k and k+window-1 tokens ->
    exactly one (the global minimum of the short window)."""
    from distributed_vector_database_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    got = winnow_fingerprints(docs, k=5, window=4).collect()
    per_doc = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(r["fp"])
    assert 1 not in per_doc
    assert len(per_doc[2]) == 1


def test_winnow_max_df_drops_boilerplate(spark):
    """Fingerprints present in more than max_df docs are dropped BEFORE
    the self-join — the df cap that bounds join fan-out at scale. Six
    docs share a boilerplate run whose core fingerprints have df=6: with
    max_df=6 every pair of docs matches (an all-pairs clique); with
    max_df=5 those ubiquitous fps vanish, so only pairs connected by
    rarer boundary-context fingerprints remain (winnowing minima near
    each doc's unique suffix differ per doc, so intermediate-df fps are
    expected — the guarantee is one-sided)."""
    from distributed_vector_database_spark.operators.dedup import (
        shared_span_pairs,
    )

    boiler = "standard legal disclaimer text applies to this document body"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique{i} tail{i}") for i in range(6)],
        "doc_id long, text string",
    )
    clique = shared_span_pairs(
        docs, k=5, window=4, max_df=6, min_shared=1
    )
    assert clique.count() == 15  # all C(6,2) pairs via the df=6 fps
    capped = shared_span_pairs(
        docs, k=5, window=4, max_df=5, min_shared=1
    ).collect()
    assert len(capped) < 15
    # every surviving pair rests on sub-ubiquitous fps only: shared
    # counts must be strictly below the 2 ubiquitous fps' contribution
    survivors = {d for r in capped for d in (r["doc_id_a"], r["doc_id_b"])}
    assert survivors < set(range(6))  # some docs lose ALL their pairs


def test_winnow_arrow_equals_expr(spark):
    """The Arrow kernel and the Catalyst-expression twin select identical
    fingerprint sets (same contract as word_shingles_arrow) — the expr
    form is the oracle-parity reference, the arrow form the hot path."""
    from distributed_vector_database_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    as_set = lambda d: {  # noqa: E731
        (r["doc_id"], r["fp"]) for r in d.collect()
    }
    arrow = winnow_fingerprints(docs, k=5, window=4, impl="arrow")
    expr = winnow_fingerprints(docs, k=5, window=4, impl="expr")
    assert as_set(arrow) == as_set(expr)


def test_longest_shared_run_exact_length(spark):
    """The diagonal gaps-and-islands verification reports the EXACT longest
    shared token run: two docs sharing a 9-token run (and a separate
    6-token run) must report 9, not the sum and not the fingerprint
    count."""
    from distributed_vector_database_spark.operators.dedup import (
        longest_shared_runs,
    )

    run9 = "r1 r2 r3 r4 r5 r6 r7 r8 r9"
    run6 = "s1 s2 s3 s4 s5 s6"
    docs = spark.createDataFrame(
        [
            (1, f"aa bb {run9} cc dd {run6} ee"),
            (2, f"xx {run6} yy zz {run9} ww vv"),
            (3, f"{run9} solo"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["longest_run_tokens"]
        for r in longest_shared_runs(docs, pairs, k=5).collect()
    }
    assert got == {(1, 2): 9, (1, 3): 9}


def test_longest_shared_run_positions(spark):
    """with_positions reports the 0-based token offsets of the longest run
    in each doc — the excision coordinates."""
    from distributed_vector_database_spark.operators.dedup import (
        longest_shared_runs,
    )

    run9 = "r1 r2 r3 r4 r5 r6 r7 r8 r9"
    docs = spark.createDataFrame(
        [
            (1, f"aa bb {run9} cc"),          # run starts at token 2
            (2, f"xx yy zz ww {run9} vv"),    # run starts at token 4
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_id_a long, doc_id_b long")
    row = longest_shared_runs(
        docs, pairs, k=5, with_positions=True
    ).head()
    assert row["longest_run_tokens"] == 9
    assert row["start_a"] == 2 and row["start_b"] == 4


def test_longest_shared_run_dedupes_pairs(spark):
    """Duplicate pair rows and self-pairs in the candidate list must not
    corrupt run lengths (dupes would split the row_number islands)."""
    from distributed_vector_database_spark.operators.dedup import (
        longest_shared_runs,
    )

    run9 = "r1 r2 r3 r4 r5 r6 r7 r8 r9"
    docs = spark.createDataFrame(
        [(1, f"aa {run9} bb"), (2, f"cc {run9} dd")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 1)], "doc_id_a long, doc_id_b long"
    )
    got = longest_shared_runs(docs, pairs, k=5).collect()
    assert len(got) == 1
    assert got[0]["longest_run_tokens"] == 9


def test_excision_via_reported_coordinates_removes_the_dup(spark):
    """Closed loop: find the shared span, CUT it from one document using
    the reported (start_a, longest_run_tokens) coordinates, and the pair
    disappears from a re-run — i.e. the coordinates are exactly right
    for the excision pass they exist to feed."""
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.dedup import (
        longest_shared_runs,
        shared_span_pairs,
    )

    run = " ".join(f"dup{i}" for i in range(12))  # 12-token shared span
    docs = spark.createDataFrame(
        [
            (1, f"uniq1a uniq1b {run} tail1a tail1b tail1c"),
            (2, f"other2a other2b other2c {run} end2a end2b"),
        ],
        "doc_id long, text string",
    )
    pairs = shared_span_pairs(docs, k=5, window=4, max_df=10, min_shared=1)
    loc = longest_shared_runs(
        docs, pairs.select("doc_id_a", "doc_id_b"), k=5, with_positions=True
    ).head()
    assert loc["longest_run_tokens"] == 12

    # excise [start_a, start_a + run_len) from doc 1's token stream
    cut = spark.createDataFrame(
        [(1, loc["start_a"], loc["longest_run_tokens"])],
        "doc_id long, cut_start long, cut_len long",
    )
    toks = F.split(F.col("text"), r"\s+")
    excised = (
        docs.join(cut, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("cut_start").isNotNull(),
                F.concat_ws(
                    " ",
                    F.slice(toks, 1, F.col("cut_start").cast("int")),
                    F.slice(
                        toks,
                        (F.col("cut_start") + F.col("cut_len") + 1).cast(
                            "int"
                        ),
                        F.size(toks),
                    ),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    again = shared_span_pairs(
        excised, k=5, window=4, max_df=10, min_shared=1
    )
    assert again.count() == 0


def test_winnow_oracle_counts_short_doc_fingerprints(spark, tmp_path):
    """ADVICE r5 (medium): the registered DuckDB oracles for
    winnow_shared_span_pairs / shared_span_longest_run bounded the
    fingerprint window list with range(1, greatest(len(gh)-2, 1)), which is
    EMPTY for docs with 1-3 grams (5-7 tokens) — while the Spark impl and
    the documented contract emit the single short-window minimum. Invisible
    at sf0.01 (no short docs), but a short doc's fingerprint counts toward
    df, so it can flip `keep` (max_df) decisions. This corpus makes that
    decisive: two identical 30-token docs share S fingerprints; for all but
    2 of them, nine 5-token excerpt docs (each reproducing exactly that
    fingerprint) push df to 11 > max_df=10, so the fixed oracle AND Spark
    both drop the pair (2 surviving shared fps < min_shared=3) — while the
    pre-fix oracle (short docs invisible, df stays 2) still emits it."""
    import hashlib

    import duckdb

    from distributed_vector_database_spark import queries as q
    from tests.conftest import assert_df_matches_oracle

    toks = [f"w{i:02d}" for i in range(30)]
    text = " ".join(toks)
    gh = [
        hashlib.md5(" ".join(toks[i : i + 5]).encode()).hexdigest()
        for i in range(len(toks) - 4)
    ]
    sel = sorted({min(gh[j : j + 4]) for j in range(len(gh) - 3)})
    assert len(sel) >= 3, "need >=3 shared fps for the pair to exist"
    rows = [(1, text), (2, text)]
    nid = 100
    for fp in sel[:-2]:  # leave exactly 2 fps under the df cap
        i = gh.index(fp)
        excerpt = " ".join(toks[i : i + 5])
        for _ in range(9):
            rows.append((nid, excerpt))
            nid += 1
    docs = spark.createDataFrame(
        [(d, t, "en", "synth", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    fn, sql = q.registry()["winnow_shared_span_pairs"]
    got = fn(spark, sf_dir)
    # the pair is suppressed: only 2 shared fps survive the df cap
    assert got.count() == 0
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    assert_df_matches_oracle(got, con, sql)
    # discrimination: the PRE-fix bound diverges on this corpus
    old_sql = sql.replace(
        "greatest(len(gh)-2, 2)", "greatest(len(gh)-2, 1)"
    )
    assert old_sql != sql
    assert con.sql(old_sql).fetchall() != [], (
        "pre-fix oracle should emit the (1,2) pair — test not discriminating"
    )


def _two_run_docs(spark):
    import random

    rnd = random.Random(7)

    def words(n, tag):
        return [f"{tag}{rnd.randint(0, 10**6)}_{i}" for i in range(n)]

    run_a = " ".join(f"dupA{i}" for i in range(12))  # 12-token shared run
    run_b = " ".join(f"dupB{i}" for i in range(9))  # second, 9-token run
    d1 = " ".join(
        words(30, "x") + [run_a] + words(10, "y") + [run_b]
    )
    d2 = " ".join(
        words(25, "z") + [run_b] + words(15, "w") + [run_a]
    )
    d3 = " ".join(words(40, "q"))
    return spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )


def test_shared_runs_reports_every_run_not_just_longest(spark):
    """A pair sharing TWO distinct long runs: longest_shared_runs sees only
    the 12-token one; shared_runs reports both (the 9-token second run is
    exactly what a longest-only excision pass would leave behind)."""
    from distributed_vector_database_spark.operators.dedup import (
        longest_shared_runs,
        shared_runs,
        shared_span_pairs,
    )

    docs = _two_run_docs(spark)
    pairs = shared_span_pairs(docs, k=5, window=4, max_df=10, min_shared=1)
    longest = longest_shared_runs(docs, pairs, k=5).collect()
    assert {(r["doc_id_a"], r["doc_id_b"], r["longest_run_tokens"])
            for r in longest} == {(1, 2, 12)}
    runs = shared_runs(docs, pairs, k=5).collect()
    assert {(r["doc_id_a"], r["doc_id_b"], r["run_tokens"])
            for r in runs} == {(1, 2, 12), (1, 2, 9)}
    # positions point at the actual runs in both docs
    toks1 = docs.filter("doc_id=1").first()["text"].split()
    toks2 = docs.filter("doc_id=2").first()["text"].split()
    for r in runs:
        a = toks1[r["start_a"] : r["start_a"] + r["run_tokens"]]
        b = toks2[r["start_b"] : r["start_b"] + r["run_tokens"]]
        assert a == b


def test_excise_spans_closed_loop_and_passthrough(spark):
    """Cutting every reported run from the b side: the candidate re-run
    finds nothing, the keeper (a side) and untouched docs are
    byte-identical, and removed token mass equals the cut spans."""
    from distributed_vector_database_spark.operators.dedup import (
        excise_spans,
        shared_runs,
        shared_span_pairs,
    )

    docs = _two_run_docs(spark)
    pairs = shared_span_pairs(docs, k=5, window=4, max_df=10, min_shared=1)
    runs = shared_runs(docs, pairs, k=5)
    cleaned = excise_spans(docs, runs)
    texts0 = {r["doc_id"]: r["text"] for r in docs.collect()}
    texts1 = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert texts1[1] == texts0[1]  # keeper intact
    assert texts1[3] == texts0[3]  # untouched doc intact
    assert len(texts1[2].split()) == len(texts0[2].split()) - 12 - 9
    assert "dupA0" not in texts1[2] and "dupB0" not in texts1[2]
    again = shared_span_pairs(
        cleaned, k=5, window=4, max_df=10, min_shared=1
    )
    assert again.count() == 0
    with __import__("pytest").raises(ValueError, match="side"):
        excise_spans(docs, runs, side="c")


def test_gram_pos_cap_bounds_pathological_pair(spark):
    """VERDICT r5 'what's wrong #3': a pathologically repetitive pair (one
    gram at ~200 positions per doc) would contribute multiplicity^2 match
    rows with no cap. Under gram_pos_cap the verify stays bounded, the
    pair is flagged overflowed, and its reported length is a lower bound;
    a normal pair in the same corpus is exact and unflagged."""
    import pytest

    from distributed_vector_database_spark.operators.dedup import (
        longest_shared_runs,
    )

    patho = " ".join(["rep"] * 200)
    docs = _two_run_docs(spark).unionByName(
        spark.createDataFrame(
            [(4, patho), (5, patho)], "doc_id long, text string"
        )
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in longest_shared_runs(
            docs, pairs, k=5, gram_pos_cap=8, with_overflow_flag=True
        ).collect()
    }
    assert got[(1, 2)]["longest_run_tokens"] == 12
    assert got[(1, 2)]["overflowed"] is False
    assert got[(4, 5)]["overflowed"] is True
    # lower bound under truncation, never above the true 200
    assert 8 <= got[(4, 5)]["longest_run_tokens"] <= 200
    # uncapped remains exact on the pathological pair
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): r["longest_run_tokens"]
        for r in longest_shared_runs(
            docs, pairs, k=5, gram_pos_cap=None
        ).collect()
    }
    assert exact[(4, 5)] == 200
    with pytest.raises(ValueError, match="gram_pos_cap"):
        longest_shared_runs(docs, pairs, k=5, gram_pos_cap=0).collect()
    # with_positions variant carries the flag too
    pos = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in longest_shared_runs(
            docs,
            pairs,
            k=5,
            gram_pos_cap=8,
            with_positions=True,
            with_overflow_flag=True,
        ).collect()
    }
    assert pos[(1, 2)]["start_a"] == 30 and pos[(1, 2)]["overflowed"] is False
    assert pos[(4, 5)]["overflowed"] is True


def test_shared_runs_overflow_flag_keeps_truncated_runs(spark):
    """ADVICE r6: gram_pos_cap truncation can shrink a real run BELOW
    min_run_tokens — the default path would silently drop it from the
    excision set. with_overflow_flag=True (a) adds the overflowed column
    and (b) keeps truncated rows regardless of the floor, so a
    complete-excision caller can detect lower-bound pairs; normal pairs
    are exact and unflagged on both paths."""
    from distributed_vector_database_spark.operators.dedup import (
        shared_runs,
    )

    patho = " ".join(["rep"] * 200)
    docs = _two_run_docs(spark).unionByName(
        spark.createDataFrame(
            [(4, patho), (5, patho)], "doc_id long, text string"
        )
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5)], "doc_id_a long, doc_id_b long"
    )
    # cap=2: the pathological pair's only island is 2 matches -> 6 tokens,
    # under the k+3=8 floor -> the default path drops the pair entirely
    dflt = shared_runs(docs, pairs, k=5, gram_pos_cap=2)
    assert "overflowed" not in dflt.columns
    got_dflt = dflt.collect()
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in got_dflt} == {(1, 2)}
    # flagged path: the truncated pair's lower-bound rows survive, marked
    flagged = shared_runs(
        docs, pairs, k=5, gram_pos_cap=2, with_overflow_flag=True
    ).collect()
    by_pair = {}
    for r in flagged:
        by_pair.setdefault((r["doc_id_a"], r["doc_id_b"]), []).append(r)
    assert (4, 5) in by_pair
    assert all(r["overflowed"] for r in by_pair[(4, 5)])
    assert all(r["run_tokens"] < 8 for r in by_pair[(4, 5)])  # lower bounds
    normal = by_pair[(1, 2)]
    assert {r["run_tokens"] for r in normal} == {12, 9}
    assert all(not r["overflowed"] for r in normal)


def test_winnow_owner_flags_plan_is_partial_agg_not_window(spark):
    """VERDICT r6 item 3: fingerprint ownership must be a partial-
    aggregating groupBy(fp).agg(min) + join-back, NOT a window over the
    fp key — a window forces every row of one hot fingerprint into a
    single task (boilerplate fp shared by millions of docs = straggler).
    Assert the physical plan carries no Window operator and does carry a
    partial min aggregate; and on a hot-fp adversarial fixture (every doc
    shares one boilerplate sentence) results match a brute-force oracle."""
    from distributed_vector_database_spark.operators.dedup import (
        winnow_owner_dup_flags,
    )

    boiler = " ".join(f"boiler{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, boiler + " " + " ".join(f"u{i}_{j}" for j in range(8)))
         for i in range(1, 41)],
        "doc_id long, text string",
    )
    out = winnow_owner_dup_flags(docs, k=5, window=4, min_shared=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "ownership regressed to a window"
    assert "partial_min" in plan or "partial min" in plan.lower()
    flags = {r["doc_id"]: r["is_span_dup"] for r in out.collect()}
    assert flags[1] is False  # lowest id owns the boilerplate fps
    assert all(flags[i] for i in range(2, 41))  # everyone else flagged


def test_minhash_operating_points_exact_dups_and_bounds(spark):
    """VERDICT r7 item 6: identical docs have identical signatures, so
    EVERY (num_hashes, bands) config must catch them (recall 1.0 when
    truth is exactly the identical pairs); counts obey
    n_hits <= min(n_candidates, n_true)."""
    from distributed_vector_database_spark.operators.dedup import (
        minhash_operating_points,
    )

    rows = []
    # 10 exact-dup pairs (J = 1.0, >= 0.5 -> in truth)
    for i in range(10):
        text = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        rows.append((2 * i, text))
        rows.append((2 * i + 1, text))
    # distinct fillers sharing nothing (J = 0 with everything)
    for i in range(20, 40):
        rows.append((i, f"solo{i}a solo{i}b solo{i}c solo{i}d solo{i}e"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_operating_points(
        docs, configs=((8, 2), (8, 4), (16, 4)), threshold=0.5
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_true"] == 10
        assert r["n_hits"] == 10, (r["num_hashes"], r["bands"], r["n_hits"])
        assert r["recall"] == 1.0
        assert r["n_hits"] <= r["n_candidates"]
        assert 0.0 <= r["precision"] <= 1.0


def test_band_buckets_from_sliced_signatures_bit_identical(spark):
    """The shared-signature optimization (VERDICT r8 item 2) must be a
    pure refactor: buckets derived by slicing a 16-hash signature frame
    == buckets from a direct 8-hash run, row for row (hash j is
    seed-indexed, so mh0..mh7 of the wide frame ARE the 8-hash frame)."""
    from distributed_vector_database_spark.operators.dedup import (
        _band_buckets_from_signatures,
        minhash_band_buckets,
        minhash_signatures,
    )

    rows = [
        (i, f"tok{i} tok{i + 1} tok{i + 2} tok{i % 7} shared alpha beta")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wide = minhash_signatures(docs, 16)
    for num_hashes, bands in ((8, 2), (8, 4), (16, 4)):
        direct = minhash_band_buckets(docs, num_hashes, bands)
        sliced = _band_buckets_from_signatures(wide, num_hashes, bands)
        a = sorted(map(tuple, direct.collect()))
        b = sorted(map(tuple, sliced.collect()))
        assert a == b, (num_hashes, bands)


def test_alnum_fingerprint_collapses_reformatted_copies(spark):
    """'Hello, world!' == 'hello world' under the alnum fingerprint but
    NOT under the whitespace-only one; distinct content never collides."""
    from distributed_vector_database_spark.functions.text import (
        doc_fingerprint,
        doc_fingerprint_alnum,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello, world!"),
            (2, "hello   world"),
            (3, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id",
        doc_fingerprint("text").alias("ws"),
        doc_fingerprint_alnum("text").alias("al"),
    ).collect()
    ws = {r["doc_id"]: r["ws"] for r in rows}
    al = {r["doc_id"]: r["al"] for r in rows}
    assert al[1] == al[2] and ws[1] != ws[2]
    assert al[3] not in (al[1],)


def test_novelty_scores_semantics(spark):
    """Novelty = fraction of a doc's distinct 3-grams first seen in it:
    an exact copy of an earlier doc scores 0.0, fully fresh text 1.0,
    and a half-recycled doc the exact 6dp ratio; short docs (<3 tokens)
    are absent."""
    from distributed_vector_database_spark.operators.text_analysis import (
        novelty_scores,
    )

    first = "alpha beta gamma delta epsilon"
    fresh = "zeta eta theta iota kappa"
    # 4 tokens recycled from `first` + 4 fresh ones -> grams mix
    half = "alpha beta gamma delta nu xi omicron pi"
    docs = spark.createDataFrame(
        [(1, first), (2, first), (3, fresh), (4, half), (5, "too short")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in novelty_scores(docs, n=3).collect()}
    assert set(rows) == {1, 2, 3, 4}  # doc 5 has no 3-grams
    assert rows[1]["novelty"] == 1.0
    assert rows[2]["novelty"] == 0.0
    assert rows[3]["novelty"] == 1.0
    r4 = rows[4]
    # grams of doc 4: 6 total; 'alpha beta gamma' and 'beta gamma delta'
    # are owned by doc 1 -> 4 novel of 6
    assert (r4["n_grams"], r4["n_novel"]) == (6, 4)
    assert r4["novelty"] == 0.666667
