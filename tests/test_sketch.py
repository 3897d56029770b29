"""KMV sketch and hash-sampling unit fixtures."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.sketch import (
    hash_fraction,
    hash_sample,
    kmv_distinct,
)


def test_kmv_exact_below_k(spark):
    """Groups with <= k distinct keys report the EXACT distinct count."""
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(30)],
        "g string, key long",
    )
    got = {
        r["g"]: r["kmv_distinct"]
        for r in kmv_distinct(df, "key", group_cols=["g"], k=64).collect()
    }
    assert got == {"a": 7, "b": 3}


def test_kmv_estimates_above_k(spark):
    """Above k the estimate is approximate but within the ~1/sqrt(k) band."""
    n = 2000
    df = spark.createDataFrame([(i,) for i in range(n)], "key long")
    est = kmv_distinct(df, "key", k=64).head()["kmv_distinct"]
    assert abs(est - n) / n < 0.5  # 64-hash sketch: loose but sane band
    # deterministic: re-run gives the identical estimate
    est2 = kmv_distinct(df, "key", k=64).head()["kmv_distinct"]
    assert est == est2


def test_hash_fraction_range_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "key long")
    rows = df.select(hash_fraction("key").alias("h")).collect()
    assert all(0.0 <= r["h"] < 1.0 for r in rows)
    frac = df.filter(hash_fraction("key") < 0.2).count() / 500
    assert 0.1 < frac < 0.3  # roughly uniform


def test_hash_sample_stable_across_tables(spark):
    """The same key samples identically wherever it appears (join-stable)."""
    a = spark.createDataFrame([(i, "x") for i in range(300)], "key long, p string")
    b = spark.createDataFrame([(i, 1.5) for i in range(300)], "key long, v double")
    ka = {r["key"] for r in hash_sample(a, "key", 0.15).collect()}
    kb = {r["key"] for r in hash_sample(b, "key", 0.15).collect()}
    assert ka == kb and 10 < len(ka) < 90


# --- Count-Min sketch -------------------------------------------------------


def _cms_modules():
    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_lookup,
        cms_merge,
    )

    return cms_build, cms_lookup, cms_merge


def test_cms_never_underestimates_and_exact_when_wide(spark):
    """CMS guarantee: estimate >= true count for every key (non-negative
    weights); with width >> #keys the deterministic hash gives no
    collisions here and every estimate is exact."""
    cms_build, cms_lookup, _ = _cms_modules()
    df = spark.createDataFrame(
        [(i % 37,) for i in range(3000)], "key long"
    )
    exact = {r["key"]: r["count"] for r in df.groupBy("key").count().collect()}
    keys = df.select("key").distinct()

    narrow = cms_build(df, "key", depth=4, width=16)
    est_n = {
        r["key"]: r["cms_count"]
        for r in cms_lookup(narrow, keys, "key", depth=4, width=16).collect()
    }
    assert set(est_n) == set(exact)
    assert all(est_n[k] >= exact[k] for k in exact)

    wide = cms_build(df, "key", depth=4, width=4096)
    est_w = {
        r["key"]: r["cms_count"]
        for r in cms_lookup(wide, keys, "key", depth=4, width=4096).collect()
    }
    assert est_w == exact


def test_cms_merge_equals_global_build(spark):
    """Union+re-sum of per-source sketches is register-identical to the
    sketch of the union — the mergeability that makes per-day / per-source
    sketching sound."""
    cms_build, _, cms_merge = _cms_modules()
    df = spark.createDataFrame(
        [(i % 53, i % 2) for i in range(2000)], "key long, src int"
    )
    whole = cms_build(df, "key", depth=4, width=32)
    parts = [
        cms_build(df.filter(F.col("src") == s), "key", depth=4, width=32)
        for s in (0, 1)
    ]
    merged = cms_merge(*parts)
    as_set = lambda d: {  # noqa: E731
        (r["row"], r["bucket"], r["cnt"]) for r in d.collect()
    }
    assert as_set(merged) == as_set(whole)


def test_cms_weighted_and_missing_key(spark):
    """weight_col sums into the registers; a never-seen key reads the
    register floor (0 when its buckets are empty)."""
    cms_build, cms_lookup, _ = _cms_modules()
    df = spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7)], "key long, w long"
    )
    sk = cms_build(df, "key", depth=4, width=1024, weight_col="w")
    keys = spark.createDataFrame([(1,), (2,), (999,)], "key long")
    got = {
        r["key"]: r["cms_count"]
        for r in cms_lookup(sk, keys, "key", depth=4, width=1024).collect()
    }
    assert got[1] == 15 and got[2] == 7 and got[999] == 0


# --- KMV set operations -----------------------------------------------------


def test_kmv_set_ops_exact_when_union_below_k(spark):
    from distributed_vector_database_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_sketch,
    )

    a = spark.createDataFrame([(i,) for i in range(10)], "key long")
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "key long")
    row = kmv_set_estimates(
        kmv_sketch(a, "key", k=64), kmv_sketch(b, "key", k=64), k=64
    ).head()
    assert row["union_est"] == 15
    assert row["intersect_est"] == 5
    assert abs(row["jaccard"] - 5 / 15) < 1e-6


def test_kmv_set_ops_estimate_band(spark):
    """Above k: estimates land in the ~1/sqrt(k) band and are
    deterministic across runs."""
    from distributed_vector_database_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_sketch,
    )

    a = spark.createDataFrame([(i,) for i in range(2000)], "key long")
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], "key long")
    ska, skb = kmv_sketch(a, "key", k=256), kmv_sketch(b, "key", k=256)
    row = kmv_set_estimates(ska, skb, k=256).head()
    assert abs(row["union_est"] - 3000) / 3000 < 0.3
    assert abs(row["jaccard"] - 1000 / 3000) < 0.15
    row2 = kmv_set_estimates(ska, skb, k=256).head()
    assert row.asDict() == row2.asDict()


def test_stream_cms_equals_batch_build(spark, tmp_path):
    """Registers folded from unordered micro-batches equal the one-shot
    batch sketch — CMS sums are associative/commutative, so stream == batch
    for any chunking (the invariant the streaming twin query relies on)."""
    from distributed_vector_database_spark.operators.sketch import cms_build
    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        stream_cms_counts,
    )

    rows = [
        (i, "2024-01-01T00:%02d:00" % (i % 60), i % 23, "click", 1.0, "{}")
        for i in range(500)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    streamed = stream_cms_counts(
        read_event_stream(spark, src, max_files_per_trigger=1),
        str(tmp_path / "state"),
        key_col="user_id",
        depth=4,
        width=32,
    )
    batch = cms_build(ev, "user_id", depth=4, width=32)
    as_set = lambda d: {  # noqa: E731
        (r["row"], r["bucket"], r["cnt"]) for r in d.collect()
    }
    assert as_set(streamed) == as_set(batch)


def test_kmv_set_ops_empty_sets(spark):
    """Empty inputs report zeros, not NULL (the 0/0 jaccard guard); a
    one-sided empty set gives intersection 0 with the other side's
    exact cardinality."""
    from distributed_vector_database_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_sketch,
    )

    empty = spark.createDataFrame([], "key long")
    a = spark.createDataFrame([(i,) for i in range(7)], "key long")
    both = kmv_set_estimates(
        kmv_sketch(empty, "key"), kmv_sketch(empty, "key")
    ).head()
    assert (both["union_est"], both["intersect_est"], both["jaccard"]) == (
        0, 0, 0.0
    )
    one = kmv_set_estimates(
        kmv_sketch(a, "key"), kmv_sketch(empty, "key")
    ).head()
    assert (one["union_est"], one["intersect_est"], one["jaccard"]) == (
        7, 0, 0.0
    )


def test_cms_guards(spark):
    """depth/width < 1 raise (sequence(0,-1) would silently descend);
    merging a grouped sketch without its group_cols raises instead of
    summing registers across groups."""
    import pytest

    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_merge,
    )

    df = spark.createDataFrame([(1, "x")], "key long, g string")
    with pytest.raises(ValueError, match=">= 1"):
        cms_build(df, "key", depth=0, width=16)
    with pytest.raises(ValueError, match=">= 1"):
        cms_build(df, "key", depth=4, width=0)
    grouped = cms_build(df, "key", depth=2, width=8, group_cols=["g"])
    with pytest.raises(ValueError, match="group_cols"):
        cms_merge(grouped, grouped)
    merged = cms_merge(grouped, grouped, group_cols=["g"])
    assert {r["cnt"] for r in merged.collect()} == {2}


def test_hash_topk_sample_fixed_size_and_growth_stable(spark):
    """Exactly k per group; adding new rows displaces an old sample member
    ONLY when a new key hashes below the group's k-th minimum (KMV
    property) — so samples are maximally stable under corpus growth."""
    from distributed_vector_database_spark.operators.sketch import (
        hash_fraction,
        hash_topk_sample,
    )

    base = spark.createDataFrame(
        [(i, "g%d" % (i % 2)) for i in range(100)], "key long, g string"
    )
    s1 = hash_topk_sample(base, "key", 5, group_cols=["g"])
    got1 = {(r["g"], r["key"]) for r in s1.collect()}
    assert len(got1) == 10
    assert len({g for g, _ in got1}) == 2

    grown = base.unionByName(
        spark.createDataFrame(
            [(i, "g%d" % (i % 2)) for i in range(100, 140)],
            "key long, g string",
        )
    )
    got2 = {
        (r["g"], r["key"])
        for r in hash_topk_sample(grown, "key", 5, group_cols=["g"]).collect()
    }
    # survivors: members of got1 still present unless displaced by a
    # smaller-hash newcomer; verify via the hash fractions directly
    fr = {
        r["key"]: r["h"]
        for r in grown.select(
            "key", hash_fraction("key").alias("h")
        ).collect()
    }
    for g, k in got1 - got2:
        kicked_by = [
            kk for gg, kk in got2 - got1 if gg == g and fr[kk] < fr[k]
        ]
        assert kicked_by, f"({g},{k}) left the sample without a smaller hash"

    # ungrouped: exactly k rows, the k smallest hashes
    flat = hash_topk_sample(base, "key", 7)
    keys = [r["key"] for r in flat.collect()]
    assert len(keys) == 7
    assert set(keys) == set(
        sorted(fr_k := {k: fr.get(k) for k in range(100)}, key=fr_k.get)[:7]
    )


def test_cms_lookup_refuses_grouped_sketch(spark):
    """ADVICE r5: a grouped sketch probed directly would broadcast-join
    each probe against EVERY group's register row and min ACROSS groups —
    a silent underestimate. cms_lookup now refuses (same guard shape as
    cms_merge); filtering to one group and dropping the group column is
    the sanctioned path and still never underestimates."""
    import pytest

    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_lookup,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "key long, g string"
    )
    grouped = cms_build(df, "key", depth=2, width=8, group_cols=["g"])
    keys = df.select("key").distinct()
    with pytest.raises(ValueError, match="grouped sketch"):
        cms_lookup(grouped, keys, "key", depth=2, width=8)
    one = grouped.filter(F.col("g") == "a").drop("g")
    est = {r["key"]: r["cms_count"] for r in
           cms_lookup(one, keys, "key", depth=2, width=8).collect()}
    assert est[1] >= 2  # true count in group a; never an underestimate


def test_cms_build_refuses_fractional_weight_col(spark):
    """ADVICE r5: cast('long') on a double weight silently truncates
    toward zero per-row, so the sketch no longer upper-bounds the true
    weighted total. Float weights are refused; the caller pre-converts at
    a chosen precision (cents), as cms_top_spenders does."""
    import pytest

    from distributed_vector_database_spark.operators.sketch import cms_build

    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.9)], "key long, w double"
    )
    with pytest.raises(ValueError, match="integer"):
        cms_build(df, "key", depth=2, width=8, weight_col="w")
    cents = df.select(
        "key", F.round(F.col("w") * 100).cast("long").alias("cents")
    )
    sk = cms_build(cents, "key", depth=2, width=8, weight_col="cents")
    assert max(r["cnt"] for r in sk.collect()) == 180


def test_hash_topk_sample_keeps_duplicate_keys_whole(spark):
    """ADVICE r5: duplicate keys hash identically, so a row_number /
    limit cut through the tie group was nondeterministic across
    runs/engines. Both paths now keep tie groups whole: the cut selects
    k smallest DISTINCT hashes and every copy of a selected key
    survives — deterministic even when copies straddle the boundary."""
    from distributed_vector_database_spark.operators.sketch import (
        hash_fraction,
        hash_topk_sample,
    )

    # 10 distinct keys, each duplicated 3x -> 30 rows
    rows = [(k, "g0", i) for k in range(10) for i in range(3)]
    df = spark.createDataFrame(rows, "key long, g string, copy long")
    fr = {
        r["key"]: r["h"]
        for r in df.select("key", hash_fraction("key").alias("h"))
        .distinct()
        .collect()
    }
    keep = set(sorted(fr, key=fr.get)[:4])

    got_g = hash_topk_sample(df, "key", 4, group_cols=["g"]).collect()
    assert {r["key"] for r in got_g} == keep
    assert len(got_g) == 12  # every copy of every selected key

    got_u = hash_topk_sample(df, "key", 4).collect()
    assert {r["key"] for r in got_u} == keep
    assert len(got_u) == 12


def test_bloom_no_false_negatives_and_merge_equals_global(spark):
    """Every inserted key probes maybe_present; merge of per-source
    filters == the global build (bit sets are unions); definite-absence
    verdicts are exact; guards refuse bad params and grouped sketches."""
    import pytest

    from distributed_vector_database_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    kw = dict(num_bits=1 << 14, num_hashes=4)
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
    sk_a = bloom_build(a, "k", **kw)
    sk_b = bloom_build(b, "k", **kw)
    merged = bloom_merge(sk_a, sk_b)
    glob = bloom_build(a.unionByName(b), "k", **kw)
    assert {r["pos"] for r in merged.collect()} == {
        r["pos"] for r in glob.collect()
    }
    # no false negatives: every inserted key is maybe_present
    verd = bloom_contains(merged, a.unionByName(b), "k", **kw)
    assert all(r["maybe_present"] for r in verd.collect())
    # with m >> kn, fresh keys are definitely absent
    fresh = spark.createDataFrame(
        [(f"z{i}",) for i in range(50)], "k string"
    )
    vf = bloom_contains(sk_a, fresh, "k", **kw)
    assert not any(r["maybe_present"] for r in vf.collect())
    with pytest.raises(ValueError, match=">= 1"):
        bloom_build(a, "k", num_bits=0)
    grouped = bloom_build(
        a.select("k", F.lit("g").alias("g")), "k", group_cols=["g"], **kw
    )
    with pytest.raises(ValueError, match="group_cols"):
        bloom_merge(grouped, grouped)
    with pytest.raises(ValueError, match="grouped sketch"):
        bloom_contains(grouped, a, "k", **kw)
    # grouped merge with its group columns stays per-group
    gm = bloom_merge(grouped, grouped, group_cols=["g"])
    assert set(gm.columns) == {"g", "pos"}


def test_bloom_false_positive_rate_in_expected_band(spark):
    """With m sized to ~2 bits/element-hash the measured FPR lands inside
    a loose band around (1-e^{-kn/m})^k — evidence the positions really
    are k independent-ish hashes, not k copies."""
    import math

    from distributed_vector_database_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
    )

    n, m, k = 400, 1 << 12, 4
    keys = spark.createDataFrame(
        [(f"in{i}",) for i in range(n)], "k string"
    )
    probes = spark.createDataFrame(
        [(f"out{i}",) for i in range(4000)], "k string"
    )
    sk = bloom_build(keys, "k", num_bits=m, num_hashes=k)
    verd = bloom_contains(sk, probes, "k", num_bits=m, num_hashes=k)
    fp = sum(1 for r in verd.collect() if r["maybe_present"]) / 4000
    expect = (1 - math.exp(-k * n / m)) ** k
    assert expect / 4 <= fp <= expect * 4, (fp, expect)


def test_hdr_quantiles_error_bound_and_merge(spark):
    """Quantile estimates: the true rank-element always lies in
    [est, est*17/16) for e>=4 (exact below 16); per-source sketches
    merged == the global build; guards refuse float values, bad qs,
    grouped sketches without group_cols."""
    import random

    import pytest

    from distributed_vector_database_spark.operators.sketch import (
        hdr_hist_build,
        hdr_hist_merge,
        hdr_quantiles,
    )

    rnd = random.Random(42)
    vals = [rnd.randint(1, 10**7) for _ in range(4000)]
    df = spark.createDataFrame(
        [(v, "s%d" % (i % 3)) for i, v in enumerate(vals)],
        "c long, src string",
    )
    sk = hdr_hist_build(df, "c")
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    got = {r["q"]: r["est"] for r in hdr_quantiles(sk, qs).collect()}
    svals = sorted(vals)
    for q in qs:
        rank = max(-(-int(q * len(vals)) // 1), 1)
        true = svals[max(int(__import__("math").ceil(q * len(vals))), 1) - 1]
        est = got[q]
        assert est <= true, (q, est, true)
        assert true < est * 17 / 16 + 1, (q, est, true)
    # merge of per-source sketches == global
    parts = [
        hdr_hist_build(df.filter(F.col("src") == f"s{i}"), "c")
        for i in range(3)
    ]
    merged = hdr_hist_merge(*parts)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )
    # values < 1 dropped (positive-store contract)
    with_zero = spark.createDataFrame(
        [(0,), (-5,), (7,)], "c long"
    )
    assert hdr_hist_build(with_zero, "c").agg(
        F.sum("cnt")
    ).first()[0] == 1
    # guards
    fdf = spark.createDataFrame([(1.5,)], "c double")
    with pytest.raises(ValueError, match="exact integers"):
        hdr_hist_build(fdf, "c")
    with pytest.raises(ValueError, match="qs must"):
        hdr_quantiles(sk, [0.0])
    grouped = hdr_hist_build(df, "c", group_cols=["src"])
    with pytest.raises(ValueError, match="group_cols"):
        hdr_hist_merge(grouped, grouped)
    gq = {(r["src"], r["q"]): r["est"]
          for r in hdr_quantiles(grouped, [0.5], group_cols=["src"]).collect()}
    assert len(gq) == 3


def test_stream_hdr_equals_batch_build(spark, tmp_path):
    """HDR registers folded from micro-batches equal the one-shot batch
    histogram (sums are associative), and quantiles read from the
    maintained state equal the batch-sketch quantiles."""
    from distributed_vector_database_spark.operators.sketch import (
        hdr_hist_build,
        hdr_quantiles,
    )
    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        stream_hdr_hist,
    )

    rows = [
        (i, "2024-01-01T00:%02d:00" % (i % 60), i % 23, "click",
         float(1 + (i * 37) % 5000) / 100.0, "{}")
        for i in range(500)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    cents = F.round(F.col("value") * 100).cast("long").alias("cents")
    stream_in = read_event_stream(
        spark, src, max_files_per_trigger=1
    ).select("event_type", cents)
    streamed = stream_hdr_hist(
        stream_in,
        str(tmp_path / "state"),
        value_col="cents",
        group_cols=["event_type"],
    )
    batch = hdr_hist_build(
        ev.select("event_type", cents), "cents", group_cols=["event_type"]
    )
    as_set = lambda d: {tuple(r) for r in d.collect()}  # noqa: E731
    assert as_set(streamed) == as_set(batch)
    qa = hdr_quantiles(streamed, [0.5, 0.99], group_cols=["event_type"])
    qb = hdr_quantiles(batch, [0.5, 0.99], group_cols=["event_type"])
    assert as_set(qa) == as_set(qb)


def test_hll_registers_merge_and_idempotence(spark):
    """Registers are exact integer max-ranks; merge is union+max —
    associative AND idempotent (folding a partial twice is a no-op,
    unlike the sum-merged CMS/HDR registers)."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_merge,
    )

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    even = hll_build(df.filter(F.col("k") % 2 == 0), "k", p=6)
    odd = hll_build(df.filter(F.col("k") % 2 == 1), "k", p=6)
    full = hll_build(df, "k", p=6)

    def as_set(s):
        return {tuple(r) for r in s.collect()}

    merged = hll_merge(even, odd)
    assert as_set(merged) == as_set(full)
    # idempotent: re-folding a constituent changes nothing
    assert as_set(hll_merge(merged, even)) == as_set(full)
    # register domain: reg < 2^p, 1 <= rank <= 49, at most 2^p rows
    rows = full.collect()
    assert len(rows) <= 64
    assert all(0 <= r["reg"] < 64 and 1 <= r["rank"] <= 49 for r in rows)


def test_hll_estimate_accuracy_band_and_duplicates(spark):
    """Estimate within a generous 4-sigma band (~1.04/sqrt(m)) of truth
    across regimes, and duplicate keys do not move it (max absorbs)."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    p, m = 10, 1024
    for n in (100, 1000, 5000):
        df = spark.range(0, n).select(F.col("id").alias("k"))
        est = hll_estimate(hll_build(df, "k", p=p), p=p).collect()[0][
            "hll_distinct"
        ]
        tol = max(4 * 1.04 / (m**0.5), 0.10)  # linear-count regime floor
        assert abs(est - n) / n < tol, (n, est)
    # duplicates: 3 copies of every key == one copy (max absorbs)
    one = spark.range(0, 777).select(F.col("id").alias("k"))
    tripled = one.unionByName(one).unionByName(one)
    e1 = hll_estimate(hll_build(one, "k", p=p), p=p).collect()[0][0]
    e3 = hll_estimate(hll_build(tripled, "k", p=p), p=p).collect()[0][0]
    assert e1 == e3


def test_hll_guards(spark):
    import pytest

    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_merge,
    )

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match=r"p must be"):
        hll_build(df, "k", p=3)
    with pytest.raises(ValueError, match=r"p must be"):
        hll_build(df, "k", p=17)
    with pytest.raises(ValueError, match="needs at least one"):
        hll_merge()
    grouped = hll_build(
        df.withColumn("g", F.lit("a")), "k", p=6, group_cols=["g"]
    )
    # a grouped sketch merged without its group_cols must refuse (it
    # would take max ACROSS groups)
    with pytest.raises(ValueError, match="group_cols"):
        hll_merge(grouped)


def test_hll_estimate_no_overflow_at_large_p(spark):
    """ADVICE r8 (medium): at p>=14 the long-arithmetic estimator
    overflowed int64 (empty-register term v*2^49 > 2^63) and wrapped to
    a garbage/negative estimate under non-ANSI Spark. The decimal(38,0)
    accumulator must give a sane positive estimate across the whole
    [4,16] bound of hll_build."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    n = 1000
    df = spark.range(0, n).select(F.col("id").alias("k"))
    for p in (14, 15, 16):
        est = hll_estimate(hll_build(df, "k", p=p), p=p).collect()[0][
            "hll_distinct"
        ]
        # linear-count regime at m >> n: tight accuracy expected
        assert est > 0, (p, est)
        assert abs(est - n) / n < 0.10, (p, est)


def test_hll_estimate_rejects_larger_p_sketch(spark):
    """ADVICE r8 (low): a sketch built at p=10 holds register ids up to
    1023; asking hll_estimate for p=6 (m=64) must raise at execution
    time instead of silently misinterpreting the register space."""
    import pytest

    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    sk = hll_build(df, "k", p=10)
    with pytest.raises(Exception, match="larger p"):
        hll_estimate(sk, p=6).collect()


def test_read_hll_empty_state_returns_empty_frame(spark, tmp_path):
    """ADVICE r8 (low): querying live HLL state before the first batch
    lands must return an empty register frame (like read_kmv), not
    throw on the missing path."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_estimate,
    )
    from distributed_vector_database_spark.streaming.events import read_hll

    sk = read_hll(spark, str(tmp_path / "nonexistent"))
    assert sk.count() == 0
    assert set(sk.columns) == {"reg", "rank"}
    # and the estimate of the empty sketch is 0, not NULL
    est = hll_estimate(sk, p=8).collect()[0]["hll_distinct"]
    assert est == 0.0
    grouped = read_hll(
        spark, str(tmp_path / "nonexistent2"), group_cols=["event_type"]
    )
    assert grouped.count() == 0
    assert set(grouped.columns) == {"event_type", "reg", "rank"}


def test_stream_hll_equals_batch_and_tolerates_redelivery(spark, tmp_path):
    """Stream-maintained registers == one-shot batch build for any
    chunking (max is associative/commutative), AND a duplicated partial
    (at-least-once redelivery) is a no-op — the property that lets the
    stream write plain appends with no overwrite protocol."""
    from distributed_vector_database_spark.operators.sketch import hll_build
    from distributed_vector_database_spark.streaming.events import (
        EVENT_SCHEMA,
        read_event_stream,
        read_hll,
        stream_hll_registers,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    state = str(tmp_path / "state")
    streamed = stream_hll_registers(
        read_event_stream(spark, src, max_files_per_trigger=1),
        state,
        key_col="user_id",
        p=7,
    )
    batch = hll_build(ev, "user_id", p=7)

    def as_set(s):
        return {tuple(r) for r in s.collect()}

    assert as_set(streamed) == as_set(batch)
    # simulate an at-least-once redelivery: append one batch's partial
    # AGAIN directly into the state dir — merged view must not move
    hll_build(ev.limit(50), "user_id", p=7).write.mode("append").parquet(
        f"{state}/hll_registers"
    )
    assert as_set(read_hll(spark, state)) == as_set(batch)


def test_stream_kmv_equals_batch_and_tolerates_redelivery(spark, tmp_path):
    """Stream-maintained k-smallest == one-shot batch sketch for any
    chunking (every global k-smallest hash is in its batch's top-k), and
    a re-delivered partial is absorbed by the distinct-union merge."""
    from distributed_vector_database_spark.operators.sketch import (
        kmv_sketch,
    )
    from distributed_vector_database_spark.streaming.events import (
        read_event_stream,
        read_kmv,
        stream_kmv_values,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    state = str(tmp_path / "state")
    streamed = stream_kmv_values(
        read_event_stream(spark, src, max_files_per_trigger=1),
        state,
        key_col="user_id",
        k=32,
    )
    batch = kmv_sketch(ev, "user_id", k=32)

    def as_list(s):
        return sorted(r["_h"] for r in s.collect())

    assert as_list(streamed) == as_list(batch)
    # at-least-once: append one batch's partial again — distinct absorbs
    kmv_sketch(ev.limit(40), "user_id", k=32).write.mode(
        "append"
    ).parquet(f"{state}/kmv_values")
    assert as_list(read_kmv(spark, state, k=32)) == as_list(batch)


def test_hll_and_kmv_empty_state_edges(spark, tmp_path):
    """An empty HLL sketch estimates 0 (not NULL); reading KMV stream
    state before any batch yields an empty sketch (not an error)."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )
    from distributed_vector_database_spark.streaming.events import read_kmv

    empty = spark.createDataFrame([], "k long")
    est = hll_estimate(hll_build(empty, "k", p=6), p=6).collect()
    assert len(est) == 1 and est[0]["hll_distinct"] == 0.0
    sk = read_kmv(spark, str(tmp_path / "nostate"), k=8)
    assert sk.count() == 0


def test_hll_set_estimates_union_exact_in_sketch_space(spark):
    """The merged registers ARE the union's sketch: hll_union from
    hll_set_estimates must BIT-equal the estimate of a sketch built
    directly on A ∪ B; the I-E intersection lands within a generous
    band of truth and never goes negative."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_set_estimates,
    )

    p = 10
    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(1000, 3000).select(F.col("id").alias("k"))  # 1000 shared
    row = hll_set_estimates(
        hll_build(a, "k", p=p), hll_build(b, "k", p=p), p=p
    ).collect()[0]
    direct = hll_estimate(
        hll_build(a.unionByName(b), "k", p=p), p=p
    ).collect()[0]["hll_distinct"]
    assert row["hll_union"] == direct
    # ~3.25% stderr at p=10; I-E compounds three estimates — 4-sigma-ish
    assert abs(row["hll_intersect"] - 1000) < 400
    assert row["hll_intersect"] >= 0.0
    # disjoint sets: clamped at 0, never negative
    c = spark.range(50000, 52000).select(F.col("id").alias("k"))
    row2 = hll_set_estimates(
        hll_build(a, "k", p=p), hll_build(c, "k", p=p), p=p
    ).collect()[0]
    assert row2["hll_intersect"] >= 0.0


def test_hll_grouped_rollup_equals_direct_global_build(spark):
    """Max-merging per-group registers gives BIT-identical registers to
    a direct ungrouped build — the re-aggregability that lets a cube
    layer roll distinct counts up from one sketch pass."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    df = spark.createDataFrame(
        [(i % 700, ["a", "b", "c"][i % 3]) for i in range(3000)],
        "k long, g string",
    )
    grouped = hll_build(df, "k", p=9, group_cols=["g"])
    rolled = grouped.groupBy("reg").agg(F.max("rank").alias("rank"))
    direct = hll_build(df, "k", p=9)
    as_set = lambda d: {(r["reg"], r["rank"]) for r in d.collect()}  # noqa: E731
    assert as_set(rolled) == as_set(direct)
    est = hll_estimate(rolled, p=9).collect()[0]["hll_distinct"]
    assert abs(est - 700) / 700 < 0.2


def test_hll_sliding_window_merge_equals_direct_window_build(spark):
    """Window-in-sketch-space: merging daily registers over a window
    gives BIT-identical registers to building the sketch on the
    window's raw rows directly — the overlap-window re-aggregation
    COUNT(DISTINCT) cannot do from daily results."""
    from distributed_vector_database_spark.operators.sketch import hll_build

    rows = [(d, u) for d in range(10) for u in range(d * 30, d * 30 + 80)]
    df = spark.createDataFrame(rows, "day long, k long")
    daily = hll_build(df, "k", p=9, group_cols=["day"])
    # 3-day window starting at day 2
    member = daily.filter(F.col("day").isin(2, 3, 4))
    merged = member.groupBy("reg").agg(F.max("rank").alias("rank"))
    direct = hll_build(df.filter(F.col("day").isin(2, 3, 4)), "k", p=9)
    as_set = lambda d: {(r["reg"], r["rank"]) for r in d.collect()}  # noqa: E731
    assert as_set(merged) == as_set(direct)


def test_hdr_sliding_window_merge_equals_direct_window_build(spark):
    """Summing daily HDR registers over a window == building the
    histogram on the window's raw rows — the quantile counterpart of
    the HLL window-merge invariant."""
    from distributed_vector_database_spark.operators.sketch import (
        hdr_hist_build,
        hdr_quantiles,
    )

    rows = [(d, 10 + 7 * d * (i % 13) + i) for d in range(6)
            for i in range(200)]
    df = spark.createDataFrame(rows, "day long, v long")
    daily = hdr_hist_build(df, "v", group_cols=["day"])
    merged = (
        daily.filter(F.col("day").isin(1, 2, 3))
        .groupBy("e", "sub")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = hdr_hist_build(df.filter(F.col("day").isin(1, 2, 3)), "v")
    as_set = lambda d: {  # noqa: E731
        (r["e"], r["sub"], r["cnt"]) for r in d.collect()
    }
    assert as_set(merged) == as_set(direct)
    qm = {r["q"]: r["est"] for r in hdr_quantiles(merged, [0.5, 0.99]).collect()}
    qd = {r["q"]: r["est"] for r in hdr_quantiles(direct, [0.5, 0.99]).collect()}
    assert qm == qd


def test_cms_inner_product_join_size(spark):
    """AMS/CMS join-size estimate: never underestimates, exact when the
    width is collision-free, and refuses grouped sketches."""
    import pytest

    from distributed_vector_database_spark.operators.sketch import (
        cms_build,
        cms_inner_product,
    )

    a = spark.createDataFrame(
        [(i % 11,) for i in range(400)], "k long"
    )
    b = spark.createDataFrame(
        [(i % 17,) for i in range(300)], "k long"
    )
    exact = (
        a.join(b, "k").count()
    )
    # wide: no collisions over 11+17 keys -> exact
    wide = cms_inner_product(
        cms_build(a, "k", depth=4, width=4096),
        cms_build(b, "k", depth=4, width=4096),
        depth=4,
    ).collect()[0][0]
    assert int(wide) == exact
    # narrow: collision regime -> still an upper bound
    narrow = cms_inner_product(
        cms_build(a, "k", depth=4, width=8),
        cms_build(b, "k", depth=4, width=8),
        depth=4,
    ).collect()[0][0]
    assert int(narrow) >= exact
    grouped = cms_build(
        a.withColumn("g", F.lit("x")), "k", depth=4, width=8,
        group_cols=["g"],
    )
    with pytest.raises(ValueError, match="ungrouped"):
        cms_inner_product(grouped, cms_build(b, "k", depth=4, width=8),
                          depth=4)


def test_kmv_set_diff_estimates_exact_under_k_and_clamped(spark):
    """Below k the sketches hold every key, so every estimate — incl.
    both differences — is EXACT; and estimator noise can never produce a
    negative set size (clamp tested via a subset relation)."""
    from distributed_vector_database_spark.operators.sketch import (
        kmv_set_diff_estimates,
        kmv_sketch,
    )

    a = spark.createDataFrame([(i,) for i in range(30)], "k long")
    b = spark.createDataFrame([(i,) for i in range(20, 45)], "k long")
    out = kmv_set_diff_estimates(
        kmv_sketch(a, "k", k=64), kmv_sketch(b, "k", k=64), k=64
    ).head()
    assert out["a_est"] == 30 and out["b_est"] == 25
    assert out["intersect_est"] == 10
    assert out["diff_a_est"] == 20 and out["diff_b_est"] == 15
    # subset: A strictly inside B -> diff_a must clamp to 0 exactly
    sub = spark.createDataFrame([(i,) for i in range(10)], "k long")
    sup = spark.createDataFrame([(i,) for i in range(40)], "k long")
    o2 = kmv_set_diff_estimates(
        kmv_sketch(sub, "k", k=64), kmv_sketch(sup, "k", k=64), k=64
    ).head()
    assert o2["diff_a_est"] == 0 and o2["diff_b_est"] == 30


def test_kmv_set_diff_estimates_above_k_reasonable(spark):
    """Above k the estimates carry KMV error but the identities hold:
    diffs = est - intersect (clamped), and relative error stays inside
    the k=64 band on a 4x-k workload."""
    from distributed_vector_database_spark.operators.sketch import (
        kmv_set_diff_estimates,
        kmv_sketch,
    )

    a = spark.createDataFrame([(i,) for i in range(256)], "k long")
    b = spark.createDataFrame([(i,) for i in range(128, 384)], "k long")
    out = kmv_set_diff_estimates(
        kmv_sketch(a, "k", k=64), kmv_sketch(b, "k", k=64), k=64
    ).head()
    assert out["diff_a_est"] == max(out["a_est"] - out["intersect_est"], 0)
    assert out["diff_b_est"] == max(out["b_est"] - out["intersect_est"], 0)
    assert abs(out["a_est"] - 256) / 256 < 0.5
    assert abs(out["diff_a_est"] - 128) / 128 < 0.8
