"""Deterministic sketches: KMV distinct-count estimation, hash sampling.

Classic sketches (HyperLogLog, theta) are engine-specific — their estimates
can't be oracle-compared across engines. These variants are built on the
portable md5 hash (functions/text.py convention: both engines emit the same
lowercase hex), so the ESTIMATES themselves are bit-identical in any engine
— Spark and the DuckDB oracle agree exactly, and re-runs are reproducible.

  - KMV (k minimum values): per group keep the k smallest hash fractions of
    the distinct keys; estimate = (k-1)/h_k [Bar-Yossef et al. 2002]. Error
    ~ 1/sqrt(k). Shuffle cost: one distinct + one window over (group, hash)
    — the k survivors per group are tiny however large the group is.
  - Hash Bernoulli sample: keep rows with hash_fraction(key) < rate — a
    deterministic, join-stable sample (the same key samples identically in
    every table, every run, every engine; no global sort, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_fraction",
    "kmv_distinct",
    "kmv_sketch",
    "kmv_set_estimates",
    "kmv_set_diff_estimates",
    "cms_build",
    "cms_merge",
    "cms_lookup",
    "cms_bucket",
    "cms_inner_product",
    "bloom_build",
    "bloom_merge",
    "bloom_contains",
    "hdr_hist_build",
    "hdr_hist_merge",
    "hdr_quantiles",
    "hdr_bucket_lo",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "hll_set_estimates",
    "hll_alpha_numerator",
    "hash_sample",
    "hash_topk_sample",
    "hash_split",
    "stratified_hash_sample",
]

_HEX_DIGITS = 12
_DENOM = float(16**_HEX_DIGITS)  # 2^48 — exact in float64


def hash_fraction(col: Column | str) -> Column:
    """md5-derived uniform fraction in [0, 1) — first 12 hex chars as an
    integer over 16^12. DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 12))::BIGINT / 281474976710656.0``."""
    c = F.col(col) if isinstance(col, str) else col
    hx = F.substring(F.md5(c.cast("string")), 1, _HEX_DIGITS)
    return F.conv(hx, 16, 10).cast("double") / F.lit(_DENOM)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    *,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT key): KMV estimator.

    Exact when a group has <= k distinct keys (the sketch holds them all);
    otherwise ``round((k-1) / h_k)`` where h_k is the k-th smallest hash
    fraction. Returns (group_cols..., kmv_distinct BIGINT).
    """
    groups = group_cols or []
    distinct = df.select(*groups, key_col).distinct()
    h = hash_fraction(key_col).alias("_h")
    w = Window.partitionBy(*groups).orderBy(F.asc("_h"))
    ranked = distinct.select(*groups, h).withColumn(
        "_rn", F.row_number().over(w)
    )
    agg = ranked.groupBy(*groups).agg(
        F.count("*").alias("_nd"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
    )
    est = F.when(
        F.col("_nd") <= k, F.col("_nd")
    ).otherwise(F.round(F.lit(float(k - 1)) / F.col("_hk")).cast("long"))
    return agg.select(*groups, est.cast("long").alias("kmv_distinct"))


def hash_sample(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Deterministic Bernoulli sample: rows whose key's hash fraction is
    below ``rate``. Same keys survive in every run/engine/table."""
    return df.filter(hash_fraction(key_col) < F.lit(rate))


def hash_topk_sample(
    df: DataFrame,
    key_col: str,
    k: int,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic FIXED-SIZE sample: the k rows with the smallest key
    hash fractions, per group — carve "exactly 200 eval docs per
    language" where rate-based sampling (`stratified_hash_sample`) can't
    guarantee a count. Uniform over keys, reproducible across
    runs/engines, and stable under corpus growth in the precise sense
    that a row leaves the sample only when a new key hashes below the
    group's current k-th minimum (the KMV property — this IS a KMV
    sketch whose carried payload is the whole row).

    Grouped: one window shuffle on group_cols, cut by ``dense_rank()``
    so the k smallest DISTINCT hash values per group survive and rows
    tied on the hash — i.e. duplicate keys — are kept WHOLE: the cut
    never splits a key's copies nondeterministically, and the result can
    exceed k rows only by such copies. Ungrouped: the k smallest
    DISTINCT hash values (TakeOrderedAndProject on the hash frame — no
    global sort) broadcast-semi-joined back, the same keep-ties-whole
    contract. Ties between DISTINCT keys are impossible short of a
    48-bit md5 collision, so with a unique key the result is exactly k
    rows on both paths.
    """
    h = hash_fraction(key_col).alias("_h")
    if not group_cols:
        kth = (
            df.select(h)
            .distinct()
            .orderBy(F.asc("_h"))
            .limit(k)
        )
        return df.select("*", h).join(
            F.broadcast(kth), "_h", "left_semi"
        ).drop("_h")
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    return (
        df.select("*", h)
        .withColumn("_rn", F.dense_rank().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_h", "_rn")
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps rows whose
    key hash fraction is below that stratum's rate (``sampleBy`` without
    RNG state). The training-data use: rebalance a corpus — e.g. keep all
    of a rare language but 10% of the dominant one — reproducibly, so a
    re-run or a second table carves the identical subset. Narrow filter,
    no shuffle.
    """
    frac = hash_fraction(key_col)
    s = F.col(strata_col)
    rate = None
    for name, r in rates.items():
        cond = s == F.lit(name)
        rate = (
            F.when(cond, F.lit(float(r)))
            if rate is None
            else rate.when(cond, F.lit(float(r)))
        )
    rate = (
        F.lit(float(default_rate))
        if rate is None
        else rate.otherwise(F.lit(float(default_rate)))
    )
    return df.filter(frac < rate)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Deterministic train/val/test split: a ``split`` column assigned by
    the key's hash fraction against cumulative ``fractions`` boundaries
    (e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``).

    Properties a training pipeline needs and RNG-based ``randomSplit``
    lacks: reproducible across runs/engines/cluster sizes, join-stable
    (the same key lands in the same split in every table), leakage-free
    (membership depends only on the key), and a narrow projection — no
    shuffle, no RNG state.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    frac = hash_fraction(key_col)
    expr = None
    cum = 0.0
    *head, (last_name, _) = list(fractions.items())
    for name, f in head:
        cum += f
        cond_expr = frac < F.lit(cum)
        expr = (
            F.when(cond_expr, F.lit(name))
            if expr is None
            else expr.when(cond_expr, F.lit(name))
        )
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return df.withColumn("split", expr)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) on the portable md5 hash.
#
# A frequency sketch that is a plain (row, bucket, cnt) DataFrame:
#   - registers are SUMS, so the sketch is order-independent and mergeable
#     (union two sketches, re-sum) — the canonical pattern for per-day /
#     per-source sketches folded later into a global one;
#   - every register write is a map-side-combinable groupBy: the shuffle
#     carries at most depth*width rows per task however big the input;
#   - lookups broadcast the (tiny) sketch against the probe keys.
# Determinism: the row-i hash is md5(f"{i}:{key}") — the same convention as
# `hash_fraction`, so the DuckDB oracle reproduces every register and every
# estimate bit-exactly (a property engine-native CMS implementations lack).
# ---------------------------------------------------------------------------


def cms_bucket(row: Column, key: Column, width: int) -> Column:
    """Register column for hash row ``row``: first 12 hex chars of
    md5("{row}:{key}") mod width. DuckDB mirror:
    ``('0x' || substr(md5(i::VARCHAR || ':' || key::VARCHAR), 1, 12))::BIGINT
    % width``."""
    hx = F.substring(
        F.md5(F.concat_ws(":", row.cast("string"), key.cast("string"))),
        1,
        _HEX_DIGITS,
    )
    return F.pmod(F.conv(hx, 16, 10).cast("long"), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over ``key_col`` occurrences (or summed
    ``weight_col``). Returns (*group_cols, row, bucket, cnt) — at most
    depth*width rows per group. One partial-aggregated shuffle; the explode
    multiplies rows by ``depth`` only map-side.

    ``weight_col`` must be an INTEGRAL column (registers are exact long
    sums; the never-underestimate guarantee needs lossless accumulation).
    Fractional amounts must be pre-converted by the caller at a chosen
    precision — e.g. ``F.round(F.col("value") * 100).cast("long")`` for
    cents, as the `cms_top_spenders` driver row does. A float column is
    refused rather than silently truncated toward zero per-row."""
    if depth < 1 or width < 1:
        # sequence(0, depth-1) would silently DESCEND for depth < 1
        raise ValueError(f"depth and width must be >= 1, got {depth}x{width}")
    groups = group_cols or []
    if weight_col is not None:
        wtype = dict(df.dtypes).get(weight_col)
        if wtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight_col {weight_col!r} has type {wtype}; CMS registers "
                "are exact integer sums — pre-convert fractional weights "
                "(e.g. round(value*100).cast('long') for cents)"
            )
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    probes = df.select(
        *groups,
        F.col(key_col).alias("_k"),
        w.alias("_w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        probes.withColumn("bucket", cms_bucket(F.col("row"), F.col("_k"), width))
        .groupBy(*groups, "row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold sketches built with the same (depth, width) into one: union the
    register frames and re-sum. Associative and commutative, so per-source /
    per-day sketches can fold in any order or tree shape."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    groups = group_cols or []
    expected = {*groups, "row", "bucket", "cnt"}
    for s in sketches:
        if set(s.columns) != expected:
            # a grouped sketch merged without its group_cols would silently
            # sum registers ACROSS groups — refuse instead
            raise ValueError(
                f"sketch columns {sorted(s.columns)} != expected "
                f"{sorted(expected)}; pass group_cols matching the build"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*groups, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-estimate the count of every key in ``keys``: min over the
    ``depth`` registers the key hashes into (never an underestimate for
    non-negative weights; collisions only inflate). Returns
    (key_col, cms_count). The sketch is at most depth*width rows —
    broadcast, so the probe side never shuffles.

    Refuses a grouped sketch (same guard as `cms_merge`): silently
    dropping the group columns would match each probe against EVERY
    group's registers and take the min ACROSS groups — an underestimate
    that breaks the CMS guarantee. Probe one group at a time (filter the
    sketch to the group first) or merge groups deliberately."""
    if set(sketch.columns) != {"row", "bucket", "cnt"}:
        raise ValueError(
            f"sketch columns {sorted(sketch.columns)} != ['bucket', 'cnt', "
            "'row']; a grouped sketch must be filtered to one group (or "
            "folded with cms_merge(group_cols=...) semantics) before lookup"
        )
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn("bucket", cms_bucket(F.col("row"), F.col(key_col), width))
    joined = probes.join(
        F.broadcast(sketch.select("row", "bucket", "cnt")),
        ["row", "bucket"],
        "left",
    )
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count")
    )


# ---------------------------------------------------------------------------
# KMV set operations (Beyer et al. SIGMOD 2007): union / intersection /
# Jaccard estimates from two k-minimum-value sketches. Each sketch is the
# k smallest hash fractions of its key set; the k smallest of the COMBINED
# pool all lie below both sketches' k-th minima, so membership flags inside
# that pool are exact — giving jaccard = |matches|/|pool| and
# |A ∩ B| ≈ jaccard * union_est. Deterministic via the portable md5 hash:
# the DuckDB oracle reproduces the estimates exactly.
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, key_col: str, *, k: int = 64) -> DataFrame:
    """The k smallest distinct hash fractions of ``key_col`` — a mergeable
    distinct-set summary (column ``_h``). Planned as TakeOrderedAndProject:
    per-partition top-k then a single k-row merge — no global sort however
    large the input."""
    return (
        df.select(hash_fraction(key_col).alias("_h"))
        .distinct()
        .orderBy(F.asc("_h"))
        .limit(k)
    )


def kmv_set_estimates(
    sketch_a: DataFrame, sketch_b: DataFrame, *, k: int = 64
) -> DataFrame:
    """One-row frame (union_est, intersect_est, jaccard) from two KMV
    sketches built with the same k. Exact when the union has < k distinct
    keys (the pool then holds every key of both sets). The window below is
    single-partition by construction — it ranks at most 2k sketch rows,
    never data-sized input."""
    a = sketch_a.select("_h", F.lit(1).alias("_a"))
    b = sketch_b.select("_h", F.lit(1).alias("_b"))
    pool = a.join(b, "_h", "full").select(
        "_h",
        F.coalesce("_a", F.lit(0)).alias("_a"),
        F.coalesce("_b", F.lit(0)).alias("_b"),
    )
    ranked = pool.withColumn(
        "_rn", F.row_number().over(Window.orderBy(F.asc("_h")))
    ).filter(F.col("_rn") <= k)
    agg = ranked.agg(
        F.count("*").alias("_n"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
        F.sum(F.col("_a") * F.col("_b")).alias("_m"),
    )
    union_est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / F.col("_hk"))
    )
    # empty pool (both sets empty): 0/0 would be NULL — report zeros
    jac = F.when(F.col("_n") == 0, F.lit(0.0)).otherwise(
        F.col("_m").cast("double") / F.col("_n")
    )
    return agg.select(
        union_est.cast("long").alias("union_est"),
        F.round(jac * union_est).cast("long").alias("intersect_est"),
        F.round(jac, 6).alias("jaccard"),
    )


def kmv_set_diff_estimates(
    sketch_a: DataFrame, sketch_b: DataFrame, *, k: int = 64
) -> DataFrame:
    """One-row set-ALGEBRA frame from two same-k KMV sketches: per-side
    cardinalities, the joint intersection, and both DIFFERENCES

        diff_a_est = max(a_est - intersect_est, 0)     (churn: in A, not B)
        diff_b_est = max(b_est - intersect_est, 0)     (new:   in B, not A)

    — the year-over-year churn/new-customer question answered from two
    k-row summaries, never the data. Per-side estimates use the
    standard KMV estimator on each sketch alone (exact when a side has
    < k distinct keys); the intersection comes from the joint pool
    (`kmv_set_estimates` machinery); differences are exact integer
    arithmetic on the rounded estimates, clamped at 0 (estimator noise
    must not produce negative set sizes).

    Returns (a_est, b_est, intersect_est, diff_a_est, diff_b_est).
    """

    def _side(sk: DataFrame, name: str) -> DataFrame:
        return sk.agg(
            F.count("*").alias(f"_n{name}"),
            F.max("_h").alias(f"_hk{name}"),
        )

    def _est(n: str, hk: str):
        return (
            F.when(F.col(n) < k, F.col(n).cast("double"))
            .otherwise(F.round(F.lit(float(k - 1)) / F.col(hk)))
            .cast("long")
        )

    joint = kmv_set_estimates(sketch_a, sketch_b, k=k).select(
        "intersect_est"
    )
    out = (
        _side(sketch_a, "a")
        .crossJoin(_side(sketch_b, "b"))
        .crossJoin(joint)
        .select(
            _est("_na", "_hka").alias("a_est"),
            _est("_nb", "_hkb").alias("b_est"),
            F.col("intersect_est"),
        )
    )
    return out.select(
        "a_est",
        "b_est",
        "intersect_est",
        F.greatest(
            F.col("a_est") - F.col("intersect_est"), F.lit(0)
        ).cast("long").alias("diff_a_est"),
        F.greatest(
            F.col("b_est") - F.col("intersect_est"), F.lit(0)
        ).cast("long").alias("diff_b_est"),
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter (Bloom, CACM 1970) on the same md5 hash convention
# as the CMS above — positions are `cms_bucket(i, key, num_bits)` for
# i in 0..num_hashes-1, so the DuckDB oracle reproduces every bit and
# every membership verdict exactly (engine-native bloom filters cannot be
# oracle-compared).
#
# Representation: a DataFrame of DISTINCT set-bit positions — at most
# min(num_bits, n*num_hashes) single-int rows however large the keyed
# input, i.e. a fixed-memory summary that is
#   - mergeable: union + distinct (order-free, tree-foldable — per-day /
#     per-source filters fold into a global one);
#   - broadcastable: membership probes join the tiny position set, the
#     probe side never shuffles;
#   - one-sided exact: `maybe_present = false` is a guarantee of absence,
#     `true` is wrong with the classic (1 - e^(-kn/m))^k false-positive
#     rate. The decontamination use: a 100-TB corpus probes a broadcast
#     bloom of the eval-set n-grams and only the tiny maybe-present
#     remainder needs the exact check.
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Set-bit positions of the Bloom filter over ``key_col`` —
    (*group_cols, pos), distinct. The explode is map-side (xnum_hashes)
    and the only shuffle is the partial-aggregated distinct over at most
    ``num_bits`` positions per group."""
    if num_bits < 1 or num_hashes < 1:
        raise ValueError(
            f"num_bits and num_hashes must be >= 1, got {num_bits}/{num_hashes}"
        )
    groups = group_cols or []
    return (
        df.select(
            *groups,
            F.col(key_col).alias("_k"),
            F.explode(
                F.sequence(F.lit(0), F.lit(num_hashes - 1))
            ).alias("_i"),
        )
        .select(
            *groups,
            cms_bucket(F.col("_i"), F.col("_k"), num_bits).alias("pos"),
        )
        .distinct()
    )


def bloom_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold Bloom filters built with the same (num_bits, num_hashes):
    union the position sets and re-distinct. Same grouped-sketch guard as
    `cms_merge` — merging grouped filters without their group columns
    would silently OR bit sets across groups."""
    if not sketches:
        raise ValueError("bloom_merge needs at least one sketch")
    groups = group_cols or []
    expected = {*groups, "pos"}
    for s in sketches:
        if set(s.columns) != expected:
            raise ValueError(
                f"sketch columns {sorted(s.columns)} != expected "
                f"{sorted(expected)}; pass group_cols matching the build"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct()


def bloom_contains(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Membership verdict for every probe key: (key_col, maybe_present).
    ``false`` is definite absence; ``true`` carries the Bloom
    false-positive rate. The sketch (<= num_bits rows) is broadcast, so
    the probe side never shuffles before its per-key aggregation.

    Refuses a grouped sketch (same guard as `cms_lookup`): probing
    against the union of all groups' bits would silently inflate
    ``maybe_present``."""
    if set(sketch.columns) != {"pos"}:
        raise ValueError(
            f"sketch columns {sorted(sketch.columns)} != ['pos']; a "
            "grouped sketch must be filtered to one group (or folded with "
            "bloom_merge(group_cols=...) semantics) before probing"
        )
    ex = probes.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("_i"),
    ).select(
        key_col, cms_bucket(F.col("_i"), F.col(key_col), num_bits).alias("pos")
    )
    joined = ex.join(
        F.broadcast(sketch.select("pos", F.lit(1).alias("_hit"))),
        "pos",
        "left",
    )
    return joined.groupBy(key_col).agg(
        (F.count("_hit") == F.lit(num_hashes)).alias("maybe_present")
    )


# ---------------------------------------------------------------------------
# HDR-style histogram quantile sketch (HdrHistogram / DDSketch family) on
# EXACT INTEGER bucketing — no float log, so unlike gamma-bucket DDSketch
# the bucket of a value is bit-identical in every engine (a boundary value
# can never round differently) and the DuckDB oracle reproduces every
# register and every quantile estimate exactly.
#
# Bucket of a positive integer c (e.g. cents): e = floor(log2 c) computed
# as length(bin(c)) - 1, sub = the next 4 bits after the leading one —
# 16 sub-buckets per octave, so bucket width / lower bound <= 1/16
# (6.25% one-sided relative error). The sketch is (e, sub, cnt):
# at most 16 * 60 rows per group for the whole BIGINT range, registers
# are sums — order-independent, mergeable, broadcastable; the same
# fixed-memory/mergeable story as the CMS registers above, for the
# quantile question. Completes the sketch quartet: frequency -> CMS,
# distinct -> KMV, membership -> Bloom, quantiles -> this.
# ---------------------------------------------------------------------------


def _hdr_e_sub(c: Column) -> tuple[Column, Column]:
    e = (F.length(F.bin(c)) - 1).cast("int")
    # the python shiftright/shiftleft wrappers take only literal shift
    # amounts; the SQL builtins accept expressions
    sub = (
        F.call_function(
            "shiftright", c, F.greatest(e - F.lit(4), F.lit(0))
        )
        .bitwiseAND(F.lit(15))
        .cast("int")
    )
    return e, sub


def hdr_bucket_lo(e: Column, sub: Column) -> Column:
    """Deterministic bucket lower bound (the published estimate): exact
    value for e < 4 octaves, (16+sub) << (e-4) above. DuckDB mirror:
    ``CASE WHEN e < 4 THEN sub ELSE (16 + sub)::BIGINT << (e - 4) END``."""
    return F.when(e < 4, sub.cast("long")).otherwise(
        F.call_function(
            "shiftleft", (F.lit(16) + sub).cast("long"), e - F.lit(4)
        )
    )


def hdr_hist_build(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the histogram over a POSITIVE INTEGRAL column (pre-convert
    fractional amounts at a chosen precision — cents — exactly like
    `cms_build`; an integral dtype is enforced the same way). Rows with
    value < 1 are outside the log-bucket domain and are dropped, the
    standard positive-store contract of this sketch family. Returns
    (*group_cols, e, sub, cnt) — one partial-aggregated shuffle of at
    most ~960 register rows per group."""
    wtype = dict(df.dtypes).get(value_col)
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"value_col {value_col!r} has type {wtype}; hdr buckets need "
            "exact integers — pre-convert (e.g. round(value*100)"
            ".cast('long') for cents)"
        )
    groups = group_cols or []
    c = F.col(value_col).cast("long")
    e, sub = _hdr_e_sub(c)
    return (
        df.filter(c >= 1)
        .select(*groups, e.alias("e"), sub.alias("sub"))
        .groupBy(*groups, "e", "sub")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hdr_hist_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold histograms: union register frames and re-sum — associative,
    commutative, any tree shape. Same grouped-sketch guard as the other
    mergeable families."""
    if not sketches:
        raise ValueError("hdr_hist_merge needs at least one sketch")
    groups = group_cols or []
    expected = {*groups, "e", "sub", "cnt"}
    for s in sketches:
        if set(s.columns) != expected:
            raise ValueError(
                f"sketch columns {sorted(s.columns)} != expected "
                f"{sorted(expected)}; pass group_cols matching the build"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*groups, "e", "sub").agg(
        F.sum("cnt").alias("cnt")
    )


def hdr_quantiles(
    sketch: DataFrame,
    qs: list[float],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from the histogram: for each q, the lower bound
    of the bucket holding the ceil(q*n)-th smallest value — a
    deterministic integer with the value guaranteed in
    [estimate, estimate * 17/16) for e >= 4 octaves (exact below).
    Returns (*group_cols, q, est). Register-sized work: a cumulative-sum
    window over <= ~960 rows per group, cross-joined with the literal
    q list."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"qs must be fractions in (0, 1], got {qs}")
    groups = group_cols or []
    w = Window.partitionBy(*groups).orderBy("e", "sub")
    wt = Window.partitionBy(*groups)
    cum = sketch.select(
        *groups,
        "e",
        "sub",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(wt).alias("_total"),
    )
    qf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    rank = F.greatest(
        F.ceil(F.col("q") * F.col("_total")).cast("long"), F.lit(1)
    )
    return (
        cum.crossJoin(F.broadcast(qf))
        .filter(F.col("_cum") >= rank)
        .groupBy(*groups, "q")
        .agg(
            F.min(hdr_bucket_lo(F.col("e"), F.col("sub"))).alias("est")
        )
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007): the industry-standard
# fixed-size distinct counter, built on the same md5 convention so the
# ESTIMATE is bit-comparable across engines (the module docstring's "HLL is
# engine-specific" caveat applies to native implementations — this one is
# relational and exact in its register states). vs KMV (above): KMV keeps k
# hash VALUES (exact set algebra, union/intersect), HLL keeps 2^p integer
# RANK registers — max-mergeable, which is IDEMPOTENT: re-delivering a
# partial sketch cannot corrupt it (CMS/HDR sums can double-count under
# at-least-once replay; HLL max cannot), the right default for streaming
# register maintenance. Register = max leading-zero rank of a 48-bit md5
# slice, bucketed by an independent md5 slice; rank extraction is the same
# binary-string-length integer trick the HDR buckets use. The register SUM
# for the estimate is kept as an exact integer (sum of 2^(49-rank) — at
# most 56 bits), so cross-engine float drift cannot enter before the single
# final division.
# ---------------------------------------------------------------------------

_HLL_MAX_RANK = 49  # 48 hash bits -> ranks 1..48; rank 49 = all-zero word


def hll_alpha_numerator(p: int) -> float:
    """The constant numerator alpha_m * m^2 * 2^49 of the raw estimate,
    computed ONCE in python and embedded as the same literal in Spark and
    the SQL oracle (float product order is fixed here, not re-derived
    per engine)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << _HLL_MAX_RANK)


def hll_build(
    df: DataFrame,
    key_col: str,
    *,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HLL registers over ``key_col``: (*group_cols, reg, rank) with
    reg in [0, 2^p) and rank in [1, 49], at most 2^p rows per group.
    One partial-aggregated max shuffle; duplicate keys are absorbed by
    the max (no pre-distinct needed). DuckDB mirror of the register
    expressions:
    ``('0x' || substr(md5('r:' || key), 1, 12))::BIGINT % m`` and
    ``CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END`` for
    ``w = ('0x' || substr(md5('q:' || key), 1, 12))::BIGINT``."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    groups = group_cols or []
    key = F.col(key_col).cast("string")
    reg = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("r"), key)), 1, _HEX_DIGITS
            ),
            16,
            10,
        ).cast("long"),
        F.lit(m),
    )
    w = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("q"), key)), 1, _HEX_DIGITS
        ),
        16,
        10,
    ).cast("long")
    rank = (
        F.when(w == F.lit(0), F.lit(_HLL_MAX_RANK))
        .otherwise(F.lit(_HLL_MAX_RANK) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*groups, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*groups, "reg")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold register frames: union + max per register. Associative,
    commutative AND idempotent — folding the same partial twice is a
    no-op, so at-least-once delivery needs no overwrite protocol. Same
    grouped-sketch guard as the other mergeable families.

    Callers MUST merge sketches built with the SAME ``p`` — the register
    schema carries no p, so a mixed-p merge cannot be detected here
    (register ids from a larger p simply overlap the smaller range).
    :func:`hll_estimate` raises at execution time when it sees a
    register id >= 2^p (a larger-p sketch leaked in); the converse
    (merging a SMALLER-p sketch into a larger-p estimate) is
    undetectable by construction — keep p with the state directory, as
    `streaming.events.stream_hll_counts` does."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    groups = group_cols or []
    expected = {*groups, "reg", "rank"}
    for s in sketches:
        if set(s.columns) != expected:
            raise ValueError(
                f"sketch columns {sorted(s.columns)} != expected "
                f"{sorted(expected)}; pass group_cols matching the build"
            )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*groups, "reg").agg(F.max("rank").alias("rank"))


def hll_estimate(
    sketch: DataFrame,
    *,
    p: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cardinality estimate per group: (*group_cols, hll_distinct)
    (double, 6dp). Standard estimator with the small-range linear-count
    correction: raw = alpha*m^2 / sum(2^-rank_j) over ALL m registers
    (absent register = rank 0 contributes 1); if raw <= 2.5m and empty
    registers V > 0, estimate = m * ln(m/V). The register sum is the
    exact integer sum(2^(49-rank)) scaled by 2^49, accumulated as
    DECIMAL(38,0) — at p=16 the sum alone can reach 2^64 and the
    empty-register term 2^65, both past int64 (a long accumulator wraps
    negative under non-ANSI Spark while the DuckDB mirror errors —
    ADVICE r8) — so the only float steps are one division, one ln, and
    the 6dp round: deterministic and oracle-bit-comparable for every p
    in hll_build's [4, 16]. Relative error ~1.04/sqrt(m) (~6.5% at
    p=8). Register-sized work: one <=2^p-row aggregate per group.

    Raises (at execution time) when the sketch holds a register id
    >= 2^p: that sketch was built with a larger p than the estimate was
    asked for — the mixed-p merge hll_merge cannot see."""
    m = 1 << p
    groups = group_cols or []
    two49 = 1 << _HLL_MAX_RANK
    dec = "decimal(38,0)"
    s = F.sum(
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.lit(_HLL_MAX_RANK) - F.col("rank"),
        ).cast(dec)
    )
    agg = sketch.groupBy(*groups).agg(
        # coalesce: an EMPTY ungrouped sketch still yields one global-agg
        # row (sum=NULL, count=0) — it must estimate 0, not NULL (with
        # _s=0 and v=m the linear-count branch gives m*ln(m/m) = 0)
        F.coalesce(s, F.lit(0).cast(dec)).alias("_s"),
        F.count("*").cast("long").alias("_nreg"),
        F.max("reg").alias("_maxreg"),
    )
    v = F.lit(m).cast("long") - F.col("_nreg")
    raw = F.lit(hll_alpha_numerator(p)) / (
        F.col("_s") + v.cast(dec) * F.lit(two49).cast(dec)
    ).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    guarded = F.when(
        F.col("_maxreg") >= F.lit(m),
        F.raise_error(
            F.format_string(
                "hll_estimate(p=%s): register id %s >= 2^p — sketch was "
                "built (or merged) with a larger p",
                F.lit(str(p)),
                F.col("_maxreg").cast("string"),
            )
        ).cast("double"),
    ).otherwise(F.round(est, 6))
    return agg.select(*groups, guarded.alias("hll_distinct"))


def hll_set_estimates(
    sketch_a: DataFrame, sketch_b: DataFrame, *, p: int
) -> DataFrame:
    """Set algebra in HLL register space [Flajolet et al. 2007]: one row
    ``(hll_a, hll_b, hll_union, hll_intersect)`` from two ungrouped
    same-p sketches. Union is EXACT in sketch space (the max-merged
    registers ARE the union's sketch — the property that makes HLL the
    distributed-count workhorse); intersection is inclusion–exclusion
    over the three estimates, clamped at 0 (I-E can go negative at
    small overlaps; its error compounds the three estimates' — for
    high-precision small intersections prefer the KMV twin
    `kmv_set_estimates`, which estimates overlap from sampled hashes).

    Register-sized work throughout: two <=2^p-row estimates, one
    <=2*2^p-row merge, a 3-way crossJoin of single-row frames.
    """
    ea = hll_estimate(sketch_a, p=p).select(
        F.col("hll_distinct").alias("hll_a")
    )
    eb = hll_estimate(sketch_b, p=p).select(
        F.col("hll_distinct").alias("hll_b")
    )
    eu = hll_estimate(hll_merge(sketch_a, sketch_b), p=p).select(
        F.col("hll_distinct").alias("hll_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .withColumn(
            "hll_intersect",
            F.round(
                F.greatest(
                    F.col("hll_a") + F.col("hll_b") - F.col("hll_union"),
                    F.lit(0.0),
                ),
                6,
            ),
        )
    )


def cms_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame, *, depth: int
) -> DataFrame:
    """JOIN-SIZE estimation from two Count-Min sketches [AMS'96 /
    Cormode-Muthukrishnan'05]: |A ⋈ B on k| = Σ_k f_A(k)·f_B(k), and
    the CMS estimate is ``min over hash rows i of
    Σ_b cntA[i][b]·cntB[i][b]`` — an upper bound that never
    underestimates (collisions only ADD mass), tightest at the min row.
    The planner-adjacent question at 100 TB — "will this join blow up?"
    — answered from two register frames without touching either table:
    the sketches are what a catalog keeps per column, and the estimate
    costs depth·width register multiplies.

    Both sketches must share (depth, width) and the ungrouped
    ``(row, bucket, cnt)`` schema. Products are accumulated in
    DECIMAL(38,0) (two 10-digit counts already exceed int64), and the
    returned ``cms_join_size`` stays exact-integer up to 38 digits.
    """
    for s in (sketch_a, sketch_b):
        if set(s.columns) != {"row", "bucket", "cnt"}:
            raise ValueError(
                f"ungrouped (row, bucket, cnt) sketch expected, got "
                f"{sorted(s.columns)}"
            )
    dec = "decimal(38,0)"
    a = sketch_a.select(
        "row", "bucket", F.col("cnt").cast(dec).alias("_ca")
    )
    b = sketch_b.select(
        "row", "bucket", F.col("cnt").cast(dec).alias("_cb")
    )
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    # a hash row with NO shared buckets has inner product 0 — it must
    # participate in the min (the estimate is 0), so fill absent rows
    rows = sketch_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("row")
    )
    return (
        rows.join(per_row, "row", "left")
        .agg(
            F.min(F.coalesce(F.col("_ip"), F.lit(0).cast(dec))).alias(
                "_m"
            )
        )
        .select(F.col("_m").cast(dec).alias("cms_join_size"))
    )
