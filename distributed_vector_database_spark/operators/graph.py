"""Iterative graph operators: connected components by label propagation.

The missing last step of near-duplicate deduplication: pair detection
(`operators/dedup.py`) yields EDGES, but "keep one doc per duplicate
GROUP" needs the transitive closure — if A~B and B~C, all three are one
cluster even though (A, C) was never emitted as a pair. The reference has
no notion of this (its only dedup is REPLACE-on-primary-key,
`reference: src/storage_server.py:43-46`).

Spark has no recursive CTE, so closure is an ITERATIVE fixpoint — the one
operator class where a driver loop around declarative jobs is the idiomatic
plan (same structure as MLlib's own iterative algorithms):

    label(n) <- min(label(n), min over neighbors of label)   until stable

Each round is one shuffle (edge join + min-aggregate) over |E| rows;
rounds needed = graph diameter (near-dup clusters are tiny and dense, so
2-3 rounds in practice). Convergence is checked with a cheap sum-of-labels
aggregate; labels only ever decrease, so equal checksum == fixpoint.
At huge |E|, alternate large-star/small-star rounds (Kiveris et al.,
"Connected Components in MapReduce", SoCC 2014) cut rounds to
O(log log n); plain propagation is kept here for plan transparency.

The oracle is a DuckDB RECURSIVE CTE computing min-reachable-id — an
independent formulation of the same closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "connected_components_star",
    "pagerank_micro",
    "triangle_stats",
]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """``(node, component)`` for every node in the edge list, where
    ``component`` is the smallest node id reachable through the undirected
    graph — deterministic cluster representative.

    Nodes are the union of both endpoint columns (isolated rows never
    appear in an edge list; callers union them back if needed).
    """
    # the symmetric union references `edges` TWICE, and callers pass
    # expensive pair pipelines (prefix-Jaccard verify, CDC shared-chunk
    # mining) — materialize the edge list ONCE eagerly so the union
    # derives from |E| stored rows instead of running the pair kernel
    # per branch (round 13, guide §2.4; lazy is wrong here — the two
    # branches are independent subtrees of one job and would race).
    e0 = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    sym = (
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()  # re-joined every round — never recompute the edge source
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    prev_sum = None
    for _ in range(max_iters):
        # pull the smallest neighbor label, keep own if smaller
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            # lazy local checkpoint: the convergence aggregate below is
            # the one job that materializes this round's labels AND
            # truncates the growing lineage — one action per round where
            # the eager form paid two (checkpoint job + checksum job)
            .localCheckpoint(eager=False)
        )
        # labels only decrease -> equal checksum means fixpoint
        cur_sum = labels.agg(F.sum("component")).head()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()  # labels are materialized (localCheckpoint) — safe
    return labels


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over canonical edges ``(u, v), u > v``.

    For each node n, connect every STRICTLY LARGER neighbor to the minimum
    of Γ(n) ∪ {n}. Emitted per symmetric group; self-loops dropped.
    """
    sym = e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy(F.col("u").alias("n")).agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.join(mins, sym["u"] == mins["n"])
        .filter(F.col("v") > F.col("u"))  # only larger neighbors re-point
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: connect each node's SMALLER neighbors (and the
    node itself) to the minimum of that group. Input/output edges are
    canonical ``u > v``."""
    mins = e.groupBy(F.col("u").alias("n")).agg(F.min("v").alias("m"))
    j = e.join(mins, e["u"] == mins["n"])
    # all smaller neighbors -> m, plus the center itself -> m
    repointed = j.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        j.select(F.col("u"), F.col("m").alias("v"))
    )
    return (
        repointed.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """``(node, component)`` via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — O(log² n) rounds worst-case vs. O(diameter) for plain
    label propagation, so this is the scale path for long-chain graphs.

    Same contract as :func:`connected_components`: nodes are the union of
    both endpoint columns, ``component`` is the minimum reachable id.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    e = (
        edges.select(
            F.greatest(src, dst).alias("u"), F.least(src, dst).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    converged = False
    for _ in range(max_iters):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # (count, sum u, sum v) is a cheap signature used as a pre-filter;
        # equality is then CONFIRMED exactly with a set difference, so a
        # signature collision between different edge sets cannot end the
        # loop early.
        sig = tuple(
            new_e.agg(F.count("*"), F.sum("u"), F.sum("v")).head()
        )
        if sig == prev_sig and new_e.exceptAll(e).isEmpty():
            e = new_e
            converged = True
            break
        prev_sig = sig
        e = new_e
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star hit max_iters={max_iters} before "
            "the edge set reached a fixpoint; labels may be non-minimal — "
            "raise max_iters (rounds needed is O(log^2 n))",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged edges form stars: every edge points node -> component min.
    star = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("c"))
    return nodes.join(star, "node", "left").select(
        "node", F.coalesce(F.col("c"), F.col("node")).alias("component")
    )


def pagerank_micro(
    edges: DataFrame,
    *,
    iters: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank with EXACT integer arithmetic — every node starts with
    1,000,000 micro-units of mass and each round computes

        mass'(v) = (100 - d)% · 10⁶  +  Σ_{u→v} (mass(u) · d) div (100 · outdeg(u))

    entirely in int64 (``div`` = truncating integer division, all
    operands positive). Floating-point PageRank is NOT reproducible
    across engines (neighbor-sum order changes the low bits every
    round and the drift compounds through iterations); the micro-unit
    form makes every iteration bit-exact, so a SQL oracle can verify an
    ITERATIVE algorithm value-for-value — same trick as the engine's
    integer-cents money sums.

    The unnormalized "mass" formulation (constant per-node teleport, no
    dangling redistribution — sinks absorb) keeps the recurrence local:
    each round is ONE edge join + ONE partial-agg shuffle over |E| rows,
    the same per-round plan MLlib's PageRank runs; ``iters`` is fixed
    (PageRank convergence is geometric; ranking stabilizes in a handful
    of rounds).

    Returns (node, mass) for every node after ``iters`` rounds.
    """
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    # materialize the loop-invariant frames once, and truncate pr's
    # lineage every round — without this the final action re-evaluates an
    # iters-deep nested join tree (and the edge derivation inside it)
    # from scratch (measured 8.0 s -> ~2 s at sf0.1).
    # Round 13 (guide §2.4/§8, stationary edges): the out-degree is
    # loop-invariant, so it is joined onto the edge frame ONCE here
    # instead of once per round (removes an |E|-shuffle join from every
    # iteration), and the checkpointed (edge ⨝ outdeg) frame keeps its
    # hash(_s) partitioning so per-round joins only ever move the
    # node-sized rank frame. Per-round checkpoints became LAZY: with a
    # fixed iteration count there is nothing to inspect between rounds,
    # so the plan-lineage cut no longer needs a blocking job per round —
    # the caller's single action executes the whole 5-round cascade,
    # materializing each round's RDD exactly once via the checkpoint's
    # block-manager persistence (measured: 5 driver-synchronized jobs
    # -> 1).
    # materialize the caller's edge derivation ONCE: it is referenced by
    # the outdeg join and BOTH branches of the node union, i.e. three
    # evaluations of a potentially expensive pipeline (the supplier ->
    # customer graph derives edges from a lineitem ⨝ orders + distinct)
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).localCheckpoint(eager=True)
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    ej = e.join(outdeg, "_s").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = (100 - damping_pct) * 1_000_000 // 100
    pr = nodes.withColumn("mass", F.lit(1_000_000).cast("long"))
    for i in range(iters):
        contrib = (
            ej.join(pr, ej._s == pr.node)
            .select(
                F.col("_d").alias("node"),
                F.expr(f"(mass * {damping_pct}) div (100 * _deg)").alias(
                    "_c"
                ),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("_in"), F.lit(0)))
            .cast("long")
            .alias("mass"),
        )
        if i < iters - 1:
            pr = pr.localCheckpoint(eager=False)
    return pr


def triangle_stats(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle census of an undirected graph: one row
    ``(n_nodes, n_edges, n_wedges, n_triangles, global_clustering)`` where
    ``global_clustering = 3·triangles / wedges`` (the transitivity ratio).

    On the kNN graph this measures how "clumpy" the embedding space is —
    high transitivity means near-duplicate clusters and topic clumps; it is
    also the standard sanity metric for ANN graph indexes (a healthy
    small-world graph has high clustering).

    Plan (node-iterator with DEGREE ORIENTATION — Schank & Wagner 2005,
    the standard distributed form): canonicalize to distinct a<b edges,
    orient every edge from its lower-(degree, id) endpoint to the higher
    one, build wedges by self-joining oriented edges on the source, and
    verify the closing edge with one more equi-join. Orientation bounds
    every out-degree by O(sqrt(|E|)), so the wedge fan-out is
    O(|E|^{3/2}) worst-case instead of sum(deg²) — the difference between
    a feasible and an exploding join on power-law graphs at 100 TB. All
    three joins are equi-joins on uniform keys; counts are exact
    integers.
    """
    # |E| rows, but its lineage (e.g. a kNN-graph GEMM) can be expensive —
    # and und feeds FIVE consumers (degrees twice, orientation, edge
    # count, the closing semi-join) with no exchange reuse across
    # self-joins; materialize it once.
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # orient each edge toward the higher-(degree, id) endpoint; carry the
    # destination's (degree, id) key for the wedge-order comparison
    e = (
        und.join(deg.withColumnsRenamed({"n": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"n": "b", "d": "db"}), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("u"),
                    F.col("b").alias("v"),
                    F.col("db").alias("dv"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("u"),
                    F.col("a").alias("v"),
                    F.col("da").alias("dv"),
                )
            )
            .alias("_e")
        )
        .select("_e.u", "_e.v", "_e.dv")
        .localCheckpoint(eager=False)
    )
    w1 = e.select(
        F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx")
    )
    w2 = e.select(
        F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    wedges = w1.join(w2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closed = wedges.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    tri = closed.agg(F.count("*").alias("n_triangles"))
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum((F.col("d") * (F.col("d") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    n_edges = und.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
                ),
                6,
            ).alias("global_clustering"),
        )
    )
