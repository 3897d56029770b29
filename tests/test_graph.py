"""Connected-components tests (operators/graph.py)."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.graph import (
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_chain_collapses_to_min(spark):
    # path graph 1-2-3-4-5: diameter 4, all label to 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_components_and_direction_invariance(spark):
    got = _cc(spark, [(2, 1), (3, 2), (10, 11), (20, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_transitive_closure_beyond_pairs(spark):
    # A~B, B~C but no (A, C) edge: still one cluster
    got = _cc(spark, [(100, 200), (200, 300)])
    assert got == {100: 100, 200: 100, 300: 100}


def test_star_converges_in_few_rounds(spark):
    edges = [(0, i) for i in range(1, 40)]
    got = _cc(spark, edges, max_iters=3)  # star diameter 2
    assert set(got.values()) == {0}
    assert len(got) == 40


# ---- large-star/small-star variant (scale path) ----------------------------

from distributed_vector_database_spark.operators.graph import (  # noqa: E402
    connected_components_star,
)


def _cc_star(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components_star(df, **kw).collect()
    }


def test_star_cc_long_chain(spark):
    # path graph of 65 nodes: diameter 64 — label propagation would need
    # 64 rounds; star contraction collapses it in O(log^2 n)
    edges = [(i, i + 1) for i in range(64)]
    got = _cc_star(spark, edges, max_iters=10)
    assert got == {i: 0 for i in range(65)}


def test_star_cc_matches_label_propagation_random(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]  # sparse -> several components, self-loops included
    assert _cc_star(spark, edges) == _cc(spark, edges, max_iters=60)


def test_star_cc_self_loop_and_direction(spark):
    got = _cc_star(spark, [(5, 5), (9, 3), (3, 7)])
    assert got == {5: 5, 3: 3, 7: 3, 9: 3}


def test_pagerank_micro_matches_python_reference(spark):
    """Integer-micro PageRank == a pure-Python reference on a small
    directed graph (sink absorbs mass; truncating division)."""
    from distributed_vector_database_spark.operators.graph import (
        pagerank_micro,
    )

    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
    ]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {
        r["node"]: r["mass"]
        for r in pagerank_micro(edges, iters=5).collect()
    }

    nodes = sorted({n for e in edge_list for n in e})
    out = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    pr = {n: 1_000_000 for n in nodes}
    base = 15 * 1_000_000 // 100
    for _ in range(5):
        nxt = {n: base for n in nodes}
        for s, d in edge_list:
            nxt[d] += (pr[s] * 85) // (100 * out[s])
        pr = nxt
    assert got == pr
    # d has no in-edges: exactly the teleport base every round
    assert min(got, key=got.get) == "d" and got["d"] == base


def test_triangle_stats_known_graph(spark):
    """K4 plus a pendant edge: C(4,3)=4 triangles, 13 wedges."""
    from distributed_vector_database_spark.operators.graph import (
        triangle_stats,
    )

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(
        k4 + [(3, 4)], "src long, dst long"
    )
    r = triangle_stats(edges).head()
    assert r["n_nodes"] == 5 and r["n_edges"] == 7
    assert r["n_triangles"] == 4
    # degrees: 3,3,3,4,1 -> wedges = 3+3+3+6+0 = 15
    assert r["n_wedges"] == 15
    assert r["global_clustering"] == round(12 / 15, 6)


def test_triangle_stats_counts_each_triangle_once(spark):
    """Duplicate/reversed input edges and a triangle-free star both
    resolve correctly."""
    from distributed_vector_database_spark.operators.graph import (
        triangle_stats,
    )

    tri = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    assert triangle_stats(tri).head()["n_triangles"] == 1
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = triangle_stats(star).head()
    assert r["n_triangles"] == 0 and r["global_clustering"] == 0.0


def test_triangle_stats_composes_with_capped_lsh_graph(spark, embeddings):
    """The approximate-graph scale path must feed the census directly:
    same edge shape as knn_graph_exact, sane invariants out."""
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.ann import (
        knn_graph_lsh,
        random_hyperplanes,
    )
    from distributed_vector_database_spark.operators.graph import (
        triangle_stats,
    )

    planes = random_hyperplanes(64, n_planes=8, seed=5)
    edges = knn_graph_lsh(
        embeddings, planes, k=3, max_bucket=32, impl="gemm"
    ).select(F.col("query_id").alias("src"), F.col("vec_id").alias("dst"))
    r = triangle_stats(edges).head()
    assert r["n_nodes"] > 0 and r["n_edges"] > 0
    assert 0.0 <= r["global_clustering"] <= 1.0
    assert r["n_wedges"] >= 3 * r["n_triangles"]
