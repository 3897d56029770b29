"""Physical-plan assertions: the scale contract, checked by reading the plan.

Each test pins the plan property that makes the operator survive 100x data:
joins that must broadcast, filters that must reach the scan, and operators
that must NOT plan a join/cartesian at all.
"""

from pyspark.sql import functions as F

from distributed_vector_database_spark.plans.inspect import (
    assert_filter_pushdown,
    assert_no_cross_join,
    plan_text,
    pushed_filters,
    read_schema_columns,
)
from distributed_vector_database_spark.queries import _read, spark_queries
from tests.conftest import SF_SMOKE


def test_asof_join_plans_no_join(spark):
    """The union-merge as-of plan must contain no join operator — its only
    wide stage is the window sort-shuffle."""
    df = spark_queries()["asof_last_click_before_purchase"](spark, SF_SMOKE)
    text = plan_text(df)
    assert "Join" not in text, text
    assert "Window" in text


def test_range_join_is_equi_join(spark):
    """Bucketed range join must plan a hash/merge equi-join — never a
    cartesian or broadcast-nested-loop theta join."""
    df = spark_queries()["range_clicks_before_purchase"](spark, SF_SMOKE)
    assert_no_cross_join(df, allow_broadcast=False)
    # the event_type predicates must reach both parquet scans
    assert any("event_type" in f for f in pushed_filters(df))


def test_shipping_priority_broadcasts_dim(spark):
    df = spark_queries()["shipping_priority"](spark, SF_SMOKE)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text, text
    assert "CartesianProduct" not in text
    # date filters pushed into the fact scans
    pushed = pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed)
    assert any("o_orderdate" in f for f in pushed)
    assert any("c_mktsegment" in f for f in pushed)


def test_topk_prunes_columns(spark):
    """The search scan must read only (id, vector) — label etc. pruned."""
    df = spark_queries()["topk_cosine"](spark, SF_SMOKE)
    scans = read_schema_columns(df)
    assert scans and all(
        set(cols) <= {"vec_id", "embedding"} for cols in scans
    ), scans


def test_point_lookup_pushdown(spark):
    df = _read(spark, SF_SMOKE, "embeddings").filter(F.col("vec_id") == 7)
    assert_filter_pushdown(df, "vec_id")


def test_anti_join_broadcasts(spark):
    df = spark_queries()["customers_no_big_order"](spark, SF_SMOKE)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text and "LeftAnti" in text, text
    assert any("o_totalprice" in f for f in pushed_filters(df))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed tables equi-join with ZERO shuffle: the plan must
    contain no Exchange (broadcast disabled to force the point)."""
    from distributed_vector_database_spark.queries import _read
    from distributed_vector_database_spark.sources.bucketed import save_bucketed

    ev = _read(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    t1 = save_bucketed(
        ev, "ev_bucketed_a", "user_id", num_buckets=8,
        path=str(tmp_path / "ba"),
    )
    t2 = save_bucketed(
        ev.selectExpr("user_id", "value AS v2"),
        "ev_bucketed_b",
        "user_id",
        num_buckets=8,
        path=str(tmp_path / "bb"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = t1.join(t2, "user_id")
        text = plan_text(joined)
        assert "Exchange" not in text, text
        assert joined.count() > 0
    finally:
        if old is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        else:
            # get(key, None) returns None when the conf was never set
            # explicitly; leaving -1 in place disables auto-broadcast for
            # every later test in the session (flaky CartesianProduct
            # failures in the registry-wide plan audit).
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")


def test_pq_adc_scan_prunes_to_codes_column(spark, tmp_path):
    # a persisted PQ index scanned by ADC must never read the float vectors
    from distributed_vector_database_spark.operators.pq import (
        codebooks_from_rows,
        pq_adc_topk,
        pq_encode,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    rows = (
        emb.filter(F.col("vec_id") < 16)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    books = codebooks_from_rows([[float(x) for x in r[0]] for r in rows], m=8)
    path = str(tmp_path / "pq_index")
    emb.select(
        "vec_id",
        F.col("embedding").alias("embedding"),
        pq_encode("embedding", books).alias("codes"),
    ).write.parquet(path)

    indexed = spark.read.parquet(path)
    qv = [float(x) for x in rows[0][0]]
    out = pq_adc_topk(indexed, books, qv, k=5)
    schemas = read_schema_columns(out)
    assert schemas, "no parquet ReadSchema found in plan"
    for cols in schemas:
        assert "embedding" not in cols, (
            f"ADC scan reads the float column: {cols}"
        )
        assert "codes" in cols
    assert out.count() == 5


def test_q6_predicates_reach_the_scan(spark):
    df = spark_queries()["forecast_revenue_change"](spark, SF_SMOKE)
    pf = " ".join(" ".join(f) for f in [pushed_filters(df)]) or str(
        pushed_filters(df)
    )
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in str(pushed_filters(df)), (
            f"{col} not pushed: {pushed_filters(df)}"
        )
    # and the scan must not read money columns it doesn't aggregate
    cols = read_schema_columns(df)
    assert cols and all("l_tax" not in c for c in cols)


def test_radius_search_is_shuffle_free(spark):
    """radius_search's claim: a pruned scan + filter — no Exchange, no
    Sort, no global merge anywhere in the plan."""
    from distributed_vector_database_spark.operators.topk import radius_search

    emb = _read(spark, SF_SMOKE, "embeddings")
    qv = [float(x) for x in emb.head()["embedding"]]
    txt = plan_text(radius_search(emb, qv, 0.2))
    assert "Exchange" not in txt and "Sort" not in txt
    # and the scan is column-pruned to what the score needs
    cols = read_schema_columns(radius_search(emb, qv, 0.2))
    assert "label" not in cols


def test_filtered_topk_pushes_metadata_predicates(spark):
    """filtered_topk_cosine's claim: the lang/length predicates reach the
    documents parquet scan (filter BEFORE scoring, pushed to the file)."""
    df = spark_queries()["filtered_topk_cosine"](spark, SF_SMOKE)
    pf = str(pushed_filters(df))
    assert "lang" in pf and "n_chars" in pf, pf
    # scoring input is column-pruned: no text column read anywhere
    cols = read_schema_columns(df)
    assert cols and all("text" not in c for c in cols)


def test_grouped_topk_single_scan(spark):
    """grouped_topk_by_label: one scored scan + one rank window — no join,
    no cartesian, exactly one shuffle (the label window)."""
    df = spark_queries()["grouped_topk_by_label"](spark, SF_SMOKE)
    assert_no_cross_join(df)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert txt.count("Exchange hashpartitioning") == 1, txt
    # rank <= 3 is pushed below the shuffle: each partition pre-truncates
    # to its local per-label top-3 before exchanging
    assert "WindowGroupLimit" in txt.split("Exchange")[1], txt


def test_cdc_owner_screen_plan_shape(spark, documents):
    """The round-7 de-skew rule holds for the CDC owner screen: ownership
    is a partial-agg groupBy + join-back, never a window; and the CDC
    chunker itself plans with NO Exchange before the chunk rows exist
    (pure narrow array work)."""
    from distributed_vector_database_spark.operators.chunking import (
        cdc_chunk_documents,
    )
    from distributed_vector_database_spark.operators.dedup import (
        cdc_chunk_dup_flags,
    )
    from distributed_vector_database_spark.plans.inspect import plan_text

    chunk_plan = plan_text(cdc_chunk_documents(documents, mask_bits=4))
    assert "Exchange" not in chunk_plan, "CDC chunker must be shuffle-free"
    assert "Window" not in chunk_plan

    flags_plan = plan_text(cdc_chunk_dup_flags(documents, mask_bits=4))
    assert "Window" not in flags_plan, "ownership regressed to a window"
    assert (
        "partial_min" in flags_plan
        or "partial min" in flags_plan.lower()
    )


def test_hll_register_plan_is_partial_agg(spark, documents):
    """HLL registers must be a map-side-combined max aggregate (a
    ubiquitous key collapses before the shuffle) — no window, one
    exchange."""
    from distributed_vector_database_spark.operators.sketch import (
        hll_build,
    )
    from distributed_vector_database_spark.plans.inspect import plan_text

    plan = plan_text(hll_build(documents, "doc_id", p=8))
    assert "Window" not in plan
    assert "partial_max" in plan or "partial max" in plan.lower()
