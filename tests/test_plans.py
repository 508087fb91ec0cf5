"""Physical-plan shape tests: the scale properties as assertions.

These check what .explain("formatted") actually says — filters reach the
parquet scan, scans are column-pruned, dim joins broadcast, hot paths stay
inside whole-stage codegen — because at 100 TB each of these is the
difference between reading gigabytes and reading everything.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.plans.inspect import (
    has_whole_stage_codegen,
    join_strategies,
    num_exchanges,
    pushed_filters,
    read_schemas,
    scans_are_vectorized,
)
from gmall_flink_yb_spark.plans.views import register_views
from gmall_flink_yb_spark.queries import (
    q_order_wide,
    q_revenue_by_nation,
    q_top_brands,
    q_uv_daily,
)
from gmall_flink_yb_spark.sources.readers import read_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_quantity")
    pushed = pushed_filters(q)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_column_pruning(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    schemas = read_schemas(q)
    assert len(schemas) == 1
    # 16-column table: only the two referenced columns may leave the scan
    assert "l_returnflag" in schemas[0] and "l_quantity" in schemas[0]
    assert "l_comment" not in schemas[0] and "l_extendedprice" not in schemas[0]


def test_dim_joins_broadcast_not_shuffle(spark, sf_dir):
    """J2: every dim enrichment must be a broadcast join — shuffling the fact
    table per dim is the reference's per-row-RPC mistake reborn at scale.
    The lineitem x orders fact join is the ONE shuffled join (with static
    auto-broadcast off, a fact is never estimate-broadcast; AQE may still
    convert it from true runtime sizes at tiny scale)."""
    import re

    from gmall_flink_yb_spark.plans.inspect import _simple_plan

    plan = _simple_plan(q_revenue_by_nation(spark, sf_dir))
    broadcasts = re.findall(r"\bBroadcastHashJoin\b", plan)
    shuffled = re.findall(r"\b(?:SortMergeJoin|ShuffledHashJoin)\b", plan)
    assert len(broadcasts) == 3, plan  # customer, nation, region
    assert len(shuffled) == 1, plan    # lineitem x orders only


def test_order_wide_single_fact_shuffle(spark, sf_dir):
    """The interval join shuffles each fact side once on the join key; dim
    enrichment adds broadcasts, not exchanges."""
    df = q_order_wide(spark, sf_dir)
    joins = join_strategies(df)
    assert "BroadcastHashJoin" in joins  # dims
    # facts: at most one hash-exchange per side of the equi-join (+1 if AQE
    # inserts a final agg exchange)
    assert num_exchanges(df) <= 3, num_exchanges(df)


def test_topk_uses_codegen_and_vectorized_scans(spark, sf_dir):
    df = q_top_brands(spark, sf_dir)
    assert scans_are_vectorized(df)
    assert has_whole_stage_codegen(df)


def test_uv_single_exchange(spark, sf_dir):
    """ST2 batch form: dedup + daily count must need at most two exchanges
    (one on the dedup key, one to regroup by date)."""
    assert num_exchanges(q_uv_daily(spark, sf_dir)) <= 2


def test_sql_views_run(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert set(names) == {
        "dwm_unique_visit",
        "dwm_new_visitors",
        "dwm_user_jump_detail",
        "dws_doc_quality",
        "dws_doc_dup_groups",
        "dws_corpus_profile",
    }
    # the curation surface answers ad-hoc SQL: low-quality doc count and
    # the largest exact-dup group, straight off the named logical plans
    bad = spark.sql(
        "SELECT count(*) FROM dws_doc_quality WHERE quality_ok = 0"
    ).first()[0]
    assert bad >= 0
    top_dup = spark.sql(
        "SELECT max(dup_count) FROM dws_doc_dup_groups"
    ).first()[0]
    assert top_dup >= 1
    assert spark.sql("SELECT count(*) FROM dws_corpus_profile").first()[0] > 0
    uv = spark.sql(
        "SELECT _uv_date, count(*) AS uv FROM dwm_unique_visit GROUP BY 1"
    )
    assert uv.count() > 0
    bounce = spark.sql(
        "SELECT count(*) FROM dwm_user_jump_detail WHERE is_bounce"
    ).first()[0]
    assert bounce > 0
    # the SQL surface and the Python surface are the same logical plan
    py_uv = q_uv_daily(spark, sf_dir).agg(F.sum("uv")).first()[0]
    sql_uv = uv.agg(F.sum("uv")).first()[0]
    assert py_uv == sql_uv


def test_chunk_dedup_two_exchanges(spark, sf_dir):
    """chunk_dedup's contract: the chunking itself stays narrow; the only
    shuffles are the count-by-chunk-hash aggregate, the count-table join
    (both sides on the hash — the count table is corpus-sized at scale, so
    with static auto-broadcast off it shuffles in the static plan; AQE may
    still broadcast it at runtime from true sizes), and the regroup-by-doc."""
    from gmall_flink_yb_spark.queries import q_chunk_dedup

    assert num_exchanges(q_chunk_dedup(spark, sf_dir)) <= 5


def test_semantic_dedup_assignment_is_narrow(spark, sf_dir):
    """SemDeDup's nearest-centroid assignment must be a column expression,
    not a join: the exchanges are the cluster-size aggregate (bounded at
    n_clusters rows, broadcast back), the (cluster, block-pair) grouping
    for the GEMM, and the dup-verdict join back — never a shuffle against
    a centroid table."""
    from gmall_flink_yb_spark.queries import q_semantic_dedup

    df = q_semantic_dedup(spark, sf_dir)
    # no join against a centroid table — the codebook is plan literals
    assert num_exchanges(df) <= 5, num_exchanges(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the size table rides a broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan


def test_quality_classifier_zero_exchanges(spark, sf_dir):
    """The soft classifier is a pure narrow map over the scan."""
    from gmall_flink_yb_spark.queries import q_quality_classifier

    df = q_quality_classifier(spark, sf_dir)
    assert num_exchanges(df) == 0, num_exchanges(df)
    assert scans_are_vectorized(df)


def test_q3_q5_broadcast_dims_single_fact_shuffle(spark, sf_dir):
    """TPC-H Q3/Q5 shapes: the true dims are hint-broadcast, but orders is
    fact-sized and must NOT be hint-broadcast — at 100 TB it would OOM the
    driver. With the auto-broadcast threshold disabled (so only explicit
    hints survive), the plan must show exactly one shuffle join (lineitem x
    orders) and broadcast joins for every dim."""
    from gmall_flink_yb_spark.queries import (
        q_q3_shipping_priority,
        q_q5_local_supplier,
    )

    import re

    from gmall_flink_yb_spark.plans.inspect import _simple_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q, n_dims in [(q_q3_shipping_priority, 1), (q_q5_local_supplier, 4)]:
            df = q(spark, sf_dir)
            plan = _simple_plan(df)
            shuffled = re.findall(r"\b(?:SortMergeJoin|ShuffledHashJoin)\b", plan)
            broadcasts = re.findall(r"\bBroadcastHashJoin\b", plan)
            assert len(shuffled) == 1, (q.__name__, plan)
            assert len(broadcasts) == n_dims, (q.__name__, plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q18_fact_fact_shuffle_plus_broadcast_dim(spark, sf_dir):
    """Q18: lineitem-agg x orders is a fact-fact join (must NOT broadcast a
    fact at scale — but at sf0.001 AQE may legitimately pick broadcast for
    the tiny filtered agg side); customer is always a BroadcastHashJoin."""
    from gmall_flink_yb_spark.queries import q_q18_large_orders

    df = q_q18_large_orders(spark, sf_dir)
    joins = join_strategies(df)
    assert "BroadcastHashJoin" in joins, joins
    # plan executes and the top-100 cut is deterministic
    rows = df.collect()
    assert len(rows) <= 100
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_q4_semi_join_shape(spark, sf_dir):
    """Q4: the EXISTS must decorrelate to a single semi join on orderkey —
    with auto-broadcast off (both sides are facts at 100 TB), exactly one
    shuffled SEMI join and no fan-out join of any other kind."""
    import re

    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    from gmall_flink_yb_spark.queries import q_q4_late_orders

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_q4_late_orders(spark, sf_dir)
        plan = _simple_plan(df)
        semi = re.findall(
            r"\b(?:SortMergeJoin|ShuffledHashJoin)\b.*LeftSemi", plan
        )
        all_joins = re.findall(r"Join\b", plan)
        assert len(semi) == 1, plan
        assert len(all_joins) == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bpe_scan_pruned_to_text(spark, sf_dir):
    """BPE pair counting reads ONLY the text column — dragging the rest of
    the documents table through a tokenizing scan is a pruning bug."""
    from gmall_flink_yb_spark.queries import q_bpe_pair_counts

    schemas = read_schemas(q_bpe_pair_counts(spark, sf_dir))
    assert len(schemas) == 1
    assert "text" in schemas[0]
    assert "source" not in schemas[0] and "lang" not in schemas[0]


def test_q6_all_predicates_pushed_no_shuffle(spark, sf_dir):
    """Q6 is the pushdown benchmark: date range, discount band, and
    quantity cap must ALL reach the parquet scan, the scan must read only
    the four referenced columns, and the only exchange is the 1-row final
    aggregate's SinglePartition gather."""
    from gmall_flink_yb_spark.queries import q_q6_forecast_revenue

    df = q_q6_forecast_revenue(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    schemas = read_schemas(df)
    assert len(schemas) == 1
    assert "l_returnflag" not in schemas[0] and "l_orderkey" not in schemas[0]
    assert not join_strategies(df)


def test_q7_q10_q19_fact_never_broadcast(spark, sf_dir):
    """Q7/Q10: with auto-broadcast off, the only shuffle join is
    lineitem x orders; every dim (supplier/customer/nation roles) is an
    explicit broadcast hint. Q19: part broadcasts into the lineitem scan
    and the fact never shuffles at all."""
    import re

    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    from gmall_flink_yb_spark.queries import (
        q_q7_volume_shipping,
        q_q10_returned_items,
        q_q19_discount_revenue,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q, n_shuffle, n_bcast in [
            (q_q7_volume_shipping, 1, 4),
            (q_q10_returned_items, 1, 2),
            (q_q19_discount_revenue, 0, 1),
        ]:
            plan = _simple_plan(q(spark, sf_dir))
            shuffled = re.findall(
                r"\b(?:SortMergeJoin|ShuffledHashJoin)\b", plan
            )
            broadcasts = re.findall(r"\bBroadcastHashJoin\b", plan)
            assert len(shuffled) == n_shuffle, (q.__name__, plan)
            assert len(broadcasts) == n_bcast, (q.__name__, plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q13_aggregates_below_the_outer_join(spark, sf_dir):
    """Q13's scale property is agg-before-join: the orders scan must be
    pruned to (o_custkey, o_orderpriority) and collapse to per-custkey
    counts BEFORE the outer join against customer, so the join inputs are
    customer-sized. One outer join, nothing cartesian."""
    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    from gmall_flink_yb_spark.queries import q_q13_order_distribution

    df = q_q13_order_distribution(spark, sf_dir)
    orders_schema = [s for s in read_schemas(df) if "o_custkey" in s]
    assert orders_schema and "o_totalprice" not in orders_schema[0]
    plan = _simple_plan(df)
    assert "CartesianProduct" not in plan
    # the join's right side is the aggregate, not the raw scan: the
    # aggregate appears below the join in the plan tree
    assert plan.index("Join") < plan.rindex("HashAggregate")


def test_q15_argmax_without_global_window(spark, sf_dir):
    """Q15's max-revenue selection must be a 1-row broadcast join, never a
    Window.partitionBy() over everything (which funnels all suppliers
    through a single task)."""
    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    from gmall_flink_yb_spark.queries import q_q15_top_supplier

    df = q_q15_top_supplier(spark, sf_dir)
    plan = _simple_plan(df)
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in join_strategies(df)
    rows = df.collect()
    assert len(rows) >= 1


def test_q22_anti_join_with_pushed_date_cut(spark, sf_dir):
    """Q22: the NOT EXISTS must decorrelate to a left anti join, the
    recent-orders date cut must push to the orders scan, and the scalar
    threshold must be a broadcast (1-row) side, not a shuffle."""
    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    from gmall_flink_yb_spark.queries import q_q22_global_sales_opportunity

    df = q_q22_global_sales_opportunity(spark, sf_dir)
    plan = _simple_plan(df)
    assert "LeftAnti" in plan, plan
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed, pushed


def test_winnow_overlap_scan_pruned(spark, sf_dir):
    """Winnowing reads only (doc_id, text); the pair join must be an
    equi-join on the fingerprint, never a cartesian."""
    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    from gmall_flink_yb_spark.queries import q_winnow_overlap

    df = q_winnow_overlap(spark, sf_dir)
    schemas = read_schemas(df)
    assert schemas and all("n_chars" not in s for s in schemas), schemas
    assert "CartesianProduct" not in _simple_plan(df)
