"""J1 interval join + J2 dim enrichment + T3 ingest tests
(OrderWideApp.java:49-121) on gmall-shaped fixtures (FIXTURES.md §A4/A5)."""

from __future__ import annotations

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.order_wide import (
    enrich_dims,
    interval_join,
    parse_order_facts,
)


@pytest.fixture(scope="module")
def facts(spark):
    infos = [
        {"id": 1, "user_id": 10, "province_id": 1, "order_status": "1001",
         "total_amount": 99.50, "create_time": "2024-01-15 10:00:00"},
        {"id": 2, "user_id": 11, "province_id": 2, "order_status": "1002",
         "total_amount": 10.00, "create_time": "2024-01-15 23:59:58"},
    ]
    details = [
        # within ±5 s of order 1 -> join hit (OrderWideApp.java:91)
        {"id": 100, "order_id": 1, "sku_id": 5, "sku_num": 2,
         "sku_name": "widget", "order_price": 49.75,
         "create_time": "2024-01-15 10:00:03"},
        # 8 s after order 2 -> join miss
        {"id": 101, "order_id": 2, "sku_id": 6, "sku_num": 1,
         "sku_name": "gadget", "order_price": 10.00,
         "create_time": "2024-01-16 00:00:06"},
    ]
    info_raw = spark.createDataFrame([(json.dumps(r),) for r in infos], ["value"])
    detail_raw = spark.createDataFrame(
        [(json.dumps(r),) for r in details], ["value"]
    )
    return parse_order_facts(info_raw, detail_raw)


def test_t3_derived_time_columns(facts):
    info, detail = facts
    r = {row["id"]: row for row in info.collect()}
    assert str(r[1]["create_date"]) == "2024-01-15"
    assert r[1]["create_hour"] == "10"
    assert r[2]["create_hour"] == "23"
    # money is decimal, not double (SURVEY.md §7.4.5)
    assert isinstance(r[1]["total_amount"], Decimal)
    # detail crossing midnight gets its own civil date
    d = {row["id"]: row for row in detail.collect()}
    assert str(d[101]["create_date"]) == "2024-01-16"


def test_interval_join_hit_and_miss(facts):
    info, detail = facts
    joined = interval_join(
        info,
        detail,
        left_key="id",
        right_key="order_id",
        left_ts="create_ts",
        right_ts="create_ts",
        lower_seconds=-5,
        upper_seconds=5,
    )
    rows = joined.collect()
    assert len(rows) == 1  # order 1 ⋈ detail 100 only
    assert rows[0]["sku_name"] == "widget"


def test_dim_enrichment_left_join(spark, facts):
    """J2 — missing dim rows keep the fact (left join), present dims patch
    the row (DimAsyncJoinFunction.join semantics)."""
    info, _ = facts
    users = spark.createDataFrame(
        [(10, 35, "F")], ["id", "user_age", "user_gender"]
    )
    provinces = spark.createDataFrame(
        [(1, "Beijing", "110000"), (2, "Shanghai", "310000")],
        ["id", "name", "area_code"],
    )
    wide = enrich_dims(
        info,
        [
            (users, "user_id", "id", ["user_age", "user_gender"]),
            (provinces, "province_id", "id", ["name"]),
        ],
    )
    r = {row["id"]: row for row in wide.collect()}
    assert r[1]["user_age"] == 35 and r[1]["name"] == "Beijing"
    # user 11 has no dim row -> nulls, fact preserved
    assert r[2]["user_age"] is None and r[2]["name"] == "Shanghai"


def test_dim_join_is_broadcast(spark, facts):
    info, _ = facts
    users = spark.createDataFrame([(10, 35)], ["id", "user_age"])
    wide = enrich_dims(info, [(users, "user_id", "id", ["user_age"])])
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
