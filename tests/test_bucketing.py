"""Bucketed-layout tests: the pre-shuffled-storage contract.

The property under test is THE 100 TB claim: once lineitem and orders are
bucketed on orderkey with equal bucket counts, their join and the
per-orderkey aggregate plan with ZERO shuffle exchanges — the layout write
paid the shuffle once so queries never do.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.bucketing import bucketed_scan, write_bucketed
from gmall_flink_yb_spark.plans.inspect import num_exchanges
from gmall_flink_yb_spark.sources.readers import read_table

_N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    """lineitem + orders bucketed on orderkey in a throwaway database
    (explicit LOCATION keeps test tables out of the repo's warehouse)."""
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{loc}'")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "buckdb.lineitem_b", _N_BUCKETS, ["l_orderkey"],
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "buckdb.orders_b", _N_BUCKETS, ["o_orderkey"],
                   sort_cols=["o_orderkey"])
    yield "buckdb.lineitem_b", "buckdb.orders_b", li, orders
    spark.sql("DROP DATABASE buckdb CASCADE")


def test_bucketed_fact_join_has_zero_exchanges(spark, bucketed_tables):
    li_t, o_t, _, _ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_scan(spark, li_t).join(
            bucketed_scan(spark, o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert num_exchanges(j) == 0, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_zero_exchanges(spark, bucketed_tables):
    """groupBy on the bucket key rides the same layout: no exchange before
    the final (already co-partitioned) aggregate."""
    li_t, _, _, _ = bucketed_tables
    agg = (
        bucketed_scan(spark, li_t)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert num_exchanges(agg) == 0


def test_unbucketed_baseline_does_shuffle(spark, bucketed_tables, sf_dir):
    """Control: the identical join over plain parquet reads DOES exchange —
    proving the zero above comes from the bucket layout, not the data size
    or some session conf."""
    _, _, li, orders = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert num_exchanges(j) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed_result(spark, bucketed_tables):
    li_t, o_t, li, orders = bucketed_tables
    got = (
        bucketed_scan(spark, li_t)
        .join(
            bucketed_scan(spark, o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        )
        .first()
    )
    exp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        )
        .first()
    )
    assert (got["n"], got["s"]) == (exp["n"], exp["s"])


def test_bypassing_the_catalog_loses_buckets(spark, bucketed_tables):
    """bucketed_scan's reason to exist: reading the same files without the
    catalog drops the bucket spec, and the join shuffles again."""
    li_t, o_t, _, _ = bucketed_tables
    li_loc = (
        spark.sql(f"DESCRIBE FORMATTED {li_t}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        raw = spark.read.parquet(li_loc)
        j = raw.join(
            bucketed_scan(spark, o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert num_exchanges(j) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mismatched_bucket_counts_reintroduce_shuffle(spark, sf_dir, tmp_path_factory):
    """The bucket count is a physical-layout CONTRACT: joining tables
    bucketed with different counts cannot co-locate, so Spark must plan
    an exchange again — the test documents why n_buckets is versioned
    with the table."""
    loc = tmp_path_factory.mktemp("buckdb2")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb2 LOCATION '{loc}'")
    try:
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        write_bucketed(li, "buckdb2.li_b4", 4, ["l_orderkey"])
        write_bucketed(orders, "buckdb2.o_b8", 8, ["o_orderkey"])
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed_scan(spark, "buckdb2.li_b4").join(
                bucketed_scan(spark, "buckdb2.o_b8"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            assert num_exchanges(j) >= 1, "mismatched buckets must shuffle"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE buckdb2 CASCADE")
