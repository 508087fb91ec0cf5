"""merge_wide (PaymentWide-style null-coalescing merge) and explicit
skew-salting operators: salted forms must equal their unsalted answers."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.merge_wide import merge_wide
from gmall_flink_yb_spark.operators.skew import salted_agg, salted_join


def test_merge_wide_null_coalescing(spark):
    left = spark.createDataFrame(
        [Row(order_id=1, user_name=None, amount=10.0),
         Row(order_id=2, user_name="bea", amount=None)],
    )
    right = spark.createDataFrame(
        [Row(order_id=1, user_name="ann", pay_type="card"),
         Row(order_id=2, user_name="IGNORED", pay_type="cash"),
         Row(order_id=3, user_name="cal", pay_type="wire")],
    )
    got = {r["order_id"]: r for r in merge_wide(left, right, ["order_id"]).collect()}
    assert got[1]["user_name"] == "ann"      # left null -> patched from right
    assert got[2]["user_name"] == "bea"      # left wins when present
    assert got[1]["amount"] == 10.0          # left-only column passes through
    assert got[2]["pay_type"] == "cash"      # right-only column passes through
    assert got[3]["user_name"] == "cal"      # full-outer keeps right-only keys
    assert got[3]["amount"] is None


def test_salted_join_matches_plain_join(spark, sf_dir):
    from gmall_flink_yb_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    plain = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).groupBy("c_nationkey").count()
    salted = salted_join(
        orders, cust, "o_custkey", "c_custkey", buckets=8
    ).groupBy("c_nationkey").count()
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    from gmall_flink_yb_spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], float(r["qty"]))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], float(r["qty"]))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": F.count(F.lit(1)), "qty": F.sum("l_quantity")},
            buckets=8,
        ).collect()
    }
    assert salted == plain
