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


def test_enrich_dims_shuffle_hash_fallback(spark, sf_dir):
    """J2 size fallback (SURVEY §4.2): strategy='shuffle_hash' plans a
    ShuffledHashJoin instead of broadcasting — the path for dims too big
    for executor memory."""
    from gmall_flink_yb_spark.operators.order_wide import enrich_dims
    from gmall_flink_yb_spark.plans.inspect import join_strategies
    from gmall_flink_yb_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    df = enrich_dims(
        orders, [(cust, "o_custkey", "c_custkey", ["c_name"])],
        strategy="shuffle_hash",
    )
    assert "ShuffledHashJoin" in join_strategies(df)
    bcast = enrich_dims(
        orders, [(cust, "o_custkey", "c_custkey", ["c_name"])],
        strategy="broadcast",
    )
    assert set(join_strategies(bcast)) == {"BroadcastHashJoin"}
    assert df.count() == bcast.count()


def test_pluggable_segmenter_udf(spark):
    """Keyword analysis with a custom segmentation UDF (the IK-analyzer
    slot): a toy bigram segmenter for spaceless text."""
    from gmall_flink_yb_spark.operators.keywords import (
        keyword_counts,
        make_segmenter_udf,
    )

    def bigrams(s: str) -> list[str]:
        return [s[i : i + 2] for i in range(0, len(s) - 1)]

    df = spark.createDataFrame([("abcd",), ("bcde",)], ["text"])
    seg = make_segmenter_udf(bigrams)
    got = {
        r["token"]: r["token_count"]
        for r in keyword_counts(df, "text", tokenizer=seg).collect()
    }
    assert got == {"ab": 1, "bc": 2, "cd": 2, "de": 1}


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
