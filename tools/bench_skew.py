"""Skew stress: one hot join key vs AQE skew-split vs explicit salting.

The scenario the 100 TB design must survive: a fact table where ONE key
holds a large share of all rows (the reference's bot-device exposure,
BaseLogApp.java:74 keyBy(mid)). This harness builds a replicated lineitem
(--replicas, default 10 -> 6M rows) and remaps --hot-share (default 0.4)
of all rows onto a single orderkey, then times the lineitem ⋈ orders
revenue aggregation three ways:

  plain_skew_off   sort-merge join, AQE skew-split disabled — the
                   straggler baseline: one reducer gets 40% of the fact
  plain_skew_on    the session default — AQE splits the oversized
                   partition and replicates the matching build partition
  salted           operators.skew.salted_join(buckets) — key spread over
                   ``buckets`` reducers regardless of planner support,
                   with the WHOLE build side replicated buckets times
                   (the pre-r7 form)
  salted_hotcold   the production form (VERDICT r6 #1): only rows on the
                   hot key are salted, only that key's build rows
                   replicate (#hot_keys x buckets rows), cold rows take
                   the plain join

The build side is forced OFF the broadcast path (runtime threshold -1 in
the comparison sessions): at bench scale orders would happily broadcast,
but at the design scale the dim-sized assumption fails for fact-fact
joins — the whole point of skew handling. Prints one JSON line.

Run: python tools/bench_skew.py [--replicas 10] [--hot-share 0.4]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.skew import salted_join
from gmall_flink_yb_spark.session import get_spark
from gmall_flink_yb_spark.sources.readers import read_table

HOT_KEY = 7  # an existing orderkey; all remapped rows land here


def build_skewed(spark, sf_dir: str, replicas: int, hot_share: float):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    reps = li
    for r in range(1, replicas):
        reps = reps.unionByName(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * 10_000_000)
            )
        )
    # deterministic remap: a hash slice of rows moves to the hot key
    skewed = reps.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_extendedprice"), 1000)
            < int(hot_share * 1000),
            F.lit(HOT_KEY).cast("long"),
        ).otherwise(F.col("l_orderkey")),
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    o_reps = orders
    for r in range(1, replicas):
        o_reps = o_reps.unionByName(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(r * 10_000_000)
            )
        )
    return skewed, o_reps


def run_once(spark, facts, orders, mode: str) -> float:
    spark.catalog.clearCache()
    t0 = time.time()
    if mode == "salted":
        joined = salted_join(
            facts, orders, "l_orderkey", "o_orderkey", buckets=32
        )
    elif mode == "salted_hotcold":
        joined = salted_join(
            facts, orders, "l_orderkey", "o_orderkey", buckets=32,
            hot_keys=[HOT_KEY],
        )
    else:
        joined = facts.join(
            orders, facts["l_orderkey"] == orders["o_orderkey"]
        )
    (
        joined.groupBy("o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("rev")
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--hot-share", type=float, default=0.4)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    out = {}
    for mode, skew_conf in (
        ("plain_skew_off", "false"),
        ("plain_skew_on", "true"),
        ("salted", "true"),
        ("salted_hotcold", "true"),
    ):
        spark = get_spark(f"bench-skew-{mode}")
        spark.sparkContext.setLogLevel("ERROR")
        # force the build side off the broadcast path: at design scale a
        # fact-fact join's build side does not fit an executor
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_conf)
        facts, orders = build_skewed(
            spark, args.sf_dir, args.replicas, args.hot_share
        )
        samples = [
            run_once(spark, facts, orders, mode) for _ in range(args.runs)
        ]
        out[mode] = round(statistics.median(samples), 2)
        print(f"# {mode}: {out[mode]:.2f}s {samples}", file=sys.stderr)
        spark.stop()
    print(
        json.dumps(
            {
                "replicas": args.replicas,
                "hot_share": args.hot_share,
                "runs": args.runs,
                **out,
            }
        )
    )


if __name__ == "__main__":
    main()
