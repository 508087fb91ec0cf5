"""Benchmark harness (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed through the noop sink so every output column is
materialized (a bare count() would let Catalyst prune the plan).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_yb_spark.functions.cacheutil import release_cache
from gmall_flink_yb_spark.queries import QUERIES
from gmall_flink_yb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("gmall-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query times measure the
    # queries, not session startup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # warm the Python workers too (daemon fork + pandas/numpy import is a
    # one-time ~10 s cost across 32 workers, not a property of any query)
    spark.range(1024).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # median-of-N per query (default 3): this box carries background load
    # that swings single runs 3-8x; the median is a robust, regression-
    # detectable estimate (best-of-N hides slowdowns that hit most runs).
    # The cache is cleared before every repeat so a query's own persist()
    # calls re-materialize each time — every repeat is a full cold-cache
    # execution; the median only removes load-spike noise.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name, fn in QUERIES.items():
        samples: list[float] = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink materializes EVERY column (count() would let
            # Catalyst prune the projections and under-report)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            release_cache(df)  # builder-owned persists, freed per repeat
        timings[name] = round(statistics.median(samples), 3)
        spreads[name] = [round(s, 3) for s in sorted(samples)]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs_per_query": runs,
                "estimator": "median",
                "samples": spreads,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
