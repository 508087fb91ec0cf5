"""Ad-hoc per-query wall measurement, bench.py-identical methodology.

Usage: python tools/measure_queries.py q1,q2,... [--runs N]

Runs each named registered query ``--runs`` times (default 5) in
registry-interleaved order (q1 q2 ... q1 q2 ...) with a cold cache per
repeat and the noop sink, exactly like bench.py's timed region, and
prints one JSON line {"queries": {name: {"samples": [...], "min": s,
"median": s}}, "tide": {...}}. Interleaving spreads window drift across
the arms instead of concentrating it in one query's samples.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import tide_probe
from gmall_flink_yb_spark.functions.cacheutil import release_cache
from gmall_flink_yb_spark.queries import QUERIES
from gmall_flink_yb_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    runs = 5
    for i, a in enumerate(sys.argv[2:], start=2):
        if a == "--runs":
            runs = int(sys.argv[i + 1])
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "measure", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(1024).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    pre = tide_probe()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"measure:{n}")
            t0 = time.time()
            df = QUERIES[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.time() - t0, 3))
            release_cache(df)
    out = {
        "queries": {
            n: {
                "samples": s,
                "min": min(s),
                "median": round(statistics.median(s), 3),
            }
            for n, s in samples.items()
        },
        "tide": {"pre": pre, "post": tide_probe()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
