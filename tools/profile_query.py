"""Per-stage empirical profile of registered queries (guide §1.1/§7.1).

Usage: python tools/profile_query.py q1,q2,... [--runs 2]

Runs each query exactly as bench.py does (construction + noop sink inside
the timed region, cold cache per run), with the Spark UI enabled, then
pulls the completed stages from the REST API and prints them sorted by
total task time: duration, task count, shuffle read/write, input bytes,
and the stage's callsite name. The LAST run's stages are attributed (the
first warms nothing away — every run is cold-cache — but the last run has
the fewest one-off JVM compilation effects).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_yb_spark.functions.cacheutil import release_cache
from gmall_flink_yb_spark.queries import QUERIES
from gmall_flink_yb_spark.session import get_spark


def _api(app: str, path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1].split(",")
    runs = 2
    for a in sys.argv[2:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = spark.sparkContext.applicationId
    # warm like bench.py
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(1024).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = QUERIES[name]
        walls = []
        for r in range(runs):
            spark.catalog.clearCache()
            pre_stages = {s["stageId"] for s in _api(app, "/stages")}
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            walls.append(wall)
            release_cache(df)
            last = (pre_stages, t_build, wall)
        pre_stages, t_build, wall = last
        stages = [
            s
            for s in _api(app, "/stages?status=complete")
            if s["stageId"] not in pre_stages
        ]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: walls={[round(w,2) for w in walls]} "
              f"(last: build={t_build:.2f}s total={wall:.2f}s, {len(stages)} stages)")
        shown = 0
        for s in stages:
            rt = (s.get("executorRunTime") or 0) / 1000.0
            if rt < 0.05 and shown >= 12:
                break
            shown += 1
            dur = "-"
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                pass
            nm = (s.get("name") or "")[:70]
            print(
                f"  run={rt:7.2f}s tasks={s['numCompleteTasks']:4d} "
                f"in={s.get('inputBytes',0)/1e6:8.1f}MB "
                f"sr={s.get('shuffleReadBytes',0)/1e6:8.1f}MB "
                f"sw={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
