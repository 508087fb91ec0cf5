"""Dump .explain("formatted") for every registered query to a directory.

Usage: python tools/dump_plans.py <outdir> [suffix] [--only a,b,c]

Writes <outdir>/<query>_<suffix>.txt (suffix defaults to "before") and
prints one summary line per query: #Exchange, join node kinds, any
Python-eval nodes — the triage columns of the optimization guide §7.2.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_yb_spark.functions.cacheutil import release_cache
from gmall_flink_yb_spark.queries import QUERIES
from gmall_flink_yb_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = args[0]
    suffix = args[1] if len(args) > 1 else "before"
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "plan-dump", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in QUERIES.items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(\w*Join\w*|CartesianProduct)", plan))
        )
        py = sorted(
            set(
                re.findall(
                    r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|AggregateInPandas)",
                    plan,
                )
            )
        )
        print(
            f"{name}: exch={n_ex} joins={','.join(joins) or '-'} py={','.join(py) or '-'}"
        )
        release_cache(df)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
