"""Count-min sketch guarantees + one-pass profiler semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.profile import profile_columns
from gmall_flink_yb_spark.functions.sketch import (
    count_min_build,
    count_min_estimate,
)


class TestCountMin:
    def test_overestimate_and_bounded_state(self, spark):
        rows = [(w,) for w in ["a"] * 50 + ["b"] * 20 + ["c"] * 5]
        df = spark.createDataFrame(rows, "token string")
        sketch = count_min_build(df, "token", depth=4, width=8)
        assert sketch.count() <= 4 * 8
        est = {
            r["token"]: r["est_count"]
            for r in count_min_estimate(
                df.distinct(), sketch, "token", depth=4, width=8
            ).collect()
        }
        exact = {"a": 50, "b": 20, "c": 5}
        for t, n in exact.items():
            assert est[t] >= n  # the count-min guarantee

    def test_exact_when_no_collisions(self, spark):
        # 3 tokens in a wide sketch: collisions essentially impossible,
        # so every estimate must be exact
        rows = [(w,) for w in ["x"] * 7 + ["y"] * 3 + ["z"] * 11]
        df = spark.createDataFrame(rows, "token string")
        sketch = count_min_build(df, "token", depth=4, width=4096)
        est = {
            r["token"]: r["est_count"]
            for r in count_min_estimate(
                df.distinct(), sketch, "token", depth=4, width=4096
            ).collect()
        }
        assert est == {"x": 7, "y": 3, "z": 11}


class TestProfile:
    def test_metrics_with_nulls(self, spark):
        df = spark.createDataFrame(
            [(1, "aa"), (2, None), (3, "bb"), (3, "aa")],
            "id long, s string",
        )
        out = {r["column"]: r for r in profile_columns(df).collect()}
        assert out["id"]["n_rows"] == 4
        assert out["id"]["n_nulls"] == 0
        assert out["id"]["n_distinct"] == 3
        assert out["id"]["min_repr"] == "1"
        assert out["id"]["max_repr"] == "3"
        assert out["s"]["n_nulls"] == 1
        assert out["s"]["n_distinct"] == 2
        assert out["s"]["sum_len"] == 6

    def test_float_rejected(self, spark):
        df = spark.createDataFrame([(1.5,)], "x double")
        with pytest.raises(ValueError, match="no profilable"):
            profile_columns(df)  # default skips floats -> nothing left
        with pytest.raises(ValueError, match="float-typed"):
            profile_columns(df, ["x"])

    def test_single_scan_plan(self, spark, sf_dir):
        from gmall_flink_yb_spark.queries import QUERIES

        df = QUERIES["profile_documents"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one parquet scan feeds every metric
        assert plan.count("Scan parquet") == 1
