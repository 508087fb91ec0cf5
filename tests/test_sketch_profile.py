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


class TestSaltedHashArm:
    """ADVICE r3: the j >= 4 salted-digest arm was dead under every
    shipped config (CM_DEPTH=4) and never parity-checked. Pin Spark /
    DuckDB agreement on the EXACT bucket values at depth=6 so a caller
    passing depth > 4 gets the same sketch both sides."""

    def test_depth6_buckets_match_duckdb(self, spark):
        import duckdb

        items = ["alpha", "beta", "gamma", "delta", "epsilon"]
        width = 64
        depth = 6
        df = spark.createDataFrame([(w,) for w in items], "token string")
        sk = count_min_build(df, "token", depth=depth, width=width)
        got = {(r["j"], r["bucket"]): r["cnt"] for r in sk.collect()}

        con = duckdb.connect()
        rows = con.execute(
            f"""
            WITH items AS (
              SELECT unnest({items!r}) AS token
            ), jb AS (
              SELECT j, CASE WHEN j < 4
                 THEN CAST(('0x' || substr(md5(token), 1 + 8*j, 8)) AS BIGINT)
                 ELSE CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || token), 1, 8)) AS BIGINT)
               END % {width} AS bucket
              FROM items, (SELECT unnest(generate_series(0, {depth - 1})) AS j)
            )
            SELECT j, bucket, count(*) AS cnt FROM jb GROUP BY 1, 2
            """
        ).fetchall()
        want = {(j, b): c for j, b, c in rows}
        assert got == want

    def test_bloom_k5_no_false_negatives_and_salted_positions_match(self, spark):
        import duckdb

        from gmall_flink_yb_spark.functions.bloom import (
            _bit_pos,
            bloom_build,
            bloom_probe,
        )
        from pyspark.sql import functions as F

        keys = spark.range(0, 100).select(F.col("id").alias("k"))
        n_bits, k = 1024, 5
        bloom = bloom_build(keys, "k", n_bits=n_bits, k=k)
        passed = {
            r["k"]
            for r in bloom_probe(
                spark.range(0, 300).select(F.col("id").alias("k")),
                bloom, "k", n_bits, k,
            ).collect()
        }
        assert set(range(100)) <= passed

        # position parity for the salted j=4 hash specifically
        pos = (
            keys.select(_bit_pos(F.col("k"), 4, n_bits).alias("p"))
            .collect()
        )
        got = [r["p"] for r in pos]
        con = duckdb.connect()
        want = [
            r[0]
            for r in con.execute(
                f"""
                SELECT CAST(('0x' || substr(md5('4:' || CAST(range AS VARCHAR)), 1, 8)) AS BIGINT) % {n_bits}
                FROM range(0, 100) ORDER BY range
                """
            ).fetchall()
        ]
        assert sorted(got) == sorted(want)
