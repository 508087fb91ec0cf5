"""Bloom build/probe guarantees: zero false negatives, bounded bitmap,
shuffle-free probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.bloom import bloom_build, bloom_probe


class TestBloom:
    def test_no_false_negatives(self, spark):
        keys = spark.range(0, 200).select(F.col("id").alias("k"))
        bloom = bloom_build(keys, "k", n_bits=1024, k=3)
        probe = spark.range(0, 1000).select(F.col("id").alias("k"))
        passed = {r["k"] for r in bloom_probe(probe, bloom, "k", 1024, 3).collect()}
        assert set(range(200)) <= passed  # every built key must pass

    def test_bitmap_bounded(self, spark):
        keys = spark.range(0, 10000).select(F.col("id").alias("k"))
        bloom = bloom_build(keys, "k", n_bits=2048, k=3)
        assert bloom.count() <= 2048 // 32

    def test_small_filter_rejects_most_nonmembers(self, spark):
        keys = spark.range(0, 20).select(F.col("id").alias("k"))
        bloom = bloom_build(keys, "k", n_bits=4096, k=3)
        probe = spark.range(0, 5000).select(F.col("id").alias("k"))
        n = bloom_probe(probe, bloom, "k", 4096, 3).count()
        # 20 members + a handful of false positives at ~1.5% bit fill
        assert 20 <= n < 100

    def test_probe_side_never_shuffles(self, spark):
        keys = spark.range(0, 50).select(F.col("id").alias("k"))
        bloom = bloom_build(keys, "k", n_bits=1024, k=3)
        probe = spark.range(0, 500).select(F.col("id").alias("k"))
        plan = (
            bloom_probe(probe, bloom, "k", 1024, 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        # the only exchanges allowed are the broadcast ones (and the
        # bloom build's own aggregate); the probe range scan must not
        # hash-partition
        assert "Exchange hashpartitioning(k" not in plan
