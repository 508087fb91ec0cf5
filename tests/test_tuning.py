"""Data-sized shuffle parallelism (VERDICT r7 #3): partitions derive from
estimated shuffle bytes, never from the box alone."""

from __future__ import annotations

import os

from gmall_flink_yb_spark.tuning import (
    GRAM_EXPANSION,
    PARTITIONS_MAX,
    TARGET_PARTITION_BYTES,
    estimate_parquet_bytes,
    partitions_for_bytes,
    size_shuffle_partitions,
)


def test_partitions_for_bytes_math():
    t = TARGET_PARTITION_BYTES
    assert partitions_for_bytes(0, lo=4) == 4          # floor wins
    assert partitions_for_bytes(t, lo=1) == 1          # exactly one target
    assert partitions_for_bytes(t + 1, lo=1) == 2      # ceil
    assert partitions_for_bytes(1000 * t, lo=4) == 1000
    assert partitions_for_bytes(10**18, lo=4) == PARTITIONS_MAX  # backstop


def test_estimate_and_size_from_real_parquet(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100_000).selectExpr(
        "id", "repeat('x', 100) as pad"
    ).write.parquet(p)
    n = estimate_parquet_bytes(spark, p)
    assert n == sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if not f.startswith(".")  # Hadoop's ChecksumFileSystem hides .crc
    )
    assert estimate_parquet_bytes(spark, str(tmp_path / "missing")) == 0

    before = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        # tiny input: floor at the session's current parallelism (the
        # helper only ever scales UP; AQE coalesces down at runtime)
        assert size_shuffle_partitions(spark, p) == before
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == before
        # force a scale-up: expansion such that the estimate crosses the
        # target several times over
        want_bytes = (before + 7) * TARGET_PARTITION_BYTES
        got = size_shuffle_partitions(spark, p, expansion=want_bytes / n)
        assert got >= before + 7
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == got
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(before))


def test_gram_expansion_reproduces_measured_1000x_point():
    """The calibration the constant encodes: ~0.7 GB of salted 1000x
    corpus parquet needed ~256 partitions (BASELINE.md: 32 was
    superlinear at 248 s, 256 at-linear at 129.8 s). The derived count
    must land in the same regime — hundreds, not tens or thousands."""
    parts = partitions_for_bytes(0.7e9 * GRAM_EXPANSION, lo=32)
    assert 128 <= parts <= 512
