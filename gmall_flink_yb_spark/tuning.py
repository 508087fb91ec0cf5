"""Data-sized shuffle parallelism (VERDICT r7 #3).

``session.get_spark`` sizes ``spark.sql.shuffle.partitions`` from CPU
count — right for a fixed bench box, wrong as data scales: the 1000x
substring-dedup run went superlinear at the 32-partition session default
(248 s — per-partition window sorts outgrew memory and spilled
pathologically) and returned to at-linear at 256 (129.8 s,
BASELINE.md). The repo's stated rule, "size shuffle partitions so sorts
fit in memory", is enforced by this module instead of by hand-passed
knobs:

    partitions = estimated shuffle bytes / target partition bytes,
    clamped to [current session parallelism, PARTITIONS_MAX]

Shuffle bytes are estimated as PARQUET SCAN BYTES x an operator
EXPANSION factor, because the scan size is what a caller can know
cheaply (one filesystem metadata call — no data read, no Spark job) and
the expansion is a property of the operator family:

- Parquet's columnar compression alone is ~3x for text.
- Row-exploding operators multiply further: the span-removal gram
  stream carries ~44 B per token (32-hex md5 + pos + doc_id) where the
  raw text spends ~6 B — with decompression that is the ~20x end-to-end
  expansion ``GRAM_EXPANSION`` encodes (calibrated on the measured
  1000x point: ~0.7 GB of salted corpus parquet needed ~256 partitions
  at the 64 MB target).

On a real cluster the same arithmetic holds per-executor: 64 MB
post-expansion partitions keep any window/sort/hash state far inside a
multi-GB task heap while staying coarse enough that task-launch overhead
never dominates. AQE coalesces DOWN when the estimate overshoots (small
actual shuffles merge back to fewer partitions at runtime), so the cost
of overestimating is near zero; underestimating is the failure mode this
module exists to prevent — AQE cannot SPLIT a sort partition that
already outgrew memory mid-task.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# post-expansion bytes one shuffle partition should hold: sorts/hash maps
# of this size fit comfortably in task memory at default executor sizing
TARGET_PARTITION_BYTES = 64 * 1024 * 1024
# backstop against degenerate estimates (a million-partition shuffle is
# scheduler abuse, not parallelism)
PARTITIONS_MAX = 20_000

# measured end-to-end expansion of the token-gram explosion over text
# parquet (decompression ~3x, then ~44 B/token gram rows vs ~6 B/token
# raw text); see module docstring for the 1000x calibration point
GRAM_EXPANSION = 20.0


def estimate_parquet_bytes(spark: SparkSession, *paths: str) -> int:
    """Total on-disk bytes under ``paths`` via the Hadoop filesystem —
    one metadata call per path, no data read, cluster-correct for any
    scheme (local, HDFS, S3A). Missing paths count zero (a caller sizing
    for an about-to-be-written corpus passes its inputs instead)."""
    total = 0
    for p in paths:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            total += int(fs.getContentSummary(jpath).getLength())
    return total


def partitions_for_bytes(
    n_bytes: float,
    target_bytes: int = TARGET_PARTITION_BYTES,
    lo: int = 1,
    hi: int = PARTITIONS_MAX,
) -> int:
    """ceil(n_bytes / target), clamped to [lo, hi]."""
    import math

    return max(lo, min(hi, math.ceil(max(n_bytes, 1) / target_bytes)))


def size_shuffle_partitions(
    spark: SparkSession,
    *paths: str,
    expansion: float = 1.0,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int:
    """Set ``spark.sql.shuffle.partitions`` from the data: scan bytes of
    ``paths`` x ``expansion`` / ``target_bytes``, floored at the session's
    CURRENT setting (the box-parallelism default — this helper only ever
    scales UP; scaling down is AQE coalescing's job at runtime). Returns
    the value set. Runtime conf: applies to plans built afterwards."""
    current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = partitions_for_bytes(
        estimate_parquet_bytes(spark, *paths) * expansion,
        target_bytes=target_bytes,
        lo=current,
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts
