"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes every
implemented operator from SURVEY.md §2 (+ the LLM-pipeline surface) as
(spark, sf_dir) -> DataFrame callables; ``oracle_sql()`` gives the DuckDB
equivalents. MinHash, SimHash, SRP-LSH, IVF (registered at its provably
exact n_probe == n_centroids point), and the multimodal feature dedup all
run portable md5-derived parameterizations that DuckDB reproduces
bit-for-bit, so every approximate operator is fully oracle-checked —
including ``uv_daily_approx``: the HLL estimate itself is engine-internal,
so its registered form emits the exact count plus a within-3-sigma boolean
the oracle asserts TRUE, making even the sketch's accuracy contract a
hash-gated check. Iterative training loops (spherical k-means, BPE
tokenizer learning + encode) are hash-gated too: their oracles replay the
full trajectory — every centroid update / merge argmax / regex pass — in
unrolled (materialized) SQL. Every entry in ``queries()`` has an
``oracle_sql()`` row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_yb_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: daily unique visitors
    (ST2 dedup semantics — SURVEY.md §7.1's minimum end-to-end slice)."""
    return QUERIES["uv_daily"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
