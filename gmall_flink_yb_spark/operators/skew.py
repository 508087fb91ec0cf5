"""Explicit key-salting for skewed joins and aggregations.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only applies to sort-merge
joins and can't help when one logical key is so hot that a single key's rows
overflow an executor (the reference's ``keyBy(mid)`` pipelines have exactly
this exposure: one bot device = one Flink subtask melting,
BaseLogApp.java:74). These operators make the mitigation explicit:

- salted_join: fact keys get a random salt in [0, buckets); the (small but
  not broadcastable) build side is replicated buckets times with every salt
  value. The join key becomes (key, salt), so a hot key's rows spread over
  ``buckets`` reducers. Replication cost: build side x buckets — use for
  mid-sized build sides; tiny sides should just broadcast.
- salted_agg: two-phase aggregation — partial agg on (key, salt), final agg
  on key. Spark's hash aggregate already does map-side partial aggregation,
  so this only wins for algebraic aggs whose partial states are large
  (e.g. collect_set) or under extreme single-key skew.

WHEN to reach for these (the documented threshold, exercised by
tests/test_merge_skew.py): salt once a single key's row share exceeds
~1/shuffle_partitions — at that point the key's reducer is the whole
stage's straggler bound and AQE cannot split it further (skew-split works
on partitions, not keys: a partition holding ONE giant key is
unsplittable). Below that share, leave it to AQE's skew-join/partition
splitting; above it, buckets ~= ceil(key_share * shuffle_partitions * 2)
spreads the key back to average-partition size. For keyed-state streaming
(uv/bounce), the same hot device is bounded per-key by CONSTANT state
(one flag / one pending ts), so throughput skews but memory does not —
mitigate upstream by dropping bot devices, the reference's exposure
(BaseLogApp.java:74).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the fact side salted and the build side replicated
    ``buckets`` times, spreading each hot key over ``buckets`` tasks.
    Output columns = fact columns + build columns (minus the build key).

    Only inner/left joins are valid: an outer-preserved build row exists
    ``buckets`` times after replication, so right/full joins would emit
    every unmatched build record ``buckets`` times."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(the replicated build side would duplicate outer-preserved rows)"
        )
    salted_facts = facts.withColumn(
        "_salt", (F.rand(seed=42) * buckets).cast("int")
    )
    replicated = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    cond = (salted_facts[fact_key] == replicated[build_key]) & (
        salted_facts["_salt"] == replicated["_salt"]
    )
    return (
        salted_facts.join(replicated, cond, how)
        .drop(replicated["_salt"])
        .drop(replicated[build_key])
        .drop("_salt")
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for decomposable aggregates.

    ``aggs`` maps output name -> partial aggregate Column (must be
    re-aggregable by SUM at the final phase, e.g. count/sum)."""
    partial = (
        df.withColumn("_salt", (F.rand(seed=42) * buckets).cast("int"))
        .groupBy(*key_cols, "_salt")
        .agg(*[c.alias(f"_p_{name}") for name, c in aggs.items()])
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in aggs]
    )
