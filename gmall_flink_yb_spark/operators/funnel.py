"""Funnel conversion + retention cohorts — the ADS-layer metrics the
reference's warehouse layering points at but never implements
(SURVEY.md §2.9; the reference stops at DWM, its dws/ads packages are
empty — gmall-realtime/src/main/java/com/yb/gmall/app has no dws/ads).
These are the two canonical ADS queries every gmall-style tutorial
builds next, so they belong to the engine's query surface.

Funnel semantics (strict order, per user): step k counts a user iff they
produced step-k's event AFTER their first qualifying step-(k-1) event and
within ``window_seconds`` of their FIRST step-1 event. "First qualifying"
is the classic min-timestamp propagation:

    t1 = min ts of step1
    tk = min ts of step-k events with ts > t(k-1) and ts <= t1 + window

Scale design (100 TB):
- The whole funnel is ONE shuffle on user_id: the chained ``min over
  (partition by user)`` windows all reuse the same Exchange (no re-sort
  between them — same partitioning, same (empty) ordering), then the
  final counts are a partial-aggregated global sum. Per-user state is two
  timestamps per step, never the event list.
- Retention is one shuffle on user_id (first-day aggregate) plus one
  co-partitioned self-join on user_id (AQE reuses the partitioning) and a
  partial-aggregated count per (cohort, offset). State per user is one
  date. No collect, no skew hazard beyond a hot user_id, which salted_agg
  (operators/skew.py) covers if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Strict-order funnel over an event log.

    Returns one row per step: (step_index, step_name, users) where
    ``users`` counts distinct users whose first-qualifying chain reached
    that step within ``window_seconds`` of their first step-1 event.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps}")
    w = Window.partitionBy(user_col)
    ts = F.col(ts_col)
    df = events.select(user_col, ts_col, type_col).withColumn(
        "_t1", F.min(F.when(F.col(type_col) == steps[0], ts)).over(w)
    )
    deadline = F.col("_t1") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
    prev = "_t1"
    for i, step in enumerate(steps[1:], start=2):
        cur = f"_t{i}"
        df = df.withColumn(
            cur,
            F.min(
                F.when(
                    (F.col(type_col) == step)
                    & (ts > F.col(prev))
                    & (ts <= deadline),
                    ts,
                )
            ).over(w),
        )
        prev = cur
    # one row per user (any row of the group carries all the _tk columns)
    per_user = df.groupBy(user_col).agg(
        *[F.first(f"_t{i}").alias(f"_t{i}") for i in range(1, len(steps) + 1)]
    )
    counts = per_user.agg(
        *[
            F.count(f"_t{i}").cast("long").alias(f"_c{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # unpivot the single counts row into (step_index, step_name, users)
    return counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("step_index"),
                        F.lit(s).alias("step_name"),
                        F.col(f"_c{i}").alias("users"),
                    )
                    for i, s in enumerate(steps, start=1)
                ]
            )
        ).alias("_s")
    ).select("_s.*")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int = 30,
) -> DataFrame:
    """Classic cohort retention: group users by their first active date,
    then count how many are active again ``day_offset`` days later.

    Returns (cohort_date string, day_offset int, active_users long) with
    day_offset 0 = the cohort's size.
    """
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    active = events.select(
        F.col(user_col).alias("_u"), F.to_date(day).alias("_d")
    ).distinct()
    first = active.groupBy("_u").agg(F.min("_d").alias("_cohort"))
    joined = active.join(first, "_u").withColumn(
        "_off", F.datediff(F.col("_d"), F.col("_cohort"))
    )
    return (
        joined.filter(F.col("_off") <= max_offset_days)
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_date"),
            F.col("_off").cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("_u").cast("long").alias("active_users"))
    )
