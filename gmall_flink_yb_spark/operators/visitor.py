"""ST1 new-visitor correction + ST2 daily-UV dedup (batch forms).

Streaming forms live in gmall_flink_yb_spark.streaming.stateful.

Reference:
- ST1 (BaseLogApp.java:73-101): keyed ValueState per device mid; if
  ``is_new == "1"`` but the device was seen before, rewrite to "0". Batch
  equivalent: an event is genuinely new iff it is the FIRST event for its key
  — ``min(ts) over (partition by key)`` (tie-broken by a row id so the answer
  is deterministic when two events share the min ts).
- ST2 (UniqueVisitApp.java:53-102): keyed last-seen-date state, TTL 24 h; keep
  only session-entry rows (last_page_id null/empty, :78-81) whose stored date
  differs (:84-93) — i.e. the first session entry per device per civil day.
  Batch equivalent: ``row_number() over (partition by key, date order by ts)=1``.
  (We key on civil date rather than a processing-time TTL — documented
  deliberate improvement, SURVEY.md §7.4.2.)

Scale note: ST1 is a single hash-shuffle window function on the key. ST2
defaults to a min_by hash AGGREGATE (strategy="agg"): its map-side partial
merge collapses hot mids before the shuffle, so bot-device skew
(BaseLogApp.java:74's keyBy(mid) exposure) never reaches a reducer — see
``unique_visitors_batch``'s strategy docstring and operators/skew.py for
the decision rule the join paths use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def correct_is_new_batch(
    events: DataFrame,
    key_col: str = "common.mid",
    ts_col: str = "ts",
    is_new_col: str = "common.is_new",
    row_id_col: str | None = None,
) -> DataFrame:
    """ST1 — add ``is_new_fixed``: "1" only on the key's first event.

    Mirrors the intended semantics of BaseLogApp.java:87-98 (state exists =>
    rewrite "1" to "0"); in batch the first-ever event for the key is the one
    allowed to keep is_new = "1".
    """
    order = [F.col(ts_col)]
    if row_id_col:
        order.append(F.col(row_id_col))
    w = Window.partitionBy(F.col(key_col)).orderBy(*order)
    rn = F.row_number().over(w)
    return events.withColumn(
        "is_new_fixed",
        F.when((F.col(is_new_col) == "1") & (rn == 1), "1").otherwise("0"),
    )


def unique_visitors_batch(
    events: DataFrame,
    key_col: str = "common.mid",
    ts_col: str = "ts",
    entry_filter=None,
    date_col=None,
    order_cols: list | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """ST2 — keep the first session-entry per (key, civil day).

    ``entry_filter``: optional Column predicate selecting session entries
    (the reference keeps rows with null/empty last_page_id,
    UniqueVisitApp.java:78-81). ``date_col``: Column for the civil date
    (defaults to ``to_date(ts_col)``).

    ``strategy`` (VERDICT r5 #3 — the uv mid-key skew path): the default
    "agg" computes the argmin as ``min_by(whole_row, (ts, *order_cols))``
    under a hash aggregate, whose MAP-SIDE partial merge collapses a hot
    key to one row per map task before the shuffle — a 40%-hot bot mid
    arrives at its reducer as <= n_map_tasks rows instead of 40% of the
    data, so the operator is skew-immune WITHOUT salting (and without the
    per-key full sort the window form pays). "window" keeps the
    row_number() formulation (same answer; useful when the plan already
    carries the (key, date) sort for a neighboring window).
    """
    if strategy not in ("agg", "window"):
        raise ValueError(f"unknown uv strategy {strategy!r}")
    df = events if entry_filter is None else events.filter(entry_filter)
    the_date = date_col if date_col is not None else F.to_date(F.col(ts_col))
    df = df.withColumn("_uv_date", the_date)
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    if strategy == "agg":
        payload = F.struct(*[F.col(c) for c in df.columns])
        return (
            df.groupBy(F.col(key_col).alias("_k"), F.col("_uv_date").alias("_d"))
            .agg(F.min_by(payload, F.struct(*order)).alias("_row"))
            .select("_row.*")
        )
    w = Window.partitionBy(F.col(key_col), F.col("_uv_date")).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
