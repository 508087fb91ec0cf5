"""ST3 — bounce (jump-out) detection, batch form via lead().

Reference (UserJumpDetailApp.java:58-120): Flink CEP keyed by mid — a
session-entry event (last_page_id null) followed either by ANOTHER entry
within 10 s (matched pattern: the first visit bounced) or by >= 10 s of
silence (timeout side output: also a bounce). Matched ∪ timeout is the bounce
stream; in both cases the emitted row is the FIRST entry event.

Batch parity (SURVEY.md §7.4.1): for each entry event, look at the next event
of the same key (any event, not just entries):
- if there is no next event within the window               -> timeout bounce
- if the next event within the window is itself an entry    -> matched bounce
- if the next event within the window is a non-entry page   -> NOT a bounce
  (the session continued).
One ``lead() over (partition by key order by ts)`` — a single shuffle.

Scale note (the bot-device mid skew, BaseLogApp.java:74): this operator is
ORDER-DEPENDENT per key — bounce needs every consecutive-event gap of the
key's full sequence on one task — so salting (operators/skew.py) cannot
apply: splitting a key's rows across tasks severs the adjacency the lead()
reads. The scale mitigation is upstream: drop pathological devices before
the shuffle with ``skew.hot_keys(events, key_col, share_threshold)``
(a bot emitting 40% of all events is not a visitor whose bounce rate you
want anyway). In the streaming form per-key STATE is constant (one pending
entry), so memory is safe regardless; only batch wall-clock needs the
filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def flag_bounce_batch(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    is_entry: Column,
    window_seconds: int = 10,
    order_cols: list | None = None,
) -> DataFrame:
    """Append ``is_entry``/``is_bounce`` boolean columns to every event.

    ``is_entry``: Column predicate marking session-entry events (the
    reference's ``last_page_id == null``, UserJumpDetailApp.java:88).
    ``window_seconds``: the CEP ``within`` window (:93, 10 s).
    ``ts_col`` must be a TimestampType column.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(F.col(key_col)).orderBy(*order)
    with_next = (
        events.withColumn("is_entry", is_entry)
        .withColumn("_next_ts", F.lead(F.col(ts_col)).over(w))
        .withColumn("_next_is_entry", F.lead(F.col("is_entry")).over(w))
    )
    gap = F.col("_next_ts").cast("double") - F.col(ts_col).cast("double")
    bounce = F.col("is_entry") & (
        F.col("_next_ts").isNull()                     # silence forever (timeout)
        | (gap > F.lit(float(window_seconds)))         # timeout bounce
        | F.col("_next_is_entry")                      # re-entry => first bounced
    )
    return with_next.withColumn("is_bounce", bounce).drop(
        "_next_ts", "_next_is_entry"
    )


def detect_bounce_batch(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    is_entry: Column,
    window_seconds: int = 10,
    order_cols: list | None = None,
) -> DataFrame:
    """Return only the bouncing session-entry events (the stream the
    reference sinks to dwm_user_jump_detail, UserJumpDetailApp.java:115-120).
    """
    flagged = flag_bounce_batch(
        events, key_col, ts_col, is_entry, window_seconds, order_cols
    )
    return flagged.filter(F.col("is_bounce")).drop("is_entry", "is_bounce")
