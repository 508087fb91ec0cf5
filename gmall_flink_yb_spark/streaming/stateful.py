"""Keyed stateful streaming operators (applyInPandasWithState).

These are the ONLY two places the engine needs true per-key streaming state;
everything else in the reference maps to declarative Structured Streaming
(SURVEY.md §7.3). Both operators take a FLAT event frame (key/ts plus scalar
columns) — flatten nested structs before calling.

Scale notes: state per key is tiny (one flag / one pending timestamp), keys
shard across executors by hash, and the bounce operator's state is
watermark-bounded — every pending entry either resolves on the next event or
is evicted by its event-time timer, so state size is O(active sessions), not
O(history). This is exactly the bounded-state discipline the reference's ST1
lacks (unbounded ValueState per device, BaseLogApp.java:80-82; SURVEY.md §4.2).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType, TimestampType


def correct_is_new_stream(
    events: DataFrame,
    key_col: str = "mid",
    ts_col: str = "ts",
    is_new_col: str = "is_new",
) -> DataFrame:
    """ST1 streaming — per-device new-visitor correction.

    Reference: BaseLogApp.java:73-101 — keyed ValueState per ``common.mid``;
    if ``is_new == "1"`` but state exists, rewrite to "0"; else record state.
    Here: grouped state holds one "seen" flag per device; within a micro-batch
    rows are ordered by event time so only the key's first-ever event may keep
    is_new = "1" (identical to the batch form in operators.visitor).

    Output = input columns + ``is_new_fixed``.
    """
    out_schema = StructType(
        list(events.schema.fields) + [StructField("is_new_fixed", StringType())]
    )
    cols = [f.name for f in out_schema.fields]

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        pdf["is_new_fixed"] = "0"
        if not state.exists and str(pdf.loc[0, is_new_col]) == "1":
            pdf.loc[0, "is_new_fixed"] = "1"
        state.update((1,))
        yield pdf[cols]

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen integer",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def detect_bounce_stream(
    events: DataFrame,
    key_col: str = "mid",
    ts_col: str = "ts",
    entry_col: str = "is_entry",
    window_seconds: int = 10,
) -> DataFrame:
    """ST3 streaming — CEP bounce detection with event-time timeout.

    Reference (UserJumpDetailApp.java:58-120): keyed by mid, a session-entry
    event bounces if the next event for the key is either another entry
    within 10 s (matched pattern) or silence past 10 s (PatternTimeoutFunction
    side output); matched ∪ timeout is the output, always emitting the FIRST
    entry event. Decision table mirrored from operators.bounce (batch form):

    - next event within window, is entry      -> matched bounce
    - next event within window, not an entry  -> no bounce (session continued)
    - next event past window / no next event  -> timeout bounce

    The timeout case uses a per-key event-time timer at pending_ts + window —
    the exact analogue of Flink CEP's watermark-driven timeout emission. The
    input MUST have ``withWatermark(ts_col, ...)`` applied (the reference uses
    1 s bounded out-of-orderness, UserJumpDetailApp.java:60-67).

    Output: (key, ts) of each bouncing entry event.
    """
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
        ]
    )
    win = float(window_seconds)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mid = key[0]

        def emit(ts_list: list[float]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    key_col: [mid] * len(ts_list),
                    ts_col: pd.to_datetime(ts_list, unit="s"),
                }
            )

        if state.hasTimedOut:
            # watermark passed pending + window with no newer event: the
            # PatternTimeoutFunction side-output case (:99-111)
            pending = state.get[0] if state.exists else None
            state.remove()
            if pending is not None:
                yield emit([pending])
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        pending = state.get[0] if state.exists else None
        bounced: list[float] = []
        for ts_val, entry in zip(pdf[ts_col], pdf[entry_col]):
            ts_s = ts_val.timestamp()
            if pending is not None:
                gap = ts_s - pending
                if gap > win:
                    bounced.append(pending)  # timeout bounce
                elif entry:
                    bounced.append(pending)  # matched bounce (re-entry)
                pending = None  # non-entry within window: session continued
            if entry and pending is None:
                pending = ts_s
        if pending is not None:
            state.update((pending,))
            deadline_ms = int(pending * 1000) + int(win * 1000)
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        if bounced:
            yield emit(bounced)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="pending double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
