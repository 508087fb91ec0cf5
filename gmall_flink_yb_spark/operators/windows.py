"""DWS-layer tumbling-window aggregation (§2.9 intended surface).

The reference declared the DWS layer (ClickHouse dep gmall-realtime/pom.xml:
151-165, SINK_TYPE_CK bean/TableProcess.java:10) but implemented none of it.
We provide the idiomatic Spark form: ``groupBy(window(ts, ...), dims).agg(...)``
— map-side partial aggregation + one shuffle; identical code runs on a
streaming DataFrame with a watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate, batch or streaming.

    ``aggs`` are already-aliased aggregate Columns. With ``watermark`` set and
    a streaming input, state for closed windows is dropped once the watermark
    passes (the reference's intended 10 s ClickHouse rollups, SURVEY.md §2.9).
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(
        F.window(F.col(ts_col), window_duration).alias("w"),
        *[F.col(c) for c in group_cols],
    ).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *rest,
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    slide_duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregate: each row contributes to
    window_duration/slide_duration overlapping windows (Spark expands them
    map-side; shuffle volume scales with the overlap factor — keep the ratio
    small at scale)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(
        F.window(F.col(ts_col), window_duration, slide_duration).alias("w"),
        *[F.col(c) for c in group_cols],
    ).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *rest,
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap_duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregate: windows close after ``gap_duration`` of
    per-key silence (F.session_window — dynamic, data-driven windows; in
    streaming the watermark finalizes sessions). Batch-equivalent SQL is the
    classic gaps-and-islands (lag + cumulative sum), which is what the
    DuckDB oracle runs."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(
        F.session_window(F.col(ts_col), gap_duration).alias("w"),
        *[F.col(c) for c in group_cols],
    ).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *rest,
    )
