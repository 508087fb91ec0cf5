"""P1 — 3-way log-stream split (start / page / display).

Reference: BaseLogApp.java:103-142 — `start != null` goes to a start side
output; everything else is a page event; each element of `displays[]` is
enriched with the parent's page_id and emitted as its own display row
(:121-131). `explode` is the array-unnest primitive.

Scale note: the three outputs are filters/projections off ONE parsed frame —
no shuffle at all; in streaming, fan out inside a single foreachBatch with
``persist()`` so the source is read once (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_log_stream(events: DataFrame) -> dict[str, DataFrame]:
    """Split a parsed log-event DataFrame (LOG_EVENT_SCHEMA) into
    {"start", "page", "display"} exactly as BaseLogApp.java:103-142.

    - start: rows whose ``start`` struct is present (:112-115)
    - page:  the rest (:118)
    - display: page rows unnested over ``displays``, each display enriched
      with the parent ``page_id`` (:121-131) plus ``mid``/``ts`` for keys.
    """
    start = events.filter(F.col("start").isNotNull())
    page = events.filter(F.col("start").isNull())
    display = (
        page.filter(F.col("displays").isNotNull() & (F.size("displays") > 0))
        .select(
            F.col("common"),
            F.col("page.page_id").alias("page_id"),
            F.col("ts"),
            F.explode("displays").alias("display"),
        )
        .select(
            "common",
            "page_id",
            "ts",
            F.col("display.display_type").alias("display_type"),
            F.col("display.item").alias("item"),
            F.col("display.item_type").alias("item_type"),
            F.col("display.order").alias("order"),
        )
    )
    return {"start": start, "page": page, "display": display}
