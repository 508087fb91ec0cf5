"""SQL views: every pipeline exposed to spark.sql (§2.9 'Flink SQL layer').

The reference declared the Blink planner and never called it; here the same
DataFrame logic IS the SQL surface — register_views materializes nothing,
it just names the logical plans, so ad-hoc SQL over DWD/DWM outputs gets
the identical Catalyst optimization as the Python API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gmall_flink_yb_spark.functions.dedup import exact_dedup
from gmall_flink_yb_spark.functions.profile import profile_columns
from gmall_flink_yb_spark.functions.text import quality_features
from gmall_flink_yb_spark.operators.bounce import flag_bounce_batch
from gmall_flink_yb_spark.operators.visitor import (
    correct_is_new_batch,
    unique_visitors_batch,
)
from gmall_flink_yb_spark.sources.readers import load_tables

from pyspark.sql import functions as F


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + derived pipeline views; returns the view names.

    Layered like the reference's topic namespace: ods_* (raw), dwd_* (split
    facts), dwm_* (derived streams).
    """
    tables = load_tables(spark, sf_dir)  # region ... events documents
    ev = tables["events"]

    # conventions shared with queries.py: the driver events table plays the
    # behavior-log stream — user_id ~ common.mid, event_type='view' ~ session
    # entry, event_id breaks ts ties deterministically
    views = {
        "dwm_unique_visit": unique_visitors_batch(
            ev, key_col="user_id", ts_col="ts", order_cols=["event_id"]
        ),
        "dwm_new_visitors": correct_is_new_batch(
            ev.withColumn("is_new", F.lit("1")),
            key_col="user_id",
            ts_col="ts",
            is_new_col="is_new",
            row_id_col="event_id",
        ),
        "dwm_user_jump_detail": flag_bounce_batch(
            ev,
            key_col="user_id",
            ts_col="ts",
            is_entry=F.col("event_type") == "view",
            window_seconds=10,
            order_cols=["event_id"],
        ).filter(F.col("is_bounce")),
        # curation surface as SQL (the LLM-pipeline outputs a data engineer
        # would query ad hoc): per-doc quality features, exact-dup groups,
        # and the one-pass corpus profile
        "dws_doc_quality": quality_features(tables["documents"], "text"),
        "dws_doc_dup_groups": exact_dedup(
            tables["documents"], "doc_id", "text"
        ),
        "dws_corpus_profile": profile_columns(tables["documents"]),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return list(views.keys())
