"""CDC sources — the Debezium envelope pipeline.

Reference:
- S2 MySQL CDC source (app/ods/FlinkCDC.java:30-39, app/dwd/BaseDBLog.java:69-79)
  — no first-party Spark CDC; the engine accepts ANY DataFrame carrying
  Debezium-JSON strings (Kafka topic, files, memory) and normalizes it here.
- S3 CDC deserializer (app/function/CustomerDeserialization.java:30-83):
  SourceRecord -> {database, tableName, before, after, type}, with Debezium op
  "c"/"create" renamed to "insert" (:67-71) and "r" (snapshot read) treated as
  insert, matching StartupOptions.initial() semantics (BaseDBLog.java:76-78).

Everything is pure column expressions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.schemas import CDC_ENVELOPE_SCHEMA, DEBEZIUM_SCHEMA


def debezium_to_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S3 — Debezium JSON strings -> the reference's 5-field envelope.

    Op mapping per CustomerDeserialization.java:67-71: create->insert,
    update->update, delete->delete; snapshot "read" ("r") also -> insert.
    """
    d = raw.withColumn("_rec", F.from_json(F.col(value_col), DEBEZIUM_SCHEMA))
    return d.select(
        F.col("_rec.source.db").alias("database"),
        F.col("_rec.source.table").alias("tableName"),
        F.col("_rec.before").alias("before"),
        F.col("_rec.after").alias("after"),
        F.when(F.col("_rec.op").isin("c", "r", "create", "read"), F.lit("insert"))
        .when(F.col("_rec.op").isin("u", "update"), F.lit("update"))
        .when(F.col("_rec.op").isin("d", "delete"), F.lit("delete"))
        .otherwise(F.col("_rec.op"))
        .alias("type"),
    )


def parse_cdc_stream(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """T2 — parse already-enveloped JSON (what Kafka topic ods_base_db carries,
    BaseDBLog.java:54-59) into typed envelope columns."""
    return raw.select(
        F.from_json(F.col(value_col), CDC_ENVELOPE_SCHEMA).alias("_e")
    ).select("_e.*")
