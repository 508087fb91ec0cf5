"""P2/T4/T5/ST4 — config-driven CDC routing engine.

Reference (app/function/TableProcessFunction.java + app/dwd/BaseDBLog.java):
- T4 (BaseDBLog.java:60-66): drop CDC records with type == "delete".
- P2 (TableProcessFunction.java:55-82): look up ``tableName + "-" + type`` in
  broadcast config state; sinkType=kafka -> main output, hbase -> dim side
  output; unmatched keys logged & dropped (:78-80).
- T5 (:183-195): keep only the ``after`` keys listed in the config row's CSV
  ``sinkColumns``.
- T6 (:68): inject ``sinkTable`` into the record.

Spark-first: the config is a small DataFrame; routing is ONE broadcast inner
join on (tableName, type) — unmatched rows drop exactly like :78-80. Column
pruning uses ``map_filter`` on the after-map against the split sinkColumns
array: pure column expressions, no UDF, no per-row state. In streaming the
config table is re-read per micro-batch (same "latest config wins" semantics
as Flink broadcast state, SURVEY.md §2.4 P4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.schemas import SINK_TYPE_HBASE, SINK_TYPE_KAFKA


def route_cdc(
    envelope: DataFrame,
    config: DataFrame,
    drop_deletes: bool = True,
) -> dict[str, DataFrame]:
    """Route a CDC-envelope DataFrame through a table_process config frame.

    Returns {"kafka": ..., "hbase": ...} — each with columns
    (database, tableName, sinkTable, after) where ``after`` is pruned to the
    config's sinkColumns. Rows with no matching (sourceTable, operateType)
    config are dropped (TableProcessFunction.java:78-80).
    """
    main = envelope
    if drop_deletes:
        main = main.filter(F.col("type") != "delete")  # BaseDBLog.java:63-64

    cfg = config.select(
        F.col("sourceTable"),
        F.col("operateType"),
        F.col("sinkType"),
        F.col("sinkTable"),
        F.split(F.col("sinkColumns"), ",").alias("_sink_cols"),
    )
    # broadcast inner join == Flink broadcast-state lookup on
    # sourceTable-operateType (TableProcessFunction.java:58)
    routed = main.join(
        F.broadcast(cfg),
        (main["tableName"] == cfg["sourceTable"])
        & (main["type"] == cfg["operateType"]),
        "inner",
    )
    # T5: prune after-map to sinkColumns (filterColumn, :183-195)
    pruned = routed.select(
        "database",
        "tableName",
        "sinkType",
        "sinkTable",
        F.map_filter(
            F.col("after"), lambda k, _: F.array_contains(F.col("_sink_cols"), k)
        ).alias("after"),
    )
    return {
        "kafka": pruned.filter(F.col("sinkType") == SINK_TYPE_KAFKA).drop("sinkType"),
        "hbase": pruned.filter(F.col("sinkType") == SINK_TYPE_HBASE).drop("sinkType"),
    }


def to_kafka_payload(routed: DataFrame) -> DataFrame:
    """K2 — shape the kafka-routed stream for Spark's Kafka sink, which honors
    a per-row ``topic`` column (reference: dynamic-topic producer,
    MyKafkaUtil.java:23-31 + BaseDBLog.java:100-105; payload is the after
    struct serialized to JSON)."""
    return routed.select(
        F.col("sinkTable").alias("topic"),
        F.to_json(F.col("after")).alias("value"),
    )


def to_fixed_topic_payload(df: DataFrame, topic: str) -> DataFrame:
    """K1 — shape a stream for the fixed-topic producer
    (MyKafkaUtil.java:17-21): every column serialized into one JSON value
    (T7, map(JSONAware::toJSONString)), topic attached as a constant
    column so the SAME (topic, value) payload frame feeds either Spark's
    Kafka sink or the broker-free file transport."""
    return df.select(
        F.lit(topic).alias("topic"),
        F.to_json(F.struct("*")).alias("value"),
    )
