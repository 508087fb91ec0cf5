"""Broker-free Kafka-contract transport (K1/K2 parity harness).

The reference's entire inter-layer transport is Kafka
(gmall-realtime/src/main/java/com/yb/gmall/utils/MyKafkaUtil.java:17-41:
fixed-topic producer, dynamic per-record-topic producer with EXACTLY_ONCE
semantics; BaseDBLog.java:100-105 routes CDC rows through it). The test
container ships no broker and no spark-sql-kafka connector, so the real
sinks (``write_kafka_stream`` / ``write_kafka_dynamic_topic`` in
``pipelines.py``) can only be plan-checked.

This module closes the remaining semantic gap: a file-backed transport
that consumes the IDENTICAL (topic, value) payload frames the Kafka sinks
consume (``to_kafka_payload`` / ``to_fixed_topic_payload`` — the shared
payload preparation is the part of the producer contract that is ours;
the broker handoff is Spark's) and delivers them through real
micro-batches with the same delivery guarantees the reference's producer
configures:

- **per-record topic**: rows land under ``transport_dir/topic=<t>/`` —
  the file analogue of the sink routing on the ``topic`` column.
- **exactly-once under replay**: each micro-batch overwrites only its own
  ``txn_batch=<id>`` partition inside each topic (MyKafkaUtil.java:29's
  EXACTLY_ONCE producer intent, realized as idempotent batchId-keyed
  writes + the streaming checkpoint — the same discipline as the CDC
  router's kafka_out above).

A "consumer" (``read_transport``) reads a topic back as (topic, value),
so tests can assert end-to-end parity between the streamed transport
content and the batch answer on the same input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gmall_flink_yb_spark.streaming.pipelines import hadoop_child_dirs


def start_file_transport_sink(
    payload_stream: DataFrame,
    transport_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Run a (topic, value) payload stream into the file transport.

    Layout: ``transport_dir/topic=<t>/txn_batch=<b>/part-*.parquet``.
    Replays (same checkpoint: recovery; fresh checkpoint: full reprocess)
    overwrite their batch partitions in place instead of appending
    duplicates — delivered content is a pure function of the input
    stream, which is what EXACTLY_ONCE means for an idempotent store.
    """
    cols = set(payload_stream.columns)
    if not {"topic", "value"} <= cols:
        raise ValueError(
            f"file transport needs (topic, value) payload columns, got {sorted(cols)}"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # one dynamic-overwrite write, partitioned by topic: only the
        # (topic, txn_batch) partitions present in THIS batch are replaced
        (
            batch_df.withColumn("txn_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("topic", "txn_batch")
            .parquet(transport_dir)
        )

    return (
        payload_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_transport(
    spark: SparkSession, transport_dir: str, topic: str | None = None
) -> DataFrame:
    """Consumer side: (topic, value) across all delivered batches —
    optionally one topic, which prunes to that topic's partition dirs.
    An unwritten transport reads as an empty frame, not an error."""
    if not hadoop_child_dirs(spark, transport_dir, "topic="):
        return spark.createDataFrame([], "topic string, value string")
    out = (
        spark.read.option("basePath", transport_dir)
        .parquet(transport_dir)
        .select(F.col("topic").cast("string").alias("topic"), "value")
    )
    if topic is not None:
        out = out.filter(F.col("topic") == topic)
    return out


def transport_batch_ids(spark: SparkSession, transport_dir: str) -> list[int]:
    """Delivered txn_batch ids (all topics) — lets tests assert replay
    produced no NEW batches, only idempotent rewrites."""
    ids: set[int] = set()
    for tdir in hadoop_child_dirs(spark, transport_dir, "topic="):
        for bdir in hadoop_child_dirs(
            spark, os.path.join(transport_dir, tdir), "txn_batch="
        ):
            ids.add(int(bdir.split("=", 1)[1]))
    return sorted(ids)
