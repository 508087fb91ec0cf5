"""S1/K1/K2 Kafka wiring: skipped-not-silent without a broker/connector.

The container ships neither a Kafka broker nor the spark-sql-kafka connector
JAR, so these paths cannot run end-to-end here. What CAN be checked:

- ``read_kafka_stream`` builds its reader plan up to ``load()``; with the
  connector present the source resolves and the contract schema
  (key/value/timestamp) is asserted, otherwise the test SKIPS with the
  missing-connector reason (visible in the report, not silently green).
- The K1/K2 writer column preparation (to_json struct serialization, the
  per-row ``topic`` column) is pure DataFrame logic and is asserted on a
  batch frame with no connector involved — the part of the producer wiring
  that is ours, as opposed to Spark's sink implementation.
- The full producer SEMANTICS (micro-batch delivery, per-record topic
  fan-out, exactly-once under replay) are asserted end-to-end against the
  broker-free file transport in ``tests/test_kafka_transport.py`` — only
  the broker handoff itself remains connector-gated here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.routing import to_kafka_payload
from gmall_flink_yb_spark.sources.readers import read_kafka_stream


def test_read_kafka_stream_plan_or_skip(spark):
    try:
        df = read_kafka_stream(
            spark, topic="ods_base_log", bootstrap_servers="localhost:9092",
            group_id="g1",
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "kafka" in msg.lower() and (
            "Failed to find data source" in msg or "DATA_SOURCE" in msg
        ):
            pytest.skip(f"kafka connector not on classpath: {msg[:120]}")
        raise
    assert df.isStreaming
    assert df.columns == ["key", "value", "timestamp"]


def test_kafka_writer_value_serialization(spark):
    """K1's value shape: every column serialized into one JSON value (T7)."""
    df = spark.createDataFrame([Row(id=1, name="a")])
    value = df.select(F.to_json(F.struct("*")).alias("value")).first()["value"]
    assert value == '{"id":1,"name":"a"}'


def test_kafka_dynamic_topic_payload(spark):
    """K2's per-row topic column: Spark's Kafka sink routes on it natively."""
    routed = spark.createDataFrame(
        [Row(sinkTable="dwd_order_info", after={"id": "1", "amount": "10"})]
    )
    out = to_kafka_payload(routed)
    assert out.columns == ["topic", "value"]
    r = out.first()
    assert r["topic"] == "dwd_order_info"
    import json

    assert json.loads(r["value"]) == {"id": "1", "amount": "10"}
