"""K1/K2 Kafka-producer semantics through the broker-free file transport.

The container has no broker, so ``write_kafka_stream`` /
``write_kafka_dynamic_topic`` cannot hand off to Kafka here — but the
producer contract that is OURS (payload shape, per-record topic routing,
exactly-once delivery under replay; MyKafkaUtil.java:17-41,
BaseDBLog.java:100-105) is transport-independent. These tests run the
SAME payload frames (``to_kafka_payload`` / ``to_fixed_topic_payload``)
through real micro-batches into ``streaming.transport`` and assert
parity with the batch answers — real assertions where round 3 had skips.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.routing import (
    route_cdc,
    to_fixed_topic_payload,
    to_kafka_payload,
)
from gmall_flink_yb_spark.schemas import (
    CDC_ENVELOPE_SCHEMA,
    TABLE_PROCESS_SCHEMA,
)
from gmall_flink_yb_spark.streaming.pipelines import read_file_stream
from gmall_flink_yb_spark.streaming.transport import (
    read_transport,
    start_file_transport_sink,
    transport_batch_ids,
)


def _stage_files(spark, tmp_path, name, row_batches, schema):
    """One parquet file per batch with strictly increasing mtimes, so
    FileStreamSource delivers them in order with maxFilesPerTrigger=1."""
    src = str(tmp_path / name)
    os.makedirs(src)
    for i, rows in enumerate(row_batches):
        stage = tmp_path / f"{name}_stage{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = os.path.join(src, f"{i:02d}.parquet")
        os.rename(stage / part[0], dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return src


_CFG_ROWS = [
    Row(sourceTable="order_info", operateType="insert", sinkType="kafka",
        sinkTable="dwd_order_info", sinkColumns="id,amount",
        sinkPk="id", sinkExtend=None),
    Row(sourceTable="payment_info", operateType="insert", sinkType="kafka",
        sinkTable="dwd_payment_info", sinkColumns="id,total",
        sinkPk="id", sinkExtend=None),
]

_ENV_BATCHES = [
    [
        Row(database="gmall", tableName="order_info",
            before=None, after={"id": "1", "amount": "10"}, type="insert"),
        Row(database="gmall", tableName="payment_info",
            before=None, after={"id": "5", "total": "99"}, type="insert"),
    ],
    [
        Row(database="gmall", tableName="order_info",
            before=None, after={"id": "2", "amount": "20"}, type="insert"),
        # routed nowhere: no config row for this table
        Row(database="gmall", tableName="comment_info",
            before=None, after={"id": "9", "txt": "x"}, type="insert"),
    ],
    [
        Row(database="gmall", tableName="payment_info",
            before=None, after={"id": "6", "total": "42"}, type="insert"),
    ],
]


def _delivered(spark, tdir):
    return {
        (r["topic"], r["value"])
        for r in read_transport(spark, tdir).collect()
    }


def test_dynamic_topic_transport_matches_batch_routing(spark, tmp_path):
    """K2: three micro-batches of CDC envelopes, routed per-record-topic
    through the file transport, must deliver EXACTLY the (topic, value)
    set the batch route computes on the same input."""
    cfg = spark.createDataFrame(_CFG_ROWS, TABLE_PROCESS_SCHEMA)
    src = _stage_files(
        spark, tmp_path, "cdc_src", _ENV_BATCHES, CDC_ENVELOPE_SCHEMA
    )
    stream = read_file_stream(
        spark, src, CDC_ENVELOPE_SCHEMA, max_files_per_trigger=1,
        glob="*.parquet",
    )
    payload = to_kafka_payload(route_cdc(stream, cfg)["kafka"])
    tdir = str(tmp_path / "transport")
    q = start_file_transport_sink(payload, tdir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    batch_env = spark.read.parquet(src)
    expected = {
        (r["topic"], r["value"])
        for r in to_kafka_payload(route_cdc(batch_env, cfg)["kafka"]).collect()
    }
    got = _delivered(spark, tdir)
    assert got == expected
    # the per-record topic really fanned out to distinct topics
    assert {t for t, _ in got} == {"dwd_order_info", "dwd_payment_info"}
    # one delivered batch per input file that carried routed rows
    assert transport_batch_ids(spark, tdir) == [0, 1, 2]
    # consumer-side topic filter prunes to one topic
    only_orders = read_transport(spark, tdir, "dwd_order_info")
    assert {r["value"] for r in only_orders.collect()} == {
        v for t, v in expected if t == "dwd_order_info"
    }


def test_transport_replay_is_exactly_once(spark, tmp_path):
    """K2 EOS intent (MyKafkaUtil.java:29): re-running over the SAME
    checkpoint delivers nothing new; a FULL reprocess over a fresh
    checkpoint (crash-without-checkpoint replay) rewrites batch
    partitions in place — delivered content identical, no duplicates."""
    cfg = spark.createDataFrame(_CFG_ROWS, TABLE_PROCESS_SCHEMA)
    src = _stage_files(
        spark, tmp_path, "cdc_src", _ENV_BATCHES, CDC_ENVELOPE_SCHEMA
    )
    tdir = str(tmp_path / "transport")

    def run(ckpt: str) -> None:
        stream = read_file_stream(
            spark, src, CDC_ENVELOPE_SCHEMA, max_files_per_trigger=1,
            glob="*.parquet",
        )
        payload = to_kafka_payload(route_cdc(stream, cfg)["kafka"])
        q = start_file_transport_sink(payload, tdir, ckpt)
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt_a"))
    first = _delivered(spark, tdir)
    first_ids = transport_batch_ids(spark, tdir)
    assert first  # non-vacuous

    # recovery replay: same checkpoint, no new input -> no change
    run(str(tmp_path / "ckpt_a"))
    assert _delivered(spark, tdir) == first
    assert transport_batch_ids(spark, tdir) == first_ids

    # full reprocess: fresh checkpoint re-delivers every batch; batchId-
    # keyed overwrite makes it idempotent instead of duplicating
    run(str(tmp_path / "ckpt_b"))
    assert _delivered(spark, tdir) == first
    assert transport_batch_ids(spark, tdir) == first_ids


def test_fixed_topic_transport_matches_batch_serialization(spark, tmp_path):
    """K1: the fixed-topic producer payload (whole row as one JSON value,
    MyKafkaUtil.java:17-21) streamed through the transport equals the
    batch serialization of the same rows."""
    batches = [
        [Row(id=1, name="a"), Row(id=2, name="b")],
        [Row(id=3, name="c")],
    ]
    schema = "id long, name string"
    src = _stage_files(spark, tmp_path, "log_src", batches, schema)
    stream = read_file_stream(
        spark, src, schema, max_files_per_trigger=1, glob="*.parquet"
    )
    payload = to_fixed_topic_payload(stream, "dwd_page_log")
    tdir = str(tmp_path / "transport")
    q = start_file_transport_sink(payload, tdir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    expected = {
        (r["topic"], r["value"])
        for r in to_fixed_topic_payload(
            spark.read.parquet(src), "dwd_page_log"
        ).collect()
    }
    assert _delivered(spark, tdir) == expected
    assert {t for t, _ in expected} == {"dwd_page_log"}


def test_transport_rejects_wrong_payload_shape(spark):
    bad = spark.readStream.format("rate").load()  # (timestamp, value)
    with pytest.raises(ValueError, match="topic"):
        start_file_transport_sink(bad, "/tmp/x", "/tmp/y")


def test_empty_transport_reads_empty(spark, tmp_path):
    df = read_transport(spark, str(tmp_path / "nope"))
    assert df.columns == ["topic", "value"]
    assert df.count() == 0
