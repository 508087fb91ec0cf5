"""CDC routing engine tests (S3, T4, T5, P2 — TableProcessFunction.java,
BaseDBLog.java, CustomerDeserialization.java) on gmall-shaped fixtures
(FIXTURES.md §A2/A3)."""

from __future__ import annotations

import json

import pytest

from gmall_flink_yb_spark.operators.routing import route_cdc, to_kafka_payload
from gmall_flink_yb_spark.schemas import TABLE_PROCESS_SCHEMA
from gmall_flink_yb_spark.sources.cdc import debezium_to_envelope, parse_cdc_stream


@pytest.fixture(scope="module")
def envelope(spark):
    recs = [
        {"database": "gmall2021", "tableName": "order_info",
         "before": None, "after": {"id": "1", "total": "9.99", "junk": "x"},
         "type": "insert"},
        {"database": "gmall2021", "tableName": "order_info",
         "before": {"id": "1"}, "after": {"id": "1", "total": "8.88", "junk": "x"},
         "type": "update"},
        {"database": "gmall2021", "tableName": "order_info",
         "before": {"id": "1"}, "after": None, "type": "delete"},
        {"database": "gmall2021", "tableName": "user_info",
         "before": None, "after": {"id": "7", "name": "u7", "secret": "s"},
         "type": "insert"},
        # no config entry for this table-op -> dropped (TableProcessFunction.java:78-80)
        {"database": "gmall2021", "tableName": "mystery",
         "before": None, "after": {"id": "9"}, "type": "insert"},
    ]
    raw = spark.createDataFrame([(json.dumps(r),) for r in recs], ["value"])
    return parse_cdc_stream(raw)


@pytest.fixture(scope="module")
def config(spark):
    rows = [
        ("order_info", "insert", "kafka", "dwd_order_info", "id,total", "id", None),
        ("order_info", "update", "kafka", "dwd_order_info", "id,total", "id", None),
        ("user_info", "insert", "hbase", "dim_user_info", "id,name", "id", None),
    ]
    return spark.createDataFrame(rows, TABLE_PROCESS_SCHEMA)


def test_route_and_prune(envelope, config):
    routed = route_cdc(envelope, config)
    kafka = routed["kafka"].collect()
    hbase = routed["hbase"].collect()
    # delete dropped (BaseDBLog.java:63-64), mystery dropped, user_info -> hbase
    assert len(kafka) == 2
    assert len(hbase) == 1
    # T5 column pruning: only sinkColumns survive in `after`
    for r in kafka:
        assert set(r["after"].keys()) == {"id", "total"}
        assert r["sinkTable"] == "dwd_order_info"
    assert set(hbase[0]["after"].keys()) == {"id", "name"}
    assert hbase[0]["sinkTable"] == "dim_user_info"


def test_kafka_payload_shape(envelope, config):
    """K2 — per-row topic column + JSON value (MyKafkaUtil.java:23-31)."""
    payload = to_kafka_payload(route_cdc(envelope, config)["kafka"])
    rows = payload.collect()
    assert payload.columns == ["topic", "value"]
    assert {r["topic"] for r in rows} == {"dwd_order_info"}
    parsed = [json.loads(r["value"]) for r in rows]
    assert {p["total"] for p in parsed} == {"9.99", "8.88"}


def test_debezium_envelope(spark):
    """S3 — CustomerDeserialization.java:67-71 op mapping (create->insert,
    r->insert)."""
    recs = [
        {"before": None, "after": {"id": "1"},
         "source": {"db": "gmall2021", "table": "t"}, "op": "c", "ts_ms": 1},
        {"before": None, "after": {"id": "2"},
         "source": {"db": "gmall2021", "table": "t"}, "op": "r", "ts_ms": 2},
        {"before": {"id": "3"}, "after": {"id": "3"},
         "source": {"db": "gmall2021", "table": "t"}, "op": "u", "ts_ms": 3},
        {"before": {"id": "4"}, "after": None,
         "source": {"db": "gmall2021", "table": "t"}, "op": "d", "ts_ms": 4},
    ]
    raw = spark.createDataFrame([(json.dumps(r),) for r in recs], ["value"])
    env = debezium_to_envelope(raw)
    got = {r["after"]["id"] if r["after"] else r["before"]["id"]: r["type"]
           for r in env.collect()}
    assert got == {"1": "insert", "2": "insert", "3": "update", "4": "delete"}
    assert env.columns == ["database", "tableName", "before", "after", "type"]
