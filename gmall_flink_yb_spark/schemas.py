"""Explicit StructType constants for every record shape in the engine.

The reference parses schemaless fastjson ``JSONObject``s (BaseLogApp.java:56-68)
and fixed POJOs (bean/OrderInfo.java:8-24, bean/OrderDetail.java:8-21). We make
every shape an explicit StructType so Catalyst can prune columns and push
predicates into the scan; money is DecimalType(16,2) (BigDecimal in the
reference), event time is TimestampType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MONEY = DecimalType(16, 2)

# ---------------------------------------------------------------------------
# (a) Behavior-log event — shape observed in BaseLogApp.java:74,87,112,121-128,
# UniqueVisitApp.java:78,87, UserJumpDetailApp.java:65,88. ``displays`` is the
# one array type in the reference (exploded per-row in BaseLogApp.java:121-131).
# ---------------------------------------------------------------------------
DISPLAY_SCHEMA = StructType(
    [
        StructField("display_type", StringType()),
        StructField("item", StringType()),
        StructField("item_type", StringType()),
        StructField("order", LongType()),
        StructField("pos_id", LongType()),
    ]
)

LOG_EVENT_SCHEMA = StructType(
    [
        StructField(
            "common",
            StructType(
                [
                    StructField("mid", StringType()),
                    StructField("uid", StringType()),
                    StructField("is_new", StringType()),
                    StructField("ar", StringType()),
                    StructField("ba", StringType()),
                    StructField("ch", StringType()),
                    StructField("md", StringType()),
                    StructField("os", StringType()),
                    StructField("vc", StringType()),
                ]
            ),
        ),
        StructField(
            "page",
            StructType(
                [
                    StructField("page_id", StringType()),
                    StructField("last_page_id", StringType()),
                    StructField("item", StringType()),
                    StructField("item_type", StringType()),
                    StructField("during_time", LongType()),
                ]
            ),
        ),
        StructField(
            "start",
            StructType(
                [
                    StructField("entry", StringType()),
                    StructField("loading_time", LongType()),
                    StructField("open_ad_id", LongType()),
                    StructField("open_ad_ms", LongType()),
                    StructField("open_ad_skip_ms", LongType()),
                ]
            ),
        ),
        StructField("displays", ArrayType(DISPLAY_SCHEMA)),
        StructField("ts", LongType()),  # epoch millis, event time
    ]
)

# ---------------------------------------------------------------------------
# (b) CDC change envelope — built in CustomerDeserialization.java:30-83:
# {database, tableName, before, after, type} with type in {insert,update,delete}
# (Debezium "create" renamed to "insert" at :67-71). before/after are flat
# string-keyed maps of the MySQL row.
# ---------------------------------------------------------------------------
CDC_ENVELOPE_SCHEMA = StructType(
    [
        StructField("database", StringType()),
        StructField("tableName", StringType()),
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
        StructField("type", StringType()),
    ]
)

# Raw Debezium record shape (what CustomerDeserialization consumes):
DEBEZIUM_SCHEMA = StructType(
    [
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
        StructField(
            "source",
            StructType(
                [
                    StructField("db", StringType()),
                    StructField("table", StringType()),
                ]
            ),
        ),
        StructField("op", StringType()),  # c/u/d/r
        StructField("ts_ms", LongType()),
    ]
)

# ---------------------------------------------------------------------------
# (c) Typed order facts — bean/OrderInfo.java:8-24, bean/OrderDetail.java:8-21.
# create_time arrives as "yyyy-MM-dd HH:mm:ss"; derived create_date/create_hour/
# create_ts are added by the ingest operator (OrderWideApp.java:53-59).
# ---------------------------------------------------------------------------
ORDER_INFO_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("province_id", LongType()),
        StructField("user_id", LongType()),
        StructField("order_status", StringType()),
        StructField("total_amount", MONEY),
        StructField("activity_reduce_amount", MONEY),
        StructField("coupon_reduce_amount", MONEY),
        StructField("original_total_amount", MONEY),
        StructField("feight_fee", MONEY),
        StructField("expire_time", StringType()),
        StructField("create_time", StringType()),
        StructField("operate_time", StringType()),
    ]
)

ORDER_DETAIL_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("order_id", LongType()),
        StructField("sku_id", LongType()),
        StructField("sku_num", LongType()),
        StructField("sku_name", StringType()),
        StructField("order_price", MONEY),
        StructField("split_total_amount", MONEY),
        StructField("split_activity_amount", MONEY),
        StructField("split_coupon_amount", MONEY),
        StructField("create_time", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Routing config row — bean/TableProcess.java:6-25; broadcast-state key is
# sourceTable + "-" + operateType (TableProcessFunction.java:58,110).
# ---------------------------------------------------------------------------
TABLE_PROCESS_SCHEMA = StructType(
    [
        StructField("sourceTable", StringType()),
        StructField("operateType", StringType()),
        StructField("sinkType", StringType()),  # kafka | hbase | clickhouse
        StructField("sinkTable", StringType()),
        StructField("sinkColumns", StringType()),  # CSV
        StructField("sinkPk", StringType()),
        StructField("sinkExtend", StringType()),
    ]
)

SINK_TYPE_KAFKA = "kafka"
SINK_TYPE_HBASE = "hbase"
SINK_TYPE_CLICKHOUSE = "clickhouse"

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md). Schemas are what
# spark.read.parquet infers; listed here for reference and for readers that
# need them (events.ts is parquet ns-precision).
# ---------------------------------------------------------------------------
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", StringType()),  # double in files; cast at use site
        StructField("props", StringType()),  # JSON string
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
