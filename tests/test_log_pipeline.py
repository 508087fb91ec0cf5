"""Golden tests for the DWD log pipeline on gmall-shaped fixtures
(FIXTURES.md §A1): T1 dirty routing, P1 3-way split with display explode,
ST1 new-visitor correction, ST2 daily UV, ST3 bounce detection."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.bounce import detect_bounce_batch
from gmall_flink_yb_spark.operators.log_split import split_log_stream
from gmall_flink_yb_spark.operators.visitor import (
    correct_is_new_batch,
    unique_visitors_batch,
)
from gmall_flink_yb_spark.sources.readers import parse_log_stream

BASE_TS = 1700000000000  # epoch millis


def _ev(mid, ts_off_s, page_id=None, last_page_id=None, is_new="0",
        start=False, displays=None):
    e = {
        "common": {"mid": mid, "is_new": is_new},
        "ts": BASE_TS + int(ts_off_s * 1000),
    }
    if start:
        e["start"] = {"entry": "icon"}
    else:
        e["page"] = {"page_id": page_id or "home", "last_page_id": last_page_id}
    if displays:
        e["displays"] = displays
    return json.dumps(e)


@pytest.fixture(scope="module")
def raw_logs(spark):
    lines = [
        _ev("mid_1", 0, start=True, is_new="1"),
        _ev("mid_1", 1, page_id="home", is_new="1",
            displays=[{"display_type": "promo", "item": "sku1",
                       "item_type": "sku_id", "order": 1},
                      {"display_type": "promo", "item": "sku2",
                       "item_type": "sku_id", "order": 2}]),
        _ev("mid_1", 2, page_id="detail", last_page_id="home"),
        _ev("mid_2", 0.5, page_id="home"),
        "{not valid json",  # dirty record (BaseLogApp.java:55-71)
        _ev("mid_2", 86401, page_id="home"),  # next civil day
    ]
    return spark.createDataFrame([(line,) for line in lines], ["value"])


def test_parse_dirty_channel(raw_logs):
    clean, dirty = parse_log_stream(raw_logs)
    assert clean.count() == 5
    assert dirty.count() == 1
    assert dirty.collect()[0][0].startswith("{not valid")


def test_three_way_split_and_explode(raw_logs):
    clean, _ = parse_log_stream(raw_logs)
    parts = split_log_stream(clean)
    assert parts["start"].count() == 1
    assert parts["page"].count() == 4
    # 2 displays exploded, each carrying the parent's page_id
    disp = parts["display"].collect()
    assert len(disp) == 2
    assert {d["page_id"] for d in disp} == {"home"}
    assert {d["item"] for d in disp} == {"sku1", "sku2"}


def test_is_new_correction(raw_logs):
    """BaseLogApp.java:87-98 — only the first event of a device keeps
    is_new=1."""
    clean, _ = parse_log_stream(raw_logs)
    fixed = correct_is_new_batch(clean)
    rows = {
        (r["common"]["mid"], r["ts"]): r["is_new_fixed"]
        for r in fixed.collect()
    }
    # mid_1 sent is_new=1 on its first two events; only the first survives
    assert rows[("mid_1", BASE_TS)] == "1"
    assert rows[("mid_1", BASE_TS + 1000)] == "0"
    # mid_2 never claimed to be new
    assert rows[("mid_2", BASE_TS + 500)] == "0"


def test_daily_uv(raw_logs):
    """UniqueVisitApp.java:78-93 — first session-entry per device per day;
    entry := last_page_id null/empty."""
    clean, _ = parse_log_stream(raw_logs)
    pages = clean.filter(F.col("start").isNull())
    uv = unique_visitors_batch(
        pages,
        key_col="common.mid",
        ts_col="ts",
        entry_filter=F.col("page.last_page_id").isNull()
        | (F.col("page.last_page_id") == ""),
        date_col=F.to_date(F.timestamp_millis(F.col("ts"))),
    )
    got = {(r["common"]["mid"], str(r["_uv_date"])) for r in uv.collect()}
    # mid_1: one entry day; mid_2: entries on two civil days
    assert len(got) == 3
    assert sum(1 for m, _ in got if m == "mid_2") == 2


def test_bounce_detection(spark):
    """UserJumpDetailApp.java:85-111 golden cases: re-entry within 10 s
    bounces, entry+silence bounces (timeout), entry followed by a page view
    within 10 s does NOT bounce."""
    rows = [
        # mid_a: entry then another entry 5 s later -> first bounces,
        # second bounces too (nothing follows it)
        ("mid_a", 0.0, None),
        ("mid_a", 5.0, None),
        # mid_b: entry then ordinary page event 3 s later -> no bounce
        ("mid_b", 0.0, None),
        ("mid_b", 3.0, "home"),
        # mid_c: entry then next event 11 s later -> timeout bounce
        ("mid_c", 0.0, None),
        ("mid_c", 11.0, "home"),
    ]
    df = spark.createDataFrame(
        [(m, t, lp) for m, t, lp in rows], ["mid", "off", "last_page_id"]
    ).withColumn("ts", F.timestamp_seconds(F.col("off") + 1700000000))
    bounced = detect_bounce_batch(
        df,
        key_col="mid",
        ts_col="ts",
        is_entry=F.col("last_page_id").isNull(),
        window_seconds=10,
    )
    got = {(r["mid"], r["off"]) for r in bounced.collect()}
    assert got == {("mid_a", 0.0), ("mid_a", 5.0), ("mid_c", 0.0)}
