"""Edge corpus (SURVEY.md §5.2.5): midnight-boundary dedup, dirty records,
CDC ordering, unmatched config, decimal money, late data, bucketed joins."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.routing import route_cdc
from gmall_flink_yb_spark.operators.visitor import unique_visitors_batch
from gmall_flink_yb_spark.operators.order_wide import parse_order_facts
from gmall_flink_yb_spark.schemas import CDC_ENVELOPE_SCHEMA, TABLE_PROCESS_SCHEMA
from gmall_flink_yb_spark.sources.readers import parse_log_stream


def test_uv_midnight_boundary(spark):
    """ST2 keys on the CIVIL DATE (documented improvement over the
    reference's 24 h processing-time TTL, SURVEY §7.4.2): the same device
    one second before and after midnight counts on both days."""
    rows = [
        Row(mid="m1", ts="2024-01-01 23:59:59"),
        Row(mid="m1", ts="2024-01-02 00:00:01"),
        Row(mid="m1", ts="2024-01-02 10:00:00"),  # same day: deduped
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    uv = unique_visitors_batch(df, key_col="mid", ts_col="ts")
    got = sorted(str(r["_uv_date"]) for r in uv.collect())
    assert got == ["2024-01-01", "2024-01-02"]


def test_dirty_records_side_channel(spark):
    raw = spark.createDataFrame(
        [("{\"ts\": 1}",), ("{not json",), ("",), ("42",)], ["value"]
    )
    clean, dirty = parse_log_stream(raw)
    assert clean.count() == 1
    # the three unparseable payloads survive VERBATIM on the dirty channel
    # (BaseLogApp.java:66-68 prints the raw string)
    assert {r["value"] for r in dirty.collect()} == {"{not json", "", "42"}


def test_unmatched_config_key_dropped(spark):
    """TableProcessFunction.java:78-80: no (sourceTable, operateType) config
    match -> record dropped from every output."""
    env = spark.createDataFrame(
        [
            Row(database="g", tableName="known", before=None,
                after={"id": "1"}, type="insert"),
            Row(database="g", tableName="unknown", before=None,
                after={"id": "2"}, type="insert"),
            Row(database="g", tableName="known", before=None,
                after={"id": "3"}, type="update"),  # type not configured
        ],
        CDC_ENVELOPE_SCHEMA,
    )
    cfg = spark.createDataFrame(
        [Row(sourceTable="known", operateType="insert", sinkType="kafka",
             sinkTable="t", sinkColumns="id", sinkPk="id", sinkExtend=None)],
        TABLE_PROCESS_SCHEMA,
    )
    routed = route_cdc(env, cfg)
    assert routed["kafka"].count() == 1
    assert routed["hbase"].count() == 0


def test_cdc_delete_filtered_before_routing(spark):
    env = spark.createDataFrame(
        [
            Row(database="g", tableName="t1", before={"id": "1"},
                after=None, type="delete"),
            Row(database="g", tableName="t1", before=None,
                after={"id": "1"}, type="insert"),
        ],
        CDC_ENVELOPE_SCHEMA,
    )
    cfg = spark.createDataFrame(
        [Row(sourceTable="t1", operateType="insert", sinkType="kafka",
             sinkTable="t1", sinkColumns="id", sinkPk="id", sinkExtend=None),
         Row(sourceTable="t1", operateType="delete", sinkType="kafka",
             sinkTable="t1", sinkColumns="id", sinkPk="id", sinkExtend=None)],
        TABLE_PROCESS_SCHEMA,
    )
    # even with a delete route configured, T4 drops deletes first
    # (BaseDBLog.java:60-66)
    assert route_cdc(env, cfg)["kafka"].count() == 1


def test_decimal_money_exact(spark):
    """BigDecimal parity (SURVEY §7.4.5): DecimalType(16,2) sums are exact —
    no double drift on money."""
    info_raw = spark.createDataFrame(
        [(f'{{"id": {i}, "total_amount": 0.1, '
          f'"create_time": "2024-01-01 00:00:0{i}"}}',) for i in range(3)],
        ["value"],
    )
    info, _ = parse_order_facts(info_raw, info_raw)
    total = info.agg(F.sum("total_amount").alias("s")).first()["s"]
    assert total == Decimal("0.30")
    assert str(total) == "0.30"


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Co-located join via bucketing: both sides bucketed x sorted on the
    join key -> SortMergeJoin with ZERO shuffle exchanges (at 100 TB this is
    the difference between joining in place and moving both tables)."""
    from gmall_flink_yb_spark.plans.inspect import num_exchanges
    from gmall_flink_yb_spark.sources.readers import read_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    read_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").option(
        "path", str(tmp_path / "b_orders")
    ).saveAsTable("b_orders")
    read_table(spark, sf_dir, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").option(
        "path", str(tmp_path / "b_lineitem")
    ).saveAsTable("b_lineitem")
    # hint("merge") forces SortMergeJoin: small tables would otherwise
    # broadcast and the assertion would prove nothing about bucketing
    joined = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).groupBy("o_orderstatus").count()
    strategies_and_exchanges = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    from gmall_flink_yb_spark.plans.inspect import join_strategies

    assert "SortMergeJoin" in join_strategies(strategies_and_exchanges)
    assert num_exchanges(strategies_and_exchanges) == 0
    # and the full rollup only shuffles for the final groupBy
    assert num_exchanges(joined) <= 1
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_unigram_lm_empty_and_single_token_docs(spark):
    """Docs with zero tokens are absent (no token rows); a one-token corpus
    scores 0 bits (its only token IS the whole distribution)."""
    from gmall_flink_yb_spark.functions.text import unigram_lm_score

    df = spark.createDataFrame(
        [(0, ""), (1, "..."), (2, "word")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in unigram_lm_score(df, "doc_id", "text").collect()}
    assert set(rows) == {2}
    assert rows[2]["n_tokens"] == 1 and rows[2]["sum_bits"] == 0
    assert rows[2]["mean_bits"] == 0.0


def test_source_overlap_single_source_no_pairs(spark):
    from gmall_flink_yb_spark.functions.ngrams import source_overlap

    df = spark.createDataFrame(
        [(0, "only", "a b c d e f")], ["doc_id", "source", "text"]
    )
    assert source_overlap(df, "source", "text", n=2).count() == 0


def test_source_overlap_short_docs_yield_no_grams(spark):
    """A source whose every doc is shorter than n tokens contributes no
    grams — its pairs still appear (complete matrix) with 0/0-gram sides
    and NULL-free jaccard only when a denominator exists."""
    from gmall_flink_yb_spark.functions.ngrams import source_overlap

    df = spark.createDataFrame(
        [(0, "s1", "a b c"), (1, "s2", "x")], ["doc_id", "source", "text"]
    )
    rows = source_overlap(df, "source", "text", n=2).collect()
    # s2 has no 2-grams -> no sizes row -> the pair frame (built from
    # sizes x sizes) has no (s1, s2) row: gram-less sources are absent by
    # construction, not silently zero-padded
    assert rows == []


def test_label_centroid_outliers_singleton_label(spark):
    """A label with one member: its centroid IS the member (cos == 1)."""
    from gmall_flink_yb_spark.functions.similarity import label_centroid_outliers

    df = spark.createDataFrame(
        [(1, [3.0, 4.0], 7)], ["vec_id", "embedding", "label"]
    )
    rows = label_centroid_outliers(df, "vec_id", "embedding", "label", k=3).collect()
    assert len(rows) == 1
    assert rows[0]["centroid_cos"] == 1.0 and rows[0]["rnk"] == 1


def test_basket_pairs_counts_same_order_cooccurrence(spark, tmp_path):
    """Hand-checked support: parts {1,2,3} in one order yield three pairs;
    a repeated (order, part) line must not inflate support; single-item
    orders contribute nothing."""
    import os

    from gmall_flink_yb_spark.queries import q_basket_pairs

    rows = [
        (100, 1), (100, 2), (100, 3),
        (101, 1), (101, 2), (101, 2),   # duplicate line: still one (101,2)
        (102, 9),                        # singleton order
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    d = str(tmp_path / "basket")
    li.write.parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        (r["part_a"], r["part_b"]): r["support"]
        for r in q_basket_pairs(spark, d).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
