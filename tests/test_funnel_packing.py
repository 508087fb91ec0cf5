"""Funnel / retention / sequence-packing / token-budget / DSIR-affinity
semantics on hand-built frames, plus plan-shape checks for the scalable
prefix-scan in pack_sequences."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.chunking import pack_sequences
from gmall_flink_yb_spark.functions.ngrams import hashed_ngram_affinity
from gmall_flink_yb_spark.functions.sampling import token_budget_cap
from gmall_flink_yb_spark.operators.funnel import (
    funnel_conversion,
    retention_cohorts,
)
from gmall_flink_yb_spark.sources.readers import read_jsonl


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, ty) for u, t, ty in rows],
        "user_id long, ts timestamp, event_type string",
    )


class TestFunnel:
    def test_strict_order_and_window(self, spark):
        ev = _events(
            spark,
            [
                # u1 completes the funnel in order
                (1, _ts(1), "view"),
                (1, _ts(2), "click"),
                (1, _ts(3), "purchase"),
                # u2 clicks BEFORE viewing -> click must not count
                (2, _ts(2), "click"),
                (2, _ts(3), "view"),
                # u3 views, clicks outside the 7-day window
                (3, _ts(1), "view"),
                (3, _ts(20), "click"),
                # u4 purchases without clicking -> stops at view
                (4, _ts(1), "view"),
                (4, _ts(2), "purchase"),
            ],
        )
        out = funnel_conversion(
            ev, ["view", "click", "purchase"], window_seconds=7 * 86400
        )
        got = {r["step_name"]: r["users"] for r in out.collect()}
        assert got == {"view": 4, "click": 1, "purchase": 1}

    def test_click_after_second_view_still_counts(self, spark):
        # the deadline anchors at the FIRST view; a click after a later
        # view but inside the first view's window counts
        ev = _events(
            spark,
            [(1, _ts(1), "view"), (1, _ts(2), "view"), (1, _ts(3), "click")],
        )
        out = funnel_conversion(
            ev, ["view", "click"], window_seconds=7 * 86400
        )
        got = {r["step_name"]: r["users"] for r in out.collect()}
        assert got == {"view": 1, "click": 1}

    def test_single_exchange_plan(self, spark, sf_dir):
        from gmall_flink_yb_spark.queries import QUERIES

        df = QUERIES["funnel_conversion"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # chained window mins must not re-shuffle per step: at most the
        # user_id exchange + the final single-partition aggregate exchange
        assert plan.count("Exchange hashpartitioning(user_id") == 1


class TestRetention:
    def test_triangle(self, spark):
        ev = _events(
            spark,
            [
                (1, _ts(1), "view"),
                (1, _ts(2), "view"),
                (2, _ts(1), "view"),
                (2, _ts(1, 12), "click"),  # same day, counts once
                (3, _ts(2), "view"),
            ],
        )
        out = retention_cohorts(ev)
        got = {
            (r["cohort_date"], r["day_offset"]): r["active_users"]
            for r in out.collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-02", 0): 1,
        }


class TestPackSequences:
    def test_matches_naive_global_window(self, spark):
        docs = spark.createDataFrame(
            [(i, "tok " * (i % 7 + 1)) for i in range(100)],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: (r["pack_id"], r["pack_offset"])
            for r in pack_sequences(
                docs, "doc_id", "text", seq_len=10, n_buckets=8
            ).collect()
        }
        # naive reference: running sum in doc_id order
        cum = 0
        for i in range(100):
            n = i % 7 + 1
            assert out[i] == (cum // 10, cum % 10), i
            cum += n

    def test_bucket_count_invariance(self, spark):
        docs = spark.createDataFrame(
            [(i * 13, "a b c " * (i % 5 + 1)) for i in range(50)],
            "doc_id long, text string",
        )
        a = sorted(
            pack_sequences(docs, "doc_id", "text", 16, n_buckets=1).collect()
        )
        b = sorted(
            pack_sequences(docs, "doc_id", "text", 16, n_buckets=17).collect()
        )
        assert a == b

    def test_no_global_single_partition_window(self, spark):
        docs = spark.createDataFrame(
            [(i, "x y z") for i in range(20)], "doc_id long, text string"
        )
        plan = (
            pack_sequences(docs, "doc_id", "text", 8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the scan window must be partitioned by bucket, never a bare
        # global ORDER BY (which Spark plans as Exchange SinglePartition)
        assert "Window [" in plan
        assert "Exchange SinglePartition" not in plan.split("Window [")[0]


class TestTokenBudgetCap:
    def test_budget_and_first_row_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "s", 600), (2, "s", 600), (3, "s", 600), (10, "t", 9000)],
            "doc_id long, source string, n_tokens long",
        )
        kept = token_budget_cap(df, "source", "doc_id", "n_tokens", 1000)
        rows = kept.collect()
        # stratum t: single over-budget doc still kept
        assert [r["doc_id"] for r in rows if r["source"] == "t"] == [10]
        # stratum s: only the first (in md5 order) fits the 1000 budget
        s_rows = [r["doc_id"] for r in rows if r["source"] == "s"]
        assert len(s_rows) == 1


class TestDsirAffinity:
    def test_target_words_score_positive(self, spark):
        # 10 docs: half "spam spam", half "ham ham"; target = spam docs
        docs = spark.createDataFrame(
            [(i, "spam spam" if i < 5 else "ham ham") for i in range(10)],
            "doc_id long, text string",
        )
        target = docs.filter(F.col("doc_id") < 5)
        out = {
            r["doc_id"]: r["affinity"]
            for r in hashed_ngram_affinity(
                docs, target, "doc_id", "text", n=1, n_buckets=64
            ).collect()
        }
        assert all(out[i] > 0 for i in range(5))
        assert all(out[i] < 0 for i in range(5, 10))


class TestReadJsonl:
    def test_clean_dirty_split(self, spark, tmp_path):
        p = tmp_path / "docs.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "ok"}\n'
            "this is not json\n"
            '{"doc_id": 2, "text": "also ok"}\n'
        )
        clean, dirty = read_jsonl(
            spark, str(p), spark.range(0).selectExpr(
                "cast(1 as long) doc_id", "'x' text"
            ).schema
        )
        assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
        assert dirty.count() == 1
