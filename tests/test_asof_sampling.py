"""Unit tests for the as-of join and deterministic sampling operators.

Edge cases the sf-corpus oracle can't exercise: left rows with NO prior
right row (all sf events postdate all orders), equal-timestamp visibility,
tie-break among right rows sharing (key, ts), and sample stability under
physical re-layout."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.sampling import (
    hash_sample,
    sample_threshold,
    stratified_sample,
    weighted_sample,
)
from gmall_flink_yb_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),  # after r1, before r2
            (1, _ts("2024-01-01T12:00:00"), "b"),  # == r2 ts: r2 visible
            (2, _ts("2024-01-01T09:00:00"), "c"),  # no right row at all
            (3, _ts("2024-01-01T08:00:00"), "d"),  # before key-3 right row
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 100, "r1"),
            (1, _ts("2024-01-01T12:00:00"), 200, "r2-low"),
            (1, _ts("2024-01-01T12:00:00"), 300, "r2-high"),  # tie winner
            (3, _ts("2024-01-01T23:00:00"), 400, "r4"),
        ],
        "k long, rts timestamp, rid long, rname string",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "k", "k", "ts", "rts",
        payload_cols=["rid", "rname"], tiebreak_col="rid",
    )
    got = {r["tag"]: (r["rid"], r["rname"]) for r in out.collect()}
    assert got == {
        "a": (100, "r1"),          # strictly-before match
        "b": (300, "r2-high"),     # equal-ts visible, max-rid tie-break
        "c": (None, None),         # key with no right rows -> nulls kept
        "d": (None, None),         # right row exists but is later -> nulls
    }
    assert out.count() == 4  # left join keeps every left row


def test_asof_join_single_shuffle(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "k", "ts", "rts",
                    payload_cols=["rid"], tiebreak_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-and-window: no BroadcastNestedLoopJoin / cartesian from a
    # range-join formulation
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_hash_sample_deterministic_and_layout_independent(spark):
    df = spark.range(0, 2000).withColumn("key", F.col("id").cast("string"))
    a = sorted(r.id for r in hash_sample(df, "key", 0.25).collect())
    b = sorted(
        r.id
        for r in hash_sample(df.repartition(13, "id"), "key", 0.25).collect()
    )
    assert a == b, "sample must not depend on physical layout"
    # binomial(2000, .25): [400, 600] is > 6 sigma
    assert 400 < len(a) < 600
    assert hash_sample(df, "key", 0.0).count() == 0
    assert hash_sample(df, "key", 1.0).count() == 2000


def test_sample_threshold_bounds():
    assert sample_threshold(0.0) == "00000000"
    assert sample_threshold(1.0) == "gggggggg"  # sorts after all hex
    assert len(sample_threshold(0.5)) == 8


def test_stratified_sample_exact_k(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, "lang", "doc_id", k=15)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 15, "small": 10}  # min(k, |stratum|)
    again = stratified_sample(df.repartition(7), "lang", "doc_id", k=15)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_weighted_sample_matches_python_aes_reference(spark):
    """Exact agreement with an independent Python A-ES replay (same md5
    midpoint uniform, same exponential key), stratified and global."""
    import hashlib, math

    rows = [(i, "s%d" % (i % 3), float(1 + (i * 7) % 50)) for i in range(60)]

    def score(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return -math.log((h + 0.5) / 2**32) / w

    exp = set()
    for stratum in ("s0", "s1", "s2"):
        member = [(score(i, w), i) for i, s_, w in rows if s_ == stratum]
        exp.update(i for _, i in sorted(member)[:5])
    df = spark.createDataFrame(rows, "doc_id long, stratum string, w double")
    got = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", "w", 5, "stratum").collect()
    }
    assert got == exp
    g_exp = {i for _, i in sorted((score(i, w), i) for i, _, w in rows)[:7]}
    g_got = {
        r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 7).collect()
    }
    assert g_got == g_exp


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = sorted(
        r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()
    )
    assert got == [1, 5]


def test_weighted_sample_layout_independent(spark):
    rows = [(i, float(1 + i % 9)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 12).collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "doc_id", "w", 12).collect()
    )
    assert a == b


def test_weighted_sample_heavy_weights_win_on_average(spark):
    """Statistical sanity: with weights 100 vs 1 split half/half, the
    heavy half must dominate a k=20-of-200 draw (binomial tail makes a
    flipped majority astronomically unlikely under A-ES)."""
    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 20).collect()]
    heavy = sum(1 for i in got if i < 100)
    assert heavy >= 15


def test_weighted_sample_rejects_bad_k(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
    with _pytest.raises(ValueError):
        weighted_sample(df, "doc_id", "w", 0)


def test_weighted_sample_global_compiles_to_take_ordered(spark):
    """The global form must be a distributed top-k (per-partition heaps
    merged on the driver), never a single-partition global sort."""
    df = spark.createDataFrame(
        [(i, 1.0 + i) for i in range(50)], "doc_id long, w double"
    )
    plan = weighted_sample(df, "doc_id", "w", 5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
