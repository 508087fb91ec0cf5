"""Spherical k-means: Lloyd-step semantics against a tiny hand-checkable
fixture, determinism across runs, and the model-parameter scale contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.clustering import kmeans_fit_assign


def _fixture(spark):
    # two tight direction-clusters in 4-d: ~+x and ~+y
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.05, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.0, 0.05, 0.0]),
        Row(vec_id=2, embedding=[1.1, 0.0, 0.0, 0.05]),
        Row(vec_id=3, embedding=[0.05, 1.0, 0.0, 0.0]),
        Row(vec_id=4, embedding=[0.0, 0.9, 0.05, 0.0]),
        Row(vec_id=5, embedding=[0.0, 1.1, 0.0, 0.05]),
    ]
    return spark.createDataFrame(rows)


def test_two_direction_clusters_recovered(spark):
    state = kmeans_fit_assign(
        _fixture(spark), n_clusters=2, n_iterations=3
    ).collect()
    # exactly 2 clusters x 4 dims, each with 3 members
    assert len(state) == 8
    assert {r["n_members"] for r in state} == {3}
    by_cluster = {}
    for r in state:
        by_cluster.setdefault(r["cluster_id"], {})[r["dim"]] = r["c"]
    cents = [
        [v[d] for d in sorted(v)] for v in by_cluster.values()
    ]
    # one centroid points ~+x, the other ~+y (order by dominant axis)
    cents.sort(key=lambda c: -c[0])
    assert cents[0][0] == pytest.approx(1.0, abs=0.1)
    assert cents[0][1] == pytest.approx(0.0, abs=0.1)
    assert cents[1][1] == pytest.approx(1.0, abs=0.1)
    assert cents[1][0] == pytest.approx(0.0, abs=0.1)


def test_deterministic_across_runs(spark, sf_dir):
    from gmall_flink_yb_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    a = {
        (r["cluster_id"], r["dim"]): (r["n_members"], round(r["c"], 9))
        for r in kmeans_fit_assign(emb, 4, 2).collect()
    }
    b = {
        (r["cluster_id"], r["dim"]): (r["n_members"], round(r["c"], 9))
        for r in kmeans_fit_assign(emb, 4, 2).collect()
    }
    assert a == b


def test_validates_args(spark):
    with pytest.raises(ValueError, match=">= 1"):
        kmeans_fit_assign(_fixture(spark), n_clusters=0)
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit_assign(
            _fixture(spark).filter(F.col("vec_id") < 0), n_clusters=2
        )


def test_distributed_path_matches_folded(spark, sf_dir):
    """Forcing the broadcast-joined centroid engine (max_folded_kdim=0)
    must reproduce the literal-folded trajectory: same init, same 12dp
    rounding, same tie-breaks => same final state (up to avg ulp noise,
    compared at 6 dp like the oracle)."""
    from gmall_flink_yb_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    folded = {
        (r["cluster_id"], r["dim"]): (r["n_members"], round(r["c"], 6))
        for r in kmeans_fit_assign(emb, 4, 2).collect()
    }
    dist = {
        (r["cluster_id"], r["dim"]): (r["n_members"], round(r["c"], 6))
        for r in kmeans_fit_assign(emb, 4, 2, max_folded_kdim=0).collect()
    }
    assert dist == folded


def test_large_k_smoke_no_driver_model(spark):
    """k=1024 on a synthetic corpus: the distributed path must fit and
    return k*dim state rows without the driver ever holding the model
    (no collect of centroid state between iterations)."""
    from random import Random

    rng = Random(7)
    n, dim, k = 3000, 8, 1024
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows)
    # max_folded_kdim=0 forces the distributed path — k*dim=8192 would
    # otherwise fall under the default threshold and exercise the folded
    # path this test exists to avoid
    state = kmeans_fit_assign(
        emb, n_clusters=k, n_iterations=2, max_folded_kdim=0
    ).collect()
    clusters = {r["cluster_id"] for r in state}
    # non-degenerate: many clusters keep members; every state row is a
    # (cluster, dim) coordinate and membership sums to n
    assert len(clusters) > k // 4
    assert all(1 <= r["dim"] <= dim for r in state)
    total = sum(r["n_members"] for r in state if r["dim"] == 1)
    assert total == n


def test_assignment_is_narrow_no_shuffle(spark, sf_dir):
    """The assignment step must fold centroids in as literals — zero
    exchanges before the (cluster, dim) aggregate's own shuffle."""
    from gmall_flink_yb_spark.plans.inspect import num_exchanges
    from gmall_flink_yb_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    state = kmeans_fit_assign(emb, n_clusters=4, n_iterations=1)
    # whole plan: scan -> narrow assign -> posexplode -> ONE aggregate
    # exchange (plus AQE may add a final coalesce read, not an exchange)
    assert num_exchanges(state) <= 1
