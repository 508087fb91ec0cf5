"""Domain-mix sampling + embedding quantization (LLM-pipeline surface)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.quantize import (
    quantize_embeddings,
    quantized_topk,
)
from gmall_flink_yb_spark.functions.sampling import domain_mix_sample


def _corpus(spark, sizes: dict[str, int]):
    rows, next_id = [], 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((next_id, dom))
            next_id += 1
    return spark.createDataFrame(rows, "doc_id long, dom string")


def test_domain_mix_alpha_one_keeps_everything(spark):
    df = _corpus(spark, {"a": 40, "b": 10})
    assert domain_mix_sample(df, "dom", "doc_id", alpha=1.0).count() == 50


def test_domain_mix_flattens_toward_smallest(spark):
    df = _corpus(spark, {"big": 400, "small": 25})
    kept = (
        domain_mix_sample(df, "dom", "doc_id", alpha=0.5)
        .groupBy("dom")
        .count()
        .collect()
    )
    by_dom = {r["dom"]: r["count"] for r in kept}
    # small domain: rate 1.0 -> kept in full
    assert by_dom["small"] == 25
    # big domain: rate sqrt(25/400) = 0.25 -> ~100 of 400 (hash-binomial)
    assert 70 <= by_dom["big"] <= 130


def test_domain_mix_deterministic_membership(spark):
    df = _corpus(spark, {"a": 100, "b": 30})
    ids1 = sorted(
        r["doc_id"]
        for r in domain_mix_sample(df, "dom", "doc_id", alpha=0.3).collect()
    )
    ids2 = sorted(
        r["doc_id"]
        for r in domain_mix_sample(
            df.repartition(7), "dom", "doc_id", alpha=0.3
        ).collect()
    )
    assert ids1 == ids2 and len(ids1) > 0


def test_domain_mix_rejects_bad_alpha(spark):
    df = _corpus(spark, {"a": 1})
    with pytest.raises(ValueError):
        domain_mix_sample(df, "dom", "doc_id", alpha=1.5)


def test_domain_mix_corpus_is_not_shuffled(spark):
    # the rates join must be broadcast: the corpus side stays un-exchanged
    df = _corpus(spark, {"a": 40, "b": 10})
    plan = domain_mix_sample(df, "dom", "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_roundtrip_error_bounded(spark):
    vals = [0.5, -1.27, 0.003, 1.27, -0.9]
    df = _vecs(spark, [(1, vals)])
    r = quantize_embeddings(df, "vec_id", "embedding").first()
    q = [int(s) for s in r["q"].split(",")]
    scale = 1.27 / 127
    assert r["n_dims"] == 5
    assert max(abs(x) for x in q) == 127
    for orig, qi in zip(vals, q):
        assert abs(qi * scale - orig) <= scale / 2 + 1e-9


def test_quantize_zero_vector(spark):
    df = _vecs(spark, [(1, [0.0, 0.0, 0.0])])
    r = quantize_embeddings(df, "vec_id", "embedding").first()
    assert r["q"] == "0,0,0" and r["scale"] == 0.0


def test_quantize_negative_half_ties_round_up(spark):
    # floor(x/scale + 0.5): -0.5 -> 0, not -1 (the documented convention)
    df = _vecs(spark, [(1, [-0.5, 127.0])])
    r = quantize_embeddings(df, "vec_id", "embedding").first()
    assert r["q"].split(",")[0] == "0"


def test_quantize_bits_param(spark):
    df = _vecs(spark, [(1, [1.0, -1.0, 0.5])])
    r = quantize_embeddings(df, "vec_id", "embedding", bits=4).first()
    q = [int(s) for s in r["q"].split(",")]
    assert q == [7, -7, 4]  # qmax = 7; 0.5/(1/7) = 3.5 -> 4
    with pytest.raises(ValueError):
        quantize_embeddings(df, "vec_id", "embedding", bits=1)


def test_quantize_is_shuffle_free(spark):
    df = _vecs(spark, [(1, [1.0, 2.0])])
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Exchange" not in plan


def test_quantize_scale_math(spark):
    df = _vecs(spark, [(7, [2.54, -1.0])])
    r = quantize_embeddings(df, "vec_id", "embedding").first()
    assert r["scale"] == pytest.approx(2.54 / 127, abs=1e-6)
    assert math.isclose(float(r["q"].split(",")[0]), 127)


def test_quantized_topk_matches_exact_on_spread_vectors(spark):
    # vectors far apart: int8 rounding must not change the neighbor order
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(40)]
    df = _vecs(spark, vecs)
    qs = df.filter(F.col("vec_id") < 3)

    got = {
        (r["q_id"], r["rnk"]): r["n_id"]
        for r in quantized_topk(df, qs, k=3, n_blocks=4).collect()
    }
    # exact inner-product ranking computed in numpy float64
    M = np.array([v for _, v in vecs])
    for qid in range(3):
        scores = M @ M[qid]
        scores[qid] = -np.inf
        top = np.lexsort((np.arange(40), -scores))[:3]
        exact = list(top)
        approx = [got[(qid, r)] for r in (1, 2, 3)]
        # int8 quantization of well-spread gaussians preserves top-3
        assert approx == exact, (qid, approx, exact)


def test_quantized_topk_excludes_self_and_ranks_fully(spark):
    df = _vecs(spark, [(i, [float(i + 1), 1.0]) for i in range(10)])
    qs = df.filter(F.col("vec_id") == 0)
    rows = quantized_topk(df, qs, k=4, n_blocks=2).collect()
    assert len(rows) == 4
    assert all(r["n_id"] != 0 for r in rows)
    assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == [1, 2, 3, 4]
