"""Embedding quantization for large-scale vector corpora (LLM-pipeline
surface; no reference counterpart — SURVEY.md §2.9 last paragraph).

Symmetric per-vector int8 scalar quantization — the standard storage/ANN
compression step (4x smaller than float32, dot products stay ~exact for
similarity search): ``scale = max(|x|)/qmax``, ``q_i = clamp(round(x_i /
scale))``.

Cross-engine determinism (the DuckDB oracle hash-matches bit-for-bit):
- float32 -> float64 widening is exact; division and sqrt are IEEE
  correctly-rounded in both engines.
- rounding is ``floor(x + 0.5)`` — explicitly, because Spark's ``round``
  (HALF_UP) and banker's rounding disagree on .5 ties for negatives.
- the quantized vector is emitted as a comma-joined int string, so the
  value hash covers every element exactly.

Scale design (100 TB): entirely NARROW — no shuffle, no UDF, runs at scan
speed inside whole-stage codegen. The per-row ``scale`` is materialized in
its own projection BEFORE the per-element lambda references it; free
subtrees inside ``transform`` lambdas re-evaluate per element, so inlining
``array_max`` there would make the operator O(dims^2) per row (same
pathology fixed in functions/ngrams.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector scalar quantization to ``bits`` bits.

    Returns (id, scale, q) with ``q`` an array<int> in [-qmax, qmax] and
    ``scale`` the full-precision dequantization factor. All-zero vectors
    quantize to all zeros with scale 0.
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2,16], got {bits}")
    qmax = 2 ** (bits - 1) - 1
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scaled = df.select(
        F.col(id_col).cast("long").alias("id"),
        vec.alias("_v"),
        (
            F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(float(qmax))
        ).alias("_scale"),
    )
    q_elem = lambda x: (  # noqa: E731 — named for the plan, used once
        F.when(F.col("_scale") == 0.0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-qmax),
                F.least(F.lit(qmax), F.floor(x / F.col("_scale") + F.lit(0.5))),
            )
        )
        .cast("int")
    )
    return scaled.select(
        "id",
        F.col("_scale").alias("scale"),
        F.transform(F.col("_v"), q_elem).alias("q"),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Audit form of ``quantize_vectors``: (id, n_dims, scale, q) with the
    quantized vector comma-joined into a string (element-exact value hash)
    and scale rounded to 6 dp for display."""
    qv = quantize_vectors(df, id_col, vec_col, bits)
    return qv.select(
        "id",
        F.size("q").alias("n_dims"),
        F.round(F.col("scale"), 6).alias("scale"),
        F.concat_ws(
            ",", F.transform(F.col("q"), lambda x: x.cast("string"))
        ).alias("q"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    n_blocks: int = 8,
) -> DataFrame:
    """Top-k inner-product search (MIPS) over int8-quantized vectors.

    Returns (q_id, n_id, rnk, score): rank 1..k per query by dequantized
    inner product ``(scale_q * scale_c) * <q_q, q_c>`` descending, n_id
    ascending; self-matches excluded; score rounded to 6 dp.

    Fully deterministic cross-engine: the integer dot product of two
    ``bits``-bit vectors is an exact small integer (every partial sum fits
    a double exactly, so even a float-summing engine gets the same value),
    and the two scale multiplies are IEEE-exact in a fixed order.

    Execution mirrors ``similarity.brute_force_topk``: corpus hash-split
    into ``n_blocks``, queries replicated to every block, one int64 GEMM
    per block inside ``applyInPandas``, local top-k per block, global
    window over n_blocks*k candidates per query. The quantized corpus
    shuffles at ~1/4 the byte width of the float32 original — the point of
    quantizing before searching at 100 TB.
    """
    spark = corpus.sparkSession
    c = quantize_vectors(corpus, id_col, vec_col, bits).withColumn(
        "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    ).withColumn("side", F.lit(1))
    blocks = spark.range(n_blocks).select(F.col("id").cast("int").alias("blk"))
    q = (
        quantize_vectors(queries, id_col, vec_col, bits)
        .crossJoin(F.broadcast(blocks))
        .withColumn("side", F.lit(0))
    )
    both = c.select("blk", "side", "id", "scale", "q").unionByName(
        q.select("blk", "side", "id", "scale", "q")
    )
    scored = both.groupBy("blk").applyInPandas(
        _make_quantized_local_topk(k), "q_id long, n_id long, _score double"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_score").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("_score", 6).alias("score"))
    )


def _make_quantized_local_topk(k: int):
    """Per-block scorer: int64 GEMM of quantized vectors, dequantized with
    the per-vector scale outer product; emits each query's local top-k."""

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        qs = pdf[pdf["side"] == 0]
        cs = pdf[pdf["side"] == 1]
        empty = pd.DataFrame({"q_id": [], "n_id": [], "_score": []}).astype(
            {"q_id": "int64", "n_id": "int64", "_score": "float64"}
        )
        if len(qs) == 0 or len(cs) == 0:
            return empty
        A = np.stack(qs["q"].to_numpy()).astype(np.int64)
        B = np.stack(cs["q"].to_numpy()).astype(np.int64)
        # exact integer dots; (s_q*s_c)*dot in that order — the same two
        # IEEE multiplies the SQL oracle performs
        S = np.outer(
            qs["scale"].to_numpy(), cs["scale"].to_numpy()
        ) * (A @ B.T).astype(np.float64)
        q_ids = qs["id"].to_numpy()
        n_ids = cs["id"].to_numpy()
        out_q, out_n, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            s = S[i].copy()
            s[n_ids == qid] = -np.inf
            order = np.lexsort((n_ids, -s))[:k]
            keep = order[np.isfinite(s[order])]
            out_q.extend([qid] * len(keep))
            out_n.extend(n_ids[keep])
            out_s.extend(s[keep])
        return pd.DataFrame(
            {"q_id": out_q, "n_id": out_n, "_score": out_s}
        ).astype({"q_id": "int64", "n_id": "int64", "_score": "float64"})

    return local_topk
