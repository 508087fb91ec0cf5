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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector scalar quantization to ``bits`` bits.

    Returns (id, n_dims, scale, q) where ``q`` is the comma-joined
    quantized vector (ints in [-qmax, qmax]) and ``scale`` is the
    dequantization factor rounded to 6 dp for display (the quantization
    itself uses full precision). All-zero vectors quantize to all zeros
    with scale 0.
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2,16], got {bits}")
    qmax = 2 ** (bits - 1) - 1
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scaled = df.select(
        F.col(id_col).alias("id"),
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
        .cast("string")
    )
    return scaled.select(
        "id",
        F.size("_v").alias("n_dims"),
        F.round(F.col("_scale"), 6).alias("scale"),
        F.concat_ws(",", F.transform(F.col("_v"), q_elem)).alias("q"),
    )
