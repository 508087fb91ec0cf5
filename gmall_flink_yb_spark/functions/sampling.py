"""Deterministic sampling operators for training-data pipelines (LLM-
pipeline surface; no reference counterpart — SURVEY.md §2.9 last paragraph).

Why not `df.sample()`: its output depends on partitioning and a session
seed, so it is neither reproducible across engines nor stable under
repartitioning — useless for auditable corpus curation. Both operators
here key the decision on md5 of the row's business key, which is
bit-identical in Spark and DuckDB (oracle-checkable) and stable under any
physical layout.

Scale design (100 TB):
- `hash_sample` is a pure narrow filter — no shuffle, pushed next to the
  scan, trivially parallel.
- `stratified_sample` needs one shuffle on the stratum key (row_number
  window). For exact-k-per-stratum that is unavoidable; for large k prefer
  `hash_sample` per stratum (rate-based, shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the md5; uniform on [0, 16^8)
_HEX_DIGITS = 8
_SPACE = 16 ** _HEX_DIGITS


def _hash_bucket(key: Column) -> Column:
    """First 32 bits of md5(key) as a lowercase hex string. Lexicographic
    comparison on fixed-width lowercase hex == numeric comparison, and the
    expression is identical in DuckDB: substr(md5(x), 1, 8)."""
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS)


def sample_threshold(fraction: float) -> str:
    """Threshold string such that P[bucket < threshold] ==
    round(fraction*2^32)/2^32 under 8-char lexicographic comparison.
    fraction==1.0 returns 'g'*8, which sorts after every hex bucket (a
    9-char hex number would break the fixed-width string comparison)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(round(fraction * _SPACE))
    if n >= _SPACE:
        return "g" * _HEX_DIGITS
    return format(n, f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, key_col: str | Column, fraction: float) -> DataFrame:
    """Keep a deterministic ~`fraction` of rows, decided per-row by
    md5(key). Reproducible across engines, runs, and partitionings; the
    same key always gets the same verdict (dedup-friendly: a doc sampled
    in means its exact duplicate elsewhere is sampled in too)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return df.filter(_hash_bucket(key) < F.lit(sample_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by md5(key) order
    (a deterministic uniform permutation within each stratum; key as final
    tie-break makes duplicate-key corpora deterministic too)."""
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_bucket(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_strat_rn", F.row_number().over(w))
        .filter(F.col("_strat_rn") <= k)
        .drop("_strat_rn")
    )
