"""Time-series similarity search over keyed event streams.

Subsequence (motif) search — "find where each user's activity curve looks
like THIS shape" — in the spirit of distributed time-series similarity
systems (e.g. "Time Series Similarity Search for Streaming Data in
Distributed Systems", EDBT 2019; UCR-suite-style z-normalized matching).
No reference counterpart (the reference's DWS layer stops at windowed
sums) — SURVEY.md §2.9 last paragraph.

Shape (100 TB): the series aggregate is one shuffle on (key, bucket);
window assembly is ``w-1`` codegen'd ``lead``s over the key-partitioned
sort — windows never materialize as rows until the final projection, and
everything distributes by key (no global sort anywhere). The distance is
an unrolled arithmetic chain, evaluated left-to-right identically in
Spark and DuckDB (IEEE doubles + correctly-rounded sqrt), so results are
hash-exact without rounding tricks; only the final column rounds for
display.

Z-normalization makes the match amplitude/offset-invariant: a user whose
curve has the pattern's SHAPE matches regardless of their traffic volume.
Zero-variance (flat) windows carry no shape and are filtered out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def znorm_pattern(pattern: list[float]) -> list[float]:
    """Z-normalize a query pattern driver-side (plain Python floats; the
    SAME literals are embedded in the Spark plan and the SQL oracle)."""
    n = len(pattern)
    mu = sum(pattern) / n
    var = sum((x - mu) ** 2 for x in pattern) / n
    sd = var ** 0.5
    if sd == 0.0:
        raise ValueError("query pattern is flat (zero variance)")
    return [(x - mu) / sd for x in pattern]


def bucket_series(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """(key, bucket, v): the keyed series resampled to fixed buckets by
    SUM — one map-side-combined shuffle on (key, bucket)."""
    from pyspark.sql.types import DecimalType

    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds))
        .cast("long")
        .alias("bucket")
    )
    # DECIMAL-before-SUM: the bucket total must not depend on partial-agg
    # order (the repo-wide money convention), then back to double for the
    # distance arithmetic
    return df.groupBy(F.col(key_col).alias("key"), bucket).agg(
        F.sum(F.col(value_col).cast(DecimalType(18, 6)))
        .cast("double")
        .alias("v")
    )


def _contiguous_windows(series: DataFrame, w: int):
    """Gap-free, non-flat length-``w`` windows of a (key, bucket, v)
    series: returns (windows_df with _v0.._v{w-1}, mean_col, sd_col).
    mean/sd are unrolled left-to-right arithmetic chains so every
    downstream expression evaluates bit-identically in DuckDB."""
    win = Window.partitionBy("key").orderBy("bucket")
    vals: list[Column] = [F.col("v")] + [
        F.lead("v", i).over(win) for i in range(1, w)
    ]
    last_bucket = F.lead("bucket", w - 1).over(win)
    windowed = series.select(
        "key",
        "bucket",
        last_bucket.alias("_last"),
        *[v.alias(f"_v{i}") for i, v in enumerate(vals)],
    ).filter(F.col("_last") == F.col("bucket") + (w - 1))
    vals_sum = F.col("_v0")
    for i in range(1, w):
        vals_sum = vals_sum + F.col(f"_v{i}")
    mean = vals_sum / F.lit(float(w))
    sq = (F.col("_v0") - mean) * (F.col("_v0") - mean)
    for i in range(1, w):
        d = F.col(f"_v{i}") - mean
        sq = sq + d * d
    sd = F.sqrt(sq / F.lit(float(w)))
    return windowed.filter(sd > 0.0), mean, sd


# Normal-distribution breakpoints for a 4-symbol SAX alphabet (Lin et al.
# 2003): equiprobable regions under N(0,1). Literals are shared verbatim
# with the SQL oracle.
SAX_BREAKPOINTS = (-0.6745, 0.0, 0.6745)


def sax_motifs(series: DataFrame, w: int, k: int = 20) -> DataFrame:
    """Recurring-pattern DISCOVERY (vs motif_search's query-pattern
    matching): each gap-free non-flat window z-normalizes and discretizes
    to a ``w``-letter SAX word over a 4-symbol alphabet (Lin et al. 2003
    Symbolic Aggregate approXimation, here at PAA segment = 1 bucket);
    windows sharing a word are candidate recurring motifs. Returns the
    top-``k`` words by support: (sax_word, n_windows, n_keys).

    Scale shape: the word is a narrow per-row expression; the only
    added shuffle is the word-count aggregate (map-side combined, word
    space bounded by 4^w). This is the standard blocking step that turns
    all-pairs motif discovery into bucket-local verification.
    """
    if w < 2:
        raise ValueError(f"window must have >= 2 points, got {w}")
    windows, mean, sd = _contiguous_windows(series, w)
    b1, b2, b3 = SAX_BREAKPOINTS
    letters = []
    for i in range(w):
        z = (F.col(f"_v{i}") - mean) / sd
        letters.append(
            F.when(z < b1, "a")
            .when(z < b2, "b")
            .when(z < b3, "c")
            .otherwise("d")
        )
    return (
        windows.select(
            "key", F.concat(*letters).alias("sax_word")
        )
        .groupBy("sax_word")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.countDistinct("key").alias("n_keys"),
        )
        .orderBy(F.desc("n_windows"), "sax_word")
        .limit(k)
    )


def motif_search(
    series: DataFrame,
    pattern: list[float],
    k: int = 20,
) -> DataFrame:
    """Top-``k`` best z-normalized matches of ``pattern`` across every
    key's series in ``series`` ((key, bucket, v) rows).

    A window qualifies only if its ``len(pattern)`` buckets are
    CONSECUTIVE (``lead(bucket, w-1) == bucket + w-1`` — gaps in a series
    do not fabricate windows) and non-flat. Distance is z-normalized
    euclidean; ties break on (key, bucket) for a deterministic cut.

    Returns (key, window_start_bucket, dist) with dist rounded to 6 dp
    for display (the ORDER BY uses the unrounded chain).
    """
    w = len(pattern)
    if w < 2:
        raise ValueError(f"pattern must have >= 2 points, got {w}")
    p = znorm_pattern(pattern)
    scored, mean, sd = _contiguous_windows(series, w)
    dist_sq = None
    for i in range(w):
        z = (F.col(f"_v{i}") - mean) / sd
        term = (z - F.lit(p[i])) * (z - F.lit(p[i]))
        dist_sq = term if dist_sq is None else dist_sq + term
    dist = F.sqrt(dist_sq)
    return (
        scored.select(
            "key",
            F.col("bucket").alias("window_start_bucket"),
            dist.alias("_dist"),
        )
        .orderBy("_dist", "key", "window_start_bucket")
        .limit(k)
        .select(
            "key",
            "window_start_bucket",
            F.round("_dist", 6).alias("dist"),
        )
    )
