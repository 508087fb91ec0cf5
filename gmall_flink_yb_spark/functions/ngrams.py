"""Token n-gram operators for training-data curation (LLM-pipeline
surface; no reference counterpart — SURVEY.md §2.9 last paragraph):

- ``token_ngrams``: text -> array of space-joined token n-grams, built with
  pure array expressions (``transform`` over a ``sequence`` of start
  offsets + ``slice``) — a NARROW per-row computation, no explode-then-
  window shuffle, no Python.
- ``decontaminate``: flag training documents sharing any token n-gram with
  an evaluation/benchmark set (train/test overlap, the standard
  benchmark-decontamination step before LLM training).
- ``span_dup_stats``: per-document fraction of token n-grams that occur in
  at least one OTHER document — the distributed analogue of the exact
  substring-duplication metric from "Deduplicating Training Data Makes
  Language Models Better" (Lee et al., 2022), using an inverted gram index
  instead of a suffix array.

Scale design (100 TB):
- Eval/benchmark gram sets are small (benchmarks are MBs, not TBs), so
  ``decontaminate`` broadcasts them: the corpus-side gram stream is
  filtered by a broadcast hash join BEFORE any distinct/aggregate, so the
  only shuffled rows are actual hits (≈0 on clean corpora).
- ``span_dup_stats`` is inherently a global self-comparison; it shuffles
  the distinct (doc, gram) stream twice (once on gram for the occurrence
  window, once on doc for the roll-up), both with map-side partial
  aggregation. Grams are hashed to fixed-width md5 hex before shuffling so
  shuffle width is bounded by 32 hex chars, not n·avg_token_len.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.keywords import tokenize


def token_ngrams(text: Column, n: int) -> Column:
    """Lowercased token n-grams of ``text`` as ``array<string>`` (space-
    joined, order preserved, duplicates kept). Documents with fewer than
    ``n`` tokens yield an empty array — the ``when`` guard matters because
    ``sequence(1, 0)`` would otherwise count DOWN and fabricate grams."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.filter(tokenize(text), lambda t: F.length(t) > 0)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: for every document in ``df``, count the
    DISTINCT token ``n``-grams it shares with any document of ``eval_df``.

    Returns (doc_id, n_overlap_grams, contaminated) for EVERY input doc —
    clean docs report 0 — so the output is a complete audit table, not
    just the hit list.

    Plan shape: eval grams are distinct'd and broadcast (benchmark sets
    are small by construction); corpus grams stream through the broadcast
    join and only the matches reach the distinct + per-doc aggregate.
    """
    def grams_of(frame: DataFrame) -> DataFrame:
        return frame.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(token_ngrams(F.col(text_col), n)).alias("g"),
        )

    eval_grams = grams_of(eval_df).select("g").distinct()
    hits = (
        grams_of(df)
        .join(F.broadcast(eval_grams), "g")
        .select("doc_id", "g")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_grams"))
    )
    ids = df.select(F.col(id_col).cast("long").alias("doc_id"))
    overlap = F.coalesce(F.col("n_overlap_grams"), F.lit(0))
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        overlap.alias("n_overlap_grams"),
        (overlap > 0).cast("int").alias("contaminated"),
    )


def span_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-document duplicated-span metric: of the document's DISTINCT
    token n-grams, how many also occur in at least one other document.

    Returns (doc_id, n_grams, n_dup_grams, dup_frac) with dup_frac rounded
    to 6 dp. Documents shorter than ``n`` tokens are absent (no grams).

    Grams shuffle as md5 hex digests (fixed 32 bytes; md5 so the DuckDB
    oracle hashes identically), not raw strings.
    """
    grams = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(token_ngrams(F.col(text_col), n)).alias("g"),
        )
        .select("doc_id", F.md5(F.col("g")).alias("gh"))
        .groupBy("doc_id", "gh")
        .agg(F.lit(1).alias("_one"))
    )
    occ = Window.partitionBy("gh")
    flagged = grams.withColumn("n_docs", F.count(F.lit(1)).over(occ))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("n_docs") > 1).cast("int")).alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            F.round(
                F.col("n_dup_grams").cast("double") / F.col("n_grams"), 6
            ).alias("dup_frac"),
        )
    )
