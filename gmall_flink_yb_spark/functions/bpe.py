"""BPE-style vocabulary induction: weighted character-pair counting.

LLM-pipeline surface; no reference counterpart (SURVEY.md §2.9 last
paragraph). The core step of byte-pair-encoding tokenizer training
(Sennrich et al. 2016) is: count adjacent symbol pairs over the corpus,
weighted by word frequency, and merge the most frequent pair. This module
implements that counting step Spark-first.

Scale design (100 TB): BPE training never iterates over the corpus — it
iterates over the WORD-FREQUENCY table, which is vocabulary-sized
(millions of rows) regardless of corpus size. ``word_counts`` pays the one
corpus-wide shuffle (map-side partial aggregation on the word hash);
``char_pair_counts`` then works entirely on that table: pair explosion is
a narrow per-row array expression, and the pair roll-up shuffles
vocabulary-sized data. Repeated merge iterations would re-run only the
vocabulary-side stages. Everything is codegen'd column expressions — no
Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.keywords import tokenize


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n): corpus word-frequency table — the input BPE iterates on.
    One shuffle, with map-side partial counts."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def char_pair_counts(
    df: DataFrame, text_col: str, top_n: int = 50
) -> DataFrame:
    """(pair, n_occurrences): the ``top_n`` most frequent adjacent
    character pairs across the corpus, weighted by word frequency — the
    merge-candidate ranking of one BPE training step. The (count desc,
    pair asc) order is a total order, so the top-``top_n`` cut is
    deterministic even across tie boundaries."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    w = word_counts(df, text_col)
    pairs = w.filter(F.length("word") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.concat(
                    F.col("word").substr(i, F.lit(1)),
                    F.lit(" "),
                    F.col("word").substr(i + 1, F.lit(1)),
                ),
            )
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(top_n)
    )
