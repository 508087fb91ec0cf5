"""Keyword analysis — tokenize + explode + count (§2.9 intended surface).

The reference shipped the IK Chinese tokenizer dep (gmall-realtime/pom.xml:
179-183) and keyword-source constants SEARCH/CLICK/CART/ORDER
(common/GmallConstant.java:64-67) with no implementation. Spark-first:
``split`` (codegen'd regex) + ``explode`` + groupBy count. A pluggable
tokenizer UDF slot exists for real segmentation (e.g. jieba) but the default
regex path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# default: lowercase, split on any non-alphanumeric run (ASCII-safe and
# identical semantics in the DuckDB oracle)
DEFAULT_TOKEN_PATTERN = "[^a-z0-9]+"


def tokenize(text: Column, pattern: str = DEFAULT_TOKEN_PATTERN) -> Column:
    """Text column -> array<string> of lowercase tokens (empty strings kept
    out by the caller's filter after explode)."""
    return F.split(F.lower(text), pattern)


def keyword_counts(
    df: DataFrame,
    text_col: str,
    group_cols: list[str] | None = None,
    pattern: str = DEFAULT_TOKEN_PATTERN,
    min_token_len: int = 1,
) -> DataFrame:
    """Explode tokens and count per (group_cols..., token).

    Partial (map-side) aggregation makes the shuffle carry only distinct
    (group, token) pairs — at 100 TB that is the difference between shuffling
    tokens and shuffling the vocabulary.
    """
    toks = df.select(
        *[F.col(c) for c in (group_cols or [])],
        F.explode(tokenize(F.col(text_col), pattern)).alias("token"),
    ).filter(F.length("token") >= min_token_len)
    return toks.groupBy(*[*(group_cols or []), "token"]).agg(
        F.count(F.lit(1)).alias("token_count")
    )
