"""Token-window chunking for LLM training-data preparation (LLM-pipeline
surface; no reference counterpart — SURVEY.md §2.9 last paragraph).

Splits each document into fixed-size token chunks with a configurable
stride (stride == chunk_size -> disjoint chunks; stride < chunk_size ->
overlapping context windows), the standard packing step before
tokenizer/sequence assembly.

Scale design (100 TB): the entire operator is NARROW — tokenize, build the
list of chunk start offsets with ``sequence``, slice per start, and
``posexplode``. Zero shuffles: each input split maps to its output chunks
in place, so it runs at scan speed on any number of executors and composes
with downstream repartitioning only if the caller asks for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.keywords import tokenize


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Explode each document into (doc_id, chunk_id, n_chunk_tokens,
    chunk_text) rows of at most ``chunk_size`` tokens starting every
    ``stride`` tokens. The final chunk may be shorter; documents with zero
    tokens produce no chunks. chunk_id is 0-based in stride order."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    stride = chunk_size if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    toks = F.filter(tokenize(F.col(text_col)), lambda t: F.length(t) > 0)
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("_toks")
    ).filter(F.size("_toks") > 0)
    # one chunk per start offset 1, 1+stride, ... while the offset still
    # lands on a token (so every token is covered and no chunk is empty)
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("_toks"), F.lit(stride)),
        lambda s: F.struct(
            F.least(
                F.lit(chunk_size), F.size("_toks") - s + 1
            ).alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice(F.col("_toks"), s, chunk_size)).alias(
                "chunk_text"
            ),
        ),
    )
    return base.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "_c")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )
