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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.text import token_count
from gmall_flink_yb_spark.operators.keywords import tokenize


def chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """CCNet-style shared-span removal (Wenzek et al. 2020 dedup step,
    adapted from paragraphs to disjoint token windows): any chunk whose text
    occurs in >= ``min_docs`` DISTINCT documents is boilerplate and is
    dropped from EVERY document containing it; the surviving chunks are
    reassembled in order.

    Returns (doc_id, n_chunks, n_dropped_chunks, clean_text) — one row per
    document that has at least one token; clean_text is '' when every chunk
    was boilerplate.

    Scale design (100 TB): exactly two shuffles. (1) chunk rows aggregate on
    md5(chunk_text) — the shuffle carries 16-byte keys + counts, with
    map-side partial aggregation, never the chunk text; the count table then
    joins back on the same hash (co-partitioned by AQE). (2) reassembly
    groups by doc_id. Chunking itself is narrow (``chunk_documents``), and
    a hot boilerplate chunk is ONE group row at the count step — skew-safe.
    """
    chunks = chunk_documents(
        df, id_col, text_col, chunk_size=chunk_size, stride=chunk_size
    ).withColumn("_h", F.md5("chunk_text"))
    counts = chunks.groupBy("_h").agg(
        F.countDistinct("doc_id").alias("_n_docs")
    )
    marked = chunks.join(counts, "_h").withColumn(
        "_drop", F.col("_n_docs") >= min_docs
    )
    kept_structs = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("_drop"), F.struct("chunk_id", "chunk_text")
            )
        )
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("_drop").cast("long")).alias("n_dropped_chunks"),
            kept_structs.alias("_kept"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dropped_chunks",
            F.concat_ws(
                " ", F.transform(F.col("_kept"), lambda s: s["chunk_text"])
            ).alias("clean_text"),
        )
    )


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


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 2048,
    n_buckets: int = 256,
) -> DataFrame:
    """Contiguous-fill sequence packing: concatenate all documents in
    ``id_col`` order and cut the token stream every ``seq_len`` tokens —
    the standard pack-and-chunk step that turns a curated corpus into
    fixed-length training sequences. Each document is assigned to the pack
    where it STARTS:

        start(doc)   = sum of n_tokens of all docs with smaller id
        pack_id      = start // seq_len
        pack_offset  = start %  seq_len

    Returns (doc_id, n_tokens, pack_id, pack_offset) for docs with > 0
    tokens.

    Scale design (100 TB): a global running sum is a prefix-scan, which a
    naive ``sum() over (order by id)`` computes on ONE partition — a
    scale-killer. Here it is the classic two-phase distributed scan:

    1. bucket docs by id range (``id // bucket_width`` — deterministic,
       no sampling, unlike repartitionByRange whose boundaries can shift
       between jobs);
    2. per-bucket token totals -> driver (``n_buckets`` rows — a model-
       parameter-sized collect, same legitimacy class as IVF centroids);
    3. exclusive bucket offsets go back as a broadcast join, and the
       within-bucket running sum is a window partitioned BY BUCKET —
       every partition scans independently.

    One shuffle (the bucket window); the per-bucket aggregate piggybacks
    map-side. The oracle is the single-partition window formulation —
    value-identical, engine-trivial at sf, impossible at 100 TB.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    max_id = toks.agg(F.max("doc_id")).first()[0]
    if max_id is None:
        return toks.select(
            "doc_id",
            "n_tokens",
            F.lit(0).cast("long").alias("pack_id"),
            F.lit(0).cast("long").alias("pack_offset"),
        )
    bucket_width = max(1, (int(max_id) + n_buckets) // n_buckets)
    bucketed = toks.withColumn(
        "_b", (F.col("doc_id") / bucket_width).cast("long")
    )
    # n_buckets rows: tiny, driver-side exclusive prefix sum
    totals = {
        r["_b"]: r["_s"]
        for r in bucketed.groupBy("_b").agg(F.sum("n_tokens").alias("_s")).collect()
    }
    running, offsets = 0, {}
    for b in sorted(totals):
        offsets[b] = running
        running += totals[b]
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(o)) for b, o in offsets.items()], "_b long, _off long"
        )
    )
    w = Window.partitionBy("_b").orderBy("doc_id")
    start = F.col("_off") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        bucketed.join(offsets_df, "_b")
        .withColumn("_start", start.cast("long"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"_start div {int(seq_len)}").alias("pack_id"),
            (F.col("_start") % seq_len).cast("long").alias("pack_offset"),
        )
    )
