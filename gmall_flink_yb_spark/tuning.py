"""Data-sized shuffle parallelism (VERDICT r7 #3).

``session.get_spark`` sizes ``spark.sql.shuffle.partitions`` from CPU
count — right for a fixed bench box, wrong as data scales: the 1000x
substring-dedup run went superlinear at the 32-partition session default
(248 s — per-partition window sorts outgrew memory and spilled
pathologically) and returned to at-linear at 256 (129.8 s,
BASELINE.md). The repo's stated rule, "size shuffle partitions so sorts
fit in memory", is enforced by this module instead of by hand-passed
knobs:

    partitions = estimated shuffle bytes / target partition bytes,
    clamped to [current session parallelism, PARTITIONS_MAX]

Shuffle bytes are estimated as PARQUET SCAN BYTES x an operator
EXPANSION factor, because the scan size is what a caller can know
cheaply (one filesystem metadata call — no data read, no Spark job) and
the expansion is a property of the operator family:

- Parquet's columnar compression alone is ~3x for text.
- Row-exploding operators multiply further: the span-removal gram
  stream carries ~44 B per token (32-hex md5 + pos + doc_id) where the
  raw text spends ~6 B — with decompression that is the ~20x end-to-end
  expansion ``GRAM_EXPANSION`` encodes (calibrated on the measured
  1000x point: ~0.7 GB of salted corpus parquet needed ~256 partitions
  at the 64 MB target).

On a real cluster the same arithmetic holds per-executor: 64 MB
post-expansion partitions keep any window/sort/hash state far inside a
multi-GB task heap while staying coarse enough that task-launch overhead
never dominates. AQE coalesces DOWN when the estimate overshoots (small
actual shuffles merge back to fewer partitions at runtime), so the cost
of overestimating is near zero; underestimating is the failure mode this
module exists to prevent — AQE cannot SPLIT a sort partition that
already outgrew memory mid-task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# post-expansion bytes one shuffle partition should hold: sorts/hash maps
# of this size fit comfortably in task memory at default executor sizing
TARGET_PARTITION_BYTES = 64 * 1024 * 1024
# backstop against degenerate estimates (a million-partition shuffle is
# scheduler abuse, not parallelism)
PARTITIONS_MAX = 20_000

# measured end-to-end expansion of the token-gram explosion over text
# parquet (decompression ~3x, then ~44 B/token gram rows vs ~6 B/token
# raw text); see module docstring for the 1000x calibration point
GRAM_EXPANSION = 20.0

# Per-family shuffle-expansion constants (VERDICT r8 #3: GRAM_EXPANSION is
# gram-calibrated but was applied to the dedup stages too). Each is
# measured as TOTAL SHUFFLE WRITE BYTES of the family's representative
# operator divided by its corpus's parquet scan bytes, via the Spark UI
# stage metrics (tools/calibrate_expansion.py, sf0.1 x 100 replicas =
# 84 MB salted corpus / 78 MB salted embeddings; ratios stable vs the 5x
# smoke point within ~7%); calibration rows live in BASELINE.md.
# Constants round UP from the measured point — overshoot is
# AQE-coalesced, undershoot is the memory cliff this module prevents.
# Cross-check: the gram family measured 12.5 here; GRAM_EXPANSION keeps
# its 20.0 partition-crossover calibration (the binding constraint was
# the 1000x window-sort regime, not total write volume).
#
# shingle/MinHash stream: tokenize -> distinct shingles -> 32-hash
# signatures -> banded buckets + persisted-signature band join; measured
# 30.1x at 100x / 32.0x at 5x (heavier per scanned byte than grams: the
# md5-hex shingle stream shuffles once for df-ranks and again under the
# candidate join, each row carrying the signature array).
SHINGLE_EXPANSION = 32.0
# ANN band rows: B bands x (64-double vector + band/bucket) per vector,
# both sides of the incremental join; measured 6.9x at 100x / 6.8x at 5x.
VECTOR_EXPANSION = 8.0
# persisted md5-hex gram / band index rows probed by the incremental
# operators: no explode — parquet decompression (~2-3x for hex strings)
# plus shuffle row overhead
HASH_INDEX_EXPANSION = 4.0
# above-file-count threshold where per-file size stats switch to
# parent-directory content summaries (bounds driver metadata RPCs)
_MAX_FILE_STATS = 1024


def estimate_parquet_bytes(spark: SparkSession, *paths: str) -> int:
    """Total on-disk bytes under ``paths`` via the Hadoop filesystem —
    one metadata call per path, no data read, cluster-correct for any
    scheme (local, HDFS, S3A). Missing paths count zero (a caller sizing
    for an about-to-be-written corpus passes its inputs instead)."""
    total = 0
    for p in paths:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            total += int(fs.getContentSummary(jpath).getLength())
    return total


def partitions_for_bytes(
    n_bytes: float,
    target_bytes: int = TARGET_PARTITION_BYTES,
    lo: int = 1,
    hi: int = PARTITIONS_MAX,
) -> int:
    """ceil(n_bytes / target), clamped to [lo, hi]."""
    import math

    return max(lo, min(hi, math.ceil(max(n_bytes, 1) / target_bytes)))


def size_shuffle_partitions(
    spark: SparkSession,
    *paths: str,
    expansion: float = 1.0,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int:
    """Set ``spark.sql.shuffle.partitions`` from the data: scan bytes of
    ``paths`` x ``expansion`` / ``target_bytes``, floored at the session's
    CURRENT setting (the box-parallelism default — this helper only ever
    scales UP; scaling down is AQE coalescing's job at runtime). Returns
    the value set. Runtime conf: applies to plans built afterwards."""
    current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = partitions_for_bytes(
        estimate_parquet_bytes(spark, *paths) * expansion,
        target_bytes=target_bytes,
        lo=current,
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts


def input_file_bytes(df: DataFrame) -> int | None:
    """On-disk bytes of the files backing ``df``'s plan — driver-side
    metadata only, no Spark job. ``None`` when the frame has no file
    sources (local relations, pure streams), which callers treat as
    "cannot size, leave the session alone".

    Up to ``_MAX_FILE_STATS`` files this stats each file exactly; beyond
    that it takes one ``getContentSummary`` per DISTINCT PARENT DIRECTORY
    (a handful of RPCs however many files a 100 TB table holds). The
    directory form can overcount when partition pruning kept only some of
    a directory's files — the safe direction: overcounting derives more
    partitions, and AQE coalesces the overshoot at runtime, while an
    undercount is the memory cliff the sizing exists to prevent."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    if len(files) <= _MAX_FILE_STATS:
        for f in files:
            jpath = jvm.org.apache.hadoop.fs.Path(f)
            fs = jpath.getFileSystem(conf)
            if fs.exists(jpath):
                total += int(fs.getFileStatus(jpath).getLen())
        return total
    dirs = sorted({f.rsplit("/", 1)[0] for f in files})
    return estimate_parquet_bytes(spark, *dirs)


def file_backed_rows(df: DataFrame) -> int | None:
    """Row count for a parquet-file-backed frame from footer metadata —
    driver-side, no Spark job. Exact for scan + row-preserving plans;
    ``None`` when the frame isn't local-parquet-backed or its plan can
    MULTIPLY rows (Join/Generate/Expand — leaf counts then bound
    nothing). Row-SHRINKING nodes (Filter/Sample/Aggregate) only make it
    an upper bound — the safe direction for partition sizing and for
    SRP plane derivation (similarity._file_backed_rows delegates here).
    Footer reads cap at ``_MAX_FILE_STATS`` files, then stride-sample and
    extrapolate by file count."""
    import urllib.parse

    try:
        files = df.inputFiles()
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None
    if not files or any(not f.endswith(".parquet") for f in files):
        return None
    if any(op in plan for op in ("Join", "Generate", "Expand")):
        return None
    paths = []
    for f in files:
        if f.startswith("file:"):
            paths.append(
                urllib.parse.unquote(urllib.parse.urlparse(f).path)
            )
        elif "://" in f:
            return None  # remote FS — footer reads need that FS's client
        else:
            paths.append(f)
    import pyarrow.parquet as pq

    if len(paths) <= _MAX_FILE_STATS:
        sample = paths
    else:
        stride = len(paths) / _MAX_FILE_STATS
        sample = [paths[int(i * stride)] for i in range(_MAX_FILE_STATS)]
    try:
        rows = sum(pq.ParquetFile(p).metadata.num_rows for p in sample)
    except Exception:
        return None
    return int(rows * (len(paths) / len(sample)))


def auto_shuffle_partitions_for_rows(
    df: DataFrame,
    bytes_per_row: float,
    auto_partitions: bool | int = True,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int | None:
    """Row-count-based twin of :func:`auto_shuffle_partitions`, for
    NARROW-ROW shuffles whose volume tracks row COUNT, not scan bytes
    (exact_dedup's fingerprint aggregate: ~48 B of md5+id+overhead per
    document regardless of document size — a scan-bytes expansion would
    be corpus-shape-dependent, a per-row constant is not). Rows come
    from parquet footer metadata (:func:`file_backed_rows`, no job);
    non-file frames are left alone under ``True``. Same knob contract:
    int = explicit partition target, False = off; only ever scales up."""
    if auto_partitions is False:
        return None
    spark = df.sparkSession
    current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if auto_partitions is True:
        rows = file_backed_rows(df)
        if rows is None:
            return None
        parts = partitions_for_bytes(
            rows * bytes_per_row, target_bytes=target_bytes, lo=current
        )
    else:
        parts = max(int(auto_partitions), current)
    if parts > current:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts


# narrow hash-row width for fingerprint-style aggregates: 16 B md5 +
# 8 B id + UnsafeRow/agg-map overhead
FINGERPRINT_ROW_BYTES = 48.0


def auto_shuffle_partitions(
    df: DataFrame,
    expansion: float,
    auto_partitions: bool | int = True,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int | None:
    """The OPERATOR-ENTRY sizing hook (VERDICT r8 #1): derive the shuffle
    partition count an operator over ``df`` needs and raise the session
    setting to it, from inside the operator — so a user calling
    ``dup_span_rows`` / ``minhash_lsh_pairs`` on a 100 TB corpus gets the
    at-linear partition count automatically instead of rediscovering the
    superlinear session-default regime the 1000x benches measured
    (248 s -> 130 s at the same plan; BASELINE.md).

    ``auto_partitions`` is the operator's knob, passed through verbatim:

    - ``True`` — derive from ``df``'s backing files x ``expansion``
      (:func:`input_file_bytes`); frames with no file sources are left
      alone (returns None) — the explicit-int form is the path for those.
    - an ``int`` — explicit target for non-file inputs (or to override
      the estimate); still floored at the session's current setting.
    - ``False`` — do nothing (returns None).

    Only ever scales UP (floor = current session value): overshoot on
    later small queries is AQE-coalesced, and scaling down could starve a
    concurrent plan that sized itself higher. The raised value persists
    on the session — by design, since the operator's own lazily-returned
    plan must still see it when the caller finally executes it (there is
    no "on first action" hook to scope a conf to one plan)."""
    if auto_partitions is False:
        return None
    spark = df.sparkSession
    current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if auto_partitions is True:
        n_bytes = input_file_bytes(df)
        if n_bytes is None:
            return None
        parts = partitions_for_bytes(
            n_bytes * expansion, target_bytes=target_bytes, lo=current
        )
    else:
        parts = max(int(auto_partitions), current)
    if parts > current:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts


# parquet's string compression on the calibration corpora is ~2-3x, so
# in-memory text bytes need a smaller multiplier than the scan-bytes-
# calibrated expansion constants; erring high is AQE-coalesced. Measured
# on the sf0.1 documents table: scan 0.59 MB vs sum(octet_length(text))
# 1.49 MB = 2.5x — a discount of 2 keeps the raw-bytes path's derived
# target within ~25% ABOVE the file-backed path's (the safe side).
RAW_TEXT_DISCOUNT = 2.0


def auto_shuffle_partitions_for_batch(
    df: DataFrame,
    expansion: float,
    *payload_cols: str,
    auto_partitions: bool | int = True,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int | None:
    """Per-micro-batch twin of :func:`auto_shuffle_partitions` for
    foreachBatch bodies (the streaming edition of VERDICT r8 #1's wiring):
    a micro-batch DataFrame is not file-backed, so the batch operators'
    entry hooks no-op inside the batch function — and a giant availableNow
    backfill batch (one batch IS a corpus) then runs its gram/shingle
    shuffle at the session default, the superlinear regime the 1000x
    benches measured; at the 5M-doc backfill tier it is a JVM heap OOM,
    not a slowdown (BASELINE.md round-9).

    Sizing source, in order: ``input_file_bytes`` when the micro-batch
    plan IS file-backed (FileStreamSource batches usually are — exact and
    job-free), else ONE aggregate job summing ``octet_length`` over
    ``payload_cols`` on the (caller-persisted) batch, discounted by
    ``RAW_TEXT_DISCOUNT`` since the expansion constants are calibrated
    against compressed scan bytes. Same knob contract as the other hooks:
    True = derive, int = explicit, False = off; only ever scales UP, AQE
    coalesces overshoot."""
    if auto_partitions is False:
        return None
    spark = df.sparkSession
    current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if auto_partitions is True:
        n_bytes = input_file_bytes(df)
        if n_bytes is None and payload_cols:
            n_raw = (
                df.select(
                    sum(
                        (F.octet_length(F.col(c).cast("string"))
                         for c in payload_cols),
                        F.lit(0),
                    ).alias("_b")
                )
                .agg(F.sum("_b"))
                .first()[0]
            )
            n_bytes = (n_raw or 0) / RAW_TEXT_DISCOUNT
        if n_bytes is None:
            return None
        parts = partitions_for_bytes(
            n_bytes * expansion, target_bytes=target_bytes, lo=current
        )
    else:
        parts = max(int(auto_partitions), current)
    if parts > current:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts
