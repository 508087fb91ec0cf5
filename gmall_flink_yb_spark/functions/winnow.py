"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003).

LLM-pipeline surface; no reference counterpart (SURVEY.md §2.9 last
paragraph). Winnowing selects, from the stream of a document's k-gram
hashes, the MINIMUM hash of every sliding window of ``w`` consecutive
grams. The selected set is a position-robust fingerprint: any shared
substring of at least w+k-1 tokens between two documents is guaranteed to
contribute at least one common fingerprint, so fingerprint overlap detects
PARTIAL copies (a paragraph lifted into an otherwise-different document)
that whole-document Jaccard/MinHash misses. Density is ~2/(w+1) of the
gram count, so the fingerprint table is a small fraction of the gram
table.

This implementation uses the value-set winnowing variant: the fingerprint
set is the DISTINCT window-minimum values (the classic algorithm
additionally tracks the selected position with a rightmost-tie rule; the
value set is identical whenever hashes within a doc are distinct — a
~2^-50 per-pair collision at 60-bit hashes — and is what the overlap join
consumes anyway). Hashes come from the portable 60-bit md5 family so the
DuckDB oracle reproduces every fingerprint bit-for-bit.

Scale design (100 TB):
- Per-document work (gram assembly via ``lead``, the sliding ``min``) runs
  in ONE exchange: both window specs share (partitionBy doc_id, orderBy
  pos), so Spark plans a single hash-partition + sort and evaluates both
  windows on it. Nothing leaves the JVM; every expression is codegen'd.
- The overlap join is an inverted-index self-equi-join on the fingerprint
  value — the same bucketed shape as ``jaccard_prefix_pairs``, never
  all-pairs. Winnowed density (~2/(w+1)) bounds the index size, and a
  ``max_bucket`` guard drops degenerate fingerprints shared by more than
  ``max_bucket`` documents (boilerplate headers at corpus scale) the same
  way LSH implementations cap hot buckets; the default keeps everything so
  the oracle can check the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.dedup import _md5_long
from gmall_flink_yb_spark.operators.keywords import tokenize


def gram_hash_rows(
    df: DataFrame, id_col: str, text_col: str, k: int, portable: bool = True
) -> DataFrame:
    """(doc_id, pos, gh, n_grams): positioned hashes of the document's
    token k-grams (duplicates KEPT — winnowing needs the positional stream,
    unlike ``shingle_rows``). Docs shorter than k tokens yield their single
    truncated gram (``concat_ws`` skips null leads); empty docs yield no
    rows.

    ``portable=True`` (default, and what the registered query uses) hashes
    with the 60-bit md5 family DuckDB reproduces bit-for-bit;
    ``portable=False`` is the production path — ``xxhash64`` costs one
    integer mix instead of a cryptographic digest + hex conversion (same
    fast-vs-portable split as the MinHash family in ``dedup``)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "w"),
    ).filter(F.length("w") > 0)
    leads = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, k)]
    n_grams = F.greatest(
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")) - (k - 1),
        F.lit(1),
    )
    gram = F.concat_ws(" ", *leads)
    gh = _md5_long(gram) if portable else F.xxhash64(gram)
    return (
        toks.select(
            "doc_id",
            (F.row_number().over(w) - 1).alias("pos"),
            gh.alias("gh"),
            n_grams.alias("n_grams"),
        )
        .filter(F.col("pos") < F.col("n_grams"))
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    portable: bool = True,
) -> DataFrame:
    """(doc_id, fp): the distinct winnowed fingerprint set of each document.

    A window of ``w`` consecutive gram hashes starts at every position
    0 .. n_grams-w; each contributes its minimum hash. Documents with fewer
    than ``w`` grams get exactly one window spanning all their grams (their
    global minimum), so every non-empty document has >= 1 fingerprint.

    The sliding min reuses the gram stage's (doc_id, pos) sort — one
    exchange total for the whole per-document phase.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    grams = gram_hash_rows(df, id_col, text_col, k, portable=portable)
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.select(
            "doc_id",
            F.min("gh").over(win).alias("fp"),
            "pos",
            "n_grams",
        )
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - w, F.lit(0)))
        .select("doc_id", "fp")
        .dropDuplicates(["doc_id", "fp"])
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int | None = None,
    portable: bool = True,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing >= ``min_shared``
    winnowed fingerprints, id_a < id_b.

    Inverted-index self-join on the fingerprint value: the only shuffle of
    doc-pair data is on ``fp``, and a pair's cost is proportional to how
    many fingerprints it actually shares. ``max_bucket`` (off by default,
    for oracle exactness) drops fingerprints occurring in more than that
    many documents before the join — the boilerplate-header guard at corpus
    scale, same role as LSH hot-bucket capping.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w, portable=portable)
    if max_bucket is not None:
        counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
        fps = (
            fps.join(counts.filter(F.col("_n") <= max_bucket), "fp")
            .select("doc_id", "fp")
        )
    # groupBy(fp) + in-group pair expansion instead of a fingerprint
    # self-join (r12; the PPJoin candidate fix applied here): the join's
    # two sides each planned AND executed the whole unpersisted
    # gram-window fingerprint subtree (no exchange reuse fired across
    # self-join sides — see plans/r12/dedup_jaccard_prefix_before.txt
    # for the family evidence). Grouping each fp's postings into one
    # sorted array and exploding (i < j) pairs visits the same
    # (fp, pair) multiset exactly once, so n_shared per pair — and the
    # oracle hash — are unchanged. doc_id is unique within an fp group
    # (fps is distinct (doc_id, fp)), so j > i gives id_a < id_b.
    grouped = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("_ds"))
        .filter(F.size("_ds") >= 2)
    )
    # Two-stage explode (r13, VERDICT/ADVICE r12): the r12 form built
    # the ENTIRE d(d-1)/2 pair array of a fingerprint group in one row
    # (flatten over nested transform) before exploding — with the
    # registered max_bucket=None a corpus-scale boilerplate fingerprint
    # shared by d documents would materialize an O(d^2) in-memory array
    # in a single task row (per-row buffer / 2^31-element limits).
    # posexplode to (i, id_a) rows first, then explode each row's tail
    # slice _ds[i+2..]: the same (i < j) pair multiset reaches the same
    # downstream aggregate (results identical), but per-row state is
    # O(d) and Generate streams the pairs. Both Generates are narrow —
    # exchange count is unchanged.
    return (
        grouped.select("_ds", F.posexplode("_ds").alias("_i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice(F.col("_ds"), F.col("_i") + F.lit(2), F.size("_ds"))
            ).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
