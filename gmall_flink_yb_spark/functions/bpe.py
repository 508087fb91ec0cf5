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
    # no spread_file_scan: measured flat-to-slower for the BPE queries at
    # sf0.1 (the word-count partial agg collapses the explode map-side,
    # so the starved scan's output is already tiny when it shuffles)
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


def _sym_pairs(w: DataFrame) -> DataFrame:
    """(pair, n) adjacent symbol pairs of the ``r`` spaced-symbol column."""
    syms = w.select(F.split(F.trim("r"), " ").alias("s"), "n").filter(
        F.size("s") >= 2
    )
    return syms.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s") - 1),
                lambda i: F.concat(
                    F.element_at("s", i),
                    F.lit(" "),
                    F.element_at("s", i + 1),
                ),
            )
        ).alias("pair"),
        "n",
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 6,
    passes_per_merge: int = 3,
) -> DataFrame:
    """Full BPE training loop: (step, pair, n_occurrences) — the merge
    table a tokenizer trainer would emit, learned distributed.

    Words are represented as space-separated symbol sequences
    (`` c h a r s ``). Each step counts adjacent symbol pairs weighted by
    word frequency, picks the (count desc, pair asc) maximum — ONE row of
    model state crossing to the driver per step, like the k-means centroid
    collect — and merges that pair everywhere.

    Merge application is ``passes_per_merge`` iterated leftmost
    non-overlapping replaces of `` a b `` with `` ab `` — a defined,
    PORTABLE semantic (Java's replaceAll and RE2's global replace agree on
    leftmost non-overlap), which the DuckDB oracle replays pass-for-pass.
    A same-symbol run longer than ~2^passes may stay partially merged —
    identical in both engines, so the trajectory is still bit-reproducible.

    Scale: the loop never touches the corpus after the one ``word_counts``
    shuffle; every iteration is a vocabulary-sized aggregate plus narrow
    per-row replaces.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    base = word_counts(df, text_col).select(
        F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")).alias(
            "r"
        ),
        "n",
    ).persist()
    w = base
    merges: list[tuple[int, str, int]] = []
    # per-step cache (r13): step s's argmax plan used to replay ALL
    # s*passes accumulated replaces from the persisted base, so the six
    # argmax jobs grew 0.12 -> 1.18 s task-for-task (profiled at sf0.1).
    # Persisting each step's replaced vocab table makes step s+1 read
    # step s's cache and apply only its own ``passes`` replaces — each
    # iteration costs O(vocab), not O(step * vocab). The cache is
    # vocab-sized (never corpus-sized); the previous step's blocks are
    # freed only after the next argmax job has materialized its
    # successor, and eviction merely falls back to lineage replay.
    live: DataFrame | None = None  # materialized previous-step cache
    pending: DataFrame | None = None  # persist marked, not yet computed
    try:
        for step in range(n_merges):
            best = (
                _sym_pairs(w)
                .groupBy("pair")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), "pair")
                .first()
            )
            if pending is not None:
                # this argmax job materialized `pending`; its
                # predecessor's blocks are no longer read by anything
                if live is not None:
                    live.unpersist()
                live, pending = pending, None
            if best is None:
                break
            pair, cnt = best["pair"], int(best["cnt"])
            merges.append((step, pair, cnt))
            pat = f" {pair} "
            rep = " " + pair.replace(" ", "") + " "
            for _ in range(passes_per_merge):
                # literal replace, not regexp_replace: the pattern is
                # literal text (symbols are [a-z0-9] + spaces), and
                # StringReplace's leftmost non-overlapping scan is
                # exactly java.util.regex's global replace on a literal
                # (equality checked on overlapping-run edge cases) —
                # without the per-row Matcher machinery (guide §1.2
                # "per-task work": cheaper expression, same result)
                w = w.withColumn("r", F.replace("r", F.lit(pat), F.lit(rep)))
            if step < n_merges - 1:
                w = w.persist()
                pending = w
    finally:
        base.unpersist()
        if live is not None:
            live.unpersist()
        if pending is not None:
            pending.unpersist()
    return spark.createDataFrame(
        merges, "step int, pair string, n_occurrences long"
    )


def apply_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merge_pairs: list[str],
    passes_per_merge: int = 3,
    max_folded_merges: int = 64,
) -> DataFrame:
    """(doc_id, n_symbols_raw, n_symbols_bpe): encode every document with a
    learned merge list and report its symbol count before/after — the
    compression the tokenizer actually buys, per document.

    The whole document is one spaced-symbol string with ``|`` word
    boundaries (boundaries can never merge: learned pairs contain only
    [a-z0-9] symbols, so no pattern matches across ``|``). Each merge is
    the same ``passes_per_merge``-iterated leftmost-non-overlap replace the
    training loop used, making encode/train semantics identical — and the
    oracle replays it on the document side too.

    Scale: entirely narrow — no shuffle; cost is len(merge_pairs) x
    passes replace passes over the text, the classic CPU-bound tokenizer
    map stage. Up to ``max_folded_merges`` merges the loop unrolls as
    codegen'd regexp_replace nodes (zero Python); a PRODUCTION merge list
    (30-50k merges) would grow the plan with a PARAMETER instead of the
    data — 10^5 plan nodes (the r10 SRP-planes lesson) — so above the
    bound the same replace sequence runs inside ONE Arrow-batched
    ``mapInPandas`` stage with the merge list shipped in the task
    closure. The patterns are literal text (symbols are [a-z0-9]), so
    pandas' non-regex ``str.replace`` is exactly Spark's leftmost
    non-overlapping literal replace — path equivalence pytest-asserted.
    """
    from gmall_flink_yb_spark import tuning as _tuning

    # the encode pass is the classic CPU-bound tokenizer map stage
    # (len(merge_pairs) x passes replaces over every document); a
    # starved single-split scan serializes it on one core (profiled:
    # 1.2 s single-task at sf0.1). Same operator-entry placement as
    # shingle_rows_narrow; no-op on healthy layouts. word_counts stays
    # unspread (its partial agg collapses map-side — r12 measurement).
    df = _tuning.spread_file_scan(df)
    toks = F.filter(
        tokenize(F.col(text_col)), lambda t: F.length(t) > 0
    )
    spaced = F.concat(
        F.lit(" "),
        F.array_join(
            F.transform(
                F.col("_toks"),
                lambda w: F.regexp_replace(w, "(.)", "$1 "),
            ),
            "| ",
        ),
    )
    out = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        toks.alias("_toks"),
    ).select("doc_id", "_toks", spaced.alias("r"))
    if len(merge_pairs) <= max_folded_merges:
        for pair in merge_pairs:
            pat = f" {pair} "
            rep = " " + pair.replace(" ", "") + " "
            for _ in range(passes_per_merge):
                # literal replace == regexp_replace on a literal pattern
                # (see learn_bpe), minus the regex engine per row per pass
                out = out.withColumn(
                    "r", F.replace("r", F.lit(pat), F.lit(rep))
                )
    else:
        reps = [
            (f" {p} ", " " + p.replace(" ", "") + " ") for p in merge_pairs
        ]
        passes = passes_per_merge

        def _encode(batches):
            for pdf in batches:
                s = pdf["r"]
                for pat, rep in reps:
                    for _ in range(passes):
                        s = s.str.replace(pat, rep, regex=False)
                pdf = pdf.copy()
                pdf["r"] = s
                yield pdf

        out = out.mapInPandas(_encode, out.schema)
    symbols = F.filter(
        F.split(F.trim("r"), " "), lambda s: s != F.lit("|")
    )
    n_raw = F.aggregate(
        F.col("_toks"), F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return out.select(
        "doc_id",
        F.when(F.size("_toks") == 0, F.lit(0))
        .otherwise(n_raw)
        .cast("long")
        .alias("n_symbols_raw"),
        F.when(F.size("_toks") == 0, F.lit(0))
        .otherwise(F.size(symbols))
        .cast("long")
        .alias("n_symbols_bpe"),
    )
