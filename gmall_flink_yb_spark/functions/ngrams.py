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
- ``dup_span_rows`` / ``remove_dup_spans``: the REMOVAL half of Lee et al.
  — merge every corpus-duplicated n-gram occurrence into maximal token
  spans (interval-union via a per-document window, the distributed stand-in
  for their suffix-array pass), then cut those spans out of the document
  with a pure higher-order ``filter`` over the token array (no Python, no
  range join: the span list is per-document-bounded and rides along as an
  array column).
- ``incremental_span_scrub``: the streaming/batch-incremental form — a
  span is cut when its grams repeat within the batch or match a persisted
  seen-gram index; per-batch cost tracks batch size, not corpus size.

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


def _ngrams_of_tokens(toks: Column, n: int) -> Column:
    """n-grams of an ALREADY-MATERIALIZED token-array column.

    ``toks`` must be a plain column reference, not the tokenize expression
    itself: free subtrees inside a ``transform`` lambda are re-evaluated per
    element, so inlining the regex split here would re-split the document
    once per gram (~n_tokens×, measured 10× slower at sf0.1). Callers
    project the token array in its own ``select`` first — CollapseProject
    keeps the projections separate because the split is non-cheap and
    referenced more than once."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _clean_tokens(text: Column) -> Column:
    return F.filter(tokenize(text), lambda t: F.length(t) > 0)


def token_ngrams(text: Column, n: int) -> Column:
    """Lowercased token n-grams of ``text`` as ``array<string>`` (space-
    joined, order preserved, duplicates kept). Documents with fewer than
    ``n`` tokens yield an empty array — the ``when`` guard matters because
    ``sequence(1, 0)`` would otherwise count DOWN and fabricate grams.

    Single-expression convenience form; it re-tokenizes per gram (see
    ``_ngrams_of_tokens``), so DataFrame-level callers should go through
    ``gram_rows`` instead."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return _ngrams_of_tokens(_clean_tokens(text), n)


def gram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, g) exploded token n-gram rows, with the token array
    materialized in its own projection so each document is tokenized exactly
    once regardless of how many grams it yields."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            _clean_tokens(F.col(text_col)).alias("_toks"),
        )
        .select(
            "doc_id",
            F.explode(_ngrams_of_tokens(F.col("_toks"), n)).alias("g"),
        )
    )


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
    eval_grams = gram_rows(eval_df, id_col, text_col, n).select("g").distinct()
    hits = (
        gram_rows(df, id_col, text_col, n)
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
    hot_gram_guard: bool = True,
    gram_sample_fraction: float = 0.05,
    gram_share_threshold: float | None = None,
    auto_partitions: bool | int = True,
) -> DataFrame:
    """Per-document duplicated-span metric: of the document's DISTINCT
    token n-grams, how many also occur in at least one other document.

    Returns (doc_id, n_grams, n_dup_grams, dup_frac) with dup_frac rounded
    to 6 dp. Documents shorter than ``n`` tokens are absent (no grams).

    Grams shuffle as md5 hex digests (fixed 32 bytes; md5 so the DuckDB
    oracle hashes identically), not raw strings.

    ``hot_gram_guard``: the same escape hatch as
    :func:`_dup_occurrence_positions` for this operator's own
    corpus-bounded window (here the per-gh partition holds one row per
    DOCUMENT containing the gram — a boilerplate gram shared by every
    document still sorts the whole corpus through one task). When
    profiling finds hot ghs the plan switches to: exact salted count of
    the hot grams' doc-distinct rows + broadcast semi-join flags for the
    hot slice, window for the cold remainder, and a per-doc
    totals-join-dup aggregate — answer-identical by construction
    (pytest). No hot gram -> the single-window plan below,
    byte-identical to the pre-guard form.

    ``auto_partitions``: data-sized shuffle parallelism at operator entry
    (VERDICT r8 #1) — see :func:`dup_span_rows`."""
    from gmall_flink_yb_spark import tuning as _tuning

    _tuning.auto_shuffle_partitions(
        df, _tuning.GRAM_EXPANSION, auto_partitions
    )
    grams = _distinct_doc_grams(df, id_col, text_col, n)
    if hot_gram_guard:
        from pyspark.storagelevel import StorageLevel

        from gmall_flink_yb_spark.functions.cacheutil import owns_cache
        from gmall_flink_yb_spark.operators import skew as _skew

        spark = df.sparkSession
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        thr = (
            gram_share_threshold
            if gram_share_threshold is not None
            else 1.0 / parts
        )
        sampled_docs = (
            df if gram_sample_fraction >= 1.0
            else df.sample(fraction=gram_sample_fraction, seed=42)
        )
        sampled_grams = _distinct_doc_grams(
            sampled_docs, id_col, text_col, n
        )
        hot = _skew.hot_key_shares(
            sampled_grams, ["gh"], thr,
            sample_fraction=gram_sample_fraction,
            min_sampled_count=8,  # tiny-sample guard, see hot_key_shares
        )["gh"]
        if hot:
            cached = grams.persist(StorageLevel.MEMORY_AND_DISK)
            hot_g, cold_g = _skew.hot_cold_split(
                cached, "gh", [v for v, _ in hot]
            )
            buckets = _skew.salt_buckets_for(
                max(s for _, s in hot), parts
            )
            counts = _skew.salted_agg(
                hot_g.select("doc_id", "gh"),
                ["gh"],
                {"n_docs": F.count(F.lit(1))},
                buckets=buckets,
                salt_on=["doc_id", "gh"],
            )
            hot_dup = hot_g.join(
                F.broadcast(
                    counts.filter(F.col("n_docs") > 1).select("gh")
                ),
                "gh",
                "left_semi",
            ).select("doc_id")
            occ = Window.partitionBy("gh")
            cold_dup = (
                cold_g.withColumn("n_docs", F.count(F.lit(1)).over(occ))
                .where(F.col("n_docs") > 1)
                .select("doc_id")
            )
            dup = hot_dup.unionByName(cold_dup).groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_dup_grams")
            )
            totals = cached.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_grams")
            )
            n_dup = F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long")
            return owns_cache(
                totals.join(dup, "doc_id", "left").select(
                    "doc_id",
                    "n_grams",
                    n_dup.alias("n_dup_grams"),
                    F.round(
                        n_dup.cast("double") / F.col("n_grams"), 6
                    ).alias("dup_frac"),
                ),
                cached,
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


def _distinct_doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Distinct (doc_id, gh) md5 token-n-gram rows with ZERO exchanges:
    per-doc dedup runs as a narrow ``array_distinct`` over the hashed
    gram array BEFORE the explode, replacing the corpus-wide
    groupBy(doc_id, gh) shuffle the r11 form paid (r12; the shingle_rows
    lesson from functions/dedup applied to this family — dedup per doc
    is a per-row property, so no row ever needs to move for it).
    ``array_distinct`` runs on the RAW grams and md5 hashes AFTER the
    explode: hashing inside a ``transform`` lambda evaluates interpreted
    per element (measured 3.5x SLOWER than the shuffle it replaced at
    sf0.1 — the _ngrams_of_tokens free-subtree lesson, md5 edition),
    while the post-explode md5 is one codegen'd projection. Raw-gram
    distinct == gh distinct for every input that md5 does not collide
    on — the same assumption the r11 gh-keyed groupBy form made when it
    merged rows by digest. Measured min 1.45 s vs 1.95 s (old shuffle
    form) vs 6.76 s (md5-in-lambda) on span_dup at sf0.1."""
    from gmall_flink_yb_spark import tuning as _tuning

    df = _tuning.spread_file_scan(df)
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            _clean_tokens(F.col(text_col)).alias("_toks"),
        )
        .select(
            "doc_id", _ngrams_of_tokens(F.col("_toks"), n).alias("_gs")
        )
        .select("doc_id", F.explode(F.array_distinct("_gs")).alias("g"))
        .select("doc_id", F.md5(F.col("g")).alias("gh"))
    )


def dup_span_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    hot_gram_guard: bool = True,
    gram_sample_fraction: float = 0.05,
    gram_share_threshold: float | None = None,
    auto_partitions: bool | int = True,
) -> DataFrame:
    """Maximal duplicated token spans per document: (doc_id, span_start,
    span_end), token indices 0-based inclusive.

    A token n-gram is *duplicated* when it occurs more than once in the
    whole corpus (across documents OR repeated within one — Lee et al.
    2022's "appears more than once" contract, which a suffix array gives
    for free and the inverted gram index reproduces with a plain count).
    Every duplicated gram occurrence covers tokens [pos, pos+n-1]; runs of
    occurrences whose intervals overlap or touch are merged into one
    maximal span via island detection (new island when the gap between
    consecutive start positions exceeds n).

    Scale: one shuffle on the md5 gram hash for the occurrence count, one
    on doc_id for the island window — the island window's partition is
    bounded by document length, never by corpus size. The occurrence
    count's per-gh partition is corpus-bounded (a boilerplate gram shared
    by every document lands in one partition); ``hot_gram_guard`` routes
    profiled-hot grams around that window — see
    :func:`_dup_occurrence_positions` for the full plan contract. The
    whole-corpus agg+join alternative stays rejected: measured at 500k
    docs it's 1.8x SLOWER both balanced (18.0 vs 10.4 s) and with 11
    all-corpus hot grams (22.7 vs 12.0 s), because it regenerates the
    gram stream twice for EVERY gram; the guard pays that double scan
    only for the profiled-hot slice.

    ``auto_partitions`` (VERDICT r8 #1 — the sizing rule enforced AT THE
    OPERATOR, not by whoever read the bench code): ``True`` raises the
    session's shuffle partitions to scan_bytes x GRAM_EXPANSION / 64 MB
    when ``df`` is file-backed (floor = session base, AQE coalesces
    overshoot — the 1000x measured fix for the superlinear
    session-default regime, 248 s -> 130 s on the same plan); an int is
    an explicit target for non-file inputs; ``False`` leaves the session
    alone.
    """
    from gmall_flink_yb_spark import tuning as _tuning

    _tuning.auto_shuffle_partitions(
        df, _tuning.GRAM_EXPANSION, auto_partitions
    )
    dup, deps = _dup_occurrence_positions(
        df, id_col, text_col, n,
        hot_gram_guard=hot_gram_guard,
        sample_fraction=gram_sample_fraction,
        share_threshold=gram_share_threshold,
    )
    from gmall_flink_yb_spark.functions.cacheutil import owns_cache

    return owns_cache(_island_spans(dup, n), *deps)


def _gram_positions(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, pos, gh): 0-based token start positions of every n-gram,
    hashed to md5 hex so downstream shuffles carry 32 bytes per gram."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from gmall_flink_yb_spark import tuning as _tuning

    df = _tuning.spread_file_scan(df)
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            _clean_tokens(F.col(text_col)).alias("_toks"),
        )
        .select(
            "doc_id",
            F.posexplode(_ngrams_of_tokens(F.col("_toks"), n)).alias("pos", "g"),
        )
        .select("doc_id", "pos", F.md5(F.col("g")).alias("gh"))
    )


def _windowed_dup_positions(
    positions: DataFrame, seen: DataFrame | None
) -> DataFrame:
    """(doc_id, pos) of duplicated gram occurrences via the single-pass
    count window over gh (+ optional seen-index membership) — the default
    plan, byte-identical to the pre-guard (r7) shape."""
    occ = Window.partitionBy("gh")
    counted = positions.withColumn("n_occ", F.count(F.lit(1)).over(occ))
    if seen is None:
        dup = counted.where(F.col("n_occ") > 1)
    else:
        dup = counted.join(
            seen.withColumn("_seen", F.lit(1)), "gh", "left"
        ).where((F.col("n_occ") > 1) | F.col("_seen").isNotNull())
    return dup.select("doc_id", "pos")


def _dup_occurrence_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    hot_gram_guard: bool,
    sample_fraction: float = 0.05,
    seen: DataFrame | None = None,
    share_threshold: float | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """((doc_id, pos) of every DUPLICATED gram occurrence, cached-deps):
    a gram occurrence is duplicated when its gh appears more than once in
    the corpus, or (with ``seen`` given) is a member of the seen-gram
    index. The second element lists frames this plan persisted (tag with
    ``owns_cache``; whoever materializes the result releases them).

    Default plan: one count window partitioned by gh. Its per-gh
    partition is corpus-bounded — at 100 TB a universal boilerplate gram
    ("all rights reserved ...") puts billions of rows through ONE sort
    task, the exact single-reducer shape ``operators/skew`` exists to
    kill (VERDICT r7 #1; a spill-safe sort is not a straggler-safe sort).

    ``hot_gram_guard`` is the escape hatch:

    - Profile gram shares on a DOCUMENT sample (cluster sampling:
      tokenize ``sample_fraction`` of the docs), then let
      ``skew.hot_key_shares`` row-sample the sampled gram stream by the
      same fraction before its aggregate. The doc sample bounds the
      TOKENIZE cost (the naive form regenerated EVERY gram to sample 5%
      of them, and gram generation dominates this operator); the row
      sample bounds the AGGREGATE/SHUFFLE cost (sampled organic grams
      are nearly all distinct, so the profile's hash agg would otherwise
      shuffle ~sample_fraction of the full gram stream). Net profile
      cost ~ sample_fraction of a tokenize pass + sample_fraction^2 of
      the gram shuffle. Both samplings are unbiased share estimators;
      hotness noise only ever picks the counting PLAN, never the answer.
      Grams concentrated in few documents have high doc-sample variance
      — but those are bounded by their documents' size, exactly the kind
      the window sorts fine (the mega-doc exposure is PPJoin-capped
      elsewhere).
    - For ghs above ``share_threshold`` (default 1/shuffle_partitions —
      the share where one gram's rows exceed an average partition), count
      exactly via two-phase salted aggregation (``skew.salted_agg``; the
      distinct-hot-gh output is bounded by 1/threshold rows, so it
      broadcasts back as a semi-join). Hot rows are never gh-shuffled at
      all: membership is a broadcast probe, fully parallel.
    - The cold remainder keeps the window, whose partitions are now
      bounded by the hottest COLD gram (< threshold x corpus).
    - The gram stream persists (MEMORY_AND_DISK) while the hatch is
      active: three consumers (salted count, hot probe, cold window)
      would otherwise each regenerate tokenize+explode — measured 2.3x
      slower than the window it replaces. The cached bytes are the same
      bytes the window's exchange writes to shuffle disk anyway.

    Plan-gated like the PPJoin mega-doc cap: when profiling finds no hot
    gram the returned plan is byte-identical to ``hot_gram_guard=False``
    (pytest-asserted) and nothing persists; the only cost is the sampled
    profile job.

    Exactness under sampling noise: a gram can be profiled "hot" off a
    tiny sample while occurring ONCE in the corpus — the salted count is
    exact, so such a gram is (correctly) not marked duplicated; hotness
    only picks the counting plan, never the answer (pytest-asserted).

    With ``seen``: hot ghs are membership-probed by semi-joining ``seen``
    against the broadcast hot-gh frame first (output again bounded by the
    hot list), so the big index never joins the big hot slice directly.
    """
    from pyspark.storagelevel import StorageLevel

    from gmall_flink_yb_spark.operators import skew as _skew

    positions = _gram_positions(df, id_col, text_col, n)
    if hot_gram_guard:
        spark = df.sparkSession
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        thr = (
            share_threshold if share_threshold is not None else 1.0 / parts
        )
        sampled_docs = (
            df if sample_fraction >= 1.0
            else df.sample(fraction=sample_fraction, seed=42)
        )
        # min_sampled_count=8: suppress firing off samples too small for
        # share estimates to mean anything (a near-unique gh column's
        # singletons all clear 1/parts in a tiny sample; at real scale a
        # truly-hot gram samples thr x sampled_total >> 8 times)
        hot = _skew.hot_key_shares(
            _gram_positions(sampled_docs, id_col, text_col, n),
            ["gh"],
            thr,
            sample_fraction=sample_fraction,
            min_sampled_count=8,
        )["gh"]
        if hot:
            hot_vals = [v for v, _ in hot]
            cached = positions.persist(StorageLevel.MEMORY_AND_DISK)
            hot_pos, cold_pos = _skew.hot_cold_split(
                cached, "gh", hot_vals
            )
            buckets = _skew.salt_buckets_for(
                max(s for _, s in hot), parts
            )
            counts = _skew.salted_agg(
                hot_pos.select("doc_id", "pos", "gh"),
                ["gh"],
                {"n_occ": F.count(F.lit(1))},
                buckets=buckets,
                salt_on=["doc_id", "pos"],
            )
            dup_ghs = counts.filter(F.col("n_occ") > 1).select("gh")
            if seen is not None:
                hot_frame = spark.createDataFrame(
                    [(v,) for v in hot_vals], "gh string"
                )
                seen_hot = seen.join(
                    F.broadcast(hot_frame), "gh", "left_semi"
                )
                dup_ghs = dup_ghs.unionByName(seen_hot).distinct()
            hot_dup = hot_pos.join(
                F.broadcast(dup_ghs), "gh", "left_semi"
            ).select("doc_id", "pos")
            return hot_dup.unionByName(
                _windowed_dup_positions(cold_pos, seen)
            ), [cached]
    return _windowed_dup_positions(positions, seen), []


def _island_spans(dup_positions: DataFrame, n: int) -> DataFrame:
    """Merge duplicated gram start positions (doc_id, pos) into maximal
    [span_start, span_end] token intervals: consecutive starts whose
    length-n intervals overlap or touch (gap <= n) share an island."""
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_positions.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") - F.lag("pos").over(by_pos) > n, F.lit(1)
        ).otherwise(F.lit(0)).alias("_brk"),
    ).withColumn("_island", F.sum("_brk").over(by_pos))
    return islands.groupBy("doc_id", "_island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (n - 1)).alias("span_end"),
    ).select("doc_id", "span_start", "span_end")


def remove_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    hot_gram_guard: bool = True,
    gram_sample_fraction: float = 0.05,
    gram_share_threshold: float | None = None,
    auto_partitions: bool | int = True,
) -> DataFrame:
    """Cut every maximal duplicated span (``dup_span_rows``) out of its
    document. Returns one row per input document:
    (doc_id, total_tokens, dup_tokens, kept_tokens, n_spans, clean_text)
    where ``clean_text`` is the surviving tokens re-joined with single
    spaces (documents are normalized to the token stream on both the keep
    and cut paths, so the contract is token-exact, not whitespace-exact).

    Plan shape: spans collapse to one array<struct> column per document
    (bounded by doc_len / n entries), join back to the token arrays, and
    the cut itself is a codegen'd higher-order ``filter`` with an index
    lambda — no explode of the token stream, no per-token range join, no
    Python. ``hot_gram_guard`` and the gram_* knobs pass through to
    :func:`dup_span_rows` (the hot-gram escape hatch), as does
    ``auto_partitions`` (data-sized shuffle parallelism, VERDICT r8 #1)."""
    from gmall_flink_yb_spark.functions.cacheutil import owns_cache

    spans = dup_span_rows(
        df, id_col, text_col, n,
        hot_gram_guard=hot_gram_guard,
        gram_sample_fraction=gram_sample_fraction,
        gram_share_threshold=gram_share_threshold,
        auto_partitions=auto_partitions,
    )
    return owns_cache(
        _cut_spans(df, spans, id_col, text_col),
        *getattr(spans, "_gmall_cached_deps", []),
    )


def _cut_spans(
    df: DataFrame,
    span_rows: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Remove ``span_rows``' (doc_id, span_start, span_end) token intervals
    from ``df``'s documents; one output row per INPUT document."""
    spans = span_rows.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    # NULL text normalizes to the 0-token document (same contract as the
    # audio path's 0-frame rule): it keeps nothing, cuts nothing, and its
    # clean_text is the empty string rather than NULL.
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(
            _clean_tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_toks"),
    )
    spans_col = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    joined = toks.join(spans, "doc_id", "left").select(
        "doc_id", "_toks", spans_col.alias("_spans")
    )
    in_span = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]),
    )
    clean = F.filter(F.col("_toks"), lambda t, i: ~in_span(i))
    return joined.select(
        "doc_id",
        F.size("_toks").cast("long").alias("total_tokens"),
        F.size("_spans").cast("long").alias("n_spans"),
        F.aggregate(
            F.col("_spans"),
            F.lit(0).cast("long"),
            lambda acc, sp: acc + (sp["span_end"] - sp["span_start"] + 1),
        ).alias("dup_tokens"),
        clean.alias("_clean"),
    ).select(
        "doc_id",
        "total_tokens",
        "n_spans",
        "dup_tokens",
        F.size("_clean").cast("long").alias("kept_tokens"),
        F.concat_ws(" ", F.col("_clean")).alias("clean_text"),
    )


def incremental_span_scrub(
    seen_grams: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    within_batch: bool = True,
    hot_gram_guard: bool = True,
    gram_sample_fraction: float = 0.05,
    gram_share_threshold: float | None = None,
    auto_partitions: bool | int = True,
    broadcast_incoming: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental exact substring dedup: scrub from ``incoming`` every
    maximal span whose n-grams repeat within the batch OR were seen in any
    earlier batch (``seen_grams``, one ``gh`` md5-hex column — distinct not
    required, it is re-distinct'd here).

    ``broadcast_incoming=True`` is the micro-batch plan (r11 — the span
    twin of the dedup/ANN streams' flag): the corpus-sized seen index is
    first narrowed to the BATCH's own grams by semi-joining it against
    the broadcast batch-gh set, so the index side is SCANNED, never
    shuffled — without it, every micro-batch re-shuffles the whole
    accumulated index through the membership join (per-batch cost
    O(index), the wrong slope for a steady-state ingest against a
    100 TB index). The narrowed frame is batch-bounded, so AQE's
    adaptive broadcast threshold converts the downstream membership
    joins at runtime. Only for TRIGGER-BOUNDED batches: the broadcast
    carries one row per distinct batch gram (~56 B each), so a
    corpus-sized backfill batch must keep the default shuffle plan
    (the streaming pipeline gates this on the batch's scan bytes).

    ``within_batch=False`` drops the repeat-within-batch rule: ONLY
    index membership marks a gram — the surgical-decontamination mode
    (cut every span matching a benchmark set's grams, keep the rest of
    the document) — and the plan simplifies to a semi join with no
    occurrence window at all.

    Returns ``(cleaned, batch_grams)``: ``cleaned`` has the
    ``remove_dup_spans`` schema; ``batch_grams`` is the batch's DISTINCT
    (gh) rows — grams of the ORIGINAL text, not the cleaned text, because
    "seen once already" is what makes the next occurrence a duplicate (the
    streaming analogue of the batch operator's count > 1).

    Equivalence contract (pytest-asserted): with an empty ``seen_grams``
    this is exactly ``remove_dup_spans`` on the batch alone; replaying a
    corpus in id order batch-by-batch scrubs a superset of nothing — every
    occurrence AFTER the first of a gram is cut, while the batch operator
    also cuts the first occurrence. Both are Lee et al. 2022 policies
    (remove-all vs keep-first); the incremental form necessarily keeps
    first occurrences because earlier batches are already written.

    Plan: the batch's gram stream shuffles once on gh; the window count
    and the left join against the seen index reuse that partitioning.
    Per-batch cost tracks batch size plus one index probe — admitted text
    is never re-tokenized. ``hot_gram_guard`` (within_batch only — the
    surgical mode has no occurrence window to guard): the hot-gram escape
    hatch of :func:`_dup_occurrence_positions`, applied to the BATCH's
    gram stream — a batch-universal boilerplate gram would otherwise sort
    through one task exactly like the batch operator's exposure.

    ``auto_partitions`` (VERDICT r8 #1): sizes the session's shuffle
    partitions from BOTH file-backed inputs in ONE summed derivation
    (``tuning.auto_shuffle_partitions_inputs`` — the r10 base-floor
    change removed the floor-at-current ratchet that used to make two
    separate calls keep the max) — the batch at GRAM_EXPANSION (its
    gram stream explodes like the batch operator's) and the seen index
    at HASH_INDEX_EXPANSION (already gram-shaped md5 rows,
    decompression-only). An explicit int is the whole plan's target.
    Streaming micro-batches usually aren't file-backed (no-op); giant
    availableNow backfill batches ARE — the case the sizing exists for.
    """
    from gmall_flink_yb_spark import tuning as _tuning
    from gmall_flink_yb_spark.functions.cacheutil import owns_cache

    sized_inputs = [(incoming, _tuning.GRAM_EXPANSION)]
    if not broadcast_incoming:
        # under the broadcast plan the index is scanned via a map-side
        # probe, never shuffled — sizing for it would derive a
        # 20k-partition session for a KB batch against a 100 TB index
        sized_inputs.append((seen_grams, _tuning.HASH_INDEX_EXPANSION))
    _tuning.auto_shuffle_partitions_inputs(sized_inputs, auto_partitions)
    positions = _gram_positions(incoming, id_col, text_col, n)
    batch_ghs = positions.select("gh").distinct()
    if broadcast_incoming:
        # membership is only ever tested for BATCH rows, so
        # seen ∩ batch_ghs carries identical verdicts at batch-bounded
        # size; the big index is scanned once, shuffled never
        seen = (
            seen_grams.join(F.broadcast(batch_ghs), "gh", "left_semi")
            .select("gh")
            .distinct()
        )
    else:
        seen = seen_grams.select("gh").distinct()
    deps: list[DataFrame] = []
    if within_batch:
        dup, deps = _dup_occurrence_positions(
            incoming, id_col, text_col, n,
            hot_gram_guard=hot_gram_guard,
            sample_fraction=gram_sample_fraction,
            seen=seen,
            share_threshold=gram_share_threshold,
        )
    else:
        dup = positions.join(seen, "gh", "left_semi").select("doc_id", "pos")
    cleaned = owns_cache(
        _cut_spans(incoming, _island_spans(dup, n), id_col, text_col), *deps
    )
    return cleaned, batch_ghs


def distinctive_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` most distinctive tokens per document, ranked by tf/df —
    the log-free core of TF-IDF (log is monotone, so the RANKING is
    identical to classic tf·idf with a constant tf; skipping it keeps every
    compared value an exactly-rounded double of two integers, i.e.
    bit-reproducible cross-engine, where libm log is only faithful).

    Returns (doc_id, token, tf, doc_freq, rnk, score): tf = occurrences in
    the document, doc_freq = number of documents containing the token,
    rnk 1..k by (tf/doc_freq desc, token asc), score = round(tf/doc_freq, 6).

    Scale design (100 TB): tf is one partial-aggregated shuffle of distinct
    (doc, token) pairs; doc_freq aggregates THAT frame (vocabulary-sized
    shuffle); the join back is on token (inverted-index pattern — skewed
    stopwords have high df and never rank, but they still join; salt or
    filter a stopword list upstream if a token's doc list exceeds a
    partition); the final top-k window shuffles once on doc_id.
    """
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(_clean_tokens(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    ratio = F.col("tf").cast("double") / F.col("doc_freq")
    w = Window.partitionBy("doc_id").orderBy(
        ratio.desc(), F.col("token").asc()
    )
    return (
        tf.join(dfreq, "token")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "token", "tf", "doc_freq", "rnk",
            F.round(ratio, 6).alias("score"),
        )
    )


def hashed_ngram_affinity(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style domain-affinity scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): featurize every
    document as a bag of HASHED token n-grams and score it by how much its
    features look like the ``target`` corpus vs the overall corpus ``df``.

    DSIR's weight is the log-likelihood ratio sum_g c_doc(g) *
    (log p_t(g) - log p_r(g)). To stay bit-reproducible across engines
    (no libm logs — same rationale as text.quality_score), we score with
    the INTEGER-EXACT signed divergence

        score = sum_g c_doc(g) * (c_t(g) * N_r - c_r(g) * N_t)

    which has the same sign structure (positive where the bucket is
    over-represented in the target) and a deterministic ranking. Returns
    (doc_id, n_grams, affinity) with affinity > 0 meaning target-like.

    Scale design (100 TB): the bucket model is ``n_buckets`` rows built by
    two map-side-combined aggregates (the shuffle carries bucket ids +
    counts, never grams); docs then join the model by bucket via BROADCAST
    (the model is KB-sized by construction) and reduce to one row per doc —
    a single wide shuffle on doc_id with partial aggregation. Counts use
    bigint here; at petabyte gram counts move the weights to decimal(38,0)
    before the product (documented, not needed at any test sf).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.storagelevel import StorageLevel

    from gmall_flink_yb_spark.functions.cacheutil import owns_cache

    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).alias("_b")

    # cache discipline (r13): the profile showed FIVE sequential
    # single-task stages — the unpersisted gram streams re-tokenized the
    # corpus for every consumer (model histogram, N_r broadcast, scoring
    # join; the target side twice more). The gram stream persists for
    # its two consumers, the KB-sized histograms persist for theirs, and
    # N_r / N_t fold from the histograms (sum of per-bucket counts ==
    # row count, provably) instead of re-scanning the gram streams.
    # Tokenize now runs ONCE per side; measured min 2.49 -> 2.04 s,
    # median 3.13 -> 2.22 s at sf0.1, and at scale it removes two
    # corpus passes.
    corpus = (
        gram_rows(df, id_col, text_col, n)
        .select("doc_id", bucket)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tgt = gram_rows(target, id_col, text_col, n).select(bucket)

    r_counts = (
        corpus.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_cr"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t_counts = (
        tgt.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_ct"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    model = (
        r_counts.join(t_counts, "_b", "left")
        .select(
            "_b",
            F.col("_cr"),
            F.coalesce(F.col("_ct"), F.lit(0)).alias("_ct"),
        )
        .crossJoin(
            F.broadcast(
                # coalesce: an empty side sums to NULL where the old
                # count() read 0 (an empty target must weight as ct=0,
                # not NULL-poison every product)
                r_counts.agg(
                    F.coalesce(F.sum("_cr"), F.lit(0)).alias("_nr")
                ).crossJoin(
                    F.broadcast(
                        t_counts.agg(
                            F.coalesce(F.sum("_ct"), F.lit(0)).alias("_nt")
                        )
                    )
                )
            )
        )
        .select(
            "_b",
            (F.col("_ct") * F.col("_nr") - F.col("_cr") * F.col("_nt")).alias(
                "_w"
            ),
        )
    )
    return owns_cache(
        corpus.join(F.broadcast(model), "_b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("_w").cast("long").alias("affinity"),
        ),
        corpus,
        r_counts,
        t_counts,  # caller releases via cacheutil.release_cache
    )


def source_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Pairwise cross-source contamination matrix: token-``n``-gram Jaccard
    between every pair of sources (the corpus-level audit behind "is one
    crawl a near-copy of another" / train-split leakage between corpora).

    Returns one row per unordered pair of GRAM-BEARING sources
    (src_a < src_b, zero-overlap pairs included): (src_a, src_b, grams_a,
    grams_b, n_shared, jaccard). A source whose every document is shorter
    than ``n`` tokens has no gram set to compare and is absent from the
    matrix by construction (pinned in tests/test_edges.py) — absence
    means "nothing to audit", a 0-gram row would fake a 0/0 jaccard.

    Scale shape (100 TB): grams collapse to DISTINCT (source, md5) first —
    the self-join on the gram key then fans out at most n_sources rows per
    gram, so the candidate volume is bounded by n_sources² per gram, never
    corpus². Per-source gram counts are a source-cardinality frame; the
    pair skeleton is built by crossing it with itself (broadcast — source
    counts are dim-sized by definition) so empty intersections still get a
    row. One shuffle on the gram hash, one tiny pair aggregate.
    """
    from pyspark import StorageLevel

    from gmall_flink_yb_spark import tuning as _tuning

    # spread a parallelism-starved scan before the tokenize/explode/md5
    # map side (r12; the stage profile showed the gram build as a
    # single 1 s task feeding the distinct exchange)
    df = _tuning.spread_file_scan(df)
    # three consumers (sizes + both sides of the self-join): persist, or
    # the tokenize/shingle/md5/distinct subtree recomputes per consumer
    grams = (
        df.select(
            F.col(group_col).alias("src"),
            _clean_tokens(F.col(text_col)).alias("_toks"),
        )
        .select(
            "src", F.explode(_ngrams_of_tokens(F.col("_toks"), n)).alias("g")
        )
        .select("src", F.md5(F.col("g")).alias("gh"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = grams.groupBy("src").agg(F.count(F.lit(1)).alias("n_grams"))
    inter = (
        grams.alias("a")
        .join(
            grams.select(
                F.col("src").alias("src_b2"), F.col("gh").alias("gh_b")
            ),
            (F.col("gh") == F.col("gh_b")) & (F.col("src") < F.col("src_b2")),
        )
        .groupBy(
            F.col("src").alias("ia"), F.col("src_b2").alias("ib")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pairs = (
        sizes.select(
            F.col("src").alias("src_a"), F.col("n_grams").alias("grams_a")
        )
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("src").alias("src_b"),
                    F.col("n_grams").alias("grams_b"),
                )
            )
        )
        .filter(F.col("src_a") < F.col("src_b"))
    )
    shared = F.coalesce(F.col("n_shared"), F.lit(0))
    from gmall_flink_yb_spark.functions.cacheutil import owns_cache

    return owns_cache(
        pairs.join(
            inter,
            (F.col("src_a") == F.col("ia")) & (F.col("src_b") == F.col("ib")),
            "left",
        )
        .select(
            "src_a",
            "src_b",
            "grams_a",
            "grams_b",
            shared.alias("n_shared"),
            F.round(
                shared.cast("double")
                / (F.col("grams_a") + F.col("grams_b") - shared),
                6,
            ).alias("jaccard"),
        ),
        grams,  # caller releases via cacheutil.release_cache (ADVICE r3)
    )
