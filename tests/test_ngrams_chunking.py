"""Token n-gram curation operators: decontamination, span-dup, chunking.

LLM-pipeline surface (no reference counterpart — SURVEY.md §2.9 last
paragraph). Tests pin the semantics the DuckDB oracles assume: 1-based
gram offsets, short-doc empty arrays, stride coverage (every token in at
least one chunk), and broadcast-shaped decontamination plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.chunking import chunk_documents
from gmall_flink_yb_spark.functions.ngrams import (
    decontaminate,
    dup_span_rows,
    incremental_span_scrub,
    remove_dup_spans,
    span_dup_stats,
    token_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_ngrams_basic(spark):
    df = spark.range(1).select(
        token_ngrams(F.lit("The quick, brown fox!"), 2).alias("g")
    )
    assert df.first()["g"] == ["the quick", "quick brown", "brown fox"]


def test_token_ngrams_short_doc_empty(spark):
    # fewer than n tokens must yield [], not a descending-sequence artifact
    df = spark.range(1).select(
        token_ngrams(F.lit("only two"), 3).alias("g3"),
        token_ngrams(F.lit("only two"), 2).alias("g2"),
        token_ngrams(F.lit(""), 1).alias("g1"),
    )
    r = df.first()
    assert r["g3"] == [] and r["g2"] == ["only two"] and r["g1"] == []


def test_token_ngrams_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        token_ngrams(F.lit("x"), 0)


def test_decontaminate_counts_distinct_shared_grams(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),  # shares 2 bigrams with eval
            (2, "alpha beta gamma delta"),  # identical dup: same overlap
            (3, "zeta eta theta iota"),  # clean
        ],
    )
    ev = _docs(spark, [(100, "alpha beta gamma epsilon")])
    out = {
        r["doc_id"]: (r["n_overlap_grams"], r["contaminated"])
        for r in decontaminate(train, ev, "doc_id", "text", n=2).collect()
    }
    assert out == {1: (2, 1), 2: (2, 1), 3: (0, 0)}


def test_decontaminate_broadcasts_eval_side(spark):
    train = _docs(spark, [(1, "a b c")])
    ev = _docs(spark, [(2, "a b")])
    plan = decontaminate(train, ev, "doc_id", "text", n=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_span_dup_stats(spark):
    df = _docs(
        spark,
        [
            (1, "one two three four"),  # bigrams all shared with doc 2
            (2, "one two three four five"),
            (3, "six seven eight nine"),  # all unique
        ],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
        for r in span_dup_stats(df, "doc_id", "text", n=2).collect()
    }
    assert out[1] == (3, 3, 1.0)
    assert out[2] == (4, 3, 0.75)
    assert out[3] == (3, 0, 0.0)


def test_span_dup_repeated_gram_counted_once(spark):
    # duplicate grams WITHIN one doc collapse before the occurrence count:
    # "x y" twice in doc 1 alone must not self-mark as duplicated
    df = _docs(spark, [(1, "x y z x y")])
    r = span_dup_stats(df, "doc_id", "text", n=2).first()
    # distinct bigrams: "x y", "y z", "z x" -> none shared
    assert (r["n_grams"], r["n_dup_grams"]) == (3, 0)


def test_chunk_documents_disjoint_reconstructs(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = _docs(spark, [(1, text)])
    chunks = (
        chunk_documents(df, "doc_id", "text", chunk_size=4)
        .orderBy("chunk_id")
        .collect()
    )
    assert [c["chunk_id"] for c in chunks] == [0, 1, 2]
    assert [c["n_chunk_tokens"] for c in chunks] == [4, 4, 2]
    assert " ".join(c["chunk_text"] for c in chunks) == text


def test_chunk_documents_overlapping_stride(spark):
    text = "a b c d e f g h i j"
    df = _docs(spark, [(1, text)])
    chunks = (
        chunk_documents(df, "doc_id", "text", chunk_size=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    )
    assert [c["chunk_text"] for c in chunks] == [
        "a b c d", "d e f g", "g h i j", "j",
    ]
    assert [c["n_chunk_tokens"] for c in chunks] == [4, 4, 4, 1]


def test_chunk_documents_empty_doc_produces_no_chunks(spark):
    df = _docs(spark, [(1, "...!!!"), (2, "word")])
    rows = chunk_documents(df, "doc_id", "text", chunk_size=4).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(2, "word")]


def test_chunk_documents_rejects_bad_args(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_size=4, stride=0)


def test_chunking_is_shuffle_free(spark):
    df = _docs(spark, [(1, "a b c d e")])
    plan = chunk_documents(df, "doc_id", "text", chunk_size=2)._jdf.\
        queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_distinctive_terms_ranking(spark):
    from gmall_flink_yb_spark.functions.ngrams import distinctive_terms

    df = _docs(
        spark,
        [
            (1, "common rare1 common"),  # tf(common)=2 but df=3
            (2, "common rare2"),
            (3, "common rare2 rare2"),
        ],
    )
    out = distinctive_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["token"], r["tf"], r["doc_freq"]))
    # doc 1: rare1 tf1/df1=1.0 beats common tf2/df3=0.667
    assert sorted(by_doc[1]) == [(1, "rare1", 1, 1), (2, "common", 2, 3)]
    # doc 3: rare2 tf2/df2=1.0 beats common tf1/df3
    assert sorted(by_doc[3])[0] == (1, "rare2", 2, 2)


def test_distinctive_terms_tie_breaks_on_token(spark):
    from gmall_flink_yb_spark.functions.ngrams import distinctive_terms

    df = _docs(spark, [(1, "bbb aaa")])  # both tf1/df1 -> tie
    out = sorted(
        distinctive_terms(df, "doc_id", "text", k=2).collect(),
        key=lambda r: r["rnk"],
    )
    assert [r["token"] for r in out] == ["aaa", "bbb"]


def test_chunk_dedup_drops_shared_chunks(spark):
    from gmall_flink_yb_spark.functions.chunking import chunk_dedup

    # chunk_size=2 -> doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [p q]
    df = _docs(
        spark,
        [(1, "a b c d"), (2, "a b x y"), (3, "p q")],
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dropped_chunks"], r["clean_text"])
        for r in chunk_dedup(df, "doc_id", "text", chunk_size=2).collect()
    }
    assert out == {
        1: (2, 1, "c d"),
        2: (2, 1, "x y"),
        3: (1, 0, "p q"),
    }


def test_chunk_dedup_all_boilerplate_yields_empty_text(spark):
    from gmall_flink_yb_spark.functions.chunking import chunk_dedup

    df = _docs(spark, [(1, "a b"), (2, "a b")])
    out = {
        r["doc_id"]: (r["n_dropped_chunks"], r["clean_text"])
        for r in chunk_dedup(df, "doc_id", "text", chunk_size=2).collect()
    }
    assert out == {1: (1, ""), 2: (1, "")}


def test_chunk_dedup_within_doc_repeat_not_dropped(spark):
    from gmall_flink_yb_spark.functions.chunking import chunk_dedup

    # the same chunk twice in ONE doc is repetition, not cross-doc
    # boilerplate — min_docs counts DISTINCT documents
    df = _docs(spark, [(1, "a b a b")])
    out = chunk_dedup(df, "doc_id", "text", chunk_size=2).collect()
    assert out[0]["n_dropped_chunks"] == 0
    assert out[0]["clean_text"] == "a b a b"


# ---------------------------------------------------------------------------
# dup_span_rows / remove_dup_spans — the Lee et al. 2022 removal half
# ---------------------------------------------------------------------------


def test_dup_span_rows_merges_and_splits(spark):
    # doc 1 dup bigram starts: 0 ("a b"), 2 ("c d"), 6 ("e f");
    # gap 2-0 = n merges, gap 6-2 > n splits -> spans [0,3] and [6,7].
    df = _docs(
        spark,
        [
            (1, "a b c d u1 u2 e f u3 u4"),
            (2, "a b x c d y e f"),
        ],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dup_span_rows(df, "doc_id", "text", n=2).collect()
    }
    assert spans == {
        (1, 0, 3),
        (1, 6, 7),
        (2, 0, 1),
        (2, 3, 4),
        (2, 6, 7),
    }


def test_dup_span_rows_counts_within_doc_repeats(spark):
    # Lee et al.'s contract is "appears more than once in the CORPUS" —
    # unlike span_dup_stats (which distincts grams per doc first), a gram
    # repeated within a single document IS a duplicated span.
    df = _docs(spark, [(1, "p q r p q")])
    spans = {
        (r["span_start"], r["span_end"])
        for r in dup_span_rows(df, "doc_id", "text", n=2).collect()
    }
    assert spans == {(0, 1), (3, 4)}


def test_dup_span_rows_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        dup_span_rows(_docs(spark, [(1, "a b")]), "doc_id", "text", n=0)


def test_remove_dup_spans_accounting_and_text(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d u1 u2 e f u3 u4"),
            (2, "a b x c d y e f"),
            (3, "totally unique words only here"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_dup_spans(df, "doc_id", "text", n=2).collect()
    }
    assert out[1]["total_tokens"] == 10
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 6
    assert out[1]["kept_tokens"] == 4
    assert out[1]["clean_text"] == "u1 u2 u3 u4"
    assert out[2]["clean_text"] == "x y"
    # every input doc appears, clean docs untouched
    assert out[3]["n_spans"] == 0
    assert out[3]["clean_text"] == "totally unique words only here"
    for r in out.values():
        assert r["kept_tokens"] == r["total_tokens"] - r["dup_tokens"]


def test_remove_dup_spans_fully_duplicated_doc(spark):
    df = _docs(spark, [(1, "m n o p"), (2, "m n o p")])
    out = {
        r["doc_id"]: (r["kept_tokens"], r["clean_text"])
        for r in remove_dup_spans(df, "doc_id", "text", n=2).collect()
    }
    # BOTH copies are cut (Lee et al. removes every occurrence)
    assert out == {1: (0, ""), 2: (0, "")}


def test_remove_dup_spans_null_text_zero_token_contract(spark):
    df = _docs(spark, [(1, None), (2, "w x y z")])
    r = {
        row["doc_id"]: row.asDict()
        for row in remove_dup_spans(df, "doc_id", "text", n=2).collect()
    }
    assert r[1]["total_tokens"] == 0
    assert r[1]["n_spans"] == 0
    assert r[1]["kept_tokens"] == 0
    assert r[1]["clean_text"] == ""


def test_remove_dup_spans_no_python_stage(spark):
    # the cut is a higher-order filter over the token array — the plan
    # must stay whole-stage-codegen-eligible with no Python evaluator
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    plan = remove_dup_spans(df, "doc_id", "text", n=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_remove_dup_spans_matches_bruteforce_reference(spark):
    """Seeded randomized cross-check: 40 docs over an 8-token alphabet
    (dense gram collisions), spans + removal recomputed by a brute-force
    Python reference and compared exactly — the randomized analogue of
    the DuckDB oracle, pinning island-merge boundaries the example tests
    can't exhaust."""
    import random

    rng = random.Random(20260815)
    alphabet = ["ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx"]
    n = 3
    docs = {
        did: [rng.choice(alphabet) for _ in range(rng.randint(0, 30))]
        for did in range(1, 41)
    }

    # reference: corpus gram counts -> dup gram starts -> island merge
    from collections import Counter

    counts = Counter()
    starts = {}
    for did, toks in docs.items():
        gs = [tuple(toks[i:i + n]) for i in range(max(0, len(toks) - n + 1))]
        starts[did] = gs
        counts.update(gs)
    exp = {}
    for did, toks in docs.items():
        dup = [i for i, g in enumerate(starts[did]) if counts[g] > 1]
        spans = []
        for p in dup:
            if spans and p - spans[-1][2] <= n:
                spans[-1][1] = max(spans[-1][1], p + n - 1)
                spans[-1][2] = p
            else:
                spans.append([p, p + n - 1, p])
        covered = set()
        for s, e, _ in spans:
            covered.update(range(s, e + 1))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        exp[did] = {
            "total_tokens": len(toks),
            "n_spans": len(spans),
            "dup_tokens": sum(e - s + 1 for s, e, _ in spans),
            "kept_tokens": len(kept),
            "clean_text": " ".join(kept),
            "spans": {(s, e) for s, e, _ in spans},
        }

    df = _docs(spark, [(d, " ".join(t)) for d, t in docs.items()])
    got_spans = {}
    for r in dup_span_rows(df, "doc_id", "text", n=n).collect():
        got_spans.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"])
        )
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_dup_spans(df, "doc_id", "text", n=n).collect()
    }
    assert set(got) == set(exp)
    for did, e in exp.items():
        g = got[did]
        assert got_spans.get(did, set()) == e["spans"], did
        for k in ("total_tokens", "n_spans", "dup_tokens", "kept_tokens",
                  "clean_text"):
            assert g[k] == e[k], (did, k, g[k], e[k])


def test_incremental_scrub_empty_index_equals_batch_operator(spark):
    """With an empty seen-gram index, incremental_span_scrub IS
    remove_dup_spans on the batch alone (the within-batch count>1 rule is
    the whole contract)."""
    from gmall_flink_yb_spark.functions.ngrams import incremental_span_scrub

    df = _docs(
        spark,
        [
            (1, "a b c d u1 u2 e f u3 u4"),
            (2, "a b x c d y e f"),
            (3, "p q r p q"),
            (4, None),
        ],
    )
    empty = spark.createDataFrame([], "gh string")
    cleaned, grams = incremental_span_scrub(empty, df, "doc_id", "text", n=2)
    got = sorted(cleaned.collect(), key=lambda r: r["doc_id"])
    exp = sorted(
        remove_dup_spans(df, "doc_id", "text", n=2).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]
    # grams are the batch's distinct hashes (never the cleaned text's)
    assert grams.count() == grams.distinct().count()


def test_incremental_scrub_seen_grams_cut_first_occurrence(spark):
    """A gram already in the index cuts even its FIRST in-batch occurrence
    — the index, not the batch, decides seen-ness."""
    from gmall_flink_yb_spark.functions.ngrams import (
        gram_rows,
        incremental_span_scrub,
    )

    earlier = _docs(spark, [(1, "w x y z")])
    seen = gram_rows(earlier, "doc_id", "text", 2).select(
        F.md5(F.col("g")).alias("gh")
    )
    batch = _docs(spark, [(10, "w x y z tail1 tail2")])
    cleaned, _ = incremental_span_scrub(seen, batch, "doc_id", "text", n=2)
    r = cleaned.first()
    assert (r["n_spans"], r["kept_tokens"], r["clean_text"]) == (
        1, 2, "tail1 tail2",
    )


def test_incremental_scrub_within_batch_off_is_surgical(spark):
    """within_batch=False: only index membership cuts — within-batch
    repeats survive (the surgical-decontamination contract), and the plan
    carries no occurrence window at all."""
    from gmall_flink_yb_spark.functions.ngrams import (
        gram_rows,
        incremental_span_scrub,
    )

    bench = _docs(spark, [(1, "w x y z")])
    seen = gram_rows(bench, "doc_id", "text", 2).select(
        F.md5(F.col("g")).alias("gh")
    )
    batch = _docs(
        spark,
        [
            (10, "w x y z tail1 tail2"),  # benchmark prefix: cut
            (11, "m n o m n o"),          # pure within-batch repeat: KEPT
        ],
    )
    cleaned, _ = incremental_span_scrub(
        seen, batch, "doc_id", "text", n=2, within_batch=False
    )
    got = {r["doc_id"]: r["clean_text"] for r in cleaned.collect()}
    assert got == {10: "tail1 tail2", 11: "m n o m n o"}
    # the occurrence-count window is gone; only the island lag/sum remain
    plan = cleaned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("count(1) windowspecdefinition") == 0


# ---------------------------------------------------------------------------
# Hot-gram escape hatch (VERDICT r7 #1): the gram-occurrence count's per-gh
# partition is corpus-bounded; profiled-hot grams route through a two-phase
# salted count + broadcast semi-join while cold grams keep the window.
# ---------------------------------------------------------------------------

def _boilerplate_corpus(spark, n_docs=120):
    """Every doc opens with the same 8-token boilerplate gram (one
    all-corpus hot gram) followed by unique text; one extra doc carries an
    organic self-repeat that must stay on the cold/window path."""
    boiler = "all rights reserved by the original author here"
    rows = [
        (i, f"{boiler} unique u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g")
        for i in range(n_docs)
    ]
    rows.append((9_000, "organic repeat one two three four five six " * 2))
    return _docs(spark, rows)


def test_dup_spans_hot_gram_guard_equals_window(spark):
    """Forced-hot profiling (sample=1.0, low threshold) must return
    exactly the plain-window answer on a corpus with one all-corpus gram,
    and the hybrid must actually fire (hot gh routed off the window)."""
    df = _boilerplate_corpus(spark)
    on = dup_span_rows(
        df, "doc_id", "text", n=8, hot_gram_guard=True,
        gram_sample_fraction=1.0, gram_share_threshold=0.01,
    )
    off = dup_span_rows(df, "doc_id", "text", n=8, hot_gram_guard=False)
    assert sorted(map(tuple, on.collect())) == sorted(
        map(tuple, off.collect())
    )
    # the hybrid plan actually split: a union of hot + cold branches
    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    assert "Union" in _simple_plan(on)
    assert "Union" not in _simple_plan(off)


def test_dup_spans_no_hot_gram_plan_byte_identical(spark):
    """Plan gate: when profiling finds nothing hot, guard-on returns the
    EXACT pre-guard plan (modulo expression/plan ids, which differ between
    any two plan instances) — the PPJoin mega-doc-cap discipline."""
    import re

    df = _docs(spark, [
        (i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(20)))
        for i in range(60)
    ])
    on = dup_span_rows(
        df, "doc_id", "text", n=8, hot_gram_guard=True,
        gram_sample_fraction=1.0,
    )
    off = dup_span_rows(df, "doc_id", "text", n=8, hot_gram_guard=False)

    def norm(frame):
        s = frame._jdf.queryExecution().executedPlan().toString()
        s = re.sub(r"#\d+", "#", s)          # expression ids
        s = re.sub(r"plan_id=\d+", "plan_id=", s)
        return re.sub(r"x_\d+#", "x_#", s)   # lambda variable counters

    assert norm(on) == norm(off)


def test_dup_spans_tiny_sample_never_fires_or_misses(spark):
    """The tiny-sample guard (min_sampled_count=8): on a tiny unique
    corpus every gram clears any share threshold (3 grams -> 33% each),
    but none reaches 8 sampled occurrences, so the hatch must NOT fire —
    the plan stays the plain window and the answer is empty. A
    single-occurrence gram can therefore never take the hot path at all:
    sampled count >= 8 implies true count >= 8 > 1."""
    import re

    df = _docs(spark, [
        (1, "a b c d e f g h"),       # one gram, unique
        (2, "p q r s t u v w"),       # one gram, unique
        (3, "x y z q2 w2 e2 r2 t2"),  # one gram, unique
    ])
    on = dup_span_rows(
        df, "doc_id", "text", n=8, hot_gram_guard=True,
        gram_sample_fraction=1.0, gram_share_threshold=0.1,
    )
    off = dup_span_rows(df, "doc_id", "text", n=8, hot_gram_guard=False)

    def norm(frame):
        s = frame._jdf.queryExecution().executedPlan().toString()
        s = re.sub(r"#\d+", "#", s)
        s = re.sub(r"plan_id=\d+", "plan_id=", s)
        return re.sub(r"x_\d+#", "x_#", s)

    assert norm(on) == norm(off)
    assert on.count() == 0


def test_hot_key_shares_min_sampled_count(spark):
    """skew.hot_key_shares(min_sampled_count=k): values under k sampled
    occurrences are never reported hot, regardless of share."""
    from gmall_flink_yb_spark.operators.skew import hot_key_shares

    df = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 2, "k string"
    )
    full = hot_key_shares(df, ["k"], 0.05, sample_fraction=1.0)
    assert {v for v, _ in full["k"]} == {"a", "b"}
    guarded = hot_key_shares(
        df, ["k"], 0.05, sample_fraction=1.0, min_sampled_count=8
    )
    assert {v for v, _ in guarded["k"]} == {"a"}  # b: share 17% but n=2


def test_remove_dup_spans_hot_guard_text_exact(spark):
    """End-to-end removal through the hatch: cleaned text and accounting
    byte-equal to the window path."""
    df = _boilerplate_corpus(spark, n_docs=60)
    kw = dict(n=8)
    on = remove_dup_spans(
        df, "doc_id", "text", hot_gram_guard=True,
        gram_sample_fraction=1.0, gram_share_threshold=0.01, **kw
    )
    off = remove_dup_spans(df, "doc_id", "text", hot_gram_guard=False, **kw)
    assert sorted(map(tuple, on.collect())) == sorted(
        map(tuple, off.collect())
    )


def test_incremental_scrub_hot_guard_with_seen_index(spark):
    """The within_batch hatch composes with the seen-gram index: a hot
    gram already in the index is cut (membership via the tiny
    seen-semi-join path), and results equal the guard-off plan."""
    from gmall_flink_yb_spark.functions.ngrams import _gram_positions

    df = _boilerplate_corpus(spark, n_docs=60)
    # index = the boilerplate gram itself (as seen in an earlier batch)
    seen = (
        _gram_positions(
            _docs(spark, [(0, "all rights reserved by the original "
                              "author here")]),
            "doc_id", "text", 8,
        ).select("gh").distinct()
    )
    on, grams_on = incremental_span_scrub(
        seen, df, "doc_id", "text", n=8, hot_gram_guard=True,
        gram_sample_fraction=1.0, gram_share_threshold=0.01,
    )
    off, grams_off = incremental_span_scrub(
        seen, df, "doc_id", "text", n=8, hot_gram_guard=False,
    )
    assert sorted(map(tuple, on.collect())) == sorted(
        map(tuple, off.collect())
    )
    assert sorted(map(tuple, grams_on.collect())) == sorted(
        map(tuple, grams_off.collect())
    )


def test_span_dup_stats_hot_guard_equality_and_plan_gate(spark):
    """span_dup_stats' hatch: forced-hot equals the window answer
    bit-for-bit (schema included); with nothing hot the plan is
    byte-identical to the pre-guard single-window form."""
    import re

    df = _boilerplate_corpus(spark, n_docs=80)
    on = span_dup_stats(
        df, "doc_id", "text", n=8, hot_gram_guard=True,
        gram_sample_fraction=1.0, gram_share_threshold=0.01,
    )
    off = span_dup_stats(df, "doc_id", "text", n=8, hot_gram_guard=False)
    # names + types identical (nullability may differ: coalesce vs sum)
    assert on.schema.simpleString() == off.schema.simpleString()
    assert sorted(map(tuple, on.collect())) == sorted(
        map(tuple, off.collect())
    )
    from gmall_flink_yb_spark.plans.inspect import _simple_plan
    assert "Union" in _simple_plan(on)  # the hybrid actually fired

    uniq = _docs(spark, [
        (i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(20)))
        for i in range(60)
    ])
    g_on = span_dup_stats(
        uniq, "doc_id", "text", n=8, hot_gram_guard=True,
        gram_sample_fraction=1.0,
    )
    g_off = span_dup_stats(uniq, "doc_id", "text", n=8,
                           hot_gram_guard=False)

    def norm(frame):
        s = frame._jdf.queryExecution().executedPlan().toString()
        s = re.sub(r"#\d+", "#", s)
        s = re.sub(r"plan_id=\d+", "plan_id=", s)
        return re.sub(r"x_\d+#", "x_#", s)

    assert norm(g_on) == norm(g_off)


def test_incremental_scrub_broadcast_incoming_parity(spark):
    """r11: broadcast_incoming=True narrows the seen index to the batch's
    grams via a broadcast semi-join (index scanned, never shuffled) —
    verdicts, cleaned text, and returned batch grams must be IDENTICAL
    to the shuffle plan, including under the hot-gram guard and the
    surgical (within_batch=False) mode."""
    from gmall_flink_yb_spark.functions.cacheutil import release_cache
    from gmall_flink_yb_spark.functions.ngrams import (
        gram_rows,
        incremental_span_scrub,
    )

    earlier = _docs(
        spark, [(1, "w x y z"), (2, "k l m n o p"), (3, "s t u v")]
    )
    seen = gram_rows(earlier, "doc_id", "text", 2).select(
        F.md5(F.col("g")).alias("gh")
    )
    # index membership + within-batch repeats + untouched docs, and one
    # NULL-text row (the dirty-input path)
    batch = _docs(
        spark,
        [
            (10, "w x y z tail1 tail2"),
            (11, "m n o m n o"),
            (12, "fresh tokens only here"),
            (13, "k l m n head1 head2 k l"),
            (14, None),
        ],
    )

    def run(**kw):
        cleaned, grams = incremental_span_scrub(
            seen, batch, "doc_id", "text", n=2, **kw
        )
        got = sorted(
            (r.asDict() for r in cleaned.collect()),
            key=lambda r: r["doc_id"],
        )
        g = sorted(r["gh"] for r in grams.collect())
        release_cache(cleaned)
        return got, g

    for kw in (
        {},
        {"hot_gram_guard": True, "gram_sample_fraction": 1.0},
        {"within_batch": False},
    ):
        base_rows, base_grams = run(broadcast_incoming=False, **kw)
        bc_rows, bc_grams = run(broadcast_incoming=True, **kw)
        assert bc_rows == base_rows, kw
        assert bc_grams == base_grams, kw
