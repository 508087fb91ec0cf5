"""BPE-style pair counting (functions/bpe.py) — LLM-pipeline surface.

Pins the semantics the DuckDB oracle assumes: word-frequency weighting,
single-char words contributing no pairs, and the deterministic
(count desc, pair asc) top-n cut.
"""

from __future__ import annotations

import pytest

from gmall_flink_yb_spark.functions.bpe import char_pair_counts, word_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts_weighting(spark):
    df = _docs(spark, [(1, "aa bb aa"), (2, "aa, CC!")])
    out = {r["word"]: r["n"] for r in word_counts(df, "text").collect()}
    assert out == {"aa": 3, "bb": 1, "cc": 1}


def test_pair_counts_weighted_by_word_frequency(spark):
    # "ab" occurs 3 times -> pair (a b) weight 3; "xy" once
    df = _docs(spark, [(1, "ab ab xy"), (2, "ab")])
    rows = char_pair_counts(df, "text", top_n=10).collect()
    got = {r["pair"]: r["n_occurrences"] for r in rows}
    assert got == {"a b": 3, "x y": 1}


def test_single_char_words_yield_no_pairs(spark):
    df = _docs(spark, [(1, "a b c a")])
    assert char_pair_counts(df, "text", top_n=10).count() == 0


def test_within_word_adjacency_only(spark):
    # pairs never span word boundaries: "ab cd" has (a b) and (c d), not (b c)
    df = _docs(spark, [(1, "ab cd")])
    got = {r["pair"] for r in char_pair_counts(df, "text", top_n=10).collect()}
    assert got == {"a b", "c d"}


def test_topn_cut_is_deterministic_on_ties(spark):
    # all pairs tie at weight 1 -> the cut keeps the lexicographically
    # smallest pairs (count desc, pair asc is a total order)
    df = _docs(spark, [(1, "zz yy xx ww")])
    rows = char_pair_counts(df, "text", top_n=2).collect()
    assert [r["pair"] for r in rows] == ["w w", "x x"]


def test_rejects_bad_topn(spark):
    df = _docs(spark, [(1, "ab")])
    with pytest.raises(ValueError):
        char_pair_counts(df, "text", top_n=0)


def test_learn_bpe_trajectory(spark):
    # corpus: "aaab" x2, "ab" x1 — hand-computed trajectory:
    # step0: pairs {a a:4, a b:3} -> merge "a a"  ([a,a,a,b] -> [aa,a,b])
    # step1: pairs {a b:3, aa a:2} -> merge "a b"
    # step2: pairs {aa ab:2}       -> merge "aa ab"
    from gmall_flink_yb_spark.functions.bpe import learn_bpe

    df = _docs(spark, [(1, "aaab aaab ab")])
    rows = [
        (r["step"], r["pair"], r["n_occurrences"])
        for r in learn_bpe(df, "text", n_merges=3).orderBy("step").collect()
    ]
    assert rows == [(0, "a a", 4), (1, "a b", 3), (2, "aa ab", 2)]


def test_learn_bpe_stops_when_pairs_exhausted(spark):
    from gmall_flink_yb_spark.functions.bpe import learn_bpe

    # single 2-char word: one merge is possible, then no pairs remain
    df = _docs(spark, [(1, "ab")])
    rows = learn_bpe(df, "text", n_merges=5).collect()
    assert len(rows) == 1 and rows[0]["pair"] == "a b"


def test_apply_bpe_counts(spark):
    from gmall_flink_yb_spark.functions.bpe import apply_bpe

    # "aaab": [a,a,a,b] -"a a"-> [aa,a,b] -"a b"-> [aa,ab] = 2 symbols
    # "ab":   [a,b]     -"a b"-> [ab] = 1 symbol
    df = _docs(spark, [(1, "aaab ab"), (2, "")])
    rows = {
        r["doc_id"]: (r["n_symbols_raw"], r["n_symbols_bpe"])
        for r in apply_bpe(df, "doc_id", "text", ["a a", "a b"]).collect()
    }
    assert rows[1] == (6, 3)
    assert rows[2] == (0, 0)


def test_apply_bpe_never_merges_across_word_boundary(spark):
    from gmall_flink_yb_spark.functions.bpe import apply_bpe

    # "ba ab": the a|a adjacency spans a word boundary — "a a" must NOT fire
    df = _docs(spark, [(1, "ba ab")])
    row = apply_bpe(df, "doc_id", "text", ["a a"]).first()
    assert (row["n_symbols_raw"], row["n_symbols_bpe"]) == (4, 4)


def test_apply_bpe_folded_and_mapinpandas_paths_agree(spark):
    """apply_bpe's two encode engines — unrolled regexp_replace nodes vs
    one Arrow mapInPandas stage with the merge list in the task closure
    (the r10 constant-plan rule applied to production-sized merge lists)
    — produce identical symbol counts, and the large path's plan stays
    constant-size in the merge count."""
    from gmall_flink_yb_spark.functions.bpe import apply_bpe, learn_bpe

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog the the"),
            (2, "pack my box with five dozen liquor jugs quick quick"),
            (3, "the five boxing wizards jump quickly over the fox"),
        ],
        "doc_id long, text string",
    )
    merges = learn_bpe(docs, "text", n_merges=6)
    pairs = [r["pair"] for r in merges.orderBy("step").collect()]
    folded = apply_bpe(docs, "doc_id", "text", pairs)
    big = apply_bpe(docs, "doc_id", "text", pairs, max_folded_merges=1)
    got_f = sorted(map(tuple, folded.collect()))
    got_b = sorted(map(tuple, big.collect()))
    assert got_f == got_b
    plan = big._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" in plan
    # the merge patterns live in the closure, not the plan
    assert plan.count("regexp_replace") <= 2
