"""Property-based tests (hypothesis) for the pure-Python cores whose
semantics the DuckDB oracles replay — invariants that example tests can't
exhaust. No SparkSession: these run in milliseconds and pin the exact
algorithms (FMM segmentation, greedy BPE-style merging is covered by its
own trajectory oracle; here: segmentation + prefix-filter arithmetic)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gmall_flink_yb_spark.operators.keywords import (
    ZH_ECOMMERCE_DICT,
    fmm_segment,
)

_CHARS = sorted({c for w in ZH_ECOMMERCE_DICT for c in w}) + ["买", "了", "x"]
_texts = st.text(alphabet=_CHARS, min_size=0, max_size=40)
# include single-character words: the segmenter matches them as dictionary
# words (candidate lengths run down to 1), exactly like the oracle CTE
_dicts = st.sets(
    st.sampled_from(ZH_ECOMMERCE_DICT + ("机", "茶", "买")),
    min_size=1,
    max_size=12,
).map(frozenset)


class TestFMMProperties:
    @given(_texts, _dicts)
    @settings(max_examples=300, deadline=None)
    def test_lossless_reconstruction(self, text, words):
        """Segmentation is a partition of the input: concatenating the
        tokens reproduces the text exactly — nothing dropped, nothing
        duplicated, for ANY text and ANY dictionary subset."""
        max_len = max(map(len, words))
        toks = fmm_segment(text, words, max_len)
        assert "".join(toks) == text

    @given(_texts, _dicts)
    @settings(max_examples=300, deadline=None)
    def test_tokens_are_words_or_single_chars(self, text, words):
        """Every emitted token is either a dictionary word or one char —
        the FMM contract the recursive-CTE oracle replays."""
        max_len = max(map(len, words))
        for t in fmm_segment(text, words, max_len):
            assert t in words or len(t) == 1

    @given(_texts, _dicts)
    @settings(max_examples=300, deadline=None)
    def test_greedy_longest_match(self, text, words):
        """At each emission point the segmenter took the LONGEST dictionary
        word available there (or fell back to one char when none fits) —
        replay the scan independently and compare choices."""
        max_len = max(map(len, words))
        toks = fmm_segment(text, words, max_len)
        pos = 0
        for t in toks:
            best = next(
                (
                    text[pos : pos + ln]
                    for ln in range(min(max_len, len(text) - pos), 0, -1)
                    if text[pos : pos + ln] in words
                ),
                text[pos] if pos < len(text) else "",
            )
            assert t == best
            pos += len(t)
        assert pos == len(text)


class TestPrefixFilterArithmetic:
    """The PPJoin bounds used in _jaccard_prefix_candidates, checked
    against brute-force set arithmetic: the prefix + positional filters
    must NEVER prune a pair whose true Jaccard reaches the threshold
    (recall-losslessness is what lets the plain-Jaccard oracle stand)."""

    @given(
        st.sets(st.integers(0, 60), min_size=1, max_size=25),
        st.sets(st.integers(0, 60), min_size=1, max_size=25),
        st.sampled_from([0.3, 0.5, 0.7, 0.9]),
    )
    @settings(max_examples=500, deadline=None)
    def test_filters_never_prune_a_true_pair(self, sa, sb, t):
        import math

        inter = len(sa & sb)
        union = len(sa | sb)
        if inter / union < t:
            return  # not a true pair: pruning it is allowed
        # canonical order = ascending integer (stand-in for (df, token))
        la, lb = sorted(sa), sorted(sb)
        pa = la[: len(la) - math.ceil(t * len(la)) + 1]
        pb = lb[: len(lb) - math.ceil(t * len(lb)) + 1]
        # prefix filter: prefixes of a true pair must intersect
        common = set(pa) & set(pb)
        assert common, "prefix filter pruned a true pair"
        # size-ratio filter
        assert len(sa) >= t * len(sb) and len(sb) >= t * len(sa)
        # positional filter: cnt + min(remaining suffixes) >= alpha
        cnt = len(common)
        ra = len(sa) - (la.index(max(common)) + 1)
        rb = len(sb) - (lb.index(max(common)) + 1)
        alpha = math.ceil(t / (1 + t) * (len(sa) + len(sb)))
        assert cnt + min(ra, rb) >= alpha, "positional filter pruned a true pair"
