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


def make_segmenter_udf(segment_fn):
    """Wrap a Python segmentation function (str -> list[str]) as an
    Arrow-batched pandas_udf returning array<string> — the pluggable slot
    for real word segmentation (the reference shipped the IK Chinese
    analyzer dep, gmall-realtime/pom.xml:179-183, for exactly this).

    Example with jieba (not installed in this container)::

        try:
            import jieba
            seg = make_segmenter_udf(lambda s: list(jieba.cut(s)))
        except ImportError:
            seg = None  # fall back to the regex path
    """
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them
    # and pyspark's hint-based eval-type inference then fails; the explicit
    # returnType carries the schema instead
    def _seg(texts):
        return texts.map(lambda s: segment_fn(s) if s is not None else [])

    return pandas_udf(_seg, "array<string>")


# Bundled segmentation dictionary: common public Chinese e-commerce /
# search terms (the domain the reference's SEARCH/CLICK/CART/ORDER keyword
# constants describe, GmallConstant.java:64-67). Order is LOAD-BEARING:
# index k here == index k in the oracle's words(idx, w) VALUES table, so
# the md5-driven fixture construction picks identical words both sides.
ZH_ECOMMERCE_DICT: tuple[str, ...] = (
    "手机", "苹果", "华为", "小米", "电脑", "笔记本", "平板", "耳机",
    "充电器", "手机壳", "运动鞋", "连衣裙", "口红", "洗面奶", "面膜",
    "电视", "冰箱", "洗衣机", "空调", "微波炉", "零食", "牛奶",
    "咖啡", "茶叶", "图书", "玩具", "积木", "键盘", "鼠标", "显示器",
)


def fmm_segment(text: str, words: frozenset[str], max_len: int) -> list[str]:
    """Greedy forward-maximum-matching segmentation: at each position take
    the LONGEST dictionary word starting there, else one character. The
    exact algorithm the DuckDB oracle replays as a recursive CTE, so it
    must stay deterministic and tie-free (equal-length candidates at one
    position are the same string)."""
    out: list[str] = []
    pos, n = 0, len(text)
    while pos < n:
        # candidate lengths run down to 1 so single-character dictionary
        # words match as words, exactly like the oracle CTE; the else
        # branch then fires only for out-of-vocabulary characters
        for ln in range(min(max_len, n - pos), 0, -1):
            cand = text[pos : pos + ln]
            if cand in words:
                out.append(cand)
                pos += ln
                break
        else:
            out.append(text[pos])
            pos += 1
    return out


def make_fmm_segmenter_udf(dictionary=ZH_ECOMMERCE_DICT):
    """Trie-free longest-match segmenter over a bundled dictionary as an
    Arrow-batched pandas_udf — the shipped implementation behind the
    ``make_segmenter_udf`` slot (the reference bundles the IK analyzer for
    this, gmall-realtime/pom.xml:179-183; jieba is absent from this
    container, and for a bounded product-vocabulary FMM is the standard
    deterministic baseline). The dictionary rides the UDF closure — it is
    serialized once per task like a broadcast variable, not per row."""
    words = frozenset(dictionary)
    max_len = max(map(len, words)) if words else 1
    return make_segmenter_udf(lambda s: fmm_segment(s, words, max_len))


def keyword_counts(
    df: DataFrame,
    text_col: str,
    group_cols: list[str] | None = None,
    pattern: str = DEFAULT_TOKEN_PATTERN,
    min_token_len: int = 1,
    tokenizer=None,
) -> DataFrame:
    """Explode tokens and count per (group_cols..., token).

    ``tokenizer``: optional Column-producing callable (text Column ->
    array<string> Column), e.g. a ``make_segmenter_udf`` wrapper for real
    segmentation; defaults to the JVM-side regex split (never leaves
    codegen — prefer it unless the language genuinely needs a segmenter).

    Partial (map-side) aggregation makes the shuffle carry only distinct
    (group, token) pairs — at 100 TB that is the difference between shuffling
    tokens and shuffling the vocabulary.
    """
    tok_col = (
        tokenizer(F.col(text_col))
        if tokenizer is not None
        else tokenize(F.col(text_col), pattern)
    )
    toks = df.select(
        *[F.col(c) for c in (group_cols or [])],
        F.explode(tok_col).alias("token"),
    ).filter(F.length("token") >= min_token_len)
    return toks.groupBy(*[*(group_cols or []), "token"]).agg(
        F.count(F.lit(1)).alias("token_count")
    )


def keyword_window_counts(
    df: DataFrame,
    text_col: str,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str | None = None,
    pattern: str = DEFAULT_TOKEN_PATTERN,
    min_token_len: int = 1,
    min_count: int = 1,
    tokenizer=None,
) -> DataFrame:
    """Windowed keyword counts — the reference's intended DWS keyword
    analytics (ikanalyzer dep + SEARCH/CLICK/CART/ORDER constants,
    gmall-realtime/pom.xml:179-183, common/GmallConstant.java:64-67, with
    zero implementation): tokenize + explode + tumbling-window count.

    One code path for batch AND streaming: pass ``watermark`` under
    readStream and the tumbling aggregate emits as event time advances;
    in batch the same expression is a plain window group-by. The shuffle
    carries (window, token) partial counts — vocabulary-sized per window,
    never the token stream itself.

    ``tokenizer``: same pluggable slot as ``keyword_counts`` (e.g. the
    bundled FMM segmenter) — Arrow-batched pandas UDFs run fine inside a
    streaming micro-batch, parity-tested in tests/test_streaming.py.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    tok_col = (
        tokenizer(F.col(text_col))
        if tokenizer is not None
        else tokenize(F.col(text_col), pattern)
    )
    toks = src.select(
        F.col(ts_col),
        F.explode(tok_col).alias("token"),
    ).filter(F.length("token") >= min_token_len)
    return (
        toks.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), "token"
        )
        .agg(F.count(F.lit(1)).alias("token_count"))
        .filter(F.col("token_count") >= min_count)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "token_count",
        )
    )
