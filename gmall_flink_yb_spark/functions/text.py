"""Text-analysis operators for the LLM-data-pipeline surface (no reference
counterpart — BASELINE.json north star; SURVEY.md §2.9 last paragraph).

All pure column expressions (JVM codegen, no Python in the hot path):
- token counting (whitespace + regex word model)
- quality scoring (length / punctuation ratio / stopword ratio)
- language ID (stopword-hit heuristic over {de,en,es,fr,zh})
- document fingerprinting (md5 over normalized text — md5 is available in
  both Spark and DuckDB, so fingerprints are oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.operators.keywords import DEFAULT_TOKEN_PATTERN, tokenize

# Tiny per-language stopword marker sets. Chosen to be discriminative among
# the corpus languages {de,en,es,fr,zh}; zh detected by CJK codepoints.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "las", "es", "una", "que", "por"],
    "fr": ["le", "la", "les", "est", "une", "dans", "pour", "que"],
}
CJK_PATTERN = r"[一-鿿]"


def token_count(text: Column, pattern: str = DEFAULT_TOKEN_PATTERN) -> Column:
    """Number of non-empty tokens under the regex word model."""
    return F.size(F.filter(tokenize(text, pattern), lambda t: F.length(t) > 0))


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def language_id(text: Column) -> Column:
    """Heuristic language ID: CJK codepoints -> zh; otherwise the language
    whose stopword-marker set hits the most tokens (ties broken by fixed
    language order de<en<es<fr for determinism); no hits -> 'und'."""
    toks = tokenize(text)
    hits = {lang: _marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    out = F.when(F.length(F.regexp_extract(text, CJK_PATTERN, 0)) > 0, F.lit("zh"))
    when_chain = out
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break order
        when_chain = when_chain.when(
            (hits[lang] > 0) & (hits[lang] == best), F.lit(lang)
        )
    return when_chain.otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append quality-score feature columns:
    n_chars_m, n_tokens, punct_ratio, stopword_ratio, quality_ok.

    Heuristics in the spirit of C4/Gopher text-quality rules (public data-
    pipeline practice): enough tokens, not punctuation-soaked, some stopword
    mass for latin-script languages.
    """
    text = F.col(text_col)
    toks = tokenize(text)
    n_tokens = token_count(text)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    all_markers = [w for ms in LANG_MARKERS.values() for w in ms]
    stop_hits = _marker_hits(toks, all_markers)
    return (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)), 6
            ),
        )
        .withColumn(
            "quality_ok",
            ((n_tokens >= 5) & (F.col("punct_ratio") < 0.3)).cast("int"),
        )
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Identical expression exists in DuckDB, making exact-dup
    detection oracle-checkable."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)
