"""Text-analysis operators for the LLM-data-pipeline surface (no reference
counterpart — BASELINE.json north star; SURVEY.md §2.9 last paragraph).

All pure column expressions (JVM codegen, no Python in the hot path):
- token counting (whitespace + regex word model)
- quality scoring (length / punctuation ratio / stopword ratio)
- repetition scoring (top-token / top-bigram mass, Gopher-style rules)
- PII redaction (email/phone regex scrub + counts)
- language ID (stopword-hit heuristic over {de,en,es,fr,zh})
- document fingerprinting (md5 over normalized text — md5 is available in
  both Spark and DuckDB, so fingerprints are oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


# fastText-style linear quality model: fixed, interpretable public weights
# (the learned-classifier pattern of CCNet/RedPajama quality filters, with
# the model parameter inlined since no training corpus ships with the repo)
QUALITY_WEIGHTS = {
    "bias": -1.0,
    "len_norm": 2.5,      # saturating length credit: min(n_tokens,100)/100
    "punct_ratio": -4.0,  # punctuation-soaked text is boilerplate
    "stopword_ratio": 3.0,  # stopword mass ~ natural prose
}


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Soft quality classifier: linear model over the ``quality_features``
    columns, squashed to (0, 1) by the rational map 0.5 + 0.5*z/(1+|z|).

    The squash is deliberately NOT the logistic sigmoid: exp() is a libm
    call whose low bits differ across engines, while +,*,/,abs are exactly
    rounded IEEE ops — so the score is bit-reproducible in any engine that
    evaluates the same expression, and the operator stays hash-checkable.
    Monotone in z, so ranking and thresholding behave like a sigmoid.

    Appends quality_score (rounded 6 dp) and quality_label (score >= 0.5).
    Pure codegen'd column expressions — narrow, scan-speed at any scale.
    """
    feat = quality_features(df, text_col)
    z = (
        F.lit(QUALITY_WEIGHTS["bias"])
        + F.lit(QUALITY_WEIGHTS["len_norm"])
        * (
            F.least(F.col("n_tokens"), F.lit(100)).cast("double")
            / F.lit(100.0)
        )
        + F.lit(QUALITY_WEIGHTS["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(QUALITY_WEIGHTS["stopword_ratio"]) * F.col("stopword_ratio")
    )
    score = F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))
    return feat.withColumn(
        "quality_score", F.round(score, 6)
    ).withColumn(
        "quality_label", (F.col("quality_score") >= 0.5).cast("int")
    )


def repetition_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 30,
    max_top_token_frac: float = 0.12,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
) -> DataFrame:
    """Per-doc repetition features in the spirit of the Gopher repetition
    rules (public data-pipeline practice): documents dominated by a few
    tokens/bigrams are boilerplate or spam, not prose.

    Returns (doc_id, n_tokens_total, top_token_frac, top_bigram_frac,
    mean_token_len, repetition_ok).

    Scale shape: tokens and bigrams are EXPLODED to rows, tagged, and pushed
    through ONE groupBy chain — (doc, kind, gram) counts, then per-doc
    conditional aggregates — so the whole operator is two hash shuffles with
    map-side partial aggregation, no per-doc array materialization beyond
    the tokenizer, and no Python. (A per-row array-lambda mode computation
    would be interpreted and O(len^2) per doc.)
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "w"),
    ).filter(F.length("w") > 0)
    unigrams = toks.select("doc_id", F.lit(1).alias("kind"), F.col("w").alias("g"))
    bigrams = (
        toks.select(
            "doc_id", F.col("w"), F.lead("w", 1).over(w).alias("w2")
        )
        .filter(F.col("w2").isNotNull())
        .select(
            "doc_id", F.lit(2).alias("kind"),
            F.concat_ws(" ", "w", "w2").alias("g"),
        )
    )
    counts = (
        unigrams.unionByName(bigrams)
        .groupBy("doc_id", "kind", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    uni = F.col("kind") == 1
    big = F.col("kind") == 2
    per_doc = counts.groupBy("doc_id").agg(
        F.sum(F.when(uni, F.col("c"))).alias("_n_tok"),
        F.max(F.when(uni, F.col("c"))).alias("_max_tok"),
        F.sum(F.when(uni, F.col("c") * F.length("g"))).alias("_char_mass"),
        F.sum(F.when(big, F.col("c"))).alias("_n_big"),
        F.max(F.when(big, F.col("c"))).alias("_max_big"),
    )
    top_tok = F.round(
        F.col("_max_tok").cast("double") / F.col("_n_tok"), 6
    )
    top_big = F.round(
        F.col("_max_big").cast("double")
        / F.greatest(F.col("_n_big"), F.lit(1)),
        6,
    )
    mean_len = F.round(
        F.col("_char_mass").cast("double") / F.col("_n_tok"), 6
    )
    return per_doc.select(
        "doc_id",
        F.col("_n_tok").alias("n_tokens_total"),
        top_tok.alias("top_token_frac"),
        F.coalesce(top_big, F.lit(0.0)).alias("top_bigram_frac"),
        mean_len.alias("mean_token_len"),
        (
            (F.col("_n_tok") >= min_tokens)
            & (top_tok <= max_top_token_frac)
            & (mean_len >= min_mean_len)
            & (mean_len <= max_mean_len)
        )
        .cast("int")
        .alias("repetition_ok"),
    )


# RE2-compatible (no backrefs/lookarounds), so Spark's Java regex and
# DuckDB's RE2 match identically
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\+\d{1,3}-\d{3}-\d{4}-\d{4}"


def pii_redact(text: Column) -> Column:
    """Replace emails then phone numbers with typed placeholders. Pure
    regexp_replace chain (codegen'd; Spark replaces all matches, DuckDB
    needs the 'g' flag — the oracle passes it)."""
    scrubbed = F.regexp_replace(text, PII_EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(scrubbed, PII_PHONE_PATTERN, "[PHONE]")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for audit metrics."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL_PATTERN)),
        F.regexp_count(text, F.lit(PII_PHONE_PATTERN)),
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Identical expression exists in DuckDB, making exact-dup
    detection oracle-checkable."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


def unigram_lm_score(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020 use wiki-LM
    perplexity to rank docs), with the log quantized so the whole pipeline
    is integer-exact: a token's surprisal is measured in whole bits as
    ``length(bin(N)) - length(bin(cnt))`` (floor-log2 via the binary string
    length — identical in Spark and DuckDB, unlike float ``log2`` whose
    last-ulp behavior is libm-specific). A document's score is the
    tf-weighted mean surprisal of its tokens: high = rare-token-heavy
    (gibberish or highly specific), low = stopword mush.

    Returns (doc_id, n_tokens, sum_bits, mean_bits) for every document
    with at least one token.

    Scale shape (100 TB): one explode of the token stream feeding ONE
    shuffle on (doc, token) for tf; the vocab roll-up and the corpus total
    both partial-aggregate map-side from tf (token-cardinality inputs, not
    corpus-cardinality). The vocab joins back on token — a key whose
    cardinality is vocabulary-sized, with heavy hitters bounded by the
    Zipf head; the 1-row corpus total broadcasts. No Python anywhere.
    """
    from pyspark import StorageLevel

    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.filter(tokenize(F.col(text_col)), lambda t: F.length(t) > 0)).alias("w"),
    )
    # tf feeds THREE consumers (the vocab roll-up, the corpus total via
    # vocab, and the join's probe side) — persist it or the tokenizing
    # explode recomputes per consumer (self-join persist discipline)
    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vocab = tf.groupBy("w").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    bits = F.length(F.bin(F.col("n_total"))) - F.length(F.bin(F.col("cnt")))
    from gmall_flink_yb_spark.functions.cacheutil import owns_cache

    return owns_cache(
        tf.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * bits).alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_bits",
            F.round(
                F.col("sum_bits").cast("double") / F.col("n_tokens"), 6
            ).alias("mean_bits"),
        ),
        tf,  # caller releases via cacheutil.release_cache (ADVICE r3)
    )
