"""Deterministic sampling operators for training-data pipelines (LLM-
pipeline surface; no reference counterpart — SURVEY.md §2.9 last paragraph).

Why not `df.sample()`: its output depends on partitioning and a session
seed, so it is neither reproducible across engines nor stable under
repartitioning — useless for auditable corpus curation. Every operator
here keys the decision on md5 of the row's business key, which is
bit-identical in Spark and DuckDB (oracle-checkable) and stable under any
physical layout: uniform keep (`hash_sample`), exact per-stratum k
(`stratified_sample`), temperature mixing (`domain_mix_sample`), token
budgets (`token_budget_cap`), weight-proportional without-replacement
draws (`weighted_sample`, Efraimidis-Spirakis A-ES), and shard placement
(`shard_assign`/`write_shards`).

Scale design (100 TB):
- `hash_sample` is a pure narrow filter — no shuffle, pushed next to the
  scan, trivially parallel.
- `stratified_sample` needs one shuffle on the stratum key (row_number
  window). For exact-k-per-stratum that is unavoidable; for large k prefer
  `hash_sample` per stratum (rate-based, shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the md5; uniform on [0, 16^8)
_HEX_DIGITS = 8
_SPACE = 16 ** _HEX_DIGITS


def _hash_bucket(key: Column) -> Column:
    """First 32 bits of md5(key) as a lowercase hex string. Lexicographic
    comparison on fixed-width lowercase hex == numeric comparison, and the
    expression is identical in DuckDB: substr(md5(x), 1, 8)."""
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS)


def sample_threshold(fraction: float) -> str:
    """Threshold string such that P[bucket < threshold] ==
    round(fraction*2^32)/2^32 under 8-char lexicographic comparison.
    fraction==1.0 returns 'g'*8, which sorts after every hex bucket (a
    9-char hex number would break the fixed-width string comparison)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(round(fraction * _SPACE))
    if n >= _SPACE:
        return "g" * _HEX_DIGITS
    return format(n, f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, key_col: str | Column, fraction: float) -> DataFrame:
    """Keep a deterministic ~`fraction` of rows, decided per-row by
    md5(key). Reproducible across engines, runs, and partitionings; the
    same key always gets the same verdict (dedup-friendly: a doc sampled
    in means its exact duplicate elsewhere is sampled in too)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return df.filter(_hash_bucket(key) < F.lit(sample_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by md5(key) order
    (a deterministic uniform permutation within each stratum; key as final
    tie-break makes duplicate-key corpora deterministic too)."""
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_bucket(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_strat_rn", F.row_number().over(w))
        .filter(F.col("_strat_rn") <= k)
        .drop("_strat_rn")
    )


def unit_hash(key: Column) -> Column:
    """md5(key)'s first 32 bits as a uniform double on [0, 1). Exact in
    both engines: the 32-bit int is exactly representable in a double and
    the division by 2^32 is a power-of-two scale (no rounding)."""
    return F.conv(_hash_bucket(key), 16, 10).cast("long") / F.lit(
        float(_SPACE)
    )


def domain_mix_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-flattened domain mixture (downsample-only): keep each
    row of domain d with probability ``rate_d = (n_min / n_d)^(1-alpha)``,
    where ``n_min`` is the smallest domain's row count.

    - ``alpha=1``: natural mix (keep everything).
    - ``alpha=0``: uniform mix (every domain downsampled to ~n_min).
    - ``alpha=0.5``: the sqrt-temperature compromise used for multilingual
      corpus balancing (small domains over-represented relative to their
      natural share, big domains still dominant).

    Keep decisions hash on md5(key): deterministic across engines, runs and
    layouts, and identical keys sample identically in every domain.

    Scale design (100 TB): domain counts are one partial-aggregated shuffle
    of |domains| rows; rates join back via an explicit broadcast; the keep
    filter itself is narrow. The corpus never shuffles. ``alpha=0.5`` uses
    ``sqrt`` (IEEE correctly-rounded in both engines — bit-exact oracle
    parity); other alphas go through ``pow``, which is only
    faithfully-rounded and may diverge from another engine by an ulp.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n_d"))
    n_min = counts.agg(F.min("_n_d").alias("_n_min"))
    ratio = F.col("_n_min").cast("double") / F.col("_n_d")
    rate = (
        F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    )
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        domain_col, rate.alias("_rate")
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(unit_hash(F.col(key_col)) < F.col("_rate"))
        .drop("_rate")
    )


def token_budget_cap(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Cap each stratum (source / domain / host) at a TOKEN budget rather
    than a row count — the curation form actually used when balancing a
    training mixture (a host capped at 1M tokens, not 1k docs).

    Rows are admitted in deterministic md5(key) order until the stratum's
    running token total exceeds ``budget``; the first row of a stratum is
    always kept (so a single over-budget document doesn't erase its
    stratum). Deterministic across engines, runs, and layouts.

    Scale design (100 TB): one shuffle on the stratum key for the running-
    sum window, which is the minimum possible for per-stratum global state;
    per-row state inside the window is one long. A pathologically hot
    stratum is still one partition's scan — for that regime pre-filter with
    ``hash_sample`` per stratum to approach the budget, then cap exactly.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(_hash_bucket(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    return (
        df.withColumn("_cum_tokens", cum)
        .filter(
            (F.col("_cum_tokens") <= budget)
            | (F.col("_cum_tokens") == F.col(tokens_col).cast("long"))
        )
        .drop("_cum_tokens")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-ES): keep the ``k`` rows (per stratum, or globally)
    with the smallest exponential key ``-ln(u) / w`` — equivalent to
    drawing rows one by one with probability proportional to ``weight_col``
    and never replacing. The uniform ``u`` hashes from md5(key) shifted to
    the BUCKET MIDPOINT, ``(h + 0.5) / 2^32`` — strictly inside (0, 1), so
    ``ln`` never sees 0, and both the add and the power-of-two divide are
    exact in a double (engine-portable).

    Rows with NULL or non-positive weight are never sampled (a zero-weight
    row has inclusion probability 0 by definition; negative weights are
    meaningless here).

    Determinism: same contract as every operator in this module — the
    verdict depends only on the row's key and weight, never on
    partitioning, session seeds, or what else is in the corpus (beyond the
    rank-k cutoff A-ES defines). ``ln`` is faithfully-rounded in both
    engines; an oracle divergence needs two scores within ~1 ulp AND
    straddling the rank-k boundary (the ``domain_mix`` pow caveat, same
    acceptance).

    Scale design (100 TB): the score is a narrow per-row expression.
    Stratified top-k is one shuffle on the stratum (row_number window);
    the global form compiles to TakeOrdered — a per-partition top-k that
    merges k-sized heaps on the driver, never a single-partition sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.conv(_hash_bucket(F.col(key_col)), 16, 10).cast("long")
    u_mid = (h.cast("double") + F.lit(0.5)) / F.lit(float(_SPACE))
    w = F.col(weight_col).cast("double")
    scored = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "_aes_score", -F.log(u_mid) / w
    )
    if stratum_col is None:
        return (
            scored.orderBy("_aes_score", key_col).limit(k).drop("_aes_score")
        )
    win = Window.partitionBy(stratum_col).orderBy(
        "_aes_score", key_col
    )
    return (
        scored.withColumn("_aes_rn", F.row_number().over(win))
        .filter(F.col("_aes_rn") <= k)
        .drop("_aes_score", "_aes_rn")
    )


def shard_assign(
    df: DataFrame, key_col: str | Column, n_shards: int
) -> DataFrame:
    """Append a deterministic `shard` column: md5(key) mod n_shards.

    Training-data delivery: the corpus must land in N equal shards whose
    membership is reproducible (re-running the pipeline after adding one
    source must not reshuffle every existing shard — md5 keying guarantees
    a doc's shard never depends on what else is in the corpus). Pure
    narrow projection; the writer (`write_shards`) pays the single
    unavoidable placement shuffle. md5 (not xxhash64) so the assignment is
    engine-portable: DuckDB ('0x'||substr(md5(x),1,15))::BIGINT % n.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return df.withColumn("shard", (h % F.lit(n_shards)).cast("int"))


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    order_col: str | None = None,
) -> None:
    """Write `df` as n_shards hash-sharded parquet directories
    (shard=NNN/...). One shuffle (repartition on the shard id) so each
    shard is written by its own tasks; optional in-shard ordering (e.g.
    curriculum order) is a local sort, not a second shuffle. At 100 TB
    raise n_shards so each shard stays in the 1-10 GB range the training
    loader wants."""
    out = shard_assign(df, key_col, n_shards).repartition(
        n_shards, "shard"
    )
    if order_col is not None:
        out = out.sortWithinPartitions("shard", order_col)
    out.write.partitionBy("shard").mode("overwrite").parquet(path)
