"""Similarity search over an embedding column (array<float>).

LLM-data-pipeline surface (no reference counterpart; BASELINE.json north star).

- brute_force_topk      : exact cosine top-k per query — the correctness
                          baseline. Dot products run as sequential
                          ``aggregate(zip_with(...))`` folds in DOUBLE, which
                          DuckDB reproduces bit-for-bit (list_dot_product on
                          DOUBLE[]), so this is oracle-checkable.
- cosine_near_dup_pairs : all pairs above a cosine threshold (embedding-based
                          near-dup detection).
- lsh_bucket_topk       : the 100 TB scale path — sign-random-projection LSH
                          buckets (deterministic hyperplanes from xxhash64),
                          candidates only within matching buckets.

Everything is column expressions; no UDF, no collect. At scale the brute-force
variant is a crossJoin (quadratic — only for small query sets); the LSH
variant shuffles each side once on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (sequential double
    fold — deterministic, matches DuckDB's list_cosine_similarity on
    DOUBLE[])."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (q_id, n_id, rank, cos_sim) — rank 1..k by (cosine desc, n_id asc),
    self-matches excluded, cos_sim rounded to 6 dp for cross-engine hashing.

    The corpus side is broadcast when small; for big corpora prefer
    lsh_bucket_topk.
    """
    # norms are computed ONCE per row before the crossJoin (n+m norm folds
    # instead of n*m) — the cosine value is bit-identical to the inline form
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_norm", _norm(F.col("q_vec")))
    c = embeddings.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("n_norm", _norm(F.col("n_vec")))
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            "n_id",
            "rnk",
            F.round(F.col("_cos"), 6).alias("cos_sim"),
        )
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold — embedding-space
    near-duplicate detection. Quadratic: use for modest corpora or after
    LSH blocking."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    ).withColumn("na", _norm(F.col("va")))
    b = embeddings.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    ).withColumn("nb", _norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _srp_plane(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1], derived
    from md5 (seed-free, identical on every run/executor)."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"srp:{p}:{j}".encode()).digest()
        v = int.from_bytes(h[:8], "big") % 2001 - 1000
        out.append(v / 1000.0)
    return out


def _srp_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Sign-random-projection bucket id: one bit per pseudo-random hyperplane.

    Hyperplane coefficients are computed driver-side (plain literals in the
    plan — tiny expression tree, fully codegen'd; no data movement).
    """
    acc = None
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(v) for v in _srp_plane(p, dim)])
        proj = _dot(vec, coeffs)
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        shifted = F.shiftleft(bit, p)
        acc = shifted if acc is None else acc.bitwiseOR(shifted)
    return acc


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket.

    Scale path: both sides shuffle once on bucket_id; within-bucket scoring is
    the same exact cosine. Recall < 1.0 by design (approximate) — rows-only
    correctness check, benched for speed.
    """
    c = (
        embeddings.select(
            F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
        )
        .withColumn("bucket", _srp_bucket(F.col("n_vec"), n_planes, dim))
        .withColumn("n_norm", _norm(F.col("n_vec")))
    )
    q = (
        queries.select(
            F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
        )
        .withColumn("bucket", _srp_bucket(F.col("q_vec"), n_planes, dim))
        .withColumn("q_norm", _norm(F.col("q_vec")))
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("_cos", 6).alias("cos_sim"))
    )
