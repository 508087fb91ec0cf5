"""Distributed spherical k-means (Lloyd iterations) over embedding columns.

The serving-layer role this fills: the reference keeps no trained state at
all (its dws/ads packages are empty — SURVEY.md §2.9), but every LLM-corpus
pipeline needs a clustering pass — SemDeDup's codebook
(functions/similarity.py:245), IVF's coarse quantizer
(functions/similarity.py:367), and topic/domain bucketing all consume
exactly this: k centroids fitted to the embedding space.

Scale design (100 TB):
- The centroid set is a MODEL PARAMETER (k x dim doubles, a few KB). Each
  Lloyd iteration moves ONLY that: assignment folds the centroids into the
  plan as literals — a narrow, zero-shuffle, codegen'd struct-greatest per
  row (same engine as semantic_dedup's assignment) — and the update step is
  one groupBy over (cluster, dim) rows whose output is k*dim rows collected
  to the driver. The corpus itself is scanned once per iteration and never
  shuffled beyond the k*dim-row aggregate.
- No RNG: init centroids are the k vectors with the smallest
  md5(cast(id as string)) — a uniform, engine-reproducible sample, so the
  whole trajectory (init -> assign -> update -> assign ...) is
  deterministic and a SQL oracle can replay it iteration by iteration
  (queries.py::SQL_KMEANS_CLUSTERS unrolls the same two iterations).
- Cosine assignment (spherical k-means): embeddings are direction-coded;
  mean vectors need no explicit renormalization because cosine ignores
  magnitude. Ties break toward the smallest centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.similarity import _as_double, cosine

__all__ = ["kmeans_fit_assign"]


def _nearest(cent: list[tuple[int, list[float]]]) -> F.Column:
    """Codegen'd nearest-centroid id for the `vec` column: max over
    struct(cosine, -cid) picks the highest similarity, then the smallest
    centroid id on exact ties."""
    structs = [
        F.struct(
            cosine(F.col("vec"), F.array(*[F.lit(float(x)) for x in v])).alias(
                "c"
            ),
            F.lit(-int(cid)).cast("long").alias("nid"),
        )
        for cid, v in cent
    ]
    best = structs[0] if len(structs) == 1 else F.greatest(*structs)
    return -best["nid"]


def kmeans_fit_assign(
    embeddings: DataFrame,
    n_clusters: int = 8,
    n_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iterations`` Lloyd steps from the deterministic md5 init and
    return the final per-(cluster, dim) state: one row per centroid
    coordinate, ``(cluster_id, n_members, dim, c)`` with dim 1-based and
    c the UNROUNDED post-assignment coordinate mean (callers round for
    cross-engine comparison). cluster_id is the init vector's id — stable
    across iterations, so downstream joins don't re-key every step.

    A cluster that loses every member simply drops out of the state (same
    semantics as the SQL replay); with the md5-uniform init and cosine
    assignment that is rare in practice.
    """
    if n_clusters < 1 or n_iterations < 1:
        raise ValueError("n_clusters and n_iterations must be >= 1")
    e = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        _as_double(F.col(vec_col)).alias("vec"),
    )
    # k*dim doubles — a model parameter, the one legitimate collect
    init_rows = (
        e.orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(n_clusters)
        .collect()
    )
    if not init_rows:
        raise ValueError("kmeans_fit_assign: embeddings input is empty")
    cent = [(int(r["id"]), list(r["vec"])) for r in init_rows]

    for it in range(n_iterations):
        assigned = e.withColumn("cid", _nearest(cent))
        state = (
            assigned.select(
                "cid", F.posexplode("vec").alias("pos", "x")
            )
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("c"), F.count(F.lit(1)).alias("n"))
        )
        if it == n_iterations - 1:
            return state.select(
                F.col("cid").cast("long").alias("cluster_id"),
                F.col("n").alias("n_members"),
                (F.col("pos") + 1).cast("int").alias("dim"),
                F.col("c"),
            )
        rows = state.collect()
        by_cid: dict[int, list[float]] = {}
        for r in rows:
            by_cid.setdefault(int(r["cid"]), [0.0] * 0)
        dim = max(r["pos"] for r in rows) + 1
        by_cid = {c: [0.0] * dim for c in by_cid}
        for r in rows:
            by_cid[int(r["cid"])][int(r["pos"])] = float(r["c"])
        cent = sorted(by_cid.items())
    raise AssertionError("unreachable")
