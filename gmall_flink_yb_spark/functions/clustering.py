"""Distributed spherical k-means (Lloyd iterations) over embedding columns.

The serving-layer role this fills: the reference keeps no trained state at
all (its dws/ads packages are empty — SURVEY.md §2.9), but every LLM-corpus
pipeline needs a clustering pass — SemDeDup's codebook
(functions/similarity.py:245), IVF's coarse quantizer
(functions/similarity.py:367), and topic/domain bucketing all consume
exactly this: k centroids fitted to the embedding space.

Scale design (100 TB):
- The centroid set is a MODEL PARAMETER (k x dim doubles). For small k it
  folds into the plan as literals — assignment is a narrow, zero-shuffle,
  codegen'd struct-greatest per row (same engine as semantic_dedup's
  assignment) — and the update step is one groupBy over (cluster, dim)
  rows whose k*dim-row output is collected to the driver. The corpus
  itself is scanned once per iteration and never shuffled beyond the
  k*dim-row aggregate.
- Once k*dim exceeds ``max_folded_kdim`` (SemDeDup-scale codebooks:
  k = 10^4..10^5), the per-iteration driver collect and the k*dim-literal
  expression tree both stop scaling. The loop then switches to DISTRIBUTED
  centroid state: centroids stay a k-row DataFrame, assignment is a
  broadcast cross join + per-id max-struct argmax (map-side combine folds
  the n*k scored rows back to one row per doc before the shuffle), and
  the next iteration's centroids are rebuilt distributively. The driver
  no longer folds k*dim literals into the plan or round-trips Python
  objects; note the broadcast itself still materializes the k*dim-row
  relation driver-side while building the broadcast, so driver MEMORY
  (not plan size) remains the model-size bound.
- No RNG: init centroids are the k vectors with the smallest
  md5(cast(id as string)) — a uniform, engine-reproducible sample, so the
  whole trajectory (init -> assign -> update -> assign ...) is
  deterministic and a SQL oracle can replay it iteration by iteration
  (queries.py::SQL_KMEANS_CLUSTERS unrolls the same two iterations).
- Trajectory determinism: intermediate centroid means are rounded to 12
  decimal places before feeding the next assignment (in BOTH the Spark
  loop and the SQL replay). Distributed double avg is
  partition-order-dependent in its last ulp; unrounded, a near-tie
  assignment could flip between engines (or between Spark runs) and break
  the oracle hash. 12 dp is far below any semantic difference and far
  above ulp noise for unit-scale embedding coordinates.
- Cosine assignment (spherical k-means): embeddings are direction-coded;
  mean vectors need no explicit renormalization because cosine ignores
  magnitude. Ties break toward the smallest centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.cacheutil import owns_cache
from gmall_flink_yb_spark.functions.dedup import _truncate_lineage
from gmall_flink_yb_spark.functions.similarity import _as_double, cosine

__all__ = ["kmeans_fit_assign"]

_TRAJ_DP = 12  # intermediate-centroid rounding (see module docstring)


def _with_nearest(
    e: DataFrame, cent: list[tuple[int, list[float]]]
) -> DataFrame:
    """``e`` plus a ``cid`` nearest-centroid column: max over
    struct(cosine, -cid) picks the highest similarity, then the smallest
    centroid id on exact ties.

    The centroid matrix rides in as ONE broadcast row of
    array<struct<cid,v>> (r13): the r12 form folded k separate
    per-centroid expressions with k*dim literal NODES into the plan, and
    Catalyst re-analyzed that tree on every iteration — profiled at
    2.5 s of DRIVER plan-build per kmeans_clusters call against ~0.4 s
    of executor time. The argmax is the same struct-max over the same
    per-centroid cosine folds (float op order unchanged, ties identical
    via max(-cid)), evaluated from a lambda variable instead of
    literals, so the trajectory is bit-identical while the expression
    tree is O(1) in k and dim. The broadcast is a 1-row local relation —
    no extra data shuffle (the plan-shape pytest pins this)."""
    spark = e.sparkSession
    cent_df = spark.createDataFrame(
        [([(int(cid), [float(x) for x in v]) for cid, v in cent],)],
        "_cents array<struct<cid:long, v:array<double>>>",
    )
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                cosine(F.col("vec"), c["v"]).alias("c"),
                (-c["cid"]).cast("long").alias("nid"),
            ),
        )
    )
    return (
        e.crossJoin(F.broadcast(cent_df))
        .withColumn("cid", -best["nid"])
        .drop("_cents")
    )


def _shape_state(state: DataFrame) -> DataFrame:
    return state.select(
        F.col("cid").cast("long").alias("cluster_id"),
        F.col("n").alias("n_members"),
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("c"),
    )


def kmeans_fit_assign(
    embeddings: DataFrame,
    n_clusters: int = 8,
    n_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_folded_kdim: int = 32_768,
) -> DataFrame:
    """Run ``n_iterations`` Lloyd steps from the deterministic md5 init and
    return the final per-(cluster, dim) state: one row per centroid
    coordinate, ``(cluster_id, n_members, dim, c)`` with dim 1-based and
    c the UNROUNDED post-assignment coordinate mean (callers round for
    cross-engine comparison; only the means that feed the NEXT iteration
    are rounded to 12 dp — see module docstring). cluster_id is the init
    vector's id — stable across iterations, so downstream joins don't
    re-key every step.

    ``max_folded_kdim`` picks the engine: k*dim at or below it uses the
    literal-folded zero-shuffle assignment; above it, centroids stay a
    broadcast-joined DataFrame (no k*dim plan literals, no Python-object
    collect; the broadcast build still holds one k*dim relation in driver
    memory). Both paths follow the identical trajectory (same init, same
    rounding, same tie-breaks).

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
    init = e.orderBy(F.md5(F.col("id").cast("string")), "id").limit(n_clusters)

    # probe the dimensionality from the RAW frame, not `init`: head(1) on
    # init would execute the full corpus orderBy(md5)+limit sort just to
    # read one vector length, and that same sort job runs again when the
    # chosen path materializes the init centroids
    probe = e.select(F.size("vec").alias("d")).head(1)
    if not probe:
        raise ValueError("kmeans_fit_assign: embeddings input is empty")
    dim = probe[0]["d"]
    if n_clusters * dim <= max_folded_kdim:
        return _fit_folded(e, init, n_iterations)
    return _fit_distributed(e, init, n_iterations)


def _fit_folded(
    e: DataFrame, init: DataFrame, n_iterations: int
) -> DataFrame:
    """Small-k path: the centroid matrix rides in as one broadcast row
    (zero-shuffle assignment, O(1) plan size — see ``_with_nearest``);
    the k*dim-row state is the one legitimate collect."""
    init_rows = init.collect()
    if not init_rows:
        raise ValueError("kmeans_fit_assign: embeddings input is empty")
    cent = [(int(r["id"]), list(r["vec"])) for r in init_rows]

    for it in range(n_iterations):
        assigned = _with_nearest(e, cent)
        state = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("c"), F.count(F.lit(1)).alias("n"))
        )
        if it == n_iterations - 1:
            return _shape_state(state)
        rows = state.select(
            "cid", "pos", F.round("c", _TRAJ_DP).alias("c")
        ).collect()
        dim = max(r["pos"] for r in rows) + 1
        by_cid: dict[int, list[float]] = {
            int(r["cid"]): [0.0] * dim for r in rows
        }
        for r in rows:
            by_cid[int(r["cid"])][int(r["pos"])] = float(r["c"])
        cent = sorted(by_cid.items())
    raise AssertionError("unreachable")


def _fit_distributed(
    e: DataFrame, init: DataFrame, n_iterations: int
) -> DataFrame:
    """Large-k path: the centroid set never leaves the cluster. Assignment
    scores n*k (doc, centroid) rows from a broadcast cross join, and the
    per-doc argmax partial-aggregates map-side, so the one shuffle per
    iteration carries n rows, not n*k. Each iteration's k-row centroid
    frame is eagerly materialized (lineage truncated) — otherwise round
    i's plan would chain i full corpus scans."""
    cent_df, handle = _truncate_lineage(
        init.select(F.col("id").alias("ccid"), F.col("vec").alias("cv"))
    )
    for it in range(n_iterations):
        scored = e.crossJoin(F.broadcast(cent_df)).select(
            "id",
            "vec",
            F.struct(
                cosine(F.col("vec"), F.col("cv")).alias("s"),
                (-F.col("ccid")).cast("long").alias("nid"),
            ).alias("cand"),
        )
        assigned = (
            scored.groupBy("id")
            .agg(F.max("cand").alias("b"), F.first("vec").alias("vec"))
            .select("id", "vec", (-F.col("b.nid")).alias("cid"))
        )
        state = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("c"), F.count(F.lit(1)).alias("n"))
        )
        if it == n_iterations - 1:
            # the returned plan still references this round's cent_df
            # checkpoint blocks (state is lazy) — tag the handle on the
            # result for cacheutil.release_cache instead of freeing here
            out = _shape_state(state)
            return owns_cache(out, handle) if handle is not None else out
        cent_df, new_handle = _truncate_lineage(
            state.groupBy(F.col("cid").alias("ccid")).agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: F.round(s["c"], _TRAJ_DP),
                ).alias("cv")
            )
        )
        if handle is not None:
            handle.unpersist()  # previous round's k-row checkpoint blocks
        handle = new_handle
    raise AssertionError("unreachable")
