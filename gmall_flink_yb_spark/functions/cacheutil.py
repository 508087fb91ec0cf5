"""Caller-owned cache lifetimes for lazily-returned plans.

Several builders persist an intermediate that feeds multiple consumers
inside the ONE plan they return (self-join / multi-aggregate reuse).
Because the result is returned lazily, the builder cannot unpersist
after materialization — Spark has no "on first action" callback — so
the cached partitions would otherwise live for the session (ADVICE r3).

Contract: the builder tags the returned DataFrame with its cached
dependencies via :func:`owns_cache`; whoever materializes the result
calls :func:`release_cache` afterwards. Long-lived sessions (streaming
drivers, notebook users, the bench/oracle harnesses) get a deterministic
release point; one-shot scripts may skip it and let session teardown
clean up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_gmall_cached_deps"


def owns_cache(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Tag ``result`` with the persisted frames its plan depends on.
    Idempotent-append: chained builders accumulate deps."""
    existing = list(getattr(result, _ATTR, []))
    setattr(result, _ATTR, existing + list(deps))
    return result


class RDDCacheHandle:
    """``unpersist()``-compatible handle for RDD-level persists —
    ``localCheckpoint(eager=True)`` pins its blocks on the RDD, outside the
    SQL cache manager, so ``DataFrame.unpersist`` cannot free them and
    ``spark.catalog.clearCache`` does not see them. ``release_cache``
    treats a handle like any other tagged dep; unpersisting an
    already-evicted id is a no-op."""

    def __init__(self, sc, rdd_id: int):
        self._sc = sc
        self._id = int(rdd_id)

    def unpersist(self) -> None:
        jrdd = self._sc._jsc.getPersistentRDDs().get(self._id)
        if jrdd is not None:
            jrdd.unpersist(False)


# HAZARD note (ADVICE r5 / VERDICT r6 #4): this module deliberately has NO
# "handles for every RDD pinned since a snapshot" helper. A context-wide
# registry diff captures frames OTHER queries/threads persisted inside the
# window, and releasing those blocks makes someone else's truncated-lineage
# frame permanently unrecomputable. Owners must obtain handles from their
# OWN plan (``dedup._truncate_lineage`` reads the checkpoint RDD id off the
# returned LogicalRDD) and tag them via :func:`owns_cache`.


def carry_cache(derived: DataFrame, *sources: DataFrame) -> DataFrame:
    """Propagate cache-ownership tags from ``sources`` onto ``derived``.

    The tag lives on the Python DataFrame wrapper, so ANY transformation
    (``.select``, ``.join``, a wrapping builder) silently drops it and
    ``release_cache`` on the final frame no-ops — the leak ADVICE r4
    found in q_ann_incremental. Builders/queries that derive a new frame
    from a tagged one must call this on the result they hand out."""
    deps: list[DataFrame] = []
    for s in sources:
        deps.extend(getattr(s, _ATTR, []))
    return owns_cache(derived, *deps)


def release_cache(result: DataFrame) -> None:
    """Unpersist every cached dependency tagged on ``result``. Safe to
    call on untagged frames and safe to call twice (unpersist of an
    already-unpersisted frame is a no-op)."""
    for dep in getattr(result, _ATTR, []):
        dep.unpersist()
    setattr(result, _ATTR, [])
