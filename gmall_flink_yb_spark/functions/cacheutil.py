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


def release_cache(result: DataFrame) -> None:
    """Unpersist every cached dependency tagged on ``result``. Safe to
    call on untagged frames and safe to call twice (unpersist of an
    already-unpersisted frame is a no-op)."""
    for dep in getattr(result, _ATTR, []):
        dep.unpersist()
    setattr(result, _ATTR, [])
