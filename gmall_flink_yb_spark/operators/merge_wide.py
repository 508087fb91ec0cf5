"""Null-coalescing merge of partial wide records (§2.9 PaymentWide intent).

Reference: bean/OrderWide.java:90-107 — ``mergeOtherOrderWide`` patches every
null field of ``this`` from another partial OrderWide, the building block the
reference provides for combining partially-populated wide rows (PaymentWide
and further fact joins). Spark-first: one projection of ``coalesce(a.c, b.c)``
per shared column over a full-outer join on the key — no per-field Java, and
the merge is a single shuffle on the key (or zero if both sides already
share that partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_wide(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "full_outer",
) -> DataFrame:
    """Merge two partial wide frames on ``on``: for every column present in
    both, take the left value unless null (the exact semantics of
    mergeOtherOrderWide's per-field ``if (this.f == null) this.f = o.f``);
    columns unique to one side pass through."""
    l = left.alias("l")
    r = right.alias("r")
    # plain equality (not eqNullSafe): SQL FULL OUTER JOIN semantics — rows
    # with a null key stay unmatched instead of cross-producting against
    # every other null-keyed row
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on]
    joined = l.join(r, cond, how)
    lcols = set(left.columns)
    rcols = set(right.columns)
    out = []
    for k in on:
        out.append(F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k))
    for c in left.columns:
        if c in on:
            continue
        if c in rcols:
            out.append(F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c))
        else:
            out.append(F.col(f"l.{c}").alias(c))
    for c in right.columns:
        if c not in lcols:
            out.append(F.col(f"r.{c}").alias(c))
    return joined.select(*out)
