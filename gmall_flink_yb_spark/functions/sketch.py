"""Count-min sketch frequency estimation (LLM-pipeline / analytics
surface; no reference counterpart — SURVEY.md §2.9 last paragraph).

The reference's DWS intent includes keyword frequency ranking
(keyword_top100); at 100 TB the exact per-token groupBy is fine, but a
COUNT-MIN sketch answers the same heavy-hitters question with state
bounded at ``depth x width`` counters regardless of vocabulary size —
the standard trick when the key space (urls, n-grams, user agents)
explodes. Cormode & Muthukrishnan 2005.

Determinism: the j-th hash of an item is bits [32j, 32j+32) of ONE
md5(item) digest mod width for j < 4 (the 128-bit digest carries four
independent-enough 32-bit hashes — standard sketch practice, and it
costs ONE md5 per item instead of depth; Catalyst's subexpression
elimination evaluates the shared md5 once per row), falling back to
md5("<j>:" + item) for j >= 4. Bit-identical in DuckDB, so the sketch
itself (not just its row count) is oracle-checkable, including the
overestimate property est >= exact.

Scale design (100 TB):
- build: one explode (depth rows per item instance) into a map-side-
  combined groupBy — the shuffle carries (j, bucket) pairs, never items,
  and the result is at most depth*width rows TOTAL, independent of input
  size. No driver state.
- estimate: the sketch is KB-sized by construction -> broadcast join;
  per-item minimum over its depth counters. Items never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_bucket(item: Column, j: int, width: int) -> Column:
    """Row-j bucket of an item: hex chars [8j, 8j+8) of md5(item) for
    j < 4 (one digest, four hashes), salted digests beyond
    (DuckDB: CAST(('0x' || substr(md5(g), 1 + 8*j, 8)) AS BIGINT))."""
    if j < 4:
        digest = F.substring(F.md5(item), 1 + 8 * j, 8)
    else:
        digest = F.substring(F.md5(F.concat(F.lit(f"{j}:"), item)), 1, 8)
    return F.conv(digest, 16, 10).cast("long") % width


def _jb_array(item: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                _cm_bucket(item, j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def count_min_build(
    df: DataFrame,
    item_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Counter table (j, bucket, cnt) over every row of ``df`` (instances,
    not distinct items) — at most depth*width rows."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    rows = df.select(
        F.explode(_jb_array(F.col(item_col), depth, width)).alias("_jb")
    )
    return rows.groupBy(
        F.col("_jb.j").alias("j"), F.col("_jb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def count_min_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Estimated frequency for each (distinct) row of ``items``:
    min over the item's ``depth`` counters. Returns (item_col, est_count).
    Guarantees est_count >= the item's true instance count."""
    keyed = items.select(
        F.col(item_col),
        F.explode(_jb_array(F.col(item_col), depth, width)).alias("_jb"),
    ).select(item_col, F.col("_jb.j").alias("j"), F.col("_jb.bucket").alias("bucket"))
    joined = keyed.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count")
    )
