"""Bucketed-table layout: pre-shuffled storage for shuffle-free fact joins.

The reference engine keeps its serving tables key-organized (HBase rowkey /
phoenix DDL via common/GmallConfig.java:11) so that the per-record dim
lookup in OrderWideApp never scans. The lakehouse analog for FACT-FACT
joins is bucketing: write both tables hash-partitioned into the same number
of buckets on the join key (``bucketBy`` + ``saveAsTable``), and every
subsequent join/aggregate on that key reads co-located buckets — Spark
plans a SortMergeJoin with ZERO Exchange operators on either side.

At 100 TB this converts the single biggest recurring cost of the TPC-H-
shaped workload (the lineitem x orders shuffle, ~the full fact volume over
the network per query) into a one-time layout write: the write pays one
hash shuffle, every later query pays none. The same bucketed layout also
absorbs the shuffle of groupBy(key) aggregates (Q18's per-order roll-up).

Rules that make it work (asserted in tests/test_bucketing.py):
- both sides bucketed on the join key with the SAME bucket count;
- ``spark.sql.sources.bucketing.enabled`` on (default);
- auto-broadcast disabled or sides above the threshold (otherwise Spark
  rightly prefers a broadcast and buckets are moot).

Bucket-count sizing at scale: buckets are the parallelism floor AND the
per-task read unit — pick ``n_buckets`` so a bucket's largest table slice
fits an executor core's working set (e.g. 100 TB lineitem at 256 MB/task
target -> ~400k buckets is too many files; in practice 4-16k buckets plus
AQE coalescing on the scan side). The bucket count is a physical-layout
contract: changing it rewrites the table, so version it with the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_scan"]


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally per-bucket-sorted) catalog
    table. Sorting by the join key additionally lets SortMergeJoin skip
    its per-partition sort when each bucket lands in one file."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.write.format(file_format)
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(table)


def bucketed_scan(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a plain
    ``spark.read.parquet`` of the same files would DROP the bucket spec and
    reintroduce the shuffle — always go through the catalog)."""
    return spark.table(table)
