"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

The reference engine stores serving tables in HBase/ClickHouse keyed by one
rowkey (common/GmallConfig.java:11, the phoenix/CH DDL path), so point lookups
on the key are fast but every other predicate scans. On a 100 TB lakehouse the
Spark-native equivalent of a secondary index is DATA LAYOUT: sort the files
along a space-filling curve over the query columns so parquet min/max footers
prune files for range predicates on ANY of the curve's dimensions, not just
the first sort column (lexicographic sort only helps the leading column).

Everything here is pure codegen'd column arithmetic — the z-value of k
columns is a fixed unrolled bit-interleave expression (no UDF, no shuffle of
its own), so computing it costs one projection over the scan. The layout
write is one range repartition (a single shuffle — the same shuffle ANY
re-clustering of 100 TB must pay) plus a local sort within partitions, which
parquet turns into tight per-file min/max ranges on every z dimension.

Determinism: rank-free quantization (value - lo) * scale over caller-supplied
bounds, never runtime percentiles, so the same row always lands at the same
z-value across engines — the DuckDB oracle reproduces the interleave bit for
bit (tests/test_layout.py, queries.py::q_zorder_cells).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_layout", "zcell_stats"]


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] linearly onto [0, 2^bits - 1] as a long, clamping
    out-of-range values to the ends (clamping keeps stray rows in the first/
    last cell instead of corrupting the interleave with negative bits)."""
    buckets = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi - lo) if hi > lo else 1.0
    )
    q = F.floor(scaled * F.lit(float(buckets + 1))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(buckets), q))


def zorder_value(
    cols: list[Column],
    bounds: list[tuple[float, float]],
    bits_per_dim: int = 16,
) -> Column:
    """Morton z-value of ``cols``: quantize each dimension to
    ``bits_per_dim`` bits, then interleave the bits round-robin
    (dim 0 owns bit positions 0, k, 2k, ...; dim 1 owns 1, k+1, ...).

    The interleave is a statically unrolled sum of shift/mask terms —
    ``bits_per_dim * len(cols)`` integer ops per row, all inside
    WholeStageCodegen. k * bits_per_dim must be <= 63 (long z-value).
    """
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_value needs at least one column")
    if len(bounds) != k:
        raise ValueError(f"bounds has {len(bounds)} entries for {k} cols")
    if k * bits_per_dim > 63:
        raise ValueError(
            f"{k} dims x {bits_per_dim} bits = {k * bits_per_dim} bits; "
            "a long z-value holds at most 63"
        )
    qs = [
        _quantize(c, lo, hi, bits_per_dim)
        for c, (lo, hi) in zip(cols, bounds)
    ]
    z = F.lit(0).cast("long")
    for d, q in enumerate(qs):
        for b in range(bits_per_dim):
            # bit b of dim d -> bit (b * k + d) of the z-value
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * k + d
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[Column],
    bounds: list[tuple[float, float]],
    num_files: int,
    bits_per_dim: int = 16,
) -> DataFrame:
    """Re-cluster ``df`` along the z-curve: one range shuffle into
    ``num_files`` partitions plus an in-partition sort. Writing the result
    gives every file a tight min/max envelope on EVERY z dimension, so
    predicates like ``x BETWEEN a AND b AND y BETWEEN c AND d`` prune files
    via parquet footers alone. The `_zorder` column is kept so downstream
    writers can partition/sort again without recomputing."""
    z = zorder_value(cols, bounds, bits_per_dim).alias("_zorder")
    return (
        df.withColumn("_zorder", z)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
    )


def zcell_stats(
    df: DataFrame,
    cols: list[Column],
    names: list[str],
    bounds: list[tuple[float, float]],
    bits_per_dim: int = 16,
    cell_shift: int = 24,
) -> DataFrame:
    """Locality report: group rows by coarse z-cell (z >> cell_shift) and
    emit per-cell count plus min/max of every dimension — the exact numbers
    a file-skipping planner reads from parquet footers after a z-order
    write. Deterministic, so it doubles as the oracle-checked surface for
    the whole z-machinery."""
    z = zorder_value(cols, bounds, bits_per_dim)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, n in zip(cols, names):
        aggs.append(F.min(c).alias(f"min_{n}"))
        aggs.append(F.max(c).alias(f"max_{n}"))
    return (
        df.withColumn("_zcell", F.shiftright(z, cell_shift))
        .groupBy("_zcell")
        .agg(*aggs)
        .withColumnRenamed("_zcell", "zcell")
    )
