"""Z-order layout: bit-exactness vs a pure-Python Morton reference, range
partitioning of the layout write, and the file-skipping envelope property."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.layout import (
    zcell_stats,
    zorder_layout,
    zorder_value,
)


def _py_quantize(v: float, lo: float, hi: float, bits: int) -> int:
    buckets = (1 << bits) - 1
    q = int(((float(v) - lo) / (hi - lo if hi > lo else 1.0)) * (buckets + 1)
            // 1)
    return max(0, min(buckets, q))


def _py_morton(vals, bounds, bits: int) -> int:
    k = len(vals)
    z = 0
    for d, (v, (lo, hi)) in enumerate(zip(vals, bounds)):
        q = _py_quantize(v, lo, hi, bits)
        for b in range(bits):
            z |= ((q >> b) & 1) << (b * k + d)
    return z


def test_zvalue_matches_python_reference(spark):
    bounds = [(0.0, 100.0), (0.0, 1000.0)]
    rows = [
        Row(i=i, x=float(x), y=float(y))
        for i, (x, y) in enumerate(
            [(0, 0), (100, 1000), (50, 500), (13, 977), (99.9, 0.1),
             (-5, 1200), (33.3, 333.3)]  # includes out-of-range clamps
        )
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i",
            zorder_value([F.col("x"), F.col("y")], bounds, 8).alias("z"),
        ).collect()
    }
    for r in rows:
        assert got[r.i] == _py_morton([r.x, r.y], bounds, 8), r


def test_zvalue_validates_args():
    with pytest.raises(ValueError, match="at least one"):
        zorder_value([], [])
    with pytest.raises(ValueError, match="bounds"):
        zorder_value([F.col("x")], [])
    with pytest.raises(ValueError, match="63"):
        zorder_value([F.col("x")] * 4, [(0, 1)] * 4, bits_per_dim=16)


def test_layout_ranges_are_disjoint_and_sorted(spark, sf_dir):
    from gmall_flink_yb_spark.sources.readers import read_table

    line = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    out = zorder_layout(
        line,
        [F.col("l_quantity"), F.col("l_extendedprice")],
        [(1.0, 50.0), (0.0, 200_000.0)],
        num_files=8,
    )
    # per-partition [min,max] z envelopes must not overlap (range shuffle):
    # that is exactly the property that gives each written file a tight,
    # non-overlapping footer range
    stats = (
        out.select("_zorder")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("_zorder").alias("lo"),
            F.max("_zorder").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in stats if r["n"] > 0)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans
    assert sum(r["n"] for r in stats) == line.count()


def test_zcell_envelopes_shrink_vs_global(spark, sf_dir):
    """The point of z-order: per-cell min/max spans are much tighter than the
    global span, so footer pruning can skip files for 2-D range predicates."""
    from gmall_flink_yb_spark.sources.readers import read_table

    line = read_table(spark, sf_dir, "lineitem")
    cells = zcell_stats(
        line,
        cols=[F.col("l_quantity"), F.col("l_extendedprice")],
        names=["qty", "price"],
        bounds=[(1.0, 50.0), (0.0, 200_000.0)],
        cell_shift=26,
    ).collect()
    assert len(cells) > 4
    global_qty = 50.0 - 1.0
    global_price = max(r["max_price"] for r in cells) - min(
        r["min_price"] for r in cells
    )
    avg_qty_span = sum(r["max_qty"] - r["min_qty"] for r in cells) / len(cells)
    avg_price_span = sum(
        r["max_price"] - r["min_price"] for r in cells
    ) / len(cells)
    # both dimensions localize at once — the property lexicographic sort lacks
    assert avg_qty_span < 0.6 * global_qty
    assert avg_price_span < 0.6 * global_price
