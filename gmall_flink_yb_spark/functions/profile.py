"""One-pass data profiling (data-quality surface; no reference
counterpart — the reference trusts its simulator's output blindly, see
SURVEY.md §5.1 "no tests exist").

``profile_columns`` computes, for every requested column in ONE scan:
row count, null count, exact distinct count, lexicographic-cast min/max,
and total cast length — the audit table a pipeline materializes before
and after every curation stage (ingest regression checks, schema drift,
null storms).

Scale design (100 TB): all metrics for all columns ride a single
aggregate over one scan (Catalyst fuses the 5xN expressions into one
partial-agg pipeline; the shuffle is ONE row per partition). The only
genuinely expensive metric is exact n_distinct, which Spark plans as an
expand + two-phase agg per column; for routine monitoring swap it for
``approx_count_distinct`` (documented knob, default exact so the DuckDB
oracle can verify values). The wide single row is unpivoted to long
format driver-free with inline(array(struct...)).

Float-typed columns are rejected: their string casts are formatter-
dependent across engines (1e7 vs 10000000.0), which would break
cross-engine reproducibility — profile their bit patterns or quantized
forms instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all non-float atomic columns).

    Returns long-format rows (column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr, sum_len) where *_repr are CAST(col AS STRING)
    extremes and sum_len is the total cast string length.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            name
            for name, dt in schema.items()
            if not isinstance(dt, (DoubleType, FloatType))
        ]
    if not cols:
        raise ValueError("no profilable (non-float) columns in the frame")
    for c in cols:
        if isinstance(schema[c], (DoubleType, FloatType)):
            raise ValueError(
                f"column {c!r} is float-typed; cast/quantize it first "
                "(float string formatting is engine-dependent)"
            )
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"_rows_{c}"),
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"_nulls_{c}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"_ndv_{c}"),
            F.min(s).alias(f"_min_{c}"),
            F.max(s).alias(f"_max_{c}"),
            F.sum(F.coalesce(F.length(s), F.lit(0)).cast("long"))
            .cast("long")
            .alias(f"_len_{c}"),
        ]
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_rows_{c}").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_ndv_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_repr"),
                F.col(f"_max_{c}").alias("max_repr"),
                F.col(f"_len_{c}").alias("sum_len"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(structs).alias("_p")).select("_p.*")
