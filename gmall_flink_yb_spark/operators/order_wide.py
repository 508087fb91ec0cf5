"""J1 interval join + J2 dimension enrichment + T3 order-fact ingest.

Reference (app/dwm/OrderWideApp.java):
- T3 (:49-62,71-79): parse OrderInfo/OrderDetail JSON; split create_time
  "yyyy-MM-dd HH:mm:ss" into create_date / create_hour; parse epoch create_ts.
- J1 (:89-97): keyed event-time interval join —
  ``orderInfo keyBy(id) ⋈ orderDetail keyBy(order_id)`` where
  ``detail.ts ∈ [info.ts - 5 s, info.ts + 5 s]``; merged into OrderWide
  (bean/OrderWide.java:55-88).
- J2 (:117-121 + DimUtil.java:11-37): per-record async Phoenix point lookups
  with a Redis cache. Spark-first replacement: PLANNED broadcast joins — the
  dim lookup becomes part of the query plan, so there is no per-row RPC, no
  cache layer, no thread pool (SURVEY.md §4.1). Intended dims per
  OrderWide.java:40-53 / OrderWideApp.java:102-114: user, province, sku, spu,
  trademark, category3.

Scale note: facts shuffle ONCE on the join key (AQE splits skewed keys); every
dim is broadcast (session.py sets a 64 MB threshold) so dim enrichment adds
zero shuffles regardless of how many dims are chained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_yb_spark.schemas import ORDER_DETAIL_SCHEMA, ORDER_INFO_SCHEMA


def parse_order_facts(
    info_raw: DataFrame, detail_raw: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """T3 — JSON strings -> typed order_info / order_detail with derived
    create_date, create_hour, create_ts (OrderWideApp.java:53-59).

    Uses to_timestamp/to_date/date_format instead of the reference's string
    split + SimpleDateFormat — same values, all codegen'd.
    """

    def derive(df: DataFrame) -> DataFrame:
        ct = F.to_timestamp("create_time", "yyyy-MM-dd HH:mm:ss")
        return (
            df.withColumn("create_ts", ct)
            .withColumn("create_date", F.to_date(ct))
            .withColumn("create_hour", F.date_format(ct, "HH"))
        )

    info = derive(
        info_raw.select(
            F.from_json(F.col(value_col), ORDER_INFO_SCHEMA).alias("o")
        ).select("o.*")
    )
    detail = derive(
        detail_raw.select(
            F.from_json(F.col(value_col), ORDER_DETAIL_SCHEMA).alias("d")
        ).select("d.*")
    )
    return info, detail


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float = -5.0,
    upper_seconds: float = 5.0,
    how: str = "inner",
    skew_guard: bool = False,
) -> DataFrame:
    """J1 — equi-join + event-time range predicate
    (right.ts BETWEEN left.ts + lower AND left.ts + upper).

    Matches Flink's ``intervalJoin(...).between(Time.seconds(-5),
    Time.seconds(5))`` (OrderWideApp.java:91). In batch Catalyst plans the
    equi-part as the join condition (hash join, one shuffle each side) and the
    range as a post-join filter; in streaming the same expression with
    watermarks on both sides gives bounded state.

    ``skew_guard`` (batch + inner only; streaming frames can't run the
    plan-time sample job, and outer sides would be duplicated by
    replication): sample the RIGHT side's hottest-key share and, above
    1/shuffle_partitions, salt the right side and replicate the left over
    the computed bucket count — same range predicate, each hot key spread
    over ``buckets`` tasks (VERDICT r5 #3). The fired route is exposed as
    ``_skew_salt_buckets`` on the result (None = plain).
    """
    # cast NTZ timestamps through TimestampType first (session TZ is UTC)
    lts = F.col(f"l.{left_ts}").cast("timestamp").cast("double")
    rts = F.col(f"r.{right_ts}").cast("timestamp").cast("double")
    range_cond = (rts >= lts + F.lit(lower_seconds)) & (
        rts <= lts + F.lit(upper_seconds)
    )
    if skew_guard and how == "inner" and not right.isStreaming:
        from gmall_flink_yb_spark.operators import skew as _skew

        parts = int(
            right.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        _, share = _skew.top_key_share(right, right_key)
        if share > 1.0 / parts:
            buckets = _skew.salt_buckets_for(share, parts)
            r = right.withColumn(
                "_salt_r", (F.rand(seed=42) * buckets).cast("int")
            )
            lft = left.withColumn(
                "_salt_l",
                F.explode(F.array(*[F.lit(i) for i in range(buckets)])),
            )
            cond = (
                (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
                & (F.col("l._salt_l") == F.col("r._salt_r"))
                & range_cond
            )
            out = (
                lft.alias("l")
                .join(r.alias("r"), cond, how)
                .drop("_salt_l", "_salt_r")
            )
            out._skew_salt_buckets = buckets
            return out
    cond = (F.col(f"l.{left_key}") == F.col(f"r.{right_key}")) & range_cond
    out = left.alias("l").join(right.alias("r"), cond, how)
    out._skew_salt_buckets = None
    return out


def enrich_dims(
    facts: DataFrame,
    dims: list[tuple[DataFrame, str, str, list[str] | None]],
    how: str = "left",
    strategy: str = "broadcast",
    skew_guard: bool = True,
) -> DataFrame:
    """J2 — chain dimension joins against the fact stream.

    ``dims``: list of (dim_df, fact_key_col, dim_key_col, keep_cols). The
    planned-join replacement for the reference's DimAsyncFunction + Redis
    cache (DimAsyncFunction.java:46-72, DimUtil.java:11-37). keep_cols=None
    keeps every non-key dim column.

    ``strategy`` is the size-fallback knob (SURVEY §4.2): "broadcast" for
    dims that fit executor memory (every gmall dim does — zero shuffles on
    the fact side); "shuffle_hash" for dims too big to broadcast but small
    enough to hash (one shuffle each side, no sort); "auto" to leave the
    choice to Catalyst/AQE size estimates.

    ``skew_guard`` (shuffle_hash only — broadcast joins never shuffle the
    fact side, so a hot key costs nothing there): sample each fact key's
    hottest-key share at plan time and route that dim through
    ``skew.salted_join`` when it exceeds 1/shuffle_partitions — the point
    where AQE's partition splitting stops helping because the skew sits in
    ONE key (VERDICT r5 #3; the reference's exposure is a bot device on
    keyBy(mid), BaseLogApp.java:74). Detection samples the ORIGINAL fact
    frame, so it only applies to keys present on ``facts`` itself;
    snowflake second-hop keys (arriving via an earlier dim) are dim-shaped
    and skipped. Fired routes are recorded on the result as
    ``_skew_salted_dims`` ({fact_key: buckets}).
    """
    if strategy not in ("broadcast", "shuffle_hash", "auto"):
        raise ValueError(f"unknown join strategy {strategy!r}")
    from gmall_flink_yb_spark.operators import skew as _skew

    skew_guard = skew_guard and not facts.isStreaming  # no plan-time
    # sample job on a streaming frame; streaming dim joins broadcast
    parts = (
        int(facts.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        if strategy == "shuffle_hash" and skew_guard
        else None
    )
    fired: dict[str, int] = {}
    out = facts
    for dim_df, fact_key, dim_key, keep in dims:
        d = dim_df
        if keep is not None:
            d = d.select(dim_key, *keep)
        d = d.withColumnRenamed(dim_key, f"__dimkey_{fact_key}")
        if (
            strategy == "shuffle_hash"
            and skew_guard
            and fact_key in facts.columns
        ):
            _, share = _skew.top_key_share(facts, fact_key)
            if share > 1.0 / parts:
                buckets = _skew.salt_buckets_for(share, parts)
                out = _skew.salted_join(
                    out, d, fact_key, f"__dimkey_{fact_key}",
                    buckets=buckets, how=how,
                )
                fired[fact_key] = buckets
                continue
        if strategy == "broadcast":
            d = F.broadcast(d)
        elif strategy == "shuffle_hash":
            d = d.hint("shuffle_hash")
        out = out.join(
            d, out[fact_key] == d[f"__dimkey_{fact_key}"], how
        ).drop(f"__dimkey_{fact_key}")
    out._skew_salted_dims = fired
    return out
