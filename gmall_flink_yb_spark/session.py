"""SparkSession factory.

The reference pins ``env.setParallelism(1)`` in every job
(gmall-realtime/.../app/dwd/BaseLogApp.java:36 et al.) and leaves checkpointing
commented out. We instead size for a real cluster: AQE on (runtime shuffle
coalescing + skew-join splitting replaces the reference's hand-tuned
parallelism), broadcast threshold generous enough that every gmall dim table
(user/province/sku/spu/trademark/category3 — all small) broadcasts, and Arrow
enabled so any Pandas-UDF fallback is batch-vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Streaming state backends (VERDICT r6 #3). The reference carries a
# commented-out FsStateBackend/RocksDB block in every app
# (BaseLogApp.java:38-46); Spark's equivalents:
#  - "hdfs": HDFSBackedStateStoreProvider (default) keeps every loaded
#    state-map version in EXECUTOR HEAP — measured at ~200 B/key for the
#    is_new/bounce states (BASELINE.md round-6 stress), fine to ~10M
#    keys/executor.
#  - "rocksdb": RocksDBStateStoreProvider spills state to local SSD and
#    bounds heap at the block-cache size — switch once per-executor state
#    crosses a few GB. changelogCheckpointing ships deltas instead of
#    full SST uploads per commit.
STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "gmall_flink_yb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for both local tests and scale.

    On a real cluster, drop ``master`` and let the submitter decide; the conf
    below is sized so the same logical plans survive a 100x scale-up:
    AQE re-sizes shuffles at runtime, skewed keys are split, and small dims
    are broadcast instead of shuffled.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # STATIC estimate-based broadcasts are OFF (-1): the planner's
        # size estimate for an explode/join-derived frame is its scan size,
        # which under-counts a shingle explosion ~100x — at a 100x corpus
        # the static planner happily broadcast a multi-GB inverted index
        # and died in BroadcastExchange (found by tools/bench_scale.py
        # --replicas 100). Dims still broadcast via their explicit
        # F.broadcast() hints, and AQE re-introduces broadcast joins from
        # RUNTIME sizes (adaptive threshold below) — truly-small sides get
        # broadcast, estimate-garbage sides never do.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 128 MB splits: good parquet scan granularity at 100 TB
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata events.ts is parquet TIMESTAMP(NANOS) which Spark
        # cannot read natively — read as long ns and convert in the reader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # newer Spark 4 otherwise reads naive parquet timestamps as NTZ;
        # keep LTZ semantics everywhere (see sources/readers._ensure_read_confs)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # record the session's pre-ratchet shuffle parallelism so the
    # auto-sizing hooks floor against the BASE, not the live value
    # (VERDICT r9 #4; no-op if already stamped — getOrCreate may have
    # returned an existing session)
    from gmall_flink_yb_spark.tuning import session_base_partitions

    session_base_partitions(spark)
    if state_store is not None:
        if state_store not in STATE_STORE_PROVIDERS:
            raise ValueError(
                f"unknown state_store {state_store!r}; "
                f"one of {sorted(STATE_STORE_PROVIDERS)}"
            )
        # providerClass is a RUNTIME conf read at stream start, so set it
        # on the session (getOrCreate may have returned a pre-existing
        # one, where builder confs are silently ignored). It applies to
        # streams started AFTER this call; an existing checkpoint keeps
        # the provider it was created with.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            STATE_STORE_PROVIDERS[state_store],
        )
    return spark
