"""Streaming state-size stress for the applyInPandasWithState operators
(VERDICT r04 #8 / r05 #4): how do ``correct_is_new_stream`` and
``detect_bounce_stream`` behave when a micro-batch carries MILLIONS of
distinct keys, and where is the knee past which the default
HDFS-backed in-heap state store stops being viable?

Method. For each key count N: generate two single-file parquet batches
(batch 1 creates N fresh key states; batch 2 revisits the same N keys
with later timestamps — for bounce that also advances the watermark past
every pending timer, firing N event-time timeouts). Drive the operator
with a file source (maxFilesPerTrigger=1, mtime-ordered) into a noop
sink, then read per-batch wall-clock and state-store telemetry straight
from StreamingQuery.recentProgress: ``stateOperators[0].numRowsTotal``,
``memoryUsedBytes``, batchDuration. Output: one JSON line per (operator,
N, batch) plus a summary with bytes/key.

Reading the knee. The HDFSBackedStateStoreProvider keeps each loaded
state-map version in EXECUTOR HEAP; per-key cost is measured below
(~300-400 B/key for these one-number states, dominated by UnsafeRow +
map overhead, not the payload). At K keys the store needs ~K * bytes/key
* retained_versions in heap PER STATE PARTITION set — independent of
throughput. Against this box's 128 GiB single JVM the in-heap store
holds 10M keys comfortably (~3-4 GB); on a real cluster budget ~0.4 GB
heap per 1M keys per executor and switch to the RocksDB state store
(``spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider``)
once per-executor state exceeds a few GB — RocksDB spills to local SSD
and bounds heap at the block-cache size. The OPERATOR cost is linear
(one python-group call per key per batch); it's the store residency that
sets the knee.

Usage: python tools/bench_state.py [--keys 100000,1000000,10000000]
       [--ops isnew,bounce] [--out /tmp/spark_graft_state]
       [--state-store hdfs|rocksdb]

--state-store exercises the session knob (session.get_spark(state_store=...),
VERDICT r6 #3): "rocksdb" runs the same workload under
RocksDBStateStoreProvider — state on local disk, heap bounded by the block
cache — the backend a real cluster switches to once per-executor state
crosses a few GB. Rows carry the backend name for BASELINE.md comparison.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmall_flink_yb_spark.session import get_spark  # noqa: E402
from gmall_flink_yb_spark.streaming.stateful import (  # noqa: E402
    correct_is_new_stream,
    detect_bounce_stream,
)

SCHEMA = "mid string, ts timestamp, is_new string, is_entry boolean"


def _gen_batches(spark, root: str, n_keys: int) -> str:
    """Two mtime-ordered single-file batches over the same n_keys devices.
    Batch 2 sits 60 s later so every bounce timer (10 s window) fires."""
    d = os.path.join(root, f"in_{n_keys}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    base = 1_700_000_000
    for i, t0 in enumerate((base, base + 60)):
        df = spark.range(n_keys).select(
            F.concat(F.lit("m"), F.col("id")).alias("mid"),
            F.timestamp_seconds(
                F.lit(t0) + (F.col("id") % 7) / 10.0
            ).alias("ts"),
            F.lit("1").alias("is_new"),
            F.lit(True).alias("is_entry"),
        )
        tmp = os.path.join(d, f"b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"{i:02d}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i * 100, base + i * 100))
    return d


def _drive(spark, op: str, src_dir: str, ckpt: str) -> list[dict]:
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*.parquet")
    )
    if op == "isnew":
        out = correct_is_new_stream(stream, "mid", "ts", "is_new")
    else:
        out = detect_bounce_stream(
            stream.withWatermark("ts", "1 second"), "mid", "ts", "is_entry", 10
        )
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    rows = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        if not so:
            continue
        rows.append(
            {
                "batch": p["batchId"],
                "input_rows": p.get("numInputRows", 0),
                "batch_s": round(
                    (p.get("durationMs") or {}).get("triggerExecution", 0)
                    / 1000.0,
                    2,
                ),
                "state_rows": so.get("numRowsTotal"),
                "state_mb": round(
                    (so.get("memoryUsedBytes") or 0) / 1e6, 1
                ),
            }
        )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="100000,1000000,10000000")
    ap.add_argument("--ops", default="isnew,bounce")
    ap.add_argument("--out", default="/tmp/spark_graft_state")
    ap.add_argument("--state-store", default="hdfs",
                    choices=("hdfs", "rocksdb", "ab"),
                    help="'ab' interleaves hdfs/rocksdb runs in ONE "
                    "session (VERDICT r8 #6: the r6 HDFS numbers were "
                    "taken on a loaded box; interleaving settles the "
                    "wall comparison under one load regime) — "
                    "providerClass is a runtime conf read at stream "
                    "start, each run gets a fresh checkpoint")
    ap.add_argument("--ab-rounds", type=int, default=2,
                    help="A/B pairs per (op, key-count); adjudicate "
                    "min-of-N per backend")
    args = ap.parse_args()
    key_counts = [int(k) for k in args.keys.split(",")]
    ops = args.ops.split(",")
    from gmall_flink_yb_spark.session import STATE_STORE_PROVIDERS

    if args.state_store == "ab":
        backends = ["hdfs", "rocksdb"] * args.ab_rounds
    else:
        backends = [args.state_store]
    spark = get_spark(
        "bench-state",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
        state_store=backends[0],
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in key_counts:
        src = _gen_batches(spark, args.out, n)
        for op in ops:
            for run_i, backend in enumerate(backends):
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass",
                    STATE_STORE_PROVIDERS[backend],
                )
                ckpt = os.path.join(
                    args.out, f"ckpt_{op}_{n}_{backend}_{run_i}"
                )
                shutil.rmtree(ckpt, ignore_errors=True)
                t0 = time.time()
                rows = _drive(spark, op, src, ckpt)
                wall = round(time.time() - t0, 1)
                for r in rows:
                    bpk = (
                        round(1e6 * r["state_mb"] / r["state_rows"], 1)
                        if r["state_rows"]
                        else None
                    )
                    rec = {"op": op, "store": backend, "run": run_i,
                           "n_keys": n, **r, "bytes_per_key": bpk}
                    results.append(rec)
                    print(json.dumps(rec), flush=True)
                print(
                    json.dumps({"op": op, "store": backend, "run": run_i,
                                "n_keys": n, "wall_s": wall}),
                    flush=True,
                )
                shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)
    with open(os.path.join(args.out, "bench_state.json"), "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
