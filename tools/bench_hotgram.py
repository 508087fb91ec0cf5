"""Hot-gram stress for the span-removal occurrence count (VERDICT r7 #1).

The scenario: a universal boilerplate sentence ("all rights reserved ...")
opens EVERY document, so each of its n-grams occurs once per document —
at corpus scale that is the corpus-bounded sort partition the plain
occurrence window funnels through ONE task. This harness builds that
corpus deliberately: --replicas x the sf0.1 documents table with
per-replica word salting (organic dup structure scales 1:1, cross-replica
grams disjoint — the bench_scale discipline), then an UNSALTED
--boiler-tokens-token boilerplate prepended to every document, giving
(boiler_tokens - n + 1) all-corpus-hot grams.

Timed (min over --runs, noop sink):

  window   dup_span_rows(hot_gram_guard=False) — the single-pass count
           window; hot grams sort through single tasks
  hybrid   dup_span_rows(hot_gram_guard=True) — profiled-hot grams count
           via two-phase salted agg + broadcast semi-join, cold remainder
           keeps the window

Equality of the two answers is pytest-asserted
(tests/test_ngrams_chunking.py); this measures only the plans. Prints one
JSON line. Run ONE heavy bench at a time on this box, and size
SPARK_DRIVER_MEM for large --replicas (96g at 1000x).

Run: python tools/bench_hotgram.py [--replicas 100] [--boiler-tokens 30]
     [--runs 3] [--shuffle-partitions N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.ngrams import dup_span_rows
from gmall_flink_yb_spark.session import get_spark
from gmall_flink_yb_spark.sources.readers import read_table

ID_STRIDE = 10_000_000
BOILER_WORDS = (
    "all rights reserved by the original author and publisher of this "
    "work no part of this publication may be reproduced distributed or "
    "transmitted in any form or by any means without the prior written "
    "permission of the publisher"
).split()


def build_corpus(spark, sf_dir: str, out_dir: str, replicas: int,
                 boiler_tokens: int) -> str:
    base = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = " ".join(
        BOILER_WORDS[i % len(BOILER_WORDS)] for i in range(boiler_tokens)
    )
    reps = spark.range(replicas).select(F.col("id").alias("_rep"))
    corpus = base.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("_rep") * ID_STRIDE).alias("doc_id"),
        F.concat(
            F.lit(boiler + " "),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"([a-zA-Z0-9]+)"),
                F.concat(F.lit("$1s"), F.col("_rep").cast("string")),
            ),
        ).alias("text"),
    )
    dest = os.path.join(out_dir, "hotgram")
    corpus.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dest, "documents.parquet")
    )
    return dest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--boiler-tokens", type=int, default=30)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_hotgram")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(
        "bench-hotgram", shuffle_partitions=args.shuffle_partitions
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus_dir = build_corpus(
        spark, args.sf_dir, args.out, args.replicas, args.boiler_tokens
    )
    if args.shuffle_partitions is None:
        # data-sized parallelism (VERDICT r7 #3): no hand-passed knob
        from gmall_flink_yb_spark.tuning import (
            GRAM_EXPANSION,
            size_shuffle_partitions,
        )

        size_shuffle_partitions(
            spark,
            os.path.join(corpus_dir, "documents.parquet"),
            expansion=GRAM_EXPANSION,
        )
    docs = read_table(spark, corpus_dir, "documents")
    n_docs = docs.count()

    out: dict = {
        "replicas": args.replicas,
        "docs": n_docs,
        "boiler_tokens": args.boiler_tokens,
        "hot_grams": args.boiler_tokens - args.n + 1,
        "shuffle_partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")
        ),
    }
    for mode, guard in (("window", False), ("hybrid", True)):
        samples = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.time()
            dup_span_rows(
                docs, "doc_id", "text", n=args.n, hot_gram_guard=guard
            ).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 2))
        out[mode] = min(samples)
        print(f"# {mode}: min {out[mode]:.2f}s {samples}", file=sys.stderr)
    out["speedup"] = round(out["window"] / out["hybrid"], 2)
    print(json.dumps(out))
    spark.stop()
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
