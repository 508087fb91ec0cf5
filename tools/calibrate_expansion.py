"""Measure per-operator-family shuffle expansion constants (VERDICT r8 #3).

The sizing rule in ``gmall_flink_yb_spark/tuning.py`` derives shuffle
partitions as ``scan_bytes x EXPANSION / 64 MB``; the EXPANSION constant is
a property of the operator FAMILY (how many post-shuffle bytes one scanned
byte turns into). ``GRAM_EXPANSION`` was reverse-derived from the measured
1000x partition crossover; this tool measures each family's expansion
DIRECTLY — total shuffle WRITE bytes of the representative operator divided
by its corpus's parquet bytes — via the Spark UI stage metrics (the session
here enables the UI; production sessions keep it off).

Usage:
    python tools/calibrate_expansion.py [--sf-dir /root/testdata/sf0.1]
        [--replicas 100] [--out /tmp/calib_corpora] [--family gram,...]

Prints one line per family: measured shuffle bytes, scan bytes, ratio.
Calibration rows go to BASELINE.md; the rounded-up constants live in
tuning.py (SHINGLE_EXPANSION, VECTOR_EXPANSION; GRAM_EXPANSION keeps its
partition-crossover calibration and this tool's row is its cross-check).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmall_flink_yb_spark.session import get_spark  # noqa: E402
from gmall_flink_yb_spark.tuning import estimate_parquet_bytes  # noqa: E402


def _shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle write bytes across all completed stages, via the
    UI REST API (requires spark.ui.enabled=true on this session)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in stages
        if s.get("status") in ("COMPLETE", "SKIPPED")
    )


def measure(spark, label: str, scan_bytes: int, run) -> dict:
    before = _shuffle_write_bytes(spark)
    run()
    delta = _shuffle_write_bytes(spark) - before
    ratio = delta / scan_bytes if scan_bytes else float("nan")
    row = {
        "family": label,
        "shuffle_write_bytes": int(delta),
        "scan_bytes": int(scan_bytes),
        "expansion": round(ratio, 2),
    }
    print(json.dumps(row))
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--out", default="/tmp/calib_corpora")
    ap.add_argument("--family", default="gram,shingle,vector")
    args = ap.parse_args()

    import tools.bench_scale as bs

    bs.REPLICAS = args.replicas

    spark = get_spark(
        "calibrate-expansion", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    families = set(args.family.split(","))

    if families & {"gram", "shingle"}:
        _, docs_dir = bs.build_corpora(spark, args.sf_dir, args.out)
        docs_path = os.path.join(docs_dir, "documents.parquet")
        docs_bytes = estimate_parquet_bytes(spark, docs_path)
        docs = spark.read.parquet(docs_path)

        if "gram" in families:
            from gmall_flink_yb_spark.functions.ngrams import dup_span_rows

            measure(
                spark, "gram(dup_span_rows)", docs_bytes,
                lambda: dup_span_rows(
                    docs, "doc_id", "text", n=8, auto_partitions=False
                ).count(),
            )
        if "shingle" in families:
            from gmall_flink_yb_spark.functions.dedup import minhash_lsh_pairs

            measure(
                spark, "shingle(minhash_lsh_pairs)", docs_bytes,
                lambda: minhash_lsh_pairs(
                    docs, "doc_id", "text", auto_partitions=False
                ).count(),
            )

    if "vector" in families:
        _, emb_dir = bs.build_embedding_corpora(spark, args.sf_dir, args.out)
        emb_path = os.path.join(emb_dir, "embeddings.parquet")
        emb_bytes = estimate_parquet_bytes(spark, emb_path)
        emb = spark.read.parquet(emb_path)

        def run_ann():
            df = bs._ann_incremental_stage(emb, "auto")
            df.count()
            from gmall_flink_yb_spark.functions.cacheutil import release_cache

            release_cache(df)

        measure(spark, "vector(ann_incremental_auto)", emb_bytes, run_ann)

    spark.stop()


if __name__ == "__main__":
    main()
