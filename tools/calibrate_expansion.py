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

    if "hashindex" in families:
        # HASH_INDEX_EXPANSION (VERDICT r9 #3 — the one unmeasured
        # constant): how many shuffle bytes one PERSISTED-INDEX parquet
        # byte costs when the incremental span scrub probes it (the
        # index side re-distincts and semi-joins on gh). Measured as a
        # MARGINAL: the same 1x incoming batch probes indexes grown from
        # two corpus tiers, and the delta in shuffle-write bytes over
        # the delta in index bytes isolates the index side's expansion —
        # the incoming batch's own gram stream is identical in both runs
        # and cancels.
        from gmall_flink_yb_spark.functions.cacheutil import release_cache
        from gmall_flink_yb_spark.functions.ngrams import (
            _gram_positions,
            incremental_span_scrub,
        )
        from gmall_flink_yb_spark.sources.readers import read_table

        incoming = read_table(spark, args.sf_dir, "documents")
        tiers = sorted({max(1, args.replicas // 5), args.replicas})
        points = []
        for t in tiers:
            bs.REPLICAS = t
            _, docs_dir_t = bs.build_corpora(
                spark, args.sf_dir, os.path.join(args.out, f"hx{t}")
            )
            corpus_t = spark.read.parquet(
                os.path.join(docs_dir_t, "documents.parquet")
            )
            idx_path = os.path.join(args.out, f"gram_index_{t}.parquet")
            (
                _gram_positions(corpus_t, "doc_id", "text", 8)
                .select("gh")
                .distinct()
                .write.mode("overwrite")
                .parquet(idx_path)
            )
            idx_bytes = estimate_parquet_bytes(spark, idx_path)
            seen = spark.read.parquet(idx_path)

            def run_probe():
                cleaned, _grams = incremental_span_scrub(
                    seen, incoming, "doc_id", "text", n=8,
                    auto_partitions=False,
                )
                # noop sink, NOT count(): count on the cleaned frame lets
                # Catalyst eliminate the whole left-join dup subtree
                # (unique-keyed right side, no columns referenced) and the
                # index is never even scanned — measured 0-byte "probes"
                cleaned.write.format("noop").mode("overwrite").save()
                release_cache(cleaned)

            row = measure(
                spark, f"hashindex(span_scrub_probe@r{t})", idx_bytes,
                run_probe,
            )
            points.append((idx_bytes, row["shuffle_write_bytes"]))
        if len(points) == 2:
            (b1, s1), (b2, s2) = points
            marg = (s2 - s1) / (b2 - b1) if b2 > b1 else float("nan")
            print(json.dumps({
                "family": "hashindex(marginal)",
                "delta_index_bytes": int(b2 - b1),
                "delta_shuffle_bytes": int(s2 - s1),
                "expansion": round(marg, 2),
            }))

    spark.stop()


if __name__ == "__main__":
    main()
