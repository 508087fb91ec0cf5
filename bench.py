"""Benchmark harness (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed through the noop sink so every output column is
materialized (a bare count() would let Catalyst prune the plan).

Artifact-capture note (VERDICT r04 #7): the driver records only the LAST
~2000 chars of stdout and json-parses the final line. Full query names sum
to 1,773 chars, so a 110-entry map keyed by full names can NEVER fit — the
final printed line therefore keys ``queries`` by deterministic short keys
(digit-bearing tokens kept whole, other tokens truncated to 2 chars,
``x``-suffixed on collision; worst-case line ~1.8 KB). The short->full
legend is written to ``BENCH_KEYS.json`` and the complete full-name results
(timings + per-run samples + metadata) to ``BENCH_FULL.json``, both at the
repo root, and the full-name JSON line is also printed to stdout just
before the final line for redundancy.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_yb_spark.functions.cacheutil import release_cache
from gmall_flink_yb_spark.queries import QUERIES
from gmall_flink_yb_spark.session import get_spark

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))

# tide canary sizing: big enough that mmap (not the allocator's free
# lists) serves the buffer and per-page fault cost dominates timer
# noise, small enough to stay trivial next to the box's 128 GB
_TIDE_PROBE_BYTES = 256 * 1024 * 1024


def tide_probe() -> dict[str, float]:
    """Memory-path canary (VERDICT r11 #1): measure the two host paths
    the r10/r11 tide diagnostics identified as the drifting variable —
    page-fault-in of freshly mapped anonymous memory, and steady-state
    copies between already-faulted buffers — so every bench artifact
    records the environment it ran in. Healthy r10-quiet readings were
    ~5.5-6.4 GB/s on the copy path; the loaded r11 windows read
    1.1-1.5 GB/s on both paths (BASELINE.md round-11/12 notes).

    Convention: GB/s = bytes TOUCHED (fault path: region size; copy
    path: bytes copied per ``copyto``) / wall seconds, decimal GB. Both
    256 MB numpy buffers are freshly ``np.empty``-allocated (above the
    glibc mmap threshold, so pages are new mappings and the first touch
    faults through the host), touched one byte per 4 KB page for the
    fault number, then copied twice for the steady-state number."""
    import numpy as np

    size = _TIDE_PROBE_BYTES

    def _measure() -> dict[str, float]:
        t0 = time.perf_counter()
        a = np.empty(size, dtype=np.uint8)
        a[::4096] = 1
        fault_s = time.perf_counter() - t0
        b = np.empty(size, dtype=np.uint8)
        b[::4096] = 1  # pre-fault the destination too
        t0 = time.perf_counter()
        np.copyto(b, a)
        np.copyto(a, b)
        copy_s = time.perf_counter() - t0
        # CPU leg (r12 drift watch): the memory legs alone proved
        # insufficient — a memory-healthy window still carried a ~13%
        # single-thread wall-clock floor shift (BASELINE.md round-12
        # drift watch). sha256 over an already-faulted 128 MB slice is
        # single-thread, cache-resident C code: pure cycles-available,
        # no memory-path confound. Reference reading 1.26-1.31 GB/s in
        # the r12 watch window (which itself ran ~1.13x the r8-quiet
        # single-thread floor — no quieter baseline exists to cite);
        # interpret future readings relative to that band.
        import hashlib

        t0 = time.perf_counter()
        hashlib.sha256(memoryview(a)[: size // 2]).digest()
        sha_s = time.perf_counter() - t0
        del a, b
        return {
            "fault_in_gbps": round(size / fault_s / 1e9, 2),
            "copy_gbps": round(2 * size / copy_s / 1e9, 2),
            "cpu_sha_gbps": round((size // 2) / sha_s / 1e9, 2),
        }

    # a process's FIRST full-size probe pays ~100x one-off setup even
    # in a healthy window (measured: 0.05-0.07 GB/s fault-in where the
    # immediate second probe reads ~5; a 16 MB warm-up does not clear
    # it) — run the body twice, record the steady second; a genuinely
    # loaded window stays slow on every repeat (r11 read 1.1-1.5 GB/s
    # persistently), so the discard cannot mask real tide
    _measure()
    return _measure()


def short_keys(names: list[str]) -> dict[str, str]:
    """Deterministic full->short query-name map for the final stdout line.

    Per underscore-token: tokens containing a digit are kept whole (q22,
    7d, int8 stay recognizable), others truncate to their first 2 chars;
    tokens are joined without separators and the joined key is capped at
    5 chars (r9: at 119 queries the un-capped worst-case line outgrew the
    driver's 2000-char tail; cross-round per-query comparison goes through
    the full names in each round's BENCH_KEYS.json legend, not the short
    keys). Collisions gain ``x`` suffixes in registry order, so the map is
    stable under appends. The inverse legend ships in BENCH_KEYS.json.
    """
    out: dict[str, str] = {}
    used: set[str] = set()
    for name in names:
        s = "".join(
            t if any(c.isdigit() for c in t) else t[:2]
            for t in name.split("_")
        )[:5]
        while s in used:
            s += "x"
        used.add(s)
        out[name] = s
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(
        "gmall-bench",
        # keep stdout clean: stage-progress \r spam shares the driver's
        # 2000-char tail with the JSON result lines
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query times measure the
    # queries, not session startup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # warm the Python workers too (daemon fork + pandas/numpy import is a
    # one-time ~10 s cost across 32 workers, not a property of any query)
    spark.range(1024).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # median-of-N per query (default 3): this box carries background load
    # that swings single runs 3-8x; the median is a robust, regression-
    # detectable estimate (best-of-N hides slowdowns that hit most runs).
    # The cache is cleared before every repeat so a query's own persist()
    # calls re-materialize each time — every repeat is a full cold-cache
    # execution; the median only removes load-spike noise.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    tide_pre = tide_probe()
    # mid-run canary (r12): a pre/post-only canary misses a tide dip in
    # the MIDDLE of the sweep — measured: a run with healthy endpoint
    # canaries carried two contiguous registry stretches of 2-3.4x
    # slowdowns on code-untouched queries (OPTIMIZATION_r12.md). Probe
    # every _TIDE_MID_EVERY queries; the readings go into
    # BENCH_FULL.json only (the driver-parsed tail line keeps its fixed
    # 6-float pre/post contract).
    tide_mid: list[dict[str, float]] = []
    _TIDE_MID_EVERY = 30
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for qi, (name, fn) in enumerate(QUERIES.items()):
        if qi and qi % _TIDE_MID_EVERY == 0:
            tide_mid.append({"after_query_index": qi, **tide_probe()})
        samples: list[float] = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink materializes EVERY column (count() would let
            # Catalyst prune the projections and under-report)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            release_cache(df)  # builder-owned persists, freed per repeat
        timings[name] = round(statistics.median(samples), 3)
        spreads[name] = [round(s, 3) for s in sorted(samples)]

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs_per_query": runs,
        "estimator": "median",
        "samples": spreads,
        # environment canary (VERDICT r11 #1): totals are comparable
        # across rounds only when both artifacts' canary bands overlap
        # the healthy reference band (BASELINE.md round-12); otherwise
        # compare per-query minima against the per-query history
        "tide": {"pre": tide_pre, "mid": tide_mid, "post": tide_probe()},
    }
    legend = short_keys(list(timings))
    try:
        with open(os.path.join(_REPO_ROOT, "BENCH_FULL.json"), "w") as f:
            json.dump(full, f, indent=1)
        with open(os.path.join(_REPO_ROOT, "BENCH_KEYS.json"), "w") as f:
            json.dump({v: k for k, v in legend.items()}, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout lines still carry everything
    # full-name line first (recoverable from full stdout / logs) ...
    print(json.dumps(full))
    # ... then the final, tail-sized line the driver parses: same contract
    # keys, queries keyed short (legend in BENCH_KEYS.json / line above;
    # no in-line legend pointer — at 118 queries the tail budget needs
    # those bytes for the values themselves), 2-decimal values
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                # compact canary [pre_fault, pre_copy, pre_sha,
                # post_fault, post_copy, post_sha] GB/s — ~70 B, fits
                # the ~2000-char tail budget (full-line form at 119
                # queries is 1559 B); the labeled form lives in
                # BENCH_FULL.json
                "tide": [
                    full["tide"]["pre"]["fault_in_gbps"],
                    full["tide"]["pre"]["copy_gbps"],
                    full["tide"]["pre"]["cpu_sha_gbps"],
                    full["tide"]["post"]["fault_in_gbps"],
                    full["tide"]["post"]["copy_gbps"],
                    full["tide"]["post"]["cpu_sha_gbps"],
                ],
                "queries": {legend[k]: round(v, 2) for k, v in timings.items()},
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
