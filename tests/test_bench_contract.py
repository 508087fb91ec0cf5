"""The driver records only the last ~2000 chars of stdout and json-parses
the final line (observed: BENCH_r01 parsed at 1120 chars; r02-r04 with
longer lines recorded ``parsed: null``). These tests pin the guarantees
``bench.py`` relies on so registry growth can't silently push the final
line back over the cliff (VERDICT r04 #7)."""

from __future__ import annotations

import json

from bench import short_keys
from gmall_flink_yb_spark.queries import QUERIES

DRIVER_TAIL_CHARS = 2000


def test_short_keys_unique_and_deterministic():
    names = list(QUERIES)
    a = short_keys(names)
    b = short_keys(names)
    assert a == b
    assert len(set(a.values())) == len(names)
    # stable under append: existing names keep their short forms
    c = short_keys(names + ["brand_new_query_name_r99"])
    assert all(c[n] == a[n] for n in names)


def test_final_bench_line_fits_driver_tail():
    legend = short_keys(list(QUERIES))
    # worst-case value widths: 6 chars (e.g. 123.45) per query; the
    # tide canary (r12) adds 4 GB/s readings
    line = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": 12345.67,
            "unit": "sec",
            "sf": 0.1,
            "tide": [12.34, 12.34, 12.34, 12.34, 12.34, 12.34],
            "queries": {legend[k]: 123.45 for k in QUERIES},
        },
        separators=(",", ":"),
    )
    assert len(line) < DRIVER_TAIL_CHARS - 100, (
        f"final bench line would be {len(line)} chars; the driver tail "
        f"keeps {DRIVER_TAIL_CHARS} — shorten keys or values"
    )
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(QUERIES)
