"""Bloom-filter build + probe as first-class relational operators —
the runtime-filter / semi-join-pruning pattern (engine surface; Spark
itself injects such filters under AQE, this makes the primitive
available to pipelines explicitly, e.g. "drop every lineitem row whose
order is not in this curated key set" without shuffling the big side).

Representation: a word-bucketed bitmap relation (word_idx, bits) with
32-bit words ORed into a BIGINT — at most ``n_bits / 32`` rows TOTAL
regardless of build-side size, so the filter is always broadcastable.
Bit positions are md5-derived (position j of key = hex slice [8j, 8j+8)
of one md5(key) digest mod n_bits for j < 4, salted digests beyond —
one string hash per key, not k), making the filter — and therefore its
exact false-positive set — bit-identical in DuckDB: the oracle checks
the bloom SEMANTICS (no false negatives, deterministic false
positives), not just row counts.

Scale design (100 TB):
- build: one explode (k rows per key) into a map-side-combined bit_or
  aggregate -> <= n_bits/32 rows. The shuffle carries word ids + masks.
- probe: k successive BROADCAST joins + bit-mask filters — the probe
  side NEVER shuffles; the plan stays narrow end-to-end, which is the
  entire point of a runtime filter (contrast with an exact semi-join,
  which shuffles both sides on the key).
- n_bits is the precision knob: size it at ~10 bits/key for ~1% fp.
  False positives only ever ADD candidate rows; correctness-critical
  consumers follow with the exact join on the (already tiny) candidate
  set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32


def _bit_pos(key: Column, j: int, n_bits: int) -> Column:
    """Position j of a key: hex chars [8j, 8j+8) of ONE md5(key) digest
    mod n_bits for j < 4 (one digest carries four 32-bit hashes; Catalyst
    evaluates the shared md5 once per row), salted digests beyond."""
    if j < 4:
        digest = F.substring(F.md5(key.cast("string")), 1 + 8 * j, 8)
    else:
        digest = F.substring(
            F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 8
        )
    return F.conv(digest, 16, 10).cast("long") % n_bits


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Bloom bitmap relation (word_idx, bits) over the distinct keys of
    ``df`` — at most ``n_bits / 32`` rows."""
    if n_bits % _WORD_BITS:
        raise ValueError(f"n_bits must be a multiple of 32, got {n_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col(key_col)
    pos = df.select(
        F.explode(
            F.array(*[_bit_pos(key, j, n_bits) for j in range(k)])
        ).alias("_p")
    )
    return pos.groupBy(
        (F.col("_p") / _WORD_BITS).cast("long").alias("word_idx")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_p % {_WORD_BITS} AS INT)))"
        ).alias("bits")
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Keep only rows of ``df`` whose key passes the bloom filter (all k
    bits set). Never false-negative; false positives are deterministic.

    The k membership tests are k broadcast joins — no shuffle of ``df``.
    """
    key = F.col(key_col)
    out = df
    for j in range(k):
        b = bloom.select(
            F.col("word_idx").alias(f"_w{j}"), F.col("bits").alias(f"_bits{j}")
        )
        pos = _bit_pos(key, j, n_bits)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_probe_p{j} % {_WORD_BITS} AS INT))"
        )
        out = (
            out.withColumn(f"_probe_p{j}", pos)
            .withColumn(f"_probe_w{j}", (F.col(f"_probe_p{j}") / _WORD_BITS).cast("long"))
            .join(
                F.broadcast(b),
                F.col(f"_probe_w{j}") == F.col(f"_w{j}"),
                "left",
            )
            .filter(
                (F.coalesce(F.col(f"_bits{j}"), F.lit(0)).bitwiseAND(mask))
                == mask
            )
            .drop(f"_probe_p{j}", f"_probe_w{j}", f"_w{j}", f"_bits{j}")
        )
    return out
