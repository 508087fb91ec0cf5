"""Parametric tests of the ``n_blocks="auto"`` derivation (VERDICT r11
#8): the r11 parallelism floor was measured at this box's parallelism
(32) but the formula must hold at any cluster size — these pin the
three claims (pair-coverage of the floor, the ceil(n/128) tiny-corpus
bound, memory-bound dominance at scale) as pure arithmetic, no Spark
session needed.
"""

from __future__ import annotations

import math

import pytest

from gmall_flink_yb_spark.functions.similarity import _auto_block_count

TARGET = 2048  # cosine_near_dup_pairs' default target_block_rows


@pytest.mark.parametrize("par", [1, 4, 32, 256, 2048])
@pytest.mark.parametrize("n_rows", [1, 100, 2_000, 50_000, 500_000])
def test_floor_covers_parallelism(par, n_rows):
    """Whenever the tiny-corpus bound does not bind (the corpus has at
    least 128 rows per floor block) and the 256 cap is not hit, the
    derived k yields k(k+1)/2 block-pair groups >= parallelism — every
    core gets a group even when one block would fit in memory."""
    k = _auto_block_count(n_rows, TARGET, par)
    assert 1 <= k <= 256
    par_blocks = math.ceil((math.sqrt(8 * par + 1) - 1) / 2)
    if n_rows >= 128 * par_blocks and k < 256:
        assert k * (k + 1) // 2 >= par


@pytest.mark.parametrize("par", [4, 32, 256])
def test_tiny_corpus_never_fragments(par):
    """Below ~128 rows per block the floor is bounded by ceil(n/128):
    a 100-row corpus stays at 1 block however wide the cluster."""
    for n_rows in (1, 50, 100, 128, 256, 1024):
        k = _auto_block_count(n_rows, TARGET, par)
        # the memory bound is 1 here (n << TARGET), so any excess over
        # ceil(n/128) could only come from an unbounded floor
        assert k <= max(1, math.ceil(n_rows / 128))


@pytest.mark.parametrize("par", [4, 32, 256])
def test_memory_bound_dominates_at_scale(par):
    """At large n the derivation equals the memory bound (floor inert),
    and past 256 * TARGET rows the 256 cap binds regardless of
    parallelism."""
    for n_rows in (100_000, 500_000):
        mem = math.ceil(n_rows / TARGET)
        assert _auto_block_count(n_rows, TARGET, par) == max(
            mem, _auto_block_count(n_rows, TARGET, par)
        )
        if mem >= math.ceil((math.sqrt(8 * par + 1) - 1) / 2):
            assert _auto_block_count(n_rows, TARGET, par) == min(256, mem)
    assert _auto_block_count(257 * TARGET, TARGET, par) == 256
    assert _auto_block_count(10_000_000, TARGET, par) == 256


def test_measured_r11_point():
    """The r11 adjudicated fix point: 2000 vectors on a 32-way box used
    to derive 1 block (single python group); the floor now derives >= 4
    (k(k+1)/2 >= 32 needs k >= 8, bounded by ceil(2000/128) = 16)."""
    k = _auto_block_count(2_000, TARGET, 32)
    assert k * (k + 1) // 2 >= 32
    assert k == 8  # smallest k with k(k+1)/2 = 36 >= 32
