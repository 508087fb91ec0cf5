"""Registry-wide physical-plan audit: the scale anti-patterns, asserted
over EVERY registered query, not just the hand-picked ones in
test_plans.py.

Two properties are non-negotiable at 100 TB and cheap to check on every
plan (explain only — no execution):

- no ``CartesianProduct``: an unconstrained pair join is quadratic in
  input no matter how fast each task is. 1-row/model-sized cross joins
  plan as BroadcastNestedLoopJoin and stay legal.
- no ``BatchEvalPython``: a row-at-a-time Python UDF serializes every row
  through pickle one by one; Arrow paths (ArrowEvalPython, MapInPandas,
  FlatMapGroupsInPandas) are the sanctioned Python escape hatches.

A new query added to the registry gets audited here automatically — the
failure mode this kills is the one where a convenience lambda or a
forgotten join condition ships inside an otherwise-green query.
"""

from __future__ import annotations

import pytest

from gmall_flink_yb_spark.plans.inspect import _simple_plan
from gmall_flink_yb_spark.queries import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_python(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = _simple_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
