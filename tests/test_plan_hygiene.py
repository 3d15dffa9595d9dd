"""Sweeping physical-plan hygiene pins over EVERY registry query.

Two invariants that must hold engine-wide, not just on the hand-audited
headline plans in PLANS.md:

  * No CartesianProduct: every cross join in the engine is a deliberate
    1-row/128-row broadcast (BroadcastNestedLoopJoin), never an n×m
    shuffle-side cartesian. A cartesian sneaking into any plan is the
    classic silent 100 TB killer.
  * No BatchEvalPython: zero row-at-a-time Python UDFs anywhere. Python
    only ever enters via Arrow (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas), which is the 10-100× faster batch path.

Building a query's DataFrame is enough to get its executed plan; queries
with driver-side training state (kmeans, PQ, IVF) legitimately run a few
tiny jobs during construction — that cost is the test's price for covering
all of them.
"""

from __future__ import annotations

import pytest

from s3bigdatasync_spark import registry

_Q = registry.full_queries()


@pytest.mark.parametrize("name", sorted(_Q))
def test_no_cartesian_no_row_python(spark, sf_dir, name):
    df = _Q[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time Python UDF"
