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

Round-10 wall-clock surgery: the registry-wide sweep no longer builds every
query a THIRD time here — query construction is the expensive part (model
training, boundary collects), and tests/test_queries_oracle.py already
builds each query at both scales. The invariant assertions now ride those
builds (`assert_plan_hygiene`, called on every DataFrame the oracle sweep
is about to execute, at BOTH sf0.01 and sf0.001), so coverage is identical
and the suite pays one construction instead of two. This module keeps the
helper + a canary test so the invariant stays impossible to drop silently:
the canary fails if the oracle sweep ever stops calling the helper.
"""

from __future__ import annotations

_FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def assert_plan_hygiene(df, name: str) -> None:
    """Registry-wide physical-plan invariants; call on a built DataFrame."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in _FORBIDDEN:
        assert node not in plan, f"{name} plans a {node}"


def test_oracle_sweep_carries_the_hygiene_pin():
    """The sweep-rider contract: test_queries_oracle must invoke
    assert_plan_hygiene on every query it builds. Checked textually so a
    refactor that silently drops the call fails HERE with a pointer."""
    from pathlib import Path

    src = Path(__file__).with_name("test_queries_oracle.py").read_text()
    assert "assert_plan_hygiene" in src, (
        "test_queries_oracle.py no longer runs the plan-hygiene pin; either "
        "restore the call or revive the standalone parametrized sweep"
    )


def test_helper_rejects_bad_plans():
    """The helper itself must fire on each forbidden node. Exercised on a
    plan-string stub: Catalyst broadcasts any tiny crossJoin into a
    BroadcastNestedLoopJoin, so a REAL in-session cartesian small enough
    for a unit test is exactly what the planner refuses to build."""
    import pytest

    class _Stub:
        def __init__(self, plan: str):
            self._plan = plan
            self._jdf = self

        def queryExecution(self):
            return self

        def executedPlan(self):
            return self

        def toString(self):
            return self._plan

    for node in _FORBIDDEN:
        with pytest.raises(AssertionError, match=node):
            assert_plan_hygiene(_Stub(f"*(1) {node}\n+- Scan"), "bad")
    assert_plan_hygiene(_Stub("*(1) HashAggregate\n+- Scan"), "good")
