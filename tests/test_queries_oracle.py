"""Differential test: every registered query vs its DuckDB oracle at sf0.01 —
the same comparison the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from s3bigdatasync_spark import registry

from .oracle_utils import assert_match
from .test_plan_hygiene import assert_plan_hygiene

_QUERIES = registry.full_queries()
_ORACLES = registry.full_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    # plan-hygiene rider (see test_plan_hygiene.py): the invariants are
    # checked on the SAME DataFrame this sweep executes, so the suite pays
    # one query construction, not two
    assert_plan_hygiene(df, name)
    if name in _ORACLES:
        assert_match(df, _ORACLES[name], sf_dir)
    else:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops


@pytest.mark.parametrize(
    "name", [n for n in sorted(_QUERIES) if not n.startswith("pack_")]
)
def test_query_matches_oracle_sf0001(spark, name):
    """Second-scale sweep: the same differential comparison at sf0.001.

    A constant tuned against one dataset (a threshold that happens to split,
    a fixture-dependent branch) can pass the sf0.01 hash by accident; holding
    the match at a second scale pins the SEMANTICS, not the numbers. Cheap
    (600-row tables), and it exercises every operator's small-corpus paths —
    single-partition inputs, empty categories, sub-vocabulary token sets.

    Packs are excluded HERE only (durations surgery, round 10): every pack
    MEMBER is individually compared at both scales by these two sweeps, and
    a pack is nothing but the static generated unpivot of its members —
    both engines' reshapes derive from the same _MEMBER_COLS spec, so the
    reshape's correctness is scale-independent and already pinned at sf0.01
    (the driver's scale). Running the 14 pack oracles a second time re-ran
    every heavy member CTE in DuckDB for ~2 suite-minutes of zero new
    coverage."""
    sf = "/root/testdata/sf0.001"
    df = _QUERIES[name](spark, sf)
    assert_plan_hygiene(df, name)  # hygiene at the second scale too — free
    if name in _ORACLES:
        assert_match(df, _ORACLES[name], sf)
    else:
        assert df.count() >= 0
