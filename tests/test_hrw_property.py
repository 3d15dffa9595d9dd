"""Property tests for the rendezvous-hash math behind shard_rebalance_plan
(`operators/layout.py`), replayed in pure Python over hypothesis-generated
key sets — the md5/struct-argmax contract both engines execute, checked
against the two theorems the operator's value rests on:

  1. Stability: growing the fleet N→M moves a key only TO a worker in
     [N, M) — never between two old workers (the first N weights are
     identical in both maps, so the argmax can change only if a newcomer
     wins).
  2. Uniform load in expectation: each worker's weight is an iid hash, so
     assignment is exchangeable across workers (spot-checked as a loose
     balance bound, not a distributional test).
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


def _hrw(key: str, n: int) -> int:
    """argmax over workers of (md5(key ':' s), s) — ties (never observed)
    to the higher s, the exact struct-max contract of `_hrw_spark`/`_hrw_sql`."""
    return max(
        range(n),
        key=lambda s: (hashlib.md5(f"{key}:{s}".encode()).hexdigest(), s),
    )


keys = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=40,
    ),
    min_size=1,
    max_size=200,
    unique=True,
)


@settings(max_examples=50, deadline=None)
@given(keys=keys, n=st.integers(1, 12), grow=st.integers(1, 8))
def test_rendezvous_moves_only_to_new_workers(keys, n, grow):
    m = n + grow
    for k in keys:
        old, new = _hrw(k, n), _hrw(k, m)
        if old != new:
            assert n <= new < m, (k, old, new)


@settings(max_examples=50, deadline=None)
@given(keys=keys, n=st.integers(1, 12), shrink=st.integers(0, 8))
def test_rendezvous_shrink_rehomes_only_lost_workers(keys, n, shrink):
    """The inverse direction: removing workers moves ONLY the keys that
    lived on a removed worker; every other key keeps its assignment."""
    m = max(1, n - shrink)
    for k in keys:
        old, new = _hrw(k, n), _hrw(k, m)
        if old < m:
            assert new == old, (k, old, new)


@settings(max_examples=20, deadline=None)
@given(n=st.integers(2, 10))
def test_rendezvous_assignment_is_total_and_deterministic(n):
    ks = [f"key-{i}" for i in range(300)]
    a1 = [_hrw(k, n) for k in ks]
    a2 = [_hrw(k, n) for k in ks]
    assert a1 == a2
    assert all(0 <= s < n for s in a1)
    # loose balance bound: no worker owns two-thirds of 300 keys at n>=2
    # (expected max at n=2 is 150 ± binomial noise — this is a sanity
    # bound against systematic skew, not a distributional test)
    from collections import Counter

    assert max(Counter(a1).values()) <= 200
