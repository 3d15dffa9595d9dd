"""Property test: collapse_runs (gaps-and-islands primitive behind
snapshot_history / retention_sweep) vs an independent row-at-a-time Python
reference, over hypothesis-generated version relations — including
duplicate listings, same-version etag conflicts, presence gaps, and
delete/recreate chains the fixture-based tests can't enumerate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from s3bigdatasync_spark.operators.timeline import collapse_runs

KEYS = ["k1", "k2", "k3"]
ETAGS = ["a", "b"]


def _reference(rows):
    """Row-at-a-time replay of the documented rules: dedupe (key, v, etag)
    keeping min size; per key walk (v, etag)-sorted entries; a run breaks on
    etag change OR non-consecutive v; run size is the min over members."""
    dedup: dict[tuple, int] = {}
    for k, v, e, s in rows:
        key = (k, v, e)
        dedup[key] = min(dedup.get(key, s), s)
    out = []
    by_key: dict[str, list] = {}
    for (k, v, e), s in dedup.items():
        by_key.setdefault(k, []).append((v, e, s))
    for k, entries in by_key.items():
        entries.sort()
        run_id = 0
        cur = None  # (run_id, etag, v_from, v_to, size)
        prev_v, prev_e = None, None
        for v, e, s in entries:
            if prev_e is None or e != prev_e or v != prev_v + 1:
                if cur:
                    out.append((k,) + cur)
                run_id += 1
                cur = (run_id, e, v, v, s)
            else:
                cur = (cur[0], cur[1], cur[2], v, min(cur[4], s))
            prev_v, prev_e = v, e
        if cur:
            out.append((k,) + cur)
    return sorted(out)


@st.composite
def relations(draw):
    n = draw(st.integers(min_value=0, max_value=14))
    return [
        (
            draw(st.sampled_from(KEYS)),
            draw(st.integers(min_value=1, max_value=6)),
            draw(st.sampled_from(ETAGS)),
            draw(st.integers(min_value=1, max_value=50)),
        )
        for _ in range(n)
    ]


@settings(max_examples=25, deadline=None)
@given(relations())
def test_collapse_runs_matches_reference(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "key string, v int, etag string, size long")
    got = sorted(
        (r["key"], r["run_id"], r["etag"], r["v_from"], r["v_to"], r["size"])
        for r in collapse_runs(df).collect()
    )
    assert got == _reference(rows)
