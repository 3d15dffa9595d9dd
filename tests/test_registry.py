"""Registry invariants: the driver-facing view must stay within the external
driver's 50-entry budget while covering every individual query's semantics
(directly or via a pack), and pack specs must stay consistent."""

from s3bigdatasync_spark import registry
from s3bigdatasync_spark.operators import packs

DRIVER_CAP = registry.DRIVER_CAP


def test_driver_registry_within_cap():
    q = registry.all_queries()
    assert len(q) <= DRIVER_CAP
    # every driver entry is oracle-checked (no rows-only checks remain)
    o = registry.all_oracles()
    assert set(o) <= set(q)
    assert {n for n in q if n not in o} == set()


def test_etag_queries_in_driver_window():
    """The multipart-ETag family (the §2 surface's one custom UDF) must carry
    a driver row — it was silently capped out in r04/r05."""
    q = registry.all_queries()
    assert "etag_props" in q
    assert "multipart_etag" in q


def test_oversized_registry_raises(monkeypatch):
    """An overflow past the driver cap must fail loudly at the entry point,
    naming the entries the driver would drop — never ship silently again."""
    import pytest

    monkeypatch.setattr(registry, "DRIVER_CAP", 10)
    with pytest.raises(AssertionError, match="cap 10"):
        registry.all_queries()


def test_every_query_driver_checked():
    """Each individual query is either its own driver entry or a pack member."""
    driver = set(registry.all_queries())
    individual = {n for n in registry.full_queries() if not n.startswith("pack_")}
    uncovered = {n for n in individual if n not in driver and n not in packs.PACK_MEMBERS}
    assert not uncovered, uncovered


def test_extension_queries_lead_the_ordering():
    """The 18 r01-unchecked queries must come first (cap insurance)."""
    names = list(registry.all_queries())
    assert names.index("order_priority_trend") < names.index("pack_ops_stats")
    assert names.index("salted_hot_key_agg") == 0


def test_round3_entries_precede_older_packs():
    """Forward-ordering discipline (VERDICT r2 item 7): each round's NEW
    driver entries insert ahead of the previous rounds' packs, so a tighter
    driver cap can never silently drop the newest work. Round 3's additions
    travel in pack_r3, which must lead the pack block."""
    names = list(registry.all_queries())
    r3 = names.index("pack_r3")
    for older in (
        "pack_ops_stats",
        "pack_time_extrema",
        "pack_ann",
        "pack_dedup_pairs",
        "pack_fingerprints",
        "pack_text_quality",
        "pack_media",
    ):
        assert r3 < names.index(older), older
    # and the round-3 operators are all driver-checked via pack_r3
    for member in packs.PACK_SPECS["pack_r3"]:
        assert member in packs.PACK_MEMBERS


def test_round4_entries_precede_older_packs():
    """Round 4's additions travel in pack_r4, which must lead the pack block
    (ahead of pack_r3 and everything older)."""
    names = list(registry.all_queries())
    r4 = names.index("pack_r4")
    for older in (
        "pack_r3",
        "pack_ops_stats",
        "pack_time_extrema",
        "pack_ann",
        "pack_dedup_pairs",
        "pack_fingerprints",
        "pack_text_quality",
        "pack_media",
    ):
        assert r4 < names.index(older), older
    for member in packs.PACK_SPECS["pack_r4"]:
        assert member in packs.PACK_MEMBERS
    # compaction_plan must stay individually visible this round to prove the
    # oracle-type fix (VERDICT r3 item 7) — do not fold it into a pack yet
    assert "compaction_plan" in names


def test_round6_entries_precede_older_packs():
    """Round 6's additions travel in pack_r6, which must lead the pack block."""
    names = list(registry.all_queries())
    r6 = names.index("pack_r6")
    for older in (
        "pack_r4",
        "pack_r3",
        "pack_ops_stats",
        "pack_time_extrema",
        "pack_ann",
        "pack_dedup_pairs",
        "pack_fingerprints",
        "pack_text_quality",
        "pack_media",
    ):
        assert r6 < names.index(older), older
    for member in packs.PACK_SPECS["pack_r6"]:
        assert member in packs.PACK_MEMBERS


def test_pack_specs_consistent():
    for pack, members in packs.PACK_SPECS.items():
        for m in members:
            assert m in packs._MEMBER_Q, (pack, m)
            assert m in packs._MEMBER_O, (pack, m)  # members must be oracle-checked
            assert m in packs._MEMBER_COLS, (pack, m)


def test_pack_member_cols_match_schema(sf_dir):
    """The static reshape spec must track each member's actual schema —
    validated against the ORACLE side (DuckDB LIMIT 0: column names + types
    with zero rows computed). Durations surgery (round 10): the old
    Spark-side sweep re-CONSTRUCTED all 133 member plans (model training
    included) for 54 s; the DuckDB describe costs milliseconds per member,
    and the Spark side cannot drift silently anyway — a _MEMBER_COLS column
    absent from the Spark schema makes the pack query itself fail to
    resolve, which the pack oracle tests catch."""
    from tests.oracle_utils import duck_connect

    o = registry.full_oracles()
    con = duck_connect(sf_dir)
    kind_of = {
        "VARCHAR": "str",
        "BOOLEAN": "bool",
        "DOUBLE": "num",
        "FLOAT": "num",
    }
    for member, spec in packs._MEMBER_COLS.items():
        rel = con.sql(f"SELECT * FROM ({o[member]}) LIMIT 0")
        dtypes = list(zip(rel.columns, [str(t) for t in rel.types]))
        assert [c for c, _ in spec] == [c for c, _ in dtypes], member
        for (c, kind), (_, dt) in zip(spec, dtypes):
            expected = kind_of.get(dt, "int")
            assert kind == expected, (member, c, kind, dt)


def test_doc_counts_match_registry():
    """README.md and the registry docstring state the inventory sizes; pin
    them to the live registry so they can never go stale again (VERDICT r4/r5
    item: '139/144/8 packs' remnants). All pins are whitespace-insensitive
    (VERDICT r7 item 1: a prose reflow must never redden the suite)."""
    import re
    from pathlib import Path

    def pin(text, phrase):
        # Match the phrase with any run of whitespace (incl. newlines)
        # wherever the phrase has a space, so line re-wraps can't break it.
        pat = r"\s+".join(re.escape(w) for w in phrase.split())
        assert re.search(pat, text), phrase

    full = registry.full_queries()
    n_full = len(full)
    n_packs = len(packs.PACK_SPECS)
    n_members = sum(len(v) for v in packs.PACK_SPECS.values())
    n_individual = n_full - n_packs
    readme = Path(__file__).resolve().parent.parent.joinpath("README.md").read_text()
    pin(readme, f"{n_individual} individual contract queries")
    pin(readme, f"so {n_members} small queries fold into {n_packs} \"packs\"")
    pin(readme, f"{n_full} entries)")
    doc = registry.__doc__
    pin(doc, f"{n_members} small, individually-proven queries")
    pin(doc, f"({n_full} entries)")
    cov = Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").read_text()
    pin(cov, f"{n_members} small, individually-proven queries into {n_packs} packs")
    pin(cov, f"`registry.full_queries()` ({n_full} entries)")
    pin(cov, f"all {n_members} folded members")


def test_coverage_pack_table_matches_specs():
    """COVERAGE.md's pack-membership table must list exactly PACK_SPECS'
    members, in order — the pack_r6 row went stale in round 6 when members
    were added incrementally; derive the expectation instead."""
    from pathlib import Path

    cov = Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").read_text()
    for pack, members in packs.PACK_SPECS.items():
        expected = f"| {pack} | {', '.join(members)} |"
        assert expected in cov, expected
