"""Entity-resolution invariants beyond the oracle hash check."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3bigdatasync_spark.operators import prepared
from s3bigdatasync_spark.operators.resolve import MAX_LEV, fuzzy_match_pairs


def test_fuzzy_match_full_recall(spark, sf_dir):
    """Every dirty record's own source shares its blocking key and is exactly
    one edit away, so the matcher must emit one row per part — a blocking
    scheme that loses its own source record would be silently broken."""
    out = fuzzy_match_pairs(spark, sf_dir).cache()
    n_parts = prepared(spark, sf_dir).table("part").count()
    assert out.count() == n_parts
    assert out.select("dirty_id").distinct().count() == n_parts


def test_fuzzy_match_distance_bounds(spark, sf_dir):
    """best_lev ∈ [0, MAX_LEV]: 0 only when the edit collides with another
    catalog name exactly; never above the refine threshold. A non-self match
    must never be farther than the self match (distance 1)."""
    rows = fuzzy_match_pairs(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["best_lev"] <= MAX_LEV
        if not r["self_match"]:
            # the self record is at distance exactly 1, so a winner that is
            # not the self record must be at distance <= 1 (ties go low-key)
            assert r["best_lev"] <= 1


def test_fuzzy_match_self_matches_dominate(spark, sf_dir):
    """On a catalog without systematic name twins the overwhelming share of
    dirty records must resolve back to their own source."""
    out = fuzzy_match_pairs(spark, sf_dir)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("self_match").cast("int")).alias("n_self"),
    ).collect()[0]
    assert agg["n_self"] / agg["n"] > 0.95


def test_qgram_prefix_blocking_full_recall(spark, sf_dir):
    """The Ed-Join prefix bound guarantees every dirty record's self pair
    (distance 1) survives blocking with NO structured attributes: one row
    per part, best_lev <= 1 for all of them."""
    from s3bigdatasync_spark.operators.resolve import fuzzy_match_qgram

    out = fuzzy_match_qgram(spark, sf_dir).cache()
    n_parts = prepared(spark, sf_dir).table("part").count()
    assert out.count() == n_parts
    assert out.filter(F.col("best_lev") > 1).count() == 0


def test_qgram_matches_are_superset_of_attribute_blocking(spark, sf_dir):
    """Attribute blocking can only LOSE candidates relative to the
    theorem-backed q-gram blocking (a cross-brand name twin falls outside
    every (brand,size) block), so per dirty record the q-gram candidate
    count must be >= the attribute-blocked count."""
    from s3bigdatasync_spark.operators.resolve import (
        fuzzy_match_pairs,
        fuzzy_match_qgram,
    )

    attr = {r["dirty_id"]: r["n_candidates"] for r in fuzzy_match_pairs(spark, sf_dir).collect()}
    qg = {r["dirty_id"]: r["n_candidates"] for r in fuzzy_match_qgram(spark, sf_dir).collect()}
    assert set(attr) == set(qg)
    assert all(qg[k] >= attr[k] for k in attr)


def test_segments_blocking_full_recall(spark, sf_dir):
    """Pass-Join pigeonhole: d edits cannot touch all d+1 segments, so every
    dirty record's self pair survives blocking — one row per part, best_lev
    <= 1 everywhere, on any data (including dense name dictionaries where
    gram rarity is meaningless)."""
    from s3bigdatasync_spark.operators.resolve import fuzzy_match_segments

    out = fuzzy_match_segments(spark, sf_dir).cache()
    n_parts = prepared(spark, sf_dir).table("part").count()
    assert out.count() == n_parts
    assert out.filter(F.col("best_lev") > 1).count() == 0


def test_qgram_and_segments_agree(spark, sf_dir):
    """Two independent blocking theorems (Ed-Join positional prefix,
    Pass-Join segments) feeding the same refine must produce the same
    verdicts — both have full recall for lev <= MAX_LEV, so any divergence
    means one of the blocking stages silently lost a true pair."""
    from s3bigdatasync_spark.operators.resolve import (
        fuzzy_match_qgram,
        fuzzy_match_segments,
    )

    a = sorted(tuple(r) for r in fuzzy_match_qgram(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in fuzzy_match_segments(spark, sf_dir).collect())
    assert a == b


def test_segment_layout_partitions_the_string(spark):
    """The closed-form (start, length) arithmetic must tile [1..L] exactly
    for every length — Pass-Join's recall proof assumes the segments
    partition the string with no gap or overlap."""
    from s3bigdatasync_spark.operators.resolve import NSEG, _seg_exprs

    st, ln = _seg_exprs("L", "i")
    rows = (
        spark.range(3, 101)
        .selectExpr("cast(id as int) AS L")
        .selectExpr("L", f"explode(sequence(0, {NSEG - 1})) AS i")
        .selectExpr("L", "i", f"{st} AS s", f"{ln} AS n")
        .collect()
    )
    by_l = {}
    for r in rows:
        by_l.setdefault(r["L"], []).append((r["i"], r["s"], r["n"]))
    for L, segs in by_l.items():
        segs.sort()
        assert segs[0][1] == 1
        assert sum(n for _, _, n in segs) == L
        for (_, s0, n0), (_, s1, _) in zip(segs, segs[1:]):
            assert s1 == s0 + n0
