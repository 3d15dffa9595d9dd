"""Semantic invariants of the round-3 operators — properties the row-hash
oracle can't state directly (the oracle proves Spark==DuckDB; these prove
both engines compute the RIGHT thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3bigdatasync_spark import registry
from s3bigdatasync_spark.operators import prepared
from s3bigdatasync_spark.operators.lifecycle import _CLASS_RANK, IA_MIN_BYTES

_Q = registry.full_queries()


def test_lifecycle_transitions_one_way_colder(spark, sf_dir):
    rows = _Q["lifecycle_transition_plan"](spark, sf_dir).collect()
    assert rows, "plan is empty — thresholds never fire on testdata"
    for r in rows:
        assert _CLASS_RANK[r["recommended_class"]] > _CLASS_RANK[r["current_class"]]
    # sub-minimum objects never transition: every moved object is >= 128 KiB,
    # so per-transition average size must clear the minimum
    for r in rows:
        assert r["total_bytes"] / r["n_objects"] >= IA_MIN_BYTES


def test_mpu_orphan_sweep_partitions_the_orphan_set(spark, sf_dir):
    out = _Q["mpu_orphan_sweep"](spark, sf_dir)
    n = out.agg(F.sum("n_objects")).collect()[0][0]
    expected = (
        prepared(spark, sf_dir)
        .table("inventory_src")
        .filter((F.col("is_multipart_uploaded") == "true") & (F.col("replication_status") == ""))
        .count()
    )
    assert n == expected  # the buckets tile the orphan set exactly


def test_bucket_skew_audit_tiles_inventory(spark, sf_dir):
    out = _Q["bucket_skew_audit"](spark, sf_dir)
    rows = out.collect()
    assert all(0 <= r["bucket"] < 32 for r in rows)
    total = sum(r["n_objects"] for r in rows)
    assert total == prepared(spark, sf_dir).table("inventory_src").count()
    # md5 bucketing of ~unique keys: no pathological emptiness at sf0.01
    assert len(rows) == 32


def test_dedup_canonical_tiles_docs_and_picks_members(spark, sf_dir):
    out = _Q["dedup_canonical"](spark, sf_dir)
    n_docs = spark.table("documents").count()
    assert out.agg(F.sum("n_members")).collect()[0][0] == n_docs
    # the canonical doc really belongs to its cluster
    clusters = _Q["dedup_clusters"](spark, sf_dir).select("doc_id", "cluster_id")
    bad = (
        out.join(
            clusters,
            (out.canonical_doc == clusters.doc_id) & (out.cluster_id == clusters.cluster_id),
            "left_anti",
        ).count()
    )
    assert bad == 0
    assert out.filter(F.col("tokens_dropped") < 0).count() == 0


def test_containment_is_asymmetric_and_bounded(spark, sf_dir):
    rows = _Q["containment_pairs"](spark, sf_dir).collect()
    assert rows, "no containment pairs at sf0.01 — threshold dead"
    for r in rows:
        assert r["contained_doc"] != r["container_doc"]
        assert 0.9 <= r["containment"] <= 1.0


def test_ann_recall_bounded(spark, sf_dir):
    r = _Q["ann_recall_audit"](spark, sf_dir).collect()[0]
    assert 0 <= r["n_overlap"] <= r["k"]
    assert 0.0 <= r["recall"] <= 1.0


def test_temperature_mix_flattens(spark, sf_dir):
    rows = _Q["temperature_mix_weights"](spark, sf_dir).collect()
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["nat_share"] for r in rows) - 1.0) < 1e-3
    # flattening: tempered shares sit BETWEEN natural and uniform — every
    # below-average source is boosted, every above-average source damped
    u = 1.0 / len(rows)
    for r in rows:
        if r["nat_share"] < u:
            assert r["temp_share"] >= r["nat_share"] - 1e-9
        elif r["nat_share"] > u:
            assert r["temp_share"] <= r["nat_share"] + 1e-9


def test_split_leakage_covers_holdout(spark, sf_dir):
    rows = {r["split"]: r for r in _Q["split_leakage_check"](spark, sf_dir).collect()}
    assert set(rows) == {"val", "test"}
    from s3bigdatasync_spark.operators.curation import _split_col

    docs = prepared(spark, sf_dir).table("documents")
    holdout = (
        docs.select(_split_col().alias("s")).filter(F.col("s") != "train").count()
    )
    assert sum(r["n_docs"] for r in rows.values()) == holdout
    for r in rows.values():
        assert 0 <= r["n_leaky"] <= r["n_docs"]
    # the near-dup-heavy testdata corpus must show real leakage (non-vacuous)
    assert sum(r["n_leaky"] for r in rows.values()) > 0
