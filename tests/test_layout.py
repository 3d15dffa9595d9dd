"""operators.layout: Z-order clustering must actually enable 2-D file
skipping, and the Bloom semi-join must never drop a true positive."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3bigdatasync_spark.operators import prepared
from s3bigdatasync_spark.operators.layout import bloom_semi_prune, zorder_layout


def _overlap_fraction(files, lo_size, hi_size, lo_day, hi_day):
    """Fraction of files whose [min,max] stats overlap the 2-D predicate —
    exactly the skipping decision a parquet reader makes from footer stats."""
    hit = [
        f
        for f in files
        if f["max_size"] >= lo_size
        and f["min_size"] <= hi_size
        and f["max_day"] >= lo_day
        and f["min_day"] <= hi_day
    ]
    return len(hit) / len(files)


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    files = zorder_layout(spark, sf_dir).collect()
    assert len(files) > 50  # granular enough that skipping is meaningful

    # reference layout: same file count, data sorted by mtime only
    inv = prepared(spark, sf_dir).table("inventory_src")
    day = (F.col("last_modified").cast("long") / 86400).cast("long")
    n_files = len(files)
    linear = (
        inv.select("size", day.alias("day"))
        .withColumn("f", F.ntile(n_files).over(__import__("pyspark").sql.Window.orderBy("day", "size")))
        .groupBy("f")
        .agg(
            F.min("size").alias("min_size"),
            F.max("size").alias("max_size"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
        .collect()
    )

    # a selective predicate on size ALONE (the dimension the linear layout
    # does NOT cluster): small objects, ~1% of the size range
    stats = inv.agg(F.min("size"), F.max("size"), F.expr("min(cast(last_modified as long)) div 86400")).first()
    lo_s, hi_s = stats[0], stats[0] + (stats[1] - stats[0]) // 100
    z_frac = _overlap_fraction(files, lo_s, hi_s, -(10**9), 10**9)
    lin_frac = _overlap_fraction(linear, lo_s, hi_s, -(10**9), 10**9)
    # date-sorted files all span the size range -> no skipping; z-order skips
    assert lin_frac > 0.9
    assert z_frac < 0.5 * lin_frac

    # and a 2-D predicate (size band x one week) prunes hard under z-order
    lo_d = stats[2]
    z2 = _overlap_fraction(files, lo_s, hi_s, lo_d, lo_d + 7)
    assert z2 < 0.25


def test_bloom_admits_every_changed_key(spark, sf_dir):
    """Bloom filters may emit false positives but NEVER false negatives —
    n_candidates >= n_changed, and the reported FP accounting is exact."""
    row = bloom_semi_prune(spark, sf_dir).first()
    assert row["n_candidates"] >= row["n_changed"] > 0
    assert row["n_false_positives"] == row["n_candidates"] - row["n_changed"]
    # with m=2^16 and k=3 at this scale the filter must actually filter:
    # candidates are a small fraction of the unchanged population
    assert row["n_false_positives"] < 0.2 * (row["n_total"] - row["n_changed"])
