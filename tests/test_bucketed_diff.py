"""Scale-claim proof: with both inventories bucketed by `key`, the flagship
full-outer diff plans with ZERO shuffle exchanges — the layout a 100 TB
deployment writes its inventory snapshots in (README scale notes / joins.py
docstring). This test makes that claim executable instead of rhetorical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    src = spark.table("inventory_src").select("key", "size", "etag")
    dst = spark.table("inventory_dst").select("key", "size", "etag")
    for name, df in [("inv_src_b", src), ("inv_dst_b", dst)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "key")
            .sortBy("key")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    yield "inv_src_b", "inv_dst_b"
    for name in ("inv_src_b", "inv_dst_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_diff_is_shuffle_free(spark, bucketed_tables):
    src_t, dst_t = bucketed_tables
    src = spark.table(src_t).select(
        "key", F.col("size").alias("src_size"), F.col("etag").alias("src_etag")
    )
    dst = spark.table(dst_t).select(
        "key", F.col("size").alias("dst_size"), F.col("etag").alias("dst_etag")
    )
    diff = (
        src.join(dst, "key", "full_outer")
        .withColumn(
            "variance",
            F.when(F.col("dst_etag").isNull(), "New")
            .when(F.col("src_etag").isNull(), "Delete")
            .when(
                (F.col("src_etag") != F.col("dst_etag"))
                | (F.col("src_size") != F.col("dst_size")),
                "Update",
            )
            .otherwise("Same"),
        )
        .filter(F.col("variance") != "Same")
    )
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    # and it still computes the same classes as the shuffled path
    classes = {r["variance"] for r in diff.select("variance").distinct().collect()}
    assert classes == {"New", "Delete", "Update"}
