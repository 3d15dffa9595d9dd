"""operators.prefix: the distributed global-order primitives must be
bitwise-equal to single-partition window references — on adversarial shapes
(duplicates in the sum column, skewed sizes, tiny inputs, n < tiles)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from s3bigdatasync_spark.operators.prefix import with_global_ntile, with_global_order


def _mk(spark, n, seed, max_size=10**9):
    rnd = random.Random(seed)
    rows = [(f"k{rnd.randrange(10**12):012d}-{i}", rnd.randrange(max_size)) for i in range(n)]
    return spark.createDataFrame(rows, "key string, size long")


@pytest.mark.parametrize("n,seed", [(1, 0), (7, 1), (100, 2), (1000, 3), (4096, 4)])
def test_global_order_matches_reference(spark, n, seed):
    df = _mk(spark, n, seed).cache()
    got = with_global_order(df, ["key"], sum_col="size")
    w = Window.orderBy("key")
    ref = df.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "cum_ex",
        F.sum("size").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - F.col("size"),
    )
    bad = (
        got.join(ref, "key")
        .filter(
            (F.col("global_rn") != F.col("rn"))
            | (F.col("global_cumsum_ex") != F.col("cum_ex"))
        )
        .count()
    )
    assert bad == 0
    df.unpersist()


@pytest.mark.parametrize("n,k,seed", [(3, 10, 5), (10, 10, 6), (101, 7, 7), (1000, 13, 8)])
def test_global_ntile_matches_reference(spark, n, k, seed):
    df = _mk(spark, n, seed).cache()
    got = with_global_ntile(df, ["size", "key"], k)
    ref = df.withColumn("nt", F.ntile(k).over(Window.orderBy("size", "key")))
    bad = got.join(ref, "key").filter(F.col("tile") != F.col("nt")).count()
    assert bad == 0
    df.unpersist()
