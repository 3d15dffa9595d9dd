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


def test_partition_count_tracks_input(spark):
    """with_global_order's default range-partition count must scale with the
    input instead of a fixed constant: max(input partitions, shuffle
    partitions) — at 100x data the scan partition count grows with file
    splits and the per-partition sort stays bounded."""
    from s3bigdatasync_spark.operators.prefix import with_global_order

    from s3bigdatasync_spark.operators.prefix import _scaled_partitions

    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    small = spark.range(1000).withColumnRenamed("id", "k").repartition(4)
    assert _scaled_partitions(small) == shuffle  # floor: never below shuffle

    wide = spark.range(10000).withColumnRenamed("id", "k").repartition(shuffle * 2)
    assert _scaled_partitions(wide) == shuffle * 2  # tracks a wider input

    # and the chosen N reaches the range partitioner (explicit-N
    # repartitionByRange is exempt from AQE coalescing, so the split is real)
    from pyspark.sql import functions as F

    n_pids = (
        wide.repartitionByRange(_scaled_partitions(wide), "k")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert n_pids == shuffle * 2


def test_manifest_path_matches_self_discovery(spark, tmp_path):
    """with_global_order(ranges=manifest) over a range-clustered table must
    equal the self-discovering path bit-for-bit — and skip the boundary job."""
    from s3bigdatasync_spark.operators.prefix import collect_range_manifest

    df = _mk(spark, 2000, seed=11)
    path = str(tmp_path / "ranged")
    df.repartitionByRange(8, "key").write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)

    manifest = collect_range_manifest(back, ["key"], sum_col="size")
    assert 1 < len(manifest) <= 8
    assert sum(c for _, c, _ in manifest) == 2000

    via_manifest = with_global_order(back, ["key"], sum_col="size", ranges=manifest)
    via_discovery = with_global_order(back, ["key"], sum_col="size")
    a = sorted(map(tuple, via_manifest.collect()))
    b = sorted(map(tuple, via_discovery.collect()))
    assert a == b


def test_manifest_coalesces_to_max_ranges(spark, tmp_path):
    from s3bigdatasync_spark.operators.prefix import collect_range_manifest

    df = _mk(spark, 500, seed=12)
    path = str(tmp_path / "ranged16")
    df.repartitionByRange(16, "key").write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    m = collect_range_manifest(back, ["key"], sum_col="size", max_ranges=4)
    assert len(m) <= 4
    assert sum(c for _, c, _ in m) == 500
    got = with_global_order(back, ["key"], sum_col="size", ranges=m)
    ref = with_global_order(back, ["key"], sum_col="size")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_manifest_rejects_unclustered_table(spark, tmp_path):
    """A hash- (not range-) written table has overlapping file key ranges —
    the manifest must refuse rather than emit wrong offsets."""
    import pytest as _pytest

    from s3bigdatasync_spark.operators.prefix import collect_range_manifest

    df = _mk(spark, 2000, seed=13)
    path = str(tmp_path / "hashed")
    df.repartition(8).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    with _pytest.raises(ValueError, match="not range-clustered"):
        collect_range_manifest(back, ["key"], sum_col="size")


def test_null_order_key_raises(spark):
    """ADVICE r3: a NULL order key used to TypeError in the driver-side
    boundary comparison (or silently land in range 0). Must fail loudly,
    from the existing stats job — no extra pass."""
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("c", 3)], "key string, size long"
    )
    with pytest.raises(ValueError, match="non-null"):
        with_global_order(df, ["key"], sum_col="size")
    # multi-column keys: NULL in ANY order column is rejected
    df2 = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 3)], "key string, size long"
    )
    with pytest.raises(ValueError, match="non-null"):
        with_global_order(df2, ["key", "size"])
