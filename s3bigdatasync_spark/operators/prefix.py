"""Distributed global ordering primitives — the two-phase pattern as a
first-class reusable operator.

Global row numbers / prefix sums / ntile over a total order are the classic
"needs one partition" traps (Spark's bare `Window.orderBy` serializes the
whole dataset through one task). The scalable equivalent, used by
task_batches, size_capped_take, size_deciles and compaction_plan:

  1. repartitionByRange on the order columns (cache-pinned: the range
     partitioner SAMPLES, and a second action would re-sample different
     boundaries — the correctness trap this module exists to encapsulate);
  2. per-partition local rank / running sum (parallel windows keyed by pid);
  3. per-partition counts/totals → exclusive offsets — a ≤#partitions-row
     driver list, broadcast back.

Results are bitwise-identical to the single-partition window (rank and sum
are associative over the range-ordered concatenation), which every consumer's
DuckDB oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _scaled_partitions(df: DataFrame) -> int:
    """Range-partition count that tracks input scale: the max of the input's
    current partition count and spark.sql.shuffle.partitions. At 100× data the
    scan partition count grows with file splits, so the per-partition sort
    window stays bounded instead of each of a fixed 32 ranges holding GBs."""
    shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(df.rdd.getNumPartitions(), shuffle)


def with_global_order(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return df plus `global_rn` (0-based dense global row number over
    order_cols, which must form a unique order) and, if sum_col is given,
    `global_cumsum_ex` (exclusive prefix sum of sum_col in that order).

    The returned DataFrame is cache-backed (boundary pinning); callers that
    materialize it twice reuse the cache rather than re-sampling ranges.
    """
    parted = (
        df.repartitionByRange(num_partitions or _scaled_partitions(df), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    aggs = [F.count("*").alias("_c")]
    if sum_col is not None:
        # coalesce: a partition whose sum_col values are all NULL must
        # contribute 0 to the running offset, not poison the driver-side sum
        aggs.append(F.coalesce(F.sum(sum_col), F.lit(0)).alias("_t"))
    stats = {r["_pid"]: r for r in parted.groupBy("_pid").agg(*aggs).collect()}
    rows, rn_acc, sum_acc = [], 0, 0
    for pid in sorted(stats):
        rows.append((pid, rn_acc, sum_acc))
        rn_acc += stats[pid]["_c"]
        sum_acc += stats[pid]["_t"] if sum_col is not None else 0
    off = parted.sparkSession.createDataFrame(
        rows, "_pid int, _rn_off long, _sum_off long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parted.withColumn("_lrn", F.row_number().over(w) - 1)
        .join(F.broadcast(off), "_pid")
        .withColumn("global_rn", F.col("_rn_off") + F.col("_lrn"))
    )
    if sum_col is not None:
        w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            "global_cumsum_ex",
            F.col("_sum_off") + F.sum(sum_col).over(w_sum) - F.col(sum_col),
        )
    return out.drop("_pid", "_lrn", "_rn_off", "_sum_off")


def with_global_ntile(
    df: DataFrame, order_cols: list[str], n_tiles: int, num_partitions: int | None = None
) -> DataFrame:
    """`ntile(n)` over a global unique order without a single-partition
    window. SQL ntile semantics: the first (count % n) tiles get one extra
    row — reproduced from the global row number with integer arithmetic."""
    ranked = with_global_order(df, order_cols, num_partitions=num_partitions)
    total = ranked.groupBy().agg(F.count("*").alias("_n"))
    k = n_tiles
    # all-integer arithmetic (div, not /): first (_n % k) tiles hold one extra
    tile = F.expr(
        f"CASE WHEN global_rn < (_n div {k} + 1) * (_n % {k}) "
        f"THEN global_rn div (_n div {k} + 1) "
        f"ELSE (_n % {k}) + (global_rn - (_n div {k} + 1) * (_n % {k}))"
        f" div greatest(_n div {k}, 1) END"
    ).cast("int") + 1
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("tile", tile)
        .drop("_n", "global_rn")
    )
