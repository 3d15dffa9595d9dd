"""Time-window aggregations (SURVEY §2 D4-D6, F1) — the monitor/stat pipeline.

The reference streams monitor rows through three concurrent hand-rolled
tumbling buckets (TaskMonitor/s3_monitor_statistic.py:177-207, 250-301) and
upserts closed buckets into DynamoDB with a clobber-on-rerun PUT (59-68).
Here each granularity is a declarative tumbling-window groupBy; the
multi-granularity stat is a single union (Spark shares the scan via
whole-stage codegen; at scale the three aggs are map-side partial + one
small shuffle each, keyed by (window, status) — low cardinality, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared
from ..views import oracle_cte

TIME_UNITS = (1, 5, 60)  # minutes — TaskMonitor/ddb.yaml:85-109


def _bucketed(log: DataFrame, minutes: int) -> DataFrame:
    """Tumbling-window agg at one granularity; window start as epoch seconds
    (bigint — portable, tz-free)."""
    secs = minutes * 60
    start = (F.col("replication_time").cast("long") / secs).cast("long") * secs
    # cast(double as long) truncates in Spark; inputs are positive so this is
    # floor-division, matching the oracle's // operator.
    return (
        log.withColumn("start_time", start)
        .groupBy("start_time")
        .agg(
            F.sum(F.when(F.col("replication_status") == 1, F.col("size")).otherwise(0)).alias(
                "success_object_size"
            ),
            F.sum(F.when(F.col("replication_status") == 1, 1).otherwise(0)).alias(
                "success_object_num"
            ),
            F.sum(F.when(F.col("replication_status") == 0, F.col("size")).otherwise(0)).alias(
                "failed_object_size"
            ),
            F.sum(F.when(F.col("replication_status") == 0, 1).otherwise(0)).alias(
                "failed_object_num"
            ),
        )
        .withColumn("time_unit", F.lit(minutes))
    )


_STAT_COLS = [
    "time_unit",
    "start_time",
    "success_object_size",
    "success_object_num",
    "failed_object_size",
    "failed_object_num",
]


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: the 1/5/60-minute stat table (≙ GROUPING SETS over window
    granularities).

    One scan, one shuffle: each row is exploded into its three granularities
    and aggregated by (time_unit, bucket) in a single groupBy — a union of
    three per-granularity aggs would scan the source three times, which at
    100 TB is 3x the I/O for identical output.
    """
    log = prepared(spark, sf_dir).table("copy_log")
    exploded = log.select(
        "replication_time",
        "replication_status",
        "size",
        F.explode(F.array(*[F.lit(m) for m in TIME_UNITS])).alias("time_unit"),
    )
    secs = F.col("time_unit").cast("long") * 60
    start = (F.col("replication_time").cast("long") / secs).cast("long") * secs
    return (
        exploded.withColumn("start_time", start)
        .groupBy("time_unit", "start_time")
        .agg(
            F.sum(F.when(F.col("replication_status") == 1, F.col("size")).otherwise(0)).alias(
                "success_object_size"
            ),
            F.sum(F.when(F.col("replication_status") == 1, 1).otherwise(0)).alias(
                "success_object_num"
            ),
            F.sum(F.when(F.col("replication_status") == 0, F.col("size")).otherwise(0)).alias(
                "failed_object_size"
            ),
            F.sum(F.when(F.col("replication_status") == 0, 1).otherwise(0)).alias(
                "failed_object_num"
            ),
        )
        .select(*_STAT_COLS)
    )


def _rollup_unit_sql(minutes: int) -> str:
    secs = minutes * 60
    return f"""
SELECT {minutes} AS time_unit,
       (epoch_us(replication_time) // 1000000) // {secs} * {secs} AS start_time,
       cast(sum(CASE WHEN replication_status = 1 THEN size ELSE 0 END) AS BIGINT) AS success_object_size,
       cast(sum(CASE WHEN replication_status = 1 THEN 1 ELSE 0 END) AS BIGINT) AS success_object_num,
       cast(sum(CASE WHEN replication_status = 0 THEN size ELSE 0 END) AS BIGINT) AS failed_object_size,
       cast(sum(CASE WHEN replication_status = 0 THEN 1 ELSE 0 END) AS BIGINT) AS failed_object_num
FROM copy_log GROUP BY 2"""


_TIME_ROLLUP_SQL = oracle_cte("copy_log") + "\nUNION ALL\n".join(
    _rollup_unit_sql(m) for m in TIME_UNITS
)


def hwm_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: high-water-mark incremental aggregation.

    Reference restarts the stat job from max(stat.StartTime)
    (s3_monitor_statistic.py:209-248). Batch form: recompute only buckets at
    or after the HWM — here the HWM is the last *closed* hour boundary before
    the max event, and we aggregate the tail at 1-minute grain. The scalar HWM
    is broadcast (a 1-row cross join), so no driver collect in the plan.
    """
    log = prepared(spark, sf_dir).table("copy_log")
    hwm = log.agg(
        ((F.max("replication_time").cast("long") / 3600).cast("long") * 3600).alias("hwm")
    )
    tail = log.crossJoin(F.broadcast(hwm)).filter(
        F.col("replication_time").cast("long") >= F.col("hwm")
    )
    return _bucketed(tail, 1).select(*_STAT_COLS)


_HWM_SQL = oracle_cte("copy_log") + """
SELECT 1 AS time_unit,
       (epoch_us(replication_time) // 1000000) // 60 * 60 AS start_time,
       cast(sum(CASE WHEN replication_status = 1 THEN size ELSE 0 END) AS BIGINT) AS success_object_size,
       cast(sum(CASE WHEN replication_status = 1 THEN 1 ELSE 0 END) AS BIGINT) AS success_object_num,
       cast(sum(CASE WHEN replication_status = 0 THEN size ELSE 0 END) AS BIGINT) AS failed_object_size,
       cast(sum(CASE WHEN replication_status = 0 THEN 1 ELSE 0 END) AS BIGINT) AS failed_object_num
FROM copy_log
WHERE epoch_us(replication_time) // 1000000
      >= (SELECT (epoch_us(max(replication_time)) // 1000000) // 3600 * 3600 FROM copy_log)
GROUP BY 2
"""


def min_max_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: min/max monitor timestamps per status (the reference's four
    Limit=1 index probes, s3_monitor_statistic.py:304-354, as one agg)."""
    log = prepared(spark, sf_dir).table("copy_log")
    return (
        log.groupBy("replication_status")
        .agg(
            F.min("replication_time").cast("long").alias("min_ts"),
            F.max("replication_time").cast("long").alias("max_ts"),
        )
    )


_MIN_MAX_SQL = oracle_cte("copy_log") + """
SELECT replication_status,
       epoch_us(min(replication_time)) // 1000000 AS min_ts,
       epoch_us(max(replication_time)) // 1000000 AS max_ts
FROM copy_log GROUP BY replication_status
"""


def earliest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: ORDER BY ts LIMIT 1 (ScanIndexForward probe,
    s3_monitor_statistic.py:330-344) with a deterministic tiebreak."""
    log = prepared(spark, sf_dir).table("copy_log")
    return (
        log.select("object_key", "etag", F.col("replication_time").cast("long").alias("ts"))
        .orderBy("ts", "etag")
        .limit(1)
    )


_EARLIEST_SQL = oracle_cte("copy_log") + """
SELECT object_key, etag, epoch_us(replication_time) // 1000000 AS ts
FROM copy_log ORDER BY ts, etag LIMIT 1
"""


QUERIES = {
    "time_rollup": time_rollup,
    "hwm_incremental": hwm_incremental,
    "min_max_timestamps": min_max_timestamps,
    "earliest_event": earliest_event,
}

ORACLES = {
    "time_rollup": _TIME_ROLLUP_SQL,
    "hwm_incremental": _HWM_SQL,
    "min_max_timestamps": _MIN_MAX_SQL,
    "earliest_event": _EARLIEST_SQL,
}
