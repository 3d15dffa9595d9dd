"""The three reference lifecycles (SURVEY §3) as composable Spark jobs.

§3.1 ListProducer  → list_producer():  inventory scan → stats + task store
§3.2 TaskExecutor  → task_executor():  task store → copy → copy_log + DLQ
§3.3 Monitor/UI    → monitor_stats(), dashboard_progress(): rollups

The reference moves data through SQS/DynamoDB with hand-rolled batching,
retries and dead-lettering; here the task store is a partitioned file table
(each output file ≙ one SQS message batch of ~TASK_BATCH_SIZE objects), the
copy is a pluggable per-partition callable (boto3 in production, local FS in
tests), failures are quarantined by a filter, and idempotence comes from the
msg_id anti-join (operators.joins.dedup_anti_join pattern).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import SIZE_BUCKETS

TASK_BATCH_SIZE = 100  # objects per task file ≙ message_body_max_num (ListProducer.py:17)


def compute_stats(inv: DataFrame) -> DataFrame:
    """§3.1 step: the D1 histogram as the manifest 'statistics' block."""
    aggs = [
        F.count("*").alias("total_objects"),
        F.sum("size").alias("total_size_bytes"),
    ] + [
        F.sum(F.when(F.col("size") <= t, 1).otherwise(0)).alias(name)
        for name, t in SIZE_BUCKETS
    ]
    return inv.agg(*aggs)


def list_producer(
    spark: SparkSession,
    inv: DataFrame,
    dst_bucket: str,
    tasks_dir: str,
    stats_path: str | None = None,
) -> dict:
    """§3.1: inventory → size stats + batched task store.

    Task batching is per-partition at the sink (repartition to
    ceil(n/TASK_BATCH_SIZE) files) — no global sort, no driver loop; at
    100 TB this is one round-robin shuffle sized by the object count.
    Returns the enriched job stats dict (≙ job.json, ListProducer.py:135-157).
    """
    tasks = inv.withColumn("dst_bucket", F.lit(dst_bucket))
    n = tasks.count()
    n_files = max(1, math.ceil(n / TASK_BATCH_SIZE))
    tasks.repartition(n_files).write.mode("overwrite").json(tasks_dir)
    stats_row = compute_stats(inv).collect()[0].asDict()
    job = {"statistics": stats_row, "job_info": {"dst_bucket": dst_bucket, "n_tasks": n}}
    if stats_path:
        import json

        with open(stats_path, "w") as f:
            json.dump(job, f, default=str)
    return job


CopyFn = Callable[[str, str, str], bool]
"""(src_bucket, dst_bucket, key) -> success. Production: boto3 server-side
copy (libs/s3_utils.py:17-35); tests: local FS toucher."""


def task_executor(
    spark: SparkSession,
    tasks_dir: str,
    copy_fn: CopyFn,
    copy_log_dir: str,
    dead_letter_dir: str,
) -> tuple[int, int]:
    """§3.2: consume the task store, execute copies per partition, log
    status, quarantine failures (B8/B9).

    The copy runs inside mapPartitions with bounded per-task work — the Spark
    translation of the competing-consumers loop (TaskExecutor.py:18-102).
    Task retries replace the SQS visibility/redrive machinery; the
    dead-letter table replaces the `*-dead-letter` queue, and keeps the job
    'successful' exactly like the reference (TaskExecutor.py:79-85).
    Returns (n_success, n_failed).
    """
    tasks = spark.read.json(tasks_dir)
    fn = copy_fn  # rebind for closure pickling

    def run_partition(rows: Iterator) -> Iterator[tuple]:
        import time as _t

        for r in rows:
            ok = False
            try:
                ok = fn(r["bucket"], r["dst_bucket"], r["key"])
            except Exception:
                ok = False
            yield (r["key"], float(_t.time()), 1 if ok else 0, r["size"])

    results = tasks.rdd.mapPartitions(run_partition).toDF(
        ["object_key", "replication_time", "replication_status", "size"]
    ).withColumn("replication_time", F.timestamp_seconds("replication_time"))
    results = results.cache()
    # Reference logs BOTH statuses to the monitor table (item_log with
    # ReplicationStatus 0/1, TaskExecutor.py:66-80) and additionally routes
    # the failed action to the dead-letter queue for retry (79-85).
    results.write.mode("append").parquet(copy_log_dir)
    failed = results.filter(F.col("replication_status") == 0)
    n_failed = failed.count()
    if n_failed:
        failed.write.mode("append").parquet(dead_letter_dir)
    n_success = results.count() - n_failed
    results.unpersist()
    return n_success, n_failed


def monitor_stats(spark: SparkSession, copy_log_dir: str, stat_dir: str) -> None:
    """§3.3 batch leg: 1/5/60-minute rollup of copy_log → stat table
    partitioned by time_unit (the D4 shape; streaming variant in
    streaming.monitor)."""
    log = spark.read.parquet(copy_log_dir)
    parts = []
    for minutes in (1, 5, 60):
        secs = minutes * 60
        start = (F.col("replication_time").cast("long") / secs).cast("long") * secs
        parts.append(
            log.withColumn("start_time", start)
            .groupBy("start_time")
            .agg(
                F.sum(F.when(F.col("replication_status") == 1, F.col("size")).otherwise(0)).alias("success_object_size"),
                F.sum(F.when(F.col("replication_status") == 1, 1).otherwise(0)).alias("success_object_num"),
                F.sum(F.when(F.col("replication_status") == 0, F.col("size")).otherwise(0)).alias("failed_object_size"),
                F.sum(F.when(F.col("replication_status") == 0, 1).otherwise(0)).alias("failed_object_num"),
            )
            .withColumn("time_unit", F.lit(minutes))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").partitionBy("time_unit").parquet(stat_dir)


def dashboard_progress(spark: SparkSession, stat_dir: str) -> DataFrame:
    """§3.3 serving leg: global progress rollup (D7/D8) off the stat table —
    partition-pruned to time_unit=1."""
    stat = spark.read.parquet(stat_dir).filter(F.col("time_unit") == 1)
    return stat.agg(
        F.sum("success_object_size").alias("success_size"),
        F.sum("success_object_num").alias("success_num"),
        F.sum("failed_object_size").alias("failed_size"),
        F.sum("failed_object_num").alias("failed_num"),
    )
