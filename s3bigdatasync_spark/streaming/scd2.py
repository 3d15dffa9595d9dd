"""Streaming SCD2 maintenance — the operational leg of
operators/timeline.snapshot_history_merge.

Inventory snapshots land as files in a directory (one version per file,
rows carry their version number `v`); each micro-batch folds the new
versions into the persistent run table with the O(snapshot + churn)
incremental merge — history is never recollapsed. The parity oracle
(tests/test_stream_scd2.py) pins

    streamed run table  ==  batch collapse_runs over every version seen

after every round of appends.

Exactly-once without a batch-id log: the merge's natural idempotence key is
the version number. The run table's max(v_to) only advances when version v
is applied, so a retried batch (or an out-of-order redelivery of an old
file) sees v <= max(v_to) and skips it — the domain's own monotonic
watermark, the same idea as the reference's HWM restart
(TaskMonitor/s3_monitor_statistic.py:209-231) but applied to a state table
that a re-run cannot clobber.

Scale: per-batch work is keyed joins between one snapshot and the run
table, all hash-partitioned on the object key; the run table rewrite is the
only full-table write (at production scale: a MERGE into a Delta/Iceberg
table, same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, IntegerType, StringType, StructField, StructType
from pyspark.sql.utils import AnalysisException

from ..operators.timeline import snapshot_history_merge

SNAPSHOT_STREAM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("v", IntegerType()),
        StructField("etag", StringType()),
        StructField("size", LongType()),
    ]
)

_RUNS_SCHEMA = (
    "key string, run_id long, etag string, v_from int, v_to int, size long"
)


def read_runs(spark: SparkSession, runs_dir: str) -> DataFrame:
    """Current run table (empty before the first snapshot)."""
    try:
        return spark.read.schema(_RUNS_SCHEMA).parquet(runs_dir)
    except AnalysisException as e:
        # only a missing dir (bootstrap) may start empty; see checksum.py
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        return spark.createDataFrame([], _RUNS_SCHEMA)


def stream_snapshot_history(
    spark: SparkSession,
    snapshots_dir: str,
    runs_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """Maintain the SCD2 run table over an append-only snapshot dir.
    Returns the StreamingQuery (availableNow: drains, then stops)."""
    stream = (
        spark.readStream.schema(SNAPSHOT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(snapshots_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        runs = read_runs(sess, runs_dir)
        applied = runs.agg(F.max("v_to").alias("m")).collect()[0]["m"]
        applied = -1 if applied is None else applied
        versions = sorted(
            r["v"]
            for r in batch_df.select("v").distinct().collect()
            if r["v"] > applied
        )
        if not versions:
            return  # retry / stale redelivery — idempotent skip
        for v in versions:
            snap = batch_df.filter(F.col("v") == v).select("key", "etag", "size")
            runs = snapshot_history_merge(runs, snap, v)
        # localCheckpoint materializes the merged table on executors and
        # truncates lineage, so the overwrite below no longer depends on the
        # files it is about to replace — data never funnels through the
        # driver. (Production shape: a Delta/Iceberg MERGE, same plan.)
        runs = runs.localCheckpoint(eager=True)
        runs.select(
            "key", "run_id", "etag", "v_from", "v_to", "size"
        ).write.mode("overwrite").parquet(runs_dir)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
