"""End-to-end lifecycle test (SURVEY §3): inventory → list_producer →
task_executor (local-FS copy with injected failures) → monitor_stats →
dashboard, all on temp dirs."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3bigdatasync_spark.plans.pipeline import (
    dashboard_progress,
    list_producer,
    monitor_stats,
    task_executor,
)


def test_full_lifecycle(spark, tmp_path):
    inv = (
        spark.table("inventory_src")
        .select("bucket", "key", "size")
        .limit(500)
        .cache()
    )
    n_inv = inv.count()

    tasks_dir = str(tmp_path / "tasks")
    job = list_producer(spark, inv, "dst-bucket", tasks_dir, str(tmp_path / "job.json"))
    assert job["job_info"]["n_tasks"] == n_inv
    assert job["statistics"]["total_objects"] == n_inv

    # task files ≈ 100 objects each (B1 batching at the sink)
    tasks = spark.read.json(tasks_dir)
    assert tasks.count() == n_inv
    assert tasks.columns and "dst_bucket" in tasks.columns

    # copy with deterministic injected failures (~keys ending in '3')
    def copy_fn(src_bucket: str, dst_bucket: str, key: str) -> bool:
        return not key.endswith("3")

    copy_log = str(tmp_path / "copy_log")
    dlq = str(tmp_path / "dead")
    n_ok, n_fail = task_executor(spark, tasks_dir, copy_fn, copy_log, dlq)
    assert n_ok + n_fail == n_inv
    assert n_fail > 0  # injection hit something
    # monitor table carries both statuses (TaskExecutor.py:66-80); DLQ gets
    # the failed actions additionally (79-85)
    assert spark.read.parquet(copy_log).count() == n_inv
    assert spark.read.parquet(dlq).count() == n_fail

    # monitor rollup + dashboard (D4 + D7)
    stat_dir = str(tmp_path / "stat")
    monitor_stats(spark, copy_log, stat_dir)
    stat = spark.read.parquet(stat_dir)
    assert set(r["time_unit"] for r in stat.select("time_unit").distinct().collect()) == {1, 5, 60}
    prog = dashboard_progress(spark, stat_dir).collect()[0]
    assert prog["success_num"] == n_ok
    inv.unpersist()
