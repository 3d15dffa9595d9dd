"""Streaming parity (SURVEY §2 D4/D5 streaming leg): the windowed stat stream
over incremental appends converges to the batch rollup — the property the
reference's HWM-restart + PUT-overwrite design violates (SURVEY §7.4.1)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from s3bigdatasync_spark.streaming.monitor import (
    COPY_LOG_SCHEMA,
    batch_equivalent,
    stream_time_rollup,
)


def _mk_rows(start_min: int, n: int):
    base = dt.datetime(2024, 1, 15, 7, 0, 0)
    return [
        (
            f"k{start_min}-{i}",
            base + dt.timedelta(minutes=start_min, seconds=i * 7 % 180),
            1 if i % 5 else 0,
            1000 + i,
        )
        for i in range(n)
    ]


def test_stream_converges_to_batch(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    out_dir = str(tmp_path / "stat")
    ckpt = str(tmp_path / "ckpt")

    # two incremental appends (≙ two job runs over a growing monitor table)
    spark.createDataFrame(_mk_rows(0, 40), COPY_LOG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(log_dir)
    q = stream_time_rollup(spark, log_dir, out_dir, ckpt, minutes=1, max_files_per_trigger=1)
    q.awaitTermination(120)

    spark.createDataFrame(_mk_rows(30, 40), COPY_LOG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(log_dir)
    q = stream_time_rollup(spark, log_dir, out_dir, ckpt, minutes=1, max_files_per_trigger=1)
    q.awaitTermination(120)

    # append-mode with watermark emits only closed windows; rows newer than
    # (max_event - watermark) are still in state. Compare on the closed span.
    cols = ["time_unit", "start_time", "status", "total_size", "total_num"]
    got = spark.read.parquet(out_dir).select(*cols)  # partitioned read-back reorders
    expected = batch_equivalent(spark, log_dir, minutes=1).select(*cols)
    max_closed = got.agg(F.max("start_time")).collect()[0][0]
    assert max_closed is not None, "stream emitted nothing"
    exp_rows = sorted(
        tuple(r)
        for r in expected.filter(F.col("start_time") <= max_closed).collect()
    )
    got_rows = sorted(tuple(r) for r in got.collect())
    assert got_rows == exp_rows
