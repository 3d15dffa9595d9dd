"""dropDuplicatesWithinWatermark: duplicates inside the horizon are dropped;
state stays bounded by the watermark."""

from __future__ import annotations

import json

from s3bigdatasync_spark.streaming.dedup import stream_dedup_tasks


def _write(path, items, fname):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / fname, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")


def _task(i, at):
    return {
        "bucket": "b1",
        "key": f"k{i:03d}",
        "size": 1000 + i,
        "etag": f"e{i}",
        "dst_bucket": "b2",
        "enqueued_at": at,
    }


def test_duplicates_within_watermark_dropped(spark, tmp_path):
    q = tmp_path / "queue"
    t0 = "2024-01-15T07:00:00"
    t1 = "2024-01-15T07:05:00"
    _write(q, [_task(i, t0) for i in range(10)], "a.json")
    # same 10 tasks re-enqueued 5 minutes later (producer retry), plus 5 new
    _write(q, [_task(i, t1) for i in range(15)], "b.json")

    qq = stream_dedup_tasks(
        spark, str(q), str(tmp_path / "out"), str(tmp_path / "ck"), max_files_per_trigger=1
    )
    qq.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 15  # 10 originals + 5 new; 10 retries dropped
    assert out.select("msg_id").distinct().count() == 15


def test_crash_replay_double_append(spark, tmp_path):
    """Kill window: the unique-task append landed but the checkpoint commit
    did not — the replay (same restored dedup state) re-emits the same
    unique tasks. Simulated with a byte-identical re-append; read_tasks —
    the exactly-once view — must still show each msg_id once (r6 verdict
    item 5 applied to the watermark-dedup module)."""
    from s3bigdatasync_spark.streaming.dedup import read_tasks

    q = tmp_path / "queue2"
    _write(q, [_task(i, "2024-01-15T07:00:00") for i in range(8)], "a.json")
    qq = stream_dedup_tasks(
        spark, str(q), str(tmp_path / "out2"), str(tmp_path / "ck2"),
        max_files_per_trigger=1,
    )
    qq.awaitTermination(180)

    out_dir = str(tmp_path / "out2")
    committed = spark.read.parquet(out_dir)
    n_committed = committed.count()
    assert n_committed == 8
    committed.write.mode("append").parquet(out_dir)
    assert spark.read.parquet(out_dir).count() == 16

    got = read_tasks(spark, out_dir)
    assert got.count() == 8
    assert got.select("msg_id").distinct().count() == 8
