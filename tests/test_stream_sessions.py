"""Stateful streaming sessionization (applyInPandasWithState): sessions close
across micro-batch boundaries and match the batch gap semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from s3bigdatasync_spark.streaming.sessions import EVENT_SCHEMA, stream_sessionize

BASE = dt.datetime(2024, 1, 15, 7, 0, 0)


def _events(rows):
    return [(uid, eid, BASE + dt.timedelta(seconds=s)) for uid, eid, s in rows]


def test_sessions_close_across_batches(spark, tmp_path):
    ev_dir = str(tmp_path / "ev")
    out = str(tmp_path / "sessions")
    ck = str(tmp_path / "ck")

    # file 1: user 1 has a burst, then (file 2) a second burst >30min later,
    # then (file 2) a far-future event that pushes the watermark past both.
    spark.createDataFrame(
        _events([(1, 1, 0), (1, 2, 60), (1, 3, 120), (2, 10, 0)]), EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(ev_dir)
    q = stream_sessionize(spark, ev_dir, out, ck, max_files_per_trigger=1)
    q.awaitTermination(180)

    spark.createDataFrame(
        _events([(1, 4, 4000), (1, 5, 4060), (2, 11, 100000)]), EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(ev_dir)
    q = stream_sessionize(spark, ev_dir, out, ck, max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    base_s = int(BASE.timestamp())
    # user 1's first session (0..120s, 3 events) must have closed via the gap
    assert (1, base_s, base_s + 120, 3) in got
    # user 2's first session closed by the 100000s event's gap
    assert (2, base_s, base_s, 1) in got


def test_crash_replay_double_append(spark, tmp_path):
    """Kill window: the closed-session append landed, the checkpoint commit
    did not — the restart replays the batch against the restored state and
    emits byte-identical session rows again. Simulated by re-appending a
    copy of the committed output. read_sessions — the exactly-once view
    keyed on (user_id, session_start) — must still show each closed session
    once with its original end/count (r6 verdict item 5)."""
    from s3bigdatasync_spark.streaming.sessions import read_sessions

    ev_dir = str(tmp_path / "ev2")
    out = str(tmp_path / "sessions2")
    ck = str(tmp_path / "ck2")
    spark.createDataFrame(
        _events([(1, 1, 0), (1, 2, 60), (2, 10, 0)]), EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(ev_dir)
    q = stream_sessionize(spark, ev_dir, out, ck, max_files_per_trigger=1)
    q.awaitTermination(180)
    spark.createDataFrame(
        _events([(1, 4, 100000), (2, 11, 100000)]), EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(ev_dir)
    q = stream_sessionize(spark, ev_dir, out, ck, max_files_per_trigger=1)
    q.awaitTermination(180)

    committed = spark.read.parquet(out)
    n_committed = committed.count()
    assert n_committed > 0
    committed.write.mode("append").parquet(out)
    assert spark.read.parquet(out).count() == 2 * n_committed

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in read_sessions(spark, out).collect()
    }
    assert read_sessions(spark, out).count() == n_committed == len(got)
    base_s = int(BASE.timestamp())
    assert (1, base_s, base_s + 60, 2) in got
    assert (2, base_s, base_s, 1) in got
