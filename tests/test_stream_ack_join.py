"""Stream-stream interval join: streaming output must equal the batch join
on the same data (parity oracle), and left-outer must surface never-acked
dispatches once the watermark passes their deadline."""

from __future__ import annotations

import json

from s3bigdatasync_spark.streaming.ack_join import (
    ACK_SCHEMA,
    DISPATCH_SCHEMA,
    joined_frame,
    stream_ack_join,
)


def _write(path, items, fname):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / fname, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")


def _fixture(tmp_path):
    d, a = tmp_path / "dispatch", tmp_path / "ack"
    dispatches = [
        {"key": f"k{i:02d}", "size": 100 + i, "dispatched_at": "2024-01-15T07:00:00"}
        for i in range(20)
    ]
    acks = (
        # 12 in-window acks (5 minutes later)
        [{"key": f"k{i:02d}", "status": "DONE", "acked_at": "2024-01-15T07:05:00"} for i in range(12)]
        # 4 LATE acks — past the 30-minute deadline, must NOT match
        + [{"key": f"k{i:02d}", "status": "DONE", "acked_at": "2024-01-15T08:30:00"} for i in range(12, 16)]
        # watermark pushers on both streams (far-future events, unmatched keys)
        + [{"key": "zz", "status": "DONE", "acked_at": "2024-01-15T12:00:00"}]
    )
    late_dispatch = [{"key": "zz2", "size": 1, "dispatched_at": "2024-01-15T12:00:00"}]
    _write(d, dispatches, "d1.json")
    _write(d, late_dispatch, "d2.json")
    _write(a, acks, "a1.json")
    return d, a


def test_inner_join_matches_batch_parity(spark, tmp_path):
    d, a = _fixture(tmp_path)
    q = stream_ack_join(spark, str(d), str(a), str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "out"))
    batch_d = spark.read.schema(DISPATCH_SCHEMA).json(str(d))
    batch_a = spark.read.schema(ACK_SCHEMA).json(str(a))
    want = joined_frame(batch_d, batch_a, "inner")

    assert got.count() == 12  # in-window acks only; late acks excluded
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_left_outer_surfaces_unacked_dispatches(spark, tmp_path):
    d, a = _fixture(tmp_path)
    q = stream_ack_join(
        spark, str(d), str(a), str(tmp_path / "out2"), str(tmp_path / "ck2"), how="left_outer"
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(tmp_path / "out2"))

    matched = got.filter("status IS NOT NULL")
    unmatched = got.filter("status IS NULL")
    assert matched.count() == 12
    # k12..k19 never acked in-window; their watermark deadline has passed
    # (both streams advanced to 12:00), so all 8 must be emitted with NULLs
    keys = {r["key"] for r in unmatched.collect()}
    assert {f"k{i:02d}" for i in range(12, 20)} <= keys


def test_crash_replay_double_append(spark, tmp_path):
    """Kill window: the match append landed, the checkpoint commit did not —
    the replayed batch re-appends the same matches. Simulated with a
    byte-identical re-append (the joined row is a pure function of the
    (dispatch, ack) pair). read_matches — the exactly-once view keyed on
    (key, dispatched_at, acked_at) — must still equal the batch join, for
    both inner matches and left-outer never-acked rows (r6 item 5)."""
    from s3bigdatasync_spark.streaming.ack_join import read_matches

    d, a = _fixture(tmp_path)
    out = str(tmp_path / "out3")
    q = stream_ack_join(
        spark, str(d), str(a), out, str(tmp_path / "ck3"), how="left_outer"
    )
    q.awaitTermination(180)

    committed = spark.read.parquet(out)
    n_committed = committed.count()
    assert n_committed > 0
    committed.write.mode("append").parquet(out)
    assert spark.read.parquet(out).count() == 2 * n_committed

    got = read_matches(spark, out)
    assert got.count() == n_committed
    matched = got.filter("status IS NOT NULL")
    assert matched.count() == 12
    batch_d = spark.read.schema(DISPATCH_SCHEMA).json(str(d))
    batch_a = spark.read.schema(ACK_SCHEMA).json(str(a))
    want = joined_frame(batch_d, batch_a, "inner")
    assert matched.exceptAll(want).count() == 0
    assert want.exceptAll(matched).count() == 0
    keys = {r["key"] for r in got.filter("status IS NULL").collect()}
    assert {f"k{i:02d}" for i in range(12, 20)} <= keys
