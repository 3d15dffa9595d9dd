"""Incremental-fingerprint parity: the streaming checksum state over
append-only inventory files must equal the one-pass batch fingerprint after
every round of appends — the associativity property that makes the 100 TB
no-rescan design sound."""

from __future__ import annotations

from s3bigdatasync_spark.streaming.checksum import (
    INVENTORY_STREAM_SCHEMA,
    batch_equivalent,
    read_state,
    stream_table_checksum,
)


def _mk_rows(tag: str, n: int):
    return [(f"obj/{tag}/{i}", 1_000_000 + i * 37, f"etag-{tag}-{i}") for i in range(n)]


def test_incremental_checksum_equals_batch(spark, tmp_path):
    inv_dir = str(tmp_path / "inv")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    for round_tag, n in (("a", 50), ("b", 35), ("c", 15)):
        spark.createDataFrame(_mk_rows(round_tag, n), INVENTORY_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(inv_dir)
        q = stream_table_checksum(
            spark, inv_dir, state_dir, ckpt, max_files_per_trigger=1
        )
        q.awaitTermination(120)
        state = read_state(spark, state_dir)
        expect = batch_equivalent(spark, inv_dir)
        assert state["n_rows"] == expect["n_rows"]
        assert state["total_size"] == expect["total_size"]
        assert state["checksum"] == expect["checksum"]

    # the final state saw all three appends exactly once
    assert state["n_rows"] == 100
    assert state["checksum"] > 0


def test_duplicate_batch_is_skipped(spark, tmp_path):
    """Re-delivering an applied batch_id must not double-count (the
    foreachBatch retry case)."""
    inv_dir = str(tmp_path / "inv")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_mk_rows("x", 20), INVENTORY_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(inv_dir)
    q = stream_table_checksum(spark, inv_dir, state_dir, ckpt)
    q.awaitTermination(120)
    before = read_state(spark, state_dir)
    assert before["last_batch_id"] >= 0

    # same checkpoint, no new files: the drained stream re-fires nothing and
    # the batch_id guard keeps the state untouched even if the sink re-runs
    q2 = stream_table_checksum(spark, inv_dir, state_dir, ckpt)
    q2.awaitTermination(120)
    after = read_state(spark, state_dir)
    assert after == before  # no new files, no re-application
