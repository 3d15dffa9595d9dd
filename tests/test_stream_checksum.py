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


def test_crash_between_state_commit_and_checkpoint_commit(spark, tmp_path):
    """The sink's kill window (r6 verdict item 5, the drift pattern): state
    v1 fully written — last_batch_id recorded — but the process dies BEFORE
    the streaming checkpoint commits batch 1. A restart redelivers batch 1
    with the SAME batch_id; the guard must skip it (the state already
    includes it) and the final fingerprint must equal one batch pass —
    no double-count."""
    from pyspark.sql import functions as F

    from s3bigdatasync_spark.streaming.checksum import (
        _STATE_SCHEMA,
        CHECKSUM_MOD,
        checksum_chunk,
        checksum_sum,
    )

    inv_dir = str(tmp_path / "inv")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_mk_rows("a", 40), INVENTORY_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(inv_dir)
    q = stream_table_checksum(spark, inv_dir, state_dir, ckpt)
    q.awaitTermination(120)
    state = read_state(spark, state_dir)
    assert state["last_batch_id"] == 0

    # drop B lands; hand-apply EXACTLY the sink's state write for batch 1
    # (the stream never runs, so the checkpoint still only knows batch 0 —
    # the restart below redelivers B under batch_id 1, like a real kill
    # after the state overwrite)
    rows_b = _mk_rows("b", 25)
    bdf = spark.createDataFrame(rows_b, INVENTORY_STREAM_SCHEMA)
    bdf.coalesce(1).write.mode("append").parquet(inv_dir)
    part = bdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("size"), F.lit(0)).alias("s"),
        F.coalesce(checksum_sum(checksum_chunk()), F.lit(0)).alias("c"),
    ).collect()[0]
    spark.createDataFrame(
        [
            (
                state["n_rows"] + part["n"],
                state["total_size"] + part["s"],
                (state["checksum"] + part["c"]) % CHECKSUM_MOD,
                1,
            )
        ],
        _STATE_SCHEMA,
    ).write.mode("overwrite").parquet(state_dir)
    # CRASH here: checkpoint never committed batch 1

    q2 = stream_table_checksum(spark, inv_dir, state_dir, ckpt)
    q2.awaitTermination(120)
    got = read_state(spark, state_dir)
    expect = batch_equivalent(spark, inv_dir)
    assert got["n_rows"] == expect["n_rows"] == 65
    assert got["total_size"] == expect["total_size"]
    assert got["checksum"] == expect["checksum"]
    assert got["last_batch_id"] == 1


def test_torn_state_dir_fails_loudly(spark, tmp_path):
    """A crash INSIDE the state overwrite leaves a torn dir (data files
    gone/garbage). read_state must propagate the read error — treating it
    as 'no state' would silently reset the fingerprint AND the batch guard,
    double-applying all history on the retry."""
    from pathlib import Path

    import pytest

    inv_dir = str(tmp_path / "inv")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_mk_rows("a", 10), INVENTORY_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(inv_dir)
    q = stream_table_checksum(spark, inv_dir, state_dir, ckpt)
    q.awaitTermination(120)

    for f in Path(state_dir).glob("*.parquet"):
        f.unlink()
    (Path(state_dir) / "part-torn.parquet").write_bytes(b"not parquet")
    with pytest.raises(Exception):
        read_state(spark, state_dir)
