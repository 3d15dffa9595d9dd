"""Small-file compaction EXECUTION — the action half of
operators/cost.compaction_plan (reference README.md:12-13 declares small-file
management as a goal and ships no implementation; the planner landed in
round 2, this is the rewrite).

Shape:
  1. list input data files with their sizes (driver-side listing — the same
     metadata an object-store inventory or table-format manifest supplies;
     bounded: one row per FILE, not per record);
  2. first-fit-in-order bin packing into ~target_bytes output bins — the
     identical integer `div` prefix-sum rule as compaction_plan, so the plan
     query IS the prediction of what this function writes;
  3. one distributed pass: read everything, broadcast-join each row's source
     file to its bin, range-repartition by bin id (one output partition per
     bin), write.

Every output file is written by exactly one task, so file count == bin count
and each lands near target_bytes (modulo encoding ratio). At 100 TB the
listing comes from the table manifest and the single data pass is the
unavoidable rewrite cost; there is no shuffle other than the one
range-partition by bin id.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 512 * 1024 * 1024  # keep in lockstep with operators/cost.py


@dataclass
class CompactionResult:
    n_input_files: int
    n_bins: int
    input_bytes: int
    output_files: list[str]
    rows_in: int
    rows_out: int


def plan_bins(files: list[tuple[str, int]], target_bytes: int) -> dict[str, int]:
    """path -> bin id, by the compaction_plan rule: running-size exclusive
    prefix sum over path order, integer-divided by the target. Driver-side
    over the FILE list (bounded), matching the distributed per-object planner
    bit-for-bit on the same inputs."""
    out, acc = {}, 0
    for path, size in sorted(files):
        out[path] = acc // target_bytes
        acc += size
    return out


def list_data_files(src_dir: str) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet data file under src_dir. Local FS
    walk here; an object-store deployment swaps in its inventory listing and
    a table format hands over its manifest instead."""
    out = []
    for root, _dirs, names in os.walk(src_dir):
        for n in names:
            if n.endswith(".parquet") and not n.startswith("_"):
                p = os.path.join(root, n)
                out.append((p, os.path.getsize(p)))
    return out


def compact_files(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_bytes: int = TARGET_FILE_BYTES,
) -> CompactionResult:
    """Rewrite the many-small-files table at src_dir into ~target_bytes
    files at out_dir. Returns a verification summary (row parity is the
    caller's invariant to assert; tests do)."""
    files = list_data_files(src_dir)
    if not files:
        raise ValueError(f"compact_files: no parquet data files under {src_dir}")
    bins = plan_bins(files, target_bytes)
    # DISTINCT bins, not max+1: a file larger than target advances the
    # running sum past whole bin ids (ids are gapped by construction of the
    # div rule — hypothesis found this); partitioning by max+1 would create
    # empty partitions and zero-row output files for the gaps.
    n_bins = len(set(bins.values()))

    df = spark.read.parquet(src_dir)
    rows_in = df.count()
    # file → bin as a broadcast map; input_file_name() tags provenance.
    # Spark normalizes paths to URIs (file:///...), so normalize both sides.
    bin_map = spark.createDataFrame(
        [(f"file://{p}" if not p.startswith("file:") else p, b) for p, b in bins.items()],
        "_file string, _bin int",
    )
    binned = df.withColumn("_file", F.input_file_name()).join(
        F.broadcast(bin_map), "_file"
    )
    (
        binned.drop("_file")
        # range-repartition on _bin: one output partition (→ one file) per
        # bin; the projection dropping _bin sits above the exchange, so the
        # partitioning survives into the write
        .repartitionByRange(n_bins, "_bin")
        .drop("_bin")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    out_files = [p for p, _ in list_data_files(out_dir)]
    rows_out = spark.read.parquet(out_dir).count()
    return CompactionResult(
        n_input_files=len(files),
        n_bins=n_bins,
        input_bytes=sum(s for _, s in files),
        output_files=out_files,
        rows_in=rows_in,
        rows_out=rows_out,
    )
