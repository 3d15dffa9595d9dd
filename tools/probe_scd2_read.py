#!/usr/bin/env python
"""scd2 read-side A/B — the other half of the r10 write-amplification trade
(round-11 verdict item 7).

streaming/scd2.py materializes the full run table per version (reads are a
plain scan; writes are O(|inventory|) per version). streaming/scd2_open.py
writes O(churn) events per version into the segmented LSM store; reads
assemble the closed-form view from the live segments (union → merge-agg →
watermark coalesce). The module claims "pick by read/write ratio" — this
probe prices BOTH sides of that ratio at state≫churn:

  * synthesize V inventory versions over K keys with a per-mille etag churn
    (vectorized numpy/pyarrow; etags change exactly at churn points),
  * drain both streams over the same snapshot dir,
  * report per-version written bytes for each encoding (the write side),
    and N-rep timed full reads of the closed-form run relation (the read
    side), plus row parity between the two reads.

Usage: python tools/probe_scd2_read.py [--keys 50000] [--versions 30]
         [--churn-pm 1] [--reps 5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _dir_bytes(p: str) -> int:
    import os

    total = 0
    for r, _d, fs in os.walk(p):
        total += sum((Path(r) / f).stat().st_size for f in fs)
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=50_000)
    ap.add_argument("--versions", type=int, default=30)
    ap.add_argument(
        "--churn-pm",
        type=int,
        default=1,
        help="per-mille of keys whose etag changes at each version (1 = 0.1%%)",
    )
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/scd2_read_probe")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3bigdatasync_spark.session import get_spark
    from s3bigdatasync_spark.streaming import scd2, scd2_open

    spark = get_spark("scd2-read-probe")
    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    (out / "snaps").mkdir(parents=True)

    # --- synthesize the history (etag generation changes at churn points) ---
    ids = np.arange(args.keys, dtype=np.int64)
    gen = np.zeros(args.keys, dtype=np.int64)
    sizes = 100 + (ids % 50)
    churn_per_v = []
    for v in range(1, args.versions + 1):
        churned = ((ids * 2654435761 + v * 40503) % 1000) < args.churn_pm
        gen = np.where(churned, v, gen)
        churn_per_v.append(int(churned.sum()))
        tbl = pa.table(
            {
                "key": pa.array([f"k{int(i):07d}" for i in ids], pa.string()),
                "v": pa.array(np.full(args.keys, v, dtype=np.int32)),
                "etag": pa.array(
                    [f"{int(i)}:{int(g)}" for i, g in zip(ids, gen)], pa.string()
                ),
                "size": pa.array(sizes, pa.int64()),
            }
        )
        pq.write_table(tbl, str(out / "snaps" / f"v{v:04d}.parquet"))

    snaps = str(out / "snaps")
    mat_dir, mat_ckpt = str(out / "mat_runs"), str(out / "mat_ckpt")
    open_dir, open_ckpt = str(out / "open_state"), str(out / "open_ckpt")

    # --- drain both encodings over the same snapshots ----------------------
    print("snapshots written; draining scd2 (materialized)...", file=sys.stderr)
    t0 = time.perf_counter()
    q = scd2.stream_snapshot_history(spark, snaps, mat_dir, mat_ckpt)
    q.awaitTermination(1800)
    mat_drain_s = round(time.perf_counter() - t0, 3)
    print(f"scd2 drained in {mat_drain_s}s; draining scd2_open...", file=sys.stderr)

    t0 = time.perf_counter()
    q = scd2_open.stream_snapshot_history_open(spark, snaps, open_dir, open_ckpt)
    q.awaitTermination(1800)
    open_drain_s = round(time.perf_counter() - t0, 3)
    print(f"scd2_open drained in {open_drain_s}s", file=sys.stderr)

    # --- read side: full closed-form relation, N reps each ----------------
    def timed(mk) -> list[float]:
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        return times

    mat_read_s = timed(lambda: scd2.read_runs(spark, mat_dir))
    open_read_s = timed(lambda: scd2_open.read_runs_closed(spark, open_dir))

    # parity (run_id is open-encoding-internal; compare the SCD2 surface)
    cols = ["key", "etag", "v_from", "v_to", "size"]
    a = scd2.read_runs(spark, mat_dir).select(*cols)
    b = scd2_open.read_runs_closed(spark, open_dir).select(*cols)
    mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()

    payload = {
        "keys": args.keys,
        "versions": args.versions,
        "churn_pm": args.churn_pm,
        "churn_rows_per_version_mean": round(
            sum(churn_per_v[1:]) / max(1, len(churn_per_v) - 1), 1
        ),
        "mat_drain_s": mat_drain_s,
        "open_drain_s": open_drain_s,
        "mat_state_mb": round(_dir_bytes(mat_dir) / 1e6, 3),
        "open_state_mb": round(_dir_bytes(open_dir) / 1e6, 3),
        "mat_read_s": mat_read_s,
        "mat_read_median_s": round(statistics.median(mat_read_s), 3),
        "open_read_s": open_read_s,
        "open_read_median_s": round(statistics.median(open_read_s), 3),
        "parity_mismatch_rows": mismatch,
        "run_rows": a.count(),
    }
    line = json.dumps(payload)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
