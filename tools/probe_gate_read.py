#!/usr/bin/env python
"""dedup_gate READ-path probe — the state≫batch twin of
probe_dedup_state.py's write-side A/B (round-11; the r10 verdict's item 1).

Claim under test (streaming/dedup_gate.py admission_report +
streaming/segments.py read_segmented_counts): gating a small batch against a
large content-hash index must cost O(batch) at the merge-agg, not O(state).
The pruned path broadcast-semi-joins the unioned segment scan against the
batch's own hash set BEFORE the keyed aggregation; the legacy path
(prune=False) assembles the FULL state per gate call.

Protocol: seed the state with --seed-mult full-corpus all-new drops
(untimed), then time admission_report over a --gate-docs-row slice of landed
documents, N reps each of prune=False / prune=True, and count the rows that
actually enter the merge-agg under each path (the O(state)-vs-O(batch) axis
directly). Prints one JSON line.

Usage: python tools/probe_gate_read.py [--seed-mult 10] [--gate-docs 2000]
         [--reps 3] [--sf-dir /root/testdata/sf0.1]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed-mult", type=int, default=10)
    ap.add_argument("--gate-docs", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/gate_read_probe")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from s3bigdatasync_spark.operators import prepared
    from s3bigdatasync_spark.session import get_spark
    from s3bigdatasync_spark.streaming import dedup_gate, segments

    spark = get_spark("gate-read-probe")
    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    docs_dir = str(out / "docs")
    state_dir = str(out / "state")
    ckpt = str(out / "ckpt")

    base = (
        prepared(spark, args.sf_dir)
        .table("documents")
        .select("doc_id", "text", "lang")
    )
    id_off = 10_000_000

    # --- seed: K full-corpus ALL-NEW drops (state >> any one batch) --------
    t0 = time.perf_counter()
    for k in range(args.seed_mult):
        seed = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * id_off)
        ).withColumn("text", F.concat(F.col("text"), F.lit(f" seed{k}tok")))
        seed.coalesce(2).write.mode("append").parquet(docs_dir)
        q = dedup_gate.stream_dedup_state(spark, docs_dir, state_dir, ckpt)
        q.awaitTermination(900)
    seed_s = time.perf_counter() - t0

    state_rows = dedup_gate.read_dedup_state(spark, state_dir).count()

    # the gate batch: landed documents (every hash is in the state — the
    # admission contract), sliced from the first seeded drop
    gate = (
        spark.read.schema(dedup_gate.DOCS_STREAM_SCHEMA)
        .parquet(docs_dir)
        .filter(F.col("doc_id") < args.gate_docs)
        .localCheckpoint(eager=True)  # pin: time the gate, not the slice scan
    )
    n_gate = gate.count()

    # rows entering the merge-agg under each path — the claim's direct axis
    segs = segments._read_manifest(spark, state_dir)
    union = None
    for seg, _t, _n in segs:
        part = segments._read_segment(
            spark, state_dir, seg, dedup_gate._STATE_SCHEMA
        )
        union = part if union is None else union.unionByName(part)
    agg_input_full = union.count()
    probe = gate.select(
        F.md5(dedup_gate._norm_text()).alias("content_hash")
    ).distinct()
    agg_input_pruned = union.join(
        F.broadcast(probe), "content_hash", "left_semi"
    ).count()

    def timed(prune: bool) -> list[float]:
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = dedup_gate.admission_report(
                spark, state_dir, gate, prune=prune
            ).count()
            assert n == n_gate, (n, n_gate)
            times.append(round(time.perf_counter() - t0, 3))
        return times

    full_s = timed(prune=False)
    pruned_s = timed(prune=True)

    # parity: the pruned report must equal the full report row-for-row
    a = dedup_gate.admission_report(spark, state_dir, gate, prune=False)
    b = dedup_gate.admission_report(spark, state_dir, gate, prune=True)
    mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()

    payload = {
        "sf_dir": args.sf_dir,
        "seed_mult": args.seed_mult,
        "seed_s": round(seed_s, 3),
        "state_rows": state_rows,
        "n_segments": len(segs),
        "gate_docs": n_gate,
        "agg_input_full": agg_input_full,
        "agg_input_pruned": agg_input_pruned,
        "full_s": full_s,
        "full_median_s": round(statistics.median(full_s), 3),
        "pruned_s": pruned_s,
        "pruned_median_s": round(statistics.median(pruned_s), 3),
        "parity_mismatch_rows": mismatch,
    }
    line = json.dumps(payload)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
