#!/usr/bin/env python
"""dedup_gate state-growth probe: drive repeated document drops through the
streaming content-hash index and measure, per drop, the drain wall time and
the state size.

Claims under test (streaming/dedup_gate.py + streaming/segments.py):

1. The state is one row per DISTINCT content — grows with unique corpus
   content, never with volume. Regimes:
     * --dup-frac 1.0 (default): every drop is the SAME corpus re-keyed with
       fresh doc_ids — pure duplicate volume. State rows must stay FLAT at
       |distinct contents| while n_copies climbs; drain time flat.
     * --dup-frac 0.0: every drop appends a drop-unique token to every doc —
       all-new content. State grows by exactly |docs| rows per drop.

2. (Round-10, the r9 verdict's scale-killer) per-batch WRITE cost tracks
   the BATCH, not the state. Regime: --seed-mult K seeds the state with K
   full-corpus all-new drops (untimed), then the timed drops deliver only
   --drop-docs documents each (state ≫ batch). Under the old whole-relation
   sink (--sink legacy, kept here exactly for this A/B) each small drop
   rewrites the entire index, so drain grows linearly with K; under the
   segmented sink (--sink segmented, the shipped default) each drop writes
   one O(batch) tier-0 segment plus amortized tier merges, so drain stays
   flat in K apart from the occasional bounded compaction spike.

Usage: python tools/probe_dedup_state.py [--drops 8] [--dup-frac 1.0]
         [--seed-mult 0] [--drop-docs 0] [--sink segmented|legacy]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--drops", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/dedup_state_probe")
    ap.add_argument("--json-out", default=None)
    ap.add_argument(
        "--dup-frac",
        type=float,
        default=1.0,
        help="1.0 = every drop is pure duplicate content (state must stay"
        " flat); 0.0 = every drop is all-new content (state grows by"
        " |docs|/drop)",
    )
    ap.add_argument(
        "--seed-mult",
        type=int,
        default=0,
        help="seed the state with this many full-corpus ALL-NEW drops"
        " (untimed) before the timed drops — the state>>batch regime",
    )
    ap.add_argument(
        "--drop-docs",
        type=int,
        default=0,
        help="docs per timed drop (0 = the full corpus)",
    )
    ap.add_argument(
        "--sink",
        choices=("segmented", "legacy"),
        default="segmented",
        help="legacy = the pre-r10 whole-relation versioned_count_sink,"
        " kept for the A/B that motivated the segmented store",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from s3bigdatasync_spark.operators import prepared
    from s3bigdatasync_spark.session import get_spark
    from s3bigdatasync_spark.streaming import dedup_gate
    from s3bigdatasync_spark.streaming.dedup_gate import (
        DOCS_STREAM_SCHEMA,
        _hash_counts,
    )

    spark = get_spark("dedup-state-probe")
    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    docs_dir = str(out / "docs")
    state_dir = str(out / "state")
    ckpt = str(out / "ckpt")

    if args.sink == "segmented":
        read_state = dedup_gate.read_dedup_state

        def run_stream():
            return dedup_gate.stream_dedup_state(spark, docs_dir, state_dir, ckpt)

    else:  # legacy whole-relation sink — the r9-verdict baseline
        from s3bigdatasync_spark.streaming.drift import (
            read_versioned_counts,
            versioned_count_sink,
        )

        _STATE_SCHEMA = "content_hash string, c long, keeper long"

        def read_state(sp, sd):
            return read_versioned_counts(sp, sd, _STATE_SCHEMA)

        def run_stream():
            sink = versioned_count_sink(
                state_dir,
                _STATE_SCHEMA,
                ["content_hash"],
                _hash_counts,
                agg_exprs=[
                    F.sum("c").alias("c"),
                    F.min("keeper").alias("keeper"),
                ],
            )
            stream = (
                spark.readStream.schema(DOCS_STREAM_SCHEMA)
                .option("maxFilesPerTrigger", 10)
                .parquet(docs_dir)
            )
            return (
                stream.writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .foreachBatch(sink)
                .trigger(availableNow=True)
                .start()
            )

    base = (
        prepared(spark, args.sf_dir)
        .table("documents")
        .select("doc_id", "text", "lang")
    )
    n_docs = base.count()
    id_off = 10_000_000

    def land(df) -> None:
        df.coalesce(2).write.mode("append").parquet(docs_dir)

    # --- seeding: build a large all-new-content state, untimed ------------
    seed_s = 0.0
    drop_seq = 0
    for k in range(args.seed_mult):
        seed = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(drop_seq * id_off)
        ).withColumn("text", F.concat(F.col("text"), F.lit(f" seed{k}tok")))
        land(seed)
        t0 = time.perf_counter()
        q = run_stream()
        q.awaitTermination(900)
        seed_s += time.perf_counter() - t0
        drop_seq += 1

    def bytes_written_this_version(sd: str) -> int:
        """Bytes the drop's drain wrote into the state dir: every entry
        carrying the CURRENT version tag (GC keeps only the current
        files/meta/manifest plus live segments; segments written by this
        version — including compaction outputs — are named seg_v{N}_*).
        This is the O(state)-vs-O(batch) axis directly: the legacy sink's
        counts_v{N} is the whole index, the segmented sink's seg_v{N}_* is
        the batch plus amortized merges."""
        import os
        import re

        root = Path(sd)
        vmax = -1
        for d in root.iterdir():
            m = re.fullmatch(r"files_v(\d+)", d.name)
            if m:
                vmax = max(vmax, int(m.group(1)))
        total = 0
        for d in root.iterdir():
            if re.fullmatch(
                rf"(counts|files|manifest)_v{vmax}", d.name
            ) or re.match(rf"seg_v{vmax}_", d.name):
                for r, _dirs, fs in os.walk(d):
                    total += sum((Path(r) / f).stat().st_size for f in fs)
        return total

    # --- timed drops -------------------------------------------------------
    rows_per_drop: list[int] = []
    copies_per_drop: list[int] = []
    drain_s: list[float] = []
    written_mb: list[float] = []
    for i in range(args.drops):
        drop = base
        if args.drop_docs:
            drop = drop.orderBy("doc_id").limit(args.drop_docs)
        drop = drop.withColumn("doc_id", F.col("doc_id") + F.lit(drop_seq * id_off))
        if args.dup_frac < 1.0:
            # fresh content: a drop-unique token on the non-duplicate share
            drop = drop.withColumn(
                "text",
                F.when(
                    (F.col("doc_id") % 100) / 100.0 >= args.dup_frac,
                    F.concat(F.col("text"), F.lit(f" dropnew{drop_seq}tok")),
                ).otherwise(F.col("text")),
            )
        land(drop)
        t0 = time.perf_counter()
        q = run_stream()
        q.awaitTermination(900)
        drain_s.append(round(time.perf_counter() - t0, 3))
        written_mb.append(round(bytes_written_this_version(state_dir) / 1e6, 3))
        drop_seq += 1
        st = read_state(spark, state_dir)
        agg = st.agg(
            F.count("*").alias("rows"), F.sum("c").alias("copies")
        ).collect()[0]
        rows_per_drop.append(int(agg["rows"]))
        copies_per_drop.append(int(agg["copies"]))

    payload = {
        "sink": args.sink,
        "drops": args.drops,
        "docs_per_drop": args.drop_docs or n_docs,
        "dup_frac": args.dup_frac,
        "seed_mult": args.seed_mult,
        "seed_docs": args.seed_mult * n_docs,
        "seed_s": round(seed_s, 3),
        "state_rows": rows_per_drop,
        "total_copies": copies_per_drop,
        "drain_s": drain_s,
        "written_mb_per_drop": written_mb,
    }
    line = json.dumps(payload)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
