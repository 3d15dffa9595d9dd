#!/usr/bin/env python
"""dedup_gate state-growth probe: drive repeated document drops through the
streaming content-hash index and measure, per drop, the drain wall time and
the state size.

The claim under test (streaming/dedup_gate.py): the state is one row per
DISTINCT content — it grows with unique corpus content, never with volume.
Two regimes:
  * --dup-frac 1.0 (default): every drop is the SAME corpus re-keyed with
    fresh doc_ids — pure duplicate volume. State rows must stay FLAT at
    |distinct contents| while n_copies climbs; drain time flat.
  * --dup-frac 0.0: every drop appends a drop-unique token to every doc —
    all-new content. State grows by exactly |docs| rows per drop (linear in
    UNIQUE content, the bound's own variable); drain stays flat because the
    merge is keyed, never a rescan.

Usage: python tools/probe_dedup_state.py [--drops 8] [--dup-frac 1.0]
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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from s3bigdatasync_spark.operators import prepared
    from s3bigdatasync_spark.session import get_spark
    from s3bigdatasync_spark.streaming.dedup_gate import (
        read_dedup_state,
        stream_dedup_state,
    )

    spark = get_spark("dedup-state-probe")
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
    n_docs = base.count()
    id_off = 10_000_000

    rows_per_drop: list[int] = []
    copies_per_drop: list[int] = []
    drain_s: list[float] = []
    for i in range(args.drops):
        drop = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * id_off))
        if args.dup_frac < 1.0:
            # fresh content: a drop-unique token on the non-duplicate share
            drop = drop.withColumn(
                "text",
                F.when(
                    (F.col("doc_id") % 100) / 100.0 >= args.dup_frac,
                    F.concat(F.col("text"), F.lit(f" dropnew{i}tok")),
                ).otherwise(F.col("text")),
            )
        drop.coalesce(2).write.mode("append").parquet(docs_dir)
        t0 = time.perf_counter()
        q = stream_dedup_state(spark, docs_dir, state_dir, ckpt)
        q.awaitTermination(600)
        drain_s.append(round(time.perf_counter() - t0, 3))
        st = read_dedup_state(spark, state_dir)
        agg = st.agg(F.count("*").alias("rows"), F.sum("c").alias("copies")).collect()[0]
        rows_per_drop.append(int(agg["rows"]))
        copies_per_drop.append(int(agg["copies"]))

    payload = {
        "drops": args.drops,
        "docs_per_drop": n_docs,
        "dup_frac": args.dup_frac,
        "state_rows": rows_per_drop,
        "total_copies": copies_per_drop,
        "drain_s": drain_s,
    }
    line = json.dumps(payload)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
