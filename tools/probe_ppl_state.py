#!/usr/bin/env python
"""ppl_gate state-growth probe (round-9 item 5): drive multiple full-corpus
document drops through the streaming perplexity gate's versioned LM state and
measure, per drop, the drain wall time and the state size (rows + bytes).

The claim under test (streaming/ppl_gate.py docstring): the LM state is the
(lang, token) count relation — bounded by |languages × vocabulary|, NOT by
document volume — and the per-batch merge cost is bounded by the same, so
state growth across drops must be sublinear (Heaps-law vocabulary growth,
flat once the corpus vocabulary saturates) and drain time must stay flat
rather than growing with cumulative documents.

Each drop is the full sf documents table with per-drop-disjoint doc_ids
(offset) — the TEXT (and therefore the vocabulary) is identical across
drops, which is the steady-state regime of a production ingest: after the
corpus vocabulary is seen, new volume only increments counts. A `--fresh-
vocab-frac` > 0 additionally tags that fraction of each drop's docs with a
drop-unique token, making the vocabulary grow linearly in drops — the worst
case the bound still has to cap (state grows with VOCAB, drain stays flat).

Usage: python tools/probe_ppl_state.py [--drops 10] [--sf-dir .../sf0.1]
Prints one JSON line: {"drops": [...], "rows": [...], "bytes": [...],
"drain_s": [...]}.
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
    ap.add_argument("--drops", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ppl_state_probe")
    ap.add_argument("--json-out", default=None)
    ap.add_argument(
        "--fresh-vocab-frac",
        type=float,
        default=0.0,
        help="fraction of each drop's docs that carry a drop-unique token"
        " (vocabulary grows linearly in drops — the worst case)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from s3bigdatasync_spark.operators import prepared
    from s3bigdatasync_spark.session import get_spark
    from s3bigdatasync_spark.streaming.ppl_gate import (
        read_lm_counts,
        stream_ppl_state,
    )

    spark = get_spark("ppl-state-probe")
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
    bytes_per_drop: list[int] = []
    drain_s: list[float] = []
    for i in range(args.drops):
        drop = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * id_off))
        if args.fresh_vocab_frac > 0:
            drop = drop.withColumn(
                "text",
                F.when(
                    (F.col("doc_id") % 1000) / 1000.0 < args.fresh_vocab_frac,
                    F.concat(F.col("text"), F.lit(f" dropuniq{i}tok")),
                ).otherwise(F.col("text")),
            )
        drop.coalesce(2).write.mode("append").parquet(docs_dir)
        t0 = time.perf_counter()
        q = stream_ppl_state(spark, docs_dir, state_dir, ckpt)
        q.awaitTermination(600)
        drain_s.append(round(time.perf_counter() - t0, 3))
        rows_per_drop.append(read_lm_counts(spark, state_dir).count())
        bytes_per_drop.append(
            sum(
                f.stat().st_size
                for f in Path(state_dir).rglob("*")
                if f.is_file() and f.name.startswith("part-")
            )
        )

    payload = {
        "drops": args.drops,
        "docs_per_drop": n_docs,
        "fresh_vocab_frac": args.fresh_vocab_frac,
        "state_rows": rows_per_drop,
        "state_bytes": bytes_per_drop,
        "drain_s": drain_s,
    }
    line = json.dumps(payload)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
