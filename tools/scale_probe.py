#!/usr/bin/env python
"""Scaling-slope probe: measure headline inventory queries at sf0.1 and at a
synthetic 10x replication of it, and report the time ratio per query.

A plan that "would survive 100 TB" must first survive 10x: fixed overhead
should amortize (ratio << 10) and nothing should blow up super-linearly
(ratio > 10 means a shuffle/window/join whose cost grows faster than data).
The replicated table keeps the key space disjoint per copy (orderkey offset)
so join/groupBy cardinalities scale with the data like a real bigger bucket.

Usage: python tools/scale_probe.py [--copies 10] [--out /tmp/scale_probe]
Prints one JSON line: {"sf01": {...}, "scaled": {...}, "ratio": {...}}.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path

import sys

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

BASE_SF = "/root/testdata/sf0.1"

# Inventory-shaped headline queries (all derive from lineitem).
PROBE_QUERIES = [
    "size_histogram",
    "inventory_stats",
    "inventory_diff",
    "diff_summary",
    "task_batches",
    "dedup_anti_join",
    "snapshot_history",
    "retention_sweep",
    "hot_prefix_report",
    "restore_plan",
    "table_checksum",
    "compaction_plan",
    "transfer_cost_estimate",
]


def build_scaled_dir(spark, out_dir: str, copies: int) -> None:
    """Replicate lineitem x copies with disjoint orderkey ranges; link the
    other base tables unchanged (the probe queries never touch them, but
    view registration reads all of them)."""
    from pyspark.sql import functions as F

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    li = spark.read.parquet(f"{BASE_SF}/lineitem.parquet")
    offset = 1_000_000_000
    scaled = None
    for i in range(copies):
        c = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * offset))
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "events",
        "documents",
        "embeddings",
    ):
        src = Path(f"{BASE_SF}/{t}.parquet")
        dst = out / f"{t}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


def measure(spark, sf_dir: str) -> dict[str, float]:
    """Warm-measure (bench.py methodology): compile+warm run, clear caches,
    report the second, cold-cache execution."""
    from s3bigdatasync_spark import registry
    from s3bigdatasync_spark.operators import _PREPARED

    queries = registry.full_queries()
    out: dict[str, float] = {}
    _PREPARED.clear()  # force view re-registration on this sf_dir
    for name in PROBE_QUERIES:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    _PREPARED.clear()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_probe")
    args = ap.parse_args()

    from s3bigdatasync_spark.session import get_spark

    spark = get_spark("scale-probe")
    build_scaled_dir(spark, args.out, args.copies)
    base = measure(spark, BASE_SF)
    scaled = measure(spark, args.out)
    ratio = {k: round(scaled[k] / base[k], 2) if base[k] else None for k in base}
    print(
        json.dumps(
            {"copies": args.copies, "sf01": base, "scaled": scaled, "ratio": ratio}
        )
    )


if __name__ == "__main__":
    main()
