"""Decompose a query's wall time into construction / optimization / execution.

For each named query (same protocol as bench.py: warm-up run first, then N
cold-cache measured runs), reports per-run medians of:

  construct — fn(spark, sf_dir): Python-side plan building, incl. any
              bounded-model-state collects (caps, centroids, BPE merges)
  optimize  — force analysis+optimization+physical planning via
              df._jdf.queryExecution().executedPlan() (no jobs run)
  execute   — the noop-sink write (jobs + stages + AQE re-planning)

Usage: python tools/probe_phases.py q1 q2 ... [--n=3]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

names = [a for a in sys.argv[1:] if not a.startswith("--")]
n_runs = 3
for a in sys.argv[1:]:
    if a.startswith("--n="):
        n_runs = int(a.split("=")[1])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from s3bigdatasync_spark import registry
from s3bigdatasync_spark.session import get_spark

spark = get_spark("probe-phases")
queries = registry.full_queries()
spark.range(1).collect()
for t in ("lineitem", "events", "documents", "embeddings", "part", "supplier", "orders"):
    spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

print(f"{'query':30s} {'construct':>10s} {'optimize':>10s} {'execute':>10s} {'total':>10s}")
for name in names:
    fn = queries[name]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    cons, opts, execs = [], [], []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        cons.append(t1 - t0)
        opts.append(t2 - t1)
        execs.append(t3 - t2)
        spark.catalog.clearCache()
    c, o, e = (statistics.median(x) for x in (cons, opts, execs))
    print(f"{name:30s} {c:10.3f} {o:10.3f} {e:10.3f} {c + o + e:10.3f}")
spark.stop()
