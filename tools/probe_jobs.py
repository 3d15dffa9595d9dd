"""Count Spark jobs launched during a query's CONSTRUCT vs EXECUTE phase.

Evidence tool for composition queries whose construction runs jobs
(model-state collects, eager checkpoints): how many jobs does a STANDALONE
run launch, and does any shared subtree get built twice?

Usage: python tools/probe_jobs.py q1 q2 ...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

names = [a for a in sys.argv[1:] if not a.startswith("--")]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from s3bigdatasync_spark import registry
from s3bigdatasync_spark.session import get_spark

spark = get_spark("probe-jobs")
queries = registry.full_queries()
spark.range(1).collect()
for t in ("lineitem", "events", "documents", "embeddings"):
    spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

sc = spark.sparkContext
tracker = sc.statusTracker()


def run_in_group(gid, fn):
    sc.setJobGroup(gid, gid)
    out = fn()
    sc.setJobGroup(None, None)
    jobs = tracker.getJobIdsForGroup(gid)
    return out, len(jobs)


print(f"{'query':30s} {'construct_jobs':>14s} {'execute_jobs':>13s}")
for name in names:
    fn = queries[name]
    # warm-up (compile + fill any first-touch state), then measured pass
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    df, n_cons = run_in_group(f"{name}-construct", lambda: fn(spark, SF_DIR))
    _, n_exec = run_in_group(
        f"{name}-execute",
        lambda: df.write.format("noop").mode("overwrite").save(),
    )
    print(f"{name:30s} {n_cons:14d} {n_exec:13d}")
    spark.catalog.clearCache()
spark.stop()
