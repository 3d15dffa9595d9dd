"""Ad-hoc bench for a subset of headline queries, same protocol as bench.py
(noop sink, warm-up pass, clearCache between runs, N-median).
Usage: python tools/bench_subset.py q1 q2 ... [--n 5]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

names = [a for a in sys.argv[1:] if not a.startswith("--")]
n_runs = 5
for a in sys.argv[1:]:
    if a.startswith("--n="):
        n_runs = int(a.split("=")[1])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from s3bigdatasync_spark import registry
from s3bigdatasync_spark.session import get_spark

spark = get_spark("bench-subset")
queries = registry.full_queries()
spark.range(1).collect()
for t in ("lineitem", "events", "documents", "embeddings", "part", "supplier", "orders"):
    spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

for name in names:
    fn = queries[name]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    samples = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(
        f"{name:30s} median {statistics.median(samples):.3f}  "
        f"spread {max(samples)-min(samples):.3f}  all {[round(s,3) for s in samples]}"
    )
spark.stop()
