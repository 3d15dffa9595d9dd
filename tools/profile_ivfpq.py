"""Stage-level timing breakdown for ivf_pq_search (VERDICT r6 item 1).

Times each constituent action of the composed IVF-PQ query so the r3->r6
drift (1.58s -> 2.42s committed medians) can be attributed to a stage.
Run: python tools/profile_ivfpq.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .appName("profile_ivfpq")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import numpy as np

from s3bigdatasync_spark.operators import pq as P
from s3bigdatasync_spark.operators import prepared
from s3bigdatasync_spark.operators.similarity import (
    QUERY_VEC_ID,
    ivf_assign,
    label_centroids,
)

def t(label, fn, n=3):
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        vals.append(time.perf_counter() - t0)
    vals.sort()
    print(f"{label:40s} median {vals[len(vals)//2]:.3f}  all {[round(v,3) for v in vals]}")
    return out

# warm the prepared tables once (registry queries share this)
emb = prepared(spark, sf_dir).table("embeddings")
emb.count()

# full query, end to end
t("FULL ivf_pq_search", lambda: P.ivf_pq_search(spark, sf_dir).collect())

# stages
t("train_codebook", lambda: P._train_codebook(spark, emb))
C = P._train_codebook(spark, emb)
t("q collect", lambda: emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect())
t("label_centroids.toPandas", lambda: label_centroids(spark, sf_dir).toPandas())
t("ivf_assign.count", lambda: ivf_assign(spark, sf_dir).count())
t("assign_codes.count", lambda: P._assign_codes(emb, spark, C).count())

# sub-stages of train_codebook (the shipped r9 path: one hash-spread head
# collect with engine-side 6dp slices, then LLOYD_ROUNDS rounds of
# _assign_partials' map-side partial sums — this times ONE round)
def _head():
    return (
        emb.select(
            "vec_id",
            "embedding",
            F.expr("transform(embedding, x -> round(cast(x AS double), 6))").alias("emb6"),
        )
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(P.PQ_K)
        .collect()
    )

head = t("  train: head collect (init+emb6)", _head)
head = sorted(head, key=lambda r: r["vec_id"])
C0 = np.array([list(r["emb6"]) for r in head], dtype=np.float64)
c1 = (
    P._assign_partials(emb, spark, C0)
    .groupBy("cid", "dim")
    .agg(F.round(F.sum("s") / F.sum("n"), 6).alias("cv"))
)
t("  train: one Lloyd-round partials groupBy collect", lambda: c1.collect())

spark.stop()
