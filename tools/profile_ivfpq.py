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

# sub-stages of train_codebook
t("  train: ids collect", lambda: emb.select("vec_id").orderBy("vec_id").limit(P.PQ_K).collect())
v = P._exploded(emb)
ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(P.PQ_K).collect()]
cid_map = spark.createDataFrame([(int(x), i) for i, x in enumerate(ids)], "vec_id long, cid int")
c0 = v.join(F.broadcast(cid_map), "vec_id").select("cid", "dim", F.round("val", 6).alias("cv"))
t("  train: c0 collect", lambda: c0.collect())
C0 = P._collect_codebook(c0, len(ids))
a1 = P._assign_codes(emb, spark, C0).select("vec_id", "sub", F.col("code").alias("cid"))
t("  train: c1 groupBy collect", lambda: v.join(a1, ["vec_id", "sub"]).groupBy("cid", "dim").agg(F.round(F.avg("val"), 6).alias("cv")).collect())

spark.stop()
