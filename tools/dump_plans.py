"""Dump .explain("formatted") for named queries to plans/r12/<query>_<tag>.txt.

Usage: python tools/dump_plans.py before q1 q2 ...
       python tools/dump_plans.py after  q1 q2 ...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tag = sys.argv[1]
names = sys.argv[2:]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
os.makedirs(OUT, exist_ok=True)

from s3bigdatasync_spark import registry
from s3bigdatasync_spark.session import get_spark

spark = get_spark("dump-plans")
queries = registry.full_queries()

for name in names:
    df = queries[name](spark, SF_DIR)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    path = os.path.join(OUT, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(txt)
    n_exch = txt.count("Exchange")
    print(f"{name}: wrote {path} ({len(txt)} chars, {n_exch} Exchange mentions)")
spark.stop()
