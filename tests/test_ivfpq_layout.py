"""Production IVF-PQ layout proof: codes written partitioned by IVF cell
turn the candidate restriction into PARTITION PRUNING — the claim in
operators/pq.ivf_pq_search's docstring, demonstrated the same way
test_bucketed_diff.py proves the zero-exchange diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3bigdatasync_spark.operators import pq as pqm, prepared
from s3bigdatasync_spark.operators.similarity import ivf_assign

SF = "/root/testdata/sf0.001"


def test_cell_partitioned_codes_prune_to_nprobe(spark, tmp_path):
    emb = prepared(spark, SF).table("embeddings")
    C = pqm._train_codebook(spark, emb)
    codes = pqm._assign_codes(emb, spark, C)
    cells = ivf_assign(spark, SF).select("vec_id", F.col("assigned").alias("cell"))
    table = codes.join(cells, "vec_id")

    out = str(tmp_path / "ivfpq_codes")
    table.write.partitionBy("cell").parquet(out)

    stored = spark.read.parquet(out)
    n_cells = stored.select("cell").distinct().count()
    assert n_cells > pqm.IVF_NPROBE  # pruning must have something to prune

    probe = [r["cell"] for r in stored.select("cell").distinct().limit(pqm.IVF_NPROBE).collect()]
    q = stored.filter(F.col("cell").isin(probe))
    plan = q._jdf.queryExecution().executedPlan().toString()

    # the cell filter reaches the scan as a partition filter, not a data filter
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in pf

    # and the scan actually reads only the probed cells' files
    files_read = q.select(F.input_file_name()).distinct().collect()
    dirs = {f[0].split("/cell=")[1].split("/")[0] for f in files_read}
    assert dirs == {str(c) for c in probe}
