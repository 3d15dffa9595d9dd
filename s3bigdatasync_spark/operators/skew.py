"""Skew-aware aggregation (SURVEY §7.4 risk 5 / brief's salting requirement).

The sync workload's natural hot keys: one giant prefix owns most objects
(copy_log's object_key is user_id-derived — a handful of users dominate), and
>5 GB objects fan out into thousands of multipart part-copy tasks keyed by
object. A plain groupBy on such a key puts the hot key's entire volume on one
reducer.

`salted_hot_key_agg` is the canonical two-phase fix, expressed declaratively:

  phase 1: groupBy(key, salt = crc32(row-discriminator) % N) — partial
           aggregates spread across N reducers per key;
  phase 2: groupBy(key) over the partials — N small rows per key.

The result is bit-identical to the plain groupBy (sums of longs are
associative), so the oracle is just the plain GROUP BY — which IS the point:
salting is a physical rewrite, not a semantic one. AQE's skew-join splitting
covers joins; salting covers aggregations and is the pattern to reach for
when a 100 TB groupBy stalls on its last reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared
from ..views import oracle_cte

SALT_BUCKETS = 16


def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-object-key copy volume, two-phase salted (copy_log's object_key
    is user-derived with few distinct values — a genuinely skewed key)."""
    log = prepared(spark, sf_dir).table("copy_log")
    salt = F.crc32(F.col("etag").cast("binary")) % SALT_BUCKETS
    partial = (
        log.withColumn("salt", salt)
        .groupBy("object_key", "salt")
        .agg(
            F.sum("size").alias("p_size"),
            F.count("*").alias("p_num"),
            F.sum(F.when(F.col("replication_status") == 0, 1).otherwise(0)).alias("p_failed"),
        )
    )
    return (
        partial.groupBy("object_key")
        .agg(
            F.sum("p_size").alias("total_size"),
            F.sum("p_num").alias("n_copies"),
            F.sum("p_failed").alias("n_failed"),
        )
    )


# Oracle: the UNSALTED aggregation — salting must be semantically invisible.
_SALTED_AGG_SQL = oracle_cte("copy_log") + """
SELECT object_key,
       cast(sum(size) AS BIGINT) AS total_size,
       count(*) AS n_copies,
       cast(sum(CASE WHEN replication_status = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
FROM copy_log GROUP BY object_key
"""


QUERIES = {"salted_hot_key_agg": salted_hot_key_agg}
ORACLES = {"salted_hot_key_agg": _SALTED_AGG_SQL}
