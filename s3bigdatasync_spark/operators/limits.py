"""Limits / bounded takes (SURVEY §2 F2-F3).

F3 (the GB-bounded dry-run cap, AzureTaskProducer config MAX_OBJ_TOTAL_*) is
the interesting one: a size-bounded take = running-sum window + filter, per
SURVEY §7.3 — no custom rule needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared
from .prefix import with_global_order
from ..views import oracle_cte


def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: bounded query (limit=100 page, UICenter/BackEnd/ddbModel.py:132-175).
    Spark plans this as TakeOrderedAndProject — no full sort materialization."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    return inv.select("key", "size", "etag").orderBy("key").limit(100)


_ORDER_LIMIT_SQL = oracle_cte("inventory_src") + """
SELECT key, size, etag FROM inventory_src ORDER BY key LIMIT 100
"""

MAX_TOTAL_BYTES = 50_000_000_000  # ≙ MAX_OBJ_TOTAL_SIZE cap (config.ini)
MAX_TOTAL_NUM = 2_000  # ≙ MAX_OBJ_TOTAL_NUM cap


def size_capped_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: early-exit caps on rows *and* cumulative bytes
    (diff_azure_inventory_sqs.py:86-87,102-103; largeInventoryDiffToSQS.py:129-140).

    Distributed running sum (operators.prefix two-phase) ordered by key,
    then filter — the deterministic bounded take without a single-partition
    window.
    """
    inv = prepared(spark, sf_dir).table("inventory_src").select("key", "size")
    # size tiebreaker: key alone is non-unique at sf0.001 (views.py note)
    ranked = with_global_order(inv, ["key", "size"], sum_col="size")
    return (
        ranked.withColumn("cum_bytes", F.col("global_cumsum_ex") + F.col("size"))
        .filter(
            (F.col("cum_bytes") <= MAX_TOTAL_BYTES)
            & (F.col("global_rn") + 1 <= MAX_TOTAL_NUM)
        )
        .select("key", "size", "cum_bytes")
        .orderBy("key")
    )


_SIZE_CAPPED_SQL = oracle_cte("inventory_src") + f"""
SELECT key, size, cum_bytes FROM (
  SELECT key, size,
         cast(sum(size) OVER (ORDER BY key, size ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes,
         row_number() OVER (ORDER BY key, size) AS rn
  FROM inventory_src
)
WHERE cum_bytes <= {MAX_TOTAL_BYTES} AND rn <= {MAX_TOTAL_NUM}
ORDER BY key
"""


QUERIES = {
    "order_limit": order_limit,
    "size_capped_take": size_capped_take,
}

ORACLES = {
    "order_limit": _ORDER_LIMIT_SQL,
    "size_capped_take": _SIZE_CAPPED_SQL,
}
