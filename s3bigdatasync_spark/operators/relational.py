"""Relational completeness: ROLLUP subtotals, pivot, set operations,
deterministic sampling, equi-depth histograms.

SURVEY §2.D notes the reference has no grouping sets/rollup/cube and §2.G no
set operators; a user switching to this engine expects them, and each has a
clean distributed story (rollup = one pass with grouping-id expansion; pivot
= conditional aggregation; set ops = hash joins; sampling = pure hash
predicate — no RNG, repartition-stable, pushable into the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared
from .prefix import with_global_ntile
from ..views import oracle_cte


def inventory_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (storage_class, is_multipart_uploaded): per-group, per-class
    subtotal, and grand-total rows in one pass — the multi-level stat the
    reference fakes with separate accumulator dicts."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    return (
        inv.rollup("storage_class", "is_multipart_uploaded")
        .agg(F.count("*").alias("n_objects"), F.sum("size").alias("total_size"))
    )


_ROLLUP_SQL = oracle_cte("inventory_src") + """
SELECT storage_class, is_multipart_uploaded,
       count(*) AS n_objects, cast(sum(size) AS BIGINT) AS total_size
FROM inventory_src
GROUP BY ROLLUP (storage_class, is_multipart_uploaded)
"""

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly × event-type pivot as conditional aggregation (the portable,
    scale-stable form — a real pivot with unknown key cardinality needs a
    driver-side distinct first; fixed columns don't)."""
    ev = prepared(spark, sf_dir).table("events")
    hour = (F.col("ts").cast("long") / 3600).cast("long") * 3600
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in _EVENT_TYPES
    ]
    return ev.withColumn("hour", hour).groupBy("hour").agg(*aggs)


_EVENTS_PIVOT_SQL = (
    "SELECT (epoch_us(ts) // 1000000) // 3600 * 3600 AS hour,\n"
    + ",\n".join(
        f"  cast(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in _EVENT_TYPES
    )
    + "\nFROM events GROUP BY 1"
)


def snapshot_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit set operations over the two snapshots' key sets: EXCEPT
    (src-only), INTERSECT (both), reverse EXCEPT (dst-only) — the diff's
    class counts derived through set algebra instead of the outer join."""
    spark = prepared(spark, sf_dir)
    src = spark.table("inventory_src").select("key")
    dst = spark.table("inventory_dst").select("key")
    rows = [
        ("src_only", src.exceptAll(dst)),
        ("both", src.intersect(dst)),
        ("dst_only", dst.exceptAll(src)),
    ]
    out = None
    for name, df in rows:
        c = df.agg(F.count("*").alias("n_keys")).select(
            F.lit(name).alias("set_op"), "n_keys"
        )
        out = c if out is None else out.unionByName(c)
    return out


_SET_OPS_SQL = oracle_cte("inventory_src", "inventory_dst") + """
SELECT 'src_only' AS set_op, count(*) AS n_keys FROM
  (SELECT key FROM inventory_src EXCEPT ALL SELECT key FROM inventory_dst)
UNION ALL
SELECT 'both', count(*) FROM
  (SELECT key FROM inventory_src INTERSECT SELECT key FROM inventory_dst)
UNION ALL
SELECT 'dst_only', count(*) FROM
  (SELECT key FROM inventory_dst EXCEPT ALL SELECT key FROM inventory_src)
"""

SAMPLE_PCT = 5  # percent


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based deterministic sampling: keep rows where the first 4 md5 hex
    chars of the key fall under pct% of the 16-bit space. Unlike TABLESAMPLE
    this is stable across runs/partitionings/engines, composable (the same
    predicate always selects the same keys), and pushes into the scan."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    bucket = F.conv(F.substring(F.md5(F.col("key")), 1, 4), 16, 10).cast("long")
    keep = bucket < int(65536 * SAMPLE_PCT / 100)
    return inv.filter(keep).select("key", "size")


_SAMPLE_SQL = oracle_cte("inventory_src") + f"""
SELECT key, size FROM inventory_src
WHERE (instr('0123456789abcdef', substr(md5(key), 1, 1)) - 1) * 4096
    + (instr('0123456789abcdef', substr(md5(key), 2, 1)) - 1) * 256
    + (instr('0123456789abcdef', substr(md5(key), 3, 1)) - 1) * 16
    + (instr('0123456789abcdef', substr(md5(key), 4, 1)) - 1)
    < {int(65536 * SAMPLE_PCT / 100)}
"""


def size_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram: ntile(10) over (size, key) — unique composite
    order so tile assignment is engine-deterministic; distributed ntile via
    operators.prefix (no single-partition window)."""
    inv = prepared(spark, sf_dir).table("inventory_src").select("key", "size")
    tiled = with_global_ntile(inv, ["size", "key"], 10)
    return (
        tiled.withColumnRenamed("tile", "decile")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_objects"),
            F.min("size").alias("min_size"),
            F.max("size").alias("max_size"),
        )
    )


_DECILES_SQL = oracle_cte("inventory_src") + """
SELECT decile, count(*) AS n_objects, min(size) AS min_size, max(size) AS max_size
FROM (SELECT key, size, ntile(10) OVER (ORDER BY size, key) AS decile FROM inventory_src)
GROUP BY decile
"""


QUERIES = {
    "inventory_rollup": inventory_rollup,
    "events_pivot": events_pivot,
    "snapshot_set_ops": snapshot_set_ops,
    "deterministic_sample": deterministic_sample,
    "size_deciles": size_deciles,
}

ORACLES = {
    "inventory_rollup": _ROLLUP_SQL,
    "events_pivot": _EVENTS_PIVOT_SQL,
    "snapshot_set_ops": _SET_OPS_SQL,
    "deterministic_sample": _SAMPLE_SQL,
    "size_deciles": _DECILES_SQL,
}
