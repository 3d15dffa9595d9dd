"""Star-schema analytics over the TPC-H-ish dimensions — the multi-way
broadcast-dimension join pattern (Catalyst broadcasts every dim, the fact
table never shuffles for the joins; the only exchange is the final groupBy).

Money math is summed as DECIMAL, not DOUBLE: double addition is
non-associative, so a parallel sum's value depends on partition order —
decimal sums are exact and engine-identical (cast to double only after the
aggregate). This is the same discipline a financial pipeline needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import prepared

# Integer-cents revenue: price (2dp) -> cents, discount (2dp) -> basis points,
# multiply as integers, divide at the very end. No double rounding anywhere —
# Spark's HALF_UP vs DuckDB's rounding diverge on the half-cent products a
# price*(1-discount) expression is full of.
_REVENUE_C = (
    "cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - cast(floor(l_discount * 100 + 0.5) AS BIGINT))"
)


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation for one region — lineitem ⋈
    orders ⋈ customer ⋈ nation ⋈ region with all dims broadcast."""
    spark = prepared(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    r = spark.table("region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.expr(f"sum({_REVENUE_C})") / 10000.0, 2).alias("revenue"),
        )
    )


_REVENUE_BY_NATION_SQL = f"""
SELECT n_name,
       count(*) AS n_lineitems,
       round(cast(sum({_REVENUE_C}) AS BIGINT) / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order value within each nation: star join +
    partitioned window rank (the per-group top-k shape; shuffles once on
    nation for the window, dims broadcast)."""
    spark = prepared(spark, sf_dir)
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(
            F.expr("sum(cast(round(o_totalprice, 2) AS DECIMAL(18,2)))")
            .cast("double")
            .alias("total_value"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("total_value"), "c_custkey")
    return (
        per_cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("n_name", "rank", "c_custkey", "c_name", "total_value", "n_orders")
    )


_TOP_CUSTOMERS_SQL = """
WITH per_cust AS (
  SELECT n_name, c_custkey, c_name,
         cast(sum(cast(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(*) AS n_orders
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey, c_name
)
SELECT n_name, rank, c_custkey, c_name, total_value, n_orders FROM (
  SELECT *, row_number() OVER (PARTITION BY n_name
                               ORDER BY total_value DESC, c_custkey) AS rank
  FROM per_cust
)
WHERE rank <= 3
"""


def order_priority_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order counts per priority (date_trunc + groupBy — the
    reporting rollup shape over the fact table's time dimension)."""
    o = prepared(spark, sf_dir).table("orders")
    return (
        o.withColumn("month", F.date_trunc("month", "o_orderdate").cast("long"))
        .groupBy("month", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr("sum(cast(round(o_totalprice, 2) AS DECIMAL(18,2)))")
            .cast("double")
            .alias("total_value"),
        )
    )


_ORDER_PRIORITY_SQL = """
SELECT epoch_us(date_trunc('month', o_orderdate)) // 1000000 AS month,
       o_orderpriority,
       count(*) AS n_orders,
       cast(sum(cast(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY 1, 2
"""


QUERIES = {
    "revenue_by_nation": revenue_by_nation,
    "top_customers_per_nation": top_customers_per_nation,
    "order_priority_trend": order_priority_trend,
}

ORACLES = {
    "revenue_by_nation": _REVENUE_BY_NATION_SQL,
    "top_customers_per_nation": _TOP_CUSTOMERS_SQL,
    "order_priority_trend": _ORDER_PRIORITY_SQL,
}
