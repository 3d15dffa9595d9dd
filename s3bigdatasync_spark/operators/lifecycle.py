"""Storage-lifecycle planning over the inventory — the cost-hygiene half of
the reference's declared "quantify cost" goal (reference README.md:4; the
repo ships no implementation). Two planners, both pure Catalyst scans + one
small-cardinality rollup (≤ #classes × #age-buckets rows), so they run at any
inventory scale with one partial-aggregated exchange:

  mpu_orphan_sweep — incomplete multipart uploads (the stringly
      is_multipart_uploaded/replication_status flags the reference's executor
      writes, TaskExecutor/TaskExecutor.py:58-64) grouped by storage class
      and age bucket with their monthly carrying cost: the accounting behind
      an abort-incomplete-multipart-upload lifecycle rule.
  lifecycle_transition_plan — age/size-based storage-class transition
      recommendations with integer micro-USD monthly-savings estimates.
      Transitions are one-way colder (never Glacier→Standard) and objects
      under the 128 KiB IA/Glacier minimum-billable size never transition —
      the two real S3 lifecycle constraints people forget.

Money math: per-GiB-month prices are integer micro-USD constants; the only
float ops are one division by 2^30 (exact in IEEE) and one multiply, then
round(6) — the same expression tree in both engines, so the oracle agrees
bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared
from ..views import oracle_cte

# Published-rate-shaped per-GiB-month storage prices in micro-USD
# (illustrative, not a price sheet — same stance as operators/cost.py).
PRICE_MICRO_PER_GIB_MONTH = {"STANDARD": 23_000, "STANDARD_IA": 12_500, "GLACIER": 4_000}
_CLASS_RANK = {"STANDARD": 0, "STANDARD_IA": 1, "GLACIER": 2}
IA_MIN_BYTES = 128 * 1024  # IA/Glacier minimum billable object size
AGE_CUTOFF = "2002-01-01"  # fixed reference date: testdata ships 1992-2001
_GIB = float(1 << 30)


def _age_days():
    return F.datediff(F.lit(AGE_CUTOFF).cast("date"), F.col("last_modified").cast("date"))


_AGE_SQL = f"datediff('day', cast(last_modified AS DATE), DATE '{AGE_CUTOFF}')"

# shared age buckets (label, lower-inclusive bound in days)
AGE_BUCKETS = [("under_1y", 0), ("1y_2y", 365), ("2y_5y", 730), ("over_5y", 1825)]


def _age_bucket(age):
    b = F.lit(AGE_BUCKETS[0][0])
    for label, lo in AGE_BUCKETS[1:]:
        b = F.when(age >= lo, label).otherwise(b)
    return b


def _age_bucket_sql() -> str:
    whens = "\n".join(
        f"       WHEN {_AGE_SQL} >= {lo} THEN '{label}'"
        for label, lo in reversed(AGE_BUCKETS[1:])
    )
    return f"CASE\n{whens}\n       ELSE '{AGE_BUCKETS[0][0]}' END"


def _price_col(cls_col):
    p = F.lit(None).cast("long")
    for cls, micro in PRICE_MICRO_PER_GIB_MONTH.items():
        p = F.when(cls_col == cls, F.lit(micro)).otherwise(p)
    return p


def _price_sql(cls_expr: str) -> str:
    whens = " ".join(
        f"WHEN '{c}' THEN {m}" for c, m in PRICE_MICRO_PER_GIB_MONTH.items()
    )
    return f"CASE {cls_expr} {whens} END"


def mpu_orphan_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incomplete multipart uploads (multipart flag set, replication never
    completed) by storage class × age bucket, with object count, bytes, and
    monthly carrying cost — the report an abort-incomplete-MPU lifecycle
    rule is justified with."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    orphans = inv.filter(
        (F.col("is_multipart_uploaded") == "true") & (F.col("replication_status") == "")
    )
    agg = orphans.groupBy(
        "storage_class", _age_bucket(_age_days()).alias("age_bucket")
    ).agg(F.count("*").alias("n_objects"), F.sum("size").alias("total_bytes"))
    monthly = F.round(
        F.col("total_bytes") / F.lit(_GIB) * _price_col(F.col("storage_class")) / 1e6, 6
    )
    return agg.select(
        "storage_class", "age_bucket", "n_objects", "total_bytes",
        monthly.alias("monthly_usd"),
    )


_MPU_SWEEP_SQL = oracle_cte("inventory_src") + f"""
SELECT storage_class, age_bucket, n_objects, total_bytes,
       round(total_bytes / {_GIB} * {_price_sql('storage_class')} / 1e6, 6)
         AS monthly_usd
FROM (
  SELECT storage_class,
         {_age_bucket_sql()} AS age_bucket,
         count(*) AS n_objects,
         cast(sum(size) AS BIGINT) AS total_bytes
  FROM inventory_src
  WHERE is_multipart_uploaded = 'true' AND replication_status = ''
  GROUP BY 1, 2
)
"""

# transition thresholds: colder targets for older data
TRANSITION_RULES = [("STANDARD_IA", 365), ("GLACIER", 730)]


def lifecycle_transition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (current → recommended) storage-class transition: object count,
    bytes, and monthly savings. One-way colder only (rank comparison) and
    sub-128KiB objects are pinned to their current class (IA/Glacier bill a
    128 KiB minimum — transitioning small objects RAISES cost)."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    age = _age_days()
    target = F.lit("STANDARD")
    for cls, days in TRANSITION_RULES:
        target = F.when(age >= days, cls).otherwise(target)
    target = F.when(F.col("size") < IA_MIN_BYTES, F.col("storage_class")).otherwise(target)
    cur_rank = _rank_col(F.col("storage_class"))
    tgt_rank = _rank_col(target)
    rec = F.when(tgt_rank > cur_rank, target).otherwise(F.col("storage_class"))
    planned = (
        inv.select(
            F.col("storage_class").alias("current_class"),
            rec.alias("recommended_class"),
            "size",
        )
        .filter(F.col("current_class") != F.col("recommended_class"))
        .groupBy("current_class", "recommended_class")
        .agg(F.count("*").alias("n_objects"), F.sum("size").alias("total_bytes"))
    )
    savings = F.round(
        F.col("total_bytes")
        / F.lit(_GIB)
        * (_price_col(F.col("current_class")) - _price_col(F.col("recommended_class")))
        / 1e6,
        6,
    )
    return planned.select(
        "current_class", "recommended_class", "n_objects", "total_bytes",
        savings.alias("monthly_savings_usd"),
    )


def _rank_col(cls_col):
    r = F.lit(None).cast("int")
    for cls, rank in _CLASS_RANK.items():
        r = F.when(cls_col == cls, F.lit(rank)).otherwise(r)
    return r


def _rank_sql(cls_expr: str) -> str:
    whens = " ".join(f"WHEN '{c}' THEN {r}" for c, r in _CLASS_RANK.items())
    return f"CASE {cls_expr} {whens} END"


_TARGET_SQL = (
    f"CASE WHEN size < {IA_MIN_BYTES} THEN storage_class "
    + " ".join(
        f"WHEN {_AGE_SQL} >= {days} THEN '{cls}'"
        for cls, days in reversed(TRANSITION_RULES)
    )
    + " ELSE 'STANDARD' END"
)

_TRANSITION_SQL = oracle_cte("inventory_src") + f"""
, planned AS (
  SELECT storage_class AS current_class,
         CASE WHEN {_rank_sql(_TARGET_SQL)} > {_rank_sql('storage_class')}
              THEN {_TARGET_SQL} ELSE storage_class END AS recommended_class,
         size
  FROM inventory_src
)
SELECT current_class, recommended_class,
       count(*) AS n_objects,
       cast(sum(size) AS BIGINT) AS total_bytes,
       round(cast(sum(size) AS BIGINT) / {_GIB}
             * ({_price_sql('current_class')} - {_price_sql('recommended_class')})
             / 1e6, 6) AS monthly_savings_usd
FROM planned
WHERE current_class <> recommended_class
GROUP BY 1, 2
"""


QUERIES = {
    "mpu_orphan_sweep": mpu_orphan_sweep,
    "lifecycle_transition_plan": lifecycle_transition_plan,
}

ORACLES = {
    "mpu_orphan_sweep": _MPU_SWEEP_SQL,
    "lifecycle_transition_plan": _TRANSITION_SQL,
}
