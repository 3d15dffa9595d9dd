"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (J4 inventory diff summary) at sf0.001.
queries()      — every implemented operator from SURVEY.md §2 (+ LLM-data ops).
oracle_sql()   — DuckDB-equivalent SQL per query (omitted → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from s3bigdatasync_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the J4 inventory diff (New/Update/Delete classification) —
    the reference's declared-but-never-built dst-diff analysis (README.md:12),
    as one full-outer join over the sf0.001 tables."""
    from s3bigdatasync_spark.operators.joins import diff_summary

    return diff_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
