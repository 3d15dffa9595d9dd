"""Operator library — one module per SURVEY.md §2 family.

Each module exports:
    QUERIES: dict[name -> Callable[(SparkSession, sf_dir) -> DataFrame]]
    ORACLES: dict[name -> DuckDB SQL str]   (omitted keys → rows-only check)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..views import register_all

_PREPARED: set[tuple[int, str]] = set()


def prepared(spark: SparkSession, sf_dir: str) -> SparkSession:
    """Ensure base + derived temp views are registered for sf_dir (cached).

    The existence probe guards against a recycled id() from a NEW session
    (temp views are per-session) — cache says prepared, catalog disagrees.
    """
    key = (id(spark), sf_dir)
    if key not in _PREPARED or not spark.catalog.tableExists("inventory_src"):
        register_all(spark, sf_dir)
        _PREPARED.clear()  # one sf_dir active per session at a time
        _PREPARED.add(key)
    return spark


