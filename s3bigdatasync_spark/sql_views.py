"""SQL surface: every operator as a queryable temp view.

The reference has no SQL interface at all (SURVEY §3: "no query language, no
IR"); this engine's DataFrame programs are logical plans, so exposing them as
views is free — `spark.sql("SELECT * FROM inventory_diff_v WHERE variance =
'New'")` composes with further Catalyst optimization (filters push INTO the
view's plan).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import registry
from .views import register_all

VIEW_SUFFIX = "_v"


def register_query_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables, derived reference-native views, and one temp
    view per registry query (named `<query>_v`). Returns the view names."""
    register_all(spark, sf_dir)
    names = []
    for name, fn in registry.full_queries().items():
        view = f"{name}{VIEW_SUFFIX}"
        fn(spark, sf_dir).createOrReplaceTempView(view)
        names.append(view)
    return names
