"""SQL surface: operators compose with further SQL and Catalyst pushes
predicates into the view plans."""

from __future__ import annotations

from s3bigdatasync_spark.sql_views import register_query_views


def test_views_register_and_compose(spark, sf_dir):
    names = register_query_views(spark, sf_dir)
    assert "inventory_diff_v" in names and "size_histogram_v" in names
    new = spark.sql(
        "SELECT count(*) AS n FROM inventory_diff_v WHERE variance = 'New'"
    ).collect()[0]["n"]
    bycls = {
        r["variance"]: r["n_objects"]
        for r in spark.sql("SELECT * FROM diff_summary_v").collect()
    }
    assert new == bycls["New"] > 0

    # composed query over two operator views
    joined = spark.sql(
        """
        SELECT q.doc_id FROM quality_score_v q
        JOIN lang_id_v l USING (doc_id)
        WHERE q.keep AND l.pred_lang <> 'und'
        """
    )
    assert joined.count() > 0


def test_filter_pushes_into_view(spark, sf_dir):
    register_query_views(spark, sf_dir)
    plan = (
        spark.sql("SELECT key FROM large_object_outliers_v WHERE size > 6000000000")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "DataFilters: [" in scan  # predicate reached the scan inside the view
