"""s3bigdatasync_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference S3 cross-region sync pipeline
(soldierxue/s3bigdatasync), re-expressed Spark-first.

Layout:
    session.py     SparkSession factory tuned for large-scale parquet analytics
    schemas.py     StructTypes for the reference's native tables (SURVEY §1)
    views.py       portable SQL derivations of native tables from testdata
    sources/       manifest/CSV(.gz)/glob readers (SURVEY §2 A1-A7)
    operators/     the operator library (SURVEY §2 C/D/E/F/G + LLM-data ops)
    functions/     scalar/pandas UDFs (SURVEY §2 H)
    plans/         end-to-end pipelines (SURVEY §3)
    streaming/     Structured Streaming variants (D4/D5, task queue)
"""

__version__ = "0.1.0"
