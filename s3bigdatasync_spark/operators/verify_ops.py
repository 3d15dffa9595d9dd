"""Object-verification operators (SURVEY §2 J5 + H1-H3) over synthetic
payloads — the engine-side half of AzureEtagCheck.

`etag_props` is fully oracle-checked (parts math + single-part etag).
`multipart_etag` runs the real raw-digest-chain algorithm (H2) via the
pandas UDF; DuckDB's md5() is VARCHAR-only, so md5 over raw digest bytes is
not expressible in oracle SQL. The oracle instead hash-compares against an
expected-output fixture (tests/fixtures/etag_expected.parquet) computed by
plain hashlib with no Spark in the loop (tests/gen_etag_fixture.py), joined
on (doc_id, md5(text)) so the same SQL is correct at any testdata sf.
tests/test_etag.py additionally pins the algorithm for all part geometries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared
from ..functions.etag import make_multipart_etag_udf

PART_SIZE = 256  # bytes — small so testdata documents span 1..3 parts


def etag_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 + single-part H2: multipart geometry for each document payload
    (payload = utf-8 text; ascii, so octet length == char length) and the
    etag of single-part objects."""
    docs = prepared(spark, sf_dir).table("documents")
    size = F.length("text")
    parts = F.ceil(size / F.lit(PART_SIZE)).cast("int")
    return docs.select(
        "doc_id",
        size.cast("long").alias("payload_size"),
        parts.alias("parts_count"),
        (size - (parts - 1) * F.lit(PART_SIZE)).cast("long").alias("last_part_size"),
        F.when(parts == 1, F.md5(F.col("text"))).alias("single_part_etag"),
    )


_ETAG_PROPS_SQL = f"""
SELECT doc_id,
       length(text) AS payload_size,
       cast(ceil(length(text) / {PART_SIZE}.0) AS INT) AS parts_count,
       length(text) - (cast(ceil(length(text) / {PART_SIZE}.0) AS INT) - 1) * {PART_SIZE} AS last_part_size,
       CASE WHEN ceil(length(text) / {PART_SIZE}.0) = 1 THEN md5(text) END AS single_part_etag
FROM documents
"""


_MULTIPART_ETAG_SQL = """
SELECT DISTINCT d.doc_id, f.etag
FROM documents d
JOIN read_parquet('/root/repo/tests/fixtures/etag_expected.parquet') f
  ON f.doc_id = d.doc_id AND f.text_md5 = md5(d.text)
"""


def multipart_etag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 full algorithm: raw-digest-chain multipart ETag over the payload
    bytes (Arrow-batched pandas UDF), reference algorithm at
    AzureEtagCheck/etag_app.py:38-52. Oracle: hashlib-precomputed expected
    etags (see module docstring)."""
    docs = prepared(spark, sf_dir).table("documents")
    etag_udf = make_multipart_etag_udf()
    return docs.select(
        "doc_id",
        etag_udf(F.encode("text", "UTF-8"), F.lit(PART_SIZE)).alias("etag"),
    )


QUERIES = {
    "etag_props": etag_props,
    "multipart_etag": multipart_etag,
}

ORACLES = {
    "etag_props": _ETAG_PROPS_SQL,
    "multipart_etag": _MULTIPART_ETAG_SQL,
}
