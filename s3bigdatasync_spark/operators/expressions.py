"""Scalar expression operators (SURVEY §2 C1-C17, H4-H6).

Every recode/branch/build the reference does per-row in Python is a JVM-side
Catalyst expression here — whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared
from ..views import oracle_cte


def variance_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 + C9 + C10 + C11 + C14: the diff-ingestion projection.

    Per-row in the reference: uppercase the Variance, branch to
    DeleteBlob/PutBlob (diff_azure_inventory_sqs.py:60-63), build the blob
    endpoint (C9, :53), construct the event JSON (C11, inventory_lib.py:62-100)
    and its md5 message id (C10, :74), int-coerce Content-Length (C14,
    largeInventoryDiffToSQS.py:106-111).
    """
    d = prepared(spark, sf_dir).table("azure_inventory_diff")
    endpoint = F.concat(F.lit("https://"), "storage_account", F.lit(".blob.core.windows.net"))
    event_type = F.when(
        F.upper("variance") == "DELETE", "Microsoft.Storage.BlobDeleted"
    ).otherwise("Microsoft.Storage.BlobCreated")
    return (
        d.select(
            "name",
            endpoint.alias("endpoint"),
            event_type.alias("event_type"),
            F.md5(F.concat(endpoint, F.col("name"), event_type)).alias("msg_id"),
            F.col("content_length").cast("long").alias("content_length"),
        )
    )


_VARIANCE_BRANCH_SQL = oracle_cte("azure_inventory_diff") + """
SELECT name,
       concat('https://', storage_account, '.blob.core.windows.net') AS endpoint,
       CASE WHEN upper(variance) = 'DELETE' THEN 'Microsoft.Storage.BlobDeleted'
            ELSE 'Microsoft.Storage.BlobCreated' END AS event_type,
       md5(concat(
         concat('https://', storage_account, '.blob.core.windows.net'),
         name,
         CASE WHEN upper(variance) = 'DELETE' THEN 'Microsoft.Storage.BlobDeleted'
              ELSE 'Microsoft.Storage.BlobCreated' END)) AS msg_id,
       cast(content_length AS BIGINT) AS content_length
FROM azure_inventory_diff
"""


def variance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 aggregate view: normalized variance class → row count + bytes
    (the per-class accumulators, diff_azure_inventory_sqs.py:83-84)."""
    d = prepared(spark, sf_dir).table("azure_inventory_diff")
    return (
        d.groupBy(F.upper("variance").alias("variance_class"))
        .agg(F.count("*").alias("n_rows"), F.sum("content_length").alias("total_bytes"))
    )


_VARIANCE_COUNTS_SQL = oracle_cte("azure_inventory_diff") + """
SELECT upper(variance) AS variance_class, count(*) AS n_rows,
       cast(sum(content_length) AS BIGINT) AS total_bytes
FROM azure_inventory_diff GROUP BY 1
"""


def key_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/H4 + C16: URL-decode object keys and parse s3:// URLs.

    Reference: unquote_plus on every key (ListProducer.py:26-27,50); s3 URL
    split (TaskExecutor.py:113-114). We materialize an encoded form
    (spaces→'+', '/'→'%2F') then decode with the JVM url_decode — the oracle
    applies the equivalent replace chain.
    """
    inv = prepared(spark, sf_dir).table("inventory_src")
    enc = F.concat(F.lit("dir+name%2F"), F.col("key"))
    url = F.concat(F.lit("s3://"), F.col("bucket"), F.lit("/"), F.col("key"))
    return (
        inv.select(
            enc.alias("encoded_key"),
            F.url_decode(enc).alias("decoded_key"),
            F.regexp_extract(url, r"^s3://([^/]+)/(.*)$", 1).alias("url_bucket"),
            F.regexp_extract(url, r"^s3://([^/]+)/(.*)$", 2).alias("url_key"),
        )
        .orderBy("encoded_key")
        .limit(1000)
    )


_KEY_DECODE_SQL = oracle_cte("inventory_src") + """
SELECT encoded_key,
       replace(replace(encoded_key, '+', ' '), '%2F', '/') AS decoded_key,
       regexp_extract(url, '^s3://([^/]+)/(.*)$', 1) AS url_bucket,
       regexp_extract(url, '^s3://([^/]+)/(.*)$', 2) AS url_key
FROM (
  SELECT concat('dir+name%2F', key) AS encoded_key,
         concat('s3://', bucket, '/', key) AS url
  FROM inventory_src
)
ORDER BY encoded_key LIMIT 1000
"""


def status_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 + C13 + C15: flag recodes, minute-floor bucket, bytes→human unit.

    'true'/'false' string → bool and ''-vs-set status → 0/1
    (TaskExecutor.py:58-64); minute floor (s3_monitor_statistic.py:27-36);
    human-size when-ladder (common.js:75-93).
    """
    inv = prepared(spark, sf_dir).table("inventory_src")
    size = F.col("size")
    human = (
        F.when(size >= 1024**3, F.concat(F.round(size / 1024**3, 2).cast("string"), F.lit(" GB")))
        .when(size >= 1024**2, F.concat(F.round(size / 1024**2, 2).cast("string"), F.lit(" MB")))
        .when(size >= 1024, F.concat(F.round(size / 1024, 2).cast("string"), F.lit(" KB")))
        .otherwise(F.concat(size.cast("string"), F.lit(" B")))
    )
    return (
        inv.select(
            "key",
            (F.col("is_multipart_uploaded") == "true").alias("is_multipart"),
            F.when(F.col("replication_status") != "", 1).otherwise(0).alias("replicated"),
            F.date_trunc("minute", F.col("last_modified")).cast("long").alias("modified_minute"),
            human.alias("human_size"),
        )
        .orderBy("key")
        .limit(2000)
    )


_STATUS_RECODE_SQL = oracle_cte("inventory_src") + """
SELECT key,
       is_multipart_uploaded = 'true' AS is_multipart,
       CASE WHEN replication_status <> '' THEN 1 ELSE 0 END AS replicated,
       epoch_us(date_trunc('minute', last_modified)) // 1000000 AS modified_minute,
       CASE WHEN size >= 1073741824 THEN concat(cast(round(size / 1073741824, 2) AS STRING), ' GB')
            WHEN size >= 1048576 THEN concat(cast(round(size / 1048576, 2) AS STRING), ' MB')
            WHEN size >= 1024 THEN concat(cast(round(size / 1024, 2) AS STRING), ' KB')
            ELSE concat(cast(size AS STRING), ' B') END AS human_size
FROM inventory_src
ORDER BY key LIMIT 2000
"""


def event_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 + H5 + C12: construct the nested BlobCreated/BlobDeleted event
    document (constructSQSMsg, inventory_lib.py:62-100) as to_json(struct),
    with ISO-8601 event time formatting (C12, inventory_lib.py:65-67).
    JSON text is byte-identical across engines (compact, insertion-ordered)."""
    d = prepared(spark, sf_dir).table("azure_inventory_diff")
    endpoint = F.concat(F.lit("https://"), "storage_account", F.lit(".blob.core.windows.net"))
    event_type = F.when(
        F.upper("variance") == "DELETE", "Microsoft.Storage.BlobDeleted"
    ).otherwise("Microsoft.Storage.BlobCreated")
    api = F.when(F.upper("variance") == "DELETE", "DeleteBlob").otherwise("PutBlob")
    doc = F.to_json(
        F.struct(
            endpoint.alias("topic"),
            F.concat(F.lit("/"), "name").alias("subject"),
            event_type.alias("eventType"),
            F.date_format("last_modified", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("eventTime"),
            F.md5(F.concat(endpoint, F.col("name"), event_type)).alias("id"),
            F.struct(
                api.alias("api"),
                F.col("content_length").alias("contentLength"),
                F.concat(endpoint, F.lit("/"), "name").alias("url"),
            ).alias("data"),
        )
    )
    return d.select("name", doc.alias("event"))


_EVENT_JSON_SQL = oracle_cte("azure_inventory_diff") + """
SELECT name,
       to_json(struct_pack(
         topic := concat('https://', storage_account, '.blob.core.windows.net'),
         subject := concat('/', name),
         eventType := CASE WHEN upper(variance) = 'DELETE'
                           THEN 'Microsoft.Storage.BlobDeleted'
                           ELSE 'Microsoft.Storage.BlobCreated' END,
         eventTime := strftime(last_modified, '%Y-%m-%dT%H:%M:%SZ'),
         id := md5(concat(concat('https://', storage_account, '.blob.core.windows.net'),
                          name,
                          CASE WHEN upper(variance) = 'DELETE'
                               THEN 'Microsoft.Storage.BlobDeleted'
                               ELSE 'Microsoft.Storage.BlobCreated' END)),
         data := struct_pack(
           api := CASE WHEN upper(variance) = 'DELETE' THEN 'DeleteBlob' ELSE 'PutBlob' END,
           contentLength := content_length,
           url := concat(concat('https://', storage_account, '.blob.core.windows.net'), '/', name))
       )) AS event
FROM azure_inventory_diff
"""


QUERIES = {
    "variance_branch": variance_branch,
    "event_json": event_json,
    "variance_counts": variance_counts,
    "key_decode": key_decode,
    "status_recode": status_recode,
}

ORACLES = {
    "variance_branch": _VARIANCE_BRANCH_SQL,
    "event_json": _EVENT_JSON_SQL,
    "variance_counts": _VARIANCE_COUNTS_SQL,
    "key_decode": _KEY_DECODE_SQL,
    "status_recode": _STATUS_RECODE_SQL,
}
