"""Join-class operators (SURVEY §2 J1-J5, B1 batching, C-block expressions
they carry).

The reference expresses join semantics as row-at-a-time RPC lookups; here they
are real relational joins so Catalyst picks the physical strategy:
  * J1 dedup anti-join   — broadcast left-anti when the sent-log is small;
                           at 100 TB the sent-log is bucketed by msg_id and
                           the join stays shuffle-free (SMJ on bucketed key).
  * J2 time spine        — generated spine is tiny → broadcast left join.
  * J4 inventory diff    — the flagship full-outer join; both snapshots are
                           shuffled on `key` once (AQE handles skew), then
                           classified with a single CASE. At 100 TB: partition
                           both inventories by bucket/key-prefix at write time
                           so the diff co-locates without a full shuffle.
  * J5 verification join — metadata-compare; broadcast the part-geometry side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import prepared, scoped_cache
from .prefix import load_table_layout, with_global_order
from ..views import oracle_cte

# --- B1 + J1: task batching and idempotent dispatch -------------------------

BATCH_SIZE = 100  # message_body_max_num, ListProducer/ListProducer.py:17


def task_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: group the dispatch worklist into ≤100-object messages.

    Reference buffers 100 rows then sends one SQS message
    (ListProducer.py:111-118). msg_id = md5 over batch content
    (inventory_lib.py:74 analogue, hardened with etag per SURVEY §7.4
    risk 4).
    """
    # A maintained range layout of inventory_src (sf_dir/_layouts/…, written
    # by `layout-rewrite --mode range`) supplies boundaries from its manifest
    # and skips the boundary-discovery job entirely; otherwise self-discover.
    layout = load_table_layout(spark, sf_dir, "inventory_src", ["key", "size"])
    if layout is not None:
        inv = layout[0].select("key", "size", "etag")
        ranked = with_global_order(inv, ["key", "size"], ranges=layout[1])
    else:
        inv = prepared(spark, sf_dir).table("inventory_src").select("key", "size", "etag")
        # Distributed global row numbers (operators.prefix — no single-partition
        # window anywhere in this engine). size tiebreaker: key alone is
        # non-unique at sf0.001 (views.py note); the colliding rows share etag
        # (= md5(key)) but differ in size, so (key, size) is a total order and
        # batch_size sums stay engine-unambiguous.
        ranked = with_global_order(inv, ["key", "size"])
    batches = (
        ranked.withColumn("batch_id", F.expr(f"global_rn div {BATCH_SIZE}"))
        .groupBy("batch_id")
        .agg(
            F.count("*").alias("n_objects"),
            F.sum("size").alias("batch_size"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws("#", "key", "etag"))))).alias(
                "msg_id"
            ),
        )
    )
    return batches


_TASK_BATCHES_SQL = oracle_cte("inventory_src") + f"""
SELECT batch_id,
       count(*) AS n_objects,
       cast(sum(size) AS BIGINT) AS batch_size,
       md5(string_agg(concat(key, '#', etag), ',' ORDER BY concat(key, '#', etag))) AS msg_id
FROM (
  SELECT *, (row_number() OVER (ORDER BY key, size) - 1) // {BATCH_SIZE} AS batch_id
  FROM inventory_src
)
GROUP BY batch_id
"""


def dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3: skip already-sent messages.

    Reference does a per-msg-id DynamoDB get_item ("已经发送" skip,
    inventory_lib.py:146-162). Here: left-anti join of new batches against the
    sent log. The sent log (every 3rd batch) is small → Catalyst broadcasts;
    at a billion-row sent-log, bucket both sides by msg_id.
    """
    # cache(): `batches` feeds both join sides; without it the whole
    # window+agg subtree executes twice (visible as 2x Window nodes in the
    # physical plan).
    batches = task_batches(spark, sf_dir).transform(scoped_cache)
    sent_log = batches.filter(F.col("batch_id") % 3 == 0).select("msg_id")
    return (
        batches.join(F.broadcast(sent_log), "msg_id", "left_anti")
        .select("batch_id", "msg_id", "n_objects", "batch_size")
    )


_DEDUP_ANTI_SQL = oracle_cte("inventory_src") + f"""
, batches AS (
  SELECT batch_id,
         count(*) AS n_objects,
         cast(sum(size) AS BIGINT) AS batch_size,
         md5(string_agg(concat(key, '#', etag), ',' ORDER BY concat(key, '#', etag))) AS msg_id
  FROM (
    SELECT *, (row_number() OVER (ORDER BY key, size) - 1) // {BATCH_SIZE} AS batch_id
    FROM inventory_src
  )
  GROUP BY batch_id
), sent_log AS (SELECT msg_id FROM batches WHERE batch_id % 3 = 0)
SELECT batch_id, msg_id, n_objects, batch_size
FROM batches WHERE msg_id NOT IN (SELECT msg_id FROM sent_log)
"""


# --- J2: dense time-spine left join + zero-fill ------------------------------

SPINE_START = "2024-01-15 07:00:00"  # an hour inside the events range


def time_spine_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 60-minute dashboard spine with zero-filled empty minutes
    (UICenter/BackEnd/ddbModel.py:252-275). The spine is generated
    (sequence+explode), broadcast to the per-minute agg."""
    log = prepared(spark, sf_dir).table("copy_log")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(SPINE_START)),
                F.to_timestamp(F.lit(SPINE_START)) + F.expr("INTERVAL 59 MINUTES"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute")
    )
    per_min = (
        log.withColumn("minute", F.date_trunc("minute", F.col("replication_time")))
        .groupBy("minute")
        .agg(
            F.sum(F.when(F.col("replication_status") == 1, F.col("size")).otherwise(0)).alias(
                "s_size"
            ),
            F.sum(F.when(F.col("replication_status") == 1, 1).otherwise(0)).alias("s_num"),
            F.sum(F.when(F.col("replication_status") == 0, F.col("size")).otherwise(0)).alias(
                "f_size"
            ),
            F.sum(F.when(F.col("replication_status") == 0, 1).otherwise(0)).alias("f_num"),
        )
    )
    return (
        spine.join(per_min, "minute", "left")
        .select(
            F.col("minute").cast("long").alias("minute_ts"),
            F.coalesce("s_size", F.lit(0)).alias("success_object_size"),
            F.coalesce("s_num", F.lit(0)).alias("success_object_num"),
            F.coalesce("f_size", F.lit(0)).alias("failed_object_size"),
            F.coalesce("f_num", F.lit(0)).alias("failed_object_num"),
        )
    )


_TIME_SPINE_SQL = oracle_cte("copy_log") + f"""
, spine AS (
  SELECT unnest(generate_series(TIMESTAMP '{SPINE_START}',
                                TIMESTAMP '{SPINE_START}' + INTERVAL 59 MINUTE,
                                INTERVAL 1 MINUTE)) AS minute
), per_min AS (
  SELECT date_trunc('minute', replication_time) AS minute,
         cast(sum(CASE WHEN replication_status = 1 THEN size ELSE 0 END) AS BIGINT) AS s_size,
         cast(sum(CASE WHEN replication_status = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s_num,
         cast(sum(CASE WHEN replication_status = 0 THEN size ELSE 0 END) AS BIGINT) AS f_size,
         cast(sum(CASE WHEN replication_status = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f_num
  FROM copy_log GROUP BY 1
)
SELECT epoch_us(spine.minute) // 1000000 AS minute_ts,
       coalesce(s_size, 0) AS success_object_size,
       coalesce(s_num, 0) AS success_object_num,
       coalesce(f_size, 0) AS failed_object_size,
       coalesce(f_num, 0) AS failed_object_num
FROM spine LEFT JOIN per_min ON spine.minute = per_min.minute
"""


# --- J4: the flagship inventory diff -----------------------------------------


def _diff_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 diff base — shared by inventory_diff and diff_summary. No final
    sort anywhere: the correctness gate hashes order-insensitively, and a
    global sort on a full diff result is exactly the shuffle you don't do at
    100 TB (downstream consumers re-partition for their own needs anyway)."""
    spark = prepared(spark, sf_dir)
    src = spark.table("inventory_src").select(
        F.col("key"),
        F.col("size").alias("src_size"),
        F.col("etag").alias("src_etag"),
    )
    dst = spark.table("inventory_dst").select(
        F.col("key"),
        F.col("size").alias("dst_size"),
        F.col("etag").alias("dst_etag"),
    )
    joined = src.join(dst, "key", "full_outer")
    return (
        joined.withColumn(
            "variance",
            F.when(F.col("dst_etag").isNull(), "New")
            .when(F.col("src_etag").isNull(), "Delete")
            .when(
                (F.col("src_etag") != F.col("dst_etag"))
                | (F.col("src_size") != F.col("dst_size")),
                "Update",
            )
            .otherwise("Same"),
        )
        .filter(F.col("variance") != "Same")
        .select("key", "src_size", "dst_size", "variance")
    )


def inventory_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: src-vs-dst snapshot diff → Variance ∈ {New, Update, Delete}.

    The reference consumes these diff rows but never computes them
    (diff_azure_inventory_sqs.py:26-35, README.md:12); this is the declared
    dst-diff analysis as one full-outer join. Scale shape: single shuffle on
    `key` for both sides (AQE skew-split); with bucketed inventory tables the
    shuffle disappears entirely.
    """
    return _diff_base(spark, sf_dir)


_INVENTORY_DIFF_SQL = oracle_cte("inventory_src", "inventory_dst") + """
, src AS (SELECT key, size AS src_size, etag AS src_etag FROM inventory_src),
  dst AS (SELECT key, size AS dst_size, etag AS dst_etag FROM inventory_dst)
SELECT coalesce(src.key, dst.key) AS key, src_size, dst_size,
       CASE WHEN dst_etag IS NULL THEN 'New'
            WHEN src_etag IS NULL THEN 'Delete'
            WHEN src_etag <> dst_etag OR src_size <> dst_size THEN 'Update'
       END AS variance
FROM src FULL OUTER JOIN dst ON src.key = dst.key
WHERE (CASE WHEN dst_etag IS NULL THEN 'New'
            WHEN src_etag IS NULL THEN 'Delete'
            WHEN src_etag <> dst_etag OR src_size <> dst_size THEN 'Update'
            ELSE 'Same' END) <> 'Same'
"""


def diff_apply_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff invertibility proof: APPLYING the computed J4 diff to the dst
    snapshot must reconstruct src exactly — the property that makes the diff
    a sufficient sync plan (ship only New/Update payloads + Delete keys, and
    the replica converges). Reconstruction: dst minus (Update ∪ Delete keys),
    plus src rows for (New ∪ Update keys); mismatches counted via symmetric
    anti-joins on the full (key, size, etag) identity.

    One-row report — n_missing/n_extra MUST be 0 and invertible true; a
    nonzero value at production scale means the diff and the copier disagree
    about object identity (the class of bug the reference can't detect).
    Scale: reuses the diff's single shuffle; the anti-joins co-partition on
    the same key."""
    p = prepared(spark, sf_dir)
    src = p.table("inventory_src").select("key", "size", "etag")
    dst = p.table("inventory_dst").select("key", "size", "etag")
    diff = _diff_base(spark, sf_dir).select("key", "variance").transform(scoped_cache)
    touched = diff.filter(F.col("variance").isin("Update", "Delete")).select("key")
    incoming = diff.filter(F.col("variance").isin("New", "Update")).select("key")
    reconstructed = (
        dst.join(touched, "key", "left_anti")
        .unionByName(src.join(incoming, "key", "left_semi"))
    )
    n_missing = src.join(reconstructed, ["key", "size", "etag"], "left_anti").count()
    n_extra = reconstructed.join(src, ["key", "size", "etag"], "left_anti").count()
    row = [
        (
            src.count(),
            dst.count(),
            reconstructed.count(),
            n_missing,
            n_extra,
            n_missing == 0 and n_extra == 0,
        )
    ]
    return spark.createDataFrame(
        row,
        "n_src long, n_dst long, n_reconstructed long,"
        " n_missing long, n_extra long, invertible boolean",
    )


_DIFF_APPLY_SQL = oracle_cte("inventory_src", "inventory_dst") + """
, src AS (SELECT key, size, etag FROM inventory_src),
  dst AS (SELECT key, size, etag FROM inventory_dst),
  diff AS (
    SELECT coalesce(s.key, d.key) AS key,
           CASE WHEN d.etag IS NULL THEN 'New'
                WHEN s.etag IS NULL THEN 'Delete'
                WHEN s.etag <> d.etag OR s.size <> d.size THEN 'Update'
                ELSE 'Same' END AS variance
    FROM src s FULL OUTER JOIN dst d ON s.key = d.key
  ),
  touched AS (SELECT key FROM diff WHERE variance IN ('Update', 'Delete')),
  incoming AS (SELECT key FROM diff WHERE variance IN ('New', 'Update')),
  reconstructed AS (
    SELECT * FROM dst WHERE key NOT IN (SELECT key FROM touched)
    UNION ALL
    SELECT * FROM src WHERE key IN (SELECT key FROM incoming)
  )
SELECT (SELECT count(*) FROM src) AS n_src,
       (SELECT count(*) FROM dst) AS n_dst,
       (SELECT count(*) FROM reconstructed) AS n_reconstructed,
       (SELECT count(*) FROM (SELECT * FROM src EXCEPT ALL SELECT * FROM reconstructed)) AS n_missing,
       (SELECT count(*) FROM (SELECT * FROM reconstructed EXCEPT ALL SELECT * FROM src)) AS n_extra,
       (SELECT count(*) FROM (SELECT * FROM src EXCEPT ALL SELECT * FROM reconstructed)) = 0
       AND (SELECT count(*) FROM (SELECT * FROM reconstructed EXCEPT ALL SELECT * FROM src)) = 0
         AS invertible
"""


def diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 rollup: object count + bytes to move per variance class — the
    reference's cost-estimation input (README.md:4 item 4)."""
    d = _diff_base(spark, sf_dir)
    return (
        d.groupBy("variance")
        .agg(
            F.count("*").alias("n_objects"),
            F.sum(F.coalesce("src_size", F.lit(0))).alias("bytes_to_move"),
        )
    )


_DIFF_SUMMARY_SQL = oracle_cte("inventory_src", "inventory_dst") + """
, src AS (SELECT key, size AS src_size, etag AS src_etag FROM inventory_src),
  dst AS (SELECT key, size AS dst_size, etag AS dst_etag FROM inventory_dst),
  diff AS (
    SELECT coalesce(src.key, dst.key) AS key, src_size,
           CASE WHEN dst_etag IS NULL THEN 'New'
                WHEN src_etag IS NULL THEN 'Delete'
                WHEN src_etag <> dst_etag OR src_size <> dst_size THEN 'Update'
                ELSE 'Same' END AS variance
    FROM src FULL OUTER JOIN dst ON src.key = dst.key
  )
SELECT variance, count(*) AS n_objects,
       cast(sum(coalesce(src_size, 0)) AS BIGINT) AS bytes_to_move
FROM diff WHERE variance <> 'Same'
GROUP BY variance
"""


# --- J5: verification join ----------------------------------------------------


def verification_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: per-object src/dst metadata verification
    (AzureEtagCheck/etag_app.py:62-146): null-key coalesce (C7, 185-187),
    mtime/size compare (93-94), multipart part math (C17, 38-52).

    The ETag byte-level recompute is the pandas UDF in functions/etag.py
    (exercised in tests); this query is the metadata-compare plan that feeds
    it. At 100 TB the metadata fetch is a pre-materialized table, so this
    stays a pure columnar join — no RPC in the hot path.
    """
    t = prepared(spark, sf_dir).table("etag_check_input")
    return (
        t.select(
            F.coalesce("s3_key", "blob_name").alias("object_key"),
            "storage_account",
            "s3_size",
            "blob_size",
            F.when(F.col("blob_size") != F.col("s3_size"), "SIZE_MISMATCH")
            .when(F.col("blob_mtime") > F.col("s3_mtime"), "SRC_NEWER")
            .otherwise("OK")
            .alias("check_result"),
            # zero-byte guard: ceil(0/ps)=0 with 0%ps==0 would report the
            # inconsistent geometry (parts_count=0, last_part_size=part_size),
            # corrupting an ETag recompute. An empty object is ONE empty part
            # — matches functions/etag.parts_props: (1, 0).
            F.when(F.col("s3_size") == 0, F.lit(1).cast("long"))
            .otherwise(F.ceil(F.col("s3_size") / F.col("part_size")).cast("long"))
            .alias("parts_count"),
            F.when(F.col("s3_size") == 0, F.lit(0).cast("long"))
            .when(F.col("s3_size") % F.col("part_size") == 0, F.col("part_size"))
            .otherwise(F.col("s3_size") % F.col("part_size"))
            .alias("last_part_size"),
        )
    )


_VERIFICATION_SQL = oracle_cte("etag_check_input") + """
SELECT coalesce(s3_key, blob_name) AS object_key,
       storage_account, s3_size, blob_size,
       CASE WHEN blob_size <> s3_size THEN 'SIZE_MISMATCH'
            WHEN blob_mtime > s3_mtime THEN 'SRC_NEWER'
            ELSE 'OK' END AS check_result,
       CASE WHEN s3_size = 0 THEN 1
            ELSE cast(ceil(s3_size / part_size) AS BIGINT) END AS parts_count,
       CASE WHEN s3_size = 0 THEN 0
            WHEN s3_size % part_size = 0 THEN part_size
            ELSE s3_size % part_size END AS last_part_size
FROM etag_check_input
"""




# --- As-of join (brief's example of an operator Spark lacks natively) -------


def asof_last_success(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join as a composition of existing DataFrame ops: for every
    FAILED copy, the timestamp of the most recent PRIOR success for the same
    object_key (the retry-diagnosis query: "when did this object last work?").

    Spark has no asof-join operator; the composition is the standard one —
    union both sides ordered by time, carry `last(success_ts, ignorenulls)`
    over a per-key window, keep the failure rows. One shuffle on object_key;
    no range explosion, no per-row lookups.
    """
    log = prepared(spark, sf_dir).table("copy_log")
    ts = F.col("replication_time").cast("long")
    tagged = log.select(
        "object_key",
        "etag",
        ts.alias("ts"),
        "replication_status",
        F.when(F.col("replication_status") == 1, ts).alias("success_ts"),
    )
    w = (
        Window.partitionBy("object_key")
        .orderBy("ts", "etag")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.withColumn("last_success_ts", F.last("success_ts", ignorenulls=True).over(w))
        .filter(F.col("replication_status") == 0)
        .select(
            "object_key",
            "etag",
            F.col("ts").alias("failed_ts"),
            "last_success_ts",
            (F.col("ts") - F.col("last_success_ts")).alias("staleness_s"),
        )
    )


_ASOF_SQL = oracle_cte("copy_log") + """
SELECT object_key, etag, failed_ts, last_success_ts,
       failed_ts - last_success_ts AS staleness_s
FROM (
  SELECT object_key, etag,
         epoch_us(replication_time) // 1000000 AS failed_ts,
         replication_status,
         last_value(CASE WHEN replication_status = 1
                         THEN epoch_us(replication_time) // 1000000 END IGNORE NULLS)
           OVER (PARTITION BY object_key
                 ORDER BY epoch_us(replication_time) // 1000000, etag
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_success_ts
  FROM copy_log
)
WHERE replication_status = 0
"""




# --- Range / interval join (bucket-and-refine) ------------------------------

N_MAINT_WINDOWS = 20
MAINT_BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC
MAINT_SPACING_S = 130000       # ~36h apart across the events month
MAINT_DURATION_S = 7200        # 2h windows
_BUCKET_S = 3600


def interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join done scalably: events falling inside maintenance windows.

    A naive theta join (ts BETWEEN start AND end) is a cartesian product at
    scale. The distributed pattern: explode each interval into the hour
    buckets it covers, equi-join events on their bucket (hash join — no
    cartesian), then refine with the exact range predicate. Windows are
    deterministic integer arithmetic so the oracle replays them.
    """
    ev = prepared(spark, sf_dir).table("events")
    win = spark.range(N_MAINT_WINDOWS).select(
        F.col("id").alias("window_id"),
        (F.lit(MAINT_BASE_EPOCH) + F.col("id") * MAINT_SPACING_S).alias("w_start"),
        (F.lit(MAINT_BASE_EPOCH) + F.col("id") * MAINT_SPACING_S + MAINT_DURATION_S).alias(
            "w_end"
        ),
    )
    win_buckets = win.select(
        "window_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.expr(f"w_start div {_BUCKET_S}"), F.expr(f"w_end div {_BUCKET_S}")
            )
        ).alias("bucket"),
    )
    ev_b = ev.select(
        F.col("event_id"),
        F.col("ts").cast("long").alias("ts_s"),
        F.col("value"),
    ).withColumn("bucket", F.expr(f"ts_s div {_BUCKET_S}"))
    joined = ev_b.join(F.broadcast(win_buckets), "bucket").filter(
        (F.col("ts_s") >= F.col("w_start")) & (F.col("ts_s") < F.col("w_end"))
    )
    return joined.groupBy("window_id", "w_start").agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("cast(floor(value * 100) AS BIGINT)")).alias("value_cents"),
    )


_INTERVAL_JOIN_SQL = f"""
WITH win AS (
  SELECT w_id AS window_id,
         {MAINT_BASE_EPOCH} + w_id * {MAINT_SPACING_S} AS w_start,
         {MAINT_BASE_EPOCH} + w_id * {MAINT_SPACING_S} + {MAINT_DURATION_S} AS w_end
  FROM (SELECT unnest(generate_series(0, {N_MAINT_WINDOWS - 1})) AS w_id)
)
SELECT window_id, w_start,
       count(*) AS n_events,
       cast(sum(cast(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events JOIN win
  ON epoch_us(ts) // 1000000 >= w_start AND epoch_us(ts) // 1000000 < w_end
GROUP BY window_id, w_start
"""


QUERIES = {
    "task_batches": task_batches,
    "asof_last_success": asof_last_success,
    "interval_bucket_join": interval_bucket_join,
    "dedup_anti_join": dedup_anti_join,
    "time_spine_zero_fill": time_spine_zero_fill,
    "inventory_diff": inventory_diff,
    "diff_summary": diff_summary,
    "diff_apply_check": diff_apply_check,
    "verification_join": verification_join,
}

ORACLES = {
    "task_batches": _TASK_BATCHES_SQL,
    "asof_last_success": _ASOF_SQL,
    "interval_bucket_join": _INTERVAL_JOIN_SQL,
    "dedup_anti_join": _DEDUP_ANTI_SQL,
    "time_spine_zero_fill": _TIME_SPINE_SQL,
    "inventory_diff": _INVENTORY_DIFF_SQL,
    "diff_summary": _DIFF_SUMMARY_SQL,
    "diff_apply_check": _DIFF_APPLY_SQL,
    "verification_join": _VERIFICATION_SQL,
}
