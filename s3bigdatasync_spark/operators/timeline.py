"""Sync-lifecycle timeline operators — what a long-running sync service needs
once it has MANY snapshots and MANY copy attempts, not just one src/dst pair.

The reference's workflow already implies all three: it consumes dated diff
files spanning snapshot ranges (`...20230718-20230724-add.csv`,
AzureTaskProducer/largeInventoryDiffToSQS.py:33) but keeps no per-key history;
it redrives failed copies through a dead-letter queue with maxReceiveCount=3
(libs/sqs_utils.py:111-114, TaskExecutor/TaskExecutor.py:79-85) but has no
retry WORKLIST view; and it spreads load over randomly-picked queues
(ListProducer/ListProducer.py:112) precisely because hot key prefixes throttle
S3 — without ever measuring which prefixes are hot.

  * snapshot_history — SCD2 reconstruction over N inventory snapshots:
    per-key validity intervals [v_from, v_to] per etag run (gaps-and-islands:
    lag → change flag → running sum → group). ONE shuffle, keyed by object
    key; interval count is bounded by churn, not corpus size.
  * retry_worklist — keys whose LAST copy attempt failed, with exponential
    backoff scheduling. One map-side-combinable groupBy: the "last attempt"
    is max(struct(ts, etag, status)) — no window, no join.
  * hot_prefix_report — per-prefix load skew over the inventory: top-20
    prefixes by bytes with share and skew ratio vs the uniform-spread
    expectation. groupBy(prefix) + broadcast 1-row total; at 100 TB this is
    a map-side-combinable agg over however many prefixes exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import prepared, scoped_cache
from ..views import _KEY, _SIZE, oracle_cte

# --- snapshot_history: SCD2 intervals over three derived snapshots ----------

# Three inventory snapshots derived from lineitem with one portable SQL text
# (same rules as views.INVENTORY_SRC/DST_SQL): presence grows monotonically
# (late creates), and a deterministic ~3.5% of keys drift their etag at v2
# (returnflag R) or v3 (returnflag A) — the churn whose history we keep.
_CHURN2 = "(l_returnflag = 'R' AND l_partkey % 7 = 0)"
_CHURN3 = "(l_returnflag = 'A' AND l_partkey % 7 = 0)"

_N_VERSIONS = 3

_VERSIONS_SQL = f"""
SELECT {_KEY} AS key, 1 AS v, md5({_KEY}) AS etag, {_SIZE} AS size
FROM lineitem WHERE l_linenumber NOT IN (1, 2)
UNION ALL
SELECT {_KEY} AS key, 2 AS v,
       CASE WHEN {_CHURN2} THEN md5(concat({_KEY}, '#v2')) ELSE md5({_KEY}) END AS etag,
       {_SIZE} AS size
FROM lineitem WHERE l_linenumber <> 1
UNION ALL
SELECT {_KEY} AS key, 3 AS v,
       CASE WHEN {_CHURN2} THEN md5(concat({_KEY}, '#v2'))
            WHEN {_CHURN3} THEN md5(concat({_KEY}, '#v3'))
            ELSE md5({_KEY}) END AS etag,
       {_SIZE} AS size
FROM lineitem
""".strip()


def _versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The N-snapshot version relation from ONE lineitem scan: each row
    emits its (v, etag) entries via explode instead of a 3-branch UNION that
    would scan (and at testbed scale, widen-shuffle) the table three times.
    The oracle keeps the equivalent UNION ALL text (_VERSIONS_SQL) — same
    rows, different physical shape."""
    li = prepared(spark, sf_dir).table("lineitem")
    key, size = F.expr(_KEY), F.expr(_SIZE)
    churn2, churn3 = F.expr(_CHURN2), F.expr(_CHURN3)
    e1 = F.md5(key)
    e2 = F.when(churn2, F.md5(F.concat(key, F.lit("#v2")))).otherwise(F.md5(key))
    e3 = (
        F.when(churn2, F.md5(F.concat(key, F.lit("#v2"))))
        .when(churn3, F.md5(F.concat(key, F.lit("#v3"))))
        .otherwise(F.md5(key))
    )
    entries = F.array(
        F.when(
            ~F.col("l_linenumber").isin(1, 2),
            F.struct(F.lit(1).alias("v"), e1.alias("etag")),
        ),
        F.when(
            F.col("l_linenumber") != 1,
            F.struct(F.lit(2).alias("v"), e2.alias("etag")),
        ),
        F.struct(F.lit(3).alias("v"), e3.alias("etag")),
    )
    return (
        li.select(key.alias("key"), size.alias("size"), F.explode(entries).alias("e"))
        .filter(F.col("e").isNotNull())
        .select("key", F.col("e.v").alias("v"), F.col("e.etag").alias("etag"), "size")
    )


def collapse_runs(versions: DataFrame) -> DataFrame:
    """Gaps-and-islands over any (key, v, etag, size) presence relation:
    collapse consecutive same-etag versions into runs. A run ALSO breaks on a
    presence gap (v > lag(v) + 1): a key deleted in one snapshot and
    recreated later with the same etag is two runs, not one continuous
    interval — absence closes the interval, exactly like S3 versioning's
    delete markers. One hash shuffle keyed by `key`; both windows and the
    collapse aggregate reuse that partitioning.

    A snapshot lists each (key, v, etag) once: exact-duplicate listings (the
    same composite key twice in one inventory — one exists at sf0.001)
    collapse first (min size), otherwise peer rows corrupt the running-sum
    run ids. Conflicting etags at the SAME version survive the collapse and
    deterministically break continuity (the window tie-breaks on etag and a
    same-v neighbor fails the v = lag(v)+1 test) — a listing anomaly closes
    the interval rather than silently merging.

    Plan-shape note (measured, 30× probe): a sort-free reformulation —
    groupBy(key).collect_list + in-array fold — was tried and REVERTED: with
    millions of groups ObjectHashAggregate falls back to sort-based
    aggregation under the default fallbackThreshold (128 keys), so the sort
    happens anyway and the array build/fold adds ~33% on top (23.3s vs 17.5s
    at 30× sf0.1). The lag/running-sum windows below are the faster shape;
    the real at-scale lever is bucketing the snapshot store by key, which
    removes the exchange (tests/test_bucketed_diff.py pattern)."""
    versions = versions.groupBy("key", "v", "etag").agg(
        F.min("size").alias("size")
    )
    wk = Window.partitionBy("key").orderBy("v", "etag")
    lag_etag, lag_v = F.lag("etag").over(wk), F.lag("v").over(wk)
    marked = versions.withColumn(
        "new_run",
        F.when(
            lag_etag.isNull()
            | (lag_etag != F.col("etag"))
            | (F.col("v") != lag_v + 1),
            1,
        ).otherwise(0),
    )
    runs = marked.withColumn("run_id", F.sum("new_run").over(wk))
    return runs.groupBy("key", "run_id", "etag").agg(
        F.min("v").alias("v_from"),
        F.max("v").alias("v_to"),
        F.min("size").alias("size"),
    )


def _version_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collapse_runs over the derived snapshot relation."""
    return collapse_runs(_versions(spark, sf_dir))


def snapshot_history_merge(
    runs: DataFrame, snapshot: DataFrame, v: int
) -> DataFrame:
    """Incremental SCD2 maintenance: fold snapshot version `v` (key, etag,
    size rows) into an existing run relation WITHOUT recomputing history —
    at production scale the run table holds years of churn and a new
    inventory arrives daily; recollapsing every version each time is O(all
    history), this merge is O(snapshot + churn).

    Rules (proven equivalent to collapse_runs on the full version relation in
    tests/test_new_ops.py::test_snapshot_history_merge_equivalence):
      * (key, etag) matches a run open at v-1 (v_to = v-1) → extend it
        (v_to := v, size := least) — run_id unchanged.
      * otherwise → open a new run [v, v] with run_id = per-key max + 1
        (several new etags for one key number off in etag order, matching
        collapse_runs' (v, etag) window order).
      * keys absent from the snapshot need no touch at all: their intervals
        are already closed implicitly by v_to < v.

    Equivalence caveat: if a key anomalously lists TWO different etags in one
    snapshot, collapse_runs' strictly-sequential fold breaks the run of the
    etag that sorts after the intruder, while this merge extends any etag
    still present at v-1. A real inventory lists one etag per key per
    snapshot (the fileSchema guarantees it), so the two agree on every
    well-formed relation — the merge's behavior is the principled one for
    the anomaly, and the difference is pinned in the test.

    Every join/agg is keyed by `key` (or key+etag), so all stages co-partition
    with the run table's natural layout; the only ordered operation is the
    per-key etag numbering WITHIN one snapshot (almost always a single row),
    never over history."""
    snap = snapshot.groupBy("key", "etag").agg(F.min("size").alias("s_size"))
    open_runs = runs.filter(F.col("v_to") == v - 1).select(
        "key", "etag", "run_id", "v_from", F.col("size").alias("r_size")
    )
    ext = snap.join(open_runs, ["key", "etag"]).select(
        "key",
        "run_id",
        "etag",
        "v_from",
        F.lit(v).cast("int").alias("v_to"),
        F.least("r_size", "s_size").alias("size"),
    )
    unmatched = snap.join(open_runs, ["key", "etag"], "left_anti")
    max_run = runs.groupBy("key").agg(F.max("run_id").alias("max_run"))
    wk = Window.partitionBy("key").orderBy("etag")
    new = (
        unmatched.join(max_run, "key", "left")
        .select(
            "key",
            (
                F.coalesce(F.col("max_run"), F.lit(0))
                + F.row_number().over(wk)
            ).cast("long").alias("run_id"),
            "etag",
            F.lit(v).cast("int").alias("v_from"),
            F.lit(v).cast("int").alias("v_to"),
            F.col("s_size").alias("size"),
        )
    )
    untouched = runs.join(ext.select("key", "run_id"), ["key", "run_id"], "left_anti")
    return untouched.unionByName(ext).unionByName(new)


def snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key etag validity intervals across snapshot versions, restricted to
    keys that actually changed (≥2 runs) — the SCD2 answer to "when did this
    object change and what did it change from".

    Gaps-and-islands: one window partitioned by key (one hash shuffle),
    change-flag via lag, run ids via running sum, then a groupBy collapse per
    run. Nothing is ever ordered globally; at 100 TB the shuffle is keyed by
    object key exactly like the flagship diff."""
    hist = _version_runs(spark, sf_dir)
    n_runs = F.count("*").over(Window.partitionBy("key"))
    return (
        hist.withColumn("n_runs", n_runs)
        .filter(F.col("n_runs") > 1)
        .select(
            "key",
            "etag",
            F.col("v_from").cast("int").alias("v_from"),
            F.col("v_to").cast("int").alias("v_to"),
            F.when(F.col("run_id") == 1, F.lit("create"))
            .otherwise(F.lit("update"))
            .alias("change"),
        )
    )


_SNAPSHOT_HISTORY_SQL = f"""
WITH versions AS (
{_VERSIONS_SQL}
),
versions_d AS (
  SELECT key, v, etag FROM versions GROUP BY 1, 2, 3
),
marked AS (
  SELECT key, v, etag,
         CASE WHEN lag(etag) OVER (PARTITION BY key ORDER BY v, etag) IS NULL
                OR lag(etag) OVER (PARTITION BY key ORDER BY v, etag) <> etag
                OR v <> lag(v) OVER (PARTITION BY key ORDER BY v, etag) + 1
              THEN 1 ELSE 0 END AS new_run
  FROM versions_d
),
runs AS (
  SELECT key, v, etag,
         sum(new_run) OVER (PARTITION BY key ORDER BY v, etag) AS run_id
  FROM marked
),
hist AS (
  SELECT key, run_id, etag, min(v) AS v_from, max(v) AS v_to
  FROM runs GROUP BY key, run_id, etag
)
SELECT key, etag, cast(v_from AS INT) AS v_from, cast(v_to AS INT) AS v_to,
       CASE WHEN run_id = 1 THEN 'create' ELSE 'update' END AS change
FROM (SELECT *, count(*) OVER (PARTITION BY key) AS n_runs FROM hist)
WHERE n_runs > 1
"""


# --- retry_worklist: last-attempt-failed keys with backoff ------------------

_MAX_BACKOFF = 5  # cap: 2^5 minutes; reference redrives after 3 receives


def retry_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-retry worklist: every key whose most recent attempt failed, with
    attempt counts and an exponential-backoff next-attempt time.

    One groupBy over copy_log: the latest attempt per key is
    max(struct(ts, etag, status)) — a map-side-combinable agg, deterministic
    because (ts, etag) is unique per attempt. No window, no self-join; at
    100 TB this is a single shuffle keyed by object key."""
    cl = prepared(spark, sf_dir).table("copy_log")
    agg = cl.groupBy("object_key").agg(
        F.count("*").alias("n_attempts"),
        F.sum(
            F.when(F.col("replication_status") == 0, 1).otherwise(0)
        ).alias("n_failures"),
        F.max(
            F.struct(
                F.col("replication_time").cast("long").alias("ts"),
                F.col("etag"),
                F.col("replication_status").alias("status"),
            )
        ).alias("last"),
    )
    backoff = F.least(F.col("n_failures"), F.lit(_MAX_BACKOFF)).cast("int")
    return (
        agg.filter(F.col("last.status") == 0)
        .select(
            "object_key",
            F.col("n_attempts").cast("long").alias("n_attempts"),
            F.col("n_failures").cast("long").alias("n_failures"),
            F.col("last.ts").alias("last_ts"),
            backoff.alias("backoff_bucket"),
            (
                F.col("last.ts")
                + F.lit(60) * F.floor(F.pow(F.lit(2.0), backoff)).cast("long")
            ).alias("next_attempt_ts"),
        )
    )


_RETRY_WORKLIST_SQL = oracle_cte("copy_log") + f"""
, attempts AS (
  SELECT object_key,
         epoch_us(replication_time) // 1000000 AS ts,
         etag, replication_status
  FROM copy_log
),
agg AS (
  SELECT object_key,
         count(*) AS n_attempts,
         sum(CASE WHEN replication_status = 0 THEN 1 ELSE 0 END) AS n_failures
  FROM attempts GROUP BY object_key
),
last AS (
  SELECT object_key, ts AS last_ts, replication_status AS last_status
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY object_key ORDER BY ts DESC, etag DESC
    ) AS rn FROM attempts
  ) WHERE rn = 1
)
SELECT a.object_key,
       cast(a.n_attempts AS BIGINT) AS n_attempts,
       cast(a.n_failures AS BIGINT) AS n_failures,
       l.last_ts,
       cast(least(a.n_failures, {_MAX_BACKOFF}) AS INT) AS backoff_bucket,
       l.last_ts + 60 * cast(floor(pow(2.0, least(a.n_failures, {_MAX_BACKOFF}))) AS BIGINT)
         AS next_attempt_ts
FROM agg a JOIN last l USING (object_key)
WHERE l.last_status = 0
"""


# --- hot_prefix_report: per-prefix load skew --------------------------------

_TOP_PREFIXES = 20
_HOT_SKEW = 2.0  # a prefix carrying >2x its uniform share is "hot"


def hot_prefix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 key prefixes by bytes with share-of-total and skew ratio vs the
    uniform-spread expectation — the hotspot detector that tells a sync
    planner which prefixes to shard further (S3 throttles per prefix; the
    reference's random queue spread is the blind version of this).

    groupBy(prefix) with map-side combine, then one broadcast of the 1-row
    totals; top-k via TakeOrderedAndProject. Division before the prefix-count
    multiply keeps the skew ratio in double range at any byte scale."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    # cache: by_pfx feeds both the top-k projection and the totals broadcast;
    # without the pin the inventory scan+agg executes twice. The cached
    # relation is one row per prefix — tiny at any corpus scale.
    by_pfx = (
        inv.select(F.substring("key", 1, 2).alias("prefix"), "size")
        .groupBy("prefix")
        .agg(F.count("*").alias("n_objects"), F.sum("size").alias("bytes"))
        .transform(scoped_cache)
    )
    totals = by_pfx.agg(
        F.sum("bytes").alias("total_bytes"), F.count("*").alias("n_prefixes")
    )
    share = F.round(F.col("bytes") / F.col("total_bytes"), 6)
    skew = F.round(F.col("bytes") / F.col("total_bytes") * F.col("n_prefixes"), 6)
    return (
        by_pfx.crossJoin(F.broadcast(totals))
        .select(
            "prefix",
            "n_objects",
            "bytes",
            share.alias("share"),
            skew.alias("skew_ratio"),
            (skew > _HOT_SKEW).alias("hot"),
        )
        .orderBy(F.desc("bytes"), "prefix")
        .limit(_TOP_PREFIXES)
    )


_HOT_PREFIX_SQL = oracle_cte("inventory_src") + f"""
, by_pfx AS (
  SELECT substring(key, 1, 2) AS prefix,
         count(*) AS n_objects,
         cast(sum(size) AS BIGINT) AS bytes
  FROM inventory_src GROUP BY 1
),
totals AS (
  SELECT cast(sum(bytes) AS BIGINT) AS total_bytes, count(*) AS n_prefixes
  FROM by_pfx
)
SELECT prefix, n_objects, bytes,
       round(bytes / total_bytes, 6) AS share,
       round(bytes / total_bytes * n_prefixes, 6) AS skew_ratio,
       round(bytes / total_bytes * n_prefixes, 6) > {_HOT_SKEW} AS hot
FROM by_pfx, totals
ORDER BY bytes DESC, prefix
LIMIT {_TOP_PREFIXES}
"""


# --- retention_sweep: noncurrent-version cleanup accounting ------------------


def retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noncurrent-version cleanup plan: every etag run that ended before the
    latest snapshot is a superseded copy still occupying storage — group them
    by the version they expired after and report count + reclaimable bytes.
    This is the S3 lifecycle `NoncurrentVersionExpiration` decision computed
    from data instead of guessed: the input is the same one-shuffle run
    relation as snapshot_history, the rollup is a ≤(N_VERSIONS-1)-row agg."""
    runs = _version_runs(spark, sf_dir)
    return (
        runs.filter(F.col("v_to") < _N_VERSIONS)
        .groupBy(F.col("v_to").cast("int").alias("expire_after_v"))
        .agg(
            F.count("*").alias("n_versions"),
            F.sum("size").alias("bytes_reclaimable"),
        )
    )


_RETENTION_SWEEP_SQL = f"""
WITH versions AS (
{_VERSIONS_SQL}
),
versions_d AS (
  SELECT key, v, etag, min(size) AS size FROM versions GROUP BY 1, 2, 3
),
marked AS (
  SELECT key, v, etag, size,
         CASE WHEN lag(etag) OVER (PARTITION BY key ORDER BY v, etag) IS NULL
                OR lag(etag) OVER (PARTITION BY key ORDER BY v, etag) <> etag
                OR v <> lag(v) OVER (PARTITION BY key ORDER BY v, etag) + 1
              THEN 1 ELSE 0 END AS new_run
  FROM versions_d
),
runs AS (
  SELECT key, v, etag, size,
         sum(new_run) OVER (PARTITION BY key ORDER BY v, etag) AS run_id
  FROM marked
),
hist AS (
  SELECT key, run_id, etag, min(v) AS v_from, max(v) AS v_to, min(size) AS size
  FROM runs GROUP BY key, run_id, etag
)
SELECT cast(v_to AS INT) AS expire_after_v,
       count(*) AS n_versions,
       cast(sum(size) AS BIGINT) AS bytes_reclaimable
FROM hist WHERE v_to < {_N_VERSIONS}
GROUP BY 1
"""


# --- restore_plan: Glacier restore batching + fee estimate -------------------

# Retrieval pricing in micro-USD per GiB (published S3 Glacier Flexible
# Retrieval rates: Standard $0.01/GB, Bulk $0.0025/GB) and per restore
# request (Standard $0.05/1000 = 50 micro-USD). Integer micro-USD arithmetic
# end-to-end — money never touches a double (oracle-exact at any magnitude).
_RESTORE_RATES_MICRO_PER_GIB = {"Standard": 10_000, "Bulk": 2_500}
_REQUEST_FEE_MICRO = 50
_BULK_CUTOFF_BYTES = 1 << 30  # objects >= 1 GiB restore via Bulk
_GIB = 1 << 30


def restore_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restore plan for GLACIER-class objects: cross-region copy cannot read
    archived objects, so the sync must first issue restores (the reference
    carries StorageClass through its whole pipeline — manifest fileSchema,
    ListProducer/manifest.json:6 — but never plans for it). Tier selection is
    deterministic (>= 1 GiB restores Bulk, else Standard); fees are integer
    micro-USD: retrieval = bytes*rate div GiB summed per object, requests =
    n * 50. One pushed-down filter + one two-row agg — scan-shaped at any
    corpus size."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    bulk = _RESTORE_RATES_MICRO_PER_GIB["Bulk"]
    std = _RESTORE_RATES_MICRO_PER_GIB["Standard"]
    per_obj = inv.filter(F.col("storage_class") == "GLACIER").selectExpr(
        f"CASE WHEN size >= {_BULK_CUTOFF_BYTES} THEN 'Bulk' ELSE 'Standard' END AS tier",
        "size",
        f"(size * CASE WHEN size >= {_BULK_CUTOFF_BYTES} THEN {bulk} ELSE {std} END)"
        f" div {_GIB} AS fee_micro",
    )
    return (
        per_obj.groupBy("tier")
        .agg(
            F.count("*").alias("n_objects"),
            F.sum("size").alias("bytes"),
            F.sum("fee_micro").alias("retrieval_fee_micro_usd"),
            (F.count("*") * _REQUEST_FEE_MICRO).alias("request_fee_micro_usd"),
        )
        .select(
            "tier",
            "n_objects",
            "bytes",
            "retrieval_fee_micro_usd",
            "request_fee_micro_usd",
            (
                F.col("retrieval_fee_micro_usd") + F.col("request_fee_micro_usd")
            ).alias("total_fee_micro_usd"),
        )
    )


_RESTORE_PLAN_SQL = oracle_cte("inventory_src") + f"""
, per_obj AS (
  SELECT CASE WHEN size >= {_BULK_CUTOFF_BYTES} THEN 'Bulk' ELSE 'Standard' END AS tier,
         size,
         (size * CASE WHEN size >= {_BULK_CUTOFF_BYTES}
                      THEN {_RESTORE_RATES_MICRO_PER_GIB['Bulk']}
                      ELSE {_RESTORE_RATES_MICRO_PER_GIB['Standard']} END) // {_GIB}
           AS fee_micro
  FROM inventory_src WHERE storage_class = 'GLACIER'
)
SELECT tier,
       count(*) AS n_objects,
       cast(sum(size) AS BIGINT) AS bytes,
       cast(sum(fee_micro) AS BIGINT) AS retrieval_fee_micro_usd,
       cast(count(*) * {_REQUEST_FEE_MICRO} AS BIGINT) AS request_fee_micro_usd,
       cast(sum(fee_micro) + count(*) * {_REQUEST_FEE_MICRO} AS BIGINT)
         AS total_fee_micro_usd
FROM per_obj GROUP BY tier
"""


QUERIES = {
    "snapshot_history": snapshot_history,
    "retry_worklist": retry_worklist,
    "hot_prefix_report": hot_prefix_report,
    "retention_sweep": retention_sweep,
    "restore_plan": restore_plan,
}

ORACLES = {
    "snapshot_history": _SNAPSHOT_HISTORY_SQL,
    "retry_worklist": _RETRY_WORKLIST_SQL,
    "hot_prefix_report": _HOT_PREFIX_SQL,
    "retention_sweep": _RETENTION_SWEEP_SQL,
    "restore_plan": _RESTORE_PLAN_SQL,
}
