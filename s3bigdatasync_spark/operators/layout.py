"""Data-layout optimization operators: Z-order clustering and Bloom-filter
semi-join pruning — the two techniques that decide how much of 100 TB a
query actually reads.

The reference copies objects in arrival order and scans full inventories for
every diff (diff_azure_inventory_sqs.py walks both lists end-to-end); at
petabyte scale the wins come from (a) writing data so min/max file statistics
prune multi-dimensional predicates (Z-ordering, the OPTIMIZE ZORDER BY
pattern) and (b) shrinking the probe side of a selective join to candidates
before any shuffle happens (Bloom semi-join reduction, the runtime-filter
pattern Spark applies under AQE — here made explicit and engine-portable).

Both operators are fully deterministic (bit interleaving; md5-derived hash
positions) so DuckDB executes the identical computation for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared, scoped_cache
from ..views import oracle_cte

# --- Z-order clustering ------------------------------------------------------

# 16 bits per dimension; z-values are 32-bit. Buckets: size in MiB (caps at
# 64 GiB-1), mtime in days-since-epoch (fits 16 bits until year 2149).
_SIZE_SHIFT = 20  # 1 MiB units
# "file" = a z-prefix range: dropping the low 18 z-bits (9 per dimension)
# yields ~100-500 files across the testdata's occupied z-range — each file
# bounded in BOTH dimensions. A rewrite would repartitionByRange on z with
# the file count sized to data volume; the prefix grouping here is the
# deterministic stand-in that the oracle can replicate.
ZBUCKET_SHIFT = 18

_B_SIZE = f"least(size >> {_SIZE_SHIFT}, 65535)"

# day-since-epoch bucket, one per dialect (integer division spells differently)
_B_DAY_SPARK = "(cast(last_modified AS LONG) div 86400)"
_B_DAY_DUCK = "(epoch_us(last_modified) // 1000000 // 86400)"


def _interleave_sql(b1: str, b2: str) -> str:
    """32-bit Morton interleave: bit i of b1 -> bit 2i, bit i of b2 ->
    bit 2i+1. Pure integer arithmetic — parses and evaluates identically in
    Spark SQL and DuckDB."""
    terms = []
    for i in range(16):
        terms.append(f"((({b1}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({b2}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan a Z-ordered rewrite of the inventory: Morton-interleave
    (size-MiB, mtime-day) into a 32-bit z-value and summarize the top-8-bit
    z-prefix buckets — the "files" a Z-ordered OPTIMIZE would write.

    The per-bucket (min,max) of BOTH dimensions is the point: linear layouts
    cluster one dimension and leave the other spanning the full range, so a
    2-D predicate prunes nothing; Z-prefix buckets bound both, so file-level
    min/max statistics skip on either column (verified by
    tests/test_layout.py's pruning-effectiveness pin). The rewrite itself is
    one repartitionByRange(zvalue) — a single shuffle at any scale."""
    inv = prepared(spark, sf_dir).table("inventory_src").select("key", "size", "last_modified")
    z = _interleave_sql(_B_SIZE, _B_DAY_SPARK)
    day = (F.col("last_modified").cast("long") / 86400).cast("long")
    return (
        inv.withColumn("z", F.expr(z))
        .withColumn("zbucket", F.expr(f"z >> {ZBUCKET_SHIFT}"))
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_objects"),
            F.min("size").alias("min_size"),
            F.max("size").alias("max_size"),
            F.min(day).alias("min_day"),
            F.max(day).alias("max_day"),
        )
    )


_ZORDER_SQL = oracle_cte("inventory_src") + f"""
SELECT z >> {ZBUCKET_SHIFT} AS zbucket,
       count(*) AS n_objects,
       min(size) AS min_size, max(size) AS max_size,
       min(day) AS min_day, max(day) AS max_day
FROM (
  SELECT size, {_B_DAY_DUCK} AS day,
         {_interleave_sql(_B_SIZE, _B_DAY_DUCK)} AS z
  FROM inventory_src
)
GROUP BY 1
"""


# --- Bloom-filter semi-join pruning -----------------------------------------

# m = 2^16 bit positions, k = 3 salted md5 hashes. At the test scales the
# changed-key set is ~10% of the inventory -> fill ratio ~0.3, FP rate ~3%.
# At production scale m rises with the build side (m ~= 10 bits/key keeps
# FP ~1%); the positions relation stays megabytes — always broadcastable.
_BLOOM_K = 3


def _pos_spark(col: str, salt: int):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"bl{salt}#"), F.col(col))), 1, 4), 16, 10
    ).cast("long")


def _pos_sql(expr: str, salt: int) -> str:
    inner = f"md5(concat('bl{salt}#', {expr}))"
    return (
        "("
        + " + ".join(
            f"(instr('0123456789abcdef', substr({inner}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
            for i in range(4)
        )
        + ")"
    )


def bloom_semi_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction for the incremental-sync join: build a Bloom
    filter over the keys that changed in dst (etag/size drift), probe every
    src key through it, and report how much of the scan the filter admits.

    The probe side (600k rows here; multi-billion at 100 TB) is never
    shuffled OR joined: the filter is materialized as driver model state —
    the ≤ m distinct set positions are collected once (m = 2^16 is a layout
    CONSTANT, so this is a bounded, scale-independent collect, the same
    contract as the k-means/PQ centroid collects) and folded into an
    m/64-word bitmap shipped as one array<long> literal. Each src row then
    tests its three hash bits with pure codegen arithmetic
    ((word >> (pos & 63)) & 1 — arithmetic shift is safe: &1 reads one bit
    regardless of sign). r12 rewrite: the r11 shape ran the same filter as
    THREE chained broadcast left-semi hash joins — 3 broadcast builds + 3
    probe-side hash joins + a cached positions relation (8 shuffle + 6
    broadcast exchanges, 3.1 s execute at sf0.1); the bitmap literal is the
    same 8 KB of information without any join machinery. Deterministic and
    oracle-checkable (md5-derived positions, so DuckDB computes the
    identical filter, false positives and all)."""
    p = prepared(spark, sf_dir)
    src = p.table("inventory_src").select("key", "size", "etag")
    dst = p.table("inventory_dst").select(
        F.col("key").alias("d_key"), F.col("size").alias("d_size"), F.col("etag").alias("d_etag")
    )
    # cache: the build-side diff join feeds the position collect AND the
    # n_changed count — pin it so it executes once
    changed = (
        src.join(dst, src.key == dst.d_key)
        .filter((F.col("etag") != F.col("d_etag")) | (F.col("size") != F.col("d_size")))
        .select("key")
        .transform(scoped_cache)
    )
    pos_rows = (
        changed.select(
            F.explode(
                F.array(*[_pos_spark("key", j) for j in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (1 << 10)  # 2^16 bits / 64 = 1024 words (m fixed above)
    for r in pos_rows:
        words[r["pos"] >> 6] |= 1 << (r["pos"] & 63)
    # two's-complement fold so every word fits a Spark LongType literal
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = F.lit(words)

    def _hit(j: int):
        pos = _pos_spark("key", j)
        # F.shiftright requires a literal shift amount; the SQL function
        # accepts a column — call it directly for the per-row bit offset
        word = F.element_at(bitmap, F.shiftright(pos, 6).cast("int") + 1)
        bit = F.call_function("shiftright", word, (pos % 64).cast("int"))
        return bit.bitwiseAND(F.lit(1)) == 1

    pred = _hit(0)
    for j in range(1, _BLOOM_K):
        pred = pred & _hit(j)
    candidates = src.select("key").filter(pred)

    n_total = src.groupBy().agg(F.count("*").alias("n_total"))
    n_cand = candidates.groupBy().agg(F.count("*").alias("n_candidates"))
    n_changed = changed.groupBy().agg(F.count("*").alias("n_changed"))
    return (
        n_total.crossJoin(n_cand)
        .crossJoin(n_changed)
        .select(
            "n_total",
            "n_candidates",
            "n_changed",
            (F.col("n_candidates") - F.col("n_changed")).alias("n_false_positives"),
            F.round(
                (F.col("n_candidates") - F.col("n_changed"))
                / F.greatest(F.col("n_total") - F.col("n_changed"), F.lit(1)),
                6,
            ).alias("fp_rate"),
        )
    )


_BLOOM_SQL = oracle_cte("inventory_src", "inventory_dst") + f"""
, changed AS (
  SELECT s.key FROM inventory_src s JOIN inventory_dst d ON s.key = d.key
  WHERE s.etag <> d.etag OR s.size <> d.size
),
bits AS (
  {" UNION ".join(f"SELECT DISTINCT {_pos_sql('key', j)} AS pos FROM changed" for j in range(_BLOOM_K))}
),
cand AS (
  SELECT key FROM inventory_src
  WHERE {" AND ".join(f"{_pos_sql('key', j)} IN (SELECT pos FROM bits)" for j in range(_BLOOM_K))}
)
SELECT (SELECT count(*) FROM inventory_src) AS n_total,
       (SELECT count(*) FROM cand) AS n_candidates,
       (SELECT count(*) FROM changed) AS n_changed,
       (SELECT count(*) FROM cand) - (SELECT count(*) FROM changed) AS n_false_positives,
       round(((SELECT count(*) FROM cand) - (SELECT count(*) FROM changed))
             / greatest((SELECT count(*) FROM inventory_src) - (SELECT count(*) FROM changed), 1)::DOUBLE,
             6) AS fp_rate
"""


# --- bucket_skew_audit (round 3) ----------------------------------------------

N_BUCKETS = 32  # must match the bucketBy(32, key) layout SCALING.md measures


def bucket_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance audit for the key-bucketed layout SCALING.md measures: per
    md5-derived bucket, object count, bytes, and a hot flag (>1.25× the mean
    byte load). The zero-shuffle diff/snapshot plans are only as good as
    their worst bucket — a hot bucket is the straggler task at 100 TB, and
    this report is the evidence for choosing N_BUCKETS (or a different key)
    BEFORE rewriting petabytes. Portable md5 bucketing (not Spark's
    Murmur3) so the oracle checks the exact assignment.

    One scan + one ≤N_BUCKETS-row agg + a 1-row broadcast of the mean."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    bucket = (
        F.conv(F.substring(F.md5(F.col("key")), 1, 4), 16, 10).cast("long")
        % N_BUCKETS
    )
    per = inv.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_objects"), F.sum("size").alias("bucket_bytes")
    )
    mean = per.agg(F.avg("bucket_bytes").alias("mean_bytes"))
    return per.crossJoin(F.broadcast(mean)).select(
        "bucket",
        "n_objects",
        "bucket_bytes",
        F.round(F.col("bucket_bytes") / F.col("mean_bytes"), 6).alias("load_ratio"),
        (F.col("bucket_bytes") > 1.25 * F.col("mean_bytes")).alias("hot"),
    )


_BUCKET_HEX = " + ".join(
    f"(instr('0123456789abcdef', substr(md5(key), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
    for i in range(4)
)

_BUCKET_SKEW_SQL = oracle_cte("inventory_src") + f"""
, per AS (
  SELECT ({_BUCKET_HEX}) % {N_BUCKETS} AS bucket,
         count(*) AS n_objects,
         cast(sum(size) AS BIGINT) AS bucket_bytes
  FROM inventory_src GROUP BY 1
),
m AS (SELECT avg(bucket_bytes) AS mean_bytes FROM per)
SELECT bucket, n_objects, bucket_bytes,
       round(bucket_bytes / mean_bytes, 6) AS load_ratio,
       bucket_bytes > 1.25 * mean_bytes AS hot
FROM per, m
"""


# --- shard_rebalance_plan (round 8) ------------------------------------------

# The reference assigns objects to sync workers round-robin
# (AzureTaskProducer — G7 in SURVEY §2); round-robin is stateless but every
# worker-count change reassigns ~everything, invalidating per-worker state
# (HWMs, partial manifests, warm caches). Rendezvous / highest-random-weight
# hashing (Thaler & Ravishankar 1998) is the standard fix: each key goes to
# argmax_s hash(key, s), so growing OLD→NEW workers moves EXACTLY the keys
# whose new-worker hash wins — an expected (NEW−OLD)/NEW of the corpus —
# while modulo rehashing moves ~1−1/NEW of it.
OLD_WORKERS = 8
NEW_WORKERS = 10


def _hrw_spark(key: str, n: int):
    """Rendezvous assignment: argmax over workers of md5(key ':' s), ties
    (impossible in practice, pinned for determinism) to the HIGHER s —
    struct max compares (w, s) lexicographically in both engines."""
    return F.array_max(
        F.array(
            *[
                F.struct(
                    F.md5(F.concat(F.col(key), F.lit(f":{s}"))).alias("w"),
                    F.lit(s).alias("s"),
                )
                for s in range(n)
            ]
        )
    )["s"]


def _hrw_sql(key: str, n: int) -> str:
    terms = ", ".join(
        f"{{'w': md5({key} || ':{s}'), 's': {s}}}" for s in range(n)
    )
    return f"list_max([{terms}]).s"


def shard_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worker-shard movement matrix for scaling OLD_WORKERS → NEW_WORKERS,
    under two assignment policies side by side: `rendezvous` (HRW — the
    minimal-movement upgrade) and `modulo` (hash mod N — what naive
    resharding does). One row per (policy, old_shard, new_shard) cell with
    object count, byte mass, and a moved flag; the test pins that HRW's
    moved byte fraction sits near (NEW−OLD)/NEW while modulo's is several
    times larger — the measured evidence for adopting stable assignment
    before a fleet resize reshuffles 100 TB of per-worker state.

    Scale shape: the per-key assignment is a pure projection (19 md5s per
    key — 8+10 rendezvous weights plus one shared by the two modulo
    columns — whole-stage codegen, zero shuffle; at 1000 executors it rides
    the scan); the only exchange is the final groupBy to ≤ 2·OLD·NEW cells.
    Portable md5 everywhere (not Spark's Murmur3) so the oracle checks the
    exact assignment, the bucket_skew_audit precedent. The modulo hash uses
    8 hex digits (2^32 % 10 = 6, a ~1.4e-9 uniformity bias — the 4-digit
    r8 version biased shards 0–5 by ~1e-4, round-9 ADVICE)."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    mod_hash = F.conv(F.substring(F.md5(F.col("key")), 1, 8), 16, 10).cast("long")
    assigned = inv.select(
        "size",
        _hrw_spark("key", OLD_WORKERS).alias("rv_old"),
        _hrw_spark("key", NEW_WORKERS).alias("rv_new"),
        (mod_hash % OLD_WORKERS).cast("int").alias("mod_old"),
        (mod_hash % NEW_WORKERS).cast("int").alias("mod_new"),
    )
    cells = assigned.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("rendezvous").alias("policy"),
                    F.col("rv_old").alias("old_shard"),
                    F.col("rv_new").alias("new_shard"),
                ),
                F.struct(
                    F.lit("modulo").alias("policy"),
                    F.col("mod_old").alias("old_shard"),
                    F.col("mod_new").alias("new_shard"),
                ),
            )
        ).alias("a"),
        "size",
    )
    return (
        cells.groupBy("a.policy", "a.old_shard", "a.new_shard")
        .agg(F.count("*").alias("n_objects"), F.sum("size").alias("total_bytes"))
        .withColumn("moved", F.col("old_shard") != F.col("new_shard"))
        .orderBy("policy", "old_shard", "new_shard")
    )


# 8-hex-digit md5 prefix as an integer (the modulo policy's hash; wider than
# _BUCKET_HEX so the % NEW_WORKERS residue is uniform to ~1.4e-9)
_MOD_HEX8 = " + ".join(
    f"(instr('0123456789abcdef', substr(md5(key), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)

_SHARD_REBALANCE_SQL = oracle_cte("inventory_src") + f"""
, assigned AS (
  SELECT size,
         {_hrw_sql('key', OLD_WORKERS)} AS rv_old,
         {_hrw_sql('key', NEW_WORKERS)} AS rv_new,
         ({_MOD_HEX8}) % {OLD_WORKERS} AS mod_old,
         ({_MOD_HEX8}) % {NEW_WORKERS} AS mod_new
  FROM inventory_src
),
cells AS (
  SELECT 'rendezvous' AS policy, rv_old AS old_shard, rv_new AS new_shard, size
  FROM assigned
  UNION ALL
  SELECT 'modulo', mod_old, mod_new, size FROM assigned
)
SELECT policy, cast(old_shard AS INT) AS old_shard,
       cast(new_shard AS INT) AS new_shard,
       count(*) AS n_objects, cast(sum(size) AS BIGINT) AS total_bytes,
       old_shard <> new_shard AS moved
FROM cells
GROUP BY policy, old_shard, new_shard
ORDER BY policy, old_shard, new_shard
"""


QUERIES = {
    "zorder_layout": zorder_layout,
    "bloom_semi_prune": bloom_semi_prune,
    "bucket_skew_audit": bucket_skew_audit,
    "shard_rebalance_plan": shard_rebalance_plan,
}

ORACLES = {
    "zorder_layout": _ZORDER_SQL,
    "bloom_semi_prune": _BLOOM_SQL,
    "bucket_skew_audit": _BUCKET_SKEW_SQL,
    "shard_rebalance_plan": _SHARD_REBALANCE_SQL,
}
