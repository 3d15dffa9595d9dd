"""Beyond-the-reference analytics: SQL window functions, session windows,
exact percentiles, TF-IDF.

SURVEY §2.G notes the reference has NO window functions, no session windows,
and no percentile/approximate aggregates; these are table-stakes for the
dashboards and data-quality sweeps a real sync/data pipeline runs, so the
engine provides them as first-class oracle-checked operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import prepared, scoped_cache
from ..views import oracle_cte

SESSION_GAP_SECONDS = 1800


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows over the event stream: a new session starts
    when a user's inter-event gap exceeds 30 minutes. The classic
    lag+flag+running-sum construction — one shuffle on user_id, everything
    else window functions inside the partition."""
    ev = prepared(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts = F.col("ts").cast("long")
    gap_flag = F.when(
        ts - F.lag(ts).over(w) > SESSION_GAP_SECONDS, 1
    ).otherwise(0)
    sessions = (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("new_sess", gap_flag)
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(ts) - F.min(ts)).alias("duration_s"),
    )


_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         epoch_us(ts) // 1000000 AS tse,
         CASE WHEN epoch_us(ts) // 1000000
                   - lag(epoch_us(ts) // 1000000)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_SECONDS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  -- ORDER BY raw ts (microsecond precision) to match the Spark window's tie
  -- order; session_seq cast from DuckDB's hugeint running sum
  SELECT user_id, event_id, tse,
         cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(tse) AS session_start,
       max(tse) AS session_end,
       max(tse) - min(tse) AS duration_s
FROM sess GROUP BY user_id, session_seq
"""


def size_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated size percentiles per storage class — the
    distribution summary the D1 histogram approximates with fixed buckets."""
    inv = prepared(spark, sf_dir).table("inventory_src")
    return inv.groupBy("storage_class").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(size, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(size, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(size, 0.99)"), 4).alias("p99"),
    )


_SIZE_PCTL_SQL = oracle_cte("inventory_src") + """
SELECT storage_class, count(*) AS n,
       round(quantile_cont(size::DOUBLE, 0.5), 4) AS p50,
       round(quantile_cont(size::DOUBLE, 0.9), 4) AS p90,
       round(quantile_cont(size::DOUBLE, 0.99), 4) AS p99
FROM inventory_src GROUP BY storage_class
"""


def throughput_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute success throughput with a 5-minute trailing moving average
    — the dashboard timeseries (UICenter graphs) with proper window
    functions instead of 60 batch-get keys."""
    log = prepared(spark, sf_dir).table("copy_log")
    per_min = (
        log.filter(F.col("replication_status") == 1)
        .withColumn(
            "minute", (F.col("replication_time").cast("long") / 60).cast("long") * 60
        )
        .groupBy("minute")
        .agg(F.sum("size").alias("bytes"), F.count("*").alias("n"))
    )
    # global window is safe HERE: input is already aggregated per minute, so
    # its cardinality is time-bounded (a year ≈ 525k rows), not data-bounded
    w = Window.orderBy("minute").rowsBetween(-4, 0)
    return per_min.select(
        "minute",
        "bytes",
        "n",
        F.round(F.avg("bytes").over(w), 4).alias("ma5_bytes"),
    )


_THROUGHPUT_SQL = oracle_cte("copy_log") + """
, per_min AS (
  SELECT (epoch_us(replication_time) // 1000000) // 60 * 60 AS minute,
         cast(sum(size) AS BIGINT) AS bytes,
         count(*) AS n
  FROM copy_log WHERE replication_status = 1 GROUP BY 1
)
SELECT minute, bytes, n,
       round(avg(bytes) OVER (ORDER BY minute ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
         AS ma5_bytes
FROM per_min
"""

TFIDF_TOP_N = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: tf·ln(N/df) with exact integer
    tf/df and ln on identical doubles (bitwise-equal across engines on this
    platform; rounded to 6dp regardless)."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    ).transform(scoped_cache)
    df_ = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_N)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


_TFIDF_SQL = f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents)
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         round(tf.tf * ln(nd.n_docs / dfreq.df), 6) AS score
  FROM tf JOIN dfreq ON tf.token = dfreq.token, nd
)
SELECT doc_id, token, tf, df, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank
  FROM scored
)
WHERE rank <= {TFIDF_TOP_N}
"""


def approx_distinct_users_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in HLL++ (approx_count_distinct) per event type vs the
    exact count — the zero-effort scale path, map-side-combinable fixed-size
    state. Sketch estimates are engine-specific, so this variant is pinned by
    the 5%-tolerance unit test, not a hash oracle."""
    ev = prepared(spark, sf_dir).table("events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )


# --- portable deterministic HyperLogLog --------------------------------------
# One SQL text, run verbatim by BOTH engines, so the ESTIMATE itself is
# oracle-checkable (unlike native HLL++ whose sketch is engine-specific):
#   * hash = md5 of the key (both engines agree byte-for-byte);
#   * bucket = first 12 hash bits (m=4096), value = next 60 bits, decoded by
#     nibble arithmetic (instr on a hex alphabet — no engine-specific conv);
#   * rho = 61 - length(bin(v)) (leading-zero rank, exact integer math);
#   * the harmonic sum is computed in INTEGER space scaled by 2^40 (rho
#     capped at 40), so bucket-sum ORDER cannot perturb the float result —
#     the only float ops are one division and one ln on exact integers,
#     bitwise identical in any IEEE engine.
# Same map-side-combinable shape as a real HLL: per-partition partial
# max(rho) per bucket combines associatively; 4096 buckets of state.
_HLL_P = 12
_HLL_M = 1 << _HLL_P  # 4096
_HLL_CAP = 40  # rho cap: keeps the scaled harmonic sum exact in int64
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUMER = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_CAP)  # alpha*m^2*2^C


def _nib(pos: int) -> str:
    return f"(instr('0123456789abcdef', substr(hx, {pos}, 1)) - 1)"


_HLL_BUCKET = " + ".join(f"{_nib(i + 1)} * {16 ** (2 - i)}" for i in range(3))
_HLL_V60 = " + ".join(
    f"CAST({_nib(i + 4)} AS BIGINT) * {16 ** (14 - i)}" for i in range(15)
)

_APPROX_DISTINCT_SQL = f"""
WITH hx_rows AS (
  SELECT event_type, md5(CAST(user_id AS STRING)) AS hx FROM events
),
hashed AS (
  SELECT event_type, ({_HLL_BUCKET}) AS bucket, ({_HLL_V60}) AS v FROM hx_rows
),
ranked AS (
  SELECT event_type, bucket,
         CASE WHEN v = 0 THEN 61 ELSE 61 - length(bin(v)) END AS rho
  FROM hashed
),
buckets AS (
  SELECT event_type, bucket, max(rho) AS mr FROM ranked GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type,
         sum(CAST(pow(2.0, {_HLL_CAP} - least(mr, {_HLL_CAP})) AS BIGINT)) AS s_present,
         count(*) AS n_buckets
  FROM buckets GROUP BY event_type
),
est AS (
  SELECT event_type,
         {_HLL_NUMER!r} / CAST(s_present + ({_HLL_M} - n_buckets) * {1 << _HLL_CAP} AS DOUBLE) AS raw_est,
         {_HLL_M} - n_buckets AS v_empty
  FROM agg
),
hll AS (
  SELECT event_type,
         CASE WHEN raw_est <= {2.5 * _HLL_M!r} AND v_empty > 0
              THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / v_empty)
              ELSE raw_est END AS corrected
  FROM est
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_users FROM events GROUP BY event_type
)
SELECT exact.event_type, exact.exact_users,
       CAST(floor(hll.corrected) AS BIGINT) AS hll_users
FROM exact JOIN hll ON hll.event_type = exact.event_type
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting, oracle-checkable: a portable
    deterministic HyperLogLog (md5-bucketed, m=4096, integer-exact harmonic
    sum, linear-counting small-range correction) whose estimate is
    bit-identical in Spark and DuckDB — both run the SAME SQL text. At
    100 TB this has real HLL economics: the per-bucket max(rho) state is
    map-side-combinable and 4096 rows per group flow into the final agg.
    The engine-native HLL++ path is approx_distinct_users_native."""
    return prepared(spark, sf_dir).sql(_APPROX_DISTINCT_SQL)


QUERIES = {
    "sessionize": sessionize,
    "approx_distinct_users": approx_distinct_users,
    "size_percentiles": size_percentiles,
    "throughput_timeline": throughput_timeline,
    "tfidf_top_terms": tfidf_top_terms,
}

ORACLES = {
    "sessionize": _SESSIONIZE_SQL,
    "approx_distinct_users": _APPROX_DISTINCT_SQL,
    "size_percentiles": _SIZE_PCTL_SQL,
    "throughput_timeline": _THROUGHPUT_SQL,
    "tfidf_top_terms": _TFIDF_SQL,
}
