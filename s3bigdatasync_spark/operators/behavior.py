"""Event-behavior analytics: ordered funnels, retention cohorts, and
semi-structured property extraction.

The reference's event surface stops at per-minute status rollups
(UICenter/BackEnd/ddbModel.py:252-275); a pipeline that emits an event stream
invariably gets asked the next three questions — "how many users completed
the flow?", "do users come back?", and "what's inside the props blob?" —
so the engine answers them as first-class oracle-checked operators.

Scale notes (100 TB):
  * funnel_steps is three aggregations co-keyed on user_id; AQE co-partitions
    the chain so the per-step joins reuse one hash partitioning. The step
    relations shrink monotonically (each is a subset of the previous step's
    users), so every downstream join is broadcast-able after step 1.
  * retention_cohorts is one groupBy(user_id) for first-touch plus one
    broadcast join back to the event stream — the cohort table is |users|,
    tiny relative to |events|.
  * props_extract stays JVM-side (`get_json_object`), no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared, scoped_cache

# The natural ordered funnel in the event stream's vocabulary.
FUNNEL = ("view", "click", "purchase")


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: a user converts step N only with an event of
    step N's type at a timestamp strictly after their step N-1 conversion
    (first-touch attribution). Output: one row per step with the surviving
    user count — the classic conversion table."""
    ev = prepared(spark, sf_dir).table("events").select("user_id", "ts", "event_type")
    ts = F.col("ts").cast("long")
    step_users: list[DataFrame] = []
    prev: DataFrame | None = None
    for step in FUNNEL:
        stage = ev.filter(F.col("event_type") == step)
        if prev is not None:
            # prev shrinks every step: broadcast it into the event scan so the
            # big side never reshuffles
            stage = stage.join(F.broadcast(prev), "user_id").filter(ts > F.col("t_prev"))
        cur = stage.groupBy("user_id").agg(F.min(ts).alias("t_prev"))
        step_users.append(
            cur.groupBy().agg(F.count("*").alias("n_users")).select(
                F.lit(step).alias("step"), "n_users"
            )
        )
        prev = cur
    out = step_users[0]
    for s in step_users[1:]:
        out = out.unionByName(s)
    return out


_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts) // 1000000) AS t_prev
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS t_prev
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) // 1000000 > s1.t_prev
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS t_prev
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) // 1000000 > s2.t_prev
  GROUP BY e.user_id
)
SELECT 'view' AS step, count(*) AS n_users FROM s1
UNION ALL SELECT 'click', count(*) FROM s2
UNION ALL SELECT 'purchase', count(*) FROM s3
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain retention triangle: users grouped by first-seen day
    (cohort), counted on each later activity day. day0 row per cohort is the
    cohort size; the decay down each row is the retention curve."""
    ev = prepared(spark, sf_dir).table("events").select("user_id", "ts")
    day = (F.col("ts").cast("long") / 86400).cast("long")
    first = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = ev.select("user_id", day.alias("active_day")).distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .groupBy("cohort_day", (F.col("active_day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


_RETENTION_SQL = """
WITH days AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 86400 AS active_day FROM events
),
first AS (SELECT user_id, min(active_day) AS cohort_day FROM days GROUP BY user_id),
active AS (SELECT DISTINCT user_id, active_day FROM days)
SELECT cohort_day, active_day - cohort_day AS day_offset,
       count(DISTINCT a.user_id) AS n_active
FROM active a JOIN first USING (user_id)
GROUP BY 1, 2
"""


def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction: pull `$.k` out of the JSON props
    blob (JVM-side `get_json_object`, no Python) and profile it per event
    type — the schema-on-read pattern for payload columns."""
    ev = prepared(spark, sf_dir).table("events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_null"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
    )


_PROPS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       cast(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       min(k) AS min_k, max(k) AS max_k, cast(sum(k) AS BIGINT) AS sum_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over event types: for every unordered type
    pair, how many (user, day) baskets contain both, with lift vs the
    independence expectation — "what do users who purchase also do?".

    Plan: the distinct (user, day, type) relation is built once and
    cache-pinned (it feeds the self-join, the per-type totals, and the
    basket count); the pair self-join is keyed on (user, day) — per-basket
    fan-out is bounded by the type vocabulary (|types| choose 2 per basket),
    never by corpus size — and the totals join back as broadcasts since the
    type vocabulary is tiny. Lift's inputs are exact integers; the single
    IEEE division is correctly rounded, so both engines agree to the 6dp
    round."""
    ev = prepared(spark, sf_dir).table("events")
    day = (F.col("ts").cast("long") / 86400).cast("long")
    ud = (
        ev.select("user_id", day.alias("day"), "event_type").distinct().transform(scoped_cache)
    )
    n_baskets = ud.select("user_id", "day").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    per_type = ud.groupBy("event_type").agg(F.count("*").alias("n_type"))
    a = ud.select("user_id", "day", F.col("event_type").alias("et_a"))
    b = ud.select("user_id", "day", F.col("event_type").alias("et_b"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count("*").alias("n_pair"))
    )
    return (
        pairs.join(
            F.broadcast(per_type.selectExpr("event_type AS et_a", "n_type AS n_a")),
            "et_a",
        )
        .join(
            F.broadcast(per_type.selectExpr("event_type AS et_b", "n_type AS n_b")),
            "et_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "et_a",
            "et_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_pair") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


_AFFINITY_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // 86400 AS day, event_type
  FROM events
),
n_baskets AS (
  SELECT count(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM ud)
),
per_type AS (
  SELECT event_type, count(*) AS n_type FROM ud GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b, count(*) AS n_pair
  FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.day = b.day
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.et_a, p.et_b, p.n_pair,
       ta.n_type AS n_a, tb.n_type AS n_b,
       round((p.n_pair * nb.n_baskets) / CAST(ta.n_type * tb.n_type AS DOUBLE), 6)
         AS lift
FROM pairs p
JOIN per_type ta ON ta.event_type = p.et_a
JOIN per_type tb ON tb.event_type = p.et_b, n_baskets nb
"""


QUERIES = {
    "funnel_steps": funnel_steps,
    "retention_cohorts": retention_cohorts,
    "props_extract": props_extract,
    "event_type_affinity": event_type_affinity,
}

ORACLES = {
    "funnel_steps": _FUNNEL_SQL,
    "retention_cohorts": _RETENTION_SQL,
    "props_extract": _PROPS_SQL,
    "event_type_affinity": _AFFINITY_SQL,
}
