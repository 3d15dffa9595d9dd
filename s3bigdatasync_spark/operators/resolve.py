"""Entity resolution: blocked fuzzy matching by edit distance.

The reference reconciles catalogs by EXACT key equality only (the J4 diff
family — diff_list_multi_sqs.py joins src/dst inventories on the raw key).
Real catalogs drift: keys get re-encoded, names truncated or typo'd, and the
reconciliation a data platform then needs is a *blocked fuzzy join* — cheap
blocking keys bound the candidate set, an edit-distance refine picks the
match. This module implements that as a first-class operator over the `part`
dimension: a deterministic "dirty" replica of every part name (one character
deleted at an md5-derived position — the classic single-edit typo) is matched
back to the clean catalog.

Scale notes (100 TB):
  * The only join is dirty × clean on the structured blocking key
    (p_brand, p_size) with a cheap ±MAX_LEV length band — candidate count is
    Σ_block |dirty_b|·|clean_b|, never a cross join. At larger scales the
    blocking key gains a q-gram prefix component (the PPJoin prefix-filter
    family already implemented in curation.prefix_filter_pairs); the refine
    stage is unchanged.
  * The refine uses Spark's 3-arg levenshtein(l, r, threshold) — a banded
    DP that early-exits at MAX_LEV+1, so cost per candidate is
    O(len·MAX_LEV), not O(len²).
  * Best-match selection is min(lev·2³² + partkey) — a plain map-side
    combinable MIN, no window, no sort; the composite decodes to
    (best_lev, matched_key) exactly in both engines (values ≪ 2⁵³).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import prepared
from .curation import _hex_bucket_sql

MAX_LEV = 2
_ENC = 4294967296  # 2^32 — composite (lev, partkey) encoding base
_FZ_SEED = "fz:"


def _dirty_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic single-edit 'dirty' replica of the part catalog: delete
    the character at md5-derived position pos ∈ [1, len] of p_name. Seeded
    like dataset_split (engine/partitioning-independent md5 bucket)."""
    part = prepared(spark, sf_dir).table("part")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_FZ_SEED), F.col("p_partkey").cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    return part.select(
        F.col("p_partkey").alias("dirty_id"),
        "p_brand",
        "p_size",
        (bucket % F.length("p_name") + 1).alias("pos"),
        "p_name",
    ).select(
        "dirty_id",
        "p_brand",
        "p_size",
        F.expr("concat(substring(p_name, 1, pos - 1), substring(p_name, pos + 1))").alias(
            "dirty_name"
        ),
    )


def fuzzy_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy match of the dirty replica back to the clean catalog:
    block on (p_brand, p_size) + a ±MAX_LEV length band, refine with
    levenshtein ≤ MAX_LEV, keep the best match per dirty record
    (lowest distance, ties to the lowest partkey).

    Output: one row per matched dirty record — candidate count inside its
    block, best distance, matched key, and whether the match recovered the
    original record (self_match; false when an identical-name twin with a
    lower key wins the tie, which is itself a dedup signal)."""
    part = prepared(spark, sf_dir).table("part")
    dirty = _dirty_parts(spark, sf_dir)
    lev = F.levenshtein(F.col("dirty_name"), F.col("p_name"), MAX_LEV)
    cand = (
        dirty.join(
            part,
            ["p_brand", "p_size"],
        )
        .filter(
            F.abs(F.length("dirty_name") - F.length("p_name")) <= MAX_LEV
        )
        .select("dirty_id", "p_partkey", lev.alias("lev"))
        # 3-arg levenshtein returns -1 when the banded DP exceeds MAX_LEV
        .filter(F.col("lev") >= 0)
    )
    enc = F.col("lev").cast("long") * F.lit(_ENC) + F.col("p_partkey")
    agg = cand.groupBy("dirty_id").agg(
        F.count("*").alias("n_candidates"), F.min(enc).alias("best")
    )
    return agg.select(
        "dirty_id",
        "n_candidates",
        F.expr(f"best div {_ENC}").alias("best_lev"),
        (F.col("best") % F.lit(_ENC)).alias("matched_key"),
        (F.col("best") % F.lit(_ENC) == F.col("dirty_id")).alias("self_match"),
    )


_FUZZY_SQL = f"""
WITH dirty AS (
  SELECT p_partkey AS dirty_id, p_brand, p_size,
         concat(substr(p_name, 1, pos - 1), substr(p_name, pos + 1)) AS dirty_name
  FROM (
    SELECT p_partkey, p_brand, p_size, p_name,
           ({_hex_bucket_sql(f"concat('{_FZ_SEED}', cast(p_partkey AS VARCHAR))", 4)})
             % length(p_name) + 1 AS pos
    FROM part)
),
cand AS (
  SELECT d.dirty_id, c.p_partkey,
         levenshtein(d.dirty_name, c.p_name) AS lev
  FROM dirty d
  JOIN part c ON d.p_brand = c.p_brand AND d.p_size = c.p_size
     AND abs(length(d.dirty_name) - length(c.p_name)) <= {MAX_LEV}
  WHERE levenshtein(d.dirty_name, c.p_name) <= {MAX_LEV}
),
agg AS (
  SELECT dirty_id, count(*) AS n_candidates,
         min(cast(lev AS BIGINT) * {_ENC} + p_partkey) AS best
  FROM cand GROUP BY dirty_id
)
SELECT dirty_id, n_candidates,
       best // {_ENC} AS best_lev,
       best % {_ENC} AS matched_key,
       best % {_ENC} = dirty_id AS self_match
FROM agg
"""


# --- fuzzy_match_qgram: the attribute-free scale path (Ed-Join prefix) ------

QGRAM = 3
# Ed-Join prefix bound (Xiao/Wang/Lin '08): d edits destroy at most q·d
# POSITIONAL q-grams, so among the q·d+1 rarest positional grams of each
# string (one shared global rarity order) the two sides of any true match
# retain a common gram whose positions differ by at most d.
PREFIX_K = QGRAM * MAX_LEV + 1  # = 7
_POS_BUCKET = MAX_LEV + 1  # join-key position bucket width (±d ⇒ ±1 bucket)


def _qgram_rel(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """(id, qg, pos) — POSITIONAL 3-grams of the name (whole name when
    shorter). Positions matter twice: the prefix bound above is a statement
    about positional grams, and the candidate join keys on (gram,
    position-bucket) — without the position component, low-entropy catalogs
    (TPC-H part names draw on ~92 words) make every gram dense and the
    candidate join quadratic (measured: 297 s at 20k names; positional
    bucketing restores ~1 s)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length({name_col}) - {QGRAM - 1}, 1)),"
                f" i -> substring({name_col}, i, {QGRAM}))"
            )
        ).alias("pos", "qg"),
    )


def fuzzy_match_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribute-FREE fuzzy matcher — Ed-Join-style q-gram prefix
    blocking, for catalogs where no reliable structured blocking key exists
    (the production complement of fuzzy_match_pairs' (brand, size) blocks):

      1. q-gram rarity order: global 3-gram frequencies over the CLEAN
         catalog define one total order (count, then gram — wholly
         deterministic); dirty-side grams unseen in the catalog rank
         rarest (count 0), which only widens recall.
      2. prefix candidates: each name keeps its PREFIX_K = q·d+1 = 7 rarest
         grams; two names within edit distance d=MAX_LEV MUST share one
         (the Ed-Join prefix-filter bound), so the equi-join on prefix
         grams has FULL recall — the self record is always a candidate and
         best_lev ≤ 1 for every dirty row.
      3. refine + best-match: identical to fuzzy_match_pairs (threshold
         levenshtein, min(lev·2³²+key) — no window).

    Scale: the join key frequency is bounded because prefixes keep only the
    RAREST grams (the PPJoin/prefix_filter_pairs argument); the global
    frequency relation is vocabulary-bounded and the per-name top-7 is a
    small window over ≤len(name) rows. Unlike attribute blocking, recall is
    a theorem, not a data assumption."""
    part = prepared(spark, sf_dir).table("part")
    dirty = _dirty_parts(spark, sf_dir).select("dirty_id", "dirty_name")
    return match_names_qgram(dirty, part.select("p_partkey", "p_name"))


def match_names_qgram(dirty: DataFrame, catalog: DataFrame) -> DataFrame:
    """The reusable Ed-Join matcher core: (dirty_id, dirty_name) records vs a
    (p_partkey, p_name) catalog — positional prefix blocking + threshold
    refine + best match. Used by the registered batch query above and by the
    streaming admission leg (streaming/resolve.py), which probes each
    micro-batch of arriving records against the same broadcastable catalog
    prefix index.

    Candidate join key = (gram, position bucket of width d+1), with the
    dirty side exploded to the ±1 neighboring buckets: positions of a
    surviving gram differ by ≤ d, so bucket ids differ by ≤ 1 — recall is
    preserved while the join key gains the positional component that keeps
    dense grams from going quadratic. Matching runs over the NAME
    DICTIONARIES with record counts fanned back (the output-preserving
    factorization documented in match_names_segments)."""
    cnames = catalog.groupBy("p_name").agg(
        F.min("p_partkey").alias("rep_key"), F.count("*").alias("n_recs")
    )
    dnames = dirty.select("dirty_name").distinct()
    clean_qg = _qgram_rel(cnames, "p_name", "p_name").withColumnRenamed(
        "id", "p_name"
    )
    cnt = clean_qg.groupBy("qg").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("id").orderBy("cnt", "qg", "pos")

    def prefix_of(qg_rel: DataFrame) -> DataFrame:
        return (
            qg_rel.join(F.broadcast(cnt), "qg", "left")
            .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= PREFIX_K)
            .select("id", "qg", "pos")
        )

    dp = (
        prefix_of(_qgram_rel(dnames, "dirty_name", "dirty_name"))
        .withColumnRenamed("id", "dirty_name")
        .select(
            "dirty_name",
            "qg",
            "pos",
            F.explode(
                F.array(
                    F.expr(f"pos div {_POS_BUCKET} - 1"),
                    F.expr(f"pos div {_POS_BUCKET}"),
                    F.expr(f"pos div {_POS_BUCKET} + 1"),
                )
            ).alias("pb"),
        )
    )
    cp = prefix_of(clean_qg.withColumnRenamed("p_name", "id")).withColumnRenamed(
        "id", "p_name"
    ).withColumn("pb", F.expr(f"pos div {_POS_BUCKET}"))
    cand_names = (
        dp.alias("d")
        .join(cp.alias("c"), ["qg", "pb"])
        .filter(F.abs(F.col("d.pos") - F.col("c.pos")) <= MAX_LEV)
        .select("dirty_name", "p_name")
        .distinct()
    )
    lev = F.levenshtein(F.col("dirty_name"), F.col("p_name"), MAX_LEV)
    scored = (
        cand_names.filter(
            F.abs(F.length("dirty_name") - F.length("p_name")) <= MAX_LEV
        )
        .select("dirty_name", "p_name", lev.alias("lev"))
        .filter(F.col("lev") >= 0)
        .join(cnames, "p_name")
    )
    enc = F.col("lev").cast("long") * F.lit(_ENC) + F.col("rep_key")
    per_name = scored.groupBy("dirty_name").agg(
        F.sum("n_recs").alias("n_candidates"), F.min(enc).alias("best")
    )
    return dirty.join(per_name, "dirty_name").select(
        "dirty_id",
        "n_candidates",
        F.expr(f"best div {_ENC}").alias("best_lev"),
        (F.col("best") % F.lit(_ENC)).alias("matched_key"),
        (F.col("best") % F.lit(_ENC) == F.col("dirty_id")).alias("self_match"),
    )


_DIRTY_CTE = f"""
  SELECT p_partkey AS dirty_id,
         concat(substr(p_name, 1, pos - 1), substr(p_name, pos + 1)) AS dirty_name
  FROM (
    SELECT p_partkey, p_name,
           ({_hex_bucket_sql(f"concat('{_FZ_SEED}', cast(p_partkey AS VARCHAR))", 4)})
             % length(p_name) + 1 AS pos
    FROM part)
"""

_QGRAM_SQL = f"""
WITH dirty AS ({_DIRTY_CTE}),
clean_qg AS (
  SELECT p_partkey AS id, substr(p_name, i, {QGRAM}) AS qg, i - 1 AS pos
  FROM part, unnest(generate_series(1, greatest(length(p_name) - {QGRAM - 1}, 1))) u(i)
),
dirty_qg AS (
  SELECT dirty_id AS id, substr(dirty_name, i, {QGRAM}) AS qg, i - 1 AS pos
  FROM dirty, unnest(generate_series(1, greatest(length(dirty_name) - {QGRAM - 1}, 1))) u(i)
),
cnt AS (SELECT qg, count(*) AS cnt FROM clean_qg GROUP BY qg),
cp AS (
  SELECT id AS p_partkey, qg, pos, pos // {_POS_BUCKET} AS pb FROM (
    SELECT c.id, c.qg, c.pos,
           row_number() OVER (PARTITION BY c.id ORDER BY coalesce(n.cnt, 0), c.qg, c.pos) AS rn
    FROM clean_qg c LEFT JOIN cnt n USING (qg))
  WHERE rn <= {PREFIX_K}
),
dp AS (
  SELECT id AS dirty_id, qg, pos, pos // {_POS_BUCKET} + off AS pb FROM (
    SELECT d.id, d.qg, d.pos,
           row_number() OVER (PARTITION BY d.id ORDER BY coalesce(n.cnt, 0), d.qg, d.pos) AS rn
    FROM dirty_qg d LEFT JOIN cnt n USING (qg)),
    unnest([-1, 0, 1]) o(off)
  WHERE rn <= {PREFIX_K}
),
cand_ids AS (
  SELECT DISTINCT dp.dirty_id, cp.p_partkey
  FROM dp JOIN cp USING (qg, pb)
  WHERE abs(dp.pos - cp.pos) <= {MAX_LEV}
),
cand AS (
  SELECT c.dirty_id, c.p_partkey, levenshtein(d.dirty_name, p.p_name) AS lev
  FROM cand_ids c
  JOIN dirty d USING (dirty_id)
  JOIN part p USING (p_partkey)
  WHERE abs(length(d.dirty_name) - length(p.p_name)) <= {MAX_LEV}
    AND levenshtein(d.dirty_name, p.p_name) <= {MAX_LEV}
),
agg AS (
  SELECT dirty_id, count(*) AS n_candidates,
         min(cast(lev AS BIGINT) * {_ENC} + p_partkey) AS best
  FROM cand GROUP BY dirty_id
)
SELECT dirty_id, n_candidates,
       best // {_ENC} AS best_lev,
       best % {_ENC} AS matched_key,
       best % {_ENC} = dirty_id AS self_match
FROM agg
"""


# --- fuzzy_match_segments: Pass-Join segment blocking (dense-data-proof) ----

NSEG = MAX_LEV + 1  # d+1 segments: d edits cannot touch all of them


def _seg_exprs(L: str, i: str) -> tuple[str, str]:
    """(start, length) SQL arithmetic of segment `i` (0-based) of a string of
    length `L` split into NSEG near-equal parts — the LAST (L mod NSEG)
    segments are one longer. Pure integer closed forms shared verbatim by
    both engines, so the layouts cannot disagree."""
    base = f"({L} div {NSEG})"
    cut = f"({NSEG} - ({L} % {NSEG}))"  # first segment index that gets +1
    ln = f"({base} + (CASE WHEN {i} >= {cut} THEN 1 ELSE 0 END))"
    st = (
        f"(1 + {i} * {base}"
        f" + (CASE WHEN {i} > {cut} THEN {i} - {cut} ELSE 0 END))"
    )
    return st, ln


def match_names_segments(
    dirty: DataFrame, catalog: DataFrame, keep_name: bool = False
) -> DataFrame:
    """Pass-Join matcher core (Li/Deng/Wang/Feng '11): split every catalog
    name into NSEG = d+1 segments; d edits cannot touch all of them, so a
    true match CONTAINS one segment exactly, shifted by at most d. The
    candidate join keys on (clean length, segment index, segment text) —
    segment text is ~len/NSEG characters, so the key is near-unique on ANY
    data, including low-entropy catalogs where q-gram rarity collapses
    (measured on TPC-H's 92-word part names: Ed-Join prefix 195-297 s at
    20k names; this shape ~1 s — see SCALING.md).

    Dirty-side fan-out is a CONSTANT ≤ (2d+1)·NSEG·(2d+1) = 75 probe
    substrings per name (candidate clean lengths ±d × segments × start
    shifts ±d), so the blocking stage is a scan, an explode, and one
    selective equi-join — no window, nothing data-squared.

    DICTIONARY FACTORIZATION: all matching runs over DISTINCT names, and
    record-level results fan back by name at the end. This is exactly
    output-preserving — records sharing a name have identical lev to
    everything, so min over records of (lev, key) = min over names of
    (lev, min key within name), and the record candidate count is the sum
    of name multiplicities. On catalogs with heavy name duplication (the
    sf0.1 fixture holds 20k records over 64 distinct names) this is the
    difference between |dictionary|² work and |records|² work — measured
    114.7 s → ~2 s at sf0.1 with identical output."""
    spark_seg_start, spark_seg_len = _seg_exprs("L", "i")
    # name dictionaries: representative (min) key + multiplicity per name
    cnames = catalog.groupBy("p_name").agg(
        F.min("p_partkey").alias("rep_key"), F.count("*").alias("n_recs")
    )
    dnames = dirty.select("dirty_name").distinct()
    clean_seg = (
        cnames.select("p_name", F.length("p_name").alias("L"))
        .select(
            "p_name",
            "L",
            F.explode(F.expr(f"sequence(0, {NSEG - 1})")).alias("i"),
        )
        .select(
            "p_name",
            "L",
            "i",
            F.expr(f"substring(p_name, {spark_seg_start}, {spark_seg_len})").alias(
                "seg"
            ),
        )
    )
    probes = (
        dnames.select("dirty_name", F.length("dirty_name").alias("lb"))
        .select(
            "dirty_name",
            "lb",
            F.explode(
                F.expr(f"sequence(lb - {MAX_LEV}, lb + {MAX_LEV})")
            ).alias("L"),
        )
        .filter(F.col("L") >= NSEG)
        .select(
            "dirty_name",
            "lb",
            "L",
            F.explode(F.expr(f"sequence(0, {NSEG - 1})")).alias("i"),
        )
        .select(
            "dirty_name",
            "lb",
            "L",
            "i",
            F.explode(
                F.expr(f"sequence({spark_seg_start} - {MAX_LEV},"
                       f" {spark_seg_start} + {MAX_LEV})")
            ).alias("start"),
        )
        .filter(
            (F.col("start") >= 1)
            & (F.col("start") + F.expr(spark_seg_len) - 1 <= F.col("lb"))
        )
        .select(
            "dirty_name",
            "L",
            "i",
            F.expr(f"substring(dirty_name, start, {spark_seg_len})").alias("seg"),
        )
    )
    cand_names = probes.join(clean_seg, ["L", "i", "seg"]).select(
        "dirty_name", "p_name"
    ).distinct()
    lev = F.levenshtein(F.col("dirty_name"), F.col("p_name"), MAX_LEV)
    scored = (
        cand_names.select("dirty_name", "p_name", lev.alias("lev"))
        .filter(F.col("lev") >= 0)
        .join(cnames, "p_name")
    )
    enc = F.col("lev").cast("long") * F.lit(_ENC) + F.col("rep_key")
    per_name = scored.groupBy("dirty_name").agg(
        F.sum("n_recs").alias("n_candidates"), F.min(enc).alias("best")
    )
    out = dirty.join(per_name, "dirty_name").select(
        "dirty_name",
        "dirty_id",
        "n_candidates",
        F.expr(f"best div {_ENC}").alias("best_lev"),
        (F.col("best") % F.lit(_ENC)).alias("matched_key"),
        (F.col("best") % F.lit(_ENC) == F.col("dirty_id")).alias("self_match"),
    )
    # keep_name: callers that key verdicts on the (dirty_id, dirty_name)
    # identity pair (streaming/resolve.py) need the name to fan back by; the
    # default drops it, preserving the registered query's oracle schema.
    return out if keep_name else out.drop("dirty_name")


def fuzzy_match_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered Pass-Join query: the dirty replica matched back to the
    part catalog with segment blocking (see match_names_segments)."""
    part = prepared(spark, sf_dir).table("part")
    dirty = _dirty_parts(spark, sf_dir).select("dirty_id", "dirty_name")
    return match_names_segments(dirty, part.select("p_partkey", "p_name"))


def _seg_sql(L: str, i: str) -> tuple[str, str]:
    base = f"({L} // {NSEG})"
    cut = f"({NSEG} - ({L} % {NSEG}))"
    ln = f"({base} + (CASE WHEN {i} >= {cut} THEN 1 ELSE 0 END))"
    st = (
        f"(1 + {i} * {base}"
        f" + (CASE WHEN {i} > {cut} THEN {i} - {cut} ELSE 0 END))"
    )
    return st, ln


_ST, _LN = _seg_sql("L", "i")

_SEGMENTS_SQL = f"""
WITH dirty AS ({_DIRTY_CTE}),
clean_seg AS (
  SELECT p_partkey, length(p_name) AS L, i,
         substr(p_name, {_seg_sql("length(p_name)", "i")[0]},
                {_seg_sql("length(p_name)", "i")[1]}) AS seg
  FROM part, unnest(generate_series(0, {NSEG - 1})) u(i)
),
probes AS (
  SELECT dirty_id, L, i,
         substr(dirty_name, start, {_LN}) AS seg
  FROM (
    SELECT d.dirty_id, d.dirty_name, length(d.dirty_name) AS lb, L, i, start
    FROM dirty d,
         unnest(generate_series(length(d.dirty_name) - {MAX_LEV},
                                length(d.dirty_name) + {MAX_LEV})) ul(L),
         unnest(generate_series(0, {NSEG - 1})) ui(i),
         unnest(generate_series({_ST} - {MAX_LEV}, {_ST} + {MAX_LEV})) us(start)
    WHERE L >= {NSEG})
  WHERE start >= 1 AND start + {_LN} - 1 <= lb
),
cand_ids AS (
  SELECT DISTINCT p.dirty_id, c.p_partkey
  FROM probes p JOIN clean_seg c USING (L, i, seg)
),
cand AS (
  SELECT ci.dirty_id, ci.p_partkey, levenshtein(d.dirty_name, pt.p_name) AS lev
  FROM cand_ids ci
  JOIN dirty d USING (dirty_id)
  JOIN part pt USING (p_partkey)
  WHERE levenshtein(d.dirty_name, pt.p_name) <= {MAX_LEV}
),
agg AS (
  SELECT dirty_id, count(*) AS n_candidates,
         min(cast(lev AS BIGINT) * {_ENC} + p_partkey) AS best
  FROM cand GROUP BY dirty_id
)
SELECT dirty_id, n_candidates,
       best // {_ENC} AS best_lev,
       best % {_ENC} AS matched_key,
       best % {_ENC} = dirty_id AS self_match
FROM agg
"""


QUERIES = {
    "fuzzy_match_pairs": fuzzy_match_pairs,
    "fuzzy_match_qgram": fuzzy_match_qgram,
    "fuzzy_match_segments": fuzzy_match_segments,
}
ORACLES = {
    "fuzzy_match_pairs": _FUZZY_SQL,
    "fuzzy_match_qgram": _QGRAM_SQL,
    "fuzzy_match_segments": _SEGMENTS_SQL,
}
