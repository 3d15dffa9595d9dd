"""The north-star composition: a training-corpus build as ONE declarative
plan — quality filter → language filter → exact dedup → near-dup cluster
dedup → per-language corpus statistics.

Each stage is an operator that is independently oracle-checked; this module
chains them the way a real 100 TB data pipeline would (filters first so the
expensive pair-generation stages see only surviving docs — predicate order IS
the optimization at scale) and emits the corpus yield report. The whole
composition is itself oracle-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window

from ..operators import prepared
from ..operators.dedup import (
    JACCARD_THRESHOLD,
    _SHINGLES_SQL,
    _norm_text,
    dedup_clusters,
)
from ..operators.text import _LANG_MARKERS, _lang_score_sql, pred_lang_col, quality_cols


def training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving documents with their audit trail (which gate each doc
    passed). Gates: quality keep, identified language, exact-dup keeper,
    near-dup cluster keeper.

    Every per-row gate (quality features, language argmax, content hash) is
    computed in ONE projection over a single documents scan — no self-joins
    of the base table. The exact-dup keeper is a window over content_hash
    (one shuffle, replacing the old groupBy + join-back = two); the only
    remaining join is against the near-dup cluster labels, which genuinely
    come from a different (pair-graph) lineage."""
    qc = quality_cols()
    per_doc = prepared(spark, sf_dir).table("documents").select(
        "doc_id",
        "lang",
        pred_lang_col().alias("pred_lang"),
        qc["n_tok"].cast("long").alias("n_tokens"),
        qc["keep"].alias("keep"),
        F.md5(_norm_text()).alias("content_hash"),
    )
    exact_keeper = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy("content_hash")
    )
    cl = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id", "is_keeper")
    return (
        per_doc.withColumn("exact_keeper", exact_keeper)
        .join(cl, "doc_id")
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            "n_tokens",
            "keep",
            "exact_keeper",
            "cluster_id",
            F.col("is_keeper").alias("cluster_keeper"),
            (
                F.col("keep")
                & (F.col("pred_lang") != "und")
                & F.col("exact_keeper")
                & F.col("is_keeper")
            ).alias("in_corpus"),
        )
    )


def corpus_yield_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus yield: docs in/out and token counts — the number
    a data team actually reports after a pipeline run."""
    tc = training_corpus(spark, sf_dir)
    return tc.groupBy("lang").agg(
        F.count("*").alias("docs_total"),
        F.sum(F.when(F.col("in_corpus"), 1).otherwise(0)).alias("docs_kept"),
        F.sum(F.when(F.col("in_corpus"), F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("dropped_quality"),
        F.sum(F.when(F.col("pred_lang") == "und", 1).otherwise(0)).alias("dropped_lang"),
        F.sum(
            F.when(~F.coalesce("exact_keeper", F.lit(False)) | ~F.col("cluster_keeper"), 1).otherwise(0)
        ).alias("dropped_dup"),
    )


# ---------------------------------------------------------------------------
# End-to-end oracle: the same five-stage composition in DuckDB SQL, assembled
# from the per-operator oracle building blocks (single source of truth for
# the lang scores and shingle pipeline).

_PRED_LANG_CASE = (
    "CASE WHEN greatest("
    + ", ".join(_lang_score_sql(lg) for lg in _LANG_MARKERS)
    + ") = 0 THEN 'und'\n"
    + "\n".join(
        f" WHEN {_lang_score_sql(lg)} = greatest("
        + ", ".join(_lang_score_sql(x) for x in _LANG_MARKERS)
        + f") THEN '{lg}'"
        for lg in _LANG_MARKERS
    )
    + " END"
)

# CTE block kept separable so corpus_release_manifest can extend the same
# five-stage lineage with split assignment and DSIR selection.
_CORPUS_CTES = rf"""quality AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         (len(toks) >= 10
          AND round(len(regexp_extract_all(text, '[^\w\s]')) / greatest(length(text), 1), 6) < 0.2
          AND round(list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1), 6)
              BETWEEN 2.0 AND 12.0) AS keep
  FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
),
lang_pred AS (SELECT doc_id, {_PRED_LANG_CASE} AS pred_lang FROM documents),
exact AS (
  SELECT doc_id,
         doc_id = min(doc_id) OVER (
           PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
         ) AS exact_keeper
  FROM documents
),
sh AS ({_SHINGLES_SQL}),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN cnt ca ON ca.doc_id = doc_a
  JOIN cnt cb ON cb.doc_id = doc_b
  WHERE round(ix / (ca.n + cb.n - ix), 6) >= {JACCARD_THRESHOLD}
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
lp(n, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, lp.lbl FROM lp JOIN edges e ON e.a = lp.n WHERE lp.lbl < e.b
),
clusters AS (SELECT n AS doc_id, min(lbl) AS cluster_id,
                    n = min(lbl) AS cluster_keeper FROM lp GROUP BY n),
tc AS (
  SELECT d.doc_id, d.lang, d.source, q.n_tokens, q.keep, l.pred_lang,
         e.exact_keeper, c.cluster_id, c.cluster_keeper,
         (q.keep AND l.pred_lang <> 'und' AND e.exact_keeper AND c.cluster_keeper) AS in_corpus
  FROM documents d
  JOIN quality q USING (doc_id)
  JOIN lang_pred l USING (doc_id)
  JOIN exact e USING (doc_id)
  JOIN clusters c USING (doc_id)
)"""

_CORPUS_YIELD_SQL = f"""
WITH RECURSIVE
{_CORPUS_CTES}
SELECT lang,
       count(*) AS docs_total,
       cast(sum(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
       cast(sum(CASE WHEN in_corpus THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
       cast(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS dropped_quality,
       cast(sum(CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_lang,
       cast(sum(CASE WHEN NOT exact_keeper OR NOT cluster_keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_dup
FROM tc GROUP BY lang
"""


def corpus_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus RELEASE step: the five-stage survivors (training_corpus's
    in_corpus gate) assigned to leakage-safe train/val/test splits (by
    near-dup CLUSTER id, so surviving copies of the same content can never
    straddle a split boundary — the leakage_safe_split construction) and
    annotated with DSIR selection toward DSIR_TARGET_SOURCE. Target-source
    docs carry no DSIR row (they ARE the target domain) and count as
    selected. Per (source, split): docs, tokens, DSIR-selected docs — the
    manifest a data team publishes with a corpus release, with THREE
    independently-oracle-checked lineages (gates, cluster splits, importance
    weights) composed into one plan.

    Scale: everything downstream of the gates is doc_id equi-joins (the
    DSIR join is vs a per-doc relation, hash join on the primary key) and a
    <=|sources|x3-key agg. The near-dup fixpoint runs ONCE — training_corpus
    now exposes cluster_id, so split assignment reuses its labels instead of
    a second clustering pass."""
    from ..operators.curation import _split_col, dsir_importance

    tc = training_corpus(spark, sf_dir)
    docs = prepared(spark, sf_dir).table("documents").select("doc_id", "source")
    dsir = dsir_importance(spark, sf_dir).select("doc_id", "selected")
    return (
        tc.filter(F.col("in_corpus"))
        .join(docs, "doc_id")
        .join(dsir, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            _split_col(F.col("cluster_id")).alias("split"),
            F.coalesce("selected", F.lit(True)).alias("dsir_sel"),
        )
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.when(F.col("dsir_sel"), 1).otherwise(0)).alias("n_dsir_selected"),
        )
    )


def _release_manifest_sql() -> str:
    from ..operators.curation import _DSIR_CTES, _DSIR_SELECT, _split_case_sql

    return f"""
WITH RECURSIVE
{_CORPUS_CTES},
{_DSIR_CTES},
dsir AS ({_DSIR_SELECT})
SELECT tc.source,
       {_split_case_sql("tc.cluster_id")} AS split,
       count(*) AS n_docs,
       cast(sum(tc.n_tokens) AS BIGINT) AS n_tokens,
       cast(sum(CASE WHEN coalesce(ds.selected, TRUE) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dsir_selected
FROM tc LEFT JOIN dsir ds USING (doc_id)
WHERE tc.in_corpus
GROUP BY tc.source, 2
"""


QUERIES = {
    "corpus_yield_report": corpus_yield_report,
    "corpus_release_manifest": corpus_release_manifest,
}
ORACLES = {
    "corpus_yield_report": _CORPUS_YIELD_SQL,
    "corpus_release_manifest": _release_manifest_sql(),
}
