"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (per the north star): language-ID,
quality scoring, token counting, document fingerprinting — all pure JVM-side
Catalyst expressions over the `documents` table. No Python in the hot path;
at 100 TB these are embarrassingly parallel scan+project jobs whose cost is
the parquet read itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared

_WS_TOKEN = r"\S+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the usual GPT-2-style coarse split, minus unicode categories.
_BPE_TOKEN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + chars.
    token-per-char ratio is the usual quick LLM-data yield estimate."""
    docs = prepared(spark, sf_dir).table("documents")
    ws = F.size(F.regexp_extract_all(F.col("text"), F.lit(_WS_TOKEN), F.lit(0)))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_TOKEN), F.lit(0)))
    return (
        docs.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            ws.cast("long").alias("ws_tokens"),
            bpe.cast("long").alias("bpe_tokens"),
            F.round(bpe / F.greatest(F.length("text"), F.lit(1)), 6).alias("tokens_per_char"),
        )
    )


_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '{_WS_TOKEN}')) AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_TOKEN}')) AS bpe_tokens,
       round(len(regexp_extract_all(text, '{_BPE_TOKEN}'))
             / greatest(length(text), 1), 6) AS tokens_per_char
FROM documents
"""

# Stopword markers per language for the n-gram/stopword language-ID heuristic.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "que", "de", "la", "los"],
    "fr": ["le", "et", "les", "des", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # romanized placeholders
}


def _marker_hits(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-marker hit counts per language,
    argmax with deterministic tiebreak (marker order), 'und' when no marker
    hits. Word-salad testdata mostly lands 'en'/'und' — the operator contract
    is the deterministic scoring, not model quality."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            _marker_hits(toks, words).cast("long").alias(f"score_{lg}")
            for lg, words in _LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"score_{lg}") for lg in _LANG_MARKERS])
    pred = F.when(best == 0, "und")
    for lg in _LANG_MARKERS:  # first max wins — same order in the oracle CASE
        pred = pred.when(F.col(f"score_{lg}") == best, lg)
    return scored.select(
        "doc_id", "lang", *[f"score_{lg}" for lg in _LANG_MARKERS], pred.alias("pred_lang")
    )


def _lang_score_sql(lg: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lg])
    return (
        f"len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), "
        f"t -> list_contains([{words}], t)))"
    )


_LANG_ID_SQL = (
    "SELECT doc_id, lang,\n"
    + ",\n".join(f"  {_lang_score_sql(lg)} AS score_{lg}" for lg in _LANG_MARKERS)
    + ",\n  CASE WHEN greatest("
    + ", ".join(_lang_score_sql(lg) for lg in _LANG_MARKERS)
    + ") = 0 THEN 'und'\n"
    + "\n".join(
        f"       WHEN {_lang_score_sql(lg)} = greatest("
        + ", ".join(_lang_score_sql(x) for x in _LANG_MARKERS)
        + f") THEN '{lg}'"
        for lg in _LANG_MARKERS
    )
    + "\n  END AS pred_lang\nFROM documents"
)


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation-ratio / stopword-ratio /
    mean-word-length features + a composite keep/drop score — the standard
    Gopher/C4-style cheap filters."""
    docs = prepared(spark, sf_dir).table("documents")
    n_chars = F.length("text")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    n_tok = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), F.lit(0)))
    stop = F.array(*[F.lit(w) for w in ["the", "and", "of", "to", "a", "in", "is"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / F.greatest(n_tok, F.lit(1)),
        6,
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6)
    keep = (
        (n_tok >= 10)
        & (punct_ratio < 0.2)
        & (mean_wl >= 2.0)
        & (mean_wl <= 12.0)
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_wl.alias("mean_word_len"),
        keep.alias("keep"),
    )


_QUALITY_SQL = r"""
SELECT doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio, mean_word_len,
       (n_tokens >= 10 AND punct_ratio < 0.2
        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0) AS keep
FROM (
  SELECT doc_id,
         length(text) AS n_chars,
         len(toks) AS n_tokens,
         round(len(regexp_extract_all(text, '[^\w\s]')) / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(toks, t -> list_contains(['the','and','of','to','a','in','is'], t)))
               / greatest(len(toks), 1), 6) AS stopword_ratio,
         round(list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1), 6) AS mean_word_len
  FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
)
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase text
    (content hash) + a positional rolling fingerprint (md5 of every 16th
    token joined) — cheap shift-resistant signature."""
    docs = prepared(spark, sf_dir).table("documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    toks = F.regexp_extract_all(norm, F.lit(r"\S+"), F.lit(0))
    sampled = F.filter(toks, lambda t, i: i % 16 == 0)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_hash"),
        F.md5(F.concat_ws("|", sampled)).alias("sampled_hash"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS content_hash,
       md5(array_to_string(list_filter(toks, (t, i) -> (i - 1) % 16 = 0), '|')) AS sampled_hash,
       len(toks) AS n_tokens
FROM (
  SELECT doc_id, text,
         regexp_extract_all(lower(regexp_replace(text, '\s+', ' ', 'g')), '\S+') AS toks
  FROM documents
)
"""


def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency top-50 (vocabulary analysis): explode tokens →
    count → deterministic top-k. Map-side partial counts mean the shuffle
    carries one row per distinct token per partition — vocabulary-bounded,
    not corpus-bounded, which is what makes this viable at 100 TB."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(50)
    )


_TOP_TOKENS_SQL = r"""
SELECT token, count(*) AS freq
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents)
GROUP BY token ORDER BY freq DESC, token LIMIT 50
"""


QUERIES = {
    "token_stats": token_stats,
    "top_tokens": top_tokens,
    "lang_id": lang_id,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
}

ORACLES = {
    "token_stats": _TOKEN_STATS_SQL,
    "top_tokens": _TOP_TOKENS_SQL,
    "lang_id": _LANG_ID_SQL,
    "quality_score": _QUALITY_SQL,
    "doc_fingerprint": _FINGERPRINT_SQL,
}
