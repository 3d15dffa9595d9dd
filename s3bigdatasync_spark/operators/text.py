"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (per the north star): language-ID,
quality scoring, token counting, document fingerprinting — all pure JVM-side
Catalyst expressions over the `documents` table. No Python in the hot path;
at 100 TB these are embarrassingly parallel scan+project jobs whose cost is
the parquet read itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import prepared, scoped_cache

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


def pred_lang_col() -> Column:
    """The language-ID argmax as ONE per-row expression over `text` —
    shared by lang_id and the corpus pipeline's single-pass gate."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    scores = {lg: _marker_hits(toks, words) for lg, words in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, "und")
    for lg in _LANG_MARKERS:  # first max wins — same order in the oracle CASE
        pred = pred.when(scores[lg] == best, lg)
    return pred


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


def quality_cols() -> dict[str, Column]:
    """Per-row quality expressions over a `text` column — shared by
    quality_score and the corpus pipeline's single-pass gate computation."""
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
    return {
        "n_chars": n_chars,
        "n_tok": n_tok,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_wl": mean_wl,
        "keep": keep,
    }


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation-ratio / stopword-ratio /
    mean-word-length features + a composite keep/drop score — the standard
    Gopher/C4-style cheap filters."""
    docs = prepared(spark, sf_dir).table("documents")
    c = quality_cols()
    n_chars, n_tok = c["n_chars"], c["n_tok"]
    punct_ratio, stop_ratio, mean_wl, keep = (
        c["punct_ratio"],
        c["stop_ratio"],
        c["mean_wl"],
        c["keep"],
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


CHUNK_SIZE = 32  # tokens per chunk
CHUNK_STRIDE = 24  # => 8-token overlap between consecutive chunks


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking — the fixed-size context-window splitter
    every training/RAG ingestion pipeline needs. Chunk c of a document covers
    tokens [c*stride, c*stride + size); the last chunk may be short; a
    document shorter than one stride still yields exactly one chunk.

    Pure Catalyst: tokens via regexp_extract_all, chunk starts via
    explode(sequence(...)), chunk text via slice + array_join. No shuffle at
    all — at 100 TB this is a scan+flatMap whose output partitioning simply
    inherits the input's, which is exactly what a downstream pack/tokenize
    stage wants.
    """
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_WS_TOKEN), F.lit(0))
    n_tok = F.size(F.col("toks"))
    starts = F.when(
        n_tok > 0, F.sequence(F.lit(0), n_tok - 1, F.lit(CHUNK_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    chunk_toks = F.slice(F.col("toks"), F.col("start_tok") + 1, CHUNK_SIZE)
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("start_tok"))
        .select(
            "doc_id",
            F.expr(f"CAST(start_tok div {CHUNK_STRIDE} AS INT)").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.size(chunk_toks).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk_toks, " ").alias("chunk_text"),
        )
    )


_DOC_CHUNKS_SQL = rf"""
SELECT doc_id,
       cast(s // {CHUNK_STRIDE} AS INT) AS chunk_id,
       cast(s AS BIGINT) AS start_tok,
       len(toks[s + 1 : s + {CHUNK_SIZE}]) AS n_chunk_tokens,
       array_to_string(toks[s + 1 : s + {CHUNK_SIZE}], ' ') AS chunk_text
FROM (
  SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS s
  FROM (SELECT doc_id, regexp_extract_all(text, '{_WS_TOKEN}') AS toks FROM documents)
)
"""

# Per-language keep rates (percent): downsample the dominant language,
# keep the tail — the standard corpus language-rebalancing curation step.
_STRATA_RATES: dict[str, int] = {"en": 10, "fr": 40, "es": 40, "de": 40, "zh": 40}


def _hex4_bucket_sql(expr: str) -> str:
    """DuckDB-side: first 4 md5 hex chars of expr → 16-bit int (no conv())."""
    return " + ".join(
        f"(instr('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates applied via
    the md5-bucket predicate (stable across runs, partitionings, and engines —
    unlike TABLESAMPLE). The predicate is a pure scan-level filter: no
    shuffle, composable with any downstream op, and the same doc_id always
    makes the same keep/drop decision, so incremental re-runs are idempotent."""
    docs = prepared(spark, sf_dir).table("documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    rate = F.lit(0)
    for lg, pct in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == lg, int(65536 * pct / 100)).otherwise(rate)
    return docs.filter(bucket < rate).select("doc_id", "lang", "source", "n_chars")


_STRATIFIED_SQL = (
    "SELECT doc_id, lang, source, n_chars FROM documents\nWHERE "
    + _hex4_bucket_sql("cast(doc_id AS VARCHAR)")
    + " < CASE lang "
    + " ".join(f"WHEN '{lg}' THEN {int(65536 * pct / 100)}" for lg, pct in _STRATA_RATES.items())
    + " ELSE 0 END"
)


TOKENS_PER_SHARD = 2048  # shard token budget (concat-then-split packing)


def token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign doc_chunks to fixed-token-budget training
    shards. Concat-then-split semantics — chunks are laid out in global
    (doc_id, chunk_id) order and a chunk belongs to the shard where its
    token-stream offset starts, so a shard may overrun the budget by at most
    one chunk (no chunk is ever split).

    Composition proof-point: doc_chunks (shuffle-free flatMap) feeds
    operators.prefix.with_global_order (distributed exclusive prefix sum over
    the chunk token counts — no single-partition window), then a plain
    groupBy. At 100 TB the only shuffles are the range partition and the
    final per-shard agg, both on bounded keys.
    """
    from .prefix import with_global_order

    chunks = doc_chunks(spark, sf_dir).select("doc_id", "chunk_id", "n_chunk_tokens")
    ordered = with_global_order(chunks, ["doc_id", "chunk_id"], sum_col="n_chunk_tokens")
    return (
        ordered.withColumn(
            "shard_id", F.expr(f"global_cumsum_ex div {TOKENS_PER_SHARD}")
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


_TOKEN_SHARDS_SQL = (
    "WITH chunks AS (" + _DOC_CHUNKS_SQL + f""")
SELECT cast(cum_ex // {TOKENS_PER_SHARD} AS BIGINT) AS shard_id,
       count(*) AS n_chunks,
       cast(sum(n_chunk_tokens) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id
FROM (
  SELECT doc_id, n_chunk_tokens,
         sum(n_chunk_tokens) OVER (ORDER BY doc_id, chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chunk_tokens AS cum_ex
  FROM chunks
)
GROUP BY shard_id
"""
)


# --- training_order: seeded global corpus shuffle ---------------------------

SHUFFLE_SEED = "s42"  # training-order shuffle seed (string-keyed, portable)
DOCS_PER_TRAIN_SHARD = 32


def training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle for training-data ordering: every
    doc gets a seeded pseudo-random position, then positions are cut into
    fixed-size training shards. The step between a curated corpus and a
    dataloader — training wants documents well-mixed across sources, and the
    order must be reproducible from the seed alone (resume-from-step, data
    ablations). Changing SHUFFLE_SEED reshuffles; same seed always yields the
    same order on any engine/partitioning.

    Scale: the shuffle key is md5(seed || doc_id) — uniform by construction,
    so repartitionByRange splits evenly with no skew — and the global
    position rides operators.prefix.with_global_order (range partition +
    local window + broadcast offsets; no single-partition sort). At 100 TB
    this is ONE range exchange, which is also exactly the write order, so
    the shard files come out of the same pass (write-sorted layout)."""
    from .prefix import with_global_order

    docs = prepared(spark, sf_dir).table("documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit(f"{SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    ordered = with_global_order(keyed, ["shuffle_key", "doc_id"])
    return ordered.select(
        "doc_id",
        "source",
        F.col("global_rn").alias("global_pos"),
        F.expr(f"global_rn div {DOCS_PER_TRAIN_SHARD}").alias("shard_id"),
        (F.col("global_rn") % DOCS_PER_TRAIN_SHARD).alias("pos_in_shard"),
    )


_TRAINING_ORDER_SQL = f"""
SELECT doc_id, source,
       rn AS global_pos,
       cast(rn // {DOCS_PER_TRAIN_SHARD} AS BIGINT) AS shard_id,
       rn % {DOCS_PER_TRAIN_SHARD} AS pos_in_shard
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           ORDER BY md5(concat('{SHUFFLE_SEED}:', cast(doc_id AS VARCHAR))), doc_id
         ) - 1 AS rn
  FROM documents
)
"""


# --- seq_packing_plan: max_seq_len selection evidence -------------------------

PACK_SEQ_LENS = (16, 32, 64, 128)  # candidate max_seq_len configs
_PACK_MODES = ("truncate", "chunk")


def seq_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length planning evidence: for each candidate max_seq_len L and
    each packing mode, measure exactly what the corpus would pay. `truncate`
    keeps one L-slot sequence per doc (tokens past L are lost — the waste is
    trunc_tokens); `chunk` splits a doc into ceil(t/L) sequences with only the
    last one padded (no loss — the waste is pad_tokens). utilization =
    kept_tokens / (n_seqs * L): the fraction of training slots carrying real
    tokens. doc_chunks/token_shards EXECUTE a packing; this relation is the
    measurement that picks L before committing a 100 TB tokenization run —
    the truncation-loss-vs-padding-waste tradeoff read directly off the
    corpus's own token histogram instead of guessed. NULL text counts as a
    zero-token doc (coalesced to '' in BOTH engines — Spark's
    size(regexp_extract_all(NULL)) is -1 while DuckDB drops NULL from sums,
    so an uncoalesced NULL is a cross-engine divergence AND a negative
    token count; tests/test_new_ops.py pins the NULL-text corpus).

    Scale shape: one scan computing each doc's BPE token count (pure Catalyst
    regexp, no Python), an 8-way literal-array explode (zero exchange), and
    one 8-key hash agg with map-side combine. Every measure is an exact
    integer sum; the single float is the final utilization ratio, round(6)
    (the cross-engine-determinism contract). A zero-token doc still costs one
    all-pad sequence in both modes (n_seqs >= 1 per doc)."""
    docs = prepared(spark, sf_dir).table("documents")
    t = F.size(
        F.regexp_extract_all(
            F.coalesce(F.col("text"), F.lit("")), F.lit(_BPE_TOKEN), F.lit(0)
        )
    )
    configs = F.array(
        *[
            F.struct(F.lit(mode).alias("mode"), F.lit(L).alias("max_seq_len"))
            for mode in _PACK_MODES
            for L in PACK_SEQ_LENS
        ]
    )
    per_doc = (
        docs.select(t.cast("long").alias("t"))
        .select("t", F.explode(configs).alias("c"))
        .select(
            F.col("c.mode").alias("mode"),
            F.col("c.max_seq_len").alias("max_seq_len"),
            "t",
            F.when(
                F.col("c.mode") == "truncate", F.lit(1).cast("long")
            )
            .otherwise(
                F.greatest(
                    F.expr("CAST((t + c.max_seq_len - 1) DIV c.max_seq_len AS BIGINT)"),
                    F.lit(1).cast("long"),
                )
            )
            .alias("n_seqs"),
            F.when(
                F.col("c.mode") == "truncate",
                F.least(F.col("t"), F.col("c.max_seq_len").cast("long")),
            )
            .otherwise(F.col("t"))
            .alias("kept"),
        )
    )
    agg = per_doc.groupBy("mode", "max_seq_len").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_seqs").alias("n_seqs"),
        F.sum("kept").alias("kept_tokens"),
        F.sum(F.col("t") - F.col("kept")).alias("trunc_tokens"),
        F.sum(F.col("n_seqs") * F.col("max_seq_len") - F.col("kept")).alias(
            "pad_tokens"
        ),
    )
    util = F.col("kept_tokens").cast("double") / (
        F.col("n_seqs") * F.col("max_seq_len")
    ).cast("double")
    return agg.select(
        "mode",
        F.col("max_seq_len").cast("long").alias("max_seq_len"),
        "n_docs",
        "n_seqs",
        "kept_tokens",
        "trunc_tokens",
        "pad_tokens",
        F.round(util, 6).alias("utilization"),
    )


_PACK_CONFIG_VALUES = ", ".join(
    f"('{mode}', {L})" for mode in _PACK_MODES for L in PACK_SEQ_LENS
)

_SEQ_PACKING_SQL = rf"""
WITH cfg(mode, max_seq_len) AS (VALUES {_PACK_CONFIG_VALUES}),
per_doc AS (
  SELECT mode, max_seq_len, t,
         CASE WHEN mode = 'truncate' THEN 1
              ELSE greatest((t + max_seq_len - 1) // max_seq_len, 1) END AS n_seqs,
         CASE WHEN mode = 'truncate' THEN least(t, max_seq_len) ELSE t END AS kept
  FROM (SELECT cast(len(regexp_extract_all(coalesce(text, ''), '{_BPE_TOKEN}')) AS BIGINT) AS t
        FROM documents), cfg
)
SELECT mode, cast(max_seq_len AS BIGINT) AS max_seq_len,
       count(*) AS n_docs,
       cast(sum(n_seqs) AS BIGINT) AS n_seqs,
       cast(sum(kept) AS BIGINT) AS kept_tokens,
       cast(sum(t - kept) AS BIGINT) AS trunc_tokens,
       cast(sum(n_seqs * max_seq_len - kept) AS BIGINT) AS pad_tokens,
       round(cast(sum(kept) AS DOUBLE)
             / cast(sum(n_seqs) * max_seq_len AS DOUBLE), 6) AS utilization
FROM per_doc
GROUP BY mode, max_seq_len
"""


# --- Decontamination: eval-holdout n-gram overlap ---------------------------
#
# The standard train/test contamination check (GPT-3 appendix C / PaLM style):
# designate a deterministic holdout of documents as the "benchmark" set, then
# flag every training document that shares at least one SHINGLE_N-token
# shingle with any holdout document. Holdout membership rides the same
# md5-bucket predicate as stratified_sample, so both engines (and successive
# runs) agree on the split with no stored state.
#
# Scale story: the holdout shingle set is benchmark-sized (MBs) while the
# training side is corpus-sized (TBs) — so the plan is explode(train shingles)
# ⋈ broadcast(distinct holdout shingles), a map-side hash semi-join with NO
# shuffle of the big side; the only shuffle is the per-doc hit count groupBy.

SHINGLE_N = 8  # tokens per contamination shingle
_EVAL_PCT = 5  # holdout share, in md5-bucket percent


def _shingle_col(toks: Column, n: int) -> Column:
    """Distinct n-token shingles of a token array (empty when < n tokens).
    The n>=size guard matters: Spark's sequence(0, negative) would count DOWN."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _eval_bucket(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-doc contamination report against the deterministic
    ~5% eval holdout: distinct-shingle count, eval-shingle hits, verdict."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    cutoff = int(65536 * _EVAL_PCT / 100)
    base = docs.select(
        "doc_id",
        (_eval_bucket(F.col("doc_id")) < cutoff).alias("is_eval"),
        _shingle_col(toks, SHINGLE_N).alias("shingles"),
    )
    doc_sh = base.select("doc_id", "is_eval", F.explode("shingles").alias("shingle"))
    eval_sh = doc_sh.filter("is_eval").select("shingle").distinct()
    hits = (
        doc_sh.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_eval_hits"))  # shingles pre-distinct per doc
    )
    return (
        base.filter(~F.col("is_eval"))
        .select("doc_id", F.size("shingles").cast("long").alias("n_shingles"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


_DECONTAMINATE_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         ({_hex4_bucket_sql("cast(doc_id AS VARCHAR)")}) < {int(65536 * _EVAL_PCT / 100)} AS is_eval,
         CASE WHEN len(toks) >= {SHINGLE_N}
              THEN list_distinct(list_transform(
                     generate_series(0, len(toks) - {SHINGLE_N}),
                     i -> array_to_string(toks[i + 1 : i + {SHINGLE_N}], ' ')))
              ELSE [] END AS shingles
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
),
doc_sh AS (SELECT doc_id, is_eval, unnest(shingles) AS shingle FROM base),
eval_sh AS (SELECT DISTINCT shingle FROM doc_sh WHERE is_eval),
hits AS (
  SELECT doc_id, count(*) AS n_eval_hits
  FROM doc_sh JOIN eval_sh USING (shingle)
  WHERE NOT is_eval GROUP BY doc_id
)
SELECT base.doc_id,
       len(shingles) AS n_shingles,
       coalesce(n_eval_hits, 0) AS n_eval_hits,
       coalesce(n_eval_hits, 0) > 0 AS contaminated
FROM base LEFT JOIN hits ON base.doc_id = hits.doc_id
WHERE NOT is_eval
"""


# --- Repetition signals (Gopher-style) --------------------------------------
#
# Within-document repetition: duplicate-token fraction and most-frequent-
# bigram share — the cheap Rae et al. (Gopher) filters that catch boilerplate
# and degenerate generations. Per-doc distinct/total come straight off the
# token array; the bigram mode needs a real (doc_id, bigram) groupBy, which
# is two map-side-combinable shuffles keyed by doc — embarrassingly scalable.

def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition report: token counts, duplicate-token ratio, top
    bigram share, and a Gopher-style keep verdict."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        F.when(n >= 2, bigrams).otherwise(F.array().cast("array<string>")).alias("bigrams"),
    )
    top = (
        base.select("doc_id", F.explode("bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )
    dup_ratio = F.round(
        1 - F.col("n_distinct_tokens") / F.greatest(F.col("n_tokens"), F.lit(1)), 6
    )
    top_frac = F.round(
        F.coalesce(F.col("top_bigram_n"), F.lit(0))
        / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)),
        6,
    )
    return (
        base.drop("bigrams")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            dup_ratio.alias("dup_token_ratio"),
            F.coalesce("top_bigram_n", F.lit(0)).cast("long").alias("top_bigram_n"),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            top_frac.alias("top_bigram_frac"),
            (
                (dup_ratio <= F.lit(0.82)) & (top_frac <= F.lit(0.05))
            ).alias("keep"),
        )
    )


_REPETITION_SQL = r"""
WITH base AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct_tokens,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS bigrams
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
),
top AS (
  SELECT doc_id, max(c) AS top_bigram_n, sum(c) AS n_bigrams
  FROM (
    SELECT doc_id, bigram, count(*) AS c
    FROM (SELECT doc_id, unnest(bigrams) AS bigram FROM base)
    GROUP BY doc_id, bigram
  ) GROUP BY doc_id
)
SELECT base.doc_id, n_tokens, n_distinct_tokens,
       round(1 - n_distinct_tokens / greatest(n_tokens, 1), 6) AS dup_token_ratio,
       cast(coalesce(top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       cast(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(top_bigram_n, 0) / greatest(coalesce(n_bigrams, 0), 1), 6) AS top_bigram_frac,
       (round(1 - n_distinct_tokens / greatest(n_tokens, 1), 6) <= 0.82
        AND round(coalesce(top_bigram_n, 0) / greatest(coalesce(n_bigrams, 0), 1), 6) <= 0.05) AS keep
FROM base LEFT JOIN top ON base.doc_id = top.doc_id
"""


# --- Corpus mixture weights --------------------------------------------------
#
# Per-source token accounting + the up/down-sampling weight that would flatten
# the mixture to uniform across sources — the knob every pretraining data
# recipe turns. One vocabulary-bounded agg, then a broadcast of the 1-row
# total; nothing here grows with corpus size except the first scan.

def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = prepared(spark, sf_dir).table("documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_TOKEN), F.lit(0)))
    per_src = (
        docs.select("source", bpe.cast("long").alias("t"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("t").alias("total_tokens"))
    )
    totals = per_src.agg(
        F.sum("total_tokens").alias("all_tokens"),
        F.count("*").alias("n_sources"),
    )
    share = F.col("total_tokens") / F.col("all_tokens")
    return per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(share, 6).alias("token_share"),
        F.round((1 / F.col("n_sources")) / share, 6).alias("mix_weight"),
    )


_SOURCE_MIX_SQL = rf"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len(regexp_extract_all(text, '{_BPE_TOKEN}'))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
),
totals AS (SELECT cast(sum(total_tokens) AS BIGINT) AS all_tokens,
                  count(*) AS n_sources FROM per_src)
SELECT source, n_docs, total_tokens,
       round(total_tokens / all_tokens, 6) AS token_share,
       round((1.0 / n_sources) / (total_tokens / all_tokens), 6) AS mix_weight
FROM per_src, totals
"""


# --- bigram collocations (PMI) ----------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP_K = 50


def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining: top bigrams by pointwise mutual information
    — the corpus-statistics pass behind tokenizer-vocabulary and
    phrase-detection steps in a training-data pipeline.

    pmi = ln( (c_xy / B) / ((c_x / U) * (c_y / U)) ) with B total bigrams,
    U total unigrams. Two exploded groupBys (bigrams, unigrams) plus two
    broadcast joins — the unigram relation is vocabulary-sized, orders of
    magnitude smaller than the corpus, so the big side shuffles once at any
    scale. Deterministic top-k: (pmi, w1, w2) is a total order."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = docs.selectExpr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS t"
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(t)-1, 0)),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = (
        docs.selectExpr("explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS w")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    u_total = uni.groupBy().agg(F.sum("c").alias("u_tot"))
    bg = toks.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    b_total = bg.groupBy().agg(F.sum("c_xy").alias("b_tot"))
    out = (
        bg.filter(F.col("c_xy") >= _PMI_MIN_COUNT)
        .join(F.broadcast(uni.selectExpr("w AS w1", "c AS c_x")), "w1")
        .join(F.broadcast(uni.selectExpr("w AS w2", "c AS c_y")), "w2")
        .crossJoin(F.broadcast(b_total))
        .crossJoin(F.broadcast(u_total))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("b_tot"))
                    / ((F.col("c_x") / F.col("u_tot")) * (F.col("c_y") / F.col("u_tot")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return out.orderBy(F.desc("pmi"), "w1", "w2").limit(_PMI_TOP_K)


_PMI_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
uni AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
bg AS (
  SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS c_xy
  FROM (SELECT t, unnest(generate_series(1, len(t)-1)) AS i FROM toks)
  GROUP BY 1, 2
),
tot AS (
  SELECT (SELECT sum(c) FROM uni)::DOUBLE AS u_tot,
         (SELECT sum(c_xy) FROM bg)::DOUBLE AS b_tot
)
SELECT w1, w2, c_xy,
       round(ln((c_xy / b_tot) / ((cx.c / u_tot) * (cy.c / u_tot))), 6) AS pmi
FROM bg, tot
JOIN uni cx ON cx.w = bg.w1
JOIN uni cy ON cy.w = bg.w2
WHERE c_xy >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {_PMI_TOP_K}
"""


# --- inverted index + BM25 keyword search -----------------------------------
# The retrieval side of a corpus engine: build token posting-list stats, then
# rank documents for a keyword query with BM25. Everything is exact-integer
# tf/df plus one ln and one division on identical doubles (the tfidf_top_terms
# precedent, round-6 pinned).

IDX_TOP_TOKENS = 50
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "join", "window", "stream")
BM25_TOP_N = 10


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics for the IDX_TOP_TOKENS highest-df tokens:
    document frequency, total term frequency, and the top-scoring posting
    (highest tf, doc_id tiebreak). Scale: explode + two hash aggs on the token
    key + one per-token window — token keys are vocabulary-bounded, and the
    final top-50 is TakeOrderedAndProject (no global sort materializes)."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("token").orderBy(F.desc("tf"), "doc_id")
    per_token = (
        tf.withColumn("rnk", F.row_number().over(w))
        .groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("tf_total"),
            F.max(F.when(F.col("rnk") == 1, F.col("doc_id"))).alias("top_doc_id"),
            F.max(F.when(F.col("rnk") == 1, F.col("tf"))).alias("top_doc_tf"),
        )
    )
    return per_token.orderBy(F.desc("df"), F.desc("tf_total"), "token").limit(
        IDX_TOP_TOKENS
    )


_INVERTED_INDEX_SQL = f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents)
  GROUP BY doc_id, token
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS rnk
  FROM tf
)
SELECT token, count(*) AS df, cast(sum(tf) AS BIGINT) AS tf_total,
       max(CASE WHEN rnk = 1 THEN doc_id END) AS top_doc_id,
       max(CASE WHEN rnk = 1 THEN tf END) AS top_doc_tf
FROM ranked
GROUP BY token
ORDER BY df DESC, tf_total DESC, token
LIMIT {IDX_TOP_TOKENS}
"""


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unlimited BM25 relation (doc_id, bm25, n_query_terms) for the
    fixed keyword query — every doc containing >=1 query term, scored.
    bm25_search takes its top-10; similarity.hybrid_search fuses its
    top-HYBRID_POOL ranking with the cosine side."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0))
    tok = docs.select("doc_id", F.explode(toks).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    qtf = (
        tok.filter(F.col("token").isin(*BM25_QUERY))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    qdf = qtf.groupBy("token").agg(F.count("*").alias("df"))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * F.col("tf") * (BM25_K1 + 1.0) / denom
    return (
        qtf.join(F.broadcast(qdf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count("*").alias("n_query_terms"),
        )
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed keyword query (k1=1.2, b=0.75,
    idf = ln((N-df+0.5)/(df+0.5)+1)). avgdl is the exact bigint ratio
    total_tokens/n_docs so no float accumulation order exists anywhere;
    the only floats are per-term idf/tf ratios and a ≤4-term sum, rounded
    to 6dp. Scale: the tf relation is pre-filtered to the query tokens
    (predicate on the explode output, pushed inside the scan stage), df and
    corpus stats are single-row/4-row broadcasts, and the top-10 is
    TakeOrderedAndProject."""
    return (
        bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP_N)
    )


_BM25_TERMS = ", ".join(f"'{t}'" for t in BM25_QUERY)

_BM25_SCORED_CTES = f"""tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
), dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, cast(sum(dl) AS BIGINT) AS total_tokens FROM dl),
qtf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token IN ({_BM25_TERMS}) GROUP BY doc_id, token
), qdf AS (SELECT token, count(*) AS df FROM qtf GROUP BY token),
bm25_scored AS (
  SELECT doc_id,
         round(sum(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * tf * ({BM25_K1} + 1.0)
           / (tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * cast(dl AS DOUBLE)
                / (cast(total_tokens AS DOUBLE) / cast(n_docs AS DOUBLE))))
         ), 6) AS bm25,
         count(*) AS n_query_terms
  FROM qtf JOIN qdf USING (token) JOIN dl USING (doc_id), stats
  GROUP BY doc_id
)"""

_BM25_SQL = f"""
WITH {_BM25_SCORED_CTES}
SELECT doc_id, bm25, n_query_terms
FROM bm25_scored
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP_N}
"""


# --- bpe_merges: byte-pair-encoding vocabulary training ----------------------

BPE_ROUNDS = 4


def _bpe_prep_spark(docs: DataFrame) -> DataFrame:
    """Symbol stream per doc: lowercase, non-alnum runs → one '_' boundary
    symbol, then every char spaced out — ' h e l l o _ w o r l d '."""
    cleaned = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", "_")
    spaced = F.concat(F.lit(" "), F.regexp_replace(cleaned, r"(.)", r"$1 "))
    return docs.select("doc_id", spaced.alias("s"))


def _bpe_pair_counts(sdf: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the corpus — a vocabulary²-bounded
    aggregation (map-side combinable), never corpus-bounded."""
    toks = F.split(F.trim(F.col("s")), " ")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("l"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("r"),
    )
    return (
        sdf.select(F.explode(pairs).alias("p"))
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .groupBy("l", "r")
        .agg(F.count("*").alias("freq"))
    )


def _bpe_apply(sdf: DataFrame, left: str, right: str) -> DataFrame:
    """Merge every adjacent (left, right) occurrence. The spaced-string
    replace consumes the shared boundary space, so a chain like 'a b a b'
    only merges alternate occurrences in one pass — a second pass catches
    the stragglers (after pass one no two remaining occurrences share a
    boundary), which exactly reproduces greedy left-to-right BPE ('a a a'
    with merge (a,a) → [aa, a], both engines, same answer)."""
    pat = f" {left} {right} "
    rep = f" {left}{right} "
    s1 = F.replace(F.col("s"), F.lit(pat), F.lit(rep))
    s2 = F.replace(s1, F.lit(pat), F.lit(rep))
    return sdf.select("doc_id", s2.alias("s"))


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding vocabulary training (Sennrich et al. 2016), the
    canonical LLM-tokenizer job, done Spark-first: BPE_ROUNDS greedy merge
    rounds, each = one vocabulary²-bounded pair-count aggregation + a 1-row
    driver collect (the merge table IS the model — the same legitimate
    driver state every distributed trainer ships) + one scan applying the
    merge. Output: the learned merge table (round, left, right, merged,
    freq), deterministic via (freq DESC, left, right) tie-break.

    At 100 TB: tokenizer training never runs on the full corpus — compose
    with deterministic_sample/dataset_split for the standard sample-then-
    train flow; each round's heavy op is the pair count, which aggregates to
    |vocab|² keys regardless of corpus size. The DuckDB oracle replays all
    rounds from the same prep/count/apply text."""
    return spark.createDataFrame(
        _bpe_merge_rows(spark, sf_dir),
        "round int, lhs string, rhs string, merged string, freq long",
    )


def _bpe_merge_rows(spark: SparkSession, sf_dir: str) -> list:
    """The learned merge table as driver rows, query-scope-memoized (r11):
    bpe_tokenize (and through it vocab_coverage) re-ran the whole BPE_ROUNDS
    training loop to get the merge list — inside a pack that meant training
    twice per query. The prep stream (two regexes over every character of
    the corpus) is also query-scope-cached: each round's pair count
    re-derived it from parquet, so training cost was BPE_ROUNDS regex preps
    plus an O(rounds²) replay of the apply chain; now prep runs once and
    rounds read the pin."""
    from . import scoped_memo

    def build():
        from . import scoped_cache

        docs = prepared(spark, sf_dir).table("documents")
        sdf = scoped_cache(_bpe_prep_spark(docs))
        out_rows = []
        for rnd in range(1, BPE_ROUNDS + 1):
            top = (
                _bpe_pair_counts(sdf)
                .orderBy(F.desc("freq"), "l", "r")
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, freq = top[0]["l"], top[0]["r"], top[0]["freq"]
            out_rows.append((rnd, l, r, l + r, int(freq)))
            sdf = _bpe_apply(sdf, l, r)
        return out_rows

    return scoped_memo(("bpe_merge_rows", sf_dir), build)


def _bpe_ctes(final_apply: bool) -> tuple[list[str], list[str]]:
    """(CTE list, per-round merge-row selects) for the BPE training replay.
    final_apply=True also materializes s{BPE_ROUNDS} (the fully-encoded
    corpus) for the tokenize oracle."""
    prep = (
        "SELECT doc_id, ' ' || regexp_replace(regexp_replace(lower(text),"
        " '[^a-z0-9]+', '_', 'g'), '(.)', '\\1 ', 'g') AS s FROM documents"
    )
    count_tpl = """
SELECT l, r, count(*) AS freq FROM (
  SELECT toks[i] AS l, toks[i + 1] AS r
  FROM (SELECT string_split(trim({src}.s), ' ') AS toks FROM {src}),
       unnest(generate_series(1, len(toks) - 1)) u(i)
) GROUP BY l, r"""
    top_tpl = "SELECT l, r, freq FROM c{n} ORDER BY freq DESC, l, r LIMIT 1"
    apply_tpl = """
SELECT doc_id,
       replace(replace(s{prev}.s, ' ' || t{n}.l || ' ' || t{n}.r || ' ',
                       ' ' || t{n}.l || t{n}.r || ' '),
               ' ' || t{n}.l || ' ' || t{n}.r || ' ',
               ' ' || t{n}.l || t{n}.r || ' ') AS s
FROM s{prev}, t{n}"""
    ctes = [f"s0 AS ({prep})"]
    selects = []
    for n in range(1, BPE_ROUNDS + 1):
        ctes.append(f"c{n} AS ({count_tpl.format(src=f's{n - 1}')})")
        ctes.append(f"t{n} AS ({top_tpl.format(n=n)})")
        if n < BPE_ROUNDS or final_apply:
            ctes.append(f"s{n} AS ({apply_tpl.format(prev=n - 1, n=n)})")
        selects.append(
            f"SELECT {n} AS round, l AS lhs, r AS rhs,"
            f" l || r AS merged, cast(freq AS BIGINT) AS freq FROM t{n}"
        )
    return ctes, selects


def _bpe_sql() -> str:
    ctes, selects = _bpe_ctes(final_apply=False)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the learned BPE merge table: apply the
    BPE_ROUNDS merges in training order, then report per-doc symbol counts
    and the compression each doc gets vs its raw character stream — the
    metric that tells a tokenizer build whether the vocabulary earns its
    size. Training state (the merge list) is recomputed via the bpe_merges
    rounds (tiny driver loop); encoding itself is BPE_ROUNDS pure scans —
    no shuffle at all, embarrassingly parallel at any corpus size."""
    docs = prepared(spark, sf_dir).table("documents")
    merges = [(l, r) for _, l, r, _, _ in _bpe_merge_rows(spark, sf_dir)]
    sdf = _bpe_prep_spark(docs)
    for l, r in merges:
        sdf = _bpe_apply(sdf, l, r)
    toks = F.split(F.trim(F.col("s")), " ")
    n_syms = F.size(F.filter(toks, lambda x: x != ""))
    # character count of the cleaned stream = total symbol characters
    chars = F.aggregate(
        F.filter(toks, lambda x: x != ""),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    return sdf.select(
        "doc_id",
        chars.alias("n_chars_clean"),
        n_syms.alias("n_symbols"),
        F.round(
            chars / F.nullif(n_syms.cast("double"), F.lit(0.0)), 6
        ).alias("chars_per_symbol"),
    )


def _bpe_tokenize_sql() -> str:
    ctes, _selects = _bpe_ctes(final_apply=True)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
syms AS (
  SELECT doc_id, list_filter(string_split(trim(s), ' '), x -> x <> '') AS toks
  FROM s{BPE_ROUNDS}
)
SELECT doc_id,
       cast(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS INT)
         AS n_chars_clean,
       cast(len(toks) AS INT) AS n_symbols,
       round(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
             / nullif(cast(len(toks) AS DOUBLE), 0.0), 6) AS chars_per_symbol
FROM syms"""
    )


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer FERTILITY under the learned BPE merges — BPE
    symbols emitted per whitespace word, the standard cross-source tokenizer
    health metric (a source whose fertility is 2× the corpus mean is paying
    2× its share of the context window; the signal that drives vocab
    re-training or per-source mixing adjustments).

    Cost over bpe_tokenize is ONE extra groupBy(source) — map-side
    combinable to ≤|sources| rows; the merge table itself is the bpe_merges
    driver loop (1 row per round, the legitimate model state). Fertility is
    a ratio of exact integer sums (symbol and word counts), so the 6dp
    rounding is engine-exact by construction."""
    docs = prepared(spark, sf_dir).table("documents")
    per_doc = bpe_tokenize(spark, sf_dir).select("doc_id", "n_symbols")
    words = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    base = docs.select("doc_id", "source", words.cast("long").alias("n_words"))
    agg = (
        base.join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_symbols").cast("long").alias("n_bpe_tokens"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6).alias("fertility"),
    )


def _fertility_sql() -> str:
    ctes, _selects = _bpe_ctes(final_apply=True)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
syms AS (
  SELECT doc_id,
         len(list_filter(string_split(trim(s), ' '), x -> x <> '')) AS n_symbols
  FROM s{BPE_ROUNDS}
),
base AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words
  FROM documents
)
SELECT b.source, count(*) AS n_docs,
       cast(sum(b.n_words) AS BIGINT) AS n_words,
       cast(sum(sy.n_symbols) AS BIGINT) AS n_bpe_tokens,
       round(sum(sy.n_symbols) / CAST(sum(b.n_words) AS DOUBLE), 6) AS fertility
FROM base b JOIN syms sy USING (doc_id)
GROUP BY b.source"""
    )


# --- vocab_coverage: tokenizer-coverage analysis -----------------------------

VOCAB_V = 256  # top-V corpus tokens form the "tokenizer vocabulary"


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc OOV analysis against a top-V corpus vocabulary — the question
    every tokenizer build asks ("what coverage does a V-entry vocab buy, and
    which docs fall outside it"). Vocabulary = the VOCAB_V most frequent
    tokens (ties broken by token asc, engine-deterministic).

    Plan: one explode → (doc, token) count pass, cache-pinned (feeds both the
    vocabulary top-k and the per-doc rollup); the vocabulary itself compiles
    to TakeOrderedAndProject and joins back as a V-row broadcast. Per-doc
    output, no window, no global order."""
    docs = prepared(spark, sf_dir).table("documents")
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0)
    )
    dcnt = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
        .transform(scoped_cache)
    )
    vocab = (
        dcnt.groupBy("token")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(VOCAB_V)
        .select("token", F.lit(1).alias("in_v"))
    )
    per = (
        dcnt.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), F.col("c")).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
    )


_VOCAB_COVERAGE_SQL = rf"""
WITH dcnt AS (
  SELECT doc_id, token, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents)
  GROUP BY doc_id, token
),
vocab AS (
  SELECT token FROM (
    SELECT token, sum(c) AS cnt FROM dcnt GROUP BY token
  ) ORDER BY cnt DESC, token LIMIT {VOCAB_V}
),
per AS (
  SELECT d.doc_id, sum(d.c) AS n_tokens,
         sum(CASE WHEN v.token IS NULL THEN d.c ELSE 0 END) AS n_oov
  FROM dcnt d LEFT JOIN vocab v USING (token)
  GROUP BY d.doc_id
)
SELECT doc_id, cast(n_tokens AS BIGINT) AS n_tokens, cast(n_oov AS BIGINT) AS n_oov,
       round(n_oov / CAST(n_tokens AS DOUBLE), 6) AS oov_rate
FROM per
"""


# --- round-3: temperature-flattened source mixing -----------------------------

MIX_BUDGET_TOKENS = 1_000_000_000  # the training-budget knob for epoch math


def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source sampling (the standard multilingual /
    data-mixing recipe): q_s ∝ p_s^T with T = 0.5, so low-resource sources are
    upsampled toward — but not onto — uniform. source_mix_weights is the
    T→0 end of this dial (uniform); this is the tempered middle.

    Numeric design for a bitwise-stable oracle: p_s^0.5 reduces to
    sqrt(tokens_s) (the sqrt(total) normalizer cancels), sqrt is the one
    power IEEE-754 requires correctly rounded in every engine (pow is not),
    and the normalizing sum runs in EXACT fixed-point integers
    (floor(sqrt·1e6) as BIGINT) so float summation order can never perturb
    the result. Epochs-at-budget shows the over-sampling consequence:
    tempered weights make small sources repeat.

    Scale: one token-count scan + a ≤|sources|-row broadcast of the totals."""
    docs = prepared(spark, sf_dir).table("documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_TOKEN), F.lit(0)))
    per_src = (
        docs.select("source", bpe.cast("long").alias("t"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("t").alias("total_tokens"))
        .withColumn(
            "sq",
            F.floor(F.sqrt(F.col("total_tokens").cast("double")) * 1e6).cast("long"),
        )
        # per_src feeds both the totals branch and the final select; without
        # the cache the full regexp tokenize scan runs twice
        .transform(scoped_cache)
    )
    totals = per_src.agg(
        F.sum("total_tokens").alias("all_tokens"), F.sum("sq").alias("all_sq")
    )
    j = per_src.crossJoin(F.broadcast(totals))
    nat = F.col("total_tokens") / F.col("all_tokens")
    temp = F.col("sq") / F.col("all_sq")
    return j.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(nat, 6).alias("nat_share"),
        F.round(temp, 6).alias("temp_share"),
        F.round(temp / nat, 6).alias("boost"),
        F.round(F.lit(MIX_BUDGET_TOKENS) * temp / F.col("total_tokens"), 6).alias(
            "epochs_at_budget"
        ),
    )


# --- mix_temperature_sweep: the mixing dial's evidence relation --------------

# Sweep points chosen so every weight is an EXACT cross-engine computation:
# T=0 is uniform (w=1), T=1 is natural (w=tokens, integer), and T=0.5 /
# T=0.25 compose sqrt — the one power IEEE-754 requires correctly rounded —
# with the same floor(·1e6) fixed-point trick temperature_mix_weights proved.
# General pow() is NOT correctly rounded and would flap the oracle hash.
MIX_TEMPERATURES = (0.0, 0.25, 0.5, 1.0)


def mix_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """temperature_mix_weights across the whole temperature dial: per
    (temperature, source), the tempered share, its boost over the natural
    share, and epochs-at-budget — the decision surface for choosing T
    (the dedup_yield_curve / lsh_band_plan pattern applied to the mixing
    knob). T=0 shows the uniform extreme (max upsampling of small sources),
    T=1 the natural extreme (no reweighting); the published recipes sit
    between. Scale: ONE token-count scan (shared, cache-pinned), then a
    |temperatures × sources|-row derivation — all broadcast arithmetic."""
    docs = prepared(spark, sf_dir).table("documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_TOKEN), F.lit(0)))
    per_src = (
        docs.select("source", bpe.cast("long").alias("t"))
        .groupBy("source")
        .agg(F.sum("t").alias("total_tokens"))
        .transform(scoped_cache)
    )
    tok_d = F.col("total_tokens").cast("double")
    w_of = {
        0.0: F.lit(1).cast("long"),
        0.25: F.floor(F.sqrt(F.sqrt(tok_d)) * 1e6).cast("long"),
        0.5: F.floor(F.sqrt(tok_d) * 1e6).cast("long"),
        1.0: F.col("total_tokens").cast("long"),
    }
    weights = None
    for t in MIX_TEMPERATURES:
        part = per_src.select(
            F.lit(float(t)).alias("temperature"),
            "source",
            "total_tokens",
            w_of[t].alias("w"),
        )
        weights = part if weights is None else weights.unionByName(part)
    totals = weights.groupBy("temperature").agg(F.sum("w").alias("all_w"))
    tot0 = per_src.agg(F.sum("total_tokens").alias("all_tokens"))
    share = F.col("w") / F.col("all_w")
    nat = F.col("total_tokens") / F.col("all_tokens")
    return (
        weights.join(F.broadcast(totals), "temperature")
        .crossJoin(F.broadcast(tot0))
        .select(
            "temperature",
            "source",
            "total_tokens",
            F.round(share, 6).alias("share"),
            F.round(share / nat, 6).alias("boost"),
            F.round(
                F.lit(MIX_BUDGET_TOKENS) * share / F.col("total_tokens"), 6
            ).alias("epochs_at_budget"),
        )
        .orderBy("temperature", "source")
    )


def _mix_sweep_sql() -> str:
    tok_d = "cast(total_tokens AS DOUBLE)"
    w_of = {
        0.0: "1",
        0.25: f"cast(floor(sqrt(sqrt({tok_d})) * 1e6) AS BIGINT)",
        0.5: f"cast(floor(sqrt({tok_d}) * 1e6) AS BIGINT)",
        1.0: "total_tokens",
    }
    arms = "\n  UNION ALL\n".join(
        f"  SELECT {t}::DOUBLE AS temperature, source, total_tokens,"
        f" cast({w_of[t]} AS BIGINT) AS w FROM per_src"
        for t in MIX_TEMPERATURES
    )
    return rf"""
WITH per_src AS (
  SELECT source,
         cast(sum(len(regexp_extract_all(text, '{_BPE_TOKEN}'))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
),
weights AS (
{arms}
),
totals AS (SELECT temperature, cast(sum(w) AS BIGINT) AS all_w
           FROM weights GROUP BY temperature),
tot0 AS (SELECT cast(sum(total_tokens) AS BIGINT) AS all_tokens FROM per_src)
SELECT w.temperature, w.source, w.total_tokens,
       round(w.w / t.all_w, 6) AS share,
       round((w.w / t.all_w) / (w.total_tokens / tot0.all_tokens), 6) AS boost,
       round({MIX_BUDGET_TOKENS} * (w.w / t.all_w) / w.total_tokens, 6)
         AS epochs_at_budget
FROM weights w
JOIN totals t ON t.temperature = w.temperature
CROSS JOIN tot0
ORDER BY w.temperature, w.source
"""


_TEMPERATURE_MIX_SQL = rf"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len(regexp_extract_all(text, '{_BPE_TOKEN}'))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
),
sq AS (
  SELECT *, cast(floor(sqrt(cast(total_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS sq
  FROM per_src
),
totals AS (SELECT cast(sum(total_tokens) AS BIGINT) AS all_tokens,
                  cast(sum(sq) AS BIGINT) AS all_sq FROM sq)
SELECT source, n_docs, total_tokens,
       round(total_tokens / all_tokens, 6) AS nat_share,
       round(sq / all_sq, 6) AS temp_share,
       round((sq / all_sq) / (total_tokens / all_tokens), 6) AS boost,
       round({MIX_BUDGET_TOKENS} * (sq / all_sq) / total_tokens, 6) AS epochs_at_budget
FROM sq, totals
"""


QUERIES = {
    "bpe_merges": bpe_merges,
    "temperature_mix_weights": temperature_mix_weights,
    "mix_temperature_sweep": mix_temperature_sweep,
    "bpe_tokenize": bpe_tokenize,
    "tokenizer_fertility": tokenizer_fertility,
    "vocab_coverage": vocab_coverage,
    "bigram_pmi": bigram_pmi,
    "token_stats": token_stats,
    "top_tokens": top_tokens,
    "lang_id": lang_id,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
    "doc_chunks": doc_chunks,
    "stratified_sample": stratified_sample,
    "token_shards": token_shards,
    "training_order": training_order,
    "decontaminate": decontaminate,
    "repetition_stats": repetition_stats,
    "source_mix_weights": source_mix_weights,
    "inverted_index": inverted_index,
    "bm25_search": bm25_search,
    "seq_packing_plan": seq_packing_plan,
}

ORACLES = {
    "bpe_merges": _bpe_sql(),
    "temperature_mix_weights": _TEMPERATURE_MIX_SQL,
    "mix_temperature_sweep": _mix_sweep_sql(),
    "bpe_tokenize": _bpe_tokenize_sql(),
    "tokenizer_fertility": _fertility_sql(),
    "vocab_coverage": _VOCAB_COVERAGE_SQL,
    "decontaminate": _DECONTAMINATE_SQL,
    "repetition_stats": _REPETITION_SQL,
    "source_mix_weights": _SOURCE_MIX_SQL,
    "doc_chunks": _DOC_CHUNKS_SQL,
    "stratified_sample": _STRATIFIED_SQL,
    "token_shards": _TOKEN_SHARDS_SQL,
    "training_order": _TRAINING_ORDER_SQL,
    "token_stats": _TOKEN_STATS_SQL,
    "top_tokens": _TOP_TOKENS_SQL,
    "lang_id": _LANG_ID_SQL,
    "quality_score": _QUALITY_SQL,
    "doc_fingerprint": _FINGERPRINT_SQL,
    "bigram_pmi": _PMI_SQL,
    "inverted_index": _INVERTED_INDEX_SQL,
    "bm25_search": _BM25_SQL,
    "seq_packing_plan": _SEQ_PACKING_SQL,
}
