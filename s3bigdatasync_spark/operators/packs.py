"""Driver-registry packs: several individually-oracle-checked queries unioned
into one canonical relation, so every operator's semantics fits inside the
external driver's 50-entry correctness budget.

Round 1 showed the driver records at most 50 registry entries per round
(CORRECTNESS_r01.json holds exactly the first 50 of 68, in insertion order,
and modules 11-16 never appear). Rather than leave 18 queries permanently
driver-unverified, related small queries are packed: each pack runs its
members and unpivots every result into ONE canonical layout

    part  — member query name
    col   — member column name
    val_s — exact string rendering (string cols; int/bool via CAST; NULL for double)
    val_d — double value (double cols only; NULL otherwise)

One row per (member, source-row, column). The driver's compare sorts columns
by name and hashes the row multiset, so the unpivot loses nothing it checks.
Integer values travel as strings (exact at any magnitude — a 64-bit simhash
would lose low bits as a double); doubles travel natively as val_d because the
member oracles already produce engine-identical doubles (no cross-engine float
FORMATTING is ever attempted).

Both engines' reshapes are generated from the SAME static spec
(_MEMBER_COLS), so they cannot disagree about the canonicalization. Every
member also keeps its standalone query + oracle — pytest compares each member
individually (tests/test_queries_oracle.py over registry.full_queries()); the
packs are how the driver sees them. Pack membership ↔ operator mapping is
documented in COVERAGE.md.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import (
    behavior,
    curation,
    dedup,
    layout,
    expressions,
    joins,
    lifecycle,
    limits,
    multimodal,
    pq,
    relational,
    resolve,
    similarity,
    stats,
    text,
    timeline,
    windows,
)

from ..plans import llm_corpus  # noqa: E402  (plans never import packs)

_SOURCE_MODULES = [
    limits,
    relational,
    stats,
    windows,
    joins,
    expressions,
    text,
    dedup,
    similarity,
    multimodal,
    behavior,
    layout,
    curation,
    timeline,
    pq,
    resolve,
    lifecycle,
    llm_corpus,
]

_MEMBER_Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_MEMBER_O: dict[str, str] = {}
for _m in _SOURCE_MODULES:
    _MEMBER_Q.update(_m.QUERIES)
    _MEMBER_O.update(getattr(_m, "ORACLES", {}))

# pack name -> member query names (every member must have an oracle)
PACK_SPECS: dict[str, list[str]] = {
    # round-11 additions, FIRST among the packs (forward-ordering): the
    # evidence-driven media band-geometry plan (the lsh_band_plan doctrine
    # applied to the perceptual fingerprint — the r10 verdict's prescription
    # for the uncapped quadratic term), plus dedup_clusters (folded from
    # standalone to keep the driver at 50 — thematically it IS the CC
    # fixpoint media_canonical reuses)
    "pack_r11": [
        "media_band_plan",
        "dedup_clusters",
    ],
    # round-10 additions, FIRST among the packs (forward-ordering): the
    # perceptual media near-dup family (byte-bigram aHash fingerprint +
    # banded-Hamming candidate pairs — the r9 verdict's top LLM-pipeline
    # gap), the packed 5-bit PQ code layout (closing the 12.8x docstring
    # claim), plus simhash_near_pairs (folded from standalone to keep the
    # driver at 50 — thematically it IS the pigeonhole machinery the media
    # pairs reuse)
    "pack_r10": [
        "media_fingerprint",
        "media_near_pairs",
        "media_near_pairs_capped",
        "media_canonical",
        "pq_pack",
        "simhash_near_pairs",
    ],
    # round-9 additions: the
    # codebook-utilization audit behind the r9 quantizer retrain (dead-code
    # evidence — the dial the ivf_nprobe_curve finding said to turn), the
    # batch ANN pair (exact yardstick + multi-probe-LSH production path),
    # the unsupervised coarse-quantizer cell audit, and the CC-dedup
    # chaining audit; plus exact_dedup (folded from standalone to keep the
    # driver at 50 — the ivf_assign/size_deciles precedent; thematically
    # the hash-groupBy baseline the near-dup family audits against)
    "pack_r9": [
        "pq_code_balance",
        "ann_topk_batch",
        "ann_topk_batch_lsh",
        "ivf_cell_balance",
        "cluster_chain_audit",
        "exact_dedup",
    ],
    # round-8 additions: the
    # multi-band hard-negative recall audit (the measured number that
    # justifies HARDNEG_BANDS — r7 verdict item 7), plus ivf_assign (folded
    # from standalone to keep the driver at 50 — the size_deciles precedent;
    # thematically it joins the recall audit's ANN-index family)
    "pack_r8": [
        "hard_negative_recall",
        "span_removal_plan",
        "span_removal_apply",
        "ivf_recall_audit",
        "perplexity_buckets",
        "shard_rebalance_plan",
        "dedup_yield_curve",
        "mix_temperature_sweep",
        "pq_distortion",
        "ivf_nprobe_curve",
        "ivf_assign",
    ],
    # round-7 additions: the
    # evidence-derived gram-postings cap relation (derive_gram_cap's proof,
    # within-doc multiplicity counted — ADVICE r6) and the winnow→spans
    # composition (fingerprint index names the pairs, exact spans localize),
    # plus size_deciles (folded from standalone to keep the driver at 50 —
    # the order_limit/status_recode precedent)
    "pack_r7": [
        "gram_cap_recommendation",
        "winnow_spans",
        "hard_negative_mining",
        "size_deciles",
    ],
    # round-6 additions: the
    # evidence-driven df-cap derivation (the relation derive_df_cap is
    # definitionally equal to) and the k-center greedy coreset, plus
    # order_limit (folded from standalone to keep the driver registry at 50
    # — the status_recode/top_tokens precedent)
    "pack_r6": [
        "df_cap_recommendation",
        "lsh_band_plan",
        "leakage_safe_split",
        "seq_packing_plan",
        "hybrid_search",
        "shared_substring_spans",
        "winnow_candidates",
        "dsir_importance",
        "label_margin_audit",
        "corpus_release_manifest",
        "coreset_kcenter",
        "order_limit",
    ],
    # round-4 additions, FIRST among the packs (forward-ordering: each
    # round's new work precedes all older packs): the DF_CAP'd shingle pair
    # joins (scale-safe under boilerplate df skew), the df spectrum that
    # justifies the cap, first-occurrence novelty triage, plus top_tokens,
    # embedding_outliers and tokenizer_fertility (folded from standalone to
    # keep the driver registry at 50 — r6 fix restoring etag_props /
    # multipart_etag to the driver window)
    "pack_r4": [
        "ngram_jaccard_pairs_capped",
        "containment_pairs_capped",
        "df_spectrum",
        "shingle_novelty",
        "top_tokens",
        "embedding_outliers",
        "tokenizer_fertility",
    ],
    # round-3 additions, FIRST among the packs (new queries precede the
    # packs in driver insertion order — the forward-ordering discipline):
    # lifecycle cost planners, quality-weighted dedup survivor, asymmetric
    # containment pairs, ANN recall audit, temperature source mixing,
    # plus status_recode (folded from standalone to free its driver slot)
    "pack_r3": [
        "mpu_orphan_sweep",
        "lifecycle_transition_plan",
        "dedup_canonical",
        "containment_pairs",
        "ann_recall_audit",
        "temperature_mix_weights",
        "split_leakage_check",
        "bucket_skew_audit",
        "boilerplate_report",
        "status_recode",
    ],
    # single-row / few-row operational stats (D1-D3, D7-D9, J4-summary)
    # + the data-layout planners (Z-order buckets, Bloom semi-join reduction)
    "pack_ops_stats": [
        "size_histogram",
        "inventory_stats",
        "progress_rollup",
        "sync_eta",
        "status_counters",
        "variance_counts",
        "diff_summary",
        "zorder_layout",
        "bloom_semi_prune",
        "data_profile",
        "table_checksum",
        "schema_drift",
        "quantile_sketch",
        "diff_apply_check",
        "hot_prefix_report",
        "retention_sweep",
        "restore_plan",
        "layout_advisor",
        "listing_anomalies",
    ],
    # time extrema + HWM incremental buckets (A8, D5, D6, F1) + the
    # event-behavior family (ordered funnel, retention triangle, JSON props)
    "pack_time_extrema": [
        "min_max_timestamps",
        "earliest_event",
        "hwm_incremental",
        "funnel_steps",
        "retention_cohorts",
        "props_extract",
        "rolling_anomaly",
        "ewma_smooth",
        "snapshot_history",
        "retry_worklist",
        "event_type_affinity",
    ],
    # ANN family: brute-force + LSH buckets + LSH top-k + IVF training data
    # + JL random projection + product quantization (encode + ADC search)
    "pack_ann": [
        "ann_topk_bruteforce",
        "lsh_buckets",
        "ann_lsh_topk",
        "label_centroids",
        "embedding_project",
        "kmeans_lloyd",
        "semantic_dedup",
        "pq_encode",
        "pq_search",
        "ivf_pq_search",
    ],
    # near-dup candidate/verified pair sets (n-gram, minhash-LSH, embedding)
    # + train/eval shingle-overlap decontamination (same explode-join family)
    "pack_dedup_pairs": [
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "incremental_neardup",
        "embedding_neardup",
        "decontaminate",
        "prefix_filter_pairs",
        "cluster_sizes",
        "fuzzy_match_pairs",
        "fuzzy_match_qgram",
        "fuzzy_match_segments",
        "minhash_calibration",
        "cross_source_duplication",
    ],
    # per-doc fingerprints (minhash signatures, simhash, rolling-hash)
    # + span-level exact dedup (per-doc duplicated-span fractions)
    "pack_fingerprints": [
        "minhash_signatures",
        "simhash_fingerprint",
        "doc_fingerprint",
        "span_dedup",
    ],
    # per-doc text analysis (language-ID, quality, token counting, repetition,
    # corpus mixture weights)
    # + curation ops: entropy quality signal, CMS heavy hitters, dataset
    # split manifest, sequential-Poisson weighted sample
    "pack_text_quality": [
        "lang_id",
        "quality_score",
        "token_stats",
        "repetition_stats",
        "source_mix_weights",
        "bigram_pmi",
        "word_entropy",
        "cms_heavy_hitters",
        "dataset_split",
        "weighted_sample",
        "pii_redact",
        "inverted_index",
        "bm25_search",
        "group_sample",
        "unigram_logprob",
        "vocab_coverage",
        "bpe_merges",
        "bpe_tokenize",
        "training_order",
        "source_kl_divergence",
    ],
    # multimodal plumbing (media features, frame sampling plan)
    "pack_media": ["media_features", "frame_sample_plan", "media_dedup"],
}

PACK_MEMBERS: set[str] = {m for ms in PACK_SPECS.values() for m in ms}

# member -> [(column, kind)] — kind in {"str", "int", "num", "bool"}.
# Static on purpose: oracle_sql() must be buildable with no Spark/DuckDB
# session. Drift between this spec and a member's actual schema fails loudly
# (unresolved column on the Spark side / binder error on the DuckDB side).
_MEMBER_COLS: dict[str, list[tuple[str, str]]] = {
    "media_band_plan": [
        ("bands", "int"),
        ("band_bits", "int"),
        ("exact_bound", "int"),
        ("n_cand_pairs", "int"),
        ("max_bucket", "int"),
        ("n_true_pairs", "int"),
        ("n_caught", "int"),
        ("recall", "num"),
        ("exact_at_threshold", "bool"),
        ("recommended", "bool"),
    ],
    "dedup_clusters": [
        ("doc_id", "int"),
        ("cluster_id", "int"),
        ("is_keeper", "bool"),
    ],
    "media_fingerprint": [
        ("doc_id", "int"),
        ("media_type", "str"),
        ("b0", "int"),
        ("b1", "int"),
        ("b2", "int"),
        ("b3", "int"),
    ],
    "media_near_pairs": [
        ("media_type", "str"),
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("hamming", "int"),
    ],
    "media_near_pairs_capped": [
        ("media_type", "str"),
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("hamming", "int"),
    ],
    "media_canonical": [
        ("doc_id", "int"),
        ("media_type", "str"),
        ("cluster_id", "int"),
        ("is_keeper", "bool"),
    ],
    "pq_pack": [
        ("vec_id", "int"),
        ("n_codes", "int"),
        ("packed_hex", "str"),
        ("packed_bytes", "int"),
        ("compression_x", "num"),
    ],
    "simhash_near_pairs": [
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("hamming", "int"),
    ],
    "pq_code_balance": [
        ("sub", "int"),
        ("n_vectors", "int"),
        ("n_used", "int"),
        ("utilization", "num"),
        ("entropy_bits", "num"),
        ("max_share", "num"),
        ("mean_d2", "num"),
    ],
    "exact_dedup": [
        ("content_hash", "str"),
        ("n_copies", "int"),
        ("keeper_doc_id", "int"),
    ],
    "ann_topk_batch": [
        ("qid", "int"),
        ("vec_id", "int"),
        ("cosine", "num"),
        ("rank", "int"),
    ],
    "ann_topk_batch_lsh": [
        ("qid", "int"),
        ("vec_id", "int"),
        ("cosine", "num"),
        ("rank", "int"),
    ],
    "ivf_cell_balance": [
        ("cluster", "int"),
        ("n_vectors", "int"),
        ("share", "num"),
        ("mean_d2", "num"),
        ("max_d2", "num"),
    ],
    "cluster_chain_audit": [
        ("cluster_id", "int"),
        ("n_members", "int"),
        ("n_edges", "int"),
        ("possible_pairs", "int"),
        ("edge_density", "num"),
        ("min_jaccard", "num"),
        ("mean_jaccard", "num"),
        ("chained", "bool"),
    ],
    "hard_negative_recall": [
        ("p_id", "int"),
        ("n_exact", "int"),
        ("n_hit", "int"),
        ("recall", "num"),
    ],
    "span_removal_plan": [
        ("doc_id", "int"),
        ("rm_start", "int"),
        ("rm_end", "int"),
        ("rm_tokens", "int"),
    ],
    "span_removal_apply": [
        ("doc_id", "int"),
        ("n_tokens_before", "int"),
        ("n_tokens_removed", "int"),
        ("clean_text", "str"),
    ],
    "ivf_assign": [
        ("vec_id", "int"),
        ("label", "int"),
        ("assigned", "int"),
    ],
    "ivf_recall_audit": [
        ("k", "int"),
        ("nprobe", "int"),
        ("n_exact", "int"),
        ("n_hit", "int"),
        ("recall", "num"),
    ],
    "perplexity_buckets": [
        ("doc_id", "int"),
        ("lang", "str"),
        ("n_tokens", "int"),
        ("bits_per_token", "num"),
        ("ppl_bucket", "int"),
        ("keep", "bool"),
    ],
    "shard_rebalance_plan": [
        ("policy", "str"),
        ("old_shard", "int"),
        ("new_shard", "int"),
        ("n_objects", "int"),
        ("total_bytes", "int"),
        ("moved", "bool"),
    ],
    "dedup_yield_curve": [
        ("threshold", "num"),
        ("n_pairs", "int"),
        ("n_docs_affected", "int"),
        ("affected_frac", "num"),
    ],
    "mix_temperature_sweep": [
        ("temperature", "num"),
        ("source", "str"),
        ("total_tokens", "int"),
        ("share", "num"),
        ("boost", "num"),
        ("epochs_at_budget", "num"),
    ],
    "pq_distortion": [
        ("decile", "int"),
        ("n_vectors", "int"),
        ("mean_err", "num"),
        ("max_err", "num"),
    ],
    "ivf_nprobe_curve": [
        ("nprobe", "int"),
        ("n_exact", "int"),
        ("n_hit", "int"),
        ("recall", "num"),
    ],
    "ngram_jaccard_pairs_capped": [
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("jaccard", "num"),
    ],
    "containment_pairs_capped": [
        ("contained_doc", "int"),
        ("container_doc", "int"),
        ("containment", "num"),
    ],
    "df_spectrum": [
        ("bucket", "int"),
        ("n_shingles", "int"),
        ("n_postings", "int"),
        ("max_df", "int"),
    ],
    "shingle_novelty": [
        ("doc_id", "int"),
        ("n_shingles", "int"),
        ("n_novel", "int"),
        ("novelty", "num"),
    ],
    "top_tokens": [("token", "str"), ("freq", "int")],
    "df_cap_recommendation": [
        ("df", "int"),
        ("n_shingles", "int"),
        ("cum_pairs", "int"),
        ("budget_pairs", "int"),
        ("within_budget", "bool"),
        ("cap", "int"),
    ],
    "order_limit": [("key", "str"), ("size", "int"), ("etag", "str")],
    "coreset_kcenter": [
        ("rank", "int"),
        ("vec_id", "int"),
        ("label", "int"),
        ("radius", "num"),
    ],
    "lsh_band_plan": [
        ("bands", "int"),
        ("rows_per_band", "int"),
        ("n_cand_pairs", "int"),
        ("recall", "num"),
        ("meets_target", "bool"),
        ("recommended", "bool"),
    ],
    "leakage_safe_split": [
        ("source", "str"),
        ("split", "str"),
        ("n_docs", "int"),
        ("total_chars", "int"),
        ("n_moved", "int"),
    ],
    "corpus_release_manifest": [
        ("source", "str"),
        ("split", "str"),
        ("n_docs", "int"),
        ("n_tokens", "int"),
        ("n_dsir_selected", "int"),
    ],
    "label_margin_audit": [
        ("vec_id", "int"),
        ("label", "int"),
        ("nearest_other", "int"),
        ("d2_own", "num"),
        ("d2_other", "num"),
        ("margin", "num"),
        ("mislabeled", "bool"),
    ],
    "dsir_importance": [
        ("doc_id", "int"),
        ("source", "str"),
        ("n_tokens", "int"),
        ("avg_log_ratio", "num"),
        ("selected", "bool"),
    ],
    "shared_substring_spans": [
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("start_a", "int"),
        ("start_b", "int"),
        ("span_tokens", "int"),
    ],
    "winnow_spans": [
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("start_a", "int"),
        ("start_b", "int"),
        ("span_tokens", "int"),
    ],
    "gram_cap_recommendation": [
        ("pn", "int"),
        ("n_grams", "int"),
        ("cum_pairs", "int"),
        ("budget_pairs", "int"),
        ("within_budget", "bool"),
        ("cap", "int"),
    ],
    "size_deciles": [
        ("decile", "int"),
        ("n_objects", "int"),
        ("min_size", "int"),
        ("max_size", "int"),
    ],
    "hard_negative_mining": [
        ("vec_a", "int"),
        ("vec_b", "int"),
        ("label_a", "int"),
        ("label_b", "int"),
        ("cosine", "num"),
    ],
    "winnow_candidates": [
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("n_shared", "int"),
    ],
    "hybrid_search": [
        ("doc_id", "int"),
        ("lex_rank", "int"),
        ("vec_rank", "int"),
        ("rrf_score", "num"),
    ],
    "seq_packing_plan": [
        ("mode", "str"),
        ("max_seq_len", "int"),
        ("n_docs", "int"),
        ("n_seqs", "int"),
        ("kept_tokens", "int"),
        ("trunc_tokens", "int"),
        ("pad_tokens", "int"),
        ("utilization", "num"),
    ],
    "embedding_outliers": [
        ("vec_id", "int"),
        ("label", "int"),
        ("assigned", "int"),
        ("d2", "num"),
    ],
    "tokenizer_fertility": [
        ("source", "str"),
        ("n_docs", "int"),
        ("n_words", "int"),
        ("n_bpe_tokens", "int"),
        ("fertility", "num"),
    ],
    "mpu_orphan_sweep": [
        ("storage_class", "str"),
        ("age_bucket", "str"),
        ("n_objects", "int"),
        ("total_bytes", "int"),
        ("monthly_usd", "num"),
    ],
    "lifecycle_transition_plan": [
        ("current_class", "str"),
        ("recommended_class", "str"),
        ("n_objects", "int"),
        ("total_bytes", "int"),
        ("monthly_savings_usd", "num"),
    ],
    "dedup_canonical": [
        ("cluster_id", "int"),
        ("n_members", "int"),
        ("canonical_doc", "int"),
        ("canonical_tokens", "int"),
        ("tokens_dropped", "int"),
    ],
    "containment_pairs": [
        ("contained_doc", "int"),
        ("container_doc", "int"),
        ("containment", "num"),
    ],
    "ann_recall_audit": [("k", "int"), ("n_overlap", "int"), ("recall", "num")],
    "split_leakage_check": [
        ("split", "str"),
        ("n_docs", "int"),
        ("n_leaky", "int"),
        ("leak_rate", "num"),
    ],
    "bucket_skew_audit": [
        ("bucket", "int"),
        ("n_objects", "int"),
        ("bucket_bytes", "int"),
        ("load_ratio", "num"),
        ("hot", "bool"),
    ],
    "boilerplate_report": [
        ("doc_id", "int"),
        ("n_shingles", "int"),
        ("n_boiler", "int"),
        ("boiler_frac", "num"),
    ],
    "temperature_mix_weights": [
        ("source", "str"),
        ("n_docs", "int"),
        ("total_tokens", "int"),
        ("nat_share", "num"),
        ("temp_share", "num"),
        ("boost", "num"),
        ("epochs_at_budget", "num"),
    ],
    "status_recode": [
        ("key", "str"),
        ("is_multipart", "bool"),
        ("replicated", "int"),
        ("modified_minute", "int"),
        ("human_size", "str"),
    ],
    "ann_lsh_topk": [("vec_id", "int"), ("label", "int"), ("cosine", "num")],
    "ann_topk_bruteforce": [("vec_id", "int"), ("label", "int"), ("cosine", "num")],
    "decontaminate": [
        ("doc_id", "int"),
        ("n_shingles", "int"),
        ("n_eval_hits", "int"),
        ("contaminated", "bool"),
    ],
    "diff_apply_check": [
        ("n_src", "int"),
        ("n_dst", "int"),
        ("n_reconstructed", "int"),
        ("n_missing", "int"),
        ("n_extra", "int"),
        ("invertible", "bool"),
    ],
    "schema_drift": [
        ("col", "str"),
        ("src_rows", "int"),
        ("dst_rows", "int"),
        ("src_null", "int"),
        ("dst_null", "int"),
        ("src_distinct", "int"),
        ("dst_distinct", "int"),
        ("distinct_drift", "num"),
        ("drifted", "bool"),
    ],
    "quantile_sketch": [("q", "int"), ("bucket", "int"), ("size_upper", "int")],
    "group_sample": [
        ("source", "str"),
        ("doc_id", "int"),
        ("lang", "str"),
        ("n_chars", "int"),
        ("rank", "int"),
    ],
    "data_profile": [
        ("col", "str"),
        ("n_rows", "int"),
        ("n_null", "int"),
        ("n_distinct", "int"),
        ("min_s", "str"),
        ("max_s", "str"),
    ],
    "table_checksum": [
        ("side", "str"),
        ("n_rows", "int"),
        ("total_size", "int"),
        ("checksum", "int"),
    ],
    "diff_summary": [("variance", "str"), ("n_objects", "int"), ("bytes_to_move", "int")],
    "doc_fingerprint": [
        ("doc_id", "int"),
        ("content_hash", "str"),
        ("sampled_hash", "str"),
        ("n_tokens", "int"),
    ],
    "earliest_event": [("object_key", "str"), ("etag", "str"), ("ts", "int")],
    "embedding_project": [("vec_id", "int"), ("out_dim", "int"), ("proj_v", "num")],
    "embedding_neardup": [("id_a", "int"), ("id_b", "int"), ("cosine", "num")],
    "incremental_neardup": [
        ("new_doc", "int"),
        ("n_matches", "int"),
        ("first_match", "int"),
    ],
    "frame_sample_plan": [("doc_id", "int"), ("n_frames", "int"), ("n_sampled", "int")],
    "training_order": [
        ("doc_id", "int"),
        ("source", "str"),
        ("global_pos", "int"),
        ("shard_id", "int"),
        ("pos_in_shard", "int"),
    ],
    "bigram_pmi": [("w1", "str"), ("w2", "str"), ("c_xy", "int"), ("pmi", "num")],
    "bloom_semi_prune": [
        ("n_total", "int"),
        ("n_candidates", "int"),
        ("n_changed", "int"),
        ("n_false_positives", "int"),
        ("fp_rate", "num"),
    ],
    "funnel_steps": [("step", "str"), ("n_users", "int")],
    "fuzzy_match_pairs": [
        ("dirty_id", "int"),
        ("n_candidates", "int"),
        ("best_lev", "int"),
        ("matched_key", "int"),
        ("self_match", "bool"),
    ],
    "fuzzy_match_qgram": [
        ("dirty_id", "int"),
        ("n_candidates", "int"),
        ("best_lev", "int"),
        ("matched_key", "int"),
        ("self_match", "bool"),
    ],
    "fuzzy_match_segments": [
        ("dirty_id", "int"),
        ("n_candidates", "int"),
        ("best_lev", "int"),
        ("matched_key", "int"),
        ("self_match", "bool"),
    ],
    "ewma_smooth": [("minute", "int"), ("n", "int"), ("ewma", "num")],
    "cluster_sizes": [
        ("cluster_size", "int"),
        ("n_clusters", "int"),
        ("n_docs", "int"),
        ("n_removed", "int"),
    ],
    "media_dedup": [
        ("media_type", "str"),
        ("n_assets", "int"),
        ("n_unique", "int"),
        ("n_dup_groups", "int"),
        ("bytes_total", "int"),
        ("bytes_dedupable", "int"),
    ],
    "listing_anomalies": [
        ("side", "str"),
        ("n_keys", "int"),
        ("n_rows", "int"),
        ("dup_keys", "int"),
        ("extra_rows", "int"),
    ],
    "layout_advisor": [
        ("n_objects", "int"),
        ("total_bytes", "int"),
        ("n_files_512mb", "int"),
        ("shuffle_partitions_128mb", "int"),
        ("bucket_count", "int"),
    ],
    "zorder_layout": [
        ("zbucket", "int"),
        ("n_objects", "int"),
        ("min_size", "int"),
        ("max_size", "int"),
        ("min_day", "int"),
        ("max_day", "int"),
    ],
    "retention_cohorts": [("cohort_day", "int"), ("day_offset", "int"), ("n_active", "int")],
    "props_extract": [
        ("event_type", "str"),
        ("n_events", "int"),
        ("n_null", "int"),
        ("min_k", "int"),
        ("max_k", "int"),
        ("sum_k", "int"),
    ],
    "hwm_incremental": [
        ("time_unit", "int"),
        ("start_time", "int"),
        ("success_object_size", "int"),
        ("success_object_num", "int"),
        ("failed_object_size", "int"),
        ("failed_object_num", "int"),
    ],
    "inventory_stats": [
        ("storage_class", "str"),
        ("object_count", "int"),
        ("total_size", "int"),
        ("multipart_count", "int"),
    ],
    "kmeans_lloyd": [("vec_id", "int"), ("cluster", "int"), ("d2", "num")],
    "pq_encode": [
        ("vec_id", "int"),
        ("sub", "int"),
        ("code", "int"),
        ("d2", "num"),
    ],
    "pq_search": [("vec_id", "int"), ("adc_d2", "num"), ("rank", "int")],
    "ivf_pq_search": [
        ("vec_id", "int"),
        ("cell", "int"),
        ("adc_d2", "num"),
        ("rank", "int"),
    ],
    "semantic_dedup": [
        ("vec_id", "int"),
        ("cluster", "int"),
        ("n_close_lower", "int"),
        ("keep", "bool"),
    ],
    "label_centroids": [("label", "int"), ("dim", "int"), ("centroid_v", "num")],
    "lang_id": [
        ("doc_id", "int"),
        ("lang", "str"),
        ("score_en", "int"),
        ("score_de", "int"),
        ("score_es", "int"),
        ("score_fr", "int"),
        ("score_zh", "int"),
        ("pred_lang", "str"),
    ],
    "lsh_buckets": [("bucket", "int"), ("n_vectors", "int")],
    "media_features": [
        ("doc_id", "int"),
        ("media_type", "str"),
        ("byte_len", "int"),
        ("content_md5", "str"),
        ("feat_width", "int"),
        ("feat_height", "int"),
        ("n_frames", "int"),
    ],
    "min_max_timestamps": [("replication_status", "int"), ("min_ts", "int"), ("max_ts", "int")],
    "cross_source_duplication": [
        ("src_x", "str"),
        ("src_y", "str"),
        ("n_pairs", "int"),
        ("mean_jaccard", "num"),
        ("within_source", "bool"),
    ],
    "minhash_calibration": [
        ("doc_a", "int"),
        ("doc_b", "int"),
        ("n_sig_match", "int"),
        ("est_jaccard", "num"),
        ("exact_jaccard", "num"),
        ("abs_err", "num"),
    ],
    "minhash_lsh_pairs": [("doc_a", "int"), ("doc_b", "int")],
    "minhash_signatures": [("doc_id", "int")]
    + [(f"mh{i}", "str") for i in range(12)],
    "ngram_jaccard_pairs": [("doc_a", "int"), ("doc_b", "int"), ("jaccard", "num")],
    "progress_rollup": [
        ("success_size", "int"),
        ("success_num", "int"),
        ("failed_size", "int"),
        ("failed_num", "int"),
        ("elapsed_minutes", "num"),
        ("bytes_per_minute", "num"),
    ],
    "quality_score": [
        ("doc_id", "int"),
        ("n_chars", "int"),
        ("n_tokens", "int"),
        ("punct_ratio", "num"),
        ("stopword_ratio", "num"),
        ("mean_word_len", "num"),
        ("keep", "bool"),
    ],
    "repetition_stats": [
        ("doc_id", "int"),
        ("n_tokens", "int"),
        ("n_distinct_tokens", "int"),
        ("dup_token_ratio", "num"),
        ("top_bigram_n", "int"),
        ("n_bigrams", "int"),
        ("top_bigram_frac", "num"),
        ("keep", "bool"),
    ],
    "simhash_fingerprint": [("doc_id", "int"), ("simhash", "int"), ("keeper_doc_id", "int")],
    "source_kl_divergence": [
        ("source", "str"),
        ("n_tokens", "int"),
        ("n_types", "int"),
        ("kl_bits", "num"),
        ("drifted", "bool"),
    ],
    "source_mix_weights": [
        ("source", "str"),
        ("n_docs", "int"),
        ("total_tokens", "int"),
        ("token_share", "num"),
        ("mix_weight", "num"),
    ],
    "size_histogram": [
        ("total_objects", "int"),
        ("total_size_bytes", "int"),
        ("sub_1mb", "int"),
        ("sub_5mb", "int"),
        ("sub_10mb", "int"),
        ("sub_50mb", "int"),
        ("sub_100mb", "int"),
        ("sub_1gb", "int"),
        ("sub_5gb", "int"),
    ],
    "status_counters": [("replication_status", "int"), ("n_rows", "int"), ("total_size", "int")],
    "sync_eta": [
        ("total_bytes", "int"),
        ("done_bytes", "int"),
        ("elapsed_minutes", "num"),
        ("bytes_per_minute", "num"),
        ("eta_minutes", "num"),
    ],
    "token_stats": [
        ("doc_id", "int"),
        ("n_chars", "int"),
        ("ws_tokens", "int"),
        ("bpe_tokens", "int"),
        ("tokens_per_char", "num"),
    ],
    "variance_counts": [("variance_class", "str"), ("n_rows", "int"), ("total_bytes", "int")],
    "bpe_tokenize": [
        ("doc_id", "int"),
        ("n_chars_clean", "int"),
        ("n_symbols", "int"),
        ("chars_per_symbol", "num"),
    ],
    "bpe_merges": [
        ("round", "int"),
        ("lhs", "str"),
        ("rhs", "str"),
        ("merged", "str"),
        ("freq", "int"),
    ],
    "vocab_coverage": [
        ("doc_id", "int"),
        ("n_tokens", "int"),
        ("n_oov", "int"),
        ("oov_rate", "num"),
    ],
    "event_type_affinity": [
        ("et_a", "str"),
        ("et_b", "str"),
        ("n_pair", "int"),
        ("n_a", "int"),
        ("n_b", "int"),
        ("lift", "num"),
    ],
    "unigram_logprob": [
        ("doc_id", "int"),
        ("n_tokens", "int"),
        ("mean_logprob", "num"),
        ("bits_per_token", "num"),
        ("keep", "bool"),
    ],
    "word_entropy": [
        ("doc_id", "int"),
        ("n_tokens", "int"),
        ("n_unique", "int"),
        ("entropy", "num"),
        ("ttr", "num"),
    ],
    "cms_heavy_hitters": [
        ("token", "str"),
        ("exact_n", "int"),
        ("cms_est", "int"),
        ("overcount", "int"),
    ],
    "dataset_split": [
        ("source", "str"),
        ("split", "str"),
        ("n_docs", "int"),
        ("total_chars", "int"),
    ],
    "weighted_sample": [
        ("rank", "int"),
        ("doc_id", "int"),
        ("source", "str"),
        ("n_chars", "int"),
        ("priority", "num"),
    ],
    "prefix_filter_pairs": [("doc_a", "int"), ("doc_b", "int"), ("jaccard", "num")],
    "inverted_index": [
        ("token", "str"),
        ("df", "int"),
        ("tf_total", "int"),
        ("top_doc_id", "int"),
        ("top_doc_tf", "int"),
    ],
    "bm25_search": [
        ("doc_id", "int"),
        ("bm25", "num"),
        ("n_query_terms", "int"),
    ],
    "pii_redact": [
        ("doc_id", "int"),
        ("n_emails", "int"),
        ("n_ips", "int"),
        ("redacted_len", "int"),
        ("redacted_md5", "str"),
    ],
    "span_dedup": [
        ("doc_id", "int"),
        ("n_spans", "int"),
        ("n_dup_spans", "int"),
        ("dup_frac", "num"),
        ("keep", "bool"),
    ],
    "rolling_anomaly": [
        ("minute", "int"),
        ("n", "int"),
        ("z", "num"),
        ("is_spike", "bool"),
    ],
    "snapshot_history": [
        ("key", "str"),
        ("etag", "str"),
        ("v_from", "int"),
        ("v_to", "int"),
        ("change", "str"),
    ],
    "retry_worklist": [
        ("object_key", "str"),
        ("n_attempts", "int"),
        ("n_failures", "int"),
        ("last_ts", "int"),
        ("backoff_bucket", "int"),
        ("next_attempt_ts", "int"),
    ],
    "hot_prefix_report": [
        ("prefix", "str"),
        ("n_objects", "int"),
        ("bytes", "int"),
        ("share", "num"),
        ("skew_ratio", "num"),
        ("hot", "bool"),
    ],
    "retention_sweep": [
        ("expire_after_v", "int"),
        ("n_versions", "int"),
        ("bytes_reclaimable", "int"),
    ],
    "restore_plan": [
        ("tier", "str"),
        ("n_objects", "int"),
        ("bytes", "int"),
        ("retrieval_fee_micro_usd", "int"),
        ("request_fee_micro_usd", "int"),
        ("total_fee_micro_usd", "int"),
    ],
}


def _reshape_spark(df: DataFrame, part: str) -> DataFrame:
    """Unpivot one member result into (part, col, val_s, val_d) — a single
    explode pass, so the member plan executes once regardless of width."""
    entries = []
    for col, kind in _MEMBER_COLS[part]:
        if kind == "num":
            vs = F.lit(None).cast("string")
            vd = F.col(col).cast("double")
        elif kind == "bool":
            vs = F.col(col).cast("int").cast("string")
            vd = F.lit(None).cast("double")
        else:  # str / int — exact string rendering
            vs = F.col(col).cast("string")
            vd = F.lit(None).cast("double")
        entries.append(
            F.struct(F.lit(col).alias("col"), vs.alias("val_s"), vd.alias("val_d"))
        )
    return df.select(F.explode(F.array(*entries)).alias("kv")).select(
        F.lit(part).alias("part"),
        F.col("kv.col").alias("col"),
        F.col("kv.val_s").alias("val_s"),
        F.col("kv.val_d").alias("val_d"),
    )


def _make_pack_query(members: list[str]) -> Callable[[SparkSession, str], DataFrame]:
    def pack_query(spark: SparkSession, sf_dir: str) -> DataFrame:
        parts = [_reshape_spark(_MEMBER_Q[m](spark, sf_dir), m) for m in members]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return pack_query


def _reshape_sql_cols(member: str, cte: str) -> list[str]:
    out = []
    for col, kind in _MEMBER_COLS[member]:
        if kind == "num":
            vs, vd = "CAST(NULL AS VARCHAR)", f'CAST("{col}" AS DOUBLE)'
        elif kind == "bool":
            vs, vd = f'CAST(CAST("{col}" AS INT) AS VARCHAR)', "CAST(NULL AS DOUBLE)"
        else:
            vs, vd = f'CAST("{col}" AS VARCHAR)', "CAST(NULL AS DOUBLE)"
        out.append(
            f"SELECT '{member}' AS part, '{col}' AS col, {vs} AS val_s, {vd} AS val_d"
            f" FROM {cte}"
        )
    return out


def _make_pack_oracle(members: list[str]) -> str:
    # AS MATERIALIZED is load-bearing: the unpivot references each member
    # CTE once PER COLUMN, and DuckDB inlines plain CTEs — a 6-column
    # member would re-execute its full SQL six times (measured: pack_r8's
    # oracle dropped 81s → 9s at sf0.01 when materialized).
    ctes = ",\n".join(
        f"m_{i} AS MATERIALIZED (\n{_MEMBER_O[m]}\n)" for i, m in enumerate(members)
    )
    selects = []
    for i, m in enumerate(members):
        selects.extend(_reshape_sql_cols(m, f"m_{i}"))
    return "WITH " + ctes + "\n" + "\nUNION ALL\n".join(selects)


QUERIES = {name: _make_pack_query(ms) for name, ms in PACK_SPECS.items()}
ORACLES = {name: _make_pack_oracle(ms) for name, ms in PACK_SPECS.items()}
