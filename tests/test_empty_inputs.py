"""Graceful behavior on empty inputs: every operator family must return an
empty (or identity) result, not crash, when the source tables have 0 rows —
the restart/bootstrap condition of a real pipeline."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from s3bigdatasync_spark import registry
from s3bigdatasync_spark.views import BASE_TABLES


@pytest.fixture(scope="module", autouse=True)
def _restore_views_after(spark):
    """These tests re-register the session temp views over empty tables;
    restore the suite's sf0.01 views afterwards so later modules that read
    spark.table(...) directly aren't poisoned."""
    from s3bigdatasync_spark.operators import _PREPARED
    from s3bigdatasync_spark.views import register_all

    from .conftest import SF_DIR

    yield
    _PREPARED.clear()
    register_all(spark, SF_DIR)


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """An sf dir whose parquet tables have the right schemas but zero rows."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


# one representative per family; pair ops + iterative ops + pandas ops included
EMPTY_SAFE = [
    "size_histogram",
    "inventory_diff",
    "time_rollup",
    "dedup_anti_join",
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "embedding_neardup",
    "lsh_buckets",
    "sessionize",
    "media_features",
    "compaction_plan",
    "sync_eta",
    "transfer_cost_estimate",
    "doc_chunks",
    "stratified_sample",
    "token_shards",
    # round-2 batch B
    "pii_redact",
    "span_dedup",
    "inverted_index",
    "bm25_search",
    "kmeans_lloyd",
    "semantic_dedup",
    "table_checksum",
    "ewma_smooth",
    "cluster_sizes",
    "media_dedup",
    "group_sample",
    "quantile_sketch",
    # timeline family
    "snapshot_history",
    "retry_worklist",
    "hot_prefix_report",
    "retention_sweep",
    "restore_plan",
    # round-2 batch C
    "pq_encode",
    "pq_search",
    "ivf_pq_search",
    "unigram_logprob",
    "vocab_coverage",
    "event_type_affinity",
    # round-3 batch
    "mpu_orphan_sweep",
    "lifecycle_transition_plan",
    "bucket_skew_audit",
    "dedup_canonical",
    "containment_pairs",
    "ann_recall_audit",
    "temperature_mix_weights",
    "split_leakage_check",
    "boilerplate_report",
    # round-6 batch
    "df_cap_recommendation",
    "coreset_kcenter",
    "lsh_band_plan",
    "leakage_safe_split",
    "seq_packing_plan",
    "hybrid_search",
    "shared_substring_spans",
    "winnow_candidates",
    "winnow_spans",
    "gram_cap_recommendation",
    "hard_negative_mining",
    "dsir_importance",
    "label_margin_audit",
    "corpus_release_manifest",
    # round-8 batch
    "hard_negative_recall",
    "span_removal_plan",
    "span_removal_apply",
    # round-9 batch
    "pq_code_balance",
    "ann_topk_batch",
    "ann_topk_batch_lsh",
    "ivf_cell_balance",
    "cluster_chain_audit",
]

# config-enumeration relations emit one identity row per config even over an
# empty corpus (lsh_band_plan: all six bandings with 0 candidates / 0 recall,
# still exactly one `recommended`)
EMPTY_COUNTS = {"lsh_band_plan": (6,)}


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_empty_input_does_not_crash(spark, empty_sf_dir, name):
    from s3bigdatasync_spark.operators import _PREPARED

    _PREPARED.clear()  # force re-registration on the empty dir
    df = registry.full_queries()[name](spark, empty_sf_dir)
    # single-row aggs may emit one null-ish row; table_checksum reports one
    # fixed row per snapshot side even when both sides are empty
    assert df.count() in EMPTY_COUNTS.get(name, (0, 1, 2))
    _PREPARED.clear()
