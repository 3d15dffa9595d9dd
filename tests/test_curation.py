"""Semantic tests for the corpus-curation operators (beyond oracle parity,
which tests/test_queries_oracle.py covers for every member)."""

from __future__ import annotations

import math

from s3bigdatasync_spark.operators import curation, dedup

from .conftest import SF_DIR


def test_prefix_filter_equals_exhaustive_join(spark):
    """The PPJoin prefix-filtered plan must produce EXACTLY the relation of
    the exhaustive shared-shingle join — same pairs, same jaccard."""
    fast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in curation.prefix_filter_pairs(spark, SF_DIR).collect()
    }
    slow = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, SF_DIR).collect()
    }
    assert fast == slow
    assert len(fast) > 0


def test_cms_never_underestimates(spark):
    rows = curation.cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == curation.CMS_TOPK
    for r in rows:
        assert r.cms_est >= r.exact_n, r
        assert r.overcount == r.cms_est - r.exact_n


def test_dataset_split_partitions_everything(spark):
    rows = curation.dataset_split(spark, SF_DIR).collect()
    docs = spark.table("documents")
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert sum(r.n_docs for r in rows) == docs.count()
    train = sum(r.n_docs for r in rows if r.split == "train")
    # seeded 90% bucket share; generous tolerance for a 500-doc sample
    assert 0.80 <= train / sum(r.n_docs for r in rows) <= 0.97


def test_word_entropy_bounds(spark):
    for r in curation.word_entropy(spark, SF_DIR).collect():
        assert r.n_unique <= r.n_tokens
        assert 0.0 < r.ttr <= 1.0
        # H is bounded by log2 of the support size
        assert -1e-6 <= r.entropy <= math.log2(r.n_unique) + 1e-6


def test_weighted_sample_deterministic_topk(spark):
    a = curation.weighted_sample(spark, SF_DIR).collect()
    b = curation.weighted_sample(spark, SF_DIR).collect()
    assert sorted(r.rank for r in a) == list(range(1, curation.WS_K + 1))
    assert [r.doc_id for r in sorted(a, key=lambda r: r.rank)] == [
        r.doc_id for r in sorted(b, key=lambda r: r.rank)
    ]


def test_rolling_anomaly_warmup_is_null(spark):
    rows = curation.rolling_anomaly(spark, SF_DIR).collect()
    by_day: dict[int, list] = {}
    for r in rows:
        by_day.setdefault(r.minute // 1440, []).append(r)
    for day_rows in by_day.values():
        day_rows.sort(key=lambda r: r.minute)
        # the first _FRAME minutes of each day have no full baseline window
        for r in day_rows[: curation._FRAME]:
            assert r.z is None and r.is_spike is None
    assert any(r.z is not None for r in rows)
