"""Perceptual media near-dup: fingerprint quality + pigeonhole exactness.

The round-9 verdict's top residual: media_dedup was exact content-hash only.
media_fingerprint/media_near_pairs add the perceptual leg; these tests pin

  * the TESTDATA invariant the DuckDB oracle leans on (payloads are the
    utf-8 bytes of pure-ASCII text, so unicode(substr()) IS the byte),
  * banded candidates == brute-force Hamming at the threshold (pigeonhole
    is EXACT for hamming <= 3 with 4 bands — recall 1.0 by construction,
    measured not assumed),
  * the fingerprint actually recalls ground-truth near-duplicate documents
    (3-gram Jaccard >= 0.5 pairs land at hamming <= PHASH_HAMMING_MAX).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from s3bigdatasync_spark.operators import multimodal
from s3bigdatasync_spark.operators.multimodal import (
    PHASH_BANDS,
    PHASH_HAMMING_MAX,
    media_fingerprint,
    media_near_pairs,
)

from tests.conftest import SF_SMALL


def test_payloads_are_ascii_bytes(spark):
    """The oracle invariant: every document's text is pure ASCII, so the
    payload byte at position i equals unicode(substr(text, i+1, 1)). If
    testdata ever grows non-ASCII text, the oracle must switch to a blob
    byte accessor — fail here, loudly, instead of hash-mismatching."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    bad = docs.filter(
        F.octet_length(F.encode("text", "UTF-8")) != F.length("text")
    ).count()
    assert bad == 0


def test_banded_pairs_equal_brute_force(spark):
    """Pigeonhole exactness: with PHASH_BANDS=4 bands, any pair at hamming
    <= 3 agrees on >= 1 band, so the banded candidate set must EQUAL the
    all-pairs scan at the threshold — recall 1.0, not approximately."""
    assert PHASH_HAMMING_MAX < PHASH_BANDS  # the pigeonhole precondition
    # brute force over the same population pairs draw from: degenerate
    # (0,0,0,0) fingerprints are excluded from pair generation by contract
    # (multimodal._band_rows — none exist in this corpus, asserted below so
    # a testdata change that introduces them fails loudly here, not as an
    # exactness mystery)
    fp = media_fingerprint(spark, SF_SMALL).cache()
    n_degenerate = fp.filter(
        (F.col("b0") == 0)
        & (F.col("b1") == 0)
        & (F.col("b2") == 0)
        & (F.col("b3") == 0)
    ).count()
    assert n_degenerate == 0
    a, b = fp.alias("a"), fp.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.b{k}").cast("long").bitwiseXOR(F.col(f"b.b{k}").cast("long"))
        )
        for k in range(PHASH_BANDS)
    )
    brute = (
        a.crossJoin(b)
        .filter(
            (F.col("a.media_type") == F.col("b.media_type"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )
    brute_set = {tuple(r) for r in brute.collect()}
    banded_set = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in media_near_pairs(spark, SF_SMALL).collect()
    }
    fp.unpersist()
    assert banded_set == brute_set
    assert banded_set  # non-degenerate: testdata has planted near-dups


def test_fingerprint_recalls_ground_truth_neardups(spark):
    """The fingerprint is only useful if perceptually-near payloads land
    within the threshold: >= 85% of ground-truth near-dup document pairs
    (3-gram Jaccard >= 0.5 — the corpus's planted near-duplicates, which
    the media table carries as near-identical payload bytes) must be at
    hamming <= PHASH_HAMMING_MAX. Measured 26/28 at sf0.001."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    gt = con.execute(
        r"""
        WITH toks AS (
          SELECT doc_id,
                 string_split(lower(regexp_replace(trim(text),'\s+',' ','g')), ' ') t
          FROM documents
        ), shingles AS (
          SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
          FROM toks, unnest(generate_series(1, len(t)-2)) u(i)
        ), pairs AS (
          SELECT a.doc_id da, b.doc_id db, count(*) inter
          FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ), sizes AS (SELECT doc_id, count(*) n FROM shingles GROUP BY doc_id)
        SELECT da, db FROM pairs
        JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
        """
    ).fetchall()
    assert len(gt) >= 10  # the corpus plants near-dups; guard the test's teeth
    fp = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in media_fingerprint(spark, SF_SMALL).collect()
    }
    within = sum(
        1
        for da, db in gt
        if sum(bin(x ^ y).count("1") for x, y in zip(fp[da], fp[db]))
        <= PHASH_HAMMING_MAX
    )
    assert within / len(gt) >= 0.85, f"{within}/{len(gt)}"


def test_fingerprint_shift_invariance():
    """The reason for a histogram hash over a positional aHash: a prefix
    insertion shifts every byte but barely moves the bigram histogram. A
    payload with one word prepended must stay within the near-dup
    threshold of the original."""
    import numpy as np

    def phash(payload: bytes):
        b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
        cls = (b[:-1] * 31 + b[1:]) % 64
        cnt = np.bincount(cls, minlength=64)
        bits = (cnt * 64 > (len(b) - 1)).astype(np.int64)
        shift = 1 << np.arange(16, dtype=np.int64)
        return [int((bits[16 * k : 16 * k + 16] * shift).sum()) for k in range(4)]

    base = ("the quick brown fox jumps over the lazy dog " * 12).encode()
    shifted = b"prefix " + base
    ham = sum(
        bin(x ^ y).count("1") for x, y in zip(phash(base), phash(shifted))
    )
    assert ham <= PHASH_HAMMING_MAX, ham


def test_degenerate_fingerprints_excluded_from_pairs(spark):
    """Round-10 ADVICE: payloads under 2 bytes (and low-diversity payloads
    where no bigram class beats the uniform mean) all fingerprint to
    (0,0,0,0) — a hamming-0 clique per media_type that would go O(n²) in
    the uncapped join and cluster DISTINCT tiny assets as duplicates in
    media_canonical. _band_rows must drop them from pair generation while
    genuine near-dups still pair."""
    rows = [
        # three degenerate empties — must produce zero pairs among themselves
        (1, "image", 0, 0, 0, 0),
        (4, "image", 0, 0, 0, 0),
        (7, "image", 0, 0, 0, 0),
        # one genuine near-dup pair (hamming 1 on b0)
        (10, "image", 5, 9, 3, 7),
        (13, "image", 4, 9, 3, 7),
    ]
    fp = spark.createDataFrame(
        rows, "doc_id long, media_type string, b0 int, b1 int, b2 int, b3 int"
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in multimodal._pairs_from_bands(multimodal._band_rows(fp)).collect()
    }
    assert pairs == {(10, 13)}


def test_near_pairs_oracle_members_registered():
    """Both new members carry oracles and travel in pack_r10."""
    from s3bigdatasync_spark.operators import packs

    for name in ("media_fingerprint", "media_near_pairs"):
        assert name in multimodal.ORACLES
        assert name in packs.PACK_SPECS["pack_r10"]
