"""Property-based tests (hypothesis) for the pure kernels — SURVEY §5's
strategy: expression edge cases beyond what the fixture data happens to hit."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from s3bigdatasync_spark.functions.etag import multipart_etag_bytes, parts_props
from s3bigdatasync_spark.operators.multimodal import decode_stub
from s3bigdatasync_spark.sources.metadata import deterministic_fake_fetcher


@given(st.binary(min_size=0, max_size=5000), st.integers(min_value=1, max_value=1024))
@settings(max_examples=200, deadline=None)
def test_etag_matches_reference_algorithm(payload, part_size):
    got = multipart_etag_bytes(payload, part_size)
    if len(payload) <= part_size:
        assert got == hashlib.md5(payload).hexdigest()
    else:
        n = math.ceil(len(payload) / part_size)
        digests = b"".join(
            hashlib.md5(payload[i : i + part_size]).digest()
            for i in range(0, len(payload), part_size)
        )
        assert got == hashlib.md5(digests).hexdigest() + f"-{n}"


@given(st.integers(min_value=1, max_value=10**13), st.integers(min_value=1, max_value=10**9))
@settings(max_examples=200, deadline=None)
def test_parts_props_invariants(total, part):
    parts, last = parts_props(total, part)
    assert 1 <= last <= part
    assert (parts - 1) * part + last == total
    assert parts == math.ceil(total / part)


@given(st.binary(min_size=0, max_size=200), st.sampled_from(["image", "audio", "video"]))
@settings(max_examples=100, deadline=None)
def test_decode_stub_deterministic_and_bounded(payload, mtype):
    w, h, n = decode_stub(payload, mtype)
    assert (w, h, n) == decode_stub(payload, mtype)
    assert 64 <= w < 256 and 64 <= h < 256
    assert n == 1 if mtype == "image" else 1 <= n <= 32


@given(st.text(min_size=1, max_size=50), st.text(min_size=1, max_size=80))
@settings(max_examples=100, deadline=None)
def test_fake_fetcher_deterministic(bucket, key):
    try:
        a = deterministic_fake_fetcher(bucket, key)
    except IOError:
        return  # simulated failure branch is allowed
    b = deterministic_fake_fetcher(bucket, key)
    assert a == b
    assert 0 <= a["size"] < 10_000_000_000
    assert 1 <= a["parts_count"] <= 16


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL estimate stays within 5% of exact on every group (rsd=0.02)."""
    from s3bigdatasync_spark.operators.analytics import (
        approx_distinct_users,
        approx_distinct_users_native,
    )

    for r in approx_distinct_users_native(spark, sf_dir).collect():
        assert abs(r["approx_users"] - r["exact_users"]) <= max(0.05 * r["exact_users"], 2), r
    # the portable deterministic HLL must hit the same accuracy class
    for r in approx_distinct_users(spark, sf_dir).collect():
        assert abs(r["hll_users"] - r["exact_users"]) <= max(0.05 * r["exact_users"], 2), r
