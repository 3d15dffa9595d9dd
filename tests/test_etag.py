"""Pin the multipart-ETag algorithm (H2) against hashlib for all part
geometries — incl. the single-part case the reference gets wrong
(AzureEtagCheck/etag_app.py:111 uses an undefined loop variable)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from s3bigdatasync_spark.functions.etag import (
    make_multipart_etag_udf,
    multipart_etag_bytes,
    parts_props,
)


def ref_etag(payload: bytes, part_size: int) -> str:
    if len(payload) <= part_size:
        return hashlib.md5(payload).hexdigest()
    digests = [
        hashlib.md5(payload[i : i + part_size]).digest()
        for i in range(0, len(payload), part_size)
    ]
    return hashlib.md5(b"".join(digests)).hexdigest() + f"-{len(digests)}"


def test_single_part():
    p = b"x" * 100
    assert multipart_etag_bytes(p, 256) == hashlib.md5(p).hexdigest()
    assert "-" not in multipart_etag_bytes(p, 256)


def test_exact_multiple():
    p = b"ab" * 256  # 512 bytes = exactly 2 parts of 256
    assert multipart_etag_bytes(p, 256) == ref_etag(p, 256)
    assert multipart_etag_bytes(p, 256).endswith("-2")


def test_remainder():
    p = b"z" * 600  # 3 parts: 256+256+88
    assert multipart_etag_bytes(p, 256) == ref_etag(p, 256)
    assert multipart_etag_bytes(p, 256).endswith("-3")


def test_boundary_exact_one_part():
    p = b"q" * 256  # exactly one part — single-part etag, no suffix
    assert multipart_etag_bytes(p, 256) == hashlib.md5(p).hexdigest()


def test_parts_props():
    assert parts_props(100, 256) == (1, 100)
    assert parts_props(512, 256) == (2, 256)
    assert parts_props(600, 256) == (3, 88)
    assert parts_props(0, 256) == (1, 0)


def test_udf_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, ("payload-%d-" % i) * (i * 37 % 97 + 1)) for i in range(50)],
        ["id", "text"],
    )
    udf = make_multipart_etag_udf()
    rows = df.select(
        "id", "text", udf(F.encode("text", "UTF-8"), F.lit(64)).alias("etag")
    ).collect()
    for r in rows:
        assert r["etag"] == ref_etag(r["text"].encode(), 64), r["id"]
