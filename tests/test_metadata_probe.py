"""A12/A13 metadata-probe connector: thread-pooled mapInPandas fan-out with
error routing, on the deterministic fake fetcher."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3bigdatasync_spark.sources.metadata import (
    deterministic_fake_fetcher,
    make_s3_head_fetcher,
    probe_metadata,
)


def test_probe_plumbing(spark):
    worklist = spark.table("inventory_src").select("bucket", "key").limit(1000)
    out = probe_metadata(worklist, max_threads=8).cache()
    assert out.count() == 1000  # failures survive as rows
    ok = out.filter(F.col("error").isNull())
    # deterministic fake: verify one row against a driver-side call
    sample = ok.limit(5).collect()
    for r in sample:
        m = deterministic_fake_fetcher(r["bucket"], r["key"])
        assert (r["mtime"], r["size"], r["etag"], r["parts_count"]) == (
            m["mtime"],
            m["size"],
            m["etag"],
            m["parts_count"],
        )
    # simulated failures are routed, not raised
    failed = out.filter(F.col("error").isNotNull())
    for r in failed.limit(3).collect():
        assert "simulated 404" in r["error"]
    out.unpersist()


def test_s3_fetcher_import_gate():
    """Factory returns a callable when boto3 exists, or raises
    NotImplementedError when it doesn't — never an ImportError leak."""
    try:
        import boto3  # noqa: F401

        assert callable(make_s3_head_fetcher())
    except ImportError:
        with pytest.raises(NotImplementedError):
            make_s3_head_fetcher()
