"""Source connectors: csv.gz inventory scan, manifest-driven read, corrupt-row
policy, recursive glob, Azure projection (SURVEY §2 A1-A6)."""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import pytest

from s3bigdatasync_spark.sources.inventory import (
    discover_files,
    read_azure_inventory,
    read_inventory_csv,
    read_manifest,
    read_manifest_files,
)

ROWS = [
    '"b1","dir/key with space","1048576","2024-01-05T10:00:00.000Z","abc123","STANDARD","false",""',
    '"b1","dir/键-中文","5368709120","2024-01-06T11:30:00.000Z","def456-3","GLACIER","true","COMPLETED"',
    '"b1","k3","0","2024-01-07T00:00:00.000Z","eee","STANDARD_IA","false","COMPLETED"',
]
BAD_ROW = '"b1","broken-only-two-fields"'


@pytest.fixture(scope="module")
def inv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("inv")
    (d / "part1.csv.gz").write_bytes(gzip.compress("\n".join(ROWS[:2]).encode()))
    (d / "sub").mkdir()
    (d / "sub" / "part2.csv").write_text(ROWS[2] + "\n" + BAD_ROW)
    manifest = {
        "sourceBucket": "b1",
        "destinationBucket": "b2",
        "version": "2024-01-01",
        "fileFormat": "CSV",
        "fileSchema": "Bucket, Key, Size, LastModifiedDate, ETag, StorageClass, IsMultipartUploaded, ReplicationStatus",
        "files": [
            {"key": str(d / "part1.csv.gz"), "size": 1, "MD5checksum": ""},
            {"key": str(d / "sub" / "part2.csv"), "size": 1, "MD5checksum": ""},
        ],
    }
    (d / "manifest.json").write_text(json.dumps(manifest))
    return d


def test_gzip_csv_scan(spark, inv_dir):
    df = read_inventory_csv(spark, str(inv_dir / "part1.csv.gz"))
    rows = {r["key"]: r for r in df.collect()}
    assert len(rows) == 2
    assert rows["dir/key with space"]["size"] == 1048576
    assert rows["dir/键-中文"]["is_multipart_uploaded"] == "true"  # stringly at the edge
    assert rows["dir/key with space"]["replication_status"] == ""


def test_corrupt_row_policy(spark, inv_dir):
    df = read_inventory_csv(spark, str(inv_dir / "sub" / "part2.csv"))
    assert df.count() == 1  # bad row dropped, ≙ len(sections)<7 guard


def test_manifest_driven_read(spark, inv_dir):
    manifest = read_manifest(spark, str(inv_dir / "manifest.json"))
    assert manifest["destinationBucket"] == "b2"
    df = read_manifest_files(spark, manifest)
    assert df.count() == 3  # 2 from gz + 1 good row from part2


def test_recursive_glob(spark, inv_dir):
    df = discover_files(spark, str(inv_dir), pattern="*.csv")
    # only sub/part2.csv matches the glob; its bad row is dropped by the
    # corrupt-record policy
    assert df.count() == 1
    assert df.collect()[0]["key"] == "k3"


def test_azure_projection(spark, tmp_path):
    p = tmp_path / "azure.csv"
    p.write_text(
        "Name,Creation-Time,Last-Modified,Etag,Content-Length,Content-MD5,BlobType,AccessTier,ArchiveStatus\n"
        "blob1,2024-01-01T00:00:00Z,2024-01-02T00:00:00Z,e1,123,m1,Block,Hot,\n"
    )
    df = read_azure_inventory(spark, str(p), columns=["name", "CONTENT-LENGTH"])
    assert df.columns == ["Name", "Content-Length"]  # case-normalized access
    assert df.collect()[0]["Content-Length"] == 123


def test_jsonl_documents_tolerant_and_strict(spark, tmp_path):
    """A3's corrupt-row contract applied to the JSONL corpus-ingest path:
    tolerant mode drops the malformed line, strict mode fails fast."""
    import json as _json

    import pytest as _pytest

    from s3bigdatasync_spark.sources.inventory import read_jsonl_documents

    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7},
    ]
    lines = [_json.dumps(r) for r in rows] + ['{"doc_id": 3, "text": "trunc']
    p.write_text("\n".join(lines))

    df = read_jsonl_documents(spark, str(p))
    got = {r["doc_id"] for r in df.collect()}
    assert got == {1, 2}
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    with _pytest.raises(Exception):
        read_jsonl_documents(spark, str(p), strict=True).collect()


def test_parquet_mirror_pushes_key_range_to_scan(spark, tmp_path):
    """to_parquet_mirror's sortWithinPartitions(key) exists so min/max row-
    group stats prune key-range scans; pin the plan-level contract — the key
    predicate reaches the scan as PushedFilters — and result correctness."""
    from s3bigdatasync_spark.operators import prepared
    from s3bigdatasync_spark.sources.inventory import to_parquet_mirror
    from pyspark.sql import functions as F

    inv = prepared(spark, "/root/testdata/sf0.001").table("inventory_src").select(
        "key", "size", "etag"
    )
    out = str(tmp_path / "mirror")
    to_parquet_mirror(inv, out, partitions=4)

    mirrored = spark.read.parquet(out)
    hi = mirrored.agg(F.max("key")).collect()[0][0]
    q = mirrored.filter(F.col("key") >= hi)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(key" in pushed
    assert q.count() == inv.filter(F.col("key") >= hi).count()


def test_validate_manifest(spark, tmp_path):
    """A2's integrity step, real instead of the reference's pass-through stub
    (libs/s3_utils.py:83-87): ok / size_mismatch / md5_mismatch / missing."""
    import hashlib

    from s3bigdatasync_spark.sources.inventory import validate_manifest

    good = tmp_path / "good.csv"
    good.write_bytes(b"a,b,c\n")
    sized = tmp_path / "sized.csv"
    sized.write_bytes(b"longer than declared\n")
    hashed = tmp_path / "hashed.csv"
    hashed.write_bytes(b"payload\n")

    manifest = {
        "files": [
            {
                "key": str(good),
                "size": good.stat().st_size,
                "MD5checksum": hashlib.md5(good.read_bytes()).hexdigest(),
            },
            {"key": str(sized), "size": 1, "MD5checksum": ""},
            {
                "key": str(hashed),
                "size": hashed.stat().st_size,
                "MD5checksum": "0" * 32,
            },
            {"key": str(tmp_path / "gone.csv"), "size": 5, "MD5checksum": ""},
        ]
    }
    res = {r["path"]: r["status"] for r in validate_manifest(spark, manifest).collect()}
    assert res[str(good)] == "ok"
    assert res[str(sized)] == "size_mismatch"
    assert res[str(hashed)] == "md5_mismatch"
    assert res[str(tmp_path / "gone.csv")] == "missing"
