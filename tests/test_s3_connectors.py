"""Mocked-S3 round trip for the cloud connectors (VERDICT r7 item 5).

A12 (`make_s3_head_fetcher`) and B8 (`make_s3_copy_fn` → `task_executor`)
previously ran only against local-FS fakes that bypassed the S3 API shape.
Here a file-backed FakeS3Client implements the exact boto3 call surface the
connectors use — `head_object(Bucket=, Key=, PartNumber=)` matching
AzureEtagCheck/etag_app.py:68-90's HEAD+PartNumber probe (LastModified /
ContentLength / quoted multipart ETag / PartsCount), and
`copy(CopySource, Bucket, Key)` matching libs/s3_utils.py:17-35's
server-side copy — so the full pipeline (mapInPandas fan-out, closure
pickling to executor workers, error routing, dead-letter split) runs
against the API surface, not around it. File-backed on purpose: executor
python workers are separate processes, so copy mutations must land
somewhere the driver-side assertions can see.

When boto3+moto ARE installed, the same assertions run against a real
moto-mocked client (`test_head_fetcher_against_moto`); otherwise that test
import-skips — the gate the verdict asked for.
"""

from __future__ import annotations

import datetime
import json
from pathlib import Path

import pytest

from s3bigdatasync_spark.sources.metadata import (
    make_s3_copy_fn,
    make_s3_head_fetcher,
    probe_metadata,
)

UTC = datetime.timezone.utc


def _fake_s3(root: str):
    """File-backed fake with boto3's client surface, defined locally so
    cloudpickle ships it BY VALUE inside the fetcher/copy closures (executor
    workers can't import the tests package — the repo-wide kernel rule)."""

    class FakeS3Client:
        def __init__(self, root: str):
            self.root = root

        def _obj(self, bucket: str, key: str) -> "Path":
            from pathlib import Path as _P

            p = _P(self.root) / bucket / key
            if not p.exists():
                # boto3 raises botocore ClientError; any exception routes the
                # row identically through the connectors' error paths
                raise FileNotFoundError(f"NoSuchKey: s3://{bucket}/{key}")
            return p

        def head_object(self, Bucket: str, Key: str, PartNumber: int = 1):
            import datetime as _dt
            import json as _json

            p = self._obj(Bucket, Key)
            meta = _json.loads(p.with_suffix(p.suffix + ".meta").read_text())
            if PartNumber > meta["parts_count"]:
                raise ValueError(f"InvalidPartNumber: {PartNumber}")
            out = {
                "LastModified": _dt.datetime.fromtimestamp(
                    meta["mtime"], _dt.timezone.utc
                ),
                "ContentLength": meta["part_sizes"][PartNumber - 1],
                "ETag": f'"{meta["etag"]}"',  # quoted, as S3 returns it
            }
            if meta["parts_count"] > 1:
                out["PartsCount"] = meta["parts_count"]
            return out

        def copy(self, CopySource: dict, Bucket: str, Key: str):
            import shutil

            src = self._obj(CopySource["Bucket"], CopySource["Key"])
            dst = type(src)(self.root) / Bucket / Key
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy(src, dst)
            shutil.copy(src.with_suffix(src.suffix + ".meta"),
                        dst.with_suffix(dst.suffix + ".meta"))

    return FakeS3Client(root)


def _put(root: Path, bucket: str, key: str, body: bytes, parts: int, mtime: int):
    p = root / bucket / key
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(body)
    n = len(body)
    base = n // parts
    part_sizes = [base] * parts
    part_sizes[-1] += n - base * parts
    import hashlib

    etag = hashlib.md5(body).hexdigest() + (f"-{parts}" if parts > 1 else "")
    p.with_suffix(p.suffix + ".meta").write_text(
        json.dumps(
            {
                "mtime": mtime,
                "parts_count": parts,
                "part_sizes": part_sizes,
                "etag": etag,
            }
        )
    )
    return etag


def test_head_fetcher_probe_roundtrip(spark, tmp_path):
    """make_s3_head_fetcher against the S3 API surface, end to end through
    probe_metadata's mapInPandas fan-out: multipart ETag unquoted, part-1
    ContentLength (not the object size — the C17 range math's contract),
    PartsCount defaulted to 1 when S3 omits it, and a missing key routed to
    the error column with the row surviving."""
    root = tmp_path / "s3"
    e1 = _put(root, "src-bkt", "data/a.bin", b"x" * 1000, parts=4, mtime=1_700_000_000)
    e2 = _put(root, "src-bkt", "data/b.bin", b"y" * 70, parts=1, mtime=1_700_000_100)

    fetch = make_s3_head_fetcher(client=_fake_s3(str(root)))
    worklist = spark.createDataFrame(
        [("src-bkt", "data/a.bin"), ("src-bkt", "data/b.bin"),
         ("src-bkt", "data/missing.bin")],
        "bucket string, key string",
    ).repartition(3)  # force multiple executor workers through the closure
    got = {r["key"]: r for r in probe_metadata(worklist, fetcher=fetch).collect()}

    a = got["data/a.bin"]
    assert a["etag"] == e1 and e1.endswith("-4")  # unquoted multipart etag
    assert a["parts_count"] == 4
    assert a["size"] == 250  # part-1 length, not the 1000-byte object
    assert a["mtime"] == 1_700_000_000
    assert a["error"] is None
    b = got["data/b.bin"]
    assert b["etag"] == e2 and "-" not in e2
    assert b["parts_count"] == 1  # PartsCount absent from the HEAD → default
    assert b["size"] == 70
    m = got["data/missing.bin"]
    assert m["error"] is not None and "NoSuchKey" in m["error"]
    assert m["etag"] is None


def test_copy_fn_task_executor_roundtrip(spark, tmp_path):
    """make_s3_copy_fn driven by plans.pipeline.task_executor: server-side
    copies land in the destination bucket byte-identically (meta included),
    a missing source key fails that row into the dead-letter table, and the
    success/failure split matches the reference's TaskExecutor semantics."""
    from s3bigdatasync_spark.plans.pipeline import task_executor

    root = tmp_path / "s3"
    _put(root, "src-bkt", "obj/1.bin", b"alpha", parts=1, mtime=1_700_000_000)
    _put(root, "src-bkt", "obj/2.bin", b"beta" * 100, parts=2, mtime=1_700_000_001)

    tasks = [
        {"bucket": "src-bkt", "dst_bucket": "dst-bkt", "key": "obj/1.bin", "size": 5},
        {"bucket": "src-bkt", "dst_bucket": "dst-bkt", "key": "obj/2.bin", "size": 400},
        {"bucket": "src-bkt", "dst_bucket": "dst-bkt", "key": "obj/gone.bin", "size": 1},
    ]
    tasks_dir = tmp_path / "tasks"
    tasks_dir.mkdir()
    (tasks_dir / "t.json").write_text("\n".join(json.dumps(t) for t in tasks))

    copy_fn = make_s3_copy_fn(client=_fake_s3(str(root)))
    n_ok, n_fail = task_executor(
        spark,
        str(tasks_dir),
        copy_fn,
        str(tmp_path / "copy_log"),
        str(tmp_path / "dead_letter"),
    )
    assert (n_ok, n_fail) == (2, 1)
    assert (root / "dst-bkt/obj/1.bin").read_bytes() == b"alpha"
    assert (root / "dst-bkt/obj/2.bin").read_bytes() == b"beta" * 100
    assert not (root / "dst-bkt/obj/gone.bin").exists()
    dead = spark.read.parquet(str(tmp_path / "dead_letter")).collect()
    assert [r["object_key"] for r in dead] == ["obj/gone.bin"]
    # the copied object HEADs identically through the fetcher (A12 ∘ B8)
    fetch = make_s3_head_fetcher(client=_fake_s3(str(root)))
    assert fetch("dst-bkt", "obj/2.bin") == fetch("src-bkt", "obj/2.bin")


def test_head_fetcher_against_moto():
    """The same connector calls against a REAL moto-mocked boto3 S3 — runs
    wherever boto3+moto are installed (the verdict's CI gate), import-skips
    otherwise. Driver-side direct calls on purpose: a real boto3 client is
    not picklable and moto's mock doesn't cross process boundaries, so the
    distributed fan-out is proven by the file-backed fake above while THIS
    test proves the actual botocore request/response shapes (quoted ETag,
    LastModified tz-aware datetime, ClientError on a missing key, real
    server-side copy)."""
    boto3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")
    from botocore.exceptions import ClientError

    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="moto-bkt")
        client.put_object(Bucket="moto-bkt", Key="k1", Body=b"hello world")
        fetch = make_s3_head_fetcher(client=client)
        got = fetch("moto-bkt", "k1")
        assert got["size"] == 11 and got["parts_count"] == 1
        assert got["etag"] and '"' not in got["etag"]  # unquoted by the fetcher
        assert isinstance(got["mtime"], int) and got["mtime"] > 0
        with pytest.raises(ClientError):
            fetch("moto-bkt", "nope")
        client.create_bucket(Bucket="moto-dst")
        copy_fn = make_s3_copy_fn(client=client)
        assert copy_fn("moto-bkt", "moto-dst", "k1") is True
        assert (
            client.get_object(Bucket="moto-dst", Key="k1")["Body"].read()
            == b"hello world"
        )


def test_lazy_connectors_stay_picklable_after_driver_call():
    """The lazy-path contract (r8 self-review): a driver-side call (the
    sanity-HEAD pattern) must NOT capture the live boto3 client into the
    closure — the per-process cache lives on the boto3 module, so the
    connector still serializes for a later executor fan-out."""
    boto3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")
    from pyspark.serializers import CloudPickleSerializer

    ser = CloudPickleSerializer()
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="moto-lazy")
        client.put_object(Bucket="moto-lazy", Key="k", Body=b"xy")
        try:
            fetch = make_s3_head_fetcher(region="us-east-1")
            assert fetch("moto-lazy", "k")["size"] == 2  # driver-side use
            assert ser.dumps(fetch)  # closure still client-free
            copy_fn = make_s3_copy_fn(region="us-east-1")
            client.create_bucket(Bucket="moto-lazy2")
            assert copy_fn("moto-lazy", "moto-lazy2", "k") is True
            assert ser.dumps(copy_fn)
            assert (
                client.get_object(Bucket="moto-lazy2", Key="k")["Body"].read()
                == b"xy"
            )
        finally:
            # don't leak the mocked client into other tests' lazy paths
            if hasattr(boto3, "_s3bigdatasync_clients"):
                del boto3._s3bigdatasync_clients
