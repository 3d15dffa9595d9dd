"""Remote-metadata probe connector (SURVEY §2 A12/A13).

The reference HEADs S3 (PartNumber=1 → mtime/ETag/content-range/PartsCount,
AzureEtagCheck/etag_app.py:68-90) and reads Azure blob properties + ranged
byte slices (:75-114) per worklist row, inside an asyncio-per-process reactor
(mpmgr.py:84-124).

Spark shape: the worklist is a DataFrame; the probe runs inside mapInPandas
with a PLUGGABLE fetcher and bounded per-partition concurrency — a
thread-pooled fan-out per Arrow batch (I/O-bound HEADs need threads, not
asyncio ceremony). boto3/azure SDKs are not in this container, so the real
fetchers are import-gated stubs; the deterministic fake fetcher exercises the
full plumbing (partitioning, batch shape, error routing) and is what tests
drive. At 100 TB this is the ONLY operator that touches remote APIs in the
hot path, and its cost scales with executors — everything downstream joins
the pre-materialized metadata table (operators.joins.verification_join).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

Fetcher = Callable[[str, str], dict]
"""(bucket, key) -> {"mtime": int, "size": int, "etag": str, "parts_count": int}
Raise on fetch failure; the kernel routes the row to the error column."""

METADATA_SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("key", StringType()),
        StructField("mtime", LongType()),
        StructField("size", LongType()),
        StructField("etag", StringType()),
        StructField("parts_count", LongType()),
        StructField("error", StringType()),
    ]
)


def _make_fake_fetcher() -> Fetcher:
    """Factory so the fake fetcher is a CLOSURE, not a module-level function:
    cloudpickle serializes closures by value, so executor workers never need
    this package importable (same rule as every kernel in this repo — see
    the verify skill gotchas). User-supplied fetchers must likewise be
    self-contained closures or importable on executors."""

    def fetch(bucket: str, key: str) -> dict:
        import hashlib

        h = hashlib.md5(f"{bucket}/{key}".encode()).digest()
        if h[15] == 0:  # deterministic ~0.4% simulated fetch failure
            raise IOError(f"simulated 404 for {key}")
        return {
            "mtime": int.from_bytes(h[0:4], "big"),
            "size": int.from_bytes(h[4:8], "big") % 10_000_000_000,
            "etag": h.hex(),
            "parts_count": 1 + h[8] % 16,
        }

    return fetch


#: Offline stand-in: metadata derived from md5(bucket/key) — lets the whole
#: probe pipeline run and be asserted on without any cloud SDK.
deterministic_fake_fetcher: Fetcher = _make_fake_fetcher()


def make_s3_head_fetcher(region: str | None = None, client=None) -> Fetcher:
    """Production fetcher — HEAD with PartNumber=1 (etag_app.py:68-90).

    `client` is the test seam: anything exposing boto3's
    `head_object(Bucket=, Key=, PartNumber=)` surface (a moto-mocked client,
    or tests' file-backed FakeS3Client) — the returned closure then carries
    it by value and the whole probe pipeline runs against it with no SDK
    installed. Without `client`, boto3 is import-checked NOW (fail fast on
    the driver) but the real client is constructed LAZILY per process and
    cached ON THE boto3 MODULE, never in the closure: boto3 clients are not
    picklable, so a closure-cell cache would permanently poison the fetcher
    the first time it ran on the driver (e.g. a sanity HEAD before the
    mapInPandas fan-out) and crash the next task serialization — the
    closure must stay client-free in the lazy path (r8 self-review
    finding)."""
    if client is None:
        try:
            import boto3  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "boto3 not available in this environment; use deterministic_fake_fetcher"
            ) from e

    def fetch(bucket: str, key: str) -> dict:
        c = client
        if c is None:  # pragma: no cover — lazy per-process boto3 init,
            import boto3  # cached on the boto3 module (never pickled; the

            cache = getattr(boto3, "_s3bigdatasync_clients", None)  # closure
            if cache is None:  # stays client-free so it always serializes)
                cache = boto3._s3bigdatasync_clients = {}
            c = cache.get(region)
            if c is None:
                c = cache[region] = boto3.client("s3", region_name=region)
        head = c.head_object(Bucket=bucket, Key=key, PartNumber=1)
        parts = head.get("PartsCount", 1)
        return {
            "mtime": int(head["LastModified"].timestamp()),
            "size": head["ContentLength"] * 1,  # part-1 length; range math in C17
            "etag": head["ETag"].strip('"'),
            "parts_count": parts,
        }

    return fetch


def make_s3_copy_fn(region: str | None = None, client=None):
    """Production CopyFn for plans.pipeline.task_executor — boto3
    managed server-side copy, the reference's copy semantics
    (libs/s3_utils.py:17-35: copy_source={src_bucket, key} → dst bucket,
    same key). Same seam/laziness contract as make_s3_head_fetcher:
    `client` needs boto3's `copy(CopySource, Bucket, Key)`; without it
    boto3 is import-checked at factory time and constructed lazily per
    process, cached on the boto3 module — never in the closure, which must
    stay picklable even after a driver-side call (see make_s3_head_fetcher).
    Returns False-by-exception is handled by task_executor's per-row try
    (dead-letter routing, B8/B9)."""
    if client is None:
        try:
            import boto3  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "boto3 not available in this environment; use a local-FS CopyFn"
            ) from e

    def copy(src_bucket: str, dst_bucket: str, key: str) -> bool:
        c = client
        if c is None:  # pragma: no cover — lazy per-process boto3 init
            import boto3

            cache = getattr(boto3, "_s3bigdatasync_clients", None)
            if cache is None:
                cache = boto3._s3bigdatasync_clients = {}
            c = cache.get(region)
            if c is None:
                c = cache[region] = boto3.client("s3", region_name=region)
        c.copy({"Bucket": src_bucket, "Key": key}, dst_bucket, key)
        return True

    return copy


def probe_metadata(
    worklist: DataFrame,
    fetcher: Fetcher = deterministic_fake_fetcher,
    max_threads: int = 16,
) -> DataFrame:
    """Fan the fetcher out over the worklist (columns: bucket, key) with a
    bounded thread pool per Arrow batch. Failures land in `error`, the row
    survives — quarantine is a downstream filter, mirroring B9."""
    fn = fetcher
    threads = max_threads

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd
        from concurrent.futures import ThreadPoolExecutor

        def one(row):
            b, k = row
            try:
                m = fn(b, k)
                return (b, k, m["mtime"], m["size"], m["etag"], m["parts_count"], None)
            except Exception as e:
                return (b, k, None, None, None, None, str(e))

        with ThreadPoolExecutor(max_workers=threads) as pool:
            for pdf in batches:
                out = list(pool.map(one, zip(pdf["bucket"], pdf["key"])))
                yield pd.DataFrame(
                    out,
                    columns=[
                        "bucket",
                        "key",
                        "mtime",
                        "size",
                        "etag",
                        "parts_count",
                        "error",
                    ],
                )

    return worklist.select("bucket", "key").mapInPandas(kernel, METADATA_SCHEMA)
