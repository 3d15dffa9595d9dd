"""S3 multipart-ETag computation (SURVEY §2 H1-H3, J5's verify kernel).

Reference: AzureEtagCheck/etag_app.py — calc_part_md5 (:26-27), calc_etag
(:29-30), calc_parts_props (:38-52). The published S3 algorithm: per-part md5
digests, concatenated RAW (not hex), md5'd again, suffixed '-N'. Single-part
objects are just md5(payload) with no suffix — the reference's single-part
path uses an undefined loop variable (etag_app.py:111, a real bug); this
implementation handles it correctly and tests pin all three geometries
(single, exact-multiple, remainder).

Arrow-batched pandas UDF: one Python roundtrip per batch, hashlib (C speed)
per row. At 100 TB the payload bytes never leave the executor.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# real type hints at definition time; postponed (string) annotations break
# its signature inspection.

import hashlib
import math


def parts_props(total_size: int, part_size: int) -> tuple[int, int]:
    """H3: (parts_count, last_part_size) for a multipart geometry —
    calc_parts_props re-expressed from (size, part_size) rather than a
    content-range header string (C17 covers the regex form)."""
    if total_size <= 0:
        return (1, 0) if total_size == 0 else (0, 0)
    parts = math.ceil(total_size / part_size)
    last = total_size - (parts - 1) * part_size
    return parts, last


def multipart_etag_bytes(payload: bytes, part_size: int) -> str:
    """H2: the S3 multipart ETag of `payload` uploaded with `part_size`."""
    if part_size <= 0 or len(payload) <= part_size:
        return hashlib.md5(payload).hexdigest()
    digests = [
        hashlib.md5(payload[i : i + part_size]).digest()
        for i in range(0, len(payload), part_size)
    ]
    return hashlib.md5(b"".join(digests)).hexdigest() + f"-{len(digests)}"


def make_multipart_etag_udf():
    """Pandas-UDF binding, built lazily and as a local closure so executors
    never need this package importable (see verify skill gotchas)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _etag(payload: bytes, part_size: int) -> str:
        import hashlib as _hl

        if part_size <= 0 or len(payload) <= part_size:
            return _hl.md5(payload).hexdigest()
        digests = [
            _hl.md5(payload[i : i + part_size]).digest()
            for i in range(0, len(payload), part_size)
        ]
        return _hl.md5(b"".join(digests)).hexdigest() + f"-{len(digests)}"

    @pandas_udf(StringType())
    def etag_udf(payload: pd.Series, part_size: pd.Series) -> pd.Series:
        return pd.Series(
            [_etag(p, int(ps)) for p, ps in zip(payload, part_size)]
        )

    return etag_udf
