"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode step itself is stubbed
(deterministic fake features behind `decode_stub`; a real deployment swaps in
PIL/torchaudio inside the same mapInPandas kernel). Everything around the stub
is real and tested: binary column derivation, Arrow batch shape, pandas-UDF
signature, partition-parallel execution, schema of the feature output.

At 100 TB: binary payloads live in parquet as BINARY columns (or object-store
pointers for >row-group-size blobs); mapInPandas streams Arrow batches so a
task never materializes more than one batch of payloads; decode CPU scales
with executors, no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import prepared

MEDIA_TYPES = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive an opaque-binary media table from `documents`: payload =
    utf-8 bytes of the text (stand-in for image/audio bytes), media_type
    round-robins by doc_id."""
    docs = prepared(spark, sf_dir).table("documents")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length("text").alias("declared_len"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("feat_width", IntegerType()),
        StructField("feat_height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def decode_stub(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake (width, height, n_frames) from the
    payload hash. A real pipeline replaces this body with PIL/av decode;
    the Spark-side contract (bytes in, fixed-width features out) is what the
    engine tests.
    """
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if media_type == "image" else 1 + h[2] % 32
    return width, height, n_frames


def make_decoder():
    """Import-gated REAL decoder (same pattern as sources/metadata.py's
    boto3 gate): decodes image payloads with Pillow when it is installed,
    falling back to `decode_stub` otherwise. Per-ROW decode failures also
    fall back — a 100 TB corpus always contains corrupt blobs, and the
    pipeline must degrade per row, never fail the task.

    Call this INSIDE the mapInPandas kernel so the import gate evaluates on
    the executor (driver and executors may have different site-packages on a
    real cluster)."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        return decode_stub
    import io

    def decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
        if media_type != "image":
            return decode_stub(payload, media_type)
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return int(im.width), int(im.height), 1
        except Exception:
            return decode_stub(payload, media_type)

    return decode


def media_features_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`media_features` with the import-gated real decoder in the kernel.
    Not in the driver registry: its output depends on whether Pillow is
    installed and on payload decodability, so it is unit-tested
    (tests/test_multimodal_decoder.py) rather than oracle-hashed. In this
    container (no Pillow, text payloads) it reproduces the stub output
    exactly, which the test pins."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # local closure, no package imports: executor Python workers never
        # have s3bigdatasync_spark importable (driver loads by path). The
        # import gate is replicated inline and evaluates executor-side.
        import hashlib as _hl

        def stub(payload: bytes, media_type: str) -> tuple[int, int, int]:
            h = _hl.md5(payload).digest()
            return (
                64 + h[0] % 192,
                64 + h[1] % 192,
                1 if media_type == "image" else 1 + h[2] % 32,
            )

        try:
            import io

            from PIL import Image  # type: ignore[import-not-found]

            def decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
                if media_type != "image":
                    return stub(payload, media_type)
                try:
                    with Image.open(io.BytesIO(payload)) as im:
                        return int(im.width), int(im.height), 1
                except Exception:
                    return stub(payload, media_type)

        except ImportError:
            decode = stub

        for pdf in batches:
            feats = [decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "content_md5": [_hl.md5(p).hexdigest() for p in pdf["payload"]],
                    "feat_width": [f[0] for f in feats],
                    "feat_height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    media = media_table(spark, sf_dir)
    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over the binary column via mapInPandas.

    byte_len/content_md5 are oracle-checkable (payload is utf-8 of text);
    the stub's fake dims are deterministic md5 arithmetic, reproduced in the
    oracle SQL so even the stub path is hash-verified end-to-end.

    The kernel is a LOCAL closure on purpose: cloudpickle serializes it by
    value, so executor Python workers never need this package importable
    (the external driver loads __spark_entry__ by path, not via PYTHONPATH).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
            h = _hl.md5(payload).digest()
            return (
                64 + h[0] % 192,
                64 + h[1] % 192,
                1 if media_type == "image" else 1 + h[2] % 32,
            )

        for pdf in batches:
            feats = [decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "content_md5": [_hl.md5(p).hexdigest() for p in pdf["payload"]],
                    "feat_width": [f[0] for f in feats],
                    "feat_height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    media = media_table(spark, sf_dir)
    return media.mapInPandas(kernel, FEATURE_SCHEMA)


# Oracle reproduces the stub: md5 bytes 0/1/2 == hex pairs 1-2/3-4/5-6.
_HEXPAIR = "(instr('0123456789abcdef', substr(md5(text), {a}, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(text), {b}, 1)) - 1)"
_B0 = _HEXPAIR.format(a=1, b=2)
_B1 = _HEXPAIR.format(a=3, b=4)
_B2 = _HEXPAIR.format(a=5, b=6)

_MEDIA_FEATURES_SQL = f"""
SELECT doc_id,
       CASE cast(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       cast(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5,
       cast(64 + ({_B0}) % 192 AS INT) AS feat_width,
       cast(64 + ({_B1}) % 192 AS INT) AS feat_height,
       cast(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 1 + ({_B2}) % 32 END AS INT) AS n_frames
FROM documents
"""


def frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for video payloads: which frame indices each task
    would decode (stride sampling to 4 frames max). Pure plan — the decode is
    the stub; the sampled index arithmetic is the tested contract."""
    feats = media_features(spark, sf_dir)
    stride = F.greatest((F.col("n_frames") / 4).cast("int"), F.lit(1))
    return (
        feats.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            "n_frames",
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, stride
            ).alias("sampled_frames"),
        )
        .withColumn("n_sampled", F.size("sampled_frames"))
        .drop("sampled_frames")  # int arrays hash fine but keep output scalar
    )


_FRAME_SAMPLE_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         CASE cast(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         cast(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 1 + ({_B2}) % 32 END AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, n_frames,
       cast(len(generate_series(0, n_frames - 1, greatest(n_frames // 4, 1))) AS INT) AS n_sampled
FROM feats WHERE media_type = 'video'
"""


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-level dedup report per media type: unique payloads vs total,
    duplicate groups, and the bytes a content-addressed store would save —
    the first pass every multimodal ingestion runs (images/videos recur
    across crawls far more than text does).

    Scale: per-payload identity is the md5 already computed by the feature
    kernel, so this is one groupBy on (media_type, content_md5) — hash keys
    uniformly distributed, map-side combinable — then a per-type rollup."""
    feats = media_features(spark, sf_dir)
    per_asset = feats.groupBy("media_type", "content_md5").agg(
        F.count("*").alias("n_copies"), F.max("byte_len").alias("byte_len")
    )
    return per_asset.groupBy("media_type").agg(
        F.sum("n_copies").alias("n_assets"),
        F.count("*").alias("n_unique"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.col("n_copies") * F.col("byte_len")).alias("bytes_total"),
        F.sum((F.col("n_copies") - 1) * F.col("byte_len")).alias("bytes_dedupable"),
    )


_MEDIA_DEDUP_SQL = f"""
SELECT media_type,
       cast(sum(n_copies) AS BIGINT) AS n_assets,
       count(*) AS n_unique,
       cast(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       cast(sum(n_copies * byte_len) AS BIGINT) AS bytes_total,
       cast(sum((n_copies - 1) * byte_len) AS BIGINT) AS bytes_dedupable
FROM (
  SELECT media_type, content_md5, count(*) AS n_copies, max(byte_len) AS byte_len
  FROM ({_MEDIA_FEATURES_SQL}) GROUP BY media_type, content_md5
)
GROUP BY media_type
"""


QUERIES = {
    "media_features": media_features,
    "frame_sample_plan": frame_sample_plan,
    "media_dedup": media_dedup,
}

ORACLES = {
    "media_features": _MEDIA_FEATURES_SQL,
    "frame_sample_plan": _FRAME_SAMPLE_SQL,
    "media_dedup": _MEDIA_DEDUP_SQL,
}
