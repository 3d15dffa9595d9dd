"""JVM-literal local relations for streaming control-plane writes.

`spark.createDataFrame(<python rows>)` builds a Python-RDD-backed plan: any
action over it — including writing a ONE-ROW meta pointer — runs a Python
worker round-trip per task. Measured on the segmented sink's hot path
(round 11): writing a 4-row manifest cost ~4.4 s and even an EMPTY
createDataFrame write ~5.8 s, which made ~80% of the sink's per-micro-batch
fixed overhead; the same rows as a JVM literal struct-array write in ~0.2 s.
Every streaming module's per-batch meta/manifest/sentinel write goes through
`local_rel` for this reason. (Bulk data still uses createDataFrame — the
cost is per-task fixed overhead, irrelevant when the write does real work.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cols(schema: str) -> list[tuple[str, str]]:
    out = []
    for c in schema.split(","):
        name, typ = c.strip().split(maxsplit=1)
        out.append((name, typ))
    return out


def local_rel(spark: SparkSession, rows: Sequence, schema: str) -> DataFrame:
    """A DataFrame holding `rows` (tuples, may contain None) under the DDL
    `schema` ("name type, ..."), built as literal structs over range(1) so
    the plan is pure JVM — no Python-RDD leg, no Python worker at write
    time. Intended for SMALL control-plane relations (metas, manifests,
    sentinels); literals live in the plan, so row counts must stay driver-
    bounded."""
    cols = _cols(schema)
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(t).alias(n) for n, t in cols]
        )
    structs = [
        F.struct(
            *[F.lit(v).cast(t).alias(n) for v, (n, t) in zip(r, cols)]
        )
        for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )
