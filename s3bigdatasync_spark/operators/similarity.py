"""Similarity search over the embedding column (`array<float>`, 64-dim).

Two paths, mirroring what a 100 TB vector pipeline needs:

  ann_topk_bruteforce — exact cosine top-k for one query vector. The scan is
      embarrassingly parallel (map-side partial top-k via sort+limit; Spark
      plans TakeOrderedAndProject, so only k rows per partition reach the
      driver-side merge).
  ann_lsh_topk        — sign-random-projection LSH: 8 deterministic ±1
      hyperplanes → 8-bit bucket; candidates = buckets within Hamming
      distance PROBE_RADIUS of the query's (multi-probe). At scale the table
      is written partitioned by bucket → partition pruning makes a top-k
      query touch 37/256 of the data at radius 2.

Hyperplanes are md5-derived ±1 literals (no RNG; see vector_lsh for why the
earlier integer-parity formula degenerated to a single effective plane) so
the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import prepared, scoped_cache
from .dedup import _dot, _cos_sql
from .vector_lsh import plane_sign as _plane_sign

DIM = 64
N_PLANES = 8
TOP_K = 10
QUERY_VEC_ID = 0
PROBE_RADIUS = 2  # ann_lsh_topk multi-probe: buckets within this Hamming dist


def _plane_dot_spark(vec: str, p: int) -> Column:
    terms = F.zip_with(
        F.col(vec),
        F.array(*[F.lit(float(_plane_sign(p, i))) for i in range(DIM)]),
        lambda x, w: x.cast("double") * w,
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)


def _bucket_spark(vec: str) -> Column:
    out = F.lit(0)
    for p in range(N_PLANES):
        out = out + F.when(_plane_dot_spark(vec, p) > 0, F.lit(2**p)).otherwise(F.lit(0))
    return out.cast("int")


def _plane_dot_sql(vec: str, p: int) -> str:
    terms = " + ".join(
        f"({'' if _plane_sign(p, i) == 1 else '-'}{vec}[{i + 1}]::DOUBLE)" for i in range(DIM)
    )
    return f"({terms})"


def _bucket_sql(vec: str) -> str:
    parts = [
        f"(CASE WHEN {_plane_dot_sql(vec, p)} > 0 THEN {2**p} ELSE 0 END)"
        for p in range(N_PLANES)
    ]
    return "cast(" + " + ".join(parts) + " AS INT)"


def _query_vec(emb: DataFrame) -> DataFrame:
    # qn: the query norm is hoisted into the 1-row relation (r11, guide §2.3
    # "don't compute things you throw away" applied per-row: sqrt(dot(qv,qv))
    # is constant across the corpus side, recomputing it per row re-ran a
    # 64-element fold n times). Same operands, same multiplication order →
    # bit-identical cosines.
    return emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv"),
        F.sqrt(_dot("embedding", "embedding")).alias("qn"),
    )


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors of QUERY_VEC_ID by cosine (query vector is
    broadcast; ordering key is (rounded cosine desc, vec_id) so ranking is
    engine-deterministic)."""
    emb = prepared(spark, sf_dir).table("embeddings")
    q = _query_vec(emb)
    cos = F.round(
        _dot("embedding", "qv") / (F.sqrt(_dot("embedding", "embedding")) * F.col("qn")),
        6,
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


_ANN_BRUTE_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       {_cos_sql('embedding', 'qv')} AS cosine
FROM embeddings, q
WHERE vec_id <> {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT {TOP_K}
"""


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector LSH bucket id + per-bucket occupancy — the partitioning
    layout a bucketed vector table would be written with."""
    emb = prepared(spark, sf_dir).table("embeddings")
    return (
        emb.select(_bucket_spark("embedding").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


_LSH_BUCKETS_SQL = f"""
SELECT {_bucket_sql('embedding')} AS bucket, count(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-restricted top-k with multi-probe: candidates limited to buckets
    within Hamming distance PROBE_RADIUS of the query's bucket — the standard
    recall/latency dial (radius 2 of 8 planes scans 37/256 of the bucket
    space). With a bucket-partitioned table the probe set is a static
    partition-pruning predicate: only those partitions are read."""
    emb = prepared(spark, sf_dir).table("embeddings")
    bucketed = emb.withColumn("bucket", _bucket_spark("embedding"))
    # query norm hoisted into the 1-row broadcast (see _query_vec) — same
    # operands and multiplication order, bit-identical cosine
    qb = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.sqrt(_dot("embedding", "embedding")).alias("qn"),
    )
    cos = F.round(
        _dot("embedding", "qv") / (F.sqrt(_dot("embedding", "embedding")) * F.col("qn")),
        6,
    )
    return (
        bucketed.crossJoin(F.broadcast(qb))
        .filter(
            (F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket"))) <= PROBE_RADIUS)
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


_ANN_LSH_SQL = f"""
WITH b AS (SELECT vec_id, label, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings),
q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       {_cos_sql('embedding', 'qv')} AS cosine
FROM b, q
WHERE bit_count(xor(b.bucket, q.qbucket)) <= {PROBE_RADIUS} AND vec_id <> {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT {TOP_K}
"""




def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer training data: per-label centroids in LONG form
    (label, dim, value) — posexplode + groupBy avg, one shuffle keyed by
    (label, dim). Long form keeps the oracle trivial and is also the shape a
    k-means iteration consumes."""
    emb = prepared(spark, sf_dir).table("embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"))
    )


_CENTROIDS_SQL = """
SELECT label, dim, round(avg(v), 6) AS centroid_v
FROM (
  SELECT label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
)
GROUP BY label, dim
"""



def _centroids_pdf(spark: SparkSession, sf_dir: str):
    """label_centroids collected to pandas ONCE per registry query (scoped
    memo, r11): the K×D centroid table is tiny driver-held model state
    consumed by ivf_assign / semantic-dedup / margin-audit / ivf_pq_search —
    and by EACH of ivf_nprobe_curve's sweep arms. Previously every call site
    re-ran the centroid aggregation + toPandas (one full posexplode pass
    over the vectors per call)."""
    from . import scoped_memo

    return scoped_memo(
        ("ivf_centroids_pdf", sf_dir),
        lambda: label_centroids(spark, sf_dir).toPandas(),
    )

def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF assignment: each vector routed to its nearest label-centroid
    (euclidean), the coarse-quantization step of an IVF index. Centroids are
    tiny → broadcast; distances via numpy in mapInPandas (the vector-math
    path). Oracle-checkable because the ASSIGNMENT is discrete: both engines
    use the 6dp-rounded centroids (label_centroids), round squared distances
    to 6dp before argmin, and break ties by ascending centroid label —
    engine float-sum-order differences vanish under the rounding. Tests
    additionally assert assignment quality (most vectors route to their own
    label's centroid)."""
    import numpy as np

    emb = prepared(spark, sf_dir).table("embeddings")
    cents = _centroids_pdf(spark, sf_dir)
    labels = sorted(cents["label"].unique())
    dim = int(cents["dim"].max()) + 1
    C = np.zeros((len(labels), dim))
    for li, lab in enumerate(labels):
        sub = cents[cents["label"] == lab].sort_values("dim")
        C[li] = sub["centroid_v"].to_numpy()
    bc = spark.sparkContext.broadcast((np.array(labels), C))

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        labs, cmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = _np.array([_np.asarray(v, dtype=_np.float64) for v in pdf["embedding"]])
            # round before argmin (oracle contract); labs is sorted ascending
            # and argmin takes the first minimum → ties break by label order
            d2 = _np.round(((M[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2), 6)
            nearest = labs[d2.argmin(axis=1)]
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "assigned": nearest,
                }
            )

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("label", IntegerType()),
            StructField("assigned", IntegerType()),
        ]
    )
    return emb.select("vec_id", "label", "embedding").mapInPandas(kernel, schema)


OUTLIER_K = 50


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit: the OUTLIER_K vectors FARTHEST from
    their assigned IVF centroid — the standard embedding-quality triage
    before clustering-based curation (SemDeDup §3 discards per-cluster
    outliers; mislabeled/garbage embeddings surface here first).

    Same broadcast-centroid + Arrow kernel as ivf_assign (distances never
    shuffle — each Arrow batch scores locally), then one global
    TakeOrderedAndProject on (d2 DESC, vec_id) — top-k over n vectors, no
    full sort, no window. Oracle-checkable because distances round to 6dp
    BEFORE ranking and vec_id breaks ties (the ivf_assign float contract),
    so both engines select the identical row set at any K."""
    import numpy as np

    emb = prepared(spark, sf_dir).table("embeddings")
    cents = _centroids_pdf(spark, sf_dir)
    out_schema = "vec_id long, label int, assigned int, d2 double"
    if not len(cents):
        return spark.createDataFrame([], out_schema)
    labels = sorted(cents["label"].unique())
    dim = int(cents["dim"].max()) + 1
    C = np.zeros((len(labels), dim))
    for li, lab in enumerate(labels):
        sub = cents[cents["label"] == lab].sort_values("dim")
        C[li] = sub["centroid_v"].to_numpy()
    bc = spark.sparkContext.broadcast((np.array(labels), C))

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        labs, cmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = _np.array([_np.asarray(v, dtype=_np.float64) for v in pdf["embedding"]])
            d2 = _np.round(((M[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2), 6)
            idx = d2.argmin(axis=1)  # labs sorted asc → ties break by label
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "assigned": labs[idx],
                    "d2": d2[_np.arange(len(idx)), idx],
                }
            )

    scored = emb.select("vec_id", "label", "embedding").mapInPandas(
        kernel, out_schema
    )
    return scored.orderBy(F.desc("d2"), "vec_id").limit(OUTLIER_K)


_EMBEDDING_OUTLIERS_SQL = f"""
WITH cent AS ({_CENTROIDS_SQL}),
vecs AS (
  SELECT vec_id, label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
),
d AS (
  SELECT v.vec_id, v.label, c.label AS clabel,
         round(sum((v.v - c.centroid_v) * (v.v - c.centroid_v)), 6) AS d2
  FROM vecs v JOIN cent c ON c.dim = v.dim
  GROUP BY v.vec_id, v.label, c.label
),
r AS (
  SELECT vec_id, label, clabel,  d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM d
)
SELECT vec_id, label, clabel AS assigned, d2
FROM r WHERE rn = 1
ORDER BY d2 DESC, vec_id LIMIT {OUTLIER_K}
"""


# --- label_margin_audit: nearest-centroid label-noise detection --------------

MARGIN_K = 50


def label_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise triage by centroid margin (the nearest-centroid flavor of
    confident-learning / kNN label cleaning): for every vector, squared
    distance to its OWN label's centroid vs the best OTHER label's centroid.
    margin = d2_own - d2_other > 0 means the vector sits closer to another
    class — the classic mislabeled-or-boundary signal curation pipelines
    review first. embedding_outliers ranks by raw distance magnitude (garbage
    detection); this ranks by the own-vs-other DIFFERENCE (label noise) —
    a far-but-correctly-labeled vector is an outlier yet has deeply negative
    margin here. Output: the MARGIN_K worst margins.

    Scale shape mirrors ivf_assign/embedding_outliers: the 10x64 centroid
    matrix broadcasts, every Arrow batch computes its distances locally via
    one GEMM-shaped NumPy op (distances never shuffle), and the final top-k
    is TakeOrderedAndProject. Float contract: per-centroid d2 rounds to 6dp
    BEFORE comparing, other-label ties break by label asc (labs are sorted,
    argmin takes the first), and the margin difference re-rounds — so both
    engines rank the identical row set."""
    import numpy as np

    emb = prepared(spark, sf_dir).table("embeddings")
    cents = _centroids_pdf(spark, sf_dir)
    out_schema = (
        "vec_id long, label int, nearest_other int, d2_own double, "
        "d2_other double, margin double, mislabeled boolean"
    )
    if not len(cents):
        return spark.createDataFrame([], out_schema)
    labels = sorted(cents["label"].unique())
    if len(labels) < 2:
        # no "other" centroid exists — margin is undefined; mirror the
        # oracle, whose other-label CTE is empty in this case
        return spark.createDataFrame([], out_schema)
    dim = int(cents["dim"].max()) + 1
    C = np.zeros((len(labels), dim))
    for li, lab in enumerate(labels):
        sub = cents[cents["label"] == lab].sort_values("dim")
        C[li] = sub["centroid_v"].to_numpy()
    bc = spark.sparkContext.broadcast((np.array(labels), C))

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        labs, cmat = bc.value
        lab_pos = {int(l): i for i, l in enumerate(labs)}
        for pdf in batches:
            if not len(pdf):
                continue
            M = _np.array([_np.asarray(v, dtype=_np.float64) for v in pdf["embedding"]])
            d2 = _np.round(((M[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2), 6)
            own_idx = _np.array([lab_pos[int(l)] for l in pdf["label"]])
            rows = _np.arange(len(own_idx))
            d2_own = d2[rows, own_idx]
            masked = d2.copy()
            masked[rows, own_idx] = _np.inf
            other_idx = masked.argmin(axis=1)  # labs asc -> ties to smaller label
            d2_other = masked[rows, other_idx]
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "nearest_other": labs[other_idx],
                    "d2_own": d2_own,
                    "d2_other": d2_other,
                    "margin": _np.round(d2_own - d2_other, 6),
                    "mislabeled": d2_own > d2_other,
                }
            )

    scored = emb.select("vec_id", "label", "embedding").mapInPandas(
        kernel, out_schema
    )
    return scored.orderBy(F.desc("margin"), "vec_id").limit(MARGIN_K)


_LABEL_MARGIN_SQL = f"""
WITH cent AS ({_CENTROIDS_SQL}),
vecs AS (
  SELECT vec_id, label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
),
d AS (
  SELECT v.vec_id, v.label, c.label AS clabel,
         round(sum((v.v - c.centroid_v) * (v.v - c.centroid_v)), 6) AS d2
  FROM vecs v JOIN cent c ON c.dim = v.dim
  GROUP BY v.vec_id, v.label, c.label
),
own AS (SELECT vec_id, label, d2 AS d2_own FROM d WHERE clabel = label),
other AS (
  SELECT vec_id, clabel AS nearest_other, d2 AS d2_other
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d2, clabel) AS rn
        FROM d WHERE clabel <> label)
  WHERE rn = 1
)
SELECT vec_id, label, nearest_other, d2_own, d2_other,
       round(d2_own - d2_other, 6) AS margin,
       d2_own > d2_other AS mislabeled
FROM own JOIN other USING (vec_id)
ORDER BY margin DESC, vec_id
LIMIT {MARGIN_K}
"""


# --- Johnson-Lindenstrauss random projection --------------------------------

RP_DIMS = 16
# planes 100..115: an independent md5-derived ±1 family (disjoint from the
# LSH planes 0..N_PLANES-1, so projection and bucketing stay uncorrelated)
_RP_PLANE_BASE = 100
# sqrt(RP_DIMS) — exact in both engines
_RP_SCALE = "4.0"


def embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson–Lindenstrauss):
    64-dim float vectors → RP_DIMS dims via a deterministic ±1 sign matrix,
    scaled by 1/sqrt(RP_DIMS). The cheap first stage of any large-scale
    vector pipeline — a 4× narrower vector shrinks every downstream shuffle
    and index while keeping pairwise distances within JL distortion bounds
    (pinned in tests/test_rp.py).

    One (batch × 64) @ (64 × 16) GEMM per Arrow batch inside mapInPandas —
    embarrassingly parallel, no shuffle at any scale. Long-form output keeps
    the oracle trivial (DuckDB computes the same signed sums)."""
    import numpy as np

    emb = prepared(spark, sf_dir).table("embeddings")
    S = planes_matrix_rp()  # (RP_DIMS, DIM)
    bc = spark.sparkContext.broadcast(S)

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        smat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = _np.array([_np.asarray(v, dtype=_np.float64) for v in pdf["embedding"]])
            P = _np.round(M @ smat.T / float(_RP_SCALE), 6)  # (n, RP_DIMS)
            n = len(pdf)
            yield _pd.DataFrame(
                {
                    "vec_id": _np.repeat(pdf["vec_id"].to_numpy(), RP_DIMS),
                    "out_dim": _np.tile(_np.arange(RP_DIMS), n),
                    "proj_v": P.reshape(-1),
                }
            )

    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("out_dim", IntegerType()),
            StructField("proj_v", DoubleType()),
        ]
    )
    return emb.select("vec_id", "embedding").mapInPandas(kernel, schema)


def planes_matrix_rp():
    """(RP_DIMS, DIM) ±1 float64 matrix for the projection GEMM."""
    import numpy as np

    return np.array(
        [
            [float(_plane_sign(_RP_PLANE_BASE + j, i)) for i in range(DIM)]
            for j in range(RP_DIMS)
        ]
    )


def _rp_sql() -> str:
    from .vector_lsh import plane_dot_sql

    selects = []
    for j in range(RP_DIMS):
        dot = plane_dot_sql("embedding", _RP_PLANE_BASE + j, DIM)
        selects.append(
            f"SELECT vec_id, {j} AS out_dim,"
            f" round({dot} / {_RP_SCALE}, 6) AS proj_v FROM embeddings"
        )
    return "\nUNION ALL\n".join(selects)


# --- Lloyd k-means (iterative, oracle-checked) ------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2  # assign → update → assign: final assignment vs 1× updated C


def _collect_centroids(c_df) -> "tuple":
    """(sorted cid array, K×DIM matrix) from a long-form (cid, dim, cv)
    DataFrame — K×DIM rows, the legitimate driver-side state of any
    distributed k-means (same shape every MLlib iteration ships)."""
    import numpy as np

    rows = c_df.collect()
    cids = sorted({r["cid"] for r in rows})
    dim = max(r["dim"] for r in rows) + 1
    C = np.zeros((len(cids), dim))
    for r in rows:
        C[cids.index(r["cid"]), r["dim"]] = r["cv"]
    return np.array(cids), C


def kmeans_lloyd(spark: SparkSession, sf_dir: str, k: int = KMEANS_K) -> DataFrame:
    """Lloyd's k-means over the embedding table: K=8, deterministic init (the
    K lowest vec_ids), KMEANS_ITERS assignment passes with one centroid
    update between them. The iterative-algorithm pattern done Spark-first:
    per-iteration state is a K×64 centroid matrix broadcast to a mapInPandas
    assignment kernel (Arrow-batched GEMM — never a Python row loop), and the
    update is a posexplode + groupBy(cluster, dim) avg — one shuffle keyed by
    (cluster, dim), never materializing pairwise distances.

    Oracle-checkable despite floats (the ivf_assign contract): centroids are
    6dp-rounded in SQL-rounding space, squared distances 6dp-rounded before
    argmin, ties broken by ascending cluster id — so the discrete ASSIGNMENT
    is engine-exact; the unrolled-CTE DuckDB oracle replays both iterations."""
    import numpy as np

    emb = prepared(spark, sf_dir).table("embeddings")
    v = emb.select("vec_id", F.posexplode("embedding").alias("dim", "val")).select(
        "vec_id", "dim", F.col("val").cast("double").alias("val")
    )
    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(k).collect()]
    if not ids:
        # empty corpus (bootstrap/restart condition): empty assignment, same
        # schema — mirrors the oracle, whose CTEs all evaluate to zero rows
        return spark.createDataFrame([], "vec_id long, cluster int, d2 double")
    cid_map = spark.createDataFrame(
        [(int(vid), i) for i, vid in enumerate(ids)], "vec_id long, cid int"
    )
    c_df = v.join(F.broadcast(cid_map), "vec_id").select(
        "cid", "dim", F.round("val", 6).alias("cv")
    )
    cids, C = _collect_centroids(c_df)

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cluster", IntegerType()),
            StructField("d2", DoubleType()),
        ]
    )

    def make_kernel(bc):
        def kernel(batches):
            import numpy as _np
            import pandas as _pd

            labs, cmat = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                M = _np.array(
                    [_np.asarray(x, dtype=_np.float64) for x in pdf["embedding"]]
                )
                d2 = _np.round(((M[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2), 6)
                amin = d2.argmin(axis=1)  # first min → ties break by cid order
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cluster": labs[amin].astype("int32"),
                        "d2": d2[_np.arange(len(amin)), amin],
                    }
                )

        return kernel

    assigned = None
    for it in range(KMEANS_ITERS):
        bc = spark.sparkContext.broadcast((cids, C))
        assigned = emb.select("vec_id", "embedding").mapInPandas(make_kernel(bc), schema)
        if it < KMEANS_ITERS - 1:
            upd = (
                v.join(assigned.select("vec_id", F.col("cluster").alias("cid")), "vec_id")
                .groupBy("cid", "dim")
                .agg(F.round(F.avg("val"), 6).alias("cv"))
            )
            cids, C = _collect_centroids(upd)
    return assigned


_KMEANS_CTES = f"""v AS (
  SELECT vec_id, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
),
init_ids AS (
  SELECT vec_id, cast(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K})
),
c0 AS (
  SELECT cid, dim, round(val, 6) AS cv FROM v JOIN init_ids USING (vec_id)
),
d1 AS (
  SELECT v.vec_id, c.cid, round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS d2
  FROM v JOIN c0 c ON v.dim = c.dim GROUP BY v.vec_id, c.cid
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d1
  ) WHERE rn = 1
),
c1 AS (
  SELECT cid, dim, round(avg(val), 6) AS cv
  FROM v JOIN a1 USING (vec_id) GROUP BY cid, dim
),
d2_ AS (
  SELECT v.vec_id, c.cid, round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS d2
  FROM v JOIN c1 c ON v.dim = c.dim GROUP BY v.vec_id, c.cid
),
km_assign AS (
  SELECT vec_id, cid AS cluster, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d2_
  ) WHERE rn = 1
)"""

_KMEANS_SQL = "WITH " + _KMEANS_CTES + "\nSELECT vec_id, cluster, d2 FROM km_assign"


def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-occupancy audit of the UNSUPERVISED coarse quantizer — the
    pq_code_balance pattern applied to the IVF layer. The ivf_* family's
    committed quantizer uses label centroids (deterministic, testdata has
    labels); a real corpus has none, so the deployable coarse quantizer is
    kmeans_lloyd's assignment, and THIS relation is what proves its cells
    usable before a table is partitioned by them: per cell, the vector
    count, corpus share (skewed cells = uneven partition pruning — one hot
    cell and nprobe=1 scans half the corpus), and mean/max squared
    distance to the centroid (fat cells = a coarse quantizer that isn't
    quantizing).

    Scale shape: rides kmeans_lloyd's assignment (broadcast-centroid Arrow
    GEMM, no data-sized shuffle); the audit adds one groupBy(cluster) —
    ≤ KMEANS_K groups, map-side combinable — plus a 1-row total broadcast
    for the share. Float contract: d2 is 6dp-rounded at assignment, so the
    mean is computed from EXACT micro-integer sums (round(d2·1e6) cast to
    long) — `round(avg(double),6)` over grid values lands on exact .5e-6
    boundaries whenever 2·Σmicro ≡ n (mod 2n), and which side a float sum
    falls is accumulation-order luck (this operator's first draft flipped
    0.941025/0.941024 between runs on exactly that boundary). Integer sums
    commute exactly; the two divisions then run on identical operands in
    both engines."""
    # cache-pin: the assignment feeds BOTH the per-cell agg and the total
    assign = scoped_cache(kmeans_lloyd(spark, sf_dir))
    micro = F.round(F.col("d2") * 1e6).cast("long")
    per = assign.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum(micro).alias("sum_micro"),
        F.round(F.max("d2"), 6).alias("max_d2"),
    )
    total = assign.agg(F.count("*").alias("n_total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "cluster",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("n_total"), 6).alias("share"),
            F.round(
                F.col("sum_micro") / F.col("n_vectors") / F.lit(1e6), 6
            ).alias("mean_d2"),
            "max_d2",
        )
        .orderBy("cluster")
    )


_IVF_CELL_BALANCE_SQL = (
    "WITH "
    + _KMEANS_CTES
    + """,
per AS (
  SELECT cluster, count(*) AS n_vectors,
         sum(CAST(round(d2 * 1000000) AS BIGINT)) AS sum_micro,
         round(max(d2), 6) AS max_d2
  FROM km_assign GROUP BY cluster
),
tot AS (SELECT count(*) AS n_total FROM km_assign)
SELECT cluster, n_vectors,
       round(n_vectors / CAST(n_total AS DOUBLE), 6) AS share,
       round(sum_micro / CAST(n_vectors AS DOUBLE) / 1000000.0, 6) AS mean_d2,
       max_d2
FROM per, tot
ORDER BY cluster"""
)


# --- SemDeDup: cluster-bounded semantic dedup --------------------------------

SEM_COS_THRESHOLD = 0.45  # matches dedup.COSINE_THRESHOLD (class-cluster data)


def semantic_dedup(spark: SparkSession, sf_dir: str, k: int = KMEANS_K) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means partitions the embedding
    space, then near-duplicate search runs ONLY within each cluster — the
    standard way to keep pairwise work from being O(n²) over the corpus. A
    vector is dropped when a lower-id vector in its cluster is closer than
    SEM_COS_THRESHOLD cosine; per-vector verdicts feed a corpus yield stage.

    Scale: pairwise cost is Σ|cluster|² — bounded by K (raise K so clusters
    track n/target_cluster_size; hierarchical k-means at extreme scale). One
    shuffle keyed by cluster id feeds a per-cluster Arrow GEMM kernel (the
    proven embedding_neardup bucket pattern — numpy matmul, never a pair
    row-explosion); the kernel emits every member's lower-id-neighbor count
    directly, so cross-cluster pairs (the deliberate recall trade SemDeDup
    makes) never materialize anywhere and no join-back is needed."""
    emb = prepared(spark, sf_dir).table("embeddings")
    assign = kmeans_lloyd(spark, sf_dir, k=k).select("vec_id", "cluster")
    ve = emb.join(assign, "vec_id").select("vec_id", "cluster", "embedding")

    def cluster_kernel(pdf):
        import numpy as _np
        import pandas as _pd

        ids = pdf["vec_id"].to_numpy()
        order = _np.argsort(ids)
        ids = ids[order]
        M = _np.array(
            [_np.asarray(x, dtype=_np.float64) for x in pdf["embedding"].iloc[order]]
        )
        norms = _np.sqrt((M * M).sum(axis=1))
        cos = (M @ M.T) / _np.outer(norms, norms)
        close = (_np.round(cos, 6) >= SEM_COS_THRESHOLD) & (
            ids[:, None] < ids[None, :]
        )
        return _pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].iloc[order].to_numpy(),
                "n_close_lower": close.sum(axis=0).astype("int64"),
            }
        )

    return (
        ve.groupBy("cluster")
        .applyInPandas(cluster_kernel, "vec_id long, cluster int, n_close_lower long")
        .withColumn("keep", F.col("n_close_lower") == 0)
    )


def _semantic_dedup_sql() -> str:
    from .dedup import _cos_sql

    cos = _cos_sql("ea.embedding", "eb.embedding")
    return (
        "WITH "
        + _KMEANS_CTES
        + f""",
ve AS (
  SELECT e.vec_id, k.cluster, e.embedding
  FROM embeddings e JOIN km_assign k USING (vec_id)
),
close_lower AS (
  SELECT eb.vec_id AS vec_id, count(*) AS n_close_lower
  FROM ve ea JOIN ve eb ON ea.cluster = eb.cluster AND ea.vec_id < eb.vec_id
  WHERE {cos} >= {SEM_COS_THRESHOLD}
  GROUP BY eb.vec_id
)
SELECT ve.vec_id, ve.cluster,
       coalesce(cl.n_close_lower, 0) AS n_close_lower,
       coalesce(cl.n_close_lower, 0) = 0 AS keep
FROM ve LEFT JOIN close_lower cl ON ve.vec_id = cl.vec_id
"""
    )


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH multi-probe top-k against the exact brute-force
    top-k — the audit a bucketed ANN path must pass before replacing the
    exact scan at scale (the completeness-critic step: approximate indexes
    need a measured recall number, not a vibe). One-row output: k, overlap
    count, recall. Both sides are the engine's own queries; the join is a
    k-row semi-join, so the audit costs one brute-force pass — run it on a
    sampled query set in production."""
    brute = ann_topk_bruteforce(spark, sf_dir).select("vec_id")
    lsh = ann_lsh_topk(spark, sf_dir).select(F.col("vec_id").alias("lid"))
    overlap = brute.join(lsh, brute.vec_id == lsh.lid, "left_semi").agg(
        F.count("*").alias("n_overlap")
    )
    return overlap.select(
        F.lit(TOP_K).alias("k"),
        "n_overlap",
        F.round(F.col("n_overlap") / TOP_K, 6).alias("recall"),
    )


_ANN_RECALL_SQL = f"""
SELECT {TOP_K} AS k, count(*) AS n_overlap, round(count(*) / {TOP_K}, 6) AS recall
FROM ({_ANN_BRUTE_SQL}) b
WHERE b.vec_id IN (SELECT vec_id FROM ({_ANN_LSH_SQL}))
"""


# --- k-center greedy coreset (diversity-maximizing subset selection) --------

CORESET_K = 8  # selected coreset size (= unrolled rounds in the oracle)


def coreset_kcenter(spark: SparkSession, sf_dir: str, k: int = CORESET_K) -> DataFrame:
    """k-Center greedy coreset selection over the embedding table: pick the
    CORESET_K vectors that maximally COVER the embedding space — seed with
    the lowest vec_id, then repeatedly select the vector FARTHEST from every
    center chosen so far (its min-distance is the coverage radius at
    selection time). The classical 2-approximation to the k-center facility
    problem and the standard diversity-sampling / active-learning coreset
    primitive (Sener & Savarese, ICLR 2018): where SemDeDup removes the
    redundant tail, this selects the maximally-spread head — the seed set
    for labeling budgets, eval-set construction, or curriculum anchors.

    Spark-first iterative shape (the kmeans_lloyd contract): per-round state
    is the grown center matrix (≤ K×64, broadcast); each round is ONE Arrow
    GEMM pass computing min-d2 per vector (distances never shuffle) plus a
    top-1 TakeOrderedAndProject that CARRIES the winner's embedding — the
    next center comes out of the same collect, so each round is exactly one
    job (r6 verdict item 7 removed the per-pick full-table re-scan) — K
    bounded rounds total, the same model-state driver loop as Lloyd
    iterations / BPE merges. Engine-exact
    because center values and squared distances round to 6dp before the
    argmax and vec_id breaks ties (the ivf_assign float contract); the
    DuckDB oracle replays all K−1 rounds as unrolled CTEs."""
    import numpy as np

    from . import scoped_cache

    # r11: the K−1 greedy rounds each run a full pass over the vectors —
    # query-scope-cache the projection once so rounds read the pin, not
    # K−1 parquet decodes of the vector column.
    emb = scoped_cache(
        prepared(spark, sf_dir).table("embeddings").select("vec_id", "label", "embedding")
    )
    out_schema = "rank int, vec_id long, label int, radius double"
    seed = (
        emb.orderBy("vec_id").limit(1).select("vec_id", "label", "embedding").collect()
    )
    if not seed:
        return spark.createDataFrame([], out_schema)

    def _center(row) -> "np.ndarray":
        # centers enter the GEMM 6dp-rounded (the ivf_assign float contract —
        # the oracle's cen CTEs round the same way)
        return np.round(np.asarray(row["embedding"], dtype=np.float64), 6)

    picked = [(0, int(seed[0]["vec_id"]), int(seed[0]["label"]), 0.0)]
    centers = [_center(seed[0])]
    for rank in range(1, k):
        bc = spark.sparkContext.broadcast(np.vstack(centers))

        def kernel(batches):
            import numpy as _np
            import pandas as _pd

            cmat = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                M = _np.array(
                    [_np.asarray(x, dtype=_np.float64) for x in pdf["embedding"]]
                )
                d2 = _np.round(
                    ((M[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2), 6
                )
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "label": pdf["label"],
                        "mind2": d2.min(axis=1),
                        "embedding": pdf["embedding"],
                    }
                )

        top = (
            emb.select("vec_id", "label", "embedding")
            .mapInPandas(
                kernel,
                "vec_id long, label int, mind2 double, embedding array<double>",
            )
            .orderBy(F.desc("mind2"), "vec_id")
            .limit(1)
            .collect()
        )[0]
        picked.append((rank, int(top["vec_id"]), int(top["label"]), float(top["mind2"])))
        centers.append(_center(top))
    return spark.createDataFrame(picked, out_schema)


def _coreset_sql(k: int = CORESET_K) -> str:
    """Unrolled k-center greedy: cen_r accumulates the selected centers'
    6dp-rounded coordinates; each round joins v against cen_{r-1}, takes the
    per-vector min distance, and picks the (mind2 DESC, vec_id) argmax."""
    ctes = [
        """v AS (
  SELECT vec_id, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
)""",
        """p0 AS (
  SELECT 0 AS rank, vec_id, CAST(0.0 AS DOUBLE) AS radius FROM embeddings
  ORDER BY vec_id LIMIT 1
)""",
        """cen0 AS (
  SELECT dim, round(val, 6) AS cv FROM v JOIN p0 USING (vec_id)
)""",
    ]
    for r in range(1, k):
        ctes.append(
            f"""d{r} AS (
  SELECT v.vec_id, round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS d2
  FROM v JOIN cen{r - 1} c ON v.dim = c.dim GROUP BY v.vec_id
)"""
            if r == 1
            else f"""d{r} AS (
  SELECT vec_id, min(d2) AS d2 FROM (
    SELECT v.vec_id, c.rank,
           round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS d2
    FROM v JOIN cenall{r - 1} c ON v.dim = c.dim
    GROUP BY v.vec_id, c.rank
  ) GROUP BY vec_id
)"""
        )
        ctes.append(
            f"""p{r} AS (
  SELECT {r} AS rank, vec_id, d2 AS radius FROM d{r}
  ORDER BY d2 DESC, vec_id LIMIT 1
)"""
        )
        if r < k - 1:
            prev = (
                "SELECT 0 AS rank, dim, cv FROM cen0"
                if r == 1
                else f"SELECT rank, dim, cv FROM cenall{r - 1}"
            )
            ctes.append(
                f"""cenall{r} AS (
  {prev}
  UNION ALL
  SELECT {r} AS rank, dim, round(val, 6) AS cv FROM v JOIN p{r} USING (vec_id)
)"""
            )
    picks = " UNION ALL ".join(
        ["SELECT rank, vec_id, radius FROM p0"]
        + [f"SELECT rank, vec_id, radius FROM p{r}" for r in range(1, k)]
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
picks AS ({picks})
SELECT p.rank, p.vec_id, e.label, p.radius
FROM picks p JOIN embeddings e USING (vec_id)"""
    )


# --- hybrid_search: reciprocal-rank fusion of lexical + vector retrieval -----

HYBRID_POOL = 50  # per-retriever candidate list depth fed into the fusion
HYBRID_RRF_K = 60  # RRF damping constant (Cormack & Clarke & Buettcher 2009)
HYBRID_TOP_N = 10


def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword ranking
    (text.bm25_scored over `documents`) and the cosine vector ranking
    (around QUERY_VEC_ID over `embeddings`, joined on the shared id space —
    embeddings.vec_id keys the same corpus as documents.doc_id). Each
    retriever contributes its top-HYBRID_POOL list; a doc's fused score is
    sum(1 / (HYBRID_RRF_K + rank)) over the lists it appears in, the
    standard rank-based fusion that needs no score normalization across
    heterogeneous retrievers. Output ranks are 0 when a doc is absent from
    that retriever's pool.

    Scale shape: each side reduces to its pool via TakeOrderedAndProject
    (map-side partial top-k — no global sort ever materializes); the only
    windows and the full-outer fusion join run over <=2*HYBRID_POOL rows.
    Rank ties are impossible by construction (rank keys are (rounded score
    desc, id)), so the ranking — and therefore the fused score — is
    engine-deterministic."""
    from .text import bm25_scored

    w_lex = Window.orderBy(F.desc("bm25"), "doc_id")
    lex = (
        bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(HYBRID_POOL)
        .select("doc_id", F.row_number().over(w_lex).cast("long").alias("lex_rank"))
    )
    emb = prepared(spark, sf_dir).table("embeddings")
    q = _query_vec(emb)
    cos = F.round(
        _dot("embedding", "qv")
        / (F.sqrt(_dot("embedding", "embedding")) * F.col("qn")),
        6,
    )
    w_vec = Window.orderBy(F.desc("cosine"), "doc_id")
    vec = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(HYBRID_POOL)
        .select("doc_id", F.row_number().over(w_vec).cast("long").alias("vec_rank"))
    )
    fused = lex.join(vec, "doc_id", "full_outer")
    part = lambda r: F.when(  # noqa: E731
        F.col(r).isNotNull(), 1.0 / (F.lit(HYBRID_RRF_K) + F.col(r))
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            F.coalesce(F.col("lex_rank"), F.lit(0).cast("long")).alias("lex_rank"),
            F.coalesce(F.col("vec_rank"), F.lit(0).cast("long")).alias("vec_rank"),
            F.round(part("lex_rank") + part("vec_rank"), 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(HYBRID_TOP_N)
    )


def _hybrid_sql() -> str:
    from .text import _BM25_SCORED_CTES

    return f"""
WITH {_BM25_SCORED_CTES},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM (SELECT doc_id, bm25 FROM bm25_scored
        ORDER BY bm25 DESC, doc_id LIMIT {HYBRID_POOL})
),
qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
vec AS (
  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank
  FROM (SELECT vec_id AS doc_id, {_cos_sql('embedding', 'qv')} AS cosine
        FROM embeddings, qv WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, doc_id LIMIT {HYBRID_POOL})
)
SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       cast(coalesce(l.lex_rank, 0) AS BIGINT) AS lex_rank,
       cast(coalesce(v.vec_rank, 0) AS BIGINT) AS vec_rank,
       round(coalesce(1.0 / ({HYBRID_RRF_K} + l.lex_rank), 0.0)
             + coalesce(1.0 / ({HYBRID_RRF_K} + v.vec_rank), 0.0), 6) AS rrf_score
FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT {HYBRID_TOP_N}
"""


HARDNEG_TOP_N = 50
HARDNEG_BANDS = 8  # band 0 IS the lsh_buckets 8-plane layout; bands 1-7 extend it
HARDNEG_PROBES = 20  # recall-audit probe sample (vec_id < HARDNEG_PROBES)
HARDNEG_PROBE_K = 5  # exact cross-label neighbors audited per probe
# Hamming-radius-1 probe expansion within each band (the ann_lsh_topk
# multi-probe dial applied to pair mining): one side of the join posts its
# key plus every 1-bit flip, so pairs whose band keys differ by ≤1 bit
# still collide. 0 = the un-flipped key itself.
HARDNEG_FLIPS = [0] + [1 << j for j in range(N_PLANES)]


def _hardneg_keys(emb: DataFrame, band_bits: int = N_PLANES) -> DataFrame:
    """(vec_id, label, band, bkey) — HARDNEG_BANDS independent band_bits-bit
    sign-LSH band keys per vector, all HARDNEG_BANDS × band_bits plane dots
    computed in ONE Arrow-batched GEMM (the embedding_neardup kernel shape —
    vector math never enters Catalyst expression chains). NARROW on purpose:
    no embedding column rides the B× band fan-out or the 9× flip expansion
    downstream — consumers re-join the base table by vec_id for surviving
    pairs only (r8 probe lesson: carrying vectors through the fan-out made
    Spark mis-broadcast a multi-hundred-MB relation at 30× and OOM the
    driver). At the default band_bits = N_PLANES, band 0 uses planes
    0..N_PLANES-1, i.e. exactly the lsh_buckets/ann_lsh_topk bucket layout,
    so the multi-band candidate set is a strict superset of the
    single-bucket r7 miner's. band_bits is the SCALE dial (log2(n), the
    embedding_neardup doctrine): per-band bucket count 2^bits must track
    corpus size or Σ n_b² turns quadratic — measured in SCALING.md."""
    from .vector_lsh import planes_matrix

    P = planes_matrix(HARDNEG_BANDS * band_bits)
    n_bands = HARDNEG_BANDS

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        weights = 2 ** _np.arange(band_bits)
        for pdf in batches:
            if not len(pdf):
                continue
            M = _np.array([_np.asarray(v, dtype=_np.float64) for v in pdf["embedding"]])
            bits = (M @ P.T) > 0  # one GEMM per Arrow batch, all bands at once
            frames = []
            for b in range(n_bands):
                keys = bits[:, b * band_bits : (b + 1) * band_bits] @ weights
                frames.append(
                    _pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "label": pdf["label"],
                            "band": _np.full(len(pdf), b, dtype="int32"),
                            "bkey": keys.astype("int32"),
                        }
                    )
                )
            yield _pd.concat(frames, ignore_index=True)

    return emb.select("vec_id", "label", "embedding").mapInPandas(
        kernel, "vec_id long, label int, band int, bkey int"
    )


def hard_negative_mining(
    spark: SparkSession, sf_dir: str, band_bits: int = N_PLANES
) -> DataFrame:
    """Hard-negative pairs for contrastive/retriever training (the DPR /
    ANCE / SimCSE recipe): cross-LABEL vector pairs that collide in ANY of
    HARDNEG_BANDS sign-LSH band buckets, ranked by cosine — semantically
    confusable examples a random-negative sampler almost never draws, and
    exactly the negatives that sharpen an embedding model's decision
    boundary. Multi-band (r7 verdict item 7): the r7 miner used ONE band
    (the lsh_buckets bucket), so confusable pairs straddling a bucket
    boundary were invisible; with B independent bands and Hamming-radius-1
    probe expansion a pair at per-plane agreement p is caught with
    1-(1-(p^8 + 8·p^7·(1-p)))^B — the minhash_lsh_pairs banding
    amplification composed with ann_lsh_topk's multi-probe dial, sized from
    the measured corpus (exact cross-label neighbors sit at cosine
    0.26-0.48 → p ≈ 0.60-0.65, so plain 8-bit bands alone see only ~2% per
    band; hard_negative_recall is the committed measurement). Band 0 is
    still the exact lsh_buckets layout, so the candidate set strictly
    contains the r7 one.

    Scale shape: one scan computes all B×8 plane signs in one Arrow GEMM
    (mapInPandas, B NARROW (vec_id, label, band, key) rows per vector — no
    vector payload rides the fan-out); ONE side posts its key plus the 8
    one-bit flips (a further 9× fan-out of ~20-byte rows); the self-join is
    a hash EQUI-join on (band, flipped key) — candidate volume is
    Σ_band Σ_bucket (1+8)·n_b·(n_b−1)/2, bounded per band exactly as
    lsh_buckets audits, never all-pairs; a DISTINCT collapses pairs that
    collide in several bands/flips BEFORE any vector math, and only the
    surviving pair set re-joins the base embeddings table (twice, by
    vec_id) for the exact cosine — the embedding_neardup rejoin doctrine,
    which is also what keeps every relation in this plan either narrow or
    the base table (r8: carrying embeddings through the fan-out
    mis-broadcast at 30× and OOMed). TakeOrderedAndProject keeps top-N.
    Label skew doesn't concentrate because the join key is the band
    bucket, not the label. `band_bits` is the scale dial (log2 n — the
    registered query uses the default so the static oracle replays it; the
    scale probe measures the knob)."""
    emb = prepared(spark, sf_dir).table("embeddings")
    # cache-pin: the key relation feeds BOTH self-join sides, which shuffle
    # on different keys ((band, pkey) vs (band, bkey)) so no exchange reuse
    # applies — without the pin the all-bands GEMM and the embeddings scan
    # run twice (r8 self-review finding)
    keys = scoped_cache(_hardneg_keys(emb, band_bits))
    flips = [0] + [1 << j for j in range(band_bits)]
    probe = keys.withColumn(
        "f", F.explode(F.array(*[F.lit(f) for f in flips]))
    ).withColumn("pkey", F.col("bkey").bitwiseXOR(F.col("f")))
    a, c = probe.alias("a"), keys.alias("b")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.pkey") == F.col("b.bkey"))
            & (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.label") != F.col("b.label")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .distinct()
    )
    # per-vector norms hoisted out of the per-pair expression (r11): the old
    # form re-ran sqrt(dot(e,e)) for BOTH endpoints of every candidate pair —
    # ~470k pairs × 2 redundant 64-element folds at sf0.1 vs 2k rows once.
    # Same operands, same multiplication order (sqrt(a)·sqrt(b) → na·nb) →
    # bit-identical cosines. Interleaved A/B: 3.26→2.19 s median.
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.sqrt(_dot("embedding", "embedding")).alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.sqrt(_dot("embedding", "embedding")).alias("nb"),
    )
    cos = F.round(
        _dot("ea", "eb") / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", "label_a", "label_b", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
        .limit(HARDNEG_TOP_N)
    )


def _hardneg_keys_sql() -> str:
    """The NARROW keys relation in DuckDB: one UNION ALL branch per band,
    each band's 8-bit key from band_key_sql — the same planes (md5-derived
    ±1 literals) as the Spark GEMM by construction; no embedding column
    (consumers re-join embeddings by vec_id, mirroring the Spark plan)."""
    from .vector_lsh import band_key_sql

    branches = [
        f"SELECT vec_id, label, {b} AS band,"
        f" {band_key_sql('embedding', b, N_PLANES)} AS bkey FROM embeddings"
        for b in range(HARDNEG_BANDS)
    ]
    return "\nUNION ALL\n".join(branches)


_FLIPS_SQL = "[" + ", ".join(str(f) for f in HARDNEG_FLIPS) + "]"

_HARDNEG_SQL = f"""
WITH keys AS (
{_hardneg_keys_sql()}
),
probe AS (
  SELECT k.*, xor(k.bkey, f.f) AS pkey
  FROM keys k, (SELECT unnest({_FLIPS_SQL}) AS f) f
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b,
         a.label AS label_a, c.label AS label_b
  FROM probe a JOIN keys c
    ON a.band = c.band AND a.pkey = c.bkey
   AND a.vec_id < c.vec_id AND a.label <> c.label
)
SELECT vec_a, vec_b, label_a, label_b,
       {_cos_sql('ea.embedding', 'eb.embedding')} AS cosine
FROM cand
JOIN embeddings ea ON ea.vec_id = cand.vec_a
JOIN embeddings eb ON eb.vec_id = cand.vec_b
ORDER BY cosine DESC, vec_a, vec_b
LIMIT {HARDNEG_TOP_N}
"""


def hard_negative_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the multi-band hard-negative candidate generator at
    the pairs that matter most (r7 verdict item 7, the ann_recall_audit
    pattern): for each of HARDNEG_PROBES probe vectors, the exact top
    HARDNEG_PROBE_K cross-label neighbors by brute-force cosine (probe-side
    broadcast — S×n work, S constant: the audit costs one scan, never an
    all-pairs join), checked for membership in the candidate set the miner
    actually searches (collision in ANY band at Hamming radius ≤ 1 — the
    same keys + flips expansion). Output: one row per probe with its
    exact-neighbor count, how many of those the band index can see, and
    the recall fraction — the measured number that justifies (or indicts)
    the HARDNEG_BANDS × flip-probe configuration before the miner replaces
    exhaustive negative mining at scale."""
    emb = prepared(spark, sf_dir).table("embeddings")
    probes = emb.filter(F.col("vec_id") < HARDNEG_PROBES).select(
        F.col("vec_id").alias("p_id"),
        F.col("label").alias("p_label"),
        F.col("embedding").alias("p_emb"),
        F.sqrt(_dot("embedding", "embedding")).alias("pn"),
    )
    # both norms hoisted (r11): dot(e,e) was re-run S times per corpus vector
    # and dot(p,p) n times per probe; now once per row on each side. Same
    # multiplication order → bit-identical cosines.
    embn = emb.withColumn("en", F.sqrt(_dot("embedding", "embedding")))
    cos = F.round(
        _dot("embedding", "p_emb") / (F.col("en") * F.col("pn")),
        6,
    )
    scored = (
        embn.crossJoin(F.broadcast(probes))
        .filter((F.col("vec_id") != F.col("p_id")) & (F.col("label") != F.col("p_label")))
        .select("p_id", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("p_id").orderBy(F.desc("cosine"), "vec_id")
    # exact feeds TWO subtrees (the hit semi-join and the per-probe groupBy)
    # but deliberately carries NO cache pin: both occurrences compile to
    # identical exchange subtrees, so Catalyst's ReuseExchange rule already
    # dedupes the brute-force scan — measured: pinning it made the query
    # 1.33 → 2.38 s at sf0.1 (cache materialization latency for zero saved
    # work). The r8 self-review flagged this as a double computation; the
    # measurement says otherwise.
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARDNEG_PROBE_K)
        .select("p_id", "vec_id")
    )
    keys = scoped_cache(_hardneg_keys(emb).select("vec_id", "band", "bkey"))
    probe_keys = (
        keys.filter(F.col("vec_id") < HARDNEG_PROBES)
        .withColumn("f", F.explode(F.array(*[F.lit(f) for f in HARDNEG_FLIPS])))
        .select(
            F.col("vec_id").alias("p_id"),
            "band",
            F.col("bkey").bitwiseXOR(F.col("f")).alias("bkey"),
        )
    )
    cand = (
        probe_keys.join(keys, ["band", "bkey"])
        .filter(F.col("vec_id") != F.col("p_id"))
        .select("p_id", "vec_id")
        .distinct()
    )
    hit = exact.join(cand, ["p_id", "vec_id"], "left_semi")
    return (
        exact.groupBy("p_id")
        .agg(F.count("*").alias("n_exact"))
        .join(hit.groupBy("p_id").agg(F.count("*").alias("n_hit")), "p_id", "left")
        .select(
            "p_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_exact"), 6
            ).alias("recall"),
        )
        .orderBy("p_id")
    )


_HARDNEG_RECALL_SQL = f"""
WITH probes AS (
  SELECT vec_id AS p_id, label AS p_label, embedding AS p_emb
  FROM embeddings WHERE vec_id < {HARDNEG_PROBES}
),
scored AS (
  SELECT p.p_id, e.vec_id, {_cos_sql('e.embedding', 'p.p_emb')} AS cosine
  FROM embeddings e, probes p
  WHERE e.vec_id <> p.p_id AND e.label <> p.p_label
),
exact AS (
  SELECT p_id, vec_id FROM (
    SELECT p_id, vec_id,
           row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, vec_id) AS rn
    FROM scored)
  WHERE rn <= {HARDNEG_PROBE_K}
),
keys AS (
{_hardneg_keys_sql()}
),
cand AS (
  SELECT DISTINCT a.vec_id AS p_id, c.vec_id
  FROM keys a, (SELECT unnest({_FLIPS_SQL}) AS f) f, keys c
  WHERE a.band = c.band AND xor(a.bkey, f.f) = c.bkey
    AND a.vec_id < {HARDNEG_PROBES} AND c.vec_id <> a.vec_id
)
SELECT e.p_id, count(*) AS n_exact,
       count(c.vec_id) AS n_hit,
       round(count(c.vec_id) / count(*), 6) AS recall
FROM exact e LEFT JOIN cand c ON c.p_id = e.p_id AND c.vec_id = e.vec_id
GROUP BY e.p_id
ORDER BY e.p_id
"""


# --- ann_topk_batch: the batch-serving shape ---------------------------------

N_BATCH_Q = 8  # probe queries per batch (lowest md5(vec_id) — hash spread)


def ann_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors in one pass — the
    shape a real ANN serving/audit job has (requests arrive in batches;
    recall audits sample probe sets), where every other ANN operator here is
    single-query. The probe set is the N_BATCH_Q vectors with the lowest
    md5(vec_id) (the hash-spread sample the r9 PQ init uses — deterministic,
    engine-portable, uncorrelated with vec_id order).

    Plan shape: the 8-row (qid, qv) relation broadcasts against the corpus
    (BroadcastNestedLoopJoin with a constant-bounded side — the audited
    pack_ann pattern, never a shuffle cartesian); cosine is the shared
    sequential-fold `_dot` so DuckDB replays it bitwise; per-query top-k is
    one window partitioned by qid. At 100 TB the window sorts n rows per
    query — brute force IS the audit yardstick (ann_recall_audit's role);
    a production batch query composes the same 8-row broadcast with the
    LSH/IVF candidate restriction (ann_lsh_topk / ivf_pq_search) so each
    query's window sees only its candidate set. Determinism: cosine rounds
    6dp, ties break by vec_id, self-match excluded."""
    emb = prepared(spark, sf_dir).table("embeddings")
    qs = (
        emb.select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.sqrt(_dot("embedding", "embedding")).alias("qn"),
        )
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(N_BATCH_Q)
    )
    # both norms hoisted (r11): dot(e,e) was re-run once per (vector, query)
    # row — N_BATCH_Q× per corpus vector; qn rode the same redundancy the
    # other way. Same multiplication order → bit-identical cosines.
    embn = emb.withColumn("en", F.sqrt(_dot("embedding", "embedding")))
    cos = F.round(
        _dot("embedding", "qv") / (F.col("en") * F.col("qn")),
        6,
    )
    scored = (
        embn.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("qid", "rank")
    )


_ANN_BATCH_SQL = f"""
WITH qs AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {N_BATCH_Q}
),
scored AS (
  SELECT q.qid, e.vec_id,
         {_cos_sql('e.embedding', 'q.qv')} AS cosine
  FROM embeddings e, qs q
  WHERE e.vec_id <> q.qid
)
SELECT qid, vec_id, cosine, cast(rn AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
ORDER BY qid, rank
"""


def ann_topk_batch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_topk_batch through the LSH index — the PRODUCTION batch path the
    brute-force batch audits. Same 8-query hash-spread probe set; per query,
    candidates are restricted to sign-LSH buckets within Hamming distance
    PROBE_RADIUS of that query's bucket (ann_lsh_topk's multi-probe dial,
    applied per batch member), exact cosine only on candidates, top-k per
    query. May return fewer than TOP_K rows for a query whose probed buckets
    are sparse — that is the recall/latency trade the radius sets, audited
    against the exact batch in tests.

    Plan shape: ONE bucket projection over the corpus (whole-stage codegen),
    one broadcast of the 8-row (qid, qv, qbucket) relation, the Hamming
    filter prunes before any cosine is computed, and the per-qid window
    sorts only candidates (37/256 of the space at radius 2) — at production
    scale the corpus is written bucket-partitioned and the probe set is a
    partition-pruning predicate per query, so a batch reads the union of
    the probed partitions once."""
    emb = prepared(spark, sf_dir).table("embeddings")
    bucketed = emb.withColumn("bucket", _bucket_spark("embedding"))
    qs = (
        bucketed.select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("bucket").alias("qbucket"),
            F.sqrt(_dot("embedding", "embedding")).alias("qn"),
        )
        .orderBy(F.md5(F.col("qid").cast("string")), "qid")
        .limit(N_BATCH_Q)
    )
    # norms hoisted (r11) — see ann_topk_batch; bit-identical cosines
    embn = bucketed.withColumn("en", F.sqrt(_dot("embedding", "embedding")))
    cos = F.round(
        _dot("embedding", "qv") / (F.col("en") * F.col("qn")),
        6,
    )
    scored = (
        embn.crossJoin(F.broadcast(qs))
        .filter(
            (
                F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket")))
                <= PROBE_RADIUS
            )
            & (F.col("vec_id") != F.col("qid"))
        )
        .select("qid", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("qid", "rank")
    )


_ANN_BATCH_LSH_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
qs AS (
  SELECT vec_id AS qid, embedding AS qv, bucket AS qbucket FROM b
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {N_BATCH_Q}
),
scored AS (
  SELECT q.qid, e.vec_id,
         {_cos_sql('e.embedding', 'q.qv')} AS cosine
  FROM b e, qs q
  WHERE bit_count(xor(e.bucket, q.qbucket)) <= {PROBE_RADIUS}
    AND e.vec_id <> q.qid
)
SELECT qid, vec_id, cosine, cast(rn AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
ORDER BY qid, rank
"""


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_batch": ann_topk_batch,
    "ann_topk_batch_lsh": ann_topk_batch_lsh,
    "ivf_cell_balance": ivf_cell_balance,
    "ann_recall_audit": ann_recall_audit,
    "label_centroids": label_centroids,
    "ivf_assign": ivf_assign,
    "embedding_outliers": embedding_outliers,
    "lsh_buckets": lsh_buckets,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_project": embedding_project,
    "kmeans_lloyd": kmeans_lloyd,
    "semantic_dedup": semantic_dedup,
    "coreset_kcenter": coreset_kcenter,
    "hybrid_search": hybrid_search,
    "label_margin_audit": label_margin_audit,
    "hard_negative_mining": hard_negative_mining,
    "hard_negative_recall": hard_negative_recall,
}

_IVF_ASSIGN_SQL = f"""
WITH cent AS ({_CENTROIDS_SQL}),
vecs AS (
  SELECT vec_id, label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
),
d AS (
  SELECT v.vec_id, v.label, c.label AS clabel,
         round(sum((v.v - c.centroid_v) * (v.v - c.centroid_v)), 6) AS d2
  FROM vecs v JOIN cent c ON c.dim = v.dim
  GROUP BY v.vec_id, v.label, c.label
),
r AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM d
)
SELECT vec_id, label, clabel AS assigned FROM r WHERE rn = 1
"""

ORACLES = {
    "ann_topk_bruteforce": _ANN_BRUTE_SQL,
    "ann_topk_batch": _ANN_BATCH_SQL,
    "ann_topk_batch_lsh": _ANN_BATCH_LSH_SQL,
    "ivf_cell_balance": _IVF_CELL_BALANCE_SQL,
    "ann_recall_audit": _ANN_RECALL_SQL,
    "label_centroids": _CENTROIDS_SQL,
    "ivf_assign": _IVF_ASSIGN_SQL,
    "embedding_outliers": _EMBEDDING_OUTLIERS_SQL,
    "lsh_buckets": _LSH_BUCKETS_SQL,
    "ann_lsh_topk": _ANN_LSH_SQL,
    "embedding_project": _rp_sql(),
    "kmeans_lloyd": _KMEANS_SQL,
    "semantic_dedup": _semantic_dedup_sql(),
    "coreset_kcenter": _coreset_sql(),
    "hybrid_search": _hybrid_sql(),
    "label_margin_audit": _LABEL_MARGIN_SQL,
    "hard_negative_mining": _HARDNEG_SQL,
    "hard_negative_recall": _HARDNEG_RECALL_SQL,
}
