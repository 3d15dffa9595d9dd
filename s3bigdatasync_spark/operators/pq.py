"""Product quantization — the compressed-index ANN path for corpus-scale
embedding search.

IVF (`similarity.label_centroids`/`ivf_assign`) prunes which vectors a query
scans; PQ compresses what each vector costs to scan: the 64-dim float vector
(256 B) becomes M one-byte codes, and query-time distance is a table
lookup instead of a 64-term float op (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011). Together they are the standard
IVF-PQ layout every billion-vector store ships.

Two operators:

  pq_encode — train per-subspace codebooks (K=32 centroids over each 2-dim
      slice; deterministic hash-spread init + LLOYD_ROUNDS Lloyd updates —
      the `kmeans_lloyd` contract applied per subspace) and emit every
      vector's (subspace, code) assignment.
  pq_search — asymmetric-distance (ADC) top-10 for QUERY_VEC_ID: the query's
      1024-entry (subspace × centroid) distance table is broadcast and joined
      against the codes; per-vector ADC distance is one 32-row sum.

Quantizer configuration (retrained round 9 — the `ivf_nprobe_curve` finding
that the r8 M=8/K=16/one-round/first-K quantizer saturated recall at 0.30):
M=32 two-dim subspaces × K=32 centroids, init = the PQ_K vectors with the
lowest md5(vec_id) (a deterministic uniform spread — first-K ids were
correlated testdata neighbors), LLOYD_ROUNDS=3 full updates. Measured at
sf0.01 against exact L2 (25-query probe panel): recall@10 mean 0.68
(was 0.30), no panel query below 0.4. The memory trade is explicit: 32
one-byte codes = 8× compression vs the float vector (a production layout
packs the 5-bit codes → 12.8×), vs 32× for the old M=8 codebook that
couldn't rank neighbors.

Scale story: training state is a 32×64 centroid matrix (driver-held and
broadcast, the same legitimate K×D state every distributed k-means ships);
encoding is one Arrow-batched GEMM pass (mapInPandas, no shuffle); each
Lloyd update shuffles only per-batch partial sums (≤ K×DIM rows per Arrow
batch — constant-size, never data-size; see _assign_partials), so training
costs LLOYD_ROUNDS bounded-shuffle passes. Search never touches the float
vectors: one broadcast hash join (1024-row table) + one groupBy(vec_id)
partial-agg sum + TakeOrderedAndProject — at 100 TB the codes table is
~8× smaller than the vectors it stands for.

Cross-engine determinism (the ivf_assign/kmeans_lloyd contract): centroids
round to 6dp, squared distances round to 6dp before argmin, ties break by
ascending centroid id, ADC sums round to 6dp, ranking ties break by vec_id.
The DuckDB oracle replays training + encoding + search from the same literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prepared, scoped_cache
from .similarity import QUERY_VEC_ID

DIM = 64
M_SUB = 32  # subspaces
SUBDIM = DIM // M_SUB  # dims per subspace
PQ_K = 32  # centroids per subspace codebook
LLOYD_ROUNDS = 3  # full Lloyd updates after the spread init
PQ_TOP_K = 10


def _collect_codebook(c_df, k: int) -> "object":
    """(k, DIM) matrix from long-form (cid, dim, cv) rows — the driver-held
    training state (≤PQ_K×64 doubles; every distributed k-means ships this).
    k may be < PQ_K when the corpus has fewer vectors than centroids."""
    import numpy as np

    C = np.full((k, DIM), np.nan)
    for r in c_df.collect():
        C[r["cid"], r["dim"]] = r["cv"]
    return C


def _assign_codes(emb: DataFrame, spark: SparkSession, C) -> DataFrame:
    """One Arrow-batched pass: per subspace, 6dp-rounded squared distance to
    each centroid slice, argmin with ties to the lowest cid."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    bc = spark.sparkContext.broadcast(C)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("sub", IntegerType()),
            StructField("code", IntegerType()),
            StructField("d2", DoubleType()),
        ]
    )

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        Cm = bc.value.reshape(len(bc.value), M_SUB, SUBDIM)  # (K, M, subdim)
        for pdf in batches:
            if not len(pdf):
                continue
            Mx = _np.array(
                [_np.asarray(x, dtype=_np.float64) for x in pdf["embedding"]]
            ).reshape(len(pdf), M_SUB, SUBDIM)
            # (n, K, M): squared distance of each subvector to each centroid slice
            d2 = _np.round(
                ((Mx[:, None, :, :] - Cm[None, :, :, :]) ** 2).sum(axis=3), 6
            )
            codes = d2.argmin(axis=1)  # (n, M); first min → lowest cid wins ties
            n = len(pdf)
            rows = _np.arange(n)[:, None], codes, _np.tile(_np.arange(M_SUB), (n, 1))
            yield _pd.DataFrame(
                {
                    "vec_id": _np.repeat(pdf["vec_id"].to_numpy(), M_SUB),
                    "sub": _np.tile(_np.arange(M_SUB, dtype="int32"), n),
                    "code": codes.astype("int32").reshape(-1),
                    "d2": d2[rows[0], rows[1], rows[2]].reshape(-1),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(kernel, schema)


def _assign_partials(emb: DataFrame, spark: SparkSession, C) -> DataFrame:
    """Map-side-combined Lloyd update: the same assign kernel, but instead of
    emitting one row per (vec_id, sub) it emits per-batch partial sums
    (cid, dim, s, n) — ≤ K×DIM rows per Arrow batch regardless of batch size.
    The update shuffle moves O(batches × K × DIM) rows instead of joining the
    n×DIM exploded vectors against the n×M assignment (the r3–r6 plan), which
    is the difference between a constant-size and a data-size shuffle at
    100 TB. avg = sum(s)/sum(n) rounded to 6dp, identical math to the old
    F.avg (Spark's Average is also sum/count); the 6dp round absorbs
    partial-order differences exactly as it already did cross-engine."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    bc = spark.sparkContext.broadcast(C)
    schema = StructType(
        [
            StructField("cid", IntegerType()),
            StructField("dim", IntegerType()),
            StructField("s", DoubleType()),
            StructField("n", LongType()),
        ]
    )

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        k_eff = len(bc.value)
        Cm = bc.value.reshape(k_eff, M_SUB, SUBDIM)
        for pdf in batches:
            if not len(pdf):
                continue
            Mx = _np.array(
                [_np.asarray(x, dtype=_np.float64) for x in pdf["embedding"]]
            ).reshape(len(pdf), M_SUB, SUBDIM)
            d2 = _np.round(
                ((Mx[:, None, :, :] - Cm[None, :, :, :]) ** 2).sum(axis=3), 6
            )
            codes = d2.argmin(axis=1)  # (n, M)
            out_cid, out_dim, out_s, out_n = [], [], [], []
            for m in range(M_SUB):
                cm = codes[:, m]
                for k in range(k_eff):
                    mask = cm == k
                    nk = int(mask.sum())
                    if not nk:
                        continue
                    s = Mx[mask, m, :].sum(axis=0)
                    for d in range(SUBDIM):
                        out_cid.append(k)
                        out_dim.append(m * SUBDIM + d)
                        out_s.append(float(s[d]))
                        out_n.append(nk)
            yield _pd.DataFrame(
                {
                    "cid": _np.array(out_cid, dtype="int32"),
                    "dim": _np.array(out_dim, dtype="int32"),
                    "s": out_s,
                    "n": _np.array(out_n, dtype="int64"),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(kernel, schema)


def _train_codebook(
    spark: SparkSession, emb: DataFrame, return_query: bool = False
):
    """Deterministic hash-spread init + LLOYD_ROUNDS Lloyd updates per
    subspace. Returns the (PQ_K, DIM) rounded codebook, or None if empty.

    Init = the PQ_K vectors with the lowest md5(vec_id) hex digest (ties by
    vec_id), cids assigned by ascending vec_id among the chosen — a
    deterministic uniform sample both engines compute identically (the r8
    first-K init seeded the codebook with correlated neighbors and capped
    recall at 0.30; md5 ordering is the portable stand-in for k-means++'s
    random spread). One TakeOrdered collect fetches the init rows with BOTH
    the raw embedding and the Spark-side 6dp-rounded slices (rounding stays
    in the engine so the init codebook matches the oracle's round(val, 6));
    with return_query=True the query vector rides along in the same job when
    QUERY_VEC_ID is among the init ids, sparing the callers' separate
    filter-collect.

    Each Lloyd round: one _assign_partials pass (constant-size shuffle) +
    a ≤K×DIM-row collect; a centroid that lost every vector in some
    subspace keeps its previous-round slice (the oracle's coalesce).

    r11: the projected (vec_id, embedding) relation is query-scope-cached —
    the init TakeOrdered plus every Lloyd round re-scanned the parquet
    vectors (1 + LLOYD_ROUNDS passes), and the callers' encode/search pass
    hits the same cached plan via the CacheManager's analyzed-plan match,
    so each PQ query decodes the vector column once."""
    import numpy as np

    from . import scoped_cache

    emb = scoped_cache(emb.select("vec_id", "embedding"))
    head = (
        emb.select(
            "vec_id",
            "embedding",
            F.expr("transform(embedding, x -> round(cast(x AS double), 6))").alias(
                "emb6"
            ),
        )
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(PQ_K)
        .collect()
    )
    if not head:
        return (None, None) if return_query else None
    head = sorted(head, key=lambda r: r["vec_id"])  # cid = rank by vec_id
    C = np.array([list(r["emb6"]) for r in head], dtype=np.float64)
    for _ in range(LLOYD_ROUNDS):
        upd = (
            _assign_partials(emb, spark, C)
            .groupBy("cid", "dim")
            .agg(F.round(F.sum("s") / F.sum("n"), 6).alias("cv"))
        )
        Cn = _collect_codebook(upd, len(head))
        mask = np.isnan(Cn)
        Cn[mask] = C[mask]
        C = Cn
    if return_query:
        qrow = next((r for r in head if r["vec_id"] == QUERY_VEC_ID), None)
        qvec = (
            np.asarray(qrow["embedding"], dtype=np.float64)
            if qrow is not None
            else None
        )
        return C, qvec
    return C


def _codebook_for(spark: SparkSession, sf_dir: str, emb: DataFrame):
    """Query-scoped memo of the trained (codebook, query-vector) pair: a
    pack running several PQ-family members (pack_ann: encode + search +
    ivf_pq; pack_r8: the recall audit + the distortion spectrum) trains
    ONCE per registry query instead of once per member — the _winnow_runs
    sharing precedent applied to driver-held model state. The training is
    deterministic, so a memo miss (standalone member runs) changes nothing
    but the job count."""
    from . import scoped_memo

    return scoped_memo(
        ("pq_codebook", sf_dir),
        lambda: _train_codebook(spark, emb, return_query=True),
    )


def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the per-subspace codebooks and encode every vector: one row per
    (vec_id, subspace) with the assigned centroid code and its 6dp-rounded
    squared reconstruction distance."""
    emb = prepared(spark, sf_dir).table("embeddings")
    C, _ = _codebook_for(spark, sf_dir, emb)
    if C is None:
        return spark.createDataFrame([], "vec_id long, sub int, code int, d2 double")
    return _assign_codes(emb, spark, C)


def pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 for QUERY_VEC_ID over the PQ codes: the query's
    (subspace × centroid) distance table — M_SUB×PQ_K doubles, computed driver-side
    from the same broadcast codebook — joins the codes table (broadcast hash
    join), and per-vector ADC distance is sum(dq) over the M_SUB subspaces."""
    import numpy as np

    emb = prepared(spark, sf_dir).table("embeddings")
    C, qvec = _codebook_for(spark, sf_dir, emb)
    if C is None:
        return spark.createDataFrame([], "vec_id long, adc_d2 double, rank int")
    if qvec is None:  # QUERY_VEC_ID not among the init ids — fetch it alone
        q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect()
        if not q:
            return spark.createDataFrame([], "vec_id long, adc_d2 double, rank int")
        qvec = np.asarray(q[0]["embedding"], dtype=np.float64)
    qv = qvec.reshape(M_SUB, SUBDIM)
    k_eff = len(C)
    Cm = C.reshape(k_eff, M_SUB, SUBDIM)
    # (M, K) query→centroid-slice distance table
    dq = np.round(((qv[None, :, :] - Cm) ** 2).sum(axis=2).T, 6)
    dq_rows = [
        (m, k, float(dq[m, k])) for m in range(M_SUB) for k in range(k_eff)
    ]
    dq_df = spark.createDataFrame(dq_rows, "sub int, code int, dq double")

    codes = _assign_codes(emb, spark, C).filter(F.col("vec_id") != QUERY_VEC_ID)
    adc = (
        codes.join(F.broadcast(dq_df), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("dq"), 6).alias("adc_d2"))
    )
    w = adc.orderBy("adc_d2", "vec_id").limit(PQ_TOP_K)
    from pyspark.sql import Window

    return w.withColumn(
        "rank",
        F.row_number().over(Window.orderBy("adc_d2", "vec_id")).cast("int"),
    )


# --- DuckDB oracles ---------------------------------------------------------
# Replays training (spread init → LLOYD_ROUNDS × (assign → update)),
# encoding, and ADC search with the same 6dp-round-before-argmin /
# lowest-cid tie-break contract. Multiply-referenced CTEs are AS
# MATERIALIZED — DuckDB inlines plain CTEs, so without it each of the
# 2+LLOYD_ROUNDS references to `v` (and each arm's reference to `enc`)
# would re-explode the vectors.


def _pq_train_ctes() -> str:
    """Generate the training replay: c0 = spread init, then per round r
    d{r} (distances vs c{r-1}) → a{r} (argmin) → c{r}_upd (means) → c{r}
    (coalesce: empty slices keep the previous round's value), then enc
    (final encode vs c{LLOYD_ROUNDS})."""
    parts = [
        f"""v AS MATERIALIZED (
  SELECT vec_id, u.i - 1 AS dim, (u.i - 1) // {SUBDIM} AS sub,
         embedding[u.i]::DOUBLE AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
),
init_ids AS (
  SELECT vec_id, cast(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM (SELECT vec_id FROM embeddings
        ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {PQ_K})
),
c0 AS MATERIALIZED (
  SELECT cid, dim, dim // {SUBDIM} AS sub, round(val, 6) AS cv
  FROM v JOIN init_ids USING (vec_id)
)"""
    ]
    for r in range(1, LLOYD_ROUNDS + 1):
        parts.append(
            f"""d{r} AS (
  SELECT v.vec_id, v.sub, c.cid,
         round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS d2
  FROM v JOIN c{r - 1} c ON v.dim = c.dim
  GROUP BY v.vec_id, v.sub, c.cid
),
a{r} AS (
  SELECT vec_id, sub, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
    FROM d{r}
  ) WHERE rn = 1
),
c{r}_upd AS (
  SELECT a{r}.cid, v.dim, round(avg(v.val), 6) AS cv
  FROM v JOIN a{r} ON v.vec_id = a{r}.vec_id AND v.sub = a{r}.sub
  GROUP BY a{r}.cid, v.dim
),
c{r} AS MATERIALIZED (
  SELECT p.cid, p.dim, p.sub, coalesce(u.cv, p.cv) AS cv
  FROM c{r - 1} p LEFT JOIN c{r}_upd u ON p.cid = u.cid AND p.dim = u.dim
)"""
        )
    parts.append(
        f"""d_enc AS (
  SELECT v.vec_id, v.sub, c.cid,
         round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS d2
  FROM v JOIN {_CFIN} c ON v.dim = c.dim
  GROUP BY v.vec_id, v.sub, c.cid
),
enc AS MATERIALIZED (
  SELECT vec_id, sub, cid AS code, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
    FROM d_enc
  ) WHERE rn = 1
)"""
    )
    return ",\n".join(parts)


_CFIN = f"c{LLOYD_ROUNDS}"  # the trained codebook's CTE name
_PQ_TRAIN_CTES = _pq_train_ctes()

_PQ_ENCODE_SQL = (
    "WITH "
    + _PQ_TRAIN_CTES
    + "\nSELECT vec_id, cast(sub AS INT) AS sub, cast(code AS INT) AS code, d2 FROM enc"
)

_PQ_SEARCH_SQL = (
    "WITH "
    + _PQ_TRAIN_CTES
    + f""",
qd AS (
  SELECT v.sub, c.cid AS code,
         round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS dq
  FROM v JOIN {_CFIN} c ON v.dim = c.dim
  WHERE v.vec_id = {QUERY_VEC_ID}
  GROUP BY v.sub, c.cid
),
adc AS (
  SELECT e.vec_id, round(sum(qd.dq), 6) AS adc_d2
  FROM enc e JOIN qd ON qd.sub = e.sub AND qd.code = e.code
  WHERE e.vec_id <> {QUERY_VEC_ID}
  GROUP BY e.vec_id
)
SELECT vec_id, adc_d2,
       cast(row_number() OVER (ORDER BY adc_d2, vec_id) AS INT) AS rank
FROM adc
ORDER BY adc_d2, vec_id
LIMIT {PQ_TOP_K}"""
)

# --- IVF-PQ: coarse cells prune, codes compress -----------------------------

IVF_NPROBE = 2  # cells searched per query


def ivf_pq_search(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """The composed billion-vector layout: IVF cells decide WHICH vectors a
    query touches (nprobe nearest label-centroids), PQ codes decide what each
    touched vector COSTS (an M_SUB-byte ADC lookup). The semantics are exactly
    `ivf_assign` and `pq_search`'s machinery composed (tests pin equality to
    that composition), but the plan fuses them: one mapInPandas pass assigns
    the cell and encodes only vectors in probed cells — no vector shuffle, no
    assignment/codes join. At production scale the codes table is written
    partitioned by IVF cell, so this same restriction is partition pruning
    and a query reads nprobe/K of an already-8×-compressed table.

    Determinism: probe cells are chosen by the ivf_assign contract (6dp-round
    d2 before ranking, ties by ascending label); candidate ADC follows the
    pq_search contract; final ranking ties break by vec_id."""
    parts = _ivf_probe_and_codes(spark, sf_dir, nprobe)
    if parts is None:
        return spark.createDataFrame(
            [], "vec_id long, cell int, adc_d2 double, rank int"
        )
    _probe, dq_df, codes = parts
    return _ivf_adc_rank(codes, dq_df)


def _ivf_probe_and_codes(spark: SparkSession, sf_dir: str, nprobe: int):
    """The nprobe-dependent half of ivf_pq_search, factored out (r11) so
    ivf_nprobe_curve can run the fused assign+encode pass ONCE at the widest
    sweep point and derive the narrower arms by filtering: the fused kernel
    assigns every vector against ALL centroids and keeps those whose nearest
    cell is in the probe set, so `codes(probe_k) == codes(probe_max).filter
    (cell ∈ probe_k)` exactly — probe sets are prefixes of one deterministic
    centroid ordering. Returns (probe, dq_df, codes) or None when the corpus
    is empty / the query vector is missing."""
    import numpy as np

    emb = prepared(spark, sf_dir).table("embeddings")
    C, qvec = _codebook_for(spark, sf_dir, emb)
    if C is None:
        return None
    if qvec is None:  # QUERY_VEC_ID not among the init ids — fetch it alone
        q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect()
        if not q:
            return None
        qvec = np.asarray(q[0]["embedding"], dtype=np.float64)

    # probe cells: nprobe nearest IVF centroids to the query (driver-side —
    # the centroid table is the same tiny K×D state ivf_assign broadcasts)
    from .similarity import _centroids_pdf

    cents = _centroids_pdf(spark, sf_dir)
    labels = sorted(cents["label"].unique())
    dim = int(cents["dim"].max()) + 1
    Civf = np.zeros((len(labels), dim))
    for li, lab in enumerate(labels):
        sub = cents[cents["label"] == lab].sort_values("dim")
        Civf[li] = sub["centroid_v"].to_numpy()
    d2 = np.round(((qvec[None, :] - Civf) ** 2).sum(axis=1), 6)
    order = sorted(range(len(labels)), key=lambda i: (d2[i], labels[i]))
    probe = [int(labels[i]) for i in order[:nprobe]]

    # Fused assign+encode: ONE pass over the vectors computes the IVF cell
    # (ivf_assign contract: 6dp-round d2, argmin over ascending labels) and,
    # for vectors landing in a probed cell, the PQ codes (_assign_codes
    # contract). This is exactly what the partitioned-by-cell production
    # layout gives for free — the query never shuffles or re-joins the
    # vectors, it just skips cells outside nprobe. Emits (vec_id, cell, sub,
    # code) for candidates only; results identical to composing ivf_assign
    # and _assign_codes then joining (tests pin equality to that composition
    # and to the DuckDB replay of it).
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    k_eff = len(C)
    Cm = C.reshape(k_eff, M_SUB, SUBDIM)
    qsub = qvec.reshape(M_SUB, SUBDIM)
    dq = np.round(((qsub[None, :, :] - Cm) ** 2).sum(axis=2).T, 6)
    dq_df = spark.createDataFrame(
        [(m, k, float(dq[m, k])) for m in range(M_SUB) for k in range(k_eff)],
        "sub int, code int, dq double",
    )
    bc = spark.sparkContext.broadcast(
        (np.array(labels), Civf, C, frozenset(probe))
    )
    fused_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cell", IntegerType()),
            StructField("sub", IntegerType()),
            StructField("code", IntegerType()),
        ]
    )

    def fused(batches):
        import numpy as _np
        import pandas as _pd

        labs, civf, cpq, probe_set = bc.value
        cm = cpq.reshape(len(cpq), M_SUB, SUBDIM)
        probe_mask = _np.isin(labs, list(probe_set))
        for pdf in batches:
            if not len(pdf):
                continue
            Mfull = _np.array(
                [_np.asarray(v, dtype=_np.float64) for v in pdf["embedding"]]
            )
            dcell = _np.round(
                ((Mfull[:, None, :] - civf[None, :, :]) ** 2).sum(axis=2), 6
            )
            nearest_idx = dcell.argmin(axis=1)  # first min → lowest label
            keep = probe_mask[nearest_idx] & (
                pdf["vec_id"].to_numpy() != QUERY_VEC_ID
            )
            if not keep.any():
                continue
            Mx = Mfull[keep].reshape(-1, M_SUB, SUBDIM)
            cells = labs[nearest_idx[keep]]
            vids = pdf["vec_id"].to_numpy()[keep]
            dpq = _np.round(
                ((Mx[:, None, :, :] - cm[None, :, :, :]) ** 2).sum(axis=3), 6
            )
            codes = dpq.argmin(axis=1)  # (n, M)
            n = len(vids)
            yield _pd.DataFrame(
                {
                    "vec_id": _np.repeat(vids, M_SUB),
                    "cell": _np.repeat(cells.astype("int32"), M_SUB),
                    "sub": _np.tile(_np.arange(M_SUB, dtype="int32"), n),
                    "code": codes.astype("int32").reshape(-1),
                }
            )

    codes = emb.select("vec_id", "embedding").mapInPandas(fused, fused_schema)
    return probe, dq_df, codes


def _ivf_adc_rank(codes: DataFrame, dq_df: DataFrame) -> DataFrame:
    """ADC distance + deterministic top-k rank over a fused-codes relation —
    the nprobe-independent tail of ivf_pq_search."""
    adc = (
        codes.join(F.broadcast(dq_df), ["sub", "code"])
        .groupBy("vec_id", "cell")
        .agg(F.round(F.sum("dq"), 6).alias("adc_d2"))
    )
    from pyspark.sql import Window

    top = adc.orderBy("adc_d2", "vec_id").limit(PQ_TOP_K)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy("adc_d2", "vec_id")).cast("int"),
    )


def _ivf_shared_ctes() -> str:
    """The nprobe-INDEPENDENT relations of the IVF-PQ replay: PQ training,
    IVF centroids, per-(vector, cell) distances, the cell assignment, and
    the query's ADC distance table. Factored so _ivf_nprobe_curve_sql's
    four arms share ONE computation of them instead of re-training per
    arm — the multiply-referenced CTEs are AS MATERIALIZED because DuckDB
    inlines plain CTEs (each arm would otherwise re-execute the shared
    training/assignment subtrees; the r8 pack-unpivot fix measured that
    inlining at 81 s → 9 s)."""
    from .similarity import _CENTROIDS_SQL

    return (
        _PQ_TRAIN_CTES
        + f""",
cent AS ({_CENTROIDS_SQL}),
vecs AS (
  SELECT vec_id, label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
),
dcell AS MATERIALIZED (
  SELECT vx.vec_id, c.label AS clabel,
         round(sum((vx.v - c.centroid_v) * (vx.v - c.centroid_v)), 6) AS d2
  FROM vecs vx JOIN cent c ON c.dim = vx.dim
  GROUP BY vx.vec_id, c.label
),
assign_ AS MATERIALIZED (
  SELECT vec_id, clabel AS cell FROM (
    SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
    FROM dcell
  ) WHERE rn = 1
),
qd AS MATERIALIZED (
  SELECT v.sub, c.cid AS code,
         round(sum((v.val - c.cv) * (v.val - c.cv)), 6) AS dq
  FROM v JOIN {_CFIN} c ON v.dim = c.dim
  WHERE v.vec_id = {QUERY_VEC_ID}
  GROUP BY v.sub, c.cid
)"""
    )


def _ivf_arm_ctes(nprobe: int, suffix: str = "") -> str:
    """The nprobe-DEPENDENT tail (probed cells → candidates → ADC), with
    uniquely-suffixed CTE names so several arms coexist in one WITH."""
    return f"""qcell{suffix} AS (
  SELECT clabel FROM (
    SELECT clabel, row_number() OVER (ORDER BY d2, clabel) AS rn
    FROM dcell WHERE vec_id = {QUERY_VEC_ID}
  ) WHERE rn <= {nprobe}
),
cand{suffix} AS (
  SELECT vec_id, cell FROM assign_
  WHERE cell IN (SELECT clabel FROM qcell{suffix}) AND vec_id <> {QUERY_VEC_ID}
),
adc{suffix} AS (
  SELECT e.vec_id, cand{suffix}.cell, round(sum(qd.dq), 6) AS adc_d2
  FROM enc e
  JOIN cand{suffix} ON cand{suffix}.vec_id = e.vec_id
  JOIN qd ON qd.sub = e.sub AND qd.code = e.code
  GROUP BY e.vec_id, cand{suffix}.cell
)"""


def _ivf_pq_sql(nprobe: int = IVF_NPROBE) -> str:
    return (
        "WITH "
        + _ivf_shared_ctes()
        + ",\n"
        + _ivf_arm_ctes(nprobe)
        + f"""
SELECT vec_id, cast(cell AS INT) AS cell, adc_d2,
       cast(row_number() OVER (ORDER BY adc_d2, vec_id) AS INT) AS rank
FROM adc
ORDER BY adc_d2, vec_id
LIMIT {PQ_TOP_K}"""
    )


# --- pq_distortion: the compression dial's error spectrum --------------------

PQ_DECILES = 10


def pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector PQ reconstruction error (the quantization distortion Jégou
    et al. trade against memory), summarized as a decile spectrum: vectors
    ranked by total squared subspace error, NTILE(10), per-decile count /
    mean / max. Complements ivf_recall_audit: recall says what the
    compressed index MISSES, distortion says WHY — a fat tail decile means
    the codebook under-represents part of the space and K/M need turning
    before nprobe does. The dial-evidence pattern (dedup_yield_curve,
    lsh_band_plan) applied to the compression knob.

    Scale shape: the per-(vector, subspace) errors already exist in the
    encode pass (`enc`'s d2 column — no extra GEMM); the spectrum adds one
    groupBy(vec_id) map-side-combinable sum and a global NTILE over the
    narrow (vec_id, err) relation — at extreme scale the same deciles come
    from sampled quantiles, NTILE is the exact oracle-checkable form
    (the perplexity_buckets argument). Float contract: d2 values are
    6dp-rounded at encode; their 8-term sum rounds to 6dp before ranking,
    ties break by vec_id."""
    from pyspark.sql import Window

    enc = pq_encode(spark, sf_dir)
    per_vec = enc.groupBy("vec_id").agg(F.round(F.sum("d2"), 6).alias("err"))
    w = Window.orderBy("err", "vec_id")
    dec = per_vec.select(
        "vec_id", "err", F.ntile(PQ_DECILES).over(w).alias("decile")
    )
    # mean from exact micro-integer sums: err sits on the 1e-6 grid, and
    # round(avg(grid values), 6) lands on exact .5e-6 boundaries that flip
    # with float summation order (the ivf_cell_balance lesson)
    return (
        dec.groupBy("decile")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.round(F.col("err") * 1e6).cast("long")).alias("err_micro"),
            F.round(F.max("err"), 6).alias("max_err"),
        )
        .select(
            "decile",
            "n_vectors",
            F.round(
                F.col("err_micro") / F.col("n_vectors") / F.lit(1e6), 6
            ).alias("mean_err"),
            "max_err",
        )
        .orderBy("decile")
    )


_PQ_DISTORTION_SQL = (
    "WITH "
    + _PQ_TRAIN_CTES
    + f""",
per_vec AS (SELECT vec_id, round(sum(d2), 6) AS err FROM enc GROUP BY vec_id),
dec AS (
  SELECT vec_id, err,
         cast(ntile({PQ_DECILES}) OVER (ORDER BY err, vec_id) AS INT) AS decile
  FROM per_vec
)
SELECT decile, count(*) AS n_vectors,
       round(sum(CAST(round(err * 1000000) AS BIGINT))
             / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS mean_err,
       round(max(err), 6) AS max_err
FROM dec GROUP BY decile ORDER BY decile"""
)


# --- pq_code_balance: is the codebook actually used? --------------------------


def pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace codebook-utilization audit over the PQ codes: how many of
    the PQ_K centroids each subspace actually uses, the Shannon entropy of
    its code distribution (log2(PQ_K) = perfectly balanced; the effective
    bits each code byte carries), the heaviest code's share, and the mean
    reconstruction distortion. This is the dial evidence BEHIND the r9
    quantizer retrain: the r8 first-K init left centroids starved (dead
    codes = wasted index bytes + coarser cells for the survivors), and this
    relation is what proves a codebook healthy before a deployment ships
    it — the pq_distortion/ivf_nprobe_curve pattern applied to the
    codebook-balance knob (Jégou et al. 2011 §V discuss exactly this
    balance assumption).

    Scale shape: one groupBy(sub, code) over the codes relation (map-side
    combinable, ≤ M_SUB×PQ_K = 1024 groups regardless of corpus size), then
    a ≤1024-row re-aggregation to M_SUB rows — the shuffle payload is the
    histogram, never the vectors. Float contract: entropy uses the
    word_entropy identity H = (ln n − Σ c·ln c / n)/ln 2 with raw float
    sums and one final 6dp round (the round-1-proven contract; the terms
    are c·ln(c) over integer counts, off the 1e-6 grid, so the mean never
    sits on an exact rounding boundary); the distortion mean is computed
    from EXACT micro-integer sums of the 6dp d2 values — grid-valued
    means land on exact .5e-6 boundaries and flip with float summation
    order (the ivf_cell_balance lesson)."""
    from .curation import LN2

    enc = pq_encode(spark, sf_dir)
    micro = F.round(F.col("d2") * 1e6).cast("long")
    cnts = enc.groupBy("sub", "code").agg(
        F.count("*").alias("c"), F.sum(micro).alias("sd2u")
    )
    agg = cnts.groupBy("sub").agg(
        F.sum("c").alias("n_vectors"),
        F.count("*").alias("n_used"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("slc"),
        F.max("c").alias("max_c"),
        F.sum("sd2u").alias("ssd2u"),
    )
    h = (F.log("n_vectors") - F.col("slc") / F.col("n_vectors")) / F.lit(LN2)
    return agg.select(
        "sub",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.col("n_used").cast("int").alias("n_used"),
        F.round(F.col("n_used") / F.lit(PQ_K), 6).alias("utilization"),
        F.round(h, 6).alias("entropy_bits"),
        F.round(F.col("max_c") / F.col("n_vectors"), 6).alias("max_share"),
        F.round(
            F.col("ssd2u") / F.col("n_vectors") / F.lit(1e6), 6
        ).alias("mean_d2"),
    ).orderBy("sub")


def _pq_code_balance_sql() -> str:
    from .curation import LN2

    return (
        "WITH "
        + _PQ_TRAIN_CTES
        + f""",
cnts AS (
  SELECT sub, code, count(*) AS c,
         sum(CAST(round(d2 * 1000000) AS BIGINT)) AS sd2u
  FROM enc GROUP BY sub, code
),
agg AS (
  SELECT sub, sum(c) AS n_vectors, count(*) AS n_used,
         sum(c * ln(c)) AS slc, max(c) AS max_c, sum(sd2u) AS ssd2u
  FROM cnts GROUP BY sub
)
SELECT cast(sub AS INT) AS sub, cast(n_vectors AS BIGINT) AS n_vectors,
       cast(n_used AS INT) AS n_used,
       round(n_used / {float(PQ_K)}, 6) AS utilization,
       round((ln(n_vectors) - slc / n_vectors) / {LN2}, 6) AS entropy_bits,
       round(max_c / CAST(n_vectors AS DOUBLE), 6) AS max_share,
       round(ssd2u / CAST(n_vectors AS DOUBLE) / 1000000.0, 6) AS mean_d2
FROM agg ORDER BY sub"""
    )


# --- ivf_recall_audit: the measured-recall yardstick for the compressed path

def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of `ivf_pq_search` against the EXACT L2 top-k over the raw
    float vectors — the compressed path's counterpart to `ann_recall_audit`
    (which audits the sign-LSH path against cosine brute force). IVF-PQ
    loses recall two ways: nprobe pruning drops true neighbors whose cell
    wasn't probed, and ADC quantization reranks near-ties; this audit
    measures the COMBINED loss, the number a deployment quotes when it
    swaps the exact scan for the compressed layout (Jégou et al. 2011
    report exactly this curve). The exact side uses L2 — the metric PQ
    approximates — not cosine, so the audit isolates index error from
    metric mismatch.

    One-row output: (k, nprobe, n_exact, n_hit, recall). Scale shape: the
    exact side is one broadcast-query scan + TakeOrderedAndProject (run it
    over a sampled probe set in production — the hard_negative_recall
    protocol); the approx side is the audited query itself; the overlap is
    a k-row semi-join. Determinism: d2 rounds to 6dp before ranking, ties
    break by vec_id — the ivf_assign contract."""
    return _recall_row(spark, sf_dir, IVF_NPROBE).select(
        F.lit(PQ_TOP_K).alias("k"), "nprobe", "n_exact", "n_hit", "recall"
    )


def _exact_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact L2 top-k of QUERY_VEC_ID over raw vectors — the yardstick both
    recall audits compare against. Query-scoped memo + cache: within a pack
    run (ivf_recall_audit and ivf_nprobe_curve are both pack members) the
    brute-force scan happens once."""
    from . import scoped_memo

    def build():
        emb = prepared(spark, sf_dir).table("embeddings")
        q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("embedding").alias("qv")
        )
        from .dedup import _dot

        # ||e - q||^2 expanded as e·e − 2·e·q + q·q: each dot is the shared
        # sequential left-fold (_dot), so DuckDB's replay agrees bitwise
        d2 = F.round(
            _dot("embedding", "embedding")
            - F.lit(2.0) * _dot("embedding", "qv")
            + _dot("qv", "qv"),
            6,
        )
        return scoped_cache(
            emb.filter(F.col("vec_id") != QUERY_VEC_ID)
            .crossJoin(F.broadcast(q))
            .select("vec_id", d2.alias("d2"))
            .orderBy("d2", "vec_id")
            .limit(PQ_TOP_K)
        )

    return scoped_memo(("pq_exact_l2", sf_dir), build)


def _recall_row(
    spark: SparkSession, sf_dir: str, nprobe: int, approx: DataFrame | None = None
) -> DataFrame:
    """One (nprobe, n_exact, n_hit, recall) row: ivf_pq_search at the given
    nprobe measured against the shared exact-L2 yardstick. `approx` lets
    ivf_nprobe_curve supply its shared-codes arm (r11) instead of a fresh
    ivf_pq_search plan."""
    exact = _exact_l2_topk(spark, sf_dir)
    if approx is None:
        approx = ivf_pq_search(spark, sf_dir, nprobe=nprobe)
    approx = approx.select(F.col("vec_id").alias("aid"))
    n_hit = exact.join(approx, exact.vec_id == approx.aid, "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(n_hit)
        .select(
            F.lit(nprobe).alias("nprobe"),
            "n_exact",
            "n_hit",
            F.round(
                F.col("n_hit") / F.greatest(F.col("n_exact"), F.lit(1)), 6
            ).alias("recall"),
        )
    )


# --- ivf_nprobe_curve: the nprobe dial, and the IVF/PQ loss decomposition ----

NPROBE_SWEEP = (1, 2, 4, 10)  # 10 = every cell (testdata has 10 labels):
# the last point probes everything, so its miss is PURE PQ quantization
# loss — subtracting it from the other points isolates the IVF pruning loss


def ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k as a function of nprobe — the tuning curve behind
    ivf_recall_audit's single operating-point number (the dial-evidence
    pattern applied to the probe knob). The exhaustive last sweep point
    decomposes the loss: its residual miss is what PQ quantization alone
    costs, the gap between it and a smaller nprobe is what cell pruning
    costs at that setting — the two numbers a deployment trades against
    scan cost when it picks nprobe (Jégou et al. 2011). Two honest
    caveats the measured curve exhibits: exhaustive probing reduces to
    plain pq_search (pinned in tests), and recall need NOT be monotone in
    nprobe — widening the candidate pool lets a quantization-favored
    imposter's ADC distance evict a true neighbor from the top-k. The r8
    curve was flat at 0.30 at every nprobe — pure quantization loss from
    the then M=8/K=16/one-round/first-K quantizer, which is exactly the
    ceiling this curve exists to expose; the r9 retrain (M=32 × K=32,
    hash-spread init, LLOYD_ROUNDS=3 — measured panel in the module
    docstring) lifted the exhaustive point to 0.8 at sf0.01, so the curve
    now measures a real nprobe/recall trade instead of a codebook ceiling.

    Scale shape: the exact yardstick is ONE cached brute-force scan (shared
    via query-scoped memo with ivf_recall_audit in the same pack), and (r11)
    the fused assign+encode pass runs ONCE at the widest sweep point with
    the codes relation cache-pinned — every narrower arm is a cell-membership
    filter over the pin, exact by construction (the kernel assigns against
    ALL centroids and keeps probe members; probe sets are prefixes of one
    deterministic centroid ordering, so filtering the widest arm's codes by
    a narrower prefix reproduces that arm bit-for-bit). Previously each
    sweep point re-ran the fused pass: |sweep| full Arrow scans for the one
    scan's worth of information. At production scale the widest arm is
    itself a partition-pruned read of max(sweep)/K of the codes table."""
    parts = _ivf_probe_and_codes(spark, sf_dir, max(NPROBE_SWEEP))
    rows = None
    if parts is None:
        # Degenerate corpus (no embeddings / missing query vector):
        # ivf_pq_search would return this same empty relation at every
        # nprobe, so supply it directly instead of re-running the probe's
        # codebook fetch + query-vector lookup once per sweep arm
        # (ADVICE r11: 4 redundant driver round-trips on this path).
        empty = spark.createDataFrame(
            [], "vec_id long, cell int, adc_d2 double, rank int"
        )
        for p in NPROBE_SWEEP:
            row = _recall_row(spark, sf_dir, p, approx=empty)
            rows = row if rows is None else rows.unionByName(row)
        return rows.orderBy("nprobe")
    probe, dq_df, codes = parts
    codes = scoped_cache(codes)
    for p in NPROBE_SWEEP:
        arm = _ivf_adc_rank(
            codes.filter(F.col("cell").isin(probe[:p])), dq_df
        )
        row = _recall_row(spark, sf_dir, p, approx=arm)
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("nprobe")


def _exact_l2_ctes() -> str:
    from .dedup import _DOT_SQL

    dee = _DOT_SQL.format(a="embedding", b="embedding")
    deq = _DOT_SQL.format(a="embedding", b="qv")
    dqq = _DOT_SQL.format(a="qv", b="qv")
    return f"""q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
exact AS MATERIALIZED (
  SELECT vec_id, round({dee} - 2.0 * {deq} + {dqq}, 6) AS d2
  FROM embeddings, q
  WHERE vec_id <> {QUERY_VEC_ID}
  ORDER BY d2, vec_id
  LIMIT {PQ_TOP_K}
)"""


def _recall_arm_sql(nprobe: int) -> str:
    return f"""SELECT {nprobe} AS nprobe, n_exact, n_hit,
       round(n_hit / greatest(n_exact, 1), 6) AS recall
FROM (SELECT count(*) AS n_exact FROM exact),
     (SELECT count(*) AS n_hit FROM exact
      WHERE vec_id IN (SELECT vec_id FROM ({_ivf_pq_sql(nprobe)})))"""


def _ivf_recall_sql() -> str:
    return f"""
WITH {_exact_l2_ctes()}
SELECT {PQ_TOP_K} AS k, nprobe, n_exact, n_hit, recall
FROM ({_recall_arm_sql(IVF_NPROBE)})
"""


def _ivf_nprobe_curve_sql() -> str:
    arm_ctes = ",\n".join(
        _ivf_arm_ctes(p, suffix=f"_{p}") for p in NPROBE_SWEEP
    )
    arms = "\nUNION ALL\n".join(
        f"""SELECT {p} AS nprobe, n_exact, n_hit,
       round(n_hit / greatest(n_exact, 1), 6) AS recall
FROM (SELECT count(*) AS n_exact FROM exact),
     (SELECT count(*) AS n_hit FROM exact
      WHERE vec_id IN (
        SELECT vec_id FROM (
          SELECT vec_id,
                 row_number() OVER (ORDER BY adc_d2, vec_id) AS rn
          FROM adc_{p}
        ) WHERE rn <= {PQ_TOP_K}))"""
        for p in NPROBE_SWEEP
    )
    return f"""
WITH {_ivf_shared_ctes()},
{_exact_l2_ctes()},
{arm_ctes}
SELECT * FROM (
{arms}
)
ORDER BY nprobe
"""


# --- pq_pack: the packed 5-bit layout the module docstring advertises -------

PQ_CODE_BITS = 5  # PQ_K = 32 centroids -> 5 bits per code
N_PACKED_BYTES = (M_SUB * PQ_CODE_BITS + 7) // 8  # 32 x 5 bits = 20 bytes


def _pack_byte_terms(j: int) -> list[tuple[int, int]]:
    """Which codes contribute to packed byte j, and at what shift. Code m
    occupies bit positions [5m, 5m+5) of the little-endian bit stream; byte j
    covers [8j, 8j+8). Returns (m, shift): shift >= 0 means the code's low
    bits land at in-byte offset `shift` ((code << shift) & 255); shift < 0
    means the code straddles in from below and contributes its TOP bits
    (code >> -shift). Fields never overlap, so the per-byte contributions
    are disjoint bit ranges and plain addition assembles the byte."""
    terms = []
    for m in range(M_SUB):
        if 5 * m + PQ_CODE_BITS - 1 >= 8 * j and 5 * m <= 8 * j + 7:
            terms.append((m, 5 * m - 8 * j))
    return terms


def pq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the production code layout the module docstring
    advertises: M_SUB 5-bit codes bit-packed into N_PACKED_BYTES bytes per
    vector (rendered as lowercase hex so both engines hash the same string),
    closing the 8x-shipped vs 12.8x-claimed gap the round-9 verdict flagged.

    One groupBy(vec_id) over the codes relation; each packed byte is a SUM
    of disjoint-bit contributions (see _pack_byte_terms), so the whole pack
    is map-side-combinable integer aggregation — no collect_list, no UDF.
    ADC search keeps reading the unpacked (sub, code) relation: packing is
    a STORAGE layout (20 B/vector vs 256 B float = 12.8x), and the unpack
    round-trip is pinned bit-exactly in tests/test_pq_pack.py."""
    return _pack_from_codes(pq_encode(spark, sf_dir))


def _pack_from_codes(codes: DataFrame) -> DataFrame:
    """The pack aggregation alone, over any (vec_id, sub, code) relation —
    split out so tools/scale_probe.py can time the pack leg against the
    shared training+encode chain separately (round-11: decomposing the
    20.3x-at-100x the r10 probe attributed to 'the training chain' without
    measuring which leg grew)."""
    byte_cols = []
    for j in range(N_PACKED_BYTES):
        contrib = None
        for m, shift in _pack_byte_terms(j):
            term = F.when(
                F.col("sub") == m,
                (F.col("code") * (1 << shift)) % 256
                if shift >= 0
                else F.floor(F.col("code") / (1 << -shift)),
            ).otherwise(0)
            contrib = term if contrib is None else contrib + term
        byte_cols.append(F.sum(contrib).cast("long").alias(f"byte_{j}"))
    per_vec = codes.groupBy("vec_id").agg(
        F.count("*").alias("n_codes"), *byte_cols
    )
    hex_expr = F.concat(
        *[
            F.lower(F.lpad(F.hex(F.col(f"byte_{j}")), 2, "0"))
            for j in range(N_PACKED_BYTES)
        ]
    )
    return per_vec.select(
        "vec_id",
        F.col("n_codes").cast("int").alias("n_codes"),
        hex_expr.alias("packed_hex"),
        F.lit(N_PACKED_BYTES).alias("packed_bytes"),
        (F.lit(float(DIM * 4)) / F.lit(float(N_PACKED_BYTES))).alias(
            "compression_x"
        ),
    )


def _pq_pack_sql() -> str:
    byte_sums = []
    for j in range(N_PACKED_BYTES):
        cases = []
        for m, shift in _pack_byte_terms(j):
            if shift >= 0:
                cases.append(f"WHEN sub = {m} THEN (code * {1 << shift}) % 256")
            else:
                cases.append(f"WHEN sub = {m} THEN code // {1 << -shift}")
        byte_sums.append(
            f"sum(CASE {' '.join(cases)} ELSE 0 END) AS byte_{j}"
        )
    hexcat = " || ".join(
        f"lpad(lower(hex(byte_{j})), 2, '0')" for j in range(N_PACKED_BYTES)
    )
    return (
        "WITH "
        + _PQ_TRAIN_CTES
        + f""",
per_vec AS (
  SELECT vec_id, count(*) AS n_codes, {', '.join(byte_sums)}
  FROM enc GROUP BY vec_id
)
SELECT vec_id, cast(n_codes AS INT) AS n_codes, {hexcat} AS packed_hex,
       {N_PACKED_BYTES} AS packed_bytes,
       {float(DIM * 4)} / {float(N_PACKED_BYTES)} AS compression_x
FROM per_vec"""
    )


QUERIES = {
    "pq_encode": pq_encode,
    "pq_search": pq_search,
    "ivf_pq_search": ivf_pq_search,
    "ivf_recall_audit": ivf_recall_audit,
    "pq_distortion": pq_distortion,
    "ivf_nprobe_curve": ivf_nprobe_curve,
    "pq_code_balance": pq_code_balance,
    "pq_pack": pq_pack,
}

ORACLES = {
    "pq_encode": _PQ_ENCODE_SQL,
    "pq_search": _PQ_SEARCH_SQL,
    "ivf_pq_search": _ivf_pq_sql(),
    "ivf_recall_audit": _ivf_recall_sql(),
    "pq_distortion": _PQ_DISTORTION_SQL,
    "ivf_nprobe_curve": _ivf_nprobe_curve_sql(),
    "pq_code_balance": _pq_code_balance_sql(),
    "pq_pack": _pq_pack_sql(),
}
