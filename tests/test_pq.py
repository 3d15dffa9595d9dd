"""PQ family pins beyond the oracle: code-space invariants, argmin
optimality, ADC vs exact-distance sanity, and IVF-PQ candidate discipline."""

from __future__ import annotations

import numpy as np
import pytest

from s3bigdatasync_spark.operators import pq as pqm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def encoded(spark):
    df = pqm.pq_encode(spark, SF)
    return [r.asDict() for r in df.collect()]


def test_code_space(spark, encoded):
    """Every vector emits exactly M_SUB rows; codes live in [0, PQ_K)."""
    by_vec = {}
    for r in encoded:
        by_vec.setdefault(r["vec_id"], []).append(r)
        assert 0 <= r["code"] < pqm.PQ_K
        assert 0 <= r["sub"] < pqm.M_SUB
        assert r["d2"] >= 0.0
    assert all(len(v) == pqm.M_SUB for v in by_vec.values())
    assert {r["sub"] for v in by_vec.values() for r in v} == set(range(pqm.M_SUB))


def test_assignment_is_argmin(spark, encoded):
    """The emitted code really is the nearest centroid slice (6dp-rounded,
    lowest-cid tie-break) — recomputed independently in numpy."""
    from s3bigdatasync_spark.operators import prepared

    emb = prepared(spark, SF).table("embeddings")
    C = pqm._train_codebook(spark, emb)
    Cm = C.reshape(len(C), pqm.M_SUB, pqm.SUBDIM)
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in encoded[:400]:
        sub = r["sub"]
        x = vecs[r["vec_id"]].reshape(pqm.M_SUB, pqm.SUBDIM)[sub]
        d2 = np.round(((x[None, :] - Cm[:, sub, :]) ** 2).sum(axis=1), 6)
        assert r["code"] == int(d2.argmin())
        assert r["d2"] == pytest.approx(d2[r["code"]])


def test_adc_approximates_exact_distance(spark):
    """ADC ranking must correlate with exact L2 ranking. The r9 M=32/K=32
    quantizer (hash-spread init, 3 Lloyd rounds) measures recall@10 = 0.5
    here and every ADC pick's exact rank lands in the top ~5% — the pin
    keeps margin below that (quantization is still approximation, top-k
    equality would be flaky) while being far beyond the r8 quantizer's
    reach: median pick within the best tenth of the corpus, every pick in
    the best third, and at least three true top-10 neighbors surface."""
    from s3bigdatasync_spark.operators import prepared

    top = [r["vec_id"] for r in pqm.pq_search(spark, SF).collect()]
    assert len(top) == pqm.PQ_TOP_K

    emb = prepared(spark, SF).table("embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[pqm.QUERY_VEC_ID]
    exact = sorted(
        ((((v - q) ** 2).sum(), vid) for vid, v in vecs.items() if vid != pqm.QUERY_VEC_ID)
    )
    rank = {vid: i + 1 for i, (_, vid) in enumerate(exact)}
    adc_ranks = sorted(rank[v] for v in top)
    n = len(rank)
    assert adc_ranks[len(adc_ranks) // 2] <= n / 10  # median in the best tenth
    assert adc_ranks[-1] <= n / 3  # every pick in the best third
    assert sum(1 for r in adc_ranks if r <= pqm.PQ_TOP_K) >= 3  # real recall


def test_fused_ivf_pq_equals_composition(spark):
    """The fused assign+encode kernel must give exactly what composing the
    standalone operators gives: ivf_assign → filter to the query's nprobe
    cells → join _assign_codes → broadcast-join the dq table → ADC agg.
    Pins the r7 one-pass plan to the r3-r6 compositional semantics."""
    from pyspark.sql import functions as F

    from s3bigdatasync_spark.operators import prepared
    from s3bigdatasync_spark.operators.similarity import ivf_assign, label_centroids

    emb = prepared(spark, SF).table("embeddings")
    C = pqm._train_codebook(spark, emb)
    q = emb.filter(F.col("vec_id") == pqm.QUERY_VEC_ID).select("embedding").collect()
    qvec = np.asarray(q[0]["embedding"], dtype=np.float64)

    cents = label_centroids(spark, SF).toPandas()
    labels = sorted(cents["label"].unique())
    dim = int(cents["dim"].max()) + 1
    Civf = np.zeros((len(labels), dim))
    for li, lab in enumerate(labels):
        Civf[li] = cents[cents["label"] == lab].sort_values("dim")["centroid_v"].to_numpy()
    d2 = np.round(((qvec[None, :] - Civf) ** 2).sum(axis=1), 6)
    order = sorted(range(len(labels)), key=lambda i: (d2[i], labels[i]))
    probe = [int(labels[i]) for i in order[: pqm.IVF_NPROBE]]

    k_eff = len(C)
    Cm = C.reshape(k_eff, pqm.M_SUB, pqm.SUBDIM)
    qsub = qvec.reshape(pqm.M_SUB, pqm.SUBDIM)
    dq = np.round(((qsub[None, :, :] - Cm) ** 2).sum(axis=2).T, 6)
    dq_df = spark.createDataFrame(
        [(m, k, float(dq[m, k])) for m in range(pqm.M_SUB) for k in range(k_eff)],
        "sub int, code int, dq double",
    )
    cand = (
        ivf_assign(spark, SF)
        .filter(F.col("assigned").isin(probe) & (F.col("vec_id") != pqm.QUERY_VEC_ID))
        .select("vec_id", F.col("assigned").alias("cell"))
    )
    composed = (
        pqm._assign_codes(emb, spark, C)
        .join(cand, "vec_id")
        .join(F.broadcast(dq_df), ["sub", "code"])
        .groupBy("vec_id", "cell")
        .agg(F.round(F.sum("dq"), 6).alias("adc_d2"))
    )
    want = sorted(
        ((r["adc_d2"], r["vec_id"], r["cell"]) for r in composed.collect())
    )[: pqm.PQ_TOP_K]
    got = [
        (r["adc_d2"], r["vec_id"], r["cell"])
        for r in pqm.ivf_pq_search(spark, SF).orderBy("rank").collect()
    ]
    assert got == want


def test_ivf_pq_candidates_come_from_probed_cells(spark):
    """Every IVF-PQ result row's cell is one of the query's nprobe nearest
    cells, and results rank by ADC distance with vec_id tie-break."""
    rows = [r.asDict() for r in pqm.ivf_pq_search(spark, SF).collect()]
    assert rows, "clustered testdata must yield candidates"
    cells = {r["cell"] for r in rows}
    assert len(cells) <= pqm.IVF_NPROBE
    ranked = sorted(rows, key=lambda r: (r["adc_d2"], r["vec_id"]))
    assert [r["rank"] for r in ranked] == list(range(1, len(rows) + 1))


def test_ivf_sweep_arms_equal_fresh_search_at_every_nprobe(spark):
    """The shared-codes sweep (ivf_nprobe_curve) is exact only because the
    fused kernel assigns against ALL centroids and uses the probe set purely
    as a keep-filter, so codes(p) == codes(max).filter(cell ∈ probe[:p]).
    Pin EVERY sweep arm — not just the operating and exhaustive points —
    against a fresh ivf_pq_search at that nprobe, so a future probe-aware
    kernel change cannot silently skew the unpinned arms (ADVICE r11)."""
    from pyspark.sql import functions as F

    parts = pqm._ivf_probe_and_codes(spark, SF, max(pqm.NPROBE_SWEEP))
    assert parts is not None
    probe, dq_df, codes = parts
    from s3bigdatasync_spark.operators import scoped_cache

    codes = scoped_cache(codes)
    for p in pqm.NPROBE_SWEEP:
        arm = pqm._ivf_adc_rank(codes.filter(F.col("cell").isin(probe[:p])), dq_df)
        fresh = pqm.ivf_pq_search(spark, SF, nprobe=p)
        got = sorted(map(tuple, arm.collect()))
        want = sorted(map(tuple, fresh.collect()))
        assert got == want, f"sweep arm nprobe={p} diverged from fresh search"
