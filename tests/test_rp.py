"""embedding_project: the 64→8 random projection must approximately preserve
pairwise geometry (the Johnson–Lindenstrauss property it exists for)."""

from __future__ import annotations

import numpy as np

from s3bigdatasync_spark.operators import prepared
from s3bigdatasync_spark.operators.similarity import RP_DIMS, embedding_project


def test_projection_preserves_pairwise_distances(spark, sf_dir):
    long = embedding_project(spark, sf_dir).filter("vec_id < 60").collect()
    proj: dict[int, np.ndarray] = {}
    for r in long:
        proj.setdefault(r["vec_id"], np.zeros(RP_DIMS))[r["out_dim"]] = r["proj_v"]

    orig_rows = (
        prepared(spark, sf_dir)
        .table("embeddings")
        .filter("vec_id < 60")
        .select("vec_id", "embedding")
        .collect()
    )
    orig = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in orig_rows}
    ids = sorted(orig)
    assert len(ids) >= 40

    # JL contract: squared-distance RATIOS stay in a bounded band (these
    # vectors' pairwise distances concentrate, so correlation would measure
    # noise — distortion is the property the projection guarantees)
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d_o = np.sum((orig[ids[a]] - orig[ids[b]]) ** 2)
            d_p = np.sum((proj[ids[a]] - proj[ids[b]]) ** 2)
            ratios.append(d_p / d_o)
    ratios = np.array(ratios)
    assert 0.8 < np.median(ratios) < 1.25, np.median(ratios)
    # ≥90% of pairs within 2.5x distortion either way (k=16 ⇒ ε ≈ 0.6)
    assert np.mean((ratios > 0.4) & (ratios < 2.5)) > 0.9

    # E[||Px||^2] = ||x||^2 under the 1/sqrt(k) scaling: global scale held
    ratio = ratios.mean()
    assert 0.7 < ratio < 1.4, ratio
