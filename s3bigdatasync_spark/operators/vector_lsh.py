"""Shared sign-random-projection LSH primitives for the embedding operators
(similarity.* and dedup.embedding_neardup).

Plane signs are md5-derived ±1 values computed in PYTHON at plan-build time
and embedded as literals into both the Spark plan and the DuckDB oracle SQL —
so the two engines share the planes by construction, with no RNG and no
cross-engine numeric divergence in the plane definition itself.

Why md5: an earlier revision derived signs from
``(p*73856093 + i*19349663) % 2``. Both multipliers are odd, so that
expression collapses to ``(p + i) % 2`` — plane p is exactly ±plane 0, an
"8-plane" bucket takes only 2 distinct values, and the whole LSH degenerates
to a single hyperplane (visible as lsh_buckets returning 2 rows). md5 mixing
makes the planes pairwise-independent (~50% sign agreement).

Scale note: Spark-side sign computation is a (batch × dim) @ (dim × planes)
GEMM inside Arrow-batched mapInPandas — one matmul per batch, never a
per-plane Catalyst expression chain (64-term codegen chains are the known
canonicalization trap). Sign equality across engines holds unless a plane dot
sits within float-summation-order error of exactly 0 (~1e-13 relative), which
the oracles accept as the standard LSH contract.
"""

from __future__ import annotations

import hashlib

DIM = 64


def plane_sign(p: int, i: int) -> int:
    """Deterministic ±1 component of hyperplane p at dimension i."""
    return 1 if hashlib.md5(f"plane:{p}:{i}".encode()).digest()[0] % 2 == 0 else -1


def planes_matrix(n_planes: int, dim: int = DIM):
    """(n_planes, dim) float64 ±1 matrix for numpy-side sign computation."""
    import numpy as np

    return np.array(
        [[float(plane_sign(p, i)) for i in range(dim)] for p in range(n_planes)]
    )


def plane_dot_sql(vec: str, p: int, dim: int = DIM) -> str:
    """64-term sequential signed sum — DuckDB's left-to-right reduction."""
    terms = " + ".join(
        f"({'' if plane_sign(p, i) == 1 else '-'}{vec}[{i + 1}]::DOUBLE)"
        for i in range(dim)
    )
    return f"({terms})"


def band_key_sql(vec: str, band: int, band_bits: int, dim: int = DIM) -> str:
    """Integer band key from the sign bits of planes band*band_bits .. +band_bits-1."""
    parts = [
        f"(CASE WHEN {plane_dot_sql(vec, band * band_bits + b, dim)} > 0"
        f" THEN {2 ** b} ELSE 0 END)"
        for b in range(band_bits)
    ]
    return "cast(" + " + ".join(parts) + " AS INT)"
