"""pq_pack: the packed 5-bit code layout must be a lossless re-encoding.

The module docstring advertised 12.8x compression (M_SUB=32 5-bit codes in
20 bytes vs the 256-byte float vector) while the engine shipped one byte per
code (8x) — the round-9 verdict asked for the claim to be implemented and
measured. These tests pin the bit-exact unpack round-trip against
pq_encode's codes and the arithmetic of the claim itself.
"""

from __future__ import annotations

from s3bigdatasync_spark.operators.pq import (
    DIM,
    M_SUB,
    N_PACKED_BYTES,
    PQ_CODE_BITS,
    PQ_K,
    _pack_byte_terms,
    pq_encode,
    pq_pack,
)

from tests.conftest import SF_SMALL


def _unpack(packed_hex: str) -> list[int]:
    """Reference unpack: read the little-endian bit stream back into M_SUB
    5-bit codes — the inverse every reader of the packed column implements."""
    raw = bytes.fromhex(packed_hex)
    stream = int.from_bytes(raw, "little")
    return [(stream >> (PQ_CODE_BITS * m)) & (2**PQ_CODE_BITS - 1) for m in range(M_SUB)]


def test_packing_is_lossless_roundtrip(spark):
    codes = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(spark, SF_SMALL).collect()
    }
    packed = pq_pack(spark, SF_SMALL).collect()
    assert packed
    for row in packed:
        assert row["n_codes"] == M_SUB
        got = _unpack(row["packed_hex"])
        want = [codes[(row["vec_id"], m)] for m in range(M_SUB)]
        assert got == want, row["vec_id"]


def test_compression_claim_arithmetic(spark):
    """20 packed bytes per vector vs DIM float32 = 12.8x, and every code
    fits its 5-bit field (PQ_K = 32 = 2^5)."""
    assert PQ_K <= 2**PQ_CODE_BITS
    assert N_PACKED_BYTES == (M_SUB * PQ_CODE_BITS + 7) // 8 == 20
    row = pq_pack(spark, SF_SMALL).limit(1).collect()[0]
    assert row["packed_bytes"] == N_PACKED_BYTES
    assert abs(row["compression_x"] - (DIM * 4) / N_PACKED_BYTES) < 1e-12
    assert abs(row["compression_x"] - 12.8) < 1e-12
    assert len(row["packed_hex"]) == 2 * N_PACKED_BYTES


def test_byte_terms_tile_the_bitstream():
    """Static sanity on the packing map: every one of the M_SUB*5 bits is
    claimed by exactly one (byte, code) term, and shifts stay in range."""
    claimed = set()
    for j in range(N_PACKED_BYTES):
        for m, shift in _pack_byte_terms(j):
            lo, hi = PQ_CODE_BITS * m, PQ_CODE_BITS * m + PQ_CODE_BITS - 1
            for bit in range(lo, hi + 1):
                if 8 * j <= bit <= 8 * j + 7:
                    assert (bit, m) not in claimed
                    claimed.add((bit, m))
            assert -PQ_CODE_BITS < shift < 8
    assert len(claimed) == M_SUB * PQ_CODE_BITS
