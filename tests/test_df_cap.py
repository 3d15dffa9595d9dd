"""Adversarial df-skew pin for the capped shingle-pair queries.

The r3 verdict flagged the exact shingle equi-joins as df-UNCAPPED: one
boilerplate shingle in 30% of docs makes the candidate join quadratic in
corpus size. tools/scale_probe.py --mode docs-boilerplate measures the slope;
THIS test pins the semantics on an injected corpus:

  * a boilerplate block is appended to 30% of sf0.001 docs (df ≈ 170 per
    boiler shingle, far over the evidence-derived cap), plus 20 synthetic docs that are
    boilerplate + one unique token — the "pure chrome page" pathology;
  * UNCAPPED containment/jaccard report every synthetic-pair as a near-dup
    (they share only boilerplate) — the false-positive explosion;
  * CAPPED variants report none of those pairs, and they stay oracle-green
    (Spark == DuckDB) on the skewed corpus, proving the cap is applied
    identically in both engines.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from s3bigdatasync_spark.operators import dedup
from tests.oracle_utils import compare

SRC = Path("/root/testdata/sf0.001")

BOILER = " ".join(f"boilertok{i}" for i in range(40))  # 40 tokens → 36 shingles
N_SYNTH = 20
SYNTH_ID0 = 90_000_000


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("dfskew")
    for f in SRC.glob("*.parquet"):
        if f.name != "documents.parquet":
            shutil.copy(f, out / f.name)
    schema = pq.read_schema(SRC / "documents.parquet")
    rows = pq.read_table(SRC / "documents.parquet").to_pylist()
    for i, r in enumerate(rows):
        if i % 10 < 3:  # 30% of docs carry the boilerplate block
            r["text"] = r["text"] + " " + BOILER
    for j in range(N_SYNTH):  # boilerplate-dominated "chrome pages"
        rows.append(
            {
                "doc_id": SYNTH_ID0 + j,
                "text": BOILER + f" uniq{j}",
                "lang": "en",
                "source": "synthetic",
                "n_chars": len(BOILER) + 6,
            }
        )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), out / "documents.parquet")
    return str(out)


def _synth_pairs(df, a_col, b_col):
    return [
        r
        for r in df.collect()
        if r[a_col] >= SYNTH_ID0 and r[b_col] >= SYNTH_ID0
    ]


def test_uncapped_containment_explodes_on_boilerplate(spark, skewed_dir):
    pairs = _synth_pairs(
        dedup.containment_pairs(spark, skewed_dir), "contained_doc", "container_doc"
    )
    # every ordered pair of the 20 chrome pages reads as ≥90% contained
    assert len(pairs) == N_SYNTH * (N_SYNTH - 1)


def test_capped_containment_ignores_boilerplate_pairs(spark, skewed_dir):
    df = dedup.containment_pairs_capped(spark, skewed_dir)
    assert _synth_pairs(df, "contained_doc", "container_doc") == []


def test_uncapped_jaccard_explodes_on_boilerplate(spark, skewed_dir):
    pairs = _synth_pairs(dedup.ngram_jaccard_pairs(spark, skewed_dir), "doc_a", "doc_b")
    assert len(pairs) == N_SYNTH * (N_SYNTH - 1) // 2


def test_capped_jaccard_ignores_boilerplate_pairs(spark, skewed_dir):
    df = dedup.ngram_jaccard_pairs_capped(spark, skewed_dir)
    assert _synth_pairs(df, "doc_a", "doc_b") == []


@pytest.mark.parametrize("name", ["ngram_jaccard_pairs_capped", "containment_pairs_capped"])
def test_capped_oracle_green_under_skew(spark, skewed_dir, name):
    r = compare(dedup.QUERIES[name](spark, skewed_dir), dedup.ORACLES[name], skewed_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "first_diffs"}


@pytest.mark.parametrize("sf_fixture", ["clean", "skewed"])
def test_cap_in_use_equals_recommendation(spark, skewed_dir, sf_fixture):
    """The cap the capped pair joins actually run under (derive_df_cap) must
    equal the `cap` column of the oracle-checked df_cap_recommendation
    relation, on a clean corpus AND under boilerplate skew — the evidence IS
    the configuration (round-4 item 5 / round-5 carry)."""
    sf_dir = str(SRC) if sf_fixture == "clean" else skewed_dir
    from s3bigdatasync_spark.operators import prepared

    docs = prepared(spark, sf_dir).table("documents")
    in_use = dedup.derive_df_cap(dedup._shingles(docs))
    reco = dedup.df_cap_recommendation(spark, sf_dir).select("cap").distinct().collect()
    assert len(reco) == 1
    assert in_use == reco[0]["cap"]
    if sf_fixture == "skewed":
        # the boiler shingles (df ≈ 170) must sit ABOVE the derived cap —
        # the derivation, not a hard-coded constant, is what excludes them
        assert in_use < 170
        assert in_use >= dedup.DF_CAP_FLOOR


def test_cap_recommendation_oracle_green_under_skew(spark, skewed_dir):
    r = compare(
        dedup.QUERIES["df_cap_recommendation"](spark, skewed_dir),
        dedup.ORACLES["df_cap_recommendation"],
        skewed_dir,
    )
    assert r["ok"], {k: v for k, v in r.items() if k != "first_diffs"}
