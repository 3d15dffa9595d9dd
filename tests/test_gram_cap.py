"""Adversarial pins for the span/winnow gram family's evidence-derived
postings cap (r6 verdict item 3 + ADVICE medium).

The r6 ADVICE pathology: the old df-only cap let a gram repeated many times
WITHIN two docs (df=2, e.g. a separator run — common web boilerplate) emit
n_a*n_b pair rows in the postings self-join, so 'df-capped, fan-out bounded'
did not hold for within-doc multiplicity. The cap now derives from the
per-gram TOTAL-postings (pn) spectrum; this file pins:

  * cap-in-use equality: _gram_keep / derive_gram_cap run under exactly the
    `cap` column of the oracle-checked gram_cap_recommendation relation
    (mirror of tests/test_df_cap.py), clean AND skewed;
  * the within-doc pathology is excluded: two docs sharing a massively
    repeated 8-gram produce NO span from it, while a planted ordinary span
    in the same corpus still surfaces;
  * the span family stays oracle-green (Spark == DuckDB) on the skewed
    corpus — the cap is applied identically in both engines;
  * winnow_spans ⊆ shared_substring_spans (the composition reports only
    spans the standalone operator reports) and ⊇ at the guarantee length
    (every standalone span of >= WINNOW_W + SPAN_GRAM_K - 1 tokens appears,
    with identical offsets/length).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import s3bigdatasync_spark.operators as ops
from s3bigdatasync_spark.operators import dedup, prepared
from tests.oracle_utils import compare

SRC = Path("/root/testdata/sf0.001")

# one 8-gram repeated 400x inside each of TWO docs: df=2 but pn=800 per
# rotation — the ADVICE pathology (the old df-cap kept it: 400*400=160k pair
# rows PER rotated gram from two docs; the pn-spectrum derivation excludes it
# because its pair mass alone exceeds the corpus's linear budget)
REPEAT_BLOCK = " ".join(["r0 r1 r2 r3 r4 r5 r6 r7"] * 400)
PLANTED = " ".join(f"p{i}" for i in range(24))  # ordinary 24-token shared run
RPT_ID0 = 80_000_000


@pytest.fixture(scope="module")
def repeat_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("gramskew")
    for f in SRC.glob("*.parquet"):
        if f.name != "documents.parquet":
            shutil.copy(f, out / f.name)
    schema = pq.read_schema(SRC / "documents.parquet")
    rows = pq.read_table(SRC / "documents.parquet").to_pylist()
    rows.append(
        {
            "doc_id": RPT_ID0,
            "text": "ax0 ax1 " + REPEAT_BLOCK + " " + PLANTED + " ax2",
            "lang": "en",
            "source": "synthetic",
            "n_chars": 10,
        }
    )
    rows.append(
        {
            "doc_id": RPT_ID0 + 1,
            "text": "bz0 " + REPEAT_BLOCK + " bz1 bz2 " + PLANTED,
            "lang": "en",
            "source": "synthetic",
            "n_chars": 10,
        }
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), out / "documents.parquet")
    yield str(out)
    ops._PREPARED.clear()


def _cap_in_use(spark, sf_dir):
    docs = prepared(spark, sf_dir).table("documents")
    return dedup.derive_gram_cap(dedup._span_grams(docs))


@pytest.mark.parametrize("which", ["clean", "skewed"])
def test_gram_cap_in_use_equals_recommendation(spark, repeat_dir, which):
    sf_dir = str(SRC) if which == "clean" else repeat_dir
    in_use = _cap_in_use(spark, sf_dir)
    reco = (
        dedup.gram_cap_recommendation(spark, sf_dir)
        .select("cap")
        .distinct()
        .collect()
    )
    assert len(reco) == 1
    assert in_use == reco[0]["cap"]
    assert in_use >= dedup.DF_CAP_FLOOR


def test_within_doc_repetition_excluded_planted_span_kept(spark, repeat_dir):
    """The repeated block's grams (pn=800, df=2) must sit above the derived
    cap — no span between the two synthetic docs may come from it — while
    the ordinary planted 24-token run still surfaces with exact length."""
    assert _cap_in_use(spark, repeat_dir) < 800
    rows = [
        r
        for r in dedup.shared_substring_spans(spark, repeat_dir).collect()
        if r["doc_a"] == RPT_ID0 and r["doc_b"] == RPT_ID0 + 1
    ]
    assert rows, "planted span must be found"
    assert max(r["span_tokens"] for r in rows) == len(PLANTED.split())
    # the repeat block is 320 tokens long: any span from it would dwarf 24
    assert all(r["span_tokens"] <= len(PLANTED.split()) for r in rows)


@pytest.mark.parametrize(
    "name", ["shared_substring_spans", "winnow_candidates", "winnow_spans"]
)
def test_span_family_oracle_green_under_repetition_skew(spark, repeat_dir, name):
    r = compare(dedup.QUERIES[name](spark, repeat_dir), dedup.ORACLES[name], repeat_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "first_diffs"}


def test_winnow_spans_subset_of_spans(spark):
    """⊆: every winnow_spans row is a shared_substring_spans row (same
    offsets and length). ⊇ at the guarantee length: every standalone span of
    >= WINNOW_W + SPAN_GRAM_K - 1 tokens appears in winnow_spans (the
    winnowing guarantee names its pair, and the restricted join then finds
    the identical run). Both on sf0.001, where top-N truncation does not
    bind (fixture pair count < SPAN_TOP_N)."""
    key = lambda r: (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_tokens"])
    full = {key(r) for r in dedup.shared_substring_spans(spark, str(SRC)).collect()}
    comp = {key(r) for r in dedup.winnow_spans(spark, str(SRC)).collect()}
    assert comp, "fixture must yield composed spans"
    assert comp <= full, comp - full
    t = dedup.WINNOW_W + dedup.SPAN_GRAM_K - 1
    guaranteed = {k for k in full if k[4] >= t}
    assert guaranteed, "fixture must contain runs above the guarantee length"
    missing = guaranteed - comp
    assert not missing, missing


def test_span_removal_plan_semantics(spark):
    """The removal plan's contract, re-derived from the span relation it
    consumes: (1) intervals are per-doc disjoint AND non-adjacent (merged
    maximally — no two intervals a gaps-and-islands pass should have
    joined); (2) every guaranteed-length span's doc_b occurrence is fully
    covered by some interval; (3) no doc_a-side-only doc carries an
    interval (keep-lowest-id: a doc that is never the higher id of a pair
    loses nothing); (4) interval bounds sit inside the doc's token count."""
    from pyspark.sql import functions as F

    plan = dedup.span_removal_plan(spark, str(SRC)).collect()
    assert plan, "fixture must yield removal intervals"
    by_doc: dict = {}
    for r in plan:
        assert r["rm_end"] > r["rm_start"] >= 0
        assert r["rm_tokens"] == r["rm_end"] - r["rm_start"]
        by_doc.setdefault(r["doc_id"], []).append((r["rm_start"], r["rm_end"]))
    for doc, ivs in by_doc.items():
        assert ivs == sorted(ivs), doc  # plan is ordered
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert s2 > e1, (doc, (s1, e1), (s2, e2))  # disjoint, gap > 0

    t = dedup.SPAN_GUARANTEE_TOKENS
    spans = [
        r
        for r in dedup._winnow_runs(spark, str(SRC)).collect()
        if r["span_tokens"] >= t
    ]
    assert spans
    docs_b = set()
    for r in spans:
        docs_b.add(r["doc_b"])
        covered = any(
            s <= r["start_b"] and r["start_b"] + r["span_tokens"] <= e
            for s, e in by_doc.get(r["doc_b"], [])
        )
        assert covered, (r["doc_b"], r["start_b"], r["span_tokens"])
    # only duplicate-side docs carry intervals
    assert set(by_doc) == docs_b

    # bounds: every interval fits inside its doc's whitespace token count
    docs = prepared(spark, str(SRC)).table("documents")
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).alias("n"),
        ).collect()
    }
    for doc, ivs in by_doc.items():
        assert ivs[-1][1] <= ntok[doc], (doc, ivs[-1], ntok[doc])
    ops._PREPARED.clear()


def test_span_removal_apply_consistency(spark):
    """The apply step executes the plan exactly: per affected doc,
    n_tokens_before − n_tokens_removed tokens survive into clean_text, the
    cleaned token stream equals the original with the plan's intervals
    deleted (numpy-free re-derivation from the plan itself), and the
    affected-doc set matches the plan's."""
    plan = dedup.span_removal_plan(spark, str(SRC)).collect()
    applied = {r["doc_id"]: r for r in dedup.span_removal_apply(spark, str(SRC)).collect()}
    by_doc: dict = {}
    for r in plan:
        by_doc.setdefault(r["doc_id"], []).append((r["rm_start"], r["rm_end"]))
    assert set(applied) == set(by_doc)

    docs = prepared(spark, str(SRC)).table("documents")
    texts = {
        r["doc_id"]: r["text"].split()
        for r in docs.collect()
        if r["doc_id"] in by_doc
    }
    for doc, row in applied.items():
        toks = texts[doc]
        ivs = by_doc[doc]
        expect = [
            t for i, t in enumerate(toks)
            if not any(s <= i < e for s, e in ivs)
        ]
        assert row["n_tokens_before"] == len(toks)
        assert row["n_tokens_before"] - row["n_tokens_removed"] == len(expect)
        assert row["clean_text"].split() == expect, doc
    ops._PREPARED.clear()
