"""Streaming corpus admission: stream-over-drops == batch gates + first-seen
exact dedup, and checkpoint-loss replays are no-ops (seen-log batch guard)."""

from __future__ import annotations

import json

from s3bigdatasync_spark.streaming.ingest import batch_equivalent, stream_corpus_ingest

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "to find a warm den of rest"
)
GOOD2 = (
    "a calm river flows to the sea and carries the old boat past "
    "wide green fields of corn"
)
BAD = "!!! ??? ***"  # fails quality gate (punct ratio, token count)


def _write(path, docs, fname):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / fname, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def _doc(i, text, source="web"):
    return {"doc_id": i, "text": text, "lang": "en", "source": source}


def _drain(spark, tmp_path, ck="ck"):
    q = stream_corpus_ingest(
        spark,
        str(tmp_path / "incoming"),
        str(tmp_path / "corpus"),
        str(tmp_path / "seen"),
        str(tmp_path / ck),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)


def test_stream_matches_batch_admission(spark, tmp_path):
    inc = tmp_path / "incoming"
    # drop 1: two good docs (one duplicated within the batch), one bad doc
    _write(
        inc,
        [_doc(0, GOOD), _doc(1, GOOD2), _doc(2, GOOD2), _doc(3, BAD)],
        "a.json",
    )
    _drain(spark, tmp_path)
    # drop 2: a cross-batch duplicate of doc 0, a duplicate of the REJECTED
    # bad doc (must stay out: hash already seen), and a new good doc
    _write(
        inc,
        [_doc(10, GOOD), _doc(11, BAD), _doc(12, GOOD + " again tonight")],
        "b.json",
    )
    _drain(spark, tmp_path)

    got = spark.read.parquet(str(tmp_path / "corpus"))
    expect = batch_equivalent(spark, str(inc))
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in expect.collect()
    )
    # 0, 1 admitted; 2 within-batch dup; 3 bad; 10 cross-batch dup;
    # 11 dup-of-rejected; 12 new
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 12]
    # the seen-log accumulated every fresh hash, including the rejected one
    seen = spark.read.parquet(str(tmp_path / "seen"))
    assert seen.count() == 4  # GOOD, GOOD2, BAD, GOOD+again


def test_checkpoint_loss_replay_is_noop(spark, tmp_path):
    inc = tmp_path / "incoming"
    _write(inc, [_doc(0, GOOD), _doc(1, BAD)], "a.json")
    _write(inc, [_doc(2, GOOD2)], "b.json")
    _drain(spark, tmp_path)
    before = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect())

    # checkpoint wiped → the stream replays every file from batch 0; the
    # seen-log's batch_id guard must skip them all
    _drain(spark, tmp_path, ck="ck2")
    after = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect())
    assert after == before == [0, 2]
    seen = spark.read.parquet(str(tmp_path / "seen"))
    assert seen.count() == 3
