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


def _bands_py(text):
    """Independent pure-Python replica of the engine's MinHash banding
    (operators/dedup: _norm_text → 5-gram shingles → 12 md5 minima → 4 band
    sigs)."""
    import hashlib
    import re

    toks = [t for t in re.sub(r"\s+", " ", text).lower().split(" ") if t]
    shingles = {" ".join(toks[i : i + 5]) for i in range(max(len(toks) - 4, 0))}
    if not shingles:
        return set()
    mh = [
        min(hashlib.md5(f"{seed}:{sh}".encode()).hexdigest() for sh in shingles)
        for seed in range(12)
    ]
    return {
        (b, hashlib.md5("".join(mh[b * 3 : (b + 1) * 3]).encode()).hexdigest())
        for b in range(4)
    }


def _expected_neardup_admission(drops):
    """Greedy per-drop admission under the module's rule: reject on any band
    shared with the admitted index or with a lower-id doc in the same drop."""
    index, admitted = set(), []
    for drop in drops:
        bands = {d["doc_id"]: _bands_py(d["text"]) for d in drop}
        rejected = {
            did
            for did, bs in bands.items()
            if (bs & index)
            or any(o < did and (bs & obs) for o, obs in bands.items() if o != did)
        }
        for did in sorted(bands):
            if did not in rejected:
                index |= bands[did]
                admitted.append(did)
    return sorted(admitted)


def test_stream_neardup_admission_matches_reference(spark, tmp_path):
    from s3bigdatasync_spark.streaming.ingest import stream_neardup_ingest

    inc = tmp_path / "incoming"
    drop1 = [
        _doc(0, GOOD),
        _doc(1, GOOD2),
        _doc(2, GOOD),  # exact in-batch dup of 0 → rejected (lower id wins)
    ]
    drop2 = [
        _doc(10, GOOD),  # cross-batch dup of admitted 0 → rejected
        _doc(11, "a new tale of the old mill by the river bend at dawn light"),
        _doc(12, "too short"),  # < 5 tokens: no bands, always admitted
    ]
    _write(inc, drop1, "a.json")
    q = stream_neardup_ingest(
        spark,
        str(inc),
        str(tmp_path / "corpus"),
        str(tmp_path / "index"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    _write(inc, drop2, "b.json")
    q = stream_neardup_ingest(
        spark,
        str(inc),
        str(tmp_path / "corpus"),
        str(tmp_path / "index"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(180)

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    )
    assert got == _expected_neardup_admission([drop1, drop2])
    assert got == [0, 1, 11, 12]
    # the index holds bands only for admitted, shingleable docs
    idx = spark.read.parquet(str(tmp_path / "index"))
    assert sorted(
        r["doc_id"] for r in idx.select("doc_id").distinct().collect()
    ) == [0, 1, 11]


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


def test_read_corpus_survives_replayed_append(spark, tmp_path):
    """The corpus-append/seen-commit crash window makes the corpus dir
    at-least-once; read_corpus() must return exactly-once rows. Simulated by
    re-appending a drained corpus's own rows (what a foreachBatch replay of
    an uncommitted batch does — byte-identical duplicates)."""
    from s3bigdatasync_spark.streaming.ingest import read_corpus

    inc = tmp_path / "incoming"
    _write(inc, [_doc(0, GOOD), _doc(1, GOOD2)], "a.json")
    _drain(spark, tmp_path)
    corpus_dir = str(tmp_path / "corpus")
    once = spark.read.parquet(corpus_dir)
    rows_before = sorted(r["doc_id"] for r in once.collect())
    once.write.mode("append").parquet(corpus_dir)  # the replayed append
    assert spark.read.parquet(corpus_dir).count() == 2 * len(rows_before)
    assert (
        sorted(r["doc_id"] for r in read_corpus(spark, corpus_dir).collect())
        == rows_before
    )


def test_crash_between_corpus_append_and_seen_commit(spark, tmp_path):
    """The sink's documented kill window: admitted docs appended to the
    corpus, killed BEFORE the seen-log commit. The checkpoint never saw the
    batch either, so a restart REDELIVERS it in full: the same admitted
    rows append again (at-least-once raw), the seen-log commits once, and
    read_corpus() — the exactly-once view — must equal the batch oracle
    with no doc admitted twice and no doc lost (r6 verdict item 5)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from s3bigdatasync_spark.streaming.ingest import (
        DOC_STREAM_SCHEMA,
        _gated,
        _seen_hashes,
        read_corpus,
    )

    inc = tmp_path / "incoming"
    _write(inc, [_doc(0, GOOD), _doc(1, BAD)], "a.json")
    _drain(spark, tmp_path)

    # drop B lands; hand-run the sink's FIRST write only (corpus append),
    # exactly as the real sink computes it — then "crash" before the
    # seen-log write. doc 10 = cross-batch dup (stays out), 12 = new good.
    docs_b = [_doc(10, GOOD), _doc(12, GOOD2)]
    _write(inc, docs_b, "b.json")
    bdf = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["lang"], d["source"]) for d in docs_b],
        DOC_STREAM_SCHEMA,
    )
    seen = _seen_hashes(spark, str(tmp_path / "seen"))
    gated = _gated(bdf)
    first = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy("content_hash")
    )
    fresh = (
        gated.withColumn("batch_first", first)
        .filter("batch_first")
        .drop("batch_first")
        .join(seen.select("content_hash"), "content_hash", "left_anti")
    )
    admitted = fresh.filter(F.col("quality_keep") & (F.col("pred_lang") != "und"))
    admitted.drop("quality_keep").write.mode("append").parquet(
        str(tmp_path / "corpus")
    )
    # CRASH here: no seen-log row for batch 1, checkpoint knows nothing

    _drain(spark, tmp_path)  # restart: full redelivery of drop B

    raw = spark.read.parquet(str(tmp_path / "corpus"))
    # the replay re-appended doc 12: raw corpus is at-least-once...
    assert raw.filter(F.col("doc_id") == 12).count() == 2
    # ...and the exactly-once view equals the batch oracle
    got = sorted(
        r["doc_id"] for r in read_corpus(spark, str(tmp_path / "corpus")).collect()
    )
    expect = sorted(r["doc_id"] for r in batch_equivalent(spark, str(inc)).collect())
    assert got == expect == [0, 12]
    # the seen-log committed batch 1 exactly once (GOOD2's one fresh hash)
    seen_after = spark.read.parquet(str(tmp_path / "seen"))
    assert seen_after.groupBy("content_hash").count().filter("count > 1").count() == 0
