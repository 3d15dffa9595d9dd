#!/usr/bin/env python
"""Scaling-slope probe: measure headline inventory queries at sf0.1 and at a
synthetic 10x replication of it, and report the time ratio per query.

A plan that "would survive 100 TB" must first survive 10x: fixed overhead
should amortize (ratio << 10) and nothing should blow up super-linearly
(ratio > 10 means a shuffle/window/join whose cost grows faster than data).
The replicated table keeps the key space disjoint per copy (orderkey offset)
so join/groupBy cardinalities scale with the data like a real bigger bucket.

Usage: python tools/scale_probe.py [--copies 10] [--out /tmp/scale_probe]
Prints one JSON line: {"sf01": {...}, "scaled": {...}, "ratio": {...}}.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path

import sys

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

BASE_SF = "/root/testdata/sf0.1"

# Document/embedding-shaped queries (dedup + text + similarity families).
DOC_QUERIES = [
    "exact_dedup",
    "token_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "span_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "dedup_clusters",
    "tfidf_top_terms",
    "corpus_yield_report",
    "ann_topk_bruteforce",
    "lsh_buckets",
    "kmeans_lloyd",
    "semantic_dedup",
    "embedding_neardup",
    # round-2 batch C
    "pq_encode",
    "pq_search",
    "ivf_pq_search",
    "unigram_logprob",
    "vocab_coverage",
    "source_kl_divergence",
    "minhash_calibration",
    # round-3 batch
    "dedup_canonical",
    "containment_pairs",
    "split_leakage_check",
    "temperature_mix_weights",
    "boilerplate_report",
    # round-8 batch
    "perplexity_buckets",
    "ivf_recall_audit",
    "dedup_yield_curve",
    "mix_temperature_sweep",
    "pq_distortion",
    "ivf_nprobe_curve",
    # round-9 batch: the r8 tail the verdict flagged unprobed, the minhash/
    # band family (100x target), and the retrained-PQ audit
    "span_removal_plan",
    "span_removal_apply",
    "hard_negative_recall",
    "lsh_band_plan",
    "minhash_signatures",
    "pq_code_balance",
    "ann_topk_batch",
    "ann_topk_batch_lsh",
    "ivf_cell_balance",
    "cluster_chain_audit",
    # round-12 batch: the r11 full-projection-cache question (verdict item 6)
    "coreset_kcenter",
    # round-10 batch: perceptual media near-dup + packed PQ codes
    "media_fingerprint",
    "media_near_pairs",
    "media_near_pairs_capped",
    "media_canonical",
    "pq_pack",
    # round-11 batch: the media band-geometry planner (its ground-truth leg
    # IS the uncapped 4x16 pair join, so it inherits that audit-tier slope)
    "media_band_plan",
]

# Event-shaped queries (time windows, sessions, behavior, copy-log ops).
EVENT_QUERIES = [
    "time_rollup",
    "hwm_incremental",
    "time_spine_zero_fill",
    "sessionize",
    "throughput_timeline",
    "funnel_steps",
    "retention_cohorts",
    "rolling_anomaly",
    "ewma_smooth",
    "events_pivot",
    "retry_worklist",
    "salted_hot_key_agg",
    "asof_last_success",
    "event_type_affinity",
]

# Inventory-shaped headline queries (all derive from lineitem).
PROBE_QUERIES = [
    "size_histogram",
    "inventory_stats",
    "inventory_diff",
    "diff_summary",
    "task_batches",
    "dedup_anti_join",
    "snapshot_history",
    "retention_sweep",
    "hot_prefix_report",
    "restore_plan",
    "table_checksum",
    "compaction_plan",
    "transfer_cost_estimate",
    # round-3 batch
    "mpu_orphan_sweep",
    "lifecycle_transition_plan",
    "bucket_skew_audit",
    # round-8 batch
    "shard_rebalance_plan",
]


def build_scaled_dir(spark, out_dir: str, copies: int) -> None:
    """Replicate lineitem x copies with disjoint orderkey ranges; link the
    other base tables unchanged (the probe queries never touch them, but
    view registration reads all of them)."""
    from pyspark.sql import functions as F

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    li = spark.read.parquet(f"{BASE_SF}/lineitem.parquet")
    offset = 1_000_000_000
    scaled = None
    for i in range(copies):
        c = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * offset))
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "events",
        "documents",
        "embeddings",
    ):
        src = Path(f"{BASE_SF}/{t}.parquet")
        dst = out / f"{t}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


BOILER_BLOCK = " ".join(f"boilertok{i}" for i in range(8))  # 8 tokens → 4 shingles


def build_scaled_docs_dir(
    spark, out_dir: str, copies: int, boiler_frac: float = 0.0
) -> None:
    """Replicate documents + embeddings x copies WITHOUT creating cross-copy
    near-duplicate cliques (naive replication makes every doc a `copies`-
    clique, which measures the data's pathology, not the plans):
      * documents: a per-copy tag token is interleaved every 4 tokens, so
        every k-shingle window of copy i contains the tag and shingle sets
        are disjoint across copies — within-copy duplicate structure
        replicates, cross-copy pairs never fire.
      * embeddings: dimensions rotate by i per copy — a rotation of a
        cluster-structured vector is uncorrelated with the original, so the
        copy's cluster structure replicates without cross-copy neighbors.
    Other tables link unchanged (view registration reads all of them).

    boiler_frac > 0 appends the SAME UNTAGGED boilerplate block to that
    fraction of docs in EVERY copy — the one shingle family whose df grows
    linearly with corpus size (site chrome / license headers). This breaks
    the disjointness-by-construction that made the round-3 probes blind to
    df skew: the boiler shingles' candidate fan-out is quadratic in copies
    for the uncapped pair joins, bounded for the DF_CAP'd ones."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    docs = pq.read_table(f"{BASE_SF}/documents.parquet").to_pylist()
    emb = pq.read_table(f"{BASE_SF}/embeddings.parquet").to_pylist()
    id_off = 10_000_000

    def tag_text(text: str, i: int) -> str:
        if i == 0:
            return text
        toks = text.split(" ")
        tag = f"zz{i}q"
        outk = []
        for j, t in enumerate(toks):
            outk.append(t)
            if j % 4 == 3:
                outk.append(tag)
        return " ".join(outk)

    boiler_mod = int(round(boiler_frac * 100))
    drows = []
    for i in range(copies):
        for j, r in enumerate(docs):
            rr = dict(r)
            rr["doc_id"] = r["doc_id"] + i * id_off
            rr["text"] = tag_text(r["text"], i)
            if boiler_mod and j % 100 < boiler_mod:
                rr["text"] = rr["text"] + " " + BOILER_BLOCK
            drows.append(rr)
    # row_group_size matters: pyarrow's default (1M rows) would put the whole
    # scaled corpus in ONE row group, and a row group is Spark's atomic scan
    # split - every scan stage would single-thread through one fat task and
    # the probe would measure that artifact, not the plan (caught live in
    # round 9: a 100x minhash probe ground one core for 10+ minutes while 31
    # sat idle). 10k rows/group = 50 parallel splits at 100x, the shape a
    # real multi-file corpus has for free.
    pq.write_table(
        pa.Table.from_pylist(drows, schema=pq.read_schema(f"{BASE_SF}/documents.parquet")),
        str(out / "documents.parquet"),
        row_group_size=10_000,
    )

    erows = []
    for i in range(copies):
        for r in emb:
            rr = dict(r)
            rr["vec_id"] = r["vec_id"] + i * id_off
            v = list(r["embedding"])
            k = i % len(v)
            rr["embedding"] = v[k:] + v[:k]
            erows.append(rr)
    pq.write_table(
        pa.Table.from_pylist(erows, schema=pq.read_schema(f"{BASE_SF}/embeddings.parquet")),
        str(out / "embeddings.parquet"),
        row_group_size=10_000,
    )

    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ):
        src = Path(f"{BASE_SF}/{t}.parquet")
        dst = out / f"{t}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


def build_scaled_events_dir(spark, out_dir: str, copies: int) -> None:
    """Replicate events x copies: each copy's users get a disjoint id range
    and its timestamps shift by a whole day, so sessions, funnels, cohorts,
    and tumbling windows replicate within copies without cross-copy
    interference — more users, more days, more windows: the way an event
    stream actually grows. Vectorized pyarrow; other tables link unchanged."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    t = pq.read_table(f"{BASE_SF}/events.parquet")
    parts = []
    for i in range(copies):
        tt = t
        tt = tt.set_column(
            tt.schema.get_field_index("event_id"),
            "event_id",
            pc.add(tt["event_id"], pa.scalar(i * 10_000_000, pa.int64())),
        )
        tt = tt.set_column(
            tt.schema.get_field_index("user_id"),
            "user_id",
            pc.add(tt["user_id"], pa.scalar(i * 1_000_000, pa.int64())),
        )
        tt = tt.set_column(
            tt.schema.get_field_index("ts"),
            "ts",
            pc.add(tt["ts"], pa.scalar(i * 86_400_000_000, pa.duration("us"))),
        )
        parts.append(tt)
    pq.write_table(pa.concat_tables(parts), str(out / "events.parquet"))

    for tname in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "documents",
        "embeddings",
    ):
        src = Path(f"{BASE_SF}/{tname}.parquet")
        dst = out / f"{tname}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


def run_pq_decompose(spark, out_dir: str, copies: int) -> dict:
    """Round-11 verdict item 5: the r10 probe read pq_pack at 20.3x under
    100x data and attributed it to 'the shared PQ training chain' — but the
    r9 chain measured 4.9x, so one of the legs grew unexplained. Time each
    leg separately at 1x and copies-x:

      train_s   — _train_codebook alone (the Lloyd loop's O(n)/round scans
                  + driver collects; also what every cold registry query
                  re-pays, since the codebook memo is query-scoped)
      encode_s  — _assign_codes over an ALREADY-trained codebook (steady
                  noop-write, bench methodology)
      pack_s    — _pack_from_codes over eagerly checkpointed codes (the
                  pack aggregation alone, no training, no encode)
      total_s   — the registry pq_pack query end-to-end (what BENCH and the
                  r10 probe measured: training + encode + pack)
    """
    from s3bigdatasync_spark.operators import _PREPARED, prepared, release_caches
    from s3bigdatasync_spark.operators import pq

    build_scaled_docs_dir(spark, out_dir, copies)

    def steady(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    res: dict = {}
    for tag, sf in (("base", BASE_SF), ("scaled", out_dir)):
        _PREPARED.clear()
        release_caches()
        emb = prepared(spark, sf).table("embeddings")
        t0 = time.perf_counter()
        C, _q = pq._train_codebook(spark, emb, return_query=True)
        train_s = round(time.perf_counter() - t0, 3)
        codes = pq._assign_codes(emb, spark, C)
        encode_s = steady(codes)
        pinned = codes.localCheckpoint(eager=True)
        pack_s = steady(pq._pack_from_codes(pinned))
        from s3bigdatasync_spark import registry

        fn = registry.full_queries()["pq_pack"]
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        total_s = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        res[tag] = {
            "train_s": train_s,
            "encode_s": encode_s,
            "pack_s": pack_s,
            "total_s": total_s,
        }
    res["ratio"] = {
        k: round(res["scaled"][k] / res["base"][k], 2) if res["base"][k] else None
        for k in res["base"]
    }
    _PREPARED.clear()
    release_caches()
    return res


def measure(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    """Warm-measure (bench.py methodology): compile+warm run, clear caches,
    report the second, cold-cache execution."""
    from s3bigdatasync_spark import registry
    from s3bigdatasync_spark.operators import _PREPARED

    queries = registry.full_queries()
    out: dict[str, float] = {}
    _PREPARED.clear()  # force view re-registration on this sf_dir
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    _PREPARED.clear()
    return out


def run_docs_knobs(spark, out_dir: str, copies: int) -> dict:
    """Prove the quadratic-work knobs on the two Σ|bucket|²-shaped operators:
    at `copies`× vectors, measure embedding_neardup with the DEFAULT band
    width vs log2-scaled width, and semantic_dedup with the DEFAULT K vs
    n-proportional K. The claim under test: bucket/cluster count must track
    corpus size, and when it does, the slope returns to ~linear."""
    import math

    from s3bigdatasync_spark.operators import _PREPARED
    from s3bigdatasync_spark.operators.dedup import EMB_BAND_BITS, embedding_neardup
    from s3bigdatasync_spark.operators.similarity import (
        KMEANS_K,
        N_PLANES,
        hard_negative_mining,
        semantic_dedup,
    )

    build_scaled_docs_dir(spark, out_dir, copies)
    scaled_bits = EMB_BAND_BITS + math.ceil(math.log2(copies))
    scaled_k = KMEANS_K * copies
    hardneg_scaled_bits = N_PLANES + math.ceil(math.log2(copies))

    def steady(mk) -> float:
        mk().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    _PREPARED.clear()
    res = {
        "emb_default_bits_s": steady(lambda: embedding_neardup(spark, out_dir)),
        "emb_scaled_bits": scaled_bits,
        "emb_scaled_bits_s": steady(
            lambda: embedding_neardup(spark, out_dir, band_bits=scaled_bits)
        ),
        "sem_default_k_s": steady(lambda: semantic_dedup(spark, out_dir)),
        "sem_scaled_k": scaled_k,
        "sem_scaled_k_s": steady(lambda: semantic_dedup(spark, out_dir, k=scaled_k)),
        "hardneg_default_bits_s": steady(lambda: hard_negative_mining(spark, out_dir)),
        "hardneg_scaled_bits": hardneg_scaled_bits,
        "hardneg_scaled_bits_s": steady(
            lambda: hard_negative_mining(spark, out_dir, band_bits=hardneg_scaled_bits)
        ),
    }
    _PREPARED.clear()
    return res


BOILER_QUERIES = [
    "containment_pairs",  # uncapped — expected superlinear under df skew
    "ngram_jaccard_pairs",  # uncapped — same join, same exposure
    "containment_pairs_capped",  # DF_CAP'd — the claim: slope stays ~linear
    "ngram_jaccard_pairs_capped",
    "split_leakage_check",
    "boilerplate_report",
    "shared_substring_spans",  # derived-cap postings join: boiler grams
    # exceed the pn cap as copies grow and drop OUT of the pairing
    "winnow_candidates",  # the 2/(W+1)-density fingerprint index, same cap
    "winnow_spans",  # index->exact composition: candidate-restricted spans
]


def run_docs_boiler(
    spark, out_dir: str, copies: int, boiler_frac: float, capped_only: bool = False
) -> dict:
    """Measure the shingle-join family under REALISTIC df skew: both the 1×
    and the copies× corpus carry the same untagged boilerplate block in
    boiler_frac of their docs, so the only thing that changes between the
    two measurements is corpus size — and the boiler shingles' df grows with
    it (250 → 250·copies at sf0.1/5%). The r3 probes kept shingle sets
    disjoint by construction and therefore could not see this axis.

    capped_only drops the two UNCAPPED joins from the run: at 100×/5% each
    boiler shingle's df is 25k, so the uncapped equi-join materializes
    ~625M candidate rows PER boiler shingle (~22B total) — the measured
    12–15.4× superlinear 30× slope extrapolates to hours, which is the
    pathology the capped family exists to avoid, not a number worth
    waiting for."""
    names = (
        [q for q in BOILER_QUERIES if q not in ("containment_pairs", "ngram_jaccard_pairs")]
        if capped_only
        else BOILER_QUERIES
    )
    base_dir = out_dir + "_b1"
    build_scaled_docs_dir(spark, base_dir, 1, boiler_frac=boiler_frac)
    build_scaled_docs_dir(spark, out_dir, copies, boiler_frac=boiler_frac)
    base = measure(spark, base_dir, names)
    scaled = measure(spark, out_dir, names)
    ratio = {k: round(scaled[k] / base[k], 2) if base[k] else None for k in base}
    # winnow index density AT SCALE: fingerprints / postings should hold the
    # theoretical 2/(W+1) regardless of corpus size (r6 measured it on the
    # real corpus only; the scaled corpus re-confirms under boiler skew)
    from s3bigdatasync_spark.operators import _PREPARED, dedup, prepared

    _PREPARED.clear()
    docs = prepared(spark, out_dir).table("documents")
    postings = dedup._span_grams(docs).count()
    fps = dedup._winnow_fps(dedup._span_grams(docs)).count()
    _PREPARED.clear()
    density = {
        "postings": postings,
        "fingerprints": fps,
        "density": round(fps / postings, 4) if postings else None,
        "theory": round(2 / (dedup.WINNOW_W + 1), 4),
    }
    return {
        "boiler_frac": boiler_frac,
        "base1x": base,
        "scaled": scaled,
        "ratio": ratio,
        "winnow_density_scaled": density,
    }


def run_resolve(spark, out_dir: str, copies: int) -> dict:
    """Scale the ENTITY-RESOLUTION input the way real catalogs grow: `copies`×
    the records, SAME name dictionary (more SKUs, not more distinct names —
    the sf0.1 part table already holds 20k records over 64 names). The claim
    under test: the dictionary-factorized matchers (qgram/segments) cost is
    driven by |dictionary|, so 10× records should be near-flat, while the
    record-level attribute matcher's blocks grow 10× and its pair count
    ~100×."""
    from pyspark.sql import functions as F

    from s3bigdatasync_spark.operators import _PREPARED, resolve

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    part = spark.read.parquet(f"{BASE_SF}/part.parquet")
    offset = 10_000_000
    scaled = None
    for i in range(copies):
        c = part.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * offset))
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled.write.mode("overwrite").parquet(f"{out_dir}/part.parquet")
    for t in (
        "region", "nation", "customer", "supplier", "orders", "lineitem",
        "events", "documents", "embeddings",
    ):
        src = Path(f"{BASE_SF}/{t}.parquet")
        dst = out / f"{t}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)

    def steady(fn, sf) -> float:
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    res: dict = {}
    for name in ("fuzzy_match_pairs", "fuzzy_match_qgram", "fuzzy_match_segments"):
        fn = getattr(resolve, name)
        _PREPARED.clear()
        base = steady(fn, BASE_SF)
        _PREPARED.clear()
        sc = steady(fn, out_dir)
        res[name] = {"base_s": base, "scaled_s": sc, "ratio": round(sc / base, 2)}
    _PREPARED.clear()
    return res


def _diff(src, dst):
    from pyspark.sql import functions as F

    s = src.select(
        "key", F.col("size").alias("src_size"), F.col("etag").alias("src_etag")
    )
    d = dst.select(
        "key", F.col("size").alias("dst_size"), F.col("etag").alias("dst_etag")
    )
    return (
        s.join(d, "key", "full_outer")
        .withColumn(
            "variance",
            F.when(F.col("dst_etag").isNull(), "New")
            .when(F.col("src_etag").isNull(), "Delete")
            .when(
                (F.col("src_etag") != F.col("dst_etag"))
                | (F.col("src_size") != F.col("dst_size")),
                "Update",
            )
            .otherwise("Same"),
        )
        .filter(F.col("variance") != "Same")
    )


def run_bucketed(spark, out_dir: str, copies: int) -> dict:
    """Measure the flagship diff on PLAIN vs KEY-BUCKETED snapshot layout at
    `copies`× scale — the claim 'bucketing removes the exchange' as a
    wall-clock number instead of a plan assertion. Also measures the rest of
    the key-partitioned inventory family (snapshot_history, retention_sweep)
    on the same two layouts, and dedup_anti_join as the honest non-example
    (global numbering is range-, not hash-, shaped)."""
    from pyspark.sql import functions as F
    from s3bigdatasync_spark.operators import _PREPARED, prepared

    build_scaled_dir(spark, out_dir, copies)
    _PREPARED.clear()
    src = prepared(spark, out_dir).table("inventory_src").select("key", "size", "etag")
    dst = spark.table("inventory_dst").select("key", "size", "etag")

    plain = {}
    for name, df in (("p_src", src), ("p_dst", dst)):
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
        plain[name] = spark.read.parquet(f"{out_dir}/{name}")
    for name, df in (("b_src", src), ("b_dst", dst)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(32, "key")
            .sortBy("key")
            .option("path", f"{out_dir}/{name}")
            .saveAsTable(name)
        )

    def steady(df) -> float:
        # median of 3 measured runs after one compile run: single samples at
        # this scale swing with GC/page-cache state (a lone retention_sweep
        # sample once read 1.8x slower-bucketed; the median showed parity)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return round(samples[1], 3)

    def exchanges(df) -> int:
        return (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .count("Exchange hashpartitioning")
        )

    d_plain = _diff(plain["p_src"], plain["p_dst"])
    d_bucket = _diff(spark.table("b_src"), spark.table("b_dst"))
    res = {
        "plain_s": steady(d_plain),
        "bucketed_s": steady(d_bucket),
        "plain_exchanges": exchanges(d_plain),
        "bucketed_exchanges": exchanges(d_bucket),
    }

    # --- the rest of the key-partitioned inventory family --------------------
    # snapshot_history / retention_sweep: one window + two aggs all keyed by
    # `key` — a key-bucketed VERSIONS store feeds that partitioning directly.
    from s3bigdatasync_spark.operators.timeline import _versions, collapse_runs, _N_VERSIONS

    versions = _versions(spark, out_dir)
    versions.write.mode("overwrite").parquet(f"{out_dir}/p_versions")
    spark.sql("DROP TABLE IF EXISTS b_versions")
    (
        versions.write.bucketBy(32, "key")
        .sortBy("key", "v", "etag")
        .option("path", f"{out_dir}/b_versions")
        .saveAsTable("b_versions")
    )
    p_ver = spark.read.parquet(f"{out_dir}/p_versions")
    b_ver = spark.table("b_versions")

    def sweep(runs):
        return (
            runs.filter(F.col("v_to") < _N_VERSIONS)
            .groupBy(F.col("v_to").cast("int").alias("expire_after_v"))
            .agg(F.count("*").alias("n_versions"), F.sum("size").alias("bytes_reclaimable"))
        )

    for name, mk in (
        ("snapshot_history", collapse_runs),
        ("retention_sweep", lambda v: sweep(collapse_runs(v))),
    ):
        dp, db = mk(p_ver), mk(b_ver)
        res[f"{name}_plain_s"] = steady(dp)
        res[f"{name}_bucketed_s"] = steady(db)
        res[f"{name}_plain_exchanges"] = exchanges(dp)
        res[f"{name}_bucketed_exchanges"] = exchanges(db)

    # dedup_anti_join: the batching needs a GLOBAL ORDER (contiguous row
    # numbers), which hash-bucketing cannot supply — with_global_order's
    # boundary-discovery range pass and the hash exchange on the derived
    # range id remain regardless of layout. Measured anyway so the claim
    # "bucketing removes the inventory family's shuffles" stays honest about
    # where it does NOT apply; the at-scale lever for global numbering is a
    # range-SORTED layout whose per-file min/max + row counts come from the
    # table format's manifest (Delta/Iceberg), not hash buckets.
    from s3bigdatasync_spark.operators.prefix import with_global_order

    def batches(inv):
        ranked = with_global_order(inv, ["key", "size"])
        b = (
            ranked.withColumn("batch_id", F.expr("global_rn div 100"))
            .groupBy("batch_id")
            .agg(
                F.count("*").alias("n_objects"),
                F.sum("size").alias("batch_size"),
                F.md5(
                    F.concat_ws(
                        ",", F.sort_array(F.collect_list(F.concat_ws("#", "key", "etag")))
                    )
                ).alias("msg_id"),
            )
        )
        sent = b.filter(F.col("batch_id") % 3 == 0).select("msg_id")
        return b.join(F.broadcast(sent), "msg_id", "left_anti")

    da_p, da_b = batches(plain["p_src"]), batches(spark.table("b_src"))
    res["dedup_anti_join_plain_s"] = steady(da_p)
    res["dedup_anti_join_bucketed_s"] = steady(da_b)
    res["dedup_anti_join_plain_exchanges"] = exchanges(da_p)
    res["dedup_anti_join_bucketed_exchanges"] = exchanges(da_b)

    for name in ("b_src", "b_dst", "b_versions"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    return res


def run_skew(spark, out_dir: str, copies: int) -> dict:
    """Hot-key skew: replicate copy_log ×copies with 30% of all rows
    collapsed onto ONE object key, then measure 'latest attempt per key'
    two ways — the naive per-key window (row_number) vs the shipped
    map-side-combinable max(struct) shape (operators/timeline.retry_worklist's
    documented design choice). The window sorts the hot key's entire volume
    in one task; the agg collapses it map-side before the shuffle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from s3bigdatasync_spark.operators import _PREPARED, prepared

    _PREPARED.clear()
    log = prepared(spark, BASE_SF).table("copy_log").select(
        "object_key", "replication_time", "replication_status", "size", "etag"
    )
    parts = []
    for i in range(copies):
        c = log.withColumn(
            "object_key",
            F.when(F.crc32(F.col("etag").cast("binary")) % 10 < 3, F.lit("HOT"))
            .otherwise(F.concat(F.col("object_key"), F.lit(f"#c{i}"))),
        )
        parts.append(c)
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    path = f"{out_dir}/copy_log_skewed"
    scaled.write.mode("overwrite").parquet(path)
    sk = spark.read.parquet(path)

    ts = F.col("replication_time").cast("long")
    wk = Window.partitionBy("object_key").orderBy(F.desc(ts), F.desc("etag"))
    via_window = (
        sk.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select("object_key", ts.alias("last_ts"), "replication_status")
    )
    via_agg = (
        sk.groupBy("object_key")
        .agg(
            F.max(
                F.struct(ts.alias("ts"), F.col("etag"), F.col("replication_status").alias("st"))
            ).alias("last")
        )
        .select("object_key", F.col("last.ts").alias("last_ts"), F.col("last.st"))
    )

    def steady(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    n_hot = sk.filter(F.col("object_key") == "HOT").count()
    return {
        "rows": sk.count(),
        "hot_rows": n_hot,
        "window_s": steady(via_window),
        "max_struct_s": steady(via_agg),
    }



def run_rangelayout(spark, out_dir: str, copies: int) -> dict:
    """Global-order batching (the dedup_anti_join core) over a RANGE-SORTED
    layout with a per-file manifest vs the self-discovering path on plain
    parquet — the measured answer to the bucketed-mode finding that hash
    buckets can't serve global numbering. The manifest path skips
    with_global_order's boundary-discovery pass (a full scan + range
    shuffle); at a table-format table (Delta/Iceberg) those per-file stats
    are free, so the delta below is pure saved I/O+shuffle."""
    from pyspark.sql import functions as F
    from s3bigdatasync_spark.operators import _PREPARED, prepared
    from s3bigdatasync_spark.operators.prefix import (
        collect_range_manifest,
        with_global_order,
    )

    build_scaled_dir(spark, out_dir, copies)
    _PREPARED.clear()
    inv = prepared(spark, out_dir).table("inventory_src").select("key", "size", "etag")
    inv.write.mode("overwrite").parquet(f"{out_dir}/p_inv")  # plain
    inv.repartitionByRange(64, "key", "size").write.mode("overwrite").parquet(
        f"{out_dir}/r_inv"
    )  # range-clustered
    plain = spark.read.parquet(f"{out_dir}/p_inv")
    ranged = spark.read.parquet(f"{out_dir}/r_inv")
    t0 = time.perf_counter()
    manifest = collect_range_manifest(ranged, ["key", "size"])
    manifest_s = round(time.perf_counter() - t0, 3)

    def batches(df, ranges=None):
        ranked = with_global_order(df, ["key", "size"], ranges=ranges)
        return (
            ranked.withColumn("batch_id", F.expr("global_rn div 100"))
            .groupBy("batch_id")
            .agg(F.count("*").alias("n_objects"), F.sum("size").alias("batch_size"))
        )

    def steady(mk) -> float:
        mk().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return round(samples[1], 3)

    return {
        "n_manifest_ranges": len(manifest),
        "manifest_listing_s": manifest_s,  # free under a table format
        "self_discovery_s": steady(lambda: batches(plain)),
        "manifest_s": steady(lambda: batches(ranged, ranges=manifest)),
    }


def run_hll(spark, out_dir: str, copies: int) -> dict:
    """approx_distinct_users PORTABLE formulation (oracle-checkable md5 HLL,
    4096-bucket max-rho agg) vs the ENGINE-NATIVE HLL++ sketch
    (approx_count_distinct) at `copies`× events — keeps the native path
    honest: if the portable form ever drifts from the native sketch's cost
    curve, the engine should switch the scale path (VERDICT r2 item 8)."""
    from s3bigdatasync_spark.operators import _PREPARED
    from s3bigdatasync_spark.operators.analytics import (
        approx_distinct_users,
        approx_distinct_users_native,
    )

    build_scaled_events_dir(spark, out_dir, copies)
    _PREPARED.clear()

    def steady(fn, sf) -> float:
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    res = {}
    for tag, sf in (("base", BASE_SF), ("scaled", out_dir)):
        res[f"portable_{tag}_s"] = steady(approx_distinct_users, sf)
        _PREPARED.clear()
        res[f"native_{tag}_s"] = steady(approx_distinct_users_native, sf)
        _PREPARED.clear()
    res["portable_slope"] = round(res["portable_scaled_s"] / res["portable_base_s"], 2)
    res["native_slope"] = round(res["native_scaled_s"] / res["native_base_s"], 2)
    return res


def _emit(payload: dict, json_out: str | None) -> None:
    """Print the result line AND write it to a file when asked — JVM GC
    warnings can interleave with stdout in local mode, so piping stdout is
    not a reliable way to capture the JSON."""
    line = json.dumps(payload)
    print(line)
    if json_out:
        Path(json_out).write_text(line + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--json-out", default=None, help="also write the result JSON line to this file")
    ap.add_argument(
        "--boiler-frac",
        type=float,
        default=0.05,
        help="docs-boilerplate mode: fraction of docs carrying the shared untagged boilerplate block",
    )
    ap.add_argument(
        "--capped-only",
        action="store_true",
        help="docs-boilerplate mode: skip the uncapped pair joins (quadratic"
        " in boiler df — hours at 100x; the capped family is the claim under test)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the mode's query list to measure"
        " (names outside the list are rejected — the scaled fixture only"
        " supports its mode's tables)",
    )
    ap.add_argument(
        "--mode",
        choices=["inventory", "docs", "docs-knobs", "docs-boilerplate", "events", "bucketed", "skew", "resolve", "hll", "rangelayout", "pq-decompose"],
        default="inventory",
        help="inventory: lineitem-derived ops; docs: dedup/text/similarity"
        " ops; events: time-window/session/behavior ops; bucketed: flagship"
        " diff on plain vs key-bucketed layout; skew: hot-key window vs"
        " map-side-combinable agg",
    )
    args = ap.parse_args()

    from s3bigdatasync_spark.session import get_spark

    spark = get_spark("scale-probe")
    if args.mode == "bucketed":
        res = run_bucketed(spark, args.out, args.copies)
        _emit({"copies": args.copies, "mode": "bucketed", **res}, args.json_out)
        return
    if args.mode == "skew":
        res = run_skew(spark, args.out, args.copies)
        _emit({"copies": args.copies, "mode": "skew", **res}, args.json_out)
        return
    if args.mode == "docs-knobs":
        res = run_docs_knobs(spark, args.out, args.copies)
        _emit({"copies": args.copies, "mode": "docs-knobs", **res}, args.json_out)
        return
    if args.mode == "docs-boilerplate":
        res = run_docs_boiler(
            spark, args.out, args.copies, args.boiler_frac, capped_only=args.capped_only
        )
        _emit({"copies": args.copies, "mode": "docs-boilerplate", **res}, args.json_out)
        return
    if args.mode == "resolve":
        res = run_resolve(spark, args.out, args.copies)
        _emit({"copies": args.copies, "mode": "resolve", **res}, args.json_out)
        return
    if args.mode == "hll":
        res = run_hll(spark, args.out, args.copies)
        _emit({"copies": args.copies, "mode": "hll", **res}, args.json_out)
        return
    if args.mode == "rangelayout":
        res = run_rangelayout(spark, args.out, args.copies)
        _emit({"copies": args.copies, "mode": "rangelayout", **res}, args.json_out)
        return
    if args.mode == "pq-decompose":
        res = run_pq_decompose(spark, args.out, args.copies)
        _emit({"copies": args.copies, "mode": "pq-decompose", **res}, args.json_out)
        return
    if args.mode == "docs":
        build_scaled_docs_dir(spark, args.out, args.copies)
        names = DOC_QUERIES
    elif args.mode == "events":
        build_scaled_events_dir(spark, args.out, args.copies)
        names = EVENT_QUERIES
    else:
        build_scaled_dir(spark, args.out, args.copies)
        names = PROBE_QUERIES
    if args.queries:
        want = [q.strip() for q in args.queries.split(",") if q.strip()]
        unknown = [q for q in want if q not in names]
        if unknown:
            raise SystemExit(f"--queries not in {args.mode} list: {unknown}")
        names = want
    base = measure(spark, BASE_SF, names)
    scaled = measure(spark, args.out, names)
    ratio = {k: round(scaled[k] / base[k], 2) if base[k] else None for k in base}
    _emit(
        {
            "copies": args.copies,
            "mode": args.mode,
            "sf01": base,
            "scaled": scaled,
            "ratio": ratio,
        },
        args.json_out,
    )


if __name__ == "__main__":
    main()
