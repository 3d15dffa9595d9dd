"""Segmented versioned count state — the UNBOUNDED-key variant of
drift.versioned_count_sink, built for states that grow with the corpus.

Why it exists (round-9 verdict, "What's wrong #1"): `versioned_count_sink`
merges old ∪ fresh and rewrites the FULL state relation every micro-batch.
For drift/ppl_gate the state is vocabulary-bounded, so that rewrite is
constant-size — fine. dedup_gate's state is one row per DISTINCT corpus
content: at 1B distinct documents every micro-batch would rewrite a ~50 GB
table to admit a 10k-doc drop — per-batch cost O(state), a named
scale-killer.

Why plain hash-prefix bucket-rewrite is NOT the fix: content hashes are
uniform, so a 10k-doc batch touches ~all of 256 buckets (measured at the
probe scale: every batch dirtied every bucket) — "rewrite only touched
buckets" degenerates to the full rewrite it was meant to avoid, and more
buckets only shrink the win until per-bucket file overhead dominates.

The fix that actually bounds per-batch writes is LOG-STRUCTURED: each batch
writes ONLY its own pre-aggregated fresh counts as a new immutable tier-0
segment (O(batch)); when MERGE_FANOUT segments accumulate on a tier they
are merged into one segment of the next tier. Amortized write cost per row
is O(log_FANOUT(state/batch)) — each row is rewritten once per tier it
climbs — and the live-segment count is bounded by FANOUT × #tiers, so the
read path (union all segments → one keyed merge-agg) stays a small fan-in.
This is the standard LSM shape (O'Neil et al., "The Log-Structured
Merge-Tree", Acta Informatica 1996) expressed as Spark relations.

Buckets still matter, one level down — but only once a segment is LARGE.
Every row carries a hash-prefix `bucket` column; a segment whose row count
reaches BUCKET_MIN_ROWS is written `partitionBy(bucket)`, so (a) a tier
merge of big segments is a per-bucket co-partitioned job a cluster can fan
out without shuffling cross-bucket, (b) point lookups / admission joins can
partition-prune, and (c) each bucket's compaction can be scheduled
independently. Below the threshold a segment is ONE parquet file: the first
A/B probe wrote every 2k-row tier-0 segment into 256 bucket dirs and paid
~1.5 KB of parquet footer per 8 rows — 6× slower than the legacy full
rewrite at probe scale, pure small-file overhead. The threshold is decided
from row counts recorded in the manifest (deterministic under replay: the
same inputs recount to the same sizes), so small states stay single-file
fast and deployment-scale segments get the bucketed layout exactly when it
starts paying. The buckets shape the WRITES; the LSM bounds HOW MUCH is
written.

Exactly-once is drift.py's protocol verbatim, re-based onto a manifest:
  * every batch's writes (new segment, merged segments, files log,
    manifest) land under names derived from the NEXT monotonic version;
    the meta pointer flips last. A crash anywhere before the flip leaves
    the old manifest pointed-at and every new dir unreachable; the
    replayed batch recomputes the same names deterministically and
    overwrites them.
  * segments are immutable and SHARED across versions — the manifest is
    the reachability root. GC (after a successful flip) removes manifests/
    file-logs of superseded versions and any segment the current manifest
    does not reference, which also sweeps crashed-attempt orphans.
  * the applied-FILES log provides file-identity idempotence exactly as in
    drift.py (no batch-id guard, for the same renumbering reasons); it is
    rewritten whole per batch, which is safe because it is O(total files
    ever seen) — at 1B docs in 10k-doc files that is ~100k short strings,
    noise next to the state.
  * meta-loss recovery scans for the newest version whose manifest AND
    files log both committed (drift._scan_latest_complete with
    ("manifest", "files")); the same replay-is-a-no-op argument applies.

Merge aggregates must be associative+commutative over union (sum, min, …)
— the same contract versioned_count_sink documents — because a key's total
is now assembled from per-segment partials at read time.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .drift import _read_meta, _scan_latest_complete  # shared protocol core

MERGE_FANOUT = 4  # segments per tier before they merge one tier up
BUCKET_MIN_ROWS = 1_000_000  # partitionBy(bucket) only at/above this size

_MANIFEST_SCHEMA = "seg string, tier int, n_rows long"
_FILES_SCHEMA = "file_path string"
_SEG_PREFIXES = ("manifest", "files")


def _key_names(counts_schema: str) -> list[str]:
    """Column names of a `name type, ...` DDL string, in declared order."""
    return [c.strip().split()[0] for c in counts_schema.split(",")]


def _read_manifest(
    spark: SparkSession, state_dir: str
) -> list[tuple[str, int, int]]:
    """(segment dir name, tier, n_rows) entries of the version the meta
    points at. Sorted deterministically (the order is the compaction
    determinism anchor: a replayed batch must pick the same merge group);
    n_rows feeds the bucket-layout threshold and never needs a data scan."""
    last = _read_meta(spark, state_dir, _SEG_PREFIXES)
    if last < 0:
        return []
    rows = (
        spark.read.schema(_MANIFEST_SCHEMA)
        .parquet(f"{state_dir}/manifest_v{last}")
        .collect()
    )
    # sort on the name's (tier, name) encoding so a multi-file manifest can
    # never flake the merge-group choice
    return sorted(
        ((r["seg"], r["tier"], r["n_rows"]) for r in rows),
        key=lambda st: (st[1], st[0]),
    )


def _read_files(spark: SparkSession, state_dir: str) -> DataFrame:
    last = _read_meta(spark, state_dir, _SEG_PREFIXES)
    if last < 0:
        return spark.createDataFrame([], _FILES_SCHEMA)
    return spark.read.schema(_FILES_SCHEMA).parquet(f"{state_dir}/files_v{last}")


def _read_segment(
    spark: SparkSession, state_dir: str, seg: str, counts_schema: str
) -> DataFrame:
    return spark.read.schema(f"{counts_schema}, bucket string").parquet(
        f"{state_dir}/{seg}"
    )


def read_segmented_counts(
    spark: SparkSession,
    state_dir: str,
    counts_schema: str,
    key_cols: Sequence[str],
    agg_exprs: Sequence[Column],
) -> DataFrame:
    """The running count state: union of the live segments, merge-aggregated
    per key. Fan-in is bounded by MERGE_FANOUT × #tiers (single digits), so
    this is a small multi-scan + ONE keyed aggregation — never a rewrite."""
    segs = _read_manifest(spark, state_dir)
    if not segs:
        return spark.createDataFrame([], counts_schema)
    union = None
    for seg, _tier, _n in segs:
        part = _read_segment(spark, state_dir, seg, counts_schema)
        union = part if union is None else union.unionByName(part)
    return (
        union.groupBy(*key_cols)
        .agg(*agg_exprs)
        .select(*_key_names(counts_schema))
    )


def _gc(state_dir: str, version: int, keep_segs: set[str]) -> None:
    """Best-effort removal of everything unreachable from the freshly
    flipped version: superseded manifest/files versions, and any segment the
    current manifest does not reference (which includes crashed-attempt
    orphans). Failures ignored — GC is never a correctness dependency."""
    import re
    import shutil
    from pathlib import Path

    root = Path(state_dir)
    if not root.is_dir():  # non-local path (s3://, hdfs://) — skip
        return
    for d in root.iterdir():
        m = re.fullmatch(r"(manifest|files)_v(\d+)", d.name)
        if m and int(m.group(2)) != version:
            shutil.rmtree(d, ignore_errors=True)
            continue
        if re.fullmatch(r"seg_v\d+_t\d+_\d+", d.name) and d.name not in keep_segs:
            shutil.rmtree(d, ignore_errors=True)


def segmented_count_sink(
    state_dir: str,
    counts_schema: str,
    key_cols: Sequence[str],
    count_fn: Callable[[DataFrame], DataFrame],
    bucket_col: Callable[[], Column],
    agg_exprs: Sequence[Column],
    merge_fanout: int = MERGE_FANOUT,
    bucket_min_rows: int = BUCKET_MIN_ROWS,
):
    """foreachBatch sink maintaining an addition-merged count state in the
    tiered-segment layout this module documents. Parameters mirror
    versioned_count_sink plus `bucket_col` (a thunk producing the
    hash-prefix column every row carries) and `bucket_min_rows` (segments
    at/above this size are written partitionBy(bucket); below it, one
    parquet file — see the module docstring's small-file A/B)."""

    def write_segment(df: DataFrame, name: str, n_est: int) -> None:
        if n_est >= bucket_min_rows:
            df.write.partitionBy("bucket").mode("overwrite").parquet(
                f"{state_dir}/{name}"
            )
        else:
            df.coalesce(1).write.mode("overwrite").parquet(f"{state_dir}/{name}")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        version = _read_meta(sp, state_dir, _SEG_PREFIXES) + 1
        applied = _read_files(sp, state_dir)
        tagged = batch_df.withColumn("file_path", F.input_file_name())
        fresh = tagged.join(applied, "file_path", "left_anti")
        manifest = list(_read_manifest(sp, state_dir))
        seq = 0
        fresh_counts = count_fn(fresh).withColumn("bucket", bucket_col())
        # one aggregation-sized action: the count doubles as the emptiness
        # check and the layout/manifest size record
        n0 = fresh_counts.count()
        if n0:
            seg0 = f"seg_v{version}_t0_{seq}"
            seq += 1
            write_segment(fresh_counts, seg0, n0)
            manifest.append((seg0, 0, n0))
        # tiered compaction: whenever a tier holds merge_fanout segments,
        # fold merge_fanout of them one tier up. Deterministic given the
        # manifest (sorted read + stable append order), so a crash-replayed
        # batch rebuilds byte-identical segment names.
        while True:
            by_tier: dict[int, list[tuple[str, int]]] = {}
            for seg, tier, n in manifest:
                by_tier.setdefault(tier, []).append((seg, n))
            tier = next(
                (t for t in sorted(by_tier) if len(by_tier[t]) >= merge_fanout),
                None,
            )
            if tier is None:
                break
            group = by_tier[tier][:merge_fanout]
            group_names = {s for s, _ in group}
            union = None
            for seg, _n in group:
                part = _read_segment(sp, state_dir, seg, counts_schema)
                union = part if union is None else union.unionByName(part)
            merged = (
                union.groupBy("bucket", *key_cols)
                .agg(*agg_exprs)
                .select(*_key_names(counts_schema), "bucket")
            )
            name = f"seg_v{version}_t{tier + 1}_{seq}"
            seq += 1
            # pre-merge sum is a deterministic upper bound for the layout
            # choice; the recorded size is the post-merge footer count (a
            # metadata-only read, no data scan)
            n_est = sum(n for _s, n in group)
            write_segment(merged, name, n_est)
            n_merged = sp.read.parquet(f"{state_dir}/{name}").count()
            manifest = [e for e in manifest if e[0] not in group_names]
            manifest.append((name, tier + 1, n_merged))
        files = applied.unionByName(fresh.select("file_path").distinct()).distinct()
        files.write.mode("overwrite").parquet(f"{state_dir}/files_v{version}")
        man_df = (
            sp.createDataFrame(manifest, _MANIFEST_SCHEMA)
            if manifest
            else sp.createDataFrame([], _MANIFEST_SCHEMA)
        )
        man_df.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir}/manifest_v{version}"
        )
        sp.createDataFrame([(version,)], "version long").write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/meta")
        _gc(state_dir, version, keep_segs={s for s, _t, _n in manifest})

    return sink
