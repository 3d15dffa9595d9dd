"""Distributed global ordering primitives — the two-phase pattern as a
first-class reusable operator.

Global row numbers / prefix sums / ntile over a total order are the classic
"needs one partition" traps (Spark's bare `Window.orderBy` serializes the
whole dataset through one task). The scalable equivalent, used by
task_batches, size_capped_take, size_deciles and compaction_plan:

  1. ONE sampled range-partition pass discovers ordered range boundaries and
     per-range (count, sum) stats — collected once (≤ #partitions rows of
     driver state);
  2. every row's range id is then RE-DERIVED from the collected boundary
     literals — a pure function of the row, so any later recomputation of the
     plan lands every row in the same range. This is what makes the operator
     deterministic: the sampled partitioner only ever influences load balance,
     never results. (The previous design cached the sampled partitioning and
     joined on spark_partition_id(); a cache eviction + recompute could then
     re-sample different boundaries than the ones the offsets were collected
     from, silently shifting rows across ranges — the compaction_plan
     round-2 driver flake.)
  3. per-range local rank / running sum (parallel windows keyed by range id)
     plus broadcast exclusive offsets.

No `.cache()` anywhere and nothing left persisted: the only state is the
boundary/offset literals embedded in the returned plan.

Results are bitwise-identical to the single-partition window (rank and sum
are associative over the range-ordered concatenation) PROVIDED order_cols is
a total order (unique keys). Callers pass tiebreaker columns to guarantee
that; with duplicate keys the assignment is still deterministic per range,
but rank among tied rows is engine-ambiguous (same as any SQL window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, Window
from pyspark.sql import functions as F


def _scaled_partitions(df: DataFrame) -> int:
    """Range-partition count that tracks input scale: the max of the input's
    current partition count and spark.sql.shuffle.partitions. At 100× data the
    scan partition count grows with file splits, so the per-partition sort
    window stays bounded instead of each of a fixed 32 ranges holding GBs."""
    shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(df.rdd.getNumPartitions(), shuffle)


def _as_tuple(v):
    """Driver-side comparable form of a (possibly struct) order-key value."""
    return tuple(v) if isinstance(v, Row) else (v,)


def _key_col(order_cols: list[str]):
    return F.struct(*order_cols) if len(order_cols) > 1 else F.col(order_cols[0])


def _bound_lit(order_cols: list[str], value):
    """Literal expression for one collected boundary value (scalar or struct)."""
    if len(order_cols) > 1:
        return F.struct(*[F.lit(v).alias(c) for c, v in zip(order_cols, tuple(value))])
    return F.lit(value)


def collect_range_manifest(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str | None = None,
    max_ranges: int = 256,
) -> list[tuple]:
    """Per-file range manifest of an ALREADY range-clustered table (one
    written by `repartitionByRange(order_cols).write`, or any table format
    whose files carry min/max stats): [(lower_bound, count, sum), …] sorted
    by lower bound. Feeding this to with_global_order(ranges=...) removes its
    boundary-discovery pass entirely — the at-scale answer for global
    numbering over a maintained layout, where a Delta/Iceberg manifest
    supplies exactly these per-file stats without this one listing scan.

    Adjacent ranges are coalesced down to max_ranges (counts/sums add, the
    first lower bound survives) so the derived-range-id expression stays a
    bounded comparison chain inside whole-stage codegen even over a
    thousands-of-files table.

    Raises if the files' key ranges overlap — a non-range-clustered table
    has no usable manifest (fall back to the self-discovering path)."""
    key = _key_col(order_cols)
    aggs = [
        F.min(key).alias("_lo"),
        F.max(key).alias("_hi"),
        F.count("*").alias("_c"),
    ]
    if sum_col is not None:
        aggs.append(F.coalesce(F.sum(sum_col), F.lit(0)).alias("_t"))
    rows = sorted(
        df.groupBy(F.input_file_name().alias("_f")).agg(*aggs).collect(),
        key=lambda r: _as_tuple(r["_lo"]),
    )
    for i in range(len(rows) - 1):
        if not _as_tuple(rows[i]["_hi"]) < _as_tuple(rows[i + 1]["_lo"]):
            raise ValueError(
                "collect_range_manifest: file key ranges overlap — the table "
                "is not range-clustered on the order columns"
            )
    out = [
        (r["_lo"], r["_c"], r["_t"] if sum_col is not None else 0) for r in rows
    ]
    while len(out) > max_ranges:  # pairwise-coalesce adjacent ranges
        out = [
            (
                out[i][0],
                sum(x[1] for x in out[i : i + 2]),
                sum(x[2] for x in out[i : i + 2]),
            )
            for i in range(0, len(out), 2)
        ]
    return out


MANIFEST_FILE = "_range_manifest.json"
LAYOUTS_DIR = "_layouts"  # sf_dir/_layouts/<table> — the auto-consult convention


def _source_fingerprint(sf_dir: str) -> list | None:
    """(relative path, size, mtime_ns) of every base-table parquet file in
    sf_dir — the freshness witness a saved layout records, so a stale layout
    copy is never consulted after the live tables change (round-4 ADVICE:
    without it, task_batches/dedup_anti_join/compaction_plan would silently
    compute over the old layout while an oracle reads the new data). Listing
    only — no file contents are read; O(#files) stat calls.

    Returns None when NOTHING is listable — a remote URI (s3a://...) or a
    typo'd path yields an empty pathlib glob even though Spark reads the
    tables fine, and an empty-list fingerprint would vacuously equal the
    empty live listing at consult time ([] == [] — the stale-layout gate
    this witness exists to close would pass forever). None means
    UNVERIFIABLE: save records it as such and load_table_layout refuses the
    layout rather than trusting it."""
    from pathlib import Path

    root = Path(sf_dir)
    out: list[list] = []
    for table in sorted(root.glob("*.parquet")):
        files = [table] if table.is_file() else sorted(
            f
            for f in table.rglob("*")
            if f.is_file() and not f.name.startswith(("_", "."))
        )
        for f in files:
            st = f.stat()
            out.append([str(f.relative_to(root)), st.st_size, st.st_mtime_ns])
    return out or None


def save_range_manifest(
    manifest: list[tuple],
    layout_path: str,
    keys: list[str] | None = None,
    sum_col: str | None = None,
    source_dir: str | None = None,
    source_fp: list | None = None,
) -> str:
    """Persist a collect_range_manifest result as JSON beside the layout
    (the poor man's table-format manifest). Bounds serialize as scalars or
    lists (multi-column keys); timestamps/dates via str(). `keys`/`sum_col`
    record what the manifest was collected over, so auto-consult can refuse
    a manifest that doesn't match a query's order columns; `source_dir`
    (the sf_dir the layout was derived from) records a source fingerprint so
    auto-consult can refuse a layout whose live tables have since changed.

    `source_fp` is the fingerprint captured BEFORE the rewrite job read the
    source (r6 ADVICE: fingerprinting only at save time records the NEW file
    state against layout data computed from the OLD files, so a mid-rewrite
    source change would pass the freshness gate while serving stale ranges).
    When given, the live fingerprint is re-taken here and the save REFUSES
    on mismatch — the layout is torn, not subtly wrong. Callers that read
    and save atomically (tests, single-shot scripts) may still pass only
    source_dir; cli layout-rewrite always passes the pre-read capture."""
    import json
    from pathlib import Path

    if source_fp is not None:
        if source_dir is None:
            raise ValueError("source_fp requires source_dir to re-verify against")
        live = _source_fingerprint(source_dir)
        if live != source_fp:
            raise RuntimeError(
                "save_range_manifest: source tables changed between the "
                f"rewrite's read and save ({source_dir}) — the layout was "
                "computed from files that no longer exist in that state; "
                "re-run the rewrite"
            )

    def enc(v):
        if isinstance(v, (list, tuple)):
            return [enc(x) for x in v]
        return v if isinstance(v, (str, int, float, bool, type(None))) else str(v)

    out = Path(layout_path) / MANIFEST_FILE
    ranges = [[enc(lo), c, t] for lo, c, t in manifest]
    out.write_text(
        json.dumps(
            {
                "keys": keys,
                "sum_col": sum_col,
                "source_fp": (
                    source_fp
                    if source_fp is not None
                    else (_source_fingerprint(source_dir) if source_dir else None)
                ),
                "ranges": ranges,
            }
        )
        + "\n"
    )
    return str(out)


def _decode_manifest(raw) -> list[tuple]:
    ranges = raw["ranges"] if isinstance(raw, dict) else raw  # pre-metadata files
    return [(tuple(lo) if isinstance(lo, list) else lo, c, t) for lo, c, t in ranges]


def load_range_manifest(layout_path: str) -> list[tuple]:
    """Read a saved manifest back into with_global_order's `ranges` form."""
    import json
    from pathlib import Path

    return _decode_manifest(
        json.loads((Path(layout_path) / MANIFEST_FILE).read_text())
    )


def load_table_layout(
    spark, sf_dir: str, table: str, order_cols: list[str], sum_col: str | None = None
):
    """(df, ranges) when sf_dir carries a materialized range layout of
    `table` whose manifest matches the requested order columns — else None.

    The convention (written by the CLI's `layout-rewrite --mode range`):
    `{sf_dir}/_layouts/{table}/` holds the range-clustered parquet plus its
    `_range_manifest.json`. Queries that global-order this table consult it
    automatically, which drops with_global_order's boundary-discovery pass —
    one fewer job per query, exactly what a Delta/Iceberg manifest would
    supply for free. A manifest collected over different keys (or missing
    the needed sum column) is ignored, not misused; so is one whose recorded
    source fingerprint no longer matches the live sf_dir tables (or that
    predates fingerprinting) — a stale layout silently serving old data is a
    correctness landmine, falling back to self-discovery is merely slower
    (round-4 ADVICE). sf_dirs without layouts (the driver's read-only
    testdata) fall back to self-discovery."""
    import json
    from pathlib import Path

    mf = Path(sf_dir) / LAYOUTS_DIR / table / MANIFEST_FILE
    if not mf.exists():
        return None
    raw = json.loads(mf.read_text())
    if not isinstance(raw, dict) or raw.get("keys") != list(order_cols):
        return None
    if sum_col is not None and raw.get("sum_col") != sum_col:
        return None
    fp = raw.get("source_fp")
    if fp is None or fp != _source_fingerprint(sf_dir):
        return None
    return spark.read.parquet(str(mf.parent)), _decode_manifest(raw)


def with_global_order(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str | None = None,
    num_partitions: int | None = None,
    ranges: list[tuple] | None = None,
) -> DataFrame:
    """Return df plus `global_rn` (0-based dense global row number over
    order_cols, which must form a unique total order — pass tiebreakers) and,
    if sum_col is given, `global_cumsum_ex` (exclusive prefix sum of sum_col
    in that order).

    Deterministic by construction: range boundaries are collected once and
    re-applied as literals, so the returned plan is a pure function of the
    input rows — safe to materialize any number of times, no cache pinning.

    `ranges` (from collect_range_manifest, or a table-format manifest)
    supplies [(lower_bound, count, sum), …] directly and skips the
    boundary-discovery job — one fewer full pass over the data.

    Order columns must be NON-NULL: a NULL has no defined slot in the
    derived-range expression (comparisons against a NULL bound are NULL) and
    would make the driver-side boundary comparison ill-typed. The discovery
    path checks this inside its existing stats job (no extra pass) and raises;
    the manifest path inherits the check from collect_range_manifest's
    clustered-write provenance.

    r11: the discovery path query-scope-caches the INPUT relation — three
    consumers read it (repartitionByRange's internal boundary-sampling pass,
    the stats job, and the returned plan itself), so without the pin the
    upstream subtree executes three times per query. The cache does not
    affect determinism (boundaries are still collected once and re-applied
    as literals; the round-2 hazard was caching the sampled PARTITIONING,
    not the input rows). The manifest path stays cache-free — it reads the
    input exactly once.
    """
    key = _key_col(order_cols)

    if ranges is not None:
        bounds = [r[0] for r in ranges[1:]]
        b_expr = F.lit(0)
        for b in bounds:
            b_expr = b_expr + F.when(key >= _bound_lit(order_cols, b), 1).otherwise(0)
        return _attach_order(df, order_cols, sum_col, b_expr,
                             [(i, c, t) for i, (_, c, t) in enumerate(ranges)])

    from . import scoped_cache

    df = scoped_cache(df)
    any_null = F.greatest(*[F.col(c).isNull() for c in order_cols]) if len(order_cols) > 1 else F.col(order_cols[0]).isNull()
    aggs = [
        F.count("*").alias("_c"),
        F.min(key).alias("_lo"),
        F.max(key).alias("_hi"),
        F.count_if(any_null).alias("_nulls"),
    ]
    if sum_col is not None:
        # coalesce: a partition whose sum_col values are all NULL must
        # contribute 0 to the running offset, not poison the driver-side sum
        aggs.append(F.coalesce(F.sum(sum_col), F.lit(0)).alias("_t"))

    # Job 1 (the only sampled step): discover ordered ranges + their stats.
    parted = (
        df.repartitionByRange(num_partitions or _scaled_partitions(df), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    stats = sorted(
        (r for r in parted.groupBy("_pid").agg(*aggs).collect() if r["_c"] > 0),
        key=lambda r: r["_pid"],
    )
    n_null = sum(r["_nulls"] for r in stats)
    if n_null:
        raise ValueError(
            f"with_global_order: order columns {order_cols} must be non-null; "
            f"found {n_null} row(s) with a NULL order key — filter or coalesce "
            "them first (NULL has no defined position in the derived ranges)"
        )

    # Range id as a pure row expression: #collected boundaries strictly below
    # the row's key. ≤ #partitions string/struct comparisons per row, all
    # inside whole-stage codegen.
    bounds = [r["_lo"] for r in stats[1:]]
    b_expr = F.lit(0)
    for b in bounds:
        b_expr = b_expr + F.when(key >= _bound_lit(order_cols, b), 1).otherwise(0)

    # Per-range stats: the sampled per-pid stats are reusable iff no key value
    # straddles a sampled partition boundary (guaranteed by unique keys);
    # otherwise recompute them grouped by the derived range id (exact, still
    # ≤ #partitions rows of driver state).
    clean = all(
        _as_tuple(stats[i]["_hi"]) < _as_tuple(stats[i + 1]["_lo"])
        for i in range(len(stats) - 1)
    )
    if clean:
        ranges = [(i, r["_c"], r["_t"] if sum_col is not None else 0) for i, r in enumerate(stats)]
    else:
        aggs2 = [F.count("*").alias("_c")]
        if sum_col is not None:
            aggs2.append(F.coalesce(F.sum(sum_col), F.lit(0)).alias("_t"))
        re = df.withColumn("_b", b_expr).groupBy("_b").agg(*aggs2).collect()
        ranges = sorted(
            (r["_b"], r["_c"], r["_t"] if sum_col is not None else 0) for r in re
        )

    return _attach_order(df, order_cols, sum_col, b_expr, ranges)


def _attach_order(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str | None,
    b_expr,
    ranges: list[tuple],
) -> DataFrame:
    """Shared tail: per-range local window + broadcast exclusive offsets."""
    rows, rn_acc, sum_acc = [], 0, 0
    for b, c, t in ranges:
        rows.append((b, rn_acc, sum_acc))
        rn_acc += c
        sum_acc += t
    if not rows:  # empty input: a single empty range keeps the plan shape
        rows = [(0, 0, 0)]
    off = df.sparkSession.createDataFrame(rows, "_b int, _rn_off long, _sum_off long")

    w = Window.partitionBy("_b").orderBy(*order_cols)
    out = (
        df.withColumn("_b", b_expr.cast("int"))
        .withColumn("_lrn", F.row_number().over(w) - 1)
        .join(F.broadcast(off), "_b")
        .withColumn("global_rn", F.col("_rn_off") + F.col("_lrn"))
    )
    if sum_col is not None:
        w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            "global_cumsum_ex",
            F.col("_sum_off") + F.sum(sum_col).over(w_sum) - F.col(sum_col),
        )
    return out.drop("_b", "_lrn", "_rn_off", "_sum_off")


def with_global_ntile(
    df: DataFrame, order_cols: list[str], n_tiles: int, num_partitions: int | None = None
) -> DataFrame:
    """`ntile(n)` over a global unique order without a single-partition
    window. SQL ntile semantics: the first (count % n) tiles get one extra
    row — reproduced from the global row number with integer arithmetic."""
    ranked = with_global_order(df, order_cols, num_partitions=num_partitions)
    total = ranked.groupBy().agg(F.count("*").alias("_n"))
    k = n_tiles
    # all-integer arithmetic (div, not /): first (_n % k) tiles hold one extra
    tile = F.expr(
        f"CASE WHEN global_rn < (_n div {k} + 1) * (_n % {k}) "
        f"THEN global_rn div (_n div {k} + 1) "
        f"ELSE (_n % {k}) + (global_rn - (_n div {k} + 1) * (_n % {k}))"
        f" div greatest(_n div {k}, 1) END"
    ).cast("int") + 1
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("tile", tile)
        .drop("_n", "global_rn")
    )
