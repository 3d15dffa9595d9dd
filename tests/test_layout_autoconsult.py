"""Auto-consult of a maintained range layout (VERDICT r3 item 5).

`layout-rewrite --mode range` writes `{out}/` as range-clustered parquet plus
`_range_manifest.json`. When that layout lives at the convention path
`{sf_dir}/_layouts/inventory_src`, task_batches / dedup_anti_join /
compaction_plan must consult the manifest automatically: the boundary-
discovery job disappears (one fewer Spark job) and results stay
byte-for-byte identical to the self-discovering path on the raw sf_dir.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from s3bigdatasync_spark.operators import _PREPARED, joins, cost, prepared
from s3bigdatasync_spark.operators.prefix import (
    LAYOUTS_DIR,
    collect_range_manifest,
    load_table_layout,
    save_range_manifest,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout_sf(spark, tmp_path_factory):
    """A writable clone of sf0.001 (symlinked tables) carrying a range
    layout of inventory_src at the auto-consult convention path."""
    root = tmp_path_factory.mktemp("layout_sf")
    for f in Path(SF_SMALL).glob("*.parquet"):
        os.symlink(f, root / f.name)
    out = root / LAYOUTS_DIR / "inventory_src"
    inv = prepared(spark, SF_SMALL).table("inventory_src")
    inv.repartitionByRange(8, "key", "size").write.mode("overwrite").parquet(str(out))
    manifest = collect_range_manifest(
        spark.read.parquet(str(out)), ["key", "size"], sum_col="size"
    )
    save_range_manifest(
        manifest, str(out), keys=["key", "size"], sum_col="size",
        source_dir=str(root),
    )
    _PREPARED.clear()
    return str(root)


_GROUP_SEQ = iter(range(10**6))


def _jobs_run(spark, fn) -> int:
    sc = spark.sparkContext
    # NOT id(fn): lambdas are gc'd between calls and CPython reuses the
    # address, silently merging two counts into one job group
    group = f"jobcount-{next(_GROUP_SEQ)}"
    sc.setJobGroup(group, "layout autoconsult probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


@pytest.mark.parametrize(
    "query", [joins.task_batches, joins.dedup_anti_join, cost.compaction_plan]
)
def test_layout_consult_skips_boundary_job_same_bytes(spark, layout_sf, query):
    spark.catalog.clearCache()
    _PREPARED.clear()
    plain_rows = sorted(map(tuple, query(spark, SF_SMALL).collect()))
    _PREPARED.clear()
    n_plain = _jobs_run(spark, lambda: query(spark, SF_SMALL).collect())
    _PREPARED.clear()
    n_layout = _jobs_run(spark, lambda: query(spark, layout_sf).collect())
    layout_rows = sorted(map(tuple, query(spark, layout_sf).collect()))
    _PREPARED.clear()
    assert layout_rows == plain_rows  # byte-for-byte same result
    assert n_layout < n_plain  # the boundary-discovery job is gone


def test_mismatched_manifest_is_refused(spark, layout_sf):
    # different order columns -> None (never misused)
    assert load_table_layout(spark, layout_sf, "inventory_src", ["key"]) is None
    # missing sum column -> None
    assert (
        load_table_layout(
            spark, layout_sf, "inventory_src", ["key", "size"], sum_col="etag"
        )
        is None
    )
    # matching request -> (df, ranges)
    got = load_table_layout(spark, layout_sf, "inventory_src", ["key", "size"])
    assert got is not None and len(got[1]) > 1
    # absent layout -> None
    assert load_table_layout(spark, SF_SMALL, "inventory_src", ["key", "size"]) is None


def test_stale_layout_is_refused(spark, tmp_path):
    """A layout whose source tables changed after `layout-rewrite` must be
    ignored — consulting the stale copy would silently serve old data while
    the oracle reads the live table (round-4 ADVICE, medium). The saved
    manifest records a source fingerprint (file sizes/mtimes); on mismatch
    load_table_layout returns None and queries fall back to self-discovery,
    matching the oracle on the NEW data."""
    import shutil

    root = tmp_path / "sf_clone"
    root.mkdir()
    for f in Path(SF_SMALL).glob("*.parquet"):
        shutil.copy(f, root / f.name)
    out = root / LAYOUTS_DIR / "inventory_src"
    _PREPARED.clear()
    inv = prepared(spark, str(root)).table("inventory_src")
    inv.repartitionByRange(8, "key", "size").write.mode("overwrite").parquet(str(out))
    manifest = collect_range_manifest(
        spark.read.parquet(str(out)), ["key", "size"], sum_col="size"
    )
    save_range_manifest(
        manifest, str(out), keys=["key", "size"], sum_col="size",
        source_dir=str(root),
    )
    _PREPARED.clear()
    assert (
        load_table_layout(spark, str(root), "inventory_src", ["key", "size"])
        is not None
    )

    # the live table changes after the layout was written: lineitem (the
    # inventory_src source) shrinks to half its rows
    li = spark.read.parquet(str(root / "lineitem.parquet"))
    half = li.limit(li.count() // 2)
    tmp_li = tmp_path / "li_new.parquet"
    half.coalesce(1).write.mode("overwrite").parquet(str(tmp_li))
    (root / "lineitem.parquet").unlink()
    shutil.copy(next(tmp_li.glob("part-*.parquet")), root / "lineitem.parquet")
    _PREPARED.clear()

    # the stale layout is refused...
    assert (
        load_table_layout(spark, str(root), "inventory_src", ["key", "size"]) is None
    )
    # ...and the consulting query self-discovers over the NEW data: its
    # object count reflects the shrunken table, not the stale layout copy
    n_new = prepared(spark, str(root)).table("inventory_src").count()
    _PREPARED.clear()
    got = joins.task_batches(spark, str(root))
    assert got.agg({"n_objects": "sum"}).collect()[0][0] == n_new
    _PREPARED.clear()


def test_unfingerprinted_legacy_manifest_is_refused(spark, tmp_path):
    """A manifest saved before fingerprinting (no source_fp key) cannot
    prove freshness — refuse it rather than risk stale data."""
    import json

    root = tmp_path / "sf_legacy"
    root.mkdir()
    for f in Path(SF_SMALL).glob("*.parquet"):
        os.symlink(f, root / f.name)
    out = root / LAYOUTS_DIR / "inventory_src"
    _PREPARED.clear()
    inv = prepared(spark, str(root)).table("inventory_src")
    inv.repartitionByRange(8, "key", "size").write.mode("overwrite").parquet(str(out))
    manifest = collect_range_manifest(spark.read.parquet(str(out)), ["key", "size"])
    save_range_manifest(manifest, str(out), keys=["key", "size"])  # no source_dir
    _PREPARED.clear()
    raw = json.loads((out / "_range_manifest.json").read_text())
    assert raw["source_fp"] is None
    assert (
        load_table_layout(spark, str(root), "inventory_src", ["key", "size"]) is None
    )


def test_unlistable_source_is_never_trusted(spark, tmp_path):
    """A layout saved with a source_dir that pathlib cannot list (remote
    URI, typo'd path) must be REFUSED at consult time, not vacuously
    accepted: an empty listing used to fingerprint as [] on both sides and
    [] == [] passed the freshness gate forever. _source_fingerprint now
    returns None (unverifiable) and load_table_layout rejects it."""
    import shutil

    from s3bigdatasync_spark.operators.prefix import _source_fingerprint

    assert _source_fingerprint(str(tmp_path / "nonexistent")) is None

    root = tmp_path / "sf_clone"
    root.mkdir()
    for f in Path(SF_SMALL).glob("*.parquet"):
        shutil.copy(f, root / f.name)
    out = root / LAYOUTS_DIR / "inventory_src"
    _PREPARED.clear()
    inv = prepared(spark, str(root)).table("inventory_src")
    inv.repartitionByRange(8, "key", "size").write.mode("overwrite").parquet(str(out))
    manifest = collect_range_manifest(
        spark.read.parquet(str(out)), ["key", "size"], sum_col="size"
    )
    save_range_manifest(
        manifest, str(out), keys=["key", "size"], sum_col="size",
        source_dir=str(tmp_path / "nonexistent"),  # unlistable at save time
    )
    _PREPARED.clear()
    assert (
        load_table_layout(spark, str(root), "inventory_src", ["key", "size"])
        is None
    )


def test_mid_rewrite_source_change_refuses_save(spark, tmp_path):
    """r6 ADVICE: the fingerprint must witness the file state the rewrite
    READ, not the state at save time. Simulate the race — capture fp, read,
    then the source changes before save — and assert save_range_manifest
    refuses (RuntimeError), never recording a fresh-looking manifest over
    stale layout data. The no-race path with an explicit pre-read fp must
    still save and be consultable."""
    import shutil

    import pytest

    from s3bigdatasync_spark.operators.prefix import _source_fingerprint

    root = tmp_path / "sf_clone"
    root.mkdir()
    for f in Path(SF_SMALL).glob("*.parquet"):
        shutil.copy(f, root / f.name)
    out = root / LAYOUTS_DIR / "inventory_src"
    _PREPARED.clear()
    fp_before = _source_fingerprint(str(root))
    inv = prepared(spark, str(root)).table("inventory_src")
    inv.repartitionByRange(8, "key", "size").write.mode("overwrite").parquet(str(out))
    manifest = collect_range_manifest(
        spark.read.parquet(str(out)), ["key", "size"], sum_col="size"
    )

    # no race: pre-read fp verifies against the unchanged live state
    save_range_manifest(
        manifest, str(out), keys=["key", "size"], sum_col="size",
        source_dir=str(root), source_fp=fp_before,
    )
    assert (
        load_table_layout(spark, str(root), "inventory_src", ["key", "size"])
        is not None
    )

    # race: the source changes between the rewrite's read and the save
    (root / "lineitem.parquet").touch()
    with pytest.raises(RuntimeError, match="changed between"):
        save_range_manifest(
            manifest, str(out), keys=["key", "size"], sum_col="size",
            source_dir=str(root), source_fp=fp_before,
        )
    # source_fp without source_dir is a caller bug, not a silent pass
    with pytest.raises(ValueError, match="source_dir"):
        save_range_manifest(manifest, str(out), source_fp=fp_before)
    _PREPARED.clear()
