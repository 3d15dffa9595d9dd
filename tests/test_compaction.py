"""compact_files: the execution half of compaction_plan — many small files
in, ~target-size files out, zero row loss, bin count as planned."""

from __future__ import annotations

from s3bigdatasync_spark.plans.compaction import (
    compact_files,
    list_data_files,
    plan_bins,
)


def _scatter_small_files(spark, src, n_files=24):
    """Write the sf0.001 documents table as n_files tiny parquet files."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(n_files).write.mode("overwrite").parquet(src)
    return docs.count()


def test_compact_files_bins_and_row_parity(spark, tmp_path):
    src, out = str(tmp_path / "small"), str(tmp_path / "compacted")
    n_rows = _scatter_small_files(spark, src)
    files = list_data_files(src)
    assert len(files) >= 20  # genuinely many small files

    # target sized to pack roughly 4 bins from the inputs
    total = sum(s for _, s in files)
    target = total // 4 + 1
    res = compact_files(spark, src, out, target_bytes=target)

    assert res.rows_in == res.rows_out == n_rows  # zero loss
    planned = len(set(plan_bins(files, target).values()))
    assert res.n_bins == planned
    # one file per bin: the rewrite achieved the planned layout
    assert len(res.output_files) == res.n_bins
    assert res.n_bins < res.n_input_files  # it actually compacted


def test_compact_files_single_bin_when_target_huge(spark, tmp_path):
    src, out = str(tmp_path / "small"), str(tmp_path / "one")
    n_rows = _scatter_small_files(spark, src, n_files=8)
    res = compact_files(spark, src, out, target_bytes=1 << 40)
    assert res.n_bins == 1 and len(res.output_files) == 1
    assert res.rows_out == n_rows


def test_compact_files_refuses_empty_dir(spark, tmp_path):
    import pytest as _pytest

    (tmp_path / "empty").mkdir()
    with _pytest.raises(ValueError, match="no parquet data files"):
        compact_files(spark, str(tmp_path / "empty"), str(tmp_path / "out"))


def test_cli_compact(spark, tmp_path):
    from s3bigdatasync_spark.cli import build_parser

    src, out = str(tmp_path / "small"), str(tmp_path / "cli_out")
    _scatter_small_files(spark, src, n_files=8)
    args = build_parser().parse_args(
        ["compact", "--src", src, "--out", out, "--target-bytes", str(1 << 40)]
    )
    assert args.fn(spark, args) == 0
    assert spark.read.parquet(out).count() == spark.read.parquet(src).count()


def test_plan_bins_property():
    """plan_bins invariants under random file lists (hypothesis): ids follow
    the div rule over the running sum, are non-decreasing in path order, and
    start at 0. Contiguity is deliberately NOT claimed — an oversized file
    skips whole ids (the case this test originally caught)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.text("abcdef", min_size=1, max_size=8), st.integers(0, 10**9)),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        st.integers(1, 10**9),
    )
    def check(files, target):
        bins = plan_bins(files, target)
        # ids are exactly the div rule over the running sum: non-decreasing
        # in path order, starting at 0, GAPPED when a file exceeds target
        # (which is why compact_files partitions by distinct-bin count)
        acc = 0
        prev = 0
        for path, size in sorted(files):
            assert bins[path] == acc // target
            assert bins[path] >= prev
            prev = bins[path]
            acc += size
        assert min(bins.values()) == 0

    check()
