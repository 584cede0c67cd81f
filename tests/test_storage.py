"""Data-layout gates: compaction and range-sorted (Z-order-lite) writes.

Complements tests/test_scale_patterns.py (which pins partition pruning and
the shuffle-free bucketed join through the same storage.py utilities):
each test here pins the *observable effect* of a layout rewrite — bounded
file counts after compaction, disjoint footer ranges after a range-sorted
write — not just that the write succeeded.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.storage import (
    compact_parquet,
    parquet_file_column_ranges,
    write_range_sorted,
)
from tests.test_plans import _plan


def test_compaction_bounds_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    li = table(spark, "lineitem", sf_dir)
    li.repartition(32).write.mode("overwrite").parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src >= 16  # the small-file problem, manufactured

    compact_parquet(spark, src, dst, target_files=2)
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst <= 2, f"compaction left {n_dst} files"
    assert spark.read.parquet(dst).count() == li.count()


def test_range_sorted_layout_has_disjoint_footers(spark, sf_dir, tmp_path):
    """After write_range_sorted on o_orderkey, per-file [min,max] footer
    ranges must be pairwise disjoint — the property that lets a range
    predicate skip every non-matching file without reading data pages."""
    path = str(tmp_path / "orders_ranged")
    orders = table(spark, "orders", sf_dir)
    write_range_sorted(orders, path, ["o_orderkey"], n_files=6)

    ranges = sorted(parquet_file_column_ranges(path, "o_orderkey"))
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},..)"
    assert spark.read.parquet(path).count() == orders.count()

    # and the footer ranges actually prune: a point-lookup plan pushes the
    # filter to the scan (row-group skipping happens inside the reader)
    probe = spark.read.parquet(path).where(F.col("o_orderkey") == 1)
    assert "o_orderkey" in _plan(probe).split("PushedFilters:")[1].splitlines()[0]
