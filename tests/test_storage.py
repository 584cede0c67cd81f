"""Data-layout gates: the write-time levers that matter at 100 TB.

Each test pins the *observable effect* of a layout utility — partition
filters in the scan node, absence of Exchange in a bucketed join, bounded
file counts after compaction, disjoint footer ranges after a range-sorted
write — not just that the write succeeded.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.storage import (
    compact_parquet,
    parquet_file_column_ranges,
    write_bucketed,
    write_partitioned,
    write_range_sorted,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    events = table(spark, "events", sf_dir)
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, "event_type")

    filtered = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = _plan(filtered)
    scan = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_type" in scan, f"no partition pruning in scan: {scan}"
    assert (
        filtered.count()
        == events.where(F.col("event_type") == "click").count()
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key with equal bucket counts: the
    join must plan as SortMergeJoin with NO Exchange on either side — the
    write-once/join-many-times trade that pays for itself at 100 TB."""
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"orders_b_{suffix}", f"customer_b_{suffix}"
    write_bucketed(
        table(spark, "orders", sf_dir),
        t_orders,
        str(tmp_path / t_orders),
        ["o_custkey"],
        8,
    )
    write_bucketed(
        table(spark, "customer", sf_dir),
        t_cust,
        str(tmp_path / t_cust),
        ["c_custkey"],
        8,
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table(t_orders)
            .join(
                spark.table(t_cust),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # same answer as the plain (shuffling) join
        expect = (
            table(spark, "orders", sf_dir)
            .join(
                table(spark, "customer", sf_dir),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")


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
