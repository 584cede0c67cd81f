"""Scale-pattern behavior tests: bucketed co-located joins (no shuffle),
CSV/JSON source-sink roundtrips, and salted-agg equivalence plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.sources import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from mapreduce_framework_spark.storage import write_bucketed, write_partitioned


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both join sides on the key (the 100 TB co-location
    pattern) must produce a join plan with NO Exchange — the shuffle happens
    once at write time, then every subsequent join is free."""
    o = table(spark, "orders", sf_dir)
    c = table(spark, "customer", sf_dir)
    # external tables under tmp_path (warehouse dir is a static conf)
    write_bucketed(o, "orders_bkt", str(tmp_path / "orders_bkt"), ["o_custkey"], 8)
    write_bucketed(c, "customer_bkt", str(tmp_path / "customer_bkt"), ["c_custkey"], 8)
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_bkt").join(
            spark.table("customer_bkt"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it is correct
        assert j.count() == o.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


@pytest.mark.parametrize("fmt", ["csv", "jsonl"])
def test_source_sink_roundtrip(spark, sf_dir, tmp_path, fmt):
    """CSV/JSON-lines sinks+sources must be lossless for typed rows
    (incl. timestamps at µs precision)."""
    orig = table(spark, "orders", sf_dir).limit(500)
    path = str(tmp_path / f"orders_{fmt}")
    if fmt == "csv":
        write_csv(orig, path)
        back = read_csv(spark, path, orig.schema)
    else:
        write_jsonl(orig, path)
        back = read_jsonl(spark, path, orig.schema)
    a = sorted(tuple(r) for r in orig.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_partition_pruning_on_date_partitioned_sink(spark, sf_dir, tmp_path):
    """Writing events partitioned by day and querying one day must prune at
    planning time (PartitionFilters), reading only that day's files — the
    bedrock 100 TB layout pattern."""
    ev = table(spark, "events", sf_dir)
    out = str(tmp_path / "events_by_day")
    write_partitioned(
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")), out, "day"
    )
    back = spark.read.parquet(out)
    one_day = back.where(F.col("day") == "2024-01-05")
    plan = one_day._sc._jvm.PythonSQLUtils.explainString(
        one_day._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan.split("PartitionFilters")[1].splitlines()[0]
    # correctness of the pruned read
    expected = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
    assert one_day.count() == expected > 0
