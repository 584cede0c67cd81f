"""Behavioral probes — the Spark analogs of the reference probe apps.

The reference asserts scheduler behavior via MR jobs that watch the
filesystem and process table (SURVEY §2.2 A5/A7/A8); Spark exposes the
same properties through accumulators, partition ids, and task metrics:

- A5 jobcount (exactly 8 map executions for 8 files, test-mr.sh:200-208)
  → accumulator counts map-batch record totals: every input processed
  exactly once absent failures.
- A7/A8 m/rtiming (concurrent workers) → a job over N partitions uses
  multiple distinct partition ids (local[N] executes them in parallel).
- Q29's approximation bound (rsd) vs the exact q16.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.mr import frame_as_inputs, run_job
from mapreduce_framework_spark.operators.relational import (
    q16_count_distinct,
    q29_approx_count_distinct,
)


def test_jobcount_exactly_once_map_accounting(spark, sf_dir):
    """A5 parity: without failures, each input record is consumed by exactly
    one map invocation — the accumulator total equals the input count."""
    acc = spark.sparkContext.accumulator(0)
    docs = table(spark, "documents", sf_dir)
    inputs = frame_as_inputs(docs, "doc_id", "text")
    n_inputs = inputs.count()

    def map_fn(name, contents):
        acc.add(1)
        return [("a", "x")]

    def reduce_fn(key, values):
        return str(len(values))

    result = run_job(inputs, map_fn, reduce_fn, n_reduce=3).collect()
    assert result[0]["value"] == str(n_inputs)
    assert acc.value == n_inputs, f"map ran {acc.value}x for {n_inputs} inputs"


def test_map_parallelism(spark, sf_dir):
    """A7 parity: the map phase runs as many concurrent tasks as there are
    input partitions (the reference asserts ≥2 concurrent workers)."""
    docs = table(spark, "documents", sf_dir).repartition(8)
    pids = {
        r["pid"]
        for r in docs.select(F.spark_partition_id().alias("pid")).distinct().collect()
    }
    assert len(pids) >= 2


def test_q29_within_rsd_bound(spark, sf_dir):
    exact = {
        r["o_orderpriority"]: r["n_custs"]
        for r in q16_count_distinct(spark, sf_dir).collect()
    }
    approx = {
        r["o_orderpriority"]: r["n_custs_approx"]
        for r in q29_approx_count_distinct(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err < 0.15, f"{k}: approx={approx[k]} exact={exact[k]}"


def test_q69_approx_percentiles_within_bounds(spark, sf_dir):
    from mapreduce_framework_spark.operators.relational import q69_approx_percentiles
    from mapreduce_framework_spark.operators.functions_battery import q54_percentiles

    exact = {
        r["l_returnflag"]: (r["p25_price"], r["p75_price"], r["p99_price"])
        for r in q54_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p50"], r["p99"])
        for r in q69_approx_percentiles(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, (p25, p75, p99) in exact.items():
        a50, a99 = approx[flag]
        assert p25 <= a50 <= p75, f"{flag}: p50 approx {a50} outside IQR"
        assert abs(a99 - p99) / p99 < 0.05, f"{flag}: p99 approx {a99} vs {p99}"


@pytest.mark.slow  # r14 item 2: excluded from the default run (pytest.ini)
def test_all_query_schemas_stable_across_sf(spark):
    """Driver contract: a query's schema must not depend on the scale
    factor — the driver smoke-checks entry() at sf0.001 but records
    correctness at sf0.01, and bench runs at sf0.1. Builds every
    registered query at two SFs and compares schemas (lazy for most
    builders; the eager dedup-pipeline builders run their small jobs)."""
    import os

    from mapreduce_framework_spark.registry import all_queries

    root = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    a_dir = os.path.join(root, "sf0.001")
    b_dir = os.path.join(root, "sf0.01")
    for name, spec in all_queries().items():
        sa = spec.builder(spark, a_dir).schema
        sb = spec.builder(spark, b_dir).schema
        assert sa == sb, f"{name}: schema differs across SFs\n  {sa}\n  {sb}"


def test_bad_sf_dir_fails_cleanly(spark):
    """A nonexistent data directory must surface as a clean
    AnalysisException (PATH_NOT_FOUND) at build time — not a hang, not a
    partial result — for every operator family's entry table read."""
    import pytest
    from pyspark.errors import AnalysisException

    from mapreduce_framework_spark.operators.mr_queries import q01_wordcount
    from mapreduce_framework_spark.operators.relational import (
        q12_join_revenue_per_nation,
    )
    from mapreduce_framework_spark.pipeline.dedup import q31_minhash_lsh_neardup
    from mapreduce_framework_spark.pipeline.similarity import q34_ann_bruteforce

    for builder in (
        q01_wordcount,
        q12_join_revenue_per_nation,
        q31_minhash_lsh_neardup,
        q34_ann_bruteforce,
    ):
        with pytest.raises(AnalysisException):
            builder(spark, "/root/testdata/sf_does_not_exist")


def test_run_job_observation_metrics(spark, sf_dir):
    """A5/A7 accounting via the built-in Observation hook: map-output record
    and distinct-key counts arrive with the job result."""
    from pyspark.sql import Observation

    docs = table(spark, "documents", sf_dir)
    inputs = frame_as_inputs(docs, "doc_id", "text")
    n_docs = inputs.count()

    def map_fn(name, contents):
        return [("k1", name), ("k2", name)]

    def reduce_fn(key, values):
        return str(len(values))

    obs = Observation("mr-metrics")
    result = run_job(inputs, map_fn, reduce_fn, n_reduce=3, observation=obs)
    rows = {r["key"]: r["value"] for r in result.collect()}
    assert rows == {"k1": str(n_docs), "k2": str(n_docs)}
    assert obs.get["map_output_records"] == 2 * n_docs
    assert obs.get["approx_distinct_keys"] == 2  # exact at tiny cardinality
