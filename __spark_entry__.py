"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mapreduce_framework_spark``; this module only
adapts the package's query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_framework_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q01 word count — reference app A1, src/mrapps/wc.go)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from mapreduce_framework_spark.operators.mr_queries import q01_wordcount

    return q01_wordcount(spark, "/root/testdata/sf0.001")


def _with_deploy(builder):
    """Ship the package to executor Python workers before any builder that
    may use Python-side operators (applyInPandas/mapInPandas) runs — the
    external driver's process doesn't have this repo on the executors'
    PYTHONPATH."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from mapreduce_framework_spark.deploy import ensure_package_on_executors

        ensure_package_on_executors(spark)
        return builder(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_deploy(spec.builder) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query; omitted entries get the
    driver's weaker rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
