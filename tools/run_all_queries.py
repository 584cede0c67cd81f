#!/usr/bin/env python3
"""Run every registered query at a given scale factor and print a timing
table — the full-surface counterpart to bench.py's headline suite.

Usage: python tools/run_all_queries.py [/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_spark.deploy import ensure_package_on_executors
from mapreduce_framework_spark.registry import all_queries
from mapreduce_framework_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="run-all-queries")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()  # warm

    total = 0.0
    print(f"{'query':<34} {'rows':>8} {'sec':>7}  oracle")
    for name, spec in sorted(all_queries().items()):
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name:<34} {n:>8} {dt:>7.2f}  {'exact' if spec.oracle else 'rows-only'}")
    print(f"{'TOTAL':<34} {'':>8} {total:>7.2f}")


if __name__ == "__main__":
    main()
