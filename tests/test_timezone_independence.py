"""Session-timezone independence of the timestamp-bearing queries.

The external driver builds its own SparkSession with an unknown
spark.sql.session.timeZone. Spark silently coerces TIMESTAMP_NTZ through
the session timezone in several functions (date_trunc; plain NTZ↔LTZ
casts), which round 4's review caught shifting q65/q96/q98 under a
non-UTC session. All conversions now go through epoch arithmetic
(catalog.ltz_to_ntz_expr / ntz_to_ltz_expr / trunc_ntz_expr); this test
runs the previously-affected queries plus a window representative under
America/New_York and must still match the DuckDB oracle exactly.
"""

from __future__ import annotations

import pytest

from mapreduce_framework_spark.registry import all_queries
from tests.oracle import compare

QUERIES = all_queries()

AFFECTED = [
    "q65_hierarchical_rollup",   # date_trunc hour→day rollup
    "q98_cohort_retention",      # date_trunc day + timestampdiff
    "q25_tumbling_window",       # window() on NTZ
    "q96_incremental_rollup_replay",  # foreachBatch hour buckets
    "q94_streaming_session_replay",   # NTZ→LTZ→NTZ watermark round-trip
]


@pytest.mark.parametrize("name", AFFECTED)
def test_query_matches_oracle_under_non_utc_session(spark, sf_dir, name):
    tz_key = "spark.sql.session.timeZone"
    saved = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        spec = QUERIES[name]
        compare(spec.builder(spark, sf_dir), spec.oracle, sf_dir)
    finally:
        spark.conf.set(tz_key, saved)
