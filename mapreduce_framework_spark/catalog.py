"""Loaders for the synthetic test tables (see TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table per scale factor.

The reference's only "catalog" is a list of input filenames passed on the
command line (``src/main/mrcoordinator.go:23``, ``src/mr/coordinator.go:237-251``);
here tables are parquet reads so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# events.parquet stores TIMESTAMP(NANOS); Spark has no nanosecond timestamp
# type, so it is read as a long (nanosAsLong) and truncated to microseconds.
# The DuckDB oracles apply the same truncation (EVENTS_US_SQL) so both
# engines see identical µs timestamps.
EVENTS_US_SQL = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"


def parquet_path(sf_dir: str, name: str) -> str:
    """The on-disk path of a table — the single place the layout
    convention lives (executor-side readers must use this too)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # runtime-settable; must not rely on session-construction config
        # because the external driver builds its own SparkSession
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(parquet_path(sf_dir, "events"))
        from pyspark.sql import functions as F

        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts div 1000 AS LONG))")
        )
    return spark.read.parquet(parquet_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for name in TABLES:
        table(spark, name, sf_dir).createOrReplaceTempView(name)
