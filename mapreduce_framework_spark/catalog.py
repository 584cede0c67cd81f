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


def _events_schema():
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# canonical events schema (current testdata generation) — the fallback for
# file-source streams whose staging directory is empty at stream definition
EVENTS_SCHEMA = _events_schema()


# events.parquet has stored ``ts`` two ways across testdata generations:
# TIMESTAMP(NANOS) (read by Spark as a long via nanosAsLong, truncated to
# microseconds here) and plain TIMESTAMP(MICROS) (read natively as
# TIMESTAMP_NTZ). Both normalize to µs TIMESTAMP_NTZ — timezone-independent,
# matching DuckDB's naive TIMESTAMP, so the oracles' truncation
# (EVENTS_US_SQL, a no-op on µs data) sees identical values.
EVENTS_US_SQL = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"

# epoch-anchored NTZ arithmetic: no session-timezone dependence anywhere
_NANOS_TO_NTZ = (
    "timestampadd(MICROSECOND, CAST(ts div 1000 AS LONG), "
    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
)

# seconds since epoch of an NTZ timestamp column — NTZ supports no direct
# numeric cast, so bin/epoch math goes through timestampdiff against the
# epoch anchor (identical semantics to DuckDB's epoch() on naive TIMESTAMP)
def epoch_seconds_ntz(col: str) -> str:
    return (
        f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        f"CAST({col} AS TIMESTAMP_NTZ))"
    )


_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


# LTZ↔NTZ conversions via epoch microseconds — SESSION-TIMEZONE-INDEPENDENT,
# unlike a direct cast (which renders/parses through spark.sql.session.timeZone
# and so silently couples results to ambient session config). unix_micros on
# TIMESTAMP is an instant → micros-since-epoch; anchoring those micros onto
# the NTZ epoch yields the UTC wall-clock deterministically, and vice versa.
def ltz_to_ntz_expr(col: str) -> str:
    return f"timestampadd(MICROSECOND, unix_micros({col}), {_NTZ_EPOCH})"


def ntz_to_ltz_expr(col: str) -> str:
    return f"timestamp_micros(timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col}))"


# Session-timezone-independent truncation for NTZ timestamps. Spark's
# date_trunc coerces TIMESTAMP_NTZ to TIMESTAMP through the session
# timezone (probed: TIMESTAMP_NTZ'2024-01-01 05:30' date_trunc'd to hour
# under America/New_York yields 10:00, type timestamp) — so hour/day
# rollups built on it silently shift with ambient config. This form stays
# in pure NTZ epoch arithmetic.
def trunc_ntz_expr(col: str, unit_seconds: int) -> str:
    return (
        f"timestampadd(SECOND, ({epoch_seconds_ntz(col)} div {unit_seconds})"
        f" * {unit_seconds}, {_NTZ_EPOCH})"
    )


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to µs TIMESTAMP_NTZ regardless of
    which parquet encoding the testdata generation used.

    Covers all three encodings seen across generations: TIMESTAMP(NANOS)
    read as a long (nanosAsLong), native TIMESTAMP_NTZ (pass-through), and
    TIMESTAMP_LTZ (isAdjustedToUTC=true parquet, or a session with
    inferTimestampNTZ disabled) — the LTZ→NTZ conversion goes through
    epoch microseconds (ltz_to_ntz_expr), so the result is the stored UTC
    wall-clock regardless of the enclosing session's timezone, with no
    session-config side effects.

    Rows with a NULL ts are EXCLUDED here, once for every consumer: every
    events operator is time-anchored (windows, sessions, funnels, as-of,
    rollups, the ts-ordered KV replay), an untimable event has no defined
    place in any of them, and the engines disagree on the accident that
    would otherwise decide (Spark's window()/session_window drop NULL-ts
    rows while DuckDB's date_trunc groups them; ORDER BY puts NULLs FIRST
    on Spark, LAST on DuckDB). The oracle twin of this loader policy is
    the events VIEW definition (tools/robustness_sweep.py registers it
    with the same WHERE for the dirty-data differential); the sf tables
    contain no NULL ts, so driver-side oracles are unaffected."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):  # legacy nanos-as-long
        df = df.withColumn("ts", F.expr(_NANOS_TO_NTZ))
    elif isinstance(ts_type, TimestampType):  # LTZ leak-through
        df = df.withColumn("ts", F.expr(ltz_to_ntz_expr("ts")))
    elif not isinstance(ts_type, TimestampNTZType):
        # anything else (string, date, double...) is a generation change
        # this normalizer does not understand — passing it through would
        # let a wrong ts type flow silently into every window/watermark
        raise TypeError(
            f"events.ts has unhandled type {ts_type.simpleString()}; expected "
            "nanos-as-long, timestamp (LTZ), or timestamp_ntz"
        )
    return df.where(F.col("ts").isNotNull())


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
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        return normalize_events_ts(spark.read.parquet(parquet_path(sf_dir, "events")))
    return spark.read.parquet(parquet_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for name in TABLES:
        table(spark, name, sf_dir).createOrReplaceTempView(name)
