"""Time-window queries over the `events` stream table — Q24–Q27.

Batch-mode windowed aggregations using the same ``window()`` /
``session_window()`` expressions the Structured Streaming variants use
(streaming/windows.py) — Spark evaluates them identically in both modes,
which is what makes the batch DuckDB oracle a valid check for the streaming
path (SURVEY §7 M4). The reference is strictly batch with a hard map→reduce
barrier (src/mr/coordinator.go:143-155) and has no windowing (SURVEY §2.4);
these are [EXT].

Tumbling/sliding windows align to the Unix epoch in Spark; the DuckDB twins
use ``time_bucket`` with an explicit epoch origin so bucket boundaries agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import EVENTS_US_SQL, table
from mapreduce_framework_spark.registry import register

EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"


@register(
    "q24_exact_dedup",
    oracle=f"""
    WITH deduped AS (SELECT DISTINCT user_id, event_type FROM {EVENTS_US_SQL} ev_us)
    SELECT event_type, count(*) AS cnt
    FROM deduped GROUP BY event_type ORDER BY event_type
    """,
    tags=("ext", "dedup"),
)
def q24_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a key subset (dropDuplicates → hash aggregate): count
    of distinct (user, type) pairs per type. Full-corpus content dedup is
    in pipeline/dedup.py."""
    ev = table(spark, "events", sf_dir)
    return (
        ev.dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


@register(
    "q25_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts, {EPOCH}) AS window_start,
           event_type, count(*) AS cnt
    FROM {EVENTS_US_SQL} ev_us GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    tags=("ext", "window", "streaming-equiv"),
)
def q25_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour tumbling window per type."""
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
        .orderBy("window_start", "event_type")
    )


@register(
    "q26_sliding_window",
    oracle=f"""
    WITH slid AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts, {EPOCH})
               - k * INTERVAL '15 minutes' AS window_start,
             event_type
      FROM {EVENTS_US_SQL} ev_us, (SELECT unnest([0, 1, 2, 3]) AS k)
    )
    SELECT window_start, event_type, count(*) AS cnt
    FROM slid GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    tags=("ext", "window", "streaming-equiv"),
)
def q26_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour window sliding every 15 minutes (each event lands
    in 4 overlapping windows)."""
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
        .orderBy("window_start", "event_type")
    )


@register(
    "q27_session_window",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM {EVENTS_US_SQL} ev_us
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM x GROUP BY user_id ORDER BY user_id
    """,
    tags=("ext", "window", "session"),
)
def q27_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap, via Spark's native
    ``session_window``. Boundary rule (verified empirically, and pinned by
    tests/test_funnel_props.py's sequential model): a gap of EXACTLY the
    session timeout still merges — a new session starts only at gap > 30
    min — so the oracle's gaps-and-islands formulation uses strict ``>``.
    (Round 5 fix: both sides previously agreed on this data but the oracle
    said ``>=``, a latent boundary mismatch the funnel property tests
    surfaced.)"""
    ev = table(spark, "events", sf_dir)
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("events_in_session"))
    return (
        sessions.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("user_id")
    )


@register(
    "q65_hierarchical_rollup",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS cnt,
             SUM(CAST(value AS DECIMAL(38,6))) AS val
      FROM {EVENTS_US_SQL} e
      GROUP BY 1, 2
    )
    SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day, event_type,
           CAST(SUM(cnt) AS BIGINT) AS cnt, CAST(SUM(val) AS DOUBLE) AS val
    FROM hourly GROUP BY 1, 2 ORDER BY day, event_type
    """,
    tags=("ext", "rollup", "hypertable"),
)
def q65_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: daily totals computed FROM the
    hourly rollup (sum-of-sums), not from raw events — the pattern that lets
    a 100 TB store answer coarse queries from a tiny pre-aggregated table.
    The oracle aggregates the same two levels; equality proves the rollup
    is losslessly composable (algebraic aggregates only). Truncation is
    NTZ epoch arithmetic (catalog.trunc_ntz_expr) — date_trunc would
    coerce through the session timezone."""
    from mapreduce_framework_spark.catalog import trunc_ntz_expr

    ev = table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.expr(trunc_ntz_expr("ts", 3600)).alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("val"),
    )
    return (
        # day stays TIMESTAMP on both engines: a DATE column surfaces as
        # datetime.date objects from Spark but datetime64 from DuckDB's
        # pandas path — same value, different driver-hash rendering.
        hourly.groupBy(
            F.expr(trunc_ntz_expr("h", 86400)).alias("day"), "event_type"
        )
        .agg(F.sum("cnt").alias("cnt"), F.sum("val").cast("double").alias("val"))
        .orderBy("day", "event_type")
    )
