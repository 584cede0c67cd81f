"""Product-analytics operators over the events stream: session funnel,
cohort retention, and session transition counts.

The reference has no relational/analytics surface at all (SURVEY §2.4);
these are [EXT] queries in the family every event-analytics engine ships.
They compose the engine's existing primitives — ``session_window`` (q27's
boundary semantics), gaps-and-islands window sessionization (the oracle's
formulation, here also run engine-side in q99), and plain aggregations —
into the three standard product questions: do sessions convert (q97), do
cohorts come back (q98), what do users do next (q99).

Scale shape: everything is one shuffle per aggregation keyed by
user/session/cohort — no self-joins, no windows over the whole table,
per-task memory independent of user count. All timestamp math is
TIMESTAMP_NTZ-safe (epoch-anchored ``timestampdiff``; no numeric casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import EVENTS_US_SQL, table
from mapreduce_framework_spark.registry import register

SESSION_GAP_MIN = 30  # same gap as q27/q94 — one sessionization rule engine-wide

_EV_US = EVENTS_US_SQL

# Shared oracle CTE: gaps-and-islands session ids (q27's boundary rule,
# matching native session_window exactly: a gap of EXACTLY the timeout
# still merges, so a new session starts only at gap > 30 min — strict >).
_SESSIONIZED_DUCK = f"""
    x AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM {_EV_US} ev_us
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN prev IS NULL
                       OR ts - prev > INTERVAL '{SESSION_GAP_MIN} minutes'
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
"""


@register(
    "q97_session_funnel",
    oracle=f"""
    WITH {_SESSIONIZED_DUCK},
    g AS (
      SELECT user_id, sid,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(SUM(has_click) AS BIGINT) AS click_sessions,
           CAST(SUM(has_purchase) AS BIGINT) AS purchase_sessions,
           CAST(SUM(has_click * has_purchase) AS BIGINT) AS converted_sessions
    FROM g GROUP BY user_id ORDER BY user_id
    """,
    tags=("ext", "analytics", "funnel", "session"),
)
def q97_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session conversion funnel: sessions (30-min gap, q27's
    rule via native session_window), sessions containing a click, a
    purchase, and both — the click→purchase conversion count. One
    session_window aggregation plus one per-user aggregation; no joins."""
    return session_funnel(table(spark, "events", sf_dir))


def session_funnel(ev: DataFrame) -> DataFrame:
    """Library form of q97 over any (user_id, ts, event_type) frame —
    property-tested against a sequential sessionization model in
    tests/test_funnel_props.py."""
    sessions = ev.groupBy(
        F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"), "user_id"
    ).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "has_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_purchase"
        ),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("has_click").cast("bigint").alias("click_sessions"),
            F.sum("has_purchase").cast("bigint").alias("purchase_sessions"),
            F.sum(F.col("has_click") * F.col("has_purchase"))
            .cast("bigint")
            .alias("converted_sessions"),
        )
        .orderBy("user_id")
    )


@register(
    "q98_cohort_retention",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EV_US} e),
    first_seen AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
      FROM ev GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM ev
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2 ORDER BY cohort_day, day_offset
    """,
    tags=("ext", "analytics", "retention", "cohort"),
)
def q98_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    as active per day-offset from their cohort day. Two aggregations and
    one equi-join on user_id; cohort_day stays TIMESTAMP on both engines
    (a DATE column renders differently across the two pandas paths —
    q65's documented convention). Day truncation is NTZ epoch arithmetic
    (catalog.trunc_ntz_expr) — date_trunc would coerce through the
    session timezone."""
    return cohort_retention(table(spark, "events", sf_dir))


def cohort_retention(ev: DataFrame) -> DataFrame:
    """Library form of q98 over any (user_id, ts) frame — property-tested
    against a sequential model in tests/test_funnel_props.py."""
    from mapreduce_framework_spark.catalog import trunc_ntz_expr

    first_seen = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id", F.expr(trunc_ntz_expr("first_ts", 86400)).alias("cohort_day")
        )
    )
    activity = ev.select(
        "user_id", F.expr(trunc_ntz_expr("ts", 86400)).alias("day")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.expr("timestampdiff(DAY, cohort_day, day)")
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "q99_session_transitions",
    oracle=f"""
    WITH {_SESSIONIZED_DUCK},
    t AS (
      SELECT user_id, sid, event_type,
             lag(event_type) OVER (PARTITION BY user_id, sid
                                   ORDER BY ts, event_id) AS prev_type
      FROM s
    )
    SELECT prev_type, event_type AS curr_type, CAST(count(*) AS BIGINT) AS n
    FROM t WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY prev_type, curr_type
    """,
    tags=("ext", "analytics", "session", "markov"),
)
def q99_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type transition counts (the Markov-chain "what
    happens next" matrix). Engine-side this uses the gaps-and-islands
    sessionization directly — lag + running sum over (user, ts) — showing
    the window-function formulation of q27's rule inside Spark itself,
    then a lag per (user, session) and one count aggregation. All NTZ
    arithmetic goes through timestampdiff (no numeric ts casts)."""
    return session_transitions(table(spark, "events", sf_dir))


def session_transitions(ev: DataFrame) -> DataFrame:
    """Library form of q99 over any (user_id, ts, event_id, event_type)
    frame — property-tested against a sequential model in
    tests/test_funnel_props.py."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "prev", F.lag("ts").over(by_user)
    )
    s = x.withColumn(
        "new_sess",
        F.when(
            F.col("prev").isNull()
            # µs precision: timestampdiff(SECOND) truncates, which under
            # strict > would misclassify fractional gaps in (1800 s, 1801 s)
            | (
                F.expr("timestampdiff(MICROSECOND, prev, ts)")
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("new_sess").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    by_session = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    t = s.withColumn("prev_type", F.lag("event_type").over(by_session))
    return (
        t.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("prev_type", "curr_type")
    )
