"""Temporal join operators Spark lacks as built-ins: as-of join and
range join — implemented as compositions of existing DataFrame ops
(per the custom-operator policy: composition first, Pandas UDF only if
semantics can't be expressed).

- q57 as-of join: "for each purchase, the user's most recent click at or
  before it". Distributed formulation: union both streams tagged, one
  shuffle by key, and a running ``last(click_ts) ignore nulls`` window —
  the merge-sorted-streams algorithm, O(n log n) per key, no range join.
  DuckDB's native ASOF JOIN is the oracle.

- q58 range join: "clicks in the hour before each purchase". The naive
  form is a non-equi join (nested loop at scale); the scale path
  demonstrated here buckets time into 1-hour bins and equi-joins on
  (user, bin) ∈ {bin(t), bin(t)−1} before applying the exact range
  predicate — turning O(N·M) into an equi-join with ≤2× fan-out.
  The oracle is the plain (exact) range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import EVENTS_US_SQL, table
from mapreduce_framework_spark.registry import register

_EV_US = EVENTS_US_SQL


@register(
    "q57_asof_join",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EV_US} e),
    p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM ev WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    tags=("ext", "temporal", "asof"),
)
def q57_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via tagged union + per-key running last-value window.
    Equal timestamps match (clicks sort before purchases at the same ts,
    mirroring ASOF's >= semantics)."""
    return asof_last_click(table(spark, "events", sf_dir))


def asof_last_click(ev: DataFrame) -> DataFrame:
    """Library form of q57 over any (event_id, user_id, ts, event_type)
    frame — property-tested against a sequential model in
    tests/test_temporal_props.py (equal-ts and tie cases).

    NULL POLICY (round 10, exposed by the sweep's user_id null plan): the
    operator is a JOIN, so NULL keys never match — SQL equality, exactly
    DuckDB's ASOF ON p.user_id = c.user_id. The window formulation would
    silently group all NULL users into one partition and match them to
    each other, so NULL-user clicks are masked out of the match side
    here; NULL-user purchases stay in the output with last_click_ts NULL
    (ASOF LEFT JOIN keeps every probe row)."""
    clicks = ev.where(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind")
    )
    merged = clicks.unionAll(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.where(F.col("kind") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


@register(
    "q58_range_join_binned",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EV_US} e),
    p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM ev WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           count(c.ts) AS clicks_in_prev_hour
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id
    ORDER BY p.event_id
    """,
    tags=("ext", "temporal", "range-join"),
)
def q58_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join by time-bucket equi-join: each click lands in 1-hour bin
    b; a purchase probes bins {b, b−1} (covers any 1-hour lookback), then
    the exact range predicate filters. Plans as a hash join, not a nested
    loop — the 100 TB-viable form."""
    return range_clicks_prev_hour(table(spark, "events", sf_dir))


def range_clicks_prev_hour(ev: DataFrame) -> DataFrame:
    """Library form of q58 — property-tested against a sequential model in
    tests/test_temporal_props.py (bin-boundary and exactly-1h-ago cases)."""
    from mapreduce_framework_spark.catalog import epoch_seconds_ntz
    # NTZ-safe hour bin: TIMESTAMP_NTZ has no numeric cast, so the bin is
    # integer epoch-seconds div 3600 (timezone-independent by construction)
    hour_bin = f"{epoch_seconds_ntz('ts')} div 3600"
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.expr(hour_bin).alias("bin"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.expr(hour_bin).alias("pbin"),
    )
    probes = purchases.withColumn(
        "bin", F.explode(F.array(F.col("pbin"), F.col("pbin") - 1))
    )
    matched = probes.join(
        clicks,
        (probes.user_id == clicks.c_user) & (probes.bin == clicks.bin),
    ).where(
        (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("ts"))
    )
    counts = matched.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("clicks_in_prev_hour")
    )
    return (
        purchases.select("event_id", "user_id")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("clicks_in_prev_hour", F.lit(0)).alias("clicks_in_prev_hour"),
        )
        .orderBy("event_id")
    )
