"""Skew-resilient aggregation — the salting pattern for 100 TB hot keys.

At scale a handful of hot keys (one viral document, one mega-customer)
overload single reducers. The standard remedies, both demonstrated here:

1. AQE skew-join splitting (on by default in session.py), and
2. **two-stage salted aggregation**: shard each key across S salts,
   partially aggregate (key, salt), then re-aggregate by key. Shuffle #1
   spreads hot keys over S reducers; shuffle #2 touches only
   #distinct-keys × S rows.

q48 computes the same result as a plain groupBy — the oracle (a plain SQL
GROUP BY) *is* the proof that salting preserves semantics for algebraic
aggregates (sum/count/min/max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.registry import register

N_SALTS = 8


def salted_agg(
    df: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """sum/count aggregation of events.value by `key`, salted two-stage."""
    salted = df.withColumn(
        "salt", (F.abs(F.hash("event_id")) % n_salts).cast("int")
    )
    partial = salted.groupBy(key, "salt").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("psum"),
        F.count(F.lit(1)).alias("pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("psum").cast("double").alias("total_value"),
        F.sum("pcnt").alias("n_events"),
    )


@register(
    "q48_salted_skew_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("ext", "skew", "agg"),
)
def q48_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the (low-cardinality ⇒ maximally
    skew-prone) event_type key; must equal the plain GROUP BY oracle."""
    ev = table(spark, "events", sf_dir)
    return salted_agg(ev, "event_type").orderBy("event_type")
