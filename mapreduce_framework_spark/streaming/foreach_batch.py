"""foreachBatch sink: incremental KV-state materialization to parquet.

The third streaming output pattern (alongside the memory/file sinks and
applyInPandasWithState): ``foreachBatch`` hands each micro-batch to
arbitrary batch code, here a MERGE of the batch's per-key fold into a
persisted state table — the standard lakehouse "streaming upsert" shape.

State versions are written as ``state_v{batch_id}`` directories (write-new
then read-latest), which keeps each batch's write atomic-by-directory the
same way the reference commits via temp-file + rename
(src/mr/worker.go:68-75); a table format (Delta/Iceberg) would replace the
versioned directories with a real MERGE INTO.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _latest_state(
    spark: SparkSession, state_root: str, before_batch: int | None = None
) -> DataFrame | None:
    """Latest persisted state version — restricted to versions STRICTLY
    BEFORE ``before_batch`` when merging a batch. That restriction is what
    makes both merge sinks idempotent under foreachBatch's crash-restart
    redelivery: a failed attempt may already have written state_v{N}, and
    merging batch N on top of its own output would double-count it (pinned
    by tests/test_streaming.py::test_merge_sinks_redelivery_idempotent)."""
    if not os.path.isdir(state_root):
        return None
    versions = sorted(
        (d for d in os.listdir(state_root) if d.startswith("state_v")),
        key=lambda d: int(d.split("state_v")[1]),
    )
    if before_batch is not None:
        versions = [v for v in versions if int(v.split("state_v")[1]) < before_batch]
    if not versions:
        return None
    return spark.read.parquet(os.path.join(state_root, versions[-1]))


def make_kv_merge_batch_fn(spark: SparkSession, state_root: str):
    """Returns the foreachBatch function: fold the batch's ops per key on
    top of the previous persisted state and write the next state version."""
    from mapreduce_framework_spark.operators.kv import fold_ops

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        import pandas as pd

        prev = _latest_state(spark, state_root, before_batch=batch_id)

        def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
            initial = ""
            if pdf["prev_value"].notna().any():
                initial = pdf["prev_value"].dropna().iloc[0]
            ops = pdf[pdf["op"].notna()]
            return pd.DataFrame(
                {"key": [pdf["key"].iloc[0]], "value": [fold_ops(initial, ops)]}
            )

        if prev is None:
            withprev = batch_df.withColumn("prev_value", F.lit(None).cast("string"))
        else:
            withprev = batch_df.join(
                prev.select("key", F.col("value").alias("prev_value")), "key", "left"
            )
        folded = withprev.groupBy("key").applyInPandas(
            fold_group, schema="key string, value string"
        )
        new_state = folded if prev is None else (
            prev.join(folded, "key", "left_anti").unionByName(folded)
        )
        out = os.path.join(state_root, f"state_v{batch_id}")
        new_state.write.mode("overwrite").parquet(out)

    return apply_batch


def make_rollup_merge_batch_fn(spark: SparkSession, state_root: str):
    """foreachBatch function maintaining an hourly continuous aggregate:
    the batch's (hour, event_type) partial aggregates are merged into the
    persisted rollup by re-aggregation — pure algebraic merge (sum of
    counts, sum of exact decimals), so the result is independent of how
    events are sliced into batches. This is the hypertable
    continuous-aggregate maintenance loop (q65's rollup, kept incrementally
    fresh); the state table is bounded by hours × types, tiny even when the
    raw stream is 100 TB."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from mapreduce_framework_spark.catalog import trunc_ntz_expr

        # NTZ-safe hour bucket — date_trunc coerces NTZ through the
        # session timezone (see catalog.trunc_ntz_expr)
        hourly = batch_df.groupBy(
            F.expr(trunc_ntz_expr("ts", 3600)).alias("h"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("val"),
        )
        prev = _latest_state(spark, state_root, before_batch=batch_id)
        merged = (
            hourly
            if prev is None
            else prev.unionByName(hourly)
            .groupBy("h", "event_type")
            .agg(F.sum("cnt").alias("cnt"), F.sum("val").alias("val"))
        )
        out = os.path.join(state_root, f"state_v{batch_id}")
        merged.write.mode("overwrite").parquet(out)

    return apply_batch


def run_rollup_merge_stream(
    events_stream: DataFrame,
    spark: SparkSession,
    state_root: str,
    checkpoint: str,
    timeout_s: int = 300,
) -> DataFrame:
    """Drive the events stream through the rollup-merge sink and return the
    final persisted hourly rollup."""
    q = (
        events_stream.writeStream.foreachBatch(
            make_rollup_merge_batch_fn(spark, state_root)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"rollup merge stream did not finish in {timeout_s}s")
    state = _latest_state(spark, state_root)
    assert state is not None, "stream produced no rollup version"
    return state


def run_kv_merge_stream(
    ops_stream: DataFrame,
    spark: SparkSession,
    state_root: str,
    checkpoint: str,
    timeout_s: int = 180,
) -> DataFrame:
    """Drive the ops stream through the foreachBatch merge sink and return
    the final persisted state."""
    q = (
        ops_stream.writeStream.foreachBatch(
            make_kv_merge_batch_fn(spark, state_root)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"kv merge stream did not finish in {timeout_s}s")
    state = _latest_state(spark, state_root)
    assert state is not None, "stream produced no state version"
    return state
