"""Driver-checkable Structured Streaming replays.

The streaming operators (streaming/windows.py, streaming/state.py) are
pytest-verified for batch parity, but a streaming query can't be
hash-compared by the external driver directly — so these builders *run*
the stream to completion (``availableNow`` into a memory sink) inside a
normal ``(spark, sf_dir) -> DataFrame`` builder and return the
materialized result. Because streaming-equals-batch is the operators'
contract, the batch twins' DuckDB oracles apply verbatim: the driver now
hash-checks the streaming execution path itself.

At scale the same topology runs continuously (file source → watermark →
windowed agg / keyed state → sink); availableNow is just the bounded
replay of it.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# batch twins must be registered first — their oracles are reused
import mapreduce_framework_spark.operators.kv  # noqa: F401
import mapreduce_framework_spark.operators.windows  # noqa: F401
from mapreduce_framework_spark.catalog import parquet_path
from mapreduce_framework_spark.operators.kv import kv_ops
from mapreduce_framework_spark.registry import REGISTRY, register
from mapreduce_framework_spark.streaming.state import streaming_kv_state
from mapreduce_framework_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    streaming_session_sessions,
    streaming_tumbling_counts,
)


def _stage_events(sf_dir: str, staging: str) -> None:
    """Copy the (read-only) events table into a file-stream staging dir — a
    parquet "file" may itself be a directory when written by Spark."""
    import shutil

    src = parquet_path(sf_dir, "events")
    if os.path.isdir(src):
        for i, f in enumerate(sorted(os.listdir(src))):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(src, f), os.path.join(staging, f"part_{i}.parquet")
                )
    else:
        shutil.copy(src, staging)


@register(
    "q82_streaming_tumbling_replay",
    oracle=REGISTRY["q25_tumbling_window"].oracle,
    tags=("ext", "streaming", "window", "replay"),
)
def q82_streaming_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q25 through the actual streaming path: file-source readStream →
    watermark → window() agg → availableNow → memory sink; the batch
    oracle must match the materialized stream output exactly."""
    import shutil

    # the file stream source requires a directory — stage the (read-only)
    # events table into one (a parquet "file" may itself be a directory
    # when written by Spark, so branch on isdir)
    staging = os.path.join("/tmp", f"mfs_q82_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging)
    _stage_events(sf_dir, staging)
    try:
        stream = streaming_tumbling_counts(read_events_stream(spark, staging))
        out = run_stream_to_memory(stream, spark, output_mode="update", timeout_s=300)
    finally:
        shutil.rmtree(staging, ignore_errors=True)  # memory sink holds the rows
    return out.orderBy("window_start", "event_type")


@register(
    "q94_streaming_session_replay",
    oracle=REGISTRY["q27_session_window"].oracle,
    tags=("ext", "streaming", "session", "replay"),
)
def q94_streaming_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q27 through the streaming path: session_window (30-min gap) in
    append mode emits a session only once the watermark passes its close —
    so after the corpus batch, two watermark-advancer sentinel batches
    (user_id −1, timestamps 2 h then 4 h past the corpus max) push the
    effective watermark beyond every real session's end. Spark applies a
    recorded watermark one batch late, which is exactly why TWO advancer
    batches are needed: the first records wm = max+2 h, the second makes it
    effective, closing every corpus session (end ≤ max+30 min < max+2 h).
    Sentinel sessions are filtered out; per-user session counts must then
    equal the batch q27 oracle verbatim."""
    import datetime as dt
    import shutil
    import time

    from mapreduce_framework_spark.catalog import EVENTS_SCHEMA, table

    max_ts = table(spark, "events", sf_dir).agg(F.max("ts")).collect()[0][0]
    staging = os.path.join("/tmp", f"mfs_q94_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging)
    _stage_events(sf_dir, staging)

    def advancer(name: str, hours: int) -> None:
        time.sleep(1.1)  # distinct mtime → deterministic file (batch) order
        row = [(-1, max_ts + dt.timedelta(hours=hours), -1, "sentinel", 0.0, "{}")]
        spark.createDataFrame(row, schema=EVENTS_SCHEMA).coalesce(1).write.parquet(
            os.path.join(staging, name)
        )

    try:
        advancer("adv1", 2)
        advancer("adv2", 4)
        stream = streaming_session_sessions(
            read_events_stream(spark, os.path.join(staging, "*"))
        )
        out = run_stream_to_memory(stream, spark, output_mode="append", timeout_s=300)
    finally:
        shutil.rmtree(staging, ignore_errors=True)  # memory sink holds the rows
    return (
        out.where(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("user_id")
    )


@register(
    "q83_streaming_kv_replay",
    oracle=REGISTRY["q06_kv_final_state"].oracle,
    tags=("ext", "streaming", "state", "replay"),
)
def q83_streaming_kv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q06 through the custom stateful streaming operator: the op log is
    staged to parquet, streamed through applyInPandasWithState (keyed
    state carrying the per-key fold), and the final states must equal the
    batch fold's — the reference KV semantics on the streaming engine."""
    from mapreduce_framework_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(spark)
    import shutil

    ops = kv_ops(spark, sf_dir).where(F.col("op") != "get")
    staging = os.path.join("/tmp", f"mfs_q83_{uuid.uuid4().hex[:8]}")
    ops.coalesce(1).write.mode("overwrite").parquet(staging)
    try:
        stream = spark.readStream.schema(ops.schema).parquet(staging)
        out = run_stream_to_memory(
            streaming_kv_state(stream), spark, output_mode="update", timeout_s=300
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)  # memory sink holds the rows
    return out.orderBy("key")
