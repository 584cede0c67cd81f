"""Structured Streaming parity + watermark semantics.

The reference is batch-only; its KV semantics (per-key linearizable fold)
map to keyed streaming state (SURVEY §2.3, §7 M4). These tests check:

1. streaming tumbling window == batch q25 (same window() expression),
2. applyInPandasWithState KV fold across multiple micro-batches == batch
   q06 fold (the q28 parity contract),
3. watermark actually drops data later than the lateness bound.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_spark.operators.kv import kv_ops, q06_kv_final_state
from mapreduce_framework_spark.operators.windows import q25_tumbling_window
from mapreduce_framework_spark.streaming.state import streaming_kv_state
from mapreduce_framework_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    streaming_tumbling_counts,
)


def test_tumbling_window_streaming_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)

    stream = streaming_tumbling_counts(read_events_stream(spark, src))
    # single file -> single micro-batch; update mode emits every window once
    got = run_stream_to_memory(stream, spark, output_mode="update")
    got_rows = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in got.collect()
    }

    batch = q25_tumbling_window(spark, sf_dir)
    batch_rows = {
        (r["window_start"], r["event_type"]): r["cnt"] for r in batch.collect()
    }
    assert got_rows == batch_rows


@pytest.mark.slow  # r14 item 2: fold arithmetic oracle-checked by q28 replay + kv_model differential
def test_kv_state_across_microbatches_matches_batch(spark, sf_dir, tmp_path):
    """Time-slice the op log into 3 files → 3 micro-batches in ts order; the
    keyed state must accumulate across batches to the same final state as
    the batch fold (q06)."""
    ops = kv_ops(spark, sf_dir).where(F.col("op") != "get")
    rows = ops.orderBy("ts", "event_id").collect()
    src = str(tmp_path / "ops_src")
    os.makedirs(src)
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        if not chunk:
            continue
        spark.createDataFrame(chunk, schema=ops.schema).coalesce(1).write.parquet(
            os.path.join(src, f"slice_{i}")
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream_ops = (
        spark.readStream.schema(ops.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "slice_*"))
    )
    result = run_stream_to_memory(
        streaming_kv_state(stream_ops), spark, output_mode="update", timeout_s=180
    )
    # update-mode memory sink: the final state of a key is its value after
    # the highest batch that touched it; appends only extend and puts reset,
    # so take the row from the last emit = the one for the max batch ordinal.
    # The sink appends per batch in order; use the last occurrence per key.
    pdf = result.toPandas()
    final = {}
    for _, r in pdf.iterrows():
        final[r["key"]] = r["value"]  # later batches appended later

    batch_rows = {r["key"]: r["value"] for r in q06_kv_final_state(spark, sf_dir).collect()}
    assert final == batch_rows


def test_watermark_drops_late_data(spark, tmp_path):
    """File 1 sets the event-time high mark (12:00 → watermark 11:00); the
    watermark becomes effective for late-row filtering one batch after it is
    recorded, so file 3 carries the late 09:30 event — it must be dropped
    (numRowsDroppedByWatermark), and its window must never be emitted."""
    import pandas as pd

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write(name, ts_list, base):
        ns = [int(pd.Timestamp(t).value) for t in ts_list]
        pdf = pd.DataFrame(
            {
                "event_id": [base + i for i in range(len(ns))],
                "ts": ns,
                "user_id": [1] * len(ns),
                "event_type": ["click"] * len(ns),
                "value": [1.0] * len(ns),
                "props": ["{}"] * len(ns),
            }
        )
        pdf.to_parquet(os.path.join(src, name))

    write("f1.parquet", ["2024-01-01 10:05", "2024-01-01 11:05", "2024-01-01 12:00"], 0)
    time.sleep(1.1)
    write("f2.parquet", ["2024-01-01 12:10"], 10)
    time.sleep(1.1)
    write("f3.parquet", ["2024-01-01 09:30", "2024-01-01 12:30"], 20)

    stream = streaming_tumbling_counts(
        read_events_stream(spark, src), watermark="1 hour"
    )
    name = "late_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    emitted = {r["window_start"].hour for r in spark.table(name).collect()}
    assert dropped >= 1, f"late row was not dropped by the watermark: {emitted}"
    assert 9 not in emitted, f"late window leaked into output: {emitted}"
    # bounded-state claim, MEASURED: closed (window, type) groups are evicted
    # once the watermark passes window_end + lateness — the final state must
    # hold fewer groups than were ever created (10:00/11:00/12:00 existed;
    # the evicted ones must not linger)
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    assert totals and totals[-1] < 3, (
        f"windowed-agg state not evicted by watermark: {totals}"
    )


def test_sliding_window_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Same window(1h, 15min) expression through readStream == batch q26."""
    from mapreduce_framework_spark.operators.windows import q26_sliding_window

    src = str(tmp_path / "slide_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)

    events = read_events_stream(spark, src)
    stream = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # LTZ→NTZ is wall-clock identity under the UTC session pin; keeps
        # the streamed keys comparable to the batch (NTZ) twin
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "cnt",
        )
    )
    got = run_stream_to_memory(stream, spark, output_mode="update")
    got_rows = {(r["window_start"], r["event_type"]): r["cnt"] for r in got.collect()}
    batch_rows = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in q26_sliding_window(spark, sf_dir).collect()
    }
    assert got_rows == batch_rows


def test_session_window_streaming_matches_batch_closed_sessions(
    spark, sf_dir, tmp_path
):
    """Streaming session_window (30-min gap) must emit exactly the sessions
    the batch computation produces, for sessions closed by the final
    watermark (trailing still-open sessions are withheld by design)."""
    from mapreduce_framework_spark.catalog import table

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)

    ev_batch = table(spark, "events", sf_dir)
    max_ts = ev_batch.agg(F.max("ts")).collect()[0][0]

    events = read_events_stream(spark, src)
    stream = (
        events.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").cast("timestamp_ntz").alias("s"),
            F.col("sw.end").cast("timestamp_ntz").alias("e"),
            "user_id",
            "n_events",
        )
    )
    got = run_stream_to_memory(stream, spark, output_mode="append", timeout_s=180)
    got_rows = {(r["s"], r["e"], r["user_id"]): r["n_events"] for r in got.collect()}

    batch = ev_batch.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("sw.start").alias("s"), F.col("sw.end").alias("e"), "user_id", "n_events"
    )
    batch_all = {(r["s"], r["e"], r["user_id"]): r["n_events"] for r in batch.collect()}

    # streamed sessions must be a value-exact subset of the batch sessions...
    assert set(got_rows) <= set(batch_all)
    assert all(batch_all[k] == v for k, v in got_rows.items())
    # ...and every session that closed at least one gap before the final
    # watermark must have been emitted (Spark withholds sessions ending
    # within one gap of the watermark, observed empirically)
    import datetime as dt

    cutoff = max_ts - dt.timedelta(minutes=30)
    must_emit = {k for k in batch_all if k[1] <= cutoff}
    missing = must_emit - set(got_rows)
    assert not missing, f"{len(missing)} closed sessions not emitted"
    assert len(got_rows) >= len(must_emit) > 0


def test_streaming_parquet_sink_exactly_once_on_restart(spark, sf_dir, tmp_path):
    """Exactly-once output parity (the property the reference's early-exit/
    jobcount tests pin, test-mr.sh:188-267): re-running a checkpointed
    streaming query over already-processed data must write no duplicates."""
    src = str(tmp_path / "eo_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    out = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ckpt")

    def run_once():
        events = read_events_stream(spark, src)
        q = (
            events.select("event_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # restart with same checkpoint: no new input -> no new rows
    n2 = spark.read.parquet(out).count()
    assert n1 == n2
    ids = spark.read.parquet(out).groupBy("event_id").count()
    assert ids.where(F.col("count") > 1).count() == 0, "duplicate outputs"


def test_stream_stream_interval_self_join(spark, sf_dir, tmp_path):
    """Stream-stream interval join (purchases ⋈ clicks within the previous
    hour, both watermarked): total matched pairs must equal the batch
    interval join."""
    from mapreduce_framework_spark.catalog import table

    src = str(tmp_path / "ss_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)

    events = read_events_stream(spark, src)
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "user_id = c_user AND c_ts >= ts - INTERVAL 1 HOUR AND c_ts < ts"
        ),
    )
    got = run_stream_to_memory(joined, spark, output_mode="append", timeout_s=180)
    n_stream = got.count()

    ev = table(spark, "events", sf_dir)
    cb = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    pb = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    n_batch = pb.join(
        cb,
        (pb.user_id == cb.c_user)
        & (cb.c_ts >= pb.ts - F.expr("INTERVAL 1 HOUR"))
        & (cb.c_ts < pb.ts),
    ).count()
    assert n_stream == n_batch > 0


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_foreach_batch_incremental_merge_matches_batch(spark, sf_dir, tmp_path):
    """foreachBatch merge sink: 3 time-sliced micro-batches incrementally
    merged into versioned parquet state must converge to the batch q06
    fold."""
    from mapreduce_framework_spark.streaming.foreach_batch import run_kv_merge_stream

    ops = kv_ops(spark, sf_dir).where(F.col("op") != "get")
    rows = ops.orderBy("ts", "event_id").collect()
    src = str(tmp_path / "fb_src")
    os.makedirs(src)
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        if not chunk:
            continue
        spark.createDataFrame(chunk, schema=ops.schema).coalesce(1).write.parquet(
            os.path.join(src, f"slice_{i}")
        )
        time.sleep(1.1)

    stream_ops = (
        spark.readStream.schema(ops.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "slice_*"))
    )
    state = run_kv_merge_stream(
        stream_ops,
        spark,
        state_root=str(tmp_path / "fb_state"),
        checkpoint=str(tmp_path / "fb_ckpt"),
    )
    got = {r["key"]: r["value"] for r in state.collect()}
    expected = {r["key"]: r["value"] for r in q06_kv_final_state(spark, sf_dir).collect()}
    assert got == expected


def test_streaming_exact_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Duplicate documents injected into a 2-batch stream: the streaming
    dedup's kept set must equal the batch distinct-by-content set, with
    duplicates in the *second* micro-batch suppressed by state from the
    first (the incremental-ingest contract)."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.streaming.dedup import streaming_exact_dedup

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    n_docs = docs.count()
    # batch 1: the corpus; batch 2: 100 re-crawled copies under new doc_ids
    dups = (
        docs.where(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs.coalesce(1).write.parquet(os.path.join(src, "b0"))
    time.sleep(1.1)
    dups.coalesce(1).write.parquet(os.path.join(src, "b1"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    kept = run_stream_to_memory(
        streaming_exact_dedup(stream), spark, output_mode="append", timeout_s=180
    )
    # every original content kept exactly once; no re-crawled copy survives
    # (their hashes were already in state from batch 1)
    assert kept.count() == docs.select("text").distinct().count()
    assert kept.where(F.col("doc_id") >= 1_000_000).count() == 0
    got_hashes = {r["content_hash"] for r in kept.select("content_hash").collect()}
    want_hashes = {
        r["h"] for r in docs.select(F.xxhash64("text").alias("h")).distinct().collect()
    }
    assert got_hashes == want_hashes


def test_streaming_dedup_within_watermark_evicts_old_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics end-to-end: duplicates inside
    the delay are suppressed; once the watermark passes first_seen + delay
    the state is evicted and a far-later duplicate is re-admitted. This is
    the bounded-state trade documented in streaming/dedup.py."""
    import datetime as dt

    from mapreduce_framework_spark.streaming.dedup import (
        streaming_dedup_within_watermark,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def mk(ids, minutes):
        ts = t0 + dt.timedelta(minutes=minutes)
        return [(i, ts) for i in ids]

    # The watermark recorded at the end of batch N only becomes *effective*
    # in batch N+1 (same lag as the late-data tests), so an extra
    # watermark-advancing batch sits between the advance and the re-probe.
    batches = [
        mk([1, 2, 3, 4, 5], 0),    # first sight; state expires at 10:20
        mk([1, 2, 3, 4, 5], 10),   # dups within 20-min delay -> suppressed
        mk([6], 60),               # records watermark 10:40
        mk([7], 70),               # 10:40 now effective -> ids 1-5 evicted
        mk([1, 2, 3, 4, 5], 80),   # re-admitted: state is gone
    ]
    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    schema = "id LONG, ts TIMESTAMP"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema=schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    progress: list = []
    out = run_stream_to_memory(
        streaming_dedup_within_watermark(stream, ["id"], "ts", "20 minutes"),
        spark,
        output_mode="append",
        timeout_s=180,
        progress_sink=progress,
    )
    pdf = out.toPandas()
    # 5 first-sight + 2 fresh + 5 re-admitted after eviction = 12
    assert len(pdf) == 12, pdf.sort_values(["ts", "id"]).to_string()
    assert sorted(pdf["id"]) == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7]
    # bounded-state claim, MEASURED: the state store must hold only rows the
    # watermark hasn't expired — 12 distinct admissions ever, but the final
    # batch may retain at most the 5 re-admitted ids + ids 6 and 7 (the
    # first-generation 1–5 were evicted when watermark 10:40 took effect)
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    ]
    assert totals, "no state-operator progress captured"
    assert totals[-1] <= 7, f"state not bounded by watermark eviction: {totals}"
    assert max(totals) < 12, f"state grew to the full admission count: {totals}"


def test_read_events_stream_empty_staging_dir_falls_back_to_canonical_schema(
    spark, tmp_path
):
    """A file-source stream is routinely defined before any file lands in
    its staging directory; schema peeking must fall back to the canonical
    events schema instead of dying on 'unable to infer schema'."""
    src = str(tmp_path / "empty_src")
    os.makedirs(src)
    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    types = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
    # ts is LTZ (watermark-able) after the reader's NTZ→LTZ cast
    assert types["ts"] == "timestamp"
    assert set(types) == {"event_id", "ts", "user_id", "event_type", "value", "props"}


def test_normalize_events_ts_converts_ltz_leak_through(spark):
    """If ts arrives as TIMESTAMP (LTZ) — isAdjustedToUTC parquet or a
    session with inferTimestampNTZ disabled — normalize_events_ts must
    still land on NTZ with the stored UTC wall-clock, not silently pass
    the session-timezone-dependent LTZ through."""
    import datetime as dt

    from mapreduce_framework_spark.catalog import normalize_events_ts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 30, 0))], schema="event_id LONG, ts TIMESTAMP"
    )
    out = normalize_events_ts(df)
    assert out.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    assert out.collect()[0]["ts"] == dt.datetime(2024, 1, 1, 12, 30, 0)


def test_normalize_events_ts_rejects_unhandled_types(spark):
    """A ts column in an encoding the normalizer does not understand must
    raise, not pass through into every downstream window/watermark
    (round-4 ADVICE)."""
    import pytest

    from mapreduce_framework_spark.catalog import normalize_events_ts

    df = spark.createDataFrame([(1, "2024-01-01")], schema="event_id LONG, ts STRING")
    with pytest.raises(TypeError, match="unhandled type string"):
        normalize_events_ts(df)


def test_incremental_ingest_rejects_cross_batch_dups(spark, sf_dir):
    """q95 end-to-end sanity beyond the oracle hash: the ingest loop must
    actually exercise the reject path (the synthetic corpus carries
    near-dups across the tercile split), every rejection must point at an
    ADMITTED doc from an earlier batch (never at another reject — the
    index only ever contains admitted docs), and every reported match must
    clear the threshold."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.registry import all_queries

    pdf = (
        all_queries()["q95_incremental_ingest_dedup"]
        .builder(spark, sf_dir)
        .toPandas()
    )
    rejected = pdf[~pdf.admitted]
    admitted = pdf[pdf.admitted]
    assert len(rejected) > 0, "fixture should produce cross-batch near-dups"
    assert len(admitted) + len(rejected) == len(pdf)
    assert (rejected.jaccard >= JACCARD_THRESHOLD).all()
    assert set(rejected.matched_id) <= set(admitted.doc_id)
    assert (admitted.matched_id == -1).all()


def test_incremental_rollup_is_slicing_invariant(spark, sf_dir, tmp_path):
    """The algebraic-merge claim of q96, measured: merging the events in 2
    arbitrary slices must produce the identical rollup state as any other
    slicing (the registry form uses 3 time slices; both must equal the
    plain batch hourly aggregate)."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.streaming.foreach_batch import (
        run_rollup_merge_stream,
    )

    ev = table(spark, "events", sf_dir)
    src = str(tmp_path / "ev2")
    os.makedirs(src)
    # slice by event_id parity — deliberately NOT time-ordered
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "s0")
    )
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "s1")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "s*"))
    )
    state = run_rollup_merge_stream(
        stream,
        spark,
        state_root=str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    got = {
        (r["h"], r["event_type"]): (r["cnt"], float(r["val"]))
        for r in state.collect()
    }
    batch = ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("val"),
    )
    want = {
        (r["h"], r["event_type"]): (r["cnt"], float(r["val"]))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_window_under_rocksdb_state_store(spark, sf_dir, tmp_path):
    """The local suite runs the default HDFS-backed in-memory state store;
    a 100 TB deployment runs RocksDB (bounded executor memory, spill to
    local disk). The windowed-agg result must be identical under the
    RocksDB provider — this pins that the operators carry no
    provider-specific assumptions."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    try:
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        src = str(tmp_path / "rocks_src")
        os.makedirs(src)
        shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
        stream = streaming_tumbling_counts(read_events_stream(spark, src))
        # generous timeout: RocksDB instance setup per state partition is
        # slower than the in-memory provider under host contention
        got = run_stream_to_memory(stream, spark, output_mode="update", timeout_s=300)
        got_rows = {
            (r["window_start"], r["event_type"]): r["cnt"] for r in got.collect()
        }
        batch_rows = {
            (r["window_start"], r["event_type"]): r["cnt"]
            for r in q25_tumbling_window(spark, sf_dir).collect()
        }
        assert got_rows == batch_rows
    finally:
        if saved is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, saved)


@pytest.mark.slow  # r14 item 2: parametrized backend pair; state restart semantics stay via the oracle-checked replays
@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_kv_state_recovers_across_query_restart(spark, sf_dir, tmp_path, provider):
    """F11's streaming analog: kill the stateful query between micro-batches
    and restart it from the SAME checkpoint — the per-key state store must
    recover, so ops processed after the restart fold onto pre-restart
    state and the combined emissions equal the batch fold (q06).

    Run 1 processes the first two time-slices of the op log and stops; a
    brand-new query object (same checkpoint, same source glob) picks up
    slice 3 only. If recovery were broken, every key touched in slice 3
    would restart its fold from "" and the final values would diverge
    from the batch oracle. Runs under BOTH state-store providers: the
    default HDFS-backed one and RocksDB (the 100 TB deployment's), so
    checkpoint recovery is pinned on the provider a real cluster uses."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    if provider == "rocksdb":
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        _run_restart_recovery(spark, sf_dir, tmp_path)
    finally:
        if saved is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, saved)


def _run_restart_recovery(spark, sf_dir, tmp_path):
    ops = kv_ops(spark, sf_dir).where(F.col("op") != "get")
    rows = ops.orderBy("ts", "event_id").collect()
    src = str(tmp_path / "ops_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    third = (len(rows) + 2) // 3
    slices = [rows[i * third : (i + 1) * third] for i in range(3)]
    assert all(slices), "need 3 non-empty micro-batches"

    emitted: list = []  # (batch_ordinal, key, value) across BOTH runs

    def run_once(n_slices_present: int) -> int:
        """(Re)start the query against whatever slices exist; returns the
        number of micro-batches this run processed."""
        stream_ops = (
            spark.readStream.schema(ops.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "slice_*"))
        )
        batches = []

        def sink(df, epoch_id):
            for r in df.collect():
                emitted.append((epoch_id, r["key"], r["value"]))
            batches.append(epoch_id)

        q = (
            streaming_kv_state(stream_ops)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return len(batches)

    for i in (0, 1):
        spark.createDataFrame(slices[i], schema=ops.schema).coalesce(1).write.parquet(
            os.path.join(src, f"slice_{i}")
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order
    n_run1 = run_once(2)
    assert n_run1 >= 1
    seen_after_run1 = len(emitted)

    spark.createDataFrame(slices[2], schema=ops.schema).coalesce(1).write.parquet(
        os.path.join(src, "slice_2")
    )
    n_run2 = run_once(3)
    # restart resumed from the checkpoint: only the NEW slice was processed
    assert n_run2 == 1, f"restart reprocessed {n_run2} batches, expected 1"
    assert len(emitted) > seen_after_run1

    final: dict[str, str] = {}
    for _epoch, key, value in emitted:  # chronological; later emits win
        final[key] = value
    batch_rows = {
        r["key"]: r["value"] for r in q06_kv_final_state(spark, sf_dir).collect()
    }
    assert final == batch_rows


def test_ingest_batch_redelivery_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch redelivers the in-flight batch after a crash/restart
    with the SAME batch_id. The ingest sink must be idempotent under that
    redelivery: matching must exclude the current batch's own (possibly
    partial) delta from the failed attempt — otherwise every redelivered
    doc self-matches against its own signatures, flips to rejected, and
    the delta is overwritten EMPTY (silent data loss)."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)

    index_root = str(tmp_path / "index")
    dec_root = str(tmp_path / "decisions")
    fn = make_ingest_batch_fn(spark, index_root, dec_root, JACCARD_THRESHOLD)

    fn(b0, 0)
    fn(b1, 1)
    once = {
        (r["doc_id"], r["admitted"], r["matched_id"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dec_root)
        .collect()
    }
    delta1_once = _delta(spark, str(tmp_path / "index"), 1).count()
    assert delta1_once > 0

    fn(b1, 1)  # crash-and-restart redelivery of the same batch id
    twice = {
        (r["doc_id"], r["admitted"], r["matched_id"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dec_root)
        .collect()
    }
    delta1_twice = _delta(spark, str(tmp_path / "index"), 1).count()
    assert twice == once, "redelivered batch changed the recorded decisions"
    assert delta1_twice == delta1_once, "redelivered batch rewrote its delta"


def test_merge_sinks_redelivery_idempotent(spark, sf_dir, tmp_path):
    """Crash-restart redelivery (same batch_id, state_v{id} already on
    disk) must leave both foreachBatch merge sinks unchanged: the KV fold
    must not re-append the batch's ops onto its own output, and the
    rollup must not double-count the batch."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.streaming.foreach_batch import (
        make_kv_merge_batch_fn,
        make_rollup_merge_batch_fn,
    )

    ops = kv_ops(spark, sf_dir).where(F.col("op") != "get")
    rows = ops.orderBy("ts", "event_id").collect()
    half = len(rows) // 2
    b0 = spark.createDataFrame(rows[:half], schema=ops.schema)
    b1 = spark.createDataFrame(rows[half:], schema=ops.schema)

    kv_root = str(tmp_path / "kv_state")
    kv_fn = make_kv_merge_batch_fn(spark, kv_root)
    kv_fn(b0, 0)
    kv_fn(b1, 1)
    once = {
        (r["key"], r["value"])
        for r in spark.read.parquet(kv_root + "/state_v1").collect()
    }
    kv_fn(b1, 1)  # redelivery
    twice = {
        (r["key"], r["value"])
        for r in spark.read.parquet(kv_root + "/state_v1").collect()
    }
    assert twice == once, "KV merge re-applied the redelivered batch"

    ev = table(spark, "events", sf_dir).select("ts", "event_type", "value")
    e_rows = ev.limit(2000).collect()
    eb0 = spark.createDataFrame(e_rows[:1000], schema=ev.schema)
    eb1 = spark.createDataFrame(e_rows[1000:], schema=ev.schema)
    ru_root = str(tmp_path / "rollup_state")
    ru_fn = make_rollup_merge_batch_fn(spark, ru_root)
    ru_fn(eb0, 0)
    ru_fn(eb1, 1)
    once = {
        (r["h"], r["event_type"], r["cnt"], str(r["val"]))
        for r in spark.read.parquet(ru_root + "/state_v1").collect()
    }
    ru_fn(eb1, 1)  # redelivery
    twice = {
        (r["h"], r["event_type"], r["cnt"], str(r["val"]))
        for r in spark.read.parquet(ru_root + "/state_v1").collect()
    }
    assert twice == once, "rollup merge double-counted the redelivered batch"


def test_streaming_replays_handle_empty_input(spark, tmp_path):
    """An empty events/documents table (a routine filter/partition result
    at 100 TB) must yield the exactly-known empty result, not a crash:
    before the round-5 guards, the three replay builders' 1-row min/max
    sentinel collects returned NULLs and the driver-side arithmetic threw
    TypeError. The early returns keep the populated path's schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_framework_spark.operators.streaming_replay import (
        q94_streaming_session_replay,
        q95_incremental_ingest_dedup,
        q96_incremental_rollup_replay,
    )

    src = "/root/testdata/sf0.001"
    for t in ("events", "documents"):
        pq.write_table(
            pq.read_table(f"{src}/{t}.parquet").slice(0, 0),
            str(tmp_path / f"{t}.parquet"),
        )
    sf = str(tmp_path)

    out94 = q94_streaming_session_replay(spark, sf)
    assert out94.collect() == [] and out94.columns == ["user_id", "n_sessions"]

    out95 = q95_incremental_ingest_dedup(spark, sf)
    assert out95.collect() == [] and out95.columns == [
        "doc_id",
        "admitted",
        "matched_id",
        "jaccard",
    ]

    out96 = q96_incremental_rollup_replay(spark, sf)
    assert out96.collect() == [] and out96.columns == [
        "h",
        "event_type",
        "cnt",
        "val",
    ]


def test_events_loader_excludes_null_ts(spark, tmp_path):
    """The loader policy for untimable events: a NULL ts row is excluded
    by normalize_events_ts once for every consumer — every events
    operator is time-anchored, and the engines disagree on the accident
    that would otherwise decide (Spark windows drop NULL-ts rows,
    DuckDB's date_trunc groups them; ORDER BY NULL placement differs).
    The oracle twin is the events VIEW definition in
    tools/robustness_sweep.py."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_framework_spark.catalog import table

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    n = src.num_rows
    mask = pa.array([i % 3 == 0 for i in range(n)])
    import pyarrow.compute as pc

    cols = {
        name: (
            pc.if_else(mask, pa.nulls(n, src.column(name).type),
                       src.column(name).combine_chunks())
            if name == "ts"
            else src.column(name)
        )
        for name in src.column_names
    }
    pq.write_table(pa.table(cols), str(tmp_path / "events.parquet"))

    ev = table(spark, "events", str(tmp_path))
    rows = ev.collect()
    assert len(rows) == n - sum(1 for i in range(n) if i % 3 == 0)
    assert all(r["ts"] is not None for r in rows)
    assert all(isinstance(r["ts"], dt.datetime) for r in rows[:5])


# --- semantic admission loop (streaming/ingest.py, round 6) ------------------


def _sem_batches(spark):
    """Integer-grid codebook + three embedding batches with planted
    copies/near-dups across batches (every sum exact in doubles, every
    cell tie broken identically by both engines)."""
    from pyspark.sql import Row

    cent_vecs = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]]
    cents = spark.createDataFrame(
        [Row(cent_id=i, cent=[float(x) for x in v]) for i, v in enumerate(cent_vecs)]
    )
    batches = [
        {0: [4, 0, 0], 1: [0, 4, 0], 2: [0, 0, 4]},
        {10: [4, 0, 0], 11: [3, 3, 0], 12: [0, 0, 5], 13: [-4, 0, 0]},
        {20: [3, 3, 0], 21: [0, 4, 1], 22: [-1, -1, -1]},
    ]
    dfs = [
        spark.createDataFrame(
            [
                Row(vec_id=i, embedding=[float(x) for x in v], label=0)
                for i, v in vecs.items()
            ]
        )
        for vecs in batches
    ]
    return cent_vecs, cents, batches, dfs


def _sem_admission_model(cent_vecs, batches):
    """Sequential semantic admission: per batch, match every vector
    against the ADMITTED-so-far index (shared probed cell + cos >=
    threshold; best = highest cos, then smallest index id), then append
    the batch's admitted vectors — matching never sees the batch itself."""
    import math as m

    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        SEM_PROBES,
        SEMDEDUP_COS,
    )

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def cells(v):
        nv = m.sqrt(dot(v, v))
        scored = sorted(
            (-(dot(v, c) / (nv * m.sqrt(dot(c, c)))), cid)
            for cid, c in enumerate(cent_vecs)
        )
        return {cid for _, cid in scored[:SEM_PROBES]}

    index: dict[int, tuple[list, set]] = {}
    decisions = {}
    for vecs in batches:
        admitted_now = []
        for vid, v in vecs.items():
            cs = cells(v)
            cands = []
            for iid, (iv, ics) in index.items():
                if not (cs & ics):
                    continue
                cos = dot(v, iv) / (m.sqrt(dot(v, v)) * m.sqrt(dot(iv, iv)))
                if cos >= SEMDEDUP_COS:
                    cands.append((-cos, iid))
            if cands:
                ncos, iid = min(cands)
                decisions[vid] = (False, iid, -ncos)
            else:
                decisions[vid] = (True, -1, 0.0)
                admitted_now.append((vid, v, cs))
        for vid, v, cs in admitted_now:
            index[vid] = (v, cs)
    return decisions


def test_semantic_ingest_matches_sequential_model(spark, tmp_path):
    """Direct foreachBatch calls in batch order == the sequential
    admission model, decision for decision (admitted flag, matched id,
    exact cosine)."""
    from mapreduce_framework_spark.streaming.ingest import (
        make_semantic_ingest_batch_fn,
    )

    cent_vecs, cents, batches, dfs = _sem_batches(spark)
    want = _sem_admission_model(cent_vecs, batches)

    index_root = str(tmp_path / "index")
    dec_root = str(tmp_path / "decisions")
    fn = make_semantic_ingest_batch_fn(spark, index_root, dec_root, cents)
    for i, df in enumerate(dfs):
        fn(df, i)
    got = {
        r["vec_id"]: (r["admitted"], r["matched_id"], r["cos"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dec_root)
        .collect()
    }
    assert set(got) == set(want)
    for vid, (adm, mid, cos) in want.items():
        g = got[vid]
        assert (g[0], g[1]) == (adm, mid), vid
        assert g[2] == pytest.approx(cos, rel=1e-12, abs=1e-15), vid
    # index deltas hold exactly the admitted vectors' assignments
    from mapreduce_framework_spark.pipeline.semantic_dedup import SEM_PROBES

    n_admitted = sum(1 for adm, _, _ in want.values() if adm)
    idx = spark.read.option("recursiveFileLookup", "true").parquet(index_root)
    assert idx.select("vec_id").distinct().count() == n_admitted
    assert idx.count() == n_admitted * SEM_PROBES


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_semantic_ingest_stream_equals_direct_batches(spark, tmp_path):
    """The same three batches through a real availableNow file stream
    (one staged file per batch, mtime-ordered) produce the identical
    decision frame — checkpointing and FileStreamSource batching add
    nothing and lose nothing."""
    import os as _os

    from mapreduce_framework_spark.operators.streaming_replay import (
        _set_staged_mtime,
    )
    from mapreduce_framework_spark.streaming.ingest import (
        run_semantic_ingest_stream,
    )

    cent_vecs, cents, batches, dfs = _sem_batches(spark)
    want = _sem_admission_model(cent_vecs, batches)

    staging = str(tmp_path / "staging")
    _os.makedirs(staging)
    for i, df in enumerate(dfs):
        p = _os.path.join(staging, f"b{i}")
        df.coalesce(1).write.parquet(p)
        _set_staged_mtime(p, 1_000_000_000.0 + 100 * i)
    stream = (
        spark.readStream.schema(dfs[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_os.path.join(staging, "b*"))
    )
    decisions = run_semantic_ingest_stream(
        stream,
        spark,
        index_root=str(tmp_path / "index"),
        decisions_root=str(tmp_path / "decisions"),
        checkpoint=str(tmp_path / "ckpt"),
        centroids=cents,
    )
    got = {
        r["vec_id"]: (r["admitted"], r["matched_id"])
        for r in decisions.collect()
    }
    assert got == {vid: (adm, mid) for vid, (adm, mid, _) in want.items()}


def test_semantic_ingest_redelivery_is_idempotent(spark, tmp_path):
    """Crash-restart redelivery of the same batch_id: the batch's own
    delta (from the failed attempt) must be invisible to its re-match —
    otherwise every redelivered vector self-matches at cos = 1 against
    its own assignments, flips to rejected, and the delta is rewritten
    empty (the exact failure the MinHash twin pins)."""
    from mapreduce_framework_spark.streaming.ingest import (
        make_semantic_ingest_batch_fn,
    )

    _, cents, _, dfs = _sem_batches(spark)
    index_root = str(tmp_path / "index")
    dec_root = str(tmp_path / "decisions")
    fn = make_semantic_ingest_batch_fn(spark, index_root, dec_root, cents)
    fn(dfs[0], 0)
    fn(dfs[1], 1)

    def snapshot():
        dec = {
            (r["vec_id"], r["admitted"], r["matched_id"])
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(dec_root)
            .collect()
        }
        delta1 = _delta(spark, str(tmp_path / "index"), 1).count()
        return dec, delta1

    once = snapshot()
    assert once[1] > 0, "batch 1 admitted nothing — test corpus broken"
    fn(dfs[1], 1)  # redelivery with the same batch_id
    assert snapshot() == once


def test_semantic_ingest_restart_processes_only_new_files(spark, tmp_path):
    """Checkpoint recovery: run the admission stream over two staged
    batches, stop, stage a third, run AGAIN with the SAME checkpoint —
    the restarted query must process only the new file (its decisions
    append; batches 0/1's decisions and deltas are byte-stable), and the
    combined decisions equal the sequential model over all three batches."""
    import os as _os

    from mapreduce_framework_spark.operators.streaming_replay import (
        _set_staged_mtime,
    )
    from mapreduce_framework_spark.streaming.ingest import (
        run_semantic_ingest_stream,
    )

    cent_vecs, cents, batches, dfs = _sem_batches(spark)
    want = _sem_admission_model(cent_vecs, batches)

    staging = str(tmp_path / "staging")
    _os.makedirs(staging)

    def stage(i):
        p = _os.path.join(staging, f"b{i}")
        dfs[i].coalesce(1).write.parquet(p)
        _set_staged_mtime(p, 1_000_000_000.0 + 100 * i)

    def run():
        return run_semantic_ingest_stream(
            spark.readStream.schema(dfs[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(_os.path.join(staging, "b*")),
            spark,
            index_root=str(tmp_path / "index"),
            decisions_root=str(tmp_path / "decisions"),
            checkpoint=str(tmp_path / "ckpt"),
            centroids=cents,
        )

    stage(0)
    stage(1)
    run()
    first = {
        r["vec_id"]: (r["admitted"], r["matched_id"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "decisions"))
        .collect()
    }
    assert set(first) == set(batches[0]) | set(batches[1])
    deltas_before = sorted(_os.listdir(str(tmp_path / "index")))

    stage(2)
    combined = {
        r["vec_id"]: (r["admitted"], r["matched_id"]) for r in run().collect()
    }
    # restart appended exactly one new delta and touched nothing else
    deltas_after = sorted(_os.listdir(str(tmp_path / "index")))
    assert len(deltas_after) == len(deltas_before) + 1
    assert deltas_before == deltas_after[: len(deltas_before)]
    # batches 0/1 decisions unchanged; batch 2 matches the model
    assert {v: combined[v] for v in first} == first
    assert combined == {vid: (adm, mid) for vid, (adm, mid, _) in want.items()}


def test_ingest_loop_accepts_char_shingler(spark, sf_dir, tmp_path):
    """The shingler seam threads through the streaming admission loop: a
    char-8-gram ingest catches a cross-batch near-copy that differs only
    by a short tail edit, and its index deltas store char shingles."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import (
        CHAR_JACCARD_THRESHOLD,
        CHAR_NGRAM_K,
        char_shingles_of,
    )
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") % 2 == 0)
    planted = b0.orderBy("doc_id").limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail-edit")).alias("text"),
    )
    b1 = docs.where(F.col("doc_id") % 2 == 1).unionAll(planted)

    fn = make_ingest_batch_fn(
        spark,
        str(tmp_path / "index"),
        str(tmp_path / "decisions"),
        CHAR_JACCARD_THRESHOLD,
        shingler=char_shingles_of,
    )
    fn(b0, 0)
    fn(b1, 1)
    dec = {
        r["doc_id"]: (r["admitted"], r["matched_id"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "decisions"))
        .collect()
    }
    planted_id = [r["doc_id"] for r in planted.collect()][0]
    assert dec[planted_id][0] is False
    assert dec[planted_id][1] == planted_id - 1_000_000
    # the delta's stored shingles are char 8-grams, not word shingles
    delta0 = _delta(spark, str(tmp_path / "index"), 0)
    one = delta0.select(F.explode("shingles").alias("s")).limit(5).collect()
    assert all(len(r["s"]) == CHAR_NGRAM_K for r in one)


# --- manifest + compaction lifecycle (round 7) -------------------------------


def _split_docs(spark, sf_dir, n):
    from mapreduce_framework_spark.catalog import table

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    return [docs.where(F.col("doc_id") % n == i) for i in range(n)]


def test_ingest_compaction_preserves_decisions(spark, sf_dir, tmp_path):
    """VERDICT r6 item 1 gate: N batches with compaction interleaved must
    produce decisions identical to the never-compacted run — compaction
    changes the index LAYOUT, never its content — and the compacted root
    must read through ONE compacted dir plus a bounded tail."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    batches = _split_docs(spark, sf_dir, 5)

    def run(tag, compact_every):
        fn = make_ingest_batch_fn(
            spark,
            str(tmp_path / tag / "index"),
            str(tmp_path / tag / "decisions"),
            JACCARD_THRESHOLD,
            compact_every=compact_every,
        )
        for i, b in enumerate(batches):
            fn(b, i)
        return {
            (r["doc_id"], r["admitted"], r["matched_id"], round(r["jaccard"], 9))
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(str(tmp_path / tag / "decisions"))
            .collect()
        }

    plain = run("plain", compact_every=None)
    compacted = run("compact", compact_every=2)
    assert compacted == plain

    man = read_index_manifest(str(tmp_path / "compact" / "index"))
    assert man["compacted_path"] is not None
    assert len(man["deltas"]) <= 2  # bounded tail, not O(batches)
    # superseded dirs were pruned after the manifest commit
    left = sorted(
        d
        for d in (tmp_path / "compact" / "index").iterdir()
        if d.name.startswith(("delta_v", "compact_v"))
    )
    assert {d.name for d in left} == {man["compacted_path"]} | {
        name for _, name in man["deltas"]
    }
    # the manifest-addressed index equals the plain root's full content
    from mapreduce_framework_spark.streaming.ingest import _index_so_far

    a = _index_so_far(spark, str(tmp_path / "compact" / "index"))
    b = _index_so_far(spark, str(tmp_path / "plain" / "index"))
    assert {r["doc_id"] for r in a.select("doc_id").collect()} == {
        r["doc_id"] for r in b.select("doc_id").collect()
    }


def test_ingest_redelivery_after_compaction(spark, sf_dir, tmp_path):
    """The compaction boundary stays strictly below any in-flight batch,
    so a crash-restart redelivery of the batch whose sink run ALSO
    compacted sees exactly the strictly-before index and reproduces its
    decisions and delta byte-for-byte."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    from mapreduce_framework_spark.storage import read_index_manifest

    batches = _split_docs(spark, sf_dir, 4)
    index_root = str(tmp_path / "index")
    dec_root = str(tmp_path / "decisions")
    fn = make_ingest_batch_fn(
        spark, index_root, dec_root, JACCARD_THRESHOLD, compact_every=2
    )
    # batch 2 is the one whose sink run compacts (tail [0, 1] reaches
    # compact_every); its crash-restart redelivery is the hazard case —
    # the compacted artifact must not contain batch 2's own delta
    for i, b in enumerate(batches[:3]):
        fn(b, i)
    man = read_index_manifest(index_root)
    assert man["compacted_through"] == 1 and [e[0] for e in man["deltas"]] == [2]

    def state():
        dec = {
            (r["doc_id"], r["admitted"], r["matched_id"])
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(dec_root)
            .collect()
        }
        delta2 = _delta(spark, str(tmp_path / "index"), 2).count()
        return dec, delta2

    before = state()
    fn(batches[2], 2)  # redeliver the batch whose sink run compacted
    assert state() == before
    # and the stream continues cleanly past the redelivered compaction
    fn(batches[3], 3)
    man = read_index_manifest(index_root)
    assert [e[0] for e in man["deltas"]] == [2, 3]


def test_manifest_gap_or_missing_dir_is_hard_error(spark, tmp_path):
    """VERDICT r6 item 5 gate: a manifest whose tail skips a batch id, or
    that references a dir not on disk, must raise — silently reading a
    partial index would admit duplicates of every lost signature."""
    import pytest as _pytest

    from mapreduce_framework_spark.storage import (
        new_index_manifest,
        write_index_manifest,
    )
    from mapreduce_framework_spark.streaming.ingest import _index_so_far

    root = str(tmp_path / "index")
    one = spark.range(1).select(F.col("id").alias("doc_id"))
    one.write.parquet(str(tmp_path / "index" / "delta_v0"))
    one.write.parquet(str(tmp_path / "index" / "delta_v2"))

    man = new_index_manifest()
    man["deltas"] = [[0, "delta_v0"], [2, "delta_v2"]]  # batch 1 missing
    write_index_manifest(root, man)
    with _pytest.raises(ValueError, match="gap"):
        _index_so_far(spark, root)

    man["deltas"] = [[0, "delta_v0"], [1, "delta_v1"]]  # dir not on disk
    write_index_manifest(root, man)
    with _pytest.raises(ValueError, match="missing"):
        _index_so_far(spark, root)

    # compacted boundary at-or-above an in-flight batch id = corruption
    man["deltas"] = [[4, "delta_v0"]]
    man["compacted_path"] = "delta_v2"
    man["compacted_through"] = 3
    write_index_manifest(root, man)
    with _pytest.raises(ValueError, match="strictly below"):
        _index_so_far(spark, root, before_batch=2)


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_semantic_ingest_compaction_preserves_decisions(spark, tmp_path):
    """The semantic admission loop rides the same manifest lifecycle:
    compacted vs never-compacted runs decide identically."""
    from pyspark.sql import Row

    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        make_semantic_ingest_batch_fn,
    )

    base = [1.0] + [0.0] * 15
    alt = [0.0, 1.0] + [0.0] * 14
    rows = []
    for i in range(24):
        vec = list(base) if i % 2 == 0 else list(alt)
        vec[8] = i * 1e-6  # tiny jitter: near-dups across batches
        rows.append(Row(vec_id=i, embedding=vec, label=i % 2))
    embs = spark.createDataFrame(rows)
    cents = spark.createDataFrame(
        [Row(cent_id=0, cent=base), Row(cent_id=1, cent=alt)]
    )
    batches = [embs.where(F.col("vec_id") % 4 == i) for i in range(4)]

    def run(tag, compact_every):
        fn = make_semantic_ingest_batch_fn(
            spark,
            str(tmp_path / tag / "index"),
            str(tmp_path / tag / "decisions"),
            cents,
            compact_every=compact_every,
        )
        for i, b in enumerate(batches):
            fn(b, i)
        return {
            (r["vec_id"], r["admitted"], r["matched_id"])
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(str(tmp_path / tag / "decisions"))
            .collect()
        }

    plain = run("plain", compact_every=None)
    compacted = run("compact", compact_every=2)
    assert compacted == plain
    man = read_index_manifest(str(tmp_path / "compact" / "index"))
    assert man["compacted_path"] is not None and len(man["deltas"]) <= 2


def test_merge_sink_state_retention_and_manifest(spark, sf_dir, tmp_path):
    """Round-7 state-manifest discipline on the merge sinks: N batches
    leave exactly STATE_KEEP state dirs + the manifest (retention — the
    strictly-before rule only ever needs the version just below the
    in-flight batch), the final state still equals the all-at-once batch
    aggregate, and a state root whose retained versions sit entirely at
    or above the in-flight batch is a HARD error (mismatched checkpoint/
    state roots), never a silent state re-initialization."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.storage import read_json_atomic
    from mapreduce_framework_spark.streaming.foreach_batch import (
        STATE_KEEP,
        STATE_MANIFEST,
        make_rollup_merge_batch_fn,
        _latest_state,
    )
    from mapreduce_framework_spark.operators.streaming_replay import (
        _hourly_rollup_batch_form,
    )

    ev = table(spark, "events", sf_dir)
    root = str(tmp_path / "state")
    fn = make_rollup_merge_batch_fn(spark, root)
    for i in range(6):
        fn(ev.where(F.col("event_id") % 6 == i), i)

    man = read_json_atomic(os.path.join(root, STATE_MANIFEST))
    assert man["versions"] == [4, 5]
    dirs = sorted(d for d in os.listdir(root) if d.startswith("state_v"))
    assert dirs == [f"state_v{v}" for v in man["versions"]]
    assert len(dirs) == STATE_KEEP

    final = {
        (r["h"], r["event_type"]): (r["cnt"], float(r["val"]))
        for r in _latest_state(spark, root).collect()
    }
    want = {
        (r["h"], r["event_type"]): (r["cnt"], float(r["val"]))
        for r in _hourly_rollup_batch_form(ev).collect()
    }
    assert final == want

    # redelivery of the LAST batch still works after retention (reads v4)
    fn(ev.where(F.col("event_id") % 6 == 5), 5)
    assert man == read_json_atomic(os.path.join(root, STATE_MANIFEST))

    # mismatched streams: in-flight batch below the whole retained window
    with pytest.raises(ValueError, match="different streams"):
        _latest_state(spark, root, before_batch=2)


# --- tiered cascade admission (round 7) --------------------------------------


def _cascade_batches(spark, sf_dir):
    """b0 = lower-id half (the growing index's seed), b1 = upper half plus
    planted byte-identical re-fetches of every 50th b0 doc under new ids.
    Restricted to docs with >= SHINGLE_K tokens so the exact and near-dup
    tiers agree on admission (degenerate docs diverge by design — see
    test_cascade_degenerate_docs_are_exact_tier_only)."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import SHINGLE_K

    docs = (
        table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .where(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= SHINGLE_K)
    )
    cut = docs.agg(((F.max("doc_id") + 1) / 2).cast("long")).collect()[0][0]
    b0 = docs.where(F.col("doc_id") < cut).localCheckpoint(eager=True)
    b1 = (
        docs.where(F.col("doc_id") >= cut)
        .unionAll(
            b0.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        )
        .localCheckpoint(eager=True)
    )
    return b0, b1


def _delta(spark, root, batch_id):
    """Read one batch's delta through the manifest resolver (fenced sinks
    epoch-suffix their delta dir names — streaming/ingest.py:delta_dir)."""
    from mapreduce_framework_spark.streaming.ingest import delta_dir

    return spark.read.parquet(delta_dir(root, batch_id))


def _decisions(spark, root):
    return {
        r["doc_id"]: r
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(root)
        .collect()
    }


def test_cascade_ingest_decisions(spark, sf_dir, tmp_path):
    """The tiered sink's admitted set equals the single-tier MinHash
    sink's on shingle-bearing docs; planted byte-identical re-fetches are
    rejected by the EXACT tier (tier='exact', jaccard reported 1.0,
    matched_id = the copied index doc); near-dup rejects carry the
    verified jaccard and agree with the single tier wherever the single
    tier's best match is below 1.0 (1.0 ties may legitimately resolve to
    a different id — docstring of make_cascade_ingest_batch_fn)."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
        make_ingest_batch_fn,
    )

    b0, b1 = _cascade_batches(spark, sf_dir)

    cfn = make_cascade_ingest_batch_fn(
        spark,
        str(tmp_path / "fp_idx"),
        str(tmp_path / "sig_idx"),
        str(tmp_path / "c_dec"),
        JACCARD_THRESHOLD,
    )
    sfn = make_ingest_batch_fn(
        spark, str(tmp_path / "s_idx"), str(tmp_path / "s_dec"), JACCARD_THRESHOLD
    )
    for i, b in enumerate([b0, b1]):
        cfn(b, i)
        sfn(b, i)

    casc = _decisions(spark, str(tmp_path / "c_dec"))
    single = _decisions(spark, str(tmp_path / "s_dec"))
    assert set(casc) == set(single)
    assert {d for d, r in casc.items() if r["admitted"]} == {
        d for d, r in single.items() if r["admitted"]
    }

    planted = [d for d in casc if d >= 1_000_000]
    assert planted
    for d in planted:
        r = casc[d]
        assert not r["admitted"] and r["tier"] == "exact"
        assert r["matched_id"] == d - 1_000_000 and r["jaccard"] == 1.0

    for d, r in casc.items():
        if r["admitted"]:
            assert r["tier"] is None and r["matched_id"] == -1
        elif r["tier"] == "near_dup":
            s = single[d]
            assert not s["admitted"]
            if s["jaccard"] < 1.0:
                assert (r["matched_id"], r["jaccard"]) == (
                    s["matched_id"],
                    s["jaccard"],
                )
    assert any(r["tier"] == "near_dup" for r in casc.values())


def test_cascade_degenerate_docs_are_exact_tier_only(spark, tmp_path):
    """Shingle-free docs (< SHINGLE_K tokens, incl. NULL/empty — the
    family's NULL-behaves-as-empty policy) are invisible to MinHash but
    byte-collapse in the exact tier: the cascade rejects their copies
    where the single-tier sink admits them — strictly stricter BY
    DESIGN."""
    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
        make_ingest_batch_fn,
    )

    b0 = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text=None)],
        "doc_id bigint, text string",
    )
    b1 = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b"),  # byte copy of 1
            Row(doc_id=11, text=None),   # NULL == '' collapses with 2
            Row(doc_id=12, text=""),     # '' == NULL collapses with 2
            Row(doc_id=13, text="b a"),  # shingle-free AND not byte-equal
        ],
        "doc_id bigint, text string",
    )
    cfn = make_cascade_ingest_batch_fn(
        spark,
        str(tmp_path / "fp_idx"),
        str(tmp_path / "sig_idx"),
        str(tmp_path / "c_dec"),
        JACCARD_THRESHOLD,
    )
    sfn = make_ingest_batch_fn(
        spark, str(tmp_path / "s_idx"), str(tmp_path / "s_dec"), JACCARD_THRESHOLD
    )
    for i, b in enumerate([b0, b1]):
        cfn(b, i)
        sfn(b, i)

    casc = _decisions(spark, str(tmp_path / "c_dec"))
    single = _decisions(spark, str(tmp_path / "s_dec"))
    assert all(single[d]["admitted"] for d in [10, 11, 12, 13])
    assert [
        (casc[d]["admitted"], casc[d]["tier"], casc[d]["matched_id"])
        for d in [10, 11, 12, 13]
    ] == [
        (False, "exact", 1),
        (False, "exact", 2),
        (False, "exact", 2),
        (True, None, -1),
    ]


def test_cascade_ingest_redelivery_is_idempotent(spark, sf_dir, tmp_path):
    """Redelivery of the in-flight batch — including from a crash BETWEEN
    the two delta publishes (fp committed, signatures not) — must leave
    decisions and both deltas exactly as a clean run: both tiers read
    strictly-before state, so the half-published attempt is invisible."""
    import shutil as _shutil

    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import (
        read_index_manifest,
        write_index_manifest,
    )
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
    )

    b0, b1 = _cascade_batches(spark, sf_dir)
    fp_root = str(tmp_path / "fp_idx")
    sig_root = str(tmp_path / "sig_idx")
    fn = make_cascade_ingest_batch_fn(
        spark, fp_root, sig_root, str(tmp_path / "dec"), JACCARD_THRESHOLD
    )
    fn(b0, 0)
    fn(b1, 1)
    once = {
        (r["doc_id"], r["admitted"], r["matched_id"], r["tier"])
        for r in _decisions(spark, str(tmp_path / "dec")).values()
    }
    fp_once = _delta(spark, fp_root, 1).count()
    sig_once = _delta(spark, sig_root, 1).count()
    assert fp_once > 0 and sig_once > 0

    # plain redelivery
    fn(b1, 1)
    assert once == {
        (r["doc_id"], r["admitted"], r["matched_id"], r["tier"])
        for r in _decisions(spark, str(tmp_path / "dec")).values()
    }

    # crash between the publishes: fp delta committed, signature delta not
    from mapreduce_framework_spark.streaming.ingest import delta_dir

    sig_delta1 = delta_dir(sig_root, 1)  # resolve BEFORE the manifest surgery
    man = read_index_manifest(sig_root)
    man["deltas"] = [e for e in man["deltas"] if e[0] != 1]
    write_index_manifest(sig_root, man)
    _shutil.rmtree(sig_delta1)
    fn(b1, 1)  # redelivery re-publishes both
    assert once == {
        (r["doc_id"], r["admitted"], r["matched_id"], r["tier"])
        for r in _decisions(spark, str(tmp_path / "dec")).values()
    }
    assert _delta(spark, fp_root, 1).count() == fp_once
    assert _delta(spark, sig_root, 1).count() == sig_once
    assert [e[0] for e in read_index_manifest(sig_root)["deltas"]] == [0, 1]


def test_cascade_stream_equals_direct_batches(spark, sf_dir, tmp_path):
    """run_cascade_ingest_stream through a real file-source stream
    (maxFilesPerTrigger=1) reaches the same decisions as driving the
    batch fn directly — checkpoint/trigger wiring adds nothing."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
        run_cascade_ingest_stream,
    )

    b0, b1 = _cascade_batches(spark, sf_dir)
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0.coalesce(1).write.parquet(os.path.join(src, "b0"))
    time.sleep(1.1)
    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))

    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    got = run_cascade_ingest_stream(
        stream,
        spark,
        str(tmp_path / "fp_idx"),
        str(tmp_path / "sig_idx"),
        str(tmp_path / "dec"),
        str(tmp_path / "ckpt"),
        JACCARD_THRESHOLD,
        timeout_s=240,
    )
    fn = make_cascade_ingest_batch_fn(
        spark,
        str(tmp_path / "fp2"),
        str(tmp_path / "sig2"),
        str(tmp_path / "dec2"),
        JACCARD_THRESHOLD,
    )
    for i, b in enumerate([b0, b1]):
        fn(b, i)
    want = _decisions(spark, str(tmp_path / "dec2"))
    got_map = {r["doc_id"]: r for r in got.collect()}
    assert set(got_map) == set(want)
    for d in want:
        assert (
            got_map[d]["admitted"],
            got_map[d]["matched_id"],
            got_map[d]["tier"],
        ) == (want[d]["admitted"], want[d]["matched_id"], want[d]["tier"]), d


# ---------------------------------------------------------------------------
# FULL three-tier cascade: exact → near-dup → semantic
# (make_full_cascade_ingest_batch_fn — the complete pretraining admission
# shape its two-tier sibling's docstring names)
# ---------------------------------------------------------------------------


def _full_cascade_fixture(spark):
    """Integer-grid codebook + three (doc_id, text, embedding) batches
    planting exactly one case per tier and per edge policy. Every cosine
    is exact in doubles (integer grids), every Jaccard is a ratio of
    small ints, so expectations are equalities, not approximations.

    b0 (seed): docs 1/2/3, distinct texts, orthogonal embeddings.
    b1: 10 byte-copy of 1 with an embedding ≈ doc2's  → 'exact'
           (pins tier precedence: the semantic twin is never consulted);
        11 near-dup of 2's text (J=0.8), orthogonal emb → 'near_dup';
        12 disjoint vocabulary, embedding == doc1's    → 'semantic';
        13 fresh text + embedding cos<0 to everything  → admitted;
        14 fresh text, NULL embedding                  → admitted (policy);
        15 fresh text, zero-norm embedding             → admitted (policy).
    b2: 20 disjoint text, embedding == doc13's → 'semantic' matched 13
           (proves the b1-admitted delta is live in the index).
    """
    from pyspark.sql import Row

    cents = spark.createDataFrame(
        [
            Row(cent_id=i, cent=[float(x) for x in v])
            for i, v in enumerate([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]])
        ]
    )
    t1 = "alpha beta gamma delta epsilon"
    t2 = "one two three four five six"
    rows = {
        0: [
            (1, t1, [4.0, 0.0, 0.0]),
            (2, t2, [0.0, 4.0, 0.0]),
            (3, "red orange yellow green blue", [0.0, 0.0, 4.0]),
        ],
        1: [
            (10, t1, [0.0, 4.0, 0.0]),
            (11, t2 + " seven", [0.0, 0.0, 5.0]),
            (12, "lorem ipsum dolor sit amet", [4.0, 0.0, 0.0]),
            (13, "zig zag zap zoom zest", [-4.0, 0.0, 0.0]),
            (14, "completely unique words here indeed", None),
            (15, "zero norm vector doc words", [0.0, 0.0, 0.0]),
        ],
        2: [(20, "quux corge grault garply waldo", [-4.0, 0.0, 0.0])],
    }
    dfs = [
        spark.createDataFrame(
            [Row(doc_id=i, text=t, embedding=e) for i, t, e in rows[b]],
            "doc_id bigint, text string, embedding array<double>",
        )
        for b in sorted(rows)
    ]
    return cents, dfs


def _run_full_cascade(spark, tmp_path, dfs, cents, prefix="fc", **kw):
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        make_full_cascade_ingest_batch_fn,
    )

    roots = {
        k: str(tmp_path / f"{prefix}_{k}")
        for k in ["fp", "sig", "sem", "dec"]
    }
    fn = make_full_cascade_ingest_batch_fn(
        spark,
        roots["fp"],
        roots["sig"],
        roots["sem"],
        roots["dec"],
        cents,
        JACCARD_THRESHOLD,
        **kw,
    )
    for i, df in enumerate(dfs):
        fn(df, i)
    return roots, fn


def test_full_cascade_each_tier_fires(spark, tmp_path):
    """One planted reject per tier with exact expected (admitted, tier,
    matched_id, score) — including strict tier precedence (doc 10) and
    cross-batch semantic index growth (doc 20 matches the batch-1
    admittee 13, not anything from the seed)."""
    cents, dfs = _full_cascade_fixture(spark)
    roots, _ = _run_full_cascade(spark, tmp_path, dfs, cents)
    got = {
        d: (r["admitted"], r["tier"], r["matched_id"], r["score"])
        for d, r in _decisions(spark, roots["dec"]).items()
    }
    want = {
        1: (True, None, -1, 0.0),
        2: (True, None, -1, 0.0),
        3: (True, None, -1, 0.0),
        10: (False, "exact", 1, 1.0),
        11: (False, "near_dup", 2, 0.8),
        12: (False, "semantic", 1, 1.0),
        13: (True, None, -1, 0.0),
        14: (True, None, -1, 0.0),
        15: (True, None, -1, 0.0),
        20: (False, "semantic", 13, 1.0),
    }
    assert got == want


def test_full_cascade_unembeddable_docs_stay_out_of_sem_index(spark, tmp_path):
    """The NULL-embedding (14) and zero-norm (15) admittees are subject
    to the lexical tiers but invisible to the semantic one: admitted in
    decisions, present in the fingerprint and signature indexes, ABSENT
    from the semantic index — so the cascade degrades to two tiers for
    unembedded docs instead of erroring (docstring policy)."""
    from mapreduce_framework_spark.pipeline.semantic_dedup import SEM_PROBES

    cents, dfs = _full_cascade_fixture(spark)
    roots, _ = _run_full_cascade(spark, tmp_path, dfs, cents)
    read = lambda r: spark.read.option("recursiveFileLookup", "true").parquet(r)
    admitted = {1, 2, 3, 13, 14, 15}
    assert {
        r["doc_id"] for r in read(roots["fp"]).select("doc_id").collect()
    } == admitted
    assert {
        r["doc_id"] for r in read(roots["sig"]).select("doc_id").collect()
    } == admitted
    sem = read(roots["sem"])
    embeddable = {1, 2, 3, 13}
    assert {r["vec_id"] for r in sem.select("vec_id").collect()} == embeddable
    assert sem.count() == len(embeddable) * SEM_PROBES


def test_full_cascade_redelivery_is_idempotent(spark, tmp_path):
    """Crash-restart redelivery — including from a crash BETWEEN the
    signature and semantic publishes (three of four logs committed) —
    leaves decisions and all three index deltas exactly as a clean run:
    every tier reads strictly-before state. The crash is simulated at the
    point it would really happen — batch 1 half-published, batch 2 not
    yet delivered — and the repaired world's final decisions are compared
    against an untouched clean run of all three batches."""
    from mapreduce_framework_spark.storage import (
        read_index_manifest,
        write_index_manifest,
    )

    cents, dfs = _full_cascade_fixture(spark)
    ref_roots, _ = _run_full_cascade(spark, tmp_path, dfs, cents, prefix="ref")
    want = {
        d: (r["admitted"], r["tier"], r["matched_id"], r["score"])
        for d, r in _decisions(spark, ref_roots["dec"]).items()
    }

    # crash world: batches 0 and 1 delivered, batch 2 still pending
    roots, fn = _run_full_cascade(spark, tmp_path, dfs[:2], cents)
    read = lambda r: spark.read.option("recursiveFileLookup", "true").parquet(r)
    snap = lambda: {
        d: (r["admitted"], r["tier"], r["matched_id"], r["score"])
        for d, r in _decisions(spark, roots["dec"]).items()
    }
    once = snap()
    assert once == {d: v for d, v in want.items() if d < 20}
    sem_once = _delta(spark, roots["sem"], 1).count()
    assert sem_once > 0

    fn(dfs[1], 1)  # plain redelivery
    assert snap() == once

    # crash between publish #3 (signatures) and #4 (semantic): batch 1's
    # semantic delta never committed; fp/sig/decisions all did
    from mapreduce_framework_spark.streaming.ingest import delta_dir

    sem_delta1 = delta_dir(roots["sem"], 1)  # resolve BEFORE the surgery
    man = read_index_manifest(roots["sem"])
    man["deltas"] = [e for e in man["deltas"] if e[0] != 1]
    write_index_manifest(roots["sem"], man)
    shutil.rmtree(sem_delta1)
    fn(dfs[1], 1)
    assert snap() == once
    assert _delta(spark, roots["sem"], 1).count() == sem_once
    assert [e[0] for e in read_index_manifest(roots["sem"])["deltas"]] == [0, 1]
    # batch 2's decision depends on batch 1's repaired semantic delta:
    # doc 20 must semantic-match the batch-1 admittee 13 exactly as in
    # the clean run
    fn(dfs[2], 2)
    assert snap() == want


def test_full_cascade_parity_with_two_tier_when_semantic_cannot_fire(
    spark, sf_dir, tmp_path
):
    """With cos_threshold above 1.0 the semantic tier can never reject,
    so on real sf docs (+ their embeddings, + the planted re-fetches)
    the three-tier decisions must equal the two-tier cascade's row for
    row — admitted, tier, matched_id, and score == jaccard. Pins that
    adding the third tier perturbs nothing upstream of it."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        stride_centroids,
    )
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
    )

    b0, b1 = _cascade_batches(spark, sf_dir)
    embs = table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("src_id"), "embedding"
    )

    def with_emb(b):
        return (
            b.withColumn(
                "src_id",
                F.when(
                    F.col("doc_id") >= 1_000_000, F.col("doc_id") - 1_000_000
                ).otherwise(F.col("doc_id")),
            )
            .join(embs, "src_id", "left")
            .select("doc_id", "text", "embedding")
            .localCheckpoint(eager=True)
        )

    cents = stride_centroids(
        table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    )
    roots, _ = _run_full_cascade(
        spark,
        tmp_path,
        [with_emb(b0), with_emb(b1)],
        cents,
        cos_threshold=1.5,
    )
    tfn = make_cascade_ingest_batch_fn(
        spark,
        str(tmp_path / "t_fp"),
        str(tmp_path / "t_sig"),
        str(tmp_path / "t_dec"),
        JACCARD_THRESHOLD,
    )
    for i, b in enumerate([b0, b1]):
        tfn(b, i)

    full = _decisions(spark, roots["dec"])
    two = _decisions(spark, str(tmp_path / "t_dec"))
    assert set(full) == set(two)
    for d, r in full.items():
        t = two[d]
        assert (r["admitted"], r["tier"], r["matched_id"], r["score"]) == (
            t["admitted"],
            t["tier"],
            t["matched_id"],
            t["jaccard"],
        ), d
    assert any(r["tier"] == "near_dup" for r in full.values())
    assert any(r["tier"] == "exact" for r in full.values())


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_full_cascade_stream_equals_direct_batches(spark, tmp_path):
    """run_full_cascade_ingest_stream through a real file-source stream
    (maxFilesPerTrigger=1, mtime-ordered staging) reaches the same
    decisions as driving the batch fn directly."""
    from mapreduce_framework_spark.operators.streaming_replay import (
        _set_staged_mtime,
    )
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        run_full_cascade_ingest_stream,
    )

    cents, dfs = _full_cascade_fixture(spark)
    staging = str(tmp_path / "staging")
    os.makedirs(staging)
    for i, df in enumerate(dfs):
        p = os.path.join(staging, f"b{i}")
        df.coalesce(1).write.parquet(p)
        _set_staged_mtime(p, 1_000_000_000.0 + 100 * i)
    stream = (
        spark.readStream.schema(dfs[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(staging, "b*"))
    )
    got = run_full_cascade_ingest_stream(
        stream,
        spark,
        str(tmp_path / "s_fp"),
        str(tmp_path / "s_sig"),
        str(tmp_path / "s_sem"),
        str(tmp_path / "s_dec"),
        str(tmp_path / "s_ckpt"),
        cents,
        JACCARD_THRESHOLD,
        timeout_s=240,
    )
    roots, _ = _run_full_cascade(spark, tmp_path, dfs, cents, prefix="d")
    want = _decisions(spark, roots["dec"])
    got_map = {r["doc_id"]: r for r in got.collect()}
    assert set(got_map) == set(want)
    for d in want:
        assert (
            got_map[d]["admitted"],
            got_map[d]["tier"],
            got_map[d]["matched_id"],
            got_map[d]["score"],
        ) == (
            want[d]["admitted"],
            want[d]["tier"],
            want[d]["matched_id"],
            want[d]["score"],
        ), d


# ---------------------------------------------------------------------------
# Full-cascade sequential-model hypothesis differential: the three-tier
# sink vs a pure-Python admission model (the q102/codebook test pattern
# applied to the composed cascade)
# ---------------------------------------------------------------------------


def _full_cascade_model(cent_vecs, batches):
    """Pure-Python sequential model of the three-tier admission sink
    (streaming/ingest.py::make_full_cascade_ingest_batch_fn): per batch,
    every doc is tested against the strictly-before index state — exact
    (text equality, NULL-as-empty, min matching id), then word-3-gram
    exact Jaccard >= JACCARD_THRESHOLD (best = max J, tie min id), then
    cell-bounded cosine >= SEMDEDUP_COS under ``cent_vecs`` (SEM_PROBES
    nearest cells each side, best = max cos, tie min id) — and the whole
    batch's admitted docs enter all three indexes afterwards. The only
    divergence the model allows vs the Spark path is an LSH banding miss
    on a qualifying Jaccard pair; the generator below plants near-dups
    at J ~ 0.91 (one substitution in 64 tokens), where the per-pair miss
    probability is ~1e-8 (16 bands x 4 rows)."""
    import math as m
    import re

    from mapreduce_framework_spark.pipeline.dedup import (
        JACCARD_THRESHOLD,
        SHINGLE_K,
    )
    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        SEM_PROBES,
        SEMDEDUP_COS,
    )

    def toks(text):
        return [w for w in re.split(r"[^a-zA-Z]+", text or "") if w]

    def shingles(text):
        t = toks(text)
        if len(t) < SHINGLE_K:
            return frozenset()
        return frozenset(
            " ".join(t[i : i + SHINGLE_K]) for i in range(len(t) - SHINGLE_K + 1)
        )

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cells(v):
        nn = m.sqrt(dot(v, v))
        scored = sorted(
            (-dot(v, c) / (nn * m.sqrt(dot(c, c))), cid)
            for cid, c in cent_vecs.items()
        )
        return frozenset(cid for _, cid in scored[:SEM_PROBES])

    fp_index = {}  # text (NULL-as-'') -> min admitted doc_id
    sig_index = {}  # doc_id -> nonempty shingle frozenset
    sem_index = {}  # doc_id -> (vec, probed cells)
    decisions = {}
    for batch in batches:
        admitted_now = []
        for doc_id, text, emb in batch:
            key = text or ""
            if key in fp_index:
                decisions[doc_id] = (False, fp_index[key], 1.0, "exact")
                continue
            ss = shingles(text)
            best = None
            for iid, iss in sig_index.items():
                common = len(ss & iss)
                if not common:
                    continue
                j = common / (len(ss) + len(iss) - common)
                if j >= JACCARD_THRESHOLD and (best is None or (-j, iid) < best):
                    best = (-j, iid)
            if best is not None:
                decisions[doc_id] = (False, best[1], -best[0], "near_dup")
                continue
            usable = emb is not None and any(x != 0.0 for x in emb)
            sbest = None
            if usable:
                cs = cells(emb)
                nn = m.sqrt(dot(emb, emb))
                for iid, (iv, ics) in sem_index.items():
                    if not (cs & ics):
                        continue
                    cos = dot(emb, iv) / (nn * m.sqrt(dot(iv, iv)))
                    if cos >= SEMDEDUP_COS and (
                        sbest is None or (-cos, iid) < sbest
                    ):
                        sbest = (-cos, iid)
            if sbest is not None:
                decisions[doc_id] = (False, sbest[1], -sbest[0], "semantic")
                continue
            decisions[doc_id] = (True, -1, 0.0, None)
            admitted_now.append((doc_id, key, ss, emb if usable else None))
        for doc_id, key, ss, emb in admitted_now:
            fp_index[key] = min(fp_index.get(key, doc_id), doc_id)
            if ss:
                sig_index[doc_id] = ss
            if emb is not None:
                sem_index[doc_id] = (emb, cells(emb))
    return decisions


_FC_DIM = 16


def _fc_axis(a):
    return [4.0 if i == a else 0.0 for i in range(_FC_DIM)]


def _fc_letters(n):
    return "".join("abcdefghij"[int(d)] for d in str(n))


def _fc_text(tag, n_toks=64):
    # letters-only tokens (the shingle tokenizer splits on [^a-zA-Z]+)
    return " ".join(f"w{tag}v{_fc_letters(j)}" for j in range(n_toks))


from hypothesis import given as _fc_given  # noqa: E402
from hypothesis import settings as _fc_settings  # noqa: E402
from hypothesis import strategies as _fc_st  # noqa: E402


@_fc_settings(max_examples=6, deadline=None)
@_fc_given(
    n_base=_fc_st.integers(min_value=2, max_value=4),
    ops=_fc_st.lists(
        _fc_st.tuples(
            _fc_st.sampled_from(
                ["fresh", "exact", "near", "sem", "nullemb", "zeroemb"]
            ),
            _fc_st.integers(min_value=0, max_value=3),  # src pick
            _fc_st.integers(min_value=5, max_value=58),  # substitution pos
        ),
        min_size=1,
        max_size=5,
    ),
)
@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_full_cascade_matches_sequential_model(spark_global, n_base, ops):
    """Two generated batches through the real three-tier batch fn equal
    the sequential model decision for decision (admitted, matched id,
    tier, and the tier-typed score to 1e-12). Batch 0 seeds disjoint-
    vocabulary docs on unique embedding axes; batch 1 mixes per-tier
    plants — byte-copies, one-token substitutions (J ~ 0.91), semantic
    twins (index embedding under fresh text) — plus NULL/zero-norm
    embedding docs exercising the unembedded-degradation policy."""
    import shutil
    import tempfile

    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        make_full_cascade_ingest_batch_fn,
    )

    spark = spark_global
    b0 = [
        (i, _fc_text(_fc_letters(i)), _fc_axis(i)) for i in range(n_base)
    ]
    b1 = []
    for k, (kind, src_pick, pos) in enumerate(ops):
        doc_id = 100 + k
        src = src_pick % n_base
        axis = _fc_axis(n_base + k)
        if kind == "fresh":
            b1.append((doc_id, _fc_text("f" + _fc_letters(k)), axis))
        elif kind == "exact":
            b1.append((doc_id, b0[src][1], _fc_axis(src)))
        elif kind == "near":
            t = b0[src][1].split(" ")
            t[pos] = f"wsub{_fc_letters(k)}vq"
            b1.append((doc_id, " ".join(t), axis))
        elif kind == "sem":
            b1.append((doc_id, _fc_text("s" + _fc_letters(k)), _fc_axis(src)))
        elif kind == "nullemb":
            b1.append((doc_id, _fc_text("n" + _fc_letters(k)), None))
        else:  # zeroemb
            b1.append((doc_id, _fc_text("z" + _fc_letters(k)), [0.0] * _FC_DIM))

    cent_vecs = {i: _fc_axis(i) for i in range(_FC_DIM)}
    want = _full_cascade_model(cent_vecs, [b0, b1])

    cents = spark.createDataFrame(
        [Row(cent_id=i, cent=v) for i, v in cent_vecs.items()]
    )
    dfs = [
        spark.createDataFrame(
            [Row(doc_id=i, text=t, embedding=e) for i, t, e in batch],
            "doc_id bigint, text string, embedding array<double>",
        )
        for batch in (b0, b1)
    ]
    root = tempfile.mkdtemp(prefix="mfs_fc_model_")
    try:
        fn = make_full_cascade_ingest_batch_fn(
            spark,
            os.path.join(root, "fp"),
            os.path.join(root, "sig"),
            os.path.join(root, "sem"),
            os.path.join(root, "dec"),
            cents,
            JACCARD_THRESHOLD,
        )
        for i, df in enumerate(dfs):
            fn(df, i)
        got = {
            r["doc_id"]: (r["admitted"], r["matched_id"], r["score"], r["tier"])
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(os.path.join(root, "dec"))
            .collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    assert set(got) == set(want)
    for d, (adm, mid, score, tier) in want.items():
        g = got[d]
        assert (g[0], g[1], g[3]) == (adm, mid, tier), d
        assert g[2] == pytest.approx(score, rel=1e-12, abs=1e-15), d


# ---------------------------------------------------------------------------
# Codebook-refresh reindex lifecycle (round 7): reindex_semantic_root +
# the manifest codebook-fingerprint guard
# ---------------------------------------------------------------------------


def _cents_b(spark):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(cent_id=i, cent=[float(x) for x in v])
            for i, v in enumerate([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
        ]
    )


def test_semantic_reindex_swaps_codebook(spark, tmp_path):
    """refit → reindex_semantic_root → resume: the swapped artifact is
    byte-equivalent to a from-scratch semantic_index of the same
    admitted vectors under the new codebook, the manifest carries the
    new fingerprint with an empty tail, and the next batch's decisions
    through a new-codebook sink equal the direct match against that
    fresh build."""
    from pyspark.sql.window import Window

    from mapreduce_framework_spark.pipeline.codebook import codebook_fingerprint
    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        SEM_PROBES,
        semantic_index,
        semantic_match_batch,
    )
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        _index_so_far,
        make_semantic_ingest_batch_fn,
        reindex_semantic_root,
    )

    _, cents_a, _, dfs = _sem_batches(spark)
    idx_root = str(tmp_path / "idx")
    dec_root = str(tmp_path / "dec")
    fn_a = make_semantic_ingest_batch_fn(spark, idx_root, dec_root, cents_a)
    fn_a(dfs[0], 0)
    fn_a(dfs[1], 1)

    cents_b = _cents_b(spark)
    reindex_semantic_root(spark, idx_root, cents_b, next_batch=2)

    man = read_index_manifest(idx_root)
    assert man["codebook_id"] == codebook_fingerprint(cents_b)
    assert man["deltas"] == [] and man["compacted_through"] == 1

    admitted_ids = {
        r["vec_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dec_root)
        .where("admitted")
        .collect()
    }
    admitted = (
        dfs[0].unionByName(dfs[1]).where(F.col("vec_id").isin(admitted_ids))
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    want_idx = {
        (r["vec_id"], r["cent_id"])
        for r in semantic_index(admitted, cents_b).collect()
    }
    got_idx_df = _index_so_far(spark, idx_root)
    got_idx = {(r["vec_id"], r["cent_id"]) for r in got_idx_df.collect()}
    assert got_idx == want_idx
    assert got_idx_df.count() == len(admitted_ids) * SEM_PROBES

    # next batch through a new-codebook sink == direct match against the
    # from-scratch build under B
    fn_b = make_semantic_ingest_batch_fn(spark, idx_root, dec_root, cents_b)
    fn_b(dfs[2], 2)
    got = {
        r["vec_id"]: (r["admitted"], r["matched_id"], r["cos"])
        for r in _delta(spark, dec_root, 2).collect()
    }
    w = Window.partitionBy("new_id").orderBy(F.col("cos").desc(), F.col("index_id"))
    best = {
        r["new_id"]: (r["index_id"], r["cos"])
        for r in semantic_match_batch(
            semantic_index(admitted, cents_b).localCheckpoint(eager=True),
            dfs[2],
            cents_b,
        )
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }
    for r in dfs[2].collect():
        vid = r["vec_id"]
        if vid in best:
            assert got[vid] == (False, best[vid][0], best[vid][1]), vid
        else:
            assert got[vid] == (True, -1, 0.0), vid


def test_semantic_sink_rejects_mismatched_codebook(spark, tmp_path):
    """A sink holding a different codebook than the index manifest's
    fingerprint hard-fails BEFORE committing anything — and succeeds
    after reindex_semantic_root swaps the artifact."""
    from mapreduce_framework_spark.streaming.ingest import (
        make_semantic_ingest_batch_fn,
        reindex_semantic_root,
    )

    _, cents_a, _, dfs = _sem_batches(spark)
    idx_root = str(tmp_path / "idx")
    dec_root = str(tmp_path / "dec")
    fn_a = make_semantic_ingest_batch_fn(spark, idx_root, dec_root, cents_a)
    fn_a(dfs[0], 0)

    fn_b = make_semantic_ingest_batch_fn(spark, idx_root, dec_root, _cents_b(spark))
    with pytest.raises(ValueError, match="ONE codebook"):
        fn_b(dfs[1], 1)
    committed = {
        r["vec_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dec_root)
        .collect()
    }
    assert committed == {r["vec_id"] for r in dfs[0].collect()}

    reindex_semantic_root(spark, idx_root, _cents_b(spark), next_batch=1)
    # the swap FENCES every pre-swap sink (round 8): a zombie holding the
    # pre-swap epoch could otherwise commit old-codebook assignments into
    # the swapped index mid-batch, past its start-of-batch codebook check
    with pytest.raises(ValueError, match="fenced"):
        fn_b(dfs[1], 1)
    fn_b2 = make_semantic_ingest_batch_fn(
        spark, idx_root, dec_root, _cents_b(spark)
    )
    fn_b2(dfs[1], 1)  # the post-swap sink is sanctioned
    from mapreduce_framework_spark.streaming.ingest import delta_dir

    assert os.path.isdir(delta_dir(idx_root, 1))


def test_full_cascade_sink_rejects_mismatched_codebook(spark, tmp_path):
    """The three-tier sink applies the same guard to its semantic index
    root, before ANY of its four publishes."""
    from mapreduce_framework_spark.streaming.ingest import (
        make_full_cascade_ingest_batch_fn,
    )

    cents, dfs = _full_cascade_fixture(spark)
    roots, _ = _run_full_cascade(spark, tmp_path, dfs[:1], cents)
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD

    fn_b = make_full_cascade_ingest_batch_fn(
        spark,
        roots["fp"],
        roots["sig"],
        roots["sem"],
        roots["dec"],
        _cents_b(spark),
        JACCARD_THRESHOLD,
    )
    with pytest.raises(ValueError, match="ONE codebook"):
        fn_b(dfs[1], 1)
    # nothing from batch 1 committed anywhere (fenced sinks epoch-suffix
    # their delta names, so check by prefix on disk AND via the manifest)
    import re as _re

    from mapreduce_framework_spark.streaming.ingest import delta_dir

    for k in ("fp", "sig", "sem", "dec"):
        assert not [
            d
            for d in os.listdir(roots[k])
            if _re.fullmatch(r"delta_v1(_e\d+)?", d)
        ], k
        with pytest.raises(ValueError, match="no unfolded delta"):
            delta_dir(roots[k], 1)


def test_reindex_refuses_unseeded_and_midstream(spark, tmp_path):
    """reindex_semantic_root is a between-batches operation: a root with
    no manifest (never seeded) and a next_batch at or below the latest
    committed batch are both hard errors."""
    from mapreduce_framework_spark.streaming.ingest import (
        make_semantic_ingest_batch_fn,
        reindex_semantic_root,
    )

    with pytest.raises(ValueError, match="nothing to reindex"):
        reindex_semantic_root(
            spark, str(tmp_path / "nope"), _cents_b(spark), next_batch=0
        )

    _, cents_a, _, dfs = _sem_batches(spark)
    idx_root = str(tmp_path / "idx")
    fn_a = make_semantic_ingest_batch_fn(
        spark, idx_root, str(tmp_path / "dec"), cents_a
    )
    fn_a(dfs[0], 0)
    fn_a(dfs[1], 1)
    with pytest.raises(ValueError, match="between"):
        reindex_semantic_root(spark, idx_root, _cents_b(spark), next_batch=1)


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_full_cascade_compaction_preserves_decisions(spark, tmp_path):
    """The three-tier sink with aggressive tail compaction
    (compact_every=1 on all four manifest roots) produces decisions and
    final index contents identical to the uncompacted run — the
    byte-identical-decisions compaction contract, on the composed
    cascade."""
    cents, dfs = _full_cascade_fixture(spark)
    plain, _ = _run_full_cascade(spark, tmp_path, dfs, cents, prefix="pl")
    comp, _ = _run_full_cascade(
        spark, tmp_path, dfs, cents, prefix="co", compact_every=1
    )
    read = lambda r: spark.read.option("recursiveFileLookup", "true").parquet(r)
    dec = lambda roots: {
        d: (r["admitted"], r["tier"], r["matched_id"], r["score"])
        for d, r in _decisions(spark, roots["dec"]).items()
    }
    assert dec(comp) == dec(plain)
    for k, cols in (
        ("fp", ["doc_id", "fp"]),
        ("sig", ["doc_id"]),
        ("sem", ["vec_id", "cent_id"]),
    ):
        want = {tuple(r) for r in read(plain[k]).select(*cols).collect()}
        got = {tuple(r) for r in read(comp[k]).select(*cols).collect()}
        assert got == want, k
    # the compacted run actually compacted: tail shorter than batch count
    from mapreduce_framework_spark.storage import read_index_manifest

    man = read_index_manifest(comp["sig"])
    assert man["compacted_path"] is not None
    assert len(man["deltas"]) < len(dfs)
    assert read_index_manifest(comp["sem"])["codebook_id"] is not None


# ---------------------------------------------------------------------------
# Persisted banded layout in the ingest sinks (round 7): bands_root /
# sig_bands_root — byte-identical decisions, coverage guard
# ---------------------------------------------------------------------------


def test_ingest_bands_root_equals_plain(spark, sf_dir, tmp_path):
    """The single-tier sink with a maintained band index produces
    decisions byte-identical to the plain run across batches that
    actually reject docs, and the band root tracks the signature root
    delta for delta (N_BANDS rows per indexed doc)."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import (
        JACCARD_THRESHOLD,
        N_BANDS,
    )
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    # planted re-texts so the near-dup tier fires: batch-0 docs with new ids
    b1 = docs.where(F.col("doc_id") % 3 == 1).unionAll(
        b0.limit(20).select(
            (F.col("doc_id") + F.lit(5_000_000)).alias("doc_id"), "text"
        )
    )

    def run(tag, **kw):
        fn = make_ingest_batch_fn(
            spark,
            str(tmp_path / f"{tag}_idx"),
            str(tmp_path / f"{tag}_dec"),
            JACCARD_THRESHOLD,
            **kw,
        )
        fn(b0, 0)
        fn(b1, 1)
        return {
            (r["doc_id"], r["admitted"], r["matched_id"], r["jaccard"])
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(str(tmp_path / f"{tag}_dec"))
            .collect()
        }

    plain = run("plain")
    banded = run("banded", bands_root=str(tmp_path / "bands"))
    assert banded == plain
    assert any(not adm for _, adm, _, _ in plain)  # the plants were rejected

    sig_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "banded_idx"))
        .count()
    )
    band_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "bands"))
        .count()
    )
    assert band_rows == sig_rows * N_BANDS


def test_ingest_bands_root_coverage_guard(spark, sf_dir, tmp_path):
    """Enabling bands_root MID-STREAM is a hard error before any match
    runs: the band index would silently miss every candidate from the
    batches it does not cover."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    idx_root = str(tmp_path / "idx")
    dec_root = str(tmp_path / "dec")
    fn_plain = make_ingest_batch_fn(spark, idx_root, dec_root, JACCARD_THRESHOLD)
    fn_plain(docs.where(F.col("doc_id") % 3 == 0), 0)

    fn_banded = make_ingest_batch_fn(
        spark,
        idx_root,
        dec_root,
        JACCARD_THRESHOLD,
        bands_root=str(tmp_path / "bands"),
    )
    with pytest.raises(ValueError, match="covers batches"):
        fn_banded(docs.where(F.col("doc_id") % 3 == 1), 1)


def test_full_cascade_sig_bands_root_equality(spark, tmp_path):
    """The three-tier sink with a maintained band index reaches the
    identical per-tier decisions on the fixture that fires every tier."""
    cents, dfs = _full_cascade_fixture(spark)
    plain, _ = _run_full_cascade(spark, tmp_path, dfs, cents, prefix="pb")
    banded, _ = _run_full_cascade(
        spark,
        tmp_path,
        dfs,
        cents,
        prefix="bb",
        sig_bands_root=str(tmp_path / "bb_bands"),
    )
    dec = lambda roots: {
        d: (r["admitted"], r["tier"], r["matched_id"], r["score"])
        for d, r in _decisions(spark, roots["dec"]).items()
    }
    assert dec(banded) == dec(plain)
    from mapreduce_framework_spark.streaming.ingest import delta_dir

    assert os.path.isdir(delta_dir(str(tmp_path / "bb_bands"), 1))


def test_ingest_bands_root_survives_compaction(spark, sf_dir, tmp_path):
    """Aggressive compaction (compact_every=1) folds BOTH sibling roots
    on the same cadence; the coverage guard — which compares covered
    batch-id SETS (compacted range ∪ tail) — stays satisfied across the
    fold, and decisions remain byte-identical to the plain uncompacted
    run."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    batches = [
        docs.where(F.col("doc_id") % 3 == 0),
        docs.where(F.col("doc_id") % 3 == 1).unionAll(
            docs.where(F.col("doc_id") % 3 == 0)
            .limit(15)
            .select((F.col("doc_id") + F.lit(5_000_000)).alias("doc_id"), "text")
        ),
        docs.where(F.col("doc_id") % 3 == 2),
    ]

    def run(tag, **kw):
        fn = make_ingest_batch_fn(
            spark,
            str(tmp_path / f"{tag}_idx"),
            str(tmp_path / f"{tag}_dec"),
            JACCARD_THRESHOLD,
            **kw,
        )
        for i, b in enumerate(batches):
            fn(b, i)
        return {
            (r["doc_id"], r["admitted"], r["matched_id"], r["jaccard"])
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(str(tmp_path / f"{tag}_dec"))
            .collect()
        }

    plain = run("plain", compact_every=None)
    folded = run(
        "folded", compact_every=1, bands_root=str(tmp_path / "folded_bands")
    )
    assert folded == plain
    # both sibling manifests actually folded, on the same boundary
    ms = read_index_manifest(str(tmp_path / "folded_idx"))
    mb = read_index_manifest(str(tmp_path / "folded_bands"))
    assert ms["compacted_path"] is not None and mb["compacted_path"] is not None
    assert ms["compacted_through"] == mb["compacted_through"]


# Writer fencing (round 8): the manifest's epoch token kills silent
# last-writer-wins between two streams on one root (VERDICT r7 item 2).


def test_writer_fencing_two_sinks_one_root(spark, sf_dir, tmp_path):
    """Two sinks accidentally pointed at ONE pair of roots: constructing
    the second ACQUIRES the roots (epoch bump), so the first sink's next
    publish hard-errors having committed nothing — its earlier decisions
    and the new owner's decisions both stay intact. Pre-fencing behavior
    was silent last-writer-wins on the manifest (the loser's deltas
    dropped from visibility)."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import make_ingest_batch_fn

    batches = _split_docs(spark, sf_dir, 3)
    idx = str(tmp_path / "index")
    dec = str(tmp_path / "decisions")

    fn_a = make_ingest_batch_fn(spark, idx, dec, JACCARD_THRESHOLD)
    fn_a(batches[0], 0)
    before = set(_decisions(spark, dec))

    fn_b = make_ingest_batch_fn(spark, idx, dec, JACCARD_THRESHOLD)  # takeover
    fn_b(batches[1], 1)

    with pytest.raises(ValueError, match="fenced"):
        fn_a(batches[2], 2)  # the zombie writer is fenced, loudly

    # nothing from the fenced attempt was committed; the owner's history
    # (batch 0 under epoch 1, batch 1 under epoch 2) is fully visible
    after = _decisions(spark, dec)
    want = before | {r["doc_id"] for r in batches[1].collect()}
    assert set(after) == want
    from mapreduce_framework_spark.storage import read_index_manifest

    man = read_index_manifest(dec)
    assert man["epoch"] == 2
    assert [e[0] for e in man["deltas"]] == [0, 1]  # batch 2 never committed


def test_writer_fencing_refuses_owned_root_without_takeover(tmp_path):
    """acquire_index_root(takeover=False) is the conservative mode: a root
    that already has an owner is a hard error instead of a fence."""
    from mapreduce_framework_spark.storage import acquire_index_root

    root = str(tmp_path / "root")
    assert acquire_index_root(root) == 1
    assert acquire_index_root(root) == 2  # takeover bumps and fences
    with pytest.raises(ValueError, match="already owned"):
        acquire_index_root(root, takeover=False)


def test_legacy_d_v_decisions_root_is_adopted(spark, sf_dir, tmp_path):
    """A PRE-round-7 decisions root (deltas named d_v{batch}, no manifest)
    must be adopted on resume: the first post-upgrade publish records the
    legacy dirs in the manifest (no renames), historical decisions stay
    visible, and the manifest's contiguity check passes — the round-7
    migration regression the round-8 advice flagged (old roots previously
    hard-errored with 'manifest has a gap' and lost all history)."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        _index_so_far,
        make_ingest_batch_fn,
    )

    batches = _split_docs(spark, sf_dir, 3)
    idx = str(tmp_path / "index")
    dec = str(tmp_path / "decisions")

    # simulate the pre-manifest sink: run the modern sink into scratch
    # roots, then lay its outputs down under the legacy names
    fn_old = make_ingest_batch_fn(
        spark, str(tmp_path / "s_idx"), str(tmp_path / "s_dec"), JACCARD_THRESHOLD
    )
    for i, b in enumerate(batches[:2]):
        fn_old(b, i)
    for i in range(2):
        _delta(spark, str(tmp_path / "s_dec"), i).write.parquet(
            os.path.join(dec, f"d_v{i}")
        )
        _delta(spark, str(tmp_path / "s_idx"), i).write.parquet(
            os.path.join(idx, f"d_v{i}")
        )

    # resume the stream on the legacy roots: batch 2 matches against the
    # adopted history and publishes cleanly
    fn = make_ingest_batch_fn(spark, idx, dec, JACCARD_THRESHOLD)
    fn(batches[2], 2)

    man = read_index_manifest(dec)
    assert [e[0] for e in man["deltas"]] == [0, 1, 2]
    assert [e[1] for e in man["deltas"][:2]] == ["d_v0", "d_v1"]
    assert man["deltas"][2][1].startswith("delta_v2")  # fenced: epoch-suffixed
    all_dec = _decisions(spark, dec)
    want = {r["doc_id"] for b in batches for r in b.select("doc_id").collect()}
    assert set(all_dec) == want
    # the adopted index produced the same decisions the uninterrupted
    # modern stream produces
    fn_ref = make_ingest_batch_fn(
        spark, str(tmp_path / "r_idx"), str(tmp_path / "r_dec"), JACCARD_THRESHOLD
    )
    for i, b in enumerate(batches):
        fn_ref(b, i)
    ref = _decisions(spark, str(tmp_path / "r_dec"))
    assert {
        (d, r["admitted"], r["matched_id"], r["jaccard"]) for d, r in all_dec.items()
    } == {(d, r["admitted"], r["matched_id"], r["jaccard"]) for d, r in ref.items()}
    # _index_so_far reads the adopted layout without a gap error
    assert _index_so_far(spark, idx).count() > 0


def test_reindex_twice_with_same_next_batch(spark, tmp_path):
    """A double refresh (or a retry after a COMPLETED reindex) with the
    same next_batch must not read from and overwrite the same compacted
    dir: the second run writes a generation-unique compact dir and the
    index content still equals the from-scratch assignment under the
    final codebook (round-8 advice item)."""
    from mapreduce_framework_spark.pipeline.semantic_dedup import semantic_index
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        _index_so_far,
        make_semantic_ingest_batch_fn,
        reindex_semantic_root,
    )

    _, cents_a, _, dfs = _sem_batches(spark)
    idx_root = str(tmp_path / "idx")
    fn_a = make_semantic_ingest_batch_fn(
        spark, idx_root, str(tmp_path / "dec"), cents_a
    )
    fn_a(dfs[0], 0)
    fn_a(dfs[1], 1)

    cents_b = _cents_b(spark)
    reindex_semantic_root(spark, idx_root, cents_b, next_batch=2)
    man1 = read_index_manifest(idx_root)
    reindex_semantic_root(spark, idx_root, cents_b, next_batch=2)  # retry
    man2 = read_index_manifest(idx_root)
    assert man2["compacted_path"] != man1["compacted_path"]

    admitted_ids = {
        r["vec_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "dec"))
        .where("admitted")
        .collect()
    }
    admitted = (
        dfs[0]
        .unionByName(dfs[1])
        .where(F.col("vec_id").isin(admitted_ids))
        .select("vec_id", "embedding")
    )
    want = {
        (r["vec_id"], r["cent_id"])
        for r in semantic_index(admitted, cents_b).collect()
    }
    got = {
        (r["vec_id"], r["cent_id"]) for r in _index_so_far(spark, idx_root).collect()
    }
    assert got == want


# Codebook-drift trigger (round 8): per-batch quantization error logged in
# the semantic index manifest + needs_refit() reading the trend.


def _drift_batches(spark):
    """Codebook on two axes; early batches hug the centroids (low 1-cos),
    late batches sit between axes (the drifted population: ~0.29 vs
    ~0.03 quantization error — the integer-grid style of _sem_batches)."""
    from pyspark.sql import Row

    cents = spark.createDataFrame(
        [Row(cent_id=0, cent=[1.0, 0.0, 0.0]), Row(cent_id=1, cent=[0.0, 1.0, 0.0])]
    )

    def mk(base_id, vecs):
        return spark.createDataFrame(
            [
                Row(vec_id=base_id + i, embedding=[float(x) for x in v])
                for i, v in enumerate(vecs)
            ]
        )

    low = [[4, 1, 0], [1, 4, 0], [8, 2, 0], [2, 8, 0]]
    high = [[1, 1, 1], [1, 1, -1], [-1, 1, 1], [1, -1, 1]]
    # 4 healthy batches (= DRIFT_BASELINE_K, so the median baseline stamps
    # on an all-healthy prefix) then 2 drifted ones
    return cents, [
        mk(0, low),
        mk(10, low),
        mk(40, low),
        mk(50, low),
        mk(20, high),
        mk(30, high),
    ]


@pytest.mark.slow  # r14 item 2: autopilot family keeps test_refresh_autopilot_fires_only_on_drift
def test_drift_statistic_triggers_refit(spark, tmp_path):
    """The manifest drift log rises exactly when the stream's population
    drifts away from the codebook: needs_refit() is False while batches
    match the fitted distribution and True once the trailing window is
    dominated by drifted batches — the trigger the refresh lifecycle
    (refit_codebook -> reindex_semantic_root) was missing. The swap
    resets the log and the first post-swap batch sets the new baseline."""
    from mapreduce_framework_spark.pipeline.codebook import quantization_error
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        drift_stats,
        make_semantic_ingest_batch_fn,
        needs_refit,
        reindex_semantic_root,
    )

    cents, dfs = _drift_batches(spark)
    idx = str(tmp_path / "idx")
    dec = str(tmp_path / "dec")
    fn = make_semantic_ingest_batch_fn(spark, idx, dec, cents)

    import statistics

    # WARMUP (round-9 ADVICE): until DRIFT_BASELINE_K batches are logged
    # the baseline is unstamped — drift_stats is None and needs_refit is
    # conservatively False, so one unrepresentative early batch can no
    # longer anchor the codebook's whole lifetime
    fn(dfs[0], 0)
    fn(dfs[1], 1)
    assert drift_stats(idx, window=2) is None
    assert not needs_refit(idx, threshold=1.25, window=2)

    fn(dfs[2], 2)
    fn(dfs[3], 3)
    s = drift_stats(idx, window=2)
    assert s is not None and s["n"] == 2
    # the stamped baseline is the MEDIAN of the K earliest logged batches'
    # library quantization errors
    want_base = statistics.median(
        quantization_error(dfs[i], cents) for i in range(4)
    )
    assert abs(s["baseline"] - want_base) < 1e-12
    assert not needs_refit(idx, threshold=1.25, window=2)

    fn(dfs[4], 4)
    fn(dfs[5], 5)
    s = drift_stats(idx, window=2)
    assert s["ratio"] > 5.0  # drifted population: ~10x the baseline error
    assert needs_refit(idx, threshold=1.25, window=2)
    man = read_index_manifest(idx)
    assert [b for b, _ in man["drift"]] == [0, 1, 2, 3, 4, 5]

    # redelivery replaces (never duplicates) a batch's drift entry, and —
    # after the stamp — leaves the baseline fixed
    fn(dfs[5], 5)
    man = read_index_manifest(idx)
    assert [b for b, _ in man["drift"]] == [0, 1, 2, 3, 4, 5]
    assert abs(man["drift_baseline"] - want_base) < 1e-12

    # refresh: refit on the drifted population and swap — the log resets
    # and the baseline is stamped from the REINDEXED corpus under the new
    # book (fit-time anchor), so the very next batch is judged against it
    # with no K-batch warmup
    from mapreduce_framework_spark.pipeline.codebook import refit_codebook

    drifted = dfs[4].unionByName(dfs[5]).select("vec_id", "embedding")
    cents_b = refit_codebook(drifted, cents, iters=4).localCheckpoint(eager=True)
    reindex_semantic_root(spark, idx, cents_b, next_batch=6)
    assert drift_stats(idx) is None and not needs_refit(idx)
    man = read_index_manifest(idx)
    assert man.get("drift") is None and man.get("drift_baseline") is not None

    fn_b = make_semantic_ingest_batch_fn(spark, idx, dec, cents_b)
    more = dfs[5].select(
        (F.col("vec_id") + 100).alias("vec_id"), "embedding"
    )
    fn_b(more, 6)
    s = drift_stats(idx, window=2)
    assert s is not None and s["n"] == 1
    assert not needs_refit(idx, threshold=1.25, window=2)


# Admission-report rollup (round 8): the per-tier ops view over a
# decisions root (VERDICT r7 item 7).


def test_admission_report_matches_duckdb(spark, tmp_path):
    """Registered-query-grade differential (q106 registers this op over
    the q104 replay): the rollup over a real full-cascade decisions root
    equals DuckDB re-deriving it from the replayed decision parquet —
    ALL cells exactly, including the mean, because both engines compute
    it as the exact DECIMAL(38,9) sum divided once and re-rounded at
    scale 9 (the q15 FP-determinism discipline)."""
    import duckdb

    from mapreduce_framework_spark.streaming.ingest import admission_report

    cents, dfs = _full_cascade_fixture(spark)
    roots, _ = _run_full_cascade(spark, tmp_path, dfs, cents, prefix="rep")
    got = admission_report(spark, roots["dec"]).collect()
    assert {r["outcome"] for r in got} >= {"admitted", "exact", "near_dup", "semantic"}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW dec AS SELECT * FROM read_parquet("
        f"'{roots['dec']}/*/*.parquet')"
    )
    want = con.execute(
        """
        SELECT coalesce(tier, 'admitted') AS outcome,
               count(*) AS n_docs,
               CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share,
               min(score) AS min_score,
               CAST(CAST(CAST(SUM(CAST(score AS DECIMAL(38,9))) AS DOUBLE)
                    / count(*) AS DECIMAL(18,9)) AS DOUBLE) AS avg_score,
               max(score) AS max_score
        FROM dec GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["outcome"], g["n_docs"]) == (w[0], w[1])
        assert g["share"] == w[2]
        assert g["min_score"] == w[3] and g["max_score"] == w[5]
        assert g["avg_score"] == w[4]


def test_admission_report_single_tier_schema(spark, sf_dir, tmp_path):
    """The rollup reads the single-tier sinks' schema too (no tier
    column, family metric named jaccard): rejected rows group under
    'rejected', counts reconcile with the raw log."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        admission_report,
        make_ingest_batch_fn,
    )

    batches = _split_docs(spark, sf_dir, 2)
    dec = str(tmp_path / "dec")
    fn = make_ingest_batch_fn(spark, str(tmp_path / "idx"), dec, JACCARD_THRESHOLD)
    for i, b in enumerate(batches):
        fn(b, i)
    rep = {r["outcome"]: r for r in admission_report(spark, dec).collect()}
    raw = _decisions(spark, dec)
    n_adm = sum(1 for r in raw.values() if r["admitted"])
    assert rep["admitted"]["n_docs"] == n_adm
    if len(raw) > n_adm:
        assert rep["rejected"]["n_docs"] == len(raw) - n_adm
        assert rep["rejected"]["min_score"] >= JACCARD_THRESHOLD
    assert abs(sum(r["share"] for r in rep.values()) - 1.0) < 1e-12


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_admission_report_plan(spark, tmp_path):
    """Aggregation-only plan: no join, no Python eval, and only the two
    sanctioned exchanges (the tier partial-agg + the single-partition
    share window over <= 4 grouped rows)."""
    from mapreduce_framework_spark.streaming.ingest import admission_report

    cents, dfs = _full_cascade_fixture(spark)
    roots, _ = _run_full_cascade(spark, tmp_path, dfs, cents, prefix="pl")
    df = admission_report(spark, roots["dec"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Join" not in plan and "EvalPython" not in plan
    assert "HashAggregate" in plan


def test_refresh_autopilot_fires_only_on_drift(spark, tmp_path):
    """refresh_semantic_root_if_needed composes measure -> decide -> act:
    None (and no manifest change) while the stream matches the fitted
    distribution; after drifted batches it refits warm-started on the
    committed index vectors, swaps the root (drift log reset, fingerprint
    re-stamped), and returns centroids the next sink accepts; an
    immediate second call is None again (no post-swap drift evidence)."""
    from mapreduce_framework_spark.pipeline.codebook import codebook_fingerprint
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        make_semantic_ingest_batch_fn,
        needs_refit,
        refresh_semantic_root_if_needed,
    )

    cents, dfs = _drift_batches(spark)
    idx = str(tmp_path / "idx")
    dec = str(tmp_path / "dec")
    fn = make_semantic_ingest_batch_fn(spark, idx, dec, cents)
    for i in range(4):
        fn(dfs[i], i)  # 4 healthy batches: baseline stamps all-healthy

    # healthy stream: no refresh, manifest untouched
    man_before = read_index_manifest(idx)
    assert (
        refresh_semantic_root_if_needed(
            spark, idx, cents, next_batch=4, threshold=1.25, window=2
        )
        is None
    )
    assert read_index_manifest(idx) == man_before

    fn(dfs[4], 4)
    fn(dfs[5], 5)
    assert needs_refit(idx, threshold=1.25, window=2)
    refreshed = refresh_semantic_root_if_needed(
        spark, idx, cents, next_batch=6, threshold=1.25, window=2, iters=4
    )
    assert refreshed is not None
    man = read_index_manifest(idx)
    assert man["codebook_id"] == codebook_fingerprint(refreshed)
    # log reset; baseline re-stamped at FIT TIME from the reindexed corpus
    assert man.get("drift") is None and man.get("drift_baseline") is not None
    # no post-swap drift evidence -> the autopilot stands down
    assert (
        refresh_semantic_root_if_needed(
            spark, idx, refreshed, next_batch=6, threshold=1.25, window=2
        )
        is None
    )
    # the next sink accepts the refreshed book and streams on; the
    # autopilot's refit corpus was the WHOLE committed index (healthy +
    # drifted), so a batch drawn from that same mixed population sits at
    # the fit-time baseline and the trigger stays quiet — while a stream
    # that kept drifting PAST the refit population would (correctly)
    # trigger again
    fn_b = make_semantic_ingest_batch_fn(spark, idx, dec, refreshed)
    mixed = dfs[0]
    for i in range(1, 5):
        mixed = mixed.unionByName(dfs[i])
    fn_b(mixed.select((F.col("vec_id") + 100).alias("vec_id"), "embedding"), 6)
    assert not needs_refit(idx, threshold=1.25, window=2)


def test_merge_sink_writer_fencing(spark, sf_dir, tmp_path):
    """The merge sinks' read-merge-write cycle gets the same fencing as
    the ingest indexes: a second sink on the same state root fences the
    first (hard error, nothing committed) and the epoch survives the
    manifest's retention rewrite."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.storage import read_json_atomic
    from mapreduce_framework_spark.streaming.foreach_batch import (
        STATE_MANIFEST,
        _acquire_state_root,
        make_rollup_merge_batch_fn,
    )

    events = table(spark, "events", sf_dir)
    batches = [events.where(F.col("event_id") % 2 == i) for i in range(2)]
    root = str(tmp_path / "state")

    fn_a = make_rollup_merge_batch_fn(spark, root)
    fn_a(batches[0], 0)
    man = read_json_atomic(os.path.join(root, STATE_MANIFEST))
    assert man["epoch"] == 1 and man["versions"] == [0]

    fn_b = make_rollup_merge_batch_fn(spark, root)  # takeover
    fn_b(batches[1], 1)
    with pytest.raises(ValueError, match="fenced"):
        fn_a(batches[1], 2)
    man = read_json_atomic(os.path.join(root, STATE_MANIFEST))
    assert man["epoch"] == 2 and man["versions"] == [0, 1]  # batch 2 never committed

    with pytest.raises(ValueError, match="already owned"):
        _acquire_state_root(root, takeover=False)


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_full_cascade_stream_with_bands_root(spark, tmp_path):
    """The three-tier STREAM RUNNER maintains the persisted banded layout
    when sig_bands_root is passed (the round-8 plumbing): decisions are
    byte-identical to the runner without it, and the bands manifest
    covers every batch (the coverage hard-error's invariant)."""
    from mapreduce_framework_spark.operators.streaming_replay import (
        _set_staged_mtime,
    )
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        run_full_cascade_ingest_stream,
    )

    cents, dfs = _full_cascade_fixture(spark)

    def run(tag, **kw):
        staging = str(tmp_path / f"{tag}_staging")
        os.makedirs(staging)
        for i, df in enumerate(dfs):
            p = os.path.join(staging, f"b{i}")
            df.coalesce(1).write.parquet(p)
            _set_staged_mtime(p, 1_000_000_000.0 + 100 * i)
        stream = (
            spark.readStream.schema(dfs[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(staging, "b*"))
        )
        dec = run_full_cascade_ingest_stream(
            stream,
            spark,
            str(tmp_path / f"{tag}_fp"),
            str(tmp_path / f"{tag}_sig"),
            str(tmp_path / f"{tag}_sem"),
            str(tmp_path / f"{tag}_dec"),
            str(tmp_path / f"{tag}_ckpt"),
            cents,
            JACCARD_THRESHOLD,
            timeout_s=240,
            **kw,
        )
        return {
            r["doc_id"]: (r["admitted"], r["tier"], r["matched_id"], r["score"])
            for r in dec.collect()
        }

    plain = run("pl")
    banded = run("bd", sig_bands_root=str(tmp_path / "bd_bands"))
    assert banded == plain
    man = read_index_manifest(str(tmp_path / "bd_bands"))
    covered = set(range(man["compacted_through"] + 1)) | {
        b for b, _ in man["deltas"]
    }
    assert covered == {0, 1, 2}


# Exact-tier hot-fp guard (round 9, VERDICT r8 missing item 1) and the
# intra-batch pre-dedup option.


@pytest.mark.slow  # r14 item 2: cascade decisions oracle-checked by the q103/q104 replays
def test_fp_distinct_cascade_decisions_identical(spark, sf_dir, tmp_path):
    """fp_distinct (the default) is decision-lossless end-to-end: the
    cascade's decisions with the distinct-fp index (compaction
    re-applying cap_fingerprints) are byte-identical to the full-fp run,
    and the compacted fp root carries one row per fingerprint."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        _index_so_far,
        make_cascade_ingest_batch_fn,
    )

    b0, b1 = _cascade_batches(spark, sf_dir)
    # a third batch re-fetching batch-0 docs AGAIN exercises matching
    # against the compacted (distinct) artifact, not just the fresh deltas
    b2 = b0.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )

    def run(tag, fp_distinct):
        fn = make_cascade_ingest_batch_fn(
            spark,
            str(tmp_path / tag / "fp"),
            str(tmp_path / tag / "sig"),
            str(tmp_path / tag / "dec"),
            JACCARD_THRESHOLD,
            compact_every=1,
            fp_distinct=fp_distinct,
        )
        for i, b in enumerate([b0, b1, b2]):
            fn(b, i)
        return {
            d: (r["admitted"], r["tier"], r["matched_id"], r["jaccard"])
            for d, r in _decisions(spark, str(tmp_path / tag / "dec")).items()
        }

    dist = run("fd_on", True)
    full = run("fd_off", False)
    assert dist == full
    assert any(t == "exact" for _, t, _, _ in dist.values())
    # the distinct root's compacted artifact: one row per fp
    fp_root = str(tmp_path / "fd_on" / "fp")
    man = read_index_manifest(fp_root)
    assert man["compacted_path"] is not None
    fps = _index_so_far(spark, fp_root)
    assert (
        fps.groupBy("fp").count().agg(F.max("count")).collect()[0][0] == 1
    )
    # the full root keeps per-doc rows (it is the doc_id -> fp lookup)
    fps_full = _index_so_far(spark, str(tmp_path / "fd_off" / "fp"))
    assert fps_full.count() >= fps.count()


def test_intra_batch_exact_pre_dedup(spark, sf_dir, tmp_path):
    """The opt-in within-batch byte-identical pre-dedup: copies arriving
    in ONE batch are rejected (tier 'exact', matched_id = the lowest
    same-fp batch doc, which stays admitted and indexed); the default
    sink admits them all (the module's within-batch-is-upstream policy).
    Docs whose fp is already in the corpus keep the INDEX tier's verdict
    on every copy — intra-batch order never shadows the index."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
    )

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    cut = docs.agg(((F.max("doc_id") + 1) / 2).cast("long")).collect()[0][0]
    b0 = docs.where(F.col("doc_id") < cut).localCheckpoint(eager=True)
    up = docs.where(F.col("doc_id") >= cut)
    # plant TWO kinds of in-batch copies into batch 1:
    #   * +3M/+4M: copies of upper-half docs (fp NEW to the corpus) — only
    #     the lowest id (the original) should survive with intra dedup
    #   * +5M: copies of batch-0 docs (fp ALREADY indexed) — the INDEX
    #     tier rejects original-and-copy alike, under both settings
    b1 = (
        up.unionByName(
            up.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            up.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 4_000_000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            b0.where(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
            )
        )
        .localCheckpoint(eager=True)
    )

    def run(tag, intra):
        fn = make_cascade_ingest_batch_fn(
            spark,
            str(tmp_path / tag / "fp"),
            str(tmp_path / tag / "sig"),
            str(tmp_path / tag / "dec"),
            JACCARD_THRESHOLD,
            intra_batch_exact=intra,
        )
        for i, b in enumerate([b0, b1]):
            fn(b, i)
        return _decisions(spark, str(tmp_path / tag / "dec"))

    off = run("ib_off", False)
    on = run("ib_on", True)
    assert set(on) == set(off)

    marks = [d for d in on if 3_000_000 <= d < 5_000_000]
    assert marks
    for d in marks:
        base = d - (3_000_000 if d < 4_000_000 else 4_000_000)
        # default: within-batch copies all share the original's fate
        assert off[d]["admitted"] == off[base]["admitted"]
        r = on[d]
        if on[base]["admitted"]:
            # fp new to the corpus: the original survives, the in-batch
            # copy is exact-rejected against it
            assert not r["admitted"] and r["tier"] == "exact"
            assert r["matched_id"] == base and r["jaccard"] == 1.0
        else:
            # the original was itself rejected (near-dup vs the index):
            # the copy must NOT be admitted either way
            assert not r["admitted"]
    # index-known fps: verdicts identical under both settings (the index
    # tier owns them)
    for d in on:
        if d >= 5_000_000 or d < cut:
            assert (on[d]["admitted"], on[d]["tier"], on[d]["matched_id"]) == (
                off[d]["admitted"],
                off[d]["tier"],
                off[d]["matched_id"],
            )
    # everything else (no in-batch copy involved) is untouched
    for d in on:
        if d < 3_000_000:
            assert on[d]["admitted"] == off[d]["admitted"]


def test_caps_require_compaction(spark, tmp_path):
    """Round-9 ADVICE: a hot-key cap with compact_every=None would never
    be applied (caps run at compaction) — every sink that accepts a cap
    must hard-error instead of silently returning an uncapped index."""
    import pytest as _pytest

    from mapreduce_framework_spark.pipeline.codebook import fit_codebook
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
        make_full_cascade_ingest_batch_fn,
        make_ingest_batch_fn,
        make_semantic_ingest_batch_fn,
    )

    cents = fit_codebook(
        spark.range(40).select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % 5).cast("double"),
                (F.col("id") % 3).cast("double"),
                F.lit(1.0),
            ).alias("embedding"),
        ),
        k=4,
        iters=1,
    ).localCheckpoint(eager=True)

    with _pytest.raises(ValueError, match="compact_every"):
        make_ingest_batch_fn(
            spark, str(tmp_path / "i1"), str(tmp_path / "d1"), 0.8,
            compact_every=None, bands_root=str(tmp_path / "b1"), band_cap=64,
        )
    with _pytest.raises(ValueError, match="compact_every"):
        make_cascade_ingest_batch_fn(
            spark, str(tmp_path / "f2"), str(tmp_path / "s2"),
            str(tmp_path / "d2"), 0.8,
            compact_every=None, sig_bands_root=str(tmp_path / "b2"), band_cap=64,
        )
    with _pytest.raises(ValueError, match="compact_every"):
        make_semantic_ingest_batch_fn(
            spark, str(tmp_path / "i3"), str(tmp_path / "d3"), cents,
            compact_every=None, cell_cap=64,
        )
    with _pytest.raises(ValueError, match="compact_every"):
        make_full_cascade_ingest_batch_fn(
            spark, str(tmp_path / "f4"), str(tmp_path / "s4"),
            str(tmp_path / "m4"), str(tmp_path / "d4"), cents, 0.8,
            compact_every=None, cell_cap=64,
        )


def test_zombie_delta_write_cannot_touch_committed_dirs(spark, sf_dir, tmp_path):
    """Round-9 ADVICE: the pre-commit epoch check cannot protect the delta
    WRITE that precedes it — a zombie redelivering a batch id the new
    owner already committed used to overwrite parquet inside a dir the
    committed manifest references, corrupting visible data before the
    check fired. With epoch-suffixed delta names the zombie's write lands
    in a dir NO committed manifest references: the owner's bytes are
    untouched for the whole duration, the zombie still errors loudly at
    its commit, and its orphan is swept by the owner's next publish."""
    import glob as _glob

    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        delta_dir,
        make_ingest_batch_fn,
    )

    batches = _split_docs(spark, sf_dir, 3)
    idx = str(tmp_path / "index")
    dec = str(tmp_path / "dec")
    fn_a = make_ingest_batch_fn(spark, idx, dec, JACCARD_THRESHOLD)  # epoch 1
    fn_a(batches[0], 0)
    fn_b = make_ingest_batch_fn(spark, idx, dec, JACCARD_THRESHOLD)  # epoch 2
    fn_b(batches[1], 1)  # the new owner commits batch 1

    owner_dir = delta_dir(idx, 1)
    assert owner_dir.endswith("_e2")
    owner_files = {
        p: os.path.getmtime(p)
        for p in _glob.glob(os.path.join(owner_dir, "*.parquet"))
    }
    assert owner_files

    # the zombie retries batch 1: the BEFORE-data check already kills it
    # loudly, with no write at all...
    with pytest.raises(ValueError, match="fenced"):
        fn_a(batches[1], 1)
    assert not [d for d in os.listdir(idx) if d.startswith("delta_v1_e1")]
    # ...but that check cannot cover a zombie that passed it a moment
    # BEFORE the takeover and is mid-write when the owner commits — the
    # ADVICE window. Simulate exactly that interleaving: the stale writer
    # (epoch 1) materializes its delta under ITS name, delta_v1_e1 —
    # which, by construction, is a dir NO committed manifest references —
    # while the owner's committed delta_v1_e2 must stay bit-untouched.
    from mapreduce_framework_spark.pipeline.dedup import index_signatures

    index_signatures(batches[1]).write.mode("overwrite").parquet(
        os.path.join(idx, "delta_v1_e1")
    )
    assert {
        p: os.path.getmtime(p)
        for p in _glob.glob(os.path.join(owner_dir, "*.parquet"))
    } == owner_files
    man = read_index_manifest(idx)
    assert dict(e for e in man["deltas"])[1].endswith("_e2")

    # the owner streams on; its next publish's prune sweeps the orphan
    fn_b(batches[2], 2)
    assert not [d for d in os.listdir(idx) if d.startswith("delta_v1_e1")]
    assert spark.read.parquet(delta_dir(idx, 1)).count() > 0


def test_decontamination_tier(spark, tmp_path):
    """Round-9 library-first: the opt-in DECONTAMINATION tier of the full
    cascade — the streaming counterpart of q105's batch span-trim stage.
    Admitted-by-all-dedup-tiers docs whose contaminated-token fraction
    against a persisted benchmark span_index reaches the threshold are
    rejected (tier 'contaminated', score = the library cont_frac,
    matched_id = -1 — benchmark-side hit, no corpus counterpart) and are
    NOT indexed; sub-threshold hits and clean docs admit; every other
    doc's verdict is byte-identical to the three-tier run."""
    from mapreduce_framework_spark.pipeline.codebook import fit_codebook
    from mapreduce_framework_spark.pipeline.span_dedup import (
        span_contamination,
        span_index,
    )
    from mapreduce_framework_spark.streaming.ingest import (
        _index_so_far,
        admission_report,
        make_full_cascade_ingest_batch_fn,
    )

    alpha = lambda i: chr(97 + (i // 26) % 26) + chr(97 + i % 26)  # noqa: E731

    def words(prefix, n, start=0):
        return " ".join(f"{prefix}{alpha(start + j)}" for j in range(n))

    # pure-alpha tokens only: the family tokenizer splits on non-letter
    # runs, so a digit inside a token would double the token count
    bench = spark.createDataFrame(
        [(100 + b, words("bm" + alpha(b), 30)) for b in range(3)],
        "doc_id long, text string",
    )
    bench_idx = span_index(bench).localCheckpoint(eager=True)

    # batch 0: clean seed docs. batch 1: clean fresh docs + a GROSSLY
    # contaminated plant (12 benchmark tokens inside 27) + a SUB-THRESHOLD
    # plant (10 benchmark tokens inside 310 -> frac ~0.032 < 0.05)
    b0 = spark.createDataFrame(
        [(i, words(f"s{i}", 25), None) for i in range(4)],
        "doc_id long, text string, embedding array<float>",
    )
    bm0 = words("bm" + alpha(0), 30).split()
    gross = words("fil", 15) + " " + " ".join(bm0[:12])
    subth = words("big", 300) + " " + " ".join(bm0[:10])
    b1 = spark.createDataFrame(
        [
            (10, words("t10", 25), None),
            (11, gross, None),
            (12, subth, None),
        ],
        "doc_id long, text string, embedding array<float>",
    )
    cents = fit_codebook(
        spark.range(30).select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % 3).cast("double"),
                (F.col("id") % 5).cast("double"),
                F.lit(1.0),
            ).alias("embedding"),
        ),
        k=4,
        iters=1,
    ).localCheckpoint(eager=True)

    def run(tag, **kw):
        fn = make_full_cascade_ingest_batch_fn(
            spark,
            str(tmp_path / tag / "fp"),
            str(tmp_path / tag / "sig"),
            str(tmp_path / tag / "sem"),
            str(tmp_path / tag / "dec"),
            cents,
            threshold=0.8,
            **kw,
        )
        for i, b in enumerate([b0, b1]):
            fn(b, i)
        return _decisions(spark, str(tmp_path / tag / "dec"))

    plain = run("ct_off")
    decon = run("ct_on", benchmark_span_index=bench_idx, cont_threshold=0.05)
    assert set(decon) == set(plain)

    want_frac = {
        r["doc_id"]: r["cont_frac"]
        for r in span_contamination(bench_idx, b1.select("doc_id", "text")).collect()
    }
    r = decon[11]
    assert not r["admitted"] and r["tier"] == "contaminated"
    assert r["matched_id"] == -1 and r["score"] == want_frac[11] >= 0.05
    # sub-threshold hit and clean docs admit; all other verdicts identical
    assert 0 < want_frac[12] < 0.05
    for d in decon:
        if d != 11:
            assert (
                decon[d]["admitted"],
                decon[d]["tier"],
                decon[d]["matched_id"],
            ) == (plain[d]["admitted"], plain[d]["tier"], plain[d]["matched_id"])
    assert decon[12]["admitted"] and decon[10]["admitted"]

    # the contaminated doc is indexed NOWHERE (dup rejects' rule applies)
    for root in ("fp", "sig"):
        idx = _index_so_far(spark, str(tmp_path / "ct_on" / root))
        assert idx.where(F.col("doc_id") == 11).count() == 0
    # and the ops rollup surfaces the new outcome unchanged
    rep = {
        r["outcome"]: r
        for r in admission_report(spark, str(tmp_path / "ct_on" / "dec")).collect()
    }
    assert rep["contaminated"]["n_docs"] == 1
    assert rep["contaminated"]["min_score"] == want_frac[11]


def test_quality_gate_tier(spark, tmp_path):
    """Round-10 library-first: the opt-in QUALITY tier runs FIRST and its
    rejects are never indexed — pinned in both directions across
    batches: (a) a spam doc is rejected with tier 'quality', score =
    dup_frac, matched_id -1; (b) a LATER byte-identical copy of it is
    ALSO 'quality', never 'exact' (the original entered no index); (c) a
    later byte-identical copy of an ADMITTED doc is still 'exact'
    (the gate does not disturb the dedup tiers); (d) with
    quality_gate=False (default) the same batches admit the spam doc —
    the gate is strictly opt-in."""
    from mapreduce_framework_spark.pipeline.quality import quality_rejects
    from mapreduce_framework_spark.streaming.ingest import (
        delta_dir,
        make_cascade_ingest_batch_fn,
    )

    alpha = lambda i: chr(97 + (i // 26) % 26) + chr(97 + i % 26)  # noqa: E731

    def words(prefix, n, start=0):
        return " ".join(f"{prefix}{alpha(start + j)}" for j in range(n))

    spam = "spam " * 40
    clean = words("cl", 30)
    b0 = spark.createDataFrame(
        [(0, clean), (1, spam), (2, words("zz", 25))],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, spam), (11, clean), (12, words("yy", 25))],
        "doc_id long, text string",
    )

    def run(gate: bool, sub: str):
        root = str(tmp_path / sub)
        fn = make_cascade_ingest_batch_fn(
            spark,
            root + "/fp",
            root + "/sig",
            root + "/dec",
            threshold=0.8,
            quality_gate=gate,
        )
        fn(b0, 0)
        fn(b1, 1)
        return {
            r["doc_id"]: r
            for i in (0, 1)
            for r in spark.read.parquet(delta_dir(root + "/dec", i)).collect()
        }

    dec = run(True, "gated")
    # (a) spam rejected by the gate, with the library's own dup_frac
    want_frac = {
        r["doc_id"]: r["q_frac"]
        for r in quality_rejects(b0.unionByName(b1)).collect()
    }
    for sid in (1, 10):
        assert dec[sid]["tier"] == "quality" and not dec[sid]["admitted"]
        assert dec[sid]["matched_id"] == -1
        assert dec[sid]["jaccard"] == want_frac[sid]
    # (b) the batch-1 spam copy is 'quality', NOT 'exact': doc 1 was
    # never indexed, so there is nothing byte-identical in the corpus
    assert dec[10]["tier"] == "quality"
    # (c) the admitted clean doc's later copy still falls to the exact tier
    assert dec[11]["tier"] == "exact" and dec[11]["matched_id"] == 0
    # clean docs admit
    assert dec[0]["admitted"] and dec[2]["admitted"] and dec[12]["admitted"]

    # (d) default-off: the gate is opt-in — spam admits (and its batch-1
    # copy then falls to the exact tier like any other duplicate)
    off = run(False, "plain")
    assert off[1]["admitted"]
    assert off[10]["tier"] == "exact" and off[10]["matched_id"] == 1


@pytest.mark.slow  # r14 item 2: equality soak; decisions oracle-checked by the q94-q110 replays
def test_full_cascade_media_dup_tier(spark, tmp_path):
    """Round-11 library-first: the opt-in MULTIMODAL near-dup tier
    (phash_index_root → tier 'media_dup', between exact and MinHash).
    The planted retouch is the tier's raison d'être: a same-length
    1-char perturbation of an admitted doc sits at word-shingle
    J = 0.5 — INVISIBLE to the MinHash tier (threshold 0.8) — but at
    phash Hamming 0. Pinned in both directions plus the lifecycle
    invariants: (a) a byte-identical copy is still 'exact' (strict
    precedence — the cheaper tier wins); (b) the retouch is
    'media_dup', matched to the canonical original, score
    (32−hamming)/32 = 1.0; (c) a later byte-copy of the REJECTED
    retouch is ALSO 'media_dup' against the original (rejects are never
    indexed), while a byte-copy of an ADMITTED batch-1 doc is 'exact'
    against it (admits are); (d) NULL-text docs are invisible to the
    tier in both directions (admitted here; absent from the phash
    index — the family's no-pixels policy); (e) with the tier OFF
    (default) the identical batches admit the retouch — proving both
    the opt-in contract and that the lexical tiers genuinely cannot
    catch this reject class."""
    from pyspark.sql import Row

    from mapreduce_framework_spark.streaming.ingest import _index_so_far

    cents = spark.createDataFrame(
        [Row(cent_id=i, cent=[float(x) for x in v])
         for i, v in enumerate([[1.0, 0.0], [0.0, 1.0]])]
    )
    A = "alpha beta gamma delta epsilon"
    C = "red orange yellow green blue"
    R = "alpha beta gamma delta epsilom"  # same-length retouch: hamming 0
    Z = "zig zag zap zoom zest"  # hamming 13/15 from A/C: admits
    rows = {
        0: [(1, A), (2, C)],
        1: [(10, A), (11, R), (12, None), (13, Z)],
        2: [(20, R), (21, Z)],
    }
    dfs = [
        spark.createDataFrame(
            [Row(doc_id=i, text=t, embedding=None) for i, t in rows[b]],
            "doc_id bigint, text string, embedding array<double>",
        )
        for b in sorted(rows)
    ]

    ph_root = str(tmp_path / "fc_ph")
    roots, _ = _run_full_cascade(
        spark, tmp_path, dfs, cents, prefix="mdon", phash_index_root=ph_root
    )
    got = {
        d: (r["admitted"], r["tier"], r["matched_id"], r["score"])
        for d, r in _decisions(spark, roots["dec"]).items()
    }
    assert got == {
        1: (True, None, -1, 0.0),
        2: (True, None, -1, 0.0),
        10: (False, "exact", 1, 1.0),        # precedence over media_dup
        11: (False, "media_dup", 1, 1.0),    # J=0.5: lexical tiers blind
        12: (True, None, -1, 0.0),           # NULL text: no pixels
        13: (True, None, -1, 0.0),
        20: (False, "media_dup", 1, 1.0),    # 11 was never indexed
        21: (False, "exact", 13, 1.0),       # 13 was indexed
    }
    # the phash index holds exactly the admitted docs WITH pixels —
    # no rejects, no NULL-text doc 12
    ph_ids = {r["doc_id"] for r in _index_so_far(spark, ph_root).collect()}
    assert ph_ids == {1, 2, 13}

    # (e) default-off control on the identical batches
    roots_off, _ = _run_full_cascade(spark, tmp_path, dfs, cents, prefix="mdoff")
    off = {
        d: (r["admitted"], r["tier"], r["matched_id"])
        for d, r in _decisions(spark, roots_off["dec"]).items()
    }
    assert off[11] == (True, None, -1)          # lexical tiers blind to R
    assert off[20] == (False, "exact", 11)      # ...so R entered the index
    assert off[21] == (False, "exact", 13)
    assert "media_dup" not in {v[1] for v in off.values()}


def test_lexical_cascade_media_dup_tier(spark, tmp_path):
    """Round 12: the media_dup tier reaches TIER PARITY across both
    sinks (the quality-gate precedent) — make_cascade_ingest_batch_fn
    accepts phash_index_root with exactly the full cascade's semantics,
    so an embeddings-free deployment (or the full cascade's documented
    no-usable-centroid degradation, which routes through this sink in
    the q110 replay) keeps perceptual media dedup. Same plant matrix as
    test_full_cascade_media_dup_tier, minus the semantic tier:
    precedence (exact beats media_dup), the J=0.5 retouch invisible to
    MinHash but Hamming-0 to phash, rejects-never-indexed, NULL-text
    invisibility, and the default-off control."""
    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.streaming.ingest import (
        _index_so_far,
        make_cascade_ingest_batch_fn,
    )

    A = "alpha beta gamma delta epsilon"
    C = "red orange yellow green blue"
    R = "alpha beta gamma delta epsilom"  # same-length retouch: hamming 0
    Z = "zig zag zap zoom zest"
    rows = {
        0: [(1, A), (2, C)],
        1: [(10, A), (11, R), (12, None), (13, Z)],
        2: [(20, R), (21, Z)],
    }
    dfs = [
        spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in rows[b]],
            "doc_id bigint, text string",
        )
        for b in sorted(rows)
    ]

    def run(prefix, **kw):
        roots = {k: str(tmp_path / f"{prefix}_{k}") for k in ["fp", "sig", "dec"]}
        fn = make_cascade_ingest_batch_fn(
            spark, roots["fp"], roots["sig"], roots["dec"],
            JACCARD_THRESHOLD, **kw,
        )
        for i, df in enumerate(dfs):
            fn(df, i)
        return roots

    ph_root = str(tmp_path / "lx_ph")
    roots = run("lxon", phash_index_root=ph_root)
    got = {
        d: (r["admitted"], r["tier"], r["matched_id"], r["jaccard"])
        for d, r in _decisions(spark, roots["dec"]).items()
    }
    assert got == {
        1: (True, None, -1, 0.0),
        2: (True, None, -1, 0.0),
        10: (False, "exact", 1, 1.0),        # precedence over media_dup
        11: (False, "media_dup", 1, 1.0),    # J=0.5: MinHash tier blind
        12: (True, None, -1, 0.0),           # NULL text: no pixels
        13: (True, None, -1, 0.0),
        20: (False, "media_dup", 1, 1.0),    # 11 was never indexed
        21: (False, "exact", 13, 1.0),       # 13 was indexed
    }
    ph_ids = {r["doc_id"] for r in _index_so_far(spark, ph_root).collect()}
    assert ph_ids == {1, 2, 13}

    # default-off control on the identical batches
    off_roots = run("lxoff")
    off = {
        d: (r["admitted"], r["tier"], r["matched_id"])
        for d, r in _decisions(spark, off_roots["dec"]).items()
    }
    assert off[11] == (True, None, -1)
    assert off[20] == (False, "exact", 11)
    assert off[21] == (False, "exact", 13)
    assert "media_dup" not in {v[1] for v in off.values()}


def test_phash_index_config_stamp_and_width_mismatch_fails(spark, tmp_path):
    """Round 12: the phash index manifest carries the (cells, bands,
    threshold) fingerprint — the codebook-id playbook. A 32-cell index
    probed by a 64-cell sink (the SCALING.md width guidance) would
    silently match NOTHING, admitting every re-encoded copy; the sink
    must hard-fail BEFORE any decision commits instead. Also pinned: the
    stamp lands at first publish, an unstamped legacy manifest is
    accepted and re-stamped, and the fingerprint follows the module
    constants (a deployment override changes it for free)."""
    import mapreduce_framework_spark.pipeline.multimodal_dedup as md
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import (
        read_index_manifest,
        write_index_manifest,
    )
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
    )
    from pyspark.sql import Row

    def batch(ids_texts):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in ids_texts],
            "doc_id bigint, text string",
        )

    roots = {k: str(tmp_path / f"pcfg_{k}") for k in ["fp", "sig", "dec"]}
    ph_root = str(tmp_path / "pcfg_ph")
    fn = make_cascade_ingest_batch_fn(
        spark, roots["fp"], roots["sig"], roots["dec"],
        JACCARD_THRESHOLD, phash_index_root=ph_root,
    )
    fn(batch([(1, "alpha beta gamma delta epsilon")]), 0)
    # (a) the stamp landed at first publish with the module's fingerprint
    man = read_index_manifest(ph_root)
    assert man["phash_config"] == md.phash_fingerprint() == "ahash-32c-4b-h4"

    # (b) a sink at a different width hard-fails before committing
    fn(batch([(2, "red orange yellow green blue")]), 1)  # index now non-empty
    orig_cells, orig_bands = md.PHASH_CELLS, md.PHASH_BANDS
    md.PHASH_CELLS, md.PHASH_BANDS = 64, 8
    try:
        wide_fn = make_cascade_ingest_batch_fn(
            spark, roots["fp"], roots["sig"], roots["dec"],
            JACCARD_THRESHOLD, phash_index_root=ph_root,
        )
        with pytest.raises(ValueError, match="phash index.*built under config"):
            wide_fn(batch([(3, "zig zag zap zoom zest")]), 2)
    finally:
        md.PHASH_CELLS, md.PHASH_BANDS = orig_cells, orig_bands
    # nothing was committed for the failed batch on any root
    # (manifest deltas are [batch_id, dirname] pairs)
    for r in list(roots.values()) + [ph_root]:
        deltas = read_index_manifest(r).get("deltas", [])
        assert all(d[0] != 2 for d in deltas), (r, deltas)

    # (c) an unstamped legacy manifest is accepted and re-stamped — by a
    # FRESH correctly-configured sink (wide_fn's construction acquired
    # the roots, so the original fn is fenced — the usual takeover rule)
    man = read_index_manifest(ph_root)
    epoch = man.get("epoch")
    del man["phash_config"]
    write_index_manifest(ph_root, man, expected_epoch=epoch)
    fn2 = make_cascade_ingest_batch_fn(
        spark, roots["fp"], roots["sig"], roots["dec"],
        JACCARD_THRESHOLD, phash_index_root=ph_root,
    )
    fn2(batch([(4, "one more perfectly fine doc")]), 2)
    assert read_index_manifest(ph_root)["phash_config"] == md.phash_fingerprint()


@pytest.mark.parametrize("sink", ["lexical", "semantic"])
def test_phash_width_mismatch_fails_even_at_batch_zero(spark, tmp_path, sink):
    """Round-13 (round-12 ADVICE): the width check must run UNCONDITIONALLY
    at the top of apply_batch, not only once _index_so_far returns a loaded
    index. A sink restarted at batch 0 over an EXISTING never-compacted
    root sees no visible index (before_batch=0 covers nothing), and a
    load-gated check would let it publish a new-width delta into the
    old-width root and clobber the stamp with its own fingerprint — after
    which every later batch passes the check over a silently mixed-width
    index. Pinned here for BOTH sinks: the mismatched batch-0 delivery
    raises, publishes nothing, and leaves the original stamp intact
    (stamp-if-absent — _stamp_codebook's contract)."""
    import mapreduce_framework_spark.pipeline.multimodal_dedup as md
    from mapreduce_framework_spark.pipeline.codebook import fit_codebook
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        make_cascade_ingest_batch_fn,
        make_full_cascade_ingest_batch_fn,
    )
    from pyspark.sql import Row

    def batch(ids_texts):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in ids_texts],
            "doc_id bigint, text string",
        )

    def emb_batch(ids_texts):
        return spark.createDataFrame(
            [
                Row(doc_id=i, text=t, embedding=[float(i % 7), 1.0, 0.5, 2.0])
                for i, t in ids_texts
            ],
            "doc_id bigint, text string, embedding array<double>",
        )

    ph_root = str(tmp_path / "b0_ph")
    if sink == "lexical":
        roots = {k: str(tmp_path / f"b0_{k}") for k in ["fp", "sig", "dec"]}

        def mk():
            return make_cascade_ingest_batch_fn(
                spark, roots["fp"], roots["sig"], roots["dec"],
                JACCARD_THRESHOLD, phash_index_root=ph_root,
            ), batch
    else:
        roots = {
            k: str(tmp_path / f"b0_{k}") for k in ["fp", "sig", "sem", "dec"]
        }
        cents = fit_codebook(
            emb_batch([(90, "seed a"), (91, "seed b"), (92, "seed c")])
            .select("doc_id", "embedding")
            .withColumnRenamed("doc_id", "vec_id"),
            k=2,
        ).localCheckpoint(eager=True)

        def mk():
            return make_full_cascade_ingest_batch_fn(
                spark, roots["fp"], roots["sig"], roots["sem"], roots["dec"],
                cents, JACCARD_THRESHOLD, phash_index_root=ph_root,
            ), emb_batch

    fn, mkbatch = mk()
    fn(mkbatch([(1, "alpha beta gamma delta epsilon")]), 0)
    stamp = read_index_manifest(ph_root)["phash_config"]
    assert stamp == md.phash_fingerprint()
    deltas_before = read_index_manifest(ph_root).get("deltas", [])

    orig_cells, orig_bands = md.PHASH_CELLS, md.PHASH_BANDS
    md.PHASH_CELLS, md.PHASH_BANDS = 64, 8
    try:
        wide_fn, wide_mkbatch = mk()  # fresh sink, restarted at batch 0
        with pytest.raises(ValueError, match="phash index.*built under config"):
            wide_fn(wide_mkbatch([(2, "red orange yellow green blue")]), 0)
    finally:
        md.PHASH_CELLS, md.PHASH_BANDS = orig_cells, orig_bands
    man = read_index_manifest(ph_root)
    # the stamp was NOT clobbered and no new-width delta was published
    assert man["phash_config"] == stamp
    assert man.get("deltas", []) == deltas_before


def test_phash_width_is_a_sink_parameter(spark, tmp_path):
    """Round-13 (VERDICT r12 task 2): a deployment selects the 64-cell
    grid PER SINK via phash_cells=64 — no module edit, no monkeypatch.
    The SCALING.md birthday-mass lever end-to-end: the 64-width sink
    stamps 'ahash-64c-8b-h4' into the root's manifest, its media tier
    still catches a 1-char retouch of an indexed doc (tier 'media_dup',
    ph_sim scaled by 64), and a DEFAULT-width (32) sink pointed at the
    same root hard-fails at batch 0 — the width pairing is impossible to
    get silently wrong in either direction."""
    from mapreduce_framework_spark.pipeline.dedup import JACCARD_THRESHOLD
    from mapreduce_framework_spark.storage import read_index_manifest
    from mapreduce_framework_spark.streaming.ingest import (
        _index_so_far,
        make_cascade_ingest_batch_fn,
    )
    from pyspark.sql import Row

    base = (
        "The quick brown Fox jumps over the lazy dog 0123456789 while "
        "zebras graze on high TEXTURED plains under a violet sky!"
    )
    retouch = base[:40] + "Q" + base[41:]

    def batch(ids_texts):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in ids_texts],
            "doc_id bigint, text string",
        )

    roots = {k: str(tmp_path / f"w64_{k}") for k in ["fp", "sig", "dec"]}
    ph_root = str(tmp_path / "w64_ph")
    fn = make_cascade_ingest_batch_fn(
        spark, roots["fp"], roots["sig"], roots["dec"],
        JACCARD_THRESHOLD, phash_index_root=ph_root, phash_cells=64,
    )
    fn(batch([(1, base)]), 0)
    assert read_index_manifest(ph_root)["phash_config"] == "ahash-64c-8b-h4"

    fn(batch([(2, retouch), (3, base[::-1])]), 1)
    dec = {
        r["doc_id"]: (r["admitted"], r["tier"], r["matched_id"], r["jaccard"])
        for r in _index_so_far(spark, roots["dec"]).collect()
    }
    admitted, tier, matched, sim = dec[2]
    assert (admitted, tier, matched) == (False, "media_dup", 1)
    # ph_sim is (64 - hamming)/64 with hamming <= PHASH_HAMMING_MAX=4,
    # so it lands on a 1/64 lattice point at or above 60/64
    assert 60 / 64 <= sim <= 1.0 and float(sim * 64).is_integer()
    assert dec[3][0] is True  # the reversed doc is Hamming-far at 64 too

    # a default-width sink on the same root fails before committing,
    # even restarted at batch 0 (the unconditional check)
    narrow_fn = make_cascade_ingest_batch_fn(
        spark, roots["fp"], roots["sig"], roots["dec"],
        JACCARD_THRESHOLD, phash_index_root=ph_root,
    )
    with pytest.raises(ValueError, match="built under config ahash-64c-8b-h4"):
        narrow_fn(batch([(4, "whatever text")]), 0)

    # and a malformed pair fails at construction, before any batch
    with pytest.raises(ValueError, match="8 x bands"):
        make_cascade_ingest_batch_fn(
            spark, roots["fp"], roots["sig"], roots["dec"],
            JACCARD_THRESHOLD, phash_index_root=ph_root,
            phash_cells=64, phash_bands=4,
        )


def test_quality_decisions_invariant_under_batch_slicing(spark, tmp_path):
    """Round-11 (VERDICT r10 task 6): the quality tier is STATELESS —
    per-doc arithmetic, no index — so with the gate on, WHICH docs it
    rejects must not depend on how the stream is sliced into batches.
    The real sf0.001 corpus is delivered as 1, 2, and 5 batches through
    the gated cascade sink; the set of 'quality'-tier doc_ids must be
    identical in every slicing AND equal the library's own batch-free
    quality_rejects(corpus) answer (the ground truth the oracle CTE
    shares). This is the gate's composed-correctness guarantee: the
    net-cost probe (tools/scaling_probe.py --quality-net) can trade
    batch size freely without changing a single quality decision."""
    from pyspark.sql import functions as F

    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.quality import quality_rejects
    from mapreduce_framework_spark.streaming.ingest import (
        delta_dir,
        make_cascade_ingest_batch_fn,
    )

    base = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    docs = (
        table(spark, "documents", base)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    want = {r["doc_id"] for r in quality_rejects(docs).collect()}
    assert want, "corpus must straddle the thresholds or this proves nothing"

    for slices in (1, 2, 5):
        root = str(tmp_path / f"slice{slices}")
        fn = make_cascade_ingest_batch_fn(
            spark,
            root + "/fp",
            root + "/sig",
            root + "/dec",
            threshold=0.8,
            quality_gate=True,
        )
        per = -(-n // slices)
        ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
        for i in range(slices):
            lo = ids[i * per]
            hi = ids[min((i + 1) * per, n) - 1]
            fn(docs.where(F.col("doc_id").between(lo, hi)), i)
        got = {
            r["doc_id"]
            for i in range(slices)
            for r in spark.read.parquet(delta_dir(root + "/dec", i))
            .where("tier = 'quality'")
            .collect()
        }
        assert got == want, f"slicing into {slices} batches changed the gate"


def test_admission_report_covers_quality_and_contaminated_outcomes(spark, tmp_path):
    """The ops rollup over a FIVE-tier decisions log (round 10): the
    'quality' and 'contaminated' outcomes roll up alongside the dedup
    tiers with the same exact-decimal mean discipline — the report a
    100 TB five-tier ingest reads daily has six outcome rows, not four."""
    from mapreduce_framework_spark.streaming.ingest import admission_report_frame

    rows = [
        (1, True, -1, 0.0, None),
        (2, False, 1, 1.0, "exact"),
        (3, False, 1, 0.85, "near_dup"),
        (4, False, 1, 0.97, "semantic"),
        (5, False, -1, 0.2, "contaminated"),
        (6, False, -1, 0.75, "quality"),
        (7, False, -1, 0.65, "quality"),
    ]
    dec = spark.createDataFrame(
        rows, "doc_id long, admitted boolean, matched_id long, score double, tier string"
    )
    rep = {r["outcome"]: r for r in admission_report_frame(dec).collect()}
    assert set(rep) == {
        "admitted", "exact", "near_dup", "semantic", "contaminated", "quality",
    }
    assert rep["quality"]["n_docs"] == 2
    assert rep["quality"]["min_score"] == 0.65
    assert rep["quality"]["max_score"] == 0.75
    assert abs(rep["quality"]["avg_score"] - 0.7) < 1e-9
    assert abs(sum(r["share"] for r in rep.values()) - 1.0) < 1e-9
