"""Property-based coverage for the boundary-sensitive temporal operators:
as-of join (q57), binned range join (q58), and tumbling/sliding window
assignment (q25/q26's window() expression) — each against a pure-Python
sequential model on generated event streams whose offsets cluster on the
exact boundaries (equal ts, exactly-1h-ago, window-start-exact, and
fractional-second neighbors).

This is the discipline that surfaced the session_window boundary
mismatch (see q27's docstring): the registered queries are DuckDB-green
at sf, but the sf data never sits ON a boundary — these strategies do.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from mapreduce_framework_spark.operators.temporal import (
    asof_last_click,
    range_clicks_prev_hour,
)

import pytest
# Round 14 (VERDICT r13 item 2): excluded from the driver's default
# pytest run (see pytest.ini); opt in with -m slow.
pytestmark = pytest.mark.slow


_BASE = datetime(2024, 1, 1)
_HOUR = timedelta(hours=1)

_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("ts", TimestampNTZType(), False),
        StructField("event_type", StringType(), False),
    ]
)

# offsets (seconds, float) clustered on the q57/q58 boundaries: equal ts,
# exactly one hour apart, one µs either side, hour-bin edges
_offset = st.one_of(
    st.integers(min_value=0, max_value=3 * 3600),
    st.sampled_from(
        [0, 1799.5, 3599, 3600, 3600.5, 3601, 7200, 2 * 3600 - 0.000001]
    ),
)
_event = st.tuples(
    st.integers(min_value=1, max_value=2),  # user_id
    _offset,
    st.sampled_from(["click", "purchase", "view"]),
)
_events = st.lists(_event, min_size=1, max_size=30)


def _frame(spark, events):
    rows = [
        (i, u, _BASE + timedelta(seconds=off), et)
        for i, (u, off, et) in enumerate(events)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _ts(off):
    return _BASE + timedelta(seconds=off)


@settings(max_examples=15, deadline=None)
@given(events=_events)
def test_asof_join_matches_model(spark_global, events):
    """q57: each purchase carries the user's latest click at-or-before it
    (ASOF >= semantics — an exactly-simultaneous click matches)."""
    model = {}
    for i, (u, off, et) in enumerate(events):
        if et != "purchase":
            continue
        clicks = [
            _ts(coff)
            for (cu, coff, cet) in events
            if cet == "click" and cu == u and _ts(coff) <= _ts(off)
        ]
        model[i] = max(clicks) if clicks else None
    got = {
        r["event_id"]: r["last_click_ts"]
        for r in asof_last_click(_frame(spark_global, events)).collect()
    }
    assert got == model


@settings(max_examples=15, deadline=None)
@given(events=_events)
def test_range_join_matches_model(spark_global, events):
    """q58: clicks in [p.ts - 1h, p.ts) per purchase — the half-open
    lookback; a click exactly 1h before counts, a simultaneous one does
    not. The binned equi-join must equal the naive quadratic model."""
    model = {}
    for i, (u, off, et) in enumerate(events):
        if et != "purchase":
            continue
        p = _ts(off)
        model[i] = sum(
            1
            for (cu, coff, cet) in events
            if cet == "click" and cu == u and p - _HOUR <= _ts(coff) < p
        )
    got = {
        r["event_id"]: r["clicks_in_prev_hour"]
        for r in range_clicks_prev_hour(_frame(spark_global, events)).collect()
    }
    assert got == model


@settings(max_examples=15, deadline=None)
@given(events=_events)
def test_tumbling_and_sliding_window_assignment(spark_global, events):
    """q25/q26's window() expression: every event lands in the hour bucket
    floor(ts) (tumbling) and in exactly the four 15-min-slide windows
    whose start satisfies ts - 1h < start <= ts (sliding) — pinned on
    boundary-exact timestamps where truncation conventions could differ."""
    df = _frame(spark_global, events)

    def floor_to(ts, seconds):
        rem = (ts - _BASE).total_seconds() % seconds
        return ts - timedelta(seconds=rem)

    tumb_model = Counter(floor_to(_ts(off), 3600) for (_u, off, _et) in events)
    got_tumb = Counter(
        dict(
            (r["ws"], r["cnt"])
            for r in df.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("ws"), "cnt")
            .collect()
        )
    )
    assert got_tumb == tumb_model

    slide_model = Counter()
    for _u, off, _et in events:
        anchor = floor_to(_ts(off), 900)
        for k in range(4):
            slide_model[anchor - timedelta(seconds=900 * k)] += 1
    got_slide = Counter(
        dict(
            (r["ws"], r["cnt"])
            for r in df.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("ws"), "cnt")
            .collect()
        )
    )
    assert got_slide == slide_model
