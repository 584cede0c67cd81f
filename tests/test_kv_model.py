"""Porcupine-style model checking for the KV fold (reference test strategy
#5, SURVEY §5): the reference checks histories against the sequential model
``src/models/kv.go:40-54`` (get→state, put→assign, append→concat). Here the
linearization order is explicit (ts, event_id), so checking reduces to:
the distributed DataFrame fold must equal the sequential Python model on
arbitrary op histories — which hypothesis generates."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_framework_spark.operators.kv import _fold_spark

KEYS = ["a1", "b2", "c3"]

ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["put", "append", "get"]),
        st.text(alphabet="xyz", min_size=0, max_size=3),
    ),
    min_size=1,
    max_size=25,
)


def model_fold(ops):
    """The reference KV model (src/models/kv.go:40-54), sequentially."""
    state: dict[str, str] = {}
    touched: set[str] = set()
    for key, op, value in ops:
        if op == "put":
            state[key] = value
            touched.add(key)
        elif op == "append":
            state[key] = state.get(key, "") + value
            touched.add(key)
    return {k: state.get(k, "") for k in touched}


@settings(max_examples=25, deadline=None)
@given(ops=ops_strategy)
def test_dataframe_fold_matches_sequential_model(spark_global, ops):
    rows = [
        (
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
            i,
            key,
            op,
            "" if op == "get" else value,
        )
        for i, (key, op, value) in enumerate(ops)
    ]
    df = spark_global.createDataFrame(
        rows, schema="ts timestamp, event_id long, key string, op string, value string"
    )
    got = {r["key"]: r["value"] for r in _fold_spark(df).collect()}
    assert got == model_fold(ops)


def test_q06_q28_fold_parity_and_flagship_order(spark_global, sf_dir):
    """The JVM-side array fold (q06, the production path) and the
    demonstrative per-group Python fold (q28) must stay result-identical —
    they implement the same KV replay semantics through different engines.
    The driver rotation must also keep q06 ahead of q28 so the KV family's
    flagship evidence is always the scalable form."""
    from mapreduce_framework_spark.operators.kv import (
        q06_kv_final_state,
        q28_kv_stateful_replay,
    )
    from mapreduce_framework_spark.registry import CURATED_ORDER

    a = {
        (r["key"], r["value"])
        for r in q06_kv_final_state(spark_global, sf_dir).collect()
    }
    b = {
        (r["key"], r["value"])
        for r in q28_kv_stateful_replay(spark_global, sf_dir).collect()
    }
    assert a == b
    assert len(a) > 0
    assert CURATED_ORDER.index("q06_kv_final_state") < CURATED_ORDER.index(
        "q28_kv_stateful_replay"
    )
