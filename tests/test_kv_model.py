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
    """The JVM-side array fold (q06, the production path), the REGISTERED
    interpreted fold (q28 — since round 9 the bounded-memory mapInPandas
    form), and the retained applyInPandas twin (the pre-swap registered
    builder) must all stay result-identical — three engines, one KV
    replay semantics. The registered q28 plan must be the post-swap shape
    (MapInPandas, no per-group FlatMapGroups — the perf-weak cliff the
    swap cleared). The driver rotation must also keep q06 ahead of q28 so
    the KV family's flagship evidence is always the scalable form."""
    from mapreduce_framework_spark.operators.kv import (
        q06_kv_final_state,
        q28_kv_stateful_replay,
        q28_kv_stateful_replay_grouped,
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
    c = {
        (r["key"], r["value"])
        for r in q28_kv_stateful_replay_grouped(spark_global, sf_dir).collect()
    }
    assert a == b == c
    assert len(a) > 0
    df = q28_kv_stateful_replay(spark_global, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" not in plan
    assert CURATED_ORDER.index("q06_kv_final_state") < CURATED_ORDER.index(
        "q28_kv_stateful_replay"
    )


def test_streaming_fold_matches_per_group_fold(spark_global, sf_dir):
    """The bounded-memory mapInPandas fold (fold_kv_history_streaming —
    the round-8 scale fix for q28's per-key applyInPandas cliff) is
    result-identical to both engine forms on the sf corpus, and its plan
    is the streaming shape (MapInPandas after one key repartition, no
    per-group FlatMapGroups)."""
    from mapreduce_framework_spark.deploy import ensure_package_on_executors
    from mapreduce_framework_spark.operators.kv import (
        fold_kv_history_streaming,
        kv_ops,
        q06_kv_final_state,
    )

    ensure_package_on_executors(spark_global)
    got = {
        (r["key"], r["value"])
        for r in fold_kv_history_streaming(kv_ops(spark_global, sf_dir)).collect()
    }
    want = {
        (r["key"], r["value"])
        for r in q06_kv_final_state(spark_global, sf_dir).collect()
    }
    assert got == want and len(got) > 0
    df = fold_kv_history_streaming(kv_ops(spark_global, sf_dir))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_streaming_fold_carries_state_across_arrow_batches(spark_global):
    """The cliff case itself: ONE hot key whose history spans many Arrow
    batches (maxRecordsPerBatch forced to 64 against a 5000-op history).
    The applyInPandas form materializes all 5000 rows as one pandas
    group; the streaming fold must reproduce the same value while seeing
    the key only in 64-row slices — proving the cross-batch state carry
    that makes its memory O(batch), not O(history)."""
    import datetime as dt2

    from mapreduce_framework_spark.deploy import ensure_package_on_executors
    from mapreduce_framework_spark.operators.kv import fold_kv_history_streaming

    ensure_package_on_executors(spark_global)
    n = 5000
    ops = [("hot", "put", "S")] + [("hot", "append", str(i % 10)) for i in range(n)]
    ops += [("cold1", "put", "a"), ("cold2", "append", "bb")]
    rows = [
        (
            dt2.datetime(2024, 1, 1) + dt2.timedelta(seconds=i),
            i,
            key,
            op,
            value,
        )
        for i, (key, op, value) in enumerate(ops)
    ]
    df = spark_global.createDataFrame(
        rows, schema="ts timestamp, event_id long, key string, op string, value string"
    )
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark_global.conf.get(conf)
    try:
        spark_global.conf.set(conf, "64")
        got = {
            r["key"]: r["value"] for r in fold_kv_history_streaming(df).collect()
        }
    finally:
        spark_global.conf.set(conf, old)
    assert got["hot"] == "S" + "".join(str(i % 10) for i in range(n))
    assert got["cold1"] == "a" and got["cold2"] == "bb"
    assert set(got) == {"hot", "cold1", "cold2"}


def test_streaming_fold_keeps_null_key_group(spark_global):
    """NULL-KEY POLICY (round-10 ADVICE): a NULL key is a group like any
    other. The old `cur = None` sentinel made the first NULL-key row
    compare equal to "no group yet", so a NULL group that sorted FIRST in
    a partition (Spark sorts NULLs first ascending) was folded but never
    emitted. All three engines — the JVM array fold, the applyInPandas
    twin, and the bounded-memory streaming fold — must keep it, and the
    streaming fold must emit it even when the NULL history spans multiple
    Arrow batches."""
    import datetime as dt2

    from mapreduce_framework_spark.deploy import ensure_package_on_executors
    from mapreduce_framework_spark.operators.kv import fold_kv_history_streaming

    ensure_package_on_executors(spark_global)
    ops = [(None, "put", "N"), (None, "append", "1"), (None, "append", "2")]
    ops += [("a", "put", "A"), ("b", "append", "B")]
    ops += [(None, "append", "3")]
    rows = [
        (
            dt2.datetime(2024, 1, 1) + dt2.timedelta(seconds=i),
            i,
            key,
            op,
            value,
        )
        for i, (key, op, value) in enumerate(ops)
    ]
    df = spark_global.createDataFrame(
        rows, schema="ts timestamp, event_id long, key string, op string, value string"
    )
    want = {None: "N123", "a": "A", "b": "B"}
    got_jvm = {r["key"]: r["value"] for r in _fold_spark(df).collect()}
    assert got_jvm == want
    got_stream = {
        r["key"]: r["value"] for r in fold_kv_history_streaming(df).collect()
    }
    assert got_stream == want
    # the cliff shape too: NULL group spanning Arrow batches
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark_global.conf.get(conf)
    many = [(None, "put", "S")] + [(None, "append", str(i % 10)) for i in range(300)]
    many += [("z", "put", "Z")]
    rows2 = [
        (
            dt2.datetime(2024, 1, 1) + dt2.timedelta(seconds=i),
            i,
            key,
            op,
            value,
        )
        for i, (key, op, value) in enumerate(many)
    ]
    df2 = spark_global.createDataFrame(
        rows2, schema="ts timestamp, event_id long, key string, op string, value string"
    )
    try:
        spark_global.conf.set(conf, "64")
        got2 = {
            r["key"]: r["value"] for r in fold_kv_history_streaming(df2).collect()
        }
    finally:
        spark_global.conf.set(conf, old)
    assert got2 == {
        None: "S" + "".join(str(i % 10) for i in range(300)),
        "z": "Z",
    }


def test_fold_sql_oracle_keeps_null_key_group(spark_global):
    """The q06/q28/q83 oracle's w↔lp self-join is null-safe (IS NOT
    DISTINCT FROM) so DuckDB keeps the NULL-key group exactly as Spark's
    groupBy does — proven by running the oracle's fold CTE shape over an
    op log with a NULL key and comparing to the Spark fold."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE ops_null (ts TIMESTAMP, event_id BIGINT, key VARCHAR,
                               op VARCHAR, value VARCHAR);
        INSERT INTO ops_null VALUES
          ('2024-01-01 00:00:00', 0, NULL, 'put', 'N'),
          ('2024-01-01 00:00:01', 1, NULL, 'append', '1'),
          ('2024-01-01 00:00:02', 2, 'a', 'put', 'A'),
          ('2024-01-01 00:00:03', 3, NULL, 'append', '2');
        """
    )
    sql = """
    WITH w AS (
      SELECT key, op, value,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, event_id) AS ord
      FROM ops_null WHERE op <> 'get'
    ),
    lp AS (
      SELECT key, MAX(CASE WHEN op = 'put' THEN ord ELSE 0 END) AS last_put
      FROM w GROUP BY key
    )
    SELECT w.key,
           COALESCE(string_agg(value, '' ORDER BY ord)
                    FILTER (WHERE (op = 'put' AND ord = lp.last_put)
                               OR (op = 'append' AND ord > lp.last_put)), '') AS value
    FROM w JOIN lp ON w.key IS NOT DISTINCT FROM lp.key
    GROUP BY w.key ORDER BY w.key
    """
    got = {k: v for k, v in con.execute(sql).fetchall()}
    assert got == {None: "N12", "a": "A"}
