"""Custom stateful streaming operator: the KV fold as keyed state.

Reproduces the reference KV-store semantics (Get/Put/Append linearizable
per-key fold, src/models/kv.go:40-54) as an ``applyInPandasWithState``
operator: state = the current string value per key; each micro-batch folds
its ops (sorted by the linearization order) into the state. This is the
streaming twin of q28 (operators/kv.py), sharing its fold logic.

At scale: state lives in the state store partitioned by key — no global
ordering is required because the fold is per-key, matching how the
reference's shard groups own disjoint key ranges (src/shardkv/client.go).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)
STATE_SCHEMA = StructType([StructField("value", StringType())])


def kv_fold_with_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from mapreduce_framework_spark.operators.kv import fold_ops

    (k,) = key
    current = state.get[0] if state.exists else ""
    for pdf in pdfs:
        current = fold_ops(current, pdf)
    state.update((current,))
    yield pd.DataFrame({"key": [k], "value": [current]})


def streaming_kv_state(ops_stream: DataFrame) -> DataFrame:
    """ops stream (ts, event_id, key, op, value) → per-key folded state."""
    return ops_stream.groupBy("key").applyInPandasWithState(
        kv_fold_with_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
