"""Span-level (C4-style) dedup — pipeline/span_dedup.py.

Library-first coverage for q101 (round-5 registry slot; the round-4 driver
window is full — registry.py capacity note): the same differential DuckDB
comparison registered queries get, plus semantic invariants and the plan
shape that must hold at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_framework_spark.pipeline.span_dedup import (
    Q101_ORACLE,
    SPAN_W,
    q101_span_dedup,
    span_blocks,
    span_dedup,
)
from tests.oracle import compare


def test_q101_matches_duckdb_oracle(spark, sf_dir):
    compare(q101_span_dedup(spark, sf_dir), Q101_ORACLE, sf_dir)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_keep_first_semantics(spark):
    """A span repeated across docs survives only at its first (doc_id, pos)
    occurrence; unique spans always survive."""
    shared = " ".join(f"w{chr(97 + i)}" for i in range(SPAN_W))  # one block
    uniq_a = " ".join(f"a{chr(97 + i)}" for i in range(SPAN_W))
    uniq_b = " ".join(f"b{chr(97 + i)}" for i in range(SPAN_W))
    docs = _docs(
        spark,
        [
            (1, f"{shared} {uniq_a}"),  # first occurrence of `shared` -> kept
            (2, f"{uniq_b} {shared}"),  # later occurrence -> dropped
        ],
    )
    out = {r["doc_id"]: r for r in span_dedup(docs).collect()}
    assert out[1]["n_blocks"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_blocks"] == 2 and out[2]["n_kept"] == 1


def test_intra_doc_repeats_dropped(spark):
    """The same span twice in ONE doc keeps only the earlier position."""
    block = " ".join(f"x{chr(97 + i)}" for i in range(SPAN_W))
    docs = _docs(spark, [(7, f"{block} {block}")])
    (row,) = span_dedup(docs).collect()
    assert row["n_blocks"] == 2 and row["n_kept"] == 1


def test_empty_and_short_docs(spark):
    """Empty docs => 0 blocks, md5('') fingerprint; a doc shorter than
    SPAN_W forms one (short) block."""
    import hashlib

    docs = _docs(spark, [(1, ""), (2, "only three words")])
    out = {r["doc_id"]: r for r in span_dedup(docs).collect()}
    assert out[1]["n_blocks"] == 0 and out[1]["n_kept"] == 0
    assert out[1]["clean_fp"] == hashlib.md5(b"").hexdigest()
    assert out[2]["n_blocks"] == 1 and out[2]["n_kept"] == 1
    assert out[2]["clean_fp"] == hashlib.md5(b"only three words").hexdigest()


def test_block_positions_cover_doc(spark):
    """Blocks tile the token stream: ceil(n/W) blocks, every token in
    exactly one block, reassembly of ALL blocks reproduces the doc."""
    # letters only: the corpus tokenizer strips non-alpha chars
    text = " ".join(f"t{chr(97 + i % 26)}{chr(97 + i // 26)}" for i in range(SPAN_W * 3 + 4))
    docs = _docs(spark, [(1, text)])
    rows = sorted(span_blocks(docs).collect(), key=lambda r: r["pos"])
    assert [r["pos"] for r in rows] == [1, 2, 3, 4]
    assert " ".join(r["block"] for r in rows) == text


def test_plan_shape_scale_safe(spark, sf_dir):
    """No cartesian/broadcast-nested-loop anywhere; keep-first is a
    partial-aggregatable min (HashAggregate), not a window sort."""
    plan = q101_span_dedup(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan  # the skew-resistant agg+join form
    assert "HashAggregate" in plan
