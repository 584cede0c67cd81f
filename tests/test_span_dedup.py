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


# --- property-based: Spark result == sequential model on arbitrary corpora ---

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st


def _model_span_dedup(docs: dict[int, str]):
    """Pure-Python sequential model of span_dedup's contract."""
    first: dict[str, tuple[int, int]] = {}
    insts: list[tuple[int, int, str]] = []
    for doc_id in sorted(docs):
        toks = [w for w in re.split("[^a-zA-Z]+", docs[doc_id]) if w]
        blocks = [" ".join(toks[i : i + SPAN_W]) for i in range(0, len(toks), SPAN_W)]
        for pos, b in enumerate(blocks, 1):
            insts.append((doc_id, pos, b))
            if b not in first or (doc_id, pos) < first[b]:
                first[b] = (doc_id, pos)
    kept: dict[int, list[tuple[int, str]]] = {d: [] for d in docs}
    total: dict[int, int] = {d: 0 for d in docs}
    for doc_id, pos, b in insts:
        total[doc_id] += 1
        if first[b] == (doc_id, pos):
            kept[doc_id].append((pos, b))
    out = {}
    for d in docs:
        clean = " ".join(b for _, b in sorted(kept[d]))
        out[d] = (total[d], len(kept[d]), hashlib.md5(clean.encode()).hexdigest())
    return out


# tiny alphabet so cross-doc block collisions actually happen
_token = st.sampled_from(["aa", "bb"])
_doc_text = st.lists(_token, min_size=0, max_size=3 * SPAN_W + 5).map(" ".join)
_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=50), _doc_text, min_size=1, max_size=6
)


@settings(max_examples=15, deadline=None)
@given(docs=_corpus)
def test_matches_sequential_model(spark_global, docs):
    df = spark_global.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["clean_fp"])
        for r in span_dedup(df).collect()
    }
    assert got == _model_span_dedup(docs)
