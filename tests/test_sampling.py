"""Contract tests for the corpus-shaping operators — properties beyond
what the value-level oracle comparison pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.pipeline.sampling import (
    SEQ_LEN,
    pack_sequences,
    stratified_sample,
)


def test_stratified_sample_is_subset_invariant(spark, sf_dir):
    """The documented reproducibility contract: sampling a grown corpus
    keeps exactly the prior decisions for old docs — i.e. sample(subset)
    == sample(superset) restricted to the subset. This is what lets an
    incremental pipeline re-run the sampler without churning the mix."""
    docs = table(spark, "documents", sf_dir)
    subset = docs.where(F.col("doc_id") < 250)

    full_kept = {
        r["doc_id"]
        for r in stratified_sample(docs).select("doc_id").collect()
    }
    subset_kept = {
        r["doc_id"]
        for r in stratified_sample(subset).select("doc_id").collect()
    }
    assert subset_kept == {i for i in full_kept if i < 250}
    assert subset_kept  # non-vacuous


def test_pack_sequences_running_offsets(spark):
    """Packing invariants on a hand-built frame with edge cases (zero-token
    doc, doc larger than the budget): start_tok is the per-source running
    sum of prior docs in doc_id order, and seq_id = start_tok div SEQ_LEN."""
    rows = [
        # source A: 100 + 50 tokens cross the 128 boundary mid-doc2
        (1, "A", 100),
        (2, "A", 50),
        (3, "A", 0),    # zero-token doc: same offset as its successor
        (4, "A", 300),  # bigger than the budget: starts in its bin anyway
        (5, "A", 10),
        # source B packs independently of A
        (6, "B", 128),
        (7, "B", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_tokens LONG")
    got = {
        r["doc_id"]: (r["start_tok"], r["seq_id"])
        for r in pack_sequences(df).collect()
    }
    expected = {}
    offsets: dict[str, int] = {}
    for doc_id, source, n in rows:
        start = offsets.get(source, 0)
        expected[doc_id] = (start, start // SEQ_LEN)
        offsets[source] = start + n
    assert got == expected
