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


def test_chunking_edge_cases_cover_every_token(spark):
    """chunk_documents invariants on boundary lengths (n = 1, stride,
    chunk-1, chunk, chunk+1, chunk+stride, 2*chunk, 2*chunk+1): every
    token position is covered by at least one chunk, no chunk exceeds the
    window, consecutive chunks overlap by exactly chunk−stride tokens
    (except a short final window), and chunk 0 always starts at token 0."""
    from mapreduce_framework_spark.pipeline.sampling import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    lengths = [
        1,
        CHUNK_STRIDE,
        CHUNK_TOKENS - 1,
        CHUNK_TOKENS,
        CHUNK_TOKENS + 1,
        CHUNK_TOKENS + CHUNK_STRIDE,
        2 * CHUNK_TOKENS,
        2 * CHUNK_TOKENS + 1,
    ]
    rows = [
        (i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lengths)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = chunk_documents(docs).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(lengths):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # expected chunk count (integer ceil rule)
        want = 1 if n <= CHUNK_TOKENS else 1 + -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE)
        assert len(chunks) == want, (n, len(chunks), want)
        # windows: chunk k covers [k*stride, min(k*stride+chunk, n))
        covered = set()
        for r in chunks:
            start = r["chunk_idx"] * CHUNK_STRIDE
            expect_len = min(CHUNK_TOKENS, n - start)
            assert r["n_toks"] == expect_len, (n, r["chunk_idx"])
            covered.update(range(start, start + r["n_toks"]))
        assert covered == set(range(n)), f"doc len {n}: gaps in coverage"


# --- property-based: chunking == sequential model on arbitrary corpora ------

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mapreduce_framework_spark.pipeline.sampling import chunk_documents


def _model_chunks(docs: dict[int, str], chunk: int, stride: int):
    out = {}
    for d, text in docs.items():
        toks = [w for w in re.split("[^a-zA-Z]+", text) if w]
        if len(toks) <= chunk:
            n = 1
        else:
            n = 1 + -(-(len(toks) - chunk) // stride)  # int ceil
        for i in range(n):
            piece = toks[i * stride : i * stride + chunk]
            out[(d, i)] = (
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
    return out


# doc lengths straddle every boundary: empty, == chunk, chunk+1,
# multiple-of-stride, off-by-one around the last-window cut
_word = st.sampled_from(["aa", "bb", "cc"])
_n_toks = st.one_of(
    st.integers(min_value=0, max_value=20),
    st.sampled_from([7, 8, 9, 15, 16, 17, 23, 24, 25]),
)
_doc_text = _n_toks.flatmap(
    lambda n: st.lists(_word, min_size=n, max_size=n).map(" ".join)
)
_chunk_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=30), _doc_text, min_size=1, max_size=5
)


@settings(max_examples=15, deadline=None)
@given(docs=_chunk_corpus)
def test_chunking_matches_sequential_model(spark_global, docs):
    """q100's transform on arbitrary docs (chunk=8, stride=4 so the tiny
    generated docs exercise the multi-window path): window count, final
    short window, and the content fingerprint all equal the model."""
    df = spark_global.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_toks"], r["chunk_fp"])
        for r in chunk_documents(df, chunk=8, stride=4).collect()
    }
    assert got == _model_chunks(docs, chunk=8, stride=4)


# --- decontaminated training corpus (round 7) --------------------------------


def test_training_corpus_decontaminated_matches_duckdb(spark, sf_dir):
    """VERDICT r6 item 2 gate: the 5-stage composition (dedup →
    span-decontaminate → quality → sample → pack) against a 2-corpus
    DuckDB model. The corpus is split by hash into TRAIN (doc_id % 17
    != 0) and BENCH (% 17 == 0); the Spark side builds the persisted
    span_index artifact from BENCH and feeds it to training_corpus; the
    oracle re-derives every stage in SQL with `documents` rebound to the
    train split. Registered-query-grade: exact cell equality."""
    import os as _os

    import duckdb

    from mapreduce_framework_spark.pipeline.sampling import training_corpus
    from mapreduce_framework_spark.pipeline.span_dedup import (
        EXSUB_W,
        _sliding_duck,
        span_index,
    )
    from mapreduce_framework_spark.pipeline.sampling import (
        MIN_TOKENS,
        SEQ_LEN,
        _PACK_START_DUCK,
        _RATE_CASE_SQL,
        _SALT,
    )
    from mapreduce_framework_spark.pipeline.dedup import (
        TOKS_DUCK,
        _DROP_LIST_DUCK,
        _fnv_duck,
    )

    docs = table(spark, "documents", sf_dir)
    train = docs.where(F.col("doc_id") % 17 != 0)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    got = sorted(
        tuple(r)
        for r in training_corpus(train, benchmark_index=span_index(bench)).collect()
    )

    W = EXSUB_W
    sl = _sliding_duck(W)
    con = duckdb.connect()
    path = _os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW alldocs AS SELECT * FROM read_parquet('{path}')")
    con.execute("CREATE VIEW documents AS SELECT * FROM alldocs WHERE doc_id % 17 <> 0")
    con.execute("CREATE VIEW bench AS SELECT * FROM alldocs WHERE doc_id % 17 = 0")
    sql = f"""
    WITH RECURSIVE
    {_DROP_LIST_DUCK},
    kept AS (
      SELECT * FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM drop_list)
    ),
    bt AS (SELECT doc_id, {TOKS_DUCK} AS toks FROM bench),
    bref AS (
      SELECT DISTINCT md5(s) AS sh FROM (SELECT unnest({sl}) AS s FROM bt)
    ),
    kt AS (SELECT doc_id, lang, source, {TOKS_DUCK} AS toks FROM kept),
    kraw AS (
      SELECT doc_id, unnest({sl}) AS s,
             unnest(range(1, len({sl}) + 1)) AS pos
      FROM kt
    ),
    hits AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM kraw
      WHERE md5(s) IN (SELECT sh FROM bref)
    ),
    covered AS (
      SELECT DISTINCT doc_id, CAST(unnest(range(pos, pos + {W})) AS BIGINT) AS tpos
      FROM hits
    ),
    tok_rows AS (
      SELECT doc_id, unnest(toks) AS tok,
             CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS tpos
      FROM kt
    ),
    clean AS (
      SELECT doc_id, array_to_string(list(tok ORDER BY tpos), ' ') AS text
      FROM tok_rows ANTI JOIN covered USING (doc_id, tpos)
      GROUP BY doc_id
    ),
    dk AS (
      SELECT k.doc_id, k.lang, k.source, coalesce(c.text, '') AS text
      FROM kept k LEFT JOIN clean c USING (doc_id)
    ),
    q AS (
      SELECT doc_id, lang, source,
             CAST(len({TOKS_DUCK}) AS BIGINT) AS n_tokens,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM dk
    ),
    f AS (
      SELECT * FROM q
      WHERE n_tokens >= {MIN_TOKENS} AND 10 * n_punct <= 3 * n_chars
        AND {_fnv_duck(f"concat({_SALT}, CAST(doc_id AS VARCHAR))")} % 100 < {_RATE_CASE_SQL}
    ),
    c AS (
      SELECT doc_id, lang, source, n_tokens, {_PACK_START_DUCK} AS start_tok
      FROM f
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(start_tok // {SEQ_LEN} AS BIGINT) AS seq_id
    FROM c ORDER BY doc_id
    """
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert len(got) == len(want) and got == want
    # the decontamination stage actually bit: at least one train doc lost
    # tokens vs the undecontaminated composition (sanity that the 2-corpus
    # split produced real overlap; the synthetic corpus has planted dups)
    plain = sorted(tuple(r) for r in training_corpus(train).collect())
    assert plain != got
