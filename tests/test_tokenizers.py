"""Pluggable tokenizer seam — functions/tokenizers.py and the Spark
plumbing in token_stats / chunk_documents / token_counts.

The default (regex) paths stay oracle-checked by the registered queries
(q42/q79/q100 — unchanged oracles); this file pins the seam itself:
training determinism, the GPT-2 greedy-encode contract, Spark/sequential
agreement through the Arrow boundary, and (env-gated) that a REAL
tokenizer (tiktoken) drops into the same seams.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_framework_spark.functions.tokenizers import (
    PRETOKEN_RE,
    BpeTokenizer,
    train_bpe,
)

_text = st.text(
    alphabet=st.sampled_from(list("ab1 .! \t")), min_size=0, max_size=40
)


def test_train_is_deterministic_with_hand_checked_merges():
    texts = ["aa aa ab"]
    tok = train_bpe(texts, 4)
    assert tok.merges == train_bpe(texts, 4).merges
    # round 1: ('a','a') count 2 beats ('a','b') count 1; round 2 merges
    # the remaining ('a','b'); nothing mergeable after that
    assert tok.merges == [("a", "a"), ("a", "b")]
    assert tok.encode("aab") == ["aa", "b"]
    assert tok.encode("ab") == ["ab"]


def test_tie_break_is_lexicographic():
    # ('a','b') and ('c','d') both occur once: the smaller pair wins
    tok = train_bpe(["ab cd"], 1)
    assert tok.merges == [("a", "b")]


@settings(max_examples=100, deadline=None)
@given(t=_text)
def test_encode_is_lossless_within_pretokens(t):
    tok = train_bpe([t, "some shared text 123!"], 8)
    assert "".join(tok.encode(t)) == "".join(PRETOKEN_RE.findall(t))


@settings(max_examples=50, deadline=None)
@given(t=_text)
def test_more_merges_never_increase_token_count(t):
    corpus = [t, "aa ab ba bb 11 12"]
    counts = [len(train_bpe(corpus, n).encode(t)) for n in (0, 2, 8, 32)]
    assert counts == sorted(counts, reverse=True)
    # zero merges degenerate to the char split of the pre-tokens
    assert len(train_bpe(corpus, 0).encode(t)) == sum(
        len(p) for p in PRETOKEN_RE.findall(t)
    )


def test_tokenizer_pickle_roundtrip():
    import pickle

    tok = train_bpe(["round trip trip"], 6)
    back = pickle.loads(pickle.dumps(tok))
    assert back.merges == tok.merges
    assert back.encode("triple trip") == tok.encode("triple trip")


def test_tokenizer_save_load_roundtrip(tmp_path):
    """The artifact lifecycle: train once, persist the merge table as
    inspectable JSON, load in a later job — identical encoding."""
    tok = train_bpe(["persist the table table"], 8, name="v1")
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    back = BpeTokenizer.load(p)
    assert back.name == "v1" and back.merges == tok.merges
    assert back.encode("portable table") == tok.encode("portable table")


# --- Spark seams ------------------------------------------------------------


def _sample_texts(spark, sf_dir, n=60):
    from mapreduce_framework_spark.catalog import table

    return [
        r["text"]
        for r in table(spark, "documents", sf_dir).orderBy("doc_id").limit(n).collect()
    ]


def test_token_stats_real_tokens_matches_driver_side(spark, sf_dir):
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.text_analysis import token_stats

    docs = table(spark, "documents", sf_dir).orderBy("doc_id").limit(100)
    tok = train_bpe(_sample_texts(spark, sf_dir), 64)
    out = token_stats(docs, tokenizer=tok)
    assert "real_tokens" in out.columns
    got = {r["doc_id"]: r["real_tokens"] for r in out.collect()}
    want = {r["doc_id"]: len(tok.encode(r["text"])) for r in docs.collect()}
    assert got == want
    # the Python boundary is Arrow, never row-at-a-time
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    # default path: unchanged schema, no Python anywhere
    dflt = token_stats(docs)
    assert dflt.columns == ["doc_id", "ws_tokens", "word_tokens", "bpe_ish_tokens"]
    assert "EvalPython" not in dflt._jdf.queryExecution().executedPlan().toString()


def _model_chunks(texts_by_id, tok, chunk, stride):
    out = {}
    for doc_id, text in texts_by_id.items():
        if text is None:  # NULL-text policy: no chunks (as the JVM path)
            continue
        toks = tok.encode(text)
        n = len(toks)
        n_chunks = 1 if n <= chunk else 1 + -(-(n - chunk) // stride)
        for i in range(n_chunks):
            w = toks[i * stride : i * stride + chunk]
            out[(doc_id, i)] = (
                len(w),
                hashlib.md5(" ".join(map(str, w)).encode()).hexdigest(),
            )
    return out


def test_chunk_documents_with_tokenizer_matches_model(spark, sf_dir):
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.sampling import chunk_documents

    docs = table(spark, "documents", sf_dir).orderBy("doc_id").limit(80)
    # add a NULL-text doc: both paths must yield NO chunks for it
    docs = docs.unionAll(
        docs.sparkSession.createDataFrame(
            [(10_000_000, None, "en", "web", 0)], docs.schema
        )
    )
    tok = train_bpe(_sample_texts(spark, sf_dir), 48)
    out = chunk_documents(docs, chunk=16, stride=8, tokenizer=tok)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_toks"], r["chunk_fp"])
        for r in out.collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == _model_chunks(texts, tok, 16, 8)
    # same windowing arithmetic as the JVM path: plugging a tokenizer whose
    # encode IS the word split must reproduce the default path exactly
    class WordSplit:
        def encode(self, text):
            import re

            return [w for w in re.split("[^a-zA-Z]+", text or "") if w]

    viaseam = {
        (r["doc_id"], r["chunk_idx"]): (r["n_toks"], r["chunk_fp"])
        for r in chunk_documents(docs, tokenizer=WordSplit()).collect()
    }
    default = {
        (r["doc_id"], r["chunk_idx"]): (r["n_toks"], r["chunk_fp"])
        for r in chunk_documents(docs).collect()
    }
    assert viaseam == default


def test_pack_sequences_over_tokenizer_counts(spark, sf_dir):
    """q79's production-faithful form: pack_sequences over
    token_counts(docs, tokenizer) — seq assignment must equal the
    sequential cumulative model on the tokenizer's counts."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.sampling import (
        SEQ_LEN,
        pack_sequences,
        token_counts,
    )

    docs = table(spark, "documents", sf_dir).orderBy("doc_id").limit(120)
    tok = train_bpe(_sample_texts(spark, sf_dir), 32)
    packed = pack_sequences(token_counts(docs, tokenizer=tok))
    got = {r["doc_id"]: (r["n_tokens"], r["seq_id"]) for r in packed.collect()}
    rows = sorted(
        (r["source"], r["doc_id"], len(tok.encode(r["text"])))
        for r in docs.collect()
    )
    want, offset, cur = {}, 0, None
    for source, doc_id, n in rows:
        if source != cur:
            cur, offset = source, 0
        want[doc_id] = (n, offset // SEQ_LEN)
        offset += n
    assert got == want


def test_tiktoken_plugs_into_the_same_seam(spark, sf_dir):
    """Env-gated REAL-tokenizer parity: when tiktoken is importable, its
    encoder drops into token_stats/chunk_documents unchanged and the
    Spark column equals direct .encode lengths."""
    tiktoken = pytest.importorskip(
        "tiktoken", reason="tiktoken not installed (env-blocked seam)"
    )
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.text_analysis import token_stats

    enc = tiktoken.get_encoding("gpt2")
    docs = table(spark, "documents", sf_dir).orderBy("doc_id").limit(30)
    got = {
        r["doc_id"]: r["real_tokens"]
        for r in token_stats(docs, tokenizer=enc).collect()
    }
    want = {r["doc_id"]: len(enc.encode(r["text"])) for r in docs.collect()}
    assert got == want
