"""Three-way differential property test of the shared tokenizer — the
single expression underneath wordcount, shingles, chunking, boilerplate,
and tf-idf.

TOKS_SPARK (Spark `split` + `filter`) and TOKS_DUCK
(`string_split_regex` + `list_filter`) are assumed equivalent by every
dual-engine oracle in the repo; this suite actually pins that equivalence
on adversarial inputs the sf corpus never contains — unicode letters,
digits-only runs, regex metacharacters, leading/trailing separators,
empty strings — against a plain-Python `re` model as the third
interpretation. Any divergence between the three engines' regex
semantics for `[^a-zA-Z]+` would silently skew dozens of queries; here
it fails loudly with the exact input."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_framework_spark.pipeline.dedup import TOKS_DUCK, TOKS_SPARK
from tests.oracle import duckdb_conn
import pytest
# Round 14 (VERDICT r13 item 2): excluded from the driver's default
# pytest run (see pytest.ini); opt in with -m slow.
pytestmark = pytest.mark.slow



def _model_tokens(text: str) -> list[str]:
    return [w for w in re.split("[^a-zA-Z]+", text) if w]


# ASCII letters/separators plus the hazard classes: unicode letters with
# and without diacritics, digits, regex metacharacters, whitespace runs
_text = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ 09.,;-_!?*+()[]{}|\\^$\t\n") + ["é", "ß", "Ω", "中", "🙂"]
    ),
    min_size=0,
    max_size=60,
)
_corpus = st.lists(_text, min_size=1, max_size=8)


@settings(max_examples=20, deadline=None)
@given(texts=_corpus)
def test_tokenizer_three_way_equivalence(spark_global, texts):
    docs = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    got_spark = {
        r["doc_id"]: list(r["toks"])
        for r in spark_global.createDataFrame(docs)
        .select("doc_id", F.expr(TOKS_SPARK).alias("toks"))
        .collect()
    }
    con = duckdb_conn("/root/testdata/sf0.001")
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    got_duck = {
        i: list(toks)
        for i, toks in con.execute(
            f"SELECT doc_id, {TOKS_DUCK} FROM docs"
        ).fetchall()
    }
    model = {i: _model_tokens(t) for i, t in enumerate(texts)}
    assert got_spark == model
    assert got_duck == model


# --- repetition stats (q88's engine) vs sequential model --------------------

from collections import Counter

from mapreduce_framework_spark.pipeline.quality import (
    DUP_FRAC_MAX,
    TOP2_FRAC_MAX,
    repetition_stats,
)

# tiny vocabulary so duplicate tokens and repeated 2-grams actually occur
_rep_text = st.lists(
    st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
).map(" ".join)
_rep_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=20), _rep_text, min_size=1, max_size=6
)


def _model_repetition(text: str):
    toks = _model_tokens(text)
    n, d = len(toks), len(set(toks))
    grams = Counter(" ".join(p) for p in zip(toks, toks[1:]))
    top2 = max(grams.values()) if grams else 0
    dup_frac = 1 - d / n if n > 0 else 0.0
    top2_frac = top2 / (n - 1) if n > 1 else 0.0
    return (
        n,
        d,
        dup_frac,
        top2,
        top2_frac,
        dup_frac > DUP_FRAC_MAX or top2_frac > TOP2_FRAC_MAX,
    )


@settings(max_examples=15, deadline=None)
@given(docs=_rep_corpus)
def test_repetition_stats_match_model(spark_global, docs):
    """q88's library form on arbitrary corpora: token/distinct counts, the
    exact IEEE division results, and the keep/drop flag all equal the
    model — including the n_tokens == 0 and == 1 guard branches."""
    df = spark_global.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_distinct"],
            r["dup_frac"],
            r["top2_count"],
            r["top2_frac"],
            r["is_repetitive"],
        )
        for r in repetition_stats(df).collect()
    }
    assert got == {d: _model_repetition(t) for d, t in docs.items()}


# --- tf-idf top-k (q92's engine) vs sequential model ------------------------

from mapreduce_framework_spark.pipeline.text_analysis import (
    _IDF_SCALE,
    tfidf_topk,
)

# mixed case (the engine lowers first), tiny vocabulary so df collisions
# and score TIES actually occur (tie-break: word ascending)
_tfidf_text = st.lists(
    st.sampled_from(["aa", "AA", "bb", "Bb", "cc", "d"]), min_size=0, max_size=10
).map(" ".join)
_tfidf_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=12), _tfidf_text, min_size=1, max_size=6
)


def _tfidf_model(texts: dict[int, str], top_k: int = 3):
    tf = {
        i: Counter(w for w in re.split("[^a-zA-Z]+", t.lower()) if w)
        for i, t in texts.items()
    }
    df = Counter(w for c in tf.values() for w in c)
    out = {}
    for i, c in tf.items():
        scored = sorted(
            ((w, n, df[w], n * _IDF_SCALE // df[w]) for w, n in c.items()),
            key=lambda x: (-x[3], x[0]),
        )
        for rank, (w, n, d, s) in enumerate(scored[:top_k], start=1):
            out[(i, w)] = (n, d, s, rank)
    return out


@settings(max_examples=15, deadline=None)
@given(texts=_tfidf_corpus)
def test_tfidf_topk_matches_model(spark_global, texts):
    """q92's engine on arbitrary corpora: tf, df, the integer-exact score,
    and the (score desc, word asc) tie-broken top-k ranks all equal the
    sequential model — including case folding and token-free docs (no
    rows)."""
    df = spark_global.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    got = {
        (r["doc_id"], r["word"]): (r["tf"], r["df"], r["score"], r["rank"])
        for r in tfidf_topk(df).collect()
    }
    assert got == _tfidf_model(texts)


# --- lang-id (q40) and quality signals (q41) vs sequential models -----------

from mapreduce_framework_spark.pipeline.text_analysis import (
    STOPWORDS,
    lang_id,
    quality_signals,
)


@st.composite
def _lang_corpus(draw):
    """(doc_id, text) rows built as explicit stop/non-stop token counts so
    the exact 5% boundary (1 stopword in 20 tokens) is reachable."""
    rows = []
    for i in range(draw(st.integers(1, 5))):
        n_stop = draw(st.integers(0, 3))
        n_other = draw(st.integers(0, 19))
        words = [draw(st.sampled_from(STOPWORDS)) for _ in range(n_stop)] + [
            draw(st.sampled_from(["zzz", "qqqq", "W"])) for _ in range(n_other)
        ]
        rows.append((i, " ".join(words)))
    return rows


@settings(max_examples=15, deadline=None)
@given(rows=_lang_corpus())
def test_lang_id_matches_model(spark_global, rows):
    """The stopword-ratio rule is STRICT (> 0.05): exactly 1 stopword in
    20 tokens stays 'unknown', 0-token docs stay 'unknown', and the
    engine lowercases before matching."""
    df = spark_global.createDataFrame(
        [(i, t, "x") for i, t in rows], "doc_id bigint, text string, lang string"
    )
    got = {r["doc_id"]: r["lang_guess"] for r in lang_id(df).collect()}
    model = {}
    for i, t in rows:
        toks = _model_tokens(t.lower())
        n_stop = sum(1 for w in toks if w in STOPWORDS)
        model[i] = (
            "en" if toks and n_stop / len(toks) > 0.05 else "unknown"
        )
    assert got == model


_q_text = st.text(
    alphabet=st.sampled_from(list("ab QZ09.,!?") + ["é"]), min_size=0, max_size=30
)


@settings(max_examples=15, deadline=None)
@given(texts=st.dictionaries(st.integers(0, 9), _q_text, min_size=1, max_size=6))
def test_quality_signals_match_model(spark_global, texts):
    """q41's battery on adversarial text: char/token/space counts and both
    guarded ratios equal the model — including empty text (ratios 0, not
    NULL) and all-punct text."""
    df = spark_global.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_chars"], r["n_tokens"], r["n_spaces"],
            r["long_word_ratio"], r["punct_ratio"],
        )
        for r in quality_signals(df).collect()
    }
    model = {}
    for i, t in texts.items():
        toks = _model_tokens(t)
        model[i] = (
            len(t),
            len(toks),
            t.count(" "),
            len([w for w in toks if len(w) >= 4]) / max(len(toks), 1),
            len(re.sub("[a-zA-Z0-9 ]", "", t)) / max(len(t), 1),
        )
    assert got == model


# --- token stats (q42's three lexers) vs sequential models ------------------

from mapreduce_framework_spark.pipeline.text_analysis import token_stats

_ts_text = st.text(
    alphabet=st.sampled_from(list("ab Z0 9.,;!\t\n") + ["\xa0", "é"]),
    min_size=0,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(texts=st.dictionaries(st.integers(0, 9), _ts_text, min_size=1, max_size=6))
def test_token_stats_match_models(spark_global, texts):
    """The three lexers against re models — with the \\s subtlety pinned:
    Spark (Java) and DuckDB (RE2) treat \\s as ASCII whitespace only, so
    a unicode NBSP is a punctuation TOKEN; the model uses re.ASCII to
    encode exactly that. Tabs/newlines are \\s (separators) but NOT the
    ws_tokens split char (that one splits on literal ' ' alone)."""
    df = spark_global.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["ws_tokens"], r["word_tokens"], r["bpe_ish_tokens"])
        for r in token_stats(df).collect()
    }
    model = {
        i: (
            len([w for w in t.split(" ") if w]),
            len(_model_tokens(t)),
            len(re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", t, re.ASCII)),
        )
        for i, t in texts.items()
    }
    assert got == model


# --- FNV cost model: linear in document size --------------------------------


def test_fnv_linear_in_document_size(spark_global):
    """The JVM-side FNV fold must be LINEAR in the string: the old
    sequence(1, length) + substring(s, i, 1) form was quadratic (Spark's
    substring walks the UTF8String from the start per call — a single
    100 KB web doc stalled for minutes). The split-fold form hashes a
    1 MB doc in seconds AND produces exactly the sequential model's
    value, empty string included."""
    import time

    from pyspark.sql import Row

    from mapreduce_framework_spark.functions.hashing import (
        FNV_OFFSET_BASIS,
        fnv1a32,
    )
    from tests.test_dedup_props import _fnv1a32

    text = ("the quick brown fox " * 50_000)[:1_000_000]
    df = spark_global.createDataFrame(
        [Row(doc_id=0, text=text), Row(doc_id=1, text="")],
        "doc_id bigint, text string",
    )
    t0 = time.perf_counter()
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fnv1a32("text").alias("fp")).collect()}
    wall = time.perf_counter() - t0
    assert got[0] == _fnv1a32(text)
    assert got[1] == FNV_OFFSET_BASIS
    assert wall < 60, f"FNV fold no longer linear: {wall:.0f}s for 1 MB"


def test_scrub_linear_on_giant_tokens(spark_global):
    """The PII scrub regexes must be linear in document size: the old
    unbounded email local-part (`[...]+@`) re-consumed a giant
    separator-free token from every start offset — O(n²), pinning a task
    for hours on one MB-scale "aaaa…" doc. The RFC-bounded form scans a
    1 MB single-token doc within a hard wall bound and still matches real
    emails/phones/denylist terms."""
    import time

    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.quality import scrub_documents

    rows = [
        Row(doc_id=0, text="a" * 1_000_000),
        Row(doc_id=1, text=(".,;! " * 200_000)[:1_000_000]),
        Row(doc_id=2, text="at bob.smith+x@ex-ample.co.uk or 555-123-4567 customer value"),
    ]
    df = spark_global.createDataFrame(rows, "doc_id bigint, text string")
    t0 = time.perf_counter()
    out = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_deny"])
        for r in scrub_documents(df).collect()
    }
    wall = time.perf_counter() - t0
    assert out == {0: (0, 0, 0), 1: (0, 0, 0), 2: (1, 1, 2)}
    assert wall < 60, f"PII regex no longer linear: {wall:.0f}s for 1 MB docs"


def test_scrub_overlong_local_part(spark_global):
    """Documented trade-off of the RFC-bounded email pattern
    (quality.py EMAIL_RE comment): a local part LONGER than 64 chars (not
    a deliverable address per RFC 5321) is PARTIALLY scrubbed — the match
    starts 64 chars before the '@', so the leading overflow stays. Pins
    (a) the exact residue both engines produce and (b) Spark/DuckDB
    agreement on it, so the product semantics can't drift silently."""
    import duckdb
    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.quality import EMAIL_RE, scrub_documents

    overlong = "x" * 100 + "@example.com suffix"
    valid = "y" * 64 + "@example.com suffix"
    df = spark_global.createDataFrame(
        [Row(doc_id=0, text=overlong), Row(doc_id=1, text=valid)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_email"], r["scrub_len"], r["scrub_fp"])
           for r in scrub_documents(df).collect()}
    # overlong: 36 leading chars survive, the trailing 64+domain are scrubbed
    assert got[0][1] == len("x" * 36 + "[EMAIL] suffix")
    # at exactly 64 the whole token is an email and is fully scrubbed
    assert got[1][1] == len("[EMAIL] suffix")

    con = duckdb.connect()
    for doc_id, text in ((0, overlong), (1, valid)):
        (duck_scrub,) = con.execute(
            "SELECT regexp_replace(?, ?, '[EMAIL]', 'g')", [text, EMAIL_RE]
        ).fetchone()
        (duck_fp,) = con.execute("SELECT md5(?)", [duck_scrub]).fetchone()
        assert (len(duck_scrub), duck_fp) == (got[doc_id][1], got[doc_id][2]), doc_id
