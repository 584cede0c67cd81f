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


# --- any-offset exact-substring dedup (ExactSubstr complement to q101) ------

from mapreduce_framework_spark.pipeline.span_dedup import (
    EXSUB_ORACLE,
    EXSUB_W,
    exact_substring_dedup,
    sliding_shingles,
)


def test_exsub_matches_duckdb_oracle(spark, sf_dir):
    compare(
        exact_substring_dedup(table_docs(spark, sf_dir)).orderBy("doc_id"),
        EXSUB_ORACLE,
        sf_dir,
    )


def table_docs(spark, sf_dir):
    from mapreduce_framework_spark.catalog import table

    return table(spark, "documents", sf_dir)


def test_exsub_catches_block_straddling_repeat(spark):
    """The motivating case: a repeated span that straddles q101's tile
    boundary at a NON-multiple of SPAN_W is invisible to the block form
    (no common block) but fully dropped by the any-offset form."""
    shared = " ".join(f"s{chr(97 + i)}" for i in range(EXSUB_W))
    pre1 = " ".join(f"p{chr(97 + i)}" for i in range(3))
    suf1 = " ".join(f"q{chr(97 + i)}" for i in range(7))
    pre2 = " ".join(f"r{chr(97 + i)}" for i in range(7))
    suf2 = " ".join(f"t{chr(97 + i)}" for i in range(3))
    docs = _docs(spark, [(1, f"{pre1} {shared} {suf1}"), (2, f"{pre2} {shared} {suf2}")])
    # block form: offsets 3 and 7 -> no shared tile, nothing dropped
    blocks = {r["doc_id"]: r for r in span_dedup(docs).collect()}
    assert blocks[1]["n_kept"] == blocks[1]["n_blocks"]
    assert blocks[2]["n_kept"] == blocks[2]["n_blocks"]
    # any-offset form: doc 2's copy is dropped as one maximal span
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs).collect()}
    assert out[1]["n_dup_tokens"] == 0 and out[1]["n_spans"] == 0
    assert out[2]["n_dup_tokens"] == EXSUB_W and out[2]["n_spans"] == 1
    import hashlib

    assert out[2]["clean_fp"] == hashlib.md5(f"{pre2} {suf2}".encode()).hexdigest()


def test_exsub_unique_and_short_docs(spark):
    """All-unique docs survive untouched; docs shorter than w yield no
    shingles and survive whole; empty docs fingerprint as md5('')."""
    import hashlib

    text = " ".join(f"u{chr(97 + i % 26)}{chr(97 + i // 26)}" for i in range(EXSUB_W * 2))
    docs = _docs(spark, [(1, text), (2, "short doc"), (3, "")])
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs).collect()}
    assert out[1]["n_dup_tokens"] == 0
    assert out[1]["clean_fp"] == hashlib.md5(text.encode()).hexdigest()
    assert out[2]["n_tokens"] == 2 and out[2]["n_dup_tokens"] == 0
    assert out[2]["clean_fp"] == hashlib.md5(b"short doc").hexdigest()
    assert out[3]["n_tokens"] == 0
    assert out[3]["clean_fp"] == hashlib.md5(b"").hexdigest()


def test_exsub_null_text_policy(spark):
    """Stated NULL policy (code + oracle, dirty-data convention): NULL
    text behaves as an empty doc — n_tokens 0, nothing dropped, md5('')
    residue — on BOTH engines (the dirty-variant differential relies on
    the coalesce being in the oracle too)."""
    import hashlib

    import duckdb

    from mapreduce_framework_spark.pipeline.span_dedup import EXSUB_ORACLE

    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="real words here")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df).collect()}
    assert out[1]["n_tokens"] == 0 and out[1]["n_dup_tokens"] == 0
    assert out[1]["clean_fp"] == hashlib.md5(b"").hexdigest()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1::BIGINT, NULL::VARCHAR), (2::BIGINT, 'real words here')) t(doc_id, text)"
    )
    duck = {r[0]: r for r in con.execute(EXSUB_ORACLE).fetchall()}
    for d in (1, 2):
        assert tuple(out[d]) == duck[d], d


def test_exsub_intra_doc_periodic_repeat(spark):
    """'a a a ... a' (3w tokens): every shingle after the first is
    redundant, covering positions 2..3w — ONE maximal span, residue 'a'."""
    import hashlib

    n = 3 * EXSUB_W
    docs = _docs(spark, [(5, " ".join(["aa"] * n))])
    (row,) = exact_substring_dedup(docs).collect()
    assert row["n_tokens"] == n
    assert row["n_dup_tokens"] == n - 1 and row["n_spans"] == 1
    assert row["clean_fp"] == hashlib.md5(b"aa").hexdigest()


def test_exsub_plan_shape_scale_safe(spark, sf_dir):
    """Keep-first stays a partial-agg min (no per-shingle window — the
    hot-boilerplate-shingle skew case); the only Window is the per-doc
    island merge, bounded by doc length. No cartesian anywhere."""
    plan = (
        exact_substring_dedup(table_docs(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan
    # per-doc lag window only: every Window node partitions by doc_id
    import re as _re

    for spec in _re.findall(r"Window \[[^\]]*partitionBy=\[([^\]]*)\]", plan):
        assert "doc_id" in spec


def _model_exsub(docs: dict[int, str], w: int):
    """Pure-Python sequential model of exact_substring_dedup's contract."""
    toks = {
        d: [x for x in re.split("[^a-zA-Z]+", t) if x] for d, t in docs.items()
    }
    first: dict[str, tuple[int, int]] = {}
    for d in sorted(docs):
        for p in range(1, len(toks[d]) - w + 2):
            s = " ".join(toks[d][p - 1 : p - 1 + w])
            if s not in first or (d, p) < first[s]:
                first[s] = (d, p)
    out = {}
    for d in sorted(docs):
        n = len(toks[d])
        covered: set[int] = set()
        for p in range(1, n - w + 2):
            s = " ".join(toks[d][p - 1 : p - 1 + w])
            if first[s] != (d, p):
                covered.update(range(p, p + w))
        n_spans = sum(1 for i in sorted(covered) if i - 1 not in covered)
        clean = " ".join(t for i, t in enumerate(toks[d], 1) if i not in covered)
        out[d] = (n, len(covered), n_spans, hashlib.md5(clean.encode()).hexdigest())
    return out


_exsub_doc = st.lists(st.sampled_from(["aa", "bb"]), min_size=0, max_size=15).map(" ".join)
_exsub_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=50), _exsub_doc, min_size=1, max_size=5
)


@pytest.mark.slow  # r14 item 2: arithmetic oracle-checked by the q101/q105/q107 differentials
@settings(max_examples=15, deadline=None)
@given(docs=_exsub_corpus)
def test_exsub_matches_sequential_model(spark_global, docs):
    df = spark_global.createDataFrame([Row(doc_id=d, text=t) for d, t in docs.items()])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["n_spans"], r["clean_fp"])
        for r in exact_substring_dedup(df, w=3).collect()
    }
    assert got == _model_exsub(docs, 3)


# --- span-level decontamination (round 6) ------------------------------------


def _model_contamination(ref: dict[int, str], new: dict[int, str], w: int):
    """Sequential model: reference window set, then per-new-doc coverage."""
    def tok(t):
        return [x for x in re.split("[^a-zA-Z]+", t) if x]

    seen = set()
    for t in ref.values():
        ts = tok(t)
        for p in range(1, len(ts) - w + 2):
            seen.add(" ".join(ts[p - 1 : p - 1 + w]))
    out = {}
    for d, t in new.items():
        ts = tok(t)
        n = len(ts)
        covered: set[int] = set()
        for p in range(1, n - w + 2):
            if " ".join(ts[p - 1 : p - 1 + w]) in seen:
                covered.update(range(p, p + w))
        n_spans = sum(1 for i in sorted(covered) if i - 1 not in covered)
        frac = len(covered) / n if n else 0.0
        out[d] = (n, len(covered), n_spans, frac)
    return out


@pytest.mark.slow  # r14 item 2: arithmetic oracle-checked by the q101/q105/q107 differentials
@settings(max_examples=12, deadline=None)
@given(ref=_exsub_corpus, new=_exsub_corpus)
def test_contamination_matches_sequential_model(spark_global, ref, new):
    from mapreduce_framework_spark.pipeline.span_dedup import (
        span_contamination,
        span_index,
    )

    ref_df = spark_global.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in ref.items()]
    )
    new_df = spark_global.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in new.items()]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cont_tokens"], r["n_spans"], r["cont_frac"])
        for r in span_contamination(span_index(ref_df, w=3), new_df, w=3).collect()
    }
    want = _model_contamination(ref, new, 3)
    assert set(got) == set(want)
    for d, (n, c, s, f) in want.items():
        gn, gc, gs, gf = got[d]
        assert (gn, gc, gs) == (n, c, s), d
        assert abs(gf - f) < 1e-12, d


def test_contamination_artifact_roundtrip_and_edges(spark, tmp_path):
    """The lifecycle + stated edges: parquet round-trip of the index is
    exact; clean docs report zeros; NULL/short texts follow the family
    n_tokens policy; a doc fully inside the reference reports frac 1."""
    from mapreduce_framework_spark.pipeline.span_dedup import (
        span_contamination,
        span_index,
    )

    ref = _docs(spark, [(0, "aa bb cc dd ee ff gg hh ii jj kk ll")])
    new = _docs(
        spark,
        [
            (10, "aa bb cc dd ee ff gg hh ii jj"),  # fully covered
            (11, "zz yy xx ww vv uu tt ss rr qq"),  # clean
            (12, None),                               # NULL text
            (13, "aa bb"),                            # shorter than w
        ],
    )
    idx = span_index(ref)
    path = str(tmp_path / "span_index")
    idx.write.parquet(path)
    back = spark.read.parquet(path)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cont_tokens"], r["n_spans"], r["cont_frac"])
        for r in span_contamination(back, new).collect()
    }
    direct = {
        r["doc_id"]: (r["n_tokens"], r["n_cont_tokens"], r["n_spans"], r["cont_frac"])
        for r in span_contamination(idx, new).collect()
    }
    assert got == direct
    assert got[10] == (10, 10, 1, 1.0)
    assert got[11] == (10, 0, 0, 0.0)
    assert got[12] == (0, 0, 0, 0.0)
    assert got[13] == (2, 0, 0, 0.0)


@settings(max_examples=10, deadline=None)
@given(ref=_exsub_corpus, new=_exsub_corpus)
def test_decontaminate_matches_sequential_model(spark_global, ref, new):
    """The trim form agrees with the coverage model token for token: the
    surviving text is exactly the non-covered tokens in order, and the
    removed-token count equals the model's coverage count."""
    from mapreduce_framework_spark.pipeline.span_dedup import (
        decontaminate,
        span_index,
    )

    def tok(t):
        return [x for x in re.split("[^a-zA-Z]+", t) if x]

    want_cov = _model_contamination(ref, new, 3)
    ref_df = spark_global.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in ref.items()]
    )
    new_df = spark_global.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in new.items()]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cont_tokens"], r["clean_text"])
        for r in decontaminate(span_index(ref_df, w=3), new_df, w=3).collect()
    }
    assert set(got) == set(new)
    seen = set()
    for t in ref.values():
        ts = tok(t)
        for p in range(1, len(ts) - 1):  # 1-based starts of 3-token windows
            seen.add(" ".join(ts[p - 1 : p + 2]))
    for d, t in new.items():
        ts = tok(t)
        covered: set[int] = set()
        for p in range(1, len(ts) - 1):
            if " ".join(ts[p - 1 : p + 2]) in seen:
                covered.update(range(p, p + 3))
        clean = " ".join(x for i, x in enumerate(ts, 1) if i not in covered)
        n, c, _, _ = want_cov[d]
        assert got[d] == (n, c, clean), d
