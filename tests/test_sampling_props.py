"""Boundary-exact property tests for the corpus-shaping family
(q78 stratified sample, q79 packing, q80 contamination, q90 domain mix)
against sequential pure-Python models.

The sf-data oracles prove these on realistic corpora; the boundaries they
never hit are exercised here constructively: token counts landing exactly
on SEQ_LEN multiples, zero-token docs sharing a packing offset, docs on
either side of the benchmark id cutoff with sub-shingle texts, unknown
languages (rate 0), and — the case that actually crashed before the
round-5 guard — a SOURCE whose total token mass is zero, which under
ANSI mode raised DIVIDE_BY_ZERO inside the q90 rate expression and would
have killed a 100 TB job over one shard of empty docs. The model pins the
guarded semantics: rate = 100 for a token-free source (the continuous
limit of min(100, target/src) as src → 0⁺)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mapreduce_framework_spark.pipeline.sampling import (
    LANG_RATES,
    MIX_BUDGET_PCT,
    SEQ_LEN,
    _WEIGHTED_SOURCES,
    contamination_check,
    domain_mix_sample,
    pack_sequences,
    stratified_sample,
)
from tests.test_dedup_props import _fnv1a32, _shingle_set, _toks
import pytest
# Round 14 (VERDICT r13 item 2): excluded from the driver's default
# pytest run (see pytest.ini); opt in with -m slow.
pytestmark = pytest.mark.slow


# --- models -----------------------------------------------------------------


def _bucket(doc_id: int, salt: str) -> int:
    return _fnv1a32(f"{salt}{doc_id}") % 100


def _pack_model(rows: list[tuple[int, str, int]]) -> dict[int, tuple[int, int]]:
    """doc_id -> (start_tok, seq_id): per-source cumulative offsets in
    doc_id order."""
    out = {}
    for source in {s for _, s, _ in rows}:
        start = 0
        for doc_id, _, n in sorted((r for r in rows if r[1] == source)):
            out[doc_id] = (start, start // SEQ_LEN)
            start += n
    return out


def _contamination_model(
    texts: dict[int, str], bench_max_id: int
) -> dict[int, tuple[int, int]]:
    sets = {i: _shingle_set(t) for i, t in texts.items()}
    bench = {i: s for i, s in sets.items() if i < bench_max_id}
    out = {}
    for i, s in sets.items():
        if i < bench_max_id:
            continue
        shared = s & set().union(*bench.values()) if bench else set()
        ndocs = sum(1 for b in bench.values() if s & b)
        if shared:
            out[i] = (len(shared), ndocs)
    return out


def _mix_model(rows: list[tuple[int, str, str]]):
    """doc_id -> (n_tokens, rate, bucket) for kept docs, mirroring
    domain_mix_sample's integer arithmetic exactly."""
    ntok = {i: len(_toks(t)) for i, _, t in rows}
    src_tokens: dict[str, int] = {}
    for i, s, _ in rows:
        src_tokens[s] = src_tokens.get(s, 0) + ntok[i]
    weights = {s: 2 if s in _WEIGHTED_SOURCES else 1 for s in src_tokens}
    total_tokens = sum(src_tokens.values())
    total_w = sum(weights.values())
    rates = {}
    for s, n in src_tokens.items():
        if n == 0:
            rates[s] = 100
        else:
            target = (total_tokens * MIX_BUDGET_PCT // 100) * weights[s] // total_w
            rates[s] = min(100, 100 * target // n)
    out = {}
    for i, s, _ in rows:
        b = _bucket(i, "mix-")
        if b < rates[s]:
            out[i] = (ntok[i], rates[s], b)
    return out


# --- strategies -------------------------------------------------------------

_token = st.sampled_from(["alpha", "beta", "gam", "dd", "e"])
_text = st.lists(_token, min_size=0, max_size=8).map(" ".join)

# packing input: unique doc_ids, 2 sources, token counts crossing SEQ_LEN
# boundaries (0, 1, SEQ_LEN-1, SEQ_LEN, SEQ_LEN+1 all reachable)
_pack_rows = st.dictionaries(
    st.integers(min_value=0, max_value=50),
    st.tuples(
        st.sampled_from(["srcA", "srcB"]),
        st.sampled_from([0, 1, 7, SEQ_LEN - 1, SEQ_LEN, SEQ_LEN + 1, 3 * SEQ_LEN]),
    ),
    min_size=1,
    max_size=10,
).map(lambda d: [(i, s, n) for i, (s, n) in d.items()])

# contamination: ids straddle the cutoff (bench side 0..2, corpus side 3..12)
_BENCH_CUT = 3
_contam_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=12), _text, min_size=1, max_size=8
)

# domain mix: sources include a weighted one (src0) and unweighted; empty
# texts make zero-token sources actually occur
_mix_rows = st.dictionaries(
    st.integers(min_value=0, max_value=40),
    st.tuples(st.sampled_from(["src0", "srcZ", "srcQ"]), _text),
    min_size=1,
    max_size=10,
).map(lambda d: [(i, s, t) for i, (s, t) in d.items()])

# stratified: known + unknown langs
_strat_rows = st.dictionaries(
    st.integers(min_value=0, max_value=10**6),
    st.sampled_from(["en", "de", "zh", "xx", ""]),
    min_size=1,
    max_size=12,
).map(lambda d: list(d.items()))


# --- properties -------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(rows=_pack_rows)
def test_pack_sequences_matches_model(spark_global, rows):
    df = spark_global.createDataFrame(
        [Row(doc_id=i, source=s, n_tokens=n) for i, s, n in rows],
        "doc_id bigint, source string, n_tokens bigint",
    )
    got = {
        r["doc_id"]: (r["start_tok"], r["seq_id"])
        for r in pack_sequences(df).collect()
    }
    assert got == _pack_model(rows)


@settings(max_examples=12, deadline=None)
@given(texts=_contam_corpus)
def test_contamination_matches_model(spark_global, texts):
    df = spark_global.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_shared_shingles"], r["n_benchmark_docs"])
        for r in contamination_check(df, bench_max_id=_BENCH_CUT).collect()
    }
    assert got == _contamination_model(texts, _BENCH_CUT)


@settings(max_examples=15, deadline=None)
@given(rows=_strat_rows)
def test_stratified_sample_matches_model(spark_global, rows):
    df = spark_global.createDataFrame(
        [Row(doc_id=i, lang=lang) for i, lang in rows],
        "doc_id bigint, lang string",
    )
    got = {r["doc_id"]: r["bucket"] for r in stratified_sample(df).collect()}
    model = {
        i: _bucket(i, "sample-")
        for i, lang in rows
        if _bucket(i, "sample-") < LANG_RATES.get(lang, 0)
    }
    assert got == model


@settings(max_examples=12, deadline=None)
@given(rows=_mix_rows)
def test_domain_mix_matches_model(spark_global, rows):
    df = spark_global.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, s, t in rows],
        "doc_id bigint, source string, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["rate"], r["bucket"])
        for r in domain_mix_sample(df).collect()
    }
    assert got == _mix_model(rows)
