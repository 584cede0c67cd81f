"""Boundary-exact property tests for the dedup family (q30/q31/q32/q55/q73)
against sequential pure-Python models.

The sf-data oracles prove these operators on realistic corpora; what they
cannot prove is behavior at the semantic boundaries the synthetic data
rarely hits — docs with zero tokens (dropped from SimHash), docs with
fewer than SHINGLE_K tokens (empty shingle set, invisible to Jaccard),
exact duplicates (J = 1, Hamming = 0), one-token mutations, and SimHash
bit-vote TIES (vote sum == 0 → bit 0, not 1). Here hypothesis builds
corpora constructively (duplicates and mutations injected explicitly —
filter-health lesson, commit 2568563) and every Spark result is compared
to a from-scratch sequential model:

- exact shingle-Jaccard pairs (q30's engine) == brute-force set model;
- SimHash fingerprints (q32's dictionary-encoded vote-sum form) == the
  naive per-token FNV fold model, bit for bit;
- banded SimHash near-dup (q73) == all-pairs Hamming filter on the model
  fingerprints — the pigeonhole candidate generation is provably complete,
  so this is an EQUALITY, not an inclusion;
- MinHash-LSH (q31's engine): soundness (every emitted pair is a true
  J >= 0.8 pair, value-exact) and signature-level completeness (every
  true pair whose Spark-computed signatures agree on >= 1 band and pass
  the estimate prune IS emitted). Banding itself is probabilistic, so
  completeness is asserted conditional on the signatures — deterministic
  for a fixed corpus, no flakiness.
"""

from __future__ import annotations

import math
import re
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_framework_spark.functions.hashing import (
    FNV_OFFSET_BASIS,
    FNV_PRIME,
    TWO32,
)
from mapreduce_framework_spark.pipeline.dedup import (
    HAMMING_MAX,
    JACCARD_THRESHOLD,
    N_BANDS,
    N_PERMS,
    SHINGLE_K,
    _exact_jaccard_pairs,
    _signatures_from_shingles,
    lsh_neardup_pairs,
    shingles_of,
    simhash_banded_pairs,
    simhash_of,
)

import pytest
# Round 14 (VERDICT r13 item 2): excluded from the driver's default
# pytest run (see pytest.ini); opt in with -m slow.
pytestmark = pytest.mark.slow


# --- sequential models ------------------------------------------------------


def _toks(text: str) -> list[str]:
    return [w for w in re.split("[^a-zA-Z]+", text) if w]


def _shingle_set(text: str) -> frozenset[str]:
    t = _toks(text)
    if len(t) < SHINGLE_K:
        return frozenset()
    return frozenset(
        " ".join(t[i : i + SHINGLE_K]) for i in range(len(t) - SHINGLE_K + 1)
    )


def _fnv1a32(s: str) -> int:
    acc = FNV_OFFSET_BASIS
    for ch in s:
        acc = ((acc ^ ord(ch)) * FNV_PRIME) % TWO32
    return acc


def _simhash_model(text: str) -> int | None:
    """None = doc has no tokens and is dropped (matches len(hs) > 0)."""
    toks = _toks(text)
    if not toks:
        return None
    hs = [_fnv1a32(t) for t in toks]
    val = 0
    for j in range(32):
        votes = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if votes > 0:  # tie (== 0) leaves the bit at 0
            val |= 1 << j
    return val


def _jaccard_pairs_model(texts: list[str]) -> dict[tuple[int, int], float]:
    """(id1, id2) -> jaccard for every pair sharing >= 1 shingle."""
    sets = {i: _shingle_set(t) for i, t in enumerate(texts)}
    out = {}
    for i, j in combinations(sorted(sets), 2):
        common = len(sets[i] & sets[j])
        if common:
            out[(i, j)] = common / (len(sets[i]) + len(sets[j]) - common)
    return out


def _hamming_pairs_model(texts: list[str]) -> dict[tuple[int, int], int]:
    sims = {i: _simhash_model(t) for i, t in enumerate(texts)}
    sims = {i: s for i, s in sims.items() if s is not None}
    return {
        (i, j): (sims[i] ^ sims[j]).bit_count()
        for i, j in combinations(sorted(sims), 2)
        if (sims[i] ^ sims[j]).bit_count() <= HAMMING_MAX
    }


# --- constructive corpus strategy -------------------------------------------

# small token alphabet: forces shared shingles, repeated tokens, and
# SimHash vote ties (even token multisets) to actually occur
_token = st.sampled_from(["alpha", "beta", "gam", "dd", "e"])
# 0..2-token docs hit the no-token / sub-shingle boundaries; longer docs
# carry real shingle sets
_base_doc = st.lists(_token, min_size=0, max_size=9).map(" ".join)


@st.composite
def _corpus(draw) -> list[str]:
    bases = draw(st.lists(_base_doc, min_size=1, max_size=4))
    docs = list(bases)
    for b in bases:
        if draw(st.booleans()):
            docs.append(b)  # exact duplicate: J = 1, Hamming = 0
        toks = b.split()
        if toks and draw(st.booleans()):
            i = draw(st.integers(0, len(toks) - 1))
            toks = [*toks[:i], draw(_token), *toks[i + 1 :]]
            docs.append(" ".join(toks))  # one-token mutation
    return docs


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


# --- the properties ---------------------------------------------------------


@settings(max_examples=12, deadline=None)
@given(texts=_corpus())
def test_exact_jaccard_pairs_match_model(spark_global, texts):
    """q30's engine on arbitrary corpora: the full (pair, jaccard) list —
    not just the threshold survivors — equals the brute-force set model,
    with sub-shingle docs invisible and IEEE-exact division."""
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in _exact_jaccard_pairs(shingles_of(_df(spark_global, texts))).collect()
    }
    assert got == _jaccard_pairs_model(texts)


@settings(max_examples=12, deadline=None)
@given(texts=_corpus())
def test_simhash_matches_model(spark_global, texts):
    """q32's dictionary-encoded vote-sum fingerprint == the naive
    per-token FNV fold, bit for bit — including vote ties (bit stays 0)
    and the token-frequency weighting (toks stream, not distinct)."""
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_of(_df(spark_global, texts)).collect()
    }
    model = {
        i: s
        for i, t in enumerate(texts)
        if (s := _simhash_model(t)) is not None
    }
    assert got == model


@settings(max_examples=12, deadline=None)
@given(texts=_corpus())
def test_simhash_banded_equals_allpairs_model(spark_global, texts):
    """q73's pigeonhole banding is complete, so banded near-dup pairs are
    EQUAL to the model's all-pairs Hamming <= HAMMING_MAX filter."""
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in simhash_banded_pairs(_df(spark_global, texts)).collect()
    }
    assert got == _hamming_pairs_model(texts)


@settings(max_examples=8, deadline=None)
@given(texts=_corpus())
def test_lsh_sound_and_signature_complete(spark_global, texts):
    """q31's engine: (a) every emitted pair is a true J >= 0.8 pair with
    the exact model jaccard (soundness — banding/pruning only ever DROPS);
    (b) every true pair whose Spark signatures agree on >= 1 of the 16
    4-row bands and pass the estimate prune is emitted (completeness,
    conditional on the signatures — deterministic per corpus)."""
    df = _df(spark_global, texts)
    model = _jaccard_pairs_model(texts)
    true_pairs = {p: j for p, j in model.items() if j >= JACCARD_THRESHOLD}

    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in lsh_neardup_pairs(df).collect()
    }
    # soundness: emitted pairs are true pairs, value-exact
    assert set(got) <= set(true_pairs)
    for p, j in got.items():
        assert j == true_pairs[p]

    # completeness conditional on the signatures Spark actually computed
    sigs = {
        r["doc_id"]: tuple(r["sig"])
        for r in _signatures_from_shingles(shingles_of(df)).collect()
    }
    rows = N_PERMS // N_BANDS
    min_matches = int(math.ceil(N_PERMS * max(JACCARD_THRESHOLD - 0.25, 0.0)))
    for (i, j), _ in true_pairs.items():
        if i not in sigs or j not in sigs:
            continue  # sub-shingle docs have no signature
        a, b = sigs[i], sigs[j]
        band_agree = any(
            a[bnd * rows : (bnd + 1) * rows] == b[bnd * rows : (bnd + 1) * rows]
            for bnd in range(N_BANDS)
        )
        est = sum(1 for x, y in zip(a, b) if x == y)
        if band_agree and est >= min_matches:
            assert (i, j) in got, f"signature-complete pair {(i, j)} missing"


# --- boilerplate family (q86/q87) vs sequential model -----------------------

from mapreduce_framework_spark.pipeline.dedup import (
    boilerplate_doc_stats,
    boilerplate_ngrams,
)

_BOILER_TOKENS = ["alpha", "beta", "gam", "dd", "e", "ff"]
_boiler_doc = st.lists(st.sampled_from(_BOILER_TOKENS), min_size=0, max_size=8).map(
    " ".join
)


@st.composite
def _boiler_corpus(draw) -> list[str]:
    bases = draw(st.lists(_boiler_doc, min_size=1, max_size=3))
    docs = list(bases)
    for b in bases:  # duplicates force cross-doc grams over the df cutoff
        if draw(st.booleans()):
            docs.append(b)
    return docs


def _grams5(text: str) -> list[str]:
    t = _toks(text)
    return [" ".join(t[i : i + 5]) for i in range(len(t) - 4)]


@settings(max_examples=12, deadline=None)
@given(texts=_boiler_corpus())
def test_boilerplate_family_matches_model(spark_global, texts):
    """q86/q87's engines at min_df=2 on arbitrary corpora: the dictionary
    counts DISTINCT docs per gram while doc stats count POSITIONS
    (within-doc repeats hit once in df, each span once in n_flagged);
    sub-5-token docs have no spans and drop out."""
    min_df = 2
    df = _df(spark_global, texts)

    gram_docs: dict[str, set[int]] = {}
    for i, t in enumerate(texts):
        for g in set(_grams5(t)):
            gram_docs.setdefault(g, set()).add(i)
    dict_model = {
        g: len(ids) for g, ids in gram_docs.items() if len(ids) >= min_df
    }
    got_dict = {
        r["gram"]: r["df"]
        for r in boilerplate_ngrams(df, min_df=min_df).collect()
    }
    assert got_dict == dict_model

    stats_model = {}
    for i, t in enumerate(texts):
        spans = _grams5(t)
        if not spans:
            continue
        flagged = sum(1 for g in spans if g in dict_model)
        stats_model[i] = (len(spans), flagged, flagged / len(spans))
    got_stats = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["flag_ratio"])
        for r in boilerplate_doc_stats(df, min_df=min_df).collect()
    }
    assert got_stats == stats_model


# --- cap algebra (round 8): keep-lowest-per-group capping is
# compaction-stable -------------------------------------------------------
#
# The streaming sinks re-apply the hot-key caps (cap_banded / cap_cells)
# only at COMPACTION, folding an already-capped compacted artifact with an
# uncapped delta tail. That is sound because keep-lowest-K is a MONOTONE
# selection: adding rows never lowers an existing row's rank within its
# group, so anything the earlier cap dropped would be dropped by a cap
# over the full history too — cap(cap(A) ∪ B) == cap(A ∪ B). Pinned here
# against an exhaustive-ish hypothesis model AND cross-checked once on the
# real Spark cap_banded, so the algebra and the implementation cannot
# drift apart.


def _model_cap(rows, cap):
    """Sequential model of cap_banded/cap_cells: keep each group's `cap`
    lowest ids. rows: set of (group, id)."""
    by_group: dict = {}
    for g, i in sorted(rows):
        by_group.setdefault(g, []).append(i)
    return {(g, i) for g, ids in by_group.items() for i in sorted(ids)[:cap]}


@settings(max_examples=200, deadline=None)
@given(
    a=st.sets(
        st.tuples(st.integers(0, 4), st.integers(0, 30)), min_size=0, max_size=40
    ),
    b=st.sets(
        st.tuples(st.integers(0, 4), st.integers(0, 30)), min_size=0, max_size=40
    ),
    cap=st.integers(1, 6),
)
def test_cap_is_compaction_stable_model(a, b, cap):
    assert _model_cap(_model_cap(a, cap) | b, cap) == _model_cap(a | b, cap)
    # idempotence, the redelivered-compaction case
    assert _model_cap(_model_cap(a, cap), cap) == _model_cap(a, cap)


def test_cap_banded_matches_model_and_is_compaction_stable(spark_global):
    """One Spark cross-check: cap_banded == the model on a fixture with
    ties broken across groups, and re-capping a capped-union equals
    capping the full union (the exact shape _publish_delta's compaction
    transform relies on)."""
    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.dedup import cap_banded

    a = {(g, i) for g in range(3) for i in range(0, 20, 2)}
    b = {(g, i) for g in range(3) for i in range(1, 15, 2)}

    def frame(rows):
        return spark_global.createDataFrame(
            [Row(doc_id=i, band=g, bsig=g * 7) for g, i in sorted(rows)]
        )

    def collect(df):
        return {(r["band"], r["doc_id"]) for r in df.collect()}

    cap = 4
    got_a = collect(cap_banded(frame(a), cap))
    assert got_a == _model_cap(a, cap)
    capped_then_b = {(g, i) for g, i in got_a} | b
    got_two_step = collect(cap_banded(frame(capped_then_b), cap))
    got_full = collect(cap_banded(frame(a | b), cap))
    assert got_two_step == got_full == _model_cap(a | b, cap)
