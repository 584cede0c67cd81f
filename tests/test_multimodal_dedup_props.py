"""Boundary-exact property tests for the multimodal perceptual-hash
near-dup family (pipeline/multimodal_dedup.py — the staged r12 newcomer
q109) against sequential pure-Python models.

Same method as tests/test_dedup_props.py: hypothesis builds corpora
constructively (exact duplicates and single-character retouches injected
explicitly), and every Spark result is compared to a from-scratch model:

- the 32-cell average-hash == the model grid fold, bit for bit — the
  integer cross-multiply mean test, uneven cell boundaries (L not
  divisible by 32), sub-grid docs (L < 32: empty cells stay 0), and the
  all-equal-pixels corpus (no cell strictly above the mean → phash 0);
- banded pairs (q109's engine) == all-pairs Hamming ≤ PHASH_HAMMING_MAX
  on the model hashes — the 4-band pigeonhole is provably complete for
  any threshold < 8, so this is an EQUALITY, not an inclusion;
- the incremental matcher (phash_match_batch) == the model's
  lowest-index-match rule, and its band_cap degradation only ever
  DROPS matches (⊆), never invents one.

The code-point policy is exercised on purpose: the strategy mixes
non-ASCII characters, and the model folds ord(ch) — exactly what both
engines compute (Spark ascii() / DuckDB unicode() are code points).
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mapreduce_framework_spark.pipeline.multimodal_dedup import (
    PHASH_CELLS,
    PHASH_HAMMING_MAX,
    phash_banded_pairs,
    phash_match_batch,
    phash_of,
)

# --- sequential model -------------------------------------------------------


def _phash_model(text: str | None) -> int | None:
    """None = dropped (NULL or zero-length payload — the stated policy)."""
    if not text:
        return None
    vals = [ord(c) for c in text]
    L = len(vals)
    T = sum(vals)
    h = 0
    for j in range(PHASH_CELLS):
        lo, hi = j * L // PHASH_CELLS, (j + 1) * L // PHASH_CELLS
        n, s = hi - lo, sum(vals[lo:hi])
        if n > 0 and s * L > T * n:
            h |= 1 << j
    return h


def _pairs_model(texts: list[str | None]) -> dict[tuple[int, int], int]:
    hs = {i: h for i, t in enumerate(texts) if (h := _phash_model(t)) is not None}
    return {
        (i, j): (hs[i] ^ hs[j]).bit_count()
        for i, j in combinations(sorted(hs), 2)
        if (hs[i] ^ hs[j]).bit_count() <= PHASH_HAMMING_MAX
    }


# --- constructive corpus strategy -------------------------------------------

# mixed alphabet: low/high ASCII plus non-ASCII code points (é, 語) so the
# code-point policy (not a bytes policy) is what the model asserts; short
# docs hit the L < PHASH_CELLS empty-cell boundary, flat docs ("aaaa")
# hit the no-cell-above-mean → phash 0 case
_char = st.sampled_from(list("ab z.!é語"))
_base_doc = st.text(alphabet=_char, min_size=0, max_size=80)


@st.composite
def _corpus(draw) -> list[str]:
    bases = draw(st.lists(_base_doc, min_size=1, max_size=4))
    docs = list(bases)
    for b in bases:
        if draw(st.booleans()):
            docs.append(b)  # exact duplicate: Hamming 0
        if b and draw(st.booleans()):
            i = draw(st.integers(0, len(b) - 1))
            docs.append(b[:i] + draw(_char) + b[i + 1 :])  # 1-char retouch
    return docs


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


# --- the properties ---------------------------------------------------------


@settings(max_examples=12, deadline=None)
@given(texts=_corpus())
def test_phash_matches_model(spark_global, texts):
    got = {r["doc_id"]: r["phash"] for r in phash_of(_df(spark_global, texts)).collect()}
    model = {
        i: h for i, t in enumerate(texts) if (h := _phash_model(t)) is not None
    }
    assert got == model


@settings(max_examples=12, deadline=None)
@given(texts=_corpus())
def test_phash_banded_equals_allpairs_model(spark_global, texts):
    """The 4-band pigeonhole candidate generation is complete for
    Hamming ≤ PHASH_HAMMING_MAX < 8, so banded pairs EQUAL the model's
    all-pairs filter."""
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in phash_banded_pairs(_df(spark_global, texts)).collect()
    }
    assert got == _pairs_model(texts)


@settings(max_examples=8, deadline=None)
@given(texts=_corpus())
def test_phash_match_batch_matches_model(spark_global, texts):
    """Incremental lifecycle: docs split into an index half and a batch
    half; the matcher must report, for every batch doc with a ≤ threshold
    index neighbor, the LOWEST such index doc_id and the exact Hamming to
    it (min_by doc_id, the family's canonical pick)."""
    from mapreduce_framework_spark.pipeline.multimodal_dedup import phash_index

    cut = (len(texts) + 1) // 2
    idx_df, batch_df = _df(spark_global, texts[:cut]), spark_global.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts[cut:], start=cut)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["matched_id"], r["hamming"])
        for r in phash_match_batch(phash_index(idx_df), batch_df).collect()
    }
    hs = {i: h for i, t in enumerate(texts) if (h := _phash_model(t)) is not None}
    model = {}
    for b in range(cut, len(texts)):
        if b not in hs:
            continue
        cands = [
            (i, (hs[i] ^ hs[b]).bit_count())
            for i in range(cut)
            if i in hs and (hs[i] ^ hs[b]).bit_count() <= PHASH_HAMMING_MAX
        ]
        if cands:
            model[b] = min(cands)  # lowest index doc_id, its hamming
    assert got == model


def test_phash_match_batch_cap_only_drops(spark_global):
    """band_cap ⊆-semantics on an adversarial hot band: 40 identical
    index docs share every band key; capping to 3 must yield a subset of
    the uncapped matches (never a new or changed match), and the
    canonical matched_id (the minimum, doc_id 0) must survive capping
    because cap_banded keeps the LOWEST doc_ids."""
    from mapreduce_framework_spark.pipeline.multimodal_dedup import phash_index

    idx = _df(spark_global, ["the same boilerplate page body"] * 40)
    batch = spark_global.createDataFrame(
        [Row(doc_id=100, text="the same boilerplate page body")],
        "doc_id bigint, text string",
    )
    ih = phash_index(idx).localCheckpoint(eager=True)
    full = {
        (r["doc_id"], r["matched_id"], r["hamming"])
        for r in phash_match_batch(ih, batch).collect()
    }
    capped = {
        (r["doc_id"], r["matched_id"], r["hamming"])
        for r in phash_match_batch(ih, batch, band_cap=3).collect()
    }
    assert capped <= full
    assert (100, 0, 0) in capped  # canonical lowest-id match survives the cap
