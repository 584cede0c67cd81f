"""Boundary-exact property tests for the multimodal perceptual-hash
near-dup family (pipeline/multimodal_dedup.py — q109, registered in
round 12) against sequential pure-Python models.

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
  lowest-index-match rule; its band_cap degradation never INVENTS a
  match (every reported pair is a genuine within-threshold index doc),
  but under adversarial saturation matched_id can shift to a retained
  higher-id member — both directions pinned below (the identical-doc
  case where the canonical pick trivially survives, AND the
  non-identical hot cluster where the true best match is capped out and
  the row changes — round-11 ADVICE).

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


def test_phash_match_batch_cap_shifts_matched_id_under_saturation(spark_global):
    """Round-11 ADVICE: cap_banded keeps the LOWEST doc_ids per (band,
    bsig) group, so lower-id NON-matching docs can saturate every band
    group the true best match occupies and evict it — shifting
    matched_id to a retained higher-id member. Row-level ⊆ of the
    uncapped output therefore does NOT hold in general (the identical-doc
    test above cannot show this: there the lowest id is also the
    canonical match). This pins the documented degradation exactly:

    - H = the batch doc's hash; index doc 50 has phash == H (hamming 0,
      the true best/lowest-id match);
    - per band b, three saturators (ids 3b..3b+2) share band b's exact
      byte with H but differ by 2 bits in EACH other band (hamming 6 >
      threshold, so none is a match) → with band_cap=3, doc 50 is capped
      out of every band group it shares with the probe;
    - index doc 60 differs from H by exactly 1 bit inside band 0
      (hamming 1, a genuine match): its band-0 byte is its OWN
      unsaturated group so it is retained, and the build side's
      single-bit-flip variants land it back on the probe's exact key.

    Uncapped → (100, 50, 0). Capped → (100, 60, 1): a real
    within-threshold match (capping never invents a pair), but a
    DIFFERENT row than any uncapped one."""
    from pyspark.sql import Row

    text = "a genuinely varied probe document body 0123 é語 with texture"
    H = _phash_model(text)
    assert H is not None and H != 0
    sat_rows = []
    for b in range(4):
        flips = 0
        for other in range(4):
            if other != b:
                flips ^= 0b11 << (8 * other)  # 2 bits per other band → hamming 6
        for k in range(3):
            sat_rows.append(Row(doc_id=3 * b + k, phash=H ^ flips))
    index_hashes = spark_global.createDataFrame(
        sat_rows
        + [Row(doc_id=50, phash=H), Row(doc_id=60, phash=H ^ 1)],
        "doc_id bigint, phash bigint",
    )
    batch = spark_global.createDataFrame(
        [Row(doc_id=100, text=text)], "doc_id bigint, text string"
    )
    full = {
        (r["doc_id"], r["matched_id"], r["hamming"])
        for r in phash_match_batch(index_hashes, batch).collect()
    }
    capped = {
        (r["doc_id"], r["matched_id"], r["hamming"])
        for r in phash_match_batch(index_hashes, batch, band_cap=3).collect()
    }
    assert full == {(100, 50, 0)}  # uncapped: the true lowest-id match
    assert capped == {(100, 60, 1)}  # capped: shifted, NOT ⊆ of uncapped
    # validity preserved: the reported match is a genuine index doc
    # within the threshold — capping degraded the pick, not the truth
    assert ((H ^ 1) ^ H).bit_count() <= PHASH_HAMMING_MAX


def test_phash_64_cell_grid_generalizes(spark_global, monkeypatch):
    """Round-12 (the soak's birthday-mass finding, SCALING.md): a 32-bit
    hash at Hamming ≤ 4 carries ~1e-5 accidental-match probability per
    pair, so at ~1e5 indexed docs every probe doc expects an accidental
    match — the production lever at scale is the 64-cell grid (false
    mass ~4e-14/pair). This pins that the SAME arithmetic genuinely
    generalizes: with PHASH_CELLS=64 / PHASH_BANDS=8 patched, (a) the
    Spark hash equals a pure-python TWO'S-COMPLEMENT model bit for bit —
    cell 63 packs into the int64 sign bit, which xor/bit_count/Hamming
    handle unchanged — and (b) the 8-band pigeonhole candidate join
    still equals the all-pairs model exactly (1-bit variants over 8
    bands are complete for any threshold < 16, so ≤ 4 has margin)."""
    import mapreduce_framework_spark.pipeline.multimodal_dedup as md

    monkeypatch.setattr(md, "PHASH_CELLS", 64)
    monkeypatch.setattr(md, "PHASH_BANDS", 8)

    def model(t):
        if not t:
            return None
        vals = [ord(c) for c in t]
        L, T, h = len(vals), sum(vals), 0
        for j in range(64):
            lo, hi = j * L // 64, (j + 1) * L // 64
            n, s = hi - lo, sum(vals[lo:hi])
            if n > 0 and s * L > T * n:
                h |= 1 << j
        return h - (1 << 64) if h >= (1 << 63) else h  # int64 two's complement

    base = (
        "The quick brown Fox jumps over the lazy dog 0123456789 while "
        "zebras graze on high TEXTURED plains under a violet sky é語!"
    )
    texts = [
        base,
        base,  # exact duplicate: hamming 0
        base[:40] + "Q" + base[41:],  # 1-char retouch: small hamming
        base.upper(),  # heavy rewrite
        "aaaa",  # flat doc: no cell above mean → phash 0
        "short",  # L < 64: empty cells stay 0
        "",  # dropped (no pixels)
        base[::-1],  # distant
    ]
    df = _df(spark_global, texts)
    want = {i: model(t) for i, t in enumerate(texts) if model(t) is not None}
    got = {r["doc_id"]: r["phash"] for r in md.phash_of(df).collect()}
    assert got == want
    # at least one doc actually uses the sign bit, else (a) proves nothing
    assert any(v < 0 for v in want.values()), want

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want_pairs = {
        (i, j, ham(want[i], want[j]))
        for i in want
        for j in want
        if i < j and ham(want[i], want[j]) <= md.PHASH_HAMMING_MAX
    }
    got_pairs = {
        (r["id1"], r["id2"], r["hamming"])
        for r in md.phash_banded_pairs(df).collect()
    }
    assert got_pairs == want_pairs and len(want_pairs) > 0
