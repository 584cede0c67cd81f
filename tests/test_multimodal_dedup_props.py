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

import pytest
# Round 14 (VERDICT r13 item 2): excluded from the driver's default
# pytest run (see pytest.ini); opt in with -m slow.
pytestmark = pytest.mark.slow


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


def test_phash_width_parameterization(spark_global):
    """Round-13 (VERDICT r12 task 2): the 64-cell grid is a deployment
    PARAMETER, not a module edit — phash_of / phash_banded_pairs /
    phash_index / phash_match_batch / phash_fingerprint all take
    cells/bands (resolved + validated by phash_params) with the module
    constants as defaults. Pinned: (a) explicit cells=32 is byte-identical
    to the default; (b) explicit cells=64 equals the two's-complement
    64-bit model WITHOUT touching module constants (the monkeypatch test
    above proved the arithmetic; this proves the parameter path); (c) the
    width-64 matcher finds a retouch on a width-64 index; (d) the
    fingerprint tracks the parameter; (e) bad pairs fail fast."""
    import pytest

    import mapreduce_framework_spark.pipeline.multimodal_dedup as md

    def model64(t):
        if not t:
            return None
        vals = [ord(c) for c in t]
        L, T, h = len(vals), sum(vals), 0
        for j in range(64):
            lo, hi = j * L // 64, (j + 1) * L // 64
            n, s = hi - lo, sum(vals[lo:hi])
            if n > 0 and s * L > T * n:
                h |= 1 << j
        return h - (1 << 64) if h >= (1 << 63) else h

    base = (
        "The quick brown Fox jumps over the lazy dog 0123456789 while "
        "zebras graze on high TEXTURED plains under a violet sky é語!"
    )
    texts = [base, base[:40] + "Q" + base[41:], base.upper(), "short", base[::-1]]
    df = _df(spark_global, texts)

    # (a) explicit 32 == default (module constants untouched)
    assert md.PHASH_CELLS == 32  # the registered q109 width stays
    d_default = {r["doc_id"]: r["phash"] for r in md.phash_of(df).collect()}
    d_32 = {r["doc_id"]: r["phash"] for r in md.phash_of(df, cells=32).collect()}
    assert d_default == d_32

    # (b) explicit 64 == the two's-complement model, sign bit included
    want64 = {i: model64(t) for i, t in enumerate(texts)}
    got64 = {r["doc_id"]: r["phash"] for r in md.phash_of(df, cells=64).collect()}
    assert got64 == want64
    assert any(v < 0 for v in want64.values()), want64
    assert got64 != d_default  # the widths genuinely differ

    # (c) the width-64 matcher: a 1-char retouch of an indexed doc matches
    idx = md.phash_index(_df(spark_global, [base]), cells=64)
    probe = _df(spark_global, [base[:40] + "Q" + base[41:], base[::-1]])
    got = {
        (r["doc_id"], r["matched_id"])
        for r in md.phash_match_batch(idx, probe, cells=64, bands=8).collect()
    }

    def ham64(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {
        (i, 0)
        for i, t in enumerate([base[:40] + "Q" + base[41:], base[::-1]])
        if ham64(model64(t), model64(base)) <= md.PHASH_HAMMING_MAX
    }
    assert got == want and (0, 0) in got  # the retouch is caught at 64

    # (d) the fingerprint tracks the parameter
    assert md.phash_fingerprint() == "ahash-32c-4b-h4"
    assert md.phash_fingerprint(64) == "ahash-64c-8b-h4"
    assert md.phash_fingerprint(cells=64, bands=8) == "ahash-64c-8b-h4"

    # (e) invalid pairs fail fast, before any Spark work
    with pytest.raises(ValueError, match="multiple of 8"):
        md.phash_params(33)
    with pytest.raises(ValueError, match=r"\[8, 64\]"):
        md.phash_params(128)
    with pytest.raises(ValueError, match="8 x bands"):
        md.phash_params(32, 5)


def _bmp24(pixels_rows):
    """Hand-build an uncompressed 24-bit BMP from a top-to-bottom list of
    RGB-tuple rows (the test_decode_image_bmp_via_stdlib recipe)."""
    import struct

    height = len(pixels_rows)
    width = len(pixels_rows[0])
    row_size = (width * 3 + 3) & ~3
    data_offset = 14 + 40

    def row_bytes(px):
        raw = b"".join(bytes((b, g, r)) for (r, g, b) in px)  # BGR on disk
        return raw + b"\x00" * (row_size - len(raw))

    pixel_data = b"".join(row_bytes(r) for r in reversed(pixels_rows))
    header = b"BM" + struct.pack(
        "<IHHI", data_offset + len(pixel_data), 0, 0, data_offset
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    return header + dib + pixel_data


def _png_gray8(rows):
    """Hand-build an 8-bit grayscale PNG (color type 0, no interlace)
    from a list of byte-value rows — stdlib zlib only."""
    import struct
    import zlib

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    w, h = len(rows[0]), len(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)  # filter 0 per line
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_phash_real_pixels_match_text_path_arithmetic(spark_global):
    """Round-13 (VERDICT r12 task 3): the module header has claimed since
    r11 that a real deployment feeds decode_image()'s pixel rows through
    the IDENTICAL grid arithmetic — 'only the vals projection changes'.
    This pins it with REAL decoded rasters, no stand-in: hand-built
    24-bit BMPs (exact-pixel decode proven since r4) and an 8-bit
    grayscale PNG are hashed via phash_of_images (pixel path: vals =
    per-pixel channel sum), while the SAME value sequences are re-encoded
    as code points and hashed via phash_of (text path). Equal hashes at
    BOTH widths ⇒ the entire downstream fold (cell bounds, cumsum,
    integer cross-multiply, bit packing) is one arithmetic; and the
    matcher built on real-pixel hashes catches a single-pixel retouch of
    an indexed image."""
    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.multimodal_dedup import (
        phash_match_batch,
        phash_of,
        phash_of_images,
    )

    # deterministic textured rasters (values vary enough to set bits)
    def raster(seed, w=13, h=7):
        return [
            [
                (
                    (17 * seed + 31 * x + 7 * y) % 256,
                    (23 * seed + 13 * x * y + 5) % 256,
                    (11 * seed + 3 * x + 29 * y * y) % 256,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]

    r0 = raster(1)
    r_retouch = [row[:] for row in r0]
    r_retouch[3][5] = (255, 255, 255)  # single-pixel retouch
    gray_rows = [[(7 * x + 13 * y) % 256 for x in range(11)] for y in range(5)]

    payloads = [
        _bmp24(r0),
        _bmp24(r_retouch),
        _bmp24(raster(9)),
        _png_gray8(gray_rows),
    ]
    img_df = spark_global.createDataFrame(
        [Row(doc_id=i, payload=bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id bigint, payload binary",
    )

    # the text twin: code points = the pixel path's channel sums
    def sums(rows, ch3=True):
        return [
            (sum(px) if ch3 else px) for row in rows for px in row
        ]

    texts = [
        "".join(chr(v) for v in sums(r0)),
        "".join(chr(v) for v in sums(r_retouch)),
        "".join(chr(v) for v in sums(raster(9))),
        "".join(chr(v) for v in sums(gray_rows, ch3=False)),
    ]
    txt_df = spark_global.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )

    for cells in (None, 64):
        via_pixels = {
            r["doc_id"]: r["phash"]
            for r in phash_of_images(img_df, cells=cells).collect()
        }
        via_text = {
            r["doc_id"]: r["phash"]
            for r in phash_of(txt_df, cells=cells).collect()
        }
        assert via_pixels == via_text and len(via_pixels) == 4
        assert len(set(via_pixels.values())) >= 3  # not degenerate

    # the retouch is phash-near its original; the seed-9 raster is far
    idx = phash_of_images(img_df.where("doc_id = 0"))
    probe_hashes = phash_of_images(img_df.where("doc_id IN (1, 2)"))
    # match via the banded matcher over the REAL-pixel index: feed the
    # probe payloads through the text twin is NOT needed — the matcher
    # takes (doc_id, text) docs, so hand it the code-point twin frame
    got = {
        (r["doc_id"], r["matched_id"], r["hamming"])
        for r in phash_match_batch(
            idx, txt_df.where("doc_id IN (1, 2)")
        ).collect()
    }
    assert {(d, m) for d, m, _ in got} == {(1, 0)}  # retouch caught, far miss
    assert all(h <= 4 for _, _, h in got)


def test_phash_of_images_edge_policies(spark_global):
    """The pixel path's stated edge policies, pinned: NULL and empty
    payloads are DROPPED (no-bytes-no-media, matching the text path's
    NULL/zero-length rule), while an undecodable payload RAISES —
    corrupt media is an upstream quality problem, never a silent skip
    (the decode seam's _corruption_as_value_error contract)."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException
    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.multimodal_dedup import (
        phash_of_images,
    )

    good = _bmp24([[(10 * x + y, 200 - 9 * x, 5 * x * y) for x in range(9)]
                   for y in range(4)])
    df = spark_global.createDataFrame(
        [
            Row(doc_id=0, payload=bytearray(good)),
            Row(doc_id=1, payload=None),
            Row(doc_id=2, payload=bytearray(b"")),
        ],
        "doc_id bigint, payload binary",
    )
    got = phash_of_images(df).collect()
    assert [r["doc_id"] for r in got] == [0]

    bad = spark_global.createDataFrame(
        [Row(doc_id=9, payload=bytearray(b"BM corrupt truncated"))],
        "doc_id bigint, payload binary",
    )
    with pytest.raises(PythonException, match="corrupt BMP"):
        phash_of_images(bad).collect()
