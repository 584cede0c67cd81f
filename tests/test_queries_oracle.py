"""Differential tests: every registered query with an oracle must match
DuckDB exactly at the t2 scale (mirrors driver's CORRECTNESS gate, but with
exact cell equality instead of a hash)."""

from __future__ import annotations

import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from mapreduce_framework_spark.registry import all_queries
from tests.oracle import compare

QUERIES = all_queries()

# Queries whose outputs are floating-point aggregates checked with tolerance
# instead of exact equality (documented per-query).
FLOAT_RTOL: dict[str, float] = {}


@pytest.mark.parametrize(
    "name", [n for n, q in sorted(QUERIES.items()) if q.oracle is not None]
)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.builder(spark, sf_dir)
    compare(df, spec.oracle, sf_dir, float_rtol=FLOAT_RTOL.get(name))


@pytest.mark.parametrize(
    "name", [n for n, q in sorted(QUERIES.items()) if q.oracle is None]
)
def test_query_runs(spark, sf_dir, name):
    """Rows-only smoke for non-SQL-expressible ops (driver's weaker check)."""
    df = QUERIES[name].builder(spark, sf_dir)
    assert df.count() >= 0


def test_retired_q55_matches_oracle(spark, sf_dir):
    """q55_simhash_neardup was RETIRED from the registry in round 7
    (registry.py policy item 4; its slot funded q103_cascade_admission).
    Per the policy, its builder and oracle stay in the repo permanently
    and THIS dedicated differential replaces its registry
    parametrization — the local sweep still proves it every run."""
    from mapreduce_framework_spark.pipeline.dedup import (
        _SIMHASH_NEARDUP_ORACLE,
        q55_simhash_neardup,
    )

    compare(q55_simhash_neardup(spark, sf_dir), _SIMHASH_NEARDUP_ORACLE, sf_dir)


def test_retired_q72_matches_oracle(spark, sf_dir):
    """q72_char_ngram_jaccard was RETIRED from the registry in round 7
    (registry.py policy item 4; its slot funded
    q104_full_cascade_admission). Per the policy, its builder and oracle
    stay in the repo permanently and THIS dedicated differential replaces
    its registry parametrization — the local sweep still proves it every
    run (it remains the exact verify-stage differential for q84)."""
    from mapreduce_framework_spark.pipeline.dedup import (
        CHAR_DOC_CAP,
        _char_jaccard_oracle,
        q72_char_ngram_jaccard,
    )

    compare(
        q72_char_ngram_jaccard(spark, sf_dir),
        _char_jaccard_oracle(CHAR_DOC_CAP),
        sf_dir,
    )


def test_retired_q34_matches_oracle(spark, sf_dir):
    """q34_ann_bruteforce was RETIRED from the registry in round 8
    (registry.py policy item 4; its slot funded
    q105_training_corpus_decontaminated). Per the policy, its builder and
    oracle stay in the repo permanently and THIS dedicated differential
    replaces its registry parametrization — it remains the exact recall
    baseline q35/q56 are measured against, and bench.py keeps timing it
    directly for the r1-subset series."""
    from mapreduce_framework_spark.pipeline.similarity import (
        _ANN_BRUTEFORCE_ORACLE,
        q34_ann_bruteforce,
    )

    compare(q34_ann_bruteforce(spark, sf_dir), _ANN_BRUTEFORCE_ORACLE, sf_dir)


def test_retired_q30_matches_oracle(spark, sf_dir):
    """q30_ngram_jaccard_neardup was RETIRED from the registry in round 9
    (registry.py policy item 4; its slot funded q106_admission_report).
    Per the policy, its builder and oracle stay in the repo permanently
    and THIS dedicated differential replaces its registry parametrization
    — it remains the exact-Jaccard baseline the LSH forms q31/q84 carry
    forward, and bench.py keeps timing it directly for the r1-subset
    series. (The shared _JACCARD_ORACLE constant is still registered
    through q31, so this also cross-checks exact-vs-LSH equality.)"""
    from mapreduce_framework_spark.pipeline.dedup import (
        _JACCARD_ORACLE,
        q30_ngram_jaccard_neardup,
    )

    compare(q30_ngram_jaccard_neardup(spark, sf_dir), _JACCARD_ORACLE, sf_dir)


def test_retired_q36_matches_oracle(spark, sf_dir):
    """q36_embedding_neardup was RETIRED from the registry in round 13
    (registry.py policy item 4; its slot funded
    q110_media_gated_admission). Per the policy, its builder and oracle
    stay in the repo permanently and THIS dedicated differential replaces
    its registry parametrization — it remains the exact-cosine near-dup
    baseline the banded/bucketed scale paths q35/q56 carry forward, and
    bench.py keeps timing it directly."""
    from mapreduce_framework_spark.pipeline.similarity import (
        _EMBEDDING_NEARDUP_ORACLE,
        q36_embedding_neardup,
    )

    compare(
        q36_embedding_neardup(spark, sf_dir), _EMBEDDING_NEARDUP_ORACLE, sf_dir
    )


def test_phash_64_cells_matches_duckdb_oracle(spark, sf_dir):
    """Round-13: CROSS-ENGINE proof of the production 64-cell width (the
    SCALING.md birthday-mass lever). The 64-bit grid was proven against a
    pure-python two's-complement model in r12; this closes the remaining
    gap by running q109's shape at cells=64 against a real DuckDB oracle
    on the corpus — phash_duck(cells=64) inlines the sign-bit value as
    the literal -2^63 (DuckDB's << hard-errors on 1<<63 where Spark's
    wrapping shiftleft and numpy's wrapping << agree), so Spark's banded
    join and DuckDB's all-pairs filter must produce identical pair sets
    and Hamming distances over genuinely sign-bit-bearing hashes. The
    registered q109 stays at 32; this is the permanent local gate for
    the width a 100 TB deployment selects."""
    from mapreduce_framework_spark.pipeline.multimodal_dedup import (
        PHASH_HAMMING_MAX,
        phash_banded_pairs,
        phash_duck,
    )

    oracle64 = f"""
    WITH {phash_duck("documents", cells=64)}
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM ph a JOIN ph b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAMMING_MAX}
    ORDER BY id1, id2
    """
    from mapreduce_framework_spark.catalog import table

    compare(
        phash_banded_pairs(table(spark, "documents", sf_dir), cells=64),
        oracle64,
        sf_dir,
    )

    # the equality above proves nothing about the sign bit unless the
    # corpus actually sets it — assert some hashes are negative int64
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    neg = con.execute(
        f"WITH {phash_duck('documents', cells=64)} "
        "SELECT count(*) FROM ph WHERE phash < 0"
    ).fetchone()[0]
    assert neg > 0, "corpus never sets cell 63 — sign-bit path unexercised"


def test_q107_candidate_matches_oracle(spark, sf_dir):
    """q107_decontaminating_admission — staged library-first in round 9,
    REGISTERED in round 10 (q63's retired slot, the scheduled swap). The
    registry parametrization above now covers the plain differential;
    this test keeps the stronger structural assertions: the
    contamination plants (+30M verbatim benchmark copies) must all be
    rejected and at least one must carry the 'contaminated' tier, so the
    decon tier provably FIRED rather than vacuously matching."""
    from mapreduce_framework_spark.operators.streaming_replay import (
        _q107_oracle,
        q107_decontaminating_admission,
    )

    df = q107_decontaminating_admission(spark, sf_dir)
    rows = df.collect()
    # the decon tier actually fired: the +30M verbatim benchmark copies
    # are rejected, and at least one carries the 'contaminated' tier
    # (copies whose text an indexed doc duplicates fall to a dedup tier
    # first, by design)
    plants = [r for r in rows if r["doc_id"] >= 30_000_000]
    assert plants and all(not r["admitted"] for r in plants)
    assert any(r["tier"] == "contaminated" for r in rows)
    compare(df, _q107_oracle(), sf_dir)


def test_retired_q63_matches_oracle(spark, sf_dir):
    """q63_posexplode was RETIRED from the registry in round 10
    (registry.py policy item 4; its slot funded
    q107_decontaminating_admission — the four-tier decontaminating
    streaming cascade). Per the policy, its builder and oracle stay in
    the repo permanently and THIS dedicated differential replaces its
    registry parametrization — its positional-explode surface stays
    registered through q23's array battery."""
    from mapreduce_framework_spark.operators.functions_battery import (
        _Q63_POSEXPLODE_ORACLE,
        q63_posexplode,
    )

    compare(q63_posexplode(spark, sf_dir), _Q63_POSEXPLODE_ORACLE, sf_dir)


def test_q109_candidate_matches_oracle(spark, sf_dir):
    """q109_multimodal_phash_neardup — staged library-first in round 11,
    REGISTERED round 12 into the retired q29's window slot exactly as
    the two-SF pre-registration evidence here scheduled (registry.py
    ROUND-12 EXECUTED; the q105..q109 playbook). The perceptual
    average-hash near-dup tier over the multimodal payload stand-in,
    checked against the all-pairs exact DuckDB oracle. Structural
    assertion: the corpus's planted near-dup docs actually produce pairs
    (a vacuously-empty differential would prove nothing)."""
    from mapreduce_framework_spark.pipeline.multimodal_dedup import (
        _Q109_ORACLE,
        q109_multimodal_phash_neardup,
    )

    df = q109_multimodal_phash_neardup(spark, sf_dir)
    assert df.count() > 0
    compare(df, _Q109_ORACLE, sf_dir)


def test_q109_candidate_matches_oracle_smallest_sf(spark):
    """The q109 oracle proven at the SECOND scale factor explicitly
    (sf0.001), so the two-SF pre-registration evidence is self-contained
    in the suite rather than dependent on how the sweep was invoked."""
    from mapreduce_framework_spark.pipeline.multimodal_dedup import (
        _PHASH_ORACLE,
        _Q109_ORACLE,
        phash_of,
        q109_multimodal_phash_neardup,
    )
    from mapreduce_framework_spark.catalog import table

    base = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    df = q109_multimodal_phash_neardup(spark, base)
    assert df.count() > 0
    compare(df, _Q109_ORACLE, base)
    # the hash itself, bit-exact per doc (finer-grained than the pairs)
    compare(phash_of(table(spark, "documents", base)), _PHASH_ORACLE, base)


def test_q110_candidate_matches_oracle(spark, sf_dir):
    """q110_media_gated_admission is LIBRARY-FIRST (round 12): the
    SIX-tier media-gated admission replay (quality → exact → media/phash
    → MinHash → semantic → span-decontamination — every opt-in tier of
    the production sink engaged), checked against the shared
    _gated_oracle(media_tier=True) — registered-query-grade, but NOT
    registered: the registry is at capacity and the scheduled retiree
    q36 is behind-window until r13 (registry.py ROUND-13 HANDOFF). This
    differential makes the r13 registration a one-commit slot change
    with a proven oracle — the q105..q109 playbook. Structural
    assertion: the retouch plants actually produce 'media_dup' rows (a
    replay where the tier never fires would prove nothing about it)."""
    from mapreduce_framework_spark.operators.streaming_replay import (
        _q110_oracle,
        q110_media_gated_admission,
    )

    df = q110_media_gated_admission(spark, sf_dir)
    assert df.where("tier = 'media_dup'").count() > 0
    compare(df, _q110_oracle(), sf_dir)


def test_q110_candidate_matches_oracle_smallest_sf(spark):
    """The q110 oracle proven at the SECOND scale factor explicitly
    (sf0.001), so the two-SF pre-registration evidence is self-contained
    in the suite rather than dependent on how the sweep was invoked."""
    from mapreduce_framework_spark.operators.streaming_replay import (
        _q110_oracle,
        q110_media_gated_admission,
    )

    base = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    df = q110_media_gated_admission(spark, base)
    assert df.where("tier = 'media_dup'").count() > 0
    compare(df, _q110_oracle(), base)


def test_q108_oracle_text_unchanged_by_gated_refactor():
    """The registered q108's oracle is now produced by the shared
    _gated_oracle body (round 12). Its text with media_tier=False must
    stay EXACTLY the SQL the driver has been hashing green since r11 —
    the media fragments must vanish without a trace, not merely stay
    semantically equivalent, because the registered oracle string IS the
    driver contract. Anchors: no media CTE names, identical tier CASE."""
    from mapreduce_framework_spark.operators.streaming_replay import _q108_oracle

    sql = _q108_oracle()
    for fragment in ("miv", "mbv", "mdc", "media_dup", "msurv", "retouch", "20000000"):
        assert fragment not in sql
    assert "FROM surv)" in sql  # t1 reads the unmodified survivor CTE


def test_retired_q47_matches_oracle(spark, sf_dir):
    """q47_sql_frontend_window was RETIRED from the registry in round 11
    (registry.py policy item 4; its slot funded
    q108_quality_gated_admission — the five-tier quality-gated streaming
    admission cascade). Per the policy, its builder and oracle stay in
    the repo permanently and THIS dedicated differential replaces its
    registry parametrization — its SQL-text window surface stays
    registered through q46 (SQL frontend) and q18/q19 (window
    battery)."""
    from mapreduce_framework_spark.operators.sql_frontend import (
        _Q47_SQL_FRONTEND_WINDOW_ORACLE,
        q47_sql_frontend_window,
    )

    compare(
        q47_sql_frontend_window(spark, sf_dir),
        _Q47_SQL_FRONTEND_WINDOW_ORACLE,
        sf_dir,
    )

def test_q107_no_centroid_degradation_matches_oracle(spark, sf_dir, tmp_path):
    """The round-10 reconciliation of q107's degenerate path (ADVICE):
    with NO usable centroid (empty embeddings table) the builder degrades
    to the lexical two-tier cascade WITH the decontamination tier still
    on — and the oracle, whose contamination CTEs are unconditional while
    its semantic CTEs vanish with an empty `e`, must match it exactly.
    Before the fix the fallback dropped the decon tier entirely and this
    differential would fail."""
    import pyarrow.parquet as pq

    from mapreduce_framework_spark.operators.streaming_replay import (
        _q107_oracle,
        q107_decontaminating_admission,
    )

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "embeddings":
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(tmp_path / f"{t}.parquet"))
    df = q107_decontaminating_admission(spark, str(tmp_path))
    rows = df.collect()
    # the decon tier fired on the degraded path
    assert any(r["tier"] == "contaminated" for r in rows)
    # nothing is semantic-rejected without centroids
    assert all(r["tier"] != "semantic" for r in rows)
    compare(df, _q107_oracle(), str(tmp_path))


def test_q110_no_centroid_degradation_matches_oracle(spark, sf_dir, tmp_path):
    """The staged q110's degenerate path: with NO usable centroid the
    replay degrades to the LEXICAL sink — which since round 12 carries
    the phash tier too (the tier-parity change this staging motivated).
    The media, quality, and decon tiers must all keep firing on the
    degraded path, semantic must vanish (the oracle's semantic CTEs
    empty out with `e`; its media/quality/decon CTEs are unconditional),
    and the differential must hold exactly. Before the parity change the
    fallback would have silently dropped perceptual media dedup and this
    test would fail on tier attribution."""
    import pyarrow.parquet as pq

    from mapreduce_framework_spark.operators.streaming_replay import (
        _q110_oracle,
        q110_media_gated_admission,
    )

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "embeddings":
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(tmp_path / f"{t}.parquet"))
    df = q110_media_gated_admission(spark, str(tmp_path))
    rows = df.collect()
    assert any(r["tier"] == "media_dup" for r in rows)
    assert any(r["tier"] == "quality" for r in rows)
    assert any(r["tier"] == "contaminated" for r in rows)
    assert all(r["tier"] != "semantic" for r in rows)
    compare(df, _q110_oracle(), str(tmp_path))

def test_q108_candidate_matches_oracle(spark, sf_dir):
    """q108_quality_gated_admission — staged library-first in round 10,
    REGISTERED in round 11 (q47's retired slot, the scheduled swap). The
    registry parametrization now covers the plain differential; this
    test keeps the stronger structural assertions: the quality tier
    actually FIRED, and strict precedence holds (quality-rejected docs
    carry matched_id -1 and never reach the index tiers)."""
    from mapreduce_framework_spark.operators.streaming_replay import (
        _q108_oracle,
        q108_quality_gated_admission,
    )

    df = q108_quality_gated_admission(spark, sf_dir)
    rows = df.collect()
    tiers = {r["tier"] for r in rows}
    assert "quality" in tiers  # the gate fired on the corpus itself
    for r in rows:
        if r["tier"] == "quality":
            assert r["matched_id"] == -1 and not r["admitted"]
    compare(df, _q108_oracle(), sf_dir)

def test_q108_candidate_matches_oracle_on_nulls(spark, tmp_path):
    """q108 (registered r11) armored against the dirty-data
    axis the sweep can't reach (the sweep's differential covers only
    REGISTERED oracles): q108's five-tier replay vs its oracle on the
    NULLs variant — NULL text must fail the quality gate CLOSED with the
    identical NOT COALESCE(pass, FALSE) arithmetic on both engines, and
    every downstream tier must keep its family NULL policy under the
    thinned corpus."""
    import importlib.util

    from mapreduce_framework_spark.operators.streaming_replay import (
        _q108_oracle,
        q108_quality_gated_admission,
    )

    spec = importlib.util.spec_from_file_location(
        "robustness_sweep_for_q108",
        os.path.join(REPO_ROOT, "tools", "robustness_sweep.py"),
    )
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)
    # smallest SF on purpose (the sweep variant is rebuilt per-run); derive
    # the root from the same env seam conftest uses, not a literal path
    # (round-10 ADVICE)
    base = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    rs.build_nulls(base, str(tmp_path))
    df = q108_quality_gated_admission(spark, str(tmp_path))
    assert any(r["tier"] == "quality" for r in df.collect())
    compare(df, _q108_oracle(), str(tmp_path))


def test_q110_candidate_matches_oracle_on_nulls(spark, tmp_path):
    """The staged q110 armored the same way (the q108 precedent): the
    six-tier media-gated replay vs its oracle on the NULLs variant —
    NULL-text docs have no pixels (never phash-indexed, never
    phash-rejected: the multimodal family's no-bytes-no-media policy),
    their retouch plants are NULL too ('a' || NULL = NULL in both
    engines) and fall where the other tiers' NULL policies put them, and
    every other tier keeps its family NULL policy under the thinned
    corpus."""
    import importlib.util

    from mapreduce_framework_spark.operators.streaming_replay import (
        _q110_oracle,
        q110_media_gated_admission,
    )

    spec = importlib.util.spec_from_file_location(
        "robustness_sweep_for_q110",
        os.path.join(REPO_ROOT, "tools", "robustness_sweep.py"),
    )
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)
    base = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    rs.build_nulls(base, str(tmp_path))
    df = q110_media_gated_admission(spark, str(tmp_path))
    compare(df, _q110_oracle(), str(tmp_path))
