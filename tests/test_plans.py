"""Physical-plan quality gates — the 100 TB design checks.

Correctness says nothing about scale: these tests pin the *plan shapes*
that make the queries survive a 1000-executor / 100 TB deployment —
predicate pushdown reaching the parquet scan, column pruning, broadcast
joins for small dims, map-side partial aggregation, and top-k without a
global sort."""

from __future__ import annotations

import pytest

from mapreduce_framework_spark.operators.mr_queries import q01_wordcount
from mapreduce_framework_spark.operators.relational import (
    q11_filter_project,
    q12_join_revenue_per_nation,
    q13_broadcast_join,
    q14_semi_join,
    q20_global_topk,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q11_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(q11_filter_project(spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    # column pruning: the scan must not read all 11 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema, f"no pruning: {read_schema}"


def test_q13_broadcasts_the_dim(spark, sf_dir):
    plan = _plan(q13_broadcast_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the filter on the dim side must be pushed to its scan
    assert "p_size" in plan.split("PushedFilters:")[1]


def test_q12_small_dims_broadcast(spark, sf_dir):
    plan = _plan(q12_join_revenue_per_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # nation (25 rows) must never shuffle


def test_q14_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(q14_semi_join(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q01_partial_aggregation(spark, sf_dir):
    """Word count must plan a map-side partial count before the shuffle —
    the algebraic advantage over the reference's holistic reduce."""
    plan = _plan(q01_wordcount(spark, sf_dir))
    assert "partial_count" in plan or "Partial" in plan, plan


def test_q20_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(q20_global_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "top-k planned as a full sort"


def test_dedup_pipeline_no_cartesian_product(spark, sf_dir):
    """The scale-path dedup queries must generate candidates via equi-joins
    (band/bucket keys), never a cross join — the difference between O(n·b)
    and O(n²) at 100 TB. Pins the shape before any refactor regresses it."""
    from mapreduce_framework_spark.pipeline.dedup import (
        q31_minhash_lsh_neardup,
        q71_dedup_corpus_output,
        q73_simhash_banded_neardup,
        q84_char_ngram_lsh_neardup,
        q87_boilerplate_doc_stats,
    )
    from mapreduce_framework_spark.pipeline.multimodal_dedup import (
        q109_multimodal_phash_neardup,
    )

    for builder in (
        q31_minhash_lsh_neardup,
        q71_dedup_corpus_output,
        q73_simhash_banded_neardup,
        q84_char_ngram_lsh_neardup,
        q87_boilerplate_doc_stats,
        # audited here BEFORE its r12 registration (staged r11); kept
        # after the swap — the whole-registry audit now covers it too,
        # and this direct form stays the fast targeted check
        q109_multimodal_phash_neardup,
    ):
        plan = _plan(builder(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{builder.__name__}: cross join in plan"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{builder.__name__}: nested-loop join in plan"
        )


def test_q71_drop_list_anti_join_is_broadcast(spark, sf_dir):
    """q71 removes near-duplicates by anti-joining the (tiny) drop list;
    at 100 TB the corpus side must stream — the drop list broadcasts."""
    from mapreduce_framework_spark.pipeline.dedup import q71_dedup_corpus_output

    plan = _plan(q71_dedup_corpus_output(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_ann_candidate_joins_are_equi_joins(spark, sf_dir):
    """q35/q56 candidate generation must be hash equi-joins on
    (table, bucket) / cent_id — the whole point of LSH/IVF is never
    scanning Q x N pairs. (q34 brute force is the sanctioned exception:
    its broadcast nested-loop IS the algorithm.)"""
    from mapreduce_framework_spark.pipeline.similarity import (
        q35_ann_lsh,
        q56_ann_ivf,
    )

    plan = _plan(q35_ann_lsh(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    # losing the (tbl, bucket) equi keys would plan a nested-loop join,
    # not a CartesianProduct — forbid it explicitly
    assert "BroadcastNestedLoopJoin" not in plan, plan

    plan = _plan(q56_ann_ivf(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    # q56's centroid-assignment crossJoin against the tiny centroid set IS
    # the algorithm, so exactly the two nested-loop joins it plans
    # (corpus x cents, queries x cents) are allowed — no more
    import re

    assert len(re.findall(r"\) BroadcastNestedLoopJoin\b", plan)) <= 2, plan


def test_q80_benchmark_side_broadcasts(spark, sf_dir):
    """Contamination check: the benchmark shingle set must broadcast so
    the corpus side streams without a shuffle."""
    from mapreduce_framework_spark.pipeline.sampling import q80_contamination_check

    plan = _plan(q80_contamination_check(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_q81_composed_pipeline_keeps_scale_shapes(spark, sf_dir):
    """The composed training-corpus pipeline must keep every stage's scale
    shape: broadcast anti-join for the drop list, no cross joins anywhere,
    and exactly one Window operator (the per-source pack) — a second
    window (e.g. a global running sum) would add a serializing shuffle."""
    import re

    from mapreduce_framework_spark.pipeline.sampling import q81_training_corpus

    plan = _plan(q81_training_corpus(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\) Window\b", plan)) == 1, plan


def test_training_corpus_decontaminated_keeps_scale_shapes(spark, sf_dir):
    """The 5-stage decontaminated composition keeps every stage's scale
    shape: the benchmark probe stays a SEMI-join on the window hash (the
    index side never explodes into the corpus), the drop list stays a
    broadcast anti-join, no cross joins, and the per-source pack stays
    the ONLY Window in the whole plan (decontaminate's trim is anti-join
    + partial-agg reassembly, deliberately window-free — same as q81's
    exactly-one-window pin)."""
    import re

    from pyspark.sql import functions as F

    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.sampling import training_corpus
    from mapreduce_framework_spark.pipeline.span_dedup import span_index

    docs = table(spark, "documents", sf_dir)
    train = docs.where(F.col("doc_id") % 17 != 0)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    plan = _plan(training_corpus(train, benchmark_index=span_index(bench)))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\) Window\b", plan)) == 1, plan


def test_whole_stage_codegen_on_scan_paths(spark, sf_dir):
    # AQE shows codegen spans only in the final (executed) plan
    df = q11_filter_project(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    # formatted mode marks whole-stage-codegen operators with a '*' prefix
    import re

    assert re.search(r"\* (Filter|Project|ColumnarToRow|Sort)", plan), plan


def test_q88_repetition_mode_is_single_pass(spark, sf_dir):
    """The per-doc top-2-gram mode is computed per row since round 14
    (run length over the sorted gram array — OPTIMIZATION_r14.md §5):
    ONE corpus scan, no aggregate exchange, no join; the only exchange
    allowed is the presentation sort's range partitioning. Still never a
    cross join."""
    import re

    from mapreduce_framework_spark.pipeline.quality import q88_repetition_stats

    plan = _plan(q88_repetition_stats(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q89_scrub_is_shuffle_free(spark, sf_dir):
    """The redaction scan must not shuffle: the only exchange allowed is
    the presentation sort's range partitioning."""
    from mapreduce_framework_spark.pipeline.quality import q89_denylist_scrub

    plan = _plan(q89_denylist_scrub(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan, plan


def test_q90_rates_broadcast_back_onto_the_scan(spark, sf_dir):
    """Domain mixing: the per-source rate table (20 rows) must broadcast
    back onto the narrow tok frame, which since round 14 is materialized
    ONCE (localCheckpoint — OPTIMIZATION_r14.md §5): the plan reads the
    checkpointed RDD for both consumers and contains NO parquet re-scan
    (pre-r14 it tokenized the corpus twice; the totals window must still
    not add a third pass)."""
    from mapreduce_framework_spark.pipeline.sampling import q90_domain_mix_resample

    import re

    plan = _plan(q90_domain_mix_resample(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    # formatted explain lists each operator twice (tree + detail section);
    # count the numbered detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) >= 2, plan


def test_q91_cross_snapshot_band_join_is_equi(spark, sf_dir):
    """Incremental dedup: candidates must come from the cross-side band
    equi-join — no cartesian/nested-loop join anywhere except the 1-row
    snapshot-cut scalar broadcast."""
    import re

    from mapreduce_framework_spark.pipeline.dedup import q91_cross_snapshot_dedup

    plan = _plan(q91_cross_snapshot_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the broadcast of the 1-row
    # (max(doc_id)+1)/2 scalar onto the two side scans
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 2, plan


def test_q92_tfidf_aggregates_are_partial(spark, sf_dir):
    from mapreduce_framework_spark.pipeline.text_analysis import q92_tfidf_topk

    plan = _plan(q92_tfidf_topk(spark, sf_dir))
    assert "partial_count" in plan or "Partial" in plan, plan
    assert "CartesianProduct" not in plan


def test_q93_quantization_is_shuffle_free(spark, sf_dir):
    """Per-row array arithmetic: no exchange except the presentation sort."""
    from mapreduce_framework_spark.pipeline.similarity import q93_embedding_quantize

    plan = _plan(q93_embedding_quantize(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan, plan


def test_funnel_family_is_aggregation_only(spark, sf_dir):
    """q97–q99 must plan as chains of (partial) aggregations and window
    sorts over ONE events scan each — no self-join, no cartesian, no
    nested loop. That is what makes them one-pass at 100 TB."""
    import re

    from mapreduce_framework_spark.operators.funnel import (
        q97_session_funnel,
        q98_cohort_retention,
        q99_session_transitions,
    )

    for q, max_scans in ((q97_session_funnel, 1), (q98_cohort_retention, 2), (q99_session_transitions, 1)):
        plan = _plan(q(spark, sf_dir))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        assert n_scans <= max_scans, f"{q.__name__}: {n_scans} scans\n{plan}"


def test_q100_chunking_is_shuffle_free(spark, sf_dir):
    """Sliding-window chunking is per-row array arithmetic: the only
    exchange allowed is the presentation sort's range partitioning."""
    from mapreduce_framework_spark.pipeline.sampling import q100_token_chunking

    plan = _plan(q100_token_chunking(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "CartesianProduct" not in plan


def test_q101_keep_first_is_partial_aggregated(spark, sf_dir):
    """The span-dedup keep-first rule must plan as a map-side-combinable
    min() AGGREGATE (partial_min before the shuffle), never a row_number
    window sort — a 10^9-occurrence boilerplate span collapses to one row
    per map task, where a window would sort the whole hot partition."""
    from mapreduce_framework_spark.pipeline.span_dedup import q101_span_dedup

    plan = _plan(q101_span_dedup(spark, sf_dir))
    assert "partial_min" in plan, plan
    assert "row_number" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q102_candidates_come_only_from_cell_equi_join(spark, sf_dir):
    """Semantic-dedup candidates must come from the shared-cell equi-join;
    the only nested-loop allowed is the sanctioned broadcast centroid
    assignment (O(K*dim) build side with a fitted codebook)."""
    from mapreduce_framework_spark.pipeline.semantic_dedup import q102_semantic_dedup

    plan = _plan(q102_semantic_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # formatted explain names each operator twice (tree + details); the
    # assignment subplan appears on both sides of the cell self-join, so
    # <= 4 mentions = at most the 2 sanctioned broadcast-assignment
    # instances and nothing else
    assert plan.count("BroadcastNestedLoopJoin") <= 4
    # round 13: the candidate join must be an EQUI-join of any strategy.
    # The array-form assignment (similarity._nearest_cells) gives the
    # checkpointed assignment frame a size estimate tracking its real
    # (sf-tiny) size, so the planner now legitimately broadcasts one side
    # of the cell self-join here; the estimate scales with the corpus, so
    # at scale it stays SortMerge/ShuffledHash. The banned shape remains
    # any non-equi candidate path (asserted above).
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_temporal_joins_keep_scale_shapes(spark, sf_dir):
    """q57's as-of is a single-shuffle window over a tagged union (no join
    at all, so trivially no nested loop); q58's range join must plan as a
    hash equi-join on (user, bin) — the whole point of the binning — with
    the exact range predicate applied as a post-join filter, never a
    BroadcastNestedLoopJoin/CartesianProduct over the raw inequality."""
    from mapreduce_framework_spark.operators.temporal import (
        q57_asof_join,
        q58_range_join_binned,
    )

    asof = _plan(q57_asof_join(spark, sf_dir))
    assert "CartesianProduct" not in asof
    assert "BroadcastNestedLoopJoin" not in asof
    assert "Window" in asof  # the merge-sorted-streams running last()

    rng = _plan(q58_range_join_binned(spark, sf_dir))
    assert "CartesianProduct" not in rng
    assert "BroadcastNestedLoopJoin" not in rng
    # candidate generation is an equi-join keyed on the exploded bin
    assert "Join" in rng and "bin" in rng


@pytest.mark.slow  # r14 item 2: excluded from the default run (pytest.ini)
def test_whole_registry_plan_audit(spark, sf_dir):
    """Every registered query's physical plan, audited for the three
    scale anti-patterns: CartesianProduct (unbounded quadratic),
    BatchEvalPython (row-at-a-time Python — the banned slow path;
    Arrow-batched mapInPandas plans as ArrowEvalPython/MapInPandas
    instead), and BroadcastNestedLoopJoin anywhere outside the THREE
    sanctioned broadcast-bounded forms (q34's brute-force oracle and the
    q56/q102 broadcast codebook assignments — each the documented cross
    join of a corpus scan with a bounded broadcast side, verified
    per-query above and in SCALING.md; q55, formerly the fourth, was
    retired from the registry in round 7). A new registration that
    introduces any of these fails here, not in a 100x-scale
    postmortem."""
    from mapreduce_framework_spark.registry import all_queries

    sanctioned_bnlj = {
        "q34_ann_bruteforce",
        "q56_ann_ivf",
        "q102_semantic_dedup",
    }
    offenders = {}
    for name, spec in all_queries().items():
        plan = _plan(spec.builder(spark, sf_dir))
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")
        if "BroadcastNestedLoopJoin" in plan and name not in sanctioned_bnlj:
            bad.append("BroadcastNestedLoopJoin")
        if bad:
            offenders[name] = bad
    assert offenders == {}, f"scale anti-patterns: {offenders}"


def _exact_tier(docs):
    from mapreduce_framework_spark.pipeline.dedup import (
        exact_fingerprint_index,
        exact_match_batch,
    )

    return exact_match_batch(
        exact_fingerprint_index(docs).localCheckpoint(eager=True), docs
    )


def test_library_surface_plan_audit(spark, sf_dir, tmp_path):
    """The registry audit's twin for the round-6 LIBRARY-FIRST surfaces
    (no registry slot ⇒ the whole-registry audit never sees them): every
    lifecycle plan is scanned for the same three anti-patterns. The only
    sanctioned BroadcastNestedLoopJoin is the codebook-fit/assignment
    broadcast scoring — and the current forms materialize it eagerly, so
    the audited downstream plans must contain NONE at all."""
    from pyspark.sql import functions as F

    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.codebook import fit_codebook
    from mapreduce_framework_spark.pipeline.dedup import (
        CHAR_JACCARD_THRESHOLD,
        char_shingles_of,
        index_signatures,
        match_batch,
    )
    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        semantic_index,
        semantic_match_batch,
    )
    from mapreduce_framework_spark.pipeline.span_dedup import (
        decontaminate,
        exact_substring_dedup,
        span_contamination,
        span_index,
    )

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    embs = table(spark, "embeddings", sf_dir)
    cb = fit_codebook(embs, k=8, iters=1)
    sem_idx = semantic_index(embs, cb).localCheckpoint(eager=True)
    char_idx = index_signatures(docs, char_shingles_of).localCheckpoint(eager=True)
    span_idx = span_index(docs).localCheckpoint(eager=True)

    from mapreduce_framework_spark.pipeline.codebook import refit_codebook
    from mapreduce_framework_spark.pipeline.sampling import training_corpus

    docs_full = table(spark, "documents", sf_dir)
    surfaces = {
        "exact_substring_dedup": exact_substring_dedup(docs),
        "span_contamination": span_contamination(span_idx, docs),
        "decontaminate": decontaminate(span_idx, docs),
        "char_match_batch": match_batch(
            char_idx, docs, CHAR_JACCARD_THRESHOLD, char_shingles_of
        ),
        "semantic_match_batch": semantic_match_batch(sem_idx, embs.limit(50), cb),
        # round-7 surfaces: the refreshed book (warm-start Lloyd output),
        # the decontaminated 5-stage corpus composition, and the exact
        # admission tier
        "refit_codebook": refit_codebook(embs, cb, iters=1),
        "training_corpus_decon": training_corpus(
            docs_full, benchmark_index=span_idx
        ),
        "exact_match_batch": _exact_tier(docs),
        # round-10 surface: the cascade's first tier — per-doc integer/
        # array arithmetic + the q88 two-level gram aggregate, all JVM
        "quality_rejects": _quality_rejects(docs),
    }
    offenders = {}
    for name, df in surfaces.items():
        plan = _plan(df)
        bad = [
            p
            for p in ("CartesianProduct", "BatchEvalPython", "BroadcastNestedLoopJoin")
            if p in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def _quality_rejects(docs):
    from mapreduce_framework_spark.pipeline.quality import quality_rejects

    return quality_rejects(docs)
