"""Central registry of declared queries (SURVEY §2.5).

Every implemented operator registers a :class:`QuerySpec` here: a builder
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the equivalent
DuckDB oracle SQL. ``__spark_entry__.py`` exposes this registry to the
driver; the pytest suite runs the same differential comparison locally.

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL twin; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


# The external driver records correctness for the FIRST 50 entries of
# __spark_entry__.queries() only, so exposure order is part of the driver
# contract.
#
# CAPACITY NOTE (round 5): with the enforced max-staleness of one round,
# every query needs a window slot every 2 rounds — steady-state capacity
# is 2 × DRIVER_WINDOW = 100 queries. The registry now holds exactly 100:
# round 5 registered q101_span_dedup and q102_semantic_dedup (shipped
# library-first in round 4) into the two remaining free slots. CAPACITY
# IS EXHAUSTED: from round 6 on, every window is exactly the previous
# round's behind-window half, and a new registration is only possible by
# retiring an existing query under the policy below. Prefer deepening
# existing operators (tests, plans, perf, scale probes) over net-new
# registrations.
#
# RETIREMENT POLICY (binding from round 6; enforced by
# tests/test_rotation.py::test_capacity_and_retirement_policy):
#   1. A new query may be registered ONLY by retiring an existing one in
#      the same commit — the registry never exceeds 100 names.
#   2. Retire-eligibility, in preference order:
#        a. demonstrative twins whose production form stays registered
#           (q28_kv_stateful_replay — interpreted twin of q06;
#           q47_sql_frontend_window — SQL-text twin of q18/q19);
#        b. capped exact-oracle twins whose scaled/banded form stays
#           registered (q30 ← q31, q72 ← q84, q34 brute-force ← q35/q56,
#           q55 ← q73);
#        c. narrow function-battery queries subsumed by a broader battery
#           (q63_posexplode ⊂ q23_array_functions surface).
#   3. NOT retire-eligible: the reference-parity surface that SURVEY §2
#      maps line-by-line — MR apps q01–q05/q09/q10, KV q06–q08,
#      shardctrler q85, and the sole representative of any operator
#      family (never retire a family to zero).
#   4. Retirement removes the name from CURATED_ORDER and the module's
#      @register decorator ONLY. The builder, its oracle constant, and
#      its DuckDB differential pytest test remain in the repo permanently
#      (the local oracle sweep still proves it every run); the name is
#      appended to RETIRED below and never reused.
#
# RETIREMENT DRY-RUN (round 6; the ranking the policy requires, so any
# future registration is a one-commit swap).
# EXECUTED round 7: entry 1 (q55_simhash_neardup) was retired to register
# q103_cascade_admission — the swap followed policy item 4 exactly
# (CURATED_ORDER slot replaced in place, name appended to RETIRED,
# @register removed, builder/oracle/dedicated-differential kept).
# Next retirements, in order, with the evidence that makes each safe:
#   1. [SPENT r7] q55_simhash_neardup — capped exact-oracle twin (2b): its
#      banded scale path q73 is registered, green since r4, and
#      q73's own test battery includes the exhaustive pigeonhole-
#      completeness property; q55's builder+oracle+pytest remain.
#   2. [SPENT r7] q72_char_ngram_jaccard — capped exact-oracle twin (2b):
#      scale path q84 is registered and green, r5 linear-shingling rework
#      probed to 100k docs (SCALING.md LSH series); q72 remains the
#      local differential for q84's verify stage. Its slot funded
#      q104_full_cascade_admission (three-tier streaming admission).
#   [SPENT r8, out of rank order] q34_ann_bruteforce — 2b pool entry
#      (brute-force exact-oracle twin; scaled paths q35/q56 registered
#      and green). Spent ahead of q30 because the ranked retiree was
#      behind-window in r8 (timing constraint) and q34 held an
#      in-window slot; its slot funded
#      q105_training_corpus_decontaminated (the flagship 5-stage
#      composition). bench.py keeps timing q34 via direct import.
#   [SPENT r9] q30_ngram_jaccard_neardup — same shape as q72 (exact
#      twin of q31), spent in its scheduled round (it rotated into the
#      r9 window per the timing rule) to register q106_admission_report
#      (the per-tier admission-rollup ops view). q31/q84 carry the
#      SURVEY §2.5 near-dup contract; q30's builder + oracle + pytest
#      differential remain, and bench.py keeps timing it via direct
#      import (r1-subset series unbroken).
#   [SPENT r11] q47_sql_frontend_window — demonstrative twin (2a): the
#      SQL-text form of the window battery whose DataFrame forms q18/q19
#      stay registered; the SQL-frontend surface itself stays represented
#      by q46. Spent in its scheduled round (it rotated into the r11
#      window per the timing rule) to register
#      q108_quality_gated_admission (the five-tier quality-gated
#      streaming cascade). q47's builder + oracle + pytest differential
#      remain (tests/test_queries_oracle.py::test_retired_q47_matches_oracle).
#   [SPENT r10] q63_posexplode — narrow battery query (2c) subsumed by
#      q23's array surface, spent in its scheduled round (it rotated
#      into the r10 window per the timing rule) to register
#      q107_decontaminating_admission (the four-tier decontaminating
#      streaming cascade). q63's builder + oracle + pytest differential
#      remain (tests/test_queries_oracle.py::test_retired_q63_matches_oracle).
#   6. q28_kv_stateful_replay — demonstrative twin (2a) of q06; its
#      point (the documented Arrow/Python boundary) is equally made by
#      the streaming q83 path which shares the fold. Spend LAST: q28 is
#      the registry's sole interpreted-stateful representative in the
#      driver window. ROUND-9 UPDATE: its builder was swapped to
#      operators/kv.py:fold_kv_history_streaming (the bounded-memory
#      mapInPandas fold) in the round it rotated into the window,
#      exactly as the round-8 note scheduled — same output, same
#      oracle, perf-weak shape cleared without retirement.
#   Swap mechanics per policy item 4: delete the name from
#   CURATED_ORDER + its @register line, append it to RETIRED, register
#   the newcomer in the same commit, and place the newcomer in the
#   in-window half of CURATED_ORDER (new-this-round rule).
#
# ROUND-10 EXECUTED: q63 → RETIRED in its scheduled round;
# q107_decontaminating_admission registered into exactly q63's window
# slot (swap mechanics per policy item 4, one commit).
#
# ROUND-11 EXECUTED exactly as the handoff scheduled: q47 → RETIRED in
# its scheduled round (it rotated into the r11 window, satisfying the
# timing rule; SQL-frontend surface carried by q46, window battery by
# q18/q19); q108_quality_gated_admission registered into exactly q47's
# window slot — the FIVE-tier cascade replay (quality → exact → MinHash
# → semantic → decon; full tier parity with the q105 batch flagship),
# oracle proven at sf0.001 AND sf0.01 in round 10 before registration
# (tests/test_queries_oracle.py::test_q108_candidate_matches_oracle).
#
# ROUND-12 EXECUTED exactly as the handoff scheduled: q29 → RETIRED in
# its scheduled round (it rotated into the r12 window, satisfying the
# timing rule; the approx-distinct contract stays under the STRONGER
# exact hash-checked gate q74_hll_error_bound, and the approx family
# keeps q69 + q74 + q75 registered); q109_multimodal_phash_neardup
# registered into exactly q29's window slot — the perceptual
# average-hash near-dup tier over the multimodal payload surface
# (integer-exact 32-cell aHash, q73's pigeonhole byte-band candidate
# join), oracle proven at sf0.001 AND sf0.01 in round 11 before
# registration (tests/test_queries_oracle.py::
# test_q109_candidate_matches_oracle). Retiring q29 also erases one of
# the artifact's two permanent rows-only `err: no_oracle` rows.
#
# ROUND-13 EXECUTED exactly as the handoff scheduled: q36 → RETIRED in
# its scheduled round (it rotated into the r13 window, satisfying the
# timing rule; the exact-cosine contract stays carried by the registered
# scale paths q35_ann_lsh and q56_ann_ivf, and q36's builder + oracle +
# dedicated differential test_retired_q36_matches_oracle remain in the
# local sweep permanently — the q30/q34 twin pattern; bench.py keeps
# timing it via direct import so the r1-adjacent similarity series is
# unbroken); q110_media_gated_admission registered into exactly q36's
# window slot — the SIX-tier media-gated admission replay (quality →
# exact → media/phash → MinHash → semantic → decon; the full production
# sink shape with the r11 media_dup tier under driver eyes), oracle
# proven in round 12 BEFORE registration at two SFs + a NULLs variant +
# the no-centroid degradation path (tests/test_queries_oracle.py::
# test_q110_candidate_matches_oracle and siblings), with the registered
# q108 oracle text pinned byte-identical under the shared _gated_oracle
# body and the six-tier form soaked 200 batches (SCALING.md round-12).
#
# ROUND-14 HANDOFF: the timing-eligible retiree next round is
# q69_approx_percentiles (it sits in the r13 behind-window half, so it
# rotates into the r14 window). Rationale: q69 is the registry's LAST
# permanent rows-only row (`err: no_oracle` — by-design approximate
# sketch); its exact hash-checked gate q75_percentile_sketch_bound stays
# registered (this very r13 window) and its sibling exact gate q74 is
# hash-green r12, so retiring it makes the driver artifact permanently
# 50/50 hash-green with zero information loss — the builder + rsd/
# tolerance differential remain in the local sweep (the q29 pattern,
# executed r12). No newcomer is staged for r14 yet: if one emerges it
# must follow the library-first playbook (oracle proven at two SFs
# BEFORE registration); otherwise the swap may simply retire q69 and
# promote the highest-value staged candidate available at curation time,
# or leave the slot to the rotation if none meets the bar.
#
# ROUND-14 DECISION (2026-08-18, optimization round 2 of 2): DEFERRED to
# the next build round. Round 14 is an optimization round whose brief
# forbids registry/feature changes ("a query that disappeared makes the
# round a REGRESSION regardless of speed"), no newcomer is staged to fund
# the slot, and retiring q69 has zero performance value — it is purely a
# correctness-artifact curation. Everything above stays true and ready:
# q69 rotates into the r14 window as scheduled (rows-only, by design),
# and the next BUILD round should execute the swap per the q29 pattern.
#
# The curated order below puts, inside the window: (a) every query new
# or changed this round, (b) every query whose last driver row is a full
# round old (rotation). Long-stable queries rotate behind position 50
# (still swept by the local pytest oracle suite every run). The rotation
# is ENFORCED, not aspirational: tests/test_rotation.py asserts — using
# WINDOW_HISTORY below — that no registered query goes more than one
# round without a driver window slot.
CURATED_ORDER = [
    # --- round-13 window: the r12 behind-window half (the enforced
    # rotation — every name here last had a driver row in r11, so max
    # staleness stays one round) with ONE executed swap, scheduled by the
    # round-12 handoff above:
    #   * q36's slot now holds the round-13 newcomer
    #     q110_media_gated_admission (retirement policy item 4;
    #     q36 → RETIRED below — q36 rotated into this window, satisfying
    #     the timing rule; its exact-cosine contract stays covered by the
    #     registered scale paths q35/q56 plus the permanent local
    #     differential test_retired_q36_matches_oracle, and bench.py
    #     keeps timing the builder for the r1-adjacent series).
    #     q110 puts the SIX-tier media-gated admission replay — the full
    #     production sink shape with the media_dup tier engaged — under
    #     driver eyes with the oracle proven at two SFs + a NULLs
    #     variant + the no-centroid degradation differential in r12.
    "q101_span_dedup",
    "q102_semantic_dedup",
    "q89_denylist_scrub",
    "q91_cross_snapshot_dedup",
    "q01_wordcount",
    "q06_kv_final_state",
    "q31_minhash_lsh_neardup",
    "q84_char_ngram_lsh_neardup",
    "q85_shardctrler_replay",
    "q86_boilerplate_ngrams",
    "q87_boilerplate_doc_stats",
    "q88_repetition_stats",
    "q90_domain_mix_resample",
    "q92_tfidf_topk",
    "q110_media_gated_admission",
    "q104_full_cascade_admission",
    "q75_percentile_sketch_bound",
    "q83_streaming_kv_replay",
    "q28_kv_stateful_replay",
    "q24_exact_dedup",
    "q02_inverted_index",
    "q11_filter_project",
    "q106_admission_report",
    "q49_neardup_components",
    "q03_crash_emits",
    "q04_per_doc_counts",
    "q05_global_count",
    "q09_fnv_bucket_histogram",
    "q10_global_sort",
    "q07_kv_point_in_time",
    "q08_shard_histogram",
    "q14_semi_join",
    "q14_anti_join",
    "q16_count_distinct",
    "q18_window_topk_per_group",
    "q20_global_topk",
    "q21_set_ops",
    "q23_array_functions",
    "q25_tumbling_window",
    "q26_sliding_window",
    "q32_simhash",
    "q33_exact_dedup_docs",
    "q44_map_functions",
    "q108_quality_gated_admission",
    "q50_window_battery",
    "q52_pandas_udf_path",
    "q103_cascade_admission",
    "q57_asof_join",
    "q73_simhash_banded_neardup",
    "q81_training_corpus",
    # --- behind the window (driver rows recorded in round 12; swept by
    # the local oracle suite every run) ---
    "q94_streaming_session_replay",
    "q95_incremental_ingest_dedup",
    "q96_incremental_rollup_replay",
    "q97_session_funnel",
    "q98_cohort_retention",
    "q99_session_transitions",
    "q100_token_chunking",
    "q82_streaming_tumbling_replay",
    "q93_embedding_quantize",
    "q58_range_join_binned",
    "q12_join_revenue_per_nation",
    "q74_hll_error_bound",
    "q61_correlated_subqueries",
    "q40_lang_id",
    "q35_ann_lsh",
    "q37_multimodal_features",
    "q56_ann_ivf",
    "q78_stratified_hash_sample",
    "q13_broadcast_join",
    "q15_tpch_q1_shape",
    "q17_rollup",
    "q19_window_running_sum",
    "q22_scalar_battery",
    "q45_cube",
    "q46_sql_frontend_join",
    "q48_salted_skew_agg",
    "q51_pivot",
    "q53_null_handling",
    "q64_summary_stats",
    "q66_json_functions",
    "q68_merge_upsert",
    "q109_multimodal_phash_neardup",
    "q69_approx_percentiles",
    "q27_session_window",
    "q65_hierarchical_rollup",
    "q54_percentiles",
    "q59_string_battery",
    "q60_grouping_sets",
    "q107_decontaminating_admission",
    "q67_multiset_ops",
    "q70_grouped_agg_pandas_udf",
    "q71_dedup_corpus_output",
    "q105_training_corpus_decontaminated",
    "q41_quality_score",
    "q42_token_stats",
    "q43_fingerprint",
    "q76_multimodal_frame_sample",
    "q77_multimodal_resize",
    "q79_sequence_packing",
    "q80_contamination_check",
]


# Queries retired under the policy above. Append-only; names here must
# never reappear in CURATED_ORDER, and their builders/oracles/
# differential tests stay in the repo permanently.
RETIRED: tuple[str, ...] = (
    # round 7: dry-run ranking entry 1 spent to register
    # q103_cascade_admission (tiered streaming admission). Builder +
    # shared oracle constant stay in pipeline/dedup.py; dedicated local
    # differential: tests/test_queries_oracle.py::test_retired_q55_matches_oracle.
    "q55_simhash_neardup",
    # round 7: dry-run ranking entry 2 spent to register
    # q104_full_cascade_admission (three-tier streaming admission).
    # Builder + oracle constant stay in pipeline/dedup.py; dedicated local
    # differential: tests/test_queries_oracle.py::test_retired_q72_matches_oracle.
    "q72_char_ngram_jaccard",
    # round 8: 2b pool entry (brute-force exact-oracle twin of q35/q56)
    # spent to register q105_training_corpus_decontaminated — the
    # verdict-ranked retiree q30 was behind-window this round (timing
    # constraint; see CURATED_ORDER header) and stays the r9 target.
    # Builder + oracle constant stay in pipeline/similarity.py; dedicated
    # local differential:
    # tests/test_queries_oracle.py::test_retired_q34_matches_oracle;
    # bench.py still times the builder directly (r1-subset series).
    "q34_ann_bruteforce",
    # round 9: dry-run ranking entry 3 spent IN ITS SCHEDULED ROUND (q30
    # rotated into the r9 window, satisfying the timing rule) to register
    # q106_admission_report (the per-tier admission-rollup ops view over
    # the q104 replay's decisions log). q31/q84 carry the §2.5 near-dup
    # contract. Builder + oracle constant stay in pipeline/dedup.py;
    # dedicated local differential:
    # tests/test_queries_oracle.py::test_retired_q30_matches_oracle;
    # bench.py still times the builder directly (r1-subset series).
    "q30_ngram_jaccard_neardup",
    # round 10: dry-run ranking entry 5 (narrow battery query, 2c —
    # subsumed by q23's array surface) spent IN ITS SCHEDULED ROUND (q63
    # rotated into the r10 window, satisfying the timing rule) to
    # register q107_decontaminating_admission (the four-tier
    # decontaminating streaming cascade, oracle proven at two SFs in
    # r9). Builder + oracle constant stay in operators/functions_battery.py;
    # dedicated local differential:
    # tests/test_queries_oracle.py::test_retired_q63_matches_oracle.
    "q63_posexplode",
    # round 11: dry-run ranking entry 4 (demonstrative twin, 2a — the
    # SQL-text window form whose DataFrame twins q18/q19 and SQL-frontend
    # sibling q46 stay registered) spent IN ITS SCHEDULED ROUND (q47
    # rotated into the r11 window, satisfying the timing rule) to
    # register q108_quality_gated_admission (the five-tier quality-gated
    # streaming admission cascade, oracle proven at two SFs in r10).
    # Builder + oracle stay in operators/sql_frontend.py; dedicated local
    # differential:
    # tests/test_queries_oracle.py::test_retired_q47_matches_oracle.
    "q47_sql_frontend_window",
    # round 12: the ROUND-12 HANDOFF retiree, spent IN ITS SCHEDULED
    # ROUND (q29 rotated into the r12 window, satisfying the timing
    # rule) to register q109_multimodal_phash_neardup (the perceptual
    # average-hash multimodal near-dup tier, oracle proven at two SFs in
    # r11). q29 was one of the artifact's two permanent rows-only
    # `err: no_oracle` rows; its HARD exact gate q74_hll_error_bound
    # stays registered, so the approx-distinct contract's driver
    # evidence strictly improves. Builder stays in
    # operators/relational.py; its tolerance differential vs the exact
    # q16 remains tests/test_probes.py::test_q29_within_rsd_bound.
    "q29_approx_count_distinct",
    # round 13: the ROUND-13 HANDOFF retiree, spent IN ITS SCHEDULED
    # ROUND (q36 rotated into the r13 window, satisfying the timing
    # rule) to register q110_media_gated_admission (the six-tier
    # media-gated streaming admission cascade, oracle proven at two SFs
    # + NULLs variant + no-centroid degradation in r12). q36 is a capped
    # exact-oracle twin (2b): its banded/bucketed scale paths q35_ann_lsh
    # and q56_ann_ivf stay registered (both hash-green r12). Builder +
    # oracle stay in pipeline/similarity.py; dedicated local
    # differential:
    # tests/test_queries_oracle.py::test_retired_q36_matches_oracle.
    # bench.py keeps timing it via direct import.
    "q36_embedding_neardup",
)

# Hard ceiling = 2 rounds × DRIVER_WINDOW (see capacity note).
MAX_REGISTERED = 100

DRIVER_WINDOW = 50

# Round bookkeeping for the enforced rotation check. CURRENT_ROUND is the
# round whose driver run the current CURATED_ORDER feeds; WINDOW_HISTORY
# records the window actually exposed in each past round (= the keys of
# CORRECTNESS_r{N}.json, verbatim). Each new round: append the previous
# round's first-DRIVER_WINDOW names here, bump CURRENT_ROUND, re-curate.
CURRENT_ROUND = 13

WINDOW_HISTORY: dict[int, tuple[str, ...]] = {
    1: (
        "q01_wordcount",
        "q02_inverted_index",
        "q03_crash_emits",
        "q04_per_doc_counts",
        "q05_global_count",
        "q09_fnv_bucket_histogram",
        "q10_global_sort",
        "q11_filter_project",
        "q12_join_revenue_per_nation",
        "q13_broadcast_join",
        "q14_semi_join",
        "q14_anti_join",
        "q15_tpch_q1_shape",
        "q16_count_distinct",
        "q17_rollup",
        "q18_window_topk_per_group",
        "q19_window_running_sum",
        "q20_global_topk",
        "q21_set_ops",
        "q22_scalar_battery",
        "q23_array_functions",
        "q29_approx_count_distinct",
        "q44_map_functions",
        "q45_cube",
        "q68_merge_upsert",
        "q69_approx_percentiles",
        "q06_kv_final_state",
        "q07_kv_point_in_time",
        "q08_shard_histogram",
        "q28_kv_stateful_replay",
        "q24_exact_dedup",
        "q25_tumbling_window",
        "q26_sliding_window",
        "q27_session_window",
        "q65_hierarchical_rollup",
        "q46_sql_frontend_join",
        "q47_sql_frontend_window",
        "q48_salted_skew_agg",
        "q30_ngram_jaccard_neardup",
        "q31_minhash_lsh_neardup",
        "q32_simhash",
        "q33_exact_dedup_docs",
        "q55_simhash_neardup",
        "q71_dedup_corpus_output",
        "q72_char_ngram_jaccard",
        "q49_neardup_components",
        "q50_window_battery",
        "q51_pivot",
        "q52_pandas_udf_path",
        "q53_null_handling",
    ),
    2: (
        "q12_join_revenue_per_nation",
        "q13_broadcast_join",
        "q15_tpch_q1_shape",
        "q17_rollup",
        "q19_window_running_sum",
        "q22_scalar_battery",
        "q45_cube",
        "q46_sql_frontend_join",
        "q48_salted_skew_agg",
        "q51_pivot",
        "q53_null_handling",
        "q64_summary_stats",
        "q66_json_functions",
        "q68_merge_upsert",
        "q29_approx_count_distinct",
        "q69_approx_percentiles",
        "q74_hll_error_bound",
        "q75_percentile_sketch_bound",
        "q82_streaming_tumbling_replay",
        "q83_streaming_kv_replay",
        "q27_session_window",
        "q65_hierarchical_rollup",
        "q57_asof_join",
        "q58_range_join_binned",
        "q54_percentiles",
        "q59_string_battery",
        "q60_grouping_sets",
        "q61_correlated_subqueries",
        "q63_posexplode",
        "q67_multiset_ops",
        "q70_grouped_agg_pandas_udf",
        "q31_minhash_lsh_neardup",
        "q71_dedup_corpus_output",
        "q72_char_ngram_jaccard",
        "q73_simhash_banded_neardup",
        "q34_ann_bruteforce",
        "q35_ann_lsh",
        "q36_embedding_neardup",
        "q56_ann_ivf",
        "q40_lang_id",
        "q41_quality_score",
        "q42_token_stats",
        "q43_fingerprint",
        "q37_multimodal_features",
        "q76_multimodal_frame_sample",
        "q77_multimodal_resize",
        "q78_stratified_hash_sample",
        "q79_sequence_packing",
        "q80_contamination_check",
        "q81_training_corpus",
    ),
    3: (
        "q84_char_ngram_lsh_neardup",
        "q85_shardctrler_replay",
        "q86_boilerplate_ngrams",
        "q87_boilerplate_doc_stats",
        "q88_repetition_stats",
        "q89_denylist_scrub",
        "q90_domain_mix_resample",
        "q91_cross_snapshot_dedup",
        "q92_tfidf_topk",
        "q93_embedding_quantize",
        "q36_embedding_neardup",
        "q72_char_ngram_jaccard",
        "q75_percentile_sketch_bound",
        "q82_streaming_tumbling_replay",
        "q83_streaming_kv_replay",
        "q01_wordcount",
        "q06_kv_final_state",
        "q28_kv_stateful_replay",
        "q24_exact_dedup",
        "q02_inverted_index",
        "q11_filter_project",
        "q30_ngram_jaccard_neardup",
        "q49_neardup_components",
        "q03_crash_emits",
        "q04_per_doc_counts",
        "q05_global_count",
        "q09_fnv_bucket_histogram",
        "q10_global_sort",
        "q07_kv_point_in_time",
        "q08_shard_histogram",
        "q14_semi_join",
        "q14_anti_join",
        "q16_count_distinct",
        "q18_window_topk_per_group",
        "q20_global_topk",
        "q21_set_ops",
        "q23_array_functions",
        "q25_tumbling_window",
        "q26_sliding_window",
        "q32_simhash",
        "q33_exact_dedup_docs",
        "q44_map_functions",
        "q47_sql_frontend_window",
        "q50_window_battery",
        "q52_pandas_udf_path",
        "q55_simhash_neardup",
        "q57_asof_join",
        "q31_minhash_lsh_neardup",
        "q73_simhash_banded_neardup",
        "q81_training_corpus",
    ),
    4: (
        "q94_streaming_session_replay",
        "q95_incremental_ingest_dedup",
        "q96_incremental_rollup_replay",
        "q97_session_funnel",
        "q98_cohort_retention",
        "q99_session_transitions",
        "q100_token_chunking",
        "q82_streaming_tumbling_replay",
        "q93_embedding_quantize",
        "q58_range_join_binned",
        "q12_join_revenue_per_nation",
        "q74_hll_error_bound",
        "q61_correlated_subqueries",
        "q40_lang_id",
        "q35_ann_lsh",
        "q37_multimodal_features",
        "q56_ann_ivf",
        "q78_stratified_hash_sample",
        "q13_broadcast_join",
        "q15_tpch_q1_shape",
        "q17_rollup",
        "q19_window_running_sum",
        "q22_scalar_battery",
        "q45_cube",
        "q46_sql_frontend_join",
        "q48_salted_skew_agg",
        "q51_pivot",
        "q53_null_handling",
        "q64_summary_stats",
        "q66_json_functions",
        "q68_merge_upsert",
        "q29_approx_count_distinct",
        "q69_approx_percentiles",
        "q27_session_window",
        "q65_hierarchical_rollup",
        "q54_percentiles",
        "q59_string_battery",
        "q60_grouping_sets",
        "q63_posexplode",
        "q67_multiset_ops",
        "q70_grouped_agg_pandas_udf",
        "q71_dedup_corpus_output",
        "q34_ann_bruteforce",
        "q41_quality_score",
        "q42_token_stats",
        "q43_fingerprint",
        "q76_multimodal_frame_sample",
        "q77_multimodal_resize",
        "q79_sequence_packing",
        "q80_contamination_check",
    ),
    5: (
        "q101_span_dedup",
        "q102_semantic_dedup",
        "q89_denylist_scrub",
        "q91_cross_snapshot_dedup",
        "q01_wordcount",
        "q06_kv_final_state",
        "q31_minhash_lsh_neardup",
        "q84_char_ngram_lsh_neardup",
        "q85_shardctrler_replay",
        "q86_boilerplate_ngrams",
        "q87_boilerplate_doc_stats",
        "q88_repetition_stats",
        "q90_domain_mix_resample",
        "q92_tfidf_topk",
        "q36_embedding_neardup",
        "q72_char_ngram_jaccard",
        "q75_percentile_sketch_bound",
        "q83_streaming_kv_replay",
        "q28_kv_stateful_replay",
        "q24_exact_dedup",
        "q02_inverted_index",
        "q11_filter_project",
        "q30_ngram_jaccard_neardup",
        "q49_neardup_components",
        "q03_crash_emits",
        "q04_per_doc_counts",
        "q05_global_count",
        "q09_fnv_bucket_histogram",
        "q10_global_sort",
        "q07_kv_point_in_time",
        "q08_shard_histogram",
        "q14_semi_join",
        "q14_anti_join",
        "q16_count_distinct",
        "q18_window_topk_per_group",
        "q20_global_topk",
        "q21_set_ops",
        "q23_array_functions",
        "q25_tumbling_window",
        "q26_sliding_window",
        "q32_simhash",
        "q33_exact_dedup_docs",
        "q44_map_functions",
        "q47_sql_frontend_window",
        "q50_window_battery",
        "q52_pandas_udf_path",
        "q55_simhash_neardup",
        "q57_asof_join",
        "q73_simhash_banded_neardup",
        "q81_training_corpus",
    ),
    6: (
        "q94_streaming_session_replay",
        "q95_incremental_ingest_dedup",
        "q96_incremental_rollup_replay",
        "q97_session_funnel",
        "q98_cohort_retention",
        "q99_session_transitions",
        "q100_token_chunking",
        "q82_streaming_tumbling_replay",
        "q93_embedding_quantize",
        "q58_range_join_binned",
        "q12_join_revenue_per_nation",
        "q74_hll_error_bound",
        "q61_correlated_subqueries",
        "q40_lang_id",
        "q35_ann_lsh",
        "q37_multimodal_features",
        "q56_ann_ivf",
        "q78_stratified_hash_sample",
        "q13_broadcast_join",
        "q15_tpch_q1_shape",
        "q17_rollup",
        "q19_window_running_sum",
        "q22_scalar_battery",
        "q45_cube",
        "q46_sql_frontend_join",
        "q48_salted_skew_agg",
        "q51_pivot",
        "q53_null_handling",
        "q64_summary_stats",
        "q66_json_functions",
        "q68_merge_upsert",
        "q29_approx_count_distinct",
        "q69_approx_percentiles",
        "q27_session_window",
        "q65_hierarchical_rollup",
        "q54_percentiles",
        "q59_string_battery",
        "q60_grouping_sets",
        "q63_posexplode",
        "q67_multiset_ops",
        "q70_grouped_agg_pandas_udf",
        "q71_dedup_corpus_output",
        "q34_ann_bruteforce",
        "q41_quality_score",
        "q42_token_stats",
        "q43_fingerprint",
        "q76_multimodal_frame_sample",
        "q77_multimodal_resize",
        "q79_sequence_packing",
        "q80_contamination_check",
    ),
    7: (
        "q101_span_dedup",
        "q102_semantic_dedup",
        "q89_denylist_scrub",
        "q91_cross_snapshot_dedup",
        "q01_wordcount",
        "q06_kv_final_state",
        "q31_minhash_lsh_neardup",
        "q84_char_ngram_lsh_neardup",
        "q85_shardctrler_replay",
        "q86_boilerplate_ngrams",
        "q87_boilerplate_doc_stats",
        "q88_repetition_stats",
        "q90_domain_mix_resample",
        "q92_tfidf_topk",
        "q36_embedding_neardup",
        "q104_full_cascade_admission",
        "q75_percentile_sketch_bound",
        "q83_streaming_kv_replay",
        "q28_kv_stateful_replay",
        "q24_exact_dedup",
        "q02_inverted_index",
        "q11_filter_project",
        "q30_ngram_jaccard_neardup",
        "q49_neardup_components",
        "q03_crash_emits",
        "q04_per_doc_counts",
        "q05_global_count",
        "q09_fnv_bucket_histogram",
        "q10_global_sort",
        "q07_kv_point_in_time",
        "q08_shard_histogram",
        "q14_semi_join",
        "q14_anti_join",
        "q16_count_distinct",
        "q18_window_topk_per_group",
        "q20_global_topk",
        "q21_set_ops",
        "q23_array_functions",
        "q25_tumbling_window",
        "q26_sliding_window",
        "q32_simhash",
        "q33_exact_dedup_docs",
        "q44_map_functions",
        "q47_sql_frontend_window",
        "q50_window_battery",
        "q52_pandas_udf_path",
        "q103_cascade_admission",
        "q57_asof_join",
        "q73_simhash_banded_neardup",
        "q81_training_corpus",
    ),
    8: (
        "q94_streaming_session_replay",
        "q95_incremental_ingest_dedup",
        "q96_incremental_rollup_replay",
        "q97_session_funnel",
        "q98_cohort_retention",
        "q99_session_transitions",
        "q100_token_chunking",
        "q82_streaming_tumbling_replay",
        "q93_embedding_quantize",
        "q58_range_join_binned",
        "q12_join_revenue_per_nation",
        "q74_hll_error_bound",
        "q61_correlated_subqueries",
        "q40_lang_id",
        "q35_ann_lsh",
        "q37_multimodal_features",
        "q56_ann_ivf",
        "q78_stratified_hash_sample",
        "q13_broadcast_join",
        "q15_tpch_q1_shape",
        "q17_rollup",
        "q19_window_running_sum",
        "q22_scalar_battery",
        "q45_cube",
        "q46_sql_frontend_join",
        "q48_salted_skew_agg",
        "q51_pivot",
        "q53_null_handling",
        "q64_summary_stats",
        "q66_json_functions",
        "q68_merge_upsert",
        "q29_approx_count_distinct",
        "q69_approx_percentiles",
        "q27_session_window",
        "q65_hierarchical_rollup",
        "q54_percentiles",
        "q59_string_battery",
        "q60_grouping_sets",
        "q63_posexplode",
        "q67_multiset_ops",
        "q70_grouped_agg_pandas_udf",
        "q71_dedup_corpus_output",
        "q105_training_corpus_decontaminated",
        "q41_quality_score",
        "q42_token_stats",
        "q43_fingerprint",
        "q76_multimodal_frame_sample",
        "q77_multimodal_resize",
        "q79_sequence_packing",
        "q80_contamination_check",
    ),
    9: (
        "q101_span_dedup",
        "q102_semantic_dedup",
        "q89_denylist_scrub",
        "q91_cross_snapshot_dedup",
        "q01_wordcount",
        "q06_kv_final_state",
        "q31_minhash_lsh_neardup",
        "q84_char_ngram_lsh_neardup",
        "q85_shardctrler_replay",
        "q86_boilerplate_ngrams",
        "q87_boilerplate_doc_stats",
        "q88_repetition_stats",
        "q90_domain_mix_resample",
        "q92_tfidf_topk",
        "q36_embedding_neardup",
        "q104_full_cascade_admission",
        "q75_percentile_sketch_bound",
        "q83_streaming_kv_replay",
        "q28_kv_stateful_replay",
        "q24_exact_dedup",
        "q02_inverted_index",
        "q11_filter_project",
        "q106_admission_report",
        "q49_neardup_components",
        "q03_crash_emits",
        "q04_per_doc_counts",
        "q05_global_count",
        "q09_fnv_bucket_histogram",
        "q10_global_sort",
        "q07_kv_point_in_time",
        "q08_shard_histogram",
        "q14_semi_join",
        "q14_anti_join",
        "q16_count_distinct",
        "q18_window_topk_per_group",
        "q20_global_topk",
        "q21_set_ops",
        "q23_array_functions",
        "q25_tumbling_window",
        "q26_sliding_window",
        "q32_simhash",
        "q33_exact_dedup_docs",
        "q44_map_functions",
        "q47_sql_frontend_window",
        "q50_window_battery",
        "q52_pandas_udf_path",
        "q103_cascade_admission",
        "q57_asof_join",
        "q73_simhash_banded_neardup",
        "q81_training_corpus",
    ),
    10: (
        "q94_streaming_session_replay",
        "q95_incremental_ingest_dedup",
        "q96_incremental_rollup_replay",
        "q97_session_funnel",
        "q98_cohort_retention",
        "q99_session_transitions",
        "q100_token_chunking",
        "q82_streaming_tumbling_replay",
        "q93_embedding_quantize",
        "q58_range_join_binned",
        "q12_join_revenue_per_nation",
        "q74_hll_error_bound",
        "q61_correlated_subqueries",
        "q40_lang_id",
        "q35_ann_lsh",
        "q37_multimodal_features",
        "q56_ann_ivf",
        "q78_stratified_hash_sample",
        "q13_broadcast_join",
        "q15_tpch_q1_shape",
        "q17_rollup",
        "q19_window_running_sum",
        "q22_scalar_battery",
        "q45_cube",
        "q46_sql_frontend_join",
        "q48_salted_skew_agg",
        "q51_pivot",
        "q53_null_handling",
        "q64_summary_stats",
        "q66_json_functions",
        "q68_merge_upsert",
        "q29_approx_count_distinct",
        "q69_approx_percentiles",
        "q27_session_window",
        "q65_hierarchical_rollup",
        "q54_percentiles",
        "q59_string_battery",
        "q60_grouping_sets",
        "q107_decontaminating_admission",
        "q67_multiset_ops",
        "q70_grouped_agg_pandas_udf",
        "q71_dedup_corpus_output",
        "q105_training_corpus_decontaminated",
        "q41_quality_score",
        "q42_token_stats",
        "q43_fingerprint",
        "q76_multimodal_frame_sample",
        "q77_multimodal_resize",
        "q79_sequence_packing",
        "q80_contamination_check",
    ),
    11: (
        "q101_span_dedup",
        "q102_semantic_dedup",
        "q89_denylist_scrub",
        "q91_cross_snapshot_dedup",
        "q01_wordcount",
        "q06_kv_final_state",
        "q31_minhash_lsh_neardup",
        "q84_char_ngram_lsh_neardup",
        "q85_shardctrler_replay",
        "q86_boilerplate_ngrams",
        "q87_boilerplate_doc_stats",
        "q88_repetition_stats",
        "q90_domain_mix_resample",
        "q92_tfidf_topk",
        "q36_embedding_neardup",
        "q104_full_cascade_admission",
        "q75_percentile_sketch_bound",
        "q83_streaming_kv_replay",
        "q28_kv_stateful_replay",
        "q24_exact_dedup",
        "q02_inverted_index",
        "q11_filter_project",
        "q106_admission_report",
        "q49_neardup_components",
        "q03_crash_emits",
        "q04_per_doc_counts",
        "q05_global_count",
        "q09_fnv_bucket_histogram",
        "q10_global_sort",
        "q07_kv_point_in_time",
        "q08_shard_histogram",
        "q14_semi_join",
        "q14_anti_join",
        "q16_count_distinct",
        "q18_window_topk_per_group",
        "q20_global_topk",
        "q21_set_ops",
        "q23_array_functions",
        "q25_tumbling_window",
        "q26_sliding_window",
        "q32_simhash",
        "q33_exact_dedup_docs",
        "q44_map_functions",
        "q108_quality_gated_admission",
        "q50_window_battery",
        "q52_pandas_udf_path",
        "q103_cascade_admission",
        "q57_asof_join",
        "q73_simhash_banded_neardup",
        "q81_training_corpus",
    ),
    12: (
        "q94_streaming_session_replay",
        "q95_incremental_ingest_dedup",
        "q96_incremental_rollup_replay",
        "q97_session_funnel",
        "q98_cohort_retention",
        "q99_session_transitions",
        "q100_token_chunking",
        "q82_streaming_tumbling_replay",
        "q93_embedding_quantize",
        "q58_range_join_binned",
        "q12_join_revenue_per_nation",
        "q74_hll_error_bound",
        "q61_correlated_subqueries",
        "q40_lang_id",
        "q35_ann_lsh",
        "q37_multimodal_features",
        "q56_ann_ivf",
        "q78_stratified_hash_sample",
        "q13_broadcast_join",
        "q15_tpch_q1_shape",
        "q17_rollup",
        "q19_window_running_sum",
        "q22_scalar_battery",
        "q45_cube",
        "q46_sql_frontend_join",
        "q48_salted_skew_agg",
        "q51_pivot",
        "q53_null_handling",
        "q64_summary_stats",
        "q66_json_functions",
        "q68_merge_upsert",
        "q109_multimodal_phash_neardup",
        "q69_approx_percentiles",
        "q27_session_window",
        "q65_hierarchical_rollup",
        "q54_percentiles",
        "q59_string_battery",
        "q60_grouping_sets",
        "q107_decontaminating_admission",
        "q67_multiset_ops",
        "q70_grouped_agg_pandas_udf",
        "q71_dedup_corpus_output",
        "q105_training_corpus_decontaminated",
        "q41_quality_score",
        "q42_token_stats",
        "q43_fingerprint",
        "q76_multimodal_frame_sample",
        "q77_multimodal_resize",
        "q79_sequence_packing",
        "q80_contamination_check",
    ),
}


def driver_window() -> list[str]:
    """The names the external driver will actually record this round."""
    return CURATED_ORDER[:DRIVER_WINDOW]


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side-effect: registration) and return
    the registry in the curated driver-exposure order."""
    import mapreduce_framework_spark.operators.mr_queries  # noqa: F401
    import mapreduce_framework_spark.operators.relational  # noqa: F401
    import mapreduce_framework_spark.operators.kv  # noqa: F401
    import mapreduce_framework_spark.operators.windows  # noqa: F401
    import mapreduce_framework_spark.operators.sql_frontend  # noqa: F401
    import mapreduce_framework_spark.operators.skew  # noqa: F401
    import mapreduce_framework_spark.operators.graph  # noqa: F401
    import mapreduce_framework_spark.operators.functions_battery  # noqa: F401
    import mapreduce_framework_spark.operators.temporal  # noqa: F401
    import mapreduce_framework_spark.operators.funnel  # noqa: F401
    import mapreduce_framework_spark.pipeline.dedup  # noqa: F401
    import mapreduce_framework_spark.pipeline.similarity  # noqa: F401
    import mapreduce_framework_spark.pipeline.text_analysis  # noqa: F401
    import mapreduce_framework_spark.pipeline.multimodal  # noqa: F401
    import mapreduce_framework_spark.pipeline.sampling  # noqa: F401
    import mapreduce_framework_spark.pipeline.quality  # noqa: F401
    import mapreduce_framework_spark.operators.streaming_replay  # noqa: F401
    import mapreduce_framework_spark.operators.shardctrler  # noqa: F401
    import mapreduce_framework_spark.pipeline.span_dedup  # noqa: F401
    import mapreduce_framework_spark.pipeline.semantic_dedup  # noqa: F401
    import mapreduce_framework_spark.pipeline.multimodal_dedup  # noqa: F401

    missing = set(REGISTRY) - set(CURATED_ORDER)
    extra = set(CURATED_ORDER) - set(REGISTRY)
    if missing or extra:  # force new registrations into an explicit slot
        raise RuntimeError(
            f"CURATED_ORDER out of sync: missing={sorted(missing)} extra={sorted(extra)}"
        )
    if len(CURATED_ORDER) != len(set(CURATED_ORDER)):
        # a duplicate passes the set checks but shifts every later entry,
        # silently rotating position 50 out of the driver window
        dupes = sorted({n for n in CURATED_ORDER if CURATED_ORDER.count(n) > 1})
        raise RuntimeError(f"CURATED_ORDER has duplicates: {dupes}")
    return {name: REGISTRY[name] for name in CURATED_ORDER}
