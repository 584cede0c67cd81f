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
# contract. The curated order below puts (a) every query changed this
# round and (b) every query that has never received a driver correctness
# row inside the window, padded with one stalwart flagship per operator
# family for continuity; long-stable queries rotate behind position 50
# (they remain covered by the local pytest oracle sweep, which runs all of
# them). Rotate per round so every query periodically re-enters the window.
CURATED_ORDER = [
    # relational core (dtype-canonicalization fixes this round)
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
    # approximate family + validity gates
    "q29_approx_count_distinct",
    "q69_approx_percentiles",
    "q74_hll_error_bound",
    "q75_percentile_sketch_bound",
    # streaming execution paths, driver-checked via availableNow replay
    "q82_streaming_tumbling_replay",
    "q83_streaming_kv_replay",
    # windows / temporal
    "q27_session_window",
    "q65_hierarchical_rollup",
    "q57_asof_join",
    "q58_range_join_binned",
    # never-driver-checked batteries
    "q54_percentiles",
    "q59_string_battery",
    "q60_grouping_sets",
    "q61_correlated_subqueries",
    "q63_posexplode",
    "q67_multiset_ops",
    "q70_grouped_agg_pandas_udf",
    # dedup pipeline
    "q31_minhash_lsh_neardup",
    "q71_dedup_corpus_output",
    "q72_char_ngram_jaccard",
    "q73_simhash_banded_neardup",
    # similarity / ANN
    "q34_ann_bruteforce",
    "q35_ann_lsh",
    "q36_embedding_neardup",
    "q56_ann_ivf",
    # text analysis + multimodal
    "q40_lang_id",
    "q41_quality_score",
    "q42_token_stats",
    "q43_fingerprint",
    "q37_multimodal_features",
    "q76_multimodal_frame_sample",
    "q77_multimodal_resize",
    # corpus shaping (new this round)
    "q78_stratified_hash_sample",
    "q79_sequence_packing",
    "q80_contamination_check",
    "q81_training_corpus",
    # ---- position 51+: stable since round 1, pytest-swept every run ----
    # (rotated out this round: green in r1, unchanged since)
    "q01_wordcount",
    "q28_kv_stateful_replay",
    "q06_kv_final_state",
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
]

DRIVER_WINDOW = 50


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
    import mapreduce_framework_spark.pipeline.dedup  # noqa: F401
    import mapreduce_framework_spark.pipeline.similarity  # noqa: F401
    import mapreduce_framework_spark.pipeline.text_analysis  # noqa: F401
    import mapreduce_framework_spark.pipeline.multimodal  # noqa: F401
    import mapreduce_framework_spark.pipeline.sampling  # noqa: F401
    import mapreduce_framework_spark.operators.streaming_replay  # noqa: F401

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
