#!/usr/bin/env python3
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect). Session uses the package defaults (AQE on, Arrow on).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_framework_spark.deploy import ensure_package_on_executors
from mapreduce_framework_spark.registry import all_queries
from mapreduce_framework_spark.session import get_spark

# The 17 queries benched in round 1 — their sum is the like-for-like
# round-over-round comparison (the suite below has since widened; see
# BASELINE.md "Round 2").
R1_SUBSET = {
    "q01_wordcount",
    "q02_inverted_index",
    "q06_kv_final_state",
    "q11_filter_project",
    "q12_join_revenue_per_nation",
    "q15_tpch_q1_shape",
    "q17_rollup",
    "q18_window_topk_per_group",
    "q20_global_topk",
    "q25_tumbling_window",
    "q28_kv_stateful_replay",
    "q30_ngram_jaccard_neardup",
    "q31_minhash_lsh_neardup",
    "q34_ann_bruteforce",
    "q37_multimodal_features",
    "q48_salted_skew_agg",
    "q57_asof_join",
}

# Representative slice of SURVEY §2.5: one per operator family.
HEADLINE = [
    "q01_wordcount",            # tokenize+flatMap+agg (A1)
    "q02_inverted_index",       # per-doc distinct + holistic concat (A2)
    "q06_kv_final_state",       # per-key ordered fold (K1-K3)
    "q11_filter_project",       # pushdown scan
    "q12_join_revenue_per_nation",  # multi-join + agg
    "q15_tpch_q1_shape",        # wide agg
    "q17_rollup",               # grouping sets
    "q18_window_topk_per_group",  # window rank
    "q20_global_topk",          # TakeOrderedAndProject
    "q25_tumbling_window",      # time windows
    "q28_kv_stateful_replay",   # applyInPandas custom stateful
    "q30_ngram_jaccard_neardup",  # exact near-dup self-join
    "q31_minhash_lsh_neardup",  # minhash-LSH scale path
    "q34_ann_bruteforce",       # similarity search
    "q37_multimodal_features",  # mapInPandas binary featurizer
    "q48_salted_skew_agg",      # skew-resilient two-stage agg
    "q57_asof_join",            # as-of join (merge-sorted-streams form)
    # similarity / text / dedup-scale families (driver-checked from r2 on;
    # benched so regressions in them are visible round-over-round)
    "q35_ann_lsh",              # hyperplane-LSH ANN
    "q56_ann_ivf",              # IVF ANN (centroid broadcast join)
    "q36_embedding_neardup",    # embedding-cosine near-dup
    "q40_lang_id",              # text analysis: n-gram language ID
    "q42_token_stats",          # text analysis: token counting
    "q73_simhash_banded_neardup",  # banded SimHash (no cross join)
    "q70_grouped_agg_pandas_udf",  # GROUPED_AGG pandas UDF path
    "q79_sequence_packing",        # corpus shaping: per-source window pack
    "q80_contamination_check",     # corpus shaping: broadcast shingle join
    "q81_training_corpus",         # composed dedup->filter->sample->pack
    "q84_char_ngram_lsh_neardup",  # char-shingle LSH (unbounded scale path)
    "q87_boilerplate_doc_stats",   # repeated-span flagging (broadcast dict)
    "q88_repetition_stats",        # Gopher repetition signals (distributed mode)
    "q89_denylist_scrub",          # regex redaction + scrubbed-text fingerprint
    "q90_domain_mix_resample",     # domain mixing (agg -> broadcast rates)
    "q91_cross_snapshot_dedup",    # incremental dedup (cross-side LSH band join)
    "q92_tfidf_topk",              # tf-idf top terms (tf ⋈ df + window top-k)
    "q93_embedding_quantize",      # int8 vector quantization (per-row arrays)
    # round-4 batch additions (product analytics + chunking). The three
    # streaming replays (q94-q96) stay out of HEADLINE: their builders run
    # a multi-batch stream to completion, so their wall time measures
    # micro-batch scheduling, not plan quality — engine-side latency for
    # those lives in tests/test_streaming.py's state-bound assertions.
    "q97_session_funnel",          # session_window + per-user funnel agg
    "q98_cohort_retention",        # cohort triangle (two aggs + equi-join)
    "q99_session_transitions",     # gaps-and-islands sessionization (lag+sum)
    "q100_token_chunking",         # sliding-window chunking (per-row arrays)
    # round-5 registrations (library-first since r4; candidate numbers in
    # BASELINE.md's round-4 note)
    "q101_span_dedup",             # C4-style keep-first span dedup (min-agg)
    "q102_semantic_dedup",         # SemDeDup cell-bounded drop list
    # round-8 registration: the 5-stage decontaminated flagship
    "q105_training_corpus_decontaminated",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mfs-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)

    specs = all_queries()
    builders = {n: specs[n].builder for n in HEADLINE if n in specs}
    # q34 (round 8), q30 (round 9) and q36 (round 13) were RETIRED from the
    # registry (their driver slots funded q105/q106/q110), but the
    # like-for-like bench series keeps timing them — the retirement policy
    # keeps every retired builder in the repo permanently
    from mapreduce_framework_spark.pipeline.dedup import q30_ngram_jaccard_neardup
    from mapreduce_framework_spark.pipeline.similarity import (
        q34_ann_bruteforce,
        q36_embedding_neardup,
    )

    builders["q34_ann_bruteforce"] = q34_ann_bruteforce
    builders["q30_ngram_jaccard_neardup"] = q30_ngram_jaccard_neardup
    builders["q36_embedding_neardup"] = q36_embedding_neardup
    # warm the session (JVM/codegen/FS init) so q01 doesn't absorb startup
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    # Two series per query (the round-2 confound was publishing only their
    # sum while the semantics changed mid-round):
    #   build_sec — builder call: plan construction + any eager work the
    #               builder performs (localCheckpoint materialization,
    #               iterative components); ~0 for purely lazy builders
    #   exec_sec  — end-to-end execution of the built plan into a noop sink
    # `queries` (their sum) stays the headline so regressions in eager
    # builder work remain charged to the query that causes them.
    build: dict[str, float] = {}
    execute: dict[str, float] = {}
    execute_warm: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = builders[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        # WARM exec (round 10, verdict task 2): the round-9 adjudication
        # proved single-shot exec at sf0.1 is dominated 2-4x by per-plan
        # fixed costs (codegen JIT, shuffle-file setup) that host state
        # modulates — every cross-round regression hunt dissolved into
        # "host". The compact driver line therefore publishes the MIN of
        # two warm re-runs of the identical plan (min is the standard
        # noise-robust microbench estimator; a single warm run still
        # carried one-tail scheduler noise on sub-second plans —
        # BASELINE.md round-10 measurement); cold stays in the full
        # record as the fixed-cost series. Totals keep their historical
        # build+cold semantics — the round-2 lesson about never changing
        # a published series' meaning mid-stream.
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        build[name] = round(t1 - t0, 3)
        execute[name] = round(t2 - t1, 3)
        execute_warm[name] = round(min(t3 - t2, t4 - t3), 3)
        timings[name] = round(t2 - t0, 3)

    # Steady-state incremental dedup: q91's registry form rebuilds the
    # index signatures from scratch (its oracle-checked convenience path);
    # production persists index_signatures once per snapshot. Timing
    # match_batch against a prebuilt index is the number that holds at
    # 100×: per-batch work excludes the index build entirely.
    steady: dict[str, float] = {}
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from mapreduce_framework_spark.catalog import table
        from mapreduce_framework_spark.pipeline.dedup import (
            banded_signatures,
            index_signatures,
            match_batch,
        )

        docs = table(spark, "documents", sf_dir)
        cut = docs.agg(((F.max("doc_id") + 1) / 2).cast("long")).collect()[0][0]
        idx_dir = tempfile.mkdtemp(prefix="mfs_bench_idx_")
        try:
            # the bands build (and its read-back) is timed SEPARATELY so
            # q91_index_build_once_sec keeps the meaning of the rounds 3-6
            # series (signatures only); the banded layout is an additional
            # build-once cost introduced in round 7
            t0 = time.perf_counter()
            index_signatures(docs.where(F.col("doc_id") < cut)).write.mode(
                "overwrite"
            ).parquet(os.path.join(idx_dir, "sigs"))
            t0b = time.perf_counter()
            idx = spark.read.parquet(os.path.join(idx_dir, "sigs"))
            banded_signatures(idx).write.mode("overwrite").parquet(
                os.path.join(idx_dir, "bands")
            )
            t1 = time.perf_counter()
            bands = spark.read.parquet(os.path.join(idx_dir, "bands"))
            new_docs = docs.where(F.col("doc_id") >= cut)
            t2 = time.perf_counter()
            match_batch(idx, new_docs).write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            match_batch(idx, new_docs, index_bands=bands).write.format(
                "noop"
            ).mode("overwrite").save()
            t4 = time.perf_counter()
            # round 14 (VERDICT r13 item 3, guide §6): the BUCKETED band
            # layout — one-time bucketBy write on the candidate-join key,
            # then the per-batch probe reads the index pre-partitioned
            # (no index-side Exchange once the batch outgrows broadcast).
            # Addition-only series; the plain/banded series above keep
            # their historical meaning.
            from mapreduce_framework_spark.pipeline.dedup import (
                publish_banded_bucketed,
            )

            spark.sql("DROP TABLE IF EXISTS mfs_bench_bands_bucketed")
            t4b = time.perf_counter()
            publish_banded_bucketed(
                bands,
                "mfs_bench_bands_bucketed",
                os.path.join(idx_dir, "bands_bucketed"),
            )
            t5 = time.perf_counter()
            match_batch(
                idx, new_docs,
                index_bands=spark.table("mfs_bench_bands_bucketed"),
            ).write.format("noop").mode("overwrite").save()
            t6 = time.perf_counter()
            spark.sql("DROP TABLE IF EXISTS mfs_bench_bands_bucketed")
            steady["q91_index_build_once_sec"] = round(t0b - t0, 3)
            steady["q91_bands_build_sec"] = round(t1 - t0b, 3)
            steady["q91_match_batch_sec"] = round(t3 - t2, 3)
            steady["q91_match_batch_banded_sec"] = round(t4 - t3, 3)
            steady["q91_bands_bucketed_build_sec"] = round(t5 - t4b, 3)
            steady["q91_match_batch_bucketed_sec"] = round(t6 - t5, 3)
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)
    except Exception as ex:  # bench must still emit its line
        steady["error"] = f"{type(ex).__name__}: {ex}"[:200]

    # Steady-state semantic dedup (round 6): the same lifecycle for the
    # embedding family — fit the fixed-K codebook once, persist the cell
    # index once, then match each batch at O(batch). q102's registry form
    # stays the stride-centroid rebuild (oracle contract); these are the
    # numbers that hold at 100×.
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from mapreduce_framework_spark.catalog import table
        from mapreduce_framework_spark.pipeline.codebook import fit_codebook
        from mapreduce_framework_spark.pipeline.semantic_dedup import (
            semantic_index,
            semantic_match_batch,
        )

        embs = table(spark, "embeddings", sf_dir)
        vcut = embs.agg(((F.max("vec_id") + 1) / 2).cast("long")).collect()[0][0]
        snapshot = embs.where(F.col("vec_id") < vcut)
        batch = embs.where(F.col("vec_id") >= vcut)
        sem_dir = tempfile.mkdtemp(prefix="mfs_bench_sem_")
        try:
            t0 = time.perf_counter()
            cb = fit_codebook(snapshot, k=64, iters=4)
            cb.write.mode("overwrite").parquet(os.path.join(sem_dir, "cb"))
            t1 = time.perf_counter()
            cb = spark.read.parquet(os.path.join(sem_dir, "cb"))
            semantic_index(snapshot, cb).write.mode("overwrite").parquet(
                os.path.join(sem_dir, "idx")
            )
            t2 = time.perf_counter()
            idx = spark.read.parquet(os.path.join(sem_dir, "idx"))
            semantic_match_batch(idx, batch, cb).write.format("noop").mode(
                "overwrite"
            ).save()
            t3 = time.perf_counter()
            steady["sem_codebook_fit_once_sec"] = round(t1 - t0, 3)
            steady["sem_index_build_once_sec"] = round(t2 - t1, 3)
            steady["sem_match_batch_sec"] = round(t3 - t2, 3)
        finally:
            shutil.rmtree(sem_dir, ignore_errors=True)
    except Exception as ex:  # bench must still emit its line
        steady["sem_error"] = f"{type(ex).__name__}: {ex}"[:200]

    # Steady-state FULL-cascade admission (round 7): per-batch cost of the
    # three-tier sink (exact → MinHash → semantic) against prebuilt
    # manifest-addressed indexes — the per-micro-batch number that holds at
    # 1e5 batches (index reads are manifest-bounded and compacted; the seed
    # batch is the one-time cost). Fixed-K fitted codebook = the production
    # shape, so the semantic tier's broadcast side is O(K·dim), not O(n).
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from mapreduce_framework_spark.catalog import table
        from mapreduce_framework_spark.pipeline.codebook import fit_codebook
        from mapreduce_framework_spark.streaming.ingest import (
            make_full_cascade_ingest_batch_fn,
        )

        docs = table(spark, "documents", sf_dir).select("doc_id", "text")
        embs = table(spark, "embeddings", sf_dir).select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        de = docs.join(embs, "doc_id", "left")
        cut = de.agg(((F.max("doc_id") + 1) / 2).cast("long")).collect()[0][0]
        b0 = de.where(F.col("doc_id") < cut).localCheckpoint(eager=True)
        b1 = de.where(F.col("doc_id") >= cut).localCheckpoint(eager=True)
        casc_dir = tempfile.mkdtemp(prefix="mfs_bench_casc_")
        try:
            cb = fit_codebook(
                table(spark, "embeddings", sf_dir).where(F.col("vec_id") < cut),
                k=64,
                iters=2,
            ).localCheckpoint(eager=True)
            fn = make_full_cascade_ingest_batch_fn(
                spark,
                os.path.join(casc_dir, "fp"),
                os.path.join(casc_dir, "sig"),
                os.path.join(casc_dir, "sem"),
                os.path.join(casc_dir, "dec"),
                cb,
                threshold=0.8,
            )
            t0 = time.perf_counter()
            fn(b0, 0)
            t1 = time.perf_counter()
            fn(b1, 1)
            t2 = time.perf_counter()
            steady["cascade_seed_batch_sec"] = round(t1 - t0, 3)
            steady["cascade_match_batch_sec"] = round(t2 - t1, 3)
        finally:
            shutil.rmtree(casc_dir, ignore_errors=True)
    except Exception as ex:  # bench must still emit its line
        steady["cascade_error"] = f"{type(ex).__name__}: {ex}"[:200]

    # Steady-state FOUR-tier cascade (round 10, verdict task 3): the same
    # per-batch lifecycle with the DECONTAMINATION tier wired
    # (benchmark_span_index) — q107's registered shape. The benchmark
    # split is q105/q107's doc_id % 17 == 0 rule; its span index is the
    # build-once artifact (timed separately, like the codebook), and the
    # seed/match batches carry the remaining pool. The decon tier's
    # per-batch cost is cascade4_* minus cascade_* — a driver-visible
    # cross-round series instead of a one-off SCALING.md probe.
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from mapreduce_framework_spark.catalog import table
        from mapreduce_framework_spark.pipeline.codebook import fit_codebook
        from mapreduce_framework_spark.pipeline.span_dedup import span_index
        from mapreduce_framework_spark.streaming.ingest import (
            make_full_cascade_ingest_batch_fn,
        )

        docs = table(spark, "documents", sf_dir).select("doc_id", "text")
        embs = table(spark, "embeddings", sf_dir).select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        bench_docs = docs.where(F.col("doc_id") % 17 == 0)
        pool = docs.where(F.col("doc_id") % 17 != 0).join(embs, "doc_id", "left")
        cut = pool.agg(((F.max("doc_id") + 1) / 2).cast("long")).collect()[0][0]
        b0 = pool.where(F.col("doc_id") < cut).localCheckpoint(eager=True)
        b1 = pool.where(F.col("doc_id") >= cut).localCheckpoint(eager=True)
        casc4_dir = tempfile.mkdtemp(prefix="mfs_bench_casc4_")
        try:
            t0 = time.perf_counter()
            bsi = span_index(bench_docs).localCheckpoint(eager=True)
            t1 = time.perf_counter()
            cb = fit_codebook(
                table(spark, "embeddings", sf_dir).where(F.col("vec_id") < cut),
                k=64,
                iters=2,
            ).localCheckpoint(eager=True)
            fn4 = make_full_cascade_ingest_batch_fn(
                spark,
                os.path.join(casc4_dir, "fp"),
                os.path.join(casc4_dir, "sig"),
                os.path.join(casc4_dir, "sem"),
                os.path.join(casc4_dir, "dec"),
                cb,
                threshold=0.8,
                benchmark_span_index=bsi,
                cont_threshold=0.05,
            )
            t2 = time.perf_counter()
            fn4(b0, 0)
            t3 = time.perf_counter()
            fn4(b1, 1)
            t4 = time.perf_counter()
            steady["cascade4_span_index_build_once_sec"] = round(t1 - t0, 3)
            steady["cascade4_seed_batch_sec"] = round(t3 - t2, 3)
            steady["cascade4_match_batch_sec"] = round(t4 - t3, 3)

            # Steady-state FIVE-tier cascade (round 11, verdict task 2):
            # the same lifecycle with the QUALITY gate on — q108's
            # registered shape (quality → exact → MinHash → semantic →
            # decon). Reuses this block's bench split, span index, and
            # codebook so cascade5_* minus cascade4_* prices exactly the
            # quality tier per batch as a cross-round driver series (the
            # SCALING.md r10 probe measured it linear, ~0.11 ms/row
            # marginal, and net-negative composed: quality rejects skip
            # every index tier).
            casc5_dir = tempfile.mkdtemp(prefix="mfs_bench_casc5_")
            try:
                fn5 = make_full_cascade_ingest_batch_fn(
                    spark,
                    os.path.join(casc5_dir, "fp"),
                    os.path.join(casc5_dir, "sig"),
                    os.path.join(casc5_dir, "sem"),
                    os.path.join(casc5_dir, "dec"),
                    cb,
                    threshold=0.8,
                    benchmark_span_index=bsi,
                    cont_threshold=0.05,
                    quality_gate=True,
                )
                t5 = time.perf_counter()
                fn5(b0, 0)
                t6 = time.perf_counter()
                fn5(b1, 1)
                t7 = time.perf_counter()
                steady["cascade5_seed_batch_sec"] = round(t6 - t5, 3)
                steady["cascade5_match_batch_sec"] = round(t7 - t6, 3)
            finally:
                shutil.rmtree(casc5_dir, ignore_errors=True)

            # Steady-state SIX-tier cascade (round 12): the same
            # lifecycle with the MEDIA/phash tier on too — the staged
            # q110 shape (quality → exact → media → MinHash → semantic →
            # decon, every opt-in tier of the production sink). Reuses
            # the split/span-index/codebook above so cascade6_* minus
            # cascade5_* prices exactly the perceptual tier per batch
            # (one Arrow hash pass + the 9-keys/doc band join) as a
            # cross-round driver series.
            casc6_dir = tempfile.mkdtemp(prefix="mfs_bench_casc6_")
            try:
                fn6 = make_full_cascade_ingest_batch_fn(
                    spark,
                    os.path.join(casc6_dir, "fp"),
                    os.path.join(casc6_dir, "sig"),
                    os.path.join(casc6_dir, "sem"),
                    os.path.join(casc6_dir, "dec"),
                    cb,
                    threshold=0.8,
                    benchmark_span_index=bsi,
                    cont_threshold=0.05,
                    quality_gate=True,
                    phash_index_root=os.path.join(casc6_dir, "ph"),
                )
                t8 = time.perf_counter()
                fn6(b0, 0)
                t9 = time.perf_counter()
                fn6(b1, 1)
                t10 = time.perf_counter()
                steady["cascade6_seed_batch_sec"] = round(t9 - t8, 3)
                steady["cascade6_match_batch_sec"] = round(t10 - t9, 3)
            finally:
                shutil.rmtree(casc6_dir, ignore_errors=True)
        finally:
            shutil.rmtree(casc4_dir, ignore_errors=True)
    except Exception as ex:  # bench must still emit its line
        steady["cascade4_error"] = f"{type(ex).__name__}: {ex}"[:200]

    total = round(sum(timings.values()), 3)
    r1_sum = round(sum(t for q, t in timings.items() if q in R1_SUBSET), 3)
    r1_exec = round(sum(t for q, t in execute.items() if q in R1_SUBSET), 3)
    r1_exec_warm = round(
        sum(t for q, t in execute_warm.items() if q in R1_SUBSET), 3
    )
    loadavg = [round(x, 2) for x in os.getloadavg()]
    # The FULL record (per-query build+exec splits) — kept for humans and
    # BASELINE.md bookkeeping, printed first so the driver's bounded tail
    # capture never truncates the machine-readable line below.
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock_full",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_build": build,
                "queries_exec": execute,
                "queries_exec_warm": execute_warm,
                "sf": sf_dir,
                "n_queries": len(timings),
                # like-for-like series vs round 1's 17-query suite:
                # r1 timers were exec-only, so r1_subset_exec_sec is the
                # clean A/B against round 1's ~26-30 s; r1_subset_sec keeps
                # the round-2 builder-inclusive semantics.
                # r1_subset_exec_warm_sec (round 10): the second-run sum —
                # the stable regression series (BASELINE.md round-10)
                "r1_subset_sec": r1_sum,
                "r1_subset_exec_sec": r1_exec,
                "r1_subset_exec_warm_sec": r1_exec_warm,
                "steady_state": steady,
                # host load (1/5/15-min averages) at end of run: round 4
                # discarded one 3-10x-degraded run by hand; recording load
                # makes a degraded-host bench machine-adjudicable
                "loadavg": loadavg,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )
    # The driver contract line — LAST on stdout and kept COMPACT: rounds 6
    # and 7 lost their machine-readable bench signal ("parsed": null)
    # because the single giant JSON line overflowed the driver's tail
    # capture. Round 9 (verdict item: the r8 totals-only line made the q56
    # exec watch item unadjudicable from the artifact): the per-query dict
    # here is EXEC seconds — the metric every cross-round series and
    # watch item is defined on. Round 10 (verdict task 2) added the WARM
    # (second-run) exec series; round 11 (ADVICE): it is published under
    # its OWN key "queries_exec_warm" — r10's compact line had reused
    # "queries_exec" for it, silently redefining the r1-r9 series (the
    # exact mid-stream rename the round-2 note above warns against), so
    # r10's compact "queries_exec" values are warm, not cold. The cold
    # per-query series stays in the full record (key unchanged there).
    # Round 13 (measurement-bug fix, OPTIMIZATION_r13.md): the driver's
    # tail capture is 2000 bytes and parses the LAST line only — r11's
    # compact line measured 1998 bytes and r12's (two new cascade6 keys)
    # overflowed, so BENCH_r12.json has "parsed": null. steady_state
    # therefore moves OUT of the compact line into its own labeled line
    # just above it (still inside the full record too, key unchanged, so
    # no published series is renamed or dropped); the compact line is back
    # to ~1.6 kB with room for future suite growth.
    print(
        json.dumps(
            {"metric": "steady_state", "steady_state": steady},
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries_exec_warm": execute_warm,
                "exec_cold_total_sec": round(sum(execute.values()), 3),
                "exec_warm_total_sec": round(sum(execute_warm.values()), 3),
                "build_total_sec": round(sum(build.values()), 3),
                "sf": sf_dir,
                "n_queries": len(timings),
                "r1_subset_sec": r1_sum,
                "r1_subset_exec_sec": r1_exec,
                "r1_subset_exec_warm_sec": r1_exec_warm,
                "loadavg": loadavg,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
