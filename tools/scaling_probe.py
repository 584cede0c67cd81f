#!/usr/bin/env python3
"""Measured scaling for the LLM-pipeline families (SCALING.md evidence).

Amplifies the documents corpus by self-union with shifted doc_ids (the
same no-synthetic-data methodology as the relational probe in SCALING.md)
and measures wall-clock for the scale-path operators:

- MinHash-LSH near-dup (lsh_neardup_pairs)       — the q31 path
- banded SimHash near-dup (simhash_banded_pairs) — the q73 path
- SimHash fingerprints (simhash_of)              — the q32 scan
- contamination check shape (broadcast shingle join)

Amplified copies are *exact* duplicates of each other, so near-dup pair
counts grow with copies² × planted-pairs + copies-choose-2 × corpus —
realistic for dedup (that's what it exists to find); the number to watch
is wall-clock vs input rows on the signature/banding stages, which must
stay ~linear.

Usage: python tools/scaling_probe.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.deploy import ensure_package_on_executors
from mapreduce_framework_spark.pipeline.dedup import (
    lsh_neardup_pairs,
    shingles_of,
    simhash_banded_pairs,
    simhash_of,
)
from mapreduce_framework_spark.session import get_spark


def amplify(docs, factor: int):
    span = 10_000_000
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * span)).alias("doc_id"),
            "text",
        )
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def probe_incremental(spark, base) -> None:
    """Round-4 families: the incremental-dedup lifecycle and the chunking
    scan. The index side is amplified (the corpus grows); the batch side
    stays FIXED — match_batch wall must track the batch, not the index."""
    import shutil
    import tempfile

    from mapreduce_framework_spark.pipeline.dedup import (
        index_signatures,
        match_batch,
    )
    from mapreduce_framework_spark.pipeline.sampling import chunk_documents

    max_id = base.agg(F.max("doc_id")).collect()[0][0]
    cut = (max_id + 1) * 9 // 10  # fixed 10% batch, corpus-size-derived
    batch = base.where(F.col("doc_id") >= cut)
    print("| index docs | index build (once) | match_batch wall (rows) | chunking wall (rows) |")
    print("|---|---|---|---|")
    for factor in (1, 2, 4):
        index_docs = amplify(base.where(F.col("doc_id") < cut), factor)
        idx_dir = tempfile.mkdtemp(prefix="mfs_probe_idx_")
        try:
            t0 = time.perf_counter()
            index_signatures(index_docs).write.mode("overwrite").parquet(idx_dir)
            t_build = round(time.perf_counter() - t0, 2)
            idx = spark.read.parquet(idx_dir)
            n_index = idx.count()
            t_match, n_match = timed(match_batch(idx, batch))
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)
        t_chunk, n_chunks = timed(chunk_documents(amplify(base, factor)))
        print(
            f"| {n_index} | {t_build} s | {t_match} s ({n_match}) | "
            f"{t_chunk} s ({n_chunks}) |"
        )


def probe_span_dedup(spark, base) -> None:
    """Round-4 library-first family: span-level dedup. Amplified copies are
    exact duplicates, so every copy's blocks are dropped in favor of the
    base instance (n_kept collapses); wall must stay ~linear in rows while
    the dropped fraction rises with the amplification."""
    from mapreduce_framework_spark.pipeline.span_dedup import span_dedup

    print("| docs | span-dedup wall | docs fully deduped |")
    print("|---|---|---|")
    for factor in (1, 2, 4):
        docs = amplify(base, factor)
        t0 = time.perf_counter()
        out = span_dedup(docs)
        gone = out.where(F.col("n_kept") == 0).count()
        n = out.count()
        t = round(time.perf_counter() - t0, 2)
        print(f"| {n} | {t} s | {gone} |")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="mfs-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)
    base = table(spark, "documents", sf_dir).select("doc_id", "text")
    base.count()  # warm
    probe_incremental(spark, base)
    print()
    probe_span_dedup(spark, base)
    print()

    print(f"| docs | simhash wall | banded-pairs wall (rows) | lsh-pairs wall (rows) | contamination wall |")
    print("|---|---|---|---|---|")
    for factor in (1, 2, 4):
        docs = amplify(base, factor).localCheckpoint(eager=True)
        n_docs = docs.count()
        t_sim, _ = timed(simhash_of(docs))
        t_band, n_band = timed(simhash_banded_pairs(docs))
        t_lsh, n_lsh = timed(lsh_neardup_pairs(docs))
        sh = shingles_of(docs)
        bench = sh.where(F.col("doc_id") < 50).select(
            F.col("doc_id").alias("bench_id"), "s"
        )
        contam = (
            sh.where(F.col("doc_id") >= 50)
            .join(F.broadcast(bench), "s")
            .groupBy("doc_id")
            .agg(F.countDistinct("s").alias("n"))
        )
        t_con, _ = timed(contam)
        print(
            f"| {n_docs} | {t_sim} s | {t_band} s ({n_band}) | "
            f"{t_lsh} s ({n_lsh}) | {t_con} s |"
        )


if __name__ == "__main__":
    main()
