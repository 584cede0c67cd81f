#!/usr/bin/env python3
"""Round-14 adjudication of the r13 steady-state streaming question
(VERDICT r13 item 1): in ONE SparkSession, alternate the publish-chain
pool width (SPARK_GRAFT_PUBLISH_CONCURRENCY = 1 / 2 / 6) across repeated
full-cascade seed+match batches, 3 trials each, interleaved so host
drift cannot masquerade as a code effect (the round-13 lesson: solo-run
deltas on this host are +/-30-100%).

Width 1 = sequential publishes (the pre-r13 form), 2 = guide §2.6's
"2-3 jobs in flight", 6 = the r13 uncapped form (up to 5 live chains).

Optionally (--config-ab) also alternates the r13 session join config
(preferSortMergeJoin=false + SHJ local-map threshold 64m) against Spark
defaults on the sem_codebook_fit / sem_index_build / sem_match series,
which do NOT go through _run_publish_chains — the other candidate
explanation for the driver's regressed sem_* lines.

Usage: python tools/ab_publish_chains.py [--sf DIR] [--trials N]
           [--tiers 3|6] [--config-ab]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_framework_spark.catalog import table  # noqa: E402
from mapreduce_framework_spark.deploy import (  # noqa: E402
    ensure_package_on_executors,
)
from mapreduce_framework_spark.pipeline.codebook import fit_codebook  # noqa: E402
from mapreduce_framework_spark.session import get_spark  # noqa: E402
from mapreduce_framework_spark.streaming.ingest import (  # noqa: E402
    make_full_cascade_ingest_batch_fn,
)


def run_cascade(spark, b0, b1, cb, tiers, bsi, width):
    os.environ["SPARK_GRAFT_PUBLISH_CONCURRENCY"] = str(width)
    d = tempfile.mkdtemp(prefix=f"mfs_ab_w{width}_")
    try:
        kwargs = dict(threshold=0.8)
        if tiers == 6:
            kwargs.update(
                benchmark_span_index=bsi,
                cont_threshold=0.05,
                quality_gate=True,
                phash_index_root=os.path.join(d, "ph"),
            )
        fn = make_full_cascade_ingest_batch_fn(
            spark,
            os.path.join(d, "fp"),
            os.path.join(d, "sig"),
            os.path.join(d, "sem"),
            os.path.join(d, "dec"),
            cb,
            **kwargs,
        )
        t0 = time.perf_counter()
        fn(b0, 0)
        t1 = time.perf_counter()
        fn(b1, 1)
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def run_sem_series(spark, snapshot, batch):
    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        semantic_index,
        semantic_match_batch,
    )

    d = tempfile.mkdtemp(prefix="mfs_ab_sem_")
    try:
        t0 = time.perf_counter()
        cb = fit_codebook(snapshot.select("vec_id", "embedding"), k=64, iters=4)
        cb.write.mode("overwrite").parquet(os.path.join(d, "cb"))
        t1 = time.perf_counter()
        cb = spark.read.parquet(os.path.join(d, "cb"))
        semantic_index(snapshot, cb).write.mode("overwrite").parquet(
            os.path.join(d, "idx")
        )
        t2 = time.perf_counter()
        idx = spark.read.parquet(os.path.join(d, "idx"))
        semantic_match_batch(idx, batch, cb).write.format("noop").mode(
            "overwrite"
        ).save()
        t3 = time.perf_counter()
        return t1 - t0, t2 - t1, t3 - t2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--tiers", type=int, default=3, choices=(3, 6))
    ap.add_argument("--widths", default="1,2,6")
    ap.add_argument("--config-ab", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="ab-publish-chains")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)

    docs = table(spark, "documents", args.sf).select("doc_id", "text")
    embs = table(spark, "embeddings", args.sf).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    if args.tiers == 6:
        from mapreduce_framework_spark.pipeline.span_dedup import span_index

        bench_docs = docs.where(F.col("doc_id") % 17 == 0)
        pool = docs.where(F.col("doc_id") % 17 != 0).join(embs, "doc_id", "left")
        bsi = span_index(bench_docs).localCheckpoint(eager=True)
    else:
        pool = docs.join(embs, "doc_id", "left")
        bsi = None
    cut = pool.agg(((F.max("doc_id") + 1) / 2).cast("long")).collect()[0][0]
    b0 = pool.where(F.col("doc_id") < cut).localCheckpoint(eager=True)
    b1 = pool.where(F.col("doc_id") >= cut).localCheckpoint(eager=True)
    cb = fit_codebook(
        table(spark, "embeddings", args.sf).where(F.col("vec_id") < cut),
        k=64,
        iters=2,
    ).localCheckpoint(eager=True)

    widths = [int(w) for w in args.widths.split(",")]
    results = {w: [] for w in widths}
    # warm-up run (discarded): JVM/codegen/phash worker init
    run_cascade(spark, b0, b1, cb, args.tiers, bsi, widths[0])
    for trial in range(args.trials):
        for w in widths:
            seed, match = run_cascade(spark, b0, b1, cb, args.tiers, bsi, w)
            results[w].append((seed, match))
            print(
                f"tiers={args.tiers} trial={trial} width={w} "
                f"seed={seed:.3f}s match={match:.3f}s loadavg={os.getloadavg()[0]:.2f}",
                flush=True,
            )
    print("\n== summary (min / median over trials) ==")
    for w in widths:
        seeds = sorted(s for s, _ in results[w])
        matches = sorted(m for _, m in results[w])
        mid = len(seeds) // 2
        print(
            f"width={w}: seed min={seeds[0]:.3f} med={seeds[mid]:.3f} | "
            f"match min={matches[0]:.3f} med={matches[mid]:.3f}"
        )

    if args.config_ab:
        vcut_embs = table(spark, "embeddings", args.sf)
        vcut = vcut_embs.agg(
            ((F.max("vec_id") + 1) / 2).cast("long")
        ).collect()[0][0]
        snapshot = vcut_embs.where(F.col("vec_id") < vcut)
        batch = vcut_embs.where(F.col("vec_id") >= vcut)
        configs = {
            "r13": {
                "spark.sql.join.preferSortMergeJoin": "false",
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
            },
            "default": {
                "spark.sql.join.preferSortMergeJoin": "true",
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
            },
        }
        sem_results = {k: [] for k in configs}
        run_sem_series(spark, snapshot, batch)  # warm-up, discarded
        for trial in range(args.trials):
            for name, conf in configs.items():
                for k, v in conf.items():
                    spark.conf.set(k, v)
                fit, build, match = run_sem_series(spark, snapshot, batch)
                sem_results[name].append((fit, build, match))
                print(
                    f"sem trial={trial} conf={name} fit={fit:.3f} "
                    f"build={build:.3f} match={match:.3f}",
                    flush=True,
                )
        print("\n== sem summary (min over trials) ==")
        for name, rows in sem_results.items():
            print(
                f"conf={name}: fit={min(r[0] for r in rows):.3f} "
                f"build={min(r[1] for r in rows):.3f} "
                f"match={min(r[2] for r in rows):.3f}"
            )


if __name__ == "__main__":
    main()
