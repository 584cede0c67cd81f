#!/usr/bin/env python3
"""Round-14 core-scaling leg (VERDICT r13 item 7): 8-vs-32 cores for the
five heaviest SCALE-PATH queries, at an input size where the work
dominates local-mode scheduling overhead. sf0.1 (~100 MB total) is
overhead-bound at 32 cores (BASELINE.md r13: the whole suite read FASTER
at 8 cores in one window and slower in another), so this leg amplifies
documents/lineitem by --mult (default 10, id-shifted self-union — the
SCALING.md methodology) and times each query's exec in a fresh
local[--cores] session.

Two modes:
- ``--mode sf01``: the verdict's literal ask — the 5 heaviest bench
  queries (q36, q30, q73, q87, q15) at sf0.1 unmodified (sf1 does not
  exist in this sandbox's testdata).
- ``--mode amplified`` (default): amplified inputs, but restricted to
  LINEAR-output queries (q87, q15, q02, q92, q88): amplifying by
  id-shifted self-union makes every copy an exact near-duplicate of its
  source, so pair-producing dedup queries (q30/q31/q73/q84/q105's drop
  stage, q36) explode quadratically in copies and would measure the dup
  explosion, not core scaling (first attempt measured q73 at 289 s/run
  at mult=10 vs ~2 s at sf0.1).

Run legs 32 -> 8 -> 32 back-to-back (one host window, bracketed against
drift):
  for c in 32 8 32; do SPARK_GRAFT_CPUS=$c python tools/scaling_8v32.py; done
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_framework_spark.deploy import (  # noqa: E402
    ensure_package_on_executors,
)
from mapreduce_framework_spark.session import get_spark  # noqa: E402

QUERIES_AMPLIFIED = (  # linear-output heavies (see module docstring)
    "q87_boilerplate_doc_stats",
    "q15_tpch_q1_shape",
    "q02_inverted_index",
    "q92_tfidf_topk",
    "q88_repetition_stats",
)
QUERIES_SF01 = (  # the 5 heaviest bench lines at sf0.1, verbatim
    "q36_embedding_neardup",
    "q30_ngram_jaccard_neardup",
    "q73_simhash_banded_neardup",
    "q87_boilerplate_doc_stats",
    "q15_tpch_q1_shape",
)


def build_big(spark, sf, mult, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for t, id_cols in (("documents", ["doc_id"]), ("lineitem", ["l_orderkey"])):
        path = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(path):
            continue
        base = spark.read.parquet(os.path.join(sf, f"{t}.parquet"))
        offs = {c: base.agg(F.max(c)).collect()[0][0] + 1 for c in id_cols}
        parts = []
        for i in range(mult):
            d = base
            for c, off in offs.items():
                d = d.withColumn(c, F.col(c) + F.lit(i * off))
            parts.append(d)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.coalesce(8).write.mode("overwrite").parquet(path)
        print(f"built {path} ({mult}x)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--big-dir", default="/tmp/mfs_scale10")
    ap.add_argument("--mode", default="amplified", choices=("amplified", "sf01"))
    args = ap.parse_args()

    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"scaling-8v32-c{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)

    if args.mode == "amplified":
        build_big(spark, args.sf, args.mult, args.big_dir)
        data_dir, queries = args.big_dir, QUERIES_AMPLIFIED
    else:
        data_dir, queries = args.sf, QUERIES_SF01

    from mapreduce_framework_spark.registry import all_queries

    specs = all_queries()
    builders = {n: s.builder for n, s in specs.items()}
    # retired bench-only twins (still benched; not in the registry)
    from mapreduce_framework_spark.pipeline.dedup import (
        q30_ngram_jaccard_neardup,
    )
    from mapreduce_framework_spark.pipeline.similarity import (
        q36_embedding_neardup,
    )

    builders["q30_ngram_jaccard_neardup"] = q30_ngram_jaccard_neardup
    builders["q36_embedding_neardup"] = q36_embedding_neardup
    out = {}
    for name in queries:
        df = builders[name](spark, data_dir)
        spark.sparkContext.setJobDescription(f"scaling:{name}:c{cores}")
        times = []
        for _ in range(3):  # first run doubles as the cold/codegen warm-up
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times[1:]), 3)
        print(
            f"cores={cores} {name}: cold={times[0]:.3f} warm_min={out[name]}",
            flush=True,
        )
    print(
        json.dumps(
            {
                "cores": int(cores),
                "mode": args.mode,
                "mult": args.mult if args.mode == "amplified" else 1,
                "warm_min": out,
                "loadavg": list(os.getloadavg()),
            }
        )
    )


if __name__ == "__main__":
    main()
