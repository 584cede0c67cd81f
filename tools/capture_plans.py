#!/usr/bin/env python3
"""Capture .explain("formatted") for benched/declared queries into
plans/r{N}/<query>_{tag}.txt (guide §1: record the plan shape — Exchange
count, join strategy, PushedFilters/ReadSchema, codegen spans, Python
eval nodes — before and after every optimization).

Usage:
  python tools/capture_plans.py --tag before [--sf /root/testdata/sf0.1] [names...]

With no names, captures every bench.py HEADLINE query (plus the retired
bench-only twins q30/q34/q36).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_spark.deploy import ensure_package_on_executors
from mapreduce_framework_spark.registry import all_queries
from mapreduce_framework_spark.session import get_spark


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="before / after / <label>")
    ap.add_argument("--round", type=int, default=13)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="mfs-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)

    specs = all_queries()
    builders = {n: s.builder for n, s in specs.items()}
    # retired bench-only twins (bench.py keeps timing them)
    from mapreduce_framework_spark.pipeline.dedup import q30_ngram_jaccard_neardup
    from mapreduce_framework_spark.pipeline.similarity import (
        q34_ann_bruteforce,
        q36_embedding_neardup,
    )

    builders["q30_ngram_jaccard_neardup"] = q30_ngram_jaccard_neardup
    builders["q34_ann_bruteforce"] = q34_ann_bruteforce
    builders["q36_embedding_neardup"] = q36_embedding_neardup

    if args.names:
        names = args.names
    else:
        import bench

        names = list(bench.HEADLINE) + ["q34_ann_bruteforce"]

    for name in names:
        if name not in builders:
            print(f"SKIP {name}: unknown", flush=True)
            continue
        try:
            df = builders[name](spark, args.sf)
            text = plan_str(df)
        except Exception as ex:  # capture must not die on one query
            text = f"ERROR {type(ex).__name__}: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)", flush=True)


if __name__ == "__main__":
    main()
