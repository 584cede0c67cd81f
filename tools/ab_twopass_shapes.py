#!/usr/bin/env python3
"""Round-14 re-examination of the r13 two-pass leave decisions at a larger
scale (VERDICT r13 item 5): q87 boilerplate, q88 repetition, q90 domain
mix, q98 cohort retention. sf0.1 is the largest shipped SF (~600 KB of
documents), far too small for the tokenize-vs-I/O trades to bind, so this
builds a deterministic N-fold enlargement (id-shifted unions of the sf0.1
rows — same text distribution, N x the mass) under /tmp and A/Bs each
shape's current form against its candidate alternative, interleaved x3 in
one session (the round-13 lesson: solo-run deltas on this host are
+/-30-100%).

Alternatives measured:
- q87: derive the dictionary and the position stats from ONE materialized
  gram frame (localCheckpoint) instead of tokenizing the corpus twice —
  the r13 leave note says the gram bytes outweigh the saved tokenize.
- q88: per-row top-2-gram mode (run length over array_sort(grams) inside
  one higher-order aggregate) instead of explode -> (doc,gram) shuffle ->
  max -> join back: one scan, zero shuffles.
- q90: localCheckpoint the narrow (doc_id, source, n_tokens) frame so the
  rate join-back does not re-tokenize the corpus (the output carries no
  text, so the materialized bytes are ~24 B/doc).
- q98: one groupBy(user_id) agg (min ts + collect_set day, with a NULL-day
  guard) instead of two passes over events + a user_id join.

Usage: python tools/ab_twopass_shapes.py [--sf DIR] [--mult N] [--trials N]
           [--shapes q87,q88,q90,q98]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_framework_spark.catalog import table, trunc_ntz_expr  # noqa: E402
from mapreduce_framework_spark.session import get_spark  # noqa: E402


def build_big(spark, sf, mult, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for t, id_cols in (("documents", ["doc_id"]), ("events", ["event_id", "user_id"])):
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# ---- q87 ----------------------------------------------------------------

def q87_current(spark, docs):
    from mapreduce_framework_spark.pipeline.dedup import boilerplate_doc_stats

    noop(boilerplate_doc_stats(docs))


def q87_ckpt_grams(spark, docs):
    from mapreduce_framework_spark.pipeline.dedup import BOILER_DF, _grams5_of

    pos = _grams5_of(docs).localCheckpoint(eager=True)
    try:
        boiler = (
            pos.distinct()
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") >= BOILER_DF)
            .select("g", F.lit(1).alias("hit"))
        )
        noop(
            pos.join(F.broadcast(boiler), "g", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_flagged"),
                (
                    F.coalesce(F.sum("hit"), F.lit(0)).cast("double")
                    / F.count(F.lit(1))
                ).alias("flag_ratio"),
            )
        )
    finally:
        pos.rdd.unpersist()


# ---- q88 ----------------------------------------------------------------

_TOP2_ROWWISE = """
CASE WHEN size(toks) < 2 THEN CAST(0 AS BIGINT) ELSE
  aggregate(
    array_sort(transform(sequence(0, size(toks) - 2),
                         i -> concat(toks[i], ' ', toks[i + 1]))),
    named_struct('best', CAST(0 AS BIGINT), 'run', CAST(0 AS BIGINT),
                 'prev', CAST(NULL AS STRING)),
    (acc, g) -> named_struct(
        'best', greatest(acc.best,
                         IF(acc.prev IS NOT NULL AND g = acc.prev,
                            acc.run + 1, CAST(1 AS BIGINT))),
        'run', IF(acc.prev IS NOT NULL AND g = acc.prev,
                  acc.run + 1, CAST(1 AS BIGINT)),
        'prev', g),
    acc -> acc.best)
END
"""


def q88_current(spark, docs):
    from mapreduce_framework_spark.pipeline.quality import repetition_stats

    noop(repetition_stats(docs))


def q88_rowwise(spark, docs):
    from mapreduce_framework_spark.functions.text import tokenize
    from mapreduce_framework_spark.pipeline.quality import (
        DUP_FRAC_MAX,
        TOP2_FRAC_MAX,
    )

    t = docs.select("doc_id", tokenize("text").alias("toks"))
    j = t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        F.expr(_TOP2_ROWWISE).alias("top2_count"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.when(
            F.col("n_tokens") > 0,
            1 - F.col("n_distinct").cast("double") / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
        "top2_count",
        F.when(
            F.col("n_tokens") > 1,
            F.col("top2_count").cast("double") / (F.col("n_tokens") - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("top2_frac"),
    )
    noop(
        j.withColumn(
            "is_repetitive",
            (F.col("dup_frac") > DUP_FRAC_MAX) | (F.col("top2_frac") > TOP2_FRAC_MAX),
        )
    )


# ---- q90 ----------------------------------------------------------------

def q90_current(spark, docs):
    from mapreduce_framework_spark.pipeline.sampling import domain_mix_sample

    noop(domain_mix_sample(docs))


def q90_ckpt_tok(spark, docs):
    from pyspark.sql.window import Window

    from mapreduce_framework_spark.pipeline.sampling import (
        MIX_BUDGET_PCT,
        _MIX_SALT,
        _WEIGHT_CASE,
        _fnv_sql,
        TOKS_SPARK,
    )

    tok = docs.select(
        "doc_id", "source", F.size(F.expr(TOKS_SPARK)).cast("long").alias("n_tokens")
    ).localCheckpoint(eager=True)
    try:
        per = tok.groupBy("source").agg(
            F.sum("n_tokens").alias("src_tokens")
        ).withColumn("w", F.expr(_WEIGHT_CASE).cast("long"))
        w_all = Window.partitionBy(F.lit(1))
        rates = per.withColumn(
            "total_tokens", F.sum("src_tokens").over(w_all)
        ).withColumn("total_w", F.sum("w").over(w_all)).select(
            "source",
            "src_tokens",
            F.expr(
                f"CASE WHEN src_tokens = 0 THEN CAST(100 AS BIGINT) "
                f"ELSE CAST(least(100, (100 * (((total_tokens * {MIX_BUDGET_PCT}) div 100)"
                f" * w div total_w)) div src_tokens) AS BIGINT) END"
            ).alias("rate"),
        )
        h = F.expr(_fnv_sql(f"concat({_MIX_SALT}, CAST(doc_id AS STRING))"))
        noop(
            tok.join(F.broadcast(rates), "source")
            .withColumn("bucket", (h % 100).cast("long"))
            .where(F.col("bucket") < F.col("rate"))
        )
    finally:
        tok.rdd.unpersist()


# ---- q98 ----------------------------------------------------------------

def q98_current(spark, ev):
    from mapreduce_framework_spark.operators.funnel import cohort_retention

    noop(cohort_retention(ev))


def q98_fused(spark, ev):
    day = trunc_ntz_expr("ts", 86400)
    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.collect_set(F.expr(day)).alias("days"),
        F.max(F.col("ts").isNull().cast("int")).alias("has_null"),
    )
    exploded = per.select(
        "user_id",
        F.expr(trunc_ntz_expr("first_ts", 86400)).alias("cohort_day"),
        F.explode(
            F.when(
                F.col("has_null") == 1,
                F.concat(
                    F.col("days"),
                    F.array(F.expr("CAST(NULL AS TIMESTAMP_NTZ)")),
                ),
            ).otherwise(F.col("days"))
        ).alias("day"),
    )
    noop(
        exploded.groupBy(
            "cohort_day",
            F.expr("timestampdiff(DAY, cohort_day, day)")
            .cast("bigint")
            .alias("day_offset"),
        ).agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
    )


SHAPES = {
    "q87": ("documents", q87_current, q87_ckpt_grams),
    "q88": ("documents", q88_current, q88_rowwise),
    "q90": ("documents", q90_current, q90_ckpt_tok),
    "q98": ("events", q98_current, q98_fused),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=30)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--shapes", default="q87,q88,q90,q98")
    ap.add_argument("--big-dir", default="/tmp/mfs_bigsf")
    args = ap.parse_args()

    spark = get_spark(app_name="ab-twopass-shapes")
    spark.sparkContext.setLogLevel("ERROR")
    build_big(spark, args.sf, args.mult, args.big_dir)

    docs = table(spark, "documents", args.big_dir)
    ev = table(spark, "events", args.big_dir)

    for shape in args.shapes.split(","):
        src, cur, alt = SHAPES[shape]
        frame = docs if src == "documents" else ev
        # warm-up both arms once (JVM/codegen), discarded
        cur(spark, frame)
        alt(spark, frame)
        res = {"cur": [], "alt": []}
        for trial in range(args.trials):
            for name, fn in (("cur", cur), ("alt", alt)):
                spark.sparkContext.setJobDescription(f"{shape}:{name}:t{trial}")
                t0 = time.perf_counter()
                fn(spark, frame)
                dt = time.perf_counter() - t0
                res[name].append(dt)
                print(
                    f"{shape} trial={trial} arm={name} {dt:.3f}s "
                    f"loadavg={os.getloadavg()[0]:.2f}",
                    flush=True,
                )
        print(
            f"== {shape} (x{args.mult}): cur min={min(res['cur']):.3f} "
            f"med={sorted(res['cur'])[len(res['cur']) // 2]:.3f} | "
            f"alt min={min(res['alt']):.3f} "
            f"med={sorted(res['alt'])[len(res['alt']) // 2]:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
