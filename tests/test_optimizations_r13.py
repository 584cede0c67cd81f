"""Round-13 optimization pins: each test freezes the EQUIVALENCE argument
of one plan rewrite (OPTIMIZATION_r13.md) against an in-test reference
implementation, so a later regression of the optimized form is caught by
its own differential, not only by the end-to-end oracles."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F


def _window_nearest_cells(df, cents, id_col, k):
    """The pre-r13 reference form of similarity._nearest_cells: crossJoin
    + row_number over a per-id window (kept verbatim as the differential
    reference)."""
    from mapreduce_framework_spark.pipeline.similarity import _DOT_SPARK

    scored = df.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        "cent_id",
        (
            F.expr(_DOT_SPARK.format(a="embedding", b="cent"))
            / (F.col("norm") * F.col("cent_norm"))
        ).alias("ccos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cent_id"))
    return scored.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)


def test_nearest_cells_matches_window_reference(spark):
    """The r13 array-form top-k (one broadcast array row, per-row
    transform + comparator sort + slice) must match the window form
    row-for-row — including exact-tie cases (duplicate centroids with
    distinct cent_ids → tie broken by smaller cent_id) and k larger than
    the centroid count."""
    from mapreduce_framework_spark.pipeline.similarity import (
        _nearest_cells,
        _norms_spark,
    )

    rng = random.Random(13)
    dim = 4
    vecs = [
        [round(rng.uniform(-2, 2), 3) for _ in range(dim)] for _ in range(37)
    ]
    # duplicate vectors → identical rows must get identical assignments
    vecs += vecs[:5]
    cents_raw = [[round(rng.uniform(-2, 2), 3) for _ in range(dim)] for _ in range(7)]
    # duplicate centroid under a different cent_id → exact ccos tie
    cents_raw.append(list(cents_raw[0]))
    embs = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    )
    cents = _norms_spark(
        spark.createDataFrame(
            [Row(vec_id=i, embedding=v) for i, v in enumerate(cents_raw)]
        )
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent"),
        F.col("norm").alias("cent_norm"),
    )
    e = _norms_spark(embs)
    for k in (1, 2, 3, len(cents_raw) + 5):
        got = sorted(
            (r["vec_id"], r["cent_id"], r["ccos"])
            for r in _nearest_cells(e, cents, "vec_id", k).collect()
        )
        want = sorted(
            (r["vec_id"], r["cent_id"], r["ccos"])
            for r in _window_nearest_cells(e, cents, "vec_id", k).collect()
        )
        assert got == want, f"k={k}"


def test_nearest_cells_carry_columns_match_join_back(spark):
    """carry= must reproduce exactly what the old join-back on id
    recovered (the _ivf_postings rewrite)."""
    from mapreduce_framework_spark.pipeline.similarity import (
        _nearest_cells,
        _norms_spark,
    )

    rng = random.Random(7)
    embs = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(3)])
            for i in range(20)
        ]
    )
    cents = _norms_spark(embs.where(F.col("vec_id") % 5 == 0)).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent"),
        F.col("norm").alias("cent_norm"),
    )
    e = _norms_spark(embs)
    carried = {
        (r["vec_id"], r["cent_id"], tuple(r["embedding"]), r["norm"])
        for r in _nearest_cells(
            e, cents, "vec_id", 1, carry=("embedding", "norm")
        ).collect()
    }
    joined = {
        (r["vec_id"], r["cent_id"], tuple(r["embedding"]), r["norm"])
        for r in _nearest_cells(e, cents, "vec_id", 1)
        .join(e, "vec_id")
        .select("vec_id", "cent_id", "embedding", "norm")
        .collect()
    }
    assert carried == joined


def _model_fold(ops_rows):
    """Sequential reference of the KV fold (src/models/kv.go:40-54)."""
    state: dict[str, str] = {}
    for _, key, op, value in sorted(ops_rows):
        if op == "get":
            continue
        prev = state.get(key, "")
        if op == "put":
            state[key] = value if value is not None else ""
        else:
            state[key] = prev + (value if value is not None else "")
    return state


def test_fold_spark_matches_sequential_model(spark):
    """The r13 aggregate()-fold form of kv._fold_spark must equal the
    imperative replay — including keys with no put, puts after appends,
    NULL values (behave as ''), and a key whose ops are only gets
    (dropped)."""
    from mapreduce_framework_spark.operators.kv import _fold_spark

    rng = random.Random(3)
    rows = []
    eid = 0
    for key in ["a", "b", "c", "noput", "getonly"]:
        for _ in range(rng.randint(1, 12)):
            eid += 1
            if key == "getonly":
                op = "get"
            elif key == "noput":
                op = rng.choice(["append", "get"])
            else:
                op = rng.choice(["put", "append", "get"])
            val = rng.choice([None, "x", "yz", f"v{eid}"])
            rows.append((eid, key, op, val))
    df = spark.createDataFrame(
        [
            Row(ts=float(eid_), event_id=eid_, key=k, op=o, value=v)
            for eid_, k, o, v in rows
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["key"]: r["value"] for r in _fold_spark(df).collect()}
    model = _model_fold([(r[0], r[1], r[2], r[3]) for r in rows])
    want = {
        k: v
        for k, v in model.items()
        if any(r[1] == k and r[2] != "get" for r in rows)
    }
    assert got == want


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_tfidf_df_barrier_is_noop_and_reuses_exchange(spark):
    """The r13 q92 single-scan rewrite hangs on two claims: (1) the
    ``tf >= 1`` filter keeps every row (count(1) of a group is >= 1), so
    results are identical to the unfiltered form; (2) it stops column
    pruning from rewriting the df branch's aggregate, making the two
    (doc_id, word) exchanges canonically identical so AQE's stage cache
    materializes the tokenize+partial-aggregate ONCE (ReusedExchange in
    the executed plan)."""
    from pyspark.sql import Row

    from mapreduce_framework_spark.pipeline.text_analysis import (
        _IDF_SCALE,
        tfidf_topk,
    )

    rng = random.Random(92)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=" ".join(rng.choice(words) for _ in range(rng.randint(3, 30))),
            )
            for i in range(40)
        ]
    )
    # reference = the pre-r13 form without the barrier filter
    from mapreduce_framework_spark.functions.text import explode_tokens

    tok = explode_tokens(docs, F.lower(F.col("text")), out="word", keep=["doc_id"])
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    s = tf.join(dfr, "word").select(
        "doc_id",
        "word",
        "tf",
        "df",
        F.expr(f"CAST(tf * {_IDF_SCALE} div df AS BIGINT)").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word").asc())
    ref = (
        s.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
    )
    # The single-scan shape depends on AQE + exchange reuse being ON
    # (ADVICE r13): assert the session configs so a config drift fails
    # HERE, loudly, instead of surfacing as a silent 2x-scan perf
    # regression. (Correctness never depends on them — the filter is a
    # provable no-op either way, as the row comparison above shows.)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.exchange.reuse", "true") == "true"
    got = tfidf_topk(docs)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    got.collect()  # force execution so the AQE final plan exists
    final = got._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final, final


def test_span_dedup_single_tokenize_pass(spark, sf_dir):
    """The r13 q101 rewrite materializes the block-instance frame once:
    the built plan must read the checkpointed RDD (ExistingRDD) for the
    keep-first / kept / totals consumers, and the only remaining source
    scan is the column-pruned doc_id base scan. Result equivalence is
    carried by test_span_dedup's DuckDB differential + property model."""
    from mapreduce_framework_spark.pipeline.span_dedup import q101_span_dedup

    plan = _formatted_plan(q101_span_dedup(spark, sf_dir))
    assert plan.count(") Scan ExistingRDD") == 3, plan
    assert plan.count(") Scan parquet") == 1, plan  # doc_id-only base scan
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan


def test_exact_jaccard_single_tokenize_pass(spark, sf_dir):
    """The r13 q30 rewrite materializes the shingle frame once: the built
    plan must read the checkpointed RDD for all four consumers (both
    self-join sides + the two size projections) and contain NO source
    scan (the one corpus scan runs at checkpoint build). Exactness is
    carried by test_queries_oracle's retired-q30/q72 differentials."""
    from mapreduce_framework_spark.pipeline.dedup import (
        q30_ngram_jaccard_neardup,
    )

    plan = _formatted_plan(q30_ngram_jaccard_neardup(spark, sf_dir))
    assert plan.count(") Scan ExistingRDD") == 4, plan
    assert plan.count(") Scan parquet") == 0, plan


def test_ann_lsh_single_bucket_pass(spark, sf_dir):
    """The r13 q35 rewrite materializes the LSH bucket frame once: both
    candidate-join sides must read the checkpointed RDD, and the only
    remaining embeddings scans are the two exact-re-rank sides.
    Correctness is carried by the registered oracle differential."""
    from mapreduce_framework_spark.pipeline.similarity import q35_ann_lsh

    plan = _formatted_plan(q35_ann_lsh(spark, sf_dir))
    assert plan.count(") Scan ExistingRDD") == 2, plan
    assert plan.count(") Scan parquet") == 2, plan


def test_ann_ivf_single_norms_pass(spark, sf_dir):
    """The r13 q56 rewrite materializes the normed-embeddings frame once
    and derives the stride centroids from it: the built plan must contain
    NO source scan (one scan runs at checkpoint build) — assignment,
    queries, re-rank, and both centroid aggregations all read the
    checkpointed RDD. Correctness is carried by the registered oracle
    differential + test_pipeline's default-vs-explicit-centroid identity."""
    from mapreduce_framework_spark.pipeline.similarity import q56_ann_ivf

    plan = _formatted_plan(q56_ann_ivf(spark, sf_dir))
    assert plan.count(") Scan parquet") == 0, plan
    assert plan.count(") Scan ExistingRDD") >= 5, plan


def test_run_publish_chains_runs_all_and_raises_first(tmp_path):
    """_run_publish_chains must execute every chain (no short-circuit)
    and surface a failure as an exception after all chains settle."""
    from mapreduce_framework_spark.streaming.ingest import _run_publish_chains

    ran = []

    def ok_a():
        ran.append("a")

    def boom():
        ran.append("boom")
        raise RuntimeError("chain failed")

    def ok_b():
        ran.append("b")

    with pytest.raises(RuntimeError, match="chain failed"):
        _run_publish_chains(ok_a, None, boom, ok_b)
    assert sorted(ran) == ["a", "b", "boom"]
    # the degenerate single-chain path runs inline
    ran.clear()
    _run_publish_chains(None, ok_a, None)
    assert ran == ["a"]
