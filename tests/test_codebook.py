"""Spherical k-means codebook fitting — pipeline/codebook.py.

Library-first (registry at capacity): fit-quality invariants on
synthetic clustered data, the degraded/degenerate edges, and the
fit-once / persist / bit-exact-downstream lifecycle against both
consumers (semantic_dedup, ann_ivf/ivf_index).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_framework_spark.pipeline.codebook import (
    fit_codebook,
    quantization_error,
)
from mapreduce_framework_spark.pipeline.semantic_dedup import semantic_dedup
from mapreduce_framework_spark.pipeline.similarity import prepare_centroids


def _clustered(spark, per_cluster: int = 20):
    """Three well-separated clusters near orthogonal axes of R^4, with a
    deterministic per-point jitter small enough that within-cluster
    cosine > 0.99 while cross-cluster cosine < 0.1."""
    rows = []
    axes = [(1.0, 0.0, 0.0, 0.0), (0.0, 1.0, 0.0, 0.0), (0.0, 0.0, 1.0, 0.0)]
    for c, axis in enumerate(axes):
        for i in range(per_cluster):
            jit = 0.02 * math.sin(7 * (c * per_cluster + i) + 1)
            vec = [a + (jit if d == 3 else 0.0) for d, a in enumerate(axis)]
            rows.append(Row(vec_id=c * per_cluster + i, embedding=vec, label=c))
    return spark.createDataFrame(rows)


def test_fit_recovers_separated_clusters(spark):
    embs = _clustered(spark)
    cents = fit_codebook(embs, k=3, iters=4)
    assert cents.count() == 3
    # every cluster maps wholly to one fitted cell, one cell per cluster
    from mapreduce_framework_spark.pipeline.semantic_dedup import assign_cells

    asg = (
        assign_cells(embs, centroids=cents, probes=1)
        .join(embs.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(F.collect_set("cent_id").alias("cells"))
        .collect()
    )
    cells_by_label = {r["label"]: r["cells"] for r in asg}
    assert all(len(cells) == 1 for cells in cells_by_label.values())
    assert len({cells[0] for cells in cells_by_label.values()}) == 3
    # and the fit is tight: mean cosine distance to the centroid is tiny
    assert quantization_error(embs, cents) < 0.01


def test_fit_error_non_increasing_with_iterations(spark):
    """Lloyd's invariant: more iterations never worsen the quantization
    error (beyond FP-reduction noise)."""
    embs = _clustered(spark)
    errs = [
        quantization_error(embs, fit_codebook(embs, k=3, iters=n))
        for n in (0, 1, 4)
    ]
    assert errs[1] <= errs[0] + 1e-9
    assert errs[2] <= errs[1] + 1e-9


def test_fit_is_deterministic(spark):
    """Same corpus, same knobs → identical codebook (small frames fit in
    few partitions, so even the FP reduction order is stable here; at
    scale the determinism story is the persisted artifact — see
    test_persisted_codebook_roundtrip_is_bit_exact)."""
    embs = _clustered(spark)
    a = sorted(map(tuple, fit_codebook(embs, k=3, iters=3).collect()))
    b = sorted(map(tuple, fit_codebook(embs, k=3, iters=3).collect()))
    assert a == b


def test_k_above_corpus_size_degrades_to_one_cell_per_vector(spark):
    embs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, float(i)], label=0) for i in range(5)]
    )
    cents = fit_codebook(embs, k=10, iters=2)
    assert cents.count() == 5
    assert [r["cent_id"] for r in cents.orderBy("cent_id").collect()] == list(
        range(5)
    )


def test_empty_corpus_and_bad_knobs_raise(spark):
    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    )
    with pytest.raises(ValueError, match="empty corpus"):
        fit_codebook(empty, k=3)
    embs = _clustered(spark)
    with pytest.raises(ValueError, match="k must be >= 1"):
        fit_codebook(embs, k=0)
    with pytest.raises(ValueError, match="sample_fraction"):
        fit_codebook(embs, k=3, sample_fraction=1.5)
    # zero-norm-only corpus is empty after the norms gate
    zeros = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.0, 0.0], label=0)]
    )
    with pytest.raises(ValueError, match="empty corpus"):
        fit_codebook(zeros, k=2)


def test_empty_cells_keep_previous_centroid(spark):
    """k larger than the number of natural clusters leaves cells with no
    members after the first re-assignment; they must carry their previous
    centroid (not vanish, not go NaN/zero-norm)."""
    embs = _clustered(spark, per_cluster=4)
    cents = fit_codebook(embs, k=8, iters=4)
    assert cents.count() == 8
    bad = cents.where(
        F.col("cent_norm").isNull()
        | F.isnan("cent_norm")
        | (F.col("cent_norm") <= 0.0)
    ).count()
    assert bad == 0


def test_sample_fraction_fits_on_stable_subset(spark):
    """The fit sample is a deterministic pure function of vec_id: fitting
    on fraction f of the corpus equals fitting on the hash-selected
    subset directly (the q78 stability property, applied to the fit)."""
    embs = _clustered(spark)
    sampled = embs.where(
        F.pmod(F.xxhash64(F.lit("cbk1"), F.col("vec_id")), F.lit(1_000_000))
        < 500_000
    )
    assert 0 < sampled.count() < embs.count()
    via_knob = sorted(
        map(tuple, fit_codebook(embs, k=3, iters=2, sample_fraction=0.5).collect())
    )
    via_subset = sorted(map(tuple, fit_codebook(sampled, k=3, iters=2).collect()))
    assert via_knob == via_subset


def test_fitted_codebook_drives_semantic_dedup(spark):
    """End-to-end: plant exact duplicates in the clustered corpus; the
    fitted codebook must co-assign each copy with its base (identical
    vectors tie on every cell score and carry the same tie-break order),
    so semantic_dedup condemns every copy against its smaller-id base."""
    base = _clustered(spark)
    copies = base.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    corpus = base.unionAll(copies)
    cents = fit_codebook(corpus, k=3, iters=3)
    drops = semantic_dedup(corpus, centroids=cents).collect()
    dropped = {r["vec_id"] for r in drops}
    assert {r["vec_id"] for r in copies.collect()} <= dropped
    # every drop names a genuinely-similar smaller-id partner
    assert all(r["dup_of"] < r["vec_id"] and r["cos"] >= 0.45 for r in drops)


def test_persisted_codebook_roundtrip_is_bit_exact(spark, tmp_path):
    """The lifecycle the module promises: fit once, persist to parquet,
    and every downstream run against the artifact is bit-exact — doubles
    round-trip parquet losslessly, so semantic_dedup over the read-back
    codebook equals semantic_dedup over the in-memory one, cell for cell,
    cosine for cosine."""
    embs = _clustered(spark)
    cents = fit_codebook(embs, k=3, iters=3)
    path = str(tmp_path / "codebook")
    cents.write.parquet(path)
    back = prepare_centroids(spark.read.parquet(path), op="roundtrip")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, cents.collect())
    )
    a = sorted(map(tuple, semantic_dedup(embs, centroids=cents).collect()))
    b = sorted(map(tuple, semantic_dedup(embs, centroids=back).collect()))
    assert a == b


def test_fitted_codebook_drives_ivf_index_lifecycle(spark, sf_dir, tmp_path):
    """The fitted codebook slots into the persisted-IVF path exactly like
    the stride stand-in: probe over the parquet-persisted posting table
    equals the from-scratch ann_ivf under the SAME fitted codebook,
    result for result."""
    from mapreduce_framework_spark.catalog import table
    from mapreduce_framework_spark.pipeline.similarity import (
        ann_ivf,
        ivf_index,
        probe_ivf_index,
    )

    embs = table(spark, "embeddings", sf_dir)
    cents = fit_codebook(embs, k=16, iters=3, sample_fraction=0.5)
    got = sorted(map(tuple, ann_ivf(embs, centroids=cents).collect()))
    assert len(got) > 0
    # fit on a sample, assign the full corpus: every query found neighbors
    n_queries = len({g[0] for g in got})
    assert n_queries == 5
    # persist postings + codebook, probe the read-back: bit-identical
    ivf_index(embs, centroids=cents).write.parquet(str(tmp_path / "ivf"))
    cents.write.parquet(str(tmp_path / "cb"))
    idx = spark.read.parquet(str(tmp_path / "ivf"))
    cb = spark.read.parquet(str(tmp_path / "cb"))
    from pyspark.sql import functions as F2

    queries = embs.where(F2.col("vec_id") < 5)
    via_artifact = sorted(map(tuple, probe_ivf_index(idx, queries, cb).collect()))
    assert via_artifact == got


def test_fit_assignment_plan_is_broadcast_not_cartesian(spark):
    """The fit's per-iteration assignment must be the sanctioned broadcast
    shape (same as ann_ivf); a CartesianProduct here would be the exact
    anti-pattern the registry audit bans."""
    from mapreduce_framework_spark.pipeline.similarity import (
        _nearest_cells,
        _norms_spark,
    )
    from tests.test_plans import _plan

    embs = _clustered(spark)
    cents = fit_codebook(embs, k=3, iters=0)
    plan = _plan(_nearest_cells(_norms_spark(embs), cents, id_col="vec_id", k=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- property: Spark fit == sequential Lloyd's model -------------------------
#
# The cluster-recovery tests above prove the fit on friendly data; what
# they cannot prove is boundary behavior — zero vectors at the norms
# gate, k > live corpus, empty cells, cosine TIES in assignment (broken
# toward the smaller cent_id), and the exact init order. Hypothesis
# builds corpora on an INTEGER grid so every sum either engine computes
# is exact in doubles (integers < 2^53): the fit is then bit-comparable
# to a from-scratch sequential Lloyd's model with the same init,
# tie-breaks, and empty-cell carry-over — no FP-reduction-order slack
# needed beyond division rounding, which both engines perform
# identically (sum then divide).

import math as _math

from hypothesis import given, settings
from hypothesis import strategies as st


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _model_lloyd(pts, cents, iters):
    """The shared Lloyd loop of the fit/refit models: assignment with
    the -cos/cent_id tie-break, sorted-member means, empty-cell and
    zero-mean carry-over — exactly _lloyd_iterations' contract."""
    for _ in range(iters):
        members = {cid: [] for cid in cents}
        for vid, v in pts.items():
            nv = _math.sqrt(_dot(v, v))
            best = min(
                cents,
                key=lambda cid: (
                    -(_dot(v, cents[cid]) / (nv * _math.sqrt(_dot(cents[cid], cents[cid])))),
                    cid,
                ),
            )
            members[best].append(vid)
        for cid, vids in members.items():
            if not vids:
                continue  # empty cell keeps its previous centroid
            dim = len(cents[cid])
            mean = [
                sum(pts[v][d] for v in sorted(vids)) / len(vids)
                for d in range(dim)
            ]
            if _math.sqrt(_dot(mean, mean)) > 0:
                cents[cid] = mean
    return cents


def _model_fit(vecs, hashes, k, iters):
    """Sequential spherical k-means with fit_codebook's exact contract."""
    pts = {
        i: v for i, v in vecs.items() if _math.sqrt(sum(x * x for x in v)) > 0
    }
    if not pts:
        return None
    order = sorted(pts, key=lambda i: (hashes[i], i))[:k]
    cents = {cid: list(pts[vid]) for cid, vid in enumerate(order)}
    return _model_lloyd(pts, cents, iters)


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=3, max_size=3),
        min_size=1,
        max_size=24,
    ),
    k=st.integers(min_value=1, max_value=5),
    iters=st.integers(min_value=0, max_value=3),
)
def test_fit_matches_sequential_model(spark_global, data, k, iters):
    from pyspark.sql import functions as F

    vecs = {i: [float(x) for x in v] for i, v in enumerate(data)}
    embs = spark_global.createDataFrame(
        [Row(vec_id=i, embedding=v, label=0) for i, v in vecs.items()]
    )
    hashes = {
        r["vec_id"]: r["h"]
        for r in embs.select(
            "vec_id", F.xxhash64(F.lit("cbk1"), F.col("vec_id")).alias("h")
        ).collect()
    }
    want = _model_fit(vecs, hashes, k, iters)
    if want is None:  # all-zero corpus: the fit must refuse
        with pytest.raises(ValueError, match="empty corpus"):
            fit_codebook(embs, k=k, iters=iters)
        return
    got = {
        r["cent_id"]: (list(r["cent"]), r["cent_norm"])
        for r in fit_codebook(embs, k=k, iters=iters).collect()
    }
    assert set(got) == set(want)
    for cid, cent in want.items():
        gc, gn = got[cid]
        assert gc == pytest.approx(cent, rel=1e-12, abs=1e-12), cid
        assert gn == pytest.approx(
            _math.sqrt(sum(x * x for x in cent)), rel=1e-12
        )


# --- codebook refresh lifecycle (round 7) ------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=3, max_size=3),
        min_size=1,
        max_size=16,
    ),
    drift=st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=3, max_size=3),
        min_size=0,
        max_size=16,
    ),
    k=st.integers(min_value=1, max_value=4),
    iters=st.integers(min_value=0, max_value=3),
)
@pytest.mark.slow  # r14 item 2: excluded from the default run (pytest.ini)
def test_refit_matches_sequential_model(spark_global, data, drift, k, iters):
    """refit_codebook == the same Lloyd model warm-started from the old
    book's centroids, on a drifted corpus (original ∪ shifted new
    vectors). iters=0 pins the warm start itself: the refreshed book IS
    the old book when no iterations run."""
    from pyspark.sql import functions as F

    from mapreduce_framework_spark.pipeline.codebook import refit_codebook

    vecs_a = {i: [float(x) for x in v] for i, v in enumerate(data)}
    embs_a = spark_global.createDataFrame(
        [Row(vec_id=i, embedding=v, label=0) for i, v in vecs_a.items()]
    )
    hashes = {
        r["vec_id"]: r["h"]
        for r in embs_a.select(
            "vec_id", F.xxhash64(F.lit("cbk1"), F.col("vec_id")).alias("h")
        ).collect()
    }
    old_model = _model_fit(vecs_a, hashes, k, 2)
    if old_model is None:
        return  # all-zero original corpus: fit refuses, nothing to refresh
    old = fit_codebook(embs_a, k=k, iters=2)

    # drifted corpus: half the originals survive, new shifted vectors join
    vecs_b = {i: v for i, v in vecs_a.items() if i % 2 == 0}
    vecs_b.update(
        {100 + j: [float(x) for x in v] for j, v in enumerate(drift)}
    )
    pts_b = {
        i: v for i, v in vecs_b.items() if _math.sqrt(sum(x * x for x in v)) > 0
    }
    embs_b = spark_global.createDataFrame(
        [Row(vec_id=i, embedding=v, label=0) for i, v in vecs_b.items()],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT",
    )
    if not pts_b:
        with pytest.raises(ValueError, match="empty corpus"):
            refit_codebook(embs_b, old, iters=iters).collect()
        return
    want = _model_lloyd(pts_b, {c: list(v) for c, v in old_model.items()}, iters)
    got = {
        r["cent_id"]: (list(r["cent"]), r["cent_norm"])
        for r in refit_codebook(embs_b, old, iters=iters).collect()
    }
    assert set(got) == set(want)
    for cid, cent in want.items():
        gc, gn = got[cid]
        assert gc == pytest.approx(cent, rel=1e-12, abs=1e-12), cid
        assert gn == pytest.approx(
            _math.sqrt(sum(x * x for x in cent)), rel=1e-12
        )


@pytest.mark.slow  # r14 item 2: excluded from the default run (pytest.ini)
def test_refit_roundtrip_and_reindex(spark, tmp_path):
    """The refresh lifecycle end-to-end: persist the old book, read it
    back, refit on a drifted corpus (parquet round-trip must be
    refit-equivalent to the in-memory book), rebuild the semantic index
    against the refreshed book, and verify cent_id continuity (same id
    set as the old book) plus a drift improvement on a cleanly shifted
    corpus (refreshed quantization error <= stale book's error)."""
    from mapreduce_framework_spark.pipeline.codebook import (
        quantization_error,
        refit_codebook,
    )
    from mapreduce_framework_spark.pipeline.semantic_dedup import semantic_index

    old_corpus = _clustered(spark)
    old = fit_codebook(old_corpus, k=3, iters=4).localCheckpoint(eager=True)
    path = str(tmp_path / "codebook_v1")
    old.write.parquet(path)
    back = spark.read.parquet(path)

    # drifted corpus: every cluster center shifted by a constant offset
    drifted = old_corpus.select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(0.6)).alias("embedding"),
        "label",
    ).localCheckpoint(eager=True)

    direct = {
        r["cent_id"]: list(r["cent"])
        for r in refit_codebook(drifted, old, iters=4).collect()
    }
    via_parquet = {
        r["cent_id"]: list(r["cent"])
        for r in refit_codebook(drifted, back, iters=4).collect()
    }
    assert direct.keys() == via_parquet.keys()
    for cid in direct:
        assert direct[cid] == pytest.approx(via_parquet[cid], rel=1e-12), cid
    assert set(direct) == {r["cent_id"] for r in old.collect()}  # id continuity

    refreshed = refit_codebook(drifted, old, iters=4).localCheckpoint(eager=True)
    assert quantization_error(drifted, refreshed) <= quantization_error(
        drifted, old
    ) + 1e-12
    # the re-index path: the refreshed book drives a fresh cell index
    # (SEM_PROBES rows per vector — every vector of the drifted corpus
    # must appear)
    idx = semantic_index(drifted, refreshed)
    assert idx.select("vec_id").distinct().count() == drifted.count()


def test_refit_dimension_mismatch_raises(spark):
    from mapreduce_framework_spark.pipeline.codebook import refit_codebook

    old = spark.createDataFrame([Row(cent_id=0, cent=[1.0, 0.0])])
    embs = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 0.0, 0.0], label=0)])
    with pytest.raises(ValueError, match="dimensionality"):
        refit_codebook(embs, old).collect()
