"""Long-horizon composed soak (round 10, VERDICT r9 task 5).

One multi-batch FIVE-tier cascade ingest composing everything hardened
in rounds 8-10 — fencing with atomic acquisition, compaction with cap
re-application, the drift autopilot firing mid-run, the decontamination
tier, and the quality gate — with the soak invariants asserted:

- every tier fires (the synthetic population plants all five reject
  classes from previously admitted docs);
- a mid-soak crash+takeover replays the in-flight batch byte-identically
  and the fenced predecessor hard-errors;
- manifest delta lists stay bounded by the compaction cadence on every
  root;
- the autopilot fires after the planted population shift;
- wall/batch stays flat (generous 3x bound — absolute walls are host
  noise, the invariant is no monotonic blowup).

The 200-batch table lives in SCALING.md (tools/scaling_probe.py --soak);
this test runs the same harness at pytest scale.
"""

from __future__ import annotations

import importlib.util
import os
import statistics

import pytest
# Round 14 (VERDICT r13 item 2): excluded from the driver's default
# pytest run (see pytest.ini); opt in with -m slow.
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "scaling_probe_for_soak", os.path.join(REPO, "tools", "scaling_probe.py")
)
scaling_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scaling_probe)


@pytest.fixture(scope="module")
def soak_result(spark_global):
    from mapreduce_framework_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(spark_global)
    return scaling_probe.run_soak(
        spark_global,
        n_batches=18,
        batch_n=60,
        compact_every=6,
        crash_at=8,
        drift_at=10,
    )


def test_soak_every_tier_fires(soak_result):
    tiers = set(soak_result["tier_counts"])
    assert {
        "admitted",
        "quality",
        "exact",
        "near_dup",
        "semantic",
        "contaminated",
    } <= tiers, soak_result["tier_counts"]
    # admitted docs dominate (the gate is not rejecting the clean corpus)
    counts = soak_result["tier_counts"]
    assert counts["admitted"] > sum(v for k, v in counts.items() if k != "admitted")


def test_soak_crash_takeover_replays_byte_identically(soak_result):
    assert soak_result["crash_replay_identical"] is True
    assert soak_result["zombie_fenced"] is True


def test_soak_manifests_stay_bounded(soak_result):
    # compaction folds every root's deltas; the list can hold at most the
    # compacted entry plus the batches since the last fold (+1 in-flight)
    for name, n in soak_result["manifest_delta_counts"].items():
        assert n <= 6 + 2, (name, soak_result["manifest_delta_counts"])


def test_soak_autopilot_fires_after_drift(soak_result):
    fired = soak_result["autopilot_fired_at"]
    assert fired, "autopilot never fired despite the population shift"
    assert all(b >= 10 for b in fired), fired  # only after the drift point


def test_soak_wall_per_batch_stays_flat(soak_result):
    walls = soak_result["walls"]
    early = statistics.median(walls[2:8])
    late = statistics.median(walls[-5:])
    assert late <= 3 * early, (early, late, walls)


def test_soak_composes_with_the_s3_manifest_backend(spark_global, tmp_path):
    """The composed five-tier soak through the OBJECT-STORAGE seam: every
    manifest read/commit/acquisition of all five roots flows through
    S3ManifestBackend over the in-memory conditional-PUT fake
    (tests/test_storage_s3.py semantics: real md5 ETags, 412 on
    If-Match/If-None-Match violations). A short horizon with a mid-run
    crash+takeover — the takeover's epoch CAS and the zombie's fenced
    commit both cross the S3 wire shape, proving the cascade's whole
    manifest lifecycle is object-storage-clean end-to-end."""
    from mapreduce_framework_spark.deploy import ensure_package_on_executors
    from mapreduce_framework_spark.storage import set_manifest_backend
    from mapreduce_framework_spark.storage_s3 import S3ManifestBackend
    from tests.test_storage_s3 import _FakeS3Client

    ensure_package_on_executors(spark_global)
    backend = S3ManifestBackend("bkt", prefix="soak", client=_FakeS3Client())
    prev = set_manifest_backend(backend)
    try:
        res = scaling_probe.run_soak(
            spark_global,
            n_batches=6,
            batch_n=50,
            compact_every=3,
            crash_at=3,
            drift_at=None,
        )
    finally:
        set_manifest_backend(prev)
    assert res["crash_replay_identical"] is True
    assert res["zombie_fenced"] is True
    assert {"admitted", "exact", "quality", "contaminated"} <= set(
        res["tier_counts"]
    )
    for name, n in res["manifest_delta_counts"].items():
        assert n <= 3 + 2, (name, res["manifest_delta_counts"])


@pytest.fixture(scope="module")
def soak_media_result(spark_global):
    """The round-12 SIX-tier soak: media_tier=True (the staged q110
    production shape) at pytest scale, with the crash+takeover landing
    while the phash index is live."""
    from mapreduce_framework_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(spark_global)
    return scaling_probe.run_soak(
        spark_global,
        n_batches=12,
        batch_n=50,
        compact_every=6,
        crash_at=6,
        drift_at=None,
        media_tier=True,
    )


def test_soak_media_tier_fires_and_composes(soak_media_result):
    counts = soak_media_result["tier_counts"]
    assert counts.get("media_dup", 0) > 0, counts
    # the other tiers keep firing around it — composition, not replacement
    assert {"admitted", "quality", "exact", "near_dup", "semantic"} <= set(counts)


def test_soak_media_crash_takeover_and_bounded_manifests(soak_media_result):
    """The six-tier form keeps the soak invariants: byte-identical
    redelivery across a crash that replays the phash tier too, the
    fenced zombie hard-errors, and the phash manifest's delta list is
    bounded by the same compaction cadence as every other root."""
    assert soak_media_result["crash_replay_identical"] is True
    assert soak_media_result["zombie_fenced"] is True
    deltas = soak_media_result["manifest_delta_counts"]
    assert "ph" in deltas
    for name, n in deltas.items():
        assert n <= 6 + 2, (name, deltas)


def test_soak_media_wall_stays_flat(soak_media_result):
    walls = soak_media_result["walls"]
    early = statistics.median(walls[1:5])
    late = statistics.median(walls[-4:])
    assert late <= 3 * early, walls
