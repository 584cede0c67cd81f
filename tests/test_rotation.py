"""Enforced driver-window rotation (the CURATED_ORDER contract).

The external driver only records correctness for the first DRIVER_WINDOW
entries of queries(); everything behind the window relies on driver rows
from past rounds. These tests turn the "rotate per round" promise from a
comment into a gate: no query's external evidence may go more than one
round stale, and the recorded history must stay consistent with the
CORRECTNESS_r{N}.json artifacts it mirrors.
"""

from __future__ import annotations

import json
import os

import pytest

from mapreduce_framework_spark.registry import (
    CURATED_ORDER,
    CURRENT_ROUND,
    DRIVER_WINDOW,
    MAX_REGISTERED,
    RETIRED,
    WINDOW_HISTORY,
    all_queries,
    driver_window,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_query_exceeds_max_driver_staleness():
    """Every registered query must be in THIS round's driver window or have
    a driver row from the immediately previous round — i.e. max staleness
    of external correctness evidence is one round."""
    names = list(all_queries())
    window = set(driver_window())
    prev = set(WINDOW_HISTORY[CURRENT_ROUND - 1])
    stale = [n for n in names if n not in window and n not in prev]
    assert not stale, (
        f"{len(stale)} queries would go >1 round without a driver row: "
        f"{stale} — rotate them into CURATED_ORDER[:{DRIVER_WINDOW}]"
    )


def test_new_queries_enter_the_window_immediately():
    """A query that has never had a driver row must not start life behind
    the window."""
    never_checked = set(all_queries()) - {
        n for w in WINDOW_HISTORY.values() for n in w
    }
    behind = never_checked - set(driver_window())
    assert not behind, f"new queries hidden from the driver: {sorted(behind)}"


def test_window_history_matches_correctness_artifacts():
    """WINDOW_HISTORY must be the verbatim key lists of the recorded
    CORRECTNESS_r{N}.json files — it documents what the driver actually
    checked, so it must never drift from the artifacts."""
    for rnd, names in WINDOW_HISTORY.items():
        path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            pytest.fail(f"WINDOW_HISTORY[{rnd}] has no artifact at {path}")
        with open(path) as f:
            recorded = tuple(json.load(f))
        assert recorded == names, f"WINDOW_HISTORY[{rnd}] drifted from {path}"


def test_window_history_covers_all_past_rounds():
    assert sorted(WINDOW_HISTORY) == list(range(1, CURRENT_ROUND))
    assert all(len(w) == DRIVER_WINDOW for w in WINDOW_HISTORY.values())


def test_capacity_and_retirement_policy():
    """The 2-round rotation caps the registry at 2 × DRIVER_WINDOW names
    (registry.py capacity note). Registering query #101 requires retiring
    one under the written policy: the retired name goes to RETIRED
    (append-only, never reused in CURATED_ORDER) while its builder,
    oracle, and DuckDB differential test stay in the repo permanently."""
    assert MAX_REGISTERED == 2 * DRIVER_WINDOW
    assert len(all_queries()) <= MAX_REGISTERED, (
        "registry exceeds rotation capacity — retire a query "
        "(see RETIREMENT POLICY in registry.py) before registering a new one"
    )
    leaked = set(RETIRED) & set(CURATED_ORDER)
    assert not leaked, f"retired names re-registered: {sorted(leaked)}"
    assert len(RETIRED) == len(set(RETIRED))


def test_window_has_exactly_driver_window_slots_used_meaningfully():
    """The window must be full (driver slots are scarce) and duplicate-free
    (a duplicate silently rotates position 50 out)."""
    window = driver_window()
    assert len(window) == DRIVER_WINDOW
    assert len(set(window)) == DRIVER_WINDOW
    assert len(CURATED_ORDER) == len(set(CURATED_ORDER))


def test_retirement_dry_run_swap_preserves_invariants():
    """VERDICT r6 item 7: execute the documented retirement mechanics
    (registry.py policy item 4) as a SIMULATION against the top-ranked
    dry-run entry, so a future real swap is one commit with known-good
    invariants. Round 7 SPENT the top two targets (q55 → q103 and
    q72 → q104, real swaps — validated by the live gates above); the
    simulation now tracks the next-ranked eligible entry.

    Timing constraint the simulation encodes: a name is retire-eligible
    while its slot is IN the driver window (the retiree is removed, so
    its own staleness is moot; the newcomer takes exactly that window
    slot, so nothing is displaced). Retiring a behind-window name
    instead would push the window's tail query behind without a driver
    row, breaking the one-round staleness gate — both directions are
    asserted."""
    from mapreduce_framework_spark.registry import REGISTRY

    all_queries()  # side-effect: operator modules register their builders
    # The ROUND-14 HANDOFF target (registry.py): q69, the last permanent
    # rows-only sketch row, whose exact hash-checked gates q74/q75 stay
    # registered — the q29 retirement shape exactly (executed r12).
    target = "q69_approx_percentiles"
    assert target in REGISTRY and target in CURATED_ORDER
    newcomer = "q1xx_simulated_newcomer"
    # the retiree's builder/tolerance-differential stay in the repo for
    # the local sweep; its exact gates must stay registered so the
    # approx family's driver evidence never drops to zero
    assert REGISTRY[target].builder is not None
    assert REGISTRY[target].oracle is None  # by-design rows-only sketch
    assert "q74_hll_error_bound" in CURATED_ORDER
    assert "q75_percentile_sketch_bound" in CURATED_ORDER

    if target in CURATED_ORDER[:DRIVER_WINDOW]:
        # the target is timing-eligible THIS round: simulate the swap and
        # check every invariant the live gates enforce
        sim_order = list(CURATED_ORDER)
        sim_order[sim_order.index(target)] = newcomer
        sim_retired = RETIRED + (target,)
        assert len(sim_order) == MAX_REGISTERED
        assert len(set(sim_order)) == len(sim_order)
        assert newcomer in sim_order[:DRIVER_WINDOW]  # new-this-round rule
        assert target not in sim_order and target in sim_retired
        window = set(sim_order[:DRIVER_WINDOW])
        prev = set(WINDOW_HISTORY[CURRENT_ROUND - 1])
        stale = [
            n
            for n in sim_order
            if n not in window and n not in prev and n != newcomer
        ]
        assert not stale, stale
    else:
        # the target is BEHIND-window this round (it was driver-checked
        # last round): the swap must wait for the round it rotates in —
        # round 8 hit exactly this with the verdict-ranked q30 and spent
        # the in-window 2b entry q34 instead. Demonstrate that forcing
        # the behind-window swap breaks the staleness gate: the newcomer
        # takes a window slot, displacing a window query whose last
        # driver row is already a round old.
        bad_order = [n for n in CURATED_ORDER if n != target]
        bad_order.insert(0, newcomer)  # displaces the window tail behind
        bad_window = set(bad_order[:DRIVER_WINDOW])
        bad_prev = set(WINDOW_HISTORY[CURRENT_ROUND - 1])
        bad_stale = [
            n
            for n in bad_order
            if n not in bad_window and n not in bad_prev and n != newcomer
        ]
        assert bad_stale, "behind-window retirement should break staleness"
