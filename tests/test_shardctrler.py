"""Shard-controller property tests — the reference's declared invariants
(src/shardctrler/test_test.go:36-53): every shard owned by a live group,
balance max−min ≤ 1, minimal movement, and historical Query immutability."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_framework_spark.operators.shardctrler import (
    N_SHARDS,
    Config,
    ShardCtrler,
)


def _check_balance(cfg: Config) -> None:
    if not cfg.groups:
        assert all(g == 0 for g in cfg.shards)
        return
    counts = Counter(cfg.shards)
    assert set(counts) <= set(cfg.groups), "shard owned by a dead group"
    assert set(cfg.groups) == set(counts) | (
        set(cfg.groups) - set(counts)
    )
    loads = [counts.get(g, 0) for g in cfg.groups]
    assert max(loads) - min(loads) <= 1, f"unbalanced: {loads}"


def test_join_then_leave_deterministic_and_balanced():
    c = ShardCtrler()
    c.join({1: ["s1a"], 2: ["s2a"]})
    _check_balance(c.query())
    c.join({3: ["s3a"]})
    _check_balance(c.query())
    c.leave([2])
    _check_balance(c.query())
    # deterministic replay produces identical configs
    d = ShardCtrler()
    d.join({1: ["s1a"], 2: ["s2a"]})
    d.join({3: ["s3a"]})
    d.leave([2])
    assert [cfg.shards for cfg in c.configs] == [cfg.shards for cfg in d.configs]


def test_minimal_movement_on_join():
    c = ShardCtrler()
    c.join({1: ["a"]})
    before = c.query().shards
    c.join({2: ["b"]})
    after = c.query().shards
    moved = sum(1 for x, y in zip(before, after) if x != y)
    assert moved == N_SHARDS // 2  # exactly the shards the new group must take


def test_query_historical_configs_immutable():
    c = ShardCtrler()
    c.join({1: ["a"]})
    c.join({2: ["b"]})
    snapshot = c.query(1)
    c.leave([1])
    assert c.query(1) == snapshot
    assert c.query(0).shards == tuple([0] * N_SHARDS)


def test_move_pins_shard():
    c = ShardCtrler()
    c.join({1: ["a"], 2: ["b"]})
    c.move(3, 2)
    assert c.query().shards[3] == 2


@settings(max_examples=50, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("join"), st.integers(1, 8)),
            st.tuples(st.just("leave"), st.integers(1, 8)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_random_membership_churn_keeps_invariants(ops):
    c = ShardCtrler()
    live: set[int] = set()
    for kind, gid in ops:
        if kind == "join" and gid not in live:
            c.join({gid: [f"s{gid}"]})
            live.add(gid)
        elif kind == "leave" and gid in live:
            c.leave([gid])
            live.discard(gid)
        _check_balance(c.query())
        assert set(c.query().groups) == live
