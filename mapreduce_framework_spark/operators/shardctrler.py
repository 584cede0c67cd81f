"""Shard-controller semantics (K5, SURVEY §2.3) — config-versioned
shard→group assignment.

The reference declares (RPC docs src/shardctrler/common.go:6-16; servers
are stubs) four ops over ``Config{Num int, Shards [10]int, Groups
map[gid][]servers}`` (common.go:21-29):

- Join(new groups)  → rebalance over the union of groups
- Leave(gids)       → rebalance over the remaining groups
- Move(shard, gid)  → pin one shard
- Query(num)        → return config ``num`` (-1/latest)

with the balance invariant tested by the reference
(src/shardctrler/test_test.go:36-53): every shard owned by a live group and
``max_load − min_load ≤ 1``; rebalances move as few shards as possible.

This is cluster *metadata*, not a data operator (the data-plane analog of a
config change is ``repartition``); it is implemented as a deterministic
in-memory controller so the declared semantics are reproducible and
property-tested. Gid iteration is sorted everywhere → fully deterministic,
unlike the Go map-iteration ambiguity the reference tests tolerate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

N_SHARDS = 10  # src/shardctrler/common.go:21


@dataclass(frozen=True)
class Config:
    num: int
    shards: tuple[int, ...]  # shard -> gid (0 = unassigned)
    groups: dict[int, tuple[str, ...]] = field(default_factory=dict)


def _rebalance(shards: list[int], gids: list[int]) -> list[int]:
    """Even out shard ownership with minimal movement.

    Deterministic: gids processed in sorted order; the invariant
    max-min ≤ 1 (test_test.go:36-53) holds on return.
    """
    if not gids:
        return [0] * len(shards)
    gids = sorted(gids)
    target_low, extra = divmod(len(shards), len(gids))
    # first `extra` gids (sorted) own target_low+1 shards, the rest target_low
    quota = {g: target_low + (1 if i < extra else 0) for i, g in enumerate(gids)}
    owned: dict[int, list[int]] = {g: [] for g in gids}
    orphans: list[int] = []
    for s, g in enumerate(shards):
        if g in owned:
            owned[g].append(s)
        else:
            orphans.append(s)
    # strip over-quota owners (highest shard ids first → deterministic)
    for g in gids:
        while len(owned[g]) > quota[g]:
            orphans.append(owned[g].pop())
    # hand orphans to under-quota gids in sorted order
    orphans.sort()
    for g in gids:
        while len(owned[g]) < quota[g]:
            owned[g].append(orphans.pop(0))
    out = list(shards)
    for g, ss in owned.items():
        for s in ss:
            out[s] = g
    return out


class ShardCtrler:
    """Deterministic replay of the controller's declared op sequence."""

    def __init__(self) -> None:
        self.configs: list[Config] = [Config(0, tuple([0] * N_SHARDS), {})]

    def _latest(self) -> Config:
        return self.configs[-1]

    def join(self, groups: dict[int, list[str]]) -> Config:
        cur = self._latest()
        new_groups = dict(cur.groups)
        for gid, servers in sorted(groups.items()):
            new_groups[gid] = tuple(servers)
        shards = _rebalance(list(cur.shards), list(new_groups))
        cfg = Config(cur.num + 1, tuple(shards), new_groups)
        self.configs.append(cfg)
        return cfg

    def leave(self, gids: list[int]) -> Config:
        cur = self._latest()
        new_groups = {g: s for g, s in cur.groups.items() if g not in set(gids)}
        shards = _rebalance(
            [g if g in new_groups else 0 for g in cur.shards], list(new_groups)
        )
        cfg = Config(cur.num + 1, tuple(shards), new_groups)
        self.configs.append(cfg)
        return cfg

    def move(self, shard: int, gid: int) -> Config:
        cur = self._latest()
        shards = list(cur.shards)
        shards[shard] = gid
        cfg = Config(cur.num + 1, tuple(shards), dict(cur.groups))
        self.configs.append(cfg)
        return cfg

    def query(self, num: int = -1) -> Config:
        if num < 0 or num >= len(self.configs):
            return self._latest()
        return self.configs[num]
