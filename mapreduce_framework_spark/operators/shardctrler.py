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


# --- q85: driver-checkable config-history replay (K5) -----------------------
#
# The controller is cluster metadata (10 shards, a handful of groups), so the
# replay itself is intentionally driver-side and tiny; what the query proves
# is that the declared Join/Leave/Move semantics — quota rebalance with
# minimal movement and deterministic tie-breaks — are reproducible down to
# the exact shard→gid assignment. The oracle replays the identical algorithm
# as pure SQL: one unrolled CTE block per op, where a rebalance step is
#   keep    = per live gid, its lowest-`quota` owned shards
#             (the Python strips highest shard ids first: _rebalance)
#   orphans = every other shard, ranked ascending
#   assign  = orphans fill under-quota gids in sorted-gid order
#             (cumulative-capacity ranges)
# — a rank/quota closed form of _rebalance's imperative loop.

OPS_N = 12  # ops derived from the first OPS_N events rows (by event_id)
_GID_MOD = 5  # gid = user_id % _GID_MOD + 1


def _op_kind(i: int) -> str:
    """Deterministic op-kind schedule (1-based): join join move leave …
    Joins lead so the group set is non-trivial before leaves/moves."""
    return "move" if i % 4 == 3 else ("leave" if i % 4 == 0 else "join")


def shard_ops(spark, sf_dir: str) -> list[tuple[str, int, int]]:
    """(kind, gid, shard) op log derived from the events table — the same
    derivation the oracle's `ops` CTE performs in SQL."""
    from mapreduce_framework_spark.catalog import table

    rows = (
        table(spark, "events", sf_dir)
        .select("event_id", "user_id")
        .orderBy("event_id")
        .limit(OPS_N)
        .collect()
    )
    return [
        (_op_kind(i), int(r.user_id) % _GID_MOD + 1, int(r.event_id) % N_SHARDS)
        for i, r in enumerate(rows, start=1)
    ]


def _rebalance_step_sql(i: int) -> str:
    prev = f"s{i - 1}"
    return f"""
    live{i} AS (
      SELECT gid FROM (
        SELECT gid, arg_max(kind, i) AS lk FROM ops
        WHERE i <= {i} AND kind IN ('join', 'leave') GROUP BY gid
      ) WHERE lk = 'join'
    ),
    quota{i} AS (
      SELECT gid,
             {N_SHARDS} // (SELECT count(*) FROM live{i})
             + CASE WHEN row_number() OVER (ORDER BY gid)
                    <= {N_SHARDS} % (SELECT count(*) FROM live{i})
                    THEN 1 ELSE 0 END AS quota
      FROM live{i}
    ),
    keep{i} AS MATERIALIZED (
      SELECT shard, gid FROM (
        SELECT p.shard, p.gid, q.quota,
               row_number() OVER (PARTITION BY p.gid ORDER BY p.shard) AS rk
        FROM {prev} p JOIN quota{i} q USING (gid)
      ) WHERE rk <= quota
    ),
    orph{i} AS (
      SELECT shard, row_number() OVER (ORDER BY shard) AS orank
      FROM {prev} WHERE shard NOT IN (SELECT shard FROM keep{i})
    ),
    cap{i} AS (
      SELECT gid,
             quota - coalesce(k.cnt, 0) AS cap,
             sum(quota - coalesce(k.cnt, 0)) OVER (ORDER BY gid) AS cum
      FROM quota{i}
      LEFT JOIN (SELECT gid, count(*) AS cnt FROM keep{i} GROUP BY gid) k USING (gid)
    ),
    s{i} AS MATERIALIZED (
      SELECT u.shard, coalesce(x.gid, 0) AS gid
      FROM (SELECT unnest(range(0, {N_SHARDS})) AS shard) u
      LEFT JOIN (
        SELECT shard, gid FROM keep{i}
        UNION ALL
        SELECT o.shard, c.gid FROM orph{i} o
        JOIN cap{i} c ON o.orank > c.cum - c.cap AND o.orank <= c.cum
      ) x USING (shard)
    )"""


def _move_step_sql(i: int) -> str:
    return f"""
    s{i} AS MATERIALIZED (
      SELECT shard,
             CASE WHEN shard = (SELECT shard FROM ops WHERE i = {i})
                  THEN (SELECT gid FROM ops WHERE i = {i}) ELSE gid END AS gid
      FROM s{i - 1}
    )"""


def _shardctrler_oracle() -> str:
    blocks = [
        f"""ops AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY event_id) AS i,
             CASE WHEN row_number() OVER (ORDER BY event_id) % 4 = 3 THEN 'move'
                  WHEN row_number() OVER (ORDER BY event_id) % 4 = 0 THEN 'leave'
                  ELSE 'join' END AS kind,
             user_id % {_GID_MOD} + 1 AS gid,
             event_id % {N_SHARDS} AS shard
      FROM (SELECT event_id, user_id FROM events ORDER BY event_id LIMIT {OPS_N})
    ),
    s0 AS (SELECT unnest(range(0, {N_SHARDS})) AS shard, CAST(0 AS BIGINT) AS gid)"""
    ]
    for i in range(1, OPS_N + 1):
        blocks.append(
            _move_step_sql(i) if _op_kind(i) == "move" else _rebalance_step_sql(i)
        )
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS config_num, shard, CAST(gid AS BIGINT) AS gid FROM s{i}"
        for i in range(0, OPS_N + 1)
    )
    return (
        "WITH "
        + ",".join(blocks)
        + f"\n    SELECT config_num, shard, gid FROM ({union})\n"
        + "    ORDER BY config_num, shard"
    )


from mapreduce_framework_spark.registry import register


@register(
    "q85_shardctrler_replay",
    oracle=_shardctrler_oracle(),
    tags=("ref", "K5", "shardctrler"),
)
def q85_shardctrler_replay(spark, sf_dir: str):
    """K5 end-to-end: replay the events-derived Join/Leave/Move op log
    through the controller and emit the full config history (config_num,
    shard, gid) — every intermediate assignment, not just the final one, is
    hash-checked against the SQL replay. Balance invariant (max−min ≤ 1,
    src/shardctrler/test_test.go:36-53) is property-tested separately in
    tests/test_shardctrler.py."""
    ctrl = ShardCtrler()
    for kind, gid, shard in shard_ops(spark, sf_dir):
        if kind == "join":
            ctrl.join({gid: [f"server-{gid}"]})
        elif kind == "leave":
            ctrl.leave([gid])
        else:
            ctrl.move(shard, gid)
    rows = [
        (cfg.num, s, g)
        for cfg in ctrl.configs
        for s, g in enumerate(cfg.shards)
    ]
    return spark.createDataFrame(
        rows, "config_num long, shard long, gid long"
    ).orderBy("config_num", "shard")
