"""Shard routing + controller semantics (SURVEY.md §2.C C7-C13,
build plan M5).

- key2shard: shard = first byte of key mod NSHARDS
  (shardkv/client.go:20-27) — here an ordinary partitioning
  expression, so Spark's Exchange takes the place of the reference's
  shard movement machinery.
- The shard controller (Join/Leave/Move/Query,
  shardctrler/common.go:8-15) is a deterministic driver-side
  algorithm producing a versioned routing table — ~40 lines of plain
  Python per SURVEY.md §4 (no Catalyst analogue). Invariants
  (max-min <= 1, minimal movement, config #0 = all shards to group 0)
  are pinned by tests/test_shard.py, mirroring
  shardctrler/test_test.go:36-53.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

NSHARDS = 10  # shardctrler/common.go:21


def key2shard_col(key: F.Column | str) -> F.Column:
    """shard = int(key[0]) % NSHARDS (shardkv/client.go:20-27)."""
    col = F.col(key) if isinstance(key, str) else key
    return (F.ascii(F.substring(col, 1, 1)) % NSHARDS).alias("shard")


KEY2SHARD_ORACLE = """
SELECT ascii(substring(CAST(user_id % 20 AS VARCHAR), 1, 1)) % 10 AS shard,
       count(DISTINCT user_id % 20) AS n_keys,
       count(*) AS n_ops
FROM events
GROUP BY 1
"""


@register(
    "key2shard_distribution",
    oracle=KEY2SHARD_ORACLE,
    tags=("shard", "partitioning"),
    doc="Route KV keys to shards by first byte mod 10; per-shard load.",
)
def key2shard_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select((F.col("user_id") % 20).cast("string").alias("key"))
    return (
        keyed.withColumn("shard", key2shard_col("key"))
        .groupBy("shard")
        .agg(
            F.countDistinct("key").alias("n_keys"),
            F.count("*").alias("n_ops"),
        )
    )


# --------------------------------------------------------------------------
# Shard controller: deterministic greedy rebalancer
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    """≙ shardctrler/common.go:25-29 Config{Num, Shards, Groups}."""

    num: int
    shards: tuple[int, ...]  # len NSHARDS; shards[i] = gid (0 = unassigned)
    groups: tuple[int, ...]  # sorted live gids


def _rebalance(shards: list[int], gids: list[int]) -> list[int]:
    """Move as few shards as possible so every live gid owns either
    floor(N/g) or ceil(N/g) shards (max-min <= 1). Deterministic:
    groups are processed in sorted gid order, shards in index order."""
    if not gids:
        return [0] * NSHARDS  # config-0 semantics: all shards -> group 0
    gids = sorted(gids)
    base, extra = divmod(NSHARDS, len(gids))
    # ceil-quotas go to the groups currently owning the most shards
    # (tie -> lower gid): that choice is what makes movement minimal
    counts = {gid: sum(1 for s in shards if s == gid) for gid in gids}
    quota = {gid: base for gid in gids}
    for gid in sorted(gids, key=lambda g: (-counts[g], g))[:extra]:
        quota[gid] = base + 1
    owned: dict[int, list[int]] = {gid: [] for gid in gids}
    orphans: list[int] = []
    for shard, gid in enumerate(shards):
        if gid in owned:
            owned[gid].append(shard)
        else:
            orphans.append(shard)
    # shed overflow from over-quota groups (highest shard index first,
    # so retained shards are the stable low-index ones)
    for gid in gids:
        while len(owned[gid]) > quota[gid]:
            orphans.append(owned[gid].pop())
    orphans.sort()
    for gid in gids:  # fill under-quota groups in gid order
        while len(owned[gid]) < quota[gid]:
            owned[gid].append(orphans.pop(0))
    out = [0] * NSHARDS
    for gid, shs in owned.items():
        for s in shs:
            out[s] = gid
    return out


class ShardController:
    """Versioned config log: Join/Leave/Move/Query
    (shardctrler/common.go:8-15, semantics from skeleton comments and
    shardctrler/test_test.go:36-79)."""

    def __init__(self) -> None:
        self.configs: list[Config] = [Config(0, (0,) * NSHARDS, ())]

    def _push(self, shards: list[int], groups: list[int]) -> Config:
        cfg = Config(len(self.configs), tuple(shards), tuple(sorted(groups)))
        self.configs.append(cfg)
        return cfg

    def join(self, gids: list[int]) -> Config:
        cur = self.configs[-1]
        groups = sorted(set(cur.groups) | set(gids))
        return self._push(_rebalance(list(cur.shards), groups), groups)

    def leave(self, gids: list[int]) -> Config:
        cur = self.configs[-1]
        groups = sorted(set(cur.groups) - set(gids))
        return self._push(_rebalance(list(cur.shards), groups), groups)

    def move(self, shard: int, gid: int) -> Config:
        cur = self.configs[-1]
        shards = list(cur.shards)
        shards[shard] = gid
        return self._push(shards, list(cur.groups))

    def query(self, num: int = -1) -> Config:
        if num == -1 or num >= len(self.configs):
            return self.configs[-1]  # Query(-1) = latest (common.go:68-73)
        return self.configs[num]


# deterministic op sequence for the rows-only query (mirrors the shape
# of shardctrler/test_test.go:81-253's Join/Leave/Move exercises)
CONTROLLER_SCRIPT: tuple[tuple, ...] = (
    ("join", [1, 2]),
    ("join", [3]),
    ("leave", [2]),
    ("move", (7, 1)),
    ("join", [4, 5]),
    ("leave", [1]),
    ("leave", [3, 4, 5]),
)


def run_controller_script() -> ShardController:
    ctl = ShardController()
    for op, arg in CONTROLLER_SCRIPT:
        if op == "join":
            ctl.join(arg)
        elif op == "leave":
            ctl.leave(arg)
        elif op == "move":
            ctl.move(*arg)
    return ctl


# Golden snapshot of the controller history (round 4): the full
# (num, shard, gid) table CONTROLLER_SCRIPT produces, committed as a
# literal. tests/test_shard.py asserts literal == algorithm output, so
# the driver's hash check becomes a real regression gate on the
# rebalancer (any drift in _rebalance breaks BOTH the pytest pin and
# the driver row) instead of a vacuous rows-only count.
HISTORY_GOLDEN_VALUES = """
(0,0,0), (0,1,0), (0,2,0), (0,3,0), (0,4,0), (0,5,0), (0,6,0), (0,7,0),
(0,8,0), (0,9,0), (1,0,1), (1,1,1), (1,2,1), (1,3,1), (1,4,1), (1,5,2),
(1,6,2), (1,7,2), (1,8,2), (1,9,2), (2,0,1), (2,1,1), (2,2,1), (2,3,1),
(2,4,3), (2,5,2), (2,6,2), (2,7,2), (2,8,3), (2,9,3), (3,0,1), (3,1,1),
(3,2,1), (3,3,1), (3,4,3), (3,5,1), (3,6,3), (3,7,3), (3,8,3), (3,9,3),
(4,0,1), (4,1,1), (4,2,1), (4,3,1), (4,4,3), (4,5,1), (4,6,3), (4,7,1),
(4,8,3), (4,9,3), (5,0,1), (5,1,1), (5,2,1), (5,3,4), (5,4,3), (5,5,4),
(5,6,3), (5,7,5), (5,8,3), (5,9,5), (6,0,3), (6,1,4), (6,2,5), (6,3,4),
(6,4,3), (6,5,4), (6,6,3), (6,7,5), (6,8,3), (6,9,5), (7,0,0), (7,1,0),
(7,2,0), (7,3,0), (7,4,0), (7,5,0), (7,6,0), (7,7,0), (7,8,0), (7,9,0)
"""

HISTORY_GOLDEN_ORACLE = f"""
SELECT num, shard, gid
FROM (VALUES {HISTORY_GOLDEN_VALUES}) t(num, shard, gid)
"""


@register(
    "shard_rebalance_history",
    oracle=HISTORY_GOLDEN_ORACLE,  # golden snapshot, algorithm-pinned
    tags=("shard", "controller"),
    doc="Config history (num, shard, gid) after a fixed Join/Leave/Move "
    "script. Oracle = the committed golden snapshot of the history "
    "(HISTORY_GOLDEN_VALUES), which tests/test_shard.py pins to the "
    "live _rebalance algorithm — balance + minimal-movement invariants "
    "are tested there too (200-step randomized).",
)
def shard_rebalance_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctl = run_controller_script()
    rows = [
        (cfg.num, shard, gid)
        for cfg in ctl.configs
        for shard, gid in enumerate(cfg.shards)
    ]
    return spark.createDataFrame(rows, schema="num int, shard int, gid int")


SHARD_PRUNE_ORACLE = """
WITH keyed AS (
  SELECT CAST(user_id % 20 AS VARCHAR) AS key, value
  FROM events
)
SELECT key, count(*) AS n_ops, round(sum(value), 2) AS total_value
FROM keyed
WHERE ascii(substring(key, 1, 1)) % 10 = 3
GROUP BY key
"""


@register(
    "shard_pruned_read",
    oracle=SHARD_PRUNE_ORACLE,
    tags=("shard", "pruning"),
    doc="Read a single shard's keys (C13 analogue: shard-scoped scan; "
    "with shard-partitioned storage this is partition pruning).",
)
def shard_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        (F.col("user_id") % 20).cast("string").alias("key"), "value"
    )
    return (
        keyed.where((F.ascii(F.substring("key", 1, 1)) % NSHARDS) == 3)
        .groupBy("key")
        .agg(F.count("*").alias("n_ops"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# --------------------------------------------------------------------------
# C14: serve during migration (round 4 — closes the last partial §2.C
# item). In the reference, a group keeps serving a shard through a
# reconfiguration until the handoff completes, then the receiver takes
# over (shardkv skeleton contract; shardkv/test_test.go exercises
# availability across config changes). The batch analogue: pick the
# CONTROLLER_SCRIPT's config-5 -> config-6 transition (leave [1]:
# shards 0,1,2 hand off from group 1 to groups 3,4,5; shards 3-9 never
# move), derive each shard's handoff point from the DATA (the midpoint
# of its op stream in (ts, event_id) order), and route every op to the
# group that serves it at that moment — old owner before the handoff,
# new owner after. tests/test_shard.py pins the literal configs to the
# controller algorithm's actual output, so the constants cannot drift.
#
# Scale note (100 TB): the routing is one window over the shard
# partitioning (the same single shuffle every per-shard op needs); the
# config pair is a 10-row broadcast in a real deployment. Serve
# routing is a narrow projection — no extra exchange.
# --------------------------------------------------------------------------

MIGRATION_OLD = (1, 1, 1, 4, 3, 4, 3, 5, 3, 5)  # Config 5 of CONTROLLER_SCRIPT
MIGRATION_NEW = (3, 4, 5, 4, 3, 4, 3, 5, 3, 5)  # Config 6 (after leave [1])

SHARD_SERVE_ORACLE = f"""
WITH routed AS (
  SELECT ascii(substring(CAST(user_id % 20 AS VARCHAR), 1, 1)) % 10 AS shard,
         ts, event_id
  FROM events
),
ranked AS (
  SELECT shard,
         row_number() OVER (PARTITION BY shard ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY shard) AS n
  FROM routed
),
served AS (
  SELECT shard,
         {list(MIGRATION_OLD)}[shard + 1] AS old_gid,
         {list(MIGRATION_NEW)}[shard + 1] AS new_gid,
         CASE WHEN rn * 2 <= n
              THEN {list(MIGRATION_OLD)}[shard + 1]
              ELSE {list(MIGRATION_NEW)}[shard + 1] END AS served_gid,
         {list(MIGRATION_OLD)}[shard + 1] <> {list(MIGRATION_NEW)}[shard + 1]
           AS moved
  FROM ranked
)
SELECT shard, old_gid, new_gid, served_gid, moved, count(*) AS n_ops
FROM served
GROUP BY shard, old_gid, new_gid, served_gid, moved
"""


@register(
    "shard_serve_during_migration",
    oracle=SHARD_SERVE_ORACLE,
    tags=("shard", "migration", "availability"),
    doc="C14 serve-during-migration: across the config-5 -> config-6 "
    "transition (leave [1]), every op is served by the shard's OLD "
    "owner until the shard's data-derived handoff point (midpoint of "
    "its op stream in (ts, event_id) order) and by the NEW owner "
    "after; moving shards (0,1,2) show both servers, stable shards "
    "exactly one. Literal configs are pinned to the controller "
    "algorithm's output by tests/test_shard.py.",
)
def shard_serve_during_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    routed = ev.select(
        key2shard_col((F.col("user_id") % 20).cast("string")).alias("shard"),
        "ts",
        "event_id",
    )
    w = W.partitionBy("shard").orderBy("ts", "event_id")
    ranked = routed.select(
        "shard",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("shard")).alias("n"),
    )
    old_arr = F.array(*[F.lit(g) for g in MIGRATION_OLD])
    new_arr = F.array(*[F.lit(g) for g in MIGRATION_NEW])
    old_gid = F.element_at(old_arr, F.col("shard") + 1)
    new_gid = F.element_at(new_arr, F.col("shard") + 1)
    served = ranked.select(
        "shard",
        old_gid.alias("old_gid"),
        new_gid.alias("new_gid"),
        F.when(F.col("rn") * 2 <= F.col("n"), old_gid)
        .otherwise(new_gid)
        .alias("served_gid"),
        (old_gid != new_gid).alias("moved"),
    )
    return served.groupBy(
        "shard", "old_gid", "new_gid", "served_gid", "moved"
    ).agg(F.count("*").alias("n_ops"))


MIGRATION_MOVES_ORACLE = f"""
WITH hist AS (
  SELECT num, shard, gid
  FROM (VALUES {HISTORY_GOLDEN_VALUES}) t(num, shard, gid)
),
lagged AS (
  SELECT num, shard, gid,
         lag(gid) OVER (PARTITION BY shard ORDER BY num) AS prev_gid
  FROM hist
),
mv AS (
  SELECT * FROM lagged WHERE prev_gid IS NOT NULL AND gid <> prev_gid
)
SELECT num, count(*) AS n_moves,
       string_agg(CAST(shard AS VARCHAR) || '>' || CAST(prev_gid AS VARCHAR)
                  || '>' || CAST(gid AS VARCHAR), ',' ORDER BY shard) AS moves
FROM mv GROUP BY num
"""


@register(
    "shard_migration_moves",
    oracle=MIGRATION_MOVES_ORACLE,  # lag-window recomputed over the
    # algorithm-pinned golden history
    tags=("shard", "controller"),
    doc="C12 analogue: per config transition, which shards moved and "
    "how many — computed as a lag window over the config history "
    "(shard movement is a data diff, not an RPC protocol). The oracle "
    "recomputes the SAME lag-window diff in SQL over the committed "
    "golden history snapshot, so both the windowing and the "
    "controller output are externally hash-checked.",
)
def shard_migration_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    hist = shard_rebalance_history(spark, sf_dir)
    w = W.partitionBy("shard").orderBy("num")
    moves = (
        hist.withColumn("prev_gid", F.lag("gid").over(w))
        .where(F.col("prev_gid").isNotNull() & (F.col("gid") != F.col("prev_gid")))
    )
    return moves.groupBy("num").agg(
        F.count("*").alias("n_moves"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("shard", "prev_gid", "gid"))),
                lambda s: F.concat_ws(
                    ">", s.shard.cast("string"), s.prev_gid.cast("string"),
                    s.gid.cast("string")
                ),
            ),
        ).alias("moves"),
    )
