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


@register(
    "shard_rebalance_history",
    oracle=None,  # driver-side deterministic algorithm; invariants in tests
    tags=("shard", "controller"),
    doc="Config history (num, shard, gid) after a fixed Join/Leave/Move "
    "script; balance + minimal-movement invariants in tests/test_shard.py.",
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


@register(
    "shard_migration_moves",
    oracle=None,  # input is the driver-side controller history
    tags=("shard", "controller"),
    doc="C12 analogue: per config transition, which shards moved and "
    "how many — computed as a lag window over the config history "
    "(shard movement is a data diff, not an RPC protocol).",
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
