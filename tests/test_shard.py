"""Shard-controller invariants, mirroring shardctrler/test_test.go:36-79:
balance (max-min <= 1), all shards assigned, minimal movement,
Move/Query semantics, config-0 semantics, determinism."""

from __future__ import annotations

import random

from mapreduce_distributed_systems_spark.operators.shard import (
    NSHARDS,
    Config,
    ShardController,
    run_controller_script,
)


def _counts(cfg: Config) -> dict[int, int]:
    c: dict[int, int] = {g: 0 for g in cfg.groups}
    for gid in cfg.shards:
        if gid != 0:
            c[gid] = c.get(gid, 0) + 1
    return c


def _check_balance(cfg: Config) -> None:
    if not cfg.groups:
        assert all(g == 0 for g in cfg.shards)
        return
    counts = _counts(cfg)
    assert set(counts) == set(cfg.groups)
    assert sum(counts.values()) == NSHARDS  # every shard assigned to a live gid
    assert max(counts.values()) - min(counts.values()) <= 1


def test_config_zero():
    ctl = ShardController()
    cfg = ctl.query(0)
    assert cfg.num == 0 and cfg.shards == (0,) * NSHARDS and cfg.groups == ()


def test_join_leave_balance_and_minimal_moves():
    rng = random.Random(42)
    ctl = ShardController()
    live: set[int] = set()
    for step in range(200):
        if not live or (rng.random() < 0.6 and len(live) < 12):
            gids = [rng.randrange(1, 50) for _ in range(rng.randint(1, 3))]
            gids = [g for g in gids if g not in live] or [max(live, default=0) + 1]
            before = ctl.query(-1)
            ctl.join(gids)
            live |= set(gids)
        else:
            gone = rng.sample(sorted(live), rng.randint(1, min(2, len(live))))
            before = ctl.query(-1)
            ctl.leave(gone)
            live -= set(gone)
        after = ctl.query(-1)
        _check_balance(after)
        # minimal movement: moves == orphaned shards + overflow shed
        after_counts = _counts(after)
        quota = dict(after_counts)  # post-balance counts ARE the quotas
        overflow = 0
        orphaned = 0
        before_counts: dict[int, int] = {}
        for gid in before.shards:
            before_counts[gid] = before_counts.get(gid, 0) + 1
        for gid, n in before_counts.items():
            if gid == 0 or gid not in after.groups:
                orphaned += n
            else:
                overflow += max(0, n - quota.get(gid, 0))
        moves = sum(1 for a, b in zip(before.shards, after.shards) if a != b)
        if after.groups:
            assert moves == orphaned + overflow, (step, before, after)


def test_move_then_query():
    ctl = ShardController()
    ctl.join([1, 2])
    ctl.move(3, 2)
    cfg = ctl.query(-1)
    assert cfg.shards[3] == 2
    assert ctl.query(1).num == 1
    assert ctl.query(-1).num == len(ctl.configs) - 1
    assert ctl.query(999).num == len(ctl.configs) - 1


def test_leave_all_returns_to_gid0():
    ctl = ShardController()
    ctl.join([4])
    ctl.leave([4])
    assert ctl.query(-1).shards == (0,) * NSHARDS


def test_determinism():
    a = run_controller_script()
    b = run_controller_script()
    assert [c.shards for c in a.configs] == [c.shards for c in b.configs]


def test_migration_config_literals_match_controller():
    """The C14 query's literal config pair must be exactly configs 5
    and 6 of CONTROLLER_SCRIPT — the constants cannot drift from the
    rebalancer algorithm's actual output."""
    from mapreduce_distributed_systems_spark.operators.shard import (
        MIGRATION_NEW,
        MIGRATION_OLD,
    )

    ctl = run_controller_script()
    assert ctl.configs[5].shards == MIGRATION_OLD
    assert ctl.configs[6].shards == MIGRATION_NEW
    # the transition models a real migration: some shards move, most don't
    moved = [s for s in range(NSHARDS) if MIGRATION_OLD[s] != MIGRATION_NEW[s]]
    assert moved == [0, 1, 2]


def test_serve_during_migration_availability(spark, sf_dir):
    """C14 contract: every op is served by exactly one group, stable
    shards are served only by their owner, and each moving shard is
    served by BOTH its old and new owner across the handoff."""
    from mapreduce_distributed_systems_spark.plans.registry import get_spec

    rows = get_spec("shard_serve_during_migration").fn(spark, sf_dir).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, grp in by_shard.items():
        if grp[0].moved:
            assert {r.served_gid for r in grp} == {grp[0].old_gid, grp[0].new_gid}
        else:
            assert {r.served_gid for r in grp} == {grp[0].old_gid}


def test_history_golden_literal_matches_algorithm():
    """The committed golden snapshot that serves as the driver oracle
    for shard_rebalance_history / shard_migration_moves must be
    exactly what the live rebalancer produces — if _rebalance drifts,
    this pin and the driver row fail together."""
    import re

    from mapreduce_distributed_systems_spark.operators.shard import (
        HISTORY_GOLDEN_VALUES,
    )

    golden = {
        tuple(map(int, m))
        for m in re.findall(r"\((\d+),(\d+),(\d+)\)", HISTORY_GOLDEN_VALUES)
    }
    ctl = run_controller_script()
    live = {
        (cfg.num, shard, gid)
        for cfg in ctl.configs
        for shard, gid in enumerate(cfg.shards)
    }
    assert golden == live
