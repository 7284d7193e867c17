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
