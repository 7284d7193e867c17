"""Storage-layer snapshot contract (C6 as a table format —
storage/snapshots.py): manifest commit ordering, round-trip fidelity,
and equivalence with the in-plan compaction split."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.kv import op_log, replay
from mapreduce_distributed_systems_spark.plans.registry import get_spec
from mapreduce_distributed_systems_spark.sources import load_table
from mapreduce_distributed_systems_spark.storage import (
    read_snapshot,
    write_snapshot,
)


def _state_set(df):
    return {
        (r.key, r.final_value, int(r.n_effective_ops)) for r in df.collect()
    }


def test_snapshot_round_trip_is_lossless(spark, sf_dir):
    state = replay(op_log(load_table(spark, sf_dir, "events")))
    base = tempfile.mkdtemp(prefix="snap_rt_")
    write_snapshot(state, base, cutoff_repr="full-log")
    loaded, manifest = read_snapshot(spark, base)
    assert manifest["version"] == 1
    assert manifest["cutoff"] == "full-log"
    assert _state_set(loaded) == _state_set(state)


def test_manifest_is_the_commit_point(spark, sf_dir):
    """The data dir must exist and be complete before the manifest
    appears, and the manifest must resolve to an existing dir — a
    reader that finds a manifest never sees missing data."""
    state = replay(op_log(load_table(spark, sf_dir, "events")))
    base = tempfile.mkdtemp(prefix="snap_commit_")
    path = write_snapshot(state, base, cutoff_repr="x")
    with open(path) as f:
        manifest = json.load(f)
    assert os.path.isdir(manifest["data_dir"])
    # parquet _SUCCESS marker: the write finished before the commit
    assert os.path.exists(os.path.join(manifest["data_dir"], "_SUCCESS"))
    # no stray tmp manifest left behind
    assert not os.path.exists(path + ".tmp")


def test_storage_replay_equals_in_plan_compaction(spark, sf_dir):
    """The materialized-snapshot replay and the in-plan compaction
    split must agree with each other AND with the straight replay."""
    storage = get_spec("kv_snapshot_manifest_replay").fn(spark, sf_dir)
    in_plan = get_spec("kv_snapshot_compaction").fn(spark, sf_dir)
    straight = replay(
        op_log(load_table(spark, sf_dir, "events")).where(F.col("op") != "get")
    )
    assert _state_set(storage) == _state_set(in_plan) == _state_set(straight)


def test_time_travel_is_a_proper_prefix(spark, sf_dir):
    """The as-of state must reflect strictly fewer (or equal) effective
    ops per key than the final state — and at least one key must
    differ, or the cutoff split is vacuous at this SF."""
    asof = {r.key: r for r in get_spec("kv_get_time_travel").fn(spark, sf_dir).collect()}
    final = {
        r.key: r
        for r in replay(
            op_log(load_table(spark, sf_dir, "events")).where(F.col("op") != "get")
        ).collect()
    }
    assert set(asof) <= set(final)
    assert any(
        asof[k].final_value != final[k].final_value for k in asof
    ), "cutoff produced an identical state — vacuous time-travel check"


def test_compaction_is_a_versioned_invisible_commit(spark, sf_dir):
    """Small-file compaction must (a) reduce file count, (b) leave the
    content bit-identical, (c) bump the manifest version atomically,
    and (d) keep the superseded version resolvable — maintenance
    rewrites are invisible to readers and to history."""
    import glob

    from mapreduce_distributed_systems_spark.storage.snapshots import (
        compact_snapshot,
    )

    state = replay(op_log(load_table(spark, sf_dir, "events")))
    base = tempfile.mkdtemp(prefix="kv_compact_")
    # fragment the snapshot into many small files first
    write_snapshot(state.repartition(32), base, cutoff_repr="full-log")
    before, m1 = read_snapshot(spark, base)
    n_before = len(glob.glob(f"{m1['data_dir']}/*.parquet"))
    assert n_before > 4

    compact_snapshot(spark, base, target_files=4)
    after, m2 = read_snapshot(spark, base)
    n_after = len(glob.glob(f"{m2['data_dir']}/*.parquet"))
    assert n_after <= 4
    assert m2["version"] == m1["version"] + 1
    assert m2["cutoff"] == m1["cutoff"]
    assert sorted(map(tuple, before.collect())) == sorted(
        map(tuple, after.collect())
    )
    # the superseded version stays resolvable and intact (time travel)
    old, m_old = read_snapshot(spark, base, version=m1["version"])
    assert m_old["data_dir"] == m1["data_dir"]
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, after.collect())
    )


def test_version_diff_reads_both_committed_versions(spark, sf_dir):
    """kv_version_diff's contract: every emitted row is a real change
    ('added' rows empty at version 1, 'changed' rows differ), and the
    emitted keys are consistent with independently replaying the two
    prefix folds. n_effective_ops is NOT monotone across versions by
    design — a put between the cutoffs RESETS the effective window
    (models/kv.go put-overwrite), which is exactly the value change
    the diff reports."""
    from mapreduce_distributed_systems_spark.plans.registry import get_spec

    rows = get_spec("kv_version_diff").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.change == "added":
            assert r.n_ops_a == 0 and r.value_a == ""
        else:
            assert r.change == "changed"
            assert r.value_a != r.value_b
    # keys never disappear between versions: no 'removed' rows possible,
    # and each diff key exists at version 2 with at least one op
    assert all(r.n_ops_b >= 1 for r in rows)
