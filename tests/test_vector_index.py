"""Persisted IVF index contract (storage/vector_index.py): manifest
commit ordering, version time travel across refits, partition-pruned
candidate reads, and serving-equals-refit equivalence."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import get_spec
from mapreduce_distributed_systems_spark.storage.vector_index import (
    build_and_commit_ivf,
    read_ivf_index,
    write_ivf_index,
)


def test_manifest_is_the_commit_point(spark, sf_dir):
    """Both parquet dirs must be complete before any manifest appears,
    and the pointer must resolve to existing dirs — a reader that finds
    a manifest never sees missing data."""
    base = tempfile.mkdtemp(prefix="ivf_commit_")
    path = build_and_commit_ivf(spark, sf_dir, base)
    with open(path) as f:
        manifest = json.load(f)
    for key in ("codes_dir", "centroids_dir"):
        assert os.path.isdir(manifest[key])
    assert os.path.exists(os.path.join(manifest["centroids_dir"], "_SUCCESS"))
    assert not os.path.exists(path + ".tmp")
    # versioned commit record left behind for time travel
    assert os.path.exists(os.path.join(base, "manifest-001.json"))


def test_round_trip_preserves_codes_and_cells(spark, sf_dir):
    from mapreduce_distributed_systems_spark.operators.similarity import (
        _ivf_build,
    )

    _q8, assigned, cells = _ivf_build(spark, sf_dir)
    # r14: assigned carries qv from the one assign_carry pass — the
    # codes table is a projection, not a join
    codes = assigned.select("vec_id", "qv", "cell")
    base = tempfile.mkdtemp(prefix="ivf_rt_")
    write_ivf_index(codes, cells, base)
    codes2, cells2, manifest = read_ivf_index(spark, base)
    assert manifest["version"] == 1
    want = {(r.vec_id, tuple(r.qv), r.cell) for r in codes.collect()}
    got = {(r.vec_id, tuple(r.qv), int(r.cell)) for r in codes2.collect()}
    assert got == want
    assert {(r.cell, tuple(r.cv)) for r in cells2.collect()} == {
        (r.cell, tuple(r.cv)) for r in cells.collect()
    }


def test_version_time_travel_across_refits(spark, sf_dir):
    """A refit commits version+1 with v1 left immutable: the pointer
    serves v2, a pinned read still resolves v1 byte-for-byte — the
    same contract compact_snapshot certifies for KV snapshots."""
    from mapreduce_distributed_systems_spark.operators.similarity import (
        _ivf_build,
    )

    _q8, assigned, cells = _ivf_build(spark, sf_dir)
    codes = assigned.select("vec_id", "qv", "cell")  # r14 carry-through
    base = tempfile.mkdtemp(prefix="ivf_tt_")
    write_ivf_index(codes, cells, base, version=1)
    # "refit": v2 drops half the corpus (a deterministic visible change)
    write_ivf_index(
        codes.where(F.col("vec_id") % 2 == 0), cells, base, version=2
    )
    latest, _, m_latest = read_ivf_index(spark, base)
    pinned, _, m_pinned = read_ivf_index(spark, base, version=1)
    assert m_latest["version"] == 2 and m_pinned["version"] == 1
    assert latest.count() == pinned.where(F.col("vec_id") % 2 == 0).count()
    assert pinned.count() == codes.count()


def test_probe_read_is_partition_pruned(spark, sf_dir):
    """The point of cell-partitioned code lists: a candidate read for a
    probed cell subset must plan partition filters on `cell` and touch
    only that cell's files — n_probe/k of the index bytes, not a full
    scan."""
    base = tempfile.mkdtemp(prefix="ivf_prune_")
    build_and_commit_ivf(spark, sf_dir, base)
    codes, _cells, manifest = read_ivf_index(spark, base)
    pruned = codes.where(F.col("cell") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must land in PartitionFilters (directory-level
    # skipping), NOT in DataFilters/PushedFilters (row-group-level)
    tail = plan.split("PartitionFilters: [", 1)
    assert len(tail) == 2, f"no partition filters in plan:\n{plan}"
    assert "cell" in tail[1][:200]
    assert "DataFilters: []" in plan
    # and the partition column stays out of the parquet ReadSchema —
    # it is directory metadata, so the probed read moves 0 bytes of it
    read_schema = plan.split("ReadSchema: ", 1)[1]
    assert "cell" not in read_schema
    # cross-check the pruned row count against the full index
    full = {r.cell: r.cnt for r in
            codes.groupBy("cell").agg(F.count("*").alias("cnt")).collect()}
    assert pruned.count() == full.get(0, 0)


def test_persisted_serving_equals_refit(spark, sf_dir):
    """ann_ivf_persisted (load index, probe) must return exactly
    ann_ivf_kmeans (fit, probe): persistence is semantically
    invisible."""
    served = get_spec("ann_ivf_persisted").fn(spark, sf_dir)
    refit = get_spec("ann_ivf_kmeans").fn(spark, sf_dir)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    a = {key(r): (r.neighbor_id, r.cos_q8) for r in served.collect()}
    b = {key(r): (r.neighbor_id, r.cos_q8) for r in refit.collect()}
    assert a == b


def test_append_preserves_base_codes_and_centroids(spark, sf_dir):
    """The incremental append (ann_ivf_index_append) must (a) cover
    the whole corpus across the two generations, (b) leave version 1
    resolvable with exactly the base codes, and (c) serve version 2
    with the SAME centroid table — frozen, not refit."""
    from mapreduce_distributed_systems_spark.sources import load_table

    stats = get_spec("ann_ivf_index_append").fn(spark, sf_dir)
    rows = stats.collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_base = emb.where(F.col("vec_id") % 2 == 0).count()
    assert sum(r["n_base"] for r in rows) == n_base
    assert sum(r["n_appended"] for r in rows) == n - n_base
    # every appended vector landed in a learned cell (k rows, all cells
    # present exactly once)
    assert len(rows) == len({r["cell"] for r in rows})


def test_compaction_is_content_invisible_and_merges_files(spark, sf_dir):
    """compact_ivf_index after an append: identical (vec_id, qv, cell,
    gen) content, no more than one data file per cell, same centroids,
    old versions still resolvable — the compact_snapshot contract on
    the vector store. Since round 8 write_ivf_index itself repartitions
    by cell (one task per cell => one file per cell, the 100x
    small-files fix), so the ordinary write already satisfies the
    compacted layout and compaction's job is re-establishing it after
    out-of-band fragmentation; this pins both the content invariance
    and the one-file-per-cell layout on BOTH versions."""
    import glob

    from mapreduce_distributed_systems_spark.storage.vector_index import (
        compact_ivf_index,
    )

    # build a fragmented index: the registered append query leaves a
    # 2-generation version 2 behind in its own tempdir, so rebuild the
    # same shape here to know base_dir
    import mapreduce_distributed_systems_spark.storage.vector_index as vi

    base = tempfile.mkdtemp(prefix="ivf_compact_")
    real_mkdtemp = tempfile.mkdtemp
    try:
        tempfile.mkdtemp = lambda prefix=None, **kw: base  # pin the dir
        get_spec("ann_ivf_index_append").fn(spark, sf_dir).collect()
    finally:
        tempfile.mkdtemp = real_mkdtemp

    before, cells_b, m2 = read_ivf_index(spark, base)
    files_before = glob.glob(f"{base}/codes-002/*/*.parquet")
    compact_ivf_index(spark, base)
    after, cells_a, m3 = read_ivf_index(spark, base)
    assert m3["version"] == 3 and m3["compacted_from"] == 2
    files_after = glob.glob(f"{base}/codes-003/*/*.parquet")
    assert len(files_after) <= len(files_before)
    # one file per cell, both pre- and post-compaction (r8 write fix)
    for files in (files_before, files_after):
        cells_of = [f.split("/cell=")[1].split("/")[0] for f in files]
        assert len(cells_of) == len(set(cells_of)), "multi-file cell"
    key = lambda r: (r.vec_id, tuple(r.qv), int(r.cell), r.gen)  # noqa: E731
    assert {key(r) for r in after.collect()} == {key(r) for r in before.collect()}
    assert {(r.cell, tuple(r.cv)) for r in cells_a.collect()} == {
        (r.cell, tuple(r.cv)) for r in cells_b.collect()
    }
    # superseded version still reads (time travel across compactions)
    v2, _, _ = read_ivf_index(spark, base, version=2)
    assert v2.count() == after.count()
