"""k-means invariants (no SQL oracle possible for an iterative
algorithm): determinism, monotone inertia, complete assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.kmeans import K, kmeans_fit
from mapreduce_distributed_systems_spark.sources import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_kmeans_deterministic(spark, sf_dir):
    a1, c1, i1 = kmeans_fit(_emb(spark, sf_dir))
    a2, c2, i2 = kmeans_fit(_emb(spark, sf_dir))
    assert i1 == i2
    assert (c1 == c2).all()
    r1 = sorted((r.vec_id, r.cell) for r in a1.collect())
    r2 = sorted((r.vec_id, r.cell) for r in a2.collect())
    assert r1 == r2


def test_kmeans_inertia_monotone_and_assignment_complete(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    assigned, cents, inertia = kmeans_fit(emb)
    # Lloyd's algorithm never increases inertia
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia
    rows = assigned.collect()
    assert len(rows) == emb.count()  # every vector assigned exactly once
    assert {r.cell for r in rows} <= set(range(K))
    assert cents.shape == (K, 64)


def test_int8_fit_sample_lever(spark, sf_dir):
    """The quantizer-training sample: identity below the cap (the code
    path every static oracle replays), bounded + deterministic + a
    superset of the md5 init seeds above it."""
    import numpy as np

    from mapreduce_distributed_systems_spark.operators.kmeans import (
        FIT_SAMPLE_CAP,
        _fit_sample_int8,
        kmeans_fit_int8,
        quantize_int8,
    )

    q8 = quantize_int8(_emb(spark, sf_dir))
    n = q8.count()
    assert n <= FIT_SAMPLE_CAP  # driver/bench SFs sit below the cap...
    assert _fit_sample_int8(q8, n) is q8  # ...where the lever is identity

    # force the lever with a shrunken cap: sample is exactly-cap,
    # deterministic, and the fit over it is reproducible. The cap is
    # max(FIT_SAMPLE_CAP, FIT_PER_CELL * k) since round 7 (a fixed cap
    # under a corpus-scaled k starved the quantizer), so both knobs
    # shrink for the test.
    import mapreduce_distributed_systems_spark.operators.kmeans as km

    old = km.FIT_SAMPLE_CAP
    old_pc = km.FIT_PER_CELL
    km.FIT_SAMPLE_CAP = 100
    km.FIT_PER_CELL = 4
    try:
        s = _fit_sample_int8(q8, n)
        ids1 = sorted(r.vec_id for r in s.select("vec_id").collect())
        ids2 = sorted(r.vec_id for r in _fit_sample_int8(q8, n).select("vec_id").collect())
        assert len(ids1) == 100 and ids1 == ids2
        c1 = kmeans_fit_int8(q8, k=4, n_iter=1, n=n)
        c2 = kmeans_fit_int8(q8, k=4, n_iter=1, n=n)
        assert np.array_equal(c1, c2)
        # init seeds (k smallest md5) are inside the sample by
        # construction: sample = FIT_SAMPLE_CAP smallest md5
        seeds = km._init_centroids_int8(s, 4)
        full_seeds = km._init_centroids_int8(q8, 4)
        assert np.array_equal(seeds, full_seeds)
    finally:
        km.FIT_SAMPLE_CAP = old
        km.FIT_PER_CELL = old_pc
