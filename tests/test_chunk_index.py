"""Chunk -> embed -> IVF-append composition (staged r13, the r14
registration candidate): oracle parity, composed-level append
stability (indexed chunks byte-identical across the incremental
commit), frozen centroids, dedup-aware ingest."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.chunk_index import (
    CHUNK_INDEX_ORACLE,
    build_chunk_ivf,
    chunk_vectors,
    pipeline_chunk_index,
)
from mapreduce_distributed_systems_spark.operators.similarity import DIM
from mapreduce_distributed_systems_spark.sources import load_table
from mapreduce_distributed_systems_spark.storage.vector_index import (
    read_ivf_index,
)
from tests.duck_oracle import compare_spark_vs_oracle


def test_chunk_index_matches_oracle(spark, sf_dir):
    """Full bit-exact replay of the composed pipeline: chunk windows
    -> digests -> deterministic embedding -> int8 Lloyd fit on the
    base parity -> frozen-centroid assignment of the new parity."""
    compare_spark_vs_oracle(
        pipeline_chunk_index(spark, sf_dir), CHUNK_INDEX_ORACLE, sf_dir
    )


def test_chunk_vectors_shape_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    v1 = chunk_vectors(docs, 0)
    rows = v1.limit(5).collect()
    assert rows, "base parity produced no chunk vectors"
    for r in rows:
        assert len(r.v) == DIM
        assert all(-128.0 <= x <= 127.0 for x in r.v)
    # deterministic: a second derivation is byte-identical
    a = sorted((r.vec_id, tuple(r.v)) for r in v1.collect())
    b = sorted(
        (r.vec_id, tuple(r.v)) for r in chunk_vectors(docs, 0).collect()
    )
    assert a == b


def test_composed_append_stability(spark, sf_dir):
    """The contract the chunking module promises to the vector index
    (chunking.py docstring), asserted at the COMPOSED level: after
    the incremental v2 commit, every v1 code row survives
    byte-identical (vec_id, qv, cell), the centroids are frozen
    across versions, and the appended generation only ADDS rows —
    re-chunking determinism means appended documents can never
    invalidate existing cells."""
    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="chunk_ivf_test_")
    build_chunk_ivf(spark, docs, base)

    codes1, cells1, m1 = read_ivf_index(spark, base, version=1)
    codes2, cells2, m2 = read_ivf_index(spark, base)  # latest
    assert m1["version"] == 1 and m2["version"] == 2

    v1 = sorted(
        (r.vec_id, tuple(r.qv), r.cell, r.gen) for r in codes1.collect()
    )
    v2_gen1 = sorted(
        (r.vec_id, tuple(r.qv), r.cell, r.gen)
        for r in codes2.where(F.col("gen") == 1).collect()
    )
    assert v1 == v2_gen1, "v1 code rows changed across the append commit"

    c1 = sorted((r.cell, tuple(r.cv)) for r in cells1.collect())
    c2 = sorted((r.cell, tuple(r.cv)) for r in cells2.collect())
    assert c1 == c2, "centroids moved across an append — not frozen"

    appended = codes2.where(F.col("gen") == 2).count()
    assert appended > 0, "fixture should contribute new-parity chunks"


def test_ingest_is_dedup_aware(spark, sf_dir):
    """Chunks already in the index (boilerplate shared across the
    parity split) must not index twice: vec_id is unique in v2, and
    the appended set is disjoint from v1's."""
    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="chunk_ivf_dedup_")
    build_chunk_ivf(spark, docs, base)
    codes2, _cells, _m = read_ivf_index(spark, base)
    total = codes2.count()
    assert codes2.select("vec_id").distinct().count() == total
    shared = chunk_vectors(docs, 0).join(
        chunk_vectors(docs, 1), "vec_id"
    ).count()
    gen2 = codes2.where(F.col("gen") == 2).count()
    new_distinct = chunk_vectors(docs, 1).count()
    assert gen2 == new_distinct - shared
