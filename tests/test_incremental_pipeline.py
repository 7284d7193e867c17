"""Incremental corpus cleaning == full recompute.

At 100 TB you never re-clean the whole corpus: new documents are
gated, deduped against a persisted signature store, and appended.
`pipeline_incremental_update` implements that shape (store = the
corpus below the id midpoint, batch = the rest) and registers the
FULL-recompute SQL as its oracle, so the driver gate itself certifies
the equivalence. These tests pin the same property in-repo, plus the
store-orientation details the equivalence depends on.

Equivalence holds because every artifact (md5 content hash, minhash
signature, band key, shingle sid) is deterministic per document — so
(old store + new docs) reproduces the full candidate set — and 'keep
the lower doc_id' orients every old-vs-new pair toward keeping the
old doc.
"""

from __future__ import annotations

import pytest

# driver-budget profile (pytest.ini): incremental-vs-full corpus replays (~24 s)
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.dedup import (
    shingle_hashes,
)
from mapreduce_distributed_systems_spark.operators.pipeline import (
    _source_stats,
    exact_keep,
    incremental_apply,
    incremental_stores,
    near_dup_victims,
    pipeline_clean_corpus,
    pipeline_incremental_update,
    quality_gate,
)
from mapreduce_distributed_systems_spark.sources import load_table


def test_incremental_equals_full(spark, sf_dir):
    incremental = pipeline_incremental_update(spark, sf_dir)
    full = pipeline_clean_corpus(spark, sf_dir)
    a = sorted(map(tuple, incremental.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b
    assert incremental.columns == full.columns


def test_incremental_from_persisted_store(spark, sf_dir):
    """The production claim made literal: batch-1's stores round-trip
    through PARQUET, batch-2 runs against the files it read back, and
    the refreshed corpus still equals the full recompute. This is the
    path a real 100 TB refresh takes — nothing in the apply stage may
    depend on lineage or in-session state of the store build."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    cutoff = docs.agg(
        F.floor(F.max("doc_id") / F.lit(2.0)).cast("long")
    ).collect()[0][0]
    old_docs = docs.where(F.col("doc_id") < cutoff)
    new_docs = docs.where(F.col("doc_id") >= cutoff)

    old_clean, hash_store, sig_store = incremental_stores(old_docs)
    d = tempfile.mkdtemp(prefix="inc_store_")
    old_clean.select("doc_id", "source", "toks", "text").write.parquet(f"{d}/clean")
    hash_store.write.parquet(f"{d}/hash_store")
    sig_store.write.parquet(f"{d}/sig_store")

    clean_r = spark.read.parquet(f"{d}/clean")
    hash_r = spark.read.parquet(f"{d}/hash_store")
    sig_r = spark.read.parquet(f"{d}/sig_store")

    new_clean = incremental_apply(new_docs, hash_r, sig_r)
    cols = ("source", "toks", "text")
    refreshed = _source_stats(
        clean_r.select(*cols).unionByName(new_clean.select(*cols))
    )
    full = pipeline_clean_corpus(spark, sf_dir)
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_store_retains_victim_signatures(spark, sf_dir):
    """The signature store must be built from old_KEPT (pre-victim-
    removal): a new doc can be a near-dup of an OLD near-dup victim,
    and the full run drops it via that pair. If the store dropped
    victim signatures, such a new doc would sneak through. Verify the
    premise: at least one victim exists in the old half, and victims'
    signatures change the victim set of the combined corpus."""
    docs = load_table(spark, sf_dir, "documents")
    cutoff = docs.agg(F.floor(F.max("doc_id") / F.lit(2.0)).cast("long")).collect()[0][0]
    old_kept = exact_keep(quality_gate(docs.where(F.col("doc_id") < cutoff)))
    old_victims = near_dup_victims(
        shingle_hashes(old_kept.select("doc_id", "text"))
    )
    assert old_victims.count() > 0, (
        "fixture premise: the old half should contain near-dup victims"
    )
