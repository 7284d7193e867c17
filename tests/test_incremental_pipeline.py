"""Incremental corpus cleaning == full recompute.

At 100 TB you never re-clean the whole corpus: new documents are
gated, deduped against a persisted signature store, and appended. This
test proves the incremental formulation is EXACTLY equivalent to the
full pipeline_clean_corpus run, which holds because every artifact
(md5 content hash, minhash signature, band key) is deterministic per
document — so (old store + new docs) reproduces the full candidate
set, and 'keep the lower doc_id' orients every old-vs-new pair toward
keeping the old doc.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    lsh_candidates,
    minhash_signatures,
    shingle_hashes,
    shingle_ids_from_hashes,
)
from mapreduce_distributed_systems_spark.operators.pipeline import (
    MIN_TOKENS,
    MIN_TTR,
    pipeline_clean_corpus,
)
from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.sources import load_table


def _gate(docs):
    toked = docs.select("doc_id", "source", "text", words("text").alias("toks"))
    return toked.where(
        (F.size("toks") >= MIN_TOKENS)
        & (F.size(F.array_distinct("toks")).cast("double") / F.size("toks") >= MIN_TTR)
    )


def _near_dup_victims(hashed):
    """Near-dup victims from a (doc_id, h) hashed-shingle stream — the
    representation a persisted signature store would hold (round 5:
    shingle strings never leave the map stage)."""
    cand = lsh_candidates(minhash_signatures(hashed))
    sh = shingle_ids_from_hashes(hashed)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sid")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sid")
    inter = (
        cand.join(sa, "doc_a").join(sb, ["doc_b", "sid"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .where(jac >= JACCARD_THRESHOLD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )


def test_incremental_equals_full(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cutoff = 250  # old = first half of doc ids, new = the rest
    old_docs = docs.where(F.col("doc_id") < cutoff)
    new_docs = docs.where(F.col("doc_id") >= cutoff)

    # ---- batch 1: clean the old corpus, persist the "stores"
    old_kept = _gate(old_docs).join(
        _gate(old_docs).groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id"),
        "doc_id",
    )
    old_sh = shingle_hashes(old_kept.select("doc_id", "text"))
    old_victims = _near_dup_victims(old_sh)
    old_clean = old_kept.join(old_victims, "doc_id", "left_anti")
    # stores are built from old_KEPT (pre-victim-removal): the full run
    # pairs new docs against old near-dup victims too, so the store
    # must retain their hashes/signatures for exact equivalence
    hash_store = old_kept.select(F.md5("text").alias("content_hash")).distinct()
    sig_store_sh = old_sh

    # ---- batch 2: gate new docs, dedup within-new and against stores
    new_gated = _gate(new_docs)
    # exact: drop new docs whose text already exists in the store,
    # then keep min doc_id within the new batch
    new_fresh = new_gated.join(
        hash_store, F.md5(new_gated.text) == hash_store.content_hash, "left_anti"
    )
    new_kept = new_fresh.join(
        new_fresh.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id"),
        "doc_id",
    )
    # near-dup: candidates over (store + new) signatures; only new docs
    # can be victims (every old id < every new id)
    combined_sh = sig_store_sh.unionByName(
        shingle_hashes(new_kept.select("doc_id", "text"))
    )
    victims = _near_dup_victims(combined_sh).where(F.col("doc_id") >= cutoff)
    new_clean = new_kept.join(victims, "doc_id", "left_anti")

    incremental = old_clean.select("source", "toks", "text").unionByName(
        new_clean.select("source", "toks", "text")
    ).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks")).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )

    full = pipeline_clean_corpus(spark, sf_dir)
    a = sorted(map(tuple, incremental.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b
