"""Semantic dedup checks against the planted duplicates in sf0.1
(8 exact-duplicate texts exist there; sf0.001/sf0.01 have none)."""

from __future__ import annotations

import pytest

from mapreduce_distributed_systems_spark.plans.registry import get_spec

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def planted(spark):
    rows = get_spec("dedup_exact_hash").fn(spark, SF01).collect()
    return rows


def test_exact_hash_finds_planted_duplicates(spark, planted):
    assert len(planted) == 8  # driver planted 8 duplicated texts at sf0.1
    assert all(r.n_copies >= 2 for r in planted)


def test_minhash_lsh_catches_exact_duplicates(spark, planted):
    """An exact duplicate is trivially a near-duplicate: every planted
    pair must surface from the LSH path with jaccard == 1.0."""
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in get_spec("dedup_minhash_lsh").fn(spark, SF01).collect()
    }
    dup_groups = get_spec("dedup_exact").fn(spark, SF01)
    # reconstruct the duplicated doc_id pairs from the exact groups
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.sources import load_table

    docs = load_table(spark, SF01, "documents")
    grouped = (
        docs.groupBy("text")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .collect()
    )
    assert len(grouped) == 8
    for g in grouped:
        a, b = g.ids[0], g.ids[1]
        assert (a, b) in pairs, f"planted dup pair {(a, b)} missed by LSH"
        assert pairs[(a, b)] == 1.0


def test_simhash64_catches_exact_duplicates(spark):
    """Identical texts have identical 64-bit signatures: every planted
    pair must surface from the band join with hamming == 0."""
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.sources import load_table

    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in get_spec("dedup_simhash64").fn(spark, SF01).collect()
    }
    docs = load_table(spark, SF01, "documents")
    grouped = (
        docs.groupBy("text")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .collect()
    )
    assert len(grouped) == 8
    for g in grouped:
        a, b = g.ids[0], g.ids[1]
        assert (a, b) in pairs, f"planted dup pair {(a, b)} missed by simhash64"
        assert pairs[(a, b)] == 0
