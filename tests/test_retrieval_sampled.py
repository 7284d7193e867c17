"""Sampled-truth retrieval audit (ROADMAP #22, staged for r11
registration): parity with its oracle, the render-refactor byte-pin
that keeps certified fingerprints frozen, and the sample-bound
contracts that make the audit always-on affordable."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.retrieval import (
    _BM25_CTES,
    AUDIT_QUERY_CAP,
    AUDIT_QUERY_FILTER,
    BM25_QUERY_CAP,
    BM25_QUERY_FILTER,
    RETRIEVAL_QUALITY_SAMPLED_ORACLE,
    _bm25_ctes,
    retrieval_quality_sampled,
)
from tests.duck_oracle import compare_spark_vs_oracle


def test_default_cte_render_is_byte_identical():
    """The r11 staging turned the certified _BM25_CTES literal into a
    rendering function; the default render MUST stay byte-identical
    or every certified BM25-family oracle fingerprint moves and the
    gate arithmetic breaks (plans/registry.py HARD ARITHMETIC
    WARNING). The audit render may differ ONLY in the q CTE."""
    assert _bm25_ctes(BM25_QUERY_FILTER, BM25_QUERY_CAP) == _BM25_CTES
    sampled = _bm25_ctes(AUDIT_QUERY_FILTER, AUDIT_QUERY_CAP)
    diff = [
        (a, b)
        for a, b in zip(_BM25_CTES.splitlines(), sampled.splitlines())
        if a != b
    ]
    assert diff == [
        (
            f"  WHERE {BM25_QUERY_FILTER} ORDER BY doc_id "
            f"LIMIT {BM25_QUERY_CAP}",
            f"  WHERE {AUDIT_QUERY_FILTER} ORDER BY doc_id "
            f"LIMIT {AUDIT_QUERY_CAP}",
        )
    ]


def test_sampled_quality_matches_oracle(spark, sf_dir):
    """The compare the driver gate will run at r11."""
    df = retrieval_quality_sampled(spark, sf_dir)
    compare_spark_vs_oracle(df, RETRIEVAL_QUALITY_SAMPLED_ORACLE, sf_dir)


def test_audit_sample_is_subset_of_production_queries(spark, sf_dir):
    """The audit stride must be a strict subsample of the production
    query stream (doc_id % 400 = 0 => doc_id % 100 = 0), so the
    certified number audits queries the serving path actually sees,
    and its size is hard-capped."""
    assert 400 % 100 == 0  # stride arithmetic that makes it a subset
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    audit_ids = [
        r.doc_id
        for r in docs.where(F.expr(AUDIT_QUERY_FILTER))
        .orderBy("doc_id")
        .limit(AUDIT_QUERY_CAP)
        .collect()
    ]
    assert audit_ids, "audit sample empty at this fixture"
    assert all(i % 100 == 0 for i in audit_ids)
    row = retrieval_quality_sampled(spark, sf_dir).first()
    assert row.n_queries <= AUDIT_QUERY_CAP
    # metric sanity: hits can never exceed the truth mass, dcg <= idcg
    assert 0 <= row.hits <= row.possible
    assert 0 <= row.dcg <= row.idcg
