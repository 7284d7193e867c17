"""Lexical-index version CDC (staged for r11): oracle parity, the
planted eviction path under a tiny cap, and cap-aware zero-churn."""

from __future__ import annotations

import tempfile

import duckdb
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.storage.lexical_index import (
    INDEX_DIFF_BASE,
    _index_diff_oracle,
    append_bm25_index,
    bm25_index_version_diff,
    build_and_commit_bm25,
    index_version_diff,
)
from tests.duck_oracle import compare_spark_vs_oracle


def test_version_diff_matches_oracle(spark, sf_dir):
    """The compare the driver gate will run at r11: Spark (two
    committed artifact versions, full-outer posting diff) vs the
    pure-SQL rebuild of both versions."""
    df = bm25_index_version_diff(spark, sf_dir)
    compare_spark_vs_oracle(df, _index_diff_oracle(), sf_dir)


def test_append_eviction_is_captured_as_removed(spark):
    """When a term's merged posting list exceeds the cap, the append
    re-prune EVICTS its lowest-(tf, doc_id) postings — the diff must
    report them as 'removed'. Planted: cap=2, base 'hot' list
    [(0, tf 3), (2, tf 2)], appended doc 1 brings tf 5, so (2, tf 2)
    falls out."""
    d = tempfile.mkdtemp(prefix="idxdiff_docs_")
    spark.createDataFrame(
        [
            (0, "hot hot hot x"),
            (2, "hot hot y"),
            (4, "z"),
            (1, "hot hot hot hot hot"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    base_dir = tempfile.mkdtemp(prefix="idxdiff_idx_")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    split = tempfile.mkdtemp(prefix="idxdiff_split_")
    docs.where(F.expr(INDEX_DIFF_BASE)).write.mode("overwrite").parquet(
        f"{split}/documents.parquet"
    )
    build_and_commit_bm25(spark, split, base_dir, cap=2)
    append_bm25_index(spark, docs.where(~F.expr(INDEX_DIFF_BASE)), base_dir)

    got = {
        r.change: (r.n_postings, r.n_terms, r.n_docs, r.sum_tf, r.pos_mass)
        for r in index_version_diff(spark, base_dir, 1, 2).collect()
    }
    assert got == {
        "added": (1, 1, 1, 5, 0),  # (hot, doc 1, tf 5)
        "removed": (1, 1, 1, 2, 0),  # (hot, doc 2, tf 2) evicted
        # built without phrase support -> positional churn is empty
        "pos_added": (0, 0, 0, 0, 0),
        "pos_removed": (0, 0, 0, 0, 0),
    }
    # and the tiny-cap oracle agrees end-to-end on the planted corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            _index_diff_oracle(cap=2, with_positions=False)
        ).fetchall()
    }
    assert got == want


def test_positional_churn_mirrors_scoring_churn_with_offset_mass(spark):
    """r12 CDC extension: on an index built WITH phrase support, the
    positional rows must mirror the scoring rows' membership (same tf
    relation, same prune) and carry the changed rows' token-offset
    mass. Planted (cap=2): appending doc 1 ('hot' x5, offsets 0..4,
    mass 10) evicts (hot, doc 2, tf 2, offsets {0, 1}, mass 1)."""
    d = tempfile.mkdtemp(prefix="idxdiffp_docs_")
    spark.createDataFrame(
        [
            (0, "hot hot hot x"),
            (2, "hot hot y"),
            (4, "z"),
            (1, "hot hot hot hot hot"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    base_dir = tempfile.mkdtemp(prefix="idxdiffp_idx_")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    split = tempfile.mkdtemp(prefix="idxdiffp_split_")
    docs.where(F.expr(INDEX_DIFF_BASE)).write.mode("overwrite").parquet(
        f"{split}/documents.parquet"
    )
    build_and_commit_bm25(spark, split, base_dir, cap=2, with_positions=True)
    append_bm25_index(spark, docs.where(~F.expr(INDEX_DIFF_BASE)), base_dir)

    got = {
        r.change: (r.n_postings, r.n_terms, r.n_docs, r.sum_tf, r.pos_mass)
        for r in index_version_diff(spark, base_dir, 1, 2).collect()
    }
    assert got == {
        "added": (1, 1, 1, 5, 0),
        "removed": (1, 1, 1, 2, 0),
        "pos_added": (1, 1, 1, 5, 10),  # offsets 0+1+2+3+4
        "pos_removed": (1, 1, 1, 2, 1),  # offsets 0+1
    }
    # membership lockstep: pos rows == scoring rows up to pos_mass
    for change in ("added", "removed"):
        assert got[change][:4] == got[f"pos_{change}"][:4]
    # and the tiny-cap oracle (positions derived from token offsets,
    # independently of the stored artifacts) agrees end-to-end
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(_index_diff_oracle(cap=2)).fetchall()
    }
    assert got == want


def test_component_add_and_drop_diff_as_total_churn(spark):
    """A rebuild that ADDS phrase support (v1 without positions, v2
    with) must report the entire v2 positional relation as
    pos_added; dropping it reports the whole old relation as
    pos_removed — never a silent special case."""
    d = tempfile.mkdtemp(prefix="idxdiffc_docs_")
    spark.createDataFrame(
        [(0, "a b"), (1, "b c")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="idxdiffc_idx_")
    build_and_commit_bm25(spark, d, base_dir, version=1)
    build_and_commit_bm25(spark, d, base_dir, version=2,
                          with_positions=True)
    got = {
        r.change: (r.n_postings, r.sum_tf, r.pos_mass)
        for r in index_version_diff(spark, base_dir, 1, 2).collect()
    }
    # scoring postings identical; positional component appears whole:
    # 4 (term, doc) rows, tf 1 each; offset mass = docs' second tokens
    assert got["added"] == (0, 0, 0)
    assert got["removed"] == (0, 0, 0)
    assert got["pos_added"] == (4, 4, 2)
    assert got["pos_removed"] == (0, 0, 0)
    rev = {
        r.change: (r.n_postings, r.sum_tf, r.pos_mass)
        for r in index_version_diff(spark, base_dir, 2, 1).collect()
    }
    assert rev["pos_removed"] == (4, 4, 2)
    assert rev["pos_added"] == (0, 0, 0)


def test_no_eviction_below_cap_means_zero_removed(spark, sf_dir):
    """Whenever no merged posting list exceeds the cap, an append is
    purely additive: 'removed' must be the zero row and 'added' must
    carry exactly the appended half's postings. Cap-aware: the guard
    derives bindingness from the data instead of assuming a fixture
    size (the sf0.1 corpus genuinely binds the production cap)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    from mapreduce_distributed_systems_spark.functions.text import words
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        POSTING_CAP,
    )

    max_df = (
        docs.select("doc_id", F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .agg(F.max("df"))
        .first()[0]
    )
    rows = {
        r.change: r.n_postings
        for r in bm25_index_version_diff(spark, sf_dir).collect()
    }
    if max_df <= POSTING_CAP:
        assert rows["removed"] == 0
        assert rows["added"] > 0
    else:
        assert rows["removed"] > 0  # the cap genuinely evicted
