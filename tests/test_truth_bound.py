"""MaxScore-bounded exact BM25 truth (ROADMAP #31,
operators/retrieval._bm25_truth_topk): full differential equality
against the unpruned truth pass on the fixture corpus (both query
blocks), on a PLANTED df-adversarial corpus where the bound actually
engages, and on a degenerate corpus where theta is unreachable and
the bound must degrade to the unpruned plan. The bound changes the
plan, never the answer — these tests ARE that statement."""

from __future__ import annotations

# driver-budget profile (pytest.ini): MaxScore-bound differentials for the kept-but-unwired drop-in scorer (~80 s)

import tempfile

import pytest
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.retrieval import (
    AUDIT_QUERY_CAP,
    AUDIT_QUERY_FILTER,
    BM25_QUERY_CAP,
    BM25_QUERY_FILTER,
    BM25_TOP_K,
    BM25_TRUTH_EPS,
    QUERY_TERMS,
    _bm25_ranked,
    _bm25_relations,
    _bm25_truth_topk,
    _bm25_w_col,
)


pytestmark = pytest.mark.slow  # see pytest.ini driver-budget profile


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_truth_equal(spark, sf_dir, query_filter, query_cap):
    bounded = _bm25_truth_topk(
        spark, sf_dir, query_filter=query_filter, query_cap=query_cap
    )
    unpruned = _bm25_ranked(
        spark, sf_dir, None, query_filter=query_filter, query_cap=query_cap
    ).where(F.col("rank") <= BM25_TOP_K)
    assert _rows(bounded) == _rows(unpruned)


def test_bounded_truth_equals_unpruned_on_audit_block(spark, sf_dir):
    _assert_truth_equal(spark, sf_dir, AUDIT_QUERY_FILTER, AUDIT_QUERY_CAP)


def test_bounded_truth_equals_unpruned_on_production_block(spark, sf_dir):
    _assert_truth_equal(spark, sf_dir, BM25_QUERY_FILTER, BM25_QUERY_CAP)


@pytest.fixture(scope="module")
def adversarial_dir(spark):
    """A df-adversarial corpus: a CLOSED 12-term vocabulary, so every
    query's 8 lowest-df terms all have posting lists spanning most of
    the corpus (the regime the 1000x probe measured at the audit's
    linear upper bound). tf and dl vary per doc so scores spread and
    theta actually prunes."""
    out = tempfile.mkdtemp(prefix="bm25_adversarial_")
    rows = []
    # ten identical "perfect" docs: contain ONLY the 8 query terms at
    # the corpus-max tf with the corpus-min dl, so they are near-argmax
    # for every term simultaneously -> they fill the true top-10 and
    # push theta close to the total ub mass, which is what makes the
    # MaxScore suffix tail nonessential (odd ids: never query docs)
    perfect = " ".join(f"a{i}" for _ in range(3) for i in range(8))
    for j in range(10):
        rows.append((1001 + 2 * j, perfect))
    # 290 regular docs: a-terms (the 8 lowest-df terms -> every
    # query's representation) in ~half the docs at tf 1-2, plus
    # high-df b-term bulk so dl spreads and b never wins the qt cut
    for d in range(290):
        toks = []
        for i in range(8):
            if (d + i) % 2 == 0 or d % 10 == 0:  # query docs get all
                toks += [f"a{i}"] * (1 + (d + i) % 2)
        for i in range(4):
            toks += [f"b{i}"] * (3 + (d * 5 + i) % 7)
        rows.append((d, " ".join(toks)))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        2
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_bounded_truth_equals_unpruned_on_adversarial_corpus(
    spark, adversarial_dir
):
    _assert_truth_equal(spark, adversarial_dir, "doc_id % 10 = 0", 16)


def test_bound_actually_engages_on_adversarial_corpus(spark, adversarial_dir):
    """Guards against the differential passing vacuously: on the
    planted corpus at least one query must have a NONEMPTY
    nonessential tail (the MaxScore prefix strictly shorter than
    QUERY_TERMS), i.e. the pruning path is exercised, not bypassed."""
    qf, qc = "doc_id % 10 = 0", 16
    tf, dl, scal, df, qt = _bm25_relations(spark, adversarial_dir, qf, qc)
    terms_needed = qt.select("term", "df").distinct()
    rows = (
        tf.join(F.broadcast(terms_needed), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select("term", "doc_id", _bm25_w_col().alias("w"))
    )
    ubw = rows.groupBy("term").agg(F.max("w").alias("ub"))
    qrows = F.broadcast(qt.select("query_id", "term")).join(
        rows, "term"
    ).where(F.col("doc_id") != F.col("query_id"))
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        POSTING_CAP,
    )
    from pyspark.sql import Window as W

    seed = (
        _bm25_ranked(spark, adversarial_dir, POSTING_CAP, qf, qc)
        .where(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "doc_id")
    )
    seed_s = (
        qrows.join(F.broadcast(seed), ["query_id", "doc_id"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("s"))
    )
    wth = W.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    theta = (
        seed_s.withColumn("_r", F.row_number().over(wth))
        .where(F.col("_r") == BM25_TOP_K)
        .select("query_id", F.col("s").alias("theta"))
    )
    wsfx = (
        W.partitionBy("query_id")
        .orderBy(F.desc("ub"), F.asc("term"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    noness = (
        qt.select("query_id", "term")
        .join(F.broadcast(ubw), "term")
        .join(F.broadcast(theta), "query_id")
        .withColumn("sfx", F.sum("ub").over(wsfx))
        .where(F.col("sfx") < F.col("theta") - F.lit(BM25_TRUTH_EPS))
    )
    n_noness = noness.count()
    assert n_noness > 0, (
        "planted adversarial corpus produced no nonessential terms — "
        "the bounded-truth differential is not exercising the pruning "
        "path; re-tune the planted tf spread"
    )
    # and the prefix never empties: the top-ub term is always essential
    per_q = noness.groupBy("query_id").count()
    assert per_q.where(F.col("count") >= QUERY_TERMS).count() == 0


def test_bounded_truth_equals_unpruned_on_seeded_random_corpora(spark):
    """Seeded random-text differential (the repo's third-engine
    discipline): corpora drawn from zipf-ish synthetic vocabularies of
    varying size and doc length — including shapes where theta prunes
    hard AND shapes where it cannot — must all produce identical
    top-k from the bounded and unpruned plans."""
    import random

    for seed, vocab_n, n_docs in [(7, 30, 120), (11, 200, 150), (13, 9, 80)]:
        rng = random.Random(seed)
        vocab = [f"w{seed}x{i}" for i in range(vocab_n)]
        out = tempfile.mkdtemp(prefix=f"bm25_rand{seed}_")
        rows = []
        for d in range(n_docs):
            n_toks = rng.randint(3, 40)
            # zipf-flavored pick: low ids much more likely
            toks = [
                vocab[min(int(rng.expovariate(1 / (vocab_n / 6))), vocab_n - 1)]
                for _ in range(n_toks)
            ]
            rows.append((d, " ".join(toks)))
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            2
        ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
        _assert_truth_equal(spark, out, "doc_id % 7 = 0", 12)


def test_bounded_truth_degrades_safely_below_k_candidates(spark):
    """A corpus where every query has FEWER than k=10 scoring docs:
    theta never exists, every term stays essential, and the bounded
    path must return exactly the unpruned ranking (here: all
    candidates, ranked)."""
    out = tempfile.mkdtemp(prefix="bm25_tiny_")
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta"),
        (2, "beta gamma delta"),
        (3, "delta epsilon alpha"),
        (4, "epsilon gamma"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    _assert_truth_equal(spark, out, "doc_id % 2 = 0", 3)
