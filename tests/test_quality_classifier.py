"""Guards for quality_classifier_score beyond the oracle hash match
(tests/test_parity.py): the hash chain is re-derived independently in
Python so a Spark-side drift in the md5/conv/bucket/weight arithmetic
cannot hide behind a matching-but-wrong oracle edit, and the plan pin
keeps inference a single doc-keyed shuffle with no join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.quality import (
    CLS_BUCKETS,
    _CLS_MIX,
    _CLS_WMOD,
    classifier_score,
)
from mapreduce_distributed_systems_spark.plans.registry import get_spec


def _py_weight(tok: str) -> int:
    b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % CLS_BUCKETS
    return (b * _CLS_MIX) % _CLS_WMOD - (_CLS_WMOD - 1) // 2


def test_classifier_handcrafted_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta beta"),
            (2, "42 ... 42"),  # no letters: zero tokens, label drop
            (3, None),  # NULL text survives as (0, 0, drop)
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in classifier_score(df).collect()}
    assert got[1].n_tokens == 3
    assert got[1].score == _py_weight("alpha") + 2 * _py_weight("beta")
    assert got[1].label == ("keep" if got[1].score > 0 else "drop")
    for d in (2, 3):
        assert (got[d].n_tokens, got[d].score, got[d].label) == (0, 0, "drop")


def test_classifier_nonvacuous_on_corpus(spark, sf_dir):
    out = get_spec("quality_classifier_score").fn(spark, sf_dir)
    labels = {r.label: r.n for r in out.groupBy("label").agg(
        F.count("*").alias("n")).collect()}
    # a sign gate over a zero-mean frozen model must split the corpus;
    # a one-sided result means the weight derivation degenerated
    assert labels.get("keep", 0) > 0 and labels.get("drop", 0) > 0
    # score is a sum of per-token weights in [-1000, 1000]
    bad = out.where(F.abs("score") > F.col("n_tokens") * 1000).count()
    assert bad == 0


def test_classifier_plan_single_doc_shuffle(spark, sf_dir):
    plan = (
        get_spec("quality_classifier_score")
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one map-side-combined aggregate keyed on doc_id; no join (the
    # frozen model is computed, not shuffled), no single-partition funnel
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_curation_exact_topk_per_source(spark, sf_dir):
    """The histogram-threshold selection must equal the naive per-group
    top-k computed independently on the driver."""
    from mapreduce_distributed_systems_spark.operators.quality import (
        CURATION_QUOTA,
        classifier_score,
    )
    from mapreduce_distributed_systems_spark.sources import load_table

    got = (
        get_spec("curation_top_quality_per_source")
        .fn(spark, sf_dir)
        .collect()
    )
    scored = classifier_score(
        load_table(spark, sf_dir, "documents"), carry_cols=["source"]
    ).collect()
    by_src: dict = {}
    for r in scored:
        by_src.setdefault(r.source, []).append(r)
    expect = set()
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (-r.score, r.doc_id))
        expect.update((src, r.doc_id) for r in rows[:CURATION_QUOTA])
    assert {(r.source, r.doc_id) for r in got} == expect


def test_curation_plan_no_per_group_funnel(spark, sf_dir):
    from tests.test_selection import _windows_bounded

    plan = (
        get_spec("curation_top_quality_per_source")
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the scale contract of functions/selection.py: every Window input
    # is the bounded histogram or a bucket sliver — never the corpus.
    assert "_bbkt" in plan
    assert _windows_bounded(plan)
    # the scored+bucketed table is cached: its three consumers
    # (histogram, below-boundary filter, boundary sliver) must read
    # the cache, not recompute the scoring shuffle + the O(1)-row
    # [min,max] scalar per branch. (SinglePartition appears only
    # inside the cached relation's printed subplan — once per scan
    # reference — so assert the cache, not a textual exchange count.)
    assert "InMemoryTableScan" in plan


def test_token_budget_select_is_exact_greedy_prefix(spark, sf_dir):
    """curation_token_budget_select == the naive greedy fill: sort all
    scored docs by (score DESC, doc_id), walk the running token sum,
    keep while <= total div BUDGET_DIV. Rederived from the CERTIFIED
    classifier scores (integer-exact), so this differential pins the
    distributed prefix sum + budget cut, not the scoring."""
    from mapreduce_distributed_systems_spark.operators.quality import (
        BUDGET_DIV,
    )
    from mapreduce_distributed_systems_spark.sources import load_table

    scored = sorted(
        (
            (-r.score, r.doc_id, r.n_tokens)
            for r in classifier_score(
                load_table(spark, sf_dir, "documents")
            ).collect()
        ),
    )
    budget = sum(n for _, _, n in scored) // BUDGET_DIV
    want, acc = {}, 0
    for neg_s, d, n in scored:
        acc += n
        if acc > budget:
            break
        want[d] = (n, -neg_s, acc)
    got = {
        r.doc_id: (r.n_tokens, r.score, r.cum_tokens)
        for r in get_spec("curation_token_budget_select")
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == want
    assert 0 < len(got) < len(scored), "budget cut must be non-trivial"
