"""Unit + plan tests for the bucket-histogram hash-order selection
(functions/selection.py) — the round-3 replacement for per-group
corpus-wide windows in mixture/stratified sampling (VERDICT r2
items 3-4)."""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.selection import (
    hash_bucket,
    select_first_by_hash,
    select_first_by_value,
)
from mapreduce_distributed_systems_spark.plans.registry import get_spec


def _naive_first_by_hash(df, group_col, quota_map):
    """Reference semantics: row_number over (group) ordered by
    (md5(id), id), keep rn <= quota[group]."""
    w = W.partitionBy(group_col).orderBy(F.col("_h"), F.col("id"))
    quota = F.create_map(
        *[F.lit(x) for kv in quota_map.items() for x in kv]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.element_at(quota, F.col(group_col)))
        .select(group_col, "id")
    )


def _mk(spark, rows_per_group):
    rows = [
        (g, i + off * 100000)
        for off, (g, n) in enumerate(rows_per_group.items())
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "grp string, id long")
    return df.withColumn("_h", F.md5(F.col("id").cast("string"))).withColumn(
        "_bkt", hash_bucket(F.col("_h"))
    )


def test_selection_matches_naive_window_skewed_groups(spark):
    # skewed group sizes, quotas below / at / above group size
    sizes = {"a": 1000, "b": 7, "c": 50}
    quotas = {"a": 137, "b": 7, "c": 999}
    df = _mk(spark, sizes)
    quota_col = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )
    got = select_first_by_hash(
        df,
        group_cols=["grp"],
        quota=F.element_at(quota_col, F.col("grp")),
        order_cols=[F.col("_h"), F.col("id")],
    ).select("grp", "id")
    want = _naive_first_by_hash(df, "grp", quotas)
    assert sorted(got.collect()) == sorted(want.collect())
    # quota above size keeps the whole group
    assert got.where(F.col("grp") == "c").count() == 50


def test_selection_proportional_quota(spark):
    df = _mk(spark, {"a": 300, "b": 30})
    got = select_first_by_hash(
        df,
        group_cols=["grp"],
        quota=F.expr("(_n_grp + 2) div 3"),  # ceil(n/3)
        order_cols=[F.col("_h"), F.col("id")],
    )
    counts = {r["grp"]: r["n"] for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 100, "b": 10}


def _windows_bounded(plan: str) -> bool:
    """Every Window node's input subtree (lines below it, up to the
    next scan) must contain a HashAggregate (histogram window) or the
    boundary-bucket filter (_bbkt) — i.e. no window runs over the raw
    corpus."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window " not in line:
            continue
        seen = []
        for below in lines[i + 1 :]:
            seen.append(below)
            if "Scan parquet" in below or "Scan ExistingRDD" in below:
                break
        sub = "\n".join(seen)
        if "HashAggregate" not in sub and "_bbkt" not in sub:
            return False
    return True


def test_mixture_plan_has_no_corpus_window(spark, sf_dir):
    plan = (
        get_spec("mixture_weighted_sample")
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_bbkt" in plan  # boundary machinery present
    assert _windows_bounded(plan)


def test_stratified_plan_has_no_corpus_window(spark, sf_dir):
    plan = (
        get_spec("stratified_sample_per_lang")
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_bbkt" in plan
    assert _windows_bounded(plan)


# ---------------------------------------------------------------- #
# VALUE-bucket selection (round 6): the same machinery selecting by a
# score-derived bucket instead of a hash prefix — randomized
# differential vs the naive per-group window, with heavy ties and
# skewed groups (the cases one fixed corpus cannot exercise).
# ---------------------------------------------------------------- #

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

score_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # group
        st.integers(min_value=-50, max_value=50),  # score (heavy ties)
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=score_rows, quota=st.integers(min_value=1, max_value=30))
@pytest.mark.slow  # driver-budget profile, see pytest.ini
def test_value_bucket_selection_matches_naive_topk(spark, rows, quota):
    # conftest's `spark` is session-scoped, which hypothesis allows
    # (only function-scoped fixtures trip its health check)
    df = spark.createDataFrame(
        [(g, s, i) for i, (g, s) in enumerate(rows)],
        "grp string, score long, id long",
    )
    mx = max(s for _, s in rows)
    mn = min(s for _, s in rows)
    span = max(mx - mn, 1)
    bucketed = df.withColumn(
        "_sbkt", F.expr(f"CAST((({mx} - score) * 65535) div {span} AS BIGINT)")
    )
    got = select_first_by_hash(
        bucketed,
        group_cols=["grp"],
        quota=F.lit(quota),
        order_cols=[F.col("score").desc(), F.col("id")],
        bucket_col="_sbkt",
    ).select("grp", "id")
    by_grp: dict = {}
    for i, (g, s) in enumerate(rows):
        by_grp.setdefault(g, []).append((s, i))
    want = set()
    for g, pairs in by_grp.items():
        pairs.sort(key=lambda p: (-p[0], p[1]))
        want.update((g, i) for _, i in pairs[:quota])
    assert {(r.grp, r.id) for r in got.collect()} == want
    # the refined variant (round 7: bounded windows even under
    # tie-degenerate scores) must agree on every generated case too
    got_refined = select_first_by_value(
        bucketed,
        group_cols=["grp"],
        quota=F.lit(quota),
        value_col="score",
        id_col="id",
        bucket_col="_sbkt",
        value_desc=True,
    ).select("grp", "id")
    assert {(r.grp, r.id) for r in got_refined.collect()} == want


def test_value_selection_constant_score_corpus(spark):
    """The adversarial case the r6 caveat admitted: EVERY row of one
    group shares a single score, so the whole group lands in one
    boundary score-bucket and the order degenerates to the id
    tiebreak. The refined selection must (a) return exactly the
    lowest-id `quota` rows, and (b) never put the tie mass through a
    single row_number window — its final window input is gated by the
    level-3 id-bucket boundary filter (_bbkt over _ibkt), which the
    plan test below pins."""
    n, quota = 5000, 37
    df = spark.range(n).select(
        F.lit("only").alias("grp"),
        F.lit(7).cast("long").alias("score"),
        # non-contiguous, shuffled ids: exercise the span-scaled bucket
        ((F.col("id") * 2654435761) % 999999937).alias("id"),
    )
    bucketed = df.withColumn("_sbkt", F.lit(0).cast("long"))
    got = select_first_by_value(
        bucketed,
        group_cols=["grp"],
        quota=F.lit(quota),
        value_col="score",
        id_col="id",
        bucket_col="_sbkt",
    )
    ids = sorted(r.id for r in got.select("id").collect())
    want = sorted(
        (i * 2654435761) % 999999937 for i in range(n)
    )[:quota]
    assert ids == want
    # level-3 machinery is actually in the plan (id-bucket boundary)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_ibkt" in plan


def test_curation_plan_windows_bounded(spark, sf_dir):
    """curation_top_quality_per_source (quality.py) now routes through
    select_first_by_value: every Window in the executed plan must sit
    above either a histogram aggregate or a boundary filter — no
    window over the raw scored corpus, even in the tie-refinement
    branches."""
    plan = (
        get_spec("curation_top_quality_per_source")
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_bbkt" in plan
    assert "_ibkt" in plan  # tie-mass refinement wired, not just documented
    assert _windows_bounded(plan)
