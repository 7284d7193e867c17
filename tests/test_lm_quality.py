"""Non-vacuity and plan guards for the round-7 lm_quality operators
(the PII/decon plant-pin pattern: a hash match alone cannot tell
whether the interesting branch fired)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import get_spec


def test_lm_score_splits_corpus_and_is_smoothed(spark, sf_dir):
    from mapreduce_distributed_systems_spark.operators.lm_quality import (
        LM_NLL_KEEP_MAX,
    )

    rows = get_spec("quality_ngram_lm_score").fn(spark, sf_dir).collect()
    assert rows
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    # the threshold must actually split the corpus, or the verdict
    # column certifies a constant
    assert kept and dropped, (
        f"LM_NLL_KEEP_MAX={LM_NLL_KEEP_MAX} does not split: "
        f"{len(kept)} kept / {len(dropped)} dropped"
    )
    # add-one smoothing keeps every score finite and positive
    assert all(0 < r.nll < 20 for r in rows)
    # keep is exactly the thresholded rounded score (no second
    # unrounded comparison hiding in the plan)
    assert all((r.nll <= LM_NLL_KEEP_MAX) == r.keep for r in rows)
    # ADVICE r9: keep compares a rounded order-dependent float sum to
    # the threshold; certification relies on no fixture doc sitting
    # within a rounding quantum of it. Pin a wide margin.
    assert all(abs(r.nll - LM_NLL_KEEP_MAX) > 1e-3 for r in rows), (
        "a fixture doc's nll sits within 1e-3 of LM_NLL_KEEP_MAX; "
        "move the threshold into a gap"
    )


def test_paragraph_rewrite_drops_planted_boilerplate(spark, sf_dir):
    from mapreduce_distributed_systems_spark.operators.lm_quality import (
        PARA_PLANT_MOD,
    )

    out = get_spec("dedup_paragraph_rewrite").fn(spark, sf_dir)
    rows = out.collect()
    planted = [r for r in rows if r.doc_id % PARA_PLANT_MOD == 0]
    unplanted = [r for r in rows if r.doc_id % PARA_PLANT_MOD != 0]
    assert planted and unplanted
    # exactly ONE planted doc keeps the boilerplate paragraph (the
    # globally-first occurrence); every other planted doc loses >= 1
    with_all = [r for r in planted if r.n_kept == r.n_paras]
    assert len(with_all) == 1, (
        f"{len(with_all)} planted docs kept every paragraph — the "
        "first-occurrence rule should spare exactly one"
    )
    # exact-duplicate documents legitimately lose EVERY paragraph
    # (their whole content first-occurred elsewhere) and rewrite to
    # the empty string — pinned, not papered over
    import hashlib

    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in rows:
        assert r.rebuilt_md5 is not None
        if r.n_kept == 0:
            assert r.rebuilt_md5 == empty_md5


def test_paragraph_rewrite_min_is_map_side_combined(spark, sf_dir):
    """The hot boilerplate hash must be absorbed by a partial (map
    side) aggregate before the exchange — the plan needs a partial_min
    below the shuffle, or a repeated paragraph funnels its instance
    count through one reducer at scale."""
    plan = (
        get_spec("dedup_paragraph_rewrite")
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_min" in plan


def test_perplexity_buckets_are_equal_thirds_and_ordered(spark, sf_dir):
    """NTILE exactness without the oracle: per language the three
    buckets differ in size by <= 1, every document is bucketed
    exactly once, and the score order is respected (a head document
    never has a strictly higher NLL than a tail document — ties may
    straddle boundaries, the deterministic doc_id tie-break decides)."""
    df = get_spec("quality_perplexity_buckets").fn(spark, sf_dir).cache()
    total = df.count()
    docs = get_spec("quality_ngram_lm_score").fn(spark, sf_dir).count()
    assert total == docs  # one bucket per scored document

    sizes = {
        (r["lang"], r["bucket"]): r["n"]
        for r in df.groupBy("lang", "bucket").agg(F.count("*").alias("n")).collect()
    }
    langs = {lg for lg, _ in sizes}
    for lg in langs:
        ns = [sizes.get((lg, b), 0) for b in ("head", "middle", "tail")]
        assert max(ns) - min(ns) <= 1, (lg, ns)

    bounds = {
        (r["lang"], r["bucket"]): (r["lo"], r["hi"])
        for r in df.groupBy("lang", "bucket")
        .agg(F.min("nll").alias("lo"), F.max("nll").alias("hi"))
        .collect()
    }
    for lg in langs:
        if (lg, "head") in bounds and (lg, "tail") in bounds:
            assert bounds[(lg, "head")][1] <= bounds[(lg, "tail")][0], lg
        if (lg, "head") in bounds and (lg, "middle") in bounds:
            assert bounds[(lg, "head")][1] <= bounds[(lg, "middle")][1], lg
    df.unpersist()


def test_rewrite_hot_slice_split_is_invisible(spark, sf_dir):
    """The at-scale tag-back plan (hot-hash broadcast slice + cold
    join with hot rows anti-filtered from its shuffle) must tag
    exactly what the single-join plan tags — on a corpus where the
    planted boilerplate hash IS hot relative to a lowered cap."""
    import mapreduce_distributed_systems_spark.operators.lm_quality as lmq

    docs = lmq.load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % lmq.PARA_PLANT_MOD == 0,
            F.concat(F.lit(lmq.PARA_BOILERPLATE + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    toks = base.select(
        "doc_id", lmq.words("text").alias("toks")
    ).where(F.size("toks") > 0)
    n_ch = F.ceil(F.size("toks") / F.lit(float(lmq.PARA_TOKENS))).cast("long")
    ch = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_ch - 1),
                lambda i: F.array_join(
                    F.slice(
                        F.col("toks"),
                        (i * lmq.PARA_TOKENS + 1).cast("int"),
                        lmq.PARA_TOKENS,
                    ),
                    " ",
                ),
            )
        ).alias("pos", "chunk"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "chunk",
        F.md5("chunk").alias("h"),
        (F.col("doc_id") * lmq.POS_PACK + F.col("pos")).alias("pk"),
    )
    old_cap = lmq.REWRITE_HOT_CAP
    lmq.REWRITE_HOT_CAP = 3  # make the planted hash genuinely hot
    try:
        key = lambda r: (r.doc_id, r.pos)  # noqa: E731
        a = {key(r): r.keep for r in lmq._tag_first_occurrence(ch, split=True).collect()}
        b = {key(r): r.keep for r in lmq._tag_first_occurrence(ch, split=False).collect()}
    finally:
        lmq.REWRITE_HOT_CAP = old_cap
    assert a == b and len(a) > 0
    assert sum(a.values()) < len(a)  # duplicates actually dropped
