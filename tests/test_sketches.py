"""Semantic properties of the certified sketches (operators/
sketches.py) that the oracle-parity check alone doesn't spell out:
KMV losslessness below k, CMS one-sided error and linearity.
(Cross-engine bit-equality itself is covered by tests/test_parity.py
and the driver gate.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.sketches import (
    CMS_D,
    CMS_TOP,
    CMS_W,
    _cms_bucket_spark,
)
from mapreduce_distributed_systems_spark.plans.registry import get_spec


def test_cms_overestimates_only(spark, sf_dir):
    """The defining count-min guarantee: min over rows can only
    OVERcount (collisions add, never subtract), so every emitted
    overestimate is >= 0 and n_est >= n_exact."""
    rows = get_spec("sketch_cms_heavyhitters").fn(spark, sf_dir).collect()
    assert len(rows) == CMS_TOP
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.n_est == r.n_exact + r.overestimate


def test_cms_linearity_partials_sum_to_whole(spark, sf_dir):
    """The property that makes CMS a valid map-side partial aggregate
    at 100 TB: cells built independently per language and merged by
    ADDITION equal the cells built over the whole corpus in one pass."""
    from mapreduce_distributed_systems_spark.functions.text import words
    from mapreduce_distributed_systems_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    occ = docs.select("lang", F.explode(words("text")).alias("w"))
    hrows = F.broadcast(
        spark.range(CMS_D).select(F.col("id").cast("int").alias("r"))
    )
    bucketed = occ.crossJoin(hrows).select(
        "lang", "r", _cms_bucket_spark(F.col("w"), F.col("r")).alias("b")
    )
    whole = {
        (r.r, r.b): r.cell
        for r in bucketed.groupBy("r", "b")
        .agg(F.count("*").alias("cell"))
        .collect()
    }
    merged = {
        (r.r, r.b): r.cell
        for r in bucketed.groupBy("lang", "r", "b")
        .agg(F.count("*").alias("part"))
        .groupBy("r", "b")
        .agg(F.sum("part").alias("cell"))
        .collect()
    }
    assert merged == whole
    assert len(whole) <= CMS_D * CMS_W


def test_kmv_lossless_below_k(spark):
    """Groups with fewer than k distinct elements report the exact
    count (the estimator branch only engages at >= k)."""
    from mapreduce_distributed_systems_spark.operators.sketches import (
        _kmv_estimate,
        _kth32,
    )

    df = spark.createDataFrame(
        [("g", f"el{i}") for i in range(37)], "lang string, el string"
    ).select("lang", F.md5("el").alias("h"))
    sk = df.distinct().groupBy("lang").agg(
        F.max(_kth32()).alias("kth32"), F.count("*").alias("n_sketch")
    )
    got = sk.select(_kmv_estimate().alias("est")).collect()[0].est
    assert got == 37


def test_histogram_quantile_error_bound(spark, sf_dir):
    """The histogram guarantee is ORDER-STATISTIC containment: est_pq
    is the upper cent bound of the bucket holding the ceil(q*n)-th
    order statistic, so that statistic lies within one bin below the
    estimate. (No bound vs the interpolated percentile exists — in a
    heavy tail, adjacent order statistics can be arbitrarily far
    apart; the exact_pq column is emitted for calibration, not as an
    error reference.)"""
    from mapreduce_distributed_systems_spark.plans.registry import get_spec
    from mapreduce_distributed_systems_spark.sources import load_table
    from pyspark.sql import functions as F
    import math

    rows = get_spec("sketch_histogram_quantiles").fn(spark, sf_dir).collect()
    assert rows
    vals = {
        r.event_type: sorted(x.vc for x in grp)
        for r in rows
        for grp in [
            load_table(spark, sf_dir, "events")
            .where(F.col("event_type") == r.event_type)
            .select(F.round(F.col("value") * 100).cast("long").alias("vc"))
            .collect()
        ]
    }
    for r in rows:
        vs = vals[r.event_type]
        for q, num, den in (("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)):
            k = math.ceil(len(vs) * num / den)
            order_stat = vs[k - 1] / 100
            est = getattr(r, f"est_{q}")
            assert est + 0.005 >= order_stat >= est - r.bin_width - 0.005, (
                r.event_type,
                q,
                est,
                order_stat,
                r.bin_width,
            )


def test_bloom_size_lever_and_fp_bound(spark, sf_dir):
    """M is computed from the member count in-query (the size lever is
    code): m_bits == M_UNIT * ceil(n_members / MEMBERS_PER_UNIT), which
    keeps bits-per-member >= 16 and the false-positive rate below ~1%
    at any corpus size. All probes are non-members by construction, so
    fp_rate is exactly n_fp / n_probes."""
    import math

    from mapreduce_distributed_systems_spark.operators.sketches import (
        BLOOM_M_UNIT,
        BLOOM_MEMBERS_PER_UNIT,
    )
    from mapreduce_distributed_systems_spark.plans.registry import get_spec

    row = get_spec("sketch_bloom_membership").fn(spark, sf_dir).collect()[0]
    assert row.m_bits == BLOOM_M_UNIT * math.ceil(
        row.n_members / BLOOM_MEMBERS_PER_UNIT
    )
    assert row.m_bits >= 16 * row.n_members
    assert row.bits_set <= min(row.m_bits, 4 * row.n_members)
    assert row.fp_rate < 0.01
