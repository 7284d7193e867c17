"""Skew evidence behind SCALE.md's salting claim: on a hot-key
distribution, the UNSALTED shuffle concentrates the hot key's rows in
one partition (the straggler that kills a 1000-executor job), while
salting bounds any partition's share to ~1/N_SALT of the hot key.

Measured against Spark's REAL hash partitioning (repartition on the
group keys + spark_partition_id), not a model of it."""

from __future__ import annotations

from pyspark.sql import functions as F

N_ROWS = 100_000
HOT_SHARE = 0.9  # 90% of rows carry key 0
N_SALT = 8
N_PARTS = 32


def _hot_df(spark):
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id"))
        .alias("key"),
        F.col("id"),
    )


def _max_partition_rows(df, *keys) -> int:
    loads = (
        df.repartition(N_PARTS, *keys)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    return max(r["count"] for r in loads)


def test_salting_bounds_hot_key_partition_load(spark):
    df = _hot_df(spark)
    hot_rows = int(N_ROWS * HOT_SHARE)

    # unsalted: the hot key hashes to ONE partition — straggler shape
    mx_unsalted = _max_partition_rows(df, "key")
    assert mx_unsalted >= hot_rows

    # salted: hot key spreads over N_SALT buckets of hot/N_SALT rows;
    # a partition may receive a few buckets (8 buckets hash into 32
    # partitions, birthday collisions expected), so assert the bound
    # with that slack rather than a perfect 1/N_SALT split
    salted = df.withColumn("salt", F.col("id") % N_SALT)
    mx_salted = _max_partition_rows(salted, "key", "salt")
    assert mx_salted <= 3 * hot_rows / N_SALT, (
        f"salting did not spread the hot key: max={mx_salted}"
    )
    # and the straggler actually collapsed: >3x reduction in max load
    assert mx_salted * 3 < mx_unsalted


def test_salted_two_phase_agg_matches_plain(spark):
    """The salted partial/final aggregation is result-identical to the
    plain groupBy it replaces (same contract skew_salted_agg's DuckDB
    oracle pins on real data)."""
    df = _hot_df(spark)
    plain = {
        (r["key"], r["n"], r["s"])
        for r in df.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    partial = (
        df.withColumn("salt", F.col("id") % N_SALT)
        .groupBy("key", "salt")
        .agg(F.count("*").alias("pn"), F.sum("id").alias("ps"))
    )
    salted = {
        (r["key"], r["n"], r["s"])
        for r in partial.groupBy("key")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
        .collect()
    }
    assert salted == plain


def test_temperature_mixture_overweights_small_sources(spark, sf_dir):
    """The point of alpha < 1: a small source's KEEP RATE must exceed a
    large source's (quota ~ sqrt(n), so quota/n decreases in n)."""
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.plans.registry import get_spec
    from mapreduce_distributed_systems_spark.sources import load_table

    kept = (
        get_spec("mixture_temperature_sample")
        .fn(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("k"))
    )
    totals = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    rates = {
        r["source"]: (r["k"], r["n"], r["k"] / r["n"])
        for r in kept.join(totals, "source").collect()
    }
    assert len(rates) >= 2
    by_n = sorted(rates.values(), key=lambda t: t[1])
    smallest, largest = by_n[0], by_n[-1]
    if smallest[1] < largest[1]:  # corpus actually has size spread
        assert smallest[2] > largest[2], (smallest, largest)
