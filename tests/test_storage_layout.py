"""Storage-layout scale proofs (SCALE.md claims made executable):

- bucketed tables co-locate a join on the bucket key -> NO shuffle
  exchange in the join plan (the 'delete the exchange entirely' lever);
- shard-partitioned writes give partition-PRUNED reads (C13 at the
  storage layer, not just column pruning).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    base = tempfile.mkdtemp(prefix="bucketed_")

    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{base}/orders").mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{base}/lineitem").mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the shuffle-free bucketed SMJ is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("lineitem_b")
            .join(spark.table("orders_b"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        )
        plan = _plan(joined)
        # co-located bucketed join: no shuffle before the join
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and it returns the same result as the plain join
        plain = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_shard_partitioned_write_prunes_partitions(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.withColumn(
        "shard", F.ascii(F.substring((F.col("user_id") % 20).cast("string"), 1, 1)) % 10
    )
    path = tempfile.mkdtemp(prefix="sharded_") + "/events"
    keyed.write.partitionBy("shard").mode("overwrite").parquet(path)

    one_shard = spark.read.parquet(path).where(F.col("shard") == 3)
    plan = _plan(one_shard)
    assert "PartitionFilters: [isnotnull(shard" in plan  # pruned at listing
    got = one_shard.count()
    want = keyed.where(F.col("shard") == 3).count()
    assert got == want and got > 0
