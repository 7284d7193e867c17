"""Window functions over `orders` (build plan M3).

All windows order with a unique tiebreak (o_orderkey) so frames are
deterministic — the same discipline the reference's reducer applies by
sorting values before emitting (mrapps/nocrash.go:40-46).

Scale note: a window partitioned by o_custkey shuffles once on
custkey; running frames then stream within each partition. Skewed
customers are split by AQE only for joins — for windows the mitigation
is bounding frame state (rows frames, not unbounded range over huge
partitions); all frames here are O(1)-state running frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

RUNNING_ORACLE = """
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       CAST(row_number() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
FROM orders
"""


@register(
    "window_running_total",
    oracle=RUNNING_ORACLE,
    tags=("window",),
    bench=True,
    doc="Per-customer running revenue + order sequence number.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


TOP3_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register(
    "window_rank_top3",
    oracle=TOP3_ORACLE,
    tags=("window", "topk"),
    doc="Top-3 orders per customer (row_number, deterministic tiebreak).",
)
def window_rank_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


LAG_ORACLE = """
SELECT o_orderkey, o_custkey,
       round(o_totalprice - lag(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev,
       round(lead(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - o_totalprice, 2
       ) AS delta_next
FROM orders
"""


@register(
    "window_lag_lead",
    oracle=LAG_ORACLE,
    tags=("window",),
    doc="lag/lead deltas between consecutive orders per customer.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "delta_prev"
        ),
        F.round(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2).alias(
            "delta_next"
        ),
    )


NTILE_ORACLE = """
SELECT o_orderkey,
       CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile,
       round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
       round(cume_dist() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cume
FROM orders
"""


@register(
    "window_ntile_pctrank",
    oracle=NTILE_ORACLE,
    tags=("window",),
    doc="Global ntile/percent_rank/cume_dist via DISTRIBUTED rank: "
    "range-partition on the sort key, rank locally per partition, add "
    "the per-partition row-count prefix offsets (an O(#partitions) "
    "driver-side scalar, like zipWithIndex). No single-partition "
    "window anywhere in the plan — the naive W.orderBy() formulation "
    "funnels the whole table through one task at 100 TB.",
)
def window_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Persist the range-partitioned projection so the offset-count job
    # and the final job see the SAME partition boundaries (range
    # sampling re-draws per job otherwise). Two narrow columns only.
    part = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(n_parts, "o_totalprice", "o_orderkey")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["n"] for r in part.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    offsets, acc = {}, 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    off_map = F.create_map(
        *[F.lit(v) for pid in range(n_parts) for v in (pid, offsets[pid])]
    )
    w_local = W.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    rank = (F.element_at(off_map, F.col("_pid")) + F.row_number().over(w_local)).cast("long")
    # ntile(10): first (total % 10) buckets hold one extra row
    q, rem = divmod(total, 10)
    big = rem * (q + 1)  # rows covered by the q+1-sized buckets
    decile = F.when(
        F.col("_rank") <= F.lit(big), F.ceil(F.col("_rank") / F.lit(q + 1))
    ).otherwise(F.lit(rem) + F.ceil((F.col("_rank") - F.lit(big)) / F.lit(max(q, 1))))
    pct = (
        (F.col("_rank") - 1) / F.lit(total - 1) if total > 1 else F.lit(0.0)
    )
    return (
        part.withColumn("_rank", rank)
        .select(
            "o_orderkey",
            decile.cast("long").alias("decile"),
            F.round(pct, 6).alias("pct_rank"),
            F.round(F.col("_rank") / F.lit(total), 6).alias("cume"),
        )
    )


TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register(
    "top_k_orders",
    oracle=TOPK_ORACLE,
    tags=("relational", "topk"),
    doc="Global top-20 by price — TakeOrderedAndProject, no full sort.",
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


RANGE_30D_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(count(*) OVER w30 AS BIGINT) AS n_orders_30d,
       round(sum(o_totalprice) OVER w30, 2) AS spend_30d
FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS ord_sec FROM orders)
WINDOW w30 AS (
  PARTITION BY o_custkey ORDER BY ord_sec
  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
)
"""


@register(
    "window_range_30d",
    oracle=RANGE_30D_ORACLE,
    tags=("window", "range-frame"),
    doc="Event-time RANGE frame: per customer, rolling 30-day order "
    "count and spend (range on epoch seconds — value-based frame, not "
    "row-based, so simultaneous orders share a frame).",
)
def window_range_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "ord_sec", F.unix_timestamp("o_orderdate")
    )
    w30 = (
        W.partitionBy("o_custkey")
        .orderBy("ord_sec")
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w30).cast("long").alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w30), 2).alias("spend_30d"),
    )


VALUE_PICKS_ORACLE = """
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER wo AS first_price,
       last_value(o_totalprice) OVER wo AS latest_price,
       nth_value(o_totalprice, 2) OVER wo AS second_price
FROM orders
WINDOW wo AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
"""


@register(
    "window_value_picks",
    oracle=VALUE_PICKS_ORACLE,
    tags=("window", "value-picks"),
    doc="first_value / last_value / nth_value over a running frame "
    "(frame explicitly pinned: default frames differ across engines).",
)
def window_value_picks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wo = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(wo).alias("first_price"),
        F.last("o_totalprice").over(wo).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(wo).alias("second_price"),
    )


DEDUP_LATEST_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_events
  FROM events
)
SELECT user_id, event_type,
       event_id AS last_event_id,
       round(value, 2) AS last_value,
       CAST(n_events AS BIGINT) AS n_events
FROM ranked WHERE rn = 1
"""


@register(
    "window_dedup_latest",
    oracle=DEDUP_LATEST_ORACLE,
    tags=("window", "dedup", "events"),
    doc="Window deduplication — keep the LATEST row per key: "
    "row_number over (user_id, event_type) ordered by ts desc with an "
    "event_id tiebreak, filtered to rn=1, keeping the group size "
    "alongside. The upsert-compaction pattern every CDC/event log "
    "needs (the batch twin of kv_replay_final's last-write-wins): one "
    "shuffle on the dedup key, streaming rank within partitions, no "
    "self-join against a max-ts aggregate (which would shuffle twice "
    "and break ties nondeterministically).",
)
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = W.partitionBy("user_id", "event_type")
    return (
        e.select(
            "user_id",
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n_events"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.round("value", 2).alias("last_value"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
